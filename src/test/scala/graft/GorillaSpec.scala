package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Gorilla
import graft.operators.GorillaPack

/** Gorilla codec: lossless round-trips (regular grid, irregular/random
  * series, ScalaCheck-generated), paper-level compression on step data,
  * and the distributed per-series packing aggregator.
  */
class GorillaSpec extends SparkSuite {

  test("roundtrip: reference-style regular grid") {
    val pts = (0 until 720).map(i => (1600000000L + i * 60L, (1600000000L + i * 60L).toDouble))
    assert(Gorilla.decode(Gorilla.encode(pts)) == pts)
  }

  test("roundtrip: empty, single, constant, negative, special doubles") {
    val cases = Seq(
      Seq.empty[(Long, Double)],
      Seq((42L, 3.14)),
      (0 until 100).map(i => (i.toLong, 7.0)),
      Seq((0L, -1.5), (1000000L, 1.5), (1000001L, Double.MinPositiveValue)),
      Seq((0L, 0.0), (5L, -0.0), (6L, Double.MaxValue), (7L, Double.MinValue)))
    cases.foreach { pts =>
      assert(Gorilla.decode(Gorilla.encode(pts)) == pts, pts.toString)
    }
  }

  test("roundtrip: NaN and infinities preserve exact bit patterns") {
    val pts = Seq(
      (0L, Double.PositiveInfinity), (60L, Double.NegativeInfinity),
      (120L, Double.NaN), (180L, 1.0))
    val out = Gorilla.decode(Gorilla.encode(pts))
    assert(out.map(_._1) == pts.map(_._1))
    // NaN != NaN, so compare raw IEEE bits (the XOR codec is bit-exact)
    assert(out.map(p => java.lang.Double.doubleToRawLongBits(p._2)) ==
      pts.map(p => java.lang.Double.doubleToRawLongBits(p._2)))
  }

  test("roundtrip: ScalaCheck random irregular series") {
    val g = for {
      n <- Gen.choose(0, 300)
      deltas <- Gen.listOfN(n, Gen.choose(1L, 100000L))
      values <- Gen.listOfN(n, Gen.choose(-1e9, 1e9))
    } yield deltas.scanLeft(1600000000L)(_ + _).tail.zip(values)
    (0 until 50).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(1234L + i)).foreach { pts =>
        assert(Gorilla.decode(Gorilla.encode(pts)) == pts, s"case $i")
      }
    }
  }

  test("compression: step data approaches the paper's bytes/point") {
    // 121 points, fixed 60s step, small-integer values (the reference
    // README's heavy-grid shape): expect far below raw 16 B/point
    val pts = (0 until 121).map(i =>
      (1600000000L + i * 60L, (i % 60).toDouble))
    val bytes = Gorilla.encode(pts).length
    val perPoint = bytes.toDouble / pts.length
    assert(perPoint < 4.0, s"bytes/point = $perPoint")
  }

  test("distributed per-series packing roundtrips through Spark") {
    import spark.implicits._
    val rows = for {
      sid <- 0 until 10
      i <- 0 until 50
    } yield (sid.toLong, 1600000000L + i * 60L + sid, sid * 1000.0 + i)
    val df = rows.toDF("sid", "ts", "value")
    val packed = GorillaPack.packPerSeries(df, "sid", "ts", "value")
      .collect()
    assert(packed.length == 10)
    packed.foreach { r =>
      val sid = r.getLong(0)
      val block = r.getAs[Array[Byte]]("block")
      val decoded = Gorilla.decode(block)
      val expected = rows.filter(_._1 == sid).map(t => (t._2, t._3)).sorted
      assert(decoded == expected, s"sid $sid")
      assert(r.getLong(1) == 50L)
    }
  }
}
