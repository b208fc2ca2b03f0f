package graft.streaming

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Key-encoding laws for the streaming state-key builder: distinct
  * grouping tuples get distinct keys and identical tuples share one, for
  * ANY label content — including strings containing the former NUL /
  * U+0001 sentinels, strings equal to the absence marker, and name/value
  * splits that would shift a naive concatenation's boundaries.
  */
class GroupingSpec extends graft.SparkSuite {

  // adversarial alphabet: separator bytes, digits (length-prefix
  // lookalikes), the encoder's own marker characters
  private val nasty: Gen[String] = Gen.choose(0, 5).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('\u0000', '\u0001', 'x', 'v', ':', '1', 'a'))
      .map(_.mkString))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private def keysOf(g: Grouping, maps: Seq[Map[String, String]]): Seq[String] = {
    import spark.implicits._
    maps.toDF("labels")
      .select(g.keyCol(col("labels")).as("k"))
      .collect().map(_.getString(0)).toSeq
  }

  test("By: distinct (present/absent x value) tuples get distinct keys, " +
      "including sentinel-bearing and boundary-shifting values") {
    val g = Grouping.By(Seq("a", "b"))
    val values = samples(nasty, 40).distinct
    // tuple space: (Option[a], Option[b]) over the nasty values
    val tuples = (for {
      a <- None +: values.map(Option(_))
      b <- None +: values.take(7).map(Option(_))
    } yield (a, b)).distinct
    val maps = tuples.map { case (a, b) =>
      Map.empty[String, String] ++
        a.map("a" -> _).toMap ++ b.map("b" -> _).toMap
    }
    val keys = keysOf(g, maps)
    assert(keys.distinct.size == tuples.size,
      s"${tuples.size} tuples -> ${keys.distinct.size} keys")
    // hand-picked classics: value equal to the absence marker; value
    // containing the join position of the other slot
    val classics = Seq(
      Map("a" -> "x"), Map.empty[String, String],
      Map("a" -> "\u0001"), Map("a" -> ""),
      Map("a" -> "x\u0000y"), Map("a" -> "x", "b" -> "y"))
    val ck = keysOf(g, classics)
    assert(ck.distinct.size == classics.size, ck.mkString("|"))
  }

  test("Without: distinct remaining label maps get distinct keys; name/" +
      "value boundary shifts and sentinel content cannot collide") {
    val g = Grouping.Without(Seq("drop"))
    val maps = Seq(
      Map("ab" -> "c"), Map("a" -> "bc"),           // boundary shift
      Map("a" -> "b", "c" -> "d"), Map("a" -> "bc", "c" -> "d"),
      Map("k" -> "\u0001"), Map("k" -> "x"), Map("k" -> ""),
      Map("k\u0001x" -> "y"), Map("k" -> "\u0001xy"), // name/value split
      Map("v1" -> ":a"), Map("v" -> "1:a"),          // prefix lookalikes
      Map.empty[String, String]
    ).distinct
    val keys = keysOf(g, maps)
    assert(keys.distinct.size == maps.size,
      maps.zip(keys).mkString("\n"))
    // excluded keys and __name__ never contribute
    val same = keysOf(g, Seq(
      Map("a" -> "1"),
      Map("a" -> "1", "drop" -> "z"),
      Map("a" -> "1", "__name__" -> "m")))
    assert(same.distinct.size == 1, same.mkString("|"))
  }

  test("Without: explicit null-valued entries group and render like " +
      "absent labels (normalizeLabels parity)") {
    import spark.implicits._
    val g = Grouping.Without(Seq("drop"))
    // {k:null, a:1} must key and label exactly like {a:1}
    val df = Seq(1).toDF("i").select(
      map_from_arrays(array(lit("k"), lit("a")),
        array(lit(null).cast("string"), lit("1"))).as("withNull"),
      map(lit("a"), lit("1")).as("plain"))
    val row = df.select(
      g.keyCol(col("withNull")).as("k1"), g.keyCol(col("plain")).as("k2"),
      g.labelsCol(col("withNull")).as("l1")).head()
    assert(row.getString(0) == row.getString(1))
    assert(row.getAs[Map[String, String]]("l1") == Map("a" -> "1"))
  }
}
