package graft

import org.apache.spark.sql.{DataFrame, Row}

import graft.model.{LabelMatcher, TsdbConf}

/** Full-fidelity replication of the reference's own E2E tests
  * (tsdb_test.go:37-147) at the reference's exact scale: the full 16-metric
  * list × 3 nodes × 24 dcs × 720 one-minute steps (829,440 rows spanning
  * 12 h ⇒ multiple 2 h segments), start epoch 1600000000, value == ts.
  */
class ReferenceGridSpec extends SparkSuite {

  val Start = 1600000000L
  val Steps = 720
  // the reference's metric list verbatim (tsdb_test.go:14-19)
  val Metrics = Seq(
    "cpu.busy", "cpu.load1", "cpu.load5", "cpu.load15", "cpu.iowait",
    "disk.write.ops", "disk.read.ops", "disk.used",
    "net.in.bytes", "net.out.bytes", "net.in.packages", "net.out.packages",
    "mem.used", "mem.idle", "mem.used.bytes", "mem.total.bytes")

  lazy val tsdb: Tsdb = {
    import spark.implicits._
    val rows: DataFrame = spark
      .createDataset(for {
        m <- Metrics
        node <- 0 until 3
        dc <- 0 until 24
      } yield (m, node, dc))
      .toDF("metric", "node", "dc")
      .selectExpr(
        "metric",
        "map('node', concat('vm', node), 'dc', cast(dc as string)) as labels",
        s"explode(sequence(0, ${Steps - 1})) as step")
      .selectExpr(
        "metric", "labels",
        s"cast($Start + step * 60 as bigint) as ts",
        s"cast($Start + step * 60 as double) as value")
    val t = new Tsdb(spark, TsdbConf(dataPath = tempDir("refgrid")))
    t.insertRows(rows)
    t
  }

  test("grid lands 829,440 points across multiple 2h segments") {
    assert(tsdb.samples.count() == 16L * 3 * 24 * Steps)
    assert(tsdb.segmentStats.count() >= 6) // 12h / 2h
  }

  test("QueryRange: exact labels and exact 3-point sequence (tsdb_test.go:63-82)") {
    val got = tsdb.queryRangeShaped(
      "cpu.busy",
      Seq(LabelMatcher.eq("node", "vm1"), LabelMatcher.eq("dc", "0")),
      Start, Start + 120).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Map[String, String]]("labels") ==
      Map("__name__" -> "cpu.busy", "node" -> "vm1", "dc" -> "0"))
    val points = got(0).getAs[scala.collection.Seq[Row]]("points")
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(points == (0 to 2).map(i =>
      (Start + i * 60L, (Start + i * 60L).toDouble)))
  }

  test("QueryRange: trailing 2-point window (tsdb_test.go:84-89)") {
    // the reference queries [now-120, now] with `now` ~30s past the last
    // point => exactly 2 points fall inside
    val now = Start + (Steps - 1) * 60L + 30
    val got = tsdb.queryRange(
      "cpu.busy",
      Seq(LabelMatcher.eq("node", "vm1"), LabelMatcher.eq("dc", "0")),
      now - 120, now)
    assert(got.count() == 2)
  }

  test("QuerySeries: disk.* regex + equality => exactly 3 series (tsdb_test.go:92-121)") {
    val got = tsdb.querySeries(
      Seq(
        LabelMatcher.re(Tsdb.MetricLabel, "disk.*"),
        LabelMatcher.eq("node", "vm1"),
        LabelMatcher.eq("dc", "0")),
      Start, Start + 120)
    assert(got.count() == 3)
  }

  test("QueryLabelValues: node domain == [vm0 vm1 vm2] sorted (tsdb_test.go:123-147)") {
    val got = tsdb.queryLabelValues("node", Start, Start + 120)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("vm0", "vm1", "vm2"))
  }
}
