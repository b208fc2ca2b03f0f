package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.{LabelMatcher, TsdbConf}

/** End-to-end TSDB tests on the mandodb-shaped synthetic grid
  * (FIXTURES.md §A): metrics × nodes × dcs, 60 s step, value == ts —
  * replicating the reference's own test assertions
  * (tsdb_test.go:37-90, 92-121, 123-147).
  */
class TsdbSpec extends SparkSuite {

  val Start = 1600000000L
  val Steps = 240 // 4h at 60s => crosses the 2h segment boundary
  val Metrics = Seq(
    "cpu.busy", "cpu.load1",
    "disk.write.ops", "disk.read.ops", "disk.used",
    "mem.used", "net.in.bytes", "net.out.bytes")

  /** Deterministic self-checking grid: value == ts (tsdb_test.go:21-35). */
  def grid(): DataFrame = {
    import spark.implicits._
    val rows = for {
      m <- Metrics
      node <- 0 until 3
      dc <- 0 until 4
      step <- 0 until Steps
    } yield (m, Map("node" -> s"vm$node", "dc" -> dc.toString),
      Start + step * 60L, (Start + step * 60L).toDouble)
    rows.toDF("metric", "labels", "ts", "value")
  }

  def mkTsdb(memory: Boolean): Tsdb = {
    val conf = TsdbConf(
      dataPath = tempDir("tsdb"),
      segmentDuration = 7200L,
      compression = "zstd",
      onlyMemoryMode = memory)
    val t = new Tsdb(spark, conf)
    t.insertRows(grid())
    t
  }

  lazy val disk: Tsdb = mkTsdb(memory = false)
  lazy val mem: Tsdb = mkTsdb(memory = true)

  def assertRangeQuery(t: Tsdb): Unit = {
    // reference tsdb_test.go:63-82: exact labels + exact 3-point sequence
    val got = t.queryRangeShaped(
      "cpu.busy",
      Seq(LabelMatcher.eq("node", "vm1"), LabelMatcher.eq("dc", "0")),
      Start, Start + 120)
      .collect()
    assert(got.length == 1)
    val labels = got(0).getAs[Map[String, String]]("labels")
    assert(labels == Map("__name__" -> "cpu.busy", "node" -> "vm1", "dc" -> "0"))
    val points = got(0).getAs[scala.collection.Seq[Row]]("points")
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(points == Seq(
      (Start, Start.toDouble),
      (Start + 60, (Start + 60).toDouble),
      (Start + 120, (Start + 120).toDouble)))
  }

  test("queryRange returns exact points (disk)") { assertRangeQuery(disk) }
  test("queryRange returns exact points (memory)") { assertRangeQuery(mem) }

  test("queryRange trailing window returns expected count") {
    // reference tsdb_test.go:84-89 shape: [end-120, end] => 3 aligned points
    val end = Start + (Steps - 1) * 60L
    val got = disk.queryRange(
      "cpu.busy",
      Seq(LabelMatcher.eq("node", "vm1"), LabelMatcher.eq("dc", "0")),
      end - 120, end)
    assert(got.count() == 3)
  }

  test("querySeries with regex matcher finds exactly the disk.* series") {
    // reference tsdb_test.go:92-121: 3 series for disk.* + node/dc equality
    val got = disk.querySeries(
      Seq(
        LabelMatcher.re(Tsdb.MetricLabel, "disk.*"),
        LabelMatcher.eq("node", "vm1"),
        LabelMatcher.eq("dc", "0")),
      Start, Start + 120)
    assert(got.count() == 3)
    val metrics = got.select("metric").collect().map(_.getString(0)).toSet
    assert(metrics == Set("disk.write.ops", "disk.read.ops", "disk.used"))
  }

  test("queryLabelValues returns sorted distinct values") {
    // reference tsdb_test.go:123-147: node domain == [vm0 vm1 vm2] sorted
    val got = disk.queryLabelValues("node", Start, Start + 120)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("vm0", "vm1", "vm2"))
    // exact mode agrees on the dense grid
    val exact = disk.queryLabelValues("node", Start, Start + 120,
        exact = true)
      .collect().map(_.getString(0)).toSeq
    assert(exact == Seq("vm0", "vm1", "vm2"))
    // the default path is dimension-only: no fact-table scan in the plan
    val plan = disk.queryLabelValues("node", Start, Start + 120)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("/samples"), plan.take(600))
  }

  test("queryLabelValues: segment-grain (default) vs exact semantics " +
      "diverge on a value whose samples sit outside the ts range") {
    import spark.implicits._
    val t = new Tsdb(spark, TsdbConf(
      dataPath = tempDir("tsdb_lv"), segmentDuration = 7200L))
    // vmA's samples share the queried segment but sit outside
    // [Start+1000, Start+2000]; vmB has a sample inside the range; vmC
    // lives in a different segment entirely
    t.insertRows(Seq(
      ("hb", Map("node" -> "vmA"), Start, 1.0),
      ("hb", Map("node" -> "vmA"), Start + 4000L, 2.0),
      ("hb", Map("node" -> "vmB"), Start + 1500L, 3.0),
      ("hb", Map("node" -> "vmC"), Start + 30000L, 4.0)
    ).toDF("metric", "labels", "ts", "value"))
    val segGrain = t.queryLabelValues("node", Start + 1000, Start + 2000)
      .collect().map(_.getString(0)).toSeq
    val exact = t.queryLabelValues("node", Start + 1000, Start + 2000,
        exact = true)
      .collect().map(_.getString(0)).toSeq
    // segment grain counts vmA (samples in the overlapping segment —
    // the reference's semantics, label.go:62-77) but not vmC (foreign
    // segment); exact counts only vmB — the engine's strictly-tighter
    // opt-in
    assert(segGrain == Seq("vmA", "vmB"), segGrain.toString)
    assert(exact == Seq("vmB"), exact.toString)
  }

  test("queryLabelNames: segment-grain name universe from the tier, " +
      "per-segment divergence honored") {
    import spark.implicits._
    val t = new Tsdb(spark, TsdbConf(
      dataPath = tempDir("tsdb_ln"), segmentDuration = 7200L))
    // segment A carries {zone}; a later segment carries {rack}
    t.insertRows(Seq(
      ("hb", Map("zone" -> "z1"), Start, 1.0),
      ("hb", Map("rack" -> "r1"), Start + 30000L, 2.0)
    ).toDF("metric", "labels", "ts", "value"))
    def names(lo: Long, hi: Long) =
      t.queryLabelNames(lo, hi).collect().map(_.getString(0)).toSeq
    assert(names(Start, Start + 100) == Seq(Tsdb.MetricLabel, "zone"))
    assert(names(Start + 30000L, Start + 30100L) ==
      Seq(Tsdb.MetricLabel, "rack"))
    assert(names(Start, Start + 40000L) ==
      Seq(Tsdb.MetricLabel, "rack", "zone"))
    // memory-mode twin answers identically
    val m = Tsdb.attach(spark, Seq(
      ("hb", Map("zone" -> "z1"), Start, 1.0),
      ("hb", Map("rack" -> "r1"), Start + 30000L, 2.0)
    ).toDF("metric", "labels", "ts", "value"))
    assert(m.queryLabelNames(Start, Start + 100)
      .collect().map(_.getString(0)).toSeq == Seq(Tsdb.MetricLabel, "zone"))
  }

  test("label_values tier: tier-served default, legacy fact fallback, " +
      "compaction backfill, retention sweep") {
    import spark.implicits._
    val path = tempDir("tsdb_lvt")
    val t = new Tsdb(spark, TsdbConf(
      dataPath = path, segmentDuration = 7200L))
    t.insertRows(Seq(
      ("hb", Map("node" -> "vmA", "dc" -> "0"), Start, 1.0),
      ("hb", Map("node" -> "vmB", "dc" -> "1"), Start + 100L, 2.0),
      ("hb", Map("node" -> "vmC", "dc" -> "0"), Start + 30000L, 3.0)
    ).toDF("metric", "labels", "ts", "value"))
    def nodes(tt: Tsdb) = tt.queryLabelValues("node", Start, Start + 200)
    // tier-served: the plan reads label_values, never the fact table or
    // the O(series) dimension
    val plan = nodes(t).queryExecution.executedPlan.toString
    assert(plan.contains("label_values"), plan.take(800))
    assert(!plan.contains("/samples") && !plan.contains("series_meta"),
      plan.take(800))
    assert(nodes(t).collect().map(_.getString(0)).toSeq == Seq("vmA", "vmB"))
    // the folded metric participates in the label universe
    assert(t.queryLabelValues(Tsdb.MetricLabel, Start, Start + 200)
      .collect().map(_.getString(0)).toSeq == Seq("hb"))
    // legacy store (pre-tier): drop the tier — the default answers the
    // same off the fact table
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/label_values"), true)
    val t2 = new Tsdb(spark, TsdbConf(
      dataPath = path, segmentDuration = 7200L))
    val legacyPlan = nodes(t2).queryExecution.executedPlan.toString
    assert(legacyPlan.contains("samples"), legacyPlan.take(800))
    assert(nodes(t2).collect().map(_.getString(0)).toSeq == Seq("vmA", "vmB"))
    // compaction backfills the tier; the default goes back to tier-served
    t2.compactSeriesMeta()
    val rebuilt = nodes(t2).queryExecution.executedPlan.toString
    assert(rebuilt.contains("label_values") && !rebuilt.contains("/samples"),
      rebuilt.take(800))
    assert(nodes(t2).collect().map(_.getString(0)).toSeq == Seq("vmA", "vmB"))
    // retention: expiring the first segment sweeps its tier rows too
    val now = Start + 30000L + t2.conf.retention
    val dropped = t2.removeExpires(now)
    assert(dropped.nonEmpty)
    val after = t2.queryLabelValues("node", Start, Start + 40000L)
      .collect().map(_.getString(0)).toSeq
    assert(after == Seq("vmC"), after.toString)
  }

  test("negative matchers (beyond reference capability)") {
    val got = disk.querySeries(
      Seq(
        LabelMatcher.re(Tsdb.MetricLabel, "disk.*"),
        LabelMatcher.neq("node", "vm1"),
        LabelMatcher.eq("dc", "0")),
      Start, Start + 120)
    assert(got.count() == 6) // 3 disk metrics x {vm0, vm2}
  }

  test("negative regex matcher and unknown-metric queries") {
    // !~ "vm[01]" leaves only vm2 series of the disk metrics at dc=0
    val got = disk.querySeries(
      Seq(
        LabelMatcher.re(Tsdb.MetricLabel, "disk.*"),
        LabelMatcher.nre("node", "vm[01]"),
        LabelMatcher.eq("dc", "0")),
      Start, Start + 120)
    assert(got.count() == 3)
    assert(got.select("labels").collect()
      .forall(_.getAs[Map[String, String]](0)("node") == "vm2"))
    // unknown metric: empty result, not an error
    assert(disk.queryRange("no.such.metric", Seq.empty, Start, Start + 120)
      .count() == 0)
    // matcher on a label no series carries: empty
    assert(disk.querySeries(
      Seq(LabelMatcher.eq("region", "mars")), Start, Start + 120).count() == 0)
  }

  test("label normalization drops empty entries; sid is label-order independent") {
    import spark.implicits._
    val a = Seq(("m", Map("b" -> "2", "a" -> "1", "" -> "x", "c" -> ""), 0L, 1.0))
      .toDF("metric", "labels", "ts", "value")
    val b = Seq(("m", Map("a" -> "1", "b" -> "2"), 0L, 1.0))
      .toDF("metric", "labels", "ts", "value")
    val t = new Tsdb(spark, TsdbConf(dataPath = "", onlyMemoryMode = true))
    val sa = t.normalize(a).select("sid").head().getLong(0)
    val sb = t.normalize(b).select("sid").head().getLong(0)
    assert(sa == sb)
    val labels = t.normalize(a).select("labels").head().getAs[Map[String, String]](0)
    assert(labels == Map("__name__" -> "m", "a" -> "1", "b" -> "2"))
  }

  test("chunked shaping bounds row size and concatenates to the full series") {
    val m = Seq(LabelMatcher.eq("node", "vm0"), LabelMatcher.eq("dc", "1"))
    val full = disk.queryRangeShaped("cpu.busy", m, Start, Start + 60 * 50)
      .collect()(0).getAs[scala.collection.Seq[Row]]("points")
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val chunked = disk.queryRangeShapedChunked(
        "cpu.busy", m, Start, Start + 60 * 50, maxPointsPerRow = 20)
      .orderBy("sid", "chunk").collect()
    assert(chunked.forall(
      _.getAs[scala.collection.Seq[Row]]("points").length <= 20))
    val reassembled = chunked.flatMap(
      _.getAs[scala.collection.Seq[Row]]("points")
        .map(r => (r.getLong(0), r.getDouble(1)))).toSeq
    assert(reassembled == full && full.length == 51)
  }

  test("series-index semi-join path equals direct predicate path") {
    val m = Seq(LabelMatcher.re("node", "vm.*"), LabelMatcher.eq("dc", "2"))
    val viaIndex = disk.queryRange("mem.used", m, Start, Start + 600,
      useSeriesIndex = true).collect().map(_.toString).sorted
    val direct = disk.queryRange("mem.used", m, Start, Start + 600,
      useSeriesIndex = false).collect().map(_.toString).sorted
    assert(viaIndex.nonEmpty && viaIndex.sameElements(direct))
  }

  test("regex fast path matches the anchored-regex semantics") {
    // prefix, suffix, contains, literal, and genuine-regex forms all hit
    // the same series as the rlike formulation
    for (pat <- Seq("disk.*", ".*ops", ".*read.*", "disk.used", "disk\\..*ops")) {
      val fast = disk.querySeries(
        Seq(LabelMatcher.re(Tsdb.MetricLabel, pat)), Start, Start + 120)
        .select("metric").distinct().collect().map(_.getString(0)).sorted.toSeq
      val ref = Metrics.filter(_.matches("^(?:" + pat + ")$")).sorted
      assert(fast == ref, s"pattern $pat")
    }
  }

  test("exactly-aligned segment boundaries are not skipped (reference off-by-one)") {
    // the reference's Choose() uses strict comparisons and can miss a
    // segment whose MinTs equals the query start (segment.go:71-85);
    // SURVEY §7.4 mandates we do not replicate that. Points exactly at
    // multiples of segmentDuration must be found by boundary queries.
    import spark.implicits._
    val boundary = 7200L * 300000 // an exact bucket start
    val df = Seq(
      ("m", Map("k" -> "v"), boundary, 1.0),
      ("m", Map("k" -> "v"), boundary - 1, 2.0),
      ("m", Map("k" -> "v"), boundary + 7199, 3.0))
      .toDF("metric", "labels", "ts", "value")
    val t = Tsdb.attach(spark, df)
    assert(t.queryRange("m", Seq.empty, boundary, boundary).count() == 1)
    assert(t.queryRange("m", Seq.empty, boundary - 1, boundary).count() == 2)
    assert(t.queryRange("m", Seq.empty, boundary, boundary + 7199).count() == 2)
  }

  test("renderLabels produces the reference's {k=\"v\"} form") {
    import spark.implicits._
    val got = Seq(Map("b" -> "2", "a" -> "1")).toDF("labels")
      .select(graft.functions.LabelFunctions.renderLabels($"labels"))
      .head().getString(0)
    assert(got == "{a=\"1\", b=\"2\"}")
  }

  test("series_meta compaction preserves content and bounds file count") {
    import spark.implicits._
    val t = new Tsdb(spark, TsdbConf(dataPath = tempDir("compact")))
    def batch(off: Long) = Seq(
      ("m1", Map("n" -> "a"), off, 1.0),
      ("m2", Map("n" -> "b"), off + 60, 2.0))
      .toDF("metric", "labels", "ts", "value")
    (0 until 5).foreach(i => t.insertRows(batch(i * 86400L)))
    val before = t.seriesMeta.orderBy("sid").collect().map(_.toString).toSeq
    // batch 1 established the base level; batches 2-5 appended fresh
    // generations, some already folded to L1 by the inline cadence
    val deltaDir = new java.io.File(t.conf.dataPath + "/series_meta")
    val foldedDir = new java.io.File(t.conf.dataPath + "/series_meta_folded")
    val baseDir = new java.io.File(t.conf.dataPath + "/series_meta_base")
    def pq(d: java.io.File): Int =
      Option(d.listFiles).map(_.count(_.getName.endsWith(".parquet")))
        .getOrElse(0)
    val filesBefore = pq(deltaDir) + pq(foldedDir) + pq(baseDir)
    t.compactSeriesMeta()
    // full consolidation: delta levels cleared, everything in the base
    assert(!deltaDir.exists(), "fresh level should be cleared")
    assert(!foldedDir.exists(), "folded level should be cleared")
    val after = t.seriesMeta.orderBy("sid").collect().map(_.toString).toSeq
    val filesAfter = pq(deltaDir) + pq(foldedDir) + pq(baseDir)
    assert(after == before)
    assert(filesAfter < filesBefore)
    assert(after.length == 2) // 2 series, merged across 5 appends
    // the consolidated read is a plain scan — no merge aggregation
    val plan = t.seriesMeta.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate"), plan.take(1500))
  }

  test("typedSamples reconstructs labels on the normalized disk layout") {
    // the fact table stores only (sid, seg, ts, value); the typed view
    // joins labels back from the broadcast series dimension. (Local copy
    // of the bound: the typed filter closure must not capture the suite.)
    val bound = Start + 120
    def pick(t: Tsdb) = t.typedSamples
      .filter(s => s.metric == "cpu.busy" &&
        s.labels.get("node").contains("vm1") &&
        s.labels.get("dc").contains("0") &&
        s.ts <= bound)
      .collect().sortBy(_.ts)
    val got = pick(disk)
    assert(got.length == 3)
    assert(got.map(_.value).toSeq ==
      Seq(Start.toDouble, (Start + 60).toDouble, (Start + 120).toDouble))
    assert(got.forall(s =>
      s.labels == Map("__name__" -> "cpu.busy", "node" -> "vm1", "dc" -> "0")
        && s.seg == s.ts / 7200))
    // memory mode: identical rows through the head path
    assert(pick(mem).toSeq == got.toSeq)
  }

  test("unified view: queries see disk segments plus the live head") {
    // reference segment.go:62-65 — the segment list always yields disk
    // segments plus the memory head, so queries span the flush boundary
    import spark.implicits._
    def rows(from: Int, until: Int): DataFrame =
      (from until until).map(i =>
        ("m", Map("k" -> "v"), Start + i * 60L, (Start + i * 60L).toDouble))
        .toDF("metric", "labels", "ts", "value")
    val t = new Tsdb(spark, TsdbConf(
      dataPath = tempDir("headdisk"), segmentDuration = 7200L))
    t.insertRows(rows(0, 100)) // durable
    t.insertHeadRows(rows(100, 240)) // live head, crosses a segment boundary
    // a range query across the flush boundary sees every point once
    val got = t.queryRange("m", Seq.empty, Start, Start + 239 * 60)
      .collect().map(r => (r.getAs[Long]("ts"), r.getAs[Double]("value")))
      .sortBy(_._1).toSeq
    assert(got == (0 until 240).map(i =>
      (Start + i * 60L, (Start + i * 60L).toDouble)))
    // metadata queries also see the head's series bounds
    assert(t.querySeries(Seq(LabelMatcher.eq("k", "v")),
      Start + 200 * 60, Start + 239 * 60).count() == 1)
    // freezing the head must not change any query result
    t.flushHead()
    val after = t.queryRange("m", Seq.empty, Start, Start + 239 * 60)
      .collect().map(r => (r.getAs[Long]("ts"), r.getAs[Double]("value")))
      .sortBy(_._1).toSeq
    assert(after == got)
  }

  test("maxRowsPerSegment is a real freeze trigger") {
    import spark.implicits._
    def rows(from: Int, until: Int): DataFrame =
      (from until until).map(i =>
        ("m", Map("k" -> "v"), Start + i * 60L, 1.0))
        .toDF("metric", "labels", "ts", "value")
    val t = new Tsdb(spark, TsdbConf(
      dataPath = tempDir("maxrows"), segmentDuration = 7200L,
      maxRowsPerSegment = 50L))
    val samplesDir = new java.io.File(t.conf.dataPath + "/samples")
    t.insertHeadRows(rows(0, 30))
    assert(!samplesDir.exists()) // below the trigger: nothing durable yet
    t.insertHeadRows(rows(30, 60)) // 60 >= 50: head auto-freezes
    assert(samplesDir.exists())
    assert(spark.read.parquet(samplesDir.toString).count() == 60)
    // the head is empty again: next small batch stays in memory
    t.insertHeadRows(rows(60, 70))
    assert(spark.read.parquet(samplesDir.toString).count() == 60)
    assert(t.queryRange("m", Seq.empty, Start, Start + 69 * 60).count() == 70)
  }

  test("enableOutdated=false rejects writes into frozen segments") {
    import spark.implicits._
    def at(i: Int): DataFrame =
      Seq(("m", Map("k" -> "v"), Start + i * 60L, 1.0))
        .toDF("metric", "labels", "ts", "value")
    val conf = TsdbConf(
      dataPath = tempDir("outdated"), segmentDuration = 7200L,
      enableOutdated = false)
    val t = new Tsdb(spark, conf)
    t.insertHeadRows(at(0))
    t.flushHead() // freezes the first 2h segment
    // a row in the frozen segment is rejected…
    assert(t.insertHeadRows(at(1)) == 1L)
    // …a row in a newer segment is accepted
    assert(t.insertHeadRows(at(130)) == 0L) // 130*60 s > 7200 s
    assert(t.queryRange("m", Seq.empty, Start, Start + 240 * 60).count() == 2)
    // with the default enableOutdated=true the same late row is accepted
    val t2 = new Tsdb(spark, conf.copy(
      dataPath = tempDir("outdated2"), enableOutdated = true))
    t2.insertHeadRows(at(0))
    t2.flushHead()
    assert(t2.insertHeadRows(at(1)) == 0L)
    assert(t2.queryRange("m", Seq.empty, Start, Start + 240 * 60).count() == 2)
  }

  test("storage is seg-partitioned and retention drops expired partitions") {
    val t = disk
    val fs = new java.io.File(t.conf.dataPath + "/samples")
    val segDirs = fs.listFiles().filter(_.getName.startsWith("seg=")).map(_.getName)
    // 4h of data at 2h segmentDuration => exactly 2 buckets + boundary
    assert(segDirs.length >= 2)
    // retention: "now" far in the future expires everything
    val dropped = t.removeExpires(Start + 100L * 86400)
    assert(dropped.nonEmpty)
    val left = fs.listFiles().filter(_.getName.startsWith("seg=")).map(_.getName)
    assert(left.isEmpty)
  }

  test("retention sweeps the derived tiers (rollup, gorilla chunks) too") {
    import spark.implicits._
    val t = new Tsdb(spark, TsdbConf(
      dataPath = tempDir("retention_tiers"), segmentDuration = 7200L,
      retention = 7L * 86400))
    // two segments of data, then materialize both derived tiers
    t.insertRows((0 until 240).map(i =>
      ("m", Map("k" -> (i % 3).toString), 1600000000L + i * 60L, i.toDouble))
      .toDF("metric", "labels", "ts", "value"))
    t.materializeRollup(3600L)
    t.materializeGorillaChunks()
    def segs(sub: String) = Option(
      new java.io.File(t.conf.dataPath + "/" + sub).listFiles)
      .map(_.count(_.getName.startsWith("seg="))).getOrElse(0)
    val before = (segs("samples"), segs("rollup_3600"), segs("gorilla_chunks"))
    assert(before._1 >= 2 && before._1 == before._2 && before._1 == before._3)
    // expire only the first segment: cutoff lands mid-data
    val dropped = t.removeExpires(1600000000L + 7L * 86400 + 7200L)
    assert(dropped == Seq(1600000000L / 7200L))
    // every tier dropped exactly the one expired bucket, kept the rest
    assert(segs("samples") == before._1 - 1)
    assert(segs("rollup_3600") == before._2 - 1)
    assert(segs("gorilla_chunks") == before._3 - 1)
    // the surviving data still serves from every path
    assert(t.queryRange("m", Seq.empty, 1600000000L, 1700000000L).count() > 0)
    assert(t.queryRangeFromChunks("m", Seq.empty, 1600000000L, 1700000000L)
      .count() > 0)
  }

  test("scheduled retention loop sweeps expired segments on its ticker") {
    import spark.implicits._
    val t = new Tsdb(spark, TsdbConf(
      dataPath = tempDir("retention_loop"), segmentDuration = 7200L,
      retention = 86400L))
    t.insertRows(Seq(("m", Map("k" -> "v"), Start, 1.0))
      .toDF("metric", "labels", "ts", "value"))
    val dir = new java.io.File(t.conf.dataPath + "/samples")
    def segs() = dir.listFiles().count(_.getName.startsWith("seg="))
    assert(segs() == 1)
    // ticker with an injected clock far past retention: the 1 s-period
    // sweep must drop the segment without any explicit removeExpires call
    t.startRetentionLoop(periodSec = 1L, clock = () => Start + 100L * 86400)
    try {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (segs() > 0 && System.nanoTime() < deadline) Thread.sleep(200)
      assert(segs() == 0, "retention ticker did not sweep within 15 s")
    } finally t.stopRetentionLoop()
  }

  test("concat-regex fast path (lit1.*lit2) matches anchored Java regex") {
    import spark.implicits._
    val values = Seq(
      "diskops", "disk-io-ops", "disk_ops", "disk", "ops", "xdiskops",
      "diskopsx", "disko", "kops", "diskkops", "dops", "ds", "d-s",
      "disk.ops", "diskXops")
    val df = values.toDF("v")
      .withColumn("labels",
        org.apache.spark.sql.functions.map(
          org.apache.spark.sql.functions.lit("k"),
          org.apache.spark.sql.functions.col("v")))
    val t = new Tsdb(spark, TsdbConf(
      dataPath = tempDir("concat_re"), onlyMemoryMode = true))
    for (pat <- Seq("disk.*ops", "disk.*kops", "d.*s", "di.*", ".*ops")) {
      val m = graft.model.LabelMatcher.re("k", pat)
      val got = df.where(t.matcherPredicate(
          org.apache.spark.sql.functions.col("labels"), Seq(m)))
        .select("v").collect().map(_.getString(0)).toSet
      val p = java.util.regex.Pattern.compile("^(?:" + pat + ")$")
      val expected = values.filter(v => p.matcher(v).find()).toSet
      assert(got == expected, s"pattern $pat")
      // and the fast path really bypassed regex evaluation
      val plan = df.where(t.matcherPredicate(
          org.apache.spark.sql.functions.col("labels"), Seq(m)))
        .queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("rlike"), s"$pat not rewritten:\n$plan")
    }
  }

  test("selector range query spans metrics on both storage layouts") {
    // fresh stores: the shared `disk` fixture is fully expired by the
    // retention test that runs earlier in this suite
    for (t <- Seq(mkTsdb(memory = false), mkTsdb(memory = true))) {
      val got = t.queryRangeSelector(
          Seq(graft.model.LabelMatcher.re(Tsdb.MetricLabel, "disk\\..*"),
            graft.model.LabelMatcher.eq("node", "vm1")),
          Start, Start + 600)
        .select(col("labels").getItem(Tsdb.MetricLabel).as("m"),
          col("labels").getItem("dc"), col("ts"), col("value"))
        .collect().map(_.toSeq).toSet
      // equals the union of the per-metric queryRange results
      val expected = Metrics.filter(_.startsWith("disk.")).flatMap { m =>
        t.queryRange(m, Seq(graft.model.LabelMatcher.eq("node", "vm1")),
            Start, Start + 600)
          .select(col("labels").getItem(Tsdb.MetricLabel).as("m"),
            col("labels").getItem("dc"), col("ts"), col("value"))
          .collect().map(_.toSeq)
      }.toSet
      assert(got == expected && got.nonEmpty)
      // and metric diversity is real: all three disk.* metrics present
      assert(got.map(_.head).size == 3)
    }
  }

  test("rollup-served aggregation merges to the raw-data answer exactly") {
    val t = mkTsdb(memory = false)
    t.materializeRollup(400L)
    // bucket-aligned window over the whole grid (Start = 1.6e9 is
    // 400-aligned; the 4h span is a whole number of 400 s buckets)
    val alignedEnd = Start + Steps * 60L - 1
    assert(Start % 400 == 0 && (alignedEnd + 1) % 400 == 0)
    val m = Seq(graft.model.LabelMatcher.eq("dc", "2"))
    val raw = t.aggregateBy("cpu.busy", m, Start, alignedEnd,
        Seq("node"), 400L)
      .orderBy("node", "bucket_start").collect().map(_.toSeq).toSeq
    val served = t.aggregateByFromRollup(400L, "cpu.busy", m, Start,
        alignedEnd, Seq("node"))
      .orderBy("node", "bucket_start").collect().map(_.toSeq).toSeq
    assert(raw.nonEmpty && served == raw)
    // misaligned windows are rejected rather than silently inexact
    intercept[IllegalArgumentException] {
      t.aggregateByFromRollup(400L, "cpu.busy", m, Start + 60, alignedEnd,
        Seq("node"))
    }
  }

  test("segment compaction merges append files, preserves every query") {
    val t = new Tsdb(spark, TsdbConf(
      dataPath = tempDir("compact"), segmentDuration = 7200L,
      compression = "zstd"))
    // three appends covering the same segments -> >= 3 files per seg dir
    Metrics.grouped(3).foreach { ms =>
      t.insertRows(grid().where(col("metric").isin(ms: _*)))
    }
    def segFileCounts(): Map[String, Int] = {
      val base = new java.io.File(s"${t.conf.dataPath}/samples")
      base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("seg="))
        .map(d => d.getName ->
          d.listFiles().count(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith("."))).toMap
    }
    def snapshot() = t
      .queryRange("cpu.busy", Seq.empty, Start, Start + Steps * 60L)
      .select(col("labels").getItem("node"), col("labels").getItem("dc"),
        col("ts"), col("value"))
      .collect().map(_.toSeq).toSet
    val before = snapshot()
    val statsBefore = t.segmentStats.orderBy("seg").collect().map(_.toSeq).toSeq
    assert(segFileCounts().values.forall(_ >= 3), s"${segFileCounts()}")
    val compacted = t.compactSegments()
    assert(compacted.nonEmpty)
    assert(segFileCounts().values.forall(_ == 1), s"${segFileCounts()}")
    assert(snapshot() == before)
    assert(t.segmentStats.orderBy("seg").collect().map(_.toSeq).toSeq
      == statsBefore)
    // idempotent: a second pass finds nothing to do
    assert(t.compactSegments().isEmpty)
  }

  test("histogramQuantile: Prometheus interpolation, zero floor, +Inf clamp") {
    import spark.implicits._
    // three groups in one step bucket, buckets [10, 20]:
    //  a: 2,4,6,8,10   phi=.5 -> first bucket, floor 0: q = 0+10*(2.5-0)/5 = 5
    //  b: 5,12,14      phi=.5 -> crossing le=20: q = 10+10*(1.5-1)/2 = 12.5
    //  c: 5,15,100     phi=.5 -> target 1.5 crosses le=20: q = 10+10*(.5)/1=15
    //     (and phi=.9 -> target 2.7 crosses +Inf: q = last finite le = 20)
    val rows =
      Seq("a" -> 2.0, "a" -> 4.0, "a" -> 6.0, "a" -> 8.0, "a" -> 10.0,
        "b" -> 5.0, "b" -> 12.0, "b" -> 14.0,
        "c" -> 5.0, "c" -> 15.0, "c" -> 100.0)
        .zipWithIndex.map { case ((g, v), i) =>
          ("m", Map("g" -> g), 1000L + i, v)
        }
    val t = Tsdb.attach(spark, rows.toDF("metric", "labels", "ts", "value"))
    def q(phi: Double): Map[String, Double] =
      t.histogramQuantile("m", Seq.empty, 0L, 5000L, Seq("g"), 100000L,
          phi, Seq(10.0, 20.0))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(q(0.5) == Map("a" -> 5.0, "b" -> 12.5, "c" -> 15.0))
    assert(q(0.9)("c") == 20.0)
  }

  test("predictLinear recovers an exact trend, excludes degenerate series") {
    import spark.implicits._
    // g=a: value = 2*x + 7 over x=0..9 -> slope 2.0, exact everywhere
    // g=b: one point -> no fit; g=c: two points at the SAME ts -> den 0
    val rows =
      (0 until 10).map(x => ("m", Map("g" -> "a"), 100L + x, 2.0 * x + 7)) ++
        Seq(("m", Map("g" -> "b"), 100L, 1.0),
          ("m", Map("g" -> "c"), 100L, 1.0), ("m", Map("g" -> "c"), 100L, 5.0))
    val t = Tsdb.attach(spark, rows.toDF("metric", "labels", "ts", "value"))
    val got = t.predictLinear("m", Seq.empty, 100L, 200L, Seq("g"),
        atSec = 150L)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("a", 2.0, 2.0 * 50 + 7)))
  }

  test("labelReplace: anchored match, capture expansion, dst overwrite") {
    import spark.implicits._
    import graft.functions.LabelFunctions.labelReplace
    val df = Seq(
      Map("src" -> "abc123", "keep" -> "x"),
      Map("src" -> "abc123", "keep" -> "x", "dst" -> "old"),
      Map("src" -> "zzz", "keep" -> "x"),      // no match -> unchanged
      Map("keep" -> "x"))                      // src absent -> unchanged
      .toDF("labels")
    val out = df.select(labelReplace(
        col("labels"), "dst", "$1", "src", "[a-z]+(\\d+)").as("l"))
      .collect().map(_.getAs[Map[String, String]]("l"))
    assert(out(0) == Map("src" -> "abc123", "keep" -> "x", "dst" -> "123"))
    assert(out(1) == Map("src" -> "abc123", "keep" -> "x", "dst" -> "123"))
    assert(out(2) == Map("src" -> "zzz", "keep" -> "x"))
    assert(out(3) == Map("keep" -> "x"))
    // anchoring: a partial match must NOT fire ("abc123x" !~ ^[a-z]+(\d+)$)
    val part = Seq(Map("src" -> "abc123x")).toDF("labels")
      .select(labelReplace(col("labels"), "dst", "$1", "src",
        "[a-z]+(\\d+)").as("l"))
      .head().getAs[Map[String, String]]("l")
    assert(part == Map("src" -> "abc123x"))
  }

  test("labelReplace: empty expansion deletes dst (Prometheus semantics)") {
    import spark.implicits._
    import graft.functions.LabelFunctions.labelReplace
    val out = Seq(
      Map("src" -> "abc", "dst" -> "old"), // match, $1 empty -> dst removed
      Map("src" -> "abc123", "dst" -> "old"), // match, $1=123 -> dst=123
      Map("dst" -> "old")) // absent src matches "" -> "" expansion -> removed
      .toDF("labels")
      .select(labelReplace(
        col("labels"), "dst", "$1", "src", "[a-z]*(\\d*)").as("l"))
      .collect().map(_.getAs[Map[String, String]]("l"))
    assert(out(0) == Map("src" -> "abc"))
    assert(out(1) == Map("src" -> "abc123", "dst" -> "123"))
    assert(out(2) == Map.empty[String, String])
  }

  test("labelJoin: sep-joined sources, missing -> empty, all-empty deletes dst") {
    import spark.implicits._
    import graft.functions.LabelFunctions.labelJoin
    val out = Seq(
      Map("a" -> "x", "b" -> "y", "dst" -> "old"), // x-y overwrites dst
      Map("a" -> "x"),                             // missing b -> "x-"
      Map("c" -> "z", "dst" -> "old"))             // both missing -> "-" kept
      .toDF("labels")
      .select(labelJoin(col("labels"), "dst", "-", Seq("a", "b")).as("l"))
      .collect().map(_.getAs[Map[String, String]]("l"))
    assert(out(0) == Map("a" -> "x", "b" -> "y", "dst" -> "x-y"))
    assert(out(1) == Map("a" -> "x", "dst" -> "x-"))
    // concat_ws skips NO args here (they're empty strings, not null), so
    // two missing sources join to the bare separator — still non-empty,
    // dst is kept; a truly empty join (one empty source, no separator
    // content) deletes dst:
    assert(out(2) == Map("c" -> "z", "dst" -> "-"))
    val single = Seq(Map("c" -> "z", "dst" -> "old")).toDF("labels")
      .select(labelJoin(col("labels"), "dst", "-", Seq("a")).as("l"))
      .collect().map(_.getAs[Map[String, String]]("l"))
    assert(single(0) == Map("c" -> "z"))
  }

  test("series_meta delta folds on the append cadence; base never rewrites") {
    import spark.implicits._
    val t = new Tsdb(spark, TsdbConf(
      dataPath = tempDir("autocompact"), metaCompactEvery = 2))
    def batch(off: Long) = Seq(
      ("m1", Map("n" -> "a"), off, 1.0),
      ("m2", Map("n" -> "b"), off + 60, 2.0))
      .toDF("metric", "labels", "ts", "value")
    // append 1 establishes the base level; append 2 accumulates a fresh
    // (L0) generation; append 3 reaches the cadence (2 generations) and
    // folds L0 into the append-only folded level (L1) — base and
    // earlier L1 generations are never rewritten
    val baseDir = new java.io.File(t.conf.dataPath + "/series_meta_base")
    t.insertRows(batch(0L))
    assert(baseDir.exists(), "first batch should establish the base level")
    val baseFiles0 = baseDir.listFiles.map(_.getName).toSet
    (1 until 3).foreach(i => t.insertRows(batch(i * 86400L)))
    val l0Dir = new java.io.File(t.conf.dataPath + "/series_meta")
    val l1Dir = new java.io.File(t.conf.dataPath + "/series_meta_folded")
    assert(!l0Dir.exists(), "fold should clear the fresh level")
    val l1Files = l1Dir.listFiles.count(_.getName.endsWith(".parquet"))
    assert(l1Files <= 4, s"expected one folded generation, got $l1Files")
    assert(baseDir.listFiles.map(_.getName).toSet == baseFiles0,
      "inline cadence fold must not rewrite the base level")
    // two more fold cycles APPEND to L1 without rewriting its files
    val l1Files0 = l1Dir.listFiles.map(_.getName).toSet
    (3 until 7).foreach(i => t.insertRows(batch(i * 86400L)))
    assert(!l0Dir.exists(), "append 7 is the fourth-cycle fold")
    assert(l1Files0.subsetOf(l1Dir.listFiles.map(_.getName).toSet),
      "later folds must never rewrite earlier folded generations")
    // the merge-on-read split keeps the base out of any shuffle: the
    // delta joins it via broadcast anti/semi probes
    val plan = t.seriesMeta.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    // and the merged content spans all seven appends
    val rows = t.seriesMeta.orderBy("metric").collect()
    assert(rows.length == 2)
    val m1 = rows.find(_.getAs[String]("metric") == "m1").get
    assert(m1.getAs[Long]("minTs") == 0L)
    assert(m1.getAs[Long]("maxTs") == 6 * 86400L)
  }

  test("close drains streaming ingest and head; reopen loses nothing") {
    import spark.implicits._
    val path = tempDir("close_drain")
    val t = new Tsdb(spark, TsdbConf(dataPath = path,
      segmentDuration = 7200L, maxRowsPerSegment = 0L))
    t.startRetentionLoop(periodSec = 3600L)
    // head-buffered rows: acknowledged to the caller but not yet durable
    val rows = (0 until 50).map(i =>
      ("m", Map("i" -> (i % 5).toString), 1600000000L + i * 60L, i.toDouble))
    t.insertHeadRows(rows.toDF("metric", "labels", "ts", "value"))
    // plus a streaming ingest query with data pending at close time
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, Long, Double)]
    mem.addData(rows.take(10).map { case (m, l, ts, v) =>
      (m, l("i"), ts + 999999L, v)
    })
    graft.streaming.Ingest.ingestStream(
      t,
      mem.toDF().toDF("metric", "i", "ts", "value")
        .withColumn("labels", map(lit("i"), col("i")))
        .select("metric", "labels", "ts", "value"),
      tempDir("close_ckpt"), triggerMs = 100L)
    t.close()
    // everything acknowledged before close() is served by a fresh instance
    val t2 = new Tsdb(spark, TsdbConf(dataPath = path, segmentDuration = 7200L))
    assert(t2.samples.count() == 60L)
    assert(t2.seriesMeta.count() == 5L)
  }

  test("filesPerSegment sub-buckets the write: bounded files per seg, " +
      "whole series per file, read-back identical to the default layout") {
    val data = grid()
    val t1 = new Tsdb(spark, TsdbConf(dataPath = tempDir("fps1"),
      segmentDuration = 7200L))
    t1.insertRows(data)
    val t4 = new Tsdb(spark, TsdbConf(dataPath = tempDir("fps4"),
      segmentDuration = 7200L, filesPerSegment = 4))
    // at toy scale AQE coalesces the sub-bucket shuffle back to one
    // task (the knob is an upper BOUND on files, not a floor); disable
    // coalescing for the write so the fan-out is observable here
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    try t4.insertRows(data)
    finally spark.conf.set(coalesceKey, prev)
    // read-back equality: same rows either way (layout is invisible)
    val key = Seq("sid", "ts", "value")
    assert(t4.samples.select(key.map(col): _*).except(
      t1.samples.select(key.map(col): _*)).isEmpty &&
      t1.samples.select(key.map(col): _*).except(
        t4.samples.select(key.map(col): _*)).isEmpty)
    // files per seg bucket bounded by the knob (>1 proves the sub-bucket
    // shuffle engaged; the grid spans multiple buckets)
    val perSeg = t4.samples
      .select(col("seg"), input_file_name().as("f"))
      .groupBy("seg").agg(countDistinct("f").as("nf"))
      .collect().map(r => r.getLong(1))
    // the knob is an upper bound per segment; the fan-out itself is
    // asserted on the max across segments (a per-segment >=2 would
    // depend on how the fixture's sids happen to hash into sub-buckets)
    assert(perSeg.nonEmpty && perSeg.forall(_ <= 4), perSeg.mkString(","))
    assert(perSeg.max >= 2, perSeg.mkString(","))
    // series locality: every sid lands whole inside ONE file per bucket
    val maxFilesPerSid = t4.samples
      .select(col("sid"), col("seg"), input_file_name().as("f"))
      .groupBy("sid", "seg").agg(countDistinct("f").as("nf"))
      .agg(max("nf")).head().getLong(0)
    assert(maxFilesPerSid == 1L)
  }
}
