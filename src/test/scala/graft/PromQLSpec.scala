package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.LabelMatcher
import graft.promql.PromQL

/** The PromQL string front-end must be a pure re-expression of the direct
  * operator API: for every supported shape, parse-and-run returns EXACTLY
  * the direct call's rows (same columns, same values). That equality is
  * the whole correctness argument — the compiler adds no execution paths,
  * so the operators' oracle checks transfer to every compiled string.
  */
class PromQLSpec extends SparkSuite {

  private lazy val events: DataFrame = {
    val t = graft.sources.Tables.events(spark, sf0001)
    t.select(
      col("event_type").as("metric"),
      map(
        lit("user_id"), col("user_id").cast("string"),
        lit("cohort"), pmod(col("user_id"), lit(10)).cast("string"))
        .as("labels"),
      col("ts_s").as("ts"),
      col("value"))
  }
  private lazy val t: Tsdb = Tsdb.attach(spark, events)
  private val T0 = 1704412800L
  private val T1 = 1705017599L

  private def assertSame(byString: DataFrame, direct: DataFrame): Unit = {
    assert(byString.columns.toSeq == direct.columns.toSeq,
      s"columns: ${byString.columns.toSeq} vs ${direct.columns.toSeq}")
    val cols = byString.schema.fields.filterNot(
      _.dataType.typeName == "map").map(f => col(f.name)).toSeq
    val a = byString.orderBy(cols: _*).collect().toSeq
    val b = direct.orderBy(cols: _*).collect().toSeq
    assert(a == b, s"rows differ: ${a.take(3)} vs ${b.take(3)}")
  }

  test("sum by (cohort) (click[1h]) == aggregateBy") {
    assertSame(
      PromQL.query(t, "sum by (cohort) (click[1h])", T0, T1),
      t.aggregateBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L))
  }

  test("selector with matchers and offset compiles to queryRange") {
    assertSame(
      PromQL.query(t, """click{cohort="3"}""", T0, T1),
      t.queryRange("click", Seq(LabelMatcher.eq("cohort", "3")), T0, T1))
    assertSame(
      PromQL.query(t,
        """sum by (cohort) (click{cohort!="3"}[1h] offset 1d)""",
        T0 + 86400L, T1),
      t.aggregateBy("click", Seq(LabelMatcher.neq("cohort", "3")),
        T0 + 86400L, T1, Seq("cohort"), 3600L, offsetSec = 86400L))
  }

  test("regex matchers parse to the regex fast-path matcher") {
    assertSame(
      PromQL.query(t, """sum by (cohort) (click{cohort=~"1|2"}[1h])""",
        T0, T1),
      t.aggregateBy("click",
        Seq(LabelMatcher.re("cohort", "1|2")), T0, T1, Seq("cohort"), 3600L))
  }

  test("stddev / quantile / count_values by") {
    assertSame(
      PromQL.query(t, "stddev by (cohort) (click[1h])", T0, T1),
      t.stddevBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L))
    assertSame(
      PromQL.query(t, "quantile(0.95, click[1h]) by (cohort)", T0, T1),
      t.quantileBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L, 0.95))
    assertSame(
      PromQL.query(t, """count_values("v", click[1d]) by (cohort)""",
        T0, T1),
      t.countValuesBy("click", Seq.empty, T0, T1, Seq("cohort"), 86400L))
  }

  test("topk / bottomk over sum by") {
    assertSame(
      PromQL.query(t, "topk(3, sum by (cohort) (click[1h]))", T0, T1),
      t.topKBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L, 3))
    assertSame(
      PromQL.query(t, "bottomk(3, sum by (cohort) (click[1h]))", T0, T1),
      t.bottomKBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L, 3))
  }

  test("counter family: rate / increase / resets under sum by") {
    assertSame(
      PromQL.query(t, "sum by (cohort) (increase(click[1h]))", T0, T1),
      t.aggregateIncreaseBy("click", Seq.empty, T0, T1, Seq("cohort"),
        3600L))
    assertSame(
      PromQL.query(t, "sum by (cohort) (rate(click[1h]))", T0, T1),
      t.aggregateIncreaseBy("click", Seq.empty, T0, T1, Seq("cohort"),
        3600L))
    assertSame(
      PromQL.query(t, "sum by (cohort) (resets(click[1h]))", T0, T1),
      t.resetsBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L))
  }

  test("changes under sum by; irate/idelta per series") {
    assertSame(
      PromQL.query(t, "sum by (cohort) (changes(click[1h]))", T0, T1),
      t.changesBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L))
    assertSame(
      PromQL.query(t, "irate(click[1h]) by (user_id)", T0, T1),
      t.instantDeltaBy("click", Seq.empty, T0, T1, Seq("user_id"), 3600L))
  }

  test("changes >= resets on every group (a reset is a change)") {
    val ch = t.changesBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L)
      .select(col("cohort"), col("bucket_start"), col("changes"))
    val rs = t.resetsBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L)
      .select(col("cohort"), col("bucket_start"), col("resets"))
    val bad = ch.join(rs, Seq("cohort", "bucket_start"))
      .where(col("changes") < col("resets")).count()
    assert(bad == 0L)
  }

  test("*_over_time family and quantile_over_time") {
    assertSame(
      PromQL.query(t, "avg_over_time(click[30m]) by (cohort)", T0, T1),
      t.overTimeBy("click", Seq.empty, T0, T1, Seq("cohort"), 1800L, 1800L))
    assertSame(
      PromQL.query(t, "quantile_over_time(0.5, click[1h]) by (cohort)",
        T0, T1),
      t.quantileBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L, 0.5))
  }

  test("predict_linear and absent") {
    assertSame(
      PromQL.query(t, "predict_linear(click[1h], 1h) by (user_id)", T0, T1),
      t.predictLinear("click", Seq.empty, T0, T1, Seq("user_id"),
        T1 + 3600L))
    // present metric → empty; absent metric → the single 1.0 row
    assert(PromQL.query(t, "absent(click)", T0, T1).count() == 0L)
    val gone = PromQL.query(t, "absent(no_such_metric)", T0, T1).collect()
    assert(gone.map(_.getDouble(0)).toSeq == Seq(1.0))
  }

  test("absent_over_time: parse == direct; complements present grid") {
    assertSame(
      PromQL.query(t, """absent_over_time(click{user_id="7"}[1h])""",
        T0, T1),
      t.absentOverTime("click", Seq(LabelMatcher.eq("user_id", "7")),
        T0, T1, 3600L, 3600L))
    // every hourly grid point is either absent or covered, never both
    val absent = t.absentOverTime("click",
      Seq(LabelMatcher.eq("user_id", "7")), T0, T1, 3600L, 3600L)
    val present = t.overTimeBy("click",
      Seq(LabelMatcher.eq("user_id", "7")), T0, T1, Seq.empty,
      3600L, 3600L).select("eval_ts").distinct()
    val gridN = (T1 - T0) / 3600L + 1  // T0 is grid-aligned
    assert(absent.count() + present.count() == gridN)
    assert(absent.join(present, "eval_ts").count() == 0L)
  }

  test("arithmetic vector matches (/ * + -) == binaryOpBy") {
    assertSame(
      PromQL.query(t,
        "sum by (cohort) (purchase[1h]) / sum by (cohort) (click[1h])",
        T0, T1),
      t.binaryOpBy("purchase", "click", Seq.empty, T0, T1, Seq("cohort"),
        3600L)((a, b) => round(a / b, 6)))
    assertSame(
      PromQL.query(t,
        "sum by (cohort) (purchase[1h]) + sum by (cohort) (click[1h])",
        T0, T1),
      t.binaryOpBy("purchase", "click", Seq.empty, T0, T1, Seq("cohort"),
        3600L)((a, b) => a + b))
    assertSame(
      PromQL.query(t,
        "sum by (cohort) (purchase[1h]) - sum by (cohort) (click[1h])",
        T0, T1),
      t.binaryOpBy("purchase", "click", Seq.empty, T0, T1, Seq("cohort"),
        3600L)((a, b) => a - b))
    assertSame(
      PromQL.query(t,
        "sum by (cohort) (purchase[1h]) * sum by (cohort) (click[1h])",
        T0, T1),
      t.binaryOpBy("purchase", "click", Seq.empty, T0, T1, Seq("cohort"),
        3600L)((a, b) => a * b))
  }

  test("without clause resolves against the series label universe") {
    // labels are {user_id, cohort}: without (user_id) ≡ by (cohort)
    assertSame(
      PromQL.query(t, "sum without (user_id) (click[1h])", T0, T1),
      t.aggregateBy("click", Seq.empty, T0, T1, Seq("cohort"), 3600L))
    // without() on both sides of a vector match
    assertSame(
      PromQL.query(t,
        "sum without (user_id) (purchase[1h]) / " +
        "sum without (user_id) (click[1h])", T0, T1),
      t.binaryOpBy("purchase", "click", Seq.empty, T0, T1, Seq("cohort"),
        3600L)((a, b) => round(a / b, 6)))
    // by and without together is a parse error
    val e = intercept[IllegalArgumentException](
      PromQL.parse("sum by (cohort) without (user_id) (click[1h])"))
    assert(e.getMessage.contains("either 'by' or 'without'"))
    // a grouping clause on both sides of the body is a loud error,
    // never a silent drop of one of them
    val e2 = intercept[IllegalArgumentException](
      PromQL.parse("sum by (cohort) (click[1h]) by (user_id)"))
    assert(e2.getMessage.contains("duplicate 'by'"))
  }

  test("histogram_quantile compiles with caller-supplied buckets") {
    val buckets = Seq(5.0, 10.0, 25.0, 50.0, 100.0, 250.0)
    assertSame(
      PromQL.query(t, "histogram_quantile(0.9, click[1h]) by (cohort)",
        T0, T1, buckets),
      t.histogramQuantile("click", Seq.empty, T0, T1, Seq("cohort"),
        3600L, 0.9, buckets))
    val e = intercept[IllegalArgumentException](
      PromQL.query(t, "histogram_quantile(0.9, click[1h]) by (cohort)",
        T0, T1))
    assert(e.getMessage.contains("bucket bounds"))
  }

  test("rollup-served compile equals the raw compile exactly") {
    val path = tempDir("promql_rollup")
    val disk = new Tsdb(spark, graft.model.TsdbConf(
      dataPath = path, compression = "zstd", segmentDuration = 86400L))
    disk.insertRows(events)
    disk.materializeRollup(3600L)
    val q = "sum by (cohort) (click[1h])"
    assertSame(
      PromQL.queryFromRollup(disk, q, T0, T1, 3600L),
      PromQL.query(disk, q, T0, T1))
    val ratio =
      "sum by (cohort) (purchase[1h]) / sum by (cohort) (click[1h])"
    assertSame(
      PromQL.queryFromRollup(disk, ratio, T0, T1, 3600L),
      PromQL.query(disk, ratio, T0, T1))
    // grid mismatch must throw, not approximate
    val e = intercept[IllegalArgumentException](
      PromQL.queryFromRollup(disk, "sum by (cohort) (click[30m])",
        T0, T1, 3600L))
    assert(e.getMessage.contains("rollup step"))
  }

  test("group_left one-to-many vector match == binaryOpByGroupLeft") {
    assertSame(
      PromQL.query(t,
        "sum by (cohort, user_id) (purchase[1d]) / on (cohort) " +
        "group_left sum by (cohort) (click[1d])", T0, T1),
      t.binaryOpByGroupLeft("purchase", "click", Seq.empty, T0, T1,
        Seq("cohort", "user_id"), Seq("cohort"), 86400L)(
        (a, b) => round(a / b, 6)))
    // on-labels must equal the right side's grouping
    val e = intercept[IllegalArgumentException](
      PromQL.query(t,
        "sum by (cohort, user_id) (purchase[1d]) / on (user_id) " +
        "group_left sum by (cohort) (click[1d])", T0, T1))
    assert(e.getMessage.contains("on-labels"))
  }

  test("chunk-tier selector serve equals the raw range scan") {
    val disk = new Tsdb(spark, graft.model.TsdbConf(
      dataPath = tempDir("promql_chunks"), compression = "zstd",
      segmentDuration = 86400L))
    disk.insertRows(events)
    disk.materializeGorillaChunks()
    assertSame(
      PromQL.queryFromChunks(disk, """click{cohort="3"}""", T0, T1),
      disk.queryRange("click", Seq(LabelMatcher.eq("cohort", "3")),
        T0, T1))
    val e = intercept[IllegalArgumentException](
      PromQL.queryFromChunks(disk, "sum by (cohort) (click[1h])", T0, T1))
    assert(e.getMessage.contains("bare selectors"))
  }

  test("README example strings parse (dotted mandodb metric names)") {
    Seq(
      """topk(3, sum by (dc) (cpu.busy[5m]))""",
      """sum without (node) (rate(net.in.bytes{dc=~"eu.*"}[1m]))""",
      """irate(cpu.busy[1m]) by (node)""",
      """sum by (dc) (cpu.busy[1h])""").foreach(PromQL.parse)
  }

  test("malformed and unsupported input fails with a clear message") {
    val bad = Seq(
      "sum by (cohort) (click[1h]",          // unbalanced paren
      """click{cohort=3}""",                  // unquoted matcher value
      "topk(3, avg by (cohort) (click[1h]))", // unsupported rank body
      "sum by (cohort) (click)")              // missing step range
    bad.foreach { q =>
      val e = intercept[IllegalArgumentException](
        PromQL.query(t, q, T0, T1).collect())
      assert(e.getMessage.nonEmpty)
    }
  }
}
