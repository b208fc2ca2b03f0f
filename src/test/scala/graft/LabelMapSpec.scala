package graft

import org.apache.spark.sql.functions._
import graft.functions.LabelFunctions._
import graft.plans.{CanonicalLabelsRender, FoldNormalizeLabels}

/** The fused label expressions (graft.plans.FoldNormalizeLabels /
  * CanonicalLabelsRender) must be ENTRY-FOR-ENTRY identical — including
  * map entry order, schema, and null placement — to the higher-order
  * chains they replace (foldMetric∘normalizeLabels∘coalesce and
  * sort_array+transform rendering), on every adversarial shape the
  * chain semantics distinguish: null maps, null/empty keys and values,
  * a user-supplied __name__ label (LAST_WIN overwrite IN PLACE), and a
  * null metric.
  */
class LabelMapSpec extends SparkSuite {

  private def fixture = {
    import spark.implicits._
    Seq(
      // plain two-label set
      ("click", Map("user_id" -> "7", "cohort" -> "3")),
      // empty-valued and empty-keyed entries must drop
      ("click", Map("user_id" -> "8", "bad" -> "", "" -> "x")),
      // user-supplied __name__ must be OVERWRITTEN IN PLACE (LAST_WIN
      // keeps the first position, last value)
      ("view", Map("__name__" -> "spoofed", "z" -> "1", "a" -> "2")),
      // single label
      ("view", Map("cohort" -> "9")),
      // empty map
      ("buy", Map.empty[String, String])
    ).toDF("metric", "labels")
  }

  private def withNulls = {
    // null labels map, null metric, null label values — via SQL so the
    // nullability is real
    spark.sql(
      """SELECT * FROM VALUES
        |  ('click', map('user_id', CAST(NULL AS STRING), 'cohort', '3')),
        |  (CAST(NULL AS STRING), map('user_id', '1')),
        |  ('view', CAST(NULL AS MAP<STRING,STRING>))
        |  AS t(metric, labels)""".stripMargin)
  }

  private def chain(df: org.apache.spark.sql.DataFrame) =
    df.select(foldMetric(col("metric"),
      normalizeLabels(coalesce(col("labels"),
        expr("cast(map() as map<string,string>)")))).as("labels"))

  private def fused(df: org.apache.spark.sql.DataFrame) =
    df.select(FoldNormalizeLabels.fold(col("metric"), col("labels"))
      .as("labels"))

  test("fold+normalize fusion is entry-for-entry identical to the chain") {
    for (df <- Seq(fixture, withNulls)) {
      val want = chain(df).selectExpr("map_entries(labels) e").collect()
      val got = fused(df).selectExpr("map_entries(labels) e").collect()
      assert(got.toSeq == want.toSeq)
    }
  }

  test("fused fold schema matches the chain (valueContainsNull included)") {
    assert(fused(fixture).schema == chain(fixture).schema)
    assert(fused(withNulls).schema == chain(withNulls).schema)
  }

  test("canonical render fusion matches sort_array+transform exactly") {
    for (df <- Seq(fixture, withNulls)) {
      val normalized = fused(df)
      val want = normalized.select(canonicalLabels(col("labels")).as("c"))
        .collect().map(_.getString(0)).toSeq
      val got = normalized.select(
        CanonicalLabelsRender.render(col("labels")).as("c"))
        .collect().map(_.getString(0)).toSeq
      assert(got == want)
      // and therefore identical sids
      val sidWant = normalized.select(sidOf(col("labels"))).collect()
        .map(_.getLong(0)).toSeq
      val sidGot = normalized.select(
        xxhash64(CanonicalLabelsRender.render(col("labels")))).collect()
        .map(_.getLong(0)).toSeq
      assert(sidGot == sidWant)
    }
  }

  test("canonical render handles null values inside the map like concat_ws") {
    // a null-valued entry renders the key alone ("k"), not "k=null";
    // normalize only produces this for a null metric, but the kernel must
    // mirror concat_ws for any input
    val df = spark.sql(
      """SELECT map('b', CAST(NULL AS STRING), 'a', '1') AS labels""")
    val want = df.select(canonicalLabels(col("labels"))).collect()
      .map(_.getString(0)).toSeq
    val got = df.select(CanonicalLabelsRender.render(col("labels")))
      .collect().map(_.getString(0)).toSeq
    assert(got == want)
  }

  test("SimplifyFoldedLabelLookup: lookups fold to value expressions, " +
      "values identical") {
    import spark.implicits._
    // the Tsdb constructor registers the rule; build via attach so the
    // real normalize shape is exercised
    val rows = Seq(
      ("click", 7L, 1000L, 1.0), ("click", 13L, 2000L, 2.0),
      ("view", 7L, 1500L, 3.0))
      .toDF("metric0", "user_id", "ts", "value")
      .select(col("metric0").as("metric"),
        map(lit("user_id"), col("user_id").cast("string"),
          lit("cohort"), pmod(col("user_id"), lit(10)).cast("string"))
          .as("labels"),
        col("ts"), col("value"))
    val t = Tsdb.attach(spark, rows)
    val q = t.queryRange("click", Seq.empty, 0L, 3000L)
      .select(col("labels").getItem("cohort").as("cohort"),
        col("labels").getItem("user_id").as("uid"),
        col("labels").getItem("__name__").as("name"),
        col("labels").getItem("absent").as("missing"),
        col("value"))
      .orderBy("uid")
    val got = q.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.isNullAt(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(("3", "13", "click", true, 2.0),
      ("7", "7", "click", true, 1.0)))
    // the optimized plan's lookups are gone: no GetMapValue over the fold
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("[cohort]") && !optimized.contains("[absent]"),
      s"map lookups survived optimization:\n$optimized")
  }

  test("fused expressions are codegen-friendly (no CodegenFallback)") {
    // the fusion's point: the scan-stage Project of tsdb queries becomes
    // whole-stage-codegen'd — the interpreted HOF chain is gone
    val t = Tsdb.attach(spark, fixture.select(
      col("metric"), col("labels"), lit(1000L).as("ts"), lit(1.0).as("value")))
    val plan = t.queryRange("click", Seq.empty, 0L, 2000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("map_filter"), s"map_filter survived:\n$plan")
    assert(!plan.contains("map_concat"), s"map_concat survived:\n$plan")
  }
}
