package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.plans.AsOfJoinNative
import graft.sources.Tables

/** The native AsOfJoinExec (custom LogicalPlan + Strategy + SparkPlan)
  * must produce exactly the union-window formulation's results, and its
  * physical plan must shuffle/sort each side independently (no union).
  */
class AsOfNativeSpec extends SparkSuite {

  test("native as-of join equals the union-window formulation") {
    val e = Tables.events(spark, sf0001)
    val clicks = e.where(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val native = AsOfJoinNative.join(clicks, purchases,
        "user_id", "p_user", "ts", "p_ts")
      .select(col("event_id"), col("p_ts"), col("p_value"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val reference = EventOps.asOfJoinBackward(
        clicks,
        e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("ts").as("p_ts"),
            col("value").as("p_value")),
        "user_id", "ts", Seq("p_ts", "p_value"))
      .select(col("event_id"),
        col("matched").getField("p_ts").as("p_ts"),
        col("matched").getField("p_value").as("p_value"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(native == reference && native.nonEmpty)
  }

  test("native as-of plan shuffles each side independently (no union)") {
    val e = Tables.events(spark, sf0001)
    val clicks = e.where(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val plan = AsOfJoinNative.join(clicks, purchases,
        "user_id", "p_user", "ts", "p_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(1500))
    assert(!plan.contains("Union"), plan.take(1500))
    // two exchanges: one per side, inserted by EnsureRequirements
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2,
      plan.take(2000))
  }

  test("empty right side yields all-null matches") {
    import spark.implicits._
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "ts")
    val r = Seq.empty[(Long, Long, Double)].toDF("rk", "rts", "v")
    val out = AsOfJoinNative.join(l, r, "k", "rk", "ts", "rts").collect()
    assert(out.length == 2 && out.forall(_.isNullAt(3)))
  }

  test("null keys and timestamps are unmatched, not an NPE") {
    import spark.implicits._
    val l = Seq(
      (Some(1L), Some(10L), "a"),
      (None, Some(10L), "nullkey"),
      (Some(1L), None, "nullts"),
      (Some(2L), Some(20L), "b"))
      .toDF("k", "ts", "tag")
    val r = Seq(
      (Some(1L), Some(5L), 1.0),
      (None, Some(1L), -1.0), // null right key: never matches
      (Some(2L), None, -2.0), // null right ts: never matches
      (Some(2L), Some(15L), 2.0))
      .toDF("rk", "rts", "v")
    val out = AsOfJoinNative.join(l, r, "k", "rk", "ts", "rts")
      .select("tag", "v").collect()
      .map(row => (row.getString(0),
        if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toSet
    assert(out == Set(
      ("a", Some(1.0)), ("b", Some(2.0)),
      ("nullkey", None), ("nullts", None)))
  }

  test("AQE + mismatched child partition counts: EnsureRequirements co-partitions") {
    import spark.implicits._
    withSQLConf("spark.sql.adaptive.enabled" -> "true") {
      val l = (0 until 500).map(i => (i % 7L, i.toLong, s"l$i"))
        .toDF("k", "ts", "tag").repartition(7)
      val r = (0 until 300).map(i => (i % 7L, i.toLong - 3, i * 1.0))
        .toDF("rk", "rts", "v").repartition(13)
      val native = AsOfJoinNative.join(l, r, "k", "rk", "ts", "rts")
        .select("tag", "v").collect()
        .map(row => (row.getString(0),
          if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toSet
      val reference = EventOps.asOfJoinBackward(
          l, r.select(col("rk").as("k"), col("rts").as("ts"),
            col("rts").as("m_rts"), col("v").as("m_v")),
          "k", "ts", Seq("m_rts", "m_v"))
        .select(col("tag"), col("matched").getField("m_v").as("v")).collect()
        .map(row => (row.getString(0),
          if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toSet
      assert(native == reference && native.size == 500)
    }
  }
}
