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
}
