package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketing = the co-located-join strategy at fleet scale: both fact
  * tables pre-hashed into the same bucket layout join WITHOUT a shuffle
  * exchange. This is how the engine's big fact-fact joins (samples ⋈
  * samples, lineitem ⋈ orders) avoid re-shuffling 100 TB per query.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed fact tables join with no shuffle exchange") {
    val loc = tempDir("bucketdb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '$loc'")
    Tables.lineitem(spark, sf0001)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bucketdb.li_b")
    Tables.orders(spark, sf0001)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bucketdb.ord_b")

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketdb.li_b")
        .join(spark.table("bucketdb.ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // the join children read bucketed files directly: no hash-partition
      // exchange below the join (the aggregation after it may still shuffle)
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        joinPart.take(2000))
      // and it computes the same answer as the unbucketed plan
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS bucketdb.li_b")
      spark.sql("DROP TABLE IF EXISTS bucketdb.ord_b")
      spark.sql("DROP DATABASE IF EXISTS bucketdb")
    }
  }
}
