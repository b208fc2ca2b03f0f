package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.{LabelMatcher, TsdbConf}
import graft.sources.Tables
import graft.{SparkEntry, Tsdb}

/** Dev-only: dump physical plans of scale-critical queries and grep-able
  * evidence of partition pruning / predicate pushdown / broadcast joins.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    // 1. disk-backed TSDB: partition pruning + ts pushdown
    val path = java.nio.file.Files.createTempDirectory("audit").toString
    val t = new Tsdb(spark, TsdbConf(dataPath = path))
    t.insertRows(
      Tables.events(spark, dir).select(
        col("event_type").as("metric"),
        map(lit("user_id"), col("user_id").cast("string")).as("labels"),
        col("ts_s").as("ts"),
        col("value")))
    println("=== queryRange over disk store (expect PartitionFilters on seg, PushedFilters on ts)")
    t.queryRange("click", Seq(LabelMatcher.eq("user_id", "7")),
      1704412800L, 1704419999L).explain("formatted")

    println("=== q5_region_revenue (expect BroadcastHashJoin for nation/region, pushed date filter)")
    SparkEntry.queries("q5_region_revenue")(spark, dir).explain("formatted")

    println("=== q1_agg (expect pushed l_shipdate filter, partial HashAggregate)")
    SparkEntry.queries("q1_agg")(spark, dir).explain("formatted")

    println("=== q_asof_join (expect single shuffle by user_id, no theta join)")
    SparkEntry.queries("q_asof_join")(spark, dir).explain("formatted")

    println("=== dedup_minhash_lsh (expect NO broadcast of the full shingle dimension — verification joins only candidate-sized relations; graft_minhash_sig in the scan stage, no signature shuffle)")
    SparkEntry.queries("dedup_minhash_lsh")(spark, dir).explain("formatted")

    println("=== ann_topk_lsh (expect graft_plane_proj/graft_probe_buckets map-side, ONE aggregation Exchange after the bucket join)")
    SparkEntry.queries("ann_topk_lsh")(spark, dir).explain("formatted")

    println("=== text_tfidf (expect partial HashAggregates for tf/df, broadcast of the single-row corpus count)")
    SparkEntry.queries("text_tfidf")(spark, dir).explain("formatted")

    spark.stop()
  }
}
