package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-shared parquet tables (`TESTDATA.md`).
  *
  * `events.ts` has been written by the driver as either parquet
  * `TIMESTAMP(NANOS)` (older corpora — Spark's vectorized reader rejects
  * it unless `spark.sql.legacy.parquet.nanosAsLong=true` reads it as an
  * epoch-nanos Long) or `timestamp[us]` (current corpora — Spark reads
  * TIMESTAMP_NTZ). [[events]] derives the same `ts_s` exact epoch-seconds
  * column from either physical type, matching DuckDB's
  * `epoch_ns(ts) // 1000000000` on the same file: the session timezone is
  * pinned to UTC so a naive timestamp means the same instant in both
  * engines. All confs are set defensively at read time (runtime SQL
  * confs) because the driver owns the SparkSession.
  */
object Tables {

  private def withNanos(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // naive (NTZ) timestamps are UTC instants, exactly as DuckDB's
    // epoch_ns treats them
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // map_concat must overwrite duplicate keys, like the reference's label
    // folding (label.go:221-228).
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark
  }

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    withNanos(spark).read.parquet(s"$dir/$name.parquet")

  /** Events with `ts` NORMALIZED to an epoch-nanos Long (matching
    * DuckDB's `epoch_ns(ts)` on the same file, whatever the physical
    * type) and derived `ts_s` epoch seconds (floor). Downstream
    * consumers — as-of ordering keys, csv round-trips, scale tools —
    * always see the Long form. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    val tsNanos = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => expr("unix_micros(cast(ts as timestamp)) * 1000")
    }
    raw.withColumn("ts", tsNanos)
      .withColumn("ts_s", expr("ts div 1000000000"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
