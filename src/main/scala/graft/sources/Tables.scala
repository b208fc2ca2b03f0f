package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-shared parquet tables (`TESTDATA.md`).
  *
  * `events.ts` is written as parquet `TIMESTAMP(NANOS)`, which Spark's
  * vectorized reader rejects by default; `spark.sql.legacy.parquet
  * .nanosAsLong=true` reads it as an epoch-nanos Long. We set that conf
  * defensively at read time (it is a runtime SQL conf) because the driver
  * owns the SparkSession. Derived column `ts_s` = exact integer-division
  * epoch seconds, matching DuckDB's `epoch_ns(ts) // 1000000000`.
  */
object Tables {

  private def withNanos(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // map_concat must overwrite duplicate keys, like the reference's label
    // folding (label.go:221-228).
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark
  }

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    withNanos(spark).read.parquet(s"$dir/$name.parquet")

  /** Events with `ts` = epoch-nanos Long and derived `ts_s` epoch seconds. */
  def events(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "events")
      .withColumn("ts_s", expr("ts div 1000000000"))

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
