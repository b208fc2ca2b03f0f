package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tsdb
import graft.model.TsdbConf
import graft.sources.Tables

/** Dev-only: where does insertRows time go at sf0.1? */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val factor = sys.env.getOrElse("SPARK_GRAFT_INGEST_X", "1").toInt
    val rows = Tables.events(spark, "/root/testdata/sf0.1")
      .withColumn("copy", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        col("event_type").as("metric"),
        map(lit("user_id"),
          (col("user_id") + col("copy") * 150).cast("string")).as("labels"),
        (col("ts_s") + col("copy")).as("ts"),
        col("value"))
      // the sf0.1 events file reads as ONE partition and narrow stages
      // inherit it — spread like any parallel source (see IngestBench)
      .repartition(32)
      .localCheckpoint()
    time("warm read")(rows.count())
    val t = new Tsdb(spark, TsdbConf(
      dataPath = java.nio.file.Files.createTempDirectory("pi").toString))
    val norm = t.normalize(rows)
    time("normalize+count")(norm.count())
    time("samples write")(
      norm.repartition(col("seg")).write.mode("append")
        .option("compression", "zstd").partitionBy("seg")
        .parquet(t.conf.dataPath + "/s2"))
    time("meta write")(
      norm.groupBy("sid").agg(first("metric"), first("labels"),
        min("ts"), max("ts"))
        .write.mode("append").parquet(t.conf.dataPath + "/m2"))
    time("full insertRows")(t.insertRows(rows))
    time("segmentStats")(t.segmentStats.count())
    // hypothesis: repartition(seg) caps write parallelism at the distinct
    // segment count (~7-11 for a week of data) — salt it
    time("samples write salted x8")(
      norm.repartition(col("seg"), pmod(col("sid"), lit(8)))
        .sortWithinPartitions("sid", "ts")
        .write.mode("append")
        .option("compression", "zstd").partitionBy("seg")
        .parquet(t.conf.dataPath + "/s3"))
    time("samples write salted x32")(
      norm.repartition(col("seg"), pmod(col("sid"), lit(32)))
        .sortWithinPartitions("sid", "ts")
        .write.mode("append")
        .option("compression", "zstd").partitionBy("seg")
        .parquet(t.conf.dataPath + "/s4"))
    // hypothesis: coalesce(4) throttles the meta reduce to 4 tasks
    time("meta write no-coalesce")(
      norm.groupBy("sid").agg(first("metric"), first("labels"),
        min("ts"), max("ts"))
        .write.mode("append").parquet(t.conf.dataPath + "/m3"))
    time("samples write unsorted salted x8")(
      norm.repartition(col("seg"), pmod(col("sid"), lit(8)))
        .write.mode("append")
        .option("compression", "zstd").partitionBy("seg")
        .parquet(t.conf.dataPath + "/s5"))
    spark.stop()
  }
}
