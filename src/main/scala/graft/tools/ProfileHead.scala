package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tsdb
import graft.model.TsdbConf
import graft.sources.Tables

/** Dev-only: where does insertHeadRows time go? Components timed on the
  * same slices IngestBench feeds it. */
object ProfileHead {
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
    val factor = sys.env.getOrElse("SPARK_GRAFT_INGEST_X", "20").toInt
    val rows = Tables.events(spark, "/root/testdata/sf0.1")
      .withColumn("copy", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        col("event_type").as("metric"),
        map(lit("user_id"),
          (col("user_id") + col("copy") * 150).cast("string")).as("labels"),
        (col("ts_s") + col("copy")).as("ts"),
        col("value"))
      // SPARK_GRAFT_PARTS=1 reproduces the round-≤6 accidental
      // single-partition feed (the sf0.1 events file reads as ONE
      // partition; this is how the 154-260k rows/s numbers happened)
      .repartition(sys.env.getOrElse("SPARK_GRAFT_PARTS", "32").toInt)
      .localCheckpoint()
    val n = rows.count()
    println(s"rows: $n, partitions: ${rows.rdd.getNumPartitions}")
    val t = new Tsdb(spark, TsdbConf(
      dataPath = java.nio.file.Files.createTempDirectory("ph").toString))
    val norm = t.normalize(rows)
    time("normalize count only")(norm.count())
    val ck = time("normalize localCheckpoint")(norm.localCheckpoint())
    time("count of checkpointed")(ck.count())
    val ck2 = time("2nd localCheckpoint (from ck)")(ck.localCheckpoint())
    // ten slices like IngestBench
    val nSlices = 10
    val slices = (0 until nSlices).map { c =>
      val s = rows.where(
        pmod(xxhash64(col("labels")("user_id")), lit(nSlices)) === c)
        .localCheckpoint()
      s.count(); s
    }
    time("insertHeadRows x10 total") {
      slices.foreach(t.insertHeadRows(_))
    }
    println(s"headRows check")
    // per-batch timing on a fresh store
    val t2 = new Tsdb(spark, TsdbConf(
      dataPath = java.nio.file.Files.createTempDirectory("ph2").toString))
    slices.zipWithIndex.foreach { case (s, i) =>
      time(f"  batch $i%2d")(t2.insertHeadRows(s))
    }
    spark.stop()
  }
}
