package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tsdb
import graft.model.TsdbConf

/** Dev-only order-controlled A/B of `TsdbConf.filesPerSegment` on a
  * single-bucket high-cardinality ingest batch: CardinalityStress times
  * fps=32 as the JVM's FIRST Spark action (JIT/codegen cold) and fps=1 at
  * a different size, so its two ingest numbers are not comparable. This
  * warms both paths untimed, then interleaves timed full-size writes
  * (1, 32, 1, 32) into fresh store paths, same JVM, same rows.
  */
object FpsAb {
  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val nSeries = sys.env.get("SPARK_GRAFT_SERIES").flatMap(_.toLongOption)
      .getOrElse(5000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = "spark-warehouse/graft_scale/fps_ab"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val T0 = 1700000000L
    def wave(n: Long): DataFrame =
      spark.range(0, n).select(
        lit("click").as("metric"),
        map(
          lit("host"), concat(lit("h"), col("id")),
          lit("dc"), pmod(col("id"), lit(20)).cast("string"),
          lit("job"), concat(lit("job"), pmod(col("id"), lit(100)))
        ).as("labels"),
        (lit(T0) + pmod(col("id"), lit(3600))).as("ts"),
        (col("id") % 97).cast("double").as("value"))

    def ingest(fps: Int, tag: String, n: Long): Double = {
      val t = new Tsdb(spark, TsdbConf(dataPath = s"$root/$tag",
        segmentDuration = 7200L, retention = 365L * 86400,
        filesPerSegment = fps))
      timed(t.insertRows(wave(n)))
    }

    // untimed warm: both code paths at 1/10 size
    ingest(1, "warm1", nSeries / 10)
    ingest(32, "warm32", nSeries / 10)

    val runs = Seq(1 -> "a1", 32 -> "a32", 1 -> "b1", 32 -> "b32")
      .map { case (fps, tag) =>
        s""""$tag":${f"${ingest(fps, tag, nSeries)}%.1f"}"""
      }
    println(s"""{"metric":"fps_ab","series":$nSeries,""" +
      runs.mkString(",") + "}")
    spark.stop()
  }
}
