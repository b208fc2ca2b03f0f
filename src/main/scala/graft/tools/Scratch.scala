package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Dev-only scratch main: schema / plan exploration. Not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, dir)
    val q = emb.where(col("vec_id") % 50 === 0)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    graft.SparkEntry.queries("ann_topk_lsh")(spark, dir).explain("formatted")
    time("lsh query COLD")(
      graft.SparkEntry.queries("ann_topk_lsh")(spark, dir).count())
    time("lsh query warm")(
      graft.SparkEntry.queries("ann_topk_lsh")(spark, dir).count())
    time("agg")(graft.SparkEntry.queries("ann_topk_agg")(spark, dir).count())
    spark.stop()
  }
}
