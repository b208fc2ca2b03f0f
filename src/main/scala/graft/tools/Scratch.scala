package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
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
    val docs = Tables.documents(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("ngram strings cold")(Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", 3, 0.8).count())
    time("ngram hashed  cold")(Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", 3, 0.8, hashTokens = true).count())
    time("ngram strings warm")(Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", 3, 0.8).count())
    time("ngram hashed  warm")(Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", 3, 0.8, hashTokens = true).count())
    spark.stop()
  }
}
