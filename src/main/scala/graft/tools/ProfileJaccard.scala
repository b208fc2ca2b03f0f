package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only: stage-by-stage timing of the ngram-jaccard join at sf0.1. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .withColumn("n", size(col("shingles")))
    time("shingleSets.count")(sets.count())
    time("shingleSets again")(sets.count())
    val ex = sets.select(col("doc_id"), col("n"), explode(col("shingles")).as("tok"))
    time("exploded.count")(ex.count())
    val a = ex.as("a"); val b = ex.as("b")
    val joined = a.join(b, col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
    time("join.count")(joined.count())
    val grouped = joined.groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("common"), first(col("a.n")).as("n1"), first(col("b.n")).as("n2"))
    time("grouped.count")(grouped.count())
    time("full query")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    grouped.explain("formatted")
    spark.stop()
  }
}
