package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Dev-only: where does ann_topk_lsh time go at sf0.1? */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    time("emb.count")(emb.count())
    val q = emb.where(col("vec_id") % 50 === 0)
    time("signatures")(
      Similarity.lshSignatures(emb, "vec_id", "embedding", 16).count())
    time("full lshTopK")(
      Similarity.lshTopK(emb, q, "vec_id", "embedding", 5).count())
    time("full again")(
      Similarity.lshTopK(emb, q, "vec_id", "embedding", 5).count())
    time("bruteForce")(
      Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5).count())
    spark.stop()
  }
}
