package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time the three stages of text_bpe_tokens separately
  * (census aggregation+collect, in-memory training, encode pass).
  */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    docs.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[bpe-profile] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      System.err.println(s"[bpe-profile] rep $rep")
      val census = t("census") {
        graft.operators.TextAnalysis.bpeCensusForProfile(docs, "text")
      }
      System.err.println(s"[bpe-profile] census rows ${census.size}")
      val totalSyms = census.iterator.map(_._1.length.toLong).sum
      val maxW = census.iterator.map(_._1.length).max
      System.err.println(
        s"[bpe-profile] total word chars $totalSyms, longest word $maxW")
      val merges = t("train")(graft.functions.Bpe.train(census, 64))
      System.err.println(s"[bpe-profile] merges learned ${merges.size}: " +
        merges.take(8).mkString(" "))
      t("encode") {
        graft.operators.TextAnalysis.bpeTokens(docs, "doc_id", "text", merges)
          .selectExpr("count(*)").collect()
      }
    }
    spark.stop()
  }
}
