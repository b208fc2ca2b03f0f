package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.{ClusteredEmbeddings, Tables}

/** Dev-only: stage-level timing of the ANN paths at a given SF dir —
  * isolates index-probe overhead (jobs, DPP, broadcast) from rerank cost
  * and measures cell balance / candidate admission of the built indexes.
  */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    graft.SparkEntry.prewarm(spark, dir)
    val c = ClusteredEmbeddings.ensure(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    println(s"clustered corpus: ${c.count()} rows; emb: ${emb.count()}")

    // cell balance of both indexes
    for (tag <- Seq("emb" -> 16, "clustered" -> 32)) {
      val d = new java.io.File(dir).getName
      val p = s"spark-warehouse/graft_index/ivf_${tag._1}_${d}_c${tag._2}/cells"
      val sizes = spark.read.parquet(p).groupBy("cell").count()
        .orderBy(desc("count")).collect()
      println(s"${tag._1}: ${sizes.length} cells, " +
        s"max=${sizes.head.getLong(1)} min=${sizes.last.getLong(1)} " +
        s"top4=${sizes.take(4).map(_.getLong(1)).mkString(",")}")
    }

    val q = c.where(col("vec_id") % 50 === 0)
    println(s"queries: ${q.count()}")

    // candidate volume of the clustered IVF probe
    val d = new java.io.File(dir).getName
    val path = s"spark-warehouse/graft_index/ivf_clustered_${d}_c32"
    time("ivf probe count (1st)") {
      println("  rows=" + Similarity.ivfProbeTopK(
        spark, path, q, "vec_id", "embedding", 5).count())
    }
    time("ivf probe count (2nd)") {
      Similarity.ivfProbeTopK(spark, path, q, "vec_id", "embedding", 5).count()
    }
    // candidate admission: join size before rerank
    val cents = spark.read.parquet(s"$path/centroids")
    val qq = q.select(col("vec_id").as("qid"),
      graft.functions.VectorFunctions.toDoubleArray(col("embedding")).as("qvec"))
      .withColumn("qnrm", graft.functions.VectorFunctions.normSeq(col("qvec")))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cdist").desc, col("cell"))
    val probes = qq.crossJoin(broadcast(cents))
      .withColumn("cdist",
        graft.functions.VectorFunctions.dotSeq(col("qvec"), col("centroid")) /
          (col("qnrm") * graft.functions.VectorFunctions.normSeq(col("centroid"))))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= 4)
      .select("qid", "cell")
    val cells = spark.read.parquet(s"$path/cells").select("cell", "nid")
    time("candidate count") {
      println("  candidates=" + cells.join(broadcast(probes), "cell").count())
    }

    // LSH candidate admission on clustered corpus
    time("lsh candidates") {
      println("  lsh candidates=" + Similarity.multiprobeCandidates(
        c, q, "vec_id", "embedding", 48, 4, 2).count())
    }
    time("lsh topk") {
      Similarity.multiprobeTopK(c, q, "vec_id", "embedding", 5, 48, 4, 2).count()
    }
    time("lsh topk (2nd)") {
      Similarity.multiprobeTopK(c, q, "vec_id", "embedding", 5, 48, 4, 2).count()
    }
    time("ivf probe n2") {
      Similarity.ivfProbeTopK(spark, path, q, "vec_id", "embedding", 5, 2).count()
    }
    time("brute agg") {
      Similarity.bruteForceTopKAgg(c, q, "vec_id", "embedding", 5).count()
    }

    // the registered ann_topk_ivf, bench-style (after prewarm), twice
    time("registered ann_topk_ivf (1st)") {
      graft.SparkEntry.queries("ann_topk_ivf")(spark, dir).count()
    }
    time("registered ann_topk_ivf (2nd)") {
      graft.SparkEntry.queries("ann_topk_ivf")(spark, dir).count()
    }
    time("registered ann_clustered_lsh (1st)") {
      graft.SparkEntry.queries("ann_clustered_lsh")(spark, dir).count()
    }
    time("registered ann_clustered_ivf (1st)") {
      graft.SparkEntry.queries("ann_clustered_ivf")(spark, dir).count()
    }
    spark.stop()
  }
}
