package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus, rank per query. The correctness baseline, and
  *    also the right plan when |queries| is small: one broadcast, no
  *    corpus shuffle except the final per-query ranking.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — the scale path. Corpus
  *    vectors are signed against `nPlanes` deterministic pseudo-random
  *    hyperplanes into band buckets; candidates share any band; exact
  *    cosine reranks candidates. Recall is tunable via bands/bits.
  *
  * Ranking is on `round(cosine, 6)` with id tie-break, making order
  * deterministic and oracle-reproducible.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector.
    * @param queries subset of `emb` (or any frame with the same id/vec cols)
    */
  def bruteForceTopK(
      emb: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val cand = emb.select(col(idCol).as("nid"), toDoubleArray(col(vecCol)).as("cvec"))
      .withColumn("cnrm", normSeq(col("cvec")))
    val q = queries.select(col(idCol).as("qid"), toDoubleArray(col(vecCol)).as("qvec"))
      .withColumn("qnrm", normSeq(col("qvec")))
    val sim = round(
      dotSeq(col("qvec"), col("cvec")) / (col("qnrm") * col("cnrm")), 6)
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    cand
      .crossJoin(broadcast(q))
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "sim")
  }

  /** Deterministic pseudo-random hyperplane component for (plane j, dim i):
    * xxhash64 of (j, i) mapped to ±1.0. No Math.random — reproducible across
    * runs and engines that matter here (only Spark executes this).
    */
  private def planeComponent(j: Int, i: Column): Column =
    when(xxhash64(lit(j), i).bitwiseAND(1) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Hyperplane LSH signatures for a whole frame: posexplode the vector,
    * aggregate `nPlanes` signed projections per id (map-side partial agg +
    * codegen), pack sign bits into a long. Returns (id, sig).
    */
  def lshSignatures(df: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int): DataFrame = {
    val projs = (0 until nPlanes).map(j =>
      sum(col("col") * planeComponent(j, col("pos"))).as(s"p$j"))
    df.select(col(idCol).as("id"),
        posexplode(toDoubleArray(col(vecCol))))
      .groupBy("id")
      .agg(projs.head, projs.tail: _*)
      .select(col("id"),
        (0 until nPlanes).map(j =>
          when(col(s"p$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
  }

  /** ANN top-k via an IVF (inverted-file) index: k-means centroids
    * partition the corpus into cells; each query probes only the `nProbe`
    * nearest cells and reranks those candidates exactly. The standard
    * billion-scale ANN architecture — the corpus is scanned
    * `nProbe/nClusters` of the time, and the cell assignment is a
    * one-off (amortized) index build. Approximate by design: recall is
    * checked against brute force in tests.
    */
  def ivfTopK(
      emb: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nClusters: Int = 16,
      nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = emb.select(col(idCol).as("nid"),
        toDoubleArray(col(vecCol)).as("cvec"))
      .withColumn("cnrm", normSeq(col("cvec")))
      .withColumn("fv", array_to_vector(col("cvec")))
    val model = new KMeans()
      .setK(nClusters).setSeed(42L).setFeaturesCol("fv")
      .fit(corpus)
    val assigned = model.transform(corpus)
      .select(col("nid"), col("cvec"), col("cnrm"),
        col("prediction").as("cell"))
    val cents = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }
      .toSeq.toDF("cell", "centroid")
    val q = queries.select(col(idCol).as("qid"),
        toDoubleArray(col(vecCol)).as("qvec"))
      .withColumn("qnrm", normSeq(col("qvec")))
    // probe the nProbe nearest cells per query (cosine to centroid)
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("cdist").desc, col("cell"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("cdist",
        dotSeq(col("qvec"), col("centroid")) /
          (col("qnrm") * normSeq(col("centroid"))))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nProbe)
      .select("qid", "qvec", "qnrm", "cell")
    val sim = round(
      dotSeq(col("qvec"), col("cvec")) / (col("qnrm") * col("cnrm")), 6)
    val wRank = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    assigned.join(probes, "cell")
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "sim")
  }

  /** ANN top-k via banded hyperplane LSH + exact rerank.
    * Candidates = corpus vectors sharing at least one signature band with
    * the query. Approximate: recall < 1 by design; verified against
    * [[bruteForceTopK]] in tests.
    *
    * Defaults tuned with `graft.tools.AnnTune` (recall@5 vs brute force on
    * the sf0.01 embeddings): planes=16/bands=8 → 0.96; the previous
    * 4-band default measured 0.36. IVF at cells=16/probe=4 → 0.70,
    * probe=8 → 0.92 (at the cost of scanning half the cells).
    *
    * Caveat measured on this corpus: the synthetic embeddings are
    * near-isotropic (max pairwise cosine ≈ 0.51), so the high-recall
    * setting admits ~89% of pairs as candidates — no sublinear index can
    * be simultaneously selective and high-recall on data with no cluster
    * structure. On real embedding corpora (which cluster), the same
    * banding is selective at high recall; tune per-corpus with AnnTune.
    */
  def lshTopK(
      emb: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 16,
      bands: Int = 8): DataFrame = {
    require(nPlanes % bands == 0)
    val bandBits = nPlanes / bands
    def banded(df: DataFrame, id: String, vec: String, nrm: String): DataFrame = {
      val base = df.select(
        col(idCol).as(id),
        toDoubleArray(col(vecCol)).as(vec),
        normSeq(toDoubleArray(col(vecCol))).as(nrm))
      base
        .join(lshSignatures(df, idCol, vecCol, nPlanes)
          .withColumnRenamed("id", id), id)
        .select(
          col(id), col(vec), col(nrm),
          posexplode(array((0 until bands).map(b =>
            shiftrightunsigned(col("sig"), b * bandBits)
              .bitwiseAND(lit((1L << bandBits) - 1))): _*)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "bucket")
    }
    val c = banded(emb, "nid", "cvec", "cnrm")
    val q = banded(queries, "qid", "qvec", "qnrm")
    val sim = round(
      dotSeq(col("qvec"), col("cvec")) / (col("qnrm") * col("cnrm")), 6)
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    c.join(q, Seq("band", "bucket"))
      .where(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid")
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "sim")
  }
}
