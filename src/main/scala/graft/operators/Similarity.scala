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
    val q = queries.select(col(idCol).as("qid"), toDoubleArray(col(vecCol)).as("qvec"))
    val sim = round(cosineSeq(col("qvec"), col("cvec")), 6)
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

  /** Sign bit of the projection of `vec` onto plane j. */
  private def signBit(vec: Column, j: Int): Column = {
    val proj = aggregate(
      zip_with(
        vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) => x * planeComponent(j, i)),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** Hyperplane LSH signature: `nPlanes` sign bits packed into a long. */
  def lshSignature(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map(j => signBit(vec, j) * lit(1L << j)).reduce(_ + _)

  /** ANN top-k via banded hyperplane LSH + exact rerank.
    * Candidates = corpus vectors sharing at least one signature band with
    * the query. Approximate: recall < 1 by design; verified against
    * [[bruteForceTopK]] in tests.
    */
  def lshTopK(
      emb: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 16,
      bands: Int = 4): DataFrame = {
    require(nPlanes % bands == 0)
    val bandBits = nPlanes / bands
    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(
          col(idCol).as(id),
          toDoubleArray(col(vecCol)).as(vec),
          lshSignature(toDoubleArray(col(vecCol)), nPlanes).as("sig"))
        .select(
          col(id), col(vec),
          posexplode(array((0 until bands).map(b =>
            shiftrightunsigned(col("sig"), b * bandBits)
              .bitwiseAND(lit((1L << bandBits) - 1))): _*)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "bucket")
    val c = banded(emb, "nid", "cvec")
    val q = banded(queries, "qid", "qvec")
    val sim = round(cosineSeq(col("qvec"), col("cvec")), 6)
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
