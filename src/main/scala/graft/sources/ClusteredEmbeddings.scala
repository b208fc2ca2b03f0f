package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic planted-cluster embedding corpus — the bench fixture for
  * the ANN scale paths.
  *
  * The driver-shared `embeddings` table is small (≤ 2k rows) and measured
  * near-isotropic (max pairwise cosine ≈ 0.51, see
  * [[graft.operators.Similarity]] scaladoc), which bounds how selective ANY
  * sublinear ANN index can be on it: with no cluster structure, high recall
  * forces high candidate admission, so brute force wins below a corpus size
  * that the shared fixtures never reach. Real embedding corpora cluster;
  * this generator plants that structure so the bench can show the scale
  * paths (LSH / IVF) overtaking brute force at recall ≥ 0.9 — while the
  * isotropic corpus remains the registered honesty case.
  *
  * Generation is pure hash math (xxhash64 → uniform), fully deterministic
  * and Spark-native — no RNG, no driver-side materialization:
  *   - `label`    = cluster id = xxhash64("c", vec_id) mod [[Clusters]]
  *   - center μ_c = uniform[-1, 1]^dim from xxhash64("mu", c, i)
  *   - vector     = μ_c + uniform[-σ/2, σ/2] noise from xxhash64("eps", id, i)
  * With σ = [[Sigma]] ≪ ‖μ‖, nearest neighbors are overwhelmingly
  * same-cluster, giving LSH banding real structure to exploit.
  *
  * The corpus is written once per (scale dir, size) to a gitignored fixture
  * path and read back as parquet, so repeated bench/test runs pay zero
  * generation cost — mirroring how a real pipeline reads a stored corpus.
  * Schema matches the shared `embeddings` table: (vec_id, embedding, label).
  */
object ClusteredEmbeddings {

  val Dim = 64
  val Clusters = 32
  /** Corpus size = Factor × rows(shared embeddings table at that SF). */
  val Factor = 25
  val Sigma = 0.25

  /** Map a 64-bit hash to uniform [0, 1) with 20 bits of resolution. */
  private def u(h: Column): Column =
    pmod(h, lit(1 << 20)).cast("double") / lit((1 << 20).toDouble)

  private def dirTag(dir: String): String =
    new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9._-]", "_")

  def fixturePath(dir: String, n: Long): String =
    s"spark-warehouse/graft_fixtures/clustered_${dirTag(dir)}_n$n"

  /** The generated corpus as a (lazy) DataFrame — used by [[ensure]] and
    * directly by tests that want a specific size.
    */
  def generate(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("vec_id")
      .withColumn("label",
        pmod(xxhash64(lit("c"), col("vec_id")), lit(Clusters)).cast("int"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(Dim - 1)), i =>
          ((u(xxhash64(lit("mu"), col("label"), i)) * 2 - 1) +
            (u(xxhash64(lit("eps"), col("vec_id"), i)) - 0.5) * Sigma)
            .cast("float")))
      .select("vec_id", "embedding", "label")

  /** Read the fixture for `dir`, generating + persisting it on first use.
    * Size scales with the shared embeddings table (Factor ×), so sf0.001
    * stays test-fast while sf0.1 is large enough for index asymptotics to
    * show.
    */
  def ensure(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.embeddings(spark, dir).count() * Factor
    val path = fixturePath(dir, n)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    if (!fs.exists(marker))
      generate(spark, n)
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }
}
