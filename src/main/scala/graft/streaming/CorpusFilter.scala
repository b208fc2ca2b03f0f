package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wordShingles

/** Streaming corpus hygiene: the filters a training-data pipeline applies
  * to documents AS THEY ARRIVE, before anything lands in the corpus store.
  *
  * Both ops are stateless per-row decisions, so they stream in Append mode
  * with no watermark and no state store — the micro-batch twin of the batch
  * operators in [[graft.operators.TextAnalysis]], and the shape that holds
  * at any ingest rate.
  */
object CorpusFilter {

  /** Streaming decontamination: drop streaming documents that share any
    * word `k`-gram with a STATIC benchmark/eval set.
    *
    * The benchmark's distinct shingles are evaluated ONCE at plan-build
    * time and shipped as a literal set, so every micro-batch is a pure
    * map-side `arrays_overlap` filter — stateless, append-mode, no join,
    * no shuffle, no state store, any ingest rate. (An anti-join against a
    * stream-derived hit set would be an unsupported stream-stream join;
    * and eval suites are KBs-MBs, so the literal set is the honest size —
    * for a huge blocklist the same shape holds with a broadcast Bloom
    * filter instead.) Documents with a null `textCol` are dropped, same as
    * the batch operator, which never emits them on either side.
    */
  /** Hard ceiling on the literal shingle set: past this, the "eval set"
    * is not an eval set and the caller must switch to a broadcast
    * Bloom-filter/set variant instead of silently building a
    * multi-hundred-MB driver literal into every micro-batch plan.
    */
  val MaxBenchShingles: Int = 2_000_000

  def decontaminateStream(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val benchToks: Array[String] = bench
      .select(explode(wordShingles(col(textCol), k)).as("tok"))
      .distinct()
      .limit(MaxBenchShingles + 1)
      .collect().map(_.getString(0))
    require(benchToks.length <= MaxBenchShingles,
      s"benchmark has > $MaxBenchShingles distinct $k-shingles — too large " +
        "for a plan literal; use a broadcast Bloom-filter blocklist instead")
    docs.where(
      !arrays_overlap(wordShingles(col(textCol), k), typedLit(benchToks.toSeq)))
  }

  /** Absolute-threshold quality gate for streams. The batch operator's
    * per-language percent_rank needs a global sort, which streams cannot do;
    * production pipelines stream against a FIXED threshold calibrated
    * offline (e.g. from the batch quantile job) — so this takes the
    * threshold as input and applies the same composite score map-side.
    */
  def qualityFilterStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double): DataFrame = {
    val scored = graft.operators.TextAnalysis
      .qualityScore(docs, idCol, textCol, keep =
        docs.columns.filterNot(c => c == idCol || c == textCol).toSeq)
    scored.where(col("quality") >= minQuality)
  }
}
