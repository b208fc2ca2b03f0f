package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document-level text analysis: language-ID, quality scoring, token
  * counting, fingerprinting. Pure map-side column expressions — no shuffle,
  * no UDFs; scales linearly and stays inside WholeStageCodegen.
  */
object TextAnalysis {

  /** Language-ID via the stopword/marker heuristic of
    * [[graft.functions.TextFunctions.langId]].
    */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), langId(col(textCol)).as("lang_pred"))

  /** Quality metrics: char/word counts, mean word length, punctuation and
    * stopword ratios, and a composite [0,1] quality score. All ratios are
    * double divisions of exact integer counts in a fixed order.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = wsTokens(t)
    val nChars = length(t)
    val nWords = size(toks)
    val punct = length(t) - length(regexp_replace(t, "[^a-zA-Z0-9\\s]", ""))
    val stops = langScore(toks, LangMarkers.head._2) // english markers
    val meanWordLen = (length(regexp_replace(t, "\\s+", "")).cast("double") / nWords)
    val punctRatio = punct.cast("double") / nChars
    val stopRatio = stops.cast("double") / nWords
    // composite: reward moderate length + low punctuation + some stopwords
    val score =
      least(nWords.cast("double") / 100.0, lit(1.0)) * 0.5 +
        (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3 +
        least(stopRatio * 5.0, lit(1.0)) * 0.2
    docs.select(
      col(idCol).as("doc_id"),
      nChars.as("n_chars"),
      nWords.as("n_words"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(score, 6).as("quality"))
  }

  /** Token counts: whitespace tokens and BPE-ish regex tokens. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(wsTokens(col(textCol))).as("n_ws_tokens"),
      bpeTokenCount(col(textCol)).as("n_bpe_tokens"))

  /** Winnowing fingerprint summary per doc: count + min/max/sum of the
    * distinct window-minimum gram hashes (exact integers).
    */
  def winnowSummary(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fps = winnowFingerprints(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      size(fps).as("n_fp"),
      array_min(fps).as("fp_min"),
      array_max(fps).as("fp_max"),
      when(size(fps) > 0,
        aggregate(fps, lit(0L), (a, x) => a + x)).as("fp_sum"))
  }

  /** Fingerprints: md5 of normalized text + portable rolling polynomial
    * hash (base 31 mod 1e9+7) — see TextFunctions for the exact fold.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      md5Fingerprint(col(textCol)).as("fp_md5"),
      polyFingerprint(col(textCol)).as("fp_poly"))

  /** TF-IDF top-k terms per document (keyword extraction — the standard
    * corpus-statistics op of a training-data pipeline):
    * `score = tf · ln(N / df)` with `round(·, 6)` + term tie-break for
    * cross-engine determinism.
    *
    * Scale shape: one shuffle keyed by (doc, term) for tf, one keyed by
    * term for df (both with map-side partial aggregation), a broadcast of
    * the single-row corpus count, and the per-doc rank window. The df
    * dimension joins back on term — at corpus scale this is the shuffle
    * join it should be (term cardinality ~ vocabulary, not corpus size).
    */
  def tfidfTopTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"), explode(wsTokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("doc_id", "rank", "tok", "score")
  }
}
