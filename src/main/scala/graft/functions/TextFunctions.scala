package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data-pipeline operators:
  * tokenization, shingling, fingerprinting, language-ID scoring, quality
  * metrics. Everything is a codegen'd builtin expression (no UDFs), and every
  * formula is chosen to be expressible 1:1 in ANSI/DuckDB SQL so the driver
  * oracle can verify results exactly (integer counts, sequential integer
  * folds, double divisions in a fixed order).
  */
object TextFunctions {

  /** Whitespace tokens of a trimmed string. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct k-word shingles ("w1 w2 w3"). Docs with fewer than k words get
    * an empty shingle set. Mirrors the classic shingling used for MinHash /
    * Jaccard near-dup detection.
    *
    * The token array is bound as a lambda variable via a single-element
    * `transform` so it is evaluated ONCE per row. Without the binding,
    * Catalyst inlines the `split(trim(text))` into every element access of
    * the inner lambda (no common-subexpression elimination across lambda
    * boundaries), re-splitting the text ~3·|shingles| times per row — a
    * ~20× slowdown observed on the sf0.1 corpus.
    */
  def wordShingles(text: Column, k: Int): Column =
    array_distinct(flatten(transform(array(wsTokens(text)), w =>
      when(size(w) >= k,
        transform(sequence(lit(0), size(w) - k),
          i => concat_ws(" ", (0 until k).map(j => get(w, i + lit(j))): _*)))
        .otherwise(array().cast("array<string>")))))

  /** BPE-ish token count: alpha runs, digit runs, and single non-alnum
    * non-space characters. The pattern is RE2/Java-regex compatible.
    */
  val BpePattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Whitespace-normalized lowercase form used for fingerprinting. */
  def normalizedText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** 128-bit content fingerprint: md5 of the normalized text. */
  def md5Fingerprint(text: Column): Column = md5(normalizedText(text))

  /** Rolling polynomial hash (base 31, mod 1e9+7) over the codepoints of the
    * normalized text — a Karp-Rabin-style fingerprint computed with exact
    * integer arithmetic, so it is engine-portable bit-for-bit.
    */
  def polyFingerprint(text: Column): Column =
    // split("", limit 0) yields the char array in ONE pass — the former
    // substr(i, 1) loop scanned from the string start per CODEPOINT
    // (UTF8 boundary walk), an inherent O(len²) that binding the string
    // can't fix (the r14 long-doc probe read 227× growth for 20×
    // length). Same exact fold, bit-identical output.
    aggregate(
      transform(split(normalizedText(text), "", 0), c => ascii(c)),
      lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L)

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * rolling polynomial hash of every k-char gram of the normalized text,
    * then the minimum hash of every w-gram window, distinct. The standard
    * local fingerprinting scheme for near-dup/plagiarism detection — all
    * exact integer arithmetic, so the oracle reproduces it bit-for-bit.
    * Each intermediate array is bound as a lambda variable (the
    * single-element-transform trick) so it is computed once per row.
    */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column = {
    val M = 1000000007L
    // one-pass char split (see polyFingerprint): the former substr
    // loop was O(len²) in the codepoint walk
    val codes = transform(split(normalizedText(text), "", 0),
      c => ascii(c).cast("long"))
    val grams = flatten(transform(array(codes), cs =>
      when(size(cs) >= k,
        transform(sequence(lit(1), size(cs) - k + 1),
          i => aggregate(slice(cs, i, lit(k)), lit(0L),
            (a, c) => (a * 31 + c) % M)))
        .otherwise(array().cast("array<bigint>"))))
    array_distinct(flatten(transform(array(grams), hs =>
      when(size(hs) >= w,
        transform(sequence(lit(1), size(hs) - w + 1),
          p => array_min(slice(hs, p, lit(w)))))
        .otherwise(array().cast("array<bigint>")))))
  }

  /** Portable 60-bit token hash: first 15 hex digits of md5, base-16 decoded.
    * Used by SimHash so the oracle can reproduce the exact same bits.
    */
  def tokenHash60(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long")

  /** Language marker sets for the n-gram/stopword language-ID heuristic.
    * Deterministic scoring: fraction of tokens found in each language's
    * marker list; argmax with fixed priority order, `und` when all zero.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "is", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "es", "y", "en", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "est", "les", "des"),
    "zh" -> Seq("de5", "shi4", "zai4", "le5", "he2", "you3", "wo3"))

  def langScore(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(markers)))

  /** Predicted language: argmax of marker counts, first-wins on ties in the
    * order of [[LangMarkers]]; `und` if every score is zero.
    */
  def langId(text: Column): Column =
    // the token array and the five marker scores are each BOUND ONCE
    // (the wordShingles single-element-transform trick, nested): the
    // previous inline tree evaluated every score inside `best` AND in
    // each when-branch, and every score re-tokenized — ~30 filter-folds
    // and tokenizations per row. Same argmax, first-wins tie order,
    // `und` when all zero; values identical.
    get(transform(array(wsTokens(lower(text))), toks =>
      get(transform(array(array(LangMarkers.map { case (_, m) =>
          langScore(toks, m) }: _*)), sc => {
        val best = array_max(sc)
        LangMarkers.zipWithIndex.foldRight(lit("und")) {
          case (((lang, _), i), acc) =>
            when(get(sc, lit(i)) > 0 && get(sc, lit(i)) === best,
              lit(lang)).otherwise(acc)
        }
      }), lit(0))), lit(0))
}
