package graft.functions

/** Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
  * of Rare Words with Subword Units") over codepoint symbols — the
  * tokenizer-training stage of a real LLM data pipeline: learn the merge
  * table from a corpus word census, then segment text with it.
  *
  * Scale split (mirrors how production BPE trainers actually run): the
  * CORPUS-scale work is one word-count hash aggregation (map-side
  * combined, output bounded by the vocabulary — Heaps' law, not corpus
  * size); training itself iterates over that bounded census in memory,
  * exactly like the single-node trainers every real pipeline uses. The
  * encoder is a pure per-row function (`plans.BpeEncode` keeps it inside
  * the scan stage).
  *
  * Determinism: the best pair each round orders by (count desc, pair
  * lexicographic asc) — total order, no ties possible — and training
  * stops early when no adjacent pair occurs at least twice. Symbols are
  * UNICODE CODEPOINTS (surrogate pairs stay whole), matching DuckDB's
  * `string_split(word, '')` so the oracle mirror segments identically.
  *
  * Apply semantics (encoder AND trainer's re-segmentation): each merge
  * (a, b) → ab is applied in training order, exhaustively, left-to-right
  * and non-overlapping within a word — the original Sennrich apply, and
  * byte-identical to the oracle's list_reduce fold.
  */
object Bpe {

  /** Split a word into codepoint symbols (surrogate-pair safe). */
  def codepoints(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** One merge pass: replace adjacent (a, b) with a+b, left-to-right,
    * non-overlapping ("aaa" + (a,a) → [aa, a]). */
  def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Train up to `numMerges` merges from a (word, count) census. Empty
    * words are ignored. Deterministic; stops early when the best pair
    * count drops below 2 (a singleton merge generalizes to nothing).
    *
    * Pair counts are maintained INCREMENTALLY (the standard BPE-trainer
    * optimization): a merge only changes the pair multisets of words
    * that contain the merged pair, so each round subtracts those words'
    * old pairs, re-segments them, and adds the new pairs — O(affected
    * words) hash updates instead of a full-census recount per round.
    * The counts map after every round is identical to a from-scratch
    * recount (subtract-all/add-all per changed word makes no assumption
    * about overlap semantics), so the selected merge sequence — and the
    * early-stop point — are byte-identical to the recounting form
    * (OperatorSpec pins the Sennrich example, tie ordering and
    * input-order independence).
    */
  def train(
      wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    var vocab: Array[(Array[String], Long)] = wordCounts.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (codepoints(w), c) }
      .toArray
    val counts =
      scala.collection.mutable.HashMap.empty[(String, String), Long]
    // pair -> indices of census words currently containing it (presence
    // postings): a merge round then touches ONLY the affected words --
    // the previous full-vocabulary scan per round was the x10 trainer
    // bottleneck (64 rounds x 637k words). Postings are sets (a word
    // counts once however many times it contains the pair); iteration
    // order is pinned by sorting the snapshot, though the result is
    // order-independent anyway (each word's update is independent).
    val where = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def add(idx: Int, syms: Array[String], c: Long): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val n = counts.getOrElse(p, 0L) + c
        if (n == 0L) counts.remove(p) else counts(p) = n
        if (c > 0)
          where.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += idx
        else where.get(p).foreach { s =>
          s -= idx
          if (s.isEmpty) where.remove(p)
        }
        i += 1
      }
    }
    var j0 = 0
    while (j0 < vocab.length) {
      add(j0, vocab(j0)._1, vocab(j0)._2)
      j0 += 1
    }
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      if (counts.isEmpty) done = true
      else {
        // total order (no ties representable): count desc, then pair asc.
        // A linear minBy per round is fine: the DISTINCT-pair map is
        // alphabet-bounded (codepoint pairs + one new symbol's pair
        // types per merge), not vocabulary-sized.
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (c < 2) done = true
        else {
          merges += ((a, b))
          val affected = where.get((a, b))
            .map(_.toArray.sorted).getOrElse(Array.empty[Int])
          var i = 0
          while (i < affected.length) {
            val j = affected(i)
            val (syms, cnt) = vocab(j)
            add(j, syms, -cnt)
            val ns = applyMerge(syms, a, b)
            add(j, ns, cnt)
            vocab(j) = (ns, cnt)
            i += 1
          }
          k += 1
        }
      }
    }
    merges.result()
  }

  /** Encode one word: every merge in training order, each exhaustively
    * (stops early once a single symbol remains). */
  def encodeWord(
      word: String, merges: Array[(String, String)]): Array[String] = {
    var syms = codepoints(word)
    var k = 0
    while (k < merges.length && syms.length > 1) {
      syms = applyMerge(syms, merges(k)._1, merges(k)._2)
      k += 1
    }
    syms
  }
}
