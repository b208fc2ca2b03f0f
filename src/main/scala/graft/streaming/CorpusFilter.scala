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

  /** Streaming DSIR importance scoring: weigh documents AS THEY ARRIVE
    * against an OFFLINE-calibrated factor table — the production
    * discipline for distribution-dependent scores on a stream (the cell
    * distributions need a corpus census no stream can do): recalibrate
    * [[graft.operators.TextAnalysis.dsirFactors]] on a batch cadence,
    * ship the ≤`buckets`-row table to the live scorer.
    *
    * The whole computation happens INSIDE each row — the shared gram
    * expression, a map-literal factor lookup, and a codegen'd integer
    * `aggregate` fold — so it is stateless, append-mode, no join, no
    * shuffle, no state store, any ingest rate; and because the per-doc
    * weight is an exact BIGINT sum of the same micro-nat factors, a
    * replayed corpus scores ROW-IDENTICAL to the batch
    * `dsirWeights` (StreamingSpec gates it). The factor table covers
    * every hash cell, so unseen vocabulary lands on the smoothing-only
    * factor rather than failing the lookup.
    */
  def dsirScoreStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      factors: DataFrame,
      buckets: Int,
      salt: String = "dsir",
      hash: String = "md5"): DataFrame = {
    import graft.operators.TextAnalysis.{dsirCell, dsirCellsXx, dsirGrams}
    val rows = factors.select(col("b"), col("lr_micro")).collect()
    require(rows.length == buckets,
      s"factor table has ${rows.length} rows, expected one per cell " +
      s"($buckets) — build it with TextAnalysis.dsirFactors")
    // dense literal array indexed by cell id: one element_at per gram.
    // Row count alone doesn't prove the table is well-formed — a
    // duplicate or out-of-range cell id would pass the length check and
    // then either throw AIOOBE or silently overwrite a factor here.
    val byCell = new Array[Long](buckets)
    val seen = new Array[Boolean](buckets)
    rows.foreach { r =>
      val b = r.getLong(0)
      require(b >= 0 && b < buckets,
        s"factor table cell id $b out of range [0, $buckets)")
      require(!seen(b.toInt), s"factor table has duplicate cell id $b")
      seen(b.toInt) = true
      byCell(b.toInt) = r.getLong(1)
    }
    val table = typedLit(byCell.toSeq)
    // md5: fold over gram strings, hashing each; xx: fold over the
    // string-free per-doc cell array (dsirCellsXx — token hashes once,
    // bigram cells from long pairs), mirroring the batch operator's
    // hash-dispatched plan
    val (nGrams, weightMicro) =
      if (hash == "xx") {
        val cells = dsirCellsXx(col(textCol), buckets, salt)
        (size(cells).cast("long"),
          aggregate(cells, lit(0L),
            (acc, b) => acc + element_at(table, (b + 1L).cast("int"))))
      } else {
        val grams = dsirGrams(col(textCol))
        (size(grams).cast("long"),
          aggregate(grams, lit(0L),
            (acc, g) => acc + element_at(table,
              (dsirCell(g, buckets, salt, hash) + 1L).cast("int"))))
      }
    docs
      .withColumn("n_grams", nGrams)
      .withColumn("weight_micro", weightMicro)
      .withColumn("weight", col("weight_micro") / 1e6)
  }

  /** Streaming CCNet perplexity scorer: score live documents against
    * SHIPPED per-language bigram-LM factor tables
    * ([[graft.operators.TextAnalysis.lmFactors]], recalibrated on a
    * batch cadence). The whole computation happens INSIDE each row —
    * per-language dense factor arrays as a map literal, the shared
    * lmEvents expression bound ONCE per row (the attribute-
    * materialization rule: size() and the fold would otherwise each
    * re-tokenize), and a codegen'd integer `aggregate` fold — so it is
    * stateless, append-mode, no join, no shuffle, no state store, any
    * ingest rate. Exact BIGINT `h_micro` sums make a replayed corpus
    * ROW-IDENTICAL to batch [[graft.operators.TextAnalysis.lmScores]]
    * (StreamingSpec gates it). The percent_rank tercile bucketing is
    * inherently batch (a global sort); streams gate on a FIXED
    * perplexity threshold calibrated offline, like
    * [[qualityFilterStream]]. Docs with an unmodeled language or fewer
    * than two tokens are dropped, mirroring the batch inner-join/
    * no-events semantics.
    */
  def lmScoreStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      uniF: DataFrame,
      bigF: DataFrame,
      buckets: Int,
      salt: String = "lm"): DataFrame = {
    import graft.operators.TextAnalysis.{dsirBucket, lmEvents}
    val uniRows = uniF.select("lang", "bu", "lp_u_micro").collect()
    val bigRows = bigF.select("lang", "bb", "lp_b_micro").collect()
    val langs = uniRows.map(_.getString(0)).distinct.toSeq
    // dense per-language arrays; validate totality/uniqueness like
    // dsirScoreStream (a duplicate or out-of-range cell id would pass a
    // row-count check and then silently overwrite a factor)
    val uByLang = langs.map { l =>
      val arr = new Array[Long](buckets)
      val seen = new Array[Boolean](buckets)
      uniRows.filter(_.getString(0) == l).foreach { r =>
        val b = r.getLong(1)
        require(b >= 0 && b < buckets,
          s"uni factor cell id $b out of range [0, $buckets)")
        require(!seen(b.toInt), s"duplicate uni factor cell $b for $l")
        seen(b.toInt) = true
        arr(b.toInt) = r.getLong(2)
      }
      require(seen.forall(identity),
        s"uni factor table incomplete for lang $l — build it with " +
        "TextAnalysis.lmFactors (it covers every cell)")
      l -> arr.toSeq
    }.toMap
    val bByLang = langs.map { l =>
      // default 0 micros = ln(0 + 1): the batch left-join coalesce
      val arr = new Array[Long](buckets)
      bigRows.filter(_.getString(0) == l).foreach { r =>
        val b = r.getLong(1)
        require(b >= 0 && b < buckets,
          s"bigram factor cell id $b out of range [0, $buckets)")
        arr(b.toInt) = r.getLong(2)
      }
      l -> arr.toSeq
    }.toMap
    val uLit = typedLit(uByLang)
    val bLit = typedLit(bByLang)
    docs
      .where(col(langCol).isInCollection(langs))
      .withColumn("__ev", lmEvents(col(textCol)))
      .where(size(col("__ev")) >= 1)
      .withColumn("__u", element_at(uLit, col(langCol)))
      .withColumn("__b", element_at(bLit, col(langCol)))
      .withColumn("n_events", size(col("__ev")).cast("long"))
      .withColumn("h_micro", aggregate(col("__ev"), lit(0L), (acc, e) =>
        acc +
          element_at(col("__u"),
            (dsirBucket(e.getField("pfx"), buckets, salt + "u") + 1L)
              .cast("int")) -
          element_at(col("__b"),
            (dsirBucket(e.getField("big"), buckets, salt + "b") + 1L)
              .cast("int"))))
      .withColumn("ppl",
        floor(exp((col("h_micro") / 1e6) / col("n_events")) * 1e6
          + lit(0.5)) / 1e6)
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        col("n_events"), col("h_micro"), col("ppl"))
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
