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
