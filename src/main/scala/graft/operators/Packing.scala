package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the "concat-then-chunk" layout step a training
  * pipeline runs last: lay all documents end-to-end in a deterministic
  * order and cut the stream into fixed token-budget training sequences.
  * Each document needs its global token offset, which is a prefix sum over
  * the corpus — the textbook non-embarrassingly-parallel step.
  *
  * Scale shape (the reason this is an operator and not
  * `sum(...) over (order by id)`): a global ordered window collapses Spark
  * to ONE partition holding the whole corpus. Instead the prefix sum is
  * computed in two levels, exactly like a parallel scan:
  *
  *   1. map-side bucket assignment `bucket = id div bucketWidth` (any
  *      monotone bucketing of the order key works — bucket boundaries only
  *      shift which partial sums exist, never the global prefix);
  *   2. per-bucket totals — ONE hash aggregation, |corpus|/bucketWidth rows;
  *   3. exclusive cumulative sum over the tiny bucket-totals table (the
  *      only ordered window, over ~|corpus|/bucketWidth rows — driver-small
  *      by construction);
  *   4. broadcast the bucket offsets back and finish with a window
  *      PARTITIONED by bucket — every partition does an independent local
  *      scan of bucketWidth rows.
  *
  * So the whole job is one shuffle (the per-bucket window) plus a broadcast,
  * and no task ever sees more than `bucketWidth` rows of state — at 100 TB
  * you pick bucketWidth so a bucket fits an executor core and the bucket
  * table fits the driver (e.g. 1e6 rows/bucket → 1e8-row corpus = 100-row
  * bucket table).
  */
object Packing {

  /** Assign every doc its packed position: global token `offset`, the
    * training sequence `seq_id` it starts in, the offset inside that
    * sequence, and how many sequences the doc spans. Documents are packed
    * in ascending `idCol` order (ids must be numeric; dense ids give even
    * buckets, sparse ids merely give uneven ones).
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      nTokens: org.apache.spark.sql.Column,
      budget: Long,
      bucketWidth: Long = 1 << 20): DataFrame = {
    require(budget > 0 && bucketWidth > 0, "budget and bucketWidth must be positive")
    val base = docs
      .select(
        col(idCol).cast("long").as("doc_id"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"doc_id div ${bucketWidth}L"))

    // per-bucket totals: one map-side-combined hash aggregation
    val totals = base.groupBy("bucket").agg(sum("n_tokens").as("bucket_total"))

    // exclusive prefix over the bucket table — the only ordered window,
    // and it runs over |corpus|/bucketWidth rows by construction
    val wb = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("bucket_offset", coalesce(sum("bucket_total").over(wb), lit(0L)))
      .select("bucket", "bucket_offset")

    // local scan per bucket: window partitioned by bucket (bounded state)
    val ww = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(offsets), "bucket")
      .withColumn("offset",
        col("bucket_offset") + coalesce(sum("n_tokens").over(ww), lit(0L)))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("offset"),
        expr(s"offset div ${budget}L").as("seq_id"),
        pmod(col("offset"), lit(budget)).as("seq_off"),
        (expr(s"(offset + n_tokens - 1) div ${budget}L") -
          expr(s"offset div ${budget}L") + lit(1L)).as("n_seqs"))
  }
}
