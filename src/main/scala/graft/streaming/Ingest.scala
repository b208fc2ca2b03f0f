package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Tsdb

/** Structured Streaming ingest path (reference O1, tsdb.go:205-233):
  * the bounded-channel + worker-pool write pipeline becomes
  * `readStream → foreachBatch(insertRows)` — micro-batch commits replace
  * the async flush goroutine (tsdb.go:242-265), checkpointing replaces the
  * WAL the reference explicitly lacks (README.md:39), and back-pressure
  * replaces the 30 s enqueue timeout.
  */
object Ingest {

  /** Overload signal for the write path — the analog of the reference's
    * enqueue-timeout rejection (tsdb.go:205-216): a micro-batch whose
    * durable write exceeded `writeListenerTimeoutSec` fails the streaming
    * query instead of letting latency queue unboundedly. The batch that
    * tripped the bound IS durable (the write completed before the check);
    * on checkpoint restart it is re-delivered, so the engine trades the
    * reference's data loss on timeout for at-least-once on overload.
    */
  final class WriteTimeoutException(elapsedSec: Double, boundSec: Long)
      extends RuntimeException(
        f"tsdb write took $elapsedSec%.1f s, exceeding the " +
          s"writeListenerTimeoutSec bound of $boundSec s (overload)")

  /** Continuously ingest a streaming DataFrame of
    * `(metric, labels, ts, value)` rows into a [[Tsdb]]. Each micro-batch
    * write is bounded by `tsdb.conf.writeListenerTimeoutSec` (see
    * [[WriteTimeoutException]]); a negative bound disables the check.
    */
  def ingestStream(
      tsdb: Tsdb,
      src: DataFrame,
      checkpoint: String,
      triggerMs: Long = 1000L): StreamingQuery = {
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bound = tsdb.conf.writeListenerTimeoutSec
        val t0 = System.nanoTime()
        tsdb.insertRows(batch)
        val elapsedSec = (System.nanoTime() - t0) / 1e9
        if (bound >= 0 && elapsedSec > bound)
          throw new WriteTimeoutException(elapsedSec, bound)
      }
      .start()
    tsdb.registerQuery(q)
    q
  }

  /** Streaming rollup maintenance: each micro-batch appends its
    * per-(sid, step-bucket) partial aggregates (plus series-dimension
    * partials) to the downsampling tier — no raw-sample write in the
    * path, which is how a metrics pipeline serves dashboard aggregates
    * at an ingest rate where storing raw points is optional. Exactness
    * is inherited from partial-aggregate associativity: the rollup read
    * merges every appended partial, so stream-maintained equals
    * batch-materialized equals raw (StreamingSpec gates this at sf0.01).
    * The exactness survives retries: `foreachBatch` is at-least-once, so
    * each batch's partials are committed under its batchId
    * ([[Tsdb.appendRollupPartials]] staged-promote + `_batch_committed`
    * marker) and a replayed batch is a no-op instead of a double-count.
    */
  def rollupStream(
      tsdb: Tsdb,
      src: DataFrame,
      checkpoint: String,
      stepSec: Long,
      triggerMs: Long = 1000L): StreamingQuery = {
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        tsdb.appendRollupPartials(batch, stepSec, Some(batchId))
      }
      .start()
    tsdb.registerQuery(q)
    q
  }

  /** Head-buffered streaming ingest — the closest Spark mirror of the
    * reference's actual write architecture (tsdb.go:235-271): micro-batches
    * land in the in-memory head ([[Tsdb.insertHeadRows]], cheap — no
    * durable write per batch), queries against the same Tsdb see
    * disk ∪ head throughout, and the head freezes to parquet
    * ([[Tsdb.flushHead]]) when it crosses `flushEveryBatches` (the
    * segment-duration trigger's micro-batch analog) — with
    * `conf.maxRowsPerSegment` still acting as the secondary row-count
    * trigger inside `insertHeadRows`, exactly like the reference's
    * dual-trigger freeze. Trade vs [[ingestStream]]: lower per-batch
    * latency and fewer files, but rows buffered since the last flush are
    * lost on crash (the reference accepts the same: no WAL, README.md:39).
    */
  def ingestStreamHead(
      tsdb: Tsdb,
      src: DataFrame,
      checkpoint: String,
      triggerMs: Long = 1000L,
      flushEveryBatches: Int = 16): StreamingQuery = {
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rejected = tsdb.insertHeadRows(batch)
        if (rejected > 0) {
          // surface outdated-gate drops instead of losing them silently —
          // the reference's frozen-segment drop (disk_segment.go:149-151)
          // is equally silent; we log + count
          rejectedRows.addAndGet(rejected)
          log.warn(
            s"ingestStreamHead batch $batchId: $rejected outdated row(s) " +
              "rejected by the enableOutdated=false gate")
        }
        if (flushEveryBatches > 0 && (batchId + 1) % flushEveryBatches == 0)
          tsdb.flushHead()
      }
      .start()
    tsdb.registerQuery(q)
    q
  }

  /** Total rows rejected by the outdated gate across all
    * [[ingestStreamHead]] queries in this JVM — observable by tests and
    * operators (the metric the reference never exposes).
    */
  val rejectedRows = new java.util.concurrent.atomic.AtomicLong(0L)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Streaming exact dedup — the streaming form of
    * [[graft.operators.Dedup.exact]]: rows whose content hash was already
    * seen within the watermark bound are dropped; hash state older than
    * the watermark is evicted, so state stays bounded on unbounded
    * streams (the requirement that distinguishes this from a naive
    * `dropDuplicates`, whose state grows forever).
    */
  def dedupStream(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming tumbling-window aggregation with late-data handling: the
    * watermark is the principled form of the reference's out-of-order
    * side-list (memory_segment.go:104-111) — late points within the
    * watermark merge into their window; later ones are dropped, mirroring
    * the reference's silent drop into frozen segments
    * (disk_segment.go:149-151).
    */
  /** @param slide optional slide duration — when set (and smaller than
    *   `windowDur`), windows overlap and each event contributes to
    *   `windowDur/slide` windows (sliding-window aggregation); default
    *   null keeps tumbling semantics.
    */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDur: String,
      watermark: String,
      slide: String = null): DataFrame = {
    val win =
      if (slide == null) window(col(tsCol), windowDur)
      else window(col(tsCol), windowDur, slide)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(win, col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
  }
}
