package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the streaming twin of the batch
  * interval join ([[graft.operators.EventOps.rangeJoin]]).
  *
  * Spark's stream-stream inner join keeps both sides in the state store
  * until the watermark plus the join's time-range condition proves no
  * further match can arrive; the interval bound below is exactly what lets
  * it evict: a left row is droppable once the watermark passes
  * `lts + upper`, a right row once it passes `rts - lower`. Without the
  * range condition the state would grow without bound at any real ingest
  * rate — the condition is the scale contract, not an optimization.
  */
object StreamJoin {

  /** Inner interval join: pair each left event with the right events of
    * the same key whose timestamp falls in
    * `[lts + lowerSec, lts + upperSec)` — the same half-open interval as
    * the batch `rangeJoin`. Both inputs must be streaming DataFrames with
    * event-time columns of TimestampType; `leftTsCol` and `rightTsCol`
    * must be distinct names (the join output carries both).
    *
    * Append mode; matches are emitted as soon as both sides have arrived,
    * across micro-batch boundaries, which is what makes the result equal
    * to the batch join over the same rows (StreamingSpec gates this at
    * sf0.01).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      lowerSec: Long,
      upperSec: Long,
      watermark: String): DataFrame = {
    require(upperSec > lowerSec, "empty interval")
    require(leftTsCol != rightTsCol,
      "left/right event-time columns must have distinct names")
    val l = left.withWatermark(leftTsCol, watermark)
    val r = right.withWatermark(rightTsCol, watermark)
      .withColumnRenamed(keyCol, "__rkey")
    l.join(r,
        col(keyCol) === col("__rkey") &&
          col(rightTsCol) >= col(leftTsCol) +
            expr(s"INTERVAL '$lowerSec' SECOND") &&
          col(rightTsCol) < col(leftTsCol) +
            expr(s"INTERVAL '$upperSec' SECOND"))
      .drop("__rkey")
  }
}
