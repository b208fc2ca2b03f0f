package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization with `flatMapGroupsWithState` —
  * the custom-state operator family the reference's streaming-shaped ingest
  * lacks entirely (SURVEY §2.2). Sessions close when the event-time
  * watermark passes `gapSec` after the last event (timeout), or eagerly
  * when a new event arrives more than `gapSec` later.
  */
object SessionizeStream {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  /** Per-session running state. `sum` accumulates in BigDecimal with the
    * same double→decimal(·,2) rounding as the batch twin's
    * `value.cast("decimal(18,2)")` (both go through
    * BigDecimal.valueOf(double)), so a closed session's sum is bit-equal
    * to [[graft.operators.EventOps.sessionize]]'s decimal-accumulated one —
    * order-free, unlike a double fold.
    */
  case class SessionState(start: Long, end: Long, n: Long, sum: BigDecimal)

  private def dec2(v: Double): BigDecimal = BigDecimal(
    java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP))
  case class ClosedSession(
      user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_v: Double)

  /** @param events streaming frame with user_id, ts (timestamp), value
    * @param watermark lateness bound, e.g. "10 minutes"
    */
  def sessionize(
      events: DataFrame,
      gapSec: Long,
      watermark: String): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(gapSec))
  }

  private def process(gapSec: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(
        ClosedSession(userId, s.start, s.end, s.n, s.sum.toDouble))
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var closed = List.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime / 1000
      cur match {
        case Some(s) if t - s.end > gapSec =>
          closed ::= ClosedSession(userId, s.start, s.end, s.n, s.sum.toDouble)
          cur = Some(SessionState(t, t, 1, dec2(e.value)))
        case Some(s) =>
          cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1,
            s.sum + dec2(e.value)))
        case None =>
          cur = Some(SessionState(t, t, 1, dec2(e.value)))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // close the session once the watermark passes end + gap
      state.setTimeoutTimestamp((s.end + gapSec) * 1000)
    }
    closed.reverseIterator
  }
}
