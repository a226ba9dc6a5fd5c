package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators over the events stream (SURVEY §2.10: the
  * reference has no streaming semantics; these are the Structured
  * Streaming surfaces a training-data pipeline needs — watermarked
  * windowed aggregation with late-data drop, and custom session state via
  * flatMapGroupsWithState with event-time timeouts).
  *
  * Scale shape: both are keyed-state operators whose state partitions on
  * the grouping key (window+type / user_id) — the standard streaming
  * shuffle; state size is bounded (one aggregate row per open window, one
  * SessionState per active user) and watermarks garbage-collect both.
  */
object StreamingOps {

  /** Watermarked per-hour event counts. Works identically on a batch
    * DataFrame (withWatermark is a no-op there), so stream-vs-batch
    * equality is testable on the same input.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact deduplication: drop re-deliveries of the same
    * content hash with bounded state — `dropDuplicates` over (hash)
    * with a watermark on the event-time column, so state for hashes
    * older than the delay is garbage-collected (the unbounded-state
    * trap of naive streaming dedup). This is the ingestion-side twin
    * of the batch dedup_exact operator: at 10^12 docs/day the dedup
    * state must be windowed or it IS the dataset.
    */
  def dedupStream(docs: DataFrame, hashCol: String = "text_hash",
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(hashCol)

  final case class Evt(user_id: Long, event_id: Long, ts: Timestamp)
  final case class SessionState(startMs: Long, lastMs: Long, n: Int)
  final case class SessionOut(
      user_id: Long, n_events: Int, duration_s: Long, closed_by: String)

  /** Streaming sessionization: per-user sessions split at > gapSec idle.
    * Sessions close either (a) inside a batch, when a later event arrives
    * past the gap ("gap"), or (b) by event-time timeout once the
    * watermark passes last_event + gap ("timeout"). State per user is one
    * 20-byte SessionState; the watermark bounds it.
    */
  def sessionize(events: Dataset[Evt], gapSec: Long,
      watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    def emit(s: SessionState, by: String, uid: Long): SessionOut =
      SessionOut(uid, s.n, (s.lastMs - s.startMs) / 1000L, by)

    def fn(uid: Long, it: Iterator[Evt],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit(_, "timeout", uid)).iterator
        state.remove()
        out
      } else {
        val evts = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
        val closed = Vector.newBuilder[SessionOut]
        var cur = state.getOption
        evts.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs <= gapSec * 1000L =>
              cur = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
            case Some(s) =>
              closed += emit(s, "gap", uid)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapSec * 1000L)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
