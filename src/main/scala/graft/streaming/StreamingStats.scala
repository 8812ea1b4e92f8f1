package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming aggregation operators over the `events` relation
  * (event_id, user_id, event_type, ts, value) — the watermark + windowed-agg
  * and custom-state shapes a continuously-landing corpus pipeline needs
  * (extension beyond the reference, which is batch-only; SURVEY.md §2.7).
  *
  * Scale shape: a watermarked windowed aggregate is a streaming hash
  * aggregate whose state is bounded by (watermark horizon x keys); without
  * the watermark, state grows forever — that is the 100 TB failure mode
  * these operators exist to prevent. Sessionization keeps one small state
  * row per open (user) key and emits on gap timeout, the
  * flatMapGroupsWithState pattern from the Spark docs.
  */
object StreamingStats {

  /** Per event-type counts/sums over tumbling windows, late data bounded by
    * `watermarkDelay`. Works identically on a static frame (unit-testable)
    * and a stream (state pruned at watermark - window).
    */
  def windowedEventCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("value") * 100).cast("long")).as("cents"))
      .select(
        col("window.start").as("w_start"),
        col("event_type"), col("n"), col("cents"))

  final case class Event(event_id: Long, user_id: Long, event_type: String,
      ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

  /** Gap-based sessionization with explicit state: one state row per open
    * user; a session closes (and emits) when no event arrives within
    * `gapMs` of event time, enforced by an event-time timeout tied to the
    * watermark. The custom-state (`flatMapGroupsWithState`) shape — what
    * windowed aggregates can't express.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.last, s.n))
          } else {
            // fold the batch's events into the open session; emit any session
            // closed by a gap WITHIN the batch, keep the final one open
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              open = open match {
                case Some(s) if t - s.last <= gapMs =>
                  Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += Session(user, s.start, s.last, s.n)
                  Some(SessionState(t, t, 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
