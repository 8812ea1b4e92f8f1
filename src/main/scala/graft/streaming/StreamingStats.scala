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
        // floor (not cast) pins cents to the DuckDB oracle's floor(value*100)
        // even for negative values — cast truncates toward zero
        sum(floor(col("value") * 100).cast("long")).as("cents"))
      .select(
        col("window.start").as("w_start"),
        col("event_type"), col("n"), col("cents"))

  /** Streaming exact-dedup — the streaming side of the batch digest dedup
    * (P1/t02): emit the first arrival per key, drop re-deliveries that land
    * within the watermark horizon. State is one small row per key and is
    * PRUNED at the watermark (`dropDuplicatesWithinWatermark`), so it stays
    * bounded on an unbounded stream — plain `dropDuplicates` would grow
    * state forever, the 100 TB failure mode.
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** First-arrival-per-key as a BATCH window plan — the relational twin of
    * [[dedupStream]] (row_number over (key, ts) -> rn = 1), SQL-expressible
    * so the DuckDB harness can oracle-check the shape (query
    * a08_dedup_first; [[dedupStream]] itself keeps the MemoryStream test for
    * the state-pruning path). On event-time-ordered delivery the two emit
    * the same rows; ties inside one timestamp break by event_id so the
    * result is deterministic under any partitioning.
    *
    * Scale shape: one shuffle on the key columns; per-task state is one
    * partition's rows, spillable — and at 100 TB this is the backfill twin
    * one runs over landed history while [[dedupStream]] owns the live edge.
    */
  def dedupFirstBatch(events: DataFrame, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  final case class Event(event_id: Long, user_id: Long, event_type: String,
      ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionsState(open: List[SessionState])
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  /** Epoch MICROSECONDS of a timestamp — the precision the parquet relation
    * stores and [[sessionizeBatch]]/the a07 oracle compute with. Timestamp
    * .getTime truncates to milliseconds, so round 3's streaming gap
    * arithmetic MERGED an event landing exactly gap + a sub-ms fraction
    * after a session end where the batch twin split it (round-3 ADVICE).
    */
  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Gap-based sessionization with explicit state: per user, a LIST of
    * disjoint open sessions (not just one — an out-of-order event legal
    * within the watermark may start a separate session more than `gapUs`
    * BEFORE the currently-open one, or bridge two open sessions into one).
    * A session emits once the watermark passes its last event + `gapUs`,
    * enforced by an event-time timeout on the earliest open session. The
    * custom-state (`flatMapGroupsWithState`) shape — what windowed
    * aggregates can't express. State stays small: open sessions all end
    * within the watermark horizon of `max ts`, so the list is bounded by
    * horizon / gap entries. All gap arithmetic is in MICROSECONDS, matching
    * [[sessionizeBatch]] exactly; only the engine-facing watermark/timeout
    * surface (millisecond-granular) is converted, conservatively.
    */
  def sessionize(events: Dataset[Event], gapUs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionsState]) =>
          def flush(open: List[SessionState]): Iterator[Session] = {
            // emit every session the watermark has STRICTLY passed (last +
            // gap < wm): an event AT exactly last+gap is still admissible
            // (not below the watermark) and per the merge rule belongs in
            // the session — closing on <= would emit it as a split where
            // sessionizeBatch merges. Keep the rest, timeout on the earliest.
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (closed, kept) = open.partition(s => s.last + gapUs < wmUs)
            if (kept.nonEmpty) {
              state.update(SessionsState(kept))
              // engine timeouts are ms-granular: ceil so the timeout never
              // fires BEFORE the µs deadline (a late fire just re-flushes),
              // and clamp past the current watermark — at the exact-boundary
              // case above the deadline ms equals the watermark ms, which
              // setTimeoutTimestamp rejects (and which must re-fire LATER,
              // once the watermark has strictly passed the deadline)
              val deadlineMs = (kept.map(_.last).min + gapUs + 999L) / 1000L
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs() + 1L))
            } else state.remove()
            closed.iterator.map(s => Session(user, s.start, s.last, s.n))
          }
          if (state.hasTimedOut) flush(state.get.open)
          else {
            // fold the batch's events into the open-session list: an event
            // merges every open session within gapUs of it (possibly bridging
            // two) or opens a new one; rows below the watermark were already
            // dropped upstream, so every fold here is watermark-legal
            var open = state.getOption.map(_.open).getOrElse(Nil)
            for (e <- it) {
              val t = micros(e.ts)
              val (near, far) = open.partition(s => t >= s.start - gapUs && t <= s.last + gapUs)
              val merged =
                if (near.isEmpty) SessionState(t, t, 1)
                else SessionState(
                  math.min(near.map(_.start).min, t),
                  math.max(near.map(_.last).max, t),
                  near.map(_.n).sum + 1)
              open = merged :: far
            }
            flush(open)
          }
      }
  }

  /** Gap-based sessionization as a BATCH window-function plan — the
    * relational twin of [[sessionize]] (lag -> new-session flag -> running
    * sum -> per-session aggregate), SQL-expressible so the DuckDB harness
    * can oracle-check it (query a07_sessions). Microsecond precision: the
    * parquet timestamps are stored as µs, so unix_micros is exact.
    *
    * Scale shape: one shuffle on user_id feeds both window functions and the
    * final aggregate (same partitioning — Catalyst reuses the exchange);
    * state per task is one partition's rows, spillable.
    */
  def sessionizeBatch(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // order by (t, event_id): t = unix_micros(ts) is order-equivalent to ts
    val byUser = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val flagged = events
      // cast: the parquet relation stores TIMESTAMP_NTZ; under the UTC session
      // timezone the cast is value-preserving and matches DuckDB's epoch_us
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      .withColumn("prev", lag(col("t"), 1).over(byUser))
      .withColumn("newflag",
        when(col("prev").isNull || col("t") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("newflag")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("t")).as("start_us"), max(col("t")).as("end_us"),
        count(lit(1)).as("n_events"))
  }
}
