package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no windowing (its batching is size-based,
  * `LOGICAL_SLOT_CHUNK_SIZE`, SURVEY §2.8 C5); these operators extend the
  * engine with the Structured-Streaming-native shapes a training-data/event
  * pipeline needs: tumbling-window aggregation with watermarks, and
  * gap-based sessionization — as a stateful `flatMapGroupsWithState`
  * for streams and an equivalent window-function (gaps-and-islands)
  * formulation for batch/backfill. Both formulations shuffle once by their
  * natural key (window/user), aggregate map-side where possible, and hold
  * state bounded by the watermark/gap.
  */
object EventAnalytics {

  /** Tumbling-window counts + value cents per event type (batch form). */
  def windowedCounts(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).cast("long").as("value_cents")
      )
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("value_cents")
      )

  /** Streaming form: watermark bounds state for late data. */
  def streamingWindowedCounts(events: DataFrame, width: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Gap-based sessions, batch form (gaps-and-islands with window
    * functions): a session breaks when the gap to the previous event
    * exceeds `gapSeconds`.
    */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val flagged = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            col("ts").cast("timestamp").cast("long") -
            col("prev_ts").cast("timestamp").cast("long") > gapSeconds,
          1
        ).otherwise(0)
      )
      .withColumn("session_id", sum(col("new_session")).over(byUser))
    flagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).cast("long").as("value_cents")
      )
      .select(col("user_id"), col("session_start"), col("n_events"), col("value_cents"))
  }

  // ---- streaming sessionization state machine ------------------------------

  final case class EventIn(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, totalCents: Long)
  final case class SessionOut(
      user_id: Long,
      start: java.sql.Timestamp,
      end: java.sql.Timestamp,
      n_events: Int,
      value_cents: Long
  )

  /** Streaming sessionization via `flatMapGroupsWithState` with an
    * EVENT-TIME TIMEOUT: per-user open session kept in the state store; a
    * batch whose events jump the gap closes the previous session inline, and
    * a user who simply goes quiet has their open session emitted — and their
    * state evicted — once the watermark passes `last + gap`. State is one
    * small record per ACTIVE user (bounded by the watermark), shuffle keyed
    * by user only.
    */
  def sessionize(
      events: Dataset[EventIn],
      gapSeconds: Long,
      watermark: String = "10 minutes"
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, evs: Iterator[EventIn], state: GroupState[SessionState]) => {
          def emit(s: SessionState) = SessionOut(
            uid, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
            s.n, s.totalCents
          )
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: close and evict
            val out = state.getOption.map(emit)
            state.remove()
            out.iterator
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              val cents = math.round(e.value * 100)
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.totalCents + cents))
                case Some(s) =>
                  closed += emit(s)
                  cur = Some(SessionState(t, t, 1, cents))
                case None =>
                  cur = Some(SessionState(t, t, 1, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout must sit above the current watermark
              state.setTimeoutTimestamp(
                math.max(s.last + gapSeconds * 1000, state.getCurrentWatermarkMs() + 1)
              )
            }
            closed.result().iterator
          }
        }
      )
  }
}
