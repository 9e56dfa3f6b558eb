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

  private val replaySeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Deterministic file-stream replay of [[sessionize]]: stages the events
    * as time-range chunk files, streams them through the stateful
    * `flatMapGroupsWithState` machine one file per micro-batch, and returns
    * the closed sessions as a batch DataFrame with the same output shape as
    * [[sessionizeBatch]] — so the stateful operator itself can sit under
    * the same SQL oracle.
    *
    * Determinism notes:
    * - chunks partition event time into contiguous half-open ranges, so
    *   every file's events are ≥ the previous file's; the watermark (which
    *   trails the previous batch's max by `watermark`) can never classify
    *   an incoming row as late;
    * - file order is forced by explicit, strictly-increasing modification
    *   times (the file source orders by mod time; relying on write-time
    *   mtimes risks sub-second ties);
    * - a final sentinel file carries one far-future event per user, which
    *   closes every still-open session INLINE (gap exceeded) — no reliance
    *   on a trailing watermark tick that a drained stream never gets. The
    *   sentinel's own sessions stay in state and are never emitted.
    */
  def sessionizeReplay(
      events: DataFrame,
      gapSeconds: Long,
      chunks: Int = 3,
      watermark: String = "10 minutes"
  ): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val in = events.select(
      col("user_id").cast("long").as("user_id"),
      col("ts").cast("timestamp").as("ts"),
      col("value").cast("double").as("value")
    )
    val stagePath = graft.util.TempDirs.scratch("graft-session-replay")
    val stageDir = stagePath.toString

    val epoch = in.select(col("ts").cast("long").cast("double").as("t"))
    val bounds = epoch.stat
      .approxQuantile("t", (1 until chunks).map(_.toDouble / chunks).toArray, 0.001)
      .map(_.toLong)
    val maxTs = in.agg(max(col("ts").cast("long"))).head.getLong(0)

    val stamped = scala.collection.mutable.Set[String]()
    def stampNewFiles(ordinal: Int): Unit = {
      val dir = new java.io.File(stageDir)
      dir.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .filterNot(f => stamped.contains(f.getName))
        .foreach { f =>
          f.setLastModified(1_000_000_000_000L + ordinal * 60_000L)
          stamped += f.getName
        }
    }

    val ranges = (Long.MinValue +: bounds).zip(bounds :+ Long.MaxValue)
    ranges.zipWithIndex.foreach { case ((lo, hi), i) =>
      in.filter(col("ts").cast("long") >= lo && col("ts").cast("long") < hi)
        .coalesce(1).write.mode("append").parquet(stageDir)
      stampNewFiles(i)
    }
    val sentinelTs = maxTs + gapSeconds + 24 * 3600
    in.select(col("user_id")).distinct()
      .withColumn("ts", lit(sentinelTs).cast("timestamp"))
      .withColumn("value", lit(0.0))
      .coalesce(1).write.mode("append").parquet(stageDir)
    stampNewFiles(ranges.size)

    val name = s"graft_sessions_replay_${replaySeq.incrementAndGet()}"
    val stream = spark.readStream
      .schema(in.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir)
    val q = sessionize(stream.as[EventIn], gapSeconds, watermark)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    // results now live in the memory sink (resolved into the plan below);
    // the staged chunk files and the catalog entry are no longer needed —
    // delete/drop them so repeated replays leave /tmp and the catalog stable
    val out = spark.table(name).select(
      col("user_id"),
      date_format(col("start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
      col("n_events").cast("long").as("n_events"),
      col("value_cents")
    )
    spark.catalog.dropTempView(name)
    graft.util.TempDirs.delete(stagePath)
    out
  }

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
