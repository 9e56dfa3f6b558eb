package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MySQL/MariaDB binlog row-event adapter (S7) — the engine-side equivalent
  * of the reference's `binlog_changes` (`pgsync/sync.py:653-827`), which
  * drains `BinLogStreamReader` Write/Update/Delete row events and
  * checkpoints a `"file,pos"` cursor.
  *
  * The sandbox has no MySQL socket, so the transport is a binlog-SHAPED
  * event feed (JSON lines — what a thin `python-mysql-replication` →
  * file/Kafka bridge emits); everything downstream of the socket is real:
  * row-image extraction per event type, multi-row events, schema allow-list,
  * lowercase table normalization, RotateEvent handling, and `"file,pos"`
  * checkpoint advancement where skipped/non-row events still advance the
  * cursor (`sync.py:722-726,824-827`).
  *
  * The reference also groups payloads into per-`(tg_op, table)` batches
  * (`sync.py:753-812`) — an artifact of its per-statement SQL generation;
  * the set-based [[IncrementalEngine]] consumes one uniform batch, so no
  * grouping is needed here.
  *
  * Binlog positions have no txid, but [[Changes.schema]] orders by one: the
  * adapter synthesizes `txid = fileSeq · 2³² + log_pos` (binlog file names
  * carry a monotone numeric suffix; positions stay well under 2³² at the
  * default 1 GiB max file size), so commit order is preserved and the
  * conservative min-1 watermark in `GraftSync.applyChanges` works unchanged.
  */
object Binlog {

  /** One reader event: `write`/`update`/`delete` row events carry `rows`
    * (each row's images as JSON text); `rotate` carries the next file. The
    * row-image fields are typed STRING so Spark's JSON reader preserves the
    * nested objects as raw JSON — the adapter never needs their schema.
    */
  val eventSchema: StructType = StructType(
    Seq(
      StructField("log_file", StringType),
      StructField("log_pos", LongType),
      StructField("event", StringType), // write | update | delete | rotate | format_description | heartbeat
      StructField("schema", StringType),
      StructField("table", StringType),
      StructField(
        "rows",
        ArrayType(
          StructType(
            Seq(
              StructField("values", StringType),        // write/delete image
              StructField("before_values", StringType), // update old image
              StructField("after_values", StringType)   // update new image
            )
          )
        )
      ),
      StructField("next_binlog", StringType), // rotate only
      StructField("position", LongType)       // rotate only
    )
  )

  /** `"mysql-bin.000042"` → 42; files without a numeric suffix sort as 0. */
  private def fileSeq(file: Column): Column =
    coalesce(regexp_extract(file, "(\\d+)$", 1).cast(LongType), lit(0L))

  private def syntheticTxid(file: Column, pos: Column): Column =
    (fileSeq(file) * lit(1L << 32) + coalesce(pos, lit(0L))).cast(LongType)

  /** Row events → [[Changes.schema]] rows. `allowedSchemas` mirrors the
    * reference's lowercase schema allow-list (`sync.py:663-665,738-741`);
    * empty = allow all. Multi-row events explode into one change per row
    * image (`event.rows` loops, `sync.py:744-812`).
    */
  def toChanges(events: DataFrame, allowedSchemas: Set[String] = Set.empty): DataFrame = {
    val rowEvents = events
      .filter(col("event").isin("write", "update", "delete"))
      .filter(
        if (allowedSchemas.isEmpty) lit(true)
        else lower(col("schema")).isin(allowedSchemas.map(_.toLowerCase).toSeq: _*)
      )
    rowEvents
      .select(
        col("event"),
        lower(col("table")).as("tbl"),
        syntheticTxid(col("log_file"), col("log_pos")).as("txid"),
        explode(col("rows")).as("r")
      )
      .select(
        when(col("event") === "write", lit(Changes.Insert))
          .when(col("event") === "update", lit(Changes.Update))
          .otherwise(lit(Changes.Delete))
          .as("tg_op"),
        col("tbl"),
        when(col("event") === "update", col("r.before_values"))
          .when(col("event") === "delete", col("r.values"))
          .as("old"),
        when(col("event") === "update", col("r.after_values"))
          .when(col("event") === "write", col("r.values"))
          .as("new"),
        col("txid")
      )
  }

  // ---- "file,pos" checkpoint (`sync.py:824-827`) ---------------------------

  final case class Position(file: String, pos: Long) {
    /** The reference's checkpoint string: `f"{save_file},{save_pos}"`. */
    def format: String = s"$file,$pos"
    private[Binlog] def seq: Long = "(\\d+)$".r.findFirstIn(file).map(_.toLong).getOrElse(0L)
  }

  def parsePosition(s: String): Position = {
    val i = s.lastIndexOf(',')
    require(i > 0 && i < s.length - 1, s"invalid binlog checkpoint '$s' (want file,pos)")
    Position(s.substring(0, i), s.substring(i + 1).trim.toLong)
  }

  /** The cursor after draining `events`, starting from `start`: every event
    * advances it (skips included — the reference snapshots the stream
    * cursor before any filtering, `sync.py:722-726`), and a rotate jumps to
    * `(next_binlog, position|4)` (`sync.py:729-737`). Monotone: never moves
    * backwards past `start`.
    */
  def advance(events: DataFrame, start: Option[Position] = None): Option[Position] = {
    val effective = events
      .select(
        when(col("event") === "rotate", col("next_binlog")).otherwise(col("log_file")).as("file"),
        when(col("event") === "rotate", coalesce(col("position"), lit(4L)))
          .otherwise(col("log_pos"))
          .as("pos")
      )
      .filter(col("file").isNotNull && col("pos").isNotNull)
    val top = effective
      .select(struct(fileSeq(col("file")).as("seq"), col("pos").as("pos"), col("file").as("file")).as("cur"))
      .agg(max(col("cur")).as("cur"))
      .collect()
      .head
    val fromFeed =
      if (top.isNullAt(0)) None
      else {
        val r = top.getStruct(0)
        Some(Position(r.getString(2), r.getLong(1)))
      }
    (start, fromFeed) match {
      case (Some(a), Some(b)) =>
        Some(if (b.seq > a.seq || (b.seq == a.seq && b.pos >= a.pos)) b else a)
      case (a, b)             => b.orElse(a)
    }
  }

  /** Streaming binlog-shaped feed: JSON-lines files appearing in `dir` (the
    * file/Kafka bridge output; a Kafka source drops in identically).
    */
  def fileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).json(dir)
}
