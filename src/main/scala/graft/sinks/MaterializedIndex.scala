package graft.sinks

import graft.assemble.DocAssembler
import graft.cdc.Lineage
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Test/standalone sink: a versioned parquet materialization of the search
  * index — current docs keyed by `_id` plus the lineage side-table —
  * honoring index/delete ops.
  *
  * Stands in for the reference's ES/OS bulk indexer
  * (`pgsync/search_client.py:100-212`: `streaming_bulk`/`parallel_bulk`,
  * chunk 5 000 docs / 100 MB). In Spark the bulk-chunking/thread-pool knobs
  * collapse into `foreachPartition` parallelism; here we persist whole
  * versions atomically (write new dir, flip a CURRENT pointer) which gives
  * the same idempotent-upsert-by-`_id` guarantee the reference relies on
  * (`sync.py:1947-1983`).
  */
final class MaterializedIndex(spark: SparkSession, dir: String) {

  private val currentPtr = Paths.get(dir, "CURRENT")
  private val checkpointPtr = Paths.get(dir, "CHECKPOINT")

  /** Batch-mode transaction watermark (the reference's checkpoint file,
    * `pgsync/sync.py:1581-1656`). Streaming runs use the Structured
    * Streaming checkpoint instead; batch `applyChanges` callers can use this
    * to skip already-applied txids. Replays are harmless either way —
    * recompute-and-diff is idempotent (C3) — so the watermark is a work
    * filter, not a correctness gate.
    */
  def checkpoint: Option[Long] =
    if (Files.exists(checkpointPtr))
      Some(new String(Files.readAllBytes(checkpointPtr)).trim.toLong)
    else None

  def saveCheckpoint(txid: Long): Unit =
    Files.write(
      checkpointPtr,
      txid.toString.getBytes,
      StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING
    )

  private def versionPath(v: Long, what: String) = s"$dir/v_$v/$what"

  def currentVersion: Long =
    if (Files.exists(currentPtr)) new String(Files.readAllBytes(currentPtr)).trim.toLong
    else -1L

  def exists: Boolean = currentVersion >= 0

  def docs: DataFrame = spark.read.parquet(versionPath(currentVersion, "docs"))

  def lineage: DataFrame = spark.read.parquet(versionPath(currentVersion, "lineage"))

  /** Bootstrap from a full snapshot of structured docs (assemble() output:
    * `_id`, fields…, `_meta`).
    */
  def initialize(structuredDocs: DataFrame): Unit = {
    val payload = structuredDocs.columns.filterNot(_ == DocAssembler.IdColumn).map(col)
    val flat = structuredDocs.select(
      col(DocAssembler.IdColumn),
      to_json(struct(payload: _*)).as("doc")
    )
    write(0L, flat, Lineage.fromDocs(structuredDocs))
  }

  /** Apply one batch: delete + upsert by `_id`, swap in the new version. */
  def commit(affected: DataFrame, newDocs: DataFrame, newLineage: DataFrame): Unit = {
    val v = currentVersion
    val kept = docs.join(
      broadcast(affected.select(col(DocAssembler.IdColumn))),
      Seq(DocAssembler.IdColumn),
      "left_anti"
    )
    write(v + 1, kept.unionAll(newDocs), newLineage)
  }

  /** Drop versions older than the newest `keepLast` (checkpoint + commit-log
    * hygiene for long-running streams; CURRENT is never dropped).
    */
  def vacuum(keepLast: Int = 2): Unit = {
    val cur = currentVersion
    val dir0 = Paths.get(dir)
    if (cur < 0 || !Files.exists(dir0)) return
    Files.list(dir0).forEach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("v_")) {
        val v = name.stripPrefix("v_").toLong
        if (v <= cur - keepLast) {
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
        }
      }
    }
  }

  private def write(v: Long, docsDf: DataFrame, lineageDf: DataFrame): Unit = {
    docsDf.write.mode(SaveMode.Overwrite).parquet(versionPath(v, "docs"))
    lineageDf.write.mode(SaveMode.Overwrite).parquet(versionPath(v, "lineage"))
    Files.createDirectories(Paths.get(dir))
    Files.write(
      currentPtr,
      v.toString.getBytes,
      StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING
    )
  }
}
