package graft.streaming

import graft.functions.Retrieval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** CDC maintenance of a persisted BM25 index
  * ([[graft.functions.Retrieval.writeBm25Index]]) from a change feed —
  * the retrieval-index analogue of the reference's search-index sync
  * (delete ops reach the index, `/root/reference/pgsync/sync.py:1254-1306`;
  * op construction `sync.py:1556-1579`).
  *
  * Protocol per micro-batch (`applyBatch`):
  *
  *   1. DELETE every batch id from the index — tombstones + exact stats
  *      decrement ([[Retrieval.deleteFromBm25Index]]); a no-op for ids not
  *      live.
  *   2. APPEND the new document state of every INSERT/UPDATE row.
  *
  * Deleting ALL batch ids first (including INSERTs) is what makes
  * at-least-once delivery converge: a REPLAYED batch first tombstones the
  * generation its previous attempt appended (un-doing its stats
  * contribution exactly), then re-appends — the visible index state and
  * the integer stats end identical to a single delivery. This is the
  * payoff of the seq-tombstone discipline ([[graft.sources.IndexState]]):
  * blind re-append would double postings and double-count stats.
  *
  * The feed must be collapsed to ONE final op per id per batch (the
  * engine's change batches are — [[graft.cdc.IncrementalEngine]] recomputes
  * final state per root), and UPDATE rows must carry the new full text.
  */
object Bm25Stream {

  /** `changes` must be a streaming DataFrame with columns `tg_op`
    * (INSERT/UPDATE/DELETE), `id`, and `text` (null allowed on DELETE).
    * With `autoCompactRatio` set, each batch ends with BOTH compaction
    * policy checks (cheap — sidecar counts only, the postings are never
    * scanned to decide): [[Retrieval.maybeCompactBm25Index]] bounds
    * tombstone growth under a delete-heavy feed, and — when the dead-ratio
    * leg did not fire — [[Retrieval.maybeCompactBm25ByImpactGrowth]] at
    * `impactGrowthMultiple` bounds the pruned probe's cap×batches volume
    * under an APPEND-ONLY feed, where no tombstone ever accumulates and
    * the first policy alone would let per-batch impact caps pile up
    * forever. Probes issued BETWEEN batches (the single-process
    * sequential case this maintainer implements) always see a complete
    * index, and a crash mid-swap self-heals on the next open
    * ([[graft.sources.IndexState.recoverSwap]]); a probe from a SEPARATE
    * process racing the swap's rename window is not protected — route
    * concurrent readers through a version indirection if that matters.
    */
  def start(
      changes: DataFrame,
      indexPath: String,
      checkpointDir: String,
      id: String,
      text: String,
      trigger: Option[Trigger] = None,
      autoCompactRatio: Option[Double] = None,
      impactGrowthMultiple: Double = 64.0
  ): StreamingQuery = {
    val writer = changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(
          batch.sparkSession, batch, indexPath, id, text, autoCompactRatio,
          impactGrowthMultiple)
        ()
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** One batch of the protocol; also usable for batch-mode backfills. */
  def applyBatch(
      spark: SparkSession,
      batch: DataFrame,
      indexPath: String,
      id: String,
      text: String,
      autoCompactRatio: Option[Double] = None,
      impactGrowthMultiple: Double = 64.0
  ): Unit = {
    Retrieval.deleteFromBm25Index(
      spark,
      indexPath,
      batch.select(col(id).cast("long").as("id"))
    )
    val upserts = batch
      .filter(col("tg_op").isin("INSERT", "UPDATE") && col(text).isNotNull)
    Retrieval.appendBm25Index(upserts, id, text, indexPath)
    autoCompactRatio.foreach { r =>
      // one rewrite per batch at most: the dead-ratio leg already re-caps
      // the impact sidecars globally (compactBm25Index refreshes them), so
      // the growth leg only needs checking when it did not fire
      if (!Retrieval.maybeCompactBm25Index(spark, indexPath, r))
        Retrieval.maybeCompactBm25ByImpactGrowth(spark, indexPath, impactGrowthMultiple)
      ()
    }
  }
}
