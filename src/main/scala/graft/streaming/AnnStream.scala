package graft.streaming

import graft.ann.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous vector ingestion into a persisted ANN index: each micro-batch
  * appends into the bucket-partitioned LSH layout ([[Ann.appendLshIndex]] —
  * O(batch), the on-disk partitions are never read or rewritten), so the
  * index is probe-able ([[Ann.lshTopKIndexed]]) while the stream runs and
  * outlives it. Checkpointing gives at-least-once appends; replayed batches
  * re-append the same (neighbor_id, v, bucket) rows, which probing
  * deduplicates only by (qid, neighbor_id) rank order — run
  * [[Ann.compactLshIndex]] with a dedup-on-id pass if exact-once storage
  * matters, or keep ids idempotent upstream. Mirrors
  * [[DedupStream.start]]'s external-index protocol.
  */
object AnnStream {

  def start(
      vecs: DataFrame,
      indexPath: String,
      checkpointDir: String,
      id: String,
      vec: String,
      planes: Int = 6,
      dim: Int = 64,
      trigger: Option[Trigger] = None
  ): StreamingQuery = {
    val writer = vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Ann.appendLshIndex(batch, indexPath, id, vec, planes, dim)
        ()
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
