package graft.sources

import graft.SparkSpec
import graft.ann.Ann
import graft.functions.Retrieval
import org.apache.spark.sql.functions._

/** Crash-recovery and degenerate-feed behavior of the persisted-index
  * mutation state: an interrupted compaction swap must self-heal on the
  * next open, and a feed that deletes EVERY live document must not brick
  * the index (an empty visible set cannot be written as a readable
  * partitioned parquet directory, so the policy refuses the swap).
  */
class IndexStateSpec extends SparkSpec {
  import spark.implicits._

  private def mv(from: String, to: String): Unit =
    assert(new java.io.File(from).renameTo(new java.io.File(to)), s"rename $from -> $to failed")

  private def gone(p: String) = !new java.io.File(p).exists()

  test("recoverSwap: probes self-heal every crash state of an interrupted swap") {
    val docs = Seq(
      (1L, "spark spark spark"),
      (2L, "spark filler filler"),
      (3L, "window join window"),
      (4L, "spark spark other words")
    ).toDF("doc_id", "text")
    val queries = Seq((100L, "spark window")).toDF("qid", "qtext")
    val dir = graft.util.TempDirs.scratch("idxstate-recover").toString
    val index = s"$dir/index"
    def rows(p: String) = Retrieval.bm25TopKIndexedBatch(p, queries, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    Retrieval.writeBm25Index(docs, "doc_id", "text", index, buckets = 8)
    Retrieval.deleteFromBm25Index(spark, index, Seq(3L).toDF("id"))
    val expected = rows(index)

    // crash state A: between the swap's two renames — the old index is
    // parked in trash, the fully-written compacted copy sits in staging
    Retrieval.compactBm25Index(spark, index, index + IndexState.StagingSuffix)
    mv(index, index + IndexState.TrashSuffix)
    assert(rows(index) == expected, "probe must restore the staging copy and answer")
    assert(gone(index + IndexState.StagingSuffix) && gone(index + IndexState.TrashSuffix))
    assert(gone(s"$index/${IndexState.TombstoneDir}"), "restored copy is the COMPACTED one")

    // crash state B: after the second rename, before the trash delete —
    // live index complete, stale trash left behind. Opens leave the stale
    // trash alone (the hot path pays ONE existence probe); the next swap
    // deletes it before parking the live index
    val staleTrash = index + IndexState.TrashSuffix
    assert(new java.io.File(staleTrash).mkdir())
    assert(rows(index) == expected)
    Retrieval.compactBm25Index(spark, index, index + IndexState.StagingSuffix)
    IndexState.swapCompacted(spark, index, index + IndexState.StagingSuffix)
    assert(gone(staleTrash), "the next swap must clean the stale trash sibling")
    assert(rows(index) == expected)

    // crash state C: rollback-failure residue — live missing, only trash
    mv(index, index + IndexState.TrashSuffix)
    assert(rows(index) == expected, "probe must restore the trash copy and answer")
    assert(gone(index + IndexState.TrashSuffix))

    // the healed index keeps accepting mutations
    Retrieval.appendBm25Index(Seq((9L, "spark window again")).toDF("doc_id", "text"),
      "doc_id", "text", index)
    assert(rows(index) != expected)
    graft.util.TempDirs.delete(java.nio.file.Paths.get(dir))
  }

  test("recoverSwap: the LSH probe and model-sidecar paths self-heal too") {
    def mkVec(i: Long) =
      Array.tabulate(16)(j => (math.cos((i % 4) * 3 + j) + 0.05 * math.sin(i * 17 + j)).toFloat)
    val vecs = (0L until 24L).map(i => (i, mkVec(i))).toDF("vec_id", "embedding")
    val dir = graft.util.TempDirs.scratch("idxstate-recover-lsh").toString
    val index = s"$dir/index"
    def rows() = Ann
      .lshTopKIndexedResumed(index, vecs.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Ann.writeLshIndex(vecs, index, "vec_id", "embedding", planes = 6, dim = 16)
    Ann.deleteFromLshIndex(spark, index, Seq(5L).toDF("id"))
    val expected = rows()
    // interrupted swap: live parked in trash, staging complete — the
    // resumed probe (model sidecar read first) must restore and answer
    Ann.compactLshIndex(spark, index, index + IndexState.StagingSuffix)
    mv(index, index + IndexState.TrashSuffix)
    assert(rows() == expected)
    assert(gone(index + IndexState.StagingSuffix) && gone(index + IndexState.TrashSuffix))
    graft.util.TempDirs.delete(java.nio.file.Paths.get(dir))
  }

  test("BM25 delete-everything feed: compaction refused, index stays probe-able, revives on append") {
    val docs = Seq(
      (1L, "spark spark spark"),
      (2L, "spark filler filler"),
      (3L, "window join window")
    ).toDF("doc_id", "text")
    val dir = graft.util.TempDirs.scratch("idxstate-deleteall-bm25").toString
    def rows(qtext: String) = Retrieval
      .bm25TopKIndexedBatch(dir, Seq((100L, qtext)).toDF("qid", "qtext"), "qid", "qtext", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    Retrieval.writeBm25Index(docs, "doc_id", "text", dir, buckets = 8)
    Retrieval.deleteFromBm25Index(spark, dir, Seq(1L, 2L, 3L).toDF("id"))
    // live == 0: the ratio says compact (1.0) but the policy must refuse —
    // swapping in an empty partitioned directory would brick every later read
    assert(!Retrieval.maybeCompactBm25Index(spark, dir, maxDeadRatio = 0.2))
    assert(new java.io.File(s"$dir/${IndexState.TombstoneDir}").exists())
    assert(rows("spark filler window").isEmpty, "fully-deleted index answers empty, not an error")
    // the next append revives the index, and NOW the policy may compact
    Retrieval.appendBm25Index(Seq((10L, "fresh spark doc")).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val revived = rows("fresh spark")
    assert(revived.map(_._2) == Set(10L))
    assert(Retrieval.maybeCompactBm25Index(spark, dir, maxDeadRatio = 0.2))
    assert(!IndexState.hasTombstones(spark, dir))
    assert(rows("fresh spark") == revived)
    graft.util.TempDirs.delete(java.nio.file.Paths.get(dir))
  }

  test("bumpSeq refuses an existing-but-empty seq sidecar; readers still see 0") {
    val dir = graft.util.TempDirs.scratch("idxstate-emptyseq").toString
    IndexState.writeSeq(spark, dir, 7L)
    assert(IndexState.bumpSeq(spark, dir) == 8L)
    // simulate a crashed writeSeq overwrite: the sidecar dir survives with
    // no data files — a durable state, not the transient reader window
    val seqDir = new java.io.File(s"$dir/${IndexState.SeqDir}")
    seqDir.listFiles().foreach(f => assert(f.delete(), s"could not empty $f"))
    assert(IndexState.readSeq(spark, dir) == 0L, "pure readers keep the transient-window default")
    // the mutator must NOT silently restart at 0: new upsert seqs would fall
    // below stored tombstone del_seq values and mask re-inserted rows
    val e = intercept[IllegalStateException] { IndexState.bumpSeq(spark, dir) }
    assert(e.getMessage.contains("crashed writeSeq"), e.getMessage)
    // operator repair path: rewrite the counter, mutations resume
    IndexState.writeSeq(spark, dir, 8L)
    assert(IndexState.bumpSeq(spark, dir) == 9L)
    graft.util.TempDirs.delete(java.nio.file.Paths.get(dir))
  }

  test("LSH delete-everything feed: empty-staging swap refused, index stays probe-able") {
    def mkVec(i: Long) =
      Array.tabulate(16)(j => (math.cos((i % 4) * 3 + j) + 0.05 * math.sin(i * 17 + j)).toFloat)
    val vecs = (0L until 6L).map(i => (i, mkVec(i))).toDF("vec_id", "embedding")
    val dir = graft.util.TempDirs.scratch("idxstate-deleteall-lsh").toString
    def rows(queries: org.apache.spark.sql.DataFrame) = Ann
      .lshTopKIndexed(dir, queries, "vec_id", "embedding", 5, planes = 6, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Ann.writeLshIndex(vecs, dir, "vec_id", "embedding", planes = 6, dim = 16)
    Ann.deleteFromLshIndex(spark, dir, (0L until 6L).toDF("id"))
    // every row is dead: compaction must detect the empty rewrite and refuse
    assert(!Ann.maybeCompactLshIndex(spark, dir, maxDeadRatio = 0.1))
    assert(new java.io.File(s"$dir/${IndexState.TombstoneDir}").exists())
    assert(gone(dir + IndexState.StagingSuffix), "refused staging must be cleaned up")
    assert(rows(vecs).isEmpty, "fully-deleted index answers empty, not an error")
    // revive with fresh vectors; the policy can compact again
    val fresh = (8L until 16L).map(i => (i, mkVec(i))).toDF("vec_id", "embedding")
    Ann.appendLshIndex(fresh, dir, "vec_id", "embedding", planes = 6, dim = 16)
    val revived = rows(fresh)
    assert(revived.nonEmpty && revived.forall(_._2 >= 8L))
    assert(Ann.maybeCompactLshIndex(spark, dir, maxDeadRatio = 0.1))
    assert(!IndexState.hasTombstones(spark, dir))
    assert(rows(fresh) == revived)
    graft.util.TempDirs.delete(java.nio.file.Paths.get(dir))
  }
}
