package graft.streaming

import graft.{GraftSync, SparkSpec}
import graft.ann.Ann
import graft.catalog.{Catalog, TableMeta}
import graft.cdc.Changes
import graft.functions.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The composed product entry end-to-end: ONE change feed maintains the
  * doc index + lineage, a persisted BM25 index, an LSH ANN index, an
  * IVF-PQ ANN index, the exact-dedup registry and the near-dup cluster map
  * — each with its own checkpoint — across a mid-stream restart ("crash")
  * of all six consumers. Every probe surface must end bit-for-bit equal to
  * an index built from the FINAL source state (PQ under the models frozen
  * at seed; the cluster map against every document ever ingested — its
  * no-split contract).
  */
class SyncPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def mkVec(i: Long) =
    Array.tabulate(16)(j => (math.cos((i % 4) * 3 + j) + 0.05 * math.sin(i * 17 + j)).toFloat)

  private def note(i: Long): (Long, String, Array[Float]) =
    // 6, 7 and 8 are mutual near-dups (one mutated trailing token, the rest
    // of the 3-shingles shared): 6 arrives in phase 1, 7/8 after the
    // restart, so their cluster forms only through the persisted signature
    // index surviving the crash
    if (i >= 6L)
      (i, s"near dup alpha near bravo near charlie near delta near echo tail$i", mkVec(i))
    else (i, s"note text number$i shared words", mkVec(i))

  test("one feed, six consumers, restart mid-stream: every surface equals a final-state rebuild") {
    val dir = Files.createTempDirectory("graft-pipeline").toString
    val feed = s"$dir/feed"
    Files.createDirectories(java.nio.file.Paths.get(feed))

    // the mutable "database": seed {1..4}; phase 1 deletes 1, adds 5,6;
    // phase 2 (after the crash) updates 2, deletes 5, adds 7,8
    val updated2 = (2L, "note text REWRITTEN two", mkVec(42L))
    val seedState: Seq[(Long, String, Array[Float])] = (1L to 4L).map(note)
    val phase1State: Seq[(Long, String, Array[Float])] = (2L to 6L).map(note)
    val finalState = Seq(updated2) ++ Seq(3L, 4L, 6L, 7L, 8L).map(note)
    @volatile var notes = seedState
    def noteDf = notes.toDF("id", "text", "embedding")
    val load: String => DataFrame = { case "note" => noteDf }

    val cat = Catalog(Map("note" -> TableMeta("note", Seq("id"))))
    val schema = """{"database":"db","index":"notes","nodes":{"table":"note","columns":["id","text"]}}"""
    val sync = GraftSync(spark, schema, cat, load, s"$dir/docs-index")
    val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]
    def pipeline = new SyncPipeline(
      sync, load, "note", "id",
      Seq(
        SyncPipeline.Bm25Consumer(s"$dir/bm25", "text", buckets = 8),
        SyncPipeline.AnnLshConsumer(s"$dir/ann-lsh", "embedding", planes = 6, dim = 16),
        SyncPipeline.AnnPqConsumer(s"$dir/ann-pq", "embedding", nlists = 2, m = 4, codeK = 4),
        SyncPipeline.DedupConsumer(s"$dir/dedup", "text",
          s => survivors.synchronized { survivors ++= s.collect().map(_.getLong(0)) }),
        SyncPipeline.ClusterConsumer(
          s"$dir/cluster", s"$dir/cluster-sig", "text", sigBuckets = 8, mapBuckets = 8)
      ),
      s"$dir/ckpt"
    )

    def ev(op: String, id: Long, txid: Long): String =
      s"""{"tg_op":"$op","tbl":"note","old":${if (op == "DELETE") s"""\"{\\\"id\\\": $id}\"""" else "null"},"new":${if (op == "DELETE") "null" else s"""\"{\\\"id\\\": $id}\""""},"txid":$txid}"""
    def writeFeed(n: Int, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(s"$feed/batch$n.json"), lines.mkString("\n").getBytes)

    // ---- seed: snapshot + all four index builds from state {1..4} ----------
    val p1 = pipeline
    p1.seed()
    assert(sync.state.docs.count() == 4)
    assert(survivors.toSet == (1L to 4L).toSet, "seed corpus survivors are the 4 distinct texts")
    survivors.clear()

    // ---- phase 1: DELETE 1, INSERT 5, INSERT 6; then "crash" ---------------
    notes = phase1State
    writeFeed(1, Seq(ev("DELETE", 1L, 1L), ev("INSERT", 5L, 2L), ev("INSERT", 6L, 3L)))
    val h1 = p1.start(() => Changes.fileStream(spark, feed))
    h1.processAllAvailable()
    h1.stopAll()
    assert(sync.state.docs.collect().map(_.getString(0)).toSet == (2L to 6L).map(_.toString).toSet)

    // ---- phase 2: land changes while everything is DOWN, then restart ------
    notes = finalState
    writeFeed(2, Seq(ev("UPDATE", 2L, 4L), ev("DELETE", 5L, 5L), ev("INSERT", 7L, 6L), ev("INSERT", 8L, 7L)))
    val h2 = pipeline.start(() => Changes.fileStream(spark, feed))
    h2.processAllAvailable()
    h2.stopAll()

    // ---- doc index: exactly the final state, update visible ----------------
    val docs = sync.state.docs.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(docs.keySet == Set("2", "3", "4", "6", "7", "8"))
    assert(docs("2").contains("REWRITTEN"))

    // ---- BM25: probe equals a rebuild of the final corpus bit-for-bit ------
    val finalDf = finalState.toDF("id", "text", "embedding")
    val queries = Seq((100L, "note shared"), (200L, "REWRITTEN number7")).toDF("qid", "qtext")
    Retrieval.writeBm25Index(finalDf, "id", "text", s"$dir/bm25-rebuilt", buckets = 8)
    def bm25Rows(p: String) =
      Retrieval.bm25TopKIndexedBatch(p, queries, "qid", "qtext", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(bm25Rows(s"$dir/bm25") == bm25Rows(s"$dir/bm25-rebuilt"))

    // ---- LSH ANN: probe equals a rebuild of the final vectors --------------
    val vecQueries = finalDf.filter(col("id").isin(3L, 4L)).select(col("id"), col("embedding"))
    Ann.writeLshIndex(finalDf, s"$dir/ann-lsh-rebuilt", "id", "embedding", planes = 6, dim = 16)
    def lshRows(p: String) =
      Ann.lshTopKIndexed(p, vecQueries, "id", "embedding", 5, planes = 6, dim = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(lshRows(s"$dir/ann-lsh") == lshRows(s"$dir/ann-lsh-rebuilt"))

    // ---- IVF-PQ: probe equals a final-state index under the SAME models
    // frozen at seed time (training is deterministic in the seed corpus) ----
    val seedDf = seedState.toDF("id", "text", "embedding")
    val cells = Ann.trainIvfCells(seedDf, "id", "embedding", nlists = 2)
    val books = Ann.pqTrain(seedDf, "id", "embedding", m = 4, codeK = 4)
    Ann.writePqIndex(finalDf, s"$dir/ann-pq-rebuilt", "id", "embedding", cells, books)
    def pqRows(p: String) =
      Ann.pqTopKIndexedResumed(p, vecQueries, "id", "embedding", 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pqRows(s"$dir/ann-pq") == pqRows(s"$dir/ann-pq-rebuilt"))

    // ---- dedup: the streamed phases registered exactly the new digests,
    // batch 1 was NOT replayed after the restart (checkpoint), and the
    // registry holds one row per distinct text ever seen -------------------
    assert(survivors.toSet == Set(5L, 6L, 2L, 7L, 8L))
    val keepIds = spark.read.parquet(s"$dir/dedup").collect().map(_.getAs[Long]("keep_id"))
    assert(keepIds.length == 9, s"4 seed + 5 streamed digests, got ${keepIds.length}")
    assert(keepIds.count(_ == 2L) == 2, "old and rewritten text of doc 2 are distinct digests")

    // ---- cluster map: every doc ever ingested assigned; 6/7/8 clustered
    // across the crash (7/8 paired with 6 only via the persisted signature
    // index), everything else singleton — deletes never split ---------------
    def clusterRows = graft.dedup.ClusterMap.assignments(spark, s"$dir/cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantClusters =
      (1L to 5L).map(i => (i, i)).toSet ++ Set((6L, 6L), (7L, 6L), (8L, 6L))
    assert(clusterRows == wantClusters)

    // ---- replaying the LAST batch through the batch-mode path converges ----
    val replay = Seq(
      ("UPDATE", "note", """{"id": 2}""", """{"id": 2}""", 4L),
      ("DELETE", "note", """{"id": 5}""", null, 5L),
      ("INSERT", "note", null, """{"id": 7}""", 6L),
      ("INSERT", "note", null, """{"id": 8}""", 7L)
    ).toDF("tg_op", "tbl", "old", "new", "txid")
    pipeline.applyBatch(replay)
    assert(bm25Rows(s"$dir/bm25") == bm25Rows(s"$dir/bm25-rebuilt"))
    assert(lshRows(s"$dir/ann-lsh") == lshRows(s"$dir/ann-lsh-rebuilt"))
    assert(pqRows(s"$dir/ann-pq") == pqRows(s"$dir/ann-pq-rebuilt"))
    assert(sync.state.docs.count() == 6)
    assert(spark.read.parquet(s"$dir/dedup").count() == 9)
    assert(clusterRows == wantClusters, "replayed batch leaves the cluster map converged")
    graft.util.TempDirs.delete(java.nio.file.Paths.get(dir))
  }

  test("changeRows: final-op collapse, payload join, and vanished-row degradation") {
    val src = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    val load: String => DataFrame = { case "t" => src }
    val batch = Seq(
      // id 1: INSERT then DELETE in one batch → final op DELETE
      ("INSERT", "t", null, """{"id": 1}""", 1L),
      ("DELETE", "t", """{"id": 1}""", null, 2L),
      // id 2: UPDATE → payload from the current table
      ("UPDATE", "t", """{"id": 2}""", """{"id": 2}""", 3L),
      // id 3: INSERT whose row is GONE from the source → degrades to DELETE
      ("INSERT", "t", null, """{"id": 3}""", 4L),
      // other table: ignored
      ("INSERT", "x", null, """{"id": 9}""", 5L)
    ).toDF("tg_op", "tbl", "old", "new", "txid")
    val rows = SyncPipeline.changeRows(batch, load, "t", "id", Seq("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(("DELETE", 1L, null), ("UPDATE", 2L, "beta"), ("DELETE", 3L, null)))
  }

  test("changeRows: empty and foreign-table-only batches yield empty (streaming idle path)") {
    val src = Seq((1L, "alpha")).toDF("id", "text")
    val load: String => DataFrame = { case "t" => src }
    val empty = Seq.empty[(String, String, String, String, Long)]
      .toDF("tg_op", "tbl", "old", "new", "txid")
    assert(SyncPipeline.changeRows(empty, load, "t", "id", Seq("text")).count() == 0)
    // a batch that only touches OTHER tables must also derive zero rows
    val foreign = Seq(("INSERT", "x", null: String, """{"id": 9}""", 1L))
      .toDF("tg_op", "tbl", "old", "new", "txid")
    assert(SyncPipeline.changeRows(foreign, load, "t", "id", Seq("text")).count() == 0)
    // an empty affected set stays on the literal tier even at threshold 0
    // (0 <= 0): the zero-value isin must not throw
    assert(SyncPipeline.changeRows(
      foreign, load, "t", "id", Seq("text"), inSetThreshold = 0).count() == 0)
  }
}
