package graft.streaming

import graft.GraftSync
import graft.ann.Ann
import graft.functions.Retrieval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The COMPOSED product entry: one change feed fans into every consumer a
  * search product maintains — the materialized document index (+ lineage)
  * via [[graft.GraftSync]], and any set of secondary indexes (persisted
  * BM25, LSH ANN, IVF-PQ ANN, exact-dedup registry) — each consumer with
  * its OWN Structured Streaming checkpoint, so a restart resumes every
  * index from its own high-water mark and at-least-once replay converges
  * per the delete-first protocols ([[Bm25Stream]]/[[AnnStream]]) or
  * first-writer-wins semantics ([[DedupStream]]).
  *
  * Reference shape: one `Sync` object owns the whole consumer side —
  * snapshot then continuous consumption (`/root/reference/pgsync/sync.py:
  * 2114-2153`); here the consumer side is N independent streaming queries
  * over the same feed instead of one process loop, which is the
  * Spark-native form: each query commits its own offsets, a slow consumer
  * never backpressures the others, and any subset can be restarted alone.
  *
  * Payload derivation ([[SyncPipeline.changeRows]]): change events carry
  * only keys; each micro-batch joins its final per-id ops against the
  * CURRENT source table (the engine's recompute-final-state semantics,
  * like [[graft.cdc.IncrementalEngine]]). An upsert whose row has since
  * vanished from the source degrades to DELETE — never a stale payload.
  */
object SyncPipeline {

  /** One secondary-index consumer wired to the pipeline's change feed.
    * `name` keys the checkpoint directory — must be unique per pipeline.
    */
  sealed trait Consumer {
    def name: String
    def indexPath: String

    /** The source-table column this consumer needs per upsert. */
    def payloadColumn: String
  }

  /** Persisted BM25 maintenance ([[Bm25Stream]] protocol). With
    * `autoCompactRatio` set, both compaction policies run per batch — the
    * dead-ratio leg for delete-heavy feeds and the impact-growth leg (at
    * `impactGrowthMultiple`) for append-only feeds; see [[Bm25Stream.start]].
    */
  final case class Bm25Consumer(
      indexPath: String,
      textCol: String,
      buckets: Int = 64,
      autoCompactRatio: Option[Double] = None,
      impactGrowthMultiple: Double = 64.0,
      name: String = "bm25"
  ) extends Consumer { def payloadColumn: String = textCol }

  /** Persisted LSH ANN maintenance ([[AnnStream]] CDC protocol); `planes`
    * and `dim` are used at [[SyncPipeline.seed]] time and frozen into the
    * model sidecar — batches resume from the sidecar.
    */
  final case class AnnLshConsumer(
      indexPath: String,
      vecCol: String,
      planes: Int = 6,
      dim: Int = 64,
      autoCompactRatio: Option[Double] = None,
      name: String = "ann_lsh"
  ) extends Consumer { def payloadColumn: String = vecCol }

  /** Persisted IVF-PQ ANN maintenance; models are TRAINED at seed time from
    * the source table and frozen ([[Ann.appendPqIndexResumed]] contract).
    */
  final case class AnnPqConsumer(
      indexPath: String,
      vecCol: String,
      nlists: Int = 16,
      m: Int = 8,
      codeK: Int = 16,
      autoCompactRatio: Option[Double] = None,
      name: String = "ann_pq"
  ) extends Consumer { def payloadColumn: String = vecCol }

  /** Exact-dedup registry maintenance ([[DedupStream]]): INSERT/UPDATE
    * documents stream through first-writer-wins digest resolution;
    * survivors go to `onSurvivors`. DELETEs do not retract digests — the
    * registry remembers every content ever seen (the dedup contract:
    * re-ingesting deleted content is still a duplicate).
    */
  final case class DedupConsumer(
      indexPath: String,
      textCol: String,
      onSurvivors: DataFrame => Unit = _ => (),
      name: String = "dedup"
  ) extends Consumer { def payloadColumn: String = textCol }

  /** Near-dup cluster-map maintenance ([[ClusterStream]]): upserts derive
    * pairs in-batch and against the persisted signature index at
    * [[sigPath]], feeding the durable union-find at [[indexPath]];
    * DELETEs never split clusters (the [[graft.dedup.ClusterMap]]
    * contract). Model parameters are frozen into the signature index's
    * sidecar at [[SyncPipeline.seed]] time. `autoCompactRatio` drives
    * [[graft.dedup.ClusterMap.maybeCompact]] (merge-log vs member-count);
    * a map compaction also compacts the signature index.
    */
  final case class ClusterConsumer(
      indexPath: String,
      sigPath: String,
      textCol: String,
      portable: Boolean = false,
      shingleN: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      sigBuckets: Int = 64,
      mapBuckets: Int = 64,
      autoCompactRatio: Option[Double] = None,
      name: String = "cluster"
  ) extends Consumer {
    def payloadColumn: String = textCol
    def model: graft.dedup.SignatureIndex.Model =
      graft.dedup.SignatureIndex.Model(
        portable, shingleN, bands, rowsPerBand, threshold, maxBucket, sigBuckets)
  }

  /** The running queries of a started pipeline: the doc-sync query plus one
    * per consumer, keyed by consumer name.
    */
  final case class Handles(doc: StreamingQuery, consumers: Map[String, StreamingQuery]) {
    def all: Seq[StreamingQuery] = doc +: consumers.values.toSeq
    def processAllAvailable(): Unit = all.foreach(_.processAllAvailable())
    def stopAll(): Unit = all.foreach(_.stop())
  }

  /** Derive one consumer-ready row per affected id from a raw change batch
    * ([[graft.cdc.Changes.schema]] columns): filter to `table`, extract the
    * BIGINT primary key from the event JSON, collapse to ONE final op per
    * id (highest txid wins; DELETE wins a txid tie — matching
    * recompute-final-state when the row is gone), and join INSERT/UPDATE
    * rows against the CURRENT source table for the payload columns. An
    * upsert whose row is missing from the source degrades to DELETE.
    * Output: (tg_op, <pk>, <payload...>); DELETE rows carry null payloads.
    *
    * The payload join NEVER shuffles the corpus: the affected-id set is
    * batch-sized while `load(table)` is the full source, so a plain
    * `ops ⟕ src` join would shuffle every corpus row per micro-batch (the
    * corpus side of a left-outer cannot be the broadcast build side). The
    * source scan is instead RESTRICTED to the affected ids first, with the
    * same two-tier strategy as [[graft.cdc.IncrementalEngine.reassemble]]:
    * up to `inSetThreshold` ids become a literal `isin` pushed into the
    * parquet scan (row groups whose min/max exclude the batch are never
    * read; the collapsed op set rides along as a driver-local relation, no
    * recompute), and oversized sets fall back to a broadcast semi-join
    * (still scan-only on the corpus — no corpus-wide exchange).
    */
  def changeRows(
      batch: DataFrame,
      load: String => DataFrame,
      table: String,
      pk: String,
      payload: Seq[String],
      inSetThreshold: Int = 1000
  ): DataFrame = {
    val evs = batch
      .filter(col("tbl") === table)
      .select(
        col("tg_op"),
        col("txid").cast("long").as("txid"),
        coalesce(
          get_json_object(col("new"), s"$$.$pk"),
          get_json_object(col("old"), s"$$.$pk")
        ).cast("long").as(pk)
      )
      .filter(col(pk).isNotNull)
    val last = evs
      .groupBy(col(pk))
      .agg(
        max_by(
          col("tg_op"),
          struct(col("txid"), (col("tg_op") === "DELETE").cast("int").as("del"))
        ).as("tg_op")
      )
    val src = load(table).select(
      col(pk).cast("long").as(pk) +: (payload.map(col) :+ lit(true).as("__present")): _*
    )
    val collected = last.limit(inSetThreshold + 1).collect()
    val (ops, srcAffected) =
      if (collected.length <= inSetThreshold) {
        val local = batch.sparkSession.createDataFrame(
          java.util.Arrays.asList(collected: _*), last.schema)
        (local, src.filter(col(pk).isin(collected.map(_.getLong(0)).toSeq: _*)))
      } else
        (last, src.join(broadcast(last.select(col(pk))), Seq(pk)))
    val finalOp = when(col("tg_op") =!= "DELETE" && col("__present").isNull, lit("DELETE"))
      .otherwise(col("tg_op"))
    ops
      .join(srcAffected, Seq(pk), "left_outer")
      .select(
        finalOp.as("tg_op") +:
          col(pk) +:
          payload.map(p => when(finalOp === "DELETE", lit(null)).otherwise(col(p)).as(p)): _*
      )
  }
}

/** Wire a [[graft.GraftSync]] doc sync plus secondary-index consumers to
  * one change feed. `table` is the source table carrying the payload
  * columns (its primary key `pk` must be BIGINT-compatible — the shared id
  * convention of the persisted index family).
  *
  * {{{
  * val p = new SyncPipeline(sync, load, "documents", "doc_id", Seq(
  *   SyncPipeline.Bm25Consumer(s"$base/bm25", "text"),
  *   SyncPipeline.AnnLshConsumer(s"$base/ann", "embedding", dim = 64)
  * ), s"$base/ckpt")
  * p.seed()                                   // snapshot + index builds
  * val h = p.start(() => Changes.fileStream(spark, feedDir))
  * }}}
  */
final class SyncPipeline(
    val sync: GraftSync,
    load: String => DataFrame,
    table: String,
    pk: String,
    consumers: Seq[SyncPipeline.Consumer],
    checkpointBase: String
) {
  import SyncPipeline._

  require(
    consumers.map(_.name).distinct.size == consumers.size,
    s"consumer names must be unique (they key checkpoints): ${consumers.map(_.name)}"
  )

  private def spark: SparkSession = load(table).sparkSession

  /** Snapshot the doc index and build every secondary index from the
    * current source-table state — the composed `pull()`
    * (`sync.py:1895-1945`): after seed, every probe surface answers for the
    * full corpus and [[start]] maintains all of them incrementally.
    *
    * The snapshot and the N index builds are INDEPENDENT (each writes only
    * its own directory from the same immutable source state), so they are
    * submitted as overlapping Spark jobs from a driver pool — the
    * [[graft.GraftSync.runAll]] snapshot-phase shape: one build's shuffle
    * tail or driver-side planning gap back-fills with another's scan work
    * instead of leaving the executors idle. Per-surface CONTENT is
    * byte-identical to the sequential order (nothing reads a sibling's
    * output), which is what keeps the composed oracle rows green.
    *
    * Peak-footprint note: overlapping the builds multiplies transient
    * executor memory/scratch-disk by the number of concurrently-seeding
    * consumers (each corpus-scale build may hold its own persisted frame —
    * the BM25 token frame is DISK_ONLY by discipline, the snapshot path no
    * longer persists at all). At the 100 TB design scale, bound the fan-out
    * by seeding consumers in waves (call [[seedConsumer]]-shaped subsets
    * through your own pool) if the cluster's scratch provisioning cannot
    * carry all builds at once; the engine keeps full overlap as the default
    * because seed time is dominated by exactly these independent builds.
    */
  def seed(): Unit = {
    val src = load(table)
    runOverlapped(
      ("seed: docs" -> (() => sync.snapshot())) +:
        consumers.map(c => s"seed: ${c.name}" -> (() => seedConsumer(c, src))))
  }

  private def seedConsumer(c: Consumer, src: DataFrame): Unit = c match {
    case c: Bm25Consumer =>
      Retrieval.writeBm25Index(src, pk, c.textCol, c.indexPath, c.buckets)
    case c: AnnLshConsumer =>
      Ann.writeLshIndex(src, c.indexPath, pk, c.vecCol, c.planes, c.dim)
    case c: AnnPqConsumer =>
      // one corpus prefix collect trains both models (seed sets nest)
      val (cells, books) = Ann.trainIvfPqModels(src, pk, c.vecCol, c.nlists, c.m, c.codeK)
      Ann.writePqIndex(src, c.indexPath, pk, c.vecCol, cells, books)
    case c: DedupConsumer =>
      // the seed corpus is just the first (big) batch: registers every
      // digest, first writer wins, survivors reported like any batch
      DedupStream.applyBatch(
        spark, src.select(col(pk), col(c.textCol)), c.indexPath, pk, c.textCol, c.onSurvivors)
      ()
    case c: ClusterConsumer =>
      ClusterStream.seed(src, c.sigPath, c.indexPath, pk, c.textCol, c.model, c.mapBuckets)
  }

  /** Apply one raw change batch to EVERY consumer — the batch-mode form.
    * The per-id op collapse + payload join runs ONCE over the union of the
    * consumers' payload columns and is cached across consumers (each
    * streaming query in [[start]] necessarily derives its own — separate
    * checkpoints mean separate plans — but batch mode shares the pass).
    *
    * The doc sync and the per-consumer applies then run as OVERLAPPING
    * Spark jobs (the [[seed]] rationale): each mutates only its own index
    * directory from the same immutable source state and the shared cached
    * `rows`, so per-surface content equals the sequential order, while a
    * consumer's driver-side sidecar reads/commits back-fill with the
    * others' executor work. A failed surface still fails the batch (first
    * failure rethrown after every job settles — no sibling is left
    * mid-write), and at-least-once replay converges per consumer exactly
    * as before: each surface is delete-first/first-writer-wins idempotent
    * on its OWN protocol, never dependent on a sibling's batch state.
    *
    * ACCEPTED read-skew window (documented trade-off of the overlap): the
    * doc sync is no longer a barrier before the consumers, so DURING a
    * batch — or between a mid-batch crash and its replay — a secondary
    * index may briefly reference an id whose document upsert has not landed
    * yet (the docs-first ordering only ever narrowed this window, it never
    * closed it: a probe between two surfaces' commits always saw mixed
    * batch states, and a crash after the doc write but before an index
    * write left the INVERSE skew). Composed read paths that join index hits
    * to the doc store must already tolerate missing/extra ids for
    * at-least-once reasons; replay converges every surface. Deployments
    * that want the narrower window back can run consumers-after-docs by
    * wrapping two applyBatch-shaped calls — the engine does not pay the
    * serialization for everyone by default (measured 0.77× on the composed
    * CDC row).
    */
  def applyBatch(batch: DataFrame): Unit = {
    if (consumers.isEmpty) { sync.applyChanges(batch); return }
    val payloads = consumers.map(_.payloadColumn).distinct
    val rows = changeRows(batch, load, table, pk, payloads).cache()
    try runOverlapped(
      ("apply: docs" -> (() => sync.applyChanges(batch))) +:
        consumers.map(c =>
          s"apply: ${c.name}" ->
            (() => applyConsumerRows(c, rows.select(col("tg_op"), col(pk), col(c.payloadColumn))))))
    finally { rows.unpersist(); () }
  }

  /** Run labeled independent jobs concurrently from a bounded driver pool;
    * job descriptions are thread-local, so each job group stays readable in
    * the UI. Every job settles before the first failure (if any) is
    * rethrown — siblings are never abandoned mid-write, so a batch failure
    * leaves each consumer either fully applied or untouched, the same
    * per-consumer states the sequential loop could leave and the replay
    * protocols already converge from.
    */
  private def runOverlapped(labeled: Seq[(String, () => Unit)]): Unit = {
    if (labeled.sizeIs <= 1) { labeled.foreach(_._2()); return }
    val sc = spark.sparkContext
    val pool = java.util.concurrent.Executors.newFixedThreadPool(labeled.size)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val settled = labeled
        .map { case (label, f) =>
          Future {
            sc.setJobDescription(s"pipeline $label")
            try f()
            finally sc.setJobDescription(null)
          }
        }
        .map(f => scala.util.Try(Await.result(f, Duration.Inf)))
      settled.collectFirst { case scala.util.Failure(e) => throw e }
      ()
    } finally pool.shutdown()
  }

  private def applyConsumerBatch(c: Consumer, batch: DataFrame): Unit =
    applyConsumerRows(c, changeRows(batch, load, table, pk, Seq(c.payloadColumn)))

  private def applyConsumerRows(c: Consumer, rows: DataFrame): Unit = {
    c match {
      case c: Bm25Consumer =>
        Bm25Stream.applyBatch(
          spark, rows, c.indexPath, pk, c.textCol, c.autoCompactRatio,
          c.impactGrowthMultiple)
      case c: AnnLshConsumer =>
        AnnStream.applyCdcBatchResumed(rows, c.indexPath, pk, c.vecCol, c.autoCompactRatio)
      case c: AnnPqConsumer =>
        AnnStream.applyCdcPqBatch(rows, c.indexPath, pk, c.vecCol, c.autoCompactRatio)
      case c: DedupConsumer =>
        // same (pk, text) survivor shape as the seed pass — consumers of
        // onSurvivors see one stable schema
        DedupStream.applyBatch(
          spark,
          rows.filter(col("tg_op") =!= "DELETE").select(col(pk), col(c.textCol)),
          c.indexPath, pk, c.textCol, c.onSurvivors)
        ()
      case c: ClusterConsumer =>
        ClusterStream.applyBatch(
          spark, rows, load(table), c.sigPath, c.indexPath, pk, c.textCol, c.autoCompactRatio)
    }
  }

  /** Start continuous maintenance: the doc sync plus one streaming query
    * per consumer, all reading the same feed, each with its own checkpoint
    * under `checkpointBase/<name>` — so restarts resume per consumer and a
    * replayed micro-batch converges per that consumer's protocol. `feed`
    * is a FACTORY because each query owns its streaming source instance.
    */
  def start(feed: () => DataFrame): Handles = {
    val doc = sync.stream(feed(), s"$checkpointBase/docs")
    val rest = consumers.map { c =>
      val q = feed().writeStream
        .option("checkpointLocation", s"$checkpointBase/${c.name}")
        .foreachBatch { (batch: DataFrame, _: Long) => applyConsumerBatch(c, batch) }
        .start()
      c.name -> q
    }.toMap
    Handles(doc, rest)
  }
}
