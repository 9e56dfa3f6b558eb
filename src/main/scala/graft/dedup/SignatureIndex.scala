package graft.dedup

import graft.sources.IndexState
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** Persisted MinHash band-key signature index — the steady-state form the
  * incremental near-dup operators describe but recompute per call
  * ([[Dedup.minhashLshIncremental]]'s scaladoc: "in steady state its band
  * keys are computed once at ingest and stored (id, key)"). Each document
  * contributes `bands` `(id, key)` rows, hash-bucketed by key
  * (`kb = xxhash64(key) % buckets` partition dirs) so a batch probe plans
  * only the partitions its own keys hash into — the corpus-sized key set is
  * never scanned whole, the [[graft.dedup.ClusterMap]] / LSH-ANN pruning
  * discipline.
  *
  * Layout parameters (hash family, shingle width, banding, bucket count)
  * are frozen in a model sidecar at [[write]] time: a restarted consumer
  * resumes with the exact parameters the stored keys were derived under
  * (the [[graft.ann.AnnModels]] contract). Appends are O(batch) — stored
  * partitions are never read or rewritten; [[compact]] restores the
  * one-file-group-per-bucket bound and collapses the duplicate `(id, key)`
  * rows an at-least-once replay appends, through the generation-pointer
  * swap ([[IndexState.compactAndSwap]] — concurrent readers safe).
  *
  * Two honest divergences from the batch operators, both bounded by the
  * degenerate-bucket cap: keys are stored PER DOCUMENT (the batch
  * [[Dedup.minhashLsh]] collapses exact-duplicate texts to one
  * representative before banding — an incremental index cannot, since the
  * class membership changes under it), and the `maxBucket` no-signal guard
  * counts STORED rows, i.e. arrivals so far, where the batch form counts
  * the full corpus — a key can be live early and degenerate later. Both
  * effects only matter for buckets near the cap; candidates are always
  * verified by exact Jaccard afterwards, so no false pair survives.
  *
  * Reference analogue: the checkpointed replication state pgsync keeps
  * queryable between syncs (`/root/reference/pgsync/sync.py:1581-1656`) —
  * derived state persisted once at ingest, probed by every later batch.
  */
object SignatureIndex {

  /** Frozen layout + probe policy of one signature index.
    *
    * @param portable  md5 hash family ([[Dedup.minhashLshPortable]] —
    *                  externally replayable) vs the xxhash64 rotate-XOR
    *                  production family ([[Dedup.minhashLsh]])
    * @param buckets   key-hash partition count; scale with corpus size so
    *                  one bucket's keys fit a scan task
    */
  final case class Model(
      portable: Boolean,
      shingleN: Int,
      bands: Int,
      rowsPerBand: Int,
      threshold: Double,
      maxBucket: Int,
      buckets: Int
  ) {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(bands > 0 && rowsPerBand > 0, s"bad banding: $bands x $rowsPerBand")
  }

  private val ModelDir = "_graft_model"

  private val ModelSchema = StructType(Seq(
    StructField("portable", BooleanType),
    StructField("shingle_n", IntegerType),
    StructField("bands", IntegerType),
    StructField("rows_per_band", IntegerType),
    StructField("threshold", DoubleType),
    StructField("max_bucket", IntegerType),
    StructField("buckets", IntegerType)
  ))

  private val KeySchema = StructType(Seq(
    StructField("id", LongType),
    StructField("key", StringType),
    StructField("kb", IntegerType)
  ))

  /** The model's band keys of `docs` as `(id, key)` — the exact derivation
    * the batch operators use, so stored keys and probe keys always agree.
    */
  def bandKeys(docs: DataFrame, id: String, text: String, m: Model): DataFrame =
    if (m.portable) Dedup.portableBandKeys(docs, id, text, m.shingleN, m.bands, m.rowsPerBand)
    else Dedup.prodBandKeys(docs, id, text, m.shingleN, m.bands, m.rowsPerBand)

  private def withKb(keys: DataFrame, buckets: Int): DataFrame =
    keys.withColumn("kb", pmod(xxhash64(col("key")), lit(buckets.toLong)).cast("int"))

  /** Build the index from a corpus (empty corpus allowed: sidecars only —
    * an empty partitioned directory is unreadable, the
    * [[IndexState.stagingHasData]] refusal rationale; reads tolerate the
    * absent layout).
    */
  def write(corpus: DataFrame, path: String, id: String, text: String, m: Model): Unit = {
    val spark = corpus.sparkSession
    val keys = withKb(bandKeys(corpus, id, text, m), m.buckets)
    if (!keys.isEmpty)
      keys
        .repartition(col("kb"))
        .write.mode("overwrite").partitionBy("kb").parquet(path)
    writeModel(spark, path, m)
    IndexState.writeSeq(spark, path, 0L)
  }

  private def writeModel(spark: SparkSession, path: String, m: Model): Unit = {
    import spark.implicits._
    Seq((m.portable, m.shingleN, m.bands, m.rowsPerBand, m.threshold, m.maxBucket, m.buckets))
      .toDF("portable", "shingle_n", "bands", "rows_per_band", "threshold", "max_bucket", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/$ModelDir")
  }

  def readModel(spark: SparkSession, path: String): Model = {
    val r = spark.read.schema(ModelSchema).parquet(s"$path/$ModelDir").collect()(0)
    Model(r.getBoolean(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4), r.getInt(5), r.getInt(6))
  }

  /** Append a batch's keys under the frozen model — O(batch): one new file
    * group per touched bucket, stored partitions untouched. Pass the keys
    * already derived for the probe ([[bandKeys]]) to avoid re-shingling.
    */
  def appendKeys(spark: SparkSession, path: String, m: Model, keys: DataFrame): Unit = {
    val dataDir = IndexState.dataPath(spark, path)
    val keyed = withKb(keys, m.buckets)
    if (!keyed.isEmpty)
      keyed
        .repartition(col("kb"))
        .write.mode("append").partitionBy("kb").parquet(dataDir)
  }

  /** [[appendKeys]] from raw documents (the restart path: model from the
    * sidecar, keys derived here).
    */
  def append(batch: DataFrame, path: String, id: String, text: String): Unit = {
    val spark = batch.sparkSession
    val m = readModel(spark, path)
    appendKeys(spark, path, m, bandKeys(batch, id, text, m))
  }

  private def emptyCandidates(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("batch_id", LongType), StructField("corpus_id", LongType))))

  /** Distinct `(batch_id, corpus_id)` candidate pairs of a probe key set
    * against the stored corpus keys. The probe's distinct `kb` values
    * (≤ `buckets` ints, driver-collected — the bounded-collect convention)
    * become a static partition filter, so only the probed buckets are
    * scanned — and the scan is further restricted to the PROBED KEYS by a
    * broadcast semi-join before anything shuffles, so the groupBy that
    * enforces the degenerate-key guard and the candidate join both run on
    * matched rows only, never the stored key set whole (counting only
    * probed keys is exact: unprobed keys can produce no candidate, and a
    * key's stored rows are unaffected by the key restriction). Self-pairs
    * (a replayed batch probing its own stored keys) are dropped. Candidates
    * still need exact verification ([[Dedup.verifyJaccard]]) — banding only
    * bounds recall. `probeKeys` must be change-batch-sized (it is collected
    * to a broadcast) — the standing assumption of the whole maintenance
    * family, not a new one.
    */
  /** The stored rows MATCHING a probe key set, before materialization: the
    * probe's distinct `kb` values become a static partition filter and a
    * broadcast semi-join restricts the pruned buckets to the probed keys —
    * the plan PlanSpec asserts bucket pruning on (the plan is invisible in
    * [[candidates]]' output, which materializes this frame eagerly).
    */
  private[graft] def storedMatched(
      spark: SparkSession,
      dataDir: String,
      keyed: DataFrame,
      kbs: Array[Int]
  ): DataFrame =
    spark.read.schema(KeySchema).parquet(dataDir)
      .filter(col("kb").isin(kbs.map(Integer.valueOf): _*))
      .join(broadcast(keyed.select(col("key")).distinct()), Seq("key"))

  def candidates(spark: SparkSession, path: String, m: Model, probeKeys: DataFrame): DataFrame = {
    val dataDir = IndexState.dataPath(spark, path)
    if (!IndexState.stagingHasData(spark, dataDir)) return emptyCandidates(spark)
    val keyed = withKb(probeKeys, m.buckets)
    val kbs = keyed.select(col("kb")).distinct().collect().map(_.getInt(0))
    if (kbs.isEmpty) return emptyCandidates(spark)
    // eager local checkpoint: the matched-row frame feeds BOTH the
    // degenerate-key guard aggregate and the candidate join — without it
    // the bucket scan runs twice per micro-batch. Probe-matched rows are
    // batch-sized; the blocks are reclaimed by the context cleaner once
    // the caller's materialized result drops the reference (the
    // ClusterStream caching discipline).
    val stored = storedMatched(spark, dataDir, keyed, kbs).localCheckpoint(true)
    val ok = stored
      .groupBy(col("key"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= m.maxBucket)
      .select(col("key"))
    keyed
      .select(col("id").as("batch_id"), col("key"))
      .join(ok, Seq("key"))
      .join(stored.select(col("id").as("corpus_id"), col("key")), Seq("key"))
      .filter(col("batch_id") =!= col("corpus_id"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct()
  }

  /** All stored `(id, key)` rows of the current generation — the portable
    * seed's pair derivation reads the just-written index back instead of
    * re-banding the corpus (one shingle+minhash pass saved; the written
    * index IS the materialization). Empty index (empty-corpus seed writes
    * sidecars only) yields an empty frame.
    */
  private[graft] def storedKeys(spark: SparkSession, path: String): DataFrame = {
    val dataDir = IndexState.dataPath(spark, path)
    if (!IndexState.stagingHasData(spark, dataDir))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("id", LongType), StructField("key", StringType))))
    else
      spark.read.schema(KeySchema).parquet(dataDir).select(col("id"), col("key"))
  }

  /** Rewrite the index deduplicated (`(id, key)` rows replayed by
    * at-least-once delivery collapse) and back to one file group per
    * bucket, promoted through the generation-pointer swap. Returns whether
    * a compaction ran (empty index: nothing to do).
    */
  def compact(spark: SparkSession, path: String): Boolean = {
    if (!IndexState.stagingHasData(spark, IndexState.dataPath(spark, path))) return false
    IndexState.compactAndSwap(spark, path, staging =>
      spark.read.schema(KeySchema).parquet(IndexState.dataPath(spark, path))
        .select(col("id"), col("key"), col("kb"))
        .distinct()
        .repartition(col("kb"))
        .write.mode("overwrite").partitionBy("kb").parquet(staging))
  }
}
