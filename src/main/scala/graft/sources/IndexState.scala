package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Shared mutation state for the persisted retrieval/ANN indexes (BM25
  * postings, LSH buckets, IVF-PQ cells): a sequence counter plus a
  * tombstone sidecar, both living INSIDE the index directory under
  * underscore-prefixed names (invisible to the parquet scan of the index
  * root — the [[graft.ann.AnnModels]] sidecar discipline).
  *
  * Why this exists: the engine is a CDC sync product — DELETE events must
  * remove documents from every probe surface, the way the reference removes
  * deleted rows from its search index (`/root/reference/pgsync/sync.py:
  * 1254-1306`, doc op construction `sync.py:1556-1579`). The doc index
  * (`MaterializedIndex`) already honors deletes via bucket rewrite; the
  * persisted secondary indexes were append-only. Rewriting a posting/cell
  * bucket per delete batch would be O(bucket) writes for O(batch) deletes,
  * so these indexes instead take the log-structured route every production
  * index engine uses: deletes append TOMBSTONES, probes subtract them,
  * compaction reclaims them.
  *
  * Layout under `<indexPath>/`:
  *   - `_graft_seq/`        — one row (seq BIGINT): the last mutation
  *     sequence number. Every mutation (append or delete batch) gets the
  *     next number; data rows are stamped with the seq of the mutation
  *     that wrote them (the base build writes seq 0).
  *   - `_graft_tombstones/` — rows (id BIGINT, del_seq BIGINT), appended
  *     one file group per delete batch.
  *
  * Visibility rule — the reason seq exists at all: a data row `(id, seq)`
  * is visible iff no tombstone `(id, del_seq ≥ seq)` exists. A plain id
  * set cannot express delete-then-re-add (the CDC UPDATE flow is delete +
  * append): un-tombstoning the id would resurrect the doc's OLD rows still
  * on disk, while seq comparison hides exactly the rows written before the
  * delete and shows the ones written after.
  *
  * Scale shape: tombstones are delete-batch-sized, not corpus-sized; the
  * visibility join runs AFTER partition pruning, so it touches candidate
  * rows only, and an index with no tombstone sidecar skips the join
  * entirely (zero plan change for append-only indexes). Single-writer
  * discipline (one sync engine per index) is assumed, as everywhere else
  * in the persisted-index family.
  */
object IndexState {

  val SeqDir = "_graft_seq"
  val TombstoneDir = "_graft_tombstones"

  /** Sibling-directory suffixes used by the compaction swap: the rewritten
    * index is staged at `<path>.graft_compact` and the old one parks at
    * `<path>.graft_trash` for the duration of the swap.
    */
  val StagingSuffix = ".graft_compact"
  val TrashSuffix = ".graft_trash"

  /** Generation-pointer layout ([[compactAndSwap]]'s swap mechanism): a
    * compacted rewrite is promoted to `<path>/_graft_gen-<n>/` and becomes
    * current the instant its `_graft_ready` marker file exists — a single
    * file CREATE, atomic on POSIX/HDFS and a single PUT on object stores,
    * unlike the two directory renames of [[swapCompacted]] (whose window a
    * racing reader could observe, and which object stores implement as
    * non-atomic copy+delete). Readers resolve [[dataPath]] once per
    * probe/mutation: highest ready generation, or the index root for a
    * never-compacted (legacy) layout. GC is AGE-BASED: a generation (or the
    * legacy root data) stops being current the instant a successor's ready
    * marker is created, and may be deleted only once that successor marker
    * is at least [[gcGraceMs]] old — so a reader that resolved ANY
    * generation keeps a complete directory for up to the grace window, no
    * matter how many compactions chain behind it (back-to-back compactions
    * used to be able to lap a slow reader when GC was purely generational).
    * The immediate predecessor is always retained (its successor's marker
    * was created this instant); marker-less directories from crashed
    * promotes were never resolvable and are deleted immediately. Disk cost
    * is bounded by compaction frequency × grace. The underscore prefix
    * keeps generation directories invisible to any parquet read of the
    * index root.
    */
  val GenPrefix = "_graft_gen-"
  val ReadyMarker = "_graft_ready"

  /** Minimum age of the SUCCESSOR's ready marker before a superseded
    * generation may be GC'd — the upper bound on a reader's
    * resolve-to-finish window. Tunable per session via the
    * `graft.index.gcGraceMs` conf (clock-skew margins on object stores,
    * longer scans at larger corpora).
    */
  val DefaultGcGraceMs: Long = 600000L

  private def gcGraceMs(spark: SparkSession): Long =
    spark.conf.getOption("graft.index.gcGraceMs").map(_.toLong).getOrElse(DefaultGcGraceMs)

  /** Underscore-prefixed entries that are GENERATIONAL DATA (rewritten by
    * compaction, resolved under [[dataPath]]) rather than root-level shared
    * mutation state — deleted with the legacy root data when GC retires the
    * pre-generation layout: the BM25 doclens sidecar and the tombstones.
    * Tombstones are generation-scoped ON PURPOSE: a compacted generation is
    * born tombstone-free, so the ready-marker flip retires the data and its
    * delete-set in ONE atomic step — clearing a shared root sidecar after
    * the flip would yank files from under a reader still scanning the
    * previous generation (caught by GenerationSpec's concurrent probe).
    */
  private val GenerationalSidecars =
    Set("_graft_doclens", "_graft_impacts", "_graft_termdf", TombstoneDir, "_graft_merges")

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Generation numbers present under `path` (ready or not — a crashed
    * promote can leave a marker-less directory, which [[currentGen]]
    * ignores and the next promote numbers past and GCs).
    */
  private def genNumbers(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) Nil
    else
      f.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(GenPrefix)) n.stripPrefix(GenPrefix).toLongOption else None
      }
  }

  /** Highest READY generation, None for a legacy (root-data) layout. */
  def currentGen(spark: SparkSession, path: String): Option[Long] =
    genNumbers(spark, path)
      .filter(n => exists(spark, s"$path/$GenPrefix$n/$ReadyMarker"))
      .sorted(Ordering[Long].reverse)
      .headOption

  /** Resolve the directory holding the index's DATA partitions: the highest
    * ready generation after a [[compactAndSwap]], the index root before the
    * first one. Every probe and mutation resolves through here (one LIST of
    * the index root); root-level sidecars (`_graft_seq`, tombstones, stats,
    * model) are shared across generations and never move.
    */
  def dataPath(spark: SparkSession, path: String): String =
    currentGen(spark, path).map(n => s"$path/$GenPrefix$n").getOrElse(path)

  /** Promote a fully-written staging rewrite to the next generation:
    * rename it under the root, then CREATE the ready marker — the atomic
    * flip that makes it current. Then the age-based GC ([[gcExpired]]):
    * superseded generations (and the legacy root data) are deleted only
    * once their successor's ready marker is [[gcGraceMs]] old.
    */
  def promoteStaging(spark: SparkSession, path: String, stagingPath: String): Unit = {
    val f = fs(spark, path)
    val next = genNumbers(spark, path).foldLeft(0L)(math.max) + 1L
    val genDir = new Path(s"$path/$GenPrefix$next")
    require(
      f.rename(new Path(stagingPath), genDir),
      s"promoteStaging: could not move $stagingPath to $genDir"
    )
    f.create(new Path(s"$path/$GenPrefix$next/$ReadyMarker"), false).close()
    gcExpired(spark, path, next)
  }

  /** Age-based generation GC (see [[GenPrefix]]): a generation g may be
    * deleted once the LOWEST ready generation above it — the promotion that
    * made g non-current — has a ready marker at least [[gcGraceMs]] old; a
    * reader that resolved g started its scan before that marker existed, so
    * it has had the full grace window to finish. The legacy root data is
    * the generation "below" every numbered one: it expires against the
    * lowest ready generation present. Marker-less directories (crashed
    * promotes, never resolvable) are deleted immediately.
    */
  private def gcExpired(spark: SparkSession, path: String, next: Long): Unit = {
    val f = fs(spark, path)
    val grace = gcGraceMs(spark)
    val now = System.currentTimeMillis()
    val gens = genNumbers(spark, path)
    val readyAt: Map[Long, Long] = gens.flatMap { n =>
      val m = new Path(s"$path/$GenPrefix$n/$ReadyMarker")
      if (f.exists(m)) Some(n -> f.getFileStatus(m).getModificationTime) else None
    }.toMap
    def supersededLongEnough(g: Long): Boolean =
      readyAt.keys.filter(_ > g).minOption.exists(s => now - readyAt(s) >= grace)
    gens.filterNot(_ == next).foreach { g =>
      if (!readyAt.contains(g) || supersededLongEnough(g))
        deleteDir(spark, s"$path/$GenPrefix$g")
    }
    if (supersededLongEnough(-1L)) deleteLegacyRootData(spark, path)
  }

  /** Delete the pre-generation data entries at the index root: everything
    * not underscore/dot-prefixed (partition dirs, part files) plus the
    * [[GenerationalSidecars]]. Root-level mutation state and generation
    * directories are untouched. Idempotent.
    */
  private def deleteLegacyRootData(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) return
    f.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      val legacyData = (!n.startsWith("_") && !n.startsWith(".")) || GenerationalSidecars(n)
      if (legacyData && !n.startsWith(GenPrefix)) { f.delete(st.getPath, true); () }
    }
  }

  /** Last mutation sequence number; 0 for an index built before any
    * mutation (or by a pre-seq layout).
    *
    * The empty-sidecar fallback is READER-only: a concurrent reader can
    * observe the dir mid-overwrite (exists, no data files yet), and seq 0
    * is a fine transient answer for a probe. Mutators must NOT take it —
    * an existing-but-empty seq dir on the single-writer path means a
    * crashed [[writeSeq]] overwrite, and silently restarting the counter
    * at 0 would stamp new upserts with seqs BELOW stored tombstone
    * `del_seq` values, permanently masking re-inserted rows. [[bumpSeq]]
    * passes `strictEmpty = true` and fails loudly instead.
    */
  def readSeq(spark: SparkSession, indexPath: String, strictEmpty: Boolean = false): Long = {
    recoverSwap(spark, indexPath)
    val p = s"$indexPath/$SeqDir"
    if (!exists(spark, p)) 0L
    else {
      // explicit schema + headOption: no schema inference, and the
      // mid-overwrite window reads as an empty collect rather than a
      // schema-inference failure
      val head = spark.read
        .schema(StructType(Seq(StructField("seq", LongType))))
        .parquet(p)
        .collect()
        .headOption
      head.map(_.getLong(0)).getOrElse {
        if (strictEmpty)
          throw new IllegalStateException(
            s"$p exists but holds no seq row — a crashed writeSeq overwrite. " +
              "Refusing to restart the counter at 0 (new seqs would fall below " +
              "stored tombstone del_seq values and mask re-inserted rows). " +
              "Repair with IndexState.writeSeq(path, n) where n is at least the " +
              "max seq across the index's data rows, tombstones, and merge log.")
        0L
      }
    }
  }

  def writeSeq(spark: SparkSession, indexPath: String, seq: Long): Unit = {
    import spark.implicits._
    Seq(seq).toDF("seq").coalesce(1).write.mode("overwrite").parquet(s"$indexPath/$SeqDir")
  }

  /** Reserve the next mutation sequence number (persists it immediately:
    * a crash between the bump and the data write burns a number, which is
    * harmless — gaps carry no meaning).
    */
  def bumpSeq(spark: SparkSession, indexPath: String): Long = {
    val next = readSeq(spark, indexPath, strictEmpty = true) + 1L
    writeSeq(spark, indexPath, next)
    next
  }

  /** The tombstone sidecar lives INSIDE the current data directory
    * ([[dataPath]]) so a generation and its delete-set travel together —
    * see [[GenerationalSidecars]]. Mutations resolve per call
    * (single-writer: no promotion can race them); reader paths that also
    * scan the data must resolve ONCE and use [[visibleAt]] so data and
    * tombstones come from the same generation.
    */
  def hasTombstones(spark: SparkSession, indexPath: String): Boolean = {
    recoverSwap(spark, indexPath)
    exists(spark, s"${dataPath(spark, indexPath)}/$TombstoneDir")
  }

  /** The tombstone sidecar's fixed schema. Reads always pass it explicitly:
    * schema inference on the sidecar would fail on a directory that EXISTS
    * but holds no data files yet — exactly the window a concurrent reader
    * can observe while the first delete batch's `_temporary` output is
    * mid-write (caught by GenerationSpec's concurrent probe). With the
    * schema pinned, that window reads as zero tombstones, and every read
    * skips footer inference.
    */
  private val TombstoneSchema: StructType =
    StructType(Seq(StructField("id", LongType), StructField("del_seq", LongType)))

  /** Aggregated tombstones `(ts_id, del_seq)` of the resolved data dir
    * `dataDir` — one row per deleted id, carrying the LATEST delete seq
    * (earlier deletes of the same id are subsumed: any row hidden by an old
    * delete is also hidden by a newer one).
    */
  def readTombstonesAt(spark: SparkSession, dataDir: String): DataFrame =
    spark.read
      .schema(TombstoneSchema)
      .parquet(s"$dataDir/$TombstoneDir")
      .groupBy(col("id").as("ts_id"))
      .agg(max(col("del_seq")).as("del_seq"))
      .select(col("ts_id"), col("del_seq"))

  /** Append a delete batch: `ids` must expose a single BIGINT column named
    * `id`. One new file group per batch; O(batch) write. Lands in the
    * CURRENT generation's sidecar.
    */
  def appendTombstones(ids: DataFrame, indexPath: String, seq: Long): Unit =
    ids
      .select(col("id").cast("long").as("id"), lit(seq).as("del_seq"))
      .distinct()
      .coalesce(1)
      .write
      .mode("append")
      .parquet(s"${dataPath(ids.sparkSession, indexPath)}/$TombstoneDir")

  /** Number of distinct tombstoned ids — the compaction-policy signal.
    * Cost is a scan of the (delete-batch-sized) sidecar only, never the
    * index. 0 when no delete has ever happened.
    */
  def tombstoneCount(spark: SparkSession, indexPath: String): Long =
    if (!hasTombstones(spark, indexPath)) 0L
    else readTombstonesAt(spark, dataPath(spark, indexPath)).count()

  /** Swap a compacted staging directory into place: the live index moves
    * to `<path>.graft_trash`, staging is renamed over `path`, and the
    * trash is deleted last. On a filesystem with atomic directory rename
    * (POSIX, HDFS) every intermediate state holds a COMPLETE index in at
    * least one of the three locations, and [[recoverSwap]] — run by every
    * subsequent open through [[readSeq]]/[[hasTombstones]] — restores it
    * to `path`, preferring the newer staging copy. So a crash anywhere in
    * the swap self-heals on the next probe or mutation. On object stores
    * where "rename" is copy+delete this window is NOT atomic — run
    * compaction there against a metastore location pointer instead of
    * directory renames. Single-writer discipline assumed (one maintainer
    * per index), and no CONCURRENT reader during the swap itself: a probe
    * racing the two renames can observe the missing-live window. Probes
    * before and after the swap (the sequential per-batch case the
    * streaming maintainers implement) are unaffected.
    */
  def swapCompacted(spark: SparkSession, path: String, stagingPath: String): Unit = {
    val f = fs(spark, path)
    val live = new Path(path)
    val staging = new Path(stagingPath)
    val trash = new Path(path + TrashSuffix)
    require(f.exists(staging), s"swapCompacted: staging $stagingPath does not exist")
    if (f.exists(trash)) { f.delete(trash, true); () }
    require(f.rename(live, trash), s"swapCompacted: could not move $path aside")
    if (!f.rename(staging, live)) {
      // roll the live index back before failing: never leave a hole
      if (!f.rename(trash, live))
        throw new IllegalStateException(
          s"swapCompacted: could not move $stagingPath into place AND the rollback of " +
            s"$path from $trash failed — the old index is intact at $trash; " +
            s"recoverSwap (any subsequent open) will restore it"
        )
      throw new IllegalStateException(s"swapCompacted: could not move $stagingPath into place")
    }
    f.delete(trash, true)
    ()
  }

  /** Recovery sweep for an interrupted [[swapCompacted]]: if the index is
    * missing from `path` but a complete copy survives in the staging or
    * trash sibling, rename it back into place (staging wins — it is only
    * ever renamed-from AFTER being fully written, and it is the newer
    * generation). Returns whether an index was restored. Called from
    * [[readSeq]] and [[hasTombstones]], so every mutation and every
    * tombstone-aware probe self-heals on open; a healthy index pays
    * exactly ONE file-status probe.
    *
    * Stale siblings next to a live index are left alone: a leftover trash
    * is deleted by the next swap (paying its cleanup on every open would
    * tax the hot path), and deleting a staging sibling here would race an
    * in-flight compaction (the compaction flow writes staging while the
    * live index exists).
    */
  def recoverSwap(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark, path)
    val live = new Path(path)
    val staging = new Path(path + StagingSuffix)
    val trash = new Path(path + TrashSuffix)
    if (f.exists(live)) {
      // healthy index: ONE existence probe and out. A stale trash sibling
      // from a crash after the second rename is harmless (swapCompacted
      // deletes it before the next swap), so the hot path does not pay a
      // second probe for its cleanup.
      false
    } else if (f.exists(staging)) {
      if (f.rename(staging, live)) {
        if (f.exists(trash)) { f.delete(trash, true); () }
        true
      } else if (f.exists(trash) && f.rename(trash, live)) {
        // staging is un-renameable (permissions, cross-device residue):
        // fall back to the intact older copy rather than wedging every
        // open; the staging sibling is left in place for inspection and
        // surfaced here
        System.err.println(
          s"recoverSwap: staging $staging could not be renamed into place; " +
            s"restored the OLDER trash copy instead — investigate $staging"
        )
        true
      } else
        throw new IllegalStateException(
          s"recoverSwap: could not restore $path from $staging and no usable trash copy exists"
        )
    } else if (f.exists(trash)) {
      require(f.rename(trash, live), s"recoverSwap: could not restore $path from $trash")
      true
    } else false
  }

  /** Whether a compacted staging directory holds any DATA partition.
    * False when the visible set was empty at compaction time: Spark writes
    * a partitioned empty DataFrame as a directory containing only _SUCCESS
    * and the underscore sidecars, which a later parquet read of the index
    * root cannot infer a schema from. The `maybeCompact*` policies use
    * this to refuse to swap an empty index into place — a delete-everything
    * feed must not brick the index (probes on the un-compacted index
    * already return the correct empty result via [[visible]]).
    */
  def stagingHasData(spark: SparkSession, stagingPath: String): Boolean = {
    val f = fs(spark, stagingPath)
    val p = new Path(stagingPath)
    f.exists(p) && f.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Recursively delete a directory if it exists (abandoned staging). */
  def deleteDir(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Seq at which an empty-rewrite refusal was recorded, None if none (or
    * the marker is unreadable — treated as absent). Plain text file: tiny,
    * and a torn write parses to None, which only costs one extra rewrite.
    */
  def refusedSeq(spark: SparkSession, path: String): Option[Long] = {
    val f = fs(spark, path)
    val p = new Path(s"$path/$RefusedMarker")
    if (!f.exists(p)) None
    else
      try {
        val in = f.open(p)
        val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        s.trim.toLongOption
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def writeRefusedSeq(spark: SparkSession, path: String, seq: Long): Unit = {
    val f = fs(spark, path)
    val out = f.create(new Path(s"$path/$RefusedMarker"), true)
    try out.write(seq.toString.getBytes("UTF-8")) finally out.close()
  }

  private def clearRefusedSeq(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new Path(s"$path/$RefusedMarker")
    if (f.exists(p)) { f.delete(p, false); () }
  }

  val RefusedMarker = "_graft_compact_refused"

  /** Shared tail of every `maybeCompact*` policy: rewrite the index to the
    * staging sibling via `compact`, REFUSE to promote an empty rewrite
    * (delete-everything feeds must not brick the index — see
    * [[stagingHasData]]), and promote to the next generation otherwise
    * ([[promoteStaging]] — readers racing the flip keep a complete
    * directory; see [[GenPrefix]]). Keeping this in one place makes the
    * empty-rewrite guard impossible to omit from any one index family.
    *
    * A refusal is memoized at the index's current mutation seq: until a
    * mutation bumps the seq, re-running the policy skips the (index-scan +
    * rewrite) attempt entirely — a fully-deleted index under a steady CDC
    * feed pays the refused rewrite once, not per batch. The promoted
    * generation is born tombstone-free (the rewrite dropped those rows, and
    * the sidecar is generation-scoped), so no post-flip cleanup touches
    * files a racing reader may hold. Returns whether the promotion
    * happened.
    */
  def compactAndSwap(spark: SparkSession, path: String, compact: String => Unit): Boolean = {
    val seqNow = readSeq(spark, path)
    if (refusedSeq(spark, path).contains(seqNow)) return false
    val staging = path + StagingSuffix
    deleteDir(spark, staging) // abandoned residue from a crashed attempt
    compact(staging)
    if (!stagingHasData(spark, staging)) {
      deleteDir(spark, staging)
      writeRefusedSeq(spark, path, seqNow)
      false
    } else {
      promoteStaging(spark, path, staging)
      clearRefusedSeq(spark, path)
      true
    }
  }

  /** Filter `rows` (which must carry `idCol` and a BIGINT `seq` column) to
    * the visible set under the tombstones of the RESOLVED data directory
    * `dataDir` — the same directory `rows` was read from, so data and
    * delete-set come from one generation even if a compaction promotes a
    * new one mid-plan. No tombstone sidecar ⇒ `rows` unchanged —
    * append-only (and freshly compacted) generations pay nothing.
    */
  def visibleAt(rows: DataFrame, dataDir: String, idCol: String): DataFrame = {
    val spark = rows.sparkSession
    if (!exists(spark, s"$dataDir/$TombstoneDir")) rows
    else {
      val ts = readTombstonesAt(spark, dataDir)
      rows
        .join(ts, rows(idCol) === ts("ts_id"), "left_outer")
        .filter(col("del_seq").isNull || col("seq") > col("del_seq"))
        .drop("ts_id", "del_seq")
    }
  }
}
