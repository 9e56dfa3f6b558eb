package graft.tools

import graft.GraftSync
import graft.ann.Ann
import graft.assemble.DocAssembler
import graft.catalog.{Catalog, TableMeta}
import graft.schema.SchemaDef
import graft.streaming.SyncPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic: per-stage wall times of the q_composed_cdc scenario (seed
  * snapshot, per-consumer index builds, the CDC batch, each probe leg), so
  * the composed entry's cost is attributable instead of one 15 s number.
  * Usage: ComposedProfile <sfDir>
  */
object ComposedProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-composed-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val base = graft.sources.Tables.load(spark, sfDir) _
    // the scenario's source table and batch come from the SAME fixture the
    // graded q_composed_* queries use, so this profile cannot drift from
    // what it is attributing
    def media(post: Boolean): DataFrame = graft.ComposedFixture.media(base, post)
    @volatile var post = false
    val load: String => DataFrame = { case "media" => media(post); case t => base(t) }
    val cat = Catalog(Map("media" -> TableMeta("media", Seq("doc_id"))))
    val root = graft.util.TempDirs.scratch("graft-composed-prof").toString
    val sync = new GraftSync(
      spark,
      SchemaDef.parse(
        """{"database":"graft","index":"media","nodes":{"table":"media","columns":["doc_id","text"]}}"""),
      cat, load, s"$root/docs")

    timed("doc snapshot")(sync.snapshot())
    val src = load("media")
    timed("bm25 seed build")(
      graft.functions.Retrieval.writeBm25Index(src, "doc_id", "text", s"$root/bm25", 16))
    timed("lsh seed build")(
      Ann.writeLshIndex(src, s"$root/ann", "doc_id", "embedding", 6, 64))

    post = true
    val batch = graft.ComposedFixture.changeBatch(media(post = false))

    timed("doc applyChanges")(sync.applyChanges(batch))
    val payloads = Seq("text", "embedding")
    val rows = timed("changeRows derive+cache") {
      val r = SyncPipeline.changeRows(batch, load, "media", "doc_id", payloads).cache()
      r.count(); r
    }
    timed("bm25 applyBatch")(
      graft.streaming.Bm25Stream.applyBatch(
        spark, rows.select(col("tg_op"), col("doc_id"), col("text")),
        s"$root/bm25", "doc_id", "text", None))
    timed("lsh applyBatch")(
      graft.streaming.AnnStream.applyCdcBatchResumed(
        rows.select(col("tg_op"), col("doc_id"), col("embedding")),
        s"$root/ann", "doc_id", "embedding", None))
    rows.unpersist()

    val queries = media(post = true).filter(col("doc_id") < 3)
    timed("doc probe leg")(
      sync.state.docs.select(
        col(DocAssembler.IdColumn).cast("long").as("k1"),
        length(get_json_object(col("doc"), "$.text")).cast("long").as("v")).count())
    timed("bm25 probe leg")(
      graft.functions.Retrieval.bm25TopKIndexedBatch(
        s"$root/bm25",
        queries.select(col("doc_id").as("qid"), col("text").as("qtext")), "qid", "qtext", 10)
        .count())
    timed("lsh probe leg")(
      Ann.lshTopKIndexed(
        s"$root/ann",
        queries.select(col("doc_id").as("qid"), col("embedding")), "qid", "embedding", 10,
        planes = 6, dim = 64).count())
    spark.stop()
  }
}
