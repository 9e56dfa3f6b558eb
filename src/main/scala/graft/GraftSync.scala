package graft

import graft.assemble.DocAssembler
import graft.catalog.Catalog
import graft.cdc.{Changes, IncrementalEngine}
import graft.schema.{Node, SchemaDef}
import graft.sinks.{MaterializedIndex, SearchSink}
import graft.streaming.StreamSync
import graft.transform.{DocTransform, Plugins}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** User-facing facade — the equivalent of the reference's `Sync` class
  * (`pgsync/sync.py:98-156`): construct from a schema document, snapshot,
  * then maintain incrementally from a change feed.
  *
  * {{{
  * val sync = GraftSync(spark, schemaJson, Catalog.testData,
  *                      Tables.load(spark, dir), "/indexes/orders")
  * sync.snapshot()                                   // pull(), sync.py:1895
  * sync.applyChanges(batchDf)                        // batch incremental
  * val q = sync.stream(Changes.fileStream(spark, feedDir), ckptDir)
  * }}}
  */
final class GraftSync(
    spark: SparkSession,
    val schema: SchemaDef,
    catalog: Catalog,
    load: String => DataFrame,
    indexDir: String,
    plugins: Seq[DocTransform] = Nil
) {

  /** Base-table → view-node remap (C9, `pgsync/sync.py:1843-1852`): a node
    * may be a view with `base_tables`; change events on a base table are
    * remapped to the view's node before resolution.
    */
  private val baseTableRemap: Map[String, String] = {
    def collect(n: Node): Seq[(String, String)] =
      n.baseTables.map(_ -> n.table) ++ n.children.flatMap(collect)
    collect(schema.root).toMap
  }

  private val treeTables: Set[String] = {
    def tables(n: Node): Set[String] =
      Set(n.table) ++ n.children.flatMap(c =>
        c.relationship.toSeq.flatMap(_.throughTables) ++ tables(c)
      )
    tables(schema.root)
  }

  val state = new MaterializedIndex(spark, indexDir)
  private val sync = new StreamSync(schema.root, catalog, load, state)
  val engine: IncrementalEngine = sync.engine

  /** Assemble the full document set (no side effects). */
  def documents(): DataFrame = {
    val docs = DocAssembler.assemble(schema.root, load, catalog)
    Plugins(docs, plugins)
  }

  /** Full snapshot → materialized index v0. */
  def snapshot(): Unit = sync.snapshot()

  /** Pre-filter a change feed: schema filter (P8) + base-table remap (C9). */
  def prepare(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val remapped = baseTableRemap.foldLeft(changes) { case (df, (from, to)) =>
      df.withColumn("tbl", when(col("tbl") === from, to).otherwise(col("tbl")))
    }
    Changes.schemaFilter(remapped, treeTables)
  }

  /** Apply one batch of changes to the materialized index. */
  def applyChanges(batch: DataFrame): Unit = sync.applyBatch(prepare(batch))

  /** Start continuous maintenance from a streaming change feed. */
  def stream(changes: DataFrame, checkpointDir: String): StreamingQuery =
    sync.start(prepare(changes), checkpointDir)

  /** The search-index bootstrap mapping for this schema (S11). */
  def indexMapping: String = SearchSink.buildMapping(schema.root, schema.routing)
}

object GraftSync {
  def apply(
      spark: SparkSession,
      schemaJson: String,
      catalog: Catalog,
      load: String => DataFrame,
      indexDir: String,
      plugins: Seq[DocTransform] = Nil
  ): GraftSync =
    new GraftSync(spark, SchemaDef.parse(schemaJson), catalog, load, indexDir, plugins)
}
