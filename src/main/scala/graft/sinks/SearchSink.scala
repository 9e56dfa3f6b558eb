package graft.sinks

import graft.schema.{Node, RelType, TransformSpec, Variant}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Search-index sink surface: bulk-operation formatting and index-mapping
  * bootstrap, mirroring the reference's ES/OpenSearch client
  * (`pgsync/search_client.py`) without requiring a live cluster.
  *
  * - [[bulkActions]] renders op rows (`op`, `_id`, `doc`) into the
  *   newline-delimited `_bulk` wire format (`search_client.py:100-212`
  *   builds the same action dicts; chunking 5 000 docs / 100 MB becomes
  *   partition granularity here — `foreachPartition` + an HTTP client is
  *   the production write path, one bulk request per partition chunk).
  * - [[writeBulkFiles]] persists the rendered actions — a test/replay sink.
  * - [[buildMapping]] derives the index mapping from the node tree +
  *   per-node `transform.mapping` overrides (`search_client.py:304-354`
  *   `_build_mapping`): one_to_many/object children become `nested`.
  */
object SearchSink {

  /** Render ops into `_bulk` action lines: a metadata line per op, a source
    * line for index ops (`search_client.py:161-189` equivalents). `pipeline`
    * attaches the schema's ingest pipeline to index actions
    * (`pgsync/sync.py:115,1576-1577` — deletes never carry one).
    */
  def bulkActions(
      ops: DataFrame,
      index: String,
      routing: Option[String] = None,
      pipeline: Option[String] = None,
      legacyType: Boolean = false
  ): DataFrame = {
    val routingCol =
      routing.map(r => get_json_object(col("doc"), s"$$.$r")).getOrElse(lit(null).cast("string"))
    // ES < 7 bulk metadata carries the `_doc` mapping type
    // (BulkHttp.ServerInfo.legacyMappingType drives this)
    val typeCol: Seq[org.apache.spark.sql.Column] =
      if (legacyType) Seq(lit("_doc").as("_type")) else Nil
    val deleteMeta = struct(
      (Seq(lit(index).as("_index"), col("_id")) ++ typeCol :+ routingCol.as("routing")): _*)
    val indexMeta = struct(
      (Seq(lit(index).as("_index"), col("_id")) ++ typeCol ++ Seq(
        routingCol.as("routing"),
        pipeline.map(lit(_)).getOrElse(lit(null).cast("string")).as("pipeline")
      )): _*)
    ops.select(
      when(col("op") === "delete", concat(lit("""{"delete":"""), to_json(deleteMeta), lit("}")))
        .otherwise(
          concat(
            lit("""{"index":"""), to_json(indexMeta), lit("}"), lit("\n"), col("doc")
          )
        )
        .as("action")
    )
  }

  /** Test sink: bulk actions as text files, one per partition — the shape a
    * `foreachPartition` HTTP bulk writer consumes. `chunkSize` mirrors the
    * reference's `ELASTICSEARCH_CHUNK_SIZE` 5 000 (`settings.py:145`):
    * `maxRecordsPerFile` caps each output file at one bulk request, and the
    * REBALANCE hint lets AQE coalesce many tiny upstream partitions into
    * right-sized ones (one bulk request ≈ one file) — no pre-count, which
    * would execute the whole ops plan twice.
    */
  def writeBulkFiles(ops: DataFrame, index: String, outDir: String, chunkSize: Int = 5000): Unit =
    bulkActions(ops.hint("rebalance"), index).write
      .option("maxRecordsPerFile", chunkSize.toLong)
      .mode("overwrite")
      .text(outDir)

  /** Search-index mapping derivation (`_build_mapping`,
    * `search_client.py:304-354`): walk the tree; leaves get a type from the
    * node's `transform.mapping` override or stay dynamic; one_to_many object
    * children are `nested`, one_to_one object children are `object`.
    * `setting` (the schema doc's per-index settings object) merges into the
    * body as `{"settings": {"index": setting}}` exactly like
    * `_create_setting` (`search_client.py:261-288`) — without it a user's
    * analyzers/shard counts would be lost at bootstrap.
    * Returns the JSON index-create body.
    */
  def buildMapping(
      root: Node,
      routing: Option[String] = None,
      setting: Option[String] = None
  ): String = {
    val settingsPart =
      setting.map(s => s""""settings": {"index": $s}, """).getOrElse("")
    s"""{$settingsPart"mappings": ${derivedMappings(root, routing)}}"""
  }

  /** The tree-derived mappings object (without the outer `mappings` key). */
  private def derivedMappings(root: Node, routing: Option[String]): String = {
    def props(node: Node): String = {
      val fieldMappings = node.transform.mapping.map { case (field, spec) =>
        s""""$field": $spec"""
      }
      val childMappings = node.children.flatMap { c =>
        val rel = c.relationship.get
        (rel.relType, rel.variant) match {
          case (_, Variant.Scalar) =>
            c.transform.mapping.get(c.label).map(spec => s""""${c.label}": $spec""")
          case (RelType.OneToMany, Variant.Object) =>
            Some(s""""${c.label}": {"type": "nested", "properties": {${props(c)}}}""")
          case (RelType.OneToOne, Variant.Object) =>
            Some(s""""${c.label}": {"properties": {${props(c)}}}""")
        }
      }
      (fieldMappings ++ childMappings).mkString(", ")
    }
    val routingPart =
      routing.map(_ => s""", "_routing": {"required": true}""").getOrElse("")
    s"""{"properties": {${props(root)}}$routingPart}"""
  }

  /** The full index-create body with the reference's merge priority
    * (`_create_setting`, `search_client.py:261-288` dict.update order):
    * `setting` → `{"settings": {"index": ...}}`; doc-level `mappings` →
    * `{"mappings": {"index": ...}}`; doc-level `mapping` REPLACES the
    * mappings key — `{"mappings": mapping}` when it carries
    * `dynamic_templates`, else `{"mappings": {"properties": mapping}}`;
    * with neither override, the tree-derived [[buildMapping]] applies.
    */
  def createBody(schema: graft.schema.SchemaDef): String = {
    val settingsPart =
      schema.setting.map(s => s""""settings": {"index": $s}, """).getOrElse("")
    def hasDynamicTemplates(m: String): Boolean =
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(m).has("dynamic_templates")
    val mappingsPart = (schema.mapping, schema.mappings) match {
      case (Some(m), _) if hasDynamicTemplates(m) => s""""mappings": $m"""
      case (Some(m), _)                           => s""""mappings": {"properties": $m}"""
      case (None, Some(ms))                       => s""""mappings": {"index": $ms}"""
      case (None, None) =>
        s""""mappings": ${derivedMappings(schema.root, schema.routing)}"""
    }
    s"""{$settingsPart$mappingsPart}"""
  }
}
