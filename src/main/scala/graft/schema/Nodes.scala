package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** The user-facing schema tree: a root table plus related tables, each with
  * columns, a label, a relationship, and optional transforms. This is the
  * same declarative surface as the reference's schema JSON
  * (`pgsync/node.py:128-356` Node dataclass, `node.py:359-451` Tree.build;
  * legal attributes `pgsync/constants.py:34-52`), re-expressed as a Scala ADT
  * and compiled — by [[graft.assemble.DocAssembler]] — into a single
  * DataFrame plan instead of a SQLAlchemy expression tree.
  */

sealed trait RelType
object RelType {
  case object OneToOne extends RelType
  case object OneToMany extends RelType
  def parse(s: String): RelType = s.toLowerCase match {
    case "one_to_one"  => OneToOne
    case "one_to_many" => OneToMany
    case other         => throw SchemaError(s"Relationship type invalid: '$other'")
  }
}

sealed trait Variant
object Variant {
  case object Scalar extends Variant
  case object Object extends Variant
  def parse(s: String): Variant = s.toLowerCase match {
    case "scalar" => Scalar
    case "object" => Object
    case other    => throw SchemaError(s"Relationship variant invalid: '$other'")
  }
}

final case class ForeignKeyHint(parent: Seq[String], child: Seq[String])

/** `type ∈ {one_to_one, one_to_many}`, `variant ∈ {scalar, object}`, at most
  * one through table (`pgsync/node.py:108-111`), optional explicit FK hint
  * (`pgsync/node.py:79-124`).
  */
final case class Relationship(
    relType: RelType,
    variant: Variant = Variant.Object,
    throughTables: Seq[String] = Nil,
    foreignKey: Option[ForeignKeyHint] = None
) {
  if (throughTables.length > 1)
    throw SchemaError(s"Multiple through tables: $throughTables")
}

/** One `concat` spec: new field = delimiter-join of column values
  * (`pgsync/transform.py:66-112`).
  */
final case class ConcatSpec(
    columns: Seq[String],
    destination: String,
    delimiter: String = ""
)

/** One `geo` spec: destination field assembled from a (lat, lon) column
  * pair, a WKT column, or a GeoJSON string column (the shape the
  * reference's Geometry plugin consumes from PostGIS reflection).
  * `kind = "point"` → ES geo_point object `{"lat", "lon"}`;
  * `kind = "shape"` → GeoJSON Polygon for geo_shape.
  * First-class here where the reference needs the out-of-tree Geometry
  * plugin (`/root/reference/plugins/sample.py:72-97`) plus geoalchemy2
  * reflection (`pgsync/base.py:61-69`); source columns are post-rename
  * names and must be projected by the node.
  */
final case class GeoSpec(
    destination: String,
    kind: String,
    lat: Option[String] = None,
    lon: Option[String] = None,
    wkt: Option[String] = None,
    geojson: Option[String] = None
)

/** Node-level transforms, applied root-down after assembly in the order
  * replace → rename → concat → geo (`pgsync/transform.py:211-216`; `geo`
  * is our first-class form of the reference's Geometry plugin, run last so
  * it sees post-rename names like `concat` does).
  * `mapping` only contributes to the search-index bootstrap, never to data.
  * `move` is declared-but-unimplemented in the reference
  * (`pgsync/constants.py:166,173`; no handler in transform.py) — we reject it
  * loudly rather than silently ignore.
  */
final case class TransformSpec(
    rename: Map[String, String] = Map.empty,
    concat: Seq[ConcatSpec] = Nil,
    replace: Map[String, Map[String, String]] = Map.empty,
    mapping: Map[String, String] = Map.empty,
    geo: Seq[GeoSpec] = Nil
) {
  def isEmpty: Boolean =
    rename.isEmpty && concat.isEmpty && replace.isEmpty && geo.isEmpty
}

/** A column reference, possibly with JSON-path extraction operators
  * (`->`, `->>`, `#>`, `#>>` — `pgsync/constants.py:75-80`, parsed at
  * `pgsync/node.py:200-303`). `"doc#>{a,b,c}->4"` projects `doc.a.b.c[4]`
  * with the synthesized alias `doc_a_b_c_4` (alias synthesis
  * `node.py:286-295`). We translate the path once at compile time into a
  * `get_json_object` JSONPath — the same strategy the reference uses for its
  * MySQL dialect (`node.py:208-275`) — so execution is a single codegen'd
  * expression.
  */
final case class ColumnRef(raw: String) {
  private val opSplit = "(->>|->|#>>|#>)".r

  /** (base column, path steps); steps are raw strings — numeric = array idx. */
  val (base: String, steps: Seq[String]) = {
    val tokens = opSplit.split(raw).map(_.trim).filter(_.nonEmpty)
    if (tokens.length <= 1) (raw.trim, Nil)
    else {
      val b = tokens.head
      val st = tokens.tail.toSeq.flatMap { t =>
        if (t.startsWith("{") && t.endsWith("}"))
          t.substring(1, t.length - 1).split(",").map(_.trim).toSeq
        else Seq(t.stripPrefix("'").stripSuffix("'"))
      }
      (b, st)
    }
  }

  def hasPath: Boolean = steps.nonEmpty

  /** JSONPath for Spark's `get_json_object`, e.g. `$.a.b[4]`. */
  def jsonPath: String =
    "$" + steps.map { s =>
      if (s.forall(_.isDigit)) s"[$s]" else s".$s"
    }.mkString

  /** Output alias: `doc_a_b_4` for `doc->a->b->4` (node.py:286-295). */
  def alias: String =
    if (!hasPath) base else (base +: steps).mkString("_")
}

/** One node of the schema tree. `label` defaults to the table name
  * (`pgsync/node.py:166-170`); `columns` empty ⇒ all columns
  * (`node.py:141-162`).
  */
final case class Node(
    table: String,
    label: String,
    columns: Seq[ColumnRef],
    relationship: Option[Relationship],
    transform: TransformSpec,
    children: Seq[Node],
    primaryKeyOverride: Seq[String] = Nil,
    baseTables: Seq[String] = Nil
) {
  def isRoot: Boolean = relationship.isEmpty

  /** Post-order traversal (children before parents), the compile order used
    * by the reference (`pgsync/node.py:345-356`).
    */
  def postOrder: Seq[Node] = children.flatMap(_.postOrder) :+ this
}

final case class SchemaError(msg: String) extends RuntimeException(msg)

/** The closed sets of legal search-index field types and mapping parameters
  * (`pgsync/constants.py:83-129` ELASTICSEARCH_TYPES,
  * `constants.py:132-162` ELASTICSEARCH_MAPPING_PARAMETERS). The reference
  * validates `transform.mapping` against these and raises on unknowns
  * (`search_client.py:317-334`); we check at schema parse so a typo'd type
  * is a parse error, not an opaque HTTP 400 at index-create time.
  */
object EsMapping {
  val Types: Set[String] = Set(
    "binary", "boolean", "byte", "completion", "constant_keyword", "date",
    "date_range", "dense_vector", "double", "double_range", "flattened",
    "float", "float_range", "geo_point", "geo_shape", "half_float",
    "integer", "integer_range", "interval_day", "interval_day_to_hour",
    "interval_day_to_minute", "interval_day_to_second", "interval_hour",
    "interval_hour_to_minute", "interval_hour_to_second", "interval_minute",
    "interval_minute_to_second", "interval_month", "interval_second",
    "interval_year", "interval_year_to_month", "ip", "keyword", "knn_vector",
    "long", "long_range", "nested", "null", "object", "scaled_float",
    "search_as_you_type", "shape", "short", "text", "time"
  )

  val Parameters: Set[String] = Set(
    "analyzer", "boost", "coerce", "copy_to", "dimension", "doc_values",
    "dynamic", "eager_global_ordinals", "enabled", "fielddata",
    "fielddata_frequency_filter", "fields", "format", "ignore_above",
    "ignore_malformed", "index", "index_options", "index_phrases",
    "index_prefixes", "meta", "normalizer", "norms", "null_value",
    "position_increment_gap", "properties", "search_analyzer", "similarity",
    "store", "term_vector"
  )
}

/** Top-level schema document: `database`, `index`, `nodes`, plus passthrough
  * search-index settings (`pgsync/sync.py:114-121`). `setting` is the
  * per-index settings object (analyzers, shard counts) merged into the
  * index-create body as `{"settings": {"index": setting}}`
  * (`search_client.py:261-288` `_create_setting`); kept as raw JSON since
  * it passes through verbatim.
  */
final case class SchemaDef(
    database: String,
    index: String,
    root: Node,
    routing: Option[String] = None,
    pipeline: Option[String] = None,
    setting: Option[String] = None,
    plugins: Seq[String] = Nil,
    // doc-level mapping overrides (`sync.py:119-120`): `mapping` replaces
    // the tree-derived properties entirely; `mappings` passes through under
    // the reference's `{"mappings": {"index": ...}}` shape. Raw JSON.
    mapping: Option[String] = None,
    mappings: Option[String] = None
)

object SchemaDef {
  private val mapper = new ObjectMapper()

  private val legalNodeKeys = Set(
    "table", "schema", "label", "columns", "children", "relationship",
    "transform", "primary_key", "base_tables"
  )

  def parse(json: String): SchemaDef = {
    val n = mapper.readTree(json)
    SchemaDef(
      database = opt(n, "database").getOrElse(""),
      index = opt(n, "index").getOrElse(""),
      root = parseNode(n.get("nodes"), isRoot = true),
      routing = opt(n, "routing"),
      pipeline = opt(n, "pipeline"),
      setting = obj(n, "setting"),
      // the doc's plugin-name list (`sync.py:116` doc.get("plugins", [])),
      // resolved against discovered implementations in config order
      plugins = Option(n.get("plugins")).toSeq
        .flatMap(_.elements.asScala)
        .map(_.asText),
      mapping = obj(n, "mapping"),
      mappings = obj(n, "mappings")
    )
  }

  /** Parse just a node tree (no database/index wrapper). */
  def parseNodes(json: String): Node =
    parseNode(mapper.readTree(json), isRoot = true)

  private def opt(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText)

  private def obj(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map { v =>
      if (!v.isObject) throw SchemaError(s"'$f' must be a JSON object")
      v.toString
    }

  private def parseNode(n: JsonNode, isRoot: Boolean): Node = {
    if (n == null) throw SchemaError("missing 'nodes'")
    n.fieldNames.asScala.foreach { k =>
      if (!legalNodeKeys.contains(k))
        throw SchemaError(s"Node attribute '$k' is invalid") // node.py:307-314
    }
    val table =
      opt(n, "table").getOrElse(throw SchemaError("node missing 'table'"))
    val rel = Option(n.get("relationship")).map(parseRel)
    if (!isRoot && rel.isEmpty)
      throw SchemaError(s"Relationship missing for non-root node '$table'") // node.py:321-331
    val cols = Option(n.get("columns")).toSeq
      .flatMap(_.elements.asScala)
      .map(c => ColumnRef(c.asText))
    val children = Option(n.get("children")).toSeq
      .flatMap(_.elements.asScala)
      .map(c => parseNode(c, isRoot = false))
    val pkOverride = Option(n.get("primary_key")).toSeq
      .flatMap(_.elements.asScala)
      .map(_.asText)
    // view nodes declare the tables they are derived from (C9,
    // sync.py:268-274); base-table change events remap to this node.
    val baseTables = Option(n.get("base_tables")).toSeq
      .flatMap(_.elements.asScala)
      .map(_.asText)
    Node(
      table = table,
      label = opt(n, "label").getOrElse(table),
      columns = cols,
      relationship = rel,
      transform = Option(n.get("transform")).map(parseTransform).getOrElse(TransformSpec()),
      children = children,
      primaryKeyOverride = pkOverride,
      baseTables = baseTables
    )
  }

  private def parseRel(n: JsonNode): Relationship = {
    n.fieldNames.asScala.foreach { k =>
      if (!Set("type", "variant", "through_tables", "foreign_key").contains(k))
        throw SchemaError(s"Relationship attribute '$k' is invalid") // node.py:84-93
    }
    Relationship(
      relType = RelType.parse(
        opt(n, "type").getOrElse(throw SchemaError("relationship missing 'type'"))
      ),
      variant = opt(n, "variant").map(Variant.parse).getOrElse(Variant.Object),
      throughTables = Option(n.get("through_tables")).toSeq
        .flatMap(_.elements.asScala)
        .map(_.asText),
      foreignKey = Option(n.get("foreign_key")).map { fk =>
        ForeignKeyHint(
          parent = Option(fk.get("parent")).toSeq.flatMap(_.elements.asScala).map(_.asText),
          child = Option(fk.get("child")).toSeq.flatMap(_.elements.asScala).map(_.asText)
        )
      }
    )
  }

  private def parseTransform(n: JsonNode): TransformSpec = {
    if (n.has("move"))
      throw SchemaError("transform 'move' is declared but unimplemented in the reference; unsupported")
    val rename = Option(n.get("rename")).map { r =>
      r.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }.getOrElse(Map.empty[String, String])
    val concat = Option(n.get("concat")).toSeq.flatMap { c =>
      val specs = if (c.isArray) c.elements.asScala.toSeq else Seq(c)
      specs.map { s =>
        ConcatSpec(
          columns = Option(s.get("columns")).toSeq.flatMap(_.elements.asScala).map(_.asText),
          destination = opt(s, "destination").getOrElse(throw SchemaError("concat missing 'destination'")),
          delimiter = opt(s, "delimiter").getOrElse("")
        )
      }
    }
    val replace = Option(n.get("replace")).map { r =>
      r.properties.asScala.map { e =>
        e.getKey -> e.getValue.properties.asScala
          .map(p => p.getKey -> p.getValue.asText)
          .toMap
      }.toMap
    }.getOrElse(Map.empty[String, Map[String, String]])
    val mapping = Option(n.get("mapping")).map { m =>
      m.properties.asScala.map { e =>
        val spec = e.getValue
        // fail-fast validation against the closed ES lists
        // (search_client.py:317-334 raises the same way, at create time)
        if (!spec.isObject)
          throw SchemaError(s"mapping for '${e.getKey}' must be an object with a 'type'")
        val tpe = Option(spec.get("type")).filterNot(_.isNull).map(_.asText)
          .getOrElse(throw SchemaError(s"mapping for '${e.getKey}' missing 'type'"))
        if (!EsMapping.Types.contains(tpe))
          throw SchemaError(s"Invalid Elasticsearch type $tpe")
        spec.fieldNames.asScala.filterNot(_ == "type").foreach { p =>
          if (!EsMapping.Parameters.contains(p))
            throw SchemaError(s"Invalid Elasticsearch mapping parameter $p")
        }
        e.getKey -> spec.toString
      }.toMap
    }.getOrElse(Map.empty[String, String])
    val geo = Option(n.get("geo")).toSeq.flatMap { g =>
      if (!g.isObject) throw SchemaError("'geo' must be an object of destination -> spec")
      g.properties.asScala.map { e =>
        val spec = e.getValue
        spec.fieldNames.asScala.foreach { k =>
          if (!Set("kind", "lat", "lon", "wkt", "geojson").contains(k))
            throw SchemaError(s"geo attribute '$k' is invalid")
        }
        val parsed = GeoSpec(
          destination = e.getKey,
          kind = opt(spec, "kind").getOrElse(throw SchemaError(s"geo '${e.getKey}' missing 'kind'")),
          lat = opt(spec, "lat"),
          lon = opt(spec, "lon"),
          wkt = opt(spec, "wkt"),
          geojson = opt(spec, "geojson")
        )
        val sources = Seq(
          parsed.lat.isDefined && parsed.lon.isDefined,
          parsed.wkt.isDefined,
          parsed.geojson.isDefined
        ).count(identity)
        parsed.kind match {
          case "point" =>
            if (sources != 1 || (parsed.lat.isDefined ^ parsed.lon.isDefined))
              throw SchemaError(
                s"geo point '${e.getKey}' needs exactly one of lat+lon columns, a wkt column, or a geojson column")
          case "shape" =>
            if (sources != 1 || parsed.lat.isDefined || parsed.lon.isDefined)
              throw SchemaError(s"geo shape '${e.getKey}' needs exactly a wkt or geojson column")
          case other => throw SchemaError(s"geo kind invalid: '$other' (point|shape)")
        }
        parsed
      }.toSeq
    }
    TransformSpec(rename, concat, replace, mapping, geo)
  }
}
