package graft.sinks

import graft.SparkSpec
import graft.cdc.Changes
import graft.schema.SchemaDef
import graft.transform.{DocTransform, Plugins}
import org.apache.spark.sql.Row

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("bulkActions renders ES _bulk wire format for index and delete ops") {
    val ops = Seq(
      ("index", "1", """{"a":1}"""),
      ("delete", "2", null)
    ).toDF("op", "_id", "doc")
    val lines = SearchSink.bulkActions(ops, "myindex").collect().map(_.getString(0))
    assert(lines.exists(l =>
      l.startsWith("""{"index":{"_index":"myindex","_id":"1"}""") && l.endsWith("""{"a":1}""")
    ))
    assert(lines.exists(l => l.startsWith("""{"delete":{"_index":"myindex","_id":"2"""")))
  }

  test("buildMapping derives nested/object mapping from tree + overrides (search_client.py:304-354)") {
    val root = SchemaDef.parseNodes(
      """{"table": "book", "columns": ["isbn"],
          "transform": {"mapping": {"isbn": {"type": "keyword"}}},
          "children": [
            {"table": "publisher", "columns": ["name"],
             "relationship": {"type": "one_to_one", "variant": "object"}},
            {"table": "author", "label": "authors", "columns": ["name"],
             "relationship": {"type": "one_to_many", "variant": "object",
                              "through_tables": ["book_author"]},
             "transform": {"mapping": {"name": {"type": "text"}}}}]}"""
    )
    val m = SearchSink.buildMapping(root)
    assert(m.contains(""""isbn": {"type":"keyword"}"""))
    assert(m.contains(""""authors": {"type": "nested""""))
    assert(m.contains(""""publisher": {"properties""""))
    assert(m.contains(""""name": {"type":"text"}"""))
  }

  test("geo_point/geo_shape fields reach the index mapping (examples/geo topology)") {
    // the reference's geo example declares coordinates: geo_point and
    // shape: geo_shape in transform.mapping (examples/geo/schema.json);
    // our geo transform assembles the values, the mapping golden is below
    val root = SchemaDef.parseNodes(
      """{"table": "places",
          "columns": ["id", "lat", "lon", "boundary_wkt"],
          "transform": {
            "geo": {"coordinates": {"kind": "point", "lat": "lat", "lon": "lon"},
                    "shape": {"kind": "shape", "wkt": "boundary_wkt"}},
            "mapping": {"coordinates": {"type": "geo_point"},
                        "shape": {"type": "geo_shape"}}}}"""
    )
    val body = SearchSink.buildMapping(root)
    assert(body.contains(""""coordinates": {"type":"geo_point"}"""))
    assert(body.contains(""""shape": {"type":"geo_shape"}"""))
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    assert(parsed.get("mappings").get("properties").get("coordinates").get("type").asText == "geo_point")
  }

  test("index setting passthrough: settings + mappings in one create body (search_client.py:261-288)") {
    val doc = SchemaDef.parse(
      """{"database": "db", "index": "books", "routing": "isbn",
          "setting": {"number_of_shards": 3,
                      "analysis": {"analyzer": {"my_ngram": {"type": "custom", "tokenizer": "ngram"}}}},
          "nodes": {"table": "book", "columns": ["isbn"],
                    "transform": {"mapping": {"isbn": {"type": "keyword"}}}}}"""
    )
    assert(doc.setting.isDefined)
    val body = SearchSink.buildMapping(doc.root, doc.routing, doc.setting)
    // golden shape: {"settings": {"index": {...}}, "mappings": {...}}
    assert(body.startsWith("""{"settings": {"index": {"number_of_shards":3"""))
    assert(body.contains(""""my_ngram""""))
    assert(body.contains(""""mappings": {"properties": {"isbn": {"type":"keyword"}}"""))
    assert(body.contains(""""_routing": {"required": true}"""))
    // parses as one JSON object with both top-level keys
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    assert(parsed.get("settings").get("index").get("number_of_shards").asInt() == 3)
    assert(parsed.get("mappings").has("properties"))
    // absent setting → mappings-only body, unchanged from before
    assert(SearchSink.buildMapping(doc.root).startsWith("""{"mappings""""))
  }

  test("plugin chain: rewrite + drop in config order (plugin.py:102-103)") {
    val docs = Seq((1L, "keep"), (2L, "drop"), (3L, "keep")).toDF("id", "status")
    val upper = new DocTransform {
      val name = "upper"
      def apply(doc: Row): Option[Row] =
        Some(Row(doc.getLong(0), doc.getString(1).toUpperCase))
    }
    val dropper = new DocTransform {
      val name = "dropper"
      def apply(doc: Row): Option[Row] =
        if (doc.getString(1) == "DROP") None else Some(doc)
    }
    val out = Plugins(docs, Seq(upper, dropper)).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet == Set((1L, "KEEP"), (3L, "KEEP")))
  }

  test("doc-level mapping/mappings overrides follow _create_setting merge priority (search_client.py:261-288)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def body(doc: String) = mapper.readTree(SearchSink.createBody(SchemaDef.parse(doc)))
    // doc-level `mapping` without dynamic_templates → {"mappings":{"properties": mapping}}
    val flat = body(
      """{"database": "db", "index": "i",
          "mapping": {"title": {"type": "text"}},
          "nodes": {"table": "book", "transform": {"mapping": {"isbn": {"type": "keyword"}}}}}""")
    assert(flat.get("mappings").get("properties").get("title").get("type").asText() == "text")
    // the override REPLACES the tree derivation (isbn does not leak in)
    assert(!flat.get("mappings").get("properties").has("isbn"))
    // `mapping` WITH dynamic_templates passes through whole
    val dyn = body(
      """{"database": "db", "index": "i",
          "mapping": {"dynamic_templates": [{"strings": {"match_mapping_type": "string",
                                                         "mapping": {"type": "keyword"}}}]},
          "nodes": {"table": "book"}}""")
    assert(dyn.get("mappings").has("dynamic_templates"))
    assert(!dyn.get("mappings").has("properties"))
    // doc-level `mappings` → {"mappings":{"index": mappings}} (reference shape)
    val ms = body(
      """{"database": "db", "index": "i",
          "mappings": {"properties": {"x": {"type": "long"}}},
          "nodes": {"table": "book"}}""")
    assert(ms.get("mappings").get("index").get("properties").get("x").get("type").asText() == "long")
    // `mapping` wins over `mappings` (dict.update order) and settings still merge
    val both = body(
      """{"database": "db", "index": "i",
          "setting": {"number_of_shards": 5},
          "mapping": {"a": {"type": "integer"}},
          "mappings": {"ignored": true},
          "nodes": {"table": "book"}}""")
    assert(both.get("mappings").get("properties").has("a"))
    assert(!both.get("mappings").has("index"))
    assert(both.get("settings").get("index").get("number_of_shards").asInt() == 5)
    // no overrides → tree derivation unchanged
    val derived = body(
      """{"database": "db", "index": "i",
          "nodes": {"table": "book", "transform": {"mapping": {"isbn": {"type": "keyword"}}}}}""")
    assert(derived.get("mappings").get("properties").get("isbn").get("type").asText() == "keyword")
  }

  test("ServiceLoader plugin discovery: config-name filter in config order (plugin.py:49-91)") {
    // three implementations registered in META-INF/services; config names
    // select two of them, in the order the config lists them
    val chain = Plugins.discover(Seq("drop_skipped", "uppercase_title"))
    assert(chain.map(_.name) == Seq("drop_skipped", "uppercase_title"))
    // unknown names are skipped like the reference's walk (collects matches only)
    assert(Plugins.discover(Seq("uppercase_title", "no_such_plugin")).map(_.name) ==
      Seq("uppercase_title"))
    assert(Plugins.discover(Nil).isEmpty)
    // and the discovered chain actually runs: uppercase first, then drop
    val docs = Seq((1L, "keep"), (2L, "skip")).toDF("id", "status")
    val out = Plugins(docs, Plugins.discover(Seq("uppercase_title", "drop_skipped")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "KEEP")))
    // a config doc's plugins list reaches the sync via fromConfig
    val syncs = graft.GraftSync.fromConfig(
      spark,
      """{"database": "db", "index": "idx", "plugins": ["uppercase_title"],
          "nodes": {"table": "book"}}""",
      graft.catalog.Catalog(Map("book" -> graft.catalog.TableMeta("book", Seq("id")))),
      _ => Seq((1L, "x")).toDF("id", "status"),
      java.nio.file.Files.createTempDirectory("graft-plug").toString
    )
    assert(syncs.head.plugins.map(_.name) == Seq("uppercase_title"))
  }

  test("U2 auth chain: first defined answer wins (plugin.py:106-115)") {
    import graft.transform.{Auth, AuthProvider}
    val a = new AuthProvider { def auth(key: String) = if (key == "PG_PASSWORD") Some("pg-a") else None }
    val b = new AuthProvider { def auth(key: String) = Some(s"b:$key") }
    assert(Auth.resolve(Seq(a, b), "PG_PASSWORD").contains("pg-a"))
    assert(Auth.resolve(Seq(a, b), "ELASTICSEARCH_PASSWORD").contains("b:ELASTICSEARCH_PASSWORD"))
    assert(Auth.resolve(Seq(a), "OTHER").isEmpty)
    assert(Auth.resolve(Nil, "X").isEmpty)
  }

  test("P8 schema filter and P9 changed-column guard") {
    val ch = Changes.of(
      spark,
      Seq(
        ("UPDATE", "book", """{"id":1,"title":"a"}""", """{"id":1,"title":"a"}""", 1L), // no-op
        ("UPDATE", "book", """{"id":2,"title":"a"}""", """{"id":2,"title":"b"}""", 2L), // real
        ("INSERT", "other", null, """{"id":9}""", 3L) // wrong table
      )
    )
    val filtered = Changes.schemaFilter(ch, Set("book"))
    assert(filtered.count() == 2)
    val guarded = Changes.changedColumnGuard(filtered, Map("book" -> Seq("title")))
    val rows = guarded.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("txid") == 2L)
  }
}
