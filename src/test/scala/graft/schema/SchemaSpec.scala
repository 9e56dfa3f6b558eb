package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Schema-tree parsing + validation, mirroring the reference's error cases
  * (`pgsync/node.py:298-331`, `tests/test_node.py`).
  */
class SchemaSpec extends AnyFunSuite {

  test("parses a nested tree with relationships") {
    val root = SchemaDef.parseNodes(
      """{
        "table": "book", "columns": ["isbn", "title"],
        "children": [
          {"table": "publisher", "label": "pub", "columns": ["name"],
           "relationship": {"type": "one_to_one", "variant": "object",
                            "foreign_key": {"parent": ["publisher_id"], "child": ["id"]}}},
          {"table": "author", "columns": ["name"],
           "relationship": {"type": "one_to_many", "variant": "object",
                            "through_tables": ["book_author"]}}
        ]}"""
    )
    assert(root.table == "book")
    assert(root.isRoot)
    assert(root.children.map(_.label) == Seq("pub", "author"))
    val pub = root.children.head
    assert(pub.relationship.get.relType == RelType.OneToOne)
    assert(pub.relationship.get.foreignKey.get == ForeignKeyHint(Seq("publisher_id"), Seq("id")))
    val author = root.children(1)
    assert(author.relationship.get.relType == RelType.OneToMany)
    assert(author.relationship.get.throughTables == Seq("book_author"))
    assert(root.postOrder.map(_.table) == Seq("publisher", "author", "book"))
  }

  test("non-root node without relationship is rejected (node.py:321-331)") {
    val e = intercept[SchemaError] {
      SchemaDef.parseNodes(
        """{"table": "a", "children": [{"table": "b"}]}"""
      )
    }
    assert(e.msg.contains("Relationship missing"))
  }

  test("unknown node attribute is rejected (node.py:307-314)") {
    val e = intercept[SchemaError] {
      SchemaDef.parseNodes("""{"table": "a", "bogus": 1}""")
    }
    assert(e.msg.contains("invalid"))
  }

  test("more than one through table is rejected (node.py:108-111)") {
    val e = intercept[SchemaError] {
      SchemaDef.parseNodes(
        """{"table": "a", "children": [
             {"table": "b", "relationship":
               {"type": "one_to_many", "through_tables": ["x", "y"]}}]}"""
      )
    }
    assert(e.msg.contains("through"))
  }

  test("invalid relationship type/variant rejected (node.py:79-124)") {
    intercept[SchemaError] {
      SchemaDef.parseNodes(
        """{"table": "a", "children": [
             {"table": "b", "relationship": {"type": "many_to_many"}}]}"""
      )
    }
    intercept[SchemaError] {
      SchemaDef.parseNodes(
        """{"table": "a", "children": [
             {"table": "b", "relationship": {"type": "one_to_one", "variant": "weird"}}]}"""
      )
    }
  }

  test("transform move is rejected as unimplemented (constants.py:166,173)") {
    val e = intercept[SchemaError] {
      SchemaDef.parseNodes(
        """{"table": "a", "transform": {"move": {"x": "y"}}}"""
      )
    }
    assert(e.msg.contains("move"))
  }

  test("transform.mapping validated against closed ES lists (search_client.py:317-334)") {
    // legal type + legal parameters pass
    val ok = SchemaDef.parseNodes(
      """{"table": "a", "transform": {"mapping":
           {"title": {"type": "text", "analyzer": "ngram", "fields": {"raw": {"type": "keyword"}}}}}}"""
    )
    assert(ok.transform.mapping.contains("title"))
    // unknown type → parse error, not an opaque HTTP 400 at create time
    val badType = intercept[SchemaError] {
      SchemaDef.parseNodes(
        """{"table": "a", "transform": {"mapping": {"x": {"type": "strnig"}}}}"""
      )
    }
    assert(badType.msg == "Invalid Elasticsearch type strnig")
    // unknown mapping parameter
    val badParam = intercept[SchemaError] {
      SchemaDef.parseNodes(
        """{"table": "a", "transform": {"mapping": {"x": {"type": "text", "analzyer": "ngram"}}}}"""
      )
    }
    assert(badParam.msg == "Invalid Elasticsearch mapping parameter analzyer")
    // missing type / non-object spec
    intercept[SchemaError] {
      SchemaDef.parseNodes("""{"table": "a", "transform": {"mapping": {"x": {"analyzer": "ng"}}}}""")
    }
    intercept[SchemaError] {
      SchemaDef.parseNodes("""{"table": "a", "transform": {"mapping": {"x": "text"}}}""")
    }
  }

  test("JSON path column refs parse PG operators (node.py:200-303)") {
    assert(ColumnRef("plain").base == "plain")
    assert(!ColumnRef("plain").hasPath)

    val c1 = ColumnRef("doc->firstname")
    assert(c1.base == "doc" && c1.jsonPath == "$.firstname" && c1.alias == "doc_firstname")

    val c2 = ColumnRef("doc#>{a,b,c}->4")
    assert(c2.base == "doc")
    assert(c2.jsonPath == "$.a.b.c[4]")
    assert(c2.alias == "doc_a_b_c_4")

    val c3 = ColumnRef("doc->>x")
    assert(c3.jsonPath == "$.x")

    val c4 = ColumnRef("doc->x->0->y")
    assert(c4.jsonPath == "$.x[0].y")
  }

  test("catalog JSON parses per-column case_insensitive (citext parity, base.py:61-69)") {
    val cat = graft.catalog.Catalog.fromJson(
      """{
        "tables": {
          "book": {"primary_key": ["code"], "case_insensitive": ["code", "alt_code"]},
          "tag": {"primary_key": ["id"],
                  "foreign_keys": [{"columns": ["book_ref"], "parent_table": "book",
                                    "parent_columns": ["code"]}]}
        }}"""
    )
    assert(cat("book").caseInsensitive == Seq("code", "alt_code"))
    assert(cat("tag").caseInsensitive.isEmpty)
    assert(cat.resolveJoin("book", "tag").childColumns == Seq("book_ref"))
  }

  test("full schema document parses database/index wrapper (sync.py:114-121)") {
    val d = SchemaDef.parse(
      """{"database": "db", "index": "idx", "routing": "r",
         "nodes": {"table": "t"}}"""
    )
    assert(d.database == "db" && d.index == "idx" && d.routing.contains("r"))
    assert(d.root.table == "t")
  }

  test("config loader: ${VAR} templating with safe_substitute parity (utils.py:290-298)") {
    val env = Map("APP_ENV" -> "prod", "DB" -> "orders")
    assert(ConfigLoader.safeSubstitute("idx_${APP_ENV}", env) == "idx_prod")
    assert(ConfigLoader.safeSubstitute("idx_$APP_ENV", env) == "idx_prod")
    assert(ConfigLoader.safeSubstitute("$DB-${APP_ENV}-x", env) == "orders-prod-x")
    // unknown variables stay verbatim (safe_substitute, not substitute)
    assert(ConfigLoader.safeSubstitute("keep_${MISSING}", env) == "keep_${MISSING}")
    assert(ConfigLoader.safeSubstitute("keep_$MISSING", env) == "keep_$MISSING")
    // $$ collapses to a literal $; a bare trailing $ is untouched
    assert(ConfigLoader.safeSubstitute("cost_$$5", env) == "cost_$5")
    assert(ConfigLoader.safeSubstitute("end$", env) == "end$")
    // replacement values containing $ and \ must not be re-interpreted
    assert(ConfigLoader.safeSubstitute("${W}", Map("W" -> """a$b\c""")) == """a$b\c""")
  }

  test("config loader: multi-index array, top-level-only templating (utils.py:204-300)") {
    val cfg =
      """[
        {"database": "${DB}", "index": "idx_${APP_ENV}",
         "nodes": {"table": "t", "columns": ["a_${APP_ENV}"]}},
        {"database": "other", "index": "plain", "nodes": {"table": "u"}}
      ]"""
    val env = Map("APP_ENV" -> "prod", "DB" -> "orders")
    val docs = ConfigLoader.docs(cfg, env).map(SchemaDef.parse)
    assert(docs.map(_.index) == Seq("idx_prod", "plain"))
    assert(docs.head.database == "orders")
    // NESTED strings are never templated (reference only touches top-level
    // values; nested dicts hit the TypeError skip)
    assert(docs.head.root.columns.map(_.base) == Seq("a_${APP_ENV}"))
    // a single (non-array) doc loads as one entry
    assert(ConfigLoader.docs("""{"database":"d","nodes":{"table":"t"}}""", env).size == 1)
    // invalid JSON is rejected with the not-valid-JSON error (utils.py:286-289)
    val bad = intercept[IllegalArgumentException] { ConfigLoader.docs("{nope", env) }
    assert(bad.getMessage.contains("not valid JSON"))
  }

  test("config loader: local file fetch + missing-file error (utils.py:268-271)") {
    val p = java.nio.file.Files.createTempFile("graft-cfg", ".json")
    java.nio.file.Files.write(
      p,
      """[{"database": "db", "index": "i_${APP_ENV}", "nodes": {"table": "t"}}]"""
        .getBytes("UTF-8")
    )
    val docs = ConfigLoader.load(p.toString, Map("APP_ENV" -> "dev"))
    assert(SchemaDef.parse(docs.head).index == "i_dev")
    val missing = intercept[java.io.FileNotFoundException] { ConfigLoader.fetch("/no/such/file.json") }
    assert(missing.getMessage.contains("not found"))
  }

  test("config loader: Hadoop FileSystem URI source (utils.py:264-281 scheme-agnostic)") {
    val p = java.nio.file.Files.createTempFile("graft-cfg-fs", ".json")
    java.nio.file.Files.write(
      p,
      """{"database": "db", "index": "i_${APP_ENV}", "nodes": {"table": "t"}}""".getBytes("UTF-8")
    )
    // file:// exercises the same FileSystem.get(uri).open(path) code path
    // that s3a:// / hdfs:// take — the Hadoop FS API is scheme-agnostic
    val docs = ConfigLoader.load(s"file://$p", Map("APP_ENV" -> "prod"))
    assert(SchemaDef.parse(docs.head).index == "i_prod")
    val missing = intercept[java.io.FileNotFoundException] {
      ConfigLoader.fetch("file:///no/such/graft-cfg.json")
    }
    assert(missing.getMessage.contains("not found"))
    // non-JSON content through the FS branch is rejected up front
    val bad = java.nio.file.Files.createTempFile("graft-cfg-bad", ".json")
    java.nio.file.Files.write(bad, "{nope".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] { ConfigLoader.fetch(s"file://$bad") }
    assert(e.getMessage.contains("expected JSON"))
  }
}
