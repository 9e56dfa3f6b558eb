package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** test_decoding text parsing, covering the quoting/escaping cases the
  * reference's regression corpus exercises (`tests/test_bug_regressions.py`,
  * value cleanup `pgsync/base.py:1089-1113`).
  */
class WalTextSpec extends AnyFunSuite {

  test("INSERT with quoted strings, escapes, numerics, null, boolean") {
    val out = WalText.parse(Iterator(
      "BEGIN 77",
      "table public.book: INSERT: id[integer]:1 title[character varying]:'it''s a ''test''' " +
        "price[double precision]:9.5 tags[jsonb]:'{\"a\": 1}' active[boolean]:t nick[text]:null",
      "COMMIT 77"
    )).toSeq
    assert(out.length == 1)
    val c = out.head
    assert(c.tgOp == "INSERT" && c.table == "book" && c.txid == 77L)
    val json = c.newTuple.get
    assert(json.contains(""""id": 1"""))
    assert(json.contains(""""title": "it's a 'test'""""))
    assert(json.contains(""""price": 9.5"""))
    assert(json.contains(""""active": true"""))
    assert(json.contains(""""nick": null"""))
  }

  test("UPDATE with old-key/new-tuple splits payloads (PK change)") {
    val out = WalText.parse(Iterator(
      "BEGIN 5",
      "table public.book: UPDATE: old-key: id[integer]:1 new-tuple: id[integer]:2 title[text]:'x'",
      "COMMIT 5"
    )).toSeq
    val c = out.head
    assert(c.old.get.contains(""""id": 1"""))
    assert(c.newTuple.get.contains(""""id": 2"""))
    assert(c.newTuple.get.contains(""""title": "x""""))
  }

  test("DELETE carries old payload only; heartbeats skipped") {
    val out = WalText.parse(Iterator(
      "BEGIN 9",
      "table public.book: DELETE: id[integer]:3",
      "message: transactional: true prefix: heartbeat",
      "COMMIT 9"
    )).toSeq
    assert(out.length == 1)
    assert(out.head.old.get.contains(""""id": 3"""))
    assert(out.head.newTuple.isEmpty)
  }

  test("values with spaces and colons inside quotes survive") {
    val out = WalText.parse(Iterator(
      "BEGIN 1",
      "table public.t: INSERT: note[text]:'a: b c [x]' n[bigint]:42",
      "COMMIT 1"
    )).toSeq
    val json = out.head.newTuple.get
    assert(json.contains(""""note": "a: b c [x]""""))
    assert(json.contains(""""n": 42"""))
  }

  test("multi-table TRUNCATE emits one change per table") {
    val out = WalText.parse(Iterator(
      "BEGIN 4",
      "table public.a, public.b: TRUNCATE: (no flags)",
      "COMMIT 4"
    )).toSeq
    assert(out.map(c => (c.tgOp, c.table)) == Seq(("TRUNCATE", "a"), ("TRUNCATE", "b")))
  }

  test("quoted schema/table identifiers (mixed case, spaces, dots, reserved words)") {
    val out = WalText.parse(Iterator(
      "BEGIN 11",
      """table "MySchema"."Order Items": INSERT: id[integer]:1""",
      """table public."select": UPDATE: id[integer]:2""",
      """table "we.ird".t: DELETE: id[integer]:3""",
      "COMMIT 11"
    )).toSeq
    assert(out.map(c => (c.schema, c.table)) ==
      Seq(("MySchema", "Order Items"), ("public", "select"), ("we.ird", "t")))
  }

  test("quoted table names with embedded quotes and multi-table quoted TRUNCATE") {
    val out = WalText.parse(Iterator(
      "BEGIN 12",
      """table public."a""b", "S 1".c: TRUNCATE: (no flags)""",
      "COMMIT 12"
    )).toSeq
    assert(out.map(c => (c.tgOp, c.schema, c.table)) ==
      Seq(("TRUNCATE", "public", "a\"b"), ("TRUNCATE", "S 1", "c")))
  }

  test("quoted column keys parse with escapes") {
    val out = WalText.parse(Iterator(
      "BEGIN 13",
      """table public.t: INSERT: "user id"[integer]:7 "wei""rd"[text]:'v' plain[text]:'p'""",
      "COMMIT 13"
    )).toSeq
    val json = out.head.newTuple.get
    assert(json.contains(""""user id": 7"""))
    assert(json.contains("\"wei\\\"rd\": \"v\""))
    assert(json.contains(""""plain": "p""""))
  }

  test("double-quoted values with escapes parse like the reference's value pattern") {
    val out = WalText.parse(Iterator(
      "BEGIN 15",
      "table public.t: INSERT: a[text]:\"say \"\"hi\"\"\" b[double precision]:NaN c[text]:'plain'",
      "COMMIT 15"
    )).toSeq
    val json = out.head.newTuple.get
    assert(json.contains("\"a\": \"say \\\"hi\\\"\""))
    assert(json.contains(""""b": NaN""")) // Spark's JSON reader allows non-numeric numbers
    assert(json.contains(""""c": "plain""""))
  }

  test("UPDATE split ignores 'new-tuple:' inside quoted values") {
    val out = WalText.parse(Iterator(
      "BEGIN 16",
      "table public.t: UPDATE: old-key: id[integer]:1 note[text]:'see new-tuple: docs' " +
        "new-tuple: id[integer]:2 note[text]:'ok'",
      "COMMIT 16"
    )).toSeq
    val c = out.head
    assert(c.old.get.contains(""""id": 1"""))
    assert(c.old.get.contains(""""note": "see new-tuple: docs""""))
    assert(c.newTuple.get.contains(""""id": 2"""))
    assert(c.newTuple.get.contains(""""note": "ok""""))
  }

  test("unparsed table-looking lines are reported, not silently dropped") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = WalText.parse(Iterator(
      "BEGIN 14",
      "table !!corrupt!!",
      "table public.ok: INSERT: id[integer]:1",
      "COMMIT 14"
    ), onUnparsed = seen += _).toSeq
    assert(out.length == 1 && out.head.table == "ok")
    assert(seen == Seq("table !!corrupt!!"))
  }

  test("parsed changes feed the engine's change schema") {
    val spark = graft.SparkSpec.session
    val df = WalText.toDataFrame(
      spark,
      WalText.parse(Iterator(
        "BEGIN 2",
        "table public.orders: INSERT: id[bigint]:10",
        "COMMIT 2"
      )).toSeq
    )
    val row = df.collect().head
    assert(row.getAs[String]("tg_op") == "INSERT")
    assert(row.getAs[String]("tbl") == "orders")
    assert(row.getAs[Long]("txid") == 2L)
  }
}
