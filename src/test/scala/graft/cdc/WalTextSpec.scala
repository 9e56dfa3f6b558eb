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
