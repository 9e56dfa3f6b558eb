package graft.cdc

import graft.{GraftSync, SparkSpec}
import graft.catalog.{Catalog, TableMeta}
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

/** S7: binlog-shaped row events → Changes rows → materialized index, with
  * `"file,pos"` checkpoint parity (`pgsync/sync.py:653-827`).
  */
class BinlogSpec extends SparkSpec {
  import spark.implicits._

  private def feed(lines: Seq[String]): DataFrame = {
    val dir = Files.createTempDirectory("graft-binlog").toString
    Files.write(java.nio.file.Paths.get(dir, "events.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    spark.read.schema(Binlog.eventSchema).json(dir)
  }

  test("row events map to Changes with per-op images, multi-row explode, schema filter") {
    val events = feed(Seq(
      """{"log_file":"mysql-bin.000007","log_pos":100,"event":"format_description"}""",
      """{"log_file":"mysql-bin.000007","log_pos":120,"event":"write","schema":"app","table":"Book",
         "rows":[{"values":{"id":1,"title":"a"}},{"values":{"id":2,"title":"b"}}]}""".replaceAll("\n\\s*", ""),
      """{"log_file":"mysql-bin.000007","log_pos":180,"event":"update","schema":"app","table":"book",
         "rows":[{"before_values":{"id":1,"title":"a"},"after_values":{"id":1,"title":"a2"}}]}""".replaceAll("\n\\s*", ""),
      """{"log_file":"mysql-bin.000007","log_pos":220,"event":"delete","schema":"app","table":"book",
         "rows":[{"values":{"id":2,"title":"b"}}]}""".replaceAll("\n\\s*", ""),
      """{"log_file":"mysql-bin.000007","log_pos":260,"event":"write","schema":"other","table":"book",
         "rows":[{"values":{"id":9}}]}""".replaceAll("\n\\s*", "")
    ))
    val ch = Binlog.toChanges(events, allowedSchemas = Set("APP"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(ch.length == 4) // 2 inserts + update + delete; other-schema write dropped
    val inserts = ch.filter(_._1 == "INSERT")
    assert(inserts.length == 2 && inserts.forall(c => c._2 == "book" && c._3 == null))
    assert(inserts.exists(_._4.contains(""""title":"b"""")))
    val upd = ch.find(_._1 == "UPDATE").get
    assert(upd._3.contains(""""title":"a"""") && upd._4.contains(""""title":"a2""""))
    val del = ch.find(_._1 == "DELETE").get
    assert(del._3.contains(""""id":2""") && del._4 == null)
    // synthetic txid preserves binlog order: fileSeq·2^32 + pos
    val base = 7L << 32
    assert(ch.map(_._5).sorted.toSeq == Seq(base + 120, base + 120, base + 180, base + 220))
  }

  test("file,pos checkpoint: skips advance it, rotate jumps files, format round-trips") {
    val events = feed(Seq(
      """{"log_file":"mysql-bin.000007","log_pos":400,"event":"write","schema":"app","table":"t","rows":[{"values":{"id":1}}]}""",
      """{"log_file":"mysql-bin.000007","log_pos":450,"event":"heartbeat"}""",
      """{"event":"rotate","next_binlog":"mysql-bin.000008","position":4}"""
    ))
    val p = Binlog.advance(events, start = Some(Binlog.Position("mysql-bin.000007", 100))).get
    assert(p == Binlog.Position("mysql-bin.000008", 4)) // rotation wins
    assert(p.format == "mysql-bin.000008,4")
    assert(Binlog.parsePosition(p.format) == p)
    // a feed that lags the start position never regresses the cursor
    val lagging = feed(Seq(
      """{"log_file":"mysql-bin.000006","log_pos":900,"event":"heartbeat"}"""
    ))
    assert(Binlog.advance(lagging, Some(p)).contains(p))
    // empty feed keeps the start; no start + empty feed = none
    assert(Binlog.advance(feed(Seq.empty), Some(p)).contains(p))
    assert(Binlog.advance(feed(Seq.empty), None).isEmpty)
    intercept[IllegalArgumentException] { Binlog.parsePosition("nocomma") }
  }

  test("end-to-end: binlog feed drives the index through GraftSync.applyChanges") {
    val cat = Catalog(Map("book" -> TableMeta("book", Seq("id"))))
    val schemaJson = """{"database": "app", "nodes": {"table": "book", "columns": ["id", "title"]}}"""
    @volatile var book = Seq((1L, "a")).toDF("id", "title")
    val sync = GraftSync(spark, schemaJson, cat, _ => book,
      Files.createTempDirectory("graft-binlog-sync").toString)
    sync.snapshot()
    assert(sync.state.docs.count() == 1)

    book = Seq((1L, "a"), (2L, "b")).toDF("id", "title")
    val events = feed(Seq(
      """{"log_file":"mysql-bin.000001","log_pos":500,"event":"write","schema":"app","table":"book","rows":[{"values":{"id":2,"title":"b"}}]}"""
    ))
    sync.applyChanges(Binlog.toChanges(events))
    assert(sync.state.docs.collect().map(_.getString(0)).toSet == Set("1", "2"))

    // the binlog cursor persists in the reference's format alongside
    val pos = Binlog.advance(events, None).get
    assert(pos.format == "mysql-bin.000001,500")

    book = Seq((2L, "b")).toDF("id", "title")
    val del = feed(Seq(
      """{"log_file":"mysql-bin.000001","log_pos":600,"event":"delete","schema":"app","table":"book","rows":[{"values":{"id":1,"title":"a"}}]}"""
    ))
    sync.applyChanges(Binlog.toChanges(del))
    assert(sync.state.docs.collect().map(_.getString(0)).toSet == Set("2"))
  }
}
