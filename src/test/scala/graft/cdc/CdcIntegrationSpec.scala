package graft.cdc

import graft.{Fixtures, SparkSpec}
import graft.assemble.DocAssembler
import graft.catalog.Catalog
import graft.schema.SchemaDef
import graft.sinks.MaterializedIndex
import graft.sources.Tables
import graft.streaming.StreamSync
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Realistic-volume incremental run against the sf0.001 test data
  * (1 500 orders / 6 000 lineitems): mutate the source through a wrapping
  * loader (deletes + inserts + child updates), apply the corresponding
  * change batch, and require the materialized index to equal a fresh full
  * re-assembly — the incremental == full-recompute invariant at data scale,
  * exercising the root-keyed child pushdown and lineage/walk-up resolution
  * on the real catalog.
  */
class CdcIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val schema = SchemaDef.parseNodes(Fixtures.flagship)

  test("bulk change batch over test data: incremental == full recompute") {
    val base = Tables.load(spark, sf) _

    // the "database" after the batch: orders 0-49 deleted, two new orders
    // appended, lineitems of orders 100-119 deleted (child deletes)
    val newOrders = Seq(
      (900001L, 85L, "O", 123.45, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), "1-URGENT"),
      (900002L, 134L, "F", 67.89, java.sql.Timestamp.valueOf("2024-02-02 00:00:00"), "5-LOW")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val mutated: String => DataFrame = {
      case "orders" =>
        base("orders").filter(col("o_orderkey") >= 50).unionByName(newOrders)
      case "lineitem" =>
        base("lineitem").filter(col("l_orderkey") < 100 || col("l_orderkey") >= 120)
      case t => base(t)
    }

    val dir = Files.createTempDirectory("graft-cdc-int").toString
    val state = new MaterializedIndex(spark, dir)
    val sync = new StreamSync(schema, Catalog.testData, mutated, state)

    // snapshot BEFORE the mutation (simulate: initial state = original data)
    new StreamSync(schema, Catalog.testData, base, state).snapshot()
    assert(state.docs.count() == 1500)

    // change batch describing the mutation
    val deletes = (0L until 50L).map(k =>
      (Changes.Delete, "orders", s"""{"o_orderkey": $k}""", null, 1L))
    val inserts = Seq(900001L, 900002L).map(k =>
      (Changes.Insert, "orders", null, s"""{"o_orderkey": $k}""", 2L))
    val childDeletes = base("lineitem")
      .filter(col("l_orderkey").between(100, 119))
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r =>
        (Changes.Delete, "lineitem",
          s"""{"l_orderkey": ${r.getLong(0)}, "l_linenumber": ${r.getInt(1)}}""", null, 3L))
    sync.applyBatch(Changes.of(spark, deletes ++ inserts ++ childDeletes))

    // compare to full recompute on the mutated source
    val expected = {
      val structured = DocAssembler.assemble(schema, mutated, Catalog.testData)
      val payload = structured.columns.filterNot(_ == "_id").map(col).toIndexedSeq
      structured.select(col("_id"), to_json(struct(payload: _*)).as("doc"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    }
    val actual = state.docs.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(actual.size == expected.size)
    assert(actual == expected)
    // spot-check semantics: deleted roots gone, new roots present,
    // child-deleted orders now have empty lineitems
    assert(!actual.contains("0") && actual.contains("900001"))
    assert(actual("100").contains("\"lineitems\":[]"))
  }
}
