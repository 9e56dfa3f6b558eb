package graft.streaming

import graft.SparkSpec
import graft.catalog.{Catalog, ForeignKey, TableMeta}
import graft.cdc.Changes
import graft.schema.SchemaDef
import graft.sinks.MaterializedIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** End-to-end Structured Streaming run: snapshot → micro-batches through
  * `foreachBatch` with checkpointing — the Spark equivalent of the
  * reference's daemon loop (`pgsync/sync.py:2114-2153`).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val cat = Catalog(
    Map(
      "orders" -> TableMeta("orders", Seq("id")),
      "item" -> TableMeta(
        "item", Seq("id"),
        Seq(ForeignKey("item", Seq("order_id"), "orders", Seq("id")))
      )
    )
  )

  private val schema = SchemaDef.parseNodes(
    """{"table": "orders", "columns": ["id", "status"],
        "children": [{"table": "item", "label": "items", "columns": ["sku"],
          "relationship": {"type": "one_to_many", "variant": "object"}}]}"""
  )

  @volatile private var tables: Map[String, DataFrame] = _

  test("snapshot then stream: batches update the materialized index with checkpointing") {
    tables = Map(
      "orders" -> Seq((1L, "open"), (2L, "open")).toDF("id", "status"),
      "item" -> Seq((10L, 1L, "a")).toDF("id", "order_id", "sku")
    )
    val dir = Files.createTempDirectory("graft-stream").toString
    val state = new MaterializedIndex(spark, s"$dir/index")
    val sync = new StreamSync(schema, cat, tables(_), state)
    sync.snapshot()
    assert(state.docs.count() == 2)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String, String, String, Long)]
    val changes = stream
      .toDF()
      .select(
        col("_1").as("tg_op"), col("_2").as("tbl"),
        col("_3").as("old"), col("_4").as("new"), col("_5").as("txid")
      )
    val query = sync.start(changes, s"$dir/checkpoint")

    // batch 1: new item lands on order 2
    tables += "item" -> Seq((10L, 1L, "a"), (11L, 2L, "b")).toDF("id", "order_id", "sku")
    stream.addData((Changes.Insert, "item", null, """{"id": 11, "order_id": 2, "sku": "b"}""", 1L))
    query.processAllAvailable()
    val docs1 = state.docs.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(docs1("2").contains("\"items\":[{\"sku\":\"b\"}]"))

    // batch 2: order 1 deleted
    tables += "orders" -> Seq((2L, "open")).toDF("id", "status")
    stream.addData((Changes.Delete, "orders", """{"id": 1}""", null, 2L))
    query.processAllAvailable()
    val docs2 = state.docs.collect().map(r => r.getString(0)).toSet
    assert(docs2 == Set("2"))

    query.stop()
    // checkpoint directory materialized offsets/commits (restart safety)
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/checkpoint/offsets")))
  }
}
