package graft.tools

import graft.Fixtures
import graft.assemble.DocAssembler
import graft.catalog.Catalog
import graft.schema.SchemaDef
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the flagship document-assembly path. */
object ProfileDoc {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val load = Tables.load(spark, sfDir) _
    load("orders").count(); load("lineitem").count(); load("customer").count()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val root = SchemaDef.parseNodes(Fixtures.flagship)
    for (round <- 1 to 2) {
      time(s"r$round lineitem agg only") {
        noop(load("lineitem").groupBy("l_orderkey").agg(collect_list(struct(
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))).as("x")))
      }
      time(s"r$round assemble (no json)") { noop(DocAssembler.assemble(root, load, Catalog.testData)) }
      time(s"r$round assemble + json") { noop(DocAssembler.assembleJson(root, load, Catalog.testData)) }
      val asm = DocAssembler.assemble(root, load, Catalog.testData)
      time(s"r$round json only (from assembled, recompute)") {
        noop(asm.select(col(DocAssembler.IdColumn), to_json(struct(asm.columns.filterNot(_ == DocAssembler.IdColumn).map(col).toIndexedSeq: _*)).as("doc")))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
