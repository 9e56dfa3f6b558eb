package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase timings for the q_lifecycle path: snapshot vs applyChanges vs
  * final docs read. `runMain graft.tools.ProfileLifecycle <sfDir>`.
  */
object ProfileLifecycle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lifecycle] $label%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.functions._
    val base = (t: String) => graft.sources.Tables.load(spark, sfDir)(t)
    val Off = 100000000L
    val m = pmod(col("o_orderkey"), lit(100))
    @volatile var post = false
    val load: String => org.apache.spark.sql.DataFrame = {
      case "orders" if post =>
        val o = base("orders")
        o.filter(m =!= 7)
          .withColumn("o_orderstatus", when(m === 8, lit("Z")).otherwise(col("o_orderstatus")))
          .unionByName(o.filter(m === 9)
            .withColumn("o_orderkey", col("o_orderkey") + lit(Off))
            .withColumn("o_orderstatus", lit("N")))
      case t => base(t)
    }
    val sync = graft.GraftSync(
      spark,
      s"""{"database": "graft", "index": "lifecycle", "nodes": ${graft.Fixtures.flagship}}""",
      graft.catalog.Catalog.testData,
      load,
      java.nio.file.Files.createTempDirectory("graft-lifecycle-prof").toString
    )
    timed("snapshot")(sync.snapshot())
    post = true
    val o = base("orders")
    val pk = to_json(struct(col("o_orderkey")))
    val noStr = lit(null).cast("string")
    val batch = o.filter(m === 7)
      .select(lit("DELETE").as("tg_op"), lit("orders").as("tbl"),
        pk.as("old"), noStr.as("new"), col("o_orderkey").as("txid"))
      .unionByName(o.filter(m === 8).select(lit("UPDATE").as("tg_op"), lit("orders").as("tbl"),
        pk.as("old"), pk.as("new"), col("o_orderkey").as("txid")))
      .unionByName(o.filter(m === 9).select(lit("INSERT").as("tg_op"), lit("orders").as("tbl"),
        noStr.as("old"), to_json(struct((col("o_orderkey") + lit(Off)).as("o_orderkey"))).as("new"),
        (col("o_orderkey") + lit(Off)).as("txid")))
    timed("applyChanges")(sync.applyChanges(batch))
    timed("docs-read")(println(s"docs=${sync.state.docs.count()}"))
    spark.stop()
  }
}
