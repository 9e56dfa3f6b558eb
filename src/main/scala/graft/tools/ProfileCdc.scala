package graft.tools

import graft.Fixtures
import graft.catalog.Catalog
import graft.cdc.{IncrementalEngine, Lineage}
import graft.schema.SchemaDef
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the CDC bench queries — times each stage of the
  * incremental path separately to locate the bottleneck.
  */
object ProfileCdc {
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

    // warmup
    load("orders").count(); load("lineitem").count(); load("events").count()

    // ---- q_cdc_child stages ----
    val changes = load("lineitem")
      .filter(pmod(col("l_partkey"), lit(50)) === 0)
      .select(
        lit("UPDATE").as("tg_op"), lit("lineitem").as("tbl"),
        lit(null).cast("string").as("old"),
        to_json(struct(col("l_orderkey"), col("l_linenumber"))).as("new"),
        col("l_orderkey").as("txid"))
    println(s"[profile] changes rows: ${time("child: changes count")(changes.count())}")
    val engine = new IncrementalEngine(SchemaDef.parseNodes(Fixtures.flagship), Catalog.testData, load)
    val affected = time("child: affectedRoots build+count") {
      val a = engine.affectedRoots(changes, Lineage.empty(spark)).cache()
      println(s"[profile] affected rows: ${a.count()}")
      a
    }
    println("[profile] === affected optimized plan ===")
    affected.explain("formatted")
    time("child: reassemble noop") {
      engine.reassemble(affected).write.mode("overwrite").format("noop").save()
    }
    spark.catalog.clearCache()
    time("child: full process noop") {
      engine.process(changes, Lineage.empty(spark)).write.mode("overwrite").format("noop").save()
    }
    spark.catalog.clearCache()

    // ---- q_cdc_root stages ----
    val n = load("orders").agg(count(lit(1)).as("__n"))
    val key = pmod(col("event_id") * 7, col("__n") * 2)
    val payload = to_json(struct(key.as("o_orderkey")))
    val rchanges = load("events").crossJoin(n).select(
      when(col("event_type") === "error", lit("DELETE")).otherwise(lit("INSERT")).as("tg_op"),
      lit("orders").as("tbl"),
      when(col("event_type") === "error", payload).as("old"),
      when(col("event_type") =!= "error", payload).as("new"),
      col("event_id").as("txid"))
    println(s"[profile] root changes rows: ${time("root: changes count")(rchanges.count())}")
    val rengine = new IncrementalEngine(SchemaDef.parseNodes(Fixtures.flagship), Catalog.testData, load)
    val raff = time("root: affectedRoots build+count") {
      val a = rengine.affectedRoots(rchanges, Lineage.empty(spark)).cache()
      println(s"[profile] affected rows: ${a.count()}")
      a
    }
    time("root: reassemble noop") {
      rengine.reassemble(raff).write.mode("overwrite").format("noop").save()
    }
    spark.catalog.clearCache()
    time("root: full process noop") {
      rengine.process(rchanges, Lineage.empty(spark)).write.mode("overwrite").format("noop").save()
    }
    spark.catalog.clearCache()

    // ---- the Bench incremental-throughput shape (5000-change orders batch),
    // staged: locates WHERE the constant-batch cost grows with corpus size
    // (the sf1 floor question — 6.5k changes/s at sf0.1 vs 4.6k at sf1)
    val batch = load("orders")
      .limit(5000)
      .select(
        lit("UPDATE").as("tg_op"), lit("orders").as("tbl"),
        lit(null).cast("string").as("old"),
        to_json(struct(col("o_orderkey"))).as("new"),
        col("o_orderkey").as("txid"))
      .cache()
    println(s"[profile] bench batch rows: ${batch.count()}")
    val bengine = new IncrementalEngine(SchemaDef.parseNodes(Fixtures.flagship), Catalog.testData, load)
    (1 to 3).foreach { i =>
      val baff = time(s"bench$i: affectedRoots build+count") {
        val a = bengine.affectedRoots(batch, Lineage.empty(spark)).cache()
        a.count(); a
      }
      time(s"bench$i: reassemble noop") {
        bengine.reassemble(baff).write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      time(s"bench$i: full process noop") {
        bengine.process(batch, Lineage.empty(spark)).write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      batch.count() // re-materialize the batch cache the clear dropped
    }
    // same shape with rangeBracket on: if the batch's ids cluster in a key
    // range (limit(5000) takes leading row groups), the pushed min/max
    // brackets let parquet stats prune the corpus scans the broadcast
    // semi-join path otherwise reads whole
    val brengine = new IncrementalEngine(
      SchemaDef.parseNodes(Fixtures.flagship), Catalog.testData, load,
      rangeBracket = true)
    (1 to 3).foreach { i =>
      time(s"bench$i+bracket: full process noop") {
        brengine.process(batch, Lineage.empty(spark)).write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      batch.count()
    }

    // ---- the partitioned-layout twin (the floor's named remedy): same
    // 5000-change batch size, key-CLUSTERED (top of the key space — the
    // production churn shape), A/B'd across four cells: {flat, partitioned}
    // layout × {affectedRoots+reassemble staged, full process}. The
    // partitioned cell must be ~flat sf0.1 → sf1 because the batch touches a
    // constant ~2 directories regardless of corpus size.
    import graft.cdc.IncrementalEngine.PartitionPrune
    import graft.sources.Layout
    val pdir = graft.util.TempDirs.scratch("profile-cdc-part").toString
    time("part: layout prep (one-time)") {
      Layout.keyPartitionedWrite(load("orders"), "o_orderkey", 16384, s"$pdir/orders")
      Layout.keyPartitionedWrite(load("lineitem"), "l_orderkey", 16384, s"$pdir/lineitem")
      Layout.keyPartitionedWrite(load("customer"), "c_custkey", 2048, s"$pdir/customer")
    }
    // memoized relations: a partitioned tree pays directory listing +
    // partition-column inference on EVERY spark.read.parquet call, and the
    // engine loads each table several times per batch (validation, restrict,
    // dim probe, assemble) — re-inferring a many-directory layout per call
    // was most of the partitioned path's overhead at sf1. One relation per
    // table per run is also what a long-lived production session holds.
    val ploadCache = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.DataFrame]
    val pload: String => org.apache.spark.sql.DataFrame = t =>
      ploadCache.getOrElseUpdate(t, t match {
        case "orders" | "lineitem" | "customer" => spark.read.parquet(s"$pdir/$t")
        case _                                  => load(t)
      })
    val maxKey = load("orders").agg(max(col("o_orderkey"))).head().getLong(0)
    val cbatch = load("orders")
      .filter(col("o_orderkey") > maxKey - 5000)
      .select(
        lit("UPDATE").as("tg_op"), lit("orders").as("tbl"),
        lit(null).cast("string").as("old"),
        to_json(struct(col("o_orderkey"))).as("new"),
        col("o_orderkey").as("txid"))
      .cache()
    println(s"[profile] clustered batch rows: ${cbatch.count()}")
    val flatEngine = new IncrementalEngine(
      SchemaDef.parseNodes(Fixtures.flagship), Catalog.testData, load)
    val partEngine = new IncrementalEngine(
      SchemaDef.parseNodes(Fixtures.flagship), Catalog.testData, pload,
      partitionPrune = Seq("orders", "lineitem", "customer").map { t =>
        val (_, w, pc) = Layout.keyPartitionSpec(spark, s"$pdir/$t")
        t -> PartitionPrune(pc, w)
      }.toMap)
    for ((label, eng) <- Seq("flat" -> flatEngine, "part" -> partEngine); i <- 1 to 3) {
      val aff = time(s"$label$i: clustered affectedRoots build+count") {
        val a = eng.affectedRoots(cbatch, Lineage.empty(spark)).cache()
        a.count(); a
      }
      time(s"$label$i: clustered reassemble noop") {
        eng.reassemble(aff).write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      time(s"$label$i: clustered full process noop") {
        eng.process(cbatch, Lineage.empty(spark)).write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      cbatch.count()
    }

    // ---- FEED-SHAPED batch: the same 5000 clustered changes as driver-local
    // rows (LocalRelation — no corpus-derived lineage in the batch plan at
    // all). This is the honest production feed shape (a change batch arrives
    // from a stream receiver, not from a corpus scan), and it separates
    // engine cost from harness artifact by construction: any sf0.1→sf1
    // growth in these cells is ENGINE cost, because re-materializing the
    // batch costs the same at every corpus size. The corpus-derived cells
    // above should now match these (the engine's same-frame cache guard
    // keeps cbatch's cache across re-processes); a residual gap between the
    // two cells at sf1 would mean some OTHER corpus-derived harness cost
    // still lands in the timed window.
    val localRows = cbatch.collect().toIndexedSeq
    val lbatch = spark
      .createDataFrame(spark.sparkContext.parallelize(localRows, 1), cbatch.schema)
      .cache()
    println(s"[profile] feed-shaped batch rows: ${lbatch.count()}")
    for ((label, eng) <- Seq("flat" -> flatEngine, "part" -> partEngine); i <- 1 to 3) {
      time(s"$label$i: feed-shaped full process noop") {
        eng.process(lbatch, Lineage.empty(spark)).write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      lbatch.count()
    }
    spark.stop()
  }
}
