package graft.tools

import graft.assemble.DocAssembler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution INSIDE the snapshot path (ProfileLifecycle reports it
  * as one number): assembly→persist materialization, the docs bucket write,
  * the lineage bucket write — the three costs `MaterializedIndex.initialize`
  * composes. `runMain graft.tools.ProfileSnapshot <sfDir>`.
  */
object ProfileSnapshot {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[snapshot] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val load = graft.sources.Tables.load(spark, sfDir) _
    val docs = DocAssembler.assemble(
      graft.schema.SchemaDef.parseNodes(graft.Fixtures.flagship), load,
      graft.catalog.Catalog.testData)

    // reference points
    timed("assemble->noop") {
      docs.write.mode("overwrite").format("noop").save()
    }
    val payload = docs.columns.filterNot(_ == DocAssembler.IdColumn).map(col).toIndexedSeq
    timed("assembleJson->noop") {
      docs.select(col(DocAssembler.IdColumn), to_json(struct(payload: _*)).as("doc"))
        .write.mode("overwrite").format("noop").save()
    }

    // the initialize() phases — the round-16 WRITE-ONCE shape: docs stream
    // straight from the assembly plan (no corpus persist), lineage derives
    // from the just-written doc buckets (JSON _meta read-back)
    val nBuckets = 64
    def bucketOf(id: org.apache.spark.sql.Column) =
      pmod(xxhash64(id), lit(nBuckets)).cast("int")
    val out = graft.util.TempDirs.scratch("prof-snap").toString
    val flat = docs.select(
      col(DocAssembler.IdColumn),
      to_json(struct(payload: _*)).as("doc"),
      to_json(col(DocAssembler.MetaColumn)).as("_graft_meta"))
    timed("docs write (pipelined)") {
      flat.withColumn("bucket", bucketOf(col(DocAssembler.IdColumn)))
        .repartition(nBuckets, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$out/docs")
    }
    val metaType = docs.schema(DocAssembler.MetaColumn).dataType
    timed("lineage read-back write") {
      graft.cdc.Lineage.fromMetaJson(
          spark.read.schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              DocAssembler.IdColumn, org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField(
              "_graft_meta", org.apache.spark.sql.types.StringType))))
            .parquet(s"$out/docs"),
          "_graft_meta", metaType)
        .withColumn("bucket", bucketOf(col("root_id")))
        .repartition(nBuckets, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$out/lineage")
    }

    // the PRE-round-16 shape, for the before/after attribution record
    val cached = docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("old: persist materialize")(cached.count())
    val flatCached = cached.select(
      col(DocAssembler.IdColumn), to_json(struct(payload: _*)).as("doc"))
    timed("old: docs write") {
      flatCached.withColumn("bucket", bucketOf(col(DocAssembler.IdColumn)))
        .repartition(nBuckets, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$out/docs_old")
    }
    timed("old: lineage write") {
      graft.cdc.Lineage.fromDocs(cached)
        .withColumn("bucket", bucketOf(col("root_id")))
        .repartition(nBuckets, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$out/lineage_old")
    }
    cached.unpersist()
    spark.stop()
  }
}
