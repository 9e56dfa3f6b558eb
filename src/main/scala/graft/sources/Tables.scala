package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader: maps a table name to a DataFrame.
  *
  * The reference reflects tables from a live database at runtime
  * (`pgsync/base.py:306-345`); our sources are whatever `spark.read`
  * supports — parquet for the test corpus, JDBC for a live database. The
  * parallel snapshot machinery the reference hand-rolls
  * (`bin/parallel_sync:132-376`, ctid paging `querybuilder.py:414-444`) is
  * subsumed by Spark's partitioned scans + task scheduler: parquet splits /
  * JDBC `partitionColumn` give the same parallelism with no bespoke pool.
  */
object Tables {

  /** Parquet directory layout used by the driver test data.
    *
    * The `events` table carries nanosecond timestamps, which the Parquet
    * reader rejects (`PARQUET_TYPE_ILLEGAL`); we read them as raw longs
    * (legacy conf) and floor-convert to microsecond TIMESTAMP_NTZ — the same
    * truncation DuckDB's µs TIMESTAMP applies.
    */
  def load(spark: SparkSession, dir: String)(table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$table.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case None => df
    }
  }

  /** Write a bucketed + sorted copy of a table into the session catalog's
    * warehouse. Joins and aggregations on the bucket keys then run with NO
    * shuffle of the big side — at 100 TB this (or an equivalent table
    * format's clustering) is how repeated child-aggregate joins on the same
    * FK avoid re-shuffling the fact table every sync. Bucket counts must
    * match across tables meant to co-join.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      nBuckets: Int = 64
  ): Unit =
    df.write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Load a bucketed table written by [[writeBucketed]]. */
  def loadBucketed(spark: SparkSession)(table: String): DataFrame =
    spark.table(table)

  /** JDBC variant for a live database (production path; not used in tests).
    * `partitionColumn` + bounds replace the reference's ctid-paged parallel
    * snapshot (`bin/parallel_sync:132-208`): Spark issues `partitions`
    * range-bounded queries in parallel, and its task scheduler replaces the
    * hand-rolled worker pool.
    */
  def loadJdbc(
      spark: SparkSession,
      url: String,
      partitions: Int = 32,
      partitionColumns: Map[String, (String, Long, Long)] = Map.empty
  )(table: String): DataFrame = {
    val reader = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", 10000) // reference QUERY_CHUNK_SIZE, settings.py:52
    partitionColumns.get(table) match {
      case Some((column, lower, upper)) =>
        reader
          .option("partitionColumn", column)
          .option("lowerBound", lower)
          .option("upperBound", upper)
          .option("numPartitions", partitions)
          .load()
      case None => reader.load()
    }
  }
}
