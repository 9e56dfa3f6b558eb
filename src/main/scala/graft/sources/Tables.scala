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

  /** JDBC variant for a live database (production path; not used in tests).
    * `partitionColumn`/`numPartitions` replace the reference's ctid-paged
    * parallel snapshot.
    */
  def loadJdbc(
      spark: SparkSession,
      url: String,
      partitions: Int = 32
  )(table: String): DataFrame =
    spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("numPartitions", partitions)
      .load()
}
