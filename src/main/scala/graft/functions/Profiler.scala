package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus column profiling — the "what is actually in this table" scan that
  * precedes every large ingest: per column, row count, non-null count,
  * distinct count, and min/max (as strings, so one result schema covers
  * heterogeneous columns).
  *
  * Two variants with different scale contracts:
  *
  * - [[profile]] — EXACT distinct counts. Multiple `count(distinct)` in one
  *   aggregate makes Catalyst plan an `Expand` (one duplicated row-stream
  *   per distinct column) feeding a two-phase aggregate: correct, one scan
  *   of the parquet, but the expand multiplies the aggregated stream by the
  *   number of profiled columns. Right for correctness gates and small-to-
  *   medium tables.
  * - [[profileApprox]] — HyperLogLog++ (`approx_count_distinct`, default
  *   rsd 5%) in a SINGLE pass with no `Expand`: per-column HLL sketches
  *   merge map-side, the exchange carries `columns × sketch` bytes
  *   regardless of corpus size. This is the 100 TB shape; ProfilerSpec pins
  *   the observed relative error on the test corpus.
  *
  * Min/max of strings use Spark's binary UTF-8 ordering, which matches
  * DuckDB's default (binary) collation — part of the oracle contract.
  */
object Profiler {

  private def entry(c: String): Column =
    struct(
      lit(c).as("col_name"),
      col("n_rows"),
      col(s"_cnt_$c").as("n_nonnull"),
      col(s"_dst_$c").as("n_distinct"),
      col(s"_min_$c").as("min_s"),
      col(s"_max_$c").as("max_s")
    )

  private def run(df: DataFrame, cols: Seq[String], distinct: Column => Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +: cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"_cnt_$c"),
          distinct(col(c)).as(s"_dst_$c"),
          min(col(c)).cast("string").as(s"_min_$c"),
          max(col(c)).cast("string").as(s"_max_$c")
        )
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(entry): _*)).as("_e"))
      .select(
        col("_e.col_name").as("col_name"),
        col("_e.n_rows").as("n_rows"),
        col("_e.n_nonnull").as("n_nonnull"),
        col("_e.n_distinct").as("n_distinct"),
        col("_e.min_s").as("min_s"),
        col("_e.max_s").as("max_s")
      )
  }

  /** Exact profile: one row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    run(df, cols, c => count_distinct(c))

  /** Single-pass HLL++ profile — no `Expand`, the 100 TB shape.
    * @param rsd maximum relative standard deviation of the distinct counts.
    */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    run(df, cols, c => approx_count_distinct(c, rsd))
}
