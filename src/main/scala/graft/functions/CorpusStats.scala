package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group distribution statistics (order-statistic percentiles) for
  * corpus quality reporting — the batch report a pipeline runs before
  * committing a mixing/filtering decision.
  *
  * Scale shape: the naive formulation (row_number over every row per group)
  * sorts the whole corpus inside each group's single reducer. Instead we
  * aggregate to (group, value) counts first — map-side combinable, and the
  * per-group window then sorts DISTINCT VALUES (bounded by the value domain,
  * e.g. document lengths), not rows. The k-th order statistic is recovered
  * from the running count: p_q = min value whose cumulative count reaches
  * ceil(q * n). All arithmetic is integer, so engines agree exactly.
  */
object CorpusStats {

  /** Per-`keys` group: row count, min/max, exact p50 (lower median,
    * k = ceil(n/2)) and exact p90 (k = ceil(0.9 n)) of `value`.
    * Output: (keys..., n_rows, min_v, max_v, p50, p90).
    *
    * NULL POLICY: null values are dropped before aggregating — `n_rows`
    * counts only rows with a value, and percentiles are over present values.
    * (Engines also disagree on null placement in ORDER BY — Spark defaults
    * NULLS FIRST, DuckDB NULLS LAST — so keeping nulls would silently skew
    * `cum` differently per engine; dropping them makes the stats
    * engine-independent and honest: a null has no place in a length
    * distribution.)
    */
  def exactPercentiles(df: DataFrame, keys: Seq[String], value: String): DataFrame = {
    val k = keys.map(col)
    val counts = df
      .filter(col(value).isNotNull)
      .groupBy(k :+ col(value).cast("long").as("v"): _*)
      .agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(Window.partitionBy(k: _*).orderBy(col("v"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(k: _*)))
    cum
      .groupBy(k: _*)
      .agg(
        max(col("n")).as("n_rows"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        min(when(col("cum") >= floor((col("n") + 1) / lit(2L)), col("v"))).as("p50"),
        min(when(col("cum") >= floor((col("n") * 9 + 9) / lit(10L)), col("v"))).as("p90")
      )
  }

  /** Distinct-n diversity per group: of all word n-gram OCCURRENCES in the
    * group's text, what fraction are distinct (Li et al. 2016's distinct-n,
    * the standard corpus-degeneration signal — synthetic/templated text
    * scores low).
    *
    * Scale shape: one scan; the n-gram windows come from the codegen'd
    * [[graft.expr.WordShingles]] expression (non-distinct form), and both
    * counts reduce in one hash aggregate keyed by the group — the exchange
    * carries (group, gram) partial counts. `count(distinct gram)` plans as
    * a two-phase distinct aggregate, NOT a corpus-wide dedup join.
    *
    * Output: (group, total_ngrams, distinct_ngrams, distinct_milli).
    */
  def ngramDiversity(df: DataFrame, groupCol: String, textCol: String, n: Int): DataFrame = {
    val grams = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expr.WordShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(col(textCol)),
        n,
        distinct = false
      )
    )
    df.select(col(groupCol), explode(grams).as("_g"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("total_ngrams"),
        count_distinct(col("_g")).as("distinct_ngrams")
      )
      .withColumn(
        "distinct_milli",
        round(lit(1000.0) * col("distinct_ngrams") / col("total_ngrams")).cast("long")
      )
  }

  /** Zipf frequency spectrum: for each word frequency f, how many distinct
    * (lowercased) word types occur exactly f times. The two-hump shape of
    * this curve is the standard contamination/boilerplate tell (natural
    * corpora are Zipfian; template floods put a spike at their copy count).
    *
    * Two chained hash aggregates, both map-side combinable; the first
    * exchange carries word types (vocabulary-sized), the second carries
    * distinct frequencies (tiny).
    */
  def frequencySpectrum(df: DataFrame, textCol: String): DataFrame =
    df.select(
        explode(split(trim(lower(col(textCol))), graft.expr.TextPrimitives.WsPlus)).as("w")
      )
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("f"))
      .groupBy(col("f"))
      .agg(count(lit(1)).as("n_words"))
}
