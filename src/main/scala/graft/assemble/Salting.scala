package graft.assemble

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy groupBy keys: two-phase salted aggregation.
  *
  * A one_to_many child aggregation (`groupBy(fk).agg(collect_list(...))`)
  * puts every row of one key on one reducer; a hot key (a root with millions
  * of children, a boilerplate shingle) stalls the stage at 100 TB. Phase 1
  * groups by (key, salt) so a hot key spreads over `salts` reducers; phase 2
  * merges the per-salt partials. AQE's skew-join splitting handles join-side
  * skew at runtime; this handles aggregation-side skew, which AQE does not
  * split.
  *
  * The output is bit-for-bit the same multiset as the unsalted aggregation;
  * apply `sort_array` downstream where deterministic order matters (as
  * [[DocAssembler]] does).
  */
object Salting {

  /** Deterministic per-row salt: a hash of the row's own data, not its
    * position. `monotonically_increasing_id`/`spark_partition_id` are pure
    * functions of partition layout, so after a shuffle-fetch failure a
    * recomputed partition can assign different salts to the same rows — the
    * SPARK-23207 class of hazard where a partially-refetched shuffle
    * double-counts or drops rows. Hashing (keys, value) gives every task
    * attempt the same salt for the same row. Rows that are bit-identical
    * share a salt, which only matters for a hot key whose payload is a
    * single repeated value — still bounded by the distinct-value count.
    */
  private[assemble] def rowSalt(keys: Seq[String], value: Column, salts: Int): Column =
    pmod(xxhash64((keys.map(col) :+ value): _*), lit(salts.toLong))

  /** Salted `collect_list`: (key cols) → merged array column `out`. */
  def saltedCollectList(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      out: String,
      salts: Int = 16
  ): DataFrame = {
    val phase1 = df
      // per-ROW salt: a per-partition salt degenerates when the hot key's
      // rows are co-located in few input partitions (sorted/clustered input)
      .withColumn("__salt", rowSalt(keys, value, salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(collect_list(value).as("__partial"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(flatten(collect_list(col("__partial"))).as(out))
  }

  /** Salted additive aggregate (sum/count style): two-phase sum. */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      out: String,
      salts: Int = 16
  ): DataFrame = {
    val phase1 = df
      .withColumn("__salt", rowSalt(keys, value, salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__partial"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(out))
  }
}
