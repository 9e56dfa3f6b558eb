package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Deterministic corpus subsampling and mixing operators.
  *
  * Training-data pipelines need samples that are REPRODUCIBLE (row
  * membership independent of partitioning, executor count, or run order —
  * `df.sample` is none of those) and PORTABLE (an external engine can
  * recompute the same membership for audits). Both operators here are pure
  * column expressions: no RNG state, no shuffle beyond what the semantics
  * require.
  */
object Sampling {

  /** Keep ~`fraction` of rows, decided per row by the md5 hex of its key:
    * a row survives iff `md5(key) < hex(fraction · 16^4)`. Lexicographic
    * hex comparison is engine-portable (same result in any SQL engine with
    * md5), membership is stable under repartition/rerun, and changing the
    * fraction only ever grows/shrinks the kept set monotonically (nested
    * samples — larger fractions contain smaller ones).
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    df.filter(hashSamplePredicate(key, fraction))
  }

  private[graft] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    // clamp below 0x10000: a 5-digit threshold would compare wrong against
    // 4+-digit hex; fraction == 1.0 is short-circuited by the predicate
    val bucket = math.min(0xffffL, math.round(fraction * 0x10000L))
    f"$bucket%04x"
  }

  /** The survival predicate alone — composable into larger filters. */
  def hashSamplePredicate(key: Column, fraction: Double): Column =
    if (fraction >= 1.0) lit(true)
    else md5(key.cast(StringType).cast(BinaryType)) < lit(thresholdHex(fraction))

  /** Per-group quota (corpus mixing): keep at most `k` rows per group, in a
    * deterministic order — one shuffle on the group key. The standard
    * balanced-mixture primitive ("≤ k docs per domain/language").
    */
  def quota(df: DataFrame, groupCols: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
