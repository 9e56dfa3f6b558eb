package graft.functions

import graft.expr.TopKAgg
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale analytics operators whose NAIVE formulations hide a
  * full-corpus shuffle; each is implemented in the shape that survives
  * 100 TB.
  *
  * - [[topKPerGroup]]: bounded-heap aggregate instead of window
  *   `row_number` — the exchange carries `groups × k` pairs, not the corpus.
  * - [[asOfJoin]]: union + one per-key sort instead of an inequality join —
  *   no pair explosion, one exchange total.
  * - [[funnel]]: sorted-group sequential scan — one exchange, O(steps)
  *   state per user, instead of `steps` chained self-joins.
  */
object Analytics {

  // ---------------------------------------------------------------------
  // Top-k per group
  // ---------------------------------------------------------------------

  /** `array<struct<score,id>>` of the k best (score DESC, id ASC) per group.
    * Aggregate column form, composable into any groupBy.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAgg(
        GraftColumnBridge.expression(score.cast("double")),
        GraftColumnBridge.expression(id.cast("long")),
        k
      ).toAggregateExpression()
    )

  /** Top-k rows per group, exploded to `(groupCols*, rank, score, id)`.
    *
    * Scale shape: `ObjectHashAggregate(partial) → exchange(groups) →
    * ObjectHashAggregate(final)` — the map side reduces each partition to at
    * most k pairs per group BEFORE the exchange. The window equivalent
    * (`row_number over (partition by g order by s desc)`) exchanges and
    * sorts every corpus row. PlanSpec asserts the two-phase object-hash
    * shape and the absence of a sort.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      score: Column,
      id: Column,
      k: Int
  ): DataFrame = {
    val g = df.groupBy(groupCols.map(col): _*).agg(topK(score, id, k).as("_topk"))
    g.select(
      groupCols.map(col) ++ Seq(posexplode(col("_topk")).as(Seq("_pos", "_e"))): _*
    ).select(
      groupCols.map(col) ++ Seq(
        (col("_pos") + 1).cast("long").as("rank"),
        col("_e.score").as("score"),
        col("_e.id").as("id")
      ): _*
    )
  }

  // ---------------------------------------------------------------------
  // As-of join
  // ---------------------------------------------------------------------

  /** As-of join: for every left row, the single right row with the greatest
    * `(rightTime, rightTie)` such that `rightTime <= leftTime`, matched on
    * equal keys. Left rows with no eligible right row keep nulls (left
    * outer semantics) — classic last-touch attribution / "state as of".
    *
    * Implementation is the union trick: tag both sides, union, ONE exchange
    * on the key, per-key sort by `(time, side, tie)` with right rows before
    * left rows at equal time (the "or equal" in at-or-before), then
    * `last(payload, ignoreNulls)` over an unbounded-preceding running
    * window, keeping left rows. Compare the naive formulations: an
    * inequality join (`l.key = r.key AND r.ts <= l.ts` + argmax) explodes
    * to every (left, right) pair before aggregating — quadratic in the
    * per-key row count; a broadcast of the right side dies when the right
    * side is corpus-sized. The union shape is linear and needs exactly one
    * shuffle of |L| + |R| rows.
    *
    * @param rightPayload right-side columns to carry onto matched left rows;
    *                     caller pre-renames to avoid collisions with left.
    * @param rightTie     deterministic tie-break among equal `rightTime`
    *                     (greatest wins, mirroring `max_by(payload, (t, tie))`).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTie: String
  ): DataFrame = {
    require(leftOn.length == rightOn.length, "key arity mismatch")
    val keys = leftOn.indices.map(i => s"_k$i")
    val lCols = left.columns.toSeq
    val l = left
      .select(
        leftOn.indices.map(i => col(leftOn(i)).as(keys(i))) ++ Seq(
          col(leftTime).as("_t"),
          lit(1).as("_side"),
          lit(null).cast("long").as("_tie"),
          struct(lCols.map(col): _*).as("_lrow"),
          lit(null)
            .cast(
              org.apache.spark.sql.types.StructType(
                rightPayload.map(c => right.schema(c))
              )
            )
            .as("_rpay")
        ): _*
      )
    val r = right
      .select(
        rightOn.indices.map(i => col(rightOn(i)).as(keys(i))) ++ Seq(
          col(rightTime).as("_t"),
          lit(0).as("_side"),
          col(rightTie).cast("long").as("_tie"),
          lit(null).cast(l.schema("_lrow").dataType).as("_lrow"),
          struct(rightPayload.map(col): _*).as("_rpay")
        ): _*
      )
    // side=0 (right) sorts before side=1 (left) at equal _t: a right row AT
    // the left row's time is eligible. Among equal-_t right rows the
    // greatest _tie sorts last, so `last` picks it.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        lCols.map(c => col(s"_lrow.$c").as(c)) ++
          rightPayload.map(c => col(s"_asof.$c").as(c)): _*
      )
  }

  // ---------------------------------------------------------------------
  // Range join
  // ---------------------------------------------------------------------

  /** Range join: all (left, right) pairs with equal keys and
    * `rightTime ∈ [leftTime + lo, leftTime + hi)` (microsecond offsets,
    * closed-open).
    *
    * Scale shape — banded equi-join, not a theta-join: Spark plans a raw
    * `l.key = r.key AND r.t BETWEEN …` as an equi-join on key with the
    * range as a post-join filter, which materializes EVERY same-key pair
    * first (quadratic in per-key rows — a hot key with 10⁶ events on each
    * side is 10¹² pairs). Instead both sides are bucketed by
    * `floor(t / (hi - lo))`: each left row lands in the ≤2 buckets its
    * window overlaps, each right row in exactly one, the join key becomes
    * `(key, bucket)` — so candidate pairs are bounded by rows whose times
    * lie within one band width of each other, and the exact range filter
    * runs on that band only. Left-side duplication ≤2×; one shuffle join;
    * AQE's skew split still applies to the banded key.
    *
    * @param rightPayload right columns carried onto each pair (caller
    *                     pre-renames to avoid collisions).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      leftTime: String,
      rightTime: String,
      loMicros: Long,
      hiMicros: Long,
      rightPayload: Seq[String]
  ): DataFrame = {
    require(hiMicros > loMicros, s"empty range [$loMicros, $hiMicros)")
    require(leftOn.length == rightOn.length, "key arity mismatch")
    val w = hiMicros - loMicros
    val keys = leftOn.indices.map(i => s"_k$i")
    val lCols = left.columns.toSeq
    val l = left
      .select(
        leftOn.indices.map(i => col(leftOn(i)).as(keys(i))) ++ Seq(
          unix_micros(col(leftTime).cast("timestamp")).as("_lt"),
          struct(lCols.map(col): _*).as("_lrow")
        ): _*
      )
      // the window [lt+lo, lt+hi) spans at most two width-w bands; exact
      // integer floor-div (pmod is non-negative) — no double rounding at
      // band boundaries
      .withColumn(
        "_b",
        explode(
          array_distinct(
            array(
              ((col("_lt") + lit(loMicros) - pmod(col("_lt") + lit(loMicros), lit(w))) / lit(w))
                .cast("long"),
              ((col("_lt") + lit(hiMicros) - 1 - pmod(col("_lt") + lit(hiMicros) - 1, lit(w))) / lit(w))
                .cast("long")
            )
          )
        )
      )
    val r = right
      .select(
        rightOn.indices.map(i => col(rightOn(i)).as(keys(i))) ++ Seq(
          unix_micros(col(rightTime).cast("timestamp")).as("_rt"),
          struct(rightPayload.map(col): _*).as("_rpay")
        ): _*
      )
      .withColumn("_b", ((col("_rt") - pmod(col("_rt"), lit(w))) / lit(w)).cast("long"))
    l.join(r, keys :+ "_b")
      .filter(col("_rt") >= col("_lt") + lit(loMicros) && col("_rt") < col("_lt") + lit(hiMicros))
      .select(
        lCols.map(c => col(s"_lrow.$c").as(c)) ++
          rightPayload.map(c => col(s"_rpay.$c").as(c)): _*
      )
  }

  // ---------------------------------------------------------------------
  // Funnel
  // ---------------------------------------------------------------------

  /** Ordered-funnel depth per user: the longest prefix of `steps` that
    * occurs as a strictly-time-increasing subsequence of the user's events.
    * Greedy earliest-match is exact for subsequence existence, so depth(u)
    * ≥ i iff there exist t₁ < t₂ < … < tᵢ with matching step types.
    *
    * One exchange on the user key; events arrive time-sorted per user via
    * `flatMapSortedGroups` (Spark's secondary sort — the shuffle writes
    * sorted runs, no per-group materialization), and the scan keeps O(1)
    * state (the current depth + last matched time). The SQL formulation is
    * `steps` chained join+min CTEs — `steps` extra exchanges of the events
    * table; that chain is exactly what the DuckDB oracle runs.
    *
    * @return one row per funnel stage: `(stage, step, users)` where `users`
    *         counts users whose depth reached that stage.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val depths: DataFrame = events
      .select(
        col(userCol).cast("long").as("u"),
        // microsecond precision: the oracle's `ts > prev.t` compares full
        // timestamp precision, so the scan must too
        unix_micros(col(tsCol).cast("timestamp")).as("t"),
        col(typeCol).cast("string").as("s")
      )
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("t").asc, col("s").asc) { (u, it) =>
        var depth = 0
        var lastT = Long.MinValue
        for ((_, t, s) <- it if depth < steps.length) {
          // strictly-later than the previous matched step (ties at the same
          // timestamp do not advance the funnel — mirrors the oracle's
          // `ts > prev.t`)
          if (stepIdx.get(s).contains(depth) && t > lastT) {
            depth += 1
            lastT = t
          }
        }
        Iterator.single((u, depth))
      }
      .toDF("u", "depth")
    // histogram of depths is at most steps.length+1 rows — aggregate-sized
    val hist = depths
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val rows = steps.zipWithIndex.map { case (step, i) =>
      val stage = i + 1
      val users = hist.filter { case (d, _) => d >= stage }.values.sum
      (stage.toLong, step, users)
    }
    spark.createDataFrame(rows).toDF("stage", "step", "users")
  }
}
