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

  /** Stratified hash sampling (corpus mixing by rate): each stratum keeps
    * its own fraction — "90% of English, 10% of boilerplate-heavy web" —
    * with the same determinism/portability/monotonicity guarantees as
    * [[hashSample]] (same key ⇒ membership nests across fractions, so
    * remixing ratios never churns the kept set beyond the rate change).
    * Pure map-side predicate: no shuffle, no per-stratum passes.
    */
  def stratifiedSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0
  ): DataFrame = {
    val pred = fractions.foldLeft(when(lit(false), lit(false))) { case (acc, (s, f)) =>
      acc.when(stratum === s, hashSamplePredicate(key, f))
    }.otherwise(hashSamplePredicate(key, defaultFraction))
    df.filter(pred)
  }

  /** Phase 1 of the two-phase group-prefix discipline shared by [[quota]],
    * [[tokenBudget]], and [[temperatureMix]]: `sorted` must already be
    * partition-locally sorted on (group, order); one streaming pass keeps
    * each group-run's prefix with O(1) state and NO exchange. `keep`
    * inspects the row and the group accumulator BEFORE the row; `advance`
    * returns the accumulator after a kept row.
    */
  private def localGroupPrefix(
      sorted: DataFrame,
      groupIdx: Int,
      keep: (org.apache.spark.sql.Row, Long) => Boolean,
      advance: (org.apache.spark.sql.Row, Long) => Long
  ): DataFrame = {
    val schema = sorted.schema
    sorted.mapPartitions { it =>
      var cur: Any = null
      var seen = false
      var acc = 0L
      it.filter { r =>
        val g = r.get(groupIdx)
        if (!seen || g != cur) { cur = g; seen = true; acc = 0L }
        val keepRow = keep(r, acc)
        if (keepRow) acc = advance(r, acc)
        keepRow
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Per-group quota (corpus mixing): keep at most `k` rows per group, in a
    * deterministic order. The standard balanced-mixture primitive ("≤ k docs
    * per domain/language").
    *
    * TWO-PHASE for scale: a single `row_number() OVER (PARTITION BY group)`
    * funnels every row of a group through one task's sort — on
    * low-cardinality groups (e.g. 3 order statuses) that is a straight OOM
    * at 100 TB. Phase 1 here keeps at most `k` rows per group per PHYSICAL
    * partition with no exchange at all: a partition-local sort on
    * (group, order) makes each group's rows contiguous, and a run-length
    * counter emits the first `k` of each run (O(1) state, single pass —
    * `mapPartitions` because no built-in operator expresses a no-exchange
    * local top-k). Phase 2 runs the exact global window, but over at most
    * k·numPartitions survivors per group, so the per-group funnel is bounded
    * by the cluster size, never the data size.
    *
    * Phase 1 keeps a superset of the global winners: a row among a group's
    * global top-k can have at most k-1 rows of its group ordering before it
    * in its own partition. Exactness requires `order` to be a total order
    * (ties broken arbitrarily could differ between the local and global
    * sorts) — the same requirement deterministic output had already.
    */
  /** Token-budget corpus mixing: keep documents per stratum until the
    * stratum's TOKEN budget is filled — "200 B tokens of web, 30 B of code,
    * all of wiki" — the mixture primitive training-data recipes are written
    * in (quotas are over tokens, not document counts, because documents
    * vary by 4+ orders of magnitude in length).
    *
    * Membership is deterministic and engine-portable: documents fill their
    * stratum's budget in md5-hex order of the key (ties broken by the key
    * itself, so the order is total for unique keys). A document is kept iff
    * the tokens of all documents ordered before it in its stratum sum to
    * less than the budget — the last document may overflow the budget
    * (greedy fill, same straddle semantics as `Packing.pack`), so a
    * stratum with any documents at all and a positive budget is never
    * empty. Like [[hashSample]], growing a budget only ever grows the kept
    * set (prefix property of the hash order).
    *
    * TWO-PHASE for the same reason as [[quota]]: the exact prefix-sum
    * window funnels each stratum through one task. Phase 1 keeps, with no
    * exchange, each partition's hash-order prefix whose running total is
    * under the budget — a superset of the global winners, because a row's
    * partition-local prefix sum is at most its global prefix sum. Phase 2
    * runs the exact window over at most budget·numPartitions tokens per
    * stratum — bounded by cluster size, not data size.
    */
  def tokenBudget(
      df: DataFrame,
      key: Column,
      stratum: Column,
      tokens: Column,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L
  ): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0, "budgets must be >= 0")
    val budgetCol = budgets.foldLeft(when(lit(false), lit(0L))) { case (acc, (s, b)) =>
      acc.when(stratum === s, lit(b))
    }.otherwise(lit(defaultBudget))
    val tagged = df
      .withColumn("__h", md5(key.cast(StringType).cast(BinaryType)))
      .withColumn("__k", key.cast(StringType))
      .withColumn("__s", stratum.cast(StringType))
      .withColumn("__t", tokens.cast("long"))
      .withColumn("__b", budgetCol)
    // phase 1: partition-local hash-order prefix under budget, no exchange
    val sorted = tagged.sortWithinPartitions(col("__s"), col("__h"), col("__k"))
    val tIdx = sorted.schema.fieldIndex("__t")
    val bIdx = sorted.schema.fieldIndex("__b")
    val local = localGroupPrefix(
      sorted,
      sorted.schema.fieldIndex("__s"),
      keep = (r, acc) => acc < r.getLong(bIdx),
      advance = (r, acc) => if (r.isNullAt(tIdx)) acc else acc + r.getLong(tIdx)
    )
    // phase 2: exact global prefix sum over the bounded survivor set
    val w = Window
      .partitionBy(col("__s"))
      .orderBy(col("__h"), col("__k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    local
      .withColumn("__prev", coalesce(sum(col("__t")).over(w), lit(0L)))
      .filter(col("__prev") < col("__b"))
      .drop("__h", "__k", "__s", "__t", "__b", "__prev")
  }

  /** Temperature-scaled mixture sampling (the multilingual-corpus balancing
    * rule of Conneau & Lample 2019 / mT5: sample stratum i with probability
    * ∝ nᵢ^α, α < 1 upweighting low-resource strata): computes per-stratum
    * document targets from the data itself — `targetᵢ = ⌊budget · wᵢ / Σwⱼ⌋`
    * with `wᵢ = ⌊nᵢ^α⌋` — then keeps each stratum's first `targetᵢ`
    * documents in md5-hash order of the key.
    *
    * PORTABILITY CONTRACT: with the default `alpha = 0.5` the weights are
    * `⌊√nᵢ⌋` — IEEE sqrt is exactly rounded, so floor(sqrt) is bit-identical
    * in every engine, and everything downstream (integer sums, integer
    * division, md5 rank) replays exactly. `alpha = 1.0` (proportional) is
    * likewise exact. Any other α goes through `pow`, which is NOT exactly
    * rounded across engines — fine for production, excluded from the
    * hash-gate contract.
    *
    * Scale shape: stratum counts are one map-side-combining aggregate; the
    * weight/target table is stratum-cardinality-sized (model, not data) and
    * broadcast back. Selection reuses the [[quota]] two-phase discipline — a
    * no-exchange partition-local run-length prefix, then the exact window
    * over ≤ target·numPartitions survivors per stratum — so no stratum ever
    * funnels its full document set through one task.
    */
  def temperatureMix(
      df: DataFrame,
      key: Column,
      stratum: Column,
      budget: Long,
      alpha: Double = 0.5
  ): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // α = 0 is legal (uniform weights); negative α floors every weight of a
    // stratum with n ≥ 2 to zero and div-by-zeroes the targets
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    if (budget == 0) return df.limit(0)
    val tagged = df
      .withColumn("__h", md5(key.cast(StringType).cast(BinaryType)))
      .withColumn("__k", key.cast(StringType))
      .withColumn("__s", stratum.cast(StringType))
    val weight = alpha match {
      case 1.0 => col("__n")
      case 0.5 => floor(sqrt(col("__n").cast("double"))).cast("long")
      case a   => floor(pow(col("__n").cast("double"), a)).cast("long")
    }
    val weights = tagged
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"))
      .select(col("__s"), weight.as("__w"))
    // Σw via an empty-partition window: the counts table is model-sized
    // (one row per stratum), so one task is fine — and unlike a second
    // `weights.agg(sum)` branch it does NOT duplicate the weights subtree,
    // which would re-scan the whole corpus for the total
    val targets = weights
      .withColumn("__sw", sum(col("__w")).over(Window.partitionBy()))
      .select(col("__s"), expr(s"(${budget}L * __w) div __sw").as("__target"))
    val budgeted = tagged.join(
      broadcast(targets.withColumnRenamed("__s", "__ts")),
      col("__s") <=> col("__ts"),
      "inner"
    )
    // phase 1: per-partition run-length counter under the per-stratum target
    val sorted = budgeted.sortWithinPartitions(col("__s"), col("__h"), col("__k"))
    val tIdx = sorted.schema.fieldIndex("__target")
    val local = localGroupPrefix(
      sorted,
      sorted.schema.fieldIndex("__s"),
      keep = (r, n) => n < r.getLong(tIdx),
      advance = (_, n) => n + 1
    )
    // phase 2: exact rank over the bounded survivor set
    val w = Window.partitionBy(col("__s")).orderBy(col("__h"), col("__k"))
    local
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__target"))
      .drop("__h", "__k", "__s", "__ts", "__target", "__rn")
  }

  def quota(df: DataFrame, groupCols: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    require(k >= 0, s"quota k must be >= 0, got $k")
    if (k == 0) return df.limit(0)
    val tagged = df.withColumn("__gk", struct(groupCols: _*))
    val sorted = tagged.sortWithinPartitions(col("__gk") +: order: _*)
    val local = localGroupPrefix(
      sorted,
      sorted.schema.fieldIndex("__gk"),
      keep = (_, n) => n < k,
      advance = (_, n) => n + 1
    )
    val w = Window.partitionBy(col("__gk")).orderBy(order: _*)
    local
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn", "__gk")
  }

  /** Weighted sample WITHOUT replacement, k per group: Efraimidis–Spirakis
    * (2006) one-pass reservoir keys, deterministic and engine-portable.
    *
    * Each row gets a pseudo-uniform `u ∈ (0, 1)` from the first 12 md5 hex
    * digits of its id (48 bits — exact in a double; `+0.5` keeps u
    * strictly positive), and the selection key is `ln(u) / w`: keeping the
    * k LARGEST keys draws each row with probability proportional to its
    * weight, without replacement. Keys are rounded to micro so the oracle's
    * C-library `ln` and the JVM's agree bit-for-bit after rounding (the
    * established score_micro convention); micro-ties break on id.
    *
    * Scale shape: the key is a pure column expression and the top-k runs on
    * the bounded-heap [[graft.expr.TopKAgg]] — one exchange carrying
    * `groups × k` pairs, no corpus sort, no RNG state anywhere.
    *
    * Output: (groupCols…, rank, score, id) where score is the micro-rounded
    * key.
    */
  def weightedSample(
      df: DataFrame,
      groupCols: Seq[String],
      id: Column,
      weight: Column,
      k: Int
  ): DataFrame = {
    val u =
      (conv(substring(md5(id.cast(StringType).cast(BinaryType)), 1, 12), 16, 10)
        .cast("double") + lit(0.5)) / lit(281474976710656.0) // 2^48
    val keyMicro = round(lit(1000000.0) * log(u) / greatest(weight.cast("double"), lit(1.0)))
    Analytics.topKPerGroup(
      df.withColumn("__wkey", keyMicro),
      groupCols,
      col("__wkey"),
      id,
      k
    )
  }
}
