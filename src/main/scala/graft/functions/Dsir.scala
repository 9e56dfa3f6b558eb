package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * public arXiv:2302.03169): select raw-corpus documents that look like a
  * TARGET distribution by importance weights over hashed n-gram features,
  * then sample with Gumbel-top-k so selection keeps diversity instead of
  * collapsing onto the single most target-like mode.
  *
  * The published recipe, re-expressed as three Spark aggregates:
  *   1. features = hashed unigram+bigram counts per document (hash
  *      bucketing via an md5 hex prefix — the engine-portable hash idiom
  *      the dedup twins use, 16^3 = 4096 buckets);
  *   2. two bag-of-buckets models: target (the `isTarget` rows) and raw
  *      (every row), Laplace-smoothed; per-bucket log probability RATIO in
  *      integer micro-nats — a ≤4096-row broadcast table;
  *   3. per-doc log-weight = Σ tf·ratio (exact integer sum), and the
  *      resample score adds per-doc deterministic Gumbel noise
  *      (u from a Knuth multiplicative hash of the id — both engines
  *      compute the identical BIGINT arithmetic, so the draw replays).
  *
  * Scale shape: two corpus tokenization passes — one building BOTH models
  * (the target flag rides the feature rows, so raw and target counts come
  * from a single aggregation) and one scoring pass joined against the
  * broadcast ratio table. Model aggregates are bucket-cardinality (4096)
  * not corpus-cardinality, and the final top-k is a distributed
  * TakeOrdered — no global sort, no single-reducer window over the
  * corpus. Floats never cross an aggregation boundary (the
  * [[LanguageModel]] micro-nat discipline), so the DuckDB oracle replays
  * the selection bit-for-bit.
  */
object Dsir {

  private val Buckets = 4096 // 16^3 md5-hex-prefix buckets
  private val KnuthMult = 2654435761L
  private val KnuthMod = 1000003L

  /** (id, bucket, tf): hashed unigram+bigram occurrence counts. */
  private def docFeatures(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = docs.select(col(id).as("id"), TextFunctions.tokens(lower(col(text))).as("t"))
    val uni = toks.select(col("id"), explode(col("t")).as("g"))
      .select(col("id"), concat(lit("u|"), col("g")).as("f"))
    val bi = toks
      .filter(size(col("t")) >= 2)
      .select(
        col("id"),
        explode(
          zip_with(
            slice(col("t"), lit(1), size(col("t")) - 1),
            slice(col("t"), lit(2), size(col("t")) - 1),
            (a, b) => concat(a, lit(" "), b)
          )
        ).as("g")
      )
      .select(col("id"), concat(lit("b|"), col("g")).as("f"))
    uni.unionAll(bi)
      .select(col("id"), substring(md5(col("f").cast("binary")), 1, 3).as("bucket"))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Per-document importance log-weight in micro-nats. Documents with no
    * features (empty text) weigh 0; null-id rows are dropped with the null
    * text they ride on. Output: (id, weight_micro).
    */
  def importanceWeights(
      docs: DataFrame,
      id: String,
      text: String,
      isTarget: Column
  ): DataFrame = {
    val feat = docFeatures(docs, id, text)
    // both models from ONE aggregation of the feature frame: the target
    // membership rides along as a per-id flag (broadcast semi-join-sized),
    // so the corpus is tokenized for the models once, not once per model
    // distinct: a duplicate-id docs frame must not multiply feature rows
    // through the join (docFeatures already collapses to one row per
    // (id, bucket), and the raw counts must stay join-shape-independent)
    val flags = docs.filter(isTarget).select(col(id).as("id"), lit(true).as("is_tgt")).distinct()
    val perBucket = feat
      .join(flags, Seq("id"), "left_outer") // AQE broadcasts when small
      .groupBy(col("bucket"))
      .agg(
        sum(col("tf")).as("cr"),
        sum(when(col("is_tgt"), col("tf")).otherwise(lit(0L))).as("ct")
      )
    val totals = perBucket.agg(sum(col("cr")).as("totr"), sum(col("ct")).as("tott"))
    // per-bucket smoothed log-ratio, rounded to integer micro-nats BEFORE
    // the per-doc sum — the one float step, on a 4096-row model table
    val ratio = perBucket
      .crossJoin(broadcast(totals))
      .select(
        col("bucket"),
        round(
          lit(1e6) * (
            log((col("ct") + lit(1.0)) / (col("tott") + lit(Buckets.toDouble))) -
              log((col("cr") + lit(1.0)) / (col("totr") + lit(Buckets.toDouble)))
          )
        ).cast("long").as("ratio_micro")
      )
    val weights = feat
      .join(broadcast(ratio), "bucket")
      .groupBy(col("id"))
      .agg(sum(col("tf") * col("ratio_micro")).as("weight_micro"))
    docs.select(col(id).as("id")).filter(col("id").isNotNull)
      .join(weights, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("weight_micro"), lit(0L)).as("weight_micro"))
  }

  /** Gumbel-top-k importance resampling: score = weight + Gumbel(0,1) in
    * micro-nats, deterministic per id, top `k` kept. Output:
    * (id, weight_micro, score_micro, rank), rank 1-based by score desc
    * (ties → smallest id).
    */
  def resample(
      docs: DataFrame,
      id: String,
      text: String,
      isTarget: Column,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (id·M) mod m computed as ((id mod m)·(M mod m)) mod m — identical
    // value (modular congruence), but the intermediate stays ≤ m² ≈ 10^12:
    // the direct product overflows long for ids ≥ ~3.5·10^9, which real
    // corpora (and the 10× scale rehearsal's offset id domains) do reach
    val u = (pmod(pmod(col("id"), lit(KnuthMod)) * lit(KnuthMult % KnuthMod), lit(KnuthMod))
      .cast("double") + lit(0.5)) / lit(KnuthMod.toDouble)
    val gumbel = round(lit(-1e6) * log(-log(u))).cast("long")
    val scored = importanceWeights(docs, id, text, isTarget)
      .select(col("id"), col("weight_micro"), (col("weight_micro") + gumbel).as("score_micro"))
    // distributed TakeOrdered for the k survivors; the rank window then
    // runs over k rows, not the corpus
    val top = scored.orderBy(col("score_micro").desc, col("id")).limit(k)
    top.withColumn(
      "rank",
      row_number().over(Window.orderBy(col("score_micro").desc, col("id"))).cast("long")
    )
  }
}
