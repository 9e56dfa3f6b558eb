package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style hashed linear classifier INFERENCE over a text column —
  * the standard "model-based quality filter" stage of an LLM curation
  * pipeline (CCNet / LLaMA-style pipelines score every document with a
  * linear bag-of-ngrams model and gate on the score).
  *
  * Model shape (public knowledge: Joulin et al. 2016 "Bag of Tricks for
  * Efficient Text Classification"; Weinberger et al. 2009 hashing trick):
  * features are unigrams + bigrams of the whitespace tokens, each feature
  * hashes into one of `buckets` weight slots, and the document score is the
  * sum of its features' weights (a dim-1 fastText, i.e. a hashed linear
  * model). Weights here are a deterministic pseudo-model derived from the
  * bucket id by a Knuth multiplicative mix — the *shape* (hash → slot →
  * integer-weight sum → threshold gate) is exactly production inference;
  * swapping in trained weights is an `element_at` on a literal array.
  *
  * Integer micro-unit weights make the per-document sum order-free
  * (integer addition is exactly associative), so the engine and the DuckDB
  * oracle agree bit-for-bit regardless of aggregation order — the same
  * discipline as [[LanguageModel.unigramSurprisal]].
  *
  * SCALE: one projection over the corpus — tokenize, expand bigrams, fold
  * the weight sum per row with `aggregate` (no explode, no shuffle, no
  * join). At 100 TB this is a single embarrassingly-parallel scan; the
  * model itself is O(buckets) and lives in the plan (or a broadcast
  * literal array for trained weights), never in a join.
  *
  * Two twins, the repo's established portable/production split:
  *   - [[scorePortable]] buckets by md5 (engine-portable → DuckDB oracle
  *     rebuilds identical buckets; excluded from timing);
  *   - [[score]] buckets by xxhash64 (the production hash; timed).
  */
object Classifier {

  /** Knuth multiplicative constant (public: TAOCP vol. 3 §6.4). */
  private val KnuthMult = 2654435761L

  /** Weight range half-width in micro-units: weights lie in [-1e6, 1e6]. */
  private val WMod = 2000001L

  /** Non-empty lowercased whitespace tokens — `list_filter(
    * regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0)`,
    * the pinned-class tokenizer shared with the dedup/LM oracles.
    */
  private def toks(text: Column): Column =
    filter(TextFunctions.tokens(lower(text)), t => length(t) > 0)

  /** Unigrams ++ bigrams ("a b") of `ts`, bag semantics (duplicates kept —
    * a repeated phrase contributes its weight once per occurrence, exactly
    * the fastText input representation).
    */
  private def features(ts: Column): Column = {
    val bigrams = when(
      size(ts) >= 2,
      zip_with(
        slice(ts, lit(1), size(ts) - 1),
        slice(ts, lit(2), size(ts) - 1),
        (a, b) => concat(a, lit(" "), b))
    ).otherwise(array().cast("array<string>"))
    concat(ts, bigrams)
  }

  /** Deterministic micro-unit weight of a bucket id: Knuth-mix into
    * [-1e6, 1e6]. `bucket` is non-negative so `%` ≡ `pmod` — the oracle
    * spells the identical arithmetic.
    */
  private def weightOf(bucket: Column): Column =
    (bucket * lit(KnuthMult)) % lit(WMod) - lit(1000000L)

  private def scoreWith(
      docs: DataFrame,
      id: Column,
      text: Column,
      buckets: Int,
      bucketOf: Column => Column
  ): DataFrame = {
    val ts = toks(text)
    docs
      .select(id.as("doc_id"), features(ts).as("__f"))
      .select(
        col("doc_id"),
        size(col("__f")).cast("long").as("n_feats"),
        aggregate(
          col("__f"),
          lit(0L),
          (acc, f) => acc + weightOf(bucketOf(f))
        ).as("score_micro")
      )
      .withColumn("keep", col("score_micro") >= 0)
  }

  /** Production inference: xxhash64 feature buckets. One shuffle-free scan. */
  def score(docs: DataFrame, id: Column, text: Column, buckets: Int = 4096): DataFrame =
    scoreWith(docs, id, text, buckets, f => pmod(xxhash64(f), lit(buckets.toLong)))

  /** Engine-portable twin: bucket = first 12 md5 hex chars (48 bits) mod
    * `buckets` — DuckDB computes the same slot via
    * `('0x' || substr(md5(f), 1, 12))::BIGINT % buckets`. Grading only.
    */
  def scorePortable(docs: DataFrame, id: Column, text: Column, buckets: Int = 4096): DataFrame =
    scoreWith(
      docs, id, text, buckets,
      f => pmod(conv(substring(md5(f), 1, 12), 16, 10).cast("long"), lit(buckets.toLong)))
}
