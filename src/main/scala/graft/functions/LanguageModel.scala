package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistical quality scoring: unigram language-model surprisal —
  * the in-engine degenerate of the CCNet-style perplexity filter (Wenzek et
  * al. 2020 rank Common Crawl paragraphs by KenLM perplexity; a unigram
  * model needs no external artifact and already separates natural prose
  * from keyboard-mash and boilerplate).
  *
  * Scale shape: the model IS a (term, count) aggregate — one map-side
  * combinable shuffle at vocabulary cardinality, not corpus cardinality;
  * the corpus total is a 1-row broadcast. Scoring joins per-document term
  * counts against the model on the term key (AQE broadcasts the model when
  * it is small; a 100 TB-corpus vocabulary shuffles — still vocab-sized).
  * Per-(doc, term) surprisal is rounded to integer micro-nats before the
  * per-document reduction, so the cross-engine compare stays exact: floats
  * never cross an aggregation boundary.
  */
object LanguageModel {

  /** Per-document total and mean unigram surprisal, in micro-nats
    * (`round(1e6 * tf * ln(total_tokens / corpus_tf))` summed over the
    * document's terms) and milli-nats-per-token respectively. Rare-term-heavy
    * documents score HIGH (surprising ≈ unnatural under the corpus model);
    * the model is self-trained on the scored corpus, the standard
    * quality-filter setup.
    * Output: (id, dl, surprisal_micro, mean_milli).
    */
  def unigramSurprisal(docs: DataFrame, id: String, text: String): DataFrame = {
    val tf = docs
      .select(col(id).as("id"), explode(TextFunctions.tokens(lower(col(text)))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val model = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val total = model.agg(sum(col("cf")).as("total"))
    val scored = tf
      .join(model, "term")
      .crossJoin(broadcast(total))
      .select(
        col("id"),
        col("tf"),
        round(lit(1e6) * (col("tf") * log(col("total") / col("cf")))).cast("long").as("s_micro")
      )
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("dl"), sum(col("s_micro")).as("surprisal_micro"))
    scored.select(
      col("id"),
      col("dl"),
      col("surprisal_micro"),
      round(col("surprisal_micro") / (lit(1000.0) * col("dl"))).cast("long").as("mean_milli")
    )
  }

  /** Interpolated BIGRAM surprisal: per-token score
    * `−ln(λ·P(v|u) + (1−λ)·P(v))` with add-one smoothing over the observed
    * vocabulary — the next step up from [[unigramSurprisal]] toward CCNet's
    * n-gram LM scoring: bigram context catches word-salad text whose
    * unigram frequencies look perfectly natural. Both models are
    * self-trained on the scored corpus.
    *
    * Scale shape: bigrams are generated map-side (one `zip_with` of two
    * token-array slices, evaluated ONCE per row in its own projection —
    * never referenced per distance like the residual-IVF-PQ anti-pattern);
    * the bigram/context/unigram models are (key → count) aggregates joined
    * back on their keys — distributed shuffle joins, nothing driver-sized
    * except the 1-row totals. Per-(doc, bigram) scores round to integer
    * micro-nats BEFORE the per-doc sum, so the cross-engine reduction is
    * an order-free integer sum (the [[unigramSurprisal]] convention).
    * Output: (id, n_bigrams, surprisal_micro, mean_milli).
    */
  def bigramSurprisal(docs: DataFrame, id: String, text: String, lambda: Double = 0.5): DataFrame = {
    val toks = docs
      .select(col(id).as("id"), TextFunctions.tokens(lower(col(text))).as("toks"))
      .filter(size(col("toks")) >= 2)
    val bigrams = toks.select(
      col("id"),
      explode(
        zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat_ws(" ", a, b)
        )
      ).as("bg")
    )
    val tfB = bigrams.groupBy(col("id"), col("bg")).agg(count(lit(1)).as("tf"))
    val cUV = tfB.groupBy(col("bg")).agg(sum(col("tf")).as("cuv"))
    val cU = bigrams
      .select(element_at(split(col("bg"), " "), 1).as("u"))
      .groupBy(col("u"))
      .agg(count(lit(1)).as("cu"))
    val unis = docs
      .select(col(id).as("id"), explode(TextFunctions.tokens(lower(col(text)))).as("term"))
    val cV = unis.groupBy(col("term")).agg(count(lit(1)).as("cv"))
    val totals = cV.agg(sum(col("cv")).as("t"), count(lit(1)).as("vocab"))
    val pb = (col("cuv") + lit(1.0)) / (col("cu") + col("vocab"))
    val pu = (col("cv") + lit(1.0)) / (col("t") + col("vocab"))
    val scored = tfB
      .join(cUV, "bg")
      .join(cU, element_at(split(col("bg"), " "), 1) === col("u"))
      .join(cV, element_at(split(col("bg"), " "), 2) === col("term"))
      .crossJoin(broadcast(totals))
      .select(
        col("id"),
        col("tf"),
        round(lit(1e6) * (col("tf") * (lit(0.0) - log(lit(lambda) * pb + lit(1.0 - lambda) * pu))))
          .cast("long").as("s_micro")
      )
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_bigrams"), sum(col("s_micro")).as("surprisal_micro"))
    scored.select(
      col("id"),
      col("n_bigrams"),
      col("surprisal_micro"),
      round(col("surprisal_micro") / (lit(1000.0) * col("n_bigrams"))).cast("long").as("mean_milli")
    )
  }

  /** CCNet-style head/middle/tail bucketing (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", §4.3, public arXiv:1911.00359): per LANGUAGE, split documents
    * into thirds by language-model score — head = best (lowest surprisal)
    * third, the standard coarse quality strata a curation pipeline then
    * samples from ([[Sampling]] quota/temperature ops compose directly).
    *
    * Thresholds are VALUE-based per-language tertiles (smallest score `v`
    * whose cumulative doc count reaches ⌈n/3⌉ / ⌈2n/3⌉): ties share a
    * bucket, the decision is pure integer comparison, and the cumulative
    * window runs over DISTINCT SCORE VALUES per language (the
    * [[CorpusStats]] trick), never a per-language row sort — so no
    * single-reducer stage at corpus scale; the per-language threshold
    * table is tiny and broadcast back onto the scored docs.
    *
    * Output: (id, lang, mean_milli, bucket ∈ head|middle|tail).
    */
  def perplexityBuckets(docs: DataFrame, id: String, text: String, lang: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = unigramSurprisal(docs, id, text)
      .join(docs.select(col(id).as("id"), col(lang).as("lang")), "id")
    val counts = scored
      .groupBy(col("lang"), col("mean_milli").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(Window.partitionBy(col("lang")).orderBy(col("v"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("lang"))))
    val thresholds = cum
      .groupBy(col("lang"))
      .agg(
        min(when(col("cum") >= floor((col("n") + 2) / lit(3L)), col("v"))).as("t1"),
        min(when(col("cum") >= floor((col("n") * 2 + 2) / lit(3L)), col("v"))).as("t2")
      )
    scored
      .join(broadcast(thresholds), "lang")
      .select(
        col("id"),
        col("lang"),
        col("mean_milli"),
        when(col("mean_milli") <= col("t1"), lit("head"))
          .when(col("mean_milli") <= col("t2"), lit("middle"))
          .otherwise(lit("tail"))
          .as("bucket")
      )
  }
}
