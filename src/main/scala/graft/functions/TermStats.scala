package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term statistics: per-document term frequencies joined with global
  * document frequencies — the integer-valued core of a TF-IDF model (the
  * `df` table IS the IDF model; downstream weighting is a scalar map over
  * it, kept out of the engine so results stay engine-portable integers).
  *
  * Scale shape: one shuffle on (doc, term), one on term, top-k per doc via
  * a window over the (already-shuffled) doc key. The document-frequency
  * aggregate is map-side combinable; no collect, no vocabulary broadcast.
  */
object TermStats {

  /** Repetition quality signals (the published repetition filters, word
    * granularity): duplicate-word fraction and the share of all bigram
    * occurrences held by the doc's most frequent bigram. Bigrams are built
    * relationally — `posexplode` + `lead` over the doc-ordered window — so
    * the stage stays in codegen; docs with fewer than two tokens drop out.
    * Output: (id, dup_word_milli, top_bigram_milli).
    */
  def repetition(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = docs.select(
      col(id).as("id"),
      posexplode(TextFunctions.tokens(lower(col(text))))
    ).toDF("id", "pos", "w")
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val bigrams = toks
      .withColumn("w2", lead(col("w"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("id"), concat_ws(" ", col("w"), col("w2")).as("bg"))
    val per = bigrams
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("id")).agg(max(col("c")).as("mx"), sum(col("c")).as("tot"))
    docs
      .select(col(id).as("id"), TextFunctions.dupWordFractionC(lower(col(text))).as("dup_word_milli"))
      .join(per, Seq("id"))
      .select(
        col("id"),
        col("dup_word_milli"),
        round(lit(1000.0) * col("mx") / col("tot")).cast("long").as("top_bigram_milli")
      )
  }

  /** Top-`k` terms per document by term frequency (ties broken
    * lexicographically), each with its corpus document frequency.
    * Output: (id, term, tf, df).
    */
  def topTerms(docs: DataFrame, id: String, text: String, k: Int): DataFrame = {
    val toks = docs.select(
      col(id).as("id"),
      explode(TextFunctions.tokens(lower(col(text)))).as("term")
    )
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("tf").desc, col("term"))
    tf.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .join(dfreq, "term")
      .select(col("id"), col("term"), col("tf"), col("df"))
  }
}
