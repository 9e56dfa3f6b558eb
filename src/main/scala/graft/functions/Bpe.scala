package graft.functions

import scala.collection.mutable

import graft.expr.{BpeEncodeExpr, TextPrimitives}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed frequency counting, driver-side
  * merge learning, broadcast-free codegen'd encoding.
  *
  * Public-knowledge algorithm (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — ACL; the
  * word-type formulation every open BPE trainer uses).
  *
  * Scale split — what runs where, and why it holds at 100 TB:
  *
  *  - The CORPUS pass is one Spark scan: tokenize (the pinned
  *    [[TextPrimitives]] whitespace class) → `groupBy(word).count` with
  *    map-side combine. The exchange carries word TYPES (vocabulary-sized,
  *    Heaps'-law sublinear), never corpus tokens.
  *  - Merge learning runs on the driver over the word-TYPE table (capped at
  *    [[Bpe.Config.maxTypes]] by count — the standard trainer shape: BPE
  *    statistics are weighted by type count, so dropping the long tail of
  *    singleton types changes pair counts by at most their summed mass).
  *    The loop keeps a pair→types inverted index so each merge touches only
  *    the types containing that pair, not the whole table.
  *  - Encoding ships the learned ranks INSIDE a native expression
  *    ([[graft.expr.BpeEncodeExpr]], real `doGenCode`): per-task rank map +
  *    per-task word→tokens memo, zero shuffles, stays inside
  *    WholeStageCodegen. No Python, no UDF registry, no driver round-trips.
  */
object Bpe {

  /** End-of-word marker appended to each word's final symbol (Sennrich's
    * `</w>` convention) so merges cannot cross word boundaries and
    * detokenization is unambiguous.
    */
  val EndOfWord = "</w>"

  final case class Config(
      numMerges: Int = 200,
      maxTypes: Int = 100000,
      minPairCount: Long = 2L
  )

  /** Ordered merge rules; rank = position. */
  final case class Merges(pairs: Vector[(String, String)]) {
    def size: Int = pairs.size
  }

  /** Learn `cfg.numMerges` merges from `df(textCol)`. One corpus scan; the
    * driver loop is bounded by `maxTypes` word types.
    */
  def train(df: DataFrame, textCol: String, cfg: Config = Config()): Merges = {
    val spark = df.sparkSession
    import spark.implicits._
    // corpus scan: word-type counts, top maxTypes by (count desc, word asc)
    // — deterministic cap
    val types: Array[(String, Long)] = df
      .select(explode(split(trim(col(textCol)), TextPrimitives.WsPlus)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(cfg.maxTypes)
      .as[(String, Long)]
      .collect()
    learnMerges(types, cfg)
  }

  /** The driver-side merge loop, factored for the differential spec. */
  private[graft] def learnMerges(types: Array[(String, Long)], cfg: Config): Merges = {
    // symbol sequences per type: code-point chars, last carries EndOfWord
    val seqs: Array[mutable.ArrayBuffer[String]] = types.map { case (w, _) =>
      val syms = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      if (syms.nonEmpty) syms(syms.length - 1) = syms.last + EndOfWord
      syms
    }
    val counts = types.map(_._2)

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairTypes = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addType(ti: Int, sign: Long): Unit = {
      val s = seqs(ti)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val nc = pairCount.getOrElse(p, 0L) + sign * counts(ti)
        if (nc == 0L) pairCount.remove(p) else pairCount(p) = nc
        if (sign > 0) pairTypes.getOrElseUpdate(p, mutable.BitSet.empty) += ti
        i += 1
      }
    }
    seqs.indices.foreach(addType(_, 1L))

    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < cfg.numMerges && !done) {
      // most frequent pair; ties break lexicographically for determinism
      var best: (String, String) = null
      var bestC = cfg.minPairCount - 1
      pairCount.foreach { case (p, c) =>
        if (
          c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))
        ) { best = p; bestC = c }
      }
      if (best == null) done = true
      else {
        merges += best
        val merged = best._1 + best._2
        val affected = pairTypes.getOrElse(best, mutable.BitSet.empty).toArray
        affected.foreach { ti =>
          val s = seqs(ti)
          if (s.length > 1) {
            addType(ti, -1L) // retract this type's old pair mass
            var i = 0
            while (i < s.length - 1) {
              if (s(i) == best._1 && s(i + 1) == best._2) {
                s(i) = merged
                s.remove(i + 1)
                // do not advance: "aaa" with merge (a,a) → ("aa", a), and the
                // new symbol may pair with the next occurrence left-to-right
              } else i += 1
            }
            addType(ti, 1L)
          }
        }
        pairCount.remove(best)
        pairTypes.remove(best)
        m += 1
      }
    }
    Merges(merges.result())
  }

  /** Encode `text` to an `array<string>` of BPE tokens (codegen'd native
    * expression; `EndOfWord` marks word finals).
    */
  def encode(text: Column, merges: Merges): Column =
    GraftColumnBridge.column(
      BpeEncodeExpr(GraftColumnBridge.expression(text), merges.pairs)
    )

  /** Per-row token count under the learned vocabulary. */
  def tokenCount(text: Column, merges: Merges): Column =
    size(encode(text, merges)).cast("long")

  /** Reverse of [[encode]]: strip markers, re-join words. */
  def decode(tokens: Seq[String]): String = {
    val sb = new StringBuilder
    val word = new StringBuilder
    tokens.foreach { t =>
      if (t.endsWith(EndOfWord)) {
        word.append(t.dropRight(EndOfWord.length))
        if (sb.nonEmpty) sb.append(' ')
        sb.append(word)
        word.clear()
      } else word.append(t)
    }
    if (word.nonEmpty) {
      if (sb.nonEmpty) sb.append(' ')
      sb.append(word)
    }
    sb.toString
  }
}
