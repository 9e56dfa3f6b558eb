package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All Gopher rule signals (Rae et al. 2021 §A1.1.1) in ONE pass over the
  * text — the native form of `QualityRules.gopher`'s column formulation
  * (higher-order functions evaluate interpreted; see [[RepetitionSignals]]
  * and [[WordShingles]] for the same lesson and BENCH history).
  *
  * Semantics are IDENTICAL to the declarative version (the DuckDB oracle
  * replays them):
  *   - words/lengths via [[TextPrimitives]] (SQL-exact space-only trim,
  *     nonempty whitespace split, code-point lengths);
  *   - alpha_words = tokens containing an ASCII letter (`[A-Za-z]`);
  *   - lines = split on '\n' (trailing empties kept); bullet lines match
  *     `^\s*[-*•]`, ellipsis lines end with `(\.\.\.|…)\s*` at true
  *     end-of-line (Java `\z`, aligning with RE2's `$`);
  *   - symbol_count = '#' chars + '…' chars + non-overlapping
  *     left-to-right "..." occurrences (the replace-and-diff counting of
  *     the column version);
  *   - stop_hits = presence (not frequency) of each required stopword.
  *
  * Output struct (all LongType): n_words, word_chars, alpha_words,
  * n_lines, bullet_lines, ellipsis_lines, symbol_count, stop_hits.
  * Null text → null struct.
  */
case class GopherSignals(child: Expression, stopwords: Seq[String])
    extends UnaryExpression
    with NativeKernelCodegen {

  override def dataType: DataType = StructType(
    Seq(
      "n_words",
      "word_chars",
      "alpha_words",
      "n_lines",
      "bullet_lines",
      "ellipsis_lines",
      "symbol_count",
      "stop_hits"
    ).map(StructField(_, LongType, nullable = false))
  )

  @transient private lazy val stopSet = GopherSignals.stopSet(stopwords)

  override def kernel(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val v = GopherSignals.compute(
      text,
      TextPrimitives.tokens(text),
      text.split("\n", -1),
      stopSet
    )
    InternalRow(v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherSignals {

  // Whitespace spelled as TextPrimitives.WsClass, not \s: Java's \s admits
  // U+000B, RE2's (the oracle's) does not.
  @transient private lazy val bulletRe =
    java.util.regex.Pattern.compile("^" + TextPrimitives.WsClass + "*[-*•]")
  // \z, not $: Java's $ also matches before a final U+0085/U+2028/U+2029
  // line terminator, which RE2's $ (what the oracle evaluates) does not
  @transient private lazy val ellipsisRe =
    java.util.regex.Pattern.compile("(\\.\\.\\.|…)" + TextPrimitives.WsClass + "*\\z")

  private[expr] def stopSet(stopwords: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  private def countChar(s: String, c: Char): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) { if (s.charAt(i) == c) n += 1; i += 1 }
    n
  }

  /** Non-overlapping left-to-right occurrences, like replace-and-diff. */
  private def countSubstring(s: String, sub: String): Long = {
    var n = 0L
    var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }

  /** The 8 signal values, from pre-split tokens/lines so the fused
    * [[QualitySignals]] shares one tokenization across all three gates.
    */
  private[expr] def compute(
      text: String,
      tokens: Array[String],
      lines: Array[String],
      stopSet: java.util.HashSet[String]
  ): Array[Long] = {
    var wordChars = 0L
    var alphaWords = 0L
    val hits = new java.util.HashSet[String](stopSet.size * 2)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      wordChars += TextPrimitives.cpLen(t)
      var hasAlpha = false
      var j = 0
      while (!hasAlpha && j < t.length) {
        val c = t.charAt(j)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
        j += 1
      }
      if (hasAlpha) alphaWords += 1
      if (stopSet.contains(t)) hits.add(t)
      i += 1
    }
    var bulletLines = 0L
    var ellipsisLines = 0L
    i = 0
    while (i < lines.length) {
      if (bulletRe.matcher(lines(i)).find()) bulletLines += 1
      if (ellipsisRe.matcher(lines(i)).find()) ellipsisLines += 1
      i += 1
    }
    val symbolCount =
      countChar(text, '#') + countChar(text, '…') + countSubstring(text, "...")
    Array(
      tokens.length.toLong,
      wordChars,
      alphaWords,
      lines.length.toLong,
      bulletLines,
      ellipsisLines,
      symbolCount,
      hits.size().toLong
    )
  }
}
