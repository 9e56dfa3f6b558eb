package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The C4 heuristic cleaning signals (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning with a Unified Text-to-Text Transformer",
  * §2.2, public arXiv:1910.10683) in ONE pass over the text — line-level
  * edit counts plus the page-level drop signals:
  *
  *   - `n_lines`; `terminal_lines` — lines ending in terminal punctuation
  *     (`[.!?"]\s*$`, C4's "period, exclamation mark, question mark, or
  *     end quotation mark" rule); `short_lines` — lines with < 3
  *     whitespace words; `js_lines` — lines containing the word
  *     "javascript" (ASCII-case-insensitive, word-bounded);
  *   - `sentence_marks` — '.', '!', '?' characters (the ≥ 5-sentence page
  *     rule's portable approximation);
  *   - `lorem_hits` — occurrences of "lorem ipsum" (case-insensitive);
  *     `brace_hits` — '{' characters (C4's code-page signal).
  *
  * All counts are integers; the page-level verdict is taken outside from
  * the struct. Null text → null struct. Regex semantics are Java's —
  * exactly what `rlike` would evaluate — and every pattern used is
  * RE2-compatible so the DuckDB oracle replays it.
  */
case class C4Signals(child: Expression) extends UnaryExpression with NativeKernelCodegen {

  override def dataType: DataType = StructType(
    Seq(
      "n_lines",
      "terminal_lines",
      "short_lines",
      "js_lines",
      "sentence_marks",
      "lorem_hits",
      "brace_hits"
    ).map(StructField(_, LongType, nullable = false))
  )

  override def kernel(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val v = C4Signals.compute(text, text.split("\n", -1))
    InternalRow(v(0), v(1), v(2), v(3), v(4), v(5), v(6))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object C4Signals {

  // \z, not $: Java's $ also matches before a final U+0085/U+2028/U+2029
  // line terminator, which RE2's $ (what the oracle evaluates) does not.
  // Whitespace spelled as TextPrimitives.WsClass, not \s: Java's \s admits
  // U+000B, RE2's (the oracle's) does not.
  @transient private lazy val terminalRe =
    java.util.regex.Pattern.compile("[.!?\"]" + TextPrimitives.WsClass + "*\\z")
  // ASCII case classes, not (?i): Java's (?i) folds ASCII only while RE2's
  // applies Unicode simple folding (U+017F matches 's') — spelled-out
  // classes behave identically in both engines
  @transient private lazy val jsRe =
    java.util.regex.Pattern.compile("\\b[jJ][aA][vV][aA][sS][cC][rR][iI][pP][tT]\\b")
  @transient private lazy val loremRe =
    java.util.regex.Pattern.compile("[lL][oO][rR][eE][mM] [iI][pP][sS][uU][mM]")

  /** Exactly RE2's \\s = [ \\t\\n\\f\\r] ([[TextPrimitives.isWs]]) — the
    * class every other operator tokenizes with — NOT Java's \\s (which adds
    * U+000B and would diverge from the RE2-backed oracle on vertical-tab
    * text) and NOT Character.isWhitespace (which admits the U+001C-U+001F
    * separators).
    */
  private def isSpace(c: Char): Boolean = TextPrimitives.isWs(c)

  private def wordCount(line: String): Int = {
    var n = 0
    var inWord = false
    var i = 0
    while (i < line.length) {
      val ws = isSpace(line.charAt(i))
      if (!ws && !inWord) { n += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    n
  }

  /** The 7 signal values, from pre-split lines so the fused
    * [[QualitySignals]] shares one line split across all three gates.
    */
  private[expr] def compute(text: String, lines: Array[String]): Array[Long] = {
    var terminal = 0L
    var short = 0L
    var js = 0L
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (terminalRe.matcher(l).find()) terminal += 1
      if (wordCount(l) < 3) short += 1
      if (jsRe.matcher(l).find()) js += 1
      i += 1
    }
    var marks = 0L
    var braces = 0L
    i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') marks += 1
      if (c == '{') braces += 1
      i += 1
    }
    var lorem = 0L
    val m = loremRe.matcher(text)
    while (m.find()) lorem += 1
    Array(lines.length.toLong, terminal, short, js, marks, lorem, braces)
  }
}
