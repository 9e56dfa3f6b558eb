package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All Gopher repetition signals (Rae et al. 2021 §A1.1.2) in ONE pass over
  * the text — the native form of `QualityRules.repetition`'s sorted-array
  * run-length formulation, which (like every higher-order-function chain —
  * see [[WordShingles]] and BENCH history) evaluates interpreted and
  * dominated the bench at 18.8 s for sf0.1's 50 k docs.
  *
  * Semantics are IDENTICAL to the declarative version (the DuckDB oracle
  * replays them):
  *   - lines = split on '\n' (trailing empties kept), paras = split on
  *     '\n{2,}', words via [[TextPrimitives]] (SQL-exact trim + split);
  *   - dup counts = occurrences beyond each distinct value's first;
  *   - dup chars = the code-point length mass of those extra occurrences
  *     (code points, matching SQL `length` in both engines);
  *   - topN chars = max over REPEATED (≥ 2 occurrences) word n-grams of
  *     count × gram length; all-unique grams score 0.
  *
  * Output struct (all LongType): n_chars_t, n_lines, dup_lines,
  * dup_line_chars, n_paras, dup_paras, dup_para_chars, top2_chars,
  * top3_chars. Null text → null struct.
  */
case class RepetitionSignals(child: Expression) extends UnaryExpression with NativeKernelCodegen {

  override def dataType: DataType = StructType(
    Seq(
      "n_chars_t",
      "n_lines",
      "dup_lines",
      "dup_line_chars",
      "n_paras",
      "dup_paras",
      "dup_para_chars",
      "top2_chars",
      "top3_chars"
    ).map(StructField(_, LongType, nullable = false))
  )

  override def kernel(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val v = RepetitionSignals.compute(text, TextPrimitives.tokens(text), text.split("\n", -1))
    InternalRow(v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7), v(8))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionSignals {

  /** (extra occurrences, their code-point char mass) over an array. */
  private def dupStats(values: Array[String]): (Long, Long) = {
    val seen = new java.util.HashSet[String](values.length * 2)
    var dups = 0L
    var chars = 0L
    var i = 0
    while (i < values.length) {
      if (!seen.add(values(i))) { dups += 1; chars += TextPrimitives.cpLen(values(i)) }
      i += 1
    }
    (dups, chars)
  }

  /** max over grams with count ≥ 2 of count × gram code-point length. */
  private def topGramChars(tokens: Array[String], n: Int): Long = {
    if (tokens.length < n) return 0L
    val counts = new java.util.HashMap[String, Int](tokens.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= tokens.length) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      counts.merge(sb.toString, 1, Integer.sum)
      i += 1
    }
    var best = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.toLong
      if (c >= 2) {
        val chars = c * TextPrimitives.cpLen(e.getKey)
        if (chars > best) best = chars
      }
    }
    best
  }

  /** The 9 signal values, from pre-split tokens/lines so the fused
    * [[QualitySignals]] shares one tokenization across all three gates
    * (paragraphs are split here — no other gate needs them).
    */
  private[expr] def compute(
      text: String,
      tokens: Array[String],
      lines: Array[String]
  ): Array[Long] = {
    val paras = text.split("\n{2,}", -1)
    val (dupLines, dupLineChars) = dupStats(lines)
    val (dupParas, dupParaChars) = dupStats(paras)
    Array(
      TextPrimitives.cpLen(text),
      lines.length.toLong,
      dupLines,
      dupLineChars,
      paras.length.toLong,
      dupParas,
      dupParaChars,
      topGramChars(tokens, 2),
      topGramChars(tokens, 3)
    )
  }
}
