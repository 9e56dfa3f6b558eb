package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL quality-gate signals — Gopher rules (Rae et al. 2021 §A1.1.1),
  * Gopher repetition (§A1.1.2) and C4 cleaning (Raffel et al. 2020 §2.2) —
  * in ONE pass over each document: the text is materialized, tokenized and
  * line-split exactly once, then the three gate kernels
  * ([[GopherSignals]]/[[RepetitionSignals]]/[[C4Signals]] companions) run
  * over the shared arrays. A real curation pipeline applies all three gates
  * together; as separate operators that is three corpus scans and three
  * tokenizations — fused, it is one scan and one tokenization, at scan
  * throughput.
  *
  * Field semantics are IDENTICAL to the standalone expressions (same
  * kernels); the shared `n_lines` is emitted once. Output struct (all
  * LongType, 22 fields): n_chars_t, n_lines, then the Gopher 7 (n_words,
  * word_chars, alpha_words, bullet_lines, ellipsis_lines, symbol_count,
  * stop_hits), the repetition 7 (dup_lines, dup_line_chars, n_paras,
  * dup_paras, dup_para_chars, top2_chars, top3_chars), the C4 6
  * (terminal_lines, short_lines, js_lines, sentence_marks, lorem_hits,
  * brace_hits). Null text → null struct.
  */
case class QualitySignals(child: Expression, stopwords: Seq[String])
    extends UnaryExpression
    with NativeKernelCodegen {

  override def dataType: DataType = QualitySignals.schema

  @transient private lazy val stopSet = GopherSignals.stopSet(stopwords)

  override def kernel(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val tokens = TextPrimitives.tokens(text)
    val lines = text.split("\n", -1)
    val g = GopherSignals.compute(text, tokens, lines, stopSet)
    val r = RepetitionSignals.compute(text, tokens, lines)
    val c = C4Signals.compute(text, lines)
    InternalRow(
      // shared
      r(0), // n_chars_t
      r(1), // n_lines (== g(3) == c(0))
      // gopher
      g(0), g(1), g(2), g(4), g(5), g(6), g(7),
      // repetition
      r(2), r(3), r(4), r(5), r(6), r(7), r(8),
      // c4
      c(1), c(2), c(3), c(4), c(5), c(6)
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualitySignals {

  val FieldNames: Seq[String] = Seq(
    "n_chars_t",
    "n_lines",
    "n_words",
    "word_chars",
    "alpha_words",
    "bullet_lines",
    "ellipsis_lines",
    "symbol_count",
    "stop_hits",
    "dup_lines",
    "dup_line_chars",
    "n_paras",
    "dup_paras",
    "dup_para_chars",
    "top2_chars",
    "top3_chars",
    "terminal_lines",
    "short_lines",
    "js_lines",
    "sentence_marks",
    "lorem_hits",
    "brace_hits"
  )

  val schema: StructType =
    StructType(FieldNames.map(StructField(_, LongType, nullable = false)))
}
