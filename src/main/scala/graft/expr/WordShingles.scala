package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column in ONE pass.
  *
  * Semantics match the declarative formulation
  * `array_distinct(transform(sequence(0, greatest(size(tokens)-n, 0)),
  * i -> concat_ws(" ", slice(tokens, i+1, n))))` over whitespace tokens —
  * including the degenerate cases (short text ⇒ one shingle of all tokens;
  * empty text ⇒ [""] like Spark's `split`). That HOF chain evaluates
  * interpreted and dominated the MinHash/fingerprint pipelines (~75% of
  * runtime, see BENCH history); this is a single tokenize + windowed join +
  * hash-set dedup.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression
    with NativeKernelCodegen {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def kernel(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // SQL-exact trim (spaces only) via TextPrimitives policy; keep the
    // [""] degenerate form for empty text, like Spark's split
    val trimmed = TextPrimitives.sqlTrim(text)
    val tokens = trimmed.split(TextPrimitives.WsPlus)
    val upper = math.max(tokens.length - n, 0)
    // LinkedHashSet dedups in first-seen order; the non-distinct form
    // (diversity metrics count OCCURRENCES) keeps every window
    val seen: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String](math.max(8, upper * 2))
      else new java.util.ArrayList[String](upper + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= upper) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + n, tokens.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
