package graft

import graft.expr.{SquashMeta, VectorBinaryOp, VectorOp, VectorSumAgg}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` installer: exposes the engine's native
  * expressions to the SQL surface, so
  * `spark.sql("SELECT vec_cosine(a, b) ...")` works next to the Scala API.
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        info("vec_dot", "vec_dot(a, b) - double dot product of two float/double arrays"),
        (args: Seq[Expression]) => VectorBinaryOp(args(0), args(1), VectorOp.Dot)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("vec_cosine"),
        info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float/double arrays"),
        (args: Seq[Expression]) => VectorBinaryOp(args(0), args(1), VectorOp.Cosine)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("vec_l2sq"),
        info("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance of two float/double arrays"),
        (args: Seq[Expression]) => VectorBinaryOp(args(0), args(1), VectorOp.L2Sq)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("vec_sum"),
        info("vec_sum", "vec_sum(v) - element-wise sum aggregate over float/double arrays"),
        (args: Seq[Expression]) => VectorSumAgg(args(0)).toAggregateExpression()
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("word_shingles"),
        info(
          "word_shingles",
          "word_shingles(text, n) - distinct word n-gram shingles (single pass); n must be a literal"
        ),
        (args: Seq[Expression]) => {
          // validate before eval(): a non-foldable second arg (a column) or a
          // non-numeric literal would otherwise fail at plan time with an
          // opaque unresolved-eval/ClassCastException instead of the
          // documented contract
          val n = args(1)
          if (!n.foldable)
            throw new org.apache.spark.sql.AnalysisException(
              "USER_RAISED_EXCEPTION",
              Map("errorMessage" -> "word_shingles(text, n): n must be a literal")
            )
          n.eval() match {
            case num: Number => graft.expr.WordShingles(args(0), num.intValue())
            case other =>
              throw new org.apache.spark.sql.AnalysisException(
                "USER_RAISED_EXCEPTION",
                Map(
                  "errorMessage" ->
                    s"word_shingles(text, n): n must be a numeric literal, got $other"
                )
              )
          }
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("squash_meta"),
        info(
          "squash_meta",
          "squash_meta(lineage) - fold array<struct<table,pk,value>> into {table→{pk→sorted distinct values}}"
        ),
        (args: Seq[Expression]) => SquashMeta(args(0))
      )
    )
  }
}
