package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Nearest-centroid assignment with the codebook as a REFERENCE OBJECT
  * instead of plan literals.
  *
  * The literal form ([[graft.ann.Ann.nearestCell]]: `array_max` over one
  * `struct(cosine(v, lit(c)), -cell)` per centroid) inlines `nlists × dim`
  * doubles into the expression tree — ideal for model-sized codebooks
  * (16 × 64), but the generated method grows linearly with the model and
  * past ~10^4 inlined constants Janino's method-size limits push the whole
  * stage to interpreted per-row evaluation with boxing. SemDeDup at
  * AutoNlists hits exactly that: cells grow with the corpus
  * (ceil(n/512)), so a 50k-row × 256-dim corpus wants ~100 cells × 256
  * doubles — measured as the dominant cost of the sf-scaling rehearsal's
  * worst row before this expression existed.
  *
  * Here the codebook lives in a field; codegen emits ONE call to the
  * compiled [[kernel]] (constant code size at any nlists — the
  * [[NativeKernelCodegen]] shape, stage stays in WholeStageCodegen) and
  * the kernel runs the same argmax loop the literal form computes:
  * cosine accumulated in double over the elements in index order,
  * `n = min(|v|, |centroid|)` like [[VectorBinaryOp]], Spark double
  * ordering for the max (java.lang.Double.compare — NaN greatest), ties
  * to the SMALLEST cell id. Bit-for-bit equal to the literal plan
  * (spec-asserted), so the swap is invisible to the correctness gate.
  */
case class NearestCellKernel(
    child: Expression,
    cellIds: Seq[Long],
    centroids: Seq[Seq[Double]]
) extends UnaryExpression
    with NativeKernelCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell expects array<float|double>, got $other"
        )
    }

  @transient private lazy val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray
  @transient private lazy val ids: Array[Long] = cellIds.toArray
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def kernel(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vn = v.numElements()
    var bestSim = 0.0
    var bestCell = 0L
    var first = true
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val n = math.min(vn, ct.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val y = ct(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      val cmp = if (first) 1 else java.lang.Double.compare(sim, bestSim)
      if (cmp > 0 || (cmp == 0 && ids(c) < bestCell)) {
        bestSim = sim
        bestCell = ids(c)
      }
      first = false
      c += 1
    }
    bestCell
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
