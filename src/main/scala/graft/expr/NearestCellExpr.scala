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

  // Hoisted loop invariants — the assignment loop is the O(n·cells·dim)
  // arithmetic that dominates SemDeDup at AutoNlists (cells ∝ corpus), so
  // constant factors here ARE the scale curve. All three hoists reproduce
  // the inline accumulation bit-for-bit:
  //  * centroid partial norms `Σ y²` accumulated in index order per
  //    centroid once (same adds, same order as the inline `nb` loop), but
  //    only up to each possible truncation length n = min(|v|, |centroid|):
  //    norms are prefix sums, so `normPrefix(c)(n)` is exactly the inline
  //    value for any input length;
  //  * the query vector is unpacked from ArrayData ONCE per row (the
  //    virtual getFloat/getDouble per element per centroid was ~2× of the
  //    loop) — the unpacked doubles are the identical values;
  //  * the query norm `Σ x²` does not depend on the centroid, but its
  //    truncated length does — computed as a prefix too.
  @transient private lazy val normPrefix: Array[Array[Double]] =
    cents.map { ct =>
      val p = new Array[Double](ct.length + 1)
      var nb = 0.0
      var i = 0
      while (i < ct.length) { nb += ct(i) * ct(i); p(i + 1) = nb; i += 1 }
      p
    }

  override def kernel(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vn = v.numElements()
    val x = new Array[Double](vn)
    val xNormPrefix = new Array[Double](vn + 1)
    var na = 0.0
    var i = 0
    while (i < vn) {
      val xi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      x(i) = xi
      na += xi * xi
      xNormPrefix(i + 1) = na
      i += 1
    }
    var bestSim = 0.0
    var bestCell = 0L
    var first = true
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val n = math.min(vn, ct.length)
      var dot = 0.0
      i = 0
      while (i < n) {
        dot += x(i) * ct(i)
        i += 1
      }
      val sim = dot / (math.sqrt(xNormPrefix(n)) * math.sqrt(normPrefix(c)(n)))
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
