package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Within-cell cosine verify for the bucketed embedding-dedup family:
  * input is one cell's members `array<struct<id:bigint, v:array<float|
  * double>>>`, output the verified near-dup pairs
  * `array<struct<id_a, id_b, cos>>` — every unordered member pair with
  * `id_a < id_b` (by value, the [[graft.dedup.Dedup]] `bucketPairs`
  * canonical order) whose cosine clears `threshold`.
  *
  * Why this exists: the join-based verify materializes ONE ROW PER
  * CANDIDATE PAIR carrying BOTH vectors — at a ~512-member cell that is
  * occupancy²/2 pair rows × 2 × dim floats through two shuffling joins,
  * measured as 26 GB of pair-expanded vectors for a 50 k × 256-dim corpus
  * whose verified survivors were 4 k rows. Here the only shuffle is the
  * grouped corpus itself (each vector crosses the wire once, inside its
  * cell's `collect_list`), the pair space never leaves the expression, and
  * only survivors materialize. Shuffle volume is corpus-linear at any
  * duplication rate — the property the 100 TB plan needs.
  *
  * Arithmetic is bit-for-bit [[VectorBinaryOp]] `Cosine` (spec-asserted):
  * dot/na/nb accumulated in index order over `n = min(|a|,|b|)`,
  * `sim = dot/(sqrt(na)·sqrt(nb))`. Full-vector norms are hoisted once per
  * member (a norm over `n` elements is the n-prefix of the full
  * accumulation, so equal-length pairs — the whole corpus in practice —
  * reuse them exactly); ragged pairs fall back to the inline three-sum
  * loop. A NaN cosine (zero vector) fails `>= threshold` like the join
  * path's null/NaN filter; members with a null vector pair to null cosine
  * there, so here they are skipped. Equal ids never pair (`id_a < id_b`
  * is strict in both paths).
  */
case class CellPairsCosineKernel(child: Expression, threshold: Double)
    extends UnaryExpression
    with NativeKernelCodegen {

  private def memberStruct: Option[(DataType, Boolean)] = child.dataType match {
    case ArrayType(StructType(Array(idF, vF)), _) if idF.dataType == LongType =>
      vF.dataType match {
        case ArrayType(et @ (FloatType | DoubleType), _) => Some((et, et == FloatType))
        case _                                           => None
      }
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (memberStruct.isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cell_pairs_cosine expects array<struct<bigint, array<float|double>>>, got ${child.dataType}"
      )

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("id_a", LongType, nullable = false),
        StructField("id_b", LongType, nullable = false),
        StructField("cos", DoubleType, nullable = false)
      )
    ),
    containsNull = false
  )

  @transient private lazy val isFloat = memberStruct.exists(_._2)

  override def kernel(input: Any): Any = {
    val cell = input.asInstanceOf[ArrayData]
    val m = cell.numElements()
    // unpack once: virtual ArrayData getters in the O(m²·dim) pair loop
    // would dominate (the NearestCellKernel lesson)
    val ids = new Array[Long](m)
    val vecs = new Array[Array[Double]](m)
    val norms = new Array[Double](m)
    var i = 0
    while (i < m) {
      val row = cell.getStruct(i, 2)
      ids(i) = row.getLong(0)
      if (!row.isNullAt(1)) {
        val a = row.getArray(1)
        val n = a.numElements()
        val v = new Array[Double](n)
        var na = 0.0
        var k = 0
        while (k < n) {
          val x = if (isFloat) a.getFloat(k).toDouble else a.getDouble(k)
          v(k) = x
          na += x * x
          k += 1
        }
        vecs(i) = v
        norms(i) = na
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    i = 0
    while (i < m) {
      val vi = vecs(i)
      if (vi != null) {
        var j = i + 1
        while (j < m) {
          val vj = vecs(j)
          if (vj != null && ids(i) != ids(j)) {
            var dot = 0.0
            var na = 0.0
            var nb = 0.0
            if (vi.length == vj.length) {
              var k = 0
              while (k < vi.length) { dot += vi(k) * vj(k); k += 1 }
              na = norms(i); nb = norms(j)
            } else {
              val n = math.min(vi.length, vj.length)
              var k = 0
              while (k < n) {
                dot += vi(k) * vj(k); na += vi(k) * vi(k); nb += vj(k) * vj(k)
                k += 1
              }
            }
            val cos = dot / (math.sqrt(na) * math.sqrt(nb))
            if (cos >= threshold) {
              val (a, b) = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
              val r = new GenericInternalRow(3)
              r.setLong(0, a)
              r.setLong(1, b)
              r.setDouble(2, cos)
              out += r
            }
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
