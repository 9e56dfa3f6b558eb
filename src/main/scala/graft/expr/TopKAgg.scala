package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: per group, keep the k best `(score, id)`
  * pairs by `(score DESC, id ASC)` and return them as a sorted
  * `array<struct<score:double, id:bigint>>`.
  *
  * Rationale — why not a window: the idiomatic top-k-per-group
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC)` then
  * `WHERE rn <= k`) shuffles EVERY row of the corpus to its group's
  * partition and sorts it there, then throws all but k away. At 100 TB
  * that is a full-corpus exchange + sort to produce a result whose size is
  * `groups × k`. This aggregate runs through `ObjectHashAggregateExec`
  * with partial aggregation: each map task keeps one k-bounded heap per
  * group it sees, so the exchange carries at most
  * `groups × k × map_partitions` pairs — the result's size, not the
  * corpus's — and nothing is ever sorted but the k-element buffers.
  *
  * Ties break on the LOWEST id (deterministic for the hash-compare oracle:
  * `ORDER BY score DESC, id ASC`). Null scores/ids are skipped.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKAgg.Heap] {

  require(k >= 1, s"top_k requires k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("score", DoubleType, nullable = false),
        StructField("id", LongType, nullable = false)
      )
    ),
    containsNull = false
  )

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        TypeCheckResult.TypeCheckFailure(
          s"top_k expects (double, bigint), got ($s, $i); cast explicitly"
        )
    }

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buffer: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: TopKAgg.Heap, b2: TopKAgg.Heap): TopKAgg.Heap = {
    b2.foreach((s, i) => b1.offer(s, i))
    b1
  }

  override def eval(buffer: TopKAgg.Heap): Any = {
    val sorted = buffer.sortedDesc()
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): Any
    })
  }

  override def serialize(buffer: TopKAgg.Heap): Array[Byte] = {
    val n = buffer.size
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    buffer.foreach { (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKAgg.Heap(k)
    var j = 0
    while (j < n) { h.offer(bb.getDouble, bb.getLong); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): Expression = copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k"
}

object TopKAgg {

  /** k-bounded binary min-heap over `(score, id)` with "worst first" order:
    * the root is the entry that would be evicted next, i.e. the MINIMUM by
    * `(score ASC, id DESC)`. Flat primitive arrays — no boxing per element,
    * O(log k) offer, O(k) memory per group per map task.
    */
  final class Heap(k: Int) {
    private var scores = new Array[Double](math.min(k, 16))
    private var ids = new Array[Long](math.min(k, 16))
    private var n = 0

    def size: Int = n

    /** true iff (s1,i1) is WORSE than (s2,i2) under (score DESC, id ASC).
      * Total order via `java.lang.Double.compare` so NaN is well-behaved:
      * NaN compares greater than every other double, hence ranks FIRST
      * under score DESC — the same deterministic placement DuckDB gives
      * NaN in `ORDER BY score DESC`, keeping heap output oracle-exact
      * even for zero-norm cosine inputs. (`<`/`==` are both false for
      * NaN, which would let an admitted NaN entry evade eviction.)
      */
    @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c < 0 || (c == 0 && i1 > i2)
    }

    def offer(s0: Double, i: Long): Unit = {
      // Collapse -0.0 to +0.0: SQL comparison treats them as equal (ties
      // break on id), but Double.compare orders -0.0 < 0.0.
      val s = if (s0 == 0.0d) 0.0d else s0
      if (n < k) {
        if (n == scores.length) {
          val cap = math.min(k, scores.length * 2)
          scores = java.util.Arrays.copyOf(scores, cap)
          ids = java.util.Arrays.copyOf(ids, cap)
        }
        scores(n) = s; ids(n) = i; n += 1
        siftUp(n - 1)
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var c = start
      while (c > 0) {
        val p = (c - 1) >> 1
        if (worse(scores(c), ids(c), scores(p), ids(p))) { swap(c, p); c = p }
        else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      while (true) {
        val l = 2 * p + 1
        val r = l + 1
        var m = p
        if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == p) return
        swap(p, m); p = m
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    /** Entries ordered by (score DESC, id ASC). */
    def sortedDesc(): Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var j = 0
      while (j < n) { out(j) = (scores(j), ids(j)); j += 1 }
      scala.util.Sorting.stableSort(
        out,
        (a: (Double, Long), b: (Double, Long)) => {
          val c = java.lang.Double.compare(a._1, b._1)
          c > 0 || (c == 0 && a._2 < b._2)
        }
      )
      out
    }
  }
}
