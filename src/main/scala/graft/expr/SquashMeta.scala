package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** `_meta` lineage squash (`pgsync/transform.py:230-288`): flatten a lineage
  * array into {table → {pk → sorted distinct values}} in ONE pass.
  *
  * Two input shapes:
  *   - `dict` EMPTY (SQL surface / legacy): array<struct<table,pk,value>>.
  *   - `dict` NON-empty: array<struct<k:int,value>> where `k` indexes into
  *     `dict` — the assembler's shape. The (table, pk) strings are plan-time
  *     constants, so carrying them per entry through the child aggregations
  *     just multiplies shuffle bytes; the dictionary keeps the shuffled
  *     entry at (int, value).
  *
  * The pure-HOF formulation (nested `transform`/`filter`/`array_distinct`)
  * is O(T·P·N) interpreted passes over the lineage array and showed up as
  * the dominant cost of `_meta` materialization in BENCH; this expression is
  * a single O(N log N) traversal. Insertion order of tables/pks is
  * preserved (matching the reference's dict construction order); values are
  * sorted distinct (`transform.py:287`).
  */
case class SquashMeta(child: Expression, dict: Seq[(String, String)] = Nil)
    extends UnaryExpression with NativeKernelCodegen {

  private implicit val utf8Ord: Ordering[UTF8String] = (a, b) => a.compareTo(b)

  @transient private lazy val dictTables: Array[UTF8String] =
    dict.map(e => UTF8String.fromString(e._1)).toArray
  @transient private lazy val dictPks: Array[UTF8String] =
    dict.map(e => UTF8String.fromString(e._2)).toArray

  override def dataType: DataType =
    MapType(StringType, MapType(StringType, ArrayType(StringType)))

  override def kernel(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val encoded = dict.nonEmpty
    // table → pk → sorted distinct values; LinkedHashMap preserves first-seen
    // order like the reference's dict building.
    val tables = mutable.LinkedHashMap.empty[UTF8String, mutable.LinkedHashMap[UTF8String, mutable.TreeSet[UTF8String]]]
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        if (encoded) {
          val row = arr.getStruct(i, 2)
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val k = row.getInt(0)
            if (k >= 0 && k < dictTables.length) {
              val pks = tables.getOrElseUpdate(dictTables(k), mutable.LinkedHashMap.empty)
              pks.getOrElseUpdate(dictPks(k), mutable.TreeSet.empty[UTF8String])
                .add(row.getUTF8String(1).clone())
            }
          }
        } else {
          val row = arr.getStruct(i, 3)
          val table = row.getUTF8String(0)
          val pk = row.getUTF8String(1)
          val value = row.getUTF8String(2)
          if (table != null && pk != null && value != null) {
            val pks = tables.getOrElseUpdate(table.clone(), mutable.LinkedHashMap.empty)
            pks.getOrElseUpdate(pk.clone(), mutable.TreeSet.empty[UTF8String]).add(value.clone())
          }
        }
      }
      i += 1
    }
    val tKeys = new Array[Any](tables.size)
    val tVals = new Array[Any](tables.size)
    var ti = 0
    tables.foreach { case (t, pks) =>
      val pKeys = new Array[Any](pks.size)
      val pVals = new Array[Any](pks.size)
      var pi = 0
      pks.foreach { case (p, vs) =>
        pKeys(pi) = p
        pVals(pi) = new GenericArrayData(vs.toArray[Any])
        pi += 1
      }
      tKeys(ti) = t
      tVals(ti) = new ArrayBasedMapData(new GenericArrayData(pKeys), new GenericArrayData(pVals))
      ti += 1
    }
    new ArrayBasedMapData(new GenericArrayData(tKeys), new GenericArrayData(tVals))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
