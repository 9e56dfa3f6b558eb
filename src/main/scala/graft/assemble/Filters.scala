package graft.assemble

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's filter surface (`sync(filters=...)`): a list of
  * equality-maps per table, where each map is ANDed (composite PKs) and the
  * list is ORed (`pgsync/querybuilder.py:100-132` `_build_filters`).
  *
  * Includes the UUID type-mismatch guard (`querybuilder.py:81-98`): a value
  * that cannot be a member of the column's type degrades that conjunct to
  * FALSE instead of raising — the reference added this so e.g. an integer
  * probed against a uuid column silently matches nothing.
  *
  * For batch-sized key sets this builds a literal predicate (Catalyst
  * compiles to pushable `In`/`EqualTo` filters); resolution joins for large
  * sets live in [[graft.cdc.IncrementalEngine]] as broadcast semi-joins.
  */
object Filters {

  /** OR-of-ANDs equality filter. Returns FALSE for an empty list (the
    * reference yields no rows when every filter chunk is exhausted).
    * `caseInsensitive` names the citext columns
    * ([[graft.catalog.TableMeta.caseInsensitive]]): their string equality
    * folds case on both sides, like the reference comparing against a
    * citext column (`pgsync/base.py:61-69`).
    */
  def build(
      df: DataFrame,
      orOfAnds: Seq[Map[String, Any]],
      caseInsensitive: Set[String] = Set.empty
  ): Column =
    orOfAnds
      .map { conj =>
        conj
          .map { case (name, value) =>
            val eq = typedEq(df, name, value)
            if (caseInsensitive.contains(name) && df.schema(name).dataType == StringType)
              value match {
                case s: String => lower(df(name)) === lit(s.toLowerCase)
                case _         => eq
              }
            else eq
          }
          .reduceOption(_ && _)
          .getOrElse(lit(true))
      }
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** Equality with the type-mismatch guard: literals are coerced to the
    * column type at build time. A string probe against a column type outside
    * the coercion table falls back to cast-to-string equality (the reference
    * lets the database coerce, `querybuilder.py:81-98` — only the genuinely
    * impossible pairs, e.g. a fractional number vs an integer column or a
    * malformed date string, degrade to plan-time FALSE).
    */
  private def typedEq(df: DataFrame, name: String, value: Any): Column = {
    val dt = df.schema(name).dataType
    coerce(value, dt) match {
      case Some(v)                                        => df(name) === lit(v)
      case None if fallbackToStringCompare(value, dt)     =>
        df(name).cast(StringType) === lit(value.toString)
      case None                                           => lit(false)
    }
  }

  /** A string probe against a type we have no parser for (binary, arrays,
    * uuid-ish opaque types) still gets a row-level chance via string-form
    * equality; typed probes that failed coercion stay FALSE — those are the
    * impossible pairs the guard exists for.
    */
  private def fallbackToStringCompare(value: Any, dt: DataType): Boolean =
    value.isInstanceOf[String] && (dt match {
      case StringType | LongType | IntegerType | ShortType | DoubleType |
          FloatType | BooleanType | DateType | TimestampType | _: DecimalType => false
      case _ => true
    })

  /** Integral coercion is only valid when LOSSLESS: a fractional or
    * out-of-range probe value equals no member of the column's type, so it
    * must degrade to no-match, not silently truncate/wrap onto the wrong row.
    */
  private def lossless(v: Number, lo: Long, hi: Long): Option[Long] = {
    val d = v.doubleValue()
    val l = v.longValue()
    if (d == l.toDouble && l >= lo && l <= hi) Some(l) else None
  }

  private def coerce(value: Any, dt: DataType): Option[Any] = (value, dt) match {
    case (null, _)                 => None // NULL never equals anything
    case (v: String, StringType)   => Some(v)
    case (v, StringType)           => Some(v.toString)
    case (v: Number, LongType)     => lossless(v, Long.MinValue, Long.MaxValue)
    case (v: Number, IntegerType)  => lossless(v, Int.MinValue, Int.MaxValue).map(_.toInt)
    case (v: Number, ShortType)    => lossless(v, Short.MinValue, Short.MaxValue).map(_.toShort)
    case (v: Number, DoubleType)   => Some(v.doubleValue())
    case (v: Number, FloatType)    => Some(v.floatValue())
    case (v: Number, _: DecimalType) => Some(new java.math.BigDecimal(v.toString))
    case (v: String, LongType)     => scala.util.Try(v.toLong).toOption
    case (v: String, IntegerType)  => scala.util.Try(v.toInt).toOption
    case (v: String, ShortType)    => scala.util.Try(v.toShort).toOption
    case (v: String, DoubleType)   => scala.util.Try(v.toDouble).toOption
    case (v: String, FloatType)    => scala.util.Try(v.toFloat).toOption
    case (v: String, _: DecimalType) =>
      scala.util.Try(new java.math.BigDecimal(v)).toOption
    case (v: Boolean, BooleanType) => Some(v)
    case (v: java.sql.Date, DateType)           => Some(v)
    case (v: java.time.LocalDate, DateType)     => Some(java.sql.Date.valueOf(v))
    case (v: java.sql.Timestamp, TimestampType) => Some(v)
    case (v: java.time.Instant, TimestampType)  => Some(java.sql.Timestamp.from(v))
    case (v: String, DateType) => scala.util.Try(java.sql.Date.valueOf(v.trim)).toOption
    case (v: String, TimestampType) =>
      // ISO 'T' separator and date-only probes both resolve, like a database
      // cast would ('2020-01-01'::timestamptz is midnight)
      scala.util.Try(java.sql.Timestamp.valueOf(v.trim.replace('T', ' '))).toOption
        .orElse(scala.util.Try(java.sql.Timestamp.valueOf(java.sql.Date.valueOf(v.trim).toLocalDate.atStartOfDay())).toOption)
    case (v: String, BooleanType)  => v.toLowerCase match {
      case "true" | "t"  => Some(true)
      case "false" | "f" => Some(false)
      case _             => None
    }
    case _ => None // uuid-vs-int style mismatch → degrade, don't raise
  }
}
