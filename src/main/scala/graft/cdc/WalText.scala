package graft.cdc

/** Parser for PostgreSQL's `test_decoding` textual logical-decoding output —
  * the wire format the reference's WAL paths consume
  * (`pgsync/base.py:1115-1176` `parse_logical_slot`,
  * `pgsync/sync.py:79-89` message regexes, value cleanup
  * `base.py:1089-1113`; regression corpus `tests/test_bug_regressions.py`).
  *
  * Format (public PostgreSQL contrib module):
  * {{{
  * BEGIN 1234
  * table public.book: INSERT: id[integer]:1 title[character varying]:'it''s'
  * table public.book: UPDATE: old-key: id[integer]:1 new-tuple: id[integer]:2
  * table public.book: DELETE: id[integer]:1
  * COMMIT 1234
  * }}}
  *
  * This is a serial, driver/source-side parser (WAL is inherently ordered);
  * the streaming source wraps it and emits [[Changes.schema]] rows. Values
  * are rendered into the old/new JSON payloads with type-aware unquoting
  * (`'null'` → JSON null, numeric types bare, strings escaped).
  */
object WalText {

  final case class WalChange(tgOp: String, schema: String, table: String,
      old: Option[String], newTuple: Option[String], txid: Long)

  // the table part may be a comma-separated list — multi-table TRUNCATE
  // emits e.g. `table public.a, public.b: TRUNCATE: (no flags)`
  private val TableLine = """table\s+([\w\-.]+(?:,\s*[\w\-.]+)*):\s+(INSERT|UPDATE|DELETE|TRUNCATE):\s*(.*)""".r
  private val BeginLine = """BEGIN\s+(\d+)""".r
  private val CommitLine = """COMMIT\s+(\d+).*""".r

  private val numericTypes = Set(
    "smallint", "integer", "bigint", "numeric", "real", "double precision", "oid"
  )

  /** Parse a serial stream of decoder lines into change rows. Lines between
    * BEGIN/COMMIT get that transaction's xid; heartbeats and unknown lines
    * are skipped (C8, `sync.py:2010-2030`).
    */
  def parse(lines: Iterator[String]): Iterator[WalChange] = {
    var txid = 0L
    lines.flatMap {
      case BeginLine(x) => txid = x.toLong; Nil
      case CommitLine(_) => Nil
      case TableLine(tableList, op, rest) =>
        val names = tableList.split(",").map(_.trim).toSeq.map { qualified =>
          val dot = qualified.lastIndexOf('.')
          if (dot >= 0) (qualified.substring(0, dot), qualified.substring(dot + 1))
          else ("", qualified)
        }
        val (oldPart, newPart) = op match {
          case "UPDATE" if rest.contains("old-key:") =>
            // old-key: <pairs> new-tuple: <pairs>
            val ix = rest.indexOf("new-tuple:")
            val o = rest.substring(rest.indexOf("old-key:") + 8, if (ix >= 0) ix else rest.length)
            val n = if (ix >= 0) rest.substring(ix + 10) else ""
            (Some(o.trim), Some(n.trim))
          case "UPDATE" =>
            val n = if (rest.startsWith("new-tuple:")) rest.stripPrefix("new-tuple:").trim else rest
            (None, Some(n))
          case "INSERT"   => (None, Some(rest))
          case "DELETE"   => (Some(rest), None)
          case "TRUNCATE" => (None, None)
        }
        names.map { case (schema, table) =>
          WalChange(op, schema, table,
            oldPart.map(p => toJson(parsePairs(p))),
            newPart.map(p => toJson(parsePairs(p))), txid)
        }
      case _ => Nil // heartbeats / messages / empty
    }
  }

  /** Parse `col[type]:value` pairs, honoring single-quoted values with ''
    * escapes. Returns (column, type, rawValue).
    */
  private[cdc] def parsePairs(s: String): Seq[(String, String, String)] = {
    val out = Seq.newBuilder[(String, String, String)]
    var i = 0
    val n = s.length
    def skipWs(): Unit = while (i < n && s.charAt(i) == ' ') i += 1
    while (i < n) {
      skipWs()
      if (i >= n) return out.result()
      val bracket = s.indexOf('[', i)
      if (bracket < 0) return out.result()
      val col = s.substring(i, bracket)
      val close = s.indexOf(']', bracket)
      if (close < 0) return out.result()
      val tpe = s.substring(bracket + 1, close)
      i = close + 1
      if (i < n && s.charAt(i) == ':') i += 1
      // value: quoted (with '' escapes) or bare token
      if (i < n && s.charAt(i) == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done && i < n) {
          val c = s.charAt(i)
          if (c == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
            else { done = true; i += 1 }
          } else { sb.append(c); i += 1 }
        }
        out += ((col, tpe, sb.toString))
      } else {
        val end = s.indexOf(' ', i) match { case -1 => n; case e => e }
        out += ((col, tpe, s.substring(i, end)))
        i = end
      }
    }
    out.result()
  }

  /** Render parsed pairs as a JSON object with type-aware values
    * (`base.py:1089-1113` semantics: "null" → null, numerics bare,
    * booleans bare, strings quoted).
    */
  private[cdc] def toJson(pairs: Seq[(String, String, String)]): String =
    pairs.map { case (col, tpe, raw) =>
      val v =
        if (raw == "null") "null"
        else if (numericTypes.contains(tpe)) raw
        else if (tpe == "boolean") (if (raw == "t" || raw == "true") "true" else "false")
        else "\"" + raw.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      "\"" + col + "\": " + v
    }.mkString("{", ", ", "}")

  /** Lift parsed changes into a [[Changes.schema]] DataFrame. */
  def toDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      changes: Seq[WalChange]
  ): org.apache.spark.sql.DataFrame =
    Changes.of(
      spark,
      changes.map(c => (c.tgOp, c.table, c.old.orNull, c.newTuple.orNull, c.txid))
    )
}
