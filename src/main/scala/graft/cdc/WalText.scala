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
  // emits e.g. `table public.a, public.b: TRUNCATE: (no flags)`.
  // Identifiers that need quoting (mixed case, spaces, reserved words) are
  // double-quoted by test_decoding, with `""` escapes — the reference's
  // LOGICAL_SLOT_PREFIX allows '"?name"?' (`sync.py:79-83`).
  private val Ident = """(?:"(?:[^"]|"")*"|[\w\-]+)"""
  private val Qualified = s"""$Ident(?:\\.$Ident)?"""
  private val TableLine = s"""table\\s+($Qualified(?:,\\s*$Qualified)*):\\s+(INSERT|UPDATE|DELETE|TRUNCATE):\\s*(.*)""".r
  private val BeginLine = """BEGIN\s+(\d+)""".r
  private val CommitLine = """COMMIT\s+(\d+).*""".r
  private val LooksLikeTableLine = """table\s+.*""".r

  private val numericTypes = Set(
    "smallint", "integer", "bigint", "numeric", "real", "double precision", "oid"
  )

  /** Parse a serial stream of decoder lines into change rows. Lines between
    * BEGIN/COMMIT get that transaction's xid; heartbeats and unknown lines
    * are skipped (C8, `sync.py:2010-2030`). Lines that *look* like table
    * change lines but fail to parse are reported through `onUnparsed`
    * (default: warn) rather than silently dropped — a dropped change means
    * silent index staleness.
    */
  def parse(
      lines: Iterator[String],
      onUnparsed: String => Unit = line =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"unparsed test_decoding table line (change dropped): $line")
  ): Iterator[WalChange] = {
    var txid = 0L
    lines.flatMap {
      case BeginLine(x) => txid = x.toLong; Nil
      case CommitLine(_) => Nil
      case TableLine(tableList, op, rest) =>
        val names = splitQualifiedNames(tableList)
        val (oldPart, newPart) = op match {
          case "UPDATE" if rest.startsWith("old-key:") =>
            // old-key: <pairs> new-tuple: <pairs> — the split token must be
            // located OUTSIDE quoted values (a note[text]:'see new-tuple: x'
            // value contains the literal token)
            val ix = indexOfOutsideQuotes(rest, "new-tuple:")
            val o = rest.substring("old-key:".length, if (ix >= 0) ix else rest.length)
            val n = if (ix >= 0) rest.substring(ix + "new-tuple:".length) else ""
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
      case line @ LooksLikeTableLine() => onUnparsed(line); Nil
      case _ => Nil // heartbeats / messages / empty
    }
  }

  /** First index of `token` in `s` outside single- or double-quoted spans
    * ('' / "" escapes toggle twice, which is harmless — the escaped span is
    * zero-width and the token is longer than zero).
    */
  private[cdc] def indexOfOutsideQuotes(s: String, token: String): Int = {
    var i = 0
    var inSingle = false
    var inDouble = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inDouble) inSingle = !inSingle
      else if (c == '"' && !inSingle) inDouble = !inDouble
      else if (!inSingle && !inDouble && s.startsWith(token, i)) return i
      i += 1
    }
    -1
  }

  /** Split a comma-separated list of (optionally schema-qualified, optionally
    * double-quoted) identifiers into (schema, table) pairs, honoring `""`
    * escapes and dots/commas inside quoted names.
    */
  private[cdc] def splitQualifiedNames(s: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    val n = s.length
    def skipWs(): Unit = while (i < n && s.charAt(i) == ' ') i += 1
    def readIdent(): String = {
      if (i < n && s.charAt(i) == '"') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done && i < n) {
          val c = s.charAt(i)
          if (c == '"') {
            if (i + 1 < n && s.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
            else { done = true; i += 1 }
          } else { sb.append(c); i += 1 }
        }
        sb.toString
      } else {
        val start = i
        while (i < n && s.charAt(i) != '.' && s.charAt(i) != ',' && s.charAt(i) != ' ') i += 1
        s.substring(start, i)
      }
    }
    while (i < n) {
      skipWs()
      if (i >= n) return out.result()
      val first = readIdent()
      if (i < n && s.charAt(i) == '.') {
        i += 1
        val second = readIdent()
        out += ((first, second))
      } else out += (("", first))
      skipWs()
      if (i < n && s.charAt(i) == ',') i += 1
    }
    out.result()
  }

  /** Parse `col[type]:value` pairs, honoring single-quoted values with ''
    * escapes and double-quoted column keys with `""` escapes (test_decoding
    * quotes column names that need quoting; the reference's pair regex
    * accepts '"?col"?', `base.py:1122-1139`). Returns (column, type, rawValue).
    */
  private[cdc] def parsePairs(s: String): Seq[(String, String, String)] = {
    val out = Seq.newBuilder[(String, String, String)]
    var i = 0
    val n = s.length
    def skipWs(): Unit = while (i < n && s.charAt(i) == ' ') i += 1
    while (i < n) {
      skipWs()
      if (i >= n) return out.result()
      val col =
        if (s.charAt(i) == '"') {
          val sb = new StringBuilder
          i += 1
          var done = false
          while (!done && i < n) {
            val c = s.charAt(i)
            if (c == '"') {
              if (i + 1 < n && s.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
              else { done = true; i += 1 }
            } else { sb.append(c); i += 1 }
          }
          sb.toString
        } else {
          val bracket = s.indexOf('[', i)
          if (bracket < 0) return out.result()
          val c = s.substring(i, bracket)
          i = bracket
          c
        }
      if (i >= n || s.charAt(i) != '[') return out.result()
      val close = s.indexOf(']', i)
      if (close < 0) return out.result()
      val tpe = s.substring(i + 1, close)
      i = close + 1
      if (i < n && s.charAt(i) == ':') i += 1
      // value: quoted (single with '' escapes, or double with "" escapes —
      // the reference's value pattern accepts both, constants.py:214-226)
      // or bare token
      if (i < n && (s.charAt(i) == '\'' || s.charAt(i) == '"')) {
        val quote = s.charAt(i)
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done && i < n) {
          val c = s.charAt(i)
          if (c == quote) {
            if (i + 1 < n && s.charAt(i + 1) == quote) { sb.append(quote); i += 2 }
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
      "\"" + col.replace("\\", "\\\\").replace("\"", "\\\"") + "\": " + v
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

  /** Distributed parse: each element of `blocks` is a SELF-CONTAINED span of
    * decoder lines (complete BEGIN..COMMIT transactions) — the shape a
    * chunked slot reader hands over (one chunk per poll,
    * `LOGICAL_SLOT_CHUNK_SIZE`). Since a transaction never spans two
    * elements, parsing distributes with no cross-partition state, unlike the
    * serial [[parse]] iterator. Returns [[Changes.schema]] columns.
    */
  def parseBlocks(blocks: org.apache.spark.sql.Dataset[String]): org.apache.spark.sql.DataFrame = {
    import blocks.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    blocks
      .flatMap(b => parse(b.linesIterator))
      .select(
        col("tgOp").as("tg_op"),
        col("table").as("tbl"),
        col("old"),
        col("newTuple").as("new"),
        col("txid")
      )
  }
}
