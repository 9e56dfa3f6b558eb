package graft.expr

/** The single source of tokenization/length policy for the native text
  * expressions — every rule here exists to make the Java-side evaluation
  * BIT-IDENTICAL to the SQL the DuckDB oracle runs:
  *
  *   - [[sqlTrim]] strips ONLY spaces (SQL `trim`), never Java
  *     `String.trim`'s whole <= U+0020 range — a leading control char
  *     (U+0001) must stay attached to its token exactly as SQL sees it;
  *   - [[tokens]] = `list_filter(regexp_split_to_array(trim(text),
  *     '\s+'), x -> length(x) > 0)`;
  *   - [[cpLen]] counts code points (SQL `length`), not UTF-16 units.
  *
  * WHITESPACE CLASS — pinned to RE2's `\s` = `[ \t\n\f\r]` (space, tab,
  * newline, form feed, carriage return; NO U+000B vertical tab). Java's
  * regex `\s` additionally includes U+000B, so a `"\\s"`-based split on the
  * JVM tokenizes \x0B-bearing text (common in web scrapes) differently from
  * the RE2-backed DuckDB oracles. Every engine-side tokenizer therefore
  * spells [[WsClass]]/[[WsPlus]] literally instead of `\s`; the oracle SQL
  * may keep `'\s'` because in RE2 that IS this class by definition.
  */
private[graft] object TextPrimitives {

  /** RE2's `\s` character class, spelled explicitly (excludes U+000B). Valid
    * verbatim in both Java regex and RE2.
    */
  val WsClass: String = "[ \\t\\n\\f\\r]"

  /** `WsClass+` — the token separator used by every whitespace split. */
  val WsPlus: String = WsClass + "+"

  /** Is `c` whitespace under the pinned class (NOT Java `\s`: no \x0B). */
  def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  def sqlTrim(s: String): String = {
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    if (start == 0 && end == s.length) s else s.substring(start, end)
  }

  def tokens(text: String): Array[String] =
    sqlTrim(text).split(WsPlus).filter(_.nonEmpty)

  def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong
}
