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
  */
private[expr] object TextPrimitives {

  def sqlTrim(s: String): String = {
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    if (start == 0 && end == s.length) s else s.substring(start, end)
  }

  def tokens(text: String): Array[String] =
    sqlTrim(text).split("\\s+").filter(_.nonEmpty)

  def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong
}
