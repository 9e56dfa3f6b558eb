package graft.transform

import org.apache.spark.sql.Row

/** Test-classpath plugins registered via
  * `META-INF/services/graft.transform.DocTransform` — exercise
  * [[Plugins.discover]]'s ServiceLoader walk + config-name filter
  * (the reference's `plugin.py:49-91` package-walk semantics).
  */
final class UppercaseTitlePlugin extends DocTransform {
  val name = "uppercase_title"
  def apply(doc: Row): Option[Row] =
    Some(Row.fromSeq(doc.toSeq.map {
      case s: String => s.toUpperCase
      case other     => other
    }))
}

/** Drops rows whose last string field equals "SKIP" (post-uppercase). */
final class DropSkippedPlugin extends DocTransform {
  val name = "drop_skipped"
  def apply(doc: Row): Option[Row] =
    if (doc.toSeq.exists(v => v == "SKIP")) None else Some(doc)
}

/** Discovered but never configured — must NOT be selected. */
final class UnusedPlugin extends DocTransform {
  val name = "unused"
  def apply(doc: Row): Option[Row] = None // would drop everything if wired
}
