package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashed-linear-classifier inference ([[Classifier]]): feature expansion,
  * twin equivalence on hash-independent columns, and bit-exact weights vs an
  * independent JVM md5 reimplementation of the portable bucket.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def portable(rows: (Long, String)*) =
    Classifier
      .scorePortable(docs(rows: _*), col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  /** Independent reimplementation of the portable weight: first 12 md5 hex
    * chars as a 48-bit int, mod 4096 slots, Knuth-mixed into [-1e6, 1e6].
    */
  private def w(feature: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(feature.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bucket = java.lang.Long.parseLong(hex.take(12), 16) % 4096L
    (bucket * 2654435761L) % 2000001L - 1000000L
  }

  test("feature count is 2n-1 unigrams+bigrams; 0 for empty/whitespace text") {
    val got = portable(1L -> "a b c d", 2L -> "solo", 3L -> "", 4L -> "  \t\n ")
    assert(got(1L)._1 === 7L) // 4 unigrams + 3 bigrams
    assert(got(2L)._1 === 1L)
    assert(got(3L)._1 === 0L && got(3L)._2 === 0L && got(3L)._3)
    assert(got(4L)._1 === 0L && got(4L)._2 === 0L && got(4L)._3)
  }

  test("portable score is the exact sum of independent md5 feature weights") {
    val got = portable(1L -> "hello", 2L -> "hello world", 3L -> "hello hello")
    assert(got(1L)._2 === w("hello"))
    assert(got(2L)._2 === w("hello") + w("world") + w("hello world"))
    // bag semantics: a repeated token contributes once per occurrence
    assert(got(3L)._2 === 2 * w("hello") + w("hello hello"))
    got.values.foreach { case (_, s, keep) => assert(keep === (s >= 0)) }
  }

  test("case-folds and tokenizes on the pinned whitespace class") {
    val got = portable(1L -> "  Hello\tWORLD\n", 2L -> "hello world")
    assert(got(1L) === got(2L))
  }

  test("production twin agrees on every hash-independent column") {
    val d = docs(1L -> "the quick brown fox", 2L -> "", 3L -> "one two")
    val p = Classifier.scorePortable(d, col("doc_id"), col("text"))
      .select("doc_id", "n_feats").as[(Long, Long)].collect().toMap
    val x = Classifier.score(d, col("doc_id"), col("text"))
      .select("doc_id", "n_feats").as[(Long, Long)].collect().toMap
    assert(p === x)
  }

  test("production twin is deterministic and gates on the sign") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "delta")
    val a = Classifier.score(d, col("doc_id"), col("text")).collect().sortBy(_.getLong(0))
    val b = Classifier.score(d, col("doc_id"), col("text")).collect().sortBy(_.getLong(0))
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    a.foreach(r => assert(r.getBoolean(3) === (r.getLong(2) >= 0)))
  }
}
