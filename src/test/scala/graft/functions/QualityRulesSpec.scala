package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, Row] =
    QualityRules
      .gopher(docs.toDF("doc_id", "text"), "doc_id", "text", minWords = 5, maxWords = 100)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  private val good =
    "the quick brown fox jumps over that lazy dog and we have fun with words today here"

  test("gopher passes clean prose and reports its signals") {
    val out = run(Seq(1L -> good))
    val r = out(1L)
    assert(r.getAs[Long]("n_words") == 17)
    assert(r.getAs[Long]("alpha_words") == 17)
    assert(r.getAs[Long]("symbol_count") == 0)
    assert(r.getAs[Long]("stop_hits") >= 2) // the, that, and, have, with
    assert(r.getAs[Boolean]("pass"))
  }

  test("gopher fails documents outside the word-count bounds") {
    val out = run(Seq(1L -> "too short", 2L -> Seq.fill(200)("and the fox ran").mkString(" ")))
    assert(!out(1L).getAs[Boolean]("pass")) // 2 words < minWords
    assert(!out(2L).getAs[Boolean]("pass")) // 800 words > maxWords
  }

  test("gopher fails on mean word length out of [3, 10]") {
    // 8 one-char words: mean 1 < 3
    val short = 1L -> "a b c d e f g h and the fox sat"
    // long tokens: mean > 10
    val long = 2L ->
      ("the and " + Seq.fill(10)("supercalifragilisticexpialidocious").mkString(" "))
    val out = run(Seq(short, long))
    assert(!out(1L).getAs[Boolean]("pass"))
    assert(!out(2L).getAs[Boolean]("pass"))
  }

  test("gopher counts symbols (#, unicode and dot ellipses) and fails dense ones") {
    val out = run(
      Seq(
        1L -> "the fox ## jumps … over ... the dog and we have more words",
        2L -> (good + " ###### ...... … … … …")
      )
    )
    assert(out(1L).getAs[Long]("symbol_count") == 4) // two #, one …, one ...
    assert(!out(2L).getAs[Boolean]("pass")) // 12 symbols > 10% of words
  }

  test("gopher line-shape rules: bullet and ellipsis-ending lines") {
    val bullets = (1 to 10).map(i => s"- item $i the and").mkString("\n")
    val dots = (1 to 10).map(i => s"line $i the and goes on...").mkString("\n")
    val out = run(Seq(1L -> bullets, 2L -> dots))
    assert(out(1L).getAs[Long]("bullet_lines") == 10)
    assert(!out(1L).getAs[Boolean]("pass")) // 100% bullets > 90%
    assert(out(2L).getAs[Long]("ellipsis_lines") == 10)
    assert(!out(2L).getAs[Boolean]("pass")) // 100% ellipsis-ending > 30%
  }

  test("gopher alphabetic-word and stopword requirements") {
    val numbers = 1L -> "the and 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18"
    val noStops = 2L -> "quick brown foxes jump high over lazy sleeping dogs daily"
    val out = run(Seq(numbers, noStops))
    assert(!out(1L).getAs[Boolean]("pass")) // 2/20 alphabetic < 80%
    assert(out(2L).getAs[Long]("stop_hits") == 0)
    assert(!out(2L).getAs[Boolean]("pass")) // needs >= 2 required stopwords
  }

  private def runRep(docs: Seq[(Long, String)]): Map[Long, Row] =
    QualityRules
      .repetition(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  test("repetition: duplicate lines and paragraphs are counted with their chars") {
    val doc = "alpha beta\nalpha beta\ngamma delta\n\nsame para\n\nsame para"
    val r = runRep(Seq(1L -> doc))(1L)
    // lines: [alpha beta, alpha beta, gamma delta, , same para, , same para]
    assert(r.getAs[Long]("n_lines") == 7)
    assert(r.getAs[Long]("dup_lines") == 3) // one 'alpha beta', one '', one 'same para'
    assert(r.getAs[Long]("dup_line_chars") == 10 + 0 + 9)
    // paras (split on \n{2,}): [alpha beta\nalpha beta\ngamma delta, same para, same para]
    assert(r.getAs[Long]("n_paras") == 3)
    assert(r.getAs[Long]("dup_paras") == 1)
    assert(r.getAs[Long]("dup_para_chars") == 9)
  }

  test("repetition: dominant n-gram character coverage and the pass verdict") {
    val spam = 1L -> Seq.fill(20)("buy now").mkString(" ") // 'buy now' 2-gram dominates
    val clean = 2L -> "the quick brown fox jumps over the lazy dog and then sleeps"
    val out = runRep(Seq(spam, clean))
    // 'now buy' appears 19x (len 7): 19*7=133; 'buy now' 20*7=140 → top2 = 140
    assert(out(1L).getAs[Long]("top2_chars") == 140)
    assert(!out(1L).getAs[Boolean]("pass")) // 140*5 > 159 chars
    assert(out(2L).getAs[Boolean]("pass"))
    // empty / single-word docs: no grams, zero coverage, no error
    val tiny = runRep(Seq(3L -> "", 4L -> "word"))
    assert(tiny(3L).getAs[Long]("top2_chars") == 0)
    assert(tiny(4L).getAs[Long]("top3_chars") == 0)
  }

  private def runC4(docs: Seq[(Long, String)]): Map[Long, Row] =
    QualityRules
      .c4(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  test("c4: line-edit counts — terminal punctuation, short lines, javascript") {
    val doc = Seq(
      "This line ends properly.",
      "so does this one!",
      "does it? \"yes.\"",
      "no punctuation here at all",
      "Enable JavaScript to view",
      "ok"
    ).mkString("\n")
    val r = runC4(Seq(1L -> doc))(1L)
    assert(r.getAs[Long]("n_lines") == 6)
    assert(r.getAs[Long]("terminal_lines") == 3)
    assert(r.getAs[Long]("short_lines") == 1) // "ok"
    assert(r.getAs[Long]("js_lines") == 1) // case-insensitive, word-bounded
  }

  test("c4: page gate — lorem ipsum, braces, sentence minimum") {
    val good = 1L -> "One. Two. Three. Four. Five sentences make the cut."
    val lorem = 2L -> ("Lorem Ipsum dolor sit amet. " + good._2)
    val code = 3L -> ("function f() { return 1; } " + good._2)
    val thin = 4L -> "Only one sentence here."
    val out = runC4(Seq(good, lorem, code, thin))
    assert(out(1L).getAs[Boolean]("pass"))
    assert(out(2L).getAs[Long]("lorem_hits") == 1 && !out(2L).getAs[Boolean]("pass"))
    assert(out(3L).getAs[Long]("brace_hits") == 1 && !out(3L).getAs[Boolean]("pass"))
    assert(out(4L).getAs[Long]("sentence_marks") == 1 && !out(4L).getAs[Boolean]("pass"))
    // null text: null signals, verdict still a hard false
    val nul = runC4(Seq(5L -> (null: String)))(5L)
    assert(nul.isNullAt(nul.fieldIndex("n_lines")) && !nul.getAs[Boolean]("pass"))
  }

  test("portability pins: SQL trim, RE2 anchors, ASCII case folding") {
    // SQL trim strips spaces ONLY: a control-char-led token stays intact,
    // so it is NOT a stopword hit and its length includes the control char
    // (what the DuckDB oracle computes; Java String.trim would strip it)
    val ctl = run(Seq(1L -> "\u0001the be to of and more words here now ok"))(1L)
    assert(ctl.getAs[Long]("n_words") == 10)
    assert(ctl.getAs[Long]("stop_hits") == 4) // be/to/of/and — NOT \u0001the
    assert(ctl.getAs[Long]("word_chars") == 31) // counts the \u0001
    // RE2's $ matches only true end-of-input: a U+2028-terminated line is
    // NOT terminal-punctuated (Java's $ would match before the terminator)
    val c4 = runC4(Seq(1L -> "A proper sentence.\u2028", 2L -> "A proper sentence."))
    assert(c4(1L).getAs[Long]("terminal_lines") == 0)
    assert(c4(2L).getAs[Long]("terminal_lines") == 1)
    // ASCII case classes, not (?i): Unicode folds (U+017F long s) must NOT
    // match, plain case variants must
    val lorem = runC4(Seq(1L -> "LOREM IPSUM dolor", 2L -> "lorem ip\u017Fum dolor"))
    assert(lorem(1L).getAs[Long]("lorem_hits") == 1)
    assert(lorem(2L).getAs[Long]("lorem_hits") == 0)
  }

  test("whitespace class is RE2's \\s: vertical tab is NOT a separator") {
    // U+000B is whitespace to Java's \s but not to RE2's (the oracle's):
    // "a\u000Bb" must tokenize as ONE token on both sides
    val r = run(Seq(1L -> "the be to of and more\u000Bwords here now ok"))(1L)
    assert(r.getAs[Long]("n_words") == 9) // "more words" joined by U+000B is one token
    val c4 = runC4(Seq(1L -> "ends fine.\u000B", 2L -> "one two\u000Bthree"))
    // trailing U+000B is not \s* before the terminal anchor
    assert(c4(1L).getAs[Long]("terminal_lines") == 0)
    // C4 word counting: U+000B does not separate words → 2 words < 3 → short
    assert(c4(2L).getAs[Long]("short_lines") == 1)
  }

  test("fused `all` gate equals the standalone gates, signal for signal") {
    val docs = Seq(
      1L -> good,
      2L -> "alpha beta\nalpha beta\ngamma delta\n\nsame para\n\nsame para",
      3L -> ("Lorem Ipsum dolor sit amet. " + good),
      4L -> Seq.fill(20)("buy now").mkString(" "),
      5L -> "",
      6L -> (null: String),
      7L -> "- bullet one the and\n- bullet two the and\nOne. Two. Three. Four. Five."
    )
    val df = docs.toDF("doc_id", "text")
    val a = QualityRules.all(df, "doc_id", "text", minWords = 5, maxWords = 100)
      .collect().map(r => r.getLong(0) -> r).toMap
    val g = run(docs)
    val r = runRep(docs)
    val c = runC4(docs)
    def eq(row: Row, other: Row, f: String, asName: String): Unit =
      assert(row.get(row.fieldIndex(asName)) == other.get(other.fieldIndex(f)),
        s"field $f: ${row.get(row.fieldIndex(asName))} != ${other.get(other.fieldIndex(f))}")
    for (id <- docs.map(_._1)) {
      for (f <- Seq("n_words", "word_chars", "alpha_words", "n_lines", "bullet_lines",
          "ellipsis_lines", "symbol_count", "stop_hits")) eq(a(id), g(id), f, f)
      for (f <- Seq("n_chars_t", "dup_lines", "dup_line_chars", "n_paras", "dup_paras",
          "dup_para_chars", "top2_chars", "top3_chars")) eq(a(id), r(id), f, f)
      for (f <- Seq("terminal_lines", "short_lines", "js_lines", "sentence_marks",
          "lorem_hits", "brace_hits")) eq(a(id), c(id), f, f)
      eq(a(id), g(id), "pass", "pass_gopher")
      eq(a(id), r(id), "pass", "pass_repetition")
      eq(a(id), c(id), "pass", "pass_c4")
      assert(a(id).getAs[Boolean]("pass") ==
        (g(id).getAs[Boolean]("pass") && r(id).getAs[Boolean]("pass") && c(id).getAs[Boolean]("pass")))
    }
  }

  test("gopher is whitespace- and null-robust: empty, blank, null docs all fail") {
    val out = run(Seq(1L -> "", 2L -> "   ", 3L -> "\n\n\n", 4L -> (null: String)))
    assert(out.values.forall(!_.getAs[Boolean]("pass"))) // pass is never null
    assert(out(1L).getAs[Long]("n_words") == 0)
    assert(out(2L).getAs[Long]("word_chars") == 0)
    assert(!runRep(Seq(1L -> (null: String)))(1L).getAs[Boolean]("pass"))
  }
}
