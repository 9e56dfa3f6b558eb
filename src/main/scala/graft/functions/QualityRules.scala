package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composite rule-based document quality filtering — the "Gopher rules"
  * (Rae et al. 2021, "Scaling Language Models: Methods, Analysis & Insights
  * from Training Gopher", §A1.1.1, public arXiv:2112.11446), the standard
  * first-pass heuristic gate a large-scale training-data pipeline runs
  * before any model-based scoring.
  *
  * The reference has no quality operators (pgsync delegates scalar compute
  * to PostgreSQL — SURVEY.md §2.6); this extends the engine for the
  * LLM-corpus north star alongside [[TextFunctions]].
  *
  * Design for the correctness gate AND for 100 TB:
  *   - every signal is an INTEGER count and every threshold an integer
  *     cross-multiplication (`10·symbols ≤ words` instead of
  *     `symbols/words ≤ 0.1`), so an external engine replays the decision
  *     bit-for-bit — no float division anywhere;
  *   - everything is one map-side projection over the scan, with the
  *     per-row signal extraction done in a single pass by the native
  *     expressions [[graft.expr.GopherSignals]] /
  *     [[graft.expr.RepetitionSignals]]: no shuffle, no UDF, no state —
  *     the gates run at scan throughput on any corpus size.
  */
object QualityRules {

  /** The Gopher "must contain" stopwords (Rae et al. §A1.1.1: a document
    * must contain ≥ 2 of these common English words).
    */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Materialize a one-pass signal struct once per row, then project its
    * fields plus the never-null `pass` verdict computed from them (a NULL
    * verdict — null text — coalesces to a hard false). Shared by all three
    * gates so the struct-once / fields / verdict policy is single-sourced.
    */
  private def projectSignals(
      docs: DataFrame,
      id: String,
      sigExpr: org.apache.spark.sql.catalyst.expressions.Expression,
      fields: Seq[String]
  )(pass: (String => Column) => Column): DataFrame = {
    val sig = org.apache.spark.sql.GraftColumnBridge.column(sigExpr)
    val withSig = docs.select(col(id), sig.as("__sig"))
    val s = (f: String) => col("__sig").getField(f)
    withSig.select(
      (col(id) +: fields.map(f => s(f).as(f))) :+
        coalesce(pass(s), lit(false)).as("pass"): _*
    )
  }

  /** The Gopher REPETITION filters (Rae et al. §A1.1.2): duplicate lines,
    * duplicate paragraphs, and dominant REPEATED-n-gram character coverage.
    * All signals are integer counts computed in ONE pass per row by the
    * native [[graft.expr.RepetitionSignals]] expression (the equivalent
    * sorted-array HOF formulation evaluates interpreted and was 48× slower
    * on the sf0.1 bench: 18.8 s → 0.39 s — same lesson as WordShingles);
    * thresholds are
    * integer cross-multiplications; `pass` is the published conjunction:
    * duplicate-line and duplicate-paragraph fractions ≤ 30%, duplicated
    * line/paragraph CHARACTER fractions ≤ 20%, top-2-gram character
    * coverage ≤ 20%, top-3-gram coverage ≤ 18%.
    *
    * Output: (id, n_chars_t, n_lines, dup_lines, dup_line_chars, n_paras,
    * dup_paras, dup_para_chars, top2_chars, top3_chars, pass).
    */
  def repetition(docs: DataFrame, id: String, text: String): DataFrame =
    projectSignals(
      docs,
      id,
      graft.expr.RepetitionSignals(
        org.apache.spark.sql.GraftColumnBridge.expression(col(text))
      ),
      Seq(
        "n_chars_t", "n_lines", "dup_lines", "dup_line_chars",
        "n_paras", "dup_paras", "dup_para_chars", "top2_chars", "top3_chars"
      )
    ) { s =>
      s("dup_lines") * 10 <= s("n_lines") * 3 &&
        s("dup_paras") * 10 <= s("n_paras") * 3 &&
        s("dup_line_chars") * 5 <= s("n_chars_t") &&
        s("dup_para_chars") * 5 <= s("n_chars_t") &&
        s("top2_chars") * 5 <= s("n_chars_t") &&
        s("top3_chars") * 50 <= s("n_chars_t") * 9
    }

  /** The C4 heuristic cleaning signals (Raffel et al. 2020 §2.2,
    * arXiv:1910.10683) + page verdict: line-edit counts (lines ending in
    * terminal punctuation, lines under 3 words, "javascript" lines) and
    * the page-drop signals ("lorem ipsum", '{', sentence count). One pass
    * per row via the native [[graft.expr.C4Signals]] expression; `pass`
    * is C4's page gate — no lorem ipsum, no brace, ≥ 5 sentence marks —
    * while the line counts quantify how much the line-level edits would
    * remove (C4 edits lines, it does not drop the page for them).
    *
    * Output: (id, n_lines, terminal_lines, short_lines, js_lines,
    * sentence_marks, lorem_hits, brace_hits, pass).
    */
  def c4(docs: DataFrame, id: String, text: String): DataFrame =
    projectSignals(
      docs,
      id,
      graft.expr.C4Signals(
        org.apache.spark.sql.GraftColumnBridge.expression(col(text))
      ),
      Seq(
        "n_lines", "terminal_lines", "short_lines", "js_lines",
        "sentence_marks", "lorem_hits", "brace_hits"
      )
    ) { s =>
      s("lorem_hits") === 0 && s("brace_hits") === 0 && s("sentence_marks") >= 5
    }

  /** Per-document Gopher rule signals + verdict. Output columns (all
    * BIGINT except the BOOLEAN `pass`):
    *
    *   - `n_words`, `word_chars` — token count and summed token lengths
    *     (mean word length = word_chars / n_words, tested by
    *     cross-multiplication);
    *   - `alpha_words` — tokens containing ≥ 1 ASCII letter;
    *   - `n_lines`, `bullet_lines`, `ellipsis_lines` — layout signals;
    *   - `symbol_count` — '#' characters plus '…'/'...' ellipses;
    *   - `stop_hits` — how many of [[RequiredStopwords]] appear as tokens;
    *   - `pass` — the conjunction of the published thresholds:
    *     50 ≤ n_words ≤ 100 000; 3 ≤ mean word length ≤ 10;
    *     symbol-to-word ratio ≤ 0.1; ≤ 90% bullet lines;
    *     ≤ 30% ellipsis-ending lines; ≥ 80% alphabetic words;
    *     ≥ 2 required stopwords.
    *
    * `minWords`/`maxWords` are the only knobs pipelines commonly retune
    * per corpus; the ratio thresholds are fixed to the published values.
    */
  def gopher(
      docs: DataFrame,
      id: String,
      text: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L
  ): DataFrame =
    projectSignals(
      docs,
      id,
      graft.expr.GopherSignals(
        org.apache.spark.sql.GraftColumnBridge.expression(col(text)),
        RequiredStopwords
      ),
      Seq(
        "n_words", "word_chars", "alpha_words", "n_lines",
        "bullet_lines", "ellipsis_lines", "symbol_count", "stop_hits"
      )
    )(gopherPass(minWords, maxWords))

  // The three published verdicts, factored so `all` applies the exact same
  // threshold arithmetic to the fused signal struct.
  private def gopherPass(minWords: Long, maxWords: Long)(s: String => Column): Column =
    s("n_words").between(minWords, maxWords) &&
      s("word_chars") >= s("n_words") * 3 &&
      s("word_chars") <= s("n_words") * 10 &&
      s("symbol_count") * 10 <= s("n_words") &&
      s("bullet_lines") * 10 <= s("n_lines") * 9 &&
      s("ellipsis_lines") * 10 <= s("n_lines") * 3 &&
      s("alpha_words") * 5 >= s("n_words") * 4 &&
      s("stop_hits") >= 2

  private def repetitionPass(s: String => Column): Column =
    s("dup_lines") * 10 <= s("n_lines") * 3 &&
      s("dup_paras") * 10 <= s("n_paras") * 3 &&
      s("dup_line_chars") * 5 <= s("n_chars_t") &&
      s("dup_para_chars") * 5 <= s("n_chars_t") &&
      s("top2_chars") * 5 <= s("n_chars_t") &&
      s("top3_chars") * 50 <= s("n_chars_t") * 9

  private def c4Pass(s: String => Column): Column =
    s("lorem_hits") === 0 && s("brace_hits") === 0 && s("sentence_marks") >= 5

  /** ALL THREE gates in one scan: the fused
    * [[graft.expr.QualitySignals]] expression materializes, tokenizes and
    * line-splits each document exactly once and runs the three gate kernels
    * over the shared arrays — a curation pipeline applies the gates
    * together, and running the standalone operators costs three corpus
    * scans where this costs one (PlanSpec asserts one scan, zero
    * exchanges, inside WholeStageCodegen).
    *
    * Output: (id, <the 22 fused signals>, pass_gopher, pass_repetition,
    * pass_c4, pass) where `pass` is the conjunction — exactly the rows a
    * Gopher+C4-filtered corpus would keep. Null text → all-false verdicts.
    */
  def all(
      docs: DataFrame,
      id: String,
      text: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      keep: Seq[String] = Nil
  ): DataFrame = {
    val sig = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expr.QualitySignals(
        org.apache.spark.sql.GraftColumnBridge.expression(col(text)),
        RequiredStopwords
      )
    )
    // `keep` carries extra source columns through the signal projection so a
    // downstream consumer (e.g. a dedup hash over the gated docs) fuses into
    // the SAME corpus pass instead of re-joining the source table by id —
    // one full scan saved per pipeline (guide §6). Names must not collide
    // with the signal/pass columns; default Nil keeps the established shape.
    val withSig = docs.select(col(id) +: keep.map(col) :+ sig.as("__sig"): _*)
    val s = (f: String) => col("__sig").getField(f)
    // gopher's n_lines lives at the shared slot in the fused struct
    val fields = graft.expr.QualitySignals.FieldNames
    val pg = coalesce(gopherPass(minWords, maxWords)(s), lit(false))
    val pr = coalesce(repetitionPass(s), lit(false))
    val pc = coalesce(c4Pass(s), lit(false))
    withSig.select(
      (col(id) +: keep.map(col)) ++ fields.map(f => s(f).as(f)) ++ Seq(
        pg.as("pass_gopher"),
        pr.as("pass_repetition"),
        pc.as("pass_c4"),
        (pg && pr && pc).as("pass")
      ): _*
    )
  }
}
