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
  *   - everything is one map-side projection over the scan (pure column
  *     expressions inside whole-stage codegen): no shuffle, no UDF, no
  *     state — the filter runs at scan throughput on any corpus size.
  */
object QualityRules {

  /** The Gopher "must contain" stopwords (Rae et al. §A1.1.1: a document
    * must contain ≥ 2 of these common English words).
    */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => length(w) > 0)

  /** Chars duplicated beyond each distinct value's first occurrence:
    * sort the array, then sum lengths of elements equal to their
    * predecessor — one map-side pass, no shuffle.
    */
  private def dupChars(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(false).as("started"), lit(0L).as("chars")),
      (acc, x) =>
        struct(
          x.as("prev"),
          lit(true).as("started"),
          (acc.getField("chars") +
            when(acc.getField("started") && x === acc.getField("prev"), length(x).cast("long"))
              .otherwise(lit(0L))).as("chars")
        ),
      acc => acc.getField("chars")
    )

  /** max over REPEATED values (≥ 2 occurrences) of (occurrences × length) —
    * the character coverage of the dominant repeated element. A document
    * whose values are all unique scores 0: no repetition, no signal (a
    * lone long n-gram in a short doc must not trip a repetition filter).
    * Run-length over the sorted array, map-side.
    */
  private def topRunChars(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(false).as("started"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("started") && x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(
          x.as("prev"),
          lit(true).as("started"),
          run.as("run"),
          greatest(
            acc.getField("best"),
            when(run >= 2L, run * length(x).cast("long")).otherwise(lit(0L))
          ).as("best")
        )
      },
      acc => acc.getField("best")
    )

  /** Overlapping word n-grams WITH multiplicity (unlike
    * [[TextFunctions.wordShingles]], which is distinct-set for Jaccard) —
    * frequency is the signal here.
    */
  private def grams(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)
      )
    ).otherwise(array().cast("array<string>"))

  /** The Gopher REPETITION filters (Rae et al. §A1.1.2): duplicate lines,
    * duplicate paragraphs, and dominant-n-gram character coverage. All
    * signals are integer counts computed map-side (sorted-array run-length
    * passes — no shuffle, no explode), thresholds are integer
    * cross-multiplications; `pass` is the published conjunction:
    * duplicate-line and duplicate-paragraph fractions ≤ 30%, duplicated
    * line/paragraph CHARACTER fractions ≤ 20%, top-2-gram character
    * coverage ≤ 20%, top-3-gram coverage ≤ 18%.
    *
    * Output: (id, n_chars_t, n_lines, dup_lines, dup_line_chars, n_paras,
    * dup_paras, dup_para_chars, top2_chars, top3_chars, pass).
    */
  def repetition(docs: DataFrame, id: String, text: String): DataFrame = {
    val t = col(text)
    val lines = split(t, "\n")
    val paras = split(t, "\n{2,}")
    val toks = words(t)
    val nChars = length(t).cast("long")
    val nLines = size(lines).cast("long")
    val dupLines = (size(lines) - size(array_distinct(lines))).cast("long")
    val nParas = size(paras).cast("long")
    val dupParas = (size(paras) - size(array_distinct(paras))).cast("long")
    val dupLineChars = dupChars(lines)
    val dupParaChars = dupChars(paras)
    val top2 = topRunChars(grams(toks, 2))
    val top3 = topRunChars(grams(toks, 3))
    docs.select(
      col(id),
      nChars.as("n_chars_t"),
      nLines.as("n_lines"),
      dupLines.as("dup_lines"),
      dupLineChars.as("dup_line_chars"),
      nParas.as("n_paras"),
      dupParas.as("dup_paras"),
      dupParaChars.as("dup_para_chars"),
      top2.as("top2_chars"),
      top3.as("top3_chars"),
      // never-null verdict: a NULL-text document fails the gate outright
      coalesce(
        dupLines * 10 <= nLines * 3 &&
          dupParas * 10 <= nParas * 3 &&
          dupLineChars * 5 <= nChars &&
          dupParaChars * 5 <= nChars &&
          top2 * 5 <= nChars &&
          top3 * 50 <= nChars * 9,
        lit(false)
      ).as("pass")
    )
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
  ): DataFrame = {
    val t = col(text)
    val w = words(t)
    val lines = split(t, "\n")
    val nWords = size(w).cast("long")
    val wordChars = coalesce(
      aggregate(w, lit(0L), (acc, x) => acc + length(x)),
      lit(0L)
    )
    val alphaWords = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
    val nLines = size(lines).cast("long")
    val bulletLines =
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val ellipsisLines =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    // literal (non-regex) replace counting: non-overlapping left-to-right in
    // every engine, so the counts replay exactly
    val hashCount = length(t) - length(replace(t, lit("#"), lit("")))
    val unicodeEllipses = length(t) - length(replace(t, lit("…"), lit("")))
    val dotEllipses = floor(
      (length(t) - length(replace(t, lit("..."), lit("")))).cast("double") / 3
    ).cast("long")
    val symbolCount = (hashCount + unicodeEllipses + dotEllipses).cast("long")
    // presence (not frequency) per required stopword, summed — portable,
    // unlike intersect whose dedup semantics vary by engine
    val stopHits = RequiredStopwords
      .map(sw => when(array_contains(w, sw), 1L).otherwise(0L))
      .reduce(_ + _)
      .cast("long")
    docs.select(
      col(id),
      nWords.as("n_words"),
      wordChars.as("word_chars"),
      alphaWords.as("alpha_words"),
      nLines.as("n_lines"),
      bulletLines.as("bullet_lines"),
      ellipsisLines.as("ellipsis_lines"),
      symbolCount.as("symbol_count"),
      stopHits.as("stop_hits"),
      // never-null verdict: a NULL-text document fails the gate outright
      coalesce(
        nWords.between(minWords, maxWords) &&
          wordChars >= nWords * 3 && wordChars <= nWords * 10 &&
          symbolCount * 10 <= nWords &&
          bulletLines * 10 <= nLines * 9 &&
          ellipsisLines * 10 <= nLines * 3 &&
          alphaWords * 5 >= nWords * 4 &&
          stopHits >= 2,
        lit(false)
      ).as("pass")
    )
  }
}
