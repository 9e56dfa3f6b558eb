package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  // deterministic pseudo-random corpus: 8 groups × 500 rows, scores with
  // deliberate duplicates so tie-break paths execute
  private lazy val scored: DataFrame = spark
    .range(4000)
    .select(
      (col("id") % 8).as("g"),
      (pmod(hash(col("id")), lit(97)).cast("double") / 10.0).as("score"),
      col("id")
    )

  test("topKPerGroup equals the window row_number formulation") {
    val fast = Analytics
      .topKPerGroup(scored, Seq("g"), col("score"), col("id"), k = 5)
      .select(col("g"), col("rank"), col("score"), col("id"))
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val slow = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("g"), col("rank"), col("score"), col("id"))
    assert(fast.except(slow).isEmpty && slow.except(fast).isEmpty)
    assert(fast.count() === 40)
  }

  test("topKPerGroup: k past group size returns the whole group sorted") {
    val tiny = Seq((1L, 2.0, 10L), (1L, 3.0, 11L), (2L, 1.0, 12L)).toDF("g", "s", "id")
    val got = Analytics
      .topKPerGroup(tiny, Seq("g"), col("s"), col("id"), k = 100)
      .orderBy("g", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(
      got.toSeq === Seq((1L, 1L, 3.0, 11L), (1L, 2L, 2.0, 10L), (2L, 1L, 1.0, 12L))
    )
  }

  test("topKPerGroup ties break on the lowest id") {
    val tied = Seq((1L, 5.0, 30L), (1L, 5.0, 10L), (1L, 5.0, 20L)).toDF("g", "s", "id")
    val got = Analytics
      .topKPerGroup(tied, Seq("g"), col("s"), col("id"), k = 2)
      .orderBy("rank")
      .collect()
      .map(_.getLong(3))
    assert(got.toSeq === Seq(10L, 20L))
  }

  test("topKPerGroup: NaN scores rank first (total order), eviction never wedges") {
    // NaN cosines arise from zero-norm vectors (e.g. a zero matryoshka
    // prefix slice). The heap must use a TOTAL order: Double.compare puts
    // NaN above every finite score, the same deterministic placement Spark's
    // sort and DuckDB's ORDER BY score DESC give NaN. Pre-fix, `<`/`==` were
    // both false for NaN so an admitted NaN could never be evicted.
    val withNaN = Seq(
      (1L, 5.0, 10L), (1L, Double.NaN, 11L), (1L, 7.0, 12L),
      (1L, 6.0, 13L), (1L, Double.NaN, 14L), (1L, 8.0, 15L)
    ).toDF("g", "score", "id").repartition(4)
    val fast = Analytics
      .topKPerGroup(withNaN, Seq("g"), col("score"), col("id"), k = 3)
      .orderBy("rank")
      .collect()
      .map(r => (r.getDouble(2), r.getLong(3)))
    // NaN ties break on lowest id, then the best finite score
    assert(fast.head._1.isNaN && fast.head._2 === 11L)
    assert(fast(1)._1.isNaN && fast(1)._2 === 14L)
    assert(fast(2) === ((8.0, 15L)))
    // and the window formulation agrees (Spark sorts NaN largest too)
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val slow = withNaN
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy("rank")
      .collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    assert(slow.map(_._2).toSeq === fast.map(_._2).toSeq)
  }

  test("topKPerGroup: -0.0 and 0.0 tie (SQL equality), tie breaks on id") {
    val zeros = Seq((1L, -0.0, 20L), (1L, 0.0, 10L), (1L, -1.0, 30L))
      .toDF("g", "score", "id")
    val got = Analytics
      .topKPerGroup(zeros, Seq("g"), col("score"), col("id"), k = 2)
      .orderBy("rank")
      .collect()
      .map(_.getLong(3))
    assert(got.toSeq === Seq(10L, 20L))
  }

  test("topKPerGroup survives partial/merge across many partitions") {
    // 64 input partitions force map-side partial heaps + serialized merges
    val spread = scored.repartition(64)
    val a = Analytics.topKPerGroup(spread, Seq("g"), col("score"), col("id"), 3)
    val b = Analytics.topKPerGroup(scored.coalesce(1), Seq("g"), col("score"), col("id"), 3)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("topKPerGroup plan: two-phase object-hash aggregate, no window sort of the corpus") {
    val p = planOf(Analytics.topKPerGroup(scored, Seq("g"), col("score"), col("id"), 3))
    assert(p.contains("ObjectHashAggregate"), p)
    assert("partial_top_k|partial top_k".r.findFirstIn(p).isDefined || p.contains("partial"), p)
    assert(!p.contains("Window"), s"top-k must not fall back to a window:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
  }

  test("asOfJoin: at-or-before match, equal-ts inclusive, greatest tie wins, outer nulls") {
    val left = Seq(
      (1L, 100L, "p1"), // after two clicks -> latest (t=90)
      (1L, 50L, "p2"),  // exactly at a click ts -> inclusive match
      (1L, 10L, "p3"),  // before every click -> null
      (2L, 100L, "p4")  // key with no right rows -> null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 50L, 500L),
      (1L, 90L, 900L),
      (1L, 90L, 901L) // same ts as 900 -> greater tie id wins
    ).toDF("k", "rt", "rid")
    val got = Analytics
      .asOfJoin(left, right, Seq("k"), Seq("k"), "t", "rt", Seq("rid", "rt"), "rid")
      .select(col("tag"), col("rid"), col("rt"))
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map("p1" -> 901L, "p2" -> 500L, "p3" -> -1L, "p4" -> -1L))
  }

  test("asOfJoin plan: single exchange, no pair explosion") {
    val left = spark.range(100).select((col("id") % 5).as("k"), col("id").as("t"))
    val right = spark.range(100).select((col("id") % 5).as("k"), col("id").as("rt"), col("id").as("rid"))
    val df = Analytics.asOfJoin(left, right, Seq("k"), Seq("k"), "t", "rt", Seq("rid"), "rid")
    val p = planOf(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
  }

  test("rangeJoin matches the naive theta-join, incl. band boundaries") {
    // timestamps engineered to land exactly on band edges (width = 100 us)
    val left = spark
      .range(300)
      .select(
        (col("id") % 7).as("k"),
        timestamp_micros((pmod(hash(col("id")), lit(1000)) * 10).cast("long")).as("t"),
        col("id").as("lid")
      )
    val right = spark
      .range(300)
      .select(
        (col("id") % 7).as("k"),
        timestamp_micros((pmod(hash(col("id") + 13), lit(1000)) * 10).cast("long")).as("rt"),
        col("id").as("rid")
      )
    val banded = Analytics
      .rangeJoin(left, right, Seq("k"), Seq("k"), "t", "rt", -100L, 100L, Seq("rid"))
      .select(col("lid"), col("rid"))
    val naive = left
      .join(right, left("k") === right("k")
        && unix_micros(col("rt")) >= unix_micros(col("t")) - 100
        && unix_micros(col("rt")) < unix_micros(col("t")) + 100)
      .select(col("lid"), col("rid"))
    assert(banded.except(naive).isEmpty && naive.except(banded).isEmpty)
    assert(naive.count() > 0)
  }

  test("weightedSample: deterministic, and weight-proportional across groups") {
    // 200 groups × 20 rows; one row per group has 50x the weight of the rest
    val df = spark
      .range(4000)
      .select(
        (col("id") % 200).as("g"),
        col("id"),
        when(col("id") < 200, lit(500.0)).otherwise(lit(10.0)).as("w")
      )
    val picked = Sampling.weightedSample(df, Seq("g"), col("id"), col("w"), k = 1)
    assert(picked.count() === 200)
    // the heavy row (id < 200) should win far more often than the 1/20
    // uniform rate; with weight ratio 50:19*... expected ~72% of groups
    val heavyWins = picked.filter(col("id") < 200).count()
    assert(heavyWins > 100, s"heavy rows won only $heavyWins/200 groups")
    // determinism: a second run picks the identical sample
    val again = Sampling.weightedSample(df, Seq("g"), col("id"), col("w"), k = 1)
    assert(picked.except(again).isEmpty && again.except(picked).isEmpty)
  }

  test("funnel: depth is the longest in-order strictly-increasing prefix") {
    val ev = Seq(
      // u1 completes all four in order
      (1L, "2024-01-01 00:00:01", "view"),
      (1L, "2024-01-01 00:00:02", "click"),
      (1L, "2024-01-01 00:00:03", "signup"),
      (1L, "2024-01-01 00:00:04", "purchase"),
      // u2: purchase precedes everything else -> depth 3 (view,click,signup)
      (2L, "2024-01-01 00:00:00", "purchase"),
      (2L, "2024-01-01 00:00:01", "view"),
      (2L, "2024-01-01 00:00:02", "click"),
      (2L, "2024-01-01 00:00:03", "signup"),
      // u3: click at the SAME timestamp as view must not advance (strict >)
      (3L, "2024-01-01 00:00:01", "view"),
      (3L, "2024-01-01 00:00:01", "click"),
      // u4: never views -> depth 0
      (4L, "2024-01-01 00:00:01", "click")
    ).toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("event_type"))
    val got = Analytics
      .funnel(ev, "user_id", "event_type", "ts", Seq("view", "click", "signup", "purchase"))
      .orderBy("stage")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(
      got.toSeq === Seq(
        (1L, "view", 3L),    // u1, u2, u3
        (2L, "click", 2L),   // u1, u2
        (3L, "signup", 2L),  // u1, u2
        (4L, "purchase", 1L) // u1
      )
    )
  }

  test("profile: exact stats incl. nulls and binary-order min/max") {
    val df = Seq(
      (Some(1L), Some("b")),
      (Some(2L), None),
      (Some(2L), Some("a")),
      (None, Some("a"))
    ).toDF("x", "s")
    val got = Profiler
      .profile(df, Seq("x", "s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("x") === ((4L, 3L, 2L, "1", "2")))
    assert(got("s") === ((4L, 3L, 2L, "a", "b")))
  }

  test("ngramDiversity: occurrence counts (not per-doc distinct), short-text degenerates") {
    val df = Seq(
      ("a", "x y z x y z"), // trigrams: "x y z","y z x","z x y","x y z" -> 4 total, 3 distinct
      ("b", "solo"),        // short text -> single gram of all tokens
      ("b", "solo")         // duplicate doc -> 2 occurrences, 1 distinct
    ).toDF("src", "text")
    val got = CorpusStats
      .ngramDiversity(df, "src", "text", 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("a") === ((4L, 3L, 750L)))
    assert(got("b") === ((2L, 1L, 500L)))
  }

  test("frequencySpectrum: frequency-of-frequencies over lowercased words") {
    val df = Seq("The the THE cat", "cat dog").toDF("text")
    // the:3, cat:2, dog:1 -> f=3:1 word, f=2:1 word, f=1:1 word
    val got = CorpusStats
      .frequencySpectrum(df, "text")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got === Map(3L -> 1L, 2L -> 1L, 1L -> 1L))
  }

  test("profileApprox: single pass (no Expand), HLL error within bound") {
    val df = spark.range(20000).select(col("id"), (col("id") % 1371).as("m"))
    val approx = Profiler.profileApprox(df, Seq("id", "m"), rsd = 0.05)
    val p = planOf(approx)
    assert(!p.contains("Expand"), s"approx profile must not expand the stream:\n$p")
    assert(planOf(Profiler.profile(df, Seq("id", "m"))).contains("Expand"))
    val got = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(got("id") - 20000.0) / 20000.0 < 0.15)
    assert(math.abs(got("m") - 1371.0) / 1371.0 < 0.15)
  }
}
