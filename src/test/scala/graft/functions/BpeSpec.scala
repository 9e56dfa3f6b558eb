package graft.functions

import scala.collection.mutable

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent naive trainer: full pair recount every iteration,
    * left-to-right non-overlapping replace — the textbook formulation,
    * deliberately different code from Bpe.learnMerges' inverted-index loop.
    */
  private def naiveTrain(
      types: Array[(String, Long)],
      num: Int,
      minCount: Long
  ): Vector[(String, String)] = {
    var seqs: Array[(Vector[String], Long)] = types.map { case (w, c) =>
      val v = w.map(_.toString).toVector
      (if (v.nonEmpty) v.init :+ (v.last + Bpe.EndOfWord) else v, c)
    }
    var out = Vector.empty[(String, String)]
    var iter = 0
    while (iter < num) {
      val pc = mutable.Map.empty[(String, String), Long]
      for ((s, c) <- seqs; i <- 0 until s.length - 1)
        pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + c
      val cands = pc.filter(_._2 >= minCount)
      if (cands.isEmpty) return out
      val best = cands.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
      out :+= best
      seqs = seqs.map { case (s, c) =>
        val b = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == best._1 && s(i + 1) == best._2) {
            b += best._1 + best._2; i += 2
          } else { b += s(i); i += 1 }
        }
        (b.toVector, c)
      }
      iter += 1
    }
    out
  }

  private def randomTypes(seed: Int, n: Int): Array[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcde"
    (0 until n).map { _ =>
      val len = 1 + rnd.nextInt(8)
      val w = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      w -> (1L + rnd.nextInt(50))
    }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }.toArray.sortBy(_._1)
  }

  test("learnMerges matches the naive recount trainer on random corpora") {
    for (seed <- Seq(1, 7, 42)) {
      val types = randomTypes(seed, 120)
      val cfg = Bpe.Config(numMerges = 60, maxTypes = Int.MaxValue, minPairCount = 2)
      val fast = Bpe.learnMerges(types, cfg).pairs
      val slow = naiveTrain(types, 60, 2)
      assert(fast === slow, s"seed=$seed")
    }
  }

  test("classic corpus: the most frequent word collapses to one token") {
    val corpus = Seq.fill(20)("newest").mkString(" ") + " " +
      Seq.fill(5)("low").mkString(" ") + " " + Seq.fill(3)("widest").mkString(" ")
    val df = Seq(corpus).toDF("text")
    val merges = Bpe.train(df, "text", Bpe.Config(numMerges = 50, minPairCount = 1))
    val toks = df
      .select(Bpe.encode(col("text"), merges).as("t"))
      .head()
      .getSeq[String](0)
    // "newest" (count 20) must have become the single token "newest</w>"
    assert(toks.count(_ == "newest" + Bpe.EndOfWord) === 20)
  }

  test("encode round-trips through decode for arbitrary text") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "ünïcode wörds with ümlauts", // multi-byte code points
      "  leading and trailing   spaces  ",
      "repeated repeated repeated words words"
    )
    val df = texts.toDF("text")
    val merges = Bpe.train(df, "text", Bpe.Config(numMerges = 30, minPairCount = 1))
    val got = df.select(col("text"), Bpe.encode(col("text"), merges).as("t")).collect()
    got.foreach { r =>
      val normalized = graft.expr.TextPrimitives.tokens(r.getString(0)).mkString(" ")
      assert(Bpe.decode(r.getSeq[String](1)) === normalized)
    }
  }

  test("zero merges yields per-code-point symbols with word-final markers") {
    val df = Seq("ab c").toDF("text")
    val toks = df
      .select(Bpe.encode(col("text"), Bpe.Merges(Vector.empty)).as("t"))
      .head()
      .getSeq[String](0)
    assert(toks === Seq("a", "b" + Bpe.EndOfWord, "c" + Bpe.EndOfWord))
  }

  test("encoding stays inside WholeStageCodegen and more merges never lose text") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val merges = Bpe.train(docs, "text", Bpe.Config(numMerges = 80))
    val df = docs.select(Bpe.tokenCount(col("text"), merges).as("n"))
    val plan = df.queryExecution.executedPlan
    import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
    val inWscg = plan
      .collect { case w: WholeStageCodegenExec => w }
      .flatMap(_.collect { case pr: ProjectExec => pr })
    val all = plan.collect { case pr: ProjectExec => pr }
    assert(all.nonEmpty && all.size == inWscg.size, s"encode projection fell out of WSCG:\n$plan")
    assert(!plan.toString.contains("Exchange"), s"encode must be map-side only:\n$plan")
    // learned merges strictly compress vs character tokenization
    val chars = docs
      .select(Bpe.tokenCount(col("text"), Bpe.Merges(Vector.empty)).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val bpe = df.agg(sum(col("n"))).head().getLong(0)
    assert(bpe < chars, s"bpe=$bpe chars=$chars")
    assert(bpe > 0)
  }
}
