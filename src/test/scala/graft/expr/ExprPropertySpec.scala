package graft.expr

import graft.SparkSpec
import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests: the native expressions must agree with straightforward
  * model implementations on arbitrary inputs (the custom-codegen analogue of
  * the reference's transform/`_meta` unit suites).
  */
class ExprPropertySpec extends SparkSpec {

  /** Deterministic sampling from a ScalaCheck generator (the scalatest
    * bridge artifact is not in the offline cache).
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val p0 = org.scalacheck.Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(p0, org.scalacheck.rng.Seed(42L + i)))
  }
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("WordShingles matches the declarative model on arbitrary texts") {
    samples(Gen.listOfN(8, text), 20).foreach { texts =>
      {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
        val native = df
          .select(col("id"), TextFunctions.wordShingles(col("t"), 3).as("sh"))
          .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        // model: distinct n-grams over whitespace tokens, short text = all tokens
        val model = texts.zipWithIndex.map { case (t, i) =>
          val toks = t.trim.split("\\s+").toSeq
          val upper = math.max(toks.length - 3, 0)
          i.toLong -> (0 to upper).map(j => toks.slice(j, j + 3).mkString(" ")).distinct
        }.toMap
        assert(native == model)
      }
    }
  }

  test("SquashMeta matches a model fold on arbitrary lineage arrays") {
    val entry = for {
      t <- Gen.oneOf("ta", "tb", "tc")
      p <- Gen.oneOf("p1", "p2")
      v <- Gen.choose(0, 30).map(_.toString)
    } yield (t, p, v)
    samples(Gen.listOf(entry), 20).foreach { entries =>
      val df = Seq(Tuple1(entries)).toDF("raw")
        .select(
          expr("transform(raw, x -> named_struct('table', x._1, 'pk', x._2, 'value', x._3))").as("lin")
        )
      val got = df
        .select(graft.assemble.DocAssembler.squashMeta(col("lin")).as("m"))
        .collect().head
        .getAs[scala.collection.Map[String, scala.collection.Map[String, scala.collection.Seq[String]]]]("m")
        .map { case (k, v) => k -> v.map { case (k2, v2) => k2 -> v2.toList }.toMap }
        .toMap
      // model: insertion-ordered nesting, sorted distinct values
      val model = entries
        .groupBy(_._1).view
        .mapValues(es => es.groupBy(_._2).view.mapValues(_.map(_._3).distinct.sorted.toList).toMap)
        .toMap
      assert(got == model)
    }
  }

  test("SquashMeta dictionary path agrees with the legacy 3-field path") {
    val dict = Seq(("ta", "p1"), ("ta", "p2"), ("tb", "p1"), ("tc", "p2"))
    val entry = for {
      k <- Gen.choose(0, dict.length - 1)
      v <- Gen.choose(0, 30).map(_.toString)
    } yield (k, v)
    samples(Gen.listOf(entry), 20).foreach { entries =>
      val encoded = Seq(Tuple1(entries)).toDF("raw")
        .select(expr("transform(raw, x -> named_struct('k', x._1, 'value', x._2))").as("lin"))
        .select(graft.assemble.DocAssembler.squashMeta(col("lin"), dict).as("m"))
      val legacy = Seq(Tuple1(entries.map { case (k, v) => (dict(k)._1, dict(k)._2, v) })).toDF("raw")
        .select(expr("transform(raw, x -> named_struct('table', x._1, 'pk', x._2, 'value', x._3))").as("lin"))
        .select(graft.assemble.DocAssembler.squashMeta(col("lin")).as("m"))
      def read(df: org.apache.spark.sql.DataFrame) = df.collect().head
        .getAs[scala.collection.Map[String, scala.collection.Map[String, scala.collection.Seq[String]]]]("m")
        .map { case (k, v) => k -> v.map { case (k2, v2) => k2 -> v2.toList }.toMap }
        .toMap
      assert(read(encoded) == read(legacy))
    }
  }

  test("VectorBinaryOp cosine/dot match double-precision model computation") {
    val vec = Gen.listOfN(16, Gen.choose(-100, 100).map(_ / 10.0f)).suchThat(v => v.exists(_ != 0f))
    samples(Gen.zip(vec, vec), 20).foreach { case (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val row = df.select(
        VectorFunctions.dot(col("a"), col("b")).as("d"),
        VectorFunctions.cosine(col("a"), col("b")).as("c")
      ).collect().head
      val dotM = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(row.getDouble(0) - dotM) < 1e-9)
      assert(math.abs(row.getDouble(1) - dotM / (na * nb)) < 1e-9)
    }
  }

  test("concat drops Python-falsy values (null, 0, empty string, false) like filter(None, ...)") {
    val df = Seq((0L, "", false, "x", 5L, null.asInstanceOf[String], "0"))
      .toDF("z", "e", "f", "s", "n", "nl", "zs")
    val names = Seq("z", "e", "f", "s", "n", "nl", "zs")
    val fields = graft.assemble.DocAssembler.applyTransforms(
      graft.schema.TransformSpec(
        concat = Seq(graft.schema.ConcatSpec(names, "cc", "-"))
      ),
      names.map(c => c -> col(c)),
      resolveType = c => scala.util.Try(df.select(c).schema.head.dataType).toOption
    )
    val out = df.select(fields.map { case (n, c) => c.as(n) }: _*).collect().head
    // 0, "", false, null all dropped; "0" is a truthy non-empty string — kept
    assert(out.getAs[String]("cc") == "x-5-0")
  }

  test("transforms: concat after rename sees renamed fields; replace precedes both") {
    samples(Gen.alphaLowerStr.suchThat(_.nonEmpty), 10).foreach { s =>
      val df = Seq((1L, s)).toDF("id", "v")
      val fields = graft.assemble.DocAssembler.applyTransforms(
        graft.schema.TransformSpec(
          replace = Map("v" -> Map("a" -> "z")),
          rename = Map("v" -> "w"),
          concat = Seq(graft.schema.ConcatSpec(Seq("w", "w"), "ww", "-"))
        ),
        Seq("id" -> col("id"), "v" -> col("v"))
      )
      val out = df.select(fields.map { case (n, c) => c.as(n) }: _*).collect().head
      val replaced = s.replace("a", "z")
      assert(out.getAs[String]("w") == replaced)
      assert(out.getAs[String]("ww") == s"$replaced-$replaced")
    }
  }
}
