package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence-packing invariants on a corpus with known token counts, plus
  * the greedy/chunked semantic differences on crafted edge cases
  * (oversize docs, exact-fit boundaries, zero-token docs).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // (id, n_tokens) — one stream; budget 10
  private lazy val docs = Seq(
    (1L, 4L), (2L, 5L), (3L, 3L), (4L, 10L), (5L, 12L), (6L, 1L), (7L, 0L), (8L, 7L)
  ).toDF("id", "n")

  private def packed =
    Packing.pack(docs, col("id"), col("n"), lit(0L), col("id"), budget = 10L)

  test("chunked pack: prefix-sum layout — offsets chain, straddles span packs") {
    val rows = packed.orderBy("id").collect()
    // cumulative prefix: 0,4,9,12,22,34,35,35
    val expect = Seq(
      // id, pack_id, pack_offset, n_packs
      (1L, 0L, 0L, 1L), // [0,4)
      (2L, 0L, 4L, 1L), // [4,9)
      (3L, 0L, 9L, 2L), // [9,12) straddles the pack-0/1 cut
      (4L, 1L, 2L, 2L), // [12,22) straddles 1/2
      (5L, 2L, 2L, 2L), // [22,34) straddles 2/3
      (6L, 3L, 4L, 1L), // [34,35)
      (7L, 3L, 5L, 1L), // zero-token doc: starts (and ends) at 35
      (8L, 3L, 5L, 2L) // [35,42) straddles 3/4
    )
    assert(rows.map(r =>
      (r.getAs[Long]("id"), r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset"),
        r.getAs[Long]("n_packs"))).toSeq == expect)
  }

  test("chunked pack: streams are independent and deterministic under repartition") {
    val d = docs.withColumn("part", pmod(col("id"), lit(3)))
    val a = Packing.pack(d, col("id"), col("n"), col("part"), col("id"), 10L)
      .orderBy("id").collect().toSeq
    val b = Packing.pack(d.repartition(7), col("id"), col("n"), col("part"), col("id"), 10L)
      .orderBy("id").collect().toSeq
    assert(a == b)
    // each stream's layout starts at pack 0 offset 0
    val firstPerPart = Packing.pack(d, col("id"), col("n"), col("part"), col("id"), 10L)
      .groupBy("part").agg(min_by(struct(col("pack_id"), col("pack_offset")), col("id")).as("f"))
      .select(col("f.pack_id"), col("f.pack_offset")).collect()
    assert(firstPerPart.forall(r => r.getLong(0) == 0L && r.getLong(1) == 0L))
  }

  test("packStats: every pack full except the last; totals consistent") {
    val stats = Packing.packStats(packed, budget = 10L).collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getAs[Long]("n_docs") == 8L)
    assert(r.getAs[Long]("total_tokens") == 42L)
    assert(r.getAs[Long]("n_packs") == 5L) // ceil(42/10)
    assert(r.getAs[Long]("last_fill") == 2L) // 42 % 10
  }

  test("greedy pack: no pack exceeds the budget unless a single doc does") {
    val out = Packing.packGreedy(docs, col("id"), col("n"), lit(0L), col("id"), 10L)
    val perPack = out.groupBy("part", "pack_id")
      .agg(sum(col("n_tokens")).as("fill"), count(lit(1)).as("n"))
      .collect()
    perPack.foreach { r =>
      val fill = r.getAs[Long]("fill")
      // overflow allowed only for a singleton oversize doc
      assert(fill <= 10L || r.getAs[Long]("n") == 1L, s"pack $r overflows with multiple docs")
    }
    // every doc assigned exactly once
    assert(out.count() == 8L)
    assert(out.select("id").distinct().count() == 8L)
  }

  test("greedy pack: order preserved, offsets are within-pack prefix sums") {
    val rows = Packing.packGreedy(docs, col("id"), col("n"), lit(0L), col("id"), 10L)
      .orderBy("id").collect()
    // greedy fill at budget 10 over n = 4,5,3,10,12,1,0,7:
    // pack0=[1,2] (4+5=9, +3 would be 12>10), pack1=[3] then 10 won't fit → 3 alone? no:
    // fill=3, +10 → 13>10 → close; pack2=[4] (exactly 10), pack3=[5] (oversize 12),
    // pack4=[6,7,8] (1+0+7=8)
    val got = rows.map(r =>
      (r.getAs[Long]("id"), r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset"))).toSeq
    val expect = Seq(
      (1L, 0L, 0L), (2L, 0L, 4L), (3L, 1L, 0L), (4L, 2L, 0L),
      (5L, 3L, 0L), (6L, 4L, 0L), (7L, 4L, 1L), (8L, 4L, 1L)
    )
    assert(got == expect)
    // pack ids are dense per stream
    val ids = rows.map(_.getAs[Long]("pack_id")).distinct.sorted.toSeq
    assert(ids == (0L to 4L).toSeq)
  }

  test("greedy vs chunked: greedy wastes tokens but never splits a doc") {
    val chunked = packed
    val greedy = Packing.packGreedy(docs, col("id"), col("n"), lit(0L), col("id"), 10L)
    // chunked: every doc with n_packs == 1 fits inside one pack; straddlers exist
    assert(chunked.filter(col("n_packs") > 1).count() > 0)
    // greedy: by construction nothing spans packs — the doc's whole length
    // sits at its offset; verify offset + n <= budget OR singleton oversize
    val bad = greedy.filter(col("pack_offset") + col("n_tokens") > 10L && col("pack_offset") > 0L)
    assert(bad.count() == 0)
  }
}
