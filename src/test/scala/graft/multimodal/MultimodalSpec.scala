package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The REAL image kernel: javax.imageio decode of the committed fixture
  * images, graded against their generation-time ground truth, plus the
  * binary→binary resize transform.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeImages: fixture dimensions, bands, and PNG pixel sums match ground truth") {
    val out = Multimodal
      .decodeImages(Multimodal.fixtureImages(spark))
      .collect()
      .map(f => f.id -> f)
      .toMap
    assert(out.size == Multimodal.FixtureImages.size)
    Multimodal.FixtureImages.foreach { case (id, name, w, h, pixelSum) =>
      val f = out(id)
      assert(f.ok, s"$name must decode")
      assert(f.width.contains(w) && f.height.contains(h), s"$name dims")
      assert(f.bands.contains(3), s"$name bands")
      if (name.endsWith(".png")) assert(f.pixel_sum.contains(pixelSum), s"$name pixel sum")
      else assert(f.pixel_sum.isEmpty, "lossy formats must not publish a pixel sum")
      assert(f.format.contains(if (name.endsWith(".png")) "png" else "jpeg"))
    }
  }

  test("decodeImages: corrupt and empty bytes degrade to ok=false rows, never errors") {
    val bad = Seq(
      (1L, "plainly not an image".getBytes("UTF-8")),
      (2L, Array.emptyByteArray),
      (3L, Array.tabulate[Byte](64)(i => (i * 37).toByte))
    ).toDF("id", "content")
    val out = Multimodal.decodeImages(bad).collect()
    assert(out.length == 3 && out.forall(f => !f.ok && f.width.isEmpty && f.pixel_sum.isEmpty))
  }

  test("imageGridSignatures: 7x5 fixture's grid-1 signature equals its known mean intensity") {
    // pixelSum(img0) = 3605 over 7*5*3 samples; micro mean = (1e6*3605 + 52)/105
    val media = Multimodal.fixtureImages(spark).filter(col("id") === 0L)
    val sig = Multimodal.imageGridSignatures(media, grid = 1)
      .collect()(0).getSeq[Long](1)
    assert(sig.toList == List((1000000L * 3605L + 52L) / 105L))
  }

  test("imageEmbedding: real pixels to vectors — deterministic, resize-stable, ANN-composable") {
    val media = Multimodal.fixtureImages(spark)
    def embMap(d: org.apache.spark.sql.DataFrame) =
      Multimodal.imageEmbedding(d).collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val e1 = embMap(media)
    assert(e1.size == 5, "all five fixtures (incl. the jpeg) decode to embeddings")
    assert(embMap(media) == e1, "identical bytes give identical embeddings")
    // undecodable rows are dropped, not nulled
    val junk = Seq((9L, "junk".getBytes("UTF-8"))).toDF("id", "content")
    assert(Multimodal.imageEmbedding(junk).count() == 0)
    // downscaling preserves the pooled structure. Checked at grid=2 so no
    // fixture's resized dims drop below the grid (a 32x8 image resized to
    // 8x2 leaves 4x4 grid ROWS empty — a real structural change, not noise)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    }
    def embMap2(d: org.apache.spark.sql.DataFrame) =
      Multimodal.imageEmbedding(d, grid = 2).collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val c1 = embMap2(media)
    val c2 = embMap2(Multimodal.resizeImages(media, maxDim = 8))
    c1.keys.foreach { id =>
      assert(cos(c1(id), c2(id)) > 0.95, s"fixture $id: resize must preserve the grid-2 signature")
    }
    // the embedding column feeds the ANN operator unchanged: an exact-dup
    // image ranks itself (copy id) as its nearest neighbor
    val withDup = media.unionByName(
      media.filter(col("id") === 1L).select(lit(100L).as("id"), col("name"), col("content")))
    val emb = Multimodal.imageEmbedding(withDup)
    val top = graft.ann.Ann.bruteForceTopK(
      emb, emb.filter(col("id") === 100L), "id", "embedding", "id", "embedding", 1)
    assert(top.collect()(0).getAs[Long]("neighbor_id") == 1L)
  }

  test("syntheticImages: generated PNGs round-trip the codec to the fixture ground truth") {
    // key 0 at 7x5 renders the same pixels as the committed img0 fixture,
    // so its decode must reproduce img0's known dimensions and pixel sum
    val ids = Seq(0L).toDF("doc_id")
    val img = Multimodal.syntheticImages(ids, "doc_id", w = 7, h = 5)
    val f = Multimodal.decodeImages(img).collect()(0)
    assert(f.ok && f.format.contains("png") && f.width.contains(7) && f.height.contains(5))
    assert(f.pixel_sum.contains(3605L))
    // and its grid signature equals the fixture's (same pixels, same pooling)
    val sigSynth = Multimodal.imageGridSignatures(img, grid = 4).collect()(0).getSeq[Long](1)
    val sigFix = Multimodal
      .imageGridSignatures(Multimodal.fixtureImages(spark).filter(col("id") === 0L), grid = 4)
      .collect()(0).getSeq[Long](1)
    assert(sigSynth == sigFix)
  }

  test("audio: synthetic WAVs round-trip the JDK codec to formula-exact features") {
    // clip 0: s_i = (i*7919 % 65536) - 32768 for i in 0..399 — replay the
    // expected integer facts directly
    val expected = (0 until 400).map(i => ((i.toLong * 7919L) % 65536L) - 32768L)
    val ids = Seq(0L).toDF("doc_id")
    val f = Audio.audioFeatures(Audio.syntheticAudio(ids, "doc_id")).collect()(0)
    assert(f.ok && f.sample_rate.contains(8000) && f.channels.contains(1))
    assert(f.n_frames.contains(400L))
    assert(f.sum_squares.contains(expected.map(s => s * s).sum))
    assert(f.peak_abs.contains(expected.map(math.abs).max.toInt))
    // corrupt and non-PCM bytes degrade to ok=false rows, never errors
    val junk = Seq((1L, "definitely not a wav".getBytes("UTF-8")), (2L, Array.emptyByteArray))
      .toDF("id", "content")
    val bad = Audio.audioFeatures(junk).collect()
    assert(bad.length == 2 && bad.forall(r => !r.ok && r.sum_squares.isEmpty))
  }

  test("video: synthetic animated GIFs round-trip the codec to formula-exact frame means") {
    // clip 0, 12 frames of 8x8 gray g = (x*7 + y*13 + f*31) % 256; 4
    // samples land on frames 0,3,6,9 — replay the expected means directly
    def mean(f: Long): Long = {
      val sum = (for (y <- 0 until 8; x <- 0 until 8) yield (x * 7 + y * 13 + f * 31) % 256).sum
      (1000000L * sum + 32) / 64
    }
    val ids = Seq(0L).toDF("doc_id")
    val out = Video.sampleFrameMeans(Video.syntheticClips(ids, "doc_id"), n = 4)
      .collect().map(m => m.frame_idx -> m.mean_micro).toMap
    assert(out == Map(0L -> mean(0), 3L -> mean(3), 6L -> mean(6), 9L -> mean(9)))
    // corrupt bytes are dropped, never errors
    val junk = Seq((1L, "not a gif".getBytes("UTF-8"))).toDF("id", "content")
    assert(Video.sampleFrameMeans(junk, n = 4).count() == 0)
    // a clip with fewer frames than requested yields each frame ONCE —
    // no duplicate (id, frame_idx) rows for downstream aggregates
    val short = Video.syntheticClips(Seq(7L).toDF("doc_id"), "doc_id", frames = 2)
    val sampled = Video.sampleFrameMeans(short, n = 4).collect()
    assert(sampled.map(_.frame_idx).sorted.toSeq == Seq(0L, 1L))
  }

  test("cross-pillar: image embeddings drive a persisted CDC-maintained ANN index") {
    import graft.ann.Ann
    // real pixels → vectors → bucket-partitioned LSH index on disk
    val ids = (0L until 40L).toDF("doc_id")
    val emb = Multimodal.imageEmbedding(
      Multimodal.syntheticImages(ids, "doc_id"), grid = 4)
    val dir = graft.util.TempDirs.scratch("mm-ann-cdc").toString
    Ann.writeLshIndex(emb, dir, "id", "embedding", planes = 6, dim = 16)
    // probe the index with image 5's own embedding and remember the
    // neighborhood (the formula's mod-256 structure gives same-residue
    // images similar pooled signatures)
    val q5 = emb.filter(col("id") === 5L)
    def neighbors() = Ann
      .lshTopKIndexed(dir, q5, "id", "embedding", 10, planes = 6, dim = 16)
      .collect().map(_.getLong(1)).toSet
    val before = neighbors()
    assert(before.nonEmpty)
    // a CDC DELETE of one neighbor must leave the probe surface; the
    // UPDATE flow (delete + re-append) must bring it back
    val victim = before.head
    Ann.deleteFromLshIndex(spark, dir, Seq(victim).toDF("id"))
    assert(!neighbors().contains(victim), "deleted image still retrievable")
    Ann.appendLshIndex(
      emb.filter(col("id") === victim), dir, "id", "embedding", planes = 6, dim = 16)
    assert(neighbors() == before, "re-added image must restore the original neighborhood")
    graft.util.TempDirs.delete(java.nio.file.Paths.get(dir))
  }

  test("resizeImages: aspect-preserving downscale, PNG re-encode, pass-through under budget") {
    val media = Multimodal.fixtureImages(spark)
    val resized = Multimodal.resizeImages(media, maxDim = 8)
    val dims = Multimodal
      .decodeImages(resized)
      .collect()
      .map(f => f.id -> ((f.width.get, f.height.get, f.format.get)))
      .toMap
    assert(dims(1L) == ((8, 8, "png")), "16x16 shrinks to 8x8")
    assert(dims(3L) == ((8, 2, "png")), "32x8 shrinks to 8x2, aspect kept")
    assert(dims(4L) == ((8, 3, "png")), "24x10 jpeg shrinks and re-encodes as png")
    assert(dims(0L) == ((7, 5, "png")), "7x5 already within budget")
    // within-budget rows pass through BYTE-identical (no re-encode)
    val origBytes = media.filter(col("id") === 0L).select("content").collect()(0).getAs[Array[Byte]](0)
    val newBytes = resized.filter(col("id") === 0L).select("content").collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(origBytes, newBytes))
    // undecodable rows pass through untouched
    val junk = Seq((9L, "junk bytes".getBytes("UTF-8"))).toDF("id", "content")
    val throughJunk = Multimodal.resizeImages(junk, maxDim = 8)
      .collect()(0).getAs[Array[Byte]]("content")
    assert(new String(throughJunk, "UTF-8") == "junk bytes")
  }

  test("mixedFeatures: one pass routes each kind to its real codec; corrupt bytes degrade") {
    val ids = (0L until 9L).toDF("doc_id")
    val media = Multimodal.mixedMediaCorpus(ids, "doc_id")
    // each id got exactly one kind by id % 3
    val kinds = media.select("id", "kind").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L until 9L).forall(i =>
      kinds(i) == Seq("image", "audio", "video")((i % 3).toInt)))
    val feats = Multimodal.mixedFeatures(media).collect().map(f => f.id -> f).toMap
    assert(feats.values.forall(_.ok))
    // kind-specific facts equal the single-kind kernels' ground truth
    assert(feats(0L).units == 256L, "image units = 16x16 pixels")
    assert(feats(1L).units == 400L, "audio units = PCM frames")
    assert(feats(2L).units == 4L, "video units = sampled frames")
    // image feature equals the pixel-formula sum computed directly
    val expectImg = (for { x <- 0 until 16; y <- 0 until 16 } yield
      (x * 7 + y * 13) % 256 + (x * 3 + y * 5) % 256 + (x * 11 + y * 2) % 256).map(_.toLong).sum
    assert(feats(0L).feature == expectImg)
    // a corrupt row of each kind degrades to ok=false, never throws
    val junk = Seq(
      (100L, "image", "nope".getBytes("UTF-8")),
      (101L, "audio", "nope".getBytes("UTF-8")),
      (102L, "video", "nope".getBytes("UTF-8"))
    ).toDF("id", "kind", "content")
    val bad = Multimodal.mixedFeatures(junk).collect()
    assert(bad.length == 3 && bad.forall(f => !f.ok && f.units == -1L && f.feature == -1L))
  }
}
