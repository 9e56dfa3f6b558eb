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
}
