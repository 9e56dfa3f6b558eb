package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL frame-sampling kernel over multi-frame containers: animated GIF is
  * the one multi-frame format the JDK can both write and read
  * (`javax.imageio`), so the video-shaped leg of the multimodal pillar —
  * open container, count frames, decode evenly-spaced sample frames,
  * extract a per-frame feature — runs against actual codec bytes, the same
  * way the image ([[Multimodal.ImageDecoder]]) and audio
  * ([[Audio.WavDecoder]]) legs do. A true video codec (H.264 etc.) is not
  * in the JDK; it would occupy the same per-partition decoder slot with
  * identical sampling arithmetic.
  *
  * Grayscale 256-entry-palette frames make the GIF round trip EXACT (each
  * sample is a palette index), so the synthetic corpus's expected per-frame
  * means are pure integer arithmetic an external engine can replay — the
  * [[Multimodal.syntheticImages]] / [[Audio.syntheticAudio]] grading
  * pattern.
  */
object Video {

  /** One sampled frame's feature: mean gray in integer micro-units
    * (half-up: `(1e6·sum + npx/2) / npx`).
    */
  final case class FrameMean(id: Long, frame_idx: Long, mean_micro: Long)

  /** Real multi-frame decoder; per-partition lazy init like its image and
    * audio siblings.
    */
  final class FrameDecoder {
    private var ready = false
    def init(): Unit = {
      javax.imageio.ImageIO.setUseCache(false)
      ready = true
    }

    /** Sample min(`n`, numFrames) evenly spaced DISTINCT frames
      * (`j·numFrames/take`) and return (frameIdx, meanIntensityMicro) per
      * sample — a clip with fewer frames than requested yields each frame
      * once, never duplicate (id, frame_idx) rows. Intensity is the mean
      * over the R, G and B channels of the decoded frame (≡ the gray value
      * for grayscale sources). Frames are read as STORED: full-frame clips
      * (this module's synthetic corpus, unoptimized GIFs) decode exactly;
      * an optimizer's partial/changed-rect frames would need
      * disposal-aware compositing onto a canvas — same decoder slot,
      * documented out of scope like the compressed codecs. None for bytes
      * no reader understands; never throws on bad input.
      */
    def sampleFrameMeans(content: Array[Byte], n: Int): Option[Seq[(Long, Long)]] = {
      require(ready, "decoder used before init()")
      if (content == null || content.isEmpty) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(content))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val reader = readers.next()
          try {
            reader.setInput(iis, false, false)
            val numFrames = reader.getNumImages(true)
            if (numFrames <= 0) return None
            val take = math.min(n, numFrames)
            val out = (0 until take).map { j =>
              val f = j.toLong * numFrames / take
              val img = reader.read(f.toInt)
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sum += (rgb & 0xff) + ((rgb >> 8) & 0xff) + ((rgb >> 16) & 0xff)
                  x += 1
                }
                y += 1
              }
              val npx = w.toLong * h * 3
              (f, if (npx == 0) 0L else (1000000L * sum + npx / 2) / npx)
            }
            Some(out)
          } finally reader.dispose()
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Synthetic multi-frame corpus at DATA scale: clip k holds `frames`
    * grayscale `w`×`h` frames with pixel
    * `g(x, y, f) = (x·7 + y·13 + f·31 + k·29) mod 256`, encoded as an
    * animated GIF with an explicit 256-gray palette (exact round trip).
    * Generated distributed, no driver loop.
    */
  def syntheticClips(
      ids: DataFrame,
      id: String,
      w: Int = 8,
      h: Int = 8,
      frames: Int = 12
  ): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids
      .select(col(id).cast("long").as("id"))
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val grays = Array.tabulate[Byte](256)(_.toByte)
        val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
        it.map { k =>
          val bos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < frames) {
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
              val raster = img.getRaster
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  raster.setSample(x, y, 0, (((x * 7 + y * 13 + f * 31) + k * 29) % 256L).toInt)
                  x += 1
                }
                y += 1
              }
              writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
              f += 1
            }
            writer.endWriteSequence()
          } finally {
            ios.close()
            writer.dispose()
          }
          (k, bos.toByteArray)
        }
      }
      .toDF("id", "content")
  }

  /** Distributed real frame sampling — the video-shaped
    * [[Multimodal.decodeImages]]: decoder per PARTITION, `n` sampled
    * frames per clip as (id, frame_idx, mean_micro) rows; undecodable
    * clips are dropped.
    */
  def sampleFrameMeans(
      media: DataFrame,
      n: Int = 4,
      id: String = "id",
      content: String = "content"
  ): org.apache.spark.sql.Dataset[FrameMean] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col(id).cast("long").as("id"), col(content).as("content"))
      .as[Multimodal.BinaryRow]
      .mapPartitions { rows =>
        val dec = new FrameDecoder
        dec.init()
        rows.flatMap { r =>
          dec.sampleFrameMeans(r.content, n).toSeq.flatten
            .map { case (f, m) => FrameMean(r.id, f, m) }
        }
      }
  }
}
