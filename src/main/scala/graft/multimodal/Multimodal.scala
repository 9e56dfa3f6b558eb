package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video treated as opaque `binary` columns
  * with typed metadata, processed by per-partition pipelines with lazy
  * heavyweight-decoder initialization.
  *
  * The decode step is a STUB (`FakeDecoder`): the image/audio libraries are
  * not in this container, so decoding is a clearly-marked deterministic fake.
  * Everything around it — schema, partitioning, batch shape, per-partition
  * lazy init, feature/resize/frame-sample plumbing — is the real Spark
  * pattern (equivalent to `mapInPandas` batches on the PySpark side, and to
  * the reference's heavyweight per-partition plugin clients,
  * `pgsync/plugins/sentence_transformer_plugin.py`).
  */
object Multimodal {

  /** A media row: opaque bytes + kind + metadata. */
  final case class MediaRow(id: Long, kind: String, content: Array[Byte])

  /** Extracted features (what a real decoder would produce). */
  final case class MediaFeatures(
      id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      checksum: Long,
      frames: Seq[Long]
  )

  /** STUB decoder — stands in for e.g. javax.imageio / ffmpeg bindings.
    * Deterministic pure function of the bytes so tests/oracles can verify
    * the pipeline; `init()` simulates the heavyweight one-time library load
    * that motivates per-partition (not per-row) initialization.
    */
  final class FakeDecoder {
    private var initialized = false
    def init(): Unit = { initialized = true } // real impl: load native libs
    def decode(content: Array[Byte]): (Int, Int, Long) = {
      require(initialized, "decoder used before init()")
      val n = content.length
      // STUB: real impl would parse the container format
      val checksum = content.take(64).foldLeft(0L)((a, b) => a + (b & 0xff))
      (n % 640, n % 480, checksum)
    }
  }

  /** Wrap a text table as fake media (bytes = utf-8 content) — test-corpus
    * adapter; production reads real binary columns from parquet.
    */
  def mediaFromDocuments(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).cast("long").as("id"),
      (when(pmod(col(id), lit(3)) === 0, "image")
        .when(pmod(col(id), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(text), "UTF-8").as("content")
    )

  /** Per-partition decode + feature extraction: decoder initialized once per
    * partition, rows streamed through — the batch shape a 100 TB run needs
    * (no per-row library init, no driver collect).
    */
  def extractFeatures(media: DataFrame, frameCount: Int = 4): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val decoder = new FakeDecoder
      decoder.init()
      rows.map { r =>
        val (w, h, checksum) = decoder.decode(r.content)
        val n = r.content.length.toLong
        // frame-sample: evenly spaced byte offsets (a real video decoder
        // would sample frames; the arithmetic shape is identical)
        val frames = (0 until frameCount).map(i => if (n == 0) 0L else i * n / frameCount)
        MediaFeatures(r.id, r.kind, n, w, h, checksum, frames)
      }
    }
  }

  /** STUB embedding extraction: deterministic pseudo-embedding derived from
    * the content bytes (a real pipeline loads an encoder per partition —
    * the reference's heavyweight plugin pattern,
    * `pgsync/plugins/sentence_transformer_plugin.py`). The output feeds the
    * [[graft.ann.Ann]] / [[graft.dedup.Dedup]] operators unchanged, which is
    * the point: multimodal content → embedding column → similarity/dedup is
    * one composable pipeline.
    */
  def embedStub(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val decoder = new FakeDecoder
      decoder.init() // real impl: load the encoder model once per partition
      rows.map { r =>
        // STUB: bytes → unit-scale pseudo-vector, deterministic in content
        val seed = r.content.foldLeft(1469598103934665603L)((h, b) => (h ^ (b & 0xff)) * 1099511628211L)
        val vec = Array.tabulate(dim) { i =>
          val x = seed * (2 * i + 1) + i
          ((x >>> 16) % 2001 - 1000) / 1000.0f
        }
        (r.id, vec)
      }
    }.toDF("id", "embedding")
  }

  /** "Resize": in the stub, recompute metadata at a target scale — the real
    * version maps content → content; the plumbing (binary in, binary out,
    * codegen-opaque boundary kept narrow) is what matters.
    */
  def resize(media: DataFrame, maxDim: Int): DataFrame =
    extractFeatures(media).toDF().select(
      col("id"),
      col("kind"),
      least(col("width"), lit(maxDim)).as("width"),
      least(col("height"), lit(maxDim)).as("height")
    )
}
