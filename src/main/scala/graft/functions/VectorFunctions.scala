package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (`array<float>` / `array<double>`),
  * expressed as higher-order column expressions — stays inside whole-stage
  * codegen, no UDF boundary, no driver collect.
  */
object VectorFunctions {

  /** Dot product in double precision (cast first so accumulation order and
    * width match external engines).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Random-hyperplane LSH signature for cosine similarity: `planes` sign
    * bits, plane components derived deterministically from `hash(p, j)` —
    * no stored model, identical across executors.
    */
  def hyperplaneSignature(vec: Column, planes: Int): Column =
    array((0 until planes).map { p =>
      val proj = aggregate(
        zip_with(
          vec.cast("array<double>"),
          transform(
            sequence(lit(0), size(vec) - 1),
            j => (pmod(hash(lit(p), j), lit(2001)) - 1000).cast("double") / 1000.0
          ),
          (x, w) => x * w
        ),
        lit(0.0),
        (acc, v) => acc + v
      )
      when(proj >= 0, lit(1)).otherwise(lit(0))
    }: _*)

  /** Pack a sign-bit array into a single bucket id. */
  def packBits(bits: Column): Column =
    aggregate(
      bits,
      lit(0L),
      (acc, b) => acc * 2 + b
    )
}
