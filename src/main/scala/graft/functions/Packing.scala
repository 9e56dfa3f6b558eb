package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget training
  * sequences ("packs"). The step between a deduplicated/filtered corpus and
  * a pretraining dataloader — every document must land in exactly one place
  * in some fixed-length sequence, deterministically, so that a re-run (or an
  * external auditor) reproduces the same layout.
  *
  * Two semantics, matching the two packing styles in published pipelines:
  *
  *   - [[pack]] — concatenate-and-chunk: documents are concatenated in
  *     stream order and the token stream is cut every `budget` tokens
  *     (documents may straddle a cut; the consumer splits them). This is a
  *     pure prefix-sum — one window per stream — and is exactly replayable
  *     in any SQL engine, so it carries the oracle.
  *   - [[packGreedy]] — whole-document first-fit: a document is never
  *     split; a pack closes when the next document would overflow the
  *     budget. The running state (current fill) is not a prefix sum — each
  *     decision depends on the previous one non-linearly — so it runs as a
  *     single-pass partition-local fold (same no-exchange idiom as
  *     `Sampling.quota` phase 1) and is spec-verified by its invariants.
  *
  * Scale shape: documents are salted into `parts` independent streams by a
  * caller-supplied expression (pass a hash of the id at scale; any
  * deterministic expression works). Each stream is one window partition —
  * `parts` should scale with the cluster, keeping every stream's sort
  * comfortably inside one task. No stage sees more than one shuffle on the
  * stream key; all arithmetic is whole-stage codegen.
  */
object Packing {

  /** Concatenate-and-chunk packing. Within each stream (value of `part`),
    * documents are ordered by `order` and concatenated; the stream is cut
    * into packs of exactly `budget` tokens. A document starts in pack
    * `floor(prev_cumsum / budget)` at offset `prev_cumsum % budget` and
    * spans `n_packs` consecutive packs (1 unless it straddles a cut).
    *
    * Output: (id, part, pack_id, pack_offset, n_tokens, n_packs).
    */
  def pack(
      docs: DataFrame,
      id: Column,
      tokens: Column,
      part: Column,
      order: Column,
      budget: Long
  ): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val w = Window
      .partitionBy(col("part"))
      .orderBy(col("order"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(
        id.as("id"),
        tokens.cast("long").as("n_tokens"),
        part.cast("long").as("part"),
        order.as("order")
      )
      .withColumn("prev", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("id"),
        col("part"),
        floor(col("prev") / budget).as("pack_id"),
        (col("prev") % budget).as("pack_offset"),
        col("n_tokens"),
        (floor((col("prev") + greatest(col("n_tokens"), lit(1L)) - 1) / budget)
          - floor(col("prev") / budget) + 1).as("n_packs")
      )
  }

  /** Per-stream packing summary for [[pack]] output: number of packs the
    * stream produced and the fill of its final (only partial) pack — every
    * other pack is exactly `budget` full by construction.
    * Output: (part, n_docs, total_tokens, n_packs, last_fill).
    */
  def packStats(assignment: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    assignment
      .groupBy(col("part"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens")
      )
      .select(
        col("part"),
        col("n_docs"),
        col("total_tokens"),
        ceil(col("total_tokens").cast("double") / budget).cast("long").as("n_packs"),
        when(col("total_tokens") % budget === 0, lit(budget))
          .otherwise(col("total_tokens") % budget)
          .as("last_fill")
      )
  }

  /** Whole-document first-fit packing: documents are taken in (`part`,
    * `order`) order; each pack accumulates documents until the next would
    * exceed `budget`, then a new pack opens. A document larger than the
    * budget gets a pack of its own (it is never split — the caller decides
    * whether to truncate or drop oversize docs upstream).
    *
    * One exchange on the stream key, then a single partition-local pass
    * with O(1) state — the fold cannot be expressed as a window function
    * because the pack boundary depends on the running fill, not on a
    * prefix sum of the input alone.
    *
    * Output: (id, part, pack_id, pack_offset, n_tokens).
    */
  def packGreedy(
      docs: DataFrame,
      id: Column,
      tokens: Column,
      part: Column,
      order: Column,
      budget: Long
  ): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val prepared = docs
      .select(
        id.as("id"),
        tokens.cast("long").as("n_tokens"),
        part.cast("long").as("part"),
        order.as("order")
      )
      .repartition(col("part"))
      .sortWithinPartitions(col("part"), col("order"))
    val schema = org.apache.spark.sql.types.StructType(
      prepared.schema.fields.filterNot(_.name == "order") ++ Seq(
        org.apache.spark.sql.types.StructField("pack_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("pack_offset", org.apache.spark.sql.types.LongType)
      )
    )
    val idIdx = prepared.schema.fieldIndex("id")
    val tokIdx = prepared.schema.fieldIndex("n_tokens")
    val partIdx = prepared.schema.fieldIndex("part")
    prepared.mapPartitions { it =>
      var curPart: Long = 0L
      var seen = false
      var packId = 0L
      var fill = 0L
      it.map { r =>
        val p = r.getLong(partIdx)
        val t = r.getLong(tokIdx)
        if (!seen || p != curPart) { curPart = p; seen = true; packId = 0L; fill = 0L }
        if (fill > 0 && fill + t > budget) { packId += 1; fill = 0L }
        val offset = fill
        fill += t
        org.apache.spark.sql.Row(r.get(idIdx), t, p, packId, offset)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
      .select(col("id"), col("part"), col("pack_id"), col("pack_offset"), col("n_tokens"))
  }
}
