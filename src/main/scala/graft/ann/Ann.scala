package graft.ann

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: the query set is small and broadcast; the corpus is the
  * big side and is only ever scanned, never shuffled by vector. Brute force
  * is the exact baseline (one broadcast-join pass, top-k via per-query
  * window). The IVF variant buys a ~(nprobe/nlists) scan reduction by
  * partitioning the corpus into coarse cells once (an O(n·nlists) assign
  * pass, amortized across all future queries); LSH buckets do the same with
  * zero training. At 100 TB the assign pass writes a bucketed/partitioned
  * layout so a probe prunes file groups instead of rows.
  */
object Ann {

  /** Exact top-k by cosine: broadcast queries × corpus scan → window rank.
    * Output: (qid, neighbor_id, cosine_e4, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      id: String,
      vec: String,
      qid: String,
      qvec: String,
      k: Int
  ): DataFrame = {
    val scored = corpus
      .select(col(id).as("neighbor_id"), col(vec).as("v"))
      .crossJoin(broadcast(queries.select(col(qid).as("qid"), col(qvec).as("qv"))))
      .filter(col("neighbor_id") =!= col("qid"))
      .select(col("qid"), col("neighbor_id"), VF.cosine(col("v"), col("qv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("qid"),
        col("neighbor_id"),
        round(col("cos") * 10000).cast("long").as("cosine_e4"),
        col("rank").cast("long").as("rank")
      )
  }

  /** Lloyd iterations for coarse IVF centroids: assign each vector to its
    * nearest centroid, replace centroids with per-cell mean vectors.
    * Means via posexplode + per-position average — two shuffles per
    * iteration, centroid set always broadcast-sized.
    */
  def refineCentroids(
      v: DataFrame, // (cid, cv)
      centroids: DataFrame, // (cell, centroid)
      iterations: Int
  ): DataFrame = {
    var c = centroids
    for (_ <- 0 until iterations) {
      val wAssign = Window.partitionBy(col("cid")).orderBy(col("sim").desc, col("cell"))
      val assigned = v
        .crossJoin(broadcast(c))
        .select(col("cid"), col("cv"), col("cell"), VF.cosine(col("cv"), col("centroid")).as("sim"))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
      c = assigned
        .select(col("cell"), posexplode(col("cv").cast("array<double>")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(
          transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            x => x("m")
          ).as("centroid")
        )
    }
    c
  }

  /** IVF (inverted-file) ANN: assign corpus vectors to `nlists` coarse
    * centroids (deterministically seeded from the corpus, refined with
    * `refine` Lloyd iterations), probe the `nprobe` nearest cells per query,
    * exact-rank within the probed cells.
    * Output: (qid, neighbor_id, cosine_e4, rank).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      id: String,
      vec: String,
      qid: String,
      qvec: String,
      k: Int,
      nlists: Int = 16,
      nprobe: Int = 4,
      refine: Int = 1
  ): DataFrame = {
    val v = corpus.select(col(id).as("cid"), col(vec).as("cv"))
    // deterministic seeds: first nlists ids, then Lloyd refinement
    val seeds = v.orderBy(col("cid")).limit(nlists)
      .select(col("cid").as("cell"), col("cv").as("centroid"))
    val centroids = broadcast(refineCentroids(v, seeds, refine))
    val wAssign = Window.partitionBy(col("cid")).orderBy(col("sim").desc, col("cell"))
    val assigned = v
      .crossJoin(centroids)
      .select(col("cid"), col("cv"), col("cell"), VF.cosine(col("cv"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("cid"), col("cv"), col("cell"))
    val q = queries.select(col(qid).as("qid"), col(qvec).as("qv"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cell"))
    val probes = q
      .crossJoin(centroids)
      .select(col("qid"), col("qv"), col("cell"), VF.cosine(col("qv"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor_id"))
    assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid").as("neighbor_id"), VF.cosine(col("cv"), col("qv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("qid"),
        col("neighbor_id"),
        round(col("cos") * 10000).cast("long").as("cosine_e4"),
        col("rank").cast("long").as("rank")
      )
  }

  /** LSH-bucketed ANN: hyperplane signature as the cell id; probe only the
    * query's bucket (plus optional multi-probe neighbors at Hamming 1).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      id: String,
      vec: String,
      qid: String,
      qvec: String,
      k: Int,
      planes: Int = 6,
      dim: Int = 64
  ): DataFrame = {
    val bucketed = corpus.select(
      col(id).as("neighbor_id"),
      col(vec).as("v"),
      VF.hyperplaneBucket(col(vec), planes, dim).as("bucket")
    )
    val q = queries.select(
      col(qid).as("qid"),
      col(qvec).as("qv"),
      VF.hyperplaneBucket(col(qvec), planes, dim).as("bucket")
    )
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor_id"))
    bucketed
      .join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("qid"))
      .select(col("qid"), col("neighbor_id"), VF.cosine(col("v"), col("qv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("qid"),
        col("neighbor_id"),
        round(col("cos") * 10000).cast("long").as("cosine_e4"),
        col("rank").cast("long").as("rank")
      )
  }
}
