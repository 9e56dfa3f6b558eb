package graft.tools

import graft.ann.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN training-quality cell: recall@50 vs exact brute-force cosine for the
  * IVF and IVF-PQ families at the shipped `refine = 0` default (centroids /
  * codebooks seeded from the first-k corpus vectors by id — deterministic
  * and oracle-replayable) against a small Lloyd refinement (`refine = 2`,
  * same deterministic seeds) and a full-probe contrast (`nprobe = nlists`,
  * which removes cell-assignment misses entirely and isolates pure
  * quantization loss). This is the number that justifies — or indicts — the
  * refine-0 default on a given corpus: if prefix-seeded centroids cost
  * recall, the gap shows here before any 100 TB deployment bakes them into
  * a persisted index.
  *
  * Shared by [[MutationScale]] (sf0.1 / sf1 coverage inside the mutation
  * campaign) and runnable standalone on any corpus with an `embeddings`
  * table: `runMain graft.tools.RecallScale <sfDir> [outJson]`.
  */
object RecallScale {

  /** The five recall@50 numbers (insertion-ordered for stable JSON). */
  def measure(emb: DataFrame, queries: DataFrame): Seq[(String, Double)] = {
    val exact50 = Ann
      .bruteForceTopK(emb, queries, "vec_id", "embedding", "vec_id", "embedding", 50)
      .select(col("qid"), col("neighbor_id"))
      .cache()
    val nExact = exact50.count()
    def recall50(approx: DataFrame): Double =
      approx.select(col("qid"), col("neighbor_id"))
        .join(exact50, Seq("qid", "neighbor_id"))
        .count().toDouble / nExact
    val out = Seq(
      "ivf_refine0" -> recall50(Ann.ivfTopK(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding", 50,
        nlists = 16, nprobe = 4, refine = 0)),
      "ivf_refine2" -> recall50(Ann.ivfTopK(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding", 50,
        nlists = 16, nprobe = 4, refine = 2)),
      "ivfpq_refine0" -> recall50(Ann.ivfPqTopK(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding", 50,
        nlists = 16, nprobe = 4, refine = 0, pqRefine = 0)),
      "ivfpq_refine2" -> recall50(Ann.ivfPqTopK(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding", 50,
        nlists = 16, nprobe = 4, refine = 2, pqRefine = 2)),
      "ivfpq_refine0_fullprobe" -> recall50(Ann.ivfPqTopK(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding", 50,
        nlists = 16, nprobe = 16, refine = 0, pqRefine = 0))
    )
    exact50.unpersist()
    ("queries" -> (nExact / 50).toDouble) +: out
  }

  def jsonOf(rs: Seq[(String, Double)]): String =
    rs.map {
      case ("queries", v) => s""""queries":${v.toLong}"""
      case (k, v)         => f""""$k":$v%.4f"""
    }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args.lift(1)
    val spark = SparkSession
      .builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.load(spark, dir)("embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val json = s"""{"sf":"$dir","recall_at50":${jsonOf(measure(emb, queries))}}"""
    out.foreach { p =>
      val w = new java.io.PrintWriter(p)
      try w.println(json) finally w.close()
    }
    spark.stop()
    println(json)
  }
}
