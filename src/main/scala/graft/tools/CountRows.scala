package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: row counts of named SparkEntry queries at a data dir —
  * separates "the operator got slower" from "the true answer got bigger"
  * when reading a scaling curve (pair-producing dedup queries are
  * output-bound: their cost scales with the answer, and on a clone-heavy
  * corpus the answer grows faster than the input).
  *
  * Usage: `CountRows <sfDir> <query>[,query...]`
  */
object CountRows {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession
      .builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val c = df.count()
      try org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(df)
      catch { case _: Throwable => () }
      println(s"[count] $n $c")
    }
    spark.stop()
  }
}
