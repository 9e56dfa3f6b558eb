package graft.sources

import graft.SparkSpec
import graft.util.TempDirs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  // two independent pseudo-uniform dimensions
  private lazy val grid: DataFrame = spark
    .range(40000)
    .select(
      col("id"),
      pmod(hash(col("id")), lit(1000)).cast("long").as("x"),
      pmod(hash(col("id") + 7777777), lit(1000)).cast("long").as("y")
    )

  private def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
    spark.read
      .parquet(path)
      .filter(cond)
      .select(input_file_name())
      .distinct()
      .count()

  test("zorderScan answers equal the plain filter (layout never changes results)") {
    val cond = col("x").between(100, 200) && col("y").between(300, 400)
    val direct = grid.filter(cond)
    val viaLayout = Layout.zorderScan(grid, Seq("x", "y"), targetFiles = 8, cond)
    assert(viaLayout.except(direct).isEmpty && direct.except(viaLayout).isEmpty)
    assert(direct.count() > 0)
  }

  test("z-order bounds BOTH dimensions per file; single-column sort does not") {
    val dir = TempDirs.scratch("layout-spec").toString
    Layout.zorderWrite(grid, Seq("x", "y"), s"$dir/z", targetFiles = 16)
    grid
      .repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x"))
      .write
      .parquet(s"$dir/xsort")

    // filter on y only: an x-sorted layout cannot skip anything
    val yOnly = col("y").between(0, 60)
    val zf = filesTouched(s"$dir/z", yOnly)
    val xf = filesTouched(s"$dir/xsort", yOnly)
    assert(xf >= 14, s"x-sorted layout unexpectedly skipped files: $xf")
    assert(zf <= 8, s"z-order should bound y spans per file, touched $zf of 16")

    // a 2-D box touches a small corner of the curve
    val box = col("x").between(100, 160) && col("y").between(100, 160)
    assert(filesTouched(s"$dir/z", box) <= 4)
    TempDirs.delete(java.nio.file.Paths.get(dir))
  }
}
