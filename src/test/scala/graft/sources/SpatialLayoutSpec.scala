package graft.sources

import graft.SparkTestSession
import graft.functions.st
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The Z2 layout must actually prune: fewer files read for a window
  * query than exist on disk, with identical results to a full scan.
  */
class SpatialLayoutSpec extends AnyFunSuite with SparkTestSession with Matchers {

  private lazy val layoutPath = {
    val path = java.nio.file.Files.createTempDirectory("graft-z2").toString + "/pts"
    val pts = graft.queries.Spatial.customerPoints(SparkTestSession.session, sfDir)
    SpatialLayout.writeZ2(pts, "geom", path, level = 12, dirLevel = 3)
    path
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect() // execute so metrics fill
    df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }.head
  }

  test("window read returns exactly the full-scan result") {
    val window = (-140.0, 0.0, -100.0, 40.0)
    val pruned = SpatialLayout.readWindow(spark, layoutPath,
        window._1, window._2, window._3, window._4, dirLevel = 3)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val full = spark.read.parquet(layoutPath)
      .filter(st.intersects(st.makeBBOX(window._1, window._2, window._3, window._4), col("geom")))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    pruned shouldBe full
    pruned should not be empty
  }

  test("directory pruning: the scan touches fewer files than exist") {
    val totalFiles = spark.read.parquet(layoutPath).inputFiles.length
    val scan = scanOf(SpatialLayout.readWindow(spark, layoutPath,
      -140.0, 0.0, -100.0, 40.0, dirLevel = 3))
    val filesRead = scan.metrics("numFiles").value
    withClue(s"read $filesRead of $totalFiles files") {
      filesRead should be < totalFiles.toLong
    }
    scan.toString should include("PartitionFilters")
  }

  test("cell-spanning polygons are never lost to directory pruning; residual is exact") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val mk = (id: Long, wkt: String) => Row(id, wkt)
    val rows = Seq(
      // L-shaped polygon: bbox (9,9)-(15,15) overlaps the window corner,
      // the shape itself (x>=12 or y>=12) does not
      mk(1L, "POLYGON ((12 9, 15 9, 15 15, 9 15, 9 12, 12 12, 12 9))"),
      // huge polygon spanning many level-3 cells, centroid far east of
      // the window but overlapping it: centroid-keyed pruning would drop it
      mk(2L, "POLYGON ((-5 -5, 120 -5, 120 5, -5 5, -5 -5))"),
      // plainly inside the window
      mk(3L, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),
      // plainly outside
      mk(4L, "POLYGON ((100 40, 101 40, 101 41, 100 41, 100 40))"))
    val df = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("id", LongType), StructField("wkt", StringType))))
      .withColumn("geom", st.geomFromWKT(col("wkt"))).drop("wkt")
    val path = java.nio.file.Files.createTempDirectory("graft-z2poly").toString + "/polys"
    SpatialLayout.writeZ2(df, "geom", path, level = 12, dirLevel = 3)
    // window (0,0)-(10,10): hits 2 and 3; 1 only by bbox; 4 not at all
    val got = SpatialLayout.readWindow(spark, path, 0.0, 0.0, 10.0, 10.0, dirLevel = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    got shouldBe Set(2L, 3L)
  }

  test("row-group range filters reach the parquet scan") {
    val df = SpatialLayout.readWindow(spark, layoutPath, -140.0, 0.0, -100.0, 40.0, dirLevel = 3)
    df.collect()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    formatted should include("PushedFilters")
    formatted should include("extent.xmin")
  }
}
