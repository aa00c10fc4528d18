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

  test("row-group range filters reach the parquet scan") {
    val df = SpatialLayout.readWindow(spark, layoutPath, -140.0, 0.0, -100.0, 40.0, dirLevel = 3)
    df.collect()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    formatted should include("PushedFilters")
    formatted should include("extent.xmin")
  }
}
