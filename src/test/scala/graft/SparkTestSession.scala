package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shared local session for specs. sf0.001 keeps suites fast. */
trait SparkTestSession extends BeforeAndAfterAll { self: Suite =>
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkTestSession.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkTestSession {
  lazy val session: SparkSession = {
    // GraftSession.builder so specs (PlanShapeSpec above all) certify
    // plan shapes under the SAME optimizer configs (excludedRules,
    // constraintPropagation) the Bench/Verify sessions run with —
    // only the core count, app name and extensions wiring differ.
    val s = GraftSession.builder("4")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
