package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension entry point: registers graft's SQL functions and
  * optimizer rules. Enable with
  * `spark.sql.extensions=graft.GraftSparkExtensions`, mirroring the
  * reference's `SpatialFilterPushdownOptimizations`
  * (reference: spatial-index/src/main/scala/com/azavea/hiveless/spark/sql/SpatialFilterPushdownOptimizations.scala:1).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.FunctionRegistration.registerAll(ext)
    graft.plans.RuleRegistration.registerAll(ext)
  }
}
