package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Registers graft optimizer rules (spatial filter pushdown etc.). */
object RuleRegistration {
  def registerAll(ext: SparkSessionExtensions): Unit = {
    // Spatial pushdown rule lands with graft.plans.SpatialFilterPushdown.
  }
}
