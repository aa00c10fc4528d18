package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Registers all graft SQL functions (ST_* and LLM-pipeline helpers).
  *
  * Spark-native replacement for the reference's Hive
  * `CREATE OR REPLACE FUNCTION ... as 'com.azavea.hiveless...'` flow
  * (reference: spatial/sql/createUDFs.sql:1).
  */
object FunctionRegistration {

  /** (name, builder) for every graft SQL function. Names are
    * case-insensitive in Spark's registry.
    */
  def builders: Seq[(String, FunctionBuilder)] =
    FunctionDefs.defs.map { case (name, specs) =>
      name -> ((children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GeomFn(name, specs, children))
    } ++ aggBuilders

  /** Aggregate functions (the analyzer wraps the returned
    * AggregateFunction). The reference ships its grouped convex hull
    * under the scalar's name via Hive's UDAF resolver; Spark resolves
    * scalar vs aggregate from the expression class, so the aggregate
    * gets its own name.
    */
  private def aggBuilders: Seq[(String, FunctionBuilder)] = Seq(
    "st_convexHullAggr" -> ((children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 1, "st_convexHullAggr takes exactly one geometry argument")
      ConvexHullAgg(children.head)
    }),
    "topk_by_score" -> ((children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 3, "topk_by_score(id, score, k)")
      TopKAgg(children(0), children(1), children(2))
    }),
    "topn_rows" -> ((children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 4, "topn_rows(id, payload, score, k)")
      TopNRowsAgg(children(0), children(1), children(2), children(3))
    }),
    "vec_sum" -> ((children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 1, "vec_sum(array<double>)")
      VectorSumAgg(children.head)
    }),
    "bloom_agg" -> ((children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 3, "bloom_agg(hash, numBits, numHashes)")
      BloomAgg(children(0), children(1), children(2))
    }),
    "cms_agg" -> ((children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 3, "cms_agg(key, depth, width)")
      CmsAgg(children(0), children(1), children(2))
    }),
    "kmv_agg" -> ((children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 2, "kmv_agg(hash, k)")
      KmvAgg(children(0), children(1))
    }),
    "vec_outer_sum" -> ((children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 1, "vec_outer_sum(array<double>)")
      VectorOuterSumAgg(children.head)
    })
  )

  def registerAll(ext: SparkSessionExtensions): Unit = {
    graft.geom.GeometryUDT.init()
    builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder
      ))
    }
  }

  /** Direct registration for an existing session (tests, Verify, Bench). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.geom.GeometryUDT.init()
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
