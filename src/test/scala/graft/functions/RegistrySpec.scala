package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.io.Source

/** Drop-in completeness: every SQL name the reference registers
  * (spatial/sql/createUDFs.sql) must resolve in a graft-enabled session,
  * so any reference query script runs unmodified.
  */
class RegistrySpec extends AnyFunSuite with SparkTestSession with Matchers {

  private val createUdfsSql = "/root/reference/spatial/sql/createUDFs.sql"

  test("every reference function name resolves in the session registry") {
    assume(new java.io.File(createUdfsSql).exists())
    val referenceNames = scala.util.Using.resource(Source.fromFile(createUdfsSql)) { src =>
      src.getLines()
        .flatMap("(?i)FUNCTION\\s+(st_\\w+)".r.findFirstMatchIn(_).map(_.group(1)))
        .toSeq
    }
    referenceNames.size should be >= 75
    val registry = spark.sessionState.functionRegistry
    val missing = referenceNames.filterNot(n =>
      registry.functionExists(FunctionIdentifier(n.toLowerCase)))
    withClue(s"missing from registry: $missing") { missing shouldBe empty }
  }

  test("every graft builder (scalars and aggregates) resolves too") {
    val registry = spark.sessionState.functionRegistry
    // derived from the registration source of truth, so a dropped
    // aggregate registration fails here rather than passing silently
    val extras = FunctionRegistration.builders.map(_._1)
    extras.map(_.toLowerCase) should contain allOf ("topk_by_score", "topn_rows", "st_convexhullaggr")
    val missing = extras.filterNot(n =>
      registry.functionExists(FunctionIdentifier(n.toLowerCase)))
    withClue(s"missing from registry: $missing") { missing shouldBe empty }
  }
}
