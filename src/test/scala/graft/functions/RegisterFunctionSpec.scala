package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The "10-line third-party function" fixture: a plain top-level object
  * whose public methods (via Scala's static forwarders) operate on
  * Catalyst INTERNAL types — the documented registerFunction contract.
  */
object ToyFns {
  def tripleIt(x: Long): Long = x * 3L
  def quadIt(x: Long): Long = x * 4L
  def shout(s: UTF8String): UTF8String =
    UTF8String.fromString(s.toString.toUpperCase + "!")
  def safeDiv(a: Long, b: Long): java.lang.Long =
    if (b == 0L) null else java.lang.Long.valueOf(a / b)
}

class RegisterFunctionSpec extends AnyFunSuite with SparkTestSession with Matchers {

  test("registerFunction: a typed user function is SQL- and DSL-callable (the HUDF extensibility twin)") {
    FunctionRegistration.registerFunction(spark, "my_triple",
      "graft.functions.ToyFns", "tripleIt", LongType, Seq(LongType))
    FunctionRegistration.registerFunction(spark, "my_shout",
      "graft.functions.ToyFns", "shout", StringType, Seq(StringType))
    FunctionRegistration.registerFunction(spark, "my_div",
      "graft.functions.ToyFns", "safeDiv", LongType, Seq(LongType, LongType),
      boxed = true)
    // SQL path
    val r = spark.sql(
      "SELECT my_triple(14) AS t, my_shout('ok') AS s, my_div(10, 0) AS d")
      .collect().head
    r.getLong(0) shouldBe 42L
    r.getString(1) shouldBe "OK!"
    r.isNullAt(2) shouldBe true
    // DSL path over a real frame (exercises whole-stage codegen)
    import spark.implicits._
    val df = (1L to 100L).toDF("x")
      .select(col("x"),
        FunctionDefs.call("my_triple", col("x")).as("t"),
        FunctionDefs.call("my_div", col("x"), col("x") % 3).as("d"))
    df.agg(sum("t")).head.getLong(0) shouldBe 3L * 5050L
    df.filter(col("d").isNull).count() shouldBe 33L // boxed-null on x % 3 == 0
  }

  test("registerFunction: same-signature re-registration replaces (idempotent), not accumulates") {
    FunctionRegistration.registerFunction(spark, "my_idem",
      "graft.functions.ToyFns", "tripleIt", LongType, Seq(LongType))
    // a re-run registration cell: same name + signature, new impl —
    // the overload list must stay at 1 and the LATEST implementation win
    FunctionRegistration.registerFunction(spark, "my_idem",
      "graft.functions.ToyFns", "quadIt", LongType, Seq(LongType))
    FunctionDefs.lookup("my_idem").size shouldBe 1
    spark.sql("SELECT my_idem(10) AS v").head.getLong(0) shouldBe 40L
    // a genuinely new signature still ADDS an overload
    FunctionRegistration.registerFunction(spark, "my_idem",
      "graft.functions.ToyFns", "safeDiv", LongType, Seq(LongType, LongType),
      boxed = true)
    FunctionDefs.lookup("my_idem").size shouldBe 2
  }

  test("registerFunction: built-ins are protected and a missing method fails at registration") {
    intercept[IllegalArgumentException] {
      FunctionRegistration.registerFunction(spark, "st_x",
        "graft.functions.ToyFns", "tripleIt", LongType, Seq(LongType))
    }
    intercept[IllegalStateException] {
      FunctionRegistration.registerFunction(spark, "my_nope",
        "graft.functions.ToyFns", "nothere", LongType, Seq(LongType))
    }
  }
}
