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

/** The "10-line third-party aggregate" fixtures: plain
  * [[UserAggregateSpec]] subclasses over Serializable buffers —
  * external Scala types at the boundary, no Catalyst code.
  */
object ToyAggs {
  // geometric mean: buffer (Σ log x, n); nulls and non-positives skipped
  final case class GmBuf(var sumLog: Double, var n: Long)
  object GeoMean extends UserAggregateSpec[GmBuf] {
    def init(): GmBuf = GmBuf(0.0, 0L)
    def update(b: GmBuf, args: Seq[Any]): GmBuf = {
      args.head match {
        case d: java.lang.Double if d > 0 => b.sumLog += math.log(d); b.n += 1
        case _ => ()
      }
      b
    }
    def merge(a: GmBuf, b: GmBuf): GmBuf = { a.sumLog += b.sumLog; a.n += b.n; a }
    def finish(b: GmBuf): Any =
      if (b.n == 0) null else math.exp(b.sumLog / b.n)
  }
  // two-argument weighted mean — exercises multi-arg conversion
  final case class WmBuf(var sw: Double, var swx: Double)
  object WeightedMean extends UserAggregateSpec[WmBuf] {
    def init(): WmBuf = WmBuf(0.0, 0.0)
    def update(b: WmBuf, args: Seq[Any]): WmBuf = {
      (args(0), args(1)) match {
        case (x: java.lang.Double, w: java.lang.Double) =>
          b.sw += w; b.swx += w * x
        case _ => ()
      }
      b
    }
    def merge(a: WmBuf, b: WmBuf): WmBuf = { a.sw += b.sw; a.swx += b.swx; a }
    def finish(b: WmBuf): Any = if (b.sw == 0) null else b.swx / b.sw
  }
  object CountAll extends UserAggregateSpec[java.lang.Long] {
    def init(): java.lang.Long = 0L
    def update(b: java.lang.Long, args: Seq[Any]): java.lang.Long = b + 1L
    def merge(a: java.lang.Long, b: java.lang.Long): java.lang.Long = a + b
    def finish(b: java.lang.Long): Any = b
  }
}

/** The "10-line third-party table function" fixtures: plain
  * [[UserGeneratorSpec]] subclasses — external Scala types, rows as
  * tuples (or bare values for one-column schemas), no Catalyst code.
  */
object ToyGens {
  // (gram, pos) per adjacent word pair — the classic UDTF shape
  object Bigrams extends UserGeneratorSpec {
    def eval(args: Seq[Any]): IterableOnce[Any] = args.head match {
      case s: String =>
        val w = s.split(" ").filter(_.nonEmpty)
        (0 until math.max(0, w.length - 1)).map(i => (w(i) + " " + w(i + 1), i))
      case _ => Nil
    }
  }
  // single-column: bare values, no tuple wrapping
  object Chars extends UserGeneratorSpec {
    def eval(args: Seq[Any]): IterableOnce[Any] = args.head match {
      case s: String => s.split("").toSeq
      case _ => Nil
    }
  }
  // terminate(): one trailing summary row per partition (Hive close())
  class CountingGen extends UserGeneratorSpec {
    private var n = 0L
    def eval(args: Seq[Any]): IterableOnce[Any] = { n += 1; Seq(("row", n)) }
    override def terminate(): IterableOnce[Any] = Seq(("partition_total", n))
  }
}

class RegisterFunctionSpec extends AnyFunSuite with SparkTestSession with Matchers {

  test("registerGenerator: LATERAL VIEW and generator-SELECT paths under GenerateExec (the HGenericUDTF twin)") {
    FunctionRegistration.registerGenerator(spark, "my_bigrams",
      StructType(Seq(StructField("gram", StringType), StructField("pos", IntegerType))),
      Seq(StringType), ToyGens.Bigrams)
    import spark.implicits._
    Seq((1L, "a b c"), (2L, "x y"), (3L, "solo")).toDF("id", "txt")
      .createOrReplaceTempView("gen_in")
    // the LATERAL VIEW call path
    val lv = spark.sql(
      "SELECT id, g.gram, g.pos FROM gen_in LATERAL VIEW my_bigrams(txt) g AS gram, pos")
    lv.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet shouldBe
      Set((1L, "a b", 0), (1L, "b c", 1), (2L, "x y", 0))
    // the generator-in-SELECT path
    val sel = spark.sql("SELECT my_bigrams(txt) FROM gen_in WHERE id = 1")
    sel.columns.toSeq shouldBe Seq("gram", "pos")
    sel.collect().map(_.getString(0)).toSet shouldBe Set("a b", "b c")
    // plan pin: runs as the streamed Generate operator, same as explode
    val plan = lv.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should include("Generate my_bigrams")
    // single-column schema takes bare values
    FunctionRegistration.registerGenerator(spark, "my_chars",
      StructType(Seq(StructField("ch", StringType))), Seq(StringType),
      ToyGens.Chars)
    spark.sql("SELECT my_chars('ab')").collect().map(_.getString(0)).toSeq shouldBe
      Seq("a", "b")
  }

  test("registerGenerator: terminate() emits per-partition trailing rows; protection + replace") {
    FunctionRegistration.registerGenerator(spark, "my_counting",
      StructType(Seq(StructField("tag", StringType), StructField("n", LongType))),
      Seq(LongType), new ToyGens.CountingGen)
    import spark.implicits._
    (1L to 5L).toDF("x").coalesce(1).createOrReplaceTempView("term_in")
    val got = spark.sql(
      "SELECT tag, n FROM term_in LATERAL VIEW my_counting(x) g AS tag, n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got.count(_._1 == "row") shouldBe 5
    got.filter(_._1 == "partition_total").map(_._2).toSeq shouldBe Seq(5L)
    // built-in names protected
    intercept[IllegalArgumentException] {
      FunctionRegistration.registerGenerator(spark, "st_x",
        StructType(Seq(StructField("a", LongType))), Seq(LongType),
        ToyGens.Chars)
    }
    // re-registration replaces (idempotent notebook cells)
    FunctionRegistration.registerGenerator(spark, "my_regen",
      StructType(Seq(StructField("v", StringType))), Seq(StringType),
      ToyGens.Chars)
    FunctionRegistration.registerGenerator(spark, "my_regen",
      StructType(Seq(StructField("v", StringType))), Seq(StringType),
      new UserGeneratorSpec {
        def eval(args: Seq[Any]): IterableOnce[Any] = Seq("replaced")
      })
    spark.sql("SELECT my_regen('zz')").collect().map(_.getString(0)).toSeq shouldBe
      Seq("replaced")
    // declared-arity mismatch fails analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT my_regen('a', 'b')").collect()
    }
  }

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

  test("registerAggregate: SQL- and DSL-callable, exact over groups and cross-partition merges") {
    FunctionRegistration.registerAggregate(spark, "my_geomean",
      DoubleType, Seq(DoubleType), ToyAggs.GeoMean)
    FunctionRegistration.registerAggregate(spark, "my_wmean",
      DoubleType, Seq(DoubleType, DoubleType), ToyAggs.WeightedMean)
    import spark.implicits._
    // 7 partitions force real partial→merge paths; nulls must reach
    // update (the spec skips them) without poisoning the group
    val rows = (1L to 1000L).map(i =>
      (i % 4, if (i % 13 == 0) null else java.lang.Double.valueOf(i.toDouble), i.toDouble % 5 + 1))
    val df = rows.toDF("k", "x", "w").repartition(7)
    val expected = rows.groupBy(_._1).map { case (k, g) =>
      val xs = g.collect { case (_, x, _) if x != null => x.doubleValue() }
      k -> math.exp(xs.map(math.log).sum / xs.size)
    }
    df.createOrReplaceTempView("agg_in")
    val gotSql = spark.sql("SELECT k, my_geomean(x) AS g FROM agg_in GROUP BY k")
    gotSql.collect().foreach { r =>
      r.getDouble(1) shouldBe expected(r.getLong(0)) +- 1e-9
    }
    // DSL path + the two-argument aggregate
    val gotDsl = df.groupBy("k")
      .agg(call_function("my_wmean", col("x"), col("w")).as("wm"))
      .collect()
    val expectedWm = rows.groupBy(_._1).map { case (k, g) =>
      val p = g.collect { case (_, x, w) if x != null => (x.doubleValue(), w) }
      k -> p.map { case (x, w) => x * w }.sum / p.map(_._2).sum
    }
    gotDsl.foreach { r => r.getDouble(1) shouldBe expectedWm(r.getLong(0)) +- 1e-9 }
  }

  test("registerAggregate: partial aggregation in the plan (ObjectHashAggregate partial+final)") {
    FunctionRegistration.registerAggregate(spark, "my_countall",
      LongType, Seq(LongType), ToyAggs.CountAll)
    import spark.implicits._
    val df = (1L to 100L).toDF("x").repartition(4)
      .groupBy(col("x") % 3).agg(call_function("my_countall", col("x")))
    df.collect().map(_.getLong(1)).sum shouldBe 100L
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // AQE prints both; count the final
    plan.toLowerCase should include("objecthashaggregate")
    plan should include("partial_my_countall")
    plan.toLowerCase.sliding("objecthashaggregate".length)
      .count(_ == "objecthashaggregate") shouldBe 2 // partial + final
  }

  test("registerAggregate: built-in names protected (incl. aggregate builders); re-registration replaces") {
    intercept[IllegalArgumentException] {
      FunctionRegistration.registerAggregate(spark, "qdigest_agg",
        LongType, Seq(LongType), ToyAggs.CountAll)
    }
    intercept[IllegalArgumentException] {
      FunctionRegistration.registerAggregate(spark, "topk_by_score",
        LongType, Seq(LongType), ToyAggs.CountAll)
    }
    // wrong arity / type fails analysis with the registered signature
    FunctionRegistration.registerAggregate(spark, "my_reagg",
      DoubleType, Seq(DoubleType), ToyAggs.GeoMean)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT my_reagg(1.0, 2.0)").collect()
    }
    // replace with a different algebra — the latest registration wins
    FunctionRegistration.registerAggregate(spark, "my_reagg",
      DoubleType, Seq(DoubleType),
      new UserAggregateSpec[java.lang.Double] {
        def init(): java.lang.Double = 0.0
        def update(b: java.lang.Double, args: Seq[Any]): java.lang.Double =
          args.head match { case d: java.lang.Double => b + d; case _ => b }
        def merge(a: java.lang.Double, b: java.lang.Double): java.lang.Double = a + b
        def finish(b: java.lang.Double): Any = b
      })
    import spark.implicits._
    Seq(1.0, 2.0, 3.0).toDF("x").createOrReplaceTempView("reagg_in")
    spark.sql("SELECT my_reagg(x) FROM reagg_in").head.getDouble(0) shouldBe 6.0
  }
}
