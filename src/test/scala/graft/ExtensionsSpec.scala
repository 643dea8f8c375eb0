package graft

import graft.functions.{DotProduct, GraftExtensions, RewriteHofDotProduct,
  VectorExpressions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Catalyst extension ladder: the native DotProduct Expression, the
  * RewriteHofDotProduct optimizer rule, and the SparkSessionExtensions
  * injection hook. */
class ExtensionsSpec extends SparkSpec {

  private def hofDot(a: String, b: String) =
    aggregate(zip_with(col(a), col(b), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)

  private def vectors: DataFrame = {
    val sess = spark
    import sess.implicits._
    Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.5, -1.0, 2.5), Seq(2.0, 0.25, -3.0)))
      .toDF("id", "va", "vb")
  }

  test("optimizer rewrites the HOF dot idiom to the native expression") {
    VectorExpressions.register(spark)
    // parquet-backed source: over a LocalRelation, constant folding
    // collapses the whole projection before the plan can be inspected
    val e = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val df = e.select(col("vec_id"), hofDot("v", "v").as("dot"))
    val optimized = df.queryExecution.optimizedPlan
    val hits = optimized.expressions.flatMap(_.collect {
      case d: DotProduct => d
    })
    assert(hits.nonEmpty, optimized.toString)
    // and the rewritten plan equals the native expression's output
    val viaHof = df.orderBy("vec_id").collect().map(_.getAs[Double]("dot"))
    val viaNative = e.select(col("vec_id"),
        expr("graft_dot(v, v)").as("dot"))
      .orderBy("vec_id").collect().map(_.getAs[Double]("dot"))
    assert(viaHof.sameElements(viaNative))
  }

  test("rule leaves non-dot aggregates alone") {
    VectorExpressions.register(spark)
    // zero != 0.0 and a sum (not product) lambda: both must survive
    val df = vectors.select(
      aggregate(zip_with(col("va"), col("vb"), (x, y) => x + y),
        lit(0.0d), (acc, x) => acc + x).as("s"),
      aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
        lit(1.0d), (acc, x) => acc + x).as("off_zero"))
    val hits = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case d: DotProduct => d })
    assert(hits.isEmpty)
    val r = df.collect()(0)
    assert(r.getAs[Double]("s") == (1.0 + 4) + (2 + 5) + (3 + 6))
    assert(r.getAs[Double]("off_zero") == 1.0 + (4.0 + 10 + 18))
  }

  test("rewrite matches HOF semantics on equal-length vectors " +
      "(the idiom's only shape); rule fires regardless of source order") {
    VectorExpressions.register(spark)
    // operand order flipped in both lambdas: still a dot product
    val df = Tables(spark, sfDir).embeddings
      .select(col("embedding").cast("array<double>").as("v"))
      .select(aggregate(zip_with(col("v"), col("v"), (x, y) => y * x),
        lit(0.0d), (acc, x) => x + acc).as("dot"))
    assert(df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case d: DotProduct => d }).nonEmpty)
    assert(df.collect().forall(_.getAs[Double]("dot") > 0))
  }

  test("rewrite preserves HOF edge cases: unequal lengths and null " +
      "elements both yield null") {
    VectorExpressions.register(spark)
    val sess = spark
    import sess.implicits._
    val df = Seq(
      ("uneq", Seq[Option[Double]](Some(1.0), Some(2.0)),
        Seq[Option[Double]](Some(3.0))),
      ("nullelem", Seq[Option[Double]](Some(1.0), None),
        Seq[Option[Double]](Some(3.0), Some(4.0))),
      ("ok", Seq[Option[Double]](Some(1.0), Some(2.0)),
        Seq[Option[Double]](Some(3.0), Some(4.0))))
      .toDF("k", "va", "vb")
    val viaHof = df.select(col("k"), hofDot("va", "vb").as("dot"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val viaNative = df.select(col("k"),
        expr("graft_dot(va, vb)").as("dot"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(viaHof == viaNative)
    assert(viaHof("uneq") == null && viaHof("nullelem") == null)
    assert(viaHof("ok") == 11.0)
  }

  test("graft_dot with wrong arity raises an analysis error, not an " +
      "IndexOutOfBoundsException") {
    VectorExpressions.register(spark)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      vectors.select(expr("graft_dot(va)")).collect()
    }
    assert(err.getMessage.contains("graft_dot"), err.getMessage)
  }

  test("GraftExtensions installs into a SparkSessionExtensions instance") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    // the rule object itself is a pure function of the plan
    val df = vectors.select(hofDot("va", "vb").as("dot"))
    val rewritten = RewriteHofDotProduct(df.queryExecution.analyzed)
    assert(rewritten.expressions
      .flatMap(_.collect { case d: DotProduct => d }).nonEmpty)
  }
}
