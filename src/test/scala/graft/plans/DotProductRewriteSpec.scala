package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions-injected optimizer rule: the declarative
  * HOF dot-product idiom is rewritten to the codegen'd strict native
  * expression, with identical results including the null/length edge
  * semantics of zip_with + aggregate.
  */
class DotProductRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("dot-rewrite")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  private val hofSql =
    """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, z) -> acc + z) AS dot
      |FROM v""".stripMargin

  private def withData(rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])]): Unit = {
    import spark.implicits._
    rows.toDF("a", "b").selectExpr(
      "cast(a as array<double>) AS a", "cast(b as array<double>) AS b")
      .createOrReplaceTempView("v")
  }

  test("rewrite fires: optimized plan contains pal_dot_strict, no lambdas") {
    // parquet-backed input: a LocalRelation would be constant-folded to
    // the final value before the plan can be inspected
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dot_rw").toString
    Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("v")
    val df = spark.sql(hofSql)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("pal_dot_strict"), opt)
    assert(!opt.contains("zip_with") && !opt.contains("aggregate("), opt)
    assert(df.first().getDouble(0) == 11.0)
  }

  test("null/length semantics preserved exactly") {
    withData(Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),     // 11.0
      (Seq[java.lang.Double](1.0, 2.0, 5.0), Seq[java.lang.Double](3.0, 4.0)), // unequal -> null
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))))    // null elem -> null
    val got = spark.sql(hofSql).collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None, None), got.mkString(","))
    // cross-check vs a session WITHOUT the rule (HOF reference semantics)
    val plain = spark.newSession()
    import plain.implicits._
    Seq(
      (Seq[java.lang.Double](1.0, 2.0, 5.0), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b").selectExpr("cast(a as array<double>) AS a", "cast(b as array<double>) AS b")
      .createOrReplaceTempView("v")
    val ref = plain.sql(hofSql).collect().map(r => r.isNullAt(0))
    assert(ref.toSeq == Seq(true, true), "HOF reference should null-poison these rows")
  }
}
