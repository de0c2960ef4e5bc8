package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Native vector expressions: bit-equality with the algebraic
  * zip_with/aggregate form, null handling, and length semantics. */
class VectorExprSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val pairs = {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    (1 to 50).map { _ =>
      (Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("a", "b")
  }

  test("graft_dot is bit-identical to zip_with + aggregate") {
    val rows = pairs.select(
      expr("graft_dot(a, b)").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("algebraic"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, alg) => assert(n == alg) }
  }

  test("graft_cosine is bit-identical to dot/(norm*norm) column algebra") {
    val rows = pairs.select(
      expr("graft_cosine(a, b)").as("native"),
      (aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x) /
        (sqrt(aggregate($"a", lit(0.0), (acc, x) => acc + x * x)) *
          sqrt(aggregate($"b", lit(0.0), (acc, x) => acc + x * x)))).as("algebraic"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, alg) => assert(n == alg) }
  }

  test("null input yields null; length mismatch folds over the shorter") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq(1.0, 2.0, 9.0)), Some(Seq(3.0, 4.0)))).toDF("a", "b")
    val out = df.select(expr("graft_dot(a, b)")).as[Option[Double]].collect()
    out(0) shouldBe None
    out(1) shouldBe Some(1.0 * 3.0 + 2.0 * 4.0)
  }
}
