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

  test("graft_pack_u8 packs codes to bytes and graft_dot_u8 matches the unpacked dot") {
    GraftFunctions.register(spark)
    // hand-checked: 255 packs to byte -1 but dots as 255
    val hand = spark.range(1).select(
      expr("graft_pack_u8(array(0, 1, 255))").as("p"),
      expr("graft_dot_u8(graft_pack_u8(array(0, 1, 255)), array(1.0D, 2.0D, 3.0D))").as("d"))
      .head()
    hand.getAs[Array[Byte]]("p").toSeq shouldBe Seq[Byte](0, 1, -1)
    hand.getAs[Double]("d") shouldBe 0 * 1.0 + 1 * 2.0 + 255 * 3.0
    // bit-equality with the algebraic dot over the unpacked code values
    val rnd = new scala.util.Random(7)
    val codes = (1 to 50).map { _ =>
      (Seq.fill(64)(rnd.nextInt(256)), Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("c", "v")
    val rows = codes.select(
      expr("graft_dot_u8(graft_pack_u8(c), v)").as("native"),
      aggregate(zip_with($"c", $"v", (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x).as("algebraic"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, alg) => assert(n == alg) }
  }

  test("graft_jaro_winkler matches the cross-validated golden doubles exactly") {
    GraftFunctions.register(spark)
    // golden values read off DuckDB's jaro_winkler_similarity (the
    // oracle twin) — EXACT double equality, covering: classic Winkler
    // pairs, the 0.7 boost threshold (no bonus below), odd
    // transposition cycles (t = diff div 2), window exclusions,
    // empty/equal/singleton inputs, and case sensitivity
    val golden = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0),
      ("a", "b", 0.0),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("DwAyNE", "DuANE", 0.8400000000000001),
      ("arnab", "aranb", 0.9466666666666665),
      ("abcdef", "bcadef", 0.9444444444444445),
      ("aaaaa", "aazzz", 0.6),
      ("prefix_x", "prefiyyy", 0.85),
      ("ab", "abcdefghij", 0.7866666666666667))
    val out = golden.toDF("a", "b", "want")
      .select(expr("graft_jaro_winkler(a, b)").as("got"), $"want", $"a", $"b")
      .collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"${r.getString(2)} / ${r.getString(3)}")
    }
    // codegen path and the static helper agree bit-for-bit
    golden.foreach { case (a, b, want) =>
      functions.JaroWinkler.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b)) shouldBe want
    }
    // null propagates
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(expr("graft_jaro_winkler(a, b)")).as[Option[Double]].collect()
    n(0) shouldBe None
  }
}
