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

  test("graft_cell_scores passes NaN/Infinity through unrounded (RoundBase parity)") {
    GraftFunctions.register(spark)
    // a NaN component poisons every cell's dot (NaN·x = NaN); an +Inf
    // component yields +Inf against a same-sign plane and NaN against a
    // zero one (Inf·0 = NaN) — IEEE754, and exactly what round(_, 6)
    // would pass through. BigDecimal.valueOf would THROW on these; the
    // guard must not.
    val rows = Seq((Seq(Double.NaN, 1.0), Seq(1.0, 0.0, 0.0, 1.0)),
      (Seq(Double.PositiveInfinity, 2.0), Seq(1.0, 0.0, 0.0, 1.0)))
      .toDF("v", "c")
      .selectExpr("graft_cell_scores(v, c) AS s").as[Seq[Double]].collect()
    assert(rows(0)(0).isNaN); assert(rows(0)(1).isNaN)
    rows(1)(0) shouldBe Double.PositiveInfinity; assert(rows(1)(1).isNaN)
    // interpreted path agrees (no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit = (xs: Seq[Double]) =>
      Literal(new GenericArrayData(xs.toArray), ArrayType(DoubleType))
    val got = functions.CellScores(
      lit(Seq(Double.PositiveInfinity, 2.0)), lit(Seq(1.0, 0.0, 0.0, 1.0)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    got.getDouble(0) shouldBe Double.PositiveInfinity
    assert(got.getDouble(1).isNaN)
  }

  test("graft_band_buckets on non-finite dots follows Spark comparison semantics") {
    GraftFunctions.register(spark)
    // Spark: NaN > 0 and +Inf > 0 are true, -Inf > 0 false — the fused
    // sign test must match `round(dot, 6) > 0` under those semantics
    // instead of crashing in BigDecimal.valueOf.
    // 1 band × 3 bits over dim-1 vectors: planes [1], [-1], [1];
    // v=[NaN] → dots NaN, NaN, NaN (NaN*-1 is NaN) → all bits set = 7
    val rows = Seq(
      (Seq(Double.NaN), Seq(1.0, -1.0, 1.0)),
      (Seq(Double.PositiveInfinity), Seq(1.0, -1.0, 1.0)), // +Inf,-Inf,+Inf → 0b101
      (Seq(1.0), Seq(1.0, -1.0, 1.0)))                     // 1,-1,1 → 0b101
      .toDF("v", "p")
      .selectExpr("graft_band_buckets(v, p, 3) AS b").as[Seq[Int]].collect()
    rows(0) shouldBe Seq(7)
    rows(1) shouldBe Seq(5)
    rows(2) shouldBe Seq(5)
    // interpreted path agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val lit = (xs: Seq[Double]) =>
      Literal(new GenericArrayData(xs.toArray), ArrayType(DoubleType))
    val got = functions.BandBuckets(lit(Seq(Double.NaN)),
      lit(Seq(1.0, -1.0, 1.0)), Literal(3, IntegerType))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    got.getInt(0) shouldBe 7
  }

  test("graft_intersect_count_sorted skips null elements instead of NPEing") {
    GraftFunctions.register(spark)
    // registered as a general SQL function: arbitrary user arrays may
    // carry nulls (sort_array puts them FIRST ascending) — a null
    // element is "not a member", never a crash, on both eval paths
    val out = spark.sql(
      """SELECT graft_intersect_count_sorted(
        |  array(CAST(NULL AS STRING), 'a', 'b'),
        |  array(CAST(NULL AS STRING), 'b', 'c')) AS m""".stripMargin)
      .as[Long].collect()
    out(0) shouldBe 1L
    // interpreted path agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val lit = (xs: Seq[String]) => Literal(
      new GenericArrayData(xs.map(s =>
        if (s == null) null
        else org.apache.spark.unsafe.types.UTF8String.fromString(s)).toArray),
      ArrayType(StringType, containsNull = true))
    functions.IntersectCountSorted(
      lit(Seq(null, "a", "b")), lit(Seq(null, "b", "c"))).eval(null) shouldBe 1L
  }

  test("graft_pq_codes is bit-identical to the HOF round/argmin encode (incl. ties)") {
    // the fused PQ encode must reproduce the higher-order-function form
    // it replaced — round(Σ(v−c)², 6) per (subspace, centroid) then
    // array_position(array_min) first-match argmin — on adversarial
    // inputs: duplicated centroids (exact distance ties → first index
    // wins), an exact-centroid hit (zero distance), and a constant
    // vector (many equal distances per subspace)
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val m = 16; val kk = 16; val ds = 4
    val cbs: Seq[Seq[Seq[Double]]] = Seq.tabulate(m) { _ =>
      val base = Seq.fill(kk)(Seq.fill(ds)(rnd.nextDouble() * 2 - 1))
      base.updated(3, base(1)) // centroid 3 == centroid 1: forced tie
    }
    val vs: Seq[Seq[Double]] =
      (1 to 100).map(_ => Seq.fill(m * ds)(rnd.nextDouble() * 2 - 1)) ++
        Seq(cbs.flatMap(_(5)),        // exact hit on centroid 5 everywhere
          Seq.fill(m * ds)(0.25))     // constant vector
    // the equivalence runs through the PRODUCTION pair —
    // Similarity.pqWithCodesFused (the hot path) vs pqWithCodesHof (the
    // retained pre-round-10 reference) — not a test-local HOF string
    // that could silently drift from what the code actually pins
    val vdf = vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
    val cbDf = Seq(Tuple1(cbs)).toDF("cbs")
    val fusedM = graft.operators.Similarity.pqWithCodesFused(vdf, cbDf)
      .select($"id", $"codes").as[(Int, Seq[Int])].collect().toMap
    val refM = graft.operators.Similarity.pqWithCodesHof(vdf, cbDf)
      .select($"id", $"codes").as[(Int, Seq[Int])].collect().toMap
    refM.size shouldBe vs.length
    fusedM.size shouldBe vs.length
    val rows = (0 until vs.length).map(i => (fusedM(i), refM(i)))
    rows.foreach { case (f, r) => f shouldBe r }
    // the forced tie actually bit: some subspace of some vector chose
    // centroid 1 (never 3 — first-match) — i.e. the tie path executed
    assert(rows.exists(_._1.contains(1)))
    // code 3 is unreachable: its centroid duplicates centroid 1 in
    // every subspace, so first-match can never pick the higher index
    rows.foreach { case (f, _) => f should not contain 3 }
    // interpreted path (nullSafeEval) agrees with the codegen'd result
    // on the exact-hit row: every subspace encodes to centroid 5
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
    import org.apache.spark.sql.types.{ArrayType => AT, DoubleType => DT}
    val interp = functions.PqCodes(
      CatLit.create(cbs.flatMap(_(5)), AT(DT)),
      CatLit.create(cbs, AT(AT(AT(DT)))))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until m).foreach(j => interp.getInt(j) shouldBe 5)
  }
}
