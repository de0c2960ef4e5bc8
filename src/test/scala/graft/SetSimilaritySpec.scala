package graft

/** Exactness + pruning proofs for the prefix-filter set-similarity join
  * (q167): unlike the LSH paths (subset + recall floor), prefix
  * filtering guarantees ZERO false negatives, so the join must EQUAL
  * the brute-force all-pairs result — while generating far fewer
  * candidate pairs than N(N−1)/2. */
class SetSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q167 equals brute-force all-pairs Jaccard — zero false negatives/positives") {
    val exact = graft.operators.SetSimilarity.allPairsJaccard(spark, sfDir)
      .select($"doc_a", $"doc_b", $"n_common")
      .as[(Long, Long, Long)].collect().toSet
    val pruned = SparkEntry.queries("q167_set_join_prefix")(spark, sfDir)
      .select($"doc_a", $"doc_b", $"n_common")
      .as[(Long, Long, Long)].collect().toSet
    exact.size should be > 0 // fixture must exercise the join
    pruned shouldBe exact
  }

  test("graft_intersect_count_sorted equals array_intersect size on random sets") {
    // the merge kernel's exactness, independent of q167: random sorted
    // string sets (with overlap by construction) through BOTH the
    // interpreted eval and codegen paths vs the built-in
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      val a = Seq.fill(rnd.nextInt(30))(s"t${rnd.nextInt(40)}").distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(s"t${rnd.nextInt(40)}").distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
    val got = df.selectExpr("i", "graft_intersect_count_sorted(a, b) AS m",
      "CAST(size(array_intersect(a, b)) AS BIGINT) AS r")
    got.filter($"m" =!= $"r").count() shouldBe 0
    // empty sides
    Seq((Seq.empty[String], Seq("x"))).toDF("a", "b")
      .selectExpr("graft_intersect_count_sorted(a, b)")
      .collect().head.getLong(0) shouldBe 0L
  }

  test("q167 hashed verify equals the string-array fallback path") {
    // the catalog path verifies over xxhash64 arrays when the hash is
    // injective on the corpus vocabulary; the fallback (a collision, or
    // hashInjective=false for any reason) verifies over the original
    // shingle strings. Both must produce the identical pair set —
    // exactness is never conditional on which path ran.
    val toks = graft.operators.SetSimilarity.tokenSets(spark, sfDir)
    graft.operators.SetSimilarity.hashInjective(toks) shouldBe true
    val hashed = graft.operators.SetSimilarity.prefixJoin(toks, 0.5)
      .select($"doc_a", $"doc_b", $"n_common", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    val viaStrings = graft.operators.SetSimilarity
      .prefixJoinForced(toks, 0.5, hashed = false)
      .select($"doc_a", $"doc_b", $"n_common", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    hashed.size should be > 0
    viaStrings shouldBe hashed
  }

  test("q167 prefix candidates are far below all-pairs") {
    val docs = graft.sources.Tables.documents(spark, sfDir).count()
    val allPairs = docs * (docs - 1) / 2
    val cands = graft.operators.SetSimilarity.candidateCount(spark, sfDir)
    // rarity-ordered prefixes keep candidate volume a small fraction of
    // the quadratic space; 20% is the "stopped pruning" alarm line
    cands.toDouble / allPairs should be < 0.2
  }

  test("q167 joins on equi-keys — no cross product in the plan") {
    val p = SparkEntry.queries("q167_set_join_prefix")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    (p should not).include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
  }

  test("q168 containment audit flags the swallowed side consistently") {
    val rows = SparkEntry.queries("q168_containment_audit")(spark, sfDir)
      .select($"n_common", $"cont_a", $"cont_b", $"direction")
      .as[(Long, Double, Double, String)].collect()
    rows.length should be > 0
    rows.foreach { case (n, ca, cb, dir) =>
      ca should (be >= 0.0 and be <= 1.0)
      cb should (be >= 0.0 and be <= 1.0)
      // direction names the smaller set: its containment can only be
      // the larger of the two ratios (equal intersection, smaller base)
      dir match {
        case "a_in_b" => ca should be >= cb
        case "b_in_a" => cb should be >= ca
        case "tie"    => ca shouldBe cb
      }
      n.toDouble should be >= 0.0
    }
  }
}
