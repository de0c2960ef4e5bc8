package graft

/** Verifiers for the bucketed similarity paths against their exact
  * counterparts — the test-tier home of the all-pairs forms that must
  * never ship in the catalog (a cross join is a scale-killer at 100 TB).
  */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q28 bucketed near-dup is a subset of all-pairs with high recall") {
    val exact = graft.operators.Similarity.allPairsNearDup(spark, sfDir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val bucketed = SparkEntry.queries("q28_embedding_neardup")(spark, sfDir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    // candidates are verified with the exact cosine, so no false pairs
    bucketed.subsetOf(exact) shouldBe true
    // 16 bands × 3 bits gives ≥99% expected recall at cosine 0.4; the
    // tiny sf0.001 pair set makes the realized floor looser — anything
    // below 80% means the banding is broken, not unlucky
    exact.size should be > 0
    bucketed.size.toDouble / exact.size should be >= 0.8
  }

  test("q28 candidates come from an equi-join, never a cross product") {
    val p = SparkEntry.queries("q28_embedding_neardup")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    (p should not).include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
  }

  test("q41 assignment is deterministic and fit-free across invocations") {
    val a = SparkEntry.queries("q41_knn_ivf")(spark, sfDir).collect()
    val b = SparkEntry.queries("q41_knn_ivf")(spark, sfDir).collect()
    a should contain theSameElementsInOrderAs b
  }
}
