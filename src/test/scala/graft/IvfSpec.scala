package graft

/** IVF ANN structure checks: probing only the query's inverted list,
  * ranked output shape, and non-degenerate recall vs brute force. */
class IvfSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("IVF top-k probes one cluster and ranks by cosine") {
    val ivf = SparkEntry.queries("q41_knn_ivf")(spark, sfDir)
      .as[(Long, Int, Long, Double, Int)].collect()
    ivf should not be empty
    // per query: ≤5 ranked neighbors, one cluster, descending cosine
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      rows.length should be <= 5
      rows.map(_._2).distinct.length shouldBe 1
      val cosines = rows.sortBy(_._5).map(_._4)
      cosines.zip(cosines.tail).foreach { case (hi, lo) => hi should be >= lo }
      rows.foreach(r => r._4 should (be >= -1.0 and be <= 1.0))
    }
  }

  test("IVF neighbors overlap brute-force neighbors (non-degenerate recall)") {
    val brute = SparkEntry.queries("q29_knn_brute_force")(spark, sfDir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SparkEntry.queries("q41_knn_ivf")(spark, sfDir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // at least one query's IVF list intersects its brute-force top-10
    // (random synthetic vectors make clusters weak; zero overlap across
    // ALL queries would mean the probe logic is broken)
    val overlaps = ivf.map { case (q, ns) =>
      brute.getOrElse(q, Set.empty).intersect(ns).size
    }
    overlaps.sum should be > 0
  }
}
