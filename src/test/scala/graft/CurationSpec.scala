package graft

/** Structural checks for the curation operators (q50-q52) — value
  * parity is the DuckDB oracle's job; these assert the invariants the
  * oracle can't express. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q50: components agree with the LSH pairs and keepers are component minima") {
    val pairs = SparkEntry.queries("q25_minhash_lsh_pairs")(spark, sfDir)
      .as[(Long, Long)].collect()
    val rows = SparkEntry.queries("q50_dup_clusters")(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    val cluster = rows.map(r => r._1 -> r._2).toMap
    // exactly the documents that appear in some candidate pair
    cluster.keySet shouldBe pairs.flatMap(p => Seq(p._1, p._2)).toSet
    // both endpoints of every pair land in the same component
    pairs.foreach { case (a, b) => cluster(a) shouldBe cluster(b) }
    // the cluster label is the component's min doc_id, and exactly the
    // is_keeper rows carry it
    cluster.groupBy(_._2).foreach { case (c, members) =>
      members.keys.min shouldBe c
    }
    rows.foreach { case (doc, c, keep) => keep shouldBe (if (doc == c) 1 else 0) }
  }

  test("q51: split proportions approximate 80/10/10 and assignment is doc-stable") {
    val rows = SparkEntry.queries("q51_hash_split")(spark, sfDir)
      .as[(Long, Long, String)].collect()
    val n = rows.length.toDouble
    val bys = rows.groupBy(_._3).view.mapValues(_.length / n).toMap
    bys("train") shouldBe 0.8 +- 0.08
    bys("val") shouldBe 0.1 +- 0.05
    bys("test") shouldBe 0.1 +- 0.05
    // pure function of doc_id: identical across invocations
    val again = SparkEntry.queries("q51_hash_split")(spark, sfDir)
      .as[(Long, Long, String)].collect()
    again shouldBe rows
  }

  test("q52: per-doc ranks are dense from 1 and scores are non-increasing") {
    val rows = SparkEntry.queries("q52_tfidf")(spark, sfDir)
      .as[(Long, String, Double, Int)].collect()
    rows should not be empty
    rows.groupBy(_._1).foreach { case (_, terms) =>
      val byRank = terms.sortBy(_._4)
      byRank.map(_._4) shouldBe (1 to terms.length).toArray
      byRank.map(_._3).sliding(2).foreach {
        case Array(hi, lo) => hi should be >= lo - 1e-4 // rounded-score ties allowed
        case _ =>
      }
    }
  }
}
