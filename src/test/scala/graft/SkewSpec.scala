package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting operators: result-equivalence with the unsalted forms on a
  * deliberately skewed dataset (90% of rows on one key). */
class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val skewed = {
    val rnd = new scala.util.Random(5)
    (1 to 20000).map { i =>
      val key = if (i % 10 != 0) "hot" else s"k${i % 97}"
      (i.toLong, key, rnd.nextInt(1000).toDouble / 4)
    }.toDF("id", "key", "v")
  }

  test("salted aggregation equals direct aggregation") {
    val direct = skewed.groupBy($"key")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(skewed, "key", "v", buckets = 16, saltFrom = $"id")
      .as[(String, Double, Long)].collect().toSet
    salted.map { case (k, s, n) => (k, math.round(s * 100), n) } shouldBe
      direct.map { case (k, s, n) => (k, math.round(s * 100), n) }
  }

  test("salted join equals direct join") {
    val dim = skewed.select($"key").distinct()
      .withColumn("tag", concat(lit("t_"), $"key"))
    val direct = skewed.join(dim, Seq("key"))
      .select($"id", $"tag").as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, "key", buckets = 16, saltFrom = $"id")
      .select($"id", $"tag").as[(Long, String)].collect().toSet
    salted shouldBe direct
    // every row survived exactly once (no dup/loss from replication)
    salted.size shouldBe skewed.count()
  }

  test("q151 salted two-phase profile equals the direct one-pass aggregate") {
    val dir = "/root/testdata/sf0.001"
    val salted = SparkEntry.queries("q151_salted_agg")(spark, dir)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    val direct = graft.sources.Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_rows"), sum($"l_quantity").as("sum_qty"),
        min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"))
      .select($"l_suppkey", $"n_rows", $"sum_qty", $"min_qty", $"max_qty",
        round($"sum_qty" / $"n_rows", 6).as("avg_qty"))
      .orderBy($"l_suppkey")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    // bit-for-bit: integer-valued quantities make every double exact
    salted shouldBe direct
  }

  test("rendezvous routing moves ONLY to the new shard on grow, and is stable") {
    val ids = (1L to 5000L).toDF("id").repartition(7)
    val both = Skew.rendezvousRoute(
        Skew.rendezvousRoute(ids, "id", 8, out = "s8"), "id", 9, out = "s9")
      .select($"id", $"s8", $"s9").cache()
    try {
      // HRW minimal-movement law: a changed assignment can only land on
      // the ADDED shard (8) — growing the set never re-routes between
      // survivors
      both.filter($"s8" =!= $"s9" && $"s9" =!= 8).count() shouldBe 0
      // every doc routes inside range on both layouts
      both.filter($"s8" < 0 || $"s8" > 7 || $"s9" < 0 || $"s9" > 8)
        .count() shouldBe 0
      // expected movement |D|/9 ≈ 556; allow generous sampling slack
      val moved = both.filter($"s8" =!= $"s9").count()
      moved.toDouble / 5000 should be (1.0 / 9 +- 0.04)
      // routing is a pure function of the id — independent of layout
      val re = Skew.rendezvousRoute(ids.repartition(3), "id", 8, out = "s8b")
      both.join(re, "id").filter($"s8" =!= $"s8b").count() shouldBe 0
    } finally both.unpersist()
  }

  test("q207 audit certifies zero moved_in on surviving shards") {
    val rows = SparkEntry.queries("q207_rendezvous_shards")(
      spark, "/root/testdata/sf0.001").collect()
    rows.length shouldBe 9
    val total = rows.map(_.getAs[Long]("n_new")).sum
    rows.map(_.getAs[Long]("n_old")).sum shouldBe total
    rows.foreach { r =>
      val shard = r.getAs[Int]("shard")
      if (shard < 8) r.getAs[Long]("moved_in") shouldBe 0L
      else {
        // the added shard receives exactly its new population
        r.getAs[Long]("moved_in") shouldBe r.getAs[Long]("n_new")
        r.getAs[Long]("n_old") shouldBe 0L
      }
    }
  }

}
