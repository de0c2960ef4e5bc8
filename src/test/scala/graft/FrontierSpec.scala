package graft

/** Invariant checks for the q162-q166 batch (privacy diversity, skyline,
  * Z-order layout, grid-density clustering, Bloom join) — value parity
  * is the DuckDB oracle's job; these assert the structural guarantees
  * the oracle can't express. */
class FrontierSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q163 skyline equals the definitional quadratic frontier, with no join in the plan") {
    val sky = SparkEntry.queries("q163_skyline")(spark, sfDir)
    // the O(n log n) rewrite must not re-introduce a self-join
    import org.apache.spark.sql.catalyst.plans.logical.Join
    sky.queryExecution.optimizedPlan.collect { case j: Join => j } shouldBe empty
    val got = sky.as[(Long, Long, Long)].collect().toSet
    val per = graft.sources.Tables.part(spark, sfDir)
      .selectExpr("p_partkey", "CAST(p_size AS BIGINT) AS s",
        "CAST(round(p_retailprice * 100) AS BIGINT) AS c")
      .as[(Long, Long, Long)].collect()
    val brute = per.filter { case (_, x, y) =>
      !per.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y) }
    }.toSet
    got shouldBe brute
    got should not be empty
  }

  test("q166 bloom filter has zero false negatives and a small, honest FP rate") {
    val r = SparkEntry.queries("q166_bloom_filter_join")(spark, sfDir).head()
    r.getAs[Long]("false_neg") shouldBe 0L // Bloom filters never drop members
    r.getAs[Long]("bloom_pass") should be >= r.getAs[Long]("true_match")
    r.getAs[Double]("fp_rate") should be < 0.05
    // true_match recomputed independently as an exact semi-join
    val exact = graft.sources.Tables.orders(spark, sfDir).join(
      graft.sources.Tables.customer(spark, sfDir)
        .filter($"c_acctbal" > 9000.0).select($"c_custkey"),
      $"o_custkey" === $"c_custkey", "left_semi").count()
    r.getAs[Long]("true_match") shouldBe exact
    // the bitmap reaches the probe side as a broadcast, never a shuffle
    val plan = SparkEntry.queries("q166_bloom_filter_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("q164 zorder layout bounds the user span that the linear layout leaves unbounded") {
    val rows = SparkEntry.queries("q164_zorder_layout")(spark, sfDir).collect()
    val byLayout = rows.groupBy(_.getAs[String]("layout"))
    byLayout.keySet shouldBe Set("linear", "zorder")
    val total = graft.sources.Tables.events(spark, sfDir).count()
    byLayout.values.foreach { fs =>
      fs.length shouldBe 16
      fs.map(_.getAs[Long]("n_rows")).sum shouldBe total
    }
    def avgSpan(layout: String, lo: String, hi: String): Double = {
      val fs = byLayout(layout)
      fs.map(r => (r.getAs[Long](hi) - r.getAs[Long](lo) + 1).toDouble).sum / fs.length
    }
    // ingestion order scatters users across every file (full ~64-wide
    // span); Morton interleave must cut that span sharply on the same
    // files while keeping day ranges bounded too
    avgSpan("zorder", "u_lo", "u_hi") should be < 0.5 * avgSpan("linear", "u_lo", "u_hi")
  }

  test("q165 grid clusters match a driver-side union-find over the same core cells") {
    val out = SparkEntry.queries("q165_grid_density")(spark, sfDir).collect()
    out.length should be >= 2 // the fixture has ≥2 dense patches
    // rebuild the core-cell graph on the driver (≤ dozens of cells)
    val cells = graft.sources.Tables.embeddings(spark, sfDir)
      .selectExpr(
        "CAST(floor(CAST(embedding[0] AS DOUBLE) / 0.05) AS BIGINT) AS cx",
        "CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05) AS BIGINT) AS cy")
      .groupBy("cx", "cy").count()
      .filter($"count" >= 3)
      .as[(Long, Long, Long)].collect()
    val id = cells.map { case (cx, cy, _) => (cx, cy) -> ((cx + 100) * 1000 + (cy + 100)) }.toMap
    val parent = scala.collection.mutable.Map(id.values.map(v => v -> v).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      ((cx, cy), a) <- id
      dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0
      b <- id.get((cx + dx, cy + dy))
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = id.values.groupBy(find).map { case (root, ms) =>
      ms.min -> ms.size }.toMap
    val gotten = out.map(r =>
      r.getAs[Long]("cluster_id") -> r.getAs[Long]("n_cells").toInt).toMap
    gotten shouldBe expected
    // point mass adds up to the core cells' total
    out.map(_.getAs[Long]("n_points")).sum shouldBe cells.map(_._3).sum
  }

  test("q162 diversity readout is internally consistent") {
    val rows = SparkEntry.queries("q162_l_diversity")(spark, sfDir).collect()
    rows should not be empty
    rows.foreach { r =>
      val size = r.getAs[Long]("class_size")
      val ld = r.getAs[Long]("l_distinct")
      val le = r.getAs[Double]("l_entropy")
      ld should be <= size
      // exp(entropy) is bounded by the support size and at least 1
      le should be >= 1.0 - 1e-9
      le should be <= ld.toDouble + 1e-6
      r.getAs[Int]("at_risk") shouldBe (if (ld < 3) 1 else 0)
    }
  }
}
