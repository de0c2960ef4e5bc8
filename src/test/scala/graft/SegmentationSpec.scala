package graft

import org.apache.spark.sql.functions._

/** Invariants of the segmentation family the exact-value oracles can't
  * express: ntile balance within every scoring partition, label/score
  * consistency, assignment determinism, and that the z readout agrees
  * with a from-scratch recomputation off the emitted counts. */
class SegmentationSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q137 quintiles are balanced within each segment and labels match scores") {
    val rows = SparkEntry.queries("q137_rfm_segments")(spark, dir)
      .select($"c_mktsegment", $"r_score", $"f_score", $"m_score",
        $"rfm_cell", $"segment_label")
      .as[(String, Int, Int, Int, Int, String)].collect()

    // ntile(5) balance: within a segment, bucket sizes differ by ≤ 1
    for (dim <- 0 until 3) {
      val pick: ((String, Int, Int, Int, Int, String)) => Int =
        r => dim match { case 0 => r._2; case 1 => r._3; case _ => r._4 }
      rows.groupBy(_._1).foreach { case (_, seg) =>
        val sizes = seg.groupBy(pick).values.map(_.length)
        (sizes.max - sizes.min) should be <= 1
      }
    }
    rows.foreach { case (_, r, f, m, cell, label) =>
      cell shouldBe r * 100 + f * 10 + m
      val expect =
        if (r >= 4 && f >= 4 && m >= 4) "champion"
        else if (r >= 4 && f <= 2) "new"
        else if (r <= 2 && f >= 4) "at_risk"
        else if (r <= 2 && f <= 2) "lapsed"
        else "core"
      label shouldBe expect
    }
    // the cut is non-degenerate: several lifecycle labels appear
    rows.map(_._6).distinct.length should be >= 3
  }

  test("q137 monetary score ranks by exact cents, recency by last order") {
    val scored = SparkEntry.queries("q137_rfm_segments")(spark, dir)
    val joined = scored.join(
      sources.Tables.orders(spark, dir).groupBy($"o_custkey").agg(
        sum(round($"o_totalprice" * 100, 0).cast("long")).as("cents"),
        max(unix_micros($"o_orderdate".cast("timestamp"))).as("last_us")),
      $"c_custkey" === $"o_custkey")
      .select($"c_mktsegment", $"m_score", $"cents", $"r_score", $"last_us",
        $"c_custkey")
      .as[(String, Int, Long, Int, Long, Long)].collect()
    joined.groupBy(_._1).foreach { case (_, seg) =>
      // a higher m_score bucket never holds a strictly poorer (cents, key)
      val byM = seg.sortBy(r => (r._3, r._6)).map(_._2)
      byM shouldBe byM.sorted
      val byR = seg.sortBy(r => (r._5, r._6)).map(_._4)
      byR shouldBe byR.sorted
    }
  }

  test("q138 counts reconcile and the z readout recomputes from them") {
    val row = SparkEntry.queries("q138_ab_test")(spark, dir).collect().head
    val (na, ca, nb, cb) = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3))
    val nUsers = sources.Tables.events(spark, dir)
      .select($"user_id").distinct().count()
    na + nb shouldBe nUsers
    ca should be <= na
    cb should be <= nb
    // both arms populated at the smallest fixture — the divides are live
    na should be > 0L
    nb should be > 0L

    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    row.getDouble(4) shouldBe pa
    row.getDouble(5) shouldBe pb
    val pp = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    row.getDouble(6) shouldBe z +- 1e-6
    row.getInt(7) shouldBe (if (math.abs(z) > 1.96) 1 else 0)
  }

  test("q141 shares q138's arms and the CUPED algebra recomputes on the driver") {
    val rows = SparkEntry.queries("q141_cuped_adjustment")(spark, dir).collect()
    rows.length shouldBe 2
    // same salted assignment as q138 by construction — arm sizes agree
    val ab = SparkEntry.queries("q138_ab_test")(spark, dir).collect().head
    rows(0).getLong(rows(0).fieldIndex("n_users")) shouldBe ab.getLong(0)
    rows(1).getLong(rows(1).fieldIndex("n_users")) shouldBe ab.getLong(2)

    // driver recompute of θ and the adjusted means from per-user sums,
    // replicating the salt literal (locks the published assignment)
    val cutoff = 1705363200000000L
    val isPre = $"event_type" === "purchase" && unix_micros($"ts") < cutoff
    val isPost = $"event_type" === "purchase" && unix_micros($"ts") >= cutoff
    val perUser = sources.Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(sum(when(isPre, $"value").otherwise(0.0)).as("x"),
        sum(when(isPost, $"value").otherwise(0.0)).as("y"))
      .withColumn("variant", functions.Portable.hash32(
        concat($"user_id".cast("string"), lit("#graft-exp1"))) % 2)
      .collect()
      .map(r => (r.getAs[Number](r.fieldIndex("variant")).intValue,
        r.getDouble(r.fieldIndex("x")), r.getDouble(r.fieldIndex("y"))))
    val byArm = perUser.groupBy(_._1)
    val (gn, gsx, gsy) = (perUser.length.toDouble,
      perUser.map(_._2).sum, perUser.map(_._3).sum)
    val gsxy = perUser.map(t => t._2 * t._3).sum
    val gsxx = perUser.map(t => t._2 * t._2).sum
    val theta = (gn * gsxy - gsx * gsy) / (gn * gsxx - gsx * gsx)
    val xbar = gsx / gn

    var weightedAdj = 0.0
    var weightedPost = 0.0
    for (r <- rows) {
      val arm = byArm(r.getAs[Number](0).intValue)
      val n = arm.length.toDouble
      val (mx, my) = (arm.map(_._2).sum / n, arm.map(_._3).sum / n)
      r.getDouble(r.fieldIndex("mean_pre")) shouldBe mx +- 1e-4
      r.getDouble(r.fieldIndex("mean_post")) shouldBe my +- 1e-4
      r.getDouble(r.fieldIndex("mean_post_adj")) shouldBe
        (my - theta * (mx - xbar)) +- 1e-4
      r.getDouble(r.fieldIndex("theta")) shouldBe theta +- 1e-6
      weightedAdj += n * r.getDouble(r.fieldIndex("mean_post_adj"))
      weightedPost += n * r.getDouble(r.fieldIndex("mean_post"))
    }
    // the defining CUPED invariant: Σ n_a·(x̄_a − x̄) = 0, so adjustment
    // moves the arms but never the population mean
    weightedAdj shouldBe weightedPost +- gn * 2e-4
  }

  test("q138 assignment is the deterministic salted split, stable across runs") {
    val v1 = SparkEntry.queries("q138_ab_test")(spark, dir).collect()
    val v2 = SparkEntry.queries("q138_ab_test")(spark, dir).collect()
    v1 shouldBe v2 // no rand() anywhere: a backfill reproduces the readout
  }

  test("q161 Mann-Whitney equals a from-scratch midrank recount with tie correction") {
    val row = SparkEntry.queries("q161_mann_whitney")(spark, dir).collect().head
    // driver recount: per-user event counts, the same salted arms
    val perUser = sources.Tables.events(spark, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("m"))
      .withColumn("variant", functions.Portable.hash32(
        concat($"user_id".cast("string"), lit("#graft-exp1"))) % 2)
      .collect()
      .map(r => (r.getAs[Number](r.fieldIndex("variant")).intValue,
        r.getLong(r.fieldIndex("m"))))
    val n = perUser.length
    val nA = perUser.count(_._1 == 0)
    row.getLong(row.fieldIndex("n_a")) shouldBe nA.toLong
    row.getLong(row.fieldIndex("n_b")) shouldBe (n - nA).toLong
    // midranks over the combined sample
    val sorted = perUser.map(_._2).sorted
    val midrank = perUser.map(_._2).distinct.map { v =>
      val less = sorted.count(_ < v); val eq = sorted.count(_ == v)
      v -> (less + (eq + 1) / 2.0)
    }.toMap
    val rA = perUser.filter(_._1 == 0).map(t => midrank(t._2)).sum
    row.getDouble(row.fieldIndex("r_a")) shouldBe rA // exact: halves only
    // rank-sum identity: R_a + R_b = N(N+1)/2
    val rB = perUser.filter(_._1 == 1).map(t => midrank(t._2)).sum
    rA + rB shouldBe n.toLong * (n + 1) / 2.0
    val uA = rA - nA.toLong * (nA + 1) / 2.0
    row.getDouble(row.fieldIndex("u_stat")) shouldBe uA
    // z with the tie-corrected variance, textbook form
    val ties = perUser.map(_._2).groupBy(identity).values.map(_.length.toLong)
    val tieSum = ties.map(t => t * t * t - t).sum
    val nB = n - nA
    val varU = nA.toDouble * nB / 12.0 *
      ((n + 1).toDouble - tieSum.toDouble / (n.toLong * (n - 1)).toDouble)
    val z = (uA - nA.toDouble * nB / 2.0) / math.sqrt(varU)
    row.getDouble(row.fieldIndex("z_stat")) shouldBe z +- 1e-6
    // ties really exist in a count metric: the correction is load-bearing
    tieSum should be > 0L
    row.getInt(row.fieldIndex("is_significant")) shouldBe (if (math.abs(z) > 1.96) 1 else 0)
  }

  test("dbscan recovers two blobs, a bridge-border, and noise by hand") {
    // blob A: 4 points within eps of each other around (0,0); blob B:
    // 4 around (1,1); point 9 is within eps of ONE core point of A but
    // has too few neighbors to be core itself → border of A; point 10
    // is far from everything → noise. eps=0.15, minPts=3 (incl. self).
    val pts = Seq(
      (1L, 0.00, 0.00), (2L, 0.10, 0.00), (3L, 0.00, 0.10), (4L, 0.07, 0.07),
      (5L, 1.00, 1.00), (6L, 1.10, 1.00), (7L, 1.00, 1.10), (8L, 1.07, 1.07),
      (9L, 0.24, 0.00), // within 0.15 of point 2 only → border
      (10L, 5.00, 5.00) // noise
    ).toDF("id", "x", "y").repartition(3)
    val got = graft.Graft.dbscan(pts, "id", "x", "y", eps = 0.15, minPts = 3L)
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_core"), r.getAs[Long]("n_border"),
          r.getAs[Long]("n_points"))).toMap
    // clusters labeled by min member id: A = 1, B = 5, noise row = -1
    got.keySet shouldBe Set(-1L, 1L, 5L)
    got(1L) shouldBe ((4L, 1L, 5L))
    got(5L) shouldBe ((4L, 0L, 4L))
    got(-1L) shouldBe ((0L, 0L, 1L))
  }

  test("q212 counts reconcile with a quadratic driver DBSCAN on the corpus") {
    reconcileQuadratic("q212_dbscan", 0.05)
  }

  test("q223 (density-normalized eps) reconciles with a quadratic driver DBSCAN") {
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    reconcileQuadratic("q223_dbscan_scaled", 0.05 / math.sqrt(n / 2000.0))
  }

  private def reconcileQuadratic(query: String, eps: Double): Unit = {
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", element_at($"embedding", 1).cast("double").as("x"),
        element_at($"embedding", 2).cast("double").as("y"))
      .as[(Long, Double, Double)].collect()
    val eps2 = eps * eps
    def nbrs(p: (Long, Double, Double)) = emb.filter(q =>
      (p._2 - q._2) * (p._2 - q._2) + (p._3 - q._3) * (p._3 - q._3) <= eps2)
    val core = emb.filter(p => nbrs(p).length >= 4).map(_._1).toSet
    // driver union-find over core-core eps-edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(a: Long): Long = { var r = a; while (parent(r) != r) r = parent(r); r }
    for (p <- emb if core(p._1); q <- nbrs(p) if core(q._1) && q._1 != p._1) {
      val (ra, rb) = (find(p._1), find(q._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> find(c)).toMap
    // min-id labels: canonicalize to min member per component
    val canon = label.groupBy(_._2).flatMap { case (_, m) =>
      val lo = m.keys.min; m.keys.map(_ -> lo)
    }
    val borders = emb.filter(p => !core(p._1))
      .flatMap { p =>
        val cs = nbrs(p).filter(q => core(q._1)).map(q => canon(q._1))
        if (cs.isEmpty) None else Some(p._1 -> cs.min)
      }.toMap
    val want = (core.toSeq.map(c => (canon(c), 1)) ++
      borders.toSeq.map { case (_, c) => (c, 0) })
      .groupBy(_._1).map { case (c, m) =>
        c -> (m.count(_._2 == 1).toLong, m.count(_._2 == 0).toLong, m.size.toLong)
      }
    val noise = emb.length - core.size - borders.size
    val got = SparkEntry.queries(query)(spark, dir).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_core"), r.getAs[Long]("n_border"),
          r.getAs[Long]("n_points"))).toMap
    got(-1L) shouldBe ((0L, 0L, noise.toLong))
    (got - (-1L)) shouldBe want
  }
}
