package graft

import org.apache.spark.sql.functions._

/** Cross-checks for the statistical-profiling family (q115-q117):
  * the sufficient-sum regression against Spark's own moment
  * aggregates, histogram mass conservation, and the chi-square
  * marginal identities. */
class StatsSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q129 winsorized and trimmed means match a driver recompute") {
    val vals = sources.Tables.events(spark, dir)
      .select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSeq).toMap
    val got = SparkEntry.queries("q129_robust_means")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    got.keySet shouldBe vals.keySet
    // driver-side percentile_cont: rank = q·(n−1), linear interpolation
    def pct(sorted: IndexedSeq[Double], q: Double): Double = {
      val rank = q * (sorted.size - 1)
      val lo = sorted(rank.toInt)
      val hi = sorted(math.ceil(rank).toInt)
      lo + (rank - rank.toInt) * (hi - lo)
    }
    for ((tpe, xs) <- vals) {
      val r = got(tpe)
      val sorted = xs.sorted.toIndexedSeq
      val (p05, p95) = (pct(sorted, 0.05), pct(sorted, 0.95))
      r.getDouble(r.fieldIndex("p05")) shouldBe p05 +- 1e-3
      r.getDouble(r.fieldIndex("p95")) shouldBe p95 +- 1e-3
      r.getDouble(r.fieldIndex("mean_raw")) shouldBe xs.sum / xs.size +- 1e-3
      val wins = xs.map(v => math.min(math.max(v, p05), p95))
      r.getDouble(r.fieldIndex("mean_winsor")) shouldBe wins.sum / wins.size +- 1e-3
      val kept = xs.filter(v => v >= p05 && v <= p95)
      r.getDouble(r.fieldIndex("mean_trimmed")) shouldBe kept.sum / kept.size +- 1e-3
      // outliers drag the raw mean above both robust forms on this data
      r.getDouble(r.fieldIndex("mean_winsor")) should be < r.getDouble(r.fieldIndex("mean_raw"))
    }
  }

  test("q144 digit shares recompute from exact cents and sum to one") {
    val digits = sources.Tables.orders(spark, dir)
      .select(round($"o_totalprice" * 100, 0).cast("long").as("cents"))
      .collect().map(_.getLong(0).toString.head.asDigit)
    val n = digits.length.toDouble
    val obs = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = SparkEntry.queries("q144_benford_digits")(spark, dir).collect()
    rows.length shouldBe 9 // densified: every digit reports, present or not
    var shareSum = 0.0
    var benfordSum = 0.0
    for (r <- rows) {
      val d = r.getInt(0)
      r.getLong(1) shouldBe obs.getOrElse(d, 0L)
      val e = math.log(1.0 + 1.0 / d) / math.log(10.0)
      r.getDouble(r.fieldIndex("benford_share")) shouldBe e +- 1e-6
      val o = obs.getOrElse(d, 0L).toDouble
      r.getDouble(r.fieldIndex("share")) shouldBe o / n +- 1e-6
      r.getDouble(r.fieldIndex("chi2_contrib")) shouldBe
        (o - n * e) * (o - n * e) / (n * e) +- 1e-3
      shareSum += r.getDouble(r.fieldIndex("share"))
      benfordSum += r.getDouble(r.fieldIndex("benford_share"))
    }
    shareSum shouldBe 1.0 +- 1e-5 // both distributions are complete
    benfordSum shouldBe 1.0 +- 1e-5
  }

  test("q145 bootstrap intervals reproduce from the salted hash exactly") {
    val rows = sources.Tables.events(spark, dir)
      .select($"event_type", $"event_id", $"value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long, rep: Int): Long = {
      val hex = md.digest(s"$id:$rep#graft-boot".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100000
    }
    def pois(u: Long): Long =
      if (u < 36788) 0 else if (u < 73576) 1 else if (u < 91970) 2
      else if (u < 98101) 3 else if (u < 99634) 4 else 5
    val got = SparkEntry.queries("q145_bootstrap_ci")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    got.keySet shouldBe rows.map(_._1).toSet
    for ((tpe, tr) <- rows.groupBy(_._1)) {
      // replay every replicate from the same salted hash → same weights
      val means = (1 to 100).map { rep =>
        var sw = 0L; var swv = 0.0
        for ((_, id, v) <- tr) { val w = pois(u(id, rep)); sw += w; swv += w * v }
        (swv / sw, rep)
      }
      val sorted = means.sortBy { case (m, rep) => (m, rep) }.map(_._1)
      val r = got(tpe)
      r.getDouble(r.fieldIndex("ci_lo")) shouldBe sorted(2) +- 1e-4
      r.getDouble(r.fieldIndex("ci_hi")) shouldBe sorted(97) +- 1e-4
      r.getDouble(r.fieldIndex("boot_mean")) shouldBe
        means.map(_._1).sum / 100.0 +- 1e-4
      // the interval is real: it brackets the plain sample mean
      val sampleMean = tr.map(_._3).sum / tr.length
      r.getDouble(r.fieldIndex("ci_lo")) should be < sampleMean
      r.getDouble(r.fieldIndex("ci_hi")) should be > sampleMean
    }
  }

  test("q132 two-phase Pareto scan equals a naive driver ranking") {
    val rev = sources.Tables.lineitem(spark, dir)
      .groupBy($"l_partkey")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")) * 100.0, 0)
        .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, c) => (-c, k) }
    val total = rev.map(_._2).sum
    var cum = 0L
    val classes = rev.map { case (_, c) =>
      cum += c
      if (cum * 5 <= total * 4) "A" else if (cum * 20 <= total * 19) "B" else "C"
    }
    val expected = classes.zip(rev.map(_._2)).groupBy(_._1)
      .view.mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap

    val got = SparkEntry.queries("q132_pareto_classes")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    got.keySet shouldBe expected.keySet
    for ((cls, (n, centsSum)) <- expected) {
      got(cls)._1 shouldBe n
      got(cls)._2 shouldBe centsSum / 100.0 +- 0.01
    }
    // the A boundary is tight: A holds ≤ 80% of revenue, A plus the
    // first B part exceeds it
    val aRev = expected("A")._2
    aRev * 5 should be <= total * 4
    val firstB = rev(expected("A")._1.toInt)._2
    (aRev + firstB) * 5 should be > total * 4
  }

  test("q135 rank-identity Gini equals the mean-absolute-difference form") {
    val rev = sources.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_partkey")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")) * 100.0, 0)
        .cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble).toSeq).toMap
    val got = SparkEntry.queries("q135_gini_concentration")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(r.fieldIndex("gini"))).toMap
    got.keySet shouldBe rev.keySet
    for ((flag, xs) <- rev) {
      // a DIFFERENT estimator: G = Σᵢⱼ|xᵢ−xⱼ| / (2n²μ) — O(n²), only a
      // test can afford it; agreement proves the rank identity right
      val n = xs.size
      val mu = xs.sum / n
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum / (n.toDouble * n)
      val gini = mad / (2.0 * mu)
      // Σ|xᵢ−xⱼ| = 2Σᵢ(2i−n−1)x₍ᵢ₎ makes the two forms algebraically
      // identical — agreement is exact up to rounding
      got(flag) shouldBe gini +- 1e-4
      got(flag) should (be >= 0.0 and be <= 1.0)
    }
  }

  test("q115 sufficient-sum regression matches Spark's built-in moments") {
    val got = SparkEntry.queries("q115_bivariate_profile")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    // independent recompute with Spark's streaming-moment aggregates —
    // a DIFFERENT algorithm; agreement within rounding distance proves
    // the raw-sum algebra right, not just self-consistent
    val ref = sources.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("c"),
        covar_pop($"l_quantity", $"l_extendedprice").as("cv"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    ref.keySet shouldBe got.keySet
    for ((flag, (c, cv)) <- ref) {
      val row = got(flag)
      row.getDouble(row.fieldIndex("corr_xy")) shouldBe c +- 1e-5
      row.getDouble(row.fieldIndex("covar_pop")) shouldBe cv +- 1e-3
      // r2 = corr² and the fitted line passes through the mean point
      row.getDouble(row.fieldIndex("r2")) shouldBe c * c +- 1e-5
    }
    // regression line through (x̄, ȳ): ȳ − (slope·x̄ + intercept) ≈ 0
    val means = sources.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(avg($"l_quantity").as("mx"), avg($"l_extendedprice").as("my"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((flag, (mx, my)) <- means) {
      val row = got(flag)
      val fitted = row.getDouble(row.fieldIndex("slope")) * mx +
        row.getDouble(row.fieldIndex("intercept"))
      fitted shouldBe my +- 1e-2
    }
  }

  test("q116 histogram conserves mass with ordered in-range bins") {
    val hist = SparkEntry.queries("q116_value_histogram")(spark, dir)
    val byType = hist.groupBy($"event_type").agg(sum($"n").as("n"))
      .as[(String, Long)].collect().toMap
    val raw = sources.Tables.events(spark, dir)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    byType shouldBe raw

    val rows = hist.select($"event_type", $"bin", $"bin_lo")
      .as[(String, Int, Double)].collect()
    all(rows.map(_._2)) should (be >= 0 and be <= 19)
    // bin_lo strictly increases with bin inside each type
    rows.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      sorted.map(_._3).sliding(2).foreach { pair =>
        if (pair.length == 2) pair(0) should be < pair(1)
      }
    }
  }

  test("q117 chi-square cells satisfy the marginal identities") {
    val cells = SparkEntry.queries("q117_chi_square_cells")(spark, dir)
      .select($"event_type", $"dow", $"o", $"e", $"contrib")
      .as[(String, Int, Long, Double, Double)].collect()
    cells.length shouldBe 35 // 5 event types × 7 weekdays
    all(cells.map(_._2)) should (be >= 0 and be <= 6)
    all(cells.map(_._5)) should be >= 0.0

    val total = cells.map(_._3).sum
    total shouldBe sources.Tables.events(spark, dir).count()
    // expected counts reproduce the observed marginals: Σ_dow e = Σ_dow o
    // per type (and the same by column) — the defining property of the
    // independence model
    cells.groupBy(_._1).values.foreach { rs =>
      rs.map(_._4).sum shouldBe rs.map(_._3).sum.toDouble +- 1e-6
    }
    cells.groupBy(_._2).values.foreach { rs =>
      rs.map(_._4).sum shouldBe rs.map(_._3).sum.toDouble +- 1e-6
    }
    // and the global statistic is finite and non-degenerate
    val chi2 = cells.map(_._5).sum
    chi2.isNaN shouldBe false
    chi2 should be >= 0.0
  }

  test("q148 equi-depth buckets tile each type with balanced mass and ordered bounds") {
    val rows = SparkEntry.queries("q148_equidepth_histogram")(spark, dir)
      .as[(String, Int, Long, Double, Double)].collect()
    val byType = rows.groupBy(_._1)
    val counts = graft.sources.Tables.events(spark, dir)
      .groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    byType.foreach { case (t, rs) =>
      // mass conservation: buckets tile the type exactly
      rs.map(_._3).sum shouldBe counts(t)
      // ntile balance: bucket sizes differ by at most one
      (rs.map(_._3).max - rs.map(_._3).min) should be <= 1L
      // bounds are ordered within and across buckets (ties may touch)
      val sorted = rs.sortBy(_._2)
      sorted.foreach { r => r._4 should be <= r._5 }
      sorted.sliding(2).foreach {
        case Array(a, b) => a._5 should be <= b._4
        case _ =>
      }
    }
  }

  test("q174 quantile normalization: endpoints, monotonicity, pooled membership") {
    val rows = SparkEntry.queries("q174_quantile_normalize")(spark, dir)
      .as[(Long, String, Double, Double)].collect()
    val events = sources.Tables.events(spark, dir)
      .select($"event_id").as[Long].collect()
    rows.length shouldBe events.length // one verdict per event, none dropped
    val pooled = rows.map(_._3).sorted
    val pooledSet = pooled.toSet
    // every normalized value IS a pooled order statistic (the map only
    // re-indexes, never computes)
    all(rows.map(_._4)) should (be >= pooled.head and be <= pooled.last)
    rows.foreach { r => pooledSet should contain(r._4) }
    rows.groupBy(_._2).foreach { case (_, g) =>
      val sorted = g.sortBy(r => (r._3, r._1))
      // group min/max map to pooled min/max (rank-0 and rank-(n-1))
      sorted.head._4 shouldBe pooled.head
      sorted.last._4 shouldBe pooled.last
      // monotone: higher in-group value never maps lower
      sorted.sliding(2).foreach {
        case Array(a, b) => a._4 should be <= b._4
        case _ => ()
      }
      // post-map, the group's distribution IS the pooled distribution:
      // Kolmogorov distance to the pooled ECDF under 2 grid steps
      val n = sorted.length
      if (n > 1) {
        val ks = sorted.zipWithIndex.map { case (r, i) =>
          val pooledRank = pooled.indexWhere(_ >= r._4) // first match
          math.abs(pooledRank.toDouble / pooled.length - i.toDouble / n)
        }.max
        ks should be <= 2.0 / n + 1e-9
      }
    }
  }

  test("q176 histogram-refinement median equals the naive sorted order statistic") {
    val got = SparkEntry.queries("q176_exact_median")(spark, dir)
      .as[(String, Double)].collect().toMap
    val vals = sources.Tables.events(spark, dir)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1)
    got.keySet shouldBe vals.keySet
    vals.foreach { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val k = (sorted.length + 1) / 2 // 1-based lower-median rank
      got(g) shouldBe sorted(k - 1)
    }
    // the refinement holds at pathological bucket counts too (all mass
    // in one bucket at B = 2; exactness must not depend on spread)
    val two = Graft.exactMedian(sources.Tables.events(spark, dir), buckets = 2)
      .as[(String, Double)].collect().toMap
    two shouldBe got
  }

  test("q182 MAD report replays the two-level median and the robust fence") {
    val got = SparkEntry.queries("q182_mad_outliers")(spark, dir)
      .as[(String, Double, Double, Long, Long, Double)].collect()
    val vals = sources.Tables.events(spark, dir)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def lowerMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.length + 1) / 2 - 1)
    }
    got.map(_._1).toSet shouldBe vals.keySet
    got.foreach { case (g, med, mad, n, nOut, frac) =>
      val xs = vals(g)
      n shouldBe xs.length
      med shouldBe lowerMedian(xs)
      mad shouldBe lowerMedian(xs.map(x => math.abs(x - med)))
      nOut shouldBe xs.count(x => math.abs(x - med) > 3 * 1.4826 * mad)
      frac shouldBe BigDecimal(nOut.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-12
      // the robust fence keeps the bulk: outliers are a strict minority
      nOut.toDouble / n should be < 0.5
    }
  }

  test("q191 FD verdicts equal a driver recount over the candidate columns") {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val rows = sources.Tables.orders(spark, dir)
      .select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(r => cols.zipWithIndex.map { case (c, i) => c -> r.get(i).toString }.toMap)
    val got = SparkEntry.queries("q191_fd_discovery")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    got.size shouldBe cols.size * (cols.size - 1)
    for (a <- cols; b <- cols if a != b) {
      val groups = rows.groupBy(_(a)).view.mapValues(_.map(_(b)).distinct.size.toLong)
      val (nG, viol, maxR, holds) = got((a, b))
      nG shouldBe groups.size.toLong
      viol shouldBe groups.values.count(_ > 1).toLong
      maxR shouldBe groups.values.max
      holds shouldBe (if (groups.values.max == 1L) 1 else 0)
    }
  }

  test("q192 MI cells satisfy the marginal identities and sum to a non-negative MI") {
    val rows = SparkEntry.queries("q192_mutual_information")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val n = rows.map(_._3).sum
    // margins reconcile with the cells they annotate
    rows.groupBy(_._1).foreach { case (_, g) =>
      g.map(_._4).distinct should have size 1
      g.map(_._3).sum shouldBe g.head._4
    }
    rows.groupBy(_._2).foreach { case (_, g) =>
      g.map(_._5).distinct should have size 1
      g.map(_._3).sum shouldBe g.head._5
    }
    // lift is the exact cross-ratio; term = p*ln(lift) (rounded 6dp)
    for ((_, _, nTd, nT, nD, lift, term) <- rows) {
      lift shouldBe (nTd * n).toDouble / (nT * nD)
      term shouldBe (math.floor((nTd.toDouble / n) * math.log(lift) * 1e6 + 0.5) / 1e6)
    }
    // MI ≥ 0 (Gibbs); per-cell rounding error is bounded by cells·5e-7
    rows.map(_._7).sum should be >= -rows.size * 5e-7
    // deciles are balanced within one row (q148's ntile discipline)
    val dSizes = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).values
    (dSizes.max - dSizes.min) should be <= 1L
  }

  test("q179 WOE bins recompute from raw counts; IV terms are non-negative") {
    val rows = SparkEntry.queries("q179_woe_binning")(spark, dir)
      .as[(Int, Long, Long, Long, Double, Double, Double, Double)].collect()
    rows.map(_._1).sorted.toSeq shouldBe (1 to 10)
    val orders = sources.Tables.orders(spark, dir).count()
    rows.map(_._2).sum shouldBe orders
    val (tp, tn) = (rows.map(_._3).sum.toDouble, rows.map(_._4).sum.toDouble)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (_, n, pos, neg, lo, hi, woe, iv) =>
      n shouldBe pos + neg
      lo should be <= hi
      woe shouldBe r6(math.log((pos / tp) / (neg / tn))) +- 1e-9
      iv shouldBe r6((pos / tp - neg / tn) * math.log((pos / tp) / (neg / tn))) +- 1e-9
      iv should be >= 0.0 // sign(dist diff) == sign(log ratio) always
    }
    // equi-depth: bin sizes differ by at most one
    val sizes = rows.map(_._2)
    (sizes.max - sizes.min) should be <= 1L
  }


  test("q199: reversal flags are consistent and pooled diff is one number") {
    val rows = SparkEntry.queries("q199_simpson_reversal")(spark, dir).collect()
    rows should not be empty
    rows.map(_.getAs[Double]("pooled_diff")).distinct.length shouldBe 1
    rows.foreach { r =>
      r.getAs[Long]("n_F") should be > 0L
      r.getAs[Long]("n_O") should be > 0L
      val flag = (r.getAs[Double]("diff") > 0) != (r.getAs[Double]("pooled_diff") > 0)
      // rounded diffs can sit exactly at 0; only assert when the sign
      // is unambiguous at display precision
      if (math.abs(r.getAs[Double]("diff")) > 1e-4)
        r.getAs[Int]("reversed") shouldBe (if (flag) 1 else 0)
    }
  }

  test("q200: calibration bins partition the corpus; ECE terms reconcile") {
    val rows = SparkEntry.queries("q200_calibration_bins")(spark, dir).collect()
    rows.map(_.getAs[Int]("decile")).sorted.toSeq shouldBe (1 to 10)
    val n = rows.map(_.getAs[Long]("n")).sum
    n shouldBe graft.sources.Tables.documents(spark, dir).count()
    // deciles are equal-mass within 1 (the ntile contract)
    val sizes = rows.map(_.getAs[Long]("n"))
    (sizes.max - sizes.min) should be <= 1L
    rows.foreach { r =>
      r.getAs[Double]("mean_pred") should (be >= 0.0 and be <= 1.0)
      r.getAs[Double]("obs_rate") should (be >= 0.0 and be <= 1.0)
      // |mean_pred − obs_rate|·n/N at display precision
      r.getAs[Double]("ece_term") shouldBe
        (math.abs(r.getAs[Double]("mean_pred") - r.getAs[Double]("obs_rate")) *
          r.getAs[Long]("n") / n) +- 2e-6
    }
  }

  test("q204: Heaps growth is monotone, last checkpoint is the full corpus") {
    import org.apache.spark.sql.functions.{countDistinct, explode, split}
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q204_heaps_growth")(spark, dir).collect()
      .sortBy(_.getAs[Int]("checkpoint"))
    rows.map(_.getAs[Int]("checkpoint")).toSeq shouldBe (1 to 5)
    // vocabulary and token mass are monotone in prefix size
    Seq("n_docs", "n_tokens", "vocab").foreach { c =>
      val xs = rows.map(_.getAs[Long](c))
      xs.zip(xs.tail).foreach { case (a, b) => a should be <= b }
    }
    // checkpoint 5 = the whole corpus, vocab equals a direct recount
    val docs = graft.sources.Tables.documents(spark, dir)
    val fullVocab = docs.select(explode(split($"text", "\\s+")).as("t"))
      .agg(countDistinct($"t")).as[Long].head()
    rows.last.getAs[Long]("vocab") shouldBe fullVocab
    rows.last.getAs[Long]("n_docs") shouldBe docs.count()
    // one beta for the whole report, and sublinear growth: beta < 1
    rows.map(_.getAs[Double]("heaps_beta")).distinct.length shouldBe 1
    rows.head.getAs[Double]("heaps_beta") should be < 1.0
  }

  test("q198: Zipf fit has negative slope and sane R-squared") {
    val r = SparkEntry.queries("q198_zipf_fit")(spark, dir).collect().head
    // the synthetic sf0.001 corpus has a ~31-token vocabulary
    r.getAs[Long]("n_terms") should be > 10L
    r.getAs[Double]("slope") should be < 0.0
    r.getAs[Double]("r2") should (be > 0.0 and be <= 1.0)
  }

  test("weightedQuartiles equals the naive weighted-cumulative definition") {
    import graft.operators.Stats
    val rnd = new scala.util.Random(17)
    // duplicates, skewed weights, negative values — and a tiny frame
    val cases = Seq(
      "varied" -> (1 to 2000).map(i =>
        (rnd.nextInt(300).toDouble - 150.0, (rnd.nextInt(9) + 1).toLong)),
      "heavy duplicates" -> (1 to 500).map(i =>
        ((i % 7).toDouble, (i % 4 + 1).toLong)),
      "all equal values" -> (1 to 50).map(_ => (42.0, 3L)),
      "one row" -> Seq((5.0, 9L)))
    cases.foreach { case (label, data) =>
      withClue(s"case: $label — ") {
        val df = data.toDF("v", "w").repartition(5)
        val got = Stats.weightedQuartiles(df, "v", "w", buckets = 16)
          .as[(Int, Double, Long, Long)].collect().sortBy(_._1)
        // naive: per-distinct-value weights, cumulative ascending,
        // quartile k = first value with cum*4 >= k*W
        val byV = data.groupBy(_._1).view.mapValues(_.map(_._2).sum)
          .toSeq.sortBy(_._1)
        val tw = byV.map(_._2).sum
        val want = (1 to 3).map { k =>
          var cum = 0L
          val (v, c) = byV.iterator.map { case (v, w) =>
            cum += w; (v, cum)
          }.find(_._2 * 4 >= k * tw).get
          (k, v, c, tw)
        }
        got.toSeq shouldBe want
      }
    }
    // fractional weights abort loudly instead of silently truncating
    val bad = Seq((1.0, 1.5), (2.0, 2.0)).toDF("v", "w")
    intercept[Exception] {
      graft.Graft.weightedQuartiles(bad, "v", "w").collect()
    }.getMessage should include("fractional weight")
    // null values carry no mass (documented semantics): the quartiles
    // equal those of the non-null subset, not an engine's null order
    val withNulls = (Seq((Option.empty[Double], 100L)) ++
      (1 to 9).map(i => (Some(i.toDouble), 1L))).toDF("v", "w")
    graft.Graft.weightedQuartiles(withNulls, "v", "w")
      .as[(Int, Double, Long, Long)].collect().sortBy(_._1).toSeq shouldBe
      Seq((1, 3.0, 3L, 9L), (2, 5.0, 5L, 9L), (3, 7.0, 7L, 9L))
  }
}
