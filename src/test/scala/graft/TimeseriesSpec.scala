package graft

import org.apache.spark.sql.functions._

/** Cross-checks for the time-series monitoring family (q125-q127).
  * The load-bearing test is the q125 identity: the distributed
  * prefix-sum/running-min form is checked row-for-row against the
  * textbook sequential CUSUM recurrence replayed on the driver — a
  * different algorithm, so agreement proves the scan identity, not
  * just self-consistency (the oracle-proves-decomposition pattern). */
class TimeseriesSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val daily: Map[String, Seq[(java.sql.Date, Long)]] =
    sources.Tables.events(spark, dir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(_._2.toString).map(t => (t._2, t._3)).toSeq).toMap

  test("q125 window form equals the sequential CUSUM recurrence") {
    val got = SparkEntry.queries("q125_cusum_changepoint")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(r.fieldIndex("cusum")), r.getInt(r.fieldIndex("breach"))))
      .toMap
    got.size shouldBe daily.values.map(_.size).sum
    for ((tpe, series) <- daily) {
      val xs = series.map(_._2.toDouble)
      val n = xs.size.toDouble
      val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
      val sigma = math.sqrt(n * sxx - sx * sx) / n
      val mu = sx / n
      var s = 0.0
      for (((day, x), i) <- series.zipWithIndex) {
        s = math.max(0.0, s + (x - mu - 0.5 * sigma)) // Page's recurrence
        val (cusum, breach) = got((tpe, day.toString))
        cusum shouldBe s +- 1e-3
        breach shouldBe (if (s > 4.0 * sigma) 1 else 0)
        if (i == 0) cusum shouldBe math.max(0.0, x - mu - 0.5 * sigma) +- 1e-3
      }
    }
  }

  test("q126 components reconstruct the series and residuals center at zero") {
    val rows = SparkEntry.queries("q126_seasonal_decompose")(spark, dir).collect()
    rows should not be empty
    // additive decomposition: seasonal + resid == cnt (up to 4-dp rounding)
    for (r <- rows) {
      val cnt = r.getLong(r.fieldIndex("cnt")).toDouble
      val s = r.getDouble(r.fieldIndex("seasonal"))
      val resid = r.getDouble(r.fieldIndex("resid"))
      (s + resid) shouldBe cnt +- 2e-4
    }
    // the seasonal component is the hour-of-day mean, so residuals sum
    // to ~zero WITHIN each (type, hour-of-day) cell — the defining
    // property of the fit, checked per cell not just globally
    val byCell = rows.groupBy(r =>
      (r.getString(0), r.getTimestamp(1).toInstant
        .atZone(java.time.ZoneOffset.UTC).getHour))
    for ((_, cell) <- byCell) {
      val m = cell.map(_.getDouble(cell.head.fieldIndex("resid"))).sum / cell.size
      m shouldBe 0.0 +- 1e-3
    }
    // outliers are rare by construction (3σ) — sanity-bound the rate
    val outRate = rows.count(r => r.getInt(r.fieldIndex("outlier")) == 1).toDouble / rows.size
    outRate should be < 0.05
  }

  test("q130 rolling correlation matches a driver recompute per 7-day frame") {
    val got = SparkEntry.queries("q130_rolling_correlation")(spark, dir).collect()
    got should not be empty
    // rebuild the two aligned series from the per-type daily grid
    val clicks = daily("click").map { case (d, c) => d.toString -> c.toDouble }.toMap
    val purchases = daily("purchase").map { case (d, c) => d.toString -> c.toDouble }.toMap
    // the grid covers every day ANY event type fired, not just these two
    val days = daily.values.flatten.map(_._1.toString).toSet.toSeq.sorted
    val xs = days.map(d => clicks.getOrElse(d, 0.0))
    val ys = days.map(d => purchases.getOrElse(d, 0.0))
    got.length shouldBe days.size - 6
    for (r <- got) {
      val i = days.indexOf(r.getDate(0).toString)
      i should be >= 6
      val (wx, wy) = (xs.slice(i - 6, i + 1), ys.slice(i - 6, i + 1))
      val n = 7.0
      val (sx, sy) = (wx.sum, wy.sum)
      val sxy = wx.zip(wy).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (wx.map(a => a * a).sum, wy.map(a => a * a).sum)
      val expect = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      r.getDouble(r.fieldIndex("corr_7d")) shouldBe expect +- 1e-5
    }
  }

  test("q131 bands come from the trailing 7-day frame and flag true excursions") {
    val got = SparkEntry.queries("q131_rolling_bands")(spark, dir).collect()
    got.length shouldBe daily.values.map(v => math.max(0, v.size - 6)).sum
    val byType = got.groupBy(_.getString(0))
    for ((tpe, rows) <- byType) {
      val xs = daily(tpe).map(_._2.toDouble).toIndexedSeq
      for ((r, j) <- rows.sortBy(_.getDate(1).toString).zipWithIndex) {
        val i = j + 6 // first emitted row sits at index 6 of the series
        val w = xs.slice(i - 6, i + 1)
        val (n, sx, sxx) = (7.0, w.sum, w.map(a => a * a).sum)
        val mid = sx / n
        val band = 2.0 * (math.sqrt(n * sxx - sx * sx) / n)
        r.getDouble(r.fieldIndex("mid")) shouldBe mid +- 1e-3
        r.getDouble(r.fieldIndex("upper_band")) shouldBe (mid + band) +- 1e-3
        val flagged = r.getInt(r.fieldIndex("breakout")) == 1
        flagged shouldBe (xs(i) > mid + band || xs(i) < mid - band)
      }
    }
  }

  test("q142 PSI matches a driver recompute and every term is non-negative") {
    val cutoff = 1705363200000000L
    val ev = sources.Tables.events(spark, dir)
      .select($"event_type", $"value", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = SparkEntry.queries("q142_psi_drift")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val byType = ev.groupBy(_._1)
    got.keySet shouldBe byType.keySet
    for ((tpe, rows) <- byType) {
      val (lo, hi) = (rows.map(_._2).min, rows.map(_._2).max)
      val w = (hi - lo) / 10.0
      def bin(v: Double): Int =
        if (w == 0) 0 else math.min(math.floor((v - lo) / w), 9.0).toInt
      val pre = rows.filter(_._3 < cutoff)
      val post = rows.filter(_._3 >= cutoff)
      val cp = pre.groupBy(r => bin(r._2)).view.mapValues(_.length).toMap
      val cq = post.groupBy(r => bin(r._2)).view.mapValues(_.length).toMap
      val terms = (0 to 9).map { b =>
        val p = math.max(cp.getOrElse(b, 0).toDouble / pre.length, 1e-6)
        val q = math.max(cq.getOrElse(b, 0).toDouble / post.length, 1e-6)
        (p - q) * math.log(p / q)
      }
      // sign(p−q) = sign(ln(p/q)): each bin's contribution is ≥ 0, so a
      // buggy implementation can't hide drift behind cancelling terms
      terms.foreach(_ should be >= 0.0)
      val (np, nq, psi) = got(tpe)
      np shouldBe pre.length.toLong
      nq shouldBe post.length.toLong
      psi shouldBe terms.sum +- 1e-5
      psi should be >= 0.0
    }
  }

  test("q186 KS statistic equals the textbook sup over a driver ECDF sweep") {
    val cutoff = 1705363200000000L
    val ev = sources.Tables.events(spark, dir)
      .select($"event_type", $"value", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = SparkEntry.queries("q186_ks_drift")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getInt(6)))
      .toMap
    val byType = ev.groupBy(_._1)
    got.keySet shouldBe byType.keySet
    for ((tpe, rows) <- byType) {
      val pre = rows.filter(_._3 < cutoff).map(_._2).sorted
      val post = rows.filter(_._3 >= cutoff).map(_._2).sorted
      // textbook sup_x |F1(x) − F2(x)| over the pooled value grid, in
      // exact integer cross-multiples (a DIFFERENT algorithm than the
      // engine's windowed cumulative form)
      val grid = (pre ++ post).distinct.sorted
      val dNum = grid.map { x =>
        val c1 = pre.count(_ <= x).toLong
        val c2 = post.count(_ <= x).toLong
        math.abs(c1 * post.length - c2 * pre.length)
      }.max
      val (np, nq, gotNum, ksD, crit, drifted) = got(tpe)
      np shouldBe pre.length.toLong
      nq shouldBe post.length.toLong
      gotNum shouldBe dNum
      ksD shouldBe dNum.toDouble / (np * nq)
      ksD should (be >= 0.0 and be <= 1.0)
      crit shouldBe 1.358 * math.sqrt((np + nq).toDouble / (np * nq))
      drifted shouldBe (if (ksD > crit) 1 else 0)
    }
  }

  test("q190 EWMA equals the sequential λ=½ recurrence bit-for-bit") {
    val got = SparkEntry.queries("q190_ewma_control")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5)))
      .toMap
    got.size shouldBe daily.values.map(_.size).sum
    for ((tpe, series) <- daily) {
      val xs = series.map(_._2.toDouble)
      val n = xs.size.toDouble
      val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
      val sigma = math.sqrt(n * sxx - sx * sx) / n
      var s = Double.NaN
      for (((day, x), i) <- series.zipWithIndex) {
        val prev = s
        s = if (i == 0) x.toDouble else (x + s) / 2.0 // the λ=½ recurrence
        val (cnt, ewma, resid, shock) = got((tpe, day.toString))
        cnt shouldBe x
        // the dyadic closed form must equal the sequential recurrence
        // EXACTLY — (x+s)/2 is one add + one exact halving, and the
        // engine's shift-sum/2^t form computes the same dyadic rational
        ewma shouldBe s
        val wantResid = if (i == 0) 0.0 else x - prev
        resid shouldBe wantResid
        shock shouldBe (if (math.abs(wantResid) > 3.0 * sigma) 1 else 0)
      }
    }
  }

  test("q143 ACF matches the textbook recompute and respects Cauchy-Schwarz") {
    val got = SparkEntry.queries("q143_autocorrelation")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    got.size shouldBe daily.size * 7
    for ((tpe, series) <- daily) {
      val xs = series.map(_._2.toDouble).toIndexedSeq
      val mean = xs.sum / xs.size
      val dev = xs.map(_ - mean)
      val den = dev.map(d => d * d).sum
      for (k <- 1 to 7) {
        val num = (k until xs.size).map(i => dev(i) * dev(i - k)).sum
        val r = got((tpe, k))
        r shouldBe num / den +- 1e-5
        math.abs(r) should be <= 1.0 // |r_k| ≤ 1 by Cauchy-Schwarz
      }
    }
  }

  test("q127 seasonal-naive MAE matches a driver replay of the lag model") {
    val got = SparkEntry.queries("q127_forecast_backtest")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(r.fieldIndex("mae_snaive")),
          r.getDouble(r.fieldIndex("mae_naive"))))
      .toMap
    got.keySet shouldBe daily.keySet
    for ((tpe, series) <- daily) {
      val xs = series.map(_._2.toDouble).toIndexedSeq
      val test = xs.indices.drop(xs.size - 7)
      val mae7 = test.map(i => math.abs(xs(i) - xs(i - 7))).sum / test.size
      val mae1 = test.map(i => math.abs(xs(i) - xs(i - 1))).sum / test.size
      val (days, gs, gn) = got(tpe)
      days shouldBe 7L
      gs shouldBe mae7 +- 1e-3
      gn shouldBe mae1 +- 1e-3
    }
  }

  test("q197: LTTB keeps endpoints, one point per bucket, full coverage accounting") {
    import spark.implicits._
    val rows = SparkEntry.queries("q197_lttb_downsample")(spark, dir).collect()
    val hourly = graft.sources.Tables.events(spark, dir)
      .groupBy($"event_type", expr("unix_micros(ts) div 3600000000").as("hx"))
      .agg(count(lit(1)).as("c"))
      .groupBy($"event_type")
      .agg(min($"hx").as("lo"), max($"hx").as("hi"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val (lo, hi, n) = hourly(tpe)
      rs.length should be <= 24
      // endpoints pinned: bucket 0 = first hour, bucket 23 = last hour
      rs.map(_.getAs[Int]("bucket")).distinct.length shouldBe rs.length
      rs.find(_.getAs[Int]("bucket") == 0).get.getAs[Long]("hx") shouldBe lo
      rs.find(_.getAs[Int]("bucket") == 23).get.getAs[Long]("hx") shouldBe hi
      // bucket membership covers every source point exactly once
      rs.map(_.getAs[Long]("n_in_bucket")).sum shouldBe n
      // selected hours strictly increase with bucket id
      val ordered = rs.sortBy(_.getAs[Int]("bucket")).map(_.getAs[Long]("hx"))
      ordered.zip(ordered.tail).foreach { case (a, b) => a should be < b }
    }
  }
}
