package graft

import org.apache.spark.sql.functions._

/** Behavioral/event analytics verifiers — q91's robust statistics are
  * recomputed from scratch so the median/MAD parity contract (q17's
  * percentile ↔ quantile_cont) is locked on the events table too. */
class BehavioralSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** Exact interpolated median, the quantile_cont/percentile formula. */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val h = (s.length - 1) * 0.5
    val lo = s(h.toInt)
    val hi = s(math.ceil(h).toInt)
    lo + (hi - lo) * (h - h.toInt)
  }

  test("q120/q121: paths and transitions reconcile with the session structure") {
    val sessions = SparkEntry.queries("q44_sessionize")(spark, sfDir)
      .select($"n_events").as[Long].collect()
    val events = sessions.sum
    // a session of k events contributes k−1 transitions and k−2 paths
    val transitions = SparkEntry.queries("q121_markov_transitions")(spark, sfDir)
      .select($"n").as[Long].collect().sum
    transitions shouldBe events - sessions.length
    // conditional probabilities: Σ_to P(to|from) = 1 per from state
    val byFrom = SparkEntry.queries("q121_markov_transitions")(spark, sfDir)
      .select($"from_type", $"p").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    byFrom.values.foreach(_ shouldBe 1.0 +- 1e-12)
    // q120: well-formed 3-step paths, counts descending under the
    // (n DESC, path ASC) total order, never more than 20
    val paths = SparkEntry.queries("q120_session_paths")(spark, sfDir)
      .as[(String, Long)].collect()
    paths.length should be <= 20
    all(paths.map(_._1.count(_ == '>'))) shouldBe 2
    paths.map(_._2).sliding(2).foreach { p =>
      if (p.length == 2) p(0) should be >= p(1)
    }
    val expectedPaths = sessions.filter(_ >= 3).map(_ - 2).sum
    paths.map(_._2).sum should be <= expectedPaths
  }

  test("q122/q123: survival starts at 1 and never rises; lag quartiles are ordered") {
    val surv = SparkEntry.queries("q122_survival_curve")(spark, sfDir)
      .as[(Int, Long, Double)].collect()
    surv.length shouldBe 31
    surv.head._1 shouldBe 0
    surv.head._3 shouldBe 1.0 // every user survives ≥ 0 days
    surv.head._2 shouldBe sources.Tables.events(spark, sfDir)
      .select($"user_id").distinct().count()
    surv.map(_._2).sliding(2).foreach { p =>
      if (p.length == 2) p(0) should be >= p(1) // monotone non-increasing
    }
    val lag = SparkEntry.queries("q123_conversion_lag")(spark, sfDir).head()
    val (p25, p50, p75) = (lag.getDouble(1), lag.getDouble(2), lag.getDouble(3))
    p25 should be <= p50
    p50 should be <= p75
    p25 should be >= 0.0
  }

  test("q91: median, MAD, and outlier counts equal a from-scratch recount") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"event_type", $"value").as[(String, Double)].collect()
    val byType = ev.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val rows = SparkEntry.queries("q91_event_outliers")(spark, sfDir).collect()
    rows.length shouldBe byType.size
    rows.foreach { r =>
      val vs = byType(r.getString(0))
      r.getAs[Long]("n") shouldBe vs.length.toLong
      val med = median(vs)
      r.getAs[Double]("med") shouldBe med +- 1e-9
      val mad = median(vs.map(v => math.abs(v - med)))
      r.getAs[Double]("mad") shouldBe mad +- 1e-9
      val nOut = vs.count(v => math.abs(v - med) > 3.5 * 1.4826 * mad)
      r.getAs[Long]("n_outliers") shouldBe nOut.toLong
      r.getAs[Double]("outlier_frac") shouldBe nOut.toDouble / vs.length +- 1e-12
    }
    // the report flags something somewhere on this corpus
    rows.map(_.getAs[Long]("n_outliers")).sum should be > 0L
  }

  test("q133 offset-explode WAU equals a literal sliding-set recompute") {
    import org.apache.spark.sql.functions._
    val du = sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(to_date(date_trunc("day", col("ts"))).as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val days = du.keySet.toSeq.sorted
    val got = SparkEntry.queries("q133_active_users")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    got.keySet shouldBe days.drop(6).toSet
    for ((day, (dau, wau, stick)) <- got) {
      val i = days.indexOf(day)
      dau shouldBe du(day).size.toLong
      // union the literal trailing-7-day user sets — the quadratic
      // form the explode rewrite replaces
      val expect = days.slice(i - 6, i + 1).map(du).reduce(_ ++ _).size.toLong
      wau shouldBe expect
      stick shouldBe dau.toDouble / wau +- 1e-6
    }
  }
}
