package graft

import org.apache.spark.sql.functions._

/** q177's to-the-cent conservation and Hamilton tie discipline, and
  * q178's estimator identities — what the hash oracles don't prove by
  * themselves: that the allocation really conserves, and that exact_f2
  * really is the join size. */
class AllocationSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q177 proration conserves every order total to the cent") {
    val alloc = SparkEntry.queries("q177_proration")(spark, dir)
      .as[(Long, Int, Long)].collect()
    val totals = sources.Tables.orders(spark, dir)
      .select($"o_orderkey", round($"o_totalprice" * 100).cast("long"))
      .as[(Long, Long)].collect().toMap
    val byOrder = alloc.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    byOrder.foreach { case (ok, sum) => sum shouldBe totals(ok) }
    // per-row checks need a row↔weight correspondence; this synthetic
    // lineitem REUSES line numbers within an order (4 599 distinct
    // (ok, ln) over 6 000 rows at sf0.001 — duplicates emit identical
    // output rows either way, so the engine result is still a
    // deterministic multiset), so recompute only over orders whose
    // line numbers are unique
    val weightRows = sources.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber",
        round($"l_extendedprice" * 100).cast("long"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1)
    val uniqueOrders = weightRows.filter { case (_, rs) =>
      rs.map(_._2).distinct.length == rs.length
    }
    uniqueOrders should not be empty
    val allocByOrder = alloc.groupBy(_._1)
    uniqueOrders.foreach { case (ok, rs) =>
      val r = totals(ok)
      val w = rs.map(t => t._2 -> t._3).toMap
      val wsum = w.values.sum
      // proportionality: floor share + at most one repair cent
      allocByOrder(ok).foreach { case (_, ln, cents) =>
        val ideal = r.toDouble * w(ln) / wsum
        math.abs(cents - ideal) should be < 1.0
      }
      // Hamilton repair: the +1 cents go to the largest remainders,
      // ties to the lowest line number
      val base = w.view.mapValues(wi => r * wi / wsum).toMap
      val short = r - base.values.sum
      val order = w.keys.toSeq.sortBy(ln => (-(r * w(ln) % wsum), ln))
      val want = base.map { case (ln, b) =>
        (ok, ln, b + (if (order.indexOf(ln) < short) 1L else 0L))
      }.toSeq.sortBy(_._2)
      allocByOrder(ok).sortBy(_._2).toSeq shouldBe want
    }
  }

  test("q185 month ledger conserves order totals and replays the even spread") {
    val ledger = SparkEntry.queries("q185_revenue_recognition")(spark, dir)
      .as[(String, Long, Long)].collect()
    val ship = sources.Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey").agg(max($"l_shipdate").as("se"))
    val spans = sources.Tables.orders(spark, dir)
      .join(ship, $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", round($"o_totalprice" * 100).cast("long"),
        date_format(trunc($"o_orderdate", "MM"), "yyyy-MM"),
        greatest(lit(1L), months_between(trunc($"se", "MM"),
          trunc($"o_orderdate", "MM")).cast("long") + 1))
      .as[(Long, Long, String, Long)].collect()
    // conservation: ledger total ≡ Σ order cents
    ledger.map(_._3).sum shouldBe spans.map(_._2).sum
    // driver replay of the even spread with early-month remainders
    val want = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM")
    spans.foreach { case (_, r, m0, m) =>
      val start = java.time.YearMonth.parse(m0, fmt)
      for (i <- 0L until m) {
        val key = start.plusMonths(i).format(fmt)
        val cents = r / m + (if (i < r % m) 1L else 0L)
        val (n, c) = want.getOrElse(key, (0L, 0L))
        want(key) = (n + 1, c + cents)
      }
    }
    ledger.map(r => r._1 -> ((r._2, r._3))).toMap shouldBe want.toMap
  }

  test("q178 exact_f2 equals the true self-join size; sampling recomputes") {
    val rows = SparkEntry.queries("q178_selfjoin_estimate")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val hist = sources.Tables.lineitem(spark, dir)
      .groupBy($"l_partkey").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect()
    val f2 = hist.map(t => t._2 * t._2).sum
    rows("exact_f2")._2 shouldBe f2
    rows("exact_f2")._3 shouldBe f2 // predicted == actual: Σc² ≡ |⋈|
    rows("exact_f2")._4 shouldBe 1.0
    val n = hist.map(_._2).sum
    rows("independence")._2 shouldBe (n * n) / hist.length
    // the sampled estimator lands within 4σ-ish of truth on this
    // near-uniform key histogram (≈ 1/16 of keys, c ≈ const)
    val ratio = rows("sampled_f2")._4
    ratio should (be > 0.5 and be < 1.5)
  }
}
