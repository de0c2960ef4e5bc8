package graft

import org.apache.spark.sql.functions._

/** q118's delta-expansion structure and q119's weighting semantics —
  * what the recompute oracles can't see: that the four maintenance
  * terms are all genuinely exercised, and that time weighting actually
  * differs from the plain mean it corrects. */
class MaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q118 watermark split exercises all four delta terms") {
    val cut = lit("1996-07-01 00:00:00").cast("timestamp")
    val o = sources.Tables.orders(spark, dir)
      .select($"o_orderkey", ($"o_orderdate" < cut).as("oo"))
    val l = sources.Tables.lineitem(spark, dir)
      .select($"l_orderkey", ($"l_shipdate" < cut).as("lo"))
    val byTerm = o.join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"oo", $"lo").agg(count(lit(1)).as("n"))
      .as[(Boolean, Boolean, Long)].collect()
    byTerm.length shouldBe 4 // A⋈B, ΔA⋈B, A⋈ΔB, ΔA⋈ΔB all non-empty —
    // a join-key-correlated split would zero the cross terms and the
    // "maintenance" proof would be vacuous
    all(byTerm.map(_._3)) should be > 0L
  }

  test("q119 TWA is bounded by each user's values and differs from plain avg") {
    val twa = SparkEntry.queries("q119_time_weighted_avg")(spark, dir)
      .select($"user_id", $"twa_value").as[(Long, Double)].collect().toMap
    val bounds = sources.Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi"), avg($"value").as("m"))
      .as[(Long, Double, Double, Double)].collect()
    bounds.foreach { case (u, lo, hi, _) =>
      // a user can drop out only by having a single event (no interval)
      twa.get(u).foreach { v =>
        v should be >= lo - 1e-6
        v should be <= hi + 1e-6
      }
    }
    // weighting matters: with irregular arrivals, TWA ≠ plain mean for
    // most users (equality everywhere would mean the weights are dead)
    val differing = bounds.count { case (u, _, _, m) =>
      twa.get(u).exists(v => math.abs(v - m) > 1e-6)
    }
    differing should be > bounds.length / 2
  }
}
