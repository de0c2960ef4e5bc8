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

  test("q139 merge branches partition the key space and respect the feed") {
    val cut = lit("2001-01-01 00:00:00").cast("timestamp")
    val applied = SparkEntry.queries("q139_cdc_apply")(spark, dir)
      .select($"o_custkey", $"src").as[(Long, String)].collect()
    val bySrc = applied.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // both merge branches genuinely exercised, and they partition keys
    bySrc("carried").size should be > 0
    bySrc("upserted").size should be > 0
    bySrc("carried").intersect(bySrc("upserted")) shouldBe empty

    val latest = sources.Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(max(struct($"o_orderdate", $"o_orderkey", $"o_orderstatus"))
        .as("last"))
      .select($"o_custkey", ($"last.o_orderdate" >= cut).as("is_new"),
        $"last.o_orderstatus".as("st"))
      .as[(Long, Boolean, String)].collect()
    latest.foreach { case (k, isNew, st) =>
      if (!isNew) { // no post-cutoff orders → state must carry
        bySrc("carried") should contain(k)
      } else if (st == "F") { // tombstone → key must be gone entirely
        bySrc("carried") should not contain k
        bySrc("upserted") should not contain k
      } else bySrc("upserted") should contain(k)
    }
  }

  test("Graft.cdcApply over a persisted base reproduces q139's fused merge") {
    import org.apache.spark.sql.expressions.Window
    val cut = lit("2001-01-01 00:00:00").cast("timestamp")
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    val ranked = sources.Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
    // the production shape: base is a materialized snapshot, the feed a
    // later batch — build both explicitly, then apply the set algebra
    val base = ranked.filter($"o_orderdate" < cut)
      .withColumn("rn2", row_number().over(w)).filter($"rn2" === 1)
      .select($"o_custkey", $"o_orderkey".as("last_orderkey"),
        $"o_totalprice".as("last_price"), lit("carried").as("src"))
    val feed = ranked.filter($"o_orderdate" >= cut && $"rn" === 1)
      .select($"o_custkey", $"o_orderkey".as("last_orderkey"),
        $"o_totalprice".as("last_price"), lit("upserted").as("src"),
        when($"o_orderstatus" === "F", "D").otherwise("U").as("op"))
    val applied = Graft.cdcApply(base, feed, Seq("o_custkey"))
      .orderBy($"o_custkey").collect()
    val fused = SparkEntry.queries("q139_cdc_apply")(spark, dir).collect()
    applied shouldBe fused
  }

  test("q173 compaction manifest equals a driver next-fit recompute exactly") {
    val target = 32768L
    val plan = SparkEntry.queries("q173_compaction_plan")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // driver recompute of the same next-fit cut, straight from the table
    val docs = sources.Tables.documents(spark, dir)
      .select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    val expected = docs.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._2).map { case (_, id, len) =>
        val fileId = cum / target
        cum += len
        (src, fileId, id, len)
      }.groupBy(_._2).map { case (fid, rows) =>
        (src, fid, rows.length.toLong, rows.map(_._4).sum,
          rows.map(_._3).min, rows.map(_._3).max)
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    plan.toSeq shouldBe expected
    // the packing invariants a compactor relies on: per-source bins are
    // dense from 0, byte totals conserve, and every non-final bin is
    // filled to at least the target minus one straddling document
    plan.groupBy(_._1).foreach { case (src, bins) =>
      val sorted = bins.sortBy(_._2)
      sorted.map(_._2).toSeq shouldBe sorted.indices.map(_.toLong)
      val total = docs(src).map(_._3).sum
      sorted.map(_._4).sum shouldBe total
      // id spans never overlap across consecutive bins
      sorted.sliding(2).foreach {
        case Array(a, b) => a._6 should be < b._5
        case _ => ()
      }
    }
  }
}
