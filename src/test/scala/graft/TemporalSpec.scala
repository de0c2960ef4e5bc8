package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structural invariants of the temporal state-management family
  * (q110/q111/q113/q114) and the q112 triangle census — the properties
  * the exact-value oracles can't express: interval tiling, decomposition
  * ≡ naive recompute, partition/conservation laws, and a known-by-eye
  * fixture graph. */
class TemporalSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q110
  test("q110 SCD2 versions tile each user's history exactly") {
    val hist = SparkEntry.queries("q110_scd2_history")(spark, dir)
    val ev = sources.Tables.events(spark, dir)

    // observation counts reconcile with the raw event counts per user
    val obs = hist.groupBy($"user_id").agg(sum($"n_obs").as("n")).as[(Long, Long)]
      .collect().toMap
    val raw = ev.groupBy($"user_id").agg(count(lit(1)).as("n")).as[(Long, Long)]
      .collect().toMap
    obs shouldBe raw

    // exactly one open (current) version per user, and it is the last
    val open = hist.filter($"is_current" === 1)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    open.map(_._2).toSet shouldBe Set(1L)

    // intervals chain: valid_to of version v equals valid_from of v+1,
    // and consecutive versions really changed the attribute
    val w = Window.partitionBy($"user_id").orderBy($"ver")
    val chained = hist
      .withColumn("next_from", lead($"valid_from_us", 1).over(w))
      .withColumn("next_attr", lead($"attr", 1).over(w))
      .filter($"next_from".isNotNull)
    chained.filter($"valid_to_us" =!= $"next_from").count() shouldBe 0
    chained.filter($"attr" === $"next_attr").count() shouldBe 0
  }

  test("scd2History treats NULL attributes as real versions") {
    // the facade opens attrCol to nullable columns; [a, NULL, a] must
    // version as three intervals — null-unsafe inequality would merge
    // the NULL into v1 and then open a spurious duplicate 'a' version
    withTempDir("scd2null") { dir =>
      Seq(
        (1L, 10000L, 7L, Option("a"), 0.0, "{}"),
        (2L, 20000L, 7L, Option.empty[String], 0.0, "{}"),
        (3L, 30000L, 7L, Option("a"), 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val hist = operators.Temporal.scd2History(spark, dir, "event_type")
        .select($"ver", $"attr", $"n_obs", $"is_current").collect()
      hist.map(r => (r.getInt(0), Option(r.getString(1)), r.getLong(2), r.getInt(3)))
        .toSeq shouldBe Seq(
          (1, Some("a"), 1L, 0),
          (2, None, 1L, 0),
          (3, Some("a"), 1L, 1))
    }
  }

  // ------------------------------------------------------------- q111
  test("q111 two-phase prefix sum equals the naive global running sum") {
    val got = SparkEntry.queries("q111_concurrency")(spark, dir)
      .as[(String, Int, Long)].collect().toSeq

    // naive recompute: same sessions, ONE global window (the form the
    // DuckDB oracle uses; here it proves the Spark-side decomposition
    // against a Spark-side single-task scan too)
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iv = sources.Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .withColumn("new_s",
        when(lag($"us", 1).over(w).isNull ||
          $"us" - lag($"us", 1).over(w) > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum($"new_s").over(running))
      .groupBy($"user_id", $"sid").agg(min($"us").as("s"), max($"us").as("e"))
      .as[(Long, Long, Long, Long)].collect()
    val deltas = iv.flatMap(r => Seq((r._3, 1, 1), (r._4 + 1, -1, 0)))
      .groupBy(_._1).map { case (us, xs) => (us, xs.map(_._2).sum, xs.map(_._3).sum) }
      .toSeq.sortBy(_._1)
    var run = 0L
    val naive = deltas.map { case (us, d, ns) =>
      run += d
      (us / 86400000000L, run, ns.toLong)
    }
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    val expect = naive.groupBy(_._1).map { case (day, xs) =>
      (fmt.format(java.time.Instant.ofEpochSecond(day * 86400L)),
        xs.map(_._2).max.toInt, xs.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    got shouldBe expect
  }

  // ------------------------------------------------------------- q113
  test("q113 snapshot diff partitions users and labels them correctly") {
    val diff = SparkEntry.queries("q113_snapshot_diff")(spark, dir)
    val ev = sources.Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("us"))

    diff.count() shouldBe ev.select($"user_id").distinct().count()
    diff.select($"status").distinct().as[String].collect().toSet
      .subsetOf(Set("added", "changed", "unchanged")) shouldBe true

    // an 'added' user has no events before the cutoff; everyone else has
    val cutoff = 1705363200000000L
    val preUsers = ev.filter($"us" < cutoff).select($"user_id").distinct()
      .as[Long].collect().toSet
    val added = diff.filter($"status" === "added").select($"user_id")
      .as[Long].collect().toSet
    added.intersect(preUsers) shouldBe empty
    val notAdded = diff.filter($"status" =!= "added").select($"user_id")
      .as[Long].collect().toSet
    notAdded.diff(preUsers) shouldBe empty

    // 'unchanged' rows carry identical state on both sides
    diff.filter($"status" === "unchanged")
      .filter($"old_type" =!= $"new_type" || $"old_value" =!= $"new_value")
      .count() shouldBe 0
  }

  // ------------------------------------------------------------- q114
  test("q114 attribution conserves conversions and shares sum to 1") {
    val att = SparkEntry.queries("q114_attribution")(spark, dir)
      .as[(String, Long, Double, Double)].collect()
    val purchases = sources.Tables.events(spark, dir)
      .filter($"event_type" === "purchase").count()
    att.map(_._2).sum shouldBe purchases
    att.map(_._4).sum shouldBe 1.0 +- 1e-12
    att.map(_._1).toSet.subsetOf(Set("click", "view", "organic")) shouldBe true
  }

  // ------------------------------------------------------------- q112
  test("q112 triangle census is exact on a known fixture graph") {
    // K4 (4 triangles) + a pendant on node 1 + a disjoint 4-cycle
    // (0 triangles): degrees 4,3,3,3,1,2,2,2,2 → wedges 6+3·3+0+4·1 = 19
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L),
      (6L, 7L), (7L, 8L), (8L, 9L), (6L, 9L)).toDF("a", "b")
    val row = operators.Graph.triangleCensus(edges).head()
    row.getLong(row.fieldIndex("n_nodes")) shouldBe 9L
    row.getLong(row.fieldIndex("n_edges")) shouldBe 11L
    row.getLong(row.fieldIndex("n_wedges")) shouldBe 19L
    row.getLong(row.fieldIndex("n_triangles")) shouldBe 4L
    row.getDouble(row.fieldIndex("global_cc")) shouldBe (12.0 / 19.0)
  }

  test("q112 census internal consistency on real data") {
    val row = SparkEntry.queries("q112_triangle_census")(spark, dir).head()
    val (w, t) = (row.getLong(row.fieldIndex("n_wedges")),
      row.getLong(row.fieldIndex("n_triangles")))
    // every triangle contributes exactly 3 wedges
    w should be >= 3 * t
    val cc = row.getDouble(row.fieldIndex("global_cc"))
    cc should be >= 0.0
    cc should be <= 1.0
  }

  test("q134 credits conserve mass and match a sequential driver replay") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q134_multitouch_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // sequential replay: walk each user's timeline, credit each touch
    // run to its closing purchase with the U-shaped weights
    val byUser = sources.Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"), $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._3, t._4))).toMap
    val credit = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    val touches = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    var conversions = 0
    for ((_, evs) <- byUser) {
      var pending = Vector.empty[String]
      for ((_, tpe, _, _) <- evs) {
        if (tpe == "purchase") {
          if (pending.nonEmpty) {
            conversions += 1
            val m = pending.size
            for ((ch, pos) <- pending.zipWithIndex) {
              val w =
                if (m == 1) 1.0
                else if (m == 2) 0.5
                else if (pos == 0 || pos == m - 1) 0.4
                else 0.2 / (m - 2)
              credit(ch) += w
            }
          }
          pending = Vector.empty
        } else {
          pending :+= tpe
          touches(tpe) += 1L
        }
      }
      // touches after a user's last purchase never convert — drop, but
      // uncount them to mirror the query's conv_us IS NOT NULL filter
      pending.foreach(ch => touches(ch) -= 1L)
    }
    got.keySet shouldBe credit.keySet
    for ((ch, (n, c)) <- got) {
      n shouldBe touches(ch)
      c shouldBe credit(ch) +- 1e-3
    }
    // mass conservation: every credited conversion hands out exactly 1.0
    got.values.map(_._2).sum shouldBe conversions.toDouble +- 1e-3
  }

  // ------------------------------------------------------------- q136
  test("q136 coverage equals a straight in-memory interval merge") {
    val hold = operators.Temporal.HoldUs
    val got = SparkEntry.queries("q136_interval_coverage")(spark, dir)
      .select($"user_id", $"n_events", $"n_islands", $"covered_s",
        $"max_island_s")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    val byUser = sources.Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("us"))
      .as[(Long, Long)].collect().groupBy(_._1)
    got.keySet shouldBe byUser.keySet
    for ((u, evs) <- byUser) {
      // merge [us, us+hold) greedily over the sorted starts
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (s <- evs.map(_._2).sorted) {
        if (spans.nonEmpty && s <= spans.last._2)
          spans(spans.size - 1) = (spans.last._1, math.max(spans.last._2, s + hold))
        else spans += ((s, s + hold))
      }
      val (nEv, nIsl, cov, mx) = got(u)
      nEv shouldBe evs.length.toLong
      nIsl shouldBe spans.length.toLong
      cov shouldBe spans.map(sp => sp._2 - sp._1).sum / 1e6 +- 1e-9
      mx shouldBe spans.map(sp => sp._2 - sp._1).max / 1e6 +- 1e-9
    }
  }

  // ------------------------------------------------------------- q150
  test("q150 point-in-time enrichment reconciles with q110's versions") {
    val rows = SparkEntry.queries("q150_point_in_time")(spark, dir)
      .as[(Long, Long, Long, Int, String, Long, Int)].collect()
    // total: every event enriched exactly once (the interval join can
    // neither drop nor multiply facts)
    rows.length shouldBe sources.Tables.events(spark, dir).count()
    val byVersion = rows.groupBy(r => (r._2, r._4))
    byVersion.values.foreach { vs =>
      // the carried version size IS the member count
      vs.foreach(_._6 shouldBe vs.length.toLong)
      // one attr per version
      vs.map(_._5).distinct.length shouldBe 1
    }
    // exactly one OPEN version per user, and it is the max-ver one
    rows.groupBy(_._2).values.foreach { us =>
      val cur = us.filter(_._7 == 1)
      cur.map(r => (r._2, r._4)).distinct.length shouldBe 1
      cur.map(_._4).head shouldBe us.map(_._4).max
    }
    // and the version frame itself matches q110 (user, ver, attr, n_obs)
    val scd = SparkEntry.queries("q110_scd2_history")(spark, dir)
      .select($"user_id", $"ver", $"attr", $"n_obs")
      .as[(Long, Int, String, Long)].collect().toSet
    byVersion.map { case ((u, v), vs) => (u, v, vs.head._5, vs.head._6) }.toSet shouldBe scd
  }

  test("q183 nearest-event join equals a brute-force recount incl. the tie rule") {
    val tol = 600000000L
    val got = SparkEntry.queries("q183_nearest_event")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val ev = sources.Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts"))
      .as[(Long, Long, String, Long)].collect()
    val clicks = ev.filter(_._3 == "click").groupBy(_._2)
    val want = ev.filter(_._3 == "purchase").flatMap { case (pid, u, _, pus) =>
      val cands = clicks.getOrElse(u, Array.empty)
        .filter(c => math.abs(c._4 - pus) <= tol)
      if (cands.isEmpty) None
      else {
        // argmin |dt|, ties: earlier click ts, then lower id
        val best = cands.minBy(c => (math.abs(c._4 - pus), c._4, c._1))
        Some((pid, u, best._1, best._4 - pus))
      }
    }.toSeq.sortBy(_._1)
    got shouldBe want
    // tolerance respected and purchases without a candidate absent
    got.foreach { case (_, _, _, dt) => math.abs(dt) should be <= tol }
  }

}
