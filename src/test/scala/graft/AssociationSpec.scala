package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Cross-checks for the association family (q124/q128) and the
  * Misra–Gries sketch guarantee. The MG tests exercise the PODS'12
  * mergeable bound under Spark's real partial-aggregation path
  * (repartitioned input → map-side sketches → merge), not a single
  * in-order fold — the shape the sketch must survive at scale. */
class AssociationSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val baskets: Map[Long, Set[Int]] =
    sources.Tables.events(spark, dir)
      .select($"user_id", get_json_object($"props", "$.k").cast("int").as("item"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("q124 support and lift match a driver recompute over the baskets") {
    val nUsers = baskets.size.toDouble
    val itemUsers = baskets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val expected = (for {
      (_, items) <- baskets.toSeq
      Seq(a, b) <- items.toSeq.sorted.combinations(2)
    } yield (a, b)).groupBy(identity).view.mapValues(_.size)
      .filter { case (_, pu) => pu >= 0.08 * nUsers }.toMap

    val got = SparkEntry.queries("q124_market_basket")(spark, dir)
      .collect()
      .map(r => (r.getInt(r.fieldIndex("item_a")), r.getInt(r.fieldIndex("item_b"))) ->
        (r.getLong(r.fieldIndex("pair_users")),
          r.getDouble(r.fieldIndex("support")), r.getDouble(r.fieldIndex("lift"))))
      .toMap
    got.keySet shouldBe expected.keySet
    for (((a, b), (pu, support, lift)) <- got) {
      pu shouldBe expected((a, b)).toLong
      support shouldBe pu / nUsers +- 1e-6
      lift shouldBe pu * nUsers / (itemUsers(a).toDouble * itemUsers(b)) +- 1e-6
    }
  }

  test("q128 returns exactly the items above the φ·n threshold") {
    val occ = sources.Tables.events(spark, dir)
      .select(get_json_object($"props", "$.k").cast("int").as("item"))
      .collect().map(_.getInt(0))
    val n = occ.length.toDouble
    val exact = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = exact.filter { case (_, c) => c > 0.008 * n }

    val got = SparkEntry.queries("q128_heavy_hitters")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    got.keySet shouldBe expected.keySet
    for ((item, (cnt, share)) <- got) {
      cnt shouldBe expected(item)
      share shouldBe cnt / n +- 1e-6
    }
  }

  test("MisraGries holds the mergeable bound under repartitioned aggregation") {
    val k = 32
    val occ = sources.Tables.events(spark, dir)
      .select(get_json_object($"props", "$.k").cast("long").as("item"))
      .collect().map(_.getLong(0)).toSeq
    val n = occ.size.toLong
    val exact = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val err = n / (k + 1).toDouble

    for (parts <- Seq(3, 11)) {
      val sketch = spark.createDataset(occ).repartition(parts)
        .select(new MisraGries(k).toColumn)
        .collect().head.toMap
      sketch.size should be <= k
      // one-sided error: never overcount, undercount bounded by n/(k+1)
      for ((item, est) <- sketch) {
        est should be <= exact(item)
        (exact(item) - est).toDouble should be <= err
      }
      // recall: every item with true count > n/(k+1) must survive
      for ((item, c) <- exact if c > err)
        withClue(s"item $item (count $c) missing at parts=$parts: ")(
          sketch.contains(item) shouldBe true)
    }
  }

  test("q140 top-5 lists match a full driver recompute of basket cosine") {
    val pb = sources.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val freq = pb.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = collection.mutable.Map.empty[(Long, Long), Long]
    for {
      (_, lines) <- pb.groupBy(_._1)
      Seq(a, b) <- lines.map(_._2).sorted.toSeq.combinations(2)
    } co((a, b)) = co.getOrElse((a, b), 0L) + 1
    val expected = co.toSeq
      .flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
      .groupBy(_._1).view.mapValues { rows =>
        rows.map { case (p, o, c) =>
          (o, c, c / math.sqrt((freq(p) * freq(o)).toDouble))
        }.sortBy { case (o, _, cos) => (-cos, o) }.take(5).toSeq
      }.toMap

    val got = SparkEntry.queries("q140_item_similarity")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byPart = got.groupBy(_._1).view.mapValues(_.toSeq).toMap
    byPart.keySet shouldBe expected.keySet
    for ((part, rows) <- byPart) {
      val exp = expected(part)
      rows.length shouldBe exp.length // min(5, #neighbours), never padded
      // collect preserves the query's (cosine DESC, other) order — compare
      // the ranked lists positionally, cosine to the shared IEEE algebra
      for (((_, o, c, cos), (eo, ec, ecos)) <- rows.zip(exp)) {
        o shouldBe eo
        c shouldBe ec
        cos shouldBe ecos +- 1e-12
        cos should (be > 0.0 and be <= 1.0)
      }
    }
  }

  test("MisraGries merge is exact when k exceeds the item universe") {
    // k ≥ #distinct ⇒ no decrements ever fire ⇒ the sketch IS the
    // exact frequency table, whatever the merge tree
    val data = Seq.tabulate(500)(i => (i % 7).toLong)
    val sketch = spark.createDataset(data).repartition(5)
      .select(new MisraGries(16).toColumn)
      .collect().head.toMap
    sketch shouldBe data.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("q180 apriori triples equal the unpruned brute-force mining") {
    val got = SparkEntry.queries("q180_apriori_triples")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // brute force: enumerate every basket triple, no pruning anywhere
    val baskets = sources.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq)
    val support = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    baskets.values.foreach { ps =>
      for {
        i <- ps.indices; j <- i + 1 until ps.length; k <- j + 1 until ps.length
      } {
        val key = (ps(i), ps(j), ps(k))
        support(key) = support.getOrElse(key, 0L) + 1
      }
    }
    val want = support.toSeq.collect { case ((a, b, c), s) if s >= 2 => (a, b, c, s) }
      .sortBy(t => (t._1, t._2, t._3))
    got shouldBe want
    // the monotonicity the pruning relies on: every sub-pair of an
    // emitted triple is itself frequent
    val pairSup = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.values.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) {
        val key = (ps(i), ps(j))
        pairSup(key) = pairSup.getOrElse(key, 0L) + 1
      }
    }
    got.foreach { case (a, b, c, s) =>
      pairSup((a, b)) should be >= s
      pairSup((a, c)) should be >= s
      pairSup((b, c)) should be >= s
    }
  }

  test("q181 Bradley-Terry strengths replay Hunter's MM recurrence exactly") {
    val got = SparkEntry.queries("q181_bradley_terry")(spark, dir)
      .as[(Long, Long, Double)].collect()
    // driver replay from raw contests
    val sp = sources.Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(sum(round($"l_extendedprice" * 100).cast("long")).as("c"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    sp.values.foreach { rows =>
      for (a <- rows; b <- rows if a._2 < b._2 && a._3 != b._3) {
        val key = if (a._3 > b._3) (a._2, b._2) else (b._2, a._2)
        w(key) = w.getOrElse(key, 0L) + 1
      }
    }
    val wins = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val players = wins.keySet
    val nij = scala.collection.mutable.Map.empty[(Long, Long), Long]
    w.foreach { case ((i, j), c) =>
      if (players(i) && players(j)) {
        nij((i, j)) = nij.getOrElse((i, j), 0L) + c
        nij((j, i)) = nij.getOrElse((j, i), 0L) + c
      }
    }
    var th = players.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      th = players.map { i =>
        val d = nij.collect { case ((a, j), n) if a == i => n / (th(i) + th(j)) }.sum
        i -> wins(i) / d
      }.toMap
    }
    val ref = th(players.min)
    got.map(_._1).toSet shouldBe players
    got.foreach { case (s, winCount, strength) =>
      winCount shouldBe wins(s)
      // 4-dp-rounded engine value vs unrounded replay: half-ulp of the
      // rounding plus MM drift headroom
      strength shouldBe (th(s) / ref) +- 6e-5
      strength should be > 0.0
    }
    got.find(_._1 == players.min).get._3 shouldBe 1.0
  }
}
