package graft

import org.apache.spark.sql.functions._

/** q100's PageRank invariants and q101's blocking guarantees — the
  * structural properties the exact-value oracle can't express. */
class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pagerank conserves rank mass: Σr = 1 at any iteration count") {
    for (k <- Seq(1, 5)) {
      val s = Graft.pagerank(spark, dir, iterations = k)
        .agg(sum($"r")).head().getDouble(0)
      s shouldBe 1.0 +- 1e-9
    }
  }

  test("pagerank contracts toward a fixed point as iterations grow") {
    def vec(k: Int): Map[Long, Double] =
      Graft.pagerank(spark, dir, iterations = k)
        .as[(Long, Double)].collect().toMap
    val (r4, r5, r6) = (vec(4), vec(5), vec(6))
    def l1(a: Map[Long, Double], b: Map[Long, Double]): Double =
      a.keysIterator.map(k => math.abs(a(k) - b(k))).sum
    val (d45, d56) = (l1(r4, r5), l1(r5, r6))
    // the customer–supplier graph is bipartite, so the slowest mode is
    // the side-to-side oscillation with eigenvalue −d: successive
    // iterate distances must shrink by ≈ the damping factor per round
    d56 should be < d45
    (d56 / d45) shouldBe 0.85 +- 0.05
  }

  test("personalized pagerank conserves mass and concentrates on the seed") {
    // seed on the first supplier node (suppkey 1 → node 3)
    val seed = 3L
    val ppr = Graft.pagerank(spark, dir, teleportTo = Seq(seed))
    ppr.agg(sum($"r")).head().getDouble(0) shouldBe 1.0 +- 1e-9
    val pprMap = ppr.as[(Long, Double)].collect().toMap
    val global = Graft.pagerank(spark, dir).as[(Long, Double)].collect().toMap
    // restart mass pins the seed far above its global-walk rank
    pprMap(seed) should be > 2.0 * global(seed)
    // and the seed outranks every node in its own personalized view
    pprMap(seed) shouldBe pprMap.values.max
  }

  test("q102 degree histogram tiles the node set with consistent bucket bounds") {
    val rows = SparkEntry.queries("q102_degree_histogram")(spark, dir).collect()
    rows.length should be > 0
    // buckets partition nodes: totals equal the distinct node count
    val nNodes = Graft.pagerank(spark, dir, iterations = 1).count()
    rows.map(_.getAs[Long]("n_nodes")).sum shouldBe nNodes
    rows.foreach { r =>
      val (b, lo, hi) = (r.getAs[Int]("bucket"), r.getAs[Long]("lo"), r.getAs[Long]("hi"))
      lo should be <= hi
      // power-of-two bucket bounds: 2^b <= lo <= hi < 2^(b+1)
      lo should be >= (1L << b)
      hi should be < (1L << (b + 1))
    }
  }

  test("personalized pagerank validates seeds: non-nodes refuse, duplicates collapse") {
    // 999999*2 is no customer at sf0.001 — restart mass would vanish
    an[IllegalArgumentException] should be thrownBy
      Graft.pagerank(spark, dir, teleportTo = Seq(999999L * 2)).count()
    // duplicated seeds must not split the teleport mass: Σr stays 1
    val s = Graft.pagerank(spark, dir, teleportTo = Seq(3L, 3L))
      .agg(sum($"r")).head().getDouble(0)
    s shouldBe 1.0 +- 1e-9
  }

  test("q103 hop distances respect bipartite parity from the supplier seed") {
    val rows = SparkEntry.queries("q103_hop_distance")(spark, dir).collect()
    rows.length should be > 1
    rows.foreach { r =>
      val (node, kind, dist) =
        (r.getAs[Long]("node"), r.getAs[String]("kind"), r.getAs[Int]("dist"))
      dist should (be >= 0 and be <= 3)
      if (node == 3L) dist shouldBe 0
      // customer–supplier edges only: from a supplier seed, suppliers
      // sit at even distances, customers at odd
      if (kind == "supplier") dist % 2 shouldBe 0 else dist % 2 shouldBe 1
    }
  }

  test("fuzzyMatches: knob subsets nest, and distance 0 is empty on a distinct dictionary") {
    val d2 = Graft.fuzzyMatches(spark, dir).collect()
    d2.length should be > 0
    all(d2.map(_.getAs[Int]("dist"))) should be <= 2
    val pairs2 = d2.map(r =>
      (r.getAs[String]("name_a"), r.getAs[String]("name_b"))).toSet
    val pairs1 = Graft.fuzzyMatches(spark, dir, maxDist = 1)
      .select($"name_a", $"name_b").as[(String, String)].collect().toSet
    pairs1.subsetOf(pairs2) shouldBe true
    pairs1.size should be < pairs2.size
    // name_a < name_b means self-pairs never form: distance 0 is empty
    Graft.fuzzyMatches(spark, dir, maxDist = 0).count() shouldBe 0L
  }

  test("fuzzyMatches row counts map back to the full table") {
    // every (n_a, n_b) is the true per-name row count of `part`
    val counts = graft.sources.Tables.part(spark, dir)
      .groupBy($"p_name").count().as[(String, Long)].collect().toMap
    val out = Graft.fuzzyMatches(spark, dir).collect()
    out.foreach { r =>
      r.getAs[Long]("n_a") shouldBe counts(r.getAs[String]("name_a"))
      r.getAs[Long]("n_b") shouldBe counts(r.getAs[String]("name_b"))
    }
  }

  test("q170 sorted-neighborhood equals the brute-force rank-window recount") {
    // recompute from scratch on the driver: rank the distinct dictionary
    // lexicographically, verify every pair within 10 ranks at dist ≤ 2
    val names = graft.sources.Tables.part(spark, dir)
      .select($"p_name").distinct().as[String].collect().sorted
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      i <- names.indices
      j <- (i + 1) until math.min(i + 11, names.length)
      if lev(names(i), names(j)) <= 2
    } yield (names(i), names(j), lev(names(i), names(j)), (j - i).toLong)).toSet
    val got = SparkEntry.queries("q170_sorted_neighborhood")(spark, dir)
      .select($"name_a", $"name_b", $"dist", $"gap")
      .as[(String, String, Int, Long)].collect().toSet
    want.size should be > 0
    got shouldBe want
  }

  test("q170 complements q101: sorted-neighborhood pairs q101's token blocking can also reach agree on distance") {
    // where both disciplines surface a pair, the verified distance must
    // agree (same Levenshtein ground truth, different candidate paths)
    val sn = SparkEntry.queries("q170_sorted_neighborhood")(spark, dir)
      .select($"name_a", $"name_b", $"dist").as[(String, String, Int)]
      .collect().map { case (a, b, d) => (a, b) -> d }.toMap
    val tok = SparkEntry.queries("q101_fuzzy_match")(spark, dir)
      .select($"name_a", $"name_b", $"dist").as[(String, String, Int)]
      .collect().map { case (a, b, d) => (a, b) -> d }.toMap
    val shared = sn.keySet intersect tok.keySet
    shared.foreach(k => sn(k) shouldBe tok(k))
  }

  test("q147 label propagation partitions the node set deterministically") {
    val rows = SparkEntry.queries("q147_label_propagation")(spark, dir)
      .as[(Long, String, Long)].collect()
    // every graph node labeled exactly once, kinds consistent with ids
    val nodes = Graft.pagerank(spark, dir, iterations = 1)
      .select($"node").as[Long].collect().toSet
    rows.map(_._1).toSet shouldBe nodes
    rows.length shouldBe nodes.size
    rows.foreach { case (node, kind, _) =>
      kind shouldBe (if (node % 2 == 0) "customer" else "supplier")
    }
    // every community label is itself a node of the graph (labels only
    // ever propagate from initial node-id self-labels)
    rows.map(_._3).toSet.subsetOf(nodes) shouldBe true
    // propagation actually contracts: fewer communities than nodes
    rows.map(_._3).distinct.length should be < nodes.size
    // bit-for-bit re-run stability (pure function of the edge table)
    val again = SparkEntry.queries("q147_label_propagation")(spark, dir)
      .as[(Long, String, Long)].collect()
    again.toSeq shouldBe rows.toSeq
  }

  test("q156 Adamic-Adar scores equal a from-scratch basket recount") {
    val rows = SparkEntry.queries("q156_link_prediction")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    rows.length should be > 0
    val baskets = graft.sources.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    // scale-safety is structural: basket width is a small per-order
    // constant (max 8/13/16 measured at sf0.001/0.01/0.1), not a
    // corpus-growing hub degree
    baskets.values.map(_.length).max should be <= 32
    val score = collection.mutable.Map.empty[(Long, Long), (Long, Double)]
      .withDefaultValue((0L, 0.0))
    baskets.values.filter(_.length >= 2).foreach { ss =>
      val w = 1.0 / math.log(ss.length.toDouble)
      for (i <- ss.indices; j <- i + 1 until ss.length) {
        val k = (ss(i), ss(j))
        val (c, sc) = score(k); score(k) = (c + 1, sc + w)
      }
    }
    def r(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the emitted top-50 is the recount's top-50 under the same order
    val expected = score.toSeq
      .map { case ((a, b), (c, s)) => (a, b, c, s) }
      .sortBy { case (a, b, _, s) => (-r(s, 6), a, b) }
      .take(rows.length)
    rows.toSeq.zip(expected).foreach { case ((a, b, c, s4), (ea, eb, ec, es)) =>
      (a, b, c) shouldBe ((ea, eb, ec))
      s4 shouldBe r(es, 4) +- 1e-9
    }
    // descending by score, pairs well-formed
    rows.sliding(2).foreach {
      case Array(x, y) => r(x._4, 4) should be >= r(y._4, 4) - 1e-4
      case _           => ()
    }
    rows.foreach { case (a, b, c, _) => a should be < b; c should be >= 1L }
  }

  test("q172 k-core: peeling converges, survivors keep min-degree ≥ k, cores nest") {
    def core(k: Int, rounds: Int): Map[Long, Long] =
      Graft.kCore(spark, dir, k = k, rounds = rounds)
        .as[(Long, Long)].collect().toMap
    // convergence at fixture scale: one more peel changes nothing
    val c4 = core(4, 5)
    core(4, 6) shouldBe c4
    c4 should not be empty
    // at the fixed point every surviving degree clears k — this is the
    // k-core definition, and exactly what a non-converged peel violates
    all(c4.values) should be >= 4L
    // the iteration does real work (not a one-shot degree filter):
    // a 6-chain with a triangle at one end, k = 2 — each round peels
    // exactly the current chain endpoint, so round r still holds
    // chain nodes the next round removes; only the triangle survives
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
      5L -> 6L, 6L -> 7L, 5L -> 7L) // 1-2-3-4-5, triangle 5-6-7
    val chainEdges = chain.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val after1 = operators.Graph.kCoreOf(chainEdges, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    val after4 = operators.Graph.kCoreOf(chainEdges, k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    after1.keySet shouldBe Set(2L, 3L, 4L, 5L, 6L, 7L) // endpoint 1 gone
    after1.values.exists(_ < 2L) shouldBe true // next endpoint exposed
    after4.keySet shouldBe Set(5L, 6L, 7L) // cascade ate the chain
    all(after4.values) shouldBe 2L
    // monotone nesting: the 6-core lives inside the 4-core
    val c6 = core(6, 6)
    c6.keySet.subsetOf(c4.keySet) shouldBe true
    // survivor degrees re-derive from the full edge list restricted to
    // the surviving node set (internal consistency of the edge peel)
    val edges = operators.Graph.orderEdges(spark, dir)
      .select($"src", $"dst").as[(Long, Long)].collect()
    val survived = c4.keySet
    val recount = edges.filter { case (s, d) => survived(s) && survived(d) }
      .groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    recount shouldBe c4
  }

  test("q184 entity resolution equals a union-find over the three evidence channels") {
    val rows = SparkEntry.queries("q184_entity_resolution")(spark, dir)
      .as[(String, String, Long, Int)].collect()
    // partition: every dictionary name appears exactly once as member
    val dict = sources.Tables.part(spark, dir)
      .groupBy($"p_name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    rows.map(_._2).sorted.toSeq shouldBe dict.keys.toSeq.sorted
    rows.foreach { case (_, m, n, _) => n shouldBe dict(m) }
    // driver union-find over the union of the evidence generators
    val pairs =
      operators.Dedup.fuzzyNamePairs(spark, dir, 2)
        .select($"name_a", $"name_b").as[(String, String)].collect() ++
      operators.Dedup.sortedNeighborhoodPairs(spark, dir, 10, 2)
        .select($"name_a", $"name_b").as[(String, String)].collect() ++
      operators.Dedup.jaroWinklerPairs(spark, dir, 0.9)
        .filter($"is_match" === 1)
        .select($"name_a", $"name_b").as[(String, String)].collect()
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.Ordering[String].max(ra, rb)) = math.Ordering[String].min(ra, rb)
    }
    val want = dict.keys.map(n => n -> find(n)).toMap
    rows.foreach { case (entity, member, _, canonical) =>
      entity shouldBe want(member)
      canonical shouldBe (if (member == entity) 1 else 0)
    }
    // the canonical IS the lexicographic minimum of its entity
    rows.groupBy(_._1).foreach { case (e, ms) => ms.map(_._2).min shouldBe e }
  }

  test("q171 personalized pagerank seeds dominate their own view and Σr = 1") {
    val rows = SparkEntry.queries("q171_personalized_pagerank")(spark, dir)
      .as[(Long, String, Double)].collect()
    rows.map(_._3).sum shouldBe 1.0 +- 1e-4 // 6-dp rounded components
    val byNode = rows.map(r => r._1 -> r._3).toMap
    val seeds = Seq(3L, 5L, 7L, 9L, 11L)
    val maxNonSeed = rows.filter(r => !seeds.contains(r._1)).map(_._3).max
    // every seed outranks every non-seed: restart mass dominates at
    // this damping on a well-mixed graph
    seeds.foreach { s => byNode(s) should be > maxNonSeed }
  }

  test("q203: modularity terms reconcile with the q147 partition and sum sanely") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q203_modularity")(spark, dir).collect()
    rows should not be empty
    // communities are exactly q147's label set, node counts included
    val comm = SparkEntry.queries("q147_label_propagation")(spark, dir)
      .groupBy("community").count().as[(Long, Long)].collect().toMap
    rows.map(r => r.getAs[Long]("community") -> r.getAs[Long]("n_nodes")).toMap shouldBe comm
    // modularity of any partition is in (-1/2, 1); intra-weight is
    // bounded by the community degree
    val q = rows.map(_.getAs[Double]("q_term")).sum
    // the order graph is BIPARTITE: a 2-community partition that
    // separates the sides has w_in = 0 everywhere and hits exactly
    // -1/2, the theoretical floor — include it
    q should (be >= -0.5 and be < 1.0)
    rows.foreach { r =>
      r.getAs[Double]("w_in") should be <= r.getAs[Double]("d_c") + 1e-9
    }
  }

}
