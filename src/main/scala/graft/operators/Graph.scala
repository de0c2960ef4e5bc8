package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Q
import graft.core.PersistedMemo
import graft.sources.Tables

/** Distributed graph analytics over the customer–supplier order graph
  * — the iterative-ranking counterpart of [[Components]]' connected
  * components (the reference's entity relationships are key-value
  * lookups, lambda-sample `cassandra/schema.sql`; an analytics engine
  * over the same relational data also needs whole-graph measures).
  *
  * Graph model: one node per customer (`custkey*2`) and per supplier
  * (`suppkey*2+1` — disjoint id spaces without a string tag), one
  * bidirected edge per trading pair, weighted by the number of
  * lineitems that link them. The edge list is derived with a single
  * orders⋈lineitem equi-join + partial/final count aggregate, then
  * memoized in [[PersistedMemo]] — the once-per-dataset build every
  * iteration reads, exactly like the dedup chain's signature table.
  *
  * Scale design (100 TB):
  *  - each PageRank round is ONE equi-join (ranks ⋈ edges on src) +
  *    one sum-aggregate keyed by dst — the same shuffle shape as
  *    [[Components]]' label propagation, and the textbook distributed
  *    formulation (Malewicz et al., Pregel, SIGMOD'10);
  *  - the per-node degree join and the rank join share the `src`
  *    shuffle key, and identical per-round subtrees collapse via
  *    Spark's ReuseExchange, so a K-round plan pays the edge shuffle
  *    once, not K times;
  *  - the node count reaches the update rule as a broadcast 1-row
  *    frame (q52's corpus-count idiom), never a driver-side collect;
  *  - K is a fixed small constant here so the DuckDB oracle can unroll
  *    the recurrence; a convergence-driven variant would freeze each
  *    round to a persisted LogicalRDD exactly as [[Components.run]]
  *    does (same lineage-control lesson).
  *
  * The bidirected graph has no dangling nodes (every node has out-
  * edges), so the rank vector sums to 1 every round — GraphSpec
  * asserts the invariant; the DuckDB oracle (unrolled to the same K)
  * is the exact-value gate.
  */
object Graph extends DetRounding {

  /** Bidirected weighted edge list of the customer–supplier graph as a
    * row-stochastic transition matrix `(src, dst, w, p)` — `p` is the
    * out-weight-normalized transition probability every PageRank round
    * consumes, baked in once so the per-round degree join disappears.
    * Hash-partitioned by `src` BEFORE the persist: the cached
    * partitioning satisfies each round's join distribution, so rounds
    * shuffle only the #nodes-row rank vector, never the edge table
    * (the iterative-workload analog of bucketing the fact side).
    * Memoized per (session, dataset). */
  private[graft] def orderEdges(spark: SparkSession, dir: String): DataFrame =
    PersistedMemo.getOrBuild(spark, dir, "graph:order-edges") {
      import spark.implicits._
      val half = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
        .join(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
        .agg(count(lit(1)).cast("double").as("w"))
      val both = half.union(half.select($"dst".as("src"), $"src".as("dst"), $"w"))
      val outw = both.groupBy($"src").agg(sum($"w").as("ow"))
      both.join(outw, "src")
        .select($"src", $"dst", $"w", ($"w" / $"ow").as("p"))
        .repartition($"src")
    }

  /** Weighted PageRank, `iterations` rounds at the given damping.
    * Returns `(node, r)` with Σr = 1 (no dangling mass by
    * construction). `teleportTo` non-empty makes it PERSONALIZED:
    * restart mass lands uniformly on those nodes instead of everywhere,
    * so ranks measure proximity to the seed set — the graph-retrieval
    * primitive (recommendations, related-entity expansion). Open-knob
    * core shared by q100 and the [[graft.Graft.pagerank]] facade. */
  private[graft] def pagerank(spark: SparkSession, dir: String,
      iterations: Int, damping: Double,
      teleportTo: Seq[Long] = Nil): DataFrame = {
    import spark.implicits._
    val edges = orderEdges(spark, dir) // (src, dst, w, p), cached on src
    val nodes = edges.select($"src".as("node")).distinct()
    // Σr = 1 holds only if every teleport seed is a graph node (restart
    // mass on a non-node vanishes — worst case an all-zero vector) and
    // seeds are unique (duplicates would split 1/|S| below). Validate
    // eagerly: seed sets are small and the node set is one aggregate
    // over the cached edge table.
    val seeds = teleportTo.distinct
    if (seeds.nonEmpty) {
      val present = nodes.filter($"node".isin(seeds: _*)).count()
      require(present == seeds.size,
        s"teleportTo contains ${seeds.size - present} id(s) that are not " +
          "graph nodes (ids are custkey*2 / suppkey*2+1); Σr = 1 would " +
          "silently break")
    }
    def personalTeleport(node: Column): Column =
      when(node.isin(seeds: _*), lit(1.0 / seeds.size)).otherwise(lit(0.0))
    // the node COUNT is a driver scalar, not a plan subtree: leaving it
    // as a crossJoin(broadcast(agg)) frame embedded one copy of the
    // node-count aggregate per ROUND into the uniform path's lazy tree
    // (the personalized path was pure literals) — the round-4 bench
    // measured that asymmetry as q100 17.2 s vs q171 3.3 s for the same
    // recurrence. One count() job over the cached edge memo (the
    // personalized path already runs one for seed validation) makes the
    // two paths symmetric. This makes the operator EAGER at
    // construction, like the seed validation above.
    val nVal = nodes.count().toDouble
    var ranks =
      if (seeds.isEmpty) nodes.select($"node", lit(1.0 / nVal).as("r"))
      else nodes.select($"node", personalTeleport($"node").as("r"))
    for (i <- 1 to iterations) {
      // name-based join condition: `ranks` derives from `edges` after
      // the first round, so df("col") instance refs would hit the
      // self-join attribute-reuse trap; (src,dst,w,p) and (node,r) are
      // disjoint.
      // shuffle-hash, not sort-merge: SMJ would re-SORT the cached
      // 300k-row edge side every round; hashing the #nodes-row rank
      // vector is the round's only materialization cost
      val contrib = edges.join(ranks.hint("shuffle_hash"), $"src" === $"node")
        .groupBy($"dst")
        .agg(sum($"r" * $"p").as("contrib"))
      val next =
        if (seeds.isEmpty)
          contrib.select($"dst".as("node"),
            (lit((1.0 - damping) / nVal) + lit(damping) * $"contrib").as("r"))
        else contrib.select($"dst".as("node"),
          (lit(1.0 - damping) * personalTeleport($"dst") +
            lit(damping) * $"contrib").as("r"))
      // ROUNDS STAY LAZY up to a freeze cadence (round-13): the
      // per-round localCheckpoint dated from round 4, when each uniform
      // round embedded a crossJoin(broadcast(count)) subtree and the
      // K-round tree exploded super-linearly; with the node count a
      // driver literal the tree is LINEAR in K — exactly
      // [[labelPropagation]]'s documented shape — and the K eager
      // checkpoint jobs were pure per-round stage latency (K sequential
      // actions, each paying job submit + schedule + a materialize
      // barrier, with the rank vector re-shuffled from an unpartitioned
      // leaf every round). One lazy tree pays ONE action and lets
      // ReuseExchange share the per-round subtrees. Deep facade runs
      // (≤ 64) still truncate every 8 rounds so the analyzer never sees
      // an unbounded unroll — the Components.run freeze, at a cadence.
      ranks = if (i % 8 == 0 && i < iterations) next.localCheckpoint() else next
    }
    ranks
  }

  // -------------------------------------------------------------- q100
  /** Weighted PageRank, 5 rounds, d = 0.85 — who are the structurally
    * central customers and suppliers of the trading graph. */
  private def q100(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pagerank(spark, dir, iterations = 5, damping = 0.85)
      .select($"node",
        when($"node" % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        round($"r", 6).as("pr"))
      .orderBy($"pr".desc, $"node")
  }

  /** DuckDB twin of [[orderEdges]] (`half` + `edges` CTE bodies),
    * shared by the q100 and q102 oracles. */
  private val edgeCtes: String =
    """half AS (
      |  SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst,
      |         CAST(count(*) AS DOUBLE) AS w
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2
      |), edges AS (
      |  SELECT src, dst, w FROM half
      |  UNION ALL
      |  SELECT dst AS src, src AS dst, w FROM half
      |)""".stripMargin

  /** DuckDB twin: the same recurrence unrolled to 5 rounds (fixed K is
    * what makes the oracle expressible without recursion). */
  private val q100Sql: String = {
    val rounds = (1 to 5).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         0.15 * nn.inv + 0.85 * sum(p.r * (e.w / o.ow)) AS r
         |  FROM edges e
         |  JOIN $prev p ON p.node = e.src
         |  JOIN outw o ON o.src = e.src
         |  CROSS JOIN nn
         |  GROUP BY e.dst, nn.inv
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $edgeCtes,
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT 1.0 / CAST(count(*) AS DOUBLE) AS inv FROM nodes),
       |outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
       |r0 AS (SELECT node, nn.inv AS r FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT node,
       |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |       round(r, 6) AS pr
       |FROM r5
       |ORDER BY pr DESC, node""".stripMargin
  }

  // -------------------------------------------------------------- q102
  /** Degree histogram of the trading graph in power-of-two buckets
    * (q93's integer-exact `length(bin(n)) − 1` log2) — the structure
    * triage that tells you whether the per-key join machinery needs
    * [[Skew]]'s salting: a heavy tail here is a hot key there. Degree
    * is the per-src row count of the (distinct-pair) edge list; one
    * aggregate to #nodes, one to #kind×#buckets cells. */
  private def q102(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orderEdges(spark, dir)
      .groupBy($"src").agg(count(lit(1)).as("deg"))
      .select(
        when($"src" % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        (length(bin($"deg")) - 1).cast("int").as("bucket"),
        $"deg")
      .groupBy($"kind", $"bucket")
      .agg(count(lit(1)).as("n_nodes"), min($"deg").as("lo"), max($"deg").as("hi"))
      .orderBy($"kind", $"bucket")
  }

  private val q102Sql: String =
    s"""WITH $edgeCtes,
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1)
       |SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |       CAST(length(bin(deg)) - 1 AS INTEGER) AS bucket,
       |       CAST(count(*) AS BIGINT) AS n_nodes,
       |       min(deg) AS lo, max(deg) AS hi
       |FROM deg
       |GROUP BY 1, 2
       |ORDER BY kind, bucket""".stripMargin

  // -------------------------------------------------------------- q103
  /** Hop distance from a seed node by iterative min-propagation —
    * distributed BFS, the third graph primitive next to ranking (q100)
    * and components ([[Components]]). Each round relaxes one hop:
    * `dist' = min(dist, min over in-neighbors dist+1)` — the same
    * Pregel join+aggregate shape, all-integer so the unrolled oracle
    * is exact (no float drift to round away). Fixed 3 rounds keeps
    * the oracle expressible; unreached nodes are absent, not NULL.
    * Seed = supplier 1 (node 3), present at every scale factor. */
  private[graft] def hopDistance(spark: SparkSession, dir: String,
      seed: Long, rounds: Int): DataFrame = {
    import spark.implicits._
    // the running frame is referenced twice per round (union + join),
    // so the LAZY plan doubles per round — 2^rounds subtrees. Fine to
    // a handful of hops; a deeper walk needs [[Components.run]]'s
    // freeze-to-LogicalRDD discipline (same file, same lesson), so
    // refuse instead of silently handing the analyzer an exponential
    // plan.
    require(rounds > 0 && rounds <= 6,
      s"hopDistance unrolls lazily (2^rounds plan); need 0 < rounds <= 6 " +
        s"(got $rounds) — adopt Components.run's per-round freeze for deeper walks")
    val edges = orderEdges(spark, dir)
    var d = spark.range(1).select(lit(seed).as("node"), lit(0).as("dist"))
    for (_ <- 1 to rounds) {
      d = d.union(
          edges.join(d.hint("shuffle_hash"), $"src" === $"node")
            .select($"dst".as("node"), ($"dist" + 1).as("dist")))
        .groupBy($"node").agg(min($"dist").as("dist"))
    }
    d
  }

  private def q103(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hopDistance(spark, dir, seed = 3L, rounds = 3)
      .select($"node",
        when($"node" % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        $"dist")
      .orderBy($"dist", $"node")
  }

  private val q103Sql: String = {
    val hops = (1 to 3).map { i =>
      val prev = s"d${i - 1}"
      s"""d$i AS (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM $prev
         |    UNION ALL
         |    SELECT e.dst AS node, p.dist + 1 AS dist
         |    FROM edges e JOIN $prev p ON p.node = e.src
         |  ) GROUP BY 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $edgeCtes,
       |d0 AS (SELECT CAST(3 AS BIGINT) AS node, CAST(0 AS INTEGER) AS dist),
       |$hops
       |SELECT node,
       |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |       CAST(dist AS INTEGER) AS dist
       |FROM d3
       |ORDER BY dist, node""".stripMargin
  }

  // -------------------------------------------------------------- q112
  /** Triangle census of the part co-purchase graph (parts sharing an
    * order) — node/edge/wedge/triangle counts plus the global
    * clustering coefficient 3·T/wedges, the one-row structure summary
    * that says whether a graph is clique-y enough for community
    * detection to be worth running. The customer–supplier graph is
    * bipartite (zero triangles by construction), so this measures the
    * co-occurrence projection instead — the graph recommendation
    * pipelines actually mine.
    *
    * Scale design — degree orientation (Suri & Vassilvitskii, WWW'11)
    * + sorted-adjacency merge-intersect closure: orient every edge
    * from the (degree, id)-smaller endpoint to the larger (out-degree
    * then bounded by O(√E) however skewed the raw degrees — a hot hub
    * never enumerates its quadratic neighborhood), pack each node's
    * oriented out-neighbors into ONE sorted array, and count
    * T = Σ_{(u,v) oriented} |N⁺(u) ∩ N⁺(v)| with a fused merge loop
    * per edge. The O(E^1.5) term is adjacency bytes replicated through
    * equi-joins and compares inside tasks — never materialized wedge
    * ROWS (the prior wedge self-join + semi-join probe shuffled them:
    * 49.3 s warm at sf1, vs 0.8 s for this shape — QTime, both over
    * the memoized oriented table). The wedge DENOMINATOR is
    * Σ deg·(deg−1)/2 integer algebra on the #nodes-row degree frame,
    * never materialized pairs. */
  private def q112(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = PersistedMemo.getOrBuild(spark, dir, "graph:co-pairs") {
      val items = Tables.lineitem(spark, dir)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
      items.as("i").join(items.as("j"),
          $"i.ok" === $"j.ok" && $"i.p" < $"j.p")
        .select($"i.p".as("a"), $"j.p".as("b")).distinct()
    }
    triangleCensus(pairs, memoKey = Some((dir, "graph:co-ori")))
  }

  /** Census core over a distinct undirected edge list `(a, b)`, a < b —
    * factored out so GraphSpec can drive it with hand-built graphs whose
    * triangle counts are known by eye.
    *
    * The oriented edge table is consumed twice (the adjacency
    * aggregate and the per-edge scan); with `memoKey` set it is built
    * once, hash-partitioned on `src`, and persisted in
    * [[PersistedMemo]] — the cached partitioning feeds the adjacency
    * groupBy and the src-side join with no Exchange, exactly
    * [[orderEdges]]' discipline. */
  private[graft] def triangleCensus(pairs: DataFrame,
      memoKey: Option[(String, String)] = None): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val deg = pairs.select($"a".as("node")).union(pairs.select($"b"))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    // orient a→b iff (deg_a, a) < (deg_b, b): a total order, so each
    // undirected edge appears exactly once and out-degree is O(√E)
    val lower = ($"da" < $"db") || ($"da" === $"db" && $"a" < $"b")
    val oriPlan = pairs
      .join(deg.select($"node".as("a"), $"deg".as("da")), "a")
      .join(deg.select($"node".as("b"), $"deg".as("db")), "b")
      .select(when(lower, $"a").otherwise($"b").as("src"),
        when(lower, $"b").otherwise($"a").as("dst"),
        when(lower, $"db").otherwise($"da").as("ddst"))
    val ori = memoKey match {
      case Some((dir, key)) =>
        PersistedMemo.getOrBuild(spark, dir, key)(oriPlan.repartition($"src"))
      case None => oriPlan
    }
    // closure by SORTED-ADJACENCY MERGE-INTERSECT (round 7; replaces
    // the wedge self-join + semi-join probe): with a total-order
    // orientation every triangle {s, v, w} has exactly one source s
    // (out-edges s→v, s→w) and one middle edge v→w, so it is counted
    // exactly once as w ∈ N⁺(s) ∩ N⁺(v) over the oriented edge (s, v).
    // T = Σ over oriented edges |N⁺(src) ∩ N⁺(dst)|: the per-node
    // out-neighbor lists are packed and sorted ONCE (one aggregate over
    // the memoized oriented table), each edge row picks up both
    // endpoints' lists via equi-joins, and the intersection is a sealed
    // codegen merge loop (graft_intersect_count_sorted) — no O(E^1.5)
    // wedge ROWS ever materialize or shuffle; the E^1.5 term survives
    // only as bytes of replicated adjacency (out-degree is O(√E) by
    // orientation) and compares inside tasks, the q28/q167 discipline.
    // dst-side left join: a sink node has no out-list → null → the
    // intersect is null and sum skips it (correct: no closing wedge).
    graft.functions.GraftFunctions.register(spark)
    val adj = ori.groupBy($"src")
      .agg(sort_array(collect_list($"dst")).as("nbrs"))
    val tri = ori.select($"src", $"dst")
      .join(adj.select($"src", $"nbrs".as("src_nbrs")), Seq("src"))
      .join(adj.select($"src".as("dst"), $"nbrs".as("dst_nbrs")),
        Seq("dst"), "left")
      .select(expr("graft_intersect_count_sorted(src_nbrs, dst_nbrs)").as("t"))
      .agg(coalesce(sum($"t"), lit(0L)).as("n_triangles"))
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val edgeStats = pairs.agg(count(lit(1)).as("n_edges"))
    // three 1-row frames; cc = 3T/wedges is one IEEE divide on exact
    // integer operands — unrounded, bit-identical across engines
    nodeStats.crossJoin(broadcast(edgeStats)).crossJoin(broadcast(tri))
      .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles",
        (lit(3.0) * $"n_triangles" / $"n_wedges").as("global_cc"))
  }

  /** Semi-join closure, not inner: a (v, w) wedge pair can close
    * against at most ONE oriented edge, and left_semi never multiplies
    * the wedge row. (It does NOT repair a non-canonical input edge
    * list — duplicated or reversed-duplicate edges corrupt degrees and
    * wedges upstream of the closure, which is why the census core
    * demands distinct a < b pairs and `Graft.triangleCensus`
    * normalizes before calling it.) */
  private val q112Sql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
      |), pairs AS (
      |  SELECT DISTINCT i.p AS a, j.p AS b
      |  FROM items i JOIN items j ON i.ok = j.ok AND i.p < j.p
      |), deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS deg
      |  FROM (SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs)
      |  GROUP BY 1
      |), ori AS (
      |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
      |              THEN a ELSE b END AS src,
      |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
      |              THEN b ELSE a END AS dst,
      |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
      |              THEN db.deg ELSE da.deg END AS ddst
      |  FROM pairs JOIN deg da ON da.node = pairs.a
      |             JOIN deg db ON db.node = pairs.b
      |), tri AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
      |  FROM (SELECT t1.dst AS v, t2.dst AS w
      |        FROM ori t1 JOIN ori t2
      |          ON t1.src = t2.src
      |         AND (t1.ddst < t2.ddst OR (t1.ddst = t2.ddst AND t1.dst < t2.dst))) wg
      |  WHERE EXISTS (SELECT 1 FROM ori e WHERE e.src = wg.v AND e.dst = wg.w)
      |)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
      |       (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
      |       (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
      |       n_triangles,
      |       3.0 * n_triangles /
      |         (SELECT sum(deg * (deg - 1) // 2) FROM deg) AS global_cc
      |FROM tri""".stripMargin

  // -------------------------------------------------------------- q147
  /** Community detection by synchronous weighted label propagation
    * (Raghavan et al. 2007), 4 rounds — the fourth graph primitive
    * next to ranking (q100), reachability (q103) and components
    * ([[Components]]): where components answer "connected at all?",
    * LPA answers "densely connected to WHOM?", the modularity signal a
    * mix-curation pass uses to find self-citing source cliques.
    *
    * Determinism (the reason this is 4 SYNCHRONOUS rounds, not
    * async-until-converged): every node starts as its own label; each
    * round every node adopts the label with the max total incident
    * edge weight among its neighbors, ties to the LOWEST label — a
    * pure function of the round-(k−1) labeling, so the unrolled oracle
    * is exact. Edge weights are lineitem counts cast to double:
    * integer-valued, so the per-(node, label) weight sums are EXACT in
    * any aggregation order and the argmax can never flip on ulp drift
    * (no rounding needed anywhere).
    *
    * Scale shape: each round is ONE equi-join of the label vector
    * against the src-partitioned cached edge table (rounds shuffle
    * only the #nodes-row vector — [[orderEdges]]' contract) + two
    * hash aggregates: votes keyed (dst, label), then the per-dst
    * argmax as a max-of-struct partial+final aggregate — NO window,
    * NO per-round sort. `max(struct(lw, −label))` is the
    * order-independent argmax-with-lowest-label-tiebreak. */
  /** Open-knob LPA core shared by q147 and [[graft.Graft.labelPropagation]]:
    * returns `(node, lbl)` after `rounds` synchronous rounds. The lazy
    * plan grows LINEARLY in rounds (the label vector feeds exactly one
    * join per round), but analyzer cost still compounds — refuse deep
    * unrolls instead of silently handing Catalyst a huge tree; a
    * convergence-driven run adopts [[Components.run]]'s per-round
    * freeze. */
  private[graft] def labelPropagation(spark: SparkSession, dir: String,
      rounds: Int): DataFrame = {
    import spark.implicits._
    require(rounds > 0 && rounds <= 16,
      s"need 0 < rounds <= 16 (got $rounds) — adopt Components.run's " +
        "per-round freeze for convergence-driven propagation")
    val edges = orderEdges(spark, dir) // (src, dst, w, p), cached on src
    var labels = edges.select($"src".as("node")).distinct()
      .select($"node", $"node".as("lbl"))
    for (_ <- 1 to rounds) {
      val votes = edges.join(labels.hint("shuffle_hash"), $"src" === $"node")
        .groupBy($"dst", $"lbl").agg(sum($"w").as("lw"))
      labels = votes.groupBy($"dst")
        .agg(max(struct($"lw".as("lw"), (-$"lbl").as("nl"))).as("m"))
        .select($"dst".as("node"), (-$"m.nl").as("lbl"))
    }
    labels
  }

  private def q147(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    labelPropagation(spark, dir, rounds = 4)
      .select($"node",
        when($"node" % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        $"lbl".as("community"))
      .orderBy($"community", $"node")
  }

  /** Unrolled LPA rounds (shared by the q147 and q203 oracles);
    * row_number spells the same (lw DESC, label ASC) argmax the
    * struct-max encodes. */
  private def lpaRoundsSql(rounds: Int): String =
    (1 to rounds).map { i =>
      val prev = s"l${i - 1}"
      s"""v$i AS (
         |  SELECT e.dst, l.lbl, sum(e.w) AS lw
         |  FROM edges e JOIN $prev l ON l.node = e.src
         |  GROUP BY 1, 2
         |), l$i AS (
         |  SELECT dst AS node, lbl
         |  FROM (SELECT dst, lbl,
         |               row_number() OVER (PARTITION BY dst
         |                                  ORDER BY lw DESC, lbl ASC) AS rn
         |        FROM v$i) t
         |  WHERE rn = 1
         |)""".stripMargin
    }.mkString(", ")

  private val q147Sql: String =
    s"""WITH $edgeCtes,
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
       |${lpaRoundsSql(4)}
       |SELECT node,
       |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |       lbl AS community
       |FROM l4
       |ORDER BY community, node""".stripMargin

  // -------------------------------------------------------------- q203
  /** Newman–Girvan modularity of the q147 communities — the EVALUATION
    * half of community detection (Newman & Girvan '04): per community,
    * Q-term = w_in/2m − (d_c/2m)², where w_in counts both directions
    * of intra-community weight and d_c is the community's total
    * degree; Σ terms is the partition's modularity (≈0 for random
    * structure, →1 for strong communities). Running the detector
    * without its quality metric is how degenerate partitions slip into
    * a curation pass — this closes the loop.
    *
    * Shape: the SAME 4-round propagation (one shared core, q147's
    * scaladoc argmax determinism applies verbatim), then two
    * label-keyed joins of the cached edge table (src label, dst label
    * — rounds shuffle the #nodes vector only) and two per-community
    * aggregates. Edge weights are integer-valued doubles, so every
    * sum is exact in any order; the two divides + one multiply round
    * at 6 dp as the single display step. */
  private def q203(spark: SparkSession, dir: String): DataFrame =
    modularity(spark, dir, rounds = 4)

  /** Open-knob core of q203, shared with [[graft.Graft.modularity]]:
    * the propagation depth is the knob. */
  private[graft] def modularity(spark: SparkSession, dir: String,
      rounds: Int): DataFrame = {
    import spark.implicits._
    val edges = orderEdges(spark, dir)
    val labels = labelPropagation(spark, dir, rounds)
      .select($"node", $"lbl")
    val k = edges.groupBy($"src").agg(sum($"w").as("k"))
    val m2 = edges.agg(sum($"w").as("m2"))
    val dc = labels.join(k, $"node" === $"src")
      .groupBy($"lbl".as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum($"k").as("d_c"))
    val win = edges
      .join(labels.select($"node".as("src"), $"lbl".as("la")).hint("shuffle_hash"),
        "src")
      .join(labels.select($"node".as("dst"), $"lbl".as("lb")).hint("shuffle_hash"),
        "dst")
      .filter($"la" === $"lb")
      .groupBy($"la".as("community")).agg(sum($"w").as("w_in"))
    dc.join(win, Seq("community"), "left_outer")
      .crossJoin(broadcast(m2))
      .select($"community", $"n_nodes", $"d_c",
        coalesce($"w_in", lit(0.0)).as("w_in"),
        round(coalesce($"w_in", lit(0.0)) / $"m2" -
          ($"d_c" / $"m2") * ($"d_c" / $"m2"), 6).as("q_term"))
      .orderBy($"community")
  }

  private val q203Sql: String =
    s"""WITH $edgeCtes,
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
       |${lpaRoundsSql(4)},
       |k AS (SELECT src, sum(w) AS k FROM edges GROUP BY 1),
       |m AS (SELECT sum(w) AS m2 FROM edges),
       |dc AS (
       |  SELECT la.lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
       |         sum(k.k) AS d_c
       |  FROM l4 la JOIN k ON k.src = la.node
       |  GROUP BY 1
       |), win AS (
       |  SELECT la.lbl AS community, sum(e.w) AS w_in
       |  FROM edges e
       |  JOIN l4 la ON la.node = e.src
       |  JOIN l4 lb ON lb.node = e.dst AND lb.lbl = la.lbl
       |  GROUP BY 1
       |)
       |SELECT dc.community, dc.n_nodes, dc.d_c,
       |       COALESCE(win.w_in, 0.0) AS w_in,
       |       round(COALESCE(win.w_in, 0.0) / m.m2
       |             - (dc.d_c / m.m2) * (dc.d_c / m.m2), 6) AS q_term
       |FROM dc LEFT JOIN win USING (community) CROSS JOIN m
       |ORDER BY community""".stripMargin

  // -------------------------------------------------------------- q156
  /** Adamic–Adar link prediction between suppliers: two suppliers are
    * likely partners when they co-appear in many orders, and a shared
    * order counts for MORE when few suppliers touch it — each common
    * order o contributes 1/ln(ns_o) (Adamic & Adar 2003's inverse-log
    * common-neighbor weighting with orders as the intermediary nodes of
    * the bipartite graph). The sixth graph primitive: ranking (q100),
    * traversal (q103), components (q50), communities (q147), census
    * (q112) — and now edge PREDICTION.
    *
    * Scale safety is structural, not a cap: the pair explosion is
    * per-ORDER, and an order's supplier set tracks its lineitem count —
    * a per-entity constant (measured max 8/13/16 at sf0.001/0.01/0.1,
    * avg ≈ 4), so Σ ns² stays a small constant times |orders| — linear
    * in the data. Contrast 2-hop expansion through part or customer
    * hubs, whose degree grows WITH the corpus (distinct suppliers per
    * part already averages 26-30 at these scales and keeps growing — a
    * quadratic trap this basket formulation avoids by construction).
    * ln(ns) ≥ ln 2 > 0 for every pair-bearing order, so the weight is
    * always finite.
    *
    * Shape: ONE distinct (order, supplier) contraction; the self-join
    * and the ns-join both key on order and reuse its exchange; the
    * score aggregate keys on the (s_a, s_b) pair; top-50 is
    * TakeOrdered, never a global sort. Determinism: common_orders is
    * exact; the score sums ≤ common_orders transcendental terms, so the
    * output rounds at 4 dp and the rank guards at 6 dp with the pair as
    * tiebreak (q74's discipline). */
  private def q156(spark: SparkSession, dir: String): DataFrame =
    linkPrediction(spark, dir, topK = 50)

  /** q156's core with the result-size knob open
    * ([[graft.Graft.linkPrediction]]). */
  private[graft] def linkPrediction(spark: SparkSession, dir: String,
      topK: Int): DataFrame = {
    import spark.implicits._
    require(topK > 0 && topK <= 100000, s"need 0 < topK <= 100000 (got $topK)")
    val os = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("s"))
      .distinct()
    val ns = os.groupBy($"ok").agg(count(lit(1)).as("ns"))
    os.as("a").join(os.as("b"), Seq("ok"))
      .where($"a.s" < $"b.s")
      .join(ns, Seq("ok"))
      .select($"a.s".as("s_a"), $"b.s".as("s_b"),
        (lit(1.0) / log($"ns".cast("double"))).as("w"))
      .groupBy($"s_a", $"s_b")
      .agg(count(lit(1)).as("common_orders"), sum($"w").as("score"))
      .orderBy(round($"score", 6).desc, $"s_a", $"s_b")
      .limit(topK)
      .select($"s_a", $"s_b", $"common_orders", round($"score", 4).as("aa_score"))
  }

  private val q156Sql: String =
    """WITH os AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
      |), ns AS (
      |  SELECT ok, CAST(count(*) AS BIGINT) AS ns FROM os GROUP BY 1
      |), pairs AS (
      |  SELECT a.s AS s_a, b.s AS s_b, 1.0 / ln(CAST(ns.ns AS DOUBLE)) AS w
      |  FROM os a
      |  JOIN os b ON b.ok = a.ok AND a.s < b.s
      |  JOIN ns ON ns.ok = a.ok
      |), scored AS (
      |  SELECT s_a, s_b, CAST(count(*) AS BIGINT) AS common_orders,
      |         sum(w) AS score
      |  FROM pairs GROUP BY 1, 2
      |)
      |SELECT s_a, s_b, common_orders, round(score, 4) AS aa_score
      |FROM scored
      |ORDER BY round(score, 6) DESC, s_a, s_b
      |LIMIT 50""".stripMargin

  // -------------------------------------------------------------- q171
  /** PERSONALIZED PageRank from a seed set — the graph-retrieval twin
    * of q100 (Haveliwala, WWW'02): restart mass lands uniformly on the
    * five seed suppliers instead of everywhere, so ranks measure
    * proximity to the seeds, the "related entities" primitive behind
    * recommendation expansion and graph-aware hard-negative mining.
    * Runs the SAME [[pagerank]] core with the `teleportTo` knob set
    * (one code path, two catalog behaviors — the q100 scaladoc's
    * contract), so the per-round shape is unchanged: one equi-join of
    * the rank vector against the src-partitioned cached edge table +
    * one sum aggregate; rounds shuffle only the #nodes-row vector.
    * Seeds are suppliers 1–5 (nodes 2k+1 — present at every scale
    * factor); Σr = 1 still holds (teleport vector sums to 1, graph has
    * no dangling nodes), and GraphSpec asserts it alongside the
    * locality property (seed ranks dominate the uniform run's). */
  private def q171(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pagerank(spark, dir, iterations = 5, damping = 0.85,
      teleportTo = PprSeeds)
      .select($"node",
        when($"node" % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        round($"r", 6).as("ppr"))
      .orderBy($"ppr".desc, $"node")
  }

  /** Suppliers 1–5 as node ids (suppkey*2+1). */
  private val PprSeeds: Seq[Long] = Seq(3L, 5L, 7L, 9L, 11L)

  /** Unrolled twin of the personalized recurrence: r0 is the teleport
    * vector itself, and each round adds the damped restart ONLY on the
    * seed nodes — same 5 rounds, same 0.2 = 1/|S| mass. */
  private val q171Sql: String = {
    val seedList = PprSeeds.mkString(", ")
    val tele = s"CASE WHEN e.dst IN ($seedList) THEN 0.2 ELSE 0.0 END"
    val rounds = (1 to 5).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         0.15 * $tele + 0.85 * sum(p.r * (e.w / o.ow)) AS r
         |  FROM edges e
         |  JOIN $prev p ON p.node = e.src
         |  JOIN outw o ON o.src = e.src
         |  GROUP BY e.dst
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $edgeCtes,
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
       |r0 AS (SELECT node,
       |              CASE WHEN node IN ($seedList) THEN 0.2 ELSE 0.0 END AS r
       |       FROM nodes),
       |$rounds
       |SELECT node,
       |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |       round(r, 6) AS ppr
       |FROM r5
       |ORDER BY ppr DESC, node""".stripMargin
  }

  // -------------------------------------------------------------- q172
  /** k-core peeling (Seidman '83) — the subgraph-density primitive next
    * to ranking, traversal, components, communities, census and link
    * prediction: iteratively delete nodes of degree < k until the
    * survivors all have ≥ k neighbors INSIDE the surviving subgraph.
    * The k-core is the standard "dense enough to matter" filter before
    * community detection, and the engagement-stability measure (a
    * customer in the 4-core keeps ≥4 trading partners even after every
    * weaker participant churns).
    *
    * Shape per round: one partial+final count aggregate over the
    * surviving edge list (degree), then TWO left-semi joins (src side,
    * dst side) against the ≥k survivor set — all equi-keyed on the
    * endpoint columns, no window, no driver data. The first-round
    * degree join reads the src-partitioned cached edge table; rounds
    * are a fixed small constant so the DuckDB oracle unrolls exactly
    * (all-integer — nothing to round). A convergence-driven variant
    * would freeze each round to a persisted frame per
    * [[Components.run]]'s discipline; [[kCore]] refuses deep unrolls
    * rather than hand Catalyst an exponentially-analyzed tree. */
  private[graft] def kCore(spark: SparkSession, dir: String,
      k: Int, rounds: Int): DataFrame = {
    import spark.implicits._
    // memoized per calibration: the peel result is a #nodes-row frame
    // built by an iterative job chain — exactly the "materialize once
    // per session" shape PersistedMemo owns (kCoreOf already returns a
    // persisted frame; the memo adds the shared lifecycle + reuse)
    graft.core.PersistedMemo.getOrBuild(spark, dir, s"graph:kcore:$k:$rounds") {
      kCoreOf(orderEdges(spark, dir).select($"src", $"dst"), k, rounds)
    }
  }

  /** Peel core over ANY bidirected edge list `(src, dst)` (both
    * directions present, no duplicates — [[orderEdges]]' contract), so
    * GraphSpec can drive the cascade on a hand-built chain whose
    * round-by-round peel order is known by eye (the order graph's
    * supplier hubs converge in one round — fine for the catalog row,
    * useless for proving the iteration). */
  private[graft] def kCoreOf(edgeList: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k > 0, s"need k > 0 (got $k)")
    require(rounds > 0 && rounds <= 8,
      s"need 0 < rounds <= 8 (got $rounds)")
    val spark = edgeList.sparkSession
    // Components.run's per-round freeze: each peel round materializes
    // into a persisted lineage-cut frame and the previous round's cache
    // drops immediately. The first spelling chained the rounds lazily —
    // materializing round r's survivor broadcast re-executed rounds
    // 1..r−1's semi-join chain from the base scan (nested sequential
    // broadcast jobs; 6.6 s at sf0.1) — frozen rounds make each round
    // exactly one count job over the previous round's cache.
    def freeze(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema).persist()
    var edges = edgeList
    var prevFrozen: Option[DataFrame] = None
    // try/finally: a round that throws mid-loop (executor loss, OOM)
    // must not strand ANY persisted frame for the session lifetime —
    // `prevFrozen` holds the one settled cache, `inflight` the round
    // being materialized (persist()-marked before count(), so a failed
    // count() would otherwise leak its partial cache), and the finally
    // releases both on ANY non-success exit.
    var inflight: Option[DataFrame] = None
    var ok = false
    var out: DataFrame = null
    try {
      for (_ <- 1 to rounds) {
        val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("src").as("node"))
        // the survivor set is #nodes rows (orders of magnitude below the
        // edge list) — BROADCAST it so the edge side never shuffles for
        // the two endpoint filters; the src-keyed degree aggregate rides
        // the previous round's cache. (At a node scale past broadcast,
        // drop the hint: the same plan becomes a partitioned semi-join —
        // semantics unchanged. The first bench spelling shuffle-hashed
        // the EDGES twice per round: 6.6 s → broadcast form is the plan
        // this operator wants.)
        val next = freeze(edges
          .join(broadcast(keep), edges("src") === keep("node"), "left_semi")
          .join(broadcast(keep), edges("dst") === keep("node"), "left_semi"))
        inflight = Some(next)
        next.count() // materialize BEFORE dropping the predecessor
        prevFrozen.foreach(_.unpersist())
        prevFrozen = Some(next)
        inflight = None
        edges = next
      }
      // contract the peeled edge list to the small survivor-degree
      // frame, freeze it, and release the last round's edge cache — the
      // returned frame is PERSISTED (#survivors rows); the caller owns
      // its lifecycle (Components.run's contract; the catalog path
      // hands it to PersistedMemo)
      out = freeze(
        edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
      out.count()
      ok = true
      out
    } finally {
      inflight.foreach(_.unpersist())
      prevFrozen.foreach(_.unpersist())
      if (!ok && out != null) out.unpersist()
    }
  }

  private def q172(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    kCore(spark, dir, k = KCoreK, rounds = 3)
      .select($"node",
        when($"node" % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        $"deg")
      .orderBy($"deg".desc, $"node")
  }

  private val KCoreK = 4

  private val q172Sql: String = {
    val peels = (1 to 3).map { i =>
      val prev = s"e${i - 1}"
      s"""k$i AS (
         |  SELECT src FROM $prev GROUP BY src HAVING count(*) >= $KCoreK
         |), e$i AS (
         |  SELECT e.src, e.dst FROM $prev e
         |  WHERE EXISTS (SELECT 1 FROM k$i a WHERE a.src = e.src)
         |    AND EXISTS (SELECT 1 FROM k$i b WHERE b.src = e.dst)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $edgeCtes,
       |e0 AS (SELECT src, dst FROM edges),
       |$peels
       |SELECT src AS node,
       |       CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |       CAST(count(*) AS BIGINT) AS deg
       |FROM e3
       |GROUP BY src
       |ORDER BY deg DESC, node""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q100_pagerank", q100, Some(q100Sql)),
    Q("q102_degree_histogram", q102, Some(q102Sql)),
    Q("q103_hop_distance", q103, Some(q103Sql)),
    Q("q112_triangle_census", q112, Some(q112Sql)),
    Q("q147_label_propagation", q147, Some(q147Sql)),
    Q("q203_modularity", q203, Some(q203Sql)),
    Q("q156_link_prediction", q156, Some(q156Sql)),
    Q("q171_personalized_pagerank", q171, Some(q171Sql)),
    Q("q172_kcore", q172, Some(q172Sql)),
  )
}
