package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Portable
import graft.sources.Tables

/** Exact set-similarity join via prefix filtering (AllPairs/PPJoin
  * family) — the EXACT counterpart of the MinHash-LSH pipeline
  * (q25/q26): same "candidates ≪ all pairs, verify only candidates"
  * shape, but with a zero-false-negative guarantee instead of a
  * probabilistic one. The reference's dedup surface is approximate
  * (signature-based); a production curation pipeline runs BOTH — LSH
  * for recall at extreme scale, prefix filtering when the contract is
  * "every pair above the threshold, provably".
  *
  * Prefix-filter principle: order every document's shingle set by a
  * single global rarity order (ascending document frequency, shingle
  * string as tie-break). If J(A,B) ≥ t, the two sets can disagree on at
  * most |X| − ceil(t·|X|) leading elements of either side, so the first
  * p(X) = |X| − ceil(t·|X|) + 1 elements of A and B must share at least
  * one. Joining only on PREFIX elements — which the rarity order makes
  * the rarest — keeps candidate bucket widths bounded by rare-shingle
  * document frequency, the AllPairs sub-quadratic argument (Bayardo,
  * Ma, Srikant, "Scaling Up All Pairs Similarity Search", WWW'07).
  *
  * Scale design (100 TB):
  *  - token → document-frequency table is one hash-aggregate (shuffle
  *    width = vocabulary, not corpus);
  *  - the per-document rank is ONE shuffle on doc_id (both window
  *    functions share the partition);
  *  - the candidate join shuffles only PREFIX tokens (a t-fraction of
  *    the corpus token stream, biased to rare tokens → no hot buckets;
  *    a length filter |A| ≤ |B|/t culls size-incompatible pairs inside
  *    the join);
  *  - verification joins full token sets for candidate docs only, the
  *    q26 discipline.
  *
  * Threshold t = 0.5 (a binary-exact double: ceil(0.5·n) carries no
  * fp error in either engine): the verified Jaccard is an
  * integer-ratio double, so the whole output is hash-exact without
  * rounding.
  */
object SetSimilarity {

  private val T = 0.5 // Jaccard threshold; 0.5 is exact in binary fp

  /** Distinct 3-word-shingle set per document, exploded (doc_id, tk) —
    * the q24/q26 shingle definition. Raw tokens are NOT discriminative
    * on a common-vocabulary corpus (measured on the synthetic data:
    * ~74% of ALL pairs clear token-Jaccard 0.5, so nothing could prune);
    * shingles restore the sparse-set regime the prefix filter needs
    * (0.6% of pairs become candidates at the same threshold). */
  private def tok(spark: SparkSession, dir: String): DataFrame =
    // memoized + persisted: [[prefixJoin]] references this frame five
    // times (df table, rank window, both verify sides, sizes) — unper-
    // sisted, the lazy plan re-runs the shingle explode + distinct
    // shuffle per reference (benched 6.1 s at sf0.1 for q167; the
    // persisted table turns four of the five into cache scans)
    graft.core.PersistedMemo.getOrBuild(spark, dir, "setsim:shingles") {
      import spark.implicits._
      Tables.documents(spark, dir)
        .withColumn("t", Portable.tokens($"text"))
        .filter(size($"t") >= 3)
        .select($"doc_id", explode(expr(
          "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("tk"))
        .distinct()
    }

  private val tokCte =
    """toks AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
      |), tok AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS tk
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
      |        FROM toks WHERE len(t) >= 3)
      |)""".stripMargin

  // -------------------------------------------------------------- q167
  /** (doc_id, tk, n, r) prefix rows at threshold `t`: each document's
    * p(X) = n − ceil(t·n) + 1 rarest shingles with their global-order
    * rank — the join keys of the candidate stage. */
  private[graft] def prefixRows(toks: DataFrame, t: Double): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    val freq = toks.groupBy($"tk").agg(count(lit(1)).as("f"))
    val byDoc = Window.partitionBy($"doc_id")
    val ranked = toks.join(freq, Seq("tk"))
      .select($"doc_id", $"tk",
        row_number().over(byDoc.orderBy($"f".asc, $"tk".asc)).as("r"),
        count(lit(1)).over(byDoc).as("n"))
    // p(X) = n − ceil(t·n) + 1 leading tokens in rarity order
    ranked
      .filter($"r" <= $"n" - ceil(lit(t) * $"n") + 1)
      .select($"doc_id", $"tk", $"n", $"r")
  }

  /** Memoized [[prefixRows]] over the default shingle sets — the freq
    * aggregate + rank window run once per (session, dataset,
    * threshold); the self-join below then reads two cache scans. */
  private def pfxMemo(spark: SparkSession, dir: String, t: Double): DataFrame =
    graft.core.PersistedMemo.getOrBuild(spark, dir, s"setsim:pfx:$t") {
      prefixRows(tok(spark, dir), t)
    }

  /** Prefix candidate pairs at threshold `t` (unverified). Split out so
    * the spec can count candidates and the facade can open the
    * threshold knob. */
  private[graft] def prefixCandidates(toks: DataFrame, t: Double): DataFrame =
    candidatesFromPfx(prefixRows(toks, t), t)

  private def candidatesFromPfx(pfx: DataFrame, t: Double): DataFrame = {
    val spark = pfx.sparkSession
    import spark.implicits._
    // POSITIONAL filter (PPJoin, Xiao/Wang/Lin/Yu WWW'08 §3.2): a
    // joined row matches token w at rank r_x in x and r_y in y; the
    // intersection can contain at most w plus the shorter remaining
    // suffix, ub = 1 + min(n_x − r_x, n_y − r_y). J ≥ t needs
    // |x∩y| ≥ t·(n_x+n_y)/(1+t), so rows with ub below that can never
    // witness a qualifying pair. SAFE under the trailing `distinct`
    // (exists-semantics): for a true pair the FIRST common token in the
    // global order sits inside both prefixes (else either side misses
    // its whole prefix from the intersection, contradicting J ≥ t) and
    // everything before it on both sides is disjoint, so THAT row's ub
    // genuinely bounds the intersection and passes. The 1e-9 slack
    // keeps the bound conservative under fp rounding of t/(1+t) for
    // arbitrary facade thresholds — infinitesimally fewer pruned rows,
    // never a lost pair.
    //
    // The join key is xxhash64(tk), not the ~25-char shingle string:
    // the self-join shuffles only prefix rows, and an 8-byte key cuts
    // both the shuffle width and the hash-probe cost (round-9 probe:
    // the candidate stage was half of q167's sf3 wall). Collision-SAFE
    // unconditionally: equal shingles always share a hash (no pair
    // lost), and a cross-shingle collision only ADDS a candidate the
    // exact verify stage rejects.
    val needed = lit(t / (1.0 + t)) * ($"x.n" + $"y.n") - lit(1e-9)
    val px = pfx.select($"doc_id", xxhash64($"tk").as("hk"), $"n", $"r")
    px.as("x")
      .join(px.as("y"),
        $"x.hk" === $"y.hk" && $"x.doc_id" < $"y.doc_id" &&
          // length filter: J ≥ t forces t ≤ min/max of the two sizes
          $"x.n" <= $"y.n" / t && $"y.n" <= $"x.n" / t &&
          (lit(1) + least($"x.n" - $"x.r", $"y.n" - $"y.r")).cast("double") >= needed)
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
  }

  /** Candidates → exact-intersection verify → Jaccard ≥ `t`.
    *
    * Snapshot discipline: the injectivity verdict is an EAGER action at
    * plan-build time while the prefix/verify frames evaluate lazily at
    * query execution, so the two must read the SAME rows — an un-pinned
    * `toks` over mutable input could pass the hash-injectivity check
    * and then collide at execution with no fallback. The facade
    * therefore LOCAL-CHECKPOINTS `toks` (eager) before the verdict
    * aggregate runs; the returned frame draws from that pinned
    * snapshot. A checkpoint, not a persist (round-10 advisory): an
    * evicted persist recomputes from live lineage — reopening exactly
    * the divergence the pin closes on mutable sources — while a
    * checkpoint has no lineage to recompute from; and the blocks are
    * released by the ContextCleaner once the caller drops the result,
    * so threshold sweeps over evolving facade inputs don't accumulate
    * session-lifetime caches.
    *
    * Verification rides PACKED per-document shingle arrays: two
    * doc-keyed equi-joins hang the (set, size) of each side on every
    * candidate row, and the overlap is counted by
    * `graft_intersect_count_sorted` — a linear merge over arrays
    * sorted ONCE per document at build time
    * ([[graft.functions.IntersectCountSorted]]; replaces
    * `size(array_intersect(...))`, which paid a per-candidate hash-set
    * build plus a materialized intersection array the `size`
    * immediately discarded). The doc-array table is one row per
    * document (dimension-sized → broadcast at small SF, plain hash
    * join at scale); the candidate table is the only fact-sized input
    * and it flows through the joins unexploded. */
  private[graft] def prefixJoin(toks: DataFrame, t: Double): DataFrame = {
    // pin one snapshot for verdict AND execution (scaladoc above): the
    // eager localCheckpoint is fully materialized — and lineage-free —
    // before the verdict aggregate or any lazy consumer is built
    val snap = toks.localCheckpoint(true)
    prefixJoinForced(snap, t, hashed = hashInjective(snap))
  }

  /** [[prefixJoin]] with the verify representation pinned — the test
    * hook proving hashed and string verification agree. */
  private[graft] def prefixJoinForced(toks: DataFrame, t: Double,
      hashed: Boolean): DataFrame =
    verifyCandidates(candidatesFromPfx(prefixRows(toks, t), t),
      docArrays(toks, hashed), t)

  /** [[prefixJoin]] over the default shingle sets with the prefix AND
    * packed-doc-array tables memoized per (session, dataset) — the
    * sort_array is paid once per dataset, not once per run. */
  private[graft] def prefixJoinDefault(spark: SparkSession, dir: String,
      t: Double): DataFrame = {
    // injectivity verdict rides a memoized 1-row aggregate, so the
    // vocab scan is paid once per (session, dataset), not per sweep
    val inj = graft.core.PersistedMemo.getOrBuild(spark, dir, "setsim:inj") {
      injFrame(tok(spark, dir))
    }.head()
    val hashed = inj.getLong(0) == inj.getLong(1)
    val key = if (hashed) "setsim:docarr:h" else "setsim:docarr"
    verifyCandidates(candidatesFromPfx(pfxMemo(spark, dir, t), t),
      graft.core.PersistedMemo.getOrBuild(spark, dir, key) {
        docArrays(tok(spark, dir), hashed)
      }, t)
  }

  /** (n_distinct_shingles, n_distinct_hashes) in one row — equal iff
    * xxhash64 is injective on this corpus's shingle vocabulary. */
  private def injFrame(toks: DataFrame): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.agg(count_distinct($"tk").as("n_tk"),
      count_distinct(xxhash64($"tk")).as("n_hk"))
  }

  /** True iff hashed verify arrays are EXACT for this corpus: xxhash64
    * collides on none of the distinct shingles, so |A∩B| over hash
    * arrays equals |A∩B| over the shingle sets for every pair. One
    * vocabulary-width aggregate (the same shuffle class as the freq
    * table); on a collision the verify stage falls back to the string
    * arrays — exactness is never conditional on hash luck. */
  private[graft] def hashInjective(toks: DataFrame): Boolean = {
    val r = injFrame(toks).head()
    r.getLong(0) == r.getLong(1)
  }

  /** (doc_id, tks SORTED ascending, n) — the verify side's packed form;
    * sorted so the merge-intersect contract holds. `hashed` packs
    * xxhash64 ids (8-byte compares in the merge loop — round-9 probe
    * measured the string-compare verify as over half of q167's sf3
    * wall) and is only legal under [[hashInjective]]; sorting by hash
    * value is fine because the merge-intersect contract is "both sides
    * ascending in the SAME order", not lexicographic specifically. */
  private def docArrays(toks: DataFrame, hashed: Boolean): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    val elem = if (hashed) xxhash64($"tk") else $"tk"
    toks.groupBy($"doc_id")
      .agg(sort_array(collect_list(elem)).as("tks"), count(lit(1)).as("n"))
  }

  private def verifyCandidates(cands: DataFrame, docArr: DataFrame,
      t: Double): DataFrame = {
    val spark = docArr.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    cands
      .join(docArr.as("za"), $"doc_a" === $"za.doc_id")
      .join(docArr.as("zb"), $"doc_b" === $"zb.doc_id")
      .select($"doc_a", $"doc_b",
        expr("graft_intersect_count_sorted(za.tks, zb.tks)").as("n_common"),
        $"za.n".as("na"), $"zb.n".as("nb"))
      .select($"doc_a", $"doc_b", $"n_common",
        ($"n_common".cast("double") / ($"na" + $"nb" - $"n_common")).as("jaccard"))
      .filter($"jaccard" >= t)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Shingle-set frame for the documents table — the facade's default
    * input (any (doc_id, tk) frame works for [[prefixJoin]]). */
  private[graft] def tokenSets(spark: SparkSession, dir: String): DataFrame =
    tok(spark, dir)

  /** All document pairs with shingle-set Jaccard ≥ 0.5 — exact, via
    * prefix-filter candidates. Emits (doc_a, doc_b, n_common, jaccard);
    * SetSimilaritySpec proves the result EQUALS the brute-force
    * all-pairs join (zero false negatives) while generating far fewer
    * candidates. */
  private def q167(spark: SparkSession, dir: String): DataFrame =
    prefixJoinDefault(spark, dir, T)

  private val q167Sql: String =
    s"""WITH $tokCte, freq AS (
       |  SELECT tk, count(*) AS f FROM tok GROUP BY 1
       |), ranked AS (
       |  SELECT t.doc_id, t.tk,
       |         row_number() OVER (PARTITION BY t.doc_id ORDER BY fr.f, t.tk) AS r,
       |         count(*) OVER (PARTITION BY t.doc_id) AS n
       |  FROM tok t JOIN freq fr ON fr.tk = t.tk
       |), pfx AS (
       |  SELECT doc_id, tk, n FROM ranked WHERE r <= n - ceil($T * n) + 1
       |), cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM pfx x JOIN pfx y
       |    ON x.tk = y.tk AND x.doc_id < y.doc_id
       |   AND x.n <= y.n / $T AND y.n <= x.n / $T
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM tok GROUP BY 1
       |), inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
       |  FROM cands c
       |  JOIN tok a ON a.doc_id = c.doc_a
       |  JOIN tok b ON b.doc_id = c.doc_b AND b.tk = a.tk
       |  GROUP BY 1, 2
       |)
       |SELECT i.doc_a, i.doc_b, i.n_common,
       |       CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= $T
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Brute-force all-pairs shingle Jaccard — test-tier verifier for the
    * prefix-filter join's exactness claim (never in the catalog: the
    * candidate generator IS the point). */
  private[graft] def allPairsJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = tok(spark, dir)
    val sizes = t.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = t.as("ta")
      .join(t.as("tb"), $"ta.tk" === $"tb.tk" && $"ta.doc_id" < $"tb.doc_id")
      .groupBy($"ta.doc_id".as("doc_a"), $"tb.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.as("za"), $"doc_a" === $"za.doc_id")
      .join(sizes.as("zb"), $"doc_b" === $"zb.doc_id")
      .select($"doc_a", $"doc_b", $"n_common",
        ($"n_common".cast("double") / ($"za.n" + $"zb.n" - $"n_common")).as("jaccard"))
      .filter($"jaccard" >= T)
  }

  /** Candidate-pair count of the prefix-filter join — exposed so the
    * spec can assert candidates ≪ all pairs (the pruning claim). */
  private[graft] def candidateCount(spark: SparkSession, dir: String): Long =
    prefixCandidates(tok(spark, dir), T).count()

  val all: Seq[Q] = Seq(
    Q("q167_set_join_prefix", q167, Some(q167Sql)))
}
