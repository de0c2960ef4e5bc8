package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Portable
import graft.sources.Tables

/** Deduplication suite over the `documents` table — the operators a
  * large-scale training-data pipeline runs before anything else.
  *
  * All variants are pure DataFrame algebra over an engine-portable hash
  * ([[Portable.hash32]]), so every stage is oracle-checkable in DuckDB
  * and stays inside WholeStageCodegen (no UDFs, no collect).
  *
  * Scale design (100 TB): every stage is a shuffle on `doc_id` or on a
  * bounded-width signature key —
  *  - exact dedup: one hash-aggregate on the content digest; shuffle
  *    width = #distinct digests;
  *  - MinHash: shingle explode is map-side only; the signature is one
  *    aggregate keyed by doc_id; LSH banding joins on (band, h1, h2)
  *    buckets so candidate generation never compares all pairs —
  *    O(sum of bucket sizes squared), not O(n²);
  *  - Jaccard verification joins shingle sets only for LSH candidates;
  *  - SimHash: one aggregate per doc over token hash bit-planes.
  */
object Dedup extends DetRounding {

  /** MinHash permutation constants: h_j(x) = (A(j)*x + B(j)) mod P with
    * P prime > 2^32. A,B < 2^17 keep A*x < 2^49 (no Long overflow). */
  private[graft] val P = 4294967311L
  private[graft] val A = IndexedSeq(131L, 521L, 1031L, 2053L, 4099L, 8209L, 16411L, 32771L)
  private[graft] val B = IndexedSeq(7L, 911L, 3571L, 9041L, 17389L, 28657L, 51437L, 75577L)
  private[graft] val K = 8 // signature width; banded 4 × 2 for LSH

  // ---------------------------------------------------------- shingles
  /** Distinct 3-word shingles per document. Spark arrays are 0-indexed
    * (`t[i]`), DuckDB lists 1-indexed — both enumerate all consecutive
    * triples, yielding identical shingle sets. */
  private def shinglesFrom(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("t", Portable.tokens($"text"))
      .filter(size($"t") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("s"))
      .distinct()
  }

  private def shingles(spark: SparkSession, dir: String): DataFrame =
    shinglesFrom(Tables.documents(spark, dir))

  /** Memoized, persisted intermediates shared across the dedup chain:
    * q24 (signatures), q25 (candidates), q26 (verification) and q50/q57
    * (clustering) all consume the SAME persisted signature/candidate
    * tables instead of re-exploding the corpus per query — the
    * "persisted signature table" a production pipeline would materialize
    * between stages. `persist` (not `localCheckpoint`) keeps lineage, so
    * an executor loss recomputes the lost partitions instead of failing
    * the query. Entries live in [[graft.core.PersistedMemo]] (keyed per
    * session + dir), which owns the lifecycle: `release`/`clearAll` and
    * eviction on session stop. */
  private def memoized(
      spark: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    graft.core.PersistedMemo.getOrBuild(spark, dir, s"dedup:$key")(build)

  private val shinglesCte =
    """toks AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
      |        FROM toks WHERE len(t) >= 3)
      |)""".stripMargin

  /** doc_id → m0..m7 MinHash signature over a (possibly cached) shingle
    * set — q26 shares one shingle scan across signature, sizes and
    * intersection instead of re-exploding per consumer. */
  private def signatureFrom(sh: DataFrame): DataFrame = {
    val hs = sh.withColumn("h", Portable.hash32(col("s")))
    val mins = (0 until K).map(j =>
      min((col("h") * lit(A(j)) + lit(B(j))) % lit(P)).as(s"m$j"))
    hs.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  private def signature(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "sig")(signatureFrom(shingles(spark, dir)))

  private val signatureCte: String = {
    val mins = (0 until K)
      .map(j => s"    min((${A(j)}*h + ${B(j)}) % $P) AS m$j")
      .mkString(",\n")
    s"""$shinglesCte, hs AS (
       |  SELECT doc_id, ${Portable.hash32Sql("s")} AS h FROM sh
       |), sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM hs GROUP BY doc_id
       |)""".stripMargin
  }

  /** Banded signature rows `(band, h1, h2, doc_id)` — the LSH index
    * layout: docs sharing any (band, h1, h2) bucket are candidates. */
  private def bandsFrom(sig: DataFrame): DataFrame = {
    val spark = sig.sparkSession
    import spark.implicits._
    (0 until K / 2).map(bi =>
      sig.select(lit(bi).as("band"),
        col(s"m${2 * bi}").as("h1"), col(s"m${2 * bi + 1}").as("h2"), $"doc_id"))
      .reduce(_ unionByName _)
  }

  /** LSH candidate pairs: 4 bands × 2 rows; docs sharing any band bucket
    * become a candidate pair (unsorted — callers order). */
  private def lshCandidatesFrom(sig: DataFrame): DataFrame = {
    val spark = sig.sparkSession
    import spark.implicits._
    val bands = bandsFrom(sig)
    bands.as("x")
      .join(bands.as("y"), Seq("band", "h1", "h2"))
      .where($"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
  }

  private[operators] def lshCandidates(spark: SparkSession, dir: String): DataFrame = {
    val sig = signature(spark, dir)
    memoized(spark, dir, "cands")(lshCandidatesFrom(sig))
  }

  /** Oracle form of [[bandsFrom]]: `bands` rows over every document's
    * signature (builds on the signature/shingle CTEs). */
  private[operators] val bandsCte: String = {
    val bandSelects = (0 until K / 2)
      .map(bi => s"  SELECT $bi AS band, m${2 * bi} AS h1, m${2 * bi + 1} AS h2, doc_id FROM sig")
      .mkString("\n  UNION ALL\n")
    s"""$signatureCte, bands AS (
       |$bandSelects
       |)""".stripMargin
  }

  private[operators] val lshCandidatesCte: String =
    s"""$bandsCte, cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.h1 = y.h1 AND x.h2 = y.h2
       |              AND x.doc_id < y.doc_id
       |)""".stripMargin

  // --------------------------------------------------------------- q23
  /** Exact (content-hash) dedup: one aggregate on md5(text) keyed by the
    * digest. Emits every content group with its canonical keeper and
    * copy count — at 100 TB this is the classic first-pass dedup, and
    * shuffle width is #distinct digests, not rows. */
  private def q23(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text").as("content_hash"))
      .agg(
        min($"doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"),
        min($"n_chars").as("n_chars"))
      .orderBy($"content_hash")
  }

  private val q23Sql =
    """SELECT md5(text) AS content_hash,
      |       min(doc_id) AS keep_id,
      |       count(*) AS n_copies,
      |       min(n_chars) AS n_chars
      |FROM documents
      |GROUP BY 1
      |ORDER BY content_hash""".stripMargin

  // --------------------------------------------------------------- q24
  /** MinHash signatures (8 permutations over 3-word shingles). */
  private def q24(spark: SparkSession, dir: String): DataFrame =
    signature(spark, dir).orderBy("doc_id")

  private val q24Sql =
    s"""WITH $signatureCte
       |SELECT * FROM sig ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q25
  /** MinHash-LSH near-dup candidate pairs via 4×2 banding. */
  private def q25(spark: SparkSession, dir: String): DataFrame =
    lshCandidates(spark, dir).orderBy("doc_a", "doc_b")

  private val q25Sql =
    s"""WITH $lshCandidatesCte
       |SELECT doc_a, doc_b FROM cands ORDER BY doc_a, doc_b""".stripMargin

  // --------------------------------------------------------------- q26
  /** Exact n-gram Jaccard verification of the LSH candidates: intersect
    * shingle sets per candidate pair (join only on candidates — never
    * all pairs). jaccard = |A∩B| / (|A|+|B|-|A∩B|), exact integer
    * division → bit-identical across engines, no rounding needed. */
  /** Exposed for [[graft.Graft.textNearDupPairs]]. */
  private[graft] def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    q26(spark, dir)

  /** The candidate-doc shingle table — a memoized persisted
    * intermediate: q26, q211, and their consumers
    * (Graft.textNearDupPairs, the warm bench pass) verify against ONE
    * materialization instead of re-shingling candidates per call. */
  private def candShingles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cands = lshCandidates(spark, dir)
    memoized(spark, dir, "candsh") {
      val candDocIds = cands.select($"doc_a".as("doc_id"))
        .union(cands.select($"doc_b".as("doc_id"))).distinct()
      shinglesFrom(Tables.documents(spark, dir)
        .join(broadcast(candDocIds), Seq("doc_id"), "left_semi"))
    }
  }

  /** (doc_a, doc_b, n_common, u) — exact intersection and union sizes
    * per LSH candidate pair, the shared integer core of q26, q211, and
    * Similarity's q213 triplet miner. Memoized + persisted: the frame
    * is #candidates rows (tiny), but its lineage is the candidate
    * shingle intersection join — consumers reference it several times
    * in one plan (q213's positives + both exclusion legs), and without
    * the cut Spark re-evaluates that join per reference. */
  private[operators] def scoredCandidates(spark: SparkSession, dir: String): DataFrame =
    // stage-materialized (not lineage-kept): this is the single most
    // re-referenced frame in the catalog (q26/q55/q57/q211/q213/q217/
    // q220 all read it, several from multiple aggregates), and every
    // lineage-kept reference re-pays driver-side analysis + per-stage
    // AQE re-optimization of the whole signature→bands→intersect tree
    // (see PersistedMemo.getOrBuildStage)
    graft.core.PersistedMemo.getOrBuildStage(spark, dir, "dedup:candscore") {
      import spark.implicits._
      val cands = lshCandidates(spark, dir)
      val sh = candShingles(spark, dir)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cands
        .join(sh.as("sa"), $"doc_a" === $"sa.doc_id")
        .join(sh.as("sb"), $"doc_b" === $"sb.doc_id" && $"sa.s" === $"sb.s", "left_outer")
        .groupBy($"doc_a", $"doc_b")
        .agg(count($"sb.s").as("n_common"))
      inter
        .join(sizes.as("za"), $"doc_a" === $"za.doc_id")
        .join(sizes.as("zb"), $"doc_b" === $"zb.doc_id")
        .select($"doc_a", $"doc_b", $"n_common",
          ($"za.n" + $"zb.n" - $"n_common").as("u"))
    }

  private def q26(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // candidates come from the shared persisted table (tiny — LSH prunes
    // ~all pairs), so the full-corpus shingle explode is not replayed
    // here; the verification stage re-shingles ONLY candidate documents
    // for the intersection.
    scoredCandidates(spark, dir)
      .select($"doc_a", $"doc_b", $"n_common",
        ($"n_common".cast("double") / $"u").as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  private val q26Sql =
    s"""WITH $lshCandidatesCte, sizes AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT c.doc_a, c.doc_b, count(sb.s) AS n_common
       |  FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  LEFT JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
       |  GROUP BY 1, 2
       |)
       |SELECT i.doc_a, i.doc_b, i.n_common,
       |       CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------- q211
  /** Dedup threshold-sensitivity sweep — the TUNING CURVE a near-dup
    * rollout is calibrated on before committing to a cutoff at 100 TB:
    * for each candidate Jaccard threshold, how many verified pairs
    * survive and how many distinct documents they touch (the upper
    * bound on removable docs). The wrong threshold silently deletes a
    * corpus slice or leaves a dup cloud in; this emits the whole curve
    * in ONE pass over the already-verified candidates instead of five
    * re-runs of the pipeline.
    *
    * Exactness: thresholds are integer percents and every comparison
    * is the cross-multiplied `n_common·100 ≥ pct·union` — no floating
    * point anywhere in the query (q168's fp-free compare discipline),
    * so the curve is bit-identical by construction. The sweep floor
    * (60%) sits at the LSH banding's calibration target: BELOW the
    * banding threshold candidate recall decays, so lower cutoffs would
    * need a different index, and the sweep honestly starts where the
    * candidate set is trustworthy.
    *
    * Scale: reuses the persisted candidate scores (tiny — LSH pruned);
    * the sweep itself is a 5-row explode over that frame + two hash
    * aggregates + a broadcast spine join. Nothing rescans the corpus. */
  private val SweepPcts = Seq(60, 70, 80, 90, 95)

  private def q211(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hit = scoredCandidates(spark, dir)
      .select($"doc_a", $"doc_b", $"n_common", $"u",
        explode(array(SweepPcts.map(lit): _*)).as("threshold_pct"))
      .filter($"n_common" * 100 >= $"threshold_pct" * $"u")
    val pairsAgg = hit.groupBy($"threshold_pct")
      .agg(count(lit(1)).as("n_pairs"))
    val docsAgg = hit
      .select($"threshold_pct", explode(array($"doc_a", $"doc_b")).as("d"))
      .groupBy($"threshold_pct")
      .agg(countDistinct($"d").as("n_dup_docs"))
    // densified spine: a threshold surviving zero pairs still reports
    val spine = SweepPcts.toDF("threshold_pct")
    spine
      .join(pairsAgg, Seq("threshold_pct"), "left_outer")
      .join(docsAgg, Seq("threshold_pct"), "left_outer")
      .select($"threshold_pct",
        coalesce($"n_pairs", lit(0L)).as("n_pairs"),
        coalesce($"n_dup_docs", lit(0L)).as("n_dup_docs"))
      .orderBy($"threshold_pct")
  }

  private val q211Sql =
    s"""WITH $lshCandidatesCte, sizes AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT c.doc_a, c.doc_b, count(sb.s) AS n_common
       |  FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  LEFT JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT i.doc_a, i.doc_b, i.n_common, za.n + zb.n - i.n_common AS u
       |  FROM inter i
       |  JOIN sizes za ON za.doc_id = i.doc_a
       |  JOIN sizes zb ON zb.doc_id = i.doc_b
       |), th AS (SELECT unnest([${SweepPcts.mkString(", ")}]) AS threshold_pct),
       |hit AS (
       |  SELECT th.threshold_pct, s.doc_a, s.doc_b
       |  FROM scored s JOIN th ON s.n_common * 100 >= th.threshold_pct * s.u
       |), pa AS (
       |  SELECT threshold_pct, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM hit GROUP BY 1
       |), da AS (
       |  SELECT threshold_pct, CAST(count(DISTINCT d) AS BIGINT) AS n_dup_docs
       |  FROM (SELECT threshold_pct, doc_a AS d FROM hit
       |        UNION ALL SELECT threshold_pct, doc_b FROM hit)
       |  GROUP BY 1
       |)
       |SELECT th.threshold_pct,
       |       CAST(COALESCE(pa.n_pairs, 0) AS BIGINT) AS n_pairs,
       |       CAST(COALESCE(da.n_dup_docs, 0) AS BIGINT) AS n_dup_docs
       |FROM th
       |LEFT JOIN pa ON pa.threshold_pct = th.threshold_pct
       |LEFT JOIN da ON da.threshold_pct = th.threshold_pct
       |ORDER BY th.threshold_pct""".stripMargin

  // -------------------------------------------------------------- q168
  /** Shingle-CONTAINMENT audit of the LSH candidates: for each candidate
    * pair, the asymmetric overlap ratios |A∩B|/|A| and |A∩B|/|B| beside
    * the symmetric Jaccard. Containment is the right lens when one
    * document swallows another (quote inclusion, page-within-crawl,
    * benchmark-inside-training-doc): a long doc containing a short one
    * keeps Jaccard low (the union is dominated by the long side) while
    * the short side's containment is ≈ 1 — exactly the pairs a
    * contamination sweep must not miss. `direction` names the candidate
    * swallowed side — the smaller shingle set ('a_in_b' / 'b_in_a' /
    * 'tie'), an exact integer size comparison (equivalent to comparing
    * the containments cross-multiplied — no fp compare).
    *
    * Scale: identical shape to q26 — candidates from the shared
    * persisted LSH table, re-shingles candidate docs only; the extra
    * ratios are per-row scalar math on the same aggregate. */
  private def q168(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cands = lshCandidates(spark, dir)
    val sh = candShingles(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cands
      .join(sh.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sh.as("sb"), $"doc_b" === $"sb.doc_id" && $"sa.s" === $"sb.s", "left_outer")
      .groupBy($"doc_a", $"doc_b")
      .agg(count($"sb.s").as("n_common"))
    inter
      .join(sizes.as("za"), $"doc_a" === $"za.doc_id")
      .join(sizes.as("zb"), $"doc_b" === $"zb.doc_id")
      .select(
        $"doc_a", $"doc_b", $"n_common",
        ($"n_common".cast("double") / $"za.n").as("cont_a"),
        ($"n_common".cast("double") / $"zb.n").as("cont_b"),
        // cross-multiplied integer compare: n/|A| vs n/|B| ⇔ |B| vs |A|
        when($"za.n" < $"zb.n", lit("a_in_b"))
          .when($"zb.n" < $"za.n", lit("b_in_a"))
          .otherwise(lit("tie")).as("direction"))
      .orderBy($"doc_a", $"doc_b")
  }

  private val q168Sql: String =
    s"""WITH $lshCandidatesCte, sizes AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT c.doc_a, c.doc_b, count(sb.s) AS n_common
       |  FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  LEFT JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
       |  GROUP BY 1, 2
       |)
       |SELECT i.doc_a, i.doc_b, i.n_common,
       |       CAST(i.n_common AS DOUBLE) / za.n AS cont_a,
       |       CAST(i.n_common AS DOUBLE) / zb.n AS cont_b,
       |       CASE WHEN za.n < zb.n THEN 'a_in_b'
       |            WHEN zb.n < za.n THEN 'b_in_a'
       |            ELSE 'tie' END AS direction
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  // --------------------------------------------------------------- q27
  /** 32-bit SimHash over token frequencies: per bit-plane j, sign of
    * Σ_tokens (±1 by bit j of hash32(token)); duplicates count. One
    * aggregate per doc — fully distributed, codegen-friendly. */
  /** (doc_id, simhash) frame — memoized: the simhash table is an index
    * a pipeline materializes once and probes many times (q27 dumps it,
    * q60 mines near-dup pairs from it). */
  private def simhashTable(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "simhash") {
      import spark.implicits._
      val tok = Tables.documents(spark, dir)
        .select($"doc_id", explode(Portable.tokens($"text")).as("w"))
        .withColumn("h", Portable.hash32($"w"))
      val planes = (0 until 32).map(j =>
        sum(when(shiftright($"h", j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j"))
      tok.groupBy("doc_id")
        .agg(planes.head, planes.tail: _*)
        .select($"doc_id",
          (0 until 32)
            .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
            .reduce(_ + _).as("simhash"))
    }

  private def q27(spark: SparkSession, dir: String): DataFrame =
    simhashTable(spark, dir).orderBy("doc_id")

  /** Oracle form of [[simhashTable]]: `sim` rows (doc_id, simhash). */
  private val simhashCte: String = {
    val planes = (0 until 32)
      .map(j => s"    sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n")
    val combine = (0 until 32)
      .map(j => s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w FROM documents
       |), hs AS (
       |  SELECT doc_id, ${Portable.hash32Sql("w")} AS h FROM tok
       |), planes AS (
       |  SELECT doc_id,
       |$planes
       |  FROM hs GROUP BY doc_id
       |), sim AS (
       |  SELECT doc_id, CAST($combine AS BIGINT) AS simhash FROM planes
       |)""".stripMargin
  }

  private val q27Sql: String =
    s"""WITH $simhashCte
       |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q57
  /** Incremental corpus dedup: assign an INCOMING batch of documents to
    * duplicate clusters against an already-indexed corpus WITHOUT
    * re-shingling the old corpus — the daily-append path a 100 TB
    * pipeline actually runs (full-batch q50 is the bootstrap; this is
    * every day after). The q51 hash split plays the two roles
    * deterministically on both engines: buckets <90 (train+val) are the
    * indexed corpus, buckets ≥90 (test, ~10%) are the incoming shard.
    *
    * Persisted state (built once, memoized like a production pipeline's
    * index tables): the old corpus's banded MinHash index and its prior
    * cluster labels. The incremental step
    *  1. shingles + signs ONLY the new batch ([[sigNew]] — the table a
    *     real pipeline appends to the index afterwards);
    *  2. band-joins new rows against the persisted index (new↔old) and
    *     against themselves (new↔new) — never old↔old again;
    *  3. CONTRACTS old endpoints to their prior cluster label (old
    *     clusters are already connected, so one representative node per
    *     cluster preserves connectivity) and runs connected components
    *     on that contracted graph — edge count ∝ new-batch matches, not
    *     corpus size.
    *
    * Because a pair's band keys depend only on the two documents, the
    * incremental edge set ∪ prior clusters is EXACTLY the full-batch
    * candidate graph, so labels equal full-batch q50's for every new doc
    * — which is what the oracle checks: DuckDB computes the full-corpus
    * transitive closure and restricts it to the new batch.
    * `joins_existing` = 1 when the doc landed in a cluster containing
    * any old document (the "near-dup of known data, drop or re-weight
    * it" signal), 0 for new-only clusters and singletons. */
  private[graft] def oldCorpus(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).filter(Curation.splitBucket(col("doc_id")) < 90)

  private[graft] def newBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).filter(Curation.splitBucket(col("doc_id")) >= 90)

  /** The persisted banded index of the old corpus (state, not query). */
  private[graft] def oldBands(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "bandsOld")(
      bandsFrom(signatureFrom(shinglesFrom(oldCorpus(spark, dir)))))

  /** Prior duplicate-cluster labels of the old corpus (state): connected
    * components over old↔old candidates — the "yesterday's q50" q57
    * starts from. */
  private[graft] def oldLabels(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "labelsOld") {
      val ob = oldBands(spark, dir)
      val cands = ob.as("x").join(ob.as("y"), Seq("band", "h1", "h2"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("src"), col("y.doc_id").as("dst"))
        .distinct()
      val r = Components.run(cands)
      System.err.println(
        s"[graft] q57 old-corpus components converged in ${r.rounds} rounds ($dir)")
      r.labels
    }

  /** New-batch signatures — shingling touches ONLY the incoming shard.
    * Memoized because this is the table the pipeline appends to the
    * persisted index after assignment. */
  private[graft] def sigNew(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "sigNew")(
      signatureFrom(shinglesFrom(newBatch(spark, dir))))

  /** The per-batch step of the continuous-ingestion protocol: candidate
    * edges of an incoming batch of banded rows against a banded index +
    * prior labels, old endpoints contracted to their cluster label
    * (singleton old docs have no label row — they are their own
    * representative). Shared by q57 (one daily batch) and the streaming
    * shard-ingestion path (IncrementalSpec), which calls it per
    * micro-batch and appends the batch's bands/labels to its state. */
  private[graft] def incrementalEdges(
      bandsNew: DataFrame, indexBands: DataFrame, priorLabels: DataFrame): DataFrame = {
    val spark = bandsNew.sparkSession
    import spark.implicits._
    // new↔old edges
    val eNO = bandsNew.as("x").join(indexBands.as("y"), Seq("band", "h1", "h2"))
      .select($"x.doc_id".as("src"), $"y.doc_id".as("old_id"))
      .distinct()
      .join(priorLabels.select($"doc_id".as("old_id"), $"lbl"), Seq("old_id"), "left_outer")
      .select($"src", coalesce($"lbl", $"old_id").as("dst"))
    // new↔new edges
    val eNN = bandsNew.as("x").join(bandsNew.as("y"), Seq("band", "h1", "h2"))
      .where($"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("src"), $"y.doc_id".as("dst"))
      .distinct()
    eNN.unionByName(eNO).distinct()
  }

  /** Banded rows for an arbitrary (doc_id, text) batch — the streaming
    * ingestion path's per-batch signature step. */
  private[graft] def bandsForDocs(docs: DataFrame): DataFrame =
    bandsFrom(signatureFrom(shinglesFrom(docs)))

  /** Incremental labels for every new doc incident to an edge. */
  private def q57Labels(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "q57labels") {
      val edges = incrementalEdges(
        bandsFrom(sigNew(spark, dir)), oldBands(spark, dir), oldLabels(spark, dir))
      val r = Components.run(edges)
      System.err.println(
        s"[graft] q57 incremental components converged in ${r.rounds} rounds ($dir)")
      r.labels
    }

  private def q57(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labels = q57Labels(spark, dir)
    // a contracted component contains an old doc iff any of its nodes
    // (new ids + old cluster representatives) is on the old side of the
    // split — the same pure-function test both engines share
    val hasOld = labels
      .withColumn("is_old", (Curation.splitBucket($"doc_id") < 90).cast("int"))
      .groupBy($"lbl").agg(max($"is_old").as("joins_existing"))
    newBatch(spark, dir).select($"doc_id")
      .join(labels.join(hasOld, Seq("lbl")), Seq("doc_id"), "left_outer")
      .select(
        $"doc_id",
        coalesce($"lbl", $"doc_id").as("cluster_id"),
        coalesce($"joins_existing", lit(0)).as("joins_existing"))
      .orderBy($"doc_id")
  }

  /** Oracle: the FULL-corpus closure (the expensive thing q57 avoids),
    * restricted to the new batch — proving incremental ≡ full-batch. */
  private val q57Sql: String =
    s"""WITH RECURSIVE $lshCandidatesCte, edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM cands
       |  UNION
       |  SELECT doc_b, doc_a FROM cands
       |), reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), agg AS (
       |  SELECT src AS doc_id,
       |         least(src, min(dst)) AS comp_min,
       |         max(CASE WHEN ${Curation.splitBucketSql("dst")} < 90
       |                  THEN 1 ELSE 0 END) AS has_old
       |  FROM reach
       |  GROUP BY src
       |)
       |SELECT d.doc_id,
       |       CAST(coalesce(a.comp_min, d.doc_id) AS BIGINT) AS cluster_id,
       |       CAST(coalesce(a.has_old, 0) AS INTEGER) AS joins_existing
       |FROM documents d
       |LEFT JOIN agg a ON a.doc_id = d.doc_id
       |WHERE ${Curation.splitBucketSql("d.doc_id")} >= 90
       |ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------------------------- q58
  /** Decontamination audit: which TEST-split documents are near-dups of
    * TRAIN-split documents — benchmark contamination, the check every
    * serious training-data pipeline runs before publishing an eval
    * split. (Train = q51 buckets <80, test = buckets ≥90; val is
    * deliberately excluded from the index side so the audit measures
    * train↔test leakage only.)
    *
    * Scale shape: candidates come from the SAME persisted structures the
    * dedup chain already maintains — test-side signatures ([[sigNew]])
    * band-joined against the persisted banded index ([[oldBands]])
    * FILTERED to train rows (a filter on the persisted frame, not a new
    * shingle pass). Exact Jaccard then verifies candidates only (the
    * q26 pattern): re-shingling touches candidate docs, never the
    * corpus. Emits one row per test doc that has ≥1 candidate:
    * candidate/contaminated counts and the worst (max) Jaccard, with
    * contamination at Jaccard ≥ 0.5. Integer-ratio Jaccard keeps every
    * double bit-identical across engines. */
  private def q58(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // memoized: cands is consumed twice below (candidate-doc semi-join
    // and the intersection) — unpersisted, the band self-join over the
    // skewed buckets would execute twice per invocation
    val cands = memoized(spark, dir, "cands58") {
      val testBands = bandsFrom(sigNew(spark, dir))
      val trainBands = oldBands(spark, dir)
        .filter(Curation.splitBucket(col("doc_id")) < 80)
      testBands.as("x").join(trainBands.as("y"), Seq("band", "h1", "h2"))
        .select($"x.doc_id".as("test_id"), $"y.doc_id".as("train_id"))
        .distinct()
    }
    val candDocIds = cands.select($"test_id".as("doc_id"))
      .union(cands.select($"train_id".as("doc_id"))).distinct()
    val candDocs = Tables.documents(spark, dir)
      .join(broadcast(candDocIds), Seq("doc_id"), "left_semi")
    val sh = shinglesFrom(candDocs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cands
      .join(sh.as("sa"), $"test_id" === $"sa.doc_id")
      .join(sh.as("sb"), $"train_id" === $"sb.doc_id" && $"sa.s" === $"sb.s", "left_outer")
      .groupBy($"test_id", $"train_id")
      .agg(count($"sb.s").as("n_common"))
    val scored = inter
      .join(sizes.as("za"), $"test_id" === $"za.doc_id")
      .join(sizes.as("zb"), $"train_id" === $"zb.doc_id")
      .select($"test_id", $"train_id",
        ($"n_common".cast("double") / ($"za.n" + $"zb.n" - $"n_common")).as("jaccard"))
    scored
      .groupBy($"test_id".as("doc_id"))
      .agg(
        count(lit(1)).as("n_candidates"),
        sum(when($"jaccard" >= 0.5, 1L).otherwise(0L)).as("n_contaminated"),
        max($"jaccard").as("max_jaccard"))
      .withColumn("is_contaminated", ($"n_contaminated" > 0).cast("int"))
      .orderBy($"doc_id")
  }

  private val q58Sql: String =
    s"""WITH $bandsCte, cands AS (
       |  SELECT DISTINCT x.doc_id AS test_id, y.doc_id AS train_id
       |  FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.h1 = y.h1 AND x.h2 = y.h2
       |  WHERE ${Curation.splitBucketSql("x.doc_id")} >= 90
       |    AND ${Curation.splitBucketSql("y.doc_id")} < 80
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT c.test_id, c.train_id, count(sb.s) AS n_common
       |  FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.test_id
       |  LEFT JOIN sh sb ON sb.doc_id = c.train_id AND sb.s = sa.s
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT i.test_id, i.train_id,
       |         CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
       |  FROM inter i
       |  JOIN sizes za ON za.doc_id = i.test_id
       |  JOIN sizes zb ON zb.doc_id = i.train_id
       |)
       |SELECT test_id AS doc_id,
       |       CAST(count(*) AS BIGINT) AS n_candidates,
       |       CAST(sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |       max(jaccard) AS max_jaccard,
       |       CAST(max(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS INTEGER) AS is_contaminated
       |FROM scored
       |GROUP BY 1
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q60
  /** SimHash Hamming near-dup pairs via pigeonhole byte-banding: split
    * the 32-bit simhash into 4 bytes — any pair within Hamming distance
    * 3 differs in at most 3 bit positions, which touch at most 3 of the
    * 4 blocks, so the pair SHARES at least one exact byte. Candidates
    * are therefore an equi-join on (block, byte) — O(Σ bucket²), never
    * all pairs — and the verifier is one codegen'd `bit_count(xor)` per
    * candidate. This is the classic web-scale simhash dedup layout
    * (block-permuted tables); at 64-bit hashes the same code splits
    * into more blocks. Probes the memoized [[simhashTable]] index. */
  private def q60(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sim = simhashTable(spark, dir)
    val sbands = (0 until 4).map(b =>
      sim.select(lit(b).as("b"),
        shiftright($"simhash", 8 * b).bitwiseAND(lit(255L)).as("byte"),
        $"doc_id", $"simhash"))
      .reduce(_ unionByName _)
    sbands.as("x").join(sbands.as("y"), Seq("b", "byte"))
      .where($"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        $"x.simhash".as("sa"), $"y.simhash".as("sb"))
      .distinct()
      .withColumn("hamming", bit_count($"sa".bitwiseXOR($"sb")))
      .filter($"hamming" <= 3)
      .select($"doc_a", $"doc_b", $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }

  private val q60Sql: String = {
    val bandSelects = (0 until 4)
      .map(b => s"  SELECT $b AS b, (simhash >> ${8 * b}) & 255 AS byte, doc_id, simhash FROM sim")
      .mkString("\n  UNION ALL\n")
    s"""WITH $simhashCte, sbands AS (
       |$bandSelects
       |), cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |         x.simhash AS sa, y.simhash AS sb
       |  FROM sbands x
       |  JOIN sbands y ON x.b = y.b AND x.byte = y.byte AND x.doc_id < y.doc_id
       |)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
       |FROM cands
       |WHERE bit_count(xor(sa, sb)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // --------------------------------------------------------------- q65
  /** Exact n-gram decontamination — the canonical published method
    * (GPT-3 appendix C / PaLM style): a TEST document is contaminated if
    * any of its 8-gram token windows appears verbatim anywhere in the
    * TRAIN split. Complements q58's near-dup audit: q58 catches fuzzy
    * rewrites via MinHash banding, this catches verbatim spans that
    * near-dup banding can miss when the surrounding document differs
    * (a leaked eval question quoted inside an unrelated page).
    *
    * Shape: distinct 8-grams per side (the explode is map-side and
    * distinct-bounded), one equi-join gram↔gram, partial+final count
    * aggregation per test doc, left join back so CLEAN test docs appear
    * with zero hits (the audit must enumerate the whole split, not just
    * offenders). Emits per test doc: total grams, grams hit, distinct
    * train docs hit, hit fraction, contaminated flag (any hit — the
    * published rule).
    *
    * 100 TB: the train side becomes a persisted dedup-style gram-hash
    * index (built once, appended incrementally like q57's signature
    * index); the test split is tiny by construction, so the join is a
    * broadcast of test grams against a scan of the index — or a bloom
    * filter pushed into the index scan. Joining on the 32-bit portable
    * hash alone would admit birthday collisions at corpus scale, so the
    * production join key is (hash, gram) — hash narrows the shuffle,
    * the gram residual keeps it exact; at sf scale the plain gram join
    * below is already the right plan. */
  private val DecontamN = 8

  /** Distinct n-gram token windows per document. */
  private[graft] def tokenGrams(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("t", Portable.tokens($"text"))
      .filter(size($"t") >= n)
      .select($"doc_id", explode(expr(
        s"array_distinct(transform(sequence(0, size(t)-$n), i -> array_join(slice(t, i+1, $n), ' ')))"
      )).as("g"))
  }

  private def q65(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val tg = tokenGrams(docs.filter(Curation.splitBucket($"doc_id") >= 90), DecontamN)
    val rg = tokenGrams(docs.filter(Curation.splitBucket($"doc_id") < 80), DecontamN)
    val hits = tg.as("a").join(rg.as("b"), $"a.g" === $"b.g")
      .groupBy($"a.doc_id")
      .agg(
        countDistinct($"a.g").as("n_hit"),
        countDistinct($"b.doc_id").as("n_train_docs"))
    val totals = tg.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
    totals.join(hits, Seq("doc_id"), "left_outer")
      .select(
        $"doc_id",
        $"n_grams",
        coalesce($"n_hit", lit(0L)).as("n_hit"),
        coalesce($"n_train_docs", lit(0L)).as("n_train_docs"),
        // raw quotient, never rounded: a single IEEE divide is
        // bit-identical across engines; round() on a scalar double is
        // the documented Spark-vs-DuckDB knife edge
        (coalesce($"n_hit", lit(0L)).cast("double") / $"n_grams").as("hit_frac"),
        (coalesce($"n_hit", lit(0L)) > 0).cast("int").as("is_contaminated"))
      .orderBy($"doc_id")
  }

  private val q65Sql: String =
    s"""WITH grams AS (
       |  SELECT DISTINCT doc_id, g
       |  FROM (SELECT doc_id,
       |               unnest([array_to_string(list_slice(t, i, i + ${DecontamN - 1}), ' ')
       |                       for i in generate_series(1, len(t) - ${DecontamN - 1})]) AS g
       |        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents)
       |        WHERE len(t) >= $DecontamN)
       |), tg AS (
       |  SELECT * FROM grams WHERE ${Curation.splitBucketSql("doc_id")} >= 90
       |), rg AS (
       |  SELECT * FROM grams WHERE ${Curation.splitBucketSql("doc_id")} < 80
       |), hits AS (
       |  SELECT a.doc_id,
       |         count(DISTINCT a.g) AS n_hit,
       |         count(DISTINCT b.doc_id) AS n_train_docs
       |  FROM tg a JOIN rg b ON a.g = b.g
       |  GROUP BY 1
       |), totals AS (
       |  SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY 1
       |)
       |SELECT t.doc_id,
       |       CAST(t.n_grams AS BIGINT) AS n_grams,
       |       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       |       CAST(COALESCE(h.n_train_docs, 0) AS BIGINT) AS n_train_docs,
       |       CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_grams AS hit_frac,
       |       CAST(COALESCE(h.n_hit, 0) > 0 AS INTEGER) AS is_contaminated
       |FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // --------------------------------------------------------------- q98
  /** Contamination SPAN extraction: q65 answers "is this test doc
    * contaminated"; this answers "which part" — every verbatim 8-gram
    * match is expanded to the token indices it covers and overlapping/
    * adjacent matches are merged into maximal spans (the gaps-and-
    * islands pattern: consecutive indices share `idx − row_number()`),
    * emitting (doc_id, span_start, span_end, span_tokens). The span
    * report is what a decontamination pipeline actually REDACTS (PaLM/
    * GPT-3 drop whole docs; surgical pipelines cut the spans).
    *
    * Scale shape: positional grams explode only TEST docs; the train
    * side is the same distinct-gram contraction as q65 (bloom
    * prefilter applies); covered-index expansion is bounded by
    * 8 × matches; the islands window partitions by doc_id — shuffle
    * keyed by doc, state = one doc's matched indices. */
  private def q98(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // positional 8-grams of the TEST split (0-based token start)
    val tg = docs.filter(Curation.splitBucket($"doc_id") >= 90)
      .withColumn("t", Portable.tokens($"text"))
      .filter(size($"t") >= DecontamN)
      .select($"doc_id", explode(expr(
        s"transform(sequence(0, size(t)-$DecontamN), i -> " +
          s"named_struct('pos', i, 'g', array_join(slice(t, i+1, $DecontamN), ' ')))"))
        .as("pg"))
      .select($"doc_id", $"pg.pos".as("pos"), $"pg.g".as("g"))
    val trainG = tokenGrams(docs.filter(Curation.splitBucket($"doc_id") < 80), DecontamN)
      .select($"g").distinct()
    val covered = tg.join(trainG, Seq("g"))
      .select($"doc_id", explode(sequence($"pos", $"pos" + (DecontamN - 1))).as("idx"))
      .distinct()
    val wi = Window.partitionBy($"doc_id").orderBy($"idx")
    covered
      .withColumn("grp", $"idx" - row_number().over(wi))
      .groupBy($"doc_id", $"grp")
      .agg(min($"idx").as("span_start"), max($"idx").as("span_end"),
        count(lit(1)).as("span_tokens"))
      .select($"doc_id", $"span_start", $"span_end", $"span_tokens")
      .orderBy($"doc_id", $"span_start")
  }

  private val q98Sql: String =
    s"""WITH toks2 AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
       |), tg AS (
       |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |         array_to_string(list_slice(t, i, i + ${DecontamN - 1}), ' ') AS g
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${DecontamN - 1})) AS i
       |        FROM toks2
       |        WHERE ${Curation.splitBucketSql("doc_id")} >= 90 AND len(t) >= $DecontamN)
       |), rgd AS (
       |  SELECT DISTINCT g
       |  FROM (SELECT doc_id,
       |               unnest([array_to_string(list_slice(t, i, i + ${DecontamN - 1}), ' ')
       |                       for i in generate_series(1, len(t) - ${DecontamN - 1})]) AS g
       |        FROM toks2
       |        WHERE ${Curation.splitBucketSql("doc_id")} < 80 AND len(t) >= $DecontamN)
       |), covered AS (
       |  SELECT DISTINCT tg.doc_id, CAST(u.idx AS INTEGER) AS idx
       |  FROM tg JOIN rgd ON tg.g = rgd.g,
       |       unnest(generate_series(tg.pos, tg.pos + ${DecontamN - 1})) AS u(idx)
       |), isl AS (
       |  SELECT doc_id, idx,
       |         idx - CAST(row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS INTEGER) AS grp
       |  FROM covered
       |)
       |SELECT doc_id, CAST(min(idx) AS INTEGER) AS span_start,
       |       CAST(max(idx) AS INTEGER) AS span_end,
       |       CAST(count(*) AS BIGINT) AS span_tokens
       |FROM isl GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin

  // --------------------------------------------------------------- q90
  /** N-gram novelty scoring: the fraction of each test-split document's
    * distinct 3-grams that appear NOWHERE in the train split — the
    * generalization-vs-memorization signal an eval-set review reads
    * (a low-novelty "held-out" doc is testing recall, not ability),
    * and the complement of q65's contamination metric at a phrase
    * (n=3) rather than verbatim-span (n=8) granularity.
    *
    * Scale shape: the train side collapses to its DISTINCT gram set
    * before the join (one gram-keyed aggregate — the same contraction
    * q65 uses), the test side joins gram-keyed, and the per-doc rollup
    * is a count. The bloom prefilter below (bloomDecontamination)
    * applies verbatim to this join at 100 TB. Novelty is an exact
    * integer quotient — one IEEE divide, never rounded. */
  private val NoveltyN = 3

  private def q90(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val tg = tokenGrams(docs.filter(Curation.splitBucket($"doc_id") >= 90), NoveltyN)
    val trainG = tokenGrams(docs.filter(Curation.splitBucket($"doc_id") < 80), NoveltyN)
      .select($"g").distinct().withColumn("seen", lit(1))
    tg.join(trainG, Seq("g"), "left_outer")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when($"seen".isNull, 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        ($"n_novel".cast("double") / $"n_grams").as("novelty"))
      .orderBy($"doc_id")
  }

  private val q90Sql: String =
    s"""WITH grams AS (
       |  SELECT DISTINCT doc_id, g
       |  FROM (SELECT doc_id,
       |               unnest([array_to_string(list_slice(t, i, i + ${NoveltyN - 1}), ' ')
       |                       for i in generate_series(1, len(t) - ${NoveltyN - 1})]) AS g
       |        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents)
       |        WHERE len(t) >= $NoveltyN)
       |), tg AS (
       |  SELECT * FROM grams WHERE ${Curation.splitBucketSql("doc_id")} >= 90
       |), rgd AS (
       |  SELECT DISTINCT g FROM grams WHERE ${Curation.splitBucketSql("doc_id")} < 80
       |)
       |SELECT t.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_grams,
       |       CAST(sum(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |       CAST(sum(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
       |FROM tg t LEFT JOIN rgd r ON t.g = r.g
       |GROUP BY t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // --------------------------------------------------------------- q92
  /** Source-level MinHash rollup: each source's signature is the
    * element-wise MIN of its documents' signatures — MinHash
    * mergeability (min-of-mins ≡ the signature of the unioned shingle
    * sets) used for a GROUP-level similarity estimate, the same
    * associativity the incremental path (q57) relies on shard-wise.
    * Emits every source pair with its matching-component count and the
    * estimated Jaccard of the sources' shingle UNIONS — the "is this
    * new source just a re-crawl of one we have" triage, at signature
    * cost (#sources × K longs), never touching the corpus pairwise.
    *
    * The pairwise stage IS a self-cross-join — of the #sources-row
    * signature table, a dimension-sized frame independent of corpus
    * scale (20 sources → 190 pairs). The corpus-scale work ends at the
    * per-source aggregate. */
  private def q92(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val smap = Tables.documents(spark, dir).select($"doc_id", $"source")
    val srcSig = signature(spark, dir)
      .join(smap, Seq("doc_id"))
      .groupBy($"source")
      .agg(min(col("m0")).as("m0"), (1 until K).map(j => min(col(s"m$j")).as(s"m$j")): _*)
    val matches = (0 until K)
      .map(j => when(col(s"a.m$j") === col(s"b.m$j"), 1).otherwise(0))
      .reduce(_ + _)
    srcSig.as("a").join(srcSig.as("b"), col("a.source") < col("b.source"))
      .select(
        col("a.source").as("src_a"), col("b.source").as("src_b"),
        matches.cast("int").as("n_match"),
        (matches.cast("double") / K).as("est_jaccard"))
      .orderBy($"src_a", $"src_b")
  }

  private val q92Sql: String = {
    val mins = (0 until K).map(j => s"min(m$j) AS m$j").mkString(", ")
    val matches = (0 until K)
      .map(j => s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $signatureCte, smap AS (
       |  SELECT doc_id, source FROM documents
       |), ssig AS (
       |  SELECT d.source, $mins
       |  FROM sig s JOIN smap d ON s.doc_id = d.doc_id
       |  GROUP BY d.source
       |)
       |SELECT a.source AS src_a, b.source AS src_b,
       |       CAST($matches AS INTEGER) AS n_match,
       |       CAST($matches AS DOUBLE) / $K AS est_jaccard
       |FROM ssig a JOIN ssig b ON a.source < b.source
       |ORDER BY src_a, src_b""".stripMargin
  }

  // ------------------------------------------------- bloom decontam
  /** q65's 100 TB prefilter made concrete: build a Bloom filter over
    * the TRAIN grams with Catalyst's own sketch aggregate
    * (`BloomFilterAggregate` over `xxhash64(gram)` — the expression
    * behind Spark's runtime row-level filters; partial buffers are
    * fixed-size bit arrays that merge associatively, so the shuffle
    * carries filter-size × #partials bytes, never the gram set), then
    * prefilter TEST grams through `BloomFilterMightContain` with the
    * serialized filter embedded as a foldable binary literal
    * (codegen'd, no UDF), and run q65's exact gram join on the
    * might-contain SURVIVORS only.
    *
    * Bloom filters have NO false negatives, so the output row set is
    * exactly q65's: the fpp knob only sizes the surviving candidate
    * volume (the exact join prunes the false positives). At 100 TB
    * the filter is built once per train snapshot (or per appended
    * shard, OR-merged — the buffers are mergeable), broadcast with
    * the plan, and the gram index is never shuffled against the test
    * split at all; a 1e9-gram filter at 3% fpp is ~0.9 GB — scan-side
    * prefiltering at memory cost independent of corpus size.
    * DecontamSpec asserts exact equality with q65 at two fpp
    * calibrations. */
  def bloomDecontamination(spark: SparkSession, dir: String,
      fpp: Double = 0.03): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val tg = tokenGrams(docs.filter(Curation.splitBucket($"doc_id") >= 90), DecontamN)
    val rg = tokenGrams(docs.filter(Curation.splitBucket($"doc_id") < 80), DecontamN)
    // sizing scan (train-gram count); at scale this is a stats lookup
    val nTrainGrams = math.max(rg.count(), 1L)
    val numBits = math.max(64L,
      math.ceil(-nTrainGrams * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bytes = rg
      .select(expr(s"graft_bloom_build(xxhash64(g), ${nTrainGrams}L, ${numBits}L)").as("bf"))
      .head.getAs[Array[Byte]]("bf")
    graft.functions.GraftFunctions.registerBloomProbe(spark, "graft_bloom_probe", bytes)
    val surviving = tg.filter(expr("graft_bloom_probe(xxhash64(g))"))
    // q65's exact verification, fed by the survivors only; totals still
    // enumerate the whole test split (clean docs appear with 0 hits)
    val hits = surviving.as("a").join(rg.as("b"), $"a.g" === $"b.g")
      .groupBy($"a.doc_id")
      .agg(
        countDistinct($"a.g").as("n_hit"),
        countDistinct($"b.doc_id").as("n_train_docs"))
    tg.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("doc_id"), "left_outer")
      .select(
        $"doc_id",
        $"n_grams",
        coalesce($"n_hit", lit(0L)).as("n_hit"),
        coalesce($"n_train_docs", lit(0L)).as("n_train_docs"),
        (coalesce($"n_hit", lit(0L)).cast("double") / $"n_grams").as("hit_frac"),
        (coalesce($"n_hit", lit(0L)) > 0).cast("int").as("is_contaminated"))
      .orderBy($"doc_id")
  }

  // --------------------------------------------------------------- q101
  /** Token-blocked fuzzy matching over a name dictionary — entity
    * resolution's candidate→verify shape applied to edit distance.
    * Open-knob core shared by q101 and [[graft.Graft.fuzzyMatches]].
    *
    * Scale design (100 TB): the resolution unit is the DISTINCT value
    * dictionary, not the row stream (64 names vs 2 000 part rows here;
    * the same orders of magnitude apart in a real catalog) — resolve
    * values once, then broadcast the verdicts back onto rows. Never
    * all-pairs: candidates come from an equi-join on a shared token
    * (the classic ER blocking key — Σ bucket², not |dict|²), and the
    * O(len²) Levenshtein verify runs only on blocked candidates. At
    * production name lengths Spark's bounded `levenshtein(l, r, k)`
    * early-exits rows that exceed the threshold. */
  private[graft] def fuzzyNamePairs(spark: SparkSession, dir: String,
      maxDist: Int): DataFrame = {
    import spark.implicits._
    val names = Tables.part(spark, dir)
      .groupBy($"p_name").agg(count(lit(1)).as("n"))
    val toks = names
      .select($"p_name", explode(split($"p_name", " ")).as("tok"))
      .distinct()
    val cand = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"))
      .distinct()
    // the BOUNDED form: returns −1 past the threshold instead of paying
    // full O(len²) per candidate — the early-exit the scaladoc promises
    cand.withColumn("dist", levenshtein($"name_a", $"name_b", maxDist))
      .filter($"dist" >= 0)
      .join(broadcast(names.select($"p_name".as("name_a"), $"n".as("n_a"))),
        Seq("name_a"))
      .join(broadcast(names.select($"p_name".as("name_b"), $"n".as("n_b"))),
        Seq("name_b"))
      .select($"name_a", $"name_b", $"dist", $"n_a", $"n_b")
      .orderBy($"name_a", $"name_b")
  }

  /** Fuzzy entity resolution at edit distance ≤ 2 — which part names
    * are near-identical spellings, and how many rows carry each. */
  private def q101(spark: SparkSession, dir: String): DataFrame =
    fuzzyNamePairs(spark, dir, maxDist = 2)

  private val q101Sql: String =
    """WITH names AS (
      |  SELECT p_name, CAST(count(*) AS BIGINT) AS n FROM part GROUP BY 1
      |), toks AS (
      |  SELECT DISTINCT p_name, tok FROM (
      |    SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM names)
      |), cand AS (
      |  SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      |  FROM toks a JOIN toks b
      |    ON a.tok = b.tok AND a.p_name < b.p_name
      |), scored AS (
      |  SELECT name_a, name_b,
      |         CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
      |  FROM cand
      |)
      |SELECT s.name_a, s.name_b, s.dist, na.n AS n_a, nb.n AS n_b
      |FROM scored s
      |JOIN names na ON na.p_name = s.name_a
      |JOIN names nb ON nb.p_name = s.name_b
      |WHERE s.dist <= 2
      |ORDER BY name_a, name_b""".stripMargin

  // -------------------------------------------------------------- q175
  /** Jaro–Winkler similarity matrix over the part-name DICTIONARY —
    * the continuous fuzzy-match scorer next to q101's edit-distance
    * gate, computed by the engine's native codegen'd
    * [[graft.functions.JaroWinklerSimilarity]] expression (no UDF; the
    * oracle is DuckDB's own `jaro_winkler_similarity`, so the gate
    * cross-validates two independent implementations of the Winkler
    * '90 algorithm bit-for-bit before the 4-dp round).
    *
    * Scale design: same vocabulary contraction as q101 — score the
    * distinct-name dictionary (64 rows here, stays orders of magnitude
    * below row count in any real catalog), then verdicts broadcast back
    * onto rows. All-pairs over the dictionary is deliberate at this
    * vocabulary size (a 64-row broadcast nested loop, q29's brute-force
    * rationale); a 10⁵+-name dictionary switches to q101's token
    * blocking or q167's prefix filter for candidates and keeps this
    * expression as the verifier. */
  private[graft] def jaroWinklerPairs(spark: SparkSession, dir: String,
      matchThreshold: Double): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val names = Tables.part(spark, dir)
      .groupBy($"p_name").agg(count(lit(1)).as("n"))
    names.select($"p_name".as("name_a"), $"n".as("n_a")).as("a")
      .join(broadcast(
        names.select($"p_name".as("name_b"), $"n".as("n_b")).as("b")),
        $"name_a" < $"name_b")
      .withColumn("jw", expr("graft_jaro_winkler(name_a, name_b)"))
      .select($"name_a", $"name_b", $"n_a", $"n_b",
        round($"jw", 4).as("jw"),
        ($"jw" >= matchThreshold).cast("int").as("is_match"))
      .orderBy($"name_a", $"name_b")
  }

  private def q175(spark: SparkSession, dir: String): DataFrame =
    jaroWinklerPairs(spark, dir, matchThreshold = 0.9)

  private val q175Sql: String =
    """WITH names AS (
      |  SELECT p_name, CAST(count(*) AS BIGINT) AS n FROM part GROUP BY 1
      |)
      |SELECT a.p_name AS name_a, b.p_name AS name_b, a.n AS n_a, b.n AS n_b,
      |       round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw,
      |       CAST(jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9 AS INTEGER)
      |         AS is_match
      |FROM names a JOIN names b ON a.p_name < b.p_name
      |ORDER BY name_a, name_b""".stripMargin

  // -------------------------------------------------------------- q184
  /** END-TO-END entity resolution: union the three fuzzy-evidence
    * channels the catalog already mines — token-blocked edit distance
    * (q101), sorted-neighborhood rank windows (q170), Jaro–Winkler
    * score matches (q175) — into one evidence graph over the name
    * dictionary, run the SHARED pointer-jumping component engine
    * ([[Components]], the same code q50/q57/q165 cluster with), and
    * emit every name with its resolved entity: the lexicographically
    * first member, the survivorship rule that needs no extra sort
    * because the dictionary ids ARE the lexicographic ranks (label =
    * min id ⇒ canonical = min name). Names with no fuzzy evidence
    * resolve to themselves.
    *
    * This is the composition the individual rows exist for: blocking
    * disciplines with complementary recall (typo-in-every-token ∈
    * q170 only; transpositions-heavy ∈ q175 only) feeding one
    * closure. Scale: every channel works on the DISTINCT dictionary
    * (q101's contraction note); the component rounds run on the tiny
    * evidence graph; row-level application is one broadcast of the
    * (name → entity) verdicts. */
  private[graft] def entityClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // distributed lexicographic dictionary rank (prefix-bucketed
    // two-phase prefix sum — no dictionary-global one-task window).
    // Stage-materialized: the resolution below references this frame
    // FIVE times (both edge endpoints, the label join, the canonical
    // join, the base), and each lineage-kept reference re-inlined the
    // whole two-phase rank tree — PlanCost measured q184 at 4.5 s of
    // driver planning around 0.5 s of executor CPU before this.
    val ids = graft.core.PersistedMemo.getOrBuildStage(spark, dir, "dedup:name-ids") {
      val names = Tables.part(spark, dir)
        .groupBy($"p_name").agg(count(lit(1)).as("n"))
      Ranks.withGlobalRankByPrefix(names, "p_name", rn = "nid", n = "__dn")
        .select($"p_name", $"n", $"nid")
    }
    // memoized like q172's kcore and curation's cc-labels: the
    // component engine is EAGER (pointer-jumping rounds execute at
    // construction), so an unmemoized call re-ran the three fuzzy
    // evidence channels plus the CC rounds on every invocation —
    // ~4.5 s of re-done work per q184 call at sf0.1 (PlanCost's plan
    // bucket, which absorbs eager construction-time jobs). Components'
    // freeze() output is already a LogicalRDD leaf, so the plain
    // lineage-keeping memo suffices.
    val labels = graft.core.PersistedMemo.getOrBuild(spark, dir, "dedup:er-labels") {
      val evidence = fuzzyNamePairs(spark, dir, maxDist = 2)
        .select($"name_a", $"name_b")
        .union(sortedNeighborhoodPairs(spark, dir, window = 10, maxDist = 2)
          .select($"name_a", $"name_b"))
        .union(jaroWinklerPairs(spark, dir, matchThreshold = 0.9)
          .filter($"is_match" === 1).select($"name_a", $"name_b"))
        .distinct()
      val edges = evidence
        .join(ids.select($"p_name".as("name_a"), $"nid".as("src")), "name_a")
        .join(ids.select($"p_name".as("name_b"), $"nid".as("dst")), "name_b")
        .select($"src", $"dst")
      Components.run(edges).labels // (doc_id, lbl), lbl = min nid
    }
    ids.join(labels, ids("nid") === labels("doc_id"), "left")
      .select($"p_name", $"n", coalesce($"lbl", $"nid").as("eid"))
      .join(ids.select($"nid".as("eid"), $"p_name".as("entity")), "eid")
      .select($"entity", $"p_name".as("member"), $"n".as("n_rows"),
        ($"p_name" === $"entity").cast("int").as("is_canonical"))
      .orderBy($"entity", $"member")
  }

  private def q184(spark: SparkSession, dir: String): DataFrame =
    entityClusters(spark, dir)

  /** Oracle: the three evidence predicates spelled definitionally over
    * all dictionary pairs (blocking only changes what gets CHECKED,
    * never the result set), closure by recursive CTE (q50's pattern);
    * nid is the lexicographic rank, so q170's rank window is a nid
    * difference. */
  private val q184Sql: String =
    """WITH RECURSIVE names AS (
      |  SELECT p_name, CAST(count(*) AS BIGINT) AS n FROM part GROUP BY 1
      |), ids AS (
      |  SELECT p_name, n,
      |         CAST(row_number() OVER (ORDER BY p_name) AS BIGINT) AS nid
      |  FROM names
      |), toks AS (
      |  SELECT DISTINCT p_name, tok FROM (
      |    SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM names)
      |), ev AS (
      |  SELECT a.nid AS src, b.nid AS dst
      |  FROM ids a JOIN ids b ON a.p_name < b.p_name
      |  WHERE (levenshtein(a.p_name, b.p_name) <= 2
      |         AND EXISTS (SELECT 1 FROM toks x JOIN toks y
      |                     ON x.tok = y.tok
      |                    AND x.p_name = a.p_name AND y.p_name = b.p_name))
      |     OR (b.nid - a.nid <= 10 AND levenshtein(a.p_name, b.p_name) <= 2)
      |     OR jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9
      |), edges AS (
      |  SELECT src, dst FROM ev UNION SELECT dst, src FROM ev
      |), reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      |), eid AS (
      |  SELECT i.nid, i.p_name, i.n,
      |         coalesce(least(i.nid, (SELECT min(dst) FROM reach r
      |                                WHERE r.src = i.nid)), i.nid) AS eid
      |  FROM ids i
      |)
      |SELECT c.p_name AS entity, e.p_name AS member, e.n AS n_rows,
      |       CAST(e.p_name = c.p_name AS INTEGER) AS is_canonical
      |FROM eid e JOIN ids c ON c.nid = e.eid
      |ORDER BY entity, member""".stripMargin

  // -------------------------------------------------------------- q170
  /** Sorted-neighborhood ER blocking (Hernández–Stolfo merge/purge):
    * rank the distinct name dictionary in ONE lexicographic order and
    * verify only pairs within `SnWindow` ranks of each other. The
    * complement of q101's token blocking — a typo inside EVERY token
    * leaves a pair with no shared blocking key, but near-identical
    * spellings still sort adjacently, so the neighborhood catches it;
    * ER systems run both disciplines and union the verified pairs.
    *
    * Scale design (100 TB): the rank-window join is spelled with q56's
    * bucketing discipline — block = rk / W, probe side exploded into
    * its ≤2 overlapping blocks, EQUI-join on block with the rank test
    * as residual — so per-task pair counts are bounded by 2W per name
    * and the plan never degenerates to a nested-loop cross product
    * (PlanSpec-locked). The dictionary rank itself is DISTRIBUTED
    * ([[Ranks.withGlobalRankByPrefix]] — prefix-bucketed local ranks +
    * broadcast offsets, the standard distributed merge/purge layout),
    * so no dictionary-global one-task window survives even when the
    * dictionary scales with the corpus. */
  private val SnWindow = 10

  private def q170(spark: SparkSession, dir: String): DataFrame =
    sortedNeighborhoodPairs(spark, dir, SnWindow, maxDist = 2)

  private val q170Sql: String =
    s"""WITH names AS (
       |  SELECT p_name, CAST(count(*) AS BIGINT) AS n FROM part GROUP BY 1
       |), ranked AS (
       |  SELECT p_name, n,
       |         CAST(row_number() OVER (ORDER BY p_name) AS BIGINT) AS rk
       |  FROM names
       |)
       |SELECT a.p_name AS name_a, b.p_name AS name_b,
       |       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
       |       b.rk - a.rk AS gap, a.n AS n_a, b.n AS n_b
       |FROM ranked a JOIN ranked b
       |  ON b.rk > a.rk AND b.rk <= a.rk + $SnWindow
       |WHERE levenshtein(a.p_name, b.p_name) <= 2
       |ORDER BY name_a, name_b""".stripMargin

  /** Facade core: sorted-neighborhood verified pairs with the window
    * and distance knobs open. */
  private[graft] def sortedNeighborhoodPairs(spark: SparkSession, dir: String,
      window: Int, maxDist: Int): DataFrame = {
    import spark.implicits._
    val names = Tables.part(spark, dir)
      .groupBy($"p_name").agg(count(lit(1)).cast("long").as("n"))
    // distributed lexicographic dictionary rank (prefix-bucketed
    // two-phase prefix sum — the documented production swap for the
    // dictionary-global one-task window; the oracle keeps the naive
    // row_number spelling as the parity proof)
    val ranked = Ranks.withGlobalRankByPrefix(names, "p_name",
        rn = "rk", n = "__dn")
      .select($"p_name", $"n", $"rk")
      .withColumn("blk", floor($"rk" / window))
    val probe = ranked.withColumn("jb", explode(array($"blk", $"blk" + 1)))
    probe.as("a").join(ranked.as("b"),
        $"a.jb" === $"b.blk" &&
          $"b.rk" > $"a.rk" && $"b.rk" <= $"a.rk" + window)
      .select($"a.p_name".as("name_a"), $"b.p_name".as("name_b"),
        ($"b.rk" - $"a.rk").as("gap"), $"a.n".as("n_a"), $"b.n".as("n_b"))
      .withColumn("dist", levenshtein($"name_a", $"name_b", maxDist))
      .filter($"dist" >= 0)
      .select($"name_a", $"name_b", $"dist".cast("int").as("dist"),
        $"gap", $"n_a", $"n_b")
      .orderBy($"name_a", $"name_b")
  }

  // -------------------------------------------------------------- q155
  /** Intra-corpus duplicated-SPAN accounting (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): for
    * EVERY document, how many of its tokens sit inside an 8-gram window
    * that also occurs verbatim in ANOTHER document. Doc-level dedup
    * (q23-q27) removes whole near-copies; this measures the partial
    * overlap they leave behind — boilerplate headers, quoted passages,
    * syndicated paragraphs — as per-doc (dup_grams, merged spans,
    * dup_tokens, dup_frac). q98 is the same span algebra pointed at an
    * external eval set; this is the corpus pointed at itself.
    *
    * Cross-doc test is `min(doc_id) ≠ max(doc_id)` per gram — two exact
    * integer extremes riding the gram-keyed aggregate, never a
    * count(distinct) expansion. Islands merge per doc via gaps-and-
    * islands on covered token indices (q98's pattern).
    *
    * Scale shape: positional grams are per-row array algebra; the gram
    * table shuffles keyed by gram (the width a shingle pass already
    * carries — and the positional explode feeds BOTH the dup-gram
    * aggregate and the match join, so a production pipeline persists it
    * between the two consumers exactly like the q24 signature table);
    * matched positions and the islands window shuffle keyed by doc_id;
    * covered-index expansion is bounded by 8 × matches. The final
    * report left-joins summaries onto the full corpus so CLEAN docs
    * appear with zeros — the accounting must enumerate everything it
    * kept, not only what it would cut. */
  private def q155(spark: SparkSession, dir: String): DataFrame =
    dupSpans(spark, dir, DecontamN)

  /** q155's core with the gram-width knob open ([[graft.Graft.dupSpans]]):
    * wider grams = stricter "duplicated" (longer verbatim runs only),
    * narrower = more sensitive. */
  private[graft] def dupSpans(spark: SparkSession, dir: String, w: Int): DataFrame = {
    import spark.implicits._
    require(w >= 2 && w <= 64, s"need 2 <= gram width <= 64 (got $w)")
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", Portable.tokens($"text").as("t"))
    // positional w-grams, 0-based start (q98's expression, all docs)
    val pg = docs
      .filter(size($"t") >= w)
      .select($"doc_id", explode(expr(
        s"transform(sequence(0, size(t)-$w), i -> " +
          s"named_struct('pos', i, 'g', array_join(slice(t, i+1, $w), ' ')))"))
        .as("pg"))
      .select($"doc_id", $"pg.pos".as("pos"), $"pg.g".as("g"))
    val dup = pg.groupBy($"g")
      .agg(min($"doc_id").as("d0"), max($"doc_id").as("d1"))
      .where($"d0" =!= $"d1")
      .select($"g")
    val matched = pg.join(dup, Seq("g"))
    val dupGrams = matched.groupBy($"doc_id").agg(count(lit(1)).as("dup_grams"))
    val covered = matched
      .select($"doc_id", explode(sequence($"pos", $"pos" + (w - 1))).as("idx"))
      .distinct()
    val wi = Window.partitionBy($"doc_id").orderBy($"idx")
    val spans = covered
      .withColumn("grp", $"idx" - row_number().over(wi))
      .groupBy($"doc_id")
      .agg(countDistinct($"grp").as("n_spans"), count(lit(1)).as("dup_tokens"))
    docs
      .join(dupGrams, Seq("doc_id"), "left_outer")
      .join(spans, Seq("doc_id"), "left_outer")
      .select(
        $"doc_id",
        size($"t").as("n_tokens"),
        greatest(size($"t") - (w - 1), lit(0)).as("n_grams"),
        coalesce($"dup_grams", lit(0L)).as("dup_grams"),
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        coalesce($"dup_tokens", lit(0L)).as("dup_tokens"),
        // raw quotient, never rounded (single IEEE divide — q65's rule)
        (coalesce($"dup_tokens", lit(0L)).cast("double") / size($"t")).as("dup_frac"))
      .orderBy($"doc_id")
  }

  private val q155Sql: String =
    s"""WITH toks2 AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
       |), pg AS (
       |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |         array_to_string(list_slice(t, i, i + ${DecontamN - 1}), ' ') AS g
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${DecontamN - 1})) AS i
       |        FROM toks2 WHERE len(t) >= $DecontamN)
       |), dup AS (
       |  SELECT g
       |  FROM (SELECT g, min(doc_id) AS d0, max(doc_id) AS d1 FROM pg GROUP BY g)
       |  WHERE d0 <> d1
       |), m AS (
       |  SELECT pg.doc_id, pg.pos FROM pg JOIN dup USING (g)
       |), dg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_grams FROM m GROUP BY 1
       |), covered AS (
       |  SELECT DISTINCT m.doc_id, CAST(u.idx AS INTEGER) AS idx
       |  FROM m, unnest(generate_series(m.pos, m.pos + ${DecontamN - 1})) AS u(idx)
       |), isl AS (
       |  SELECT doc_id, idx,
       |         idx - CAST(row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS INTEGER) AS grp
       |  FROM covered
       |), sp AS (
       |  SELECT doc_id, CAST(count(DISTINCT grp) AS BIGINT) AS n_spans,
       |         CAST(count(*) AS BIGINT) AS dup_tokens
       |  FROM isl GROUP BY 1
       |)
       |SELECT d.doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
       |       CAST(greatest(len(t) - ${DecontamN - 1}, 0) AS INTEGER) AS n_grams,
       |       COALESCE(dg.dup_grams, 0) AS dup_grams,
       |       COALESCE(sp.n_spans, 0) AS n_spans,
       |       COALESCE(sp.dup_tokens, 0) AS dup_tokens,
       |       CAST(COALESCE(sp.dup_tokens, 0) AS DOUBLE) / len(t) AS dup_frac
       |FROM toks2 d
       |LEFT JOIN dg USING (doc_id)
       |LEFT JOIN sp USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q159
  /** Winnowed fingerprint index (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS algorithm): hash every 5-gram, slide a 4-hash window,
    * and keep only each window's minimum hash (ties to the RIGHTMOST
    * position). The selected (position, hash) set is ~2/(w+1) ≈ 40 %
    * of the gram table with a hard guarantee: any shared token run of
    * length ≥ w+k−1 = 8 spans a full window in both documents, so
    * both select its minimum — every match q155's exhaustive gram
    * table would find at 8-gram granularity is still DETECTED from
    * fingerprints alone. This is the scale path for span-level dedup:
    * the cross-doc join runs over the winnowed index, not every gram.
    *
    * Shape: gram hashing is per-row algebra; selection is one
    * doc-keyed window pass (min-of-struct (hash, −pos) over a w-row
    * frame — the rightmost-min tiebreak as a single lexicographic
    * min), then a distinct. Integer-exact end to end (portable md5
    * hash, no floats), so the index is bit-identical on both engines
    * and across partitionings. */
  private val WinK = 5 // gram width
  private val WinW = 4 // window width (hashes per window)

  /** One winnowed fingerprint row. */
  final case class WinnowFp(doc_id: Long, pos: Int, fp: Long)

  /** Winnowed (doc_id, pos, fp) fingerprints of any (doc_id, text)
    * frame — factored out so the spec can prove the detection
    * guarantee on constructed documents.
    *
    * Selection is doc-LOCAL, so it runs as a `mapPartitions` Scala
    * loop at scan speed: no shuffle, no window state, and because it
    * is a stateless typed map it is a legal STREAMING stage — the
    * per-shard index append is this same function (ScrubSpec proves
    * stream ≡ batch bit-for-bit). This is the catalog's one justified
    * per-partition imperative operator besides media decode: the
    * column-algebra spellings were measured pathological — a window
    * pass shuffles every gram by doc_id for logic that never leaves
    * the row, and the HOF spelling (nested transform/IF over a hash
    * array) exploded past the codegen threshold into interpreted
    * eval that re-split the text per gram × window (~200 s for 500
    * docs; this loop: milliseconds). The hash is the same portable
    * md5-prefix as [[Portable.hash32]], byte-for-byte, which is what
    * keeps the DuckDB oracle twin exact. */
  private[graft] def winnowFingerprints(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          // limit -1 matches Spark's split(col, regex) semantics
          val t = text.split("\\s+", -1)
          val nG = t.length - WinK + 1
          // a complete w-hash window needs k+w−1 tokens; shorter docs
          // select nothing (the truncated-window rule)
          if (nG < WinW) Iterator.empty
          else {
            val hs = Array.tabulate(nG) { i =>
              val g = t.slice(i, i + WinK).mkString(" ")
              val d = md.digest(g.getBytes("UTF-8"))
              java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
            }
            val sel = collection.mutable.LinkedHashSet.empty[Int]
            var s = 0
            while (s <= nG - WinW) {
              // rightmost minimum of the window: <= with ascending p
              var best = s
              var p = s + 1
              while (p < s + WinW) {
                if (hs(p) <= hs(best)) best = p
                p += 1
              }
              sel += best
              s += 1
            }
            sel.iterator.map(p => WinnowFp(id, p, hs(p)))
          }
        }
      }
      .toDF()
  }

  /** Memoized corpus fingerprint index — q159 dumps it, q160 joins it;
    * a production pipeline persists exactly this table and appends to
    * it per shard (selection is stateless per doc). */
  private[graft] def winnowIndex(spark: SparkSession, dir: String): DataFrame =
    graft.core.PersistedMemo.getOrBuild(spark, dir, "dedup:winnow") {
      import spark.implicits._
      winnowFingerprints(Tables.documents(spark, dir).select($"doc_id", $"text"))
    }

  private def q159(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    winnowIndex(spark, dir).orderBy($"doc_id", $"pos")
  }

  // -------------------------------------------------------------- q160
  /** Winnowed match pairs — the MOSS detector's second half: join the
    * fingerprint index on hash value, count DISTINCT shared
    * fingerprints per doc pair, keep pairs sharing ≥ 2 (one shared
    * 32-bit value can be a hash collision; two is a span signal).
    * This is q155's span detection at ~40 % of the gram volume and
    * with the same pigeonhole economics as MinHash banding (q25): the
    * join is an equi-join on fp, cost Σ bucket², never all-pairs —
    * and the guarantee says any ≥ 8-token shared run still surfaces.
    *
    * Shape: the (doc, fp) projection contracts the index before the
    * self-join; the pair aggregate keys on (doc_a, doc_b). At 100 TB
    * the fp join inherits the q25 skew discipline: a boilerplate
    * fingerprint shared by thousands of docs is exactly a hot LSH
    * bucket — cap or drop stop-fingerprints by document frequency
    * (they carry no pair information, like stopwords). */
  private def q160(spark: SparkSession, dir: String): DataFrame =
    winnowedPairs(spark, dir, minShared = 2)

  /** q160's core with the evidence threshold open
    * ([[graft.Graft.winnowedPairs]]): raise `minShared` to demand more
    * shared fingerprints per reported pair. */
  private[graft] def winnowedPairs(spark: SparkSession, dir: String,
      minShared: Int): DataFrame = {
    import spark.implicits._
    require(minShared >= 1, s"need minShared >= 1 (got $minShared)")
    val dfp = winnowIndex(spark, dir).select($"doc_id", $"fp").distinct()
    dfp.as("a").join(dfp.as("b"), Seq("fp"))
      .where($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("shared_fps"))
      .where($"shared_fps" >= minShared)
      .orderBy($"doc_a", $"doc_b")
  }

  private val q160Sql: String =
    s"""WITH toksw AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
       |), pgw AS (
       |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |         ${Portable.hash32Sql(s"array_to_string(list_slice(t, i, i + ${WinK - 1}), ' ')")} AS h
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${WinK - 1})) AS i
       |        FROM toksw WHERE len(t) >= $WinK)
       |), wm AS (
       |  SELECT doc_id, pos AS s,
       |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |                      ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS mh,
       |         count(*) OVER (PARTITION BY doc_id ORDER BY pos
       |                        ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS cnt
       |  FROM pgw
       |), dfp AS (
       |  SELECT DISTINCT doc_id, mh AS fp FROM wm WHERE cnt = $WinW
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(count(*) AS BIGINT) AS shared_fps
       |FROM dfp a JOIN dfp b ON b.fp = a.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING count(*) >= 2
       |ORDER BY doc_a, doc_b""".stripMargin

  private val q159Sql: String =
    s"""WITH toksw AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
       |), pgw AS (
       |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |         ${Portable.hash32Sql(s"array_to_string(list_slice(t, i, i + ${WinK - 1}), ' ')")} AS h
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${WinK - 1})) AS i
       |        FROM toksw WHERE len(t) >= $WinK)
       |), wm AS (
       |  SELECT doc_id, pos AS s,
       |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |                      ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS mh,
       |         count(*) OVER (PARTITION BY doc_id ORDER BY pos
       |                        ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS cnt
       |  FROM pgw
       |), fps AS (
       |  SELECT w.doc_id, w.s, w.mh AS fp, max(g.pos) AS pos
       |  FROM wm w
       |  JOIN pgw g ON g.doc_id = w.doc_id
       |             AND g.pos BETWEEN w.s AND w.s + ${WinW - 1}
       |             AND g.h = w.mh
       |  WHERE w.cnt = $WinW
       |  GROUP BY w.doc_id, w.s, w.mh
       |)
       |SELECT DISTINCT doc_id, pos, fp
       |FROM fps
       |ORDER BY doc_id, pos""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q23_dedup_exact", q23, Some(q23Sql)),
    Q("q24_minhash_signatures", q24, Some(q24Sql)),
    Q("q25_minhash_lsh_pairs", q25, Some(q25Sql)),
    Q("q26_ngram_jaccard", q26, Some(q26Sql)),
    Q("q211_dedup_threshold_sweep", q211, Some(q211Sql)),
    Q("q168_containment_audit", q168, Some(q168Sql)),
    Q("q27_simhash", q27, Some(q27Sql)),
    Q("q57_incremental_dedup", q57, Some(q57Sql)),
    Q("q58_decontamination", q58, Some(q58Sql)),
    Q("q60_simhash_hamming_pairs", q60, Some(q60Sql)),
    Q("q65_exact_decontamination", q65, Some(q65Sql)),
    Q("q90_ngram_novelty", q90, Some(q90Sql)),
    Q("q92_source_signatures", q92, Some(q92Sql)),
    Q("q98_contamination_spans", q98, Some(q98Sql)),
    Q("q101_fuzzy_match", q101, Some(q101Sql)),
    Q("q175_jaro_winkler", q175, Some(q175Sql)),
    Q("q184_entity_resolution", q184, Some(q184Sql)),
    Q("q170_sorted_neighborhood", q170, Some(q170Sql)),
    Q("q155_dup_spans", q155, Some(q155Sql)),
    Q("q159_winnowing", q159, Some(q159Sql)),
    Q("q160_winnow_pairs", q160, Some(q160Sql)),
  )
}
