package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Portable
import graft.sources.Tables

/** Dataset-curation operators — the steps a training-data pipeline runs
  * AFTER near-dup mining to turn raw corpus + duplicate pairs into a
  * training set: duplicate-cluster resolution (q50), deterministic
  * split assignment (q51), and TF-IDF term salience (q52). The
  * reference has no corpus layer (lambda-sample is a sensor engine);
  * these extend the same oracle-checked catalog surface as
  * [[Dedup]]/[[TextAnalysis]].
  *
  * Scale design (100 TB):
  *  - q50's label propagation is the distributed connected-components
  *    loop: each iteration is one equi-join + one min-aggregate on the
  *    edge list, iterations bounded by component diameter (near-dup
  *    clusters are shallow — dupes of one document). The driver sees
  *    only a convergence COUNT per iteration, never rows. At extreme
  *    scale the same loop body becomes alternating large-star/
  *    small-star (Kiveris et al.) — identical join shape, fewer rounds.
  *  - q51 is a stateless map: split assignment must be a pure function
  *    of the stable document key (never `rand()`), so re-runs,
  *    backfills and late-arriving shards land in the same split on any
  *    engine — the md5-derived bucket is that function.
  *  - q52 is two hash-aggregates (term frequency, document frequency)
  *    + a broadcast of the 1-row corpus count; shuffle width = #terms.
  */
object Curation extends DetRounding {

  // --------------------------------------------------------------- q50
  /** Duplicate-cluster resolution: connected components over the LSH
    * candidate pairs (q25's output, shared persisted table), labeling
    * every involved document with the min doc_id of its component —
    * the canonical "keeper" — so `is_keeper = 0` rows are exactly the
    * documents a dedup pass drops. Min-label propagation to fixpoint;
    * each round persists its labels and unpersists the previous so
    * lineage stays flat. */
  private def q50(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the labels table is itself a shared persisted intermediate (q57's
    // incremental path consumes it as "the prior run's clusters"), so it
    // is memoized like the signature/candidate tables — repeated calls
    // reuse it and PersistedMemo owns unpersist/release. The loop's
    // per-round caches are dropped inside Components.run.
    val labels = clusterLabels(spark, dir)
    labels.select(
        $"doc_id",
        $"lbl".as("cluster_id"),
        ($"doc_id" === $"lbl").cast("int").as("is_keeper"))
      .orderBy($"doc_id")
  }

  /** Memoized component labels over the LSH candidate graph: `(doc_id,
    * lbl)` for every doc incident to a candidate edge. Convergence
    * telemetry is surfaced (rounds logged; non-convergence THROWS inside
    * [[Components.run]] rather than returning partial labels). */
  private[operators] def clusterLabels(spark: SparkSession, dir: String): DataFrame =
    graft.core.PersistedMemo.getOrBuild(spark, dir, "curation:cc-labels") {
      import spark.implicits._
      val cands = Dedup.lshCandidates(spark, dir)
      val r = Components.run(cands.select($"doc_a".as("src"), $"doc_b".as("dst")))
      System.err.println(
        s"[graft] q50 connected components converged in ${r.rounds} rounds ($dir)")
      // hand the persisted frame to the memo; its persist() is a no-op
      // on the already-cached frame
      r.labels
    }

  /** Oracle: transitive closure by recursive CTE (fine at oracle scale;
    * the Spark side is the distributed form). Component label = min over
    * self and everything reachable. */
  private val q50Sql: String =
    s"""WITH RECURSIVE ${Dedup.lshCandidatesCte}, edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM cands
       |  UNION
       |  SELECT doc_b, doc_a FROM cands
       |), reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |)
       |SELECT src AS doc_id,
       |       CAST(least(src, min(dst)) AS BIGINT) AS cluster_id,
       |       CAST(src = least(src, min(dst)) AS INTEGER) AS is_keeper
       |FROM reach
       |GROUP BY src
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q51
  /** Deterministic train/val/test split (80/10/10): bucket = portable
    * md5 hash of the document key mod 100. A pure function of doc_id —
    * stable under re-runs, engine changes, and data arrival order,
    * which `rand()`-based splitting is not. */
  /** The split bucket as a pure function of the document key — shared
    * with q57, whose old-corpus/new-batch partition IS this split
    * (train+val = the indexed corpus, test = the incoming shard). */
  private[graft] def splitBucket(doc: Column): Column =
    Portable.hash32(concat(doc.cast("string"), lit("#graft-split"))) % 100

  private[operators] def splitBucketSql(keyExpr: String): String =
    s"${Portable.hash32Sql(s"CAST($keyExpr AS VARCHAR) || '#graft-split'")} % 100"

  /** Demo per-source mix weight (∝ trailing source index + 1; digit-free
    * sources weigh 1) — ONE definition shared by q67 (rebalance targets)
    * and q70 (interleave rates), so "q70 mirrors q67's weights" is held
    * by the compiler, not by convention. */
  private[graft] def sourceWeight(source: Column): Column =
    coalesce(regexp_extract(source, "(\\d+)", 1).cast("long"), lit(0L)) + 1L

  private[graft] def sourceWeightSql(expr: String): String =
    s"COALESCE(TRY_CAST(regexp_extract($expr, '(\\d+)', 1) AS BIGINT), 0) + 1"

  /** Split name from a document key — q51's 80/10/10 bucketing as ONE
    * shared expression (q51, q77, [[materializeCurated]]). */
  private[graft] def splitName(key: Column): Column = {
    val b = splitBucket(key)
    when(b < 80, lit("train")).when(b < 90, lit("val")).otherwise(lit("test"))
  }

  private def q51(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        splitBucket($"doc_id").as("h_bucket"),
        splitName($"doc_id").as("split"))
      .orderBy($"doc_id")
  }

  private val q51Sql: String = {
    val bucket = splitBucketSql("doc_id")
    s"""SELECT doc_id,
       |       $bucket AS h_bucket,
       |       CASE WHEN $bucket < 80 THEN 'train'
       |            WHEN $bucket < 90 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q52
  /** Top-3 TF-IDF terms per document: tf × ln((N+1)/(df+1)), ranked on
    * the rounded score with a term tiebreak (ln is the one libm call in
    * the catalog — the 6 dp ranking guard and 4 dp output absorb any
    * ulp divergence between engines, same policy as the cosine
    * queries). */
  private def q52(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select($"doc_id", explode(Portable.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    // df as a count-over-window on the tf aggregate, NOT a second
    // aggregate branch: referencing `tf` twice makes Catalyst replay
    // the whole scan→explode→aggregate chain (column pruning
    // specializes the copies, so ReusedExchange never fires) — at
    // 100 TB that is two corpus reads. The window reshuffles only the
    // already-aggregated (doc, term) rows by term.
    val df = count(lit(1)).over(Window.partitionBy($"term"))
    val n = docs.agg(countDistinct($"doc_id").as("n"))
    val scored = tf.withColumn("df", df).crossJoin(broadcast(n))
      .withColumn("tfidf", $"tf" * log(($"n" + lit(1.0)) / ($"df" + lit(1.0))))
    val w = Window.partitionBy($"doc_id").orderBy(round($"tfidf", 6).desc, $"term".asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"doc_id", $"term", round($"tfidf", 4).as("tfidf"), $"rnk")
      .orderBy($"doc_id", $"rnk")
  }

  private val q52Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
      |), dfq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT count(DISTINCT doc_id) AS n FROM documents
      |), scored AS (
      |  SELECT t.doc_id, t.term, t.tf * ln((n.n + 1.0) / (d.df + 1.0)) AS tfidf
      |  FROM tf t JOIN dfq d USING (term) CROSS JOIN n
      |)
      |SELECT doc_id, term, round(tfidf, 4) AS tfidf, CAST(rnk AS INTEGER) AS rnk
      |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |                                   ORDER BY round(tfidf, 6) DESC, term ASC) AS rnk
      |      FROM scored) s
      |WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  // --------------------------------------------------------------- q53
  /** Deterministic stratified sampling: per-stratum rates applied by
    * portable hash threshold — the balanced-subsampling step a pipeline
    * runs to reweight event classes. Stateless map (no shuffle beyond
    * the presentation sort), a pure function of the row key: re-runs
    * and engines agree row-for-row, which `TABLESAMPLE`/`rand()` never
    * guarantees. */
  private def q53(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = Portable.hash32(concat($"event_id".cast("string"), lit("#graft-strat"))) % 1000
    val keepBelow = when($"event_type" === "click", lit(200))
      .when($"event_type" === "view", lit(200))
      .when($"event_type" === "error", lit(100))
      .otherwise(lit(1000)) // purchase/signup kept whole
    Tables.events(spark, dir)
      .filter(bucket < keepBelow)
      .select($"event_id", $"event_type", $"user_id")
      .orderBy($"event_id")
  }

  private val q53Sql: String = {
    val bucket =
      s"${Portable.hash32Sql("CAST(event_id AS VARCHAR) || '#graft-strat'")} % 1000"
    s"""SELECT event_id, event_type, user_id
       |FROM events
       |WHERE $bucket < CASE event_type
       |                  WHEN 'click' THEN 200
       |                  WHEN 'view' THEN 200
       |                  WHEN 'error' THEN 100
       |                  ELSE 1000 END
       |ORDER BY event_id""".stripMargin
  }

  // --------------------------------------------------------------- q54
  /** Sketch-based quantile profiling: approx_percentile quartiles of
    * lineitem quantity per return flag. Like q39's HLL, the sketch
    * estimate is engine-specific — the raw value can never be hashed.
    * Round-5 oracle upgrade (q39's pattern): the sketch still runs,
    * and the query verifies IN-QUERY that each estimate's actual RANK
    * sits within the sketch's guarantee (rank error ≤ n/accuracy, +1
    * slack for the ≤-vs-< rank convention) — one broadcast of the
    * 3-values-per-group estimates back over the scan, one counting
    * aggregate. Emitted: the EXACT quartiles (q17's interpolating
    * percentile, 4 dp) plus the three in-bound verdicts; the oracle
    * recomputes the exacts and asserts the verdicts as literal 1, so
    * an out-of-guarantee sketch breaks the hash. At 100 TB the
    * production form ships the sketch alone (fixed-size mergeable
    * state vs q17's per-group sort); the gate proves the machinery. */
  private def q54(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_returnflag", $"l_quantity")
    val approx = li.groupBy($"l_returnflag")
      .agg(expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 10000)")
        .as("aq"))
      .select($"l_returnflag", $"aq".getItem(0).as("a1"),
        $"aq".getItem(1).as("a2"), $"aq".getItem(2).as("a3"))
    // ties: the returned value occupies the whole rank interval
    // [count(<v)+1, count(≤v)] — the guarantee holds if that interval
    // touches [p·n − εn, p·n + εn] (integer quantities are heavily
    // tied, so a single-rank check would flag legitimate estimates)
    def inBound(lo: Column, hi: Column, p: Double): Column = {
      val tol = $"n" / 10000.0 + 1.0
      // `lo` aggregates count(<v); the interval's lower END is lo+1 —
      // the +1 keeps the test faithful to the stated rank interval
      (lo + 1.0 <= $"n" * p + tol && hi >= $"n" * p - tol).cast("int")
    }
    li.join(broadcast(approx), "l_returnflag")
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        percentile($"l_quantity", lit(0.25)).as("p25"),
        percentile($"l_quantity", lit(0.5)).as("p50"),
        percentile($"l_quantity", lit(0.75)).as("p75"),
        sum(($"l_quantity" < $"a1").cast("long")).cast("double").as("lo1"),
        sum(($"l_quantity" < $"a2").cast("long")).cast("double").as("lo2"),
        sum(($"l_quantity" < $"a3").cast("long")).cast("double").as("lo3"),
        sum(($"l_quantity" <= $"a1").cast("long")).cast("double").as("hi1"),
        sum(($"l_quantity" <= $"a2").cast("long")).cast("double").as("hi2"),
        sum(($"l_quantity" <= $"a3").cast("long")).cast("double").as("hi3"))
      .select($"l_returnflag",
        round($"p25", 4).as("q1"),
        round($"p50", 4).as("median"),
        round($"p75", 4).as("q3"),
        inBound($"lo1", $"hi1", 0.25).as("q1_in_bound"),
        inBound($"lo2", $"hi2", 0.5).as("median_in_bound"),
        inBound($"lo3", $"hi3", 0.75).as("q3_in_bound"))
      .orderBy($"l_returnflag")
  }

  private val q54Sql: String =
    """SELECT l_returnflag,
      |       round(quantile_cont(l_quantity, 0.25), 4) AS q1,
      |       round(quantile_cont(l_quantity, 0.5), 4) AS median,
      |       round(quantile_cont(l_quantity, 0.75), 4) AS q3,
      |       CAST(1 AS INTEGER) AS q1_in_bound,
      |       CAST(1 AS INTEGER) AS median_in_bound,
      |       CAST(1 AS INTEGER) AS q3_in_bound
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- q61
  /** Training-mix accounting: documents and whitespace tokens per
    * (split, source) with each cell's share of the total token budget —
    * the "what does my mix actually contain" report every training run
    * starts from (and the input to up/down-weighting decisions).
    *
    * Scale shape: one pruned corpus scan, per-row token count (size of
    * the split array — no explode), partial+final hash-aggregate to
    * #splits × #sources cells, then a window total over those few cells.
    * Shares are bigint/bigint divides of identical operands —
    * bit-identical, no rounding. */
  private def q61(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = splitBucket($"doc_id")
    val cells = Tables.documents(spark, dir)
      .select(
        when(bucket < 80, lit("train"))
          .when(bucket < 90, lit("val"))
          .otherwise(lit("test")).as("split"),
        $"source",
        size(graft.functions.Portable.tokens($"text")).cast("long").as("n_tok"))
      .groupBy($"split", $"source")
      .agg(count(lit(1)).as("docs"), sum($"n_tok").as("tokens"))
    cells
      .withColumn("token_share",
        $"tokens".cast("double") / sum($"tokens").over(Window.partitionBy()))
      .orderBy($"split", $"source")
  }

  private val q61Sql: String = {
    val bucket = splitBucketSql("doc_id")
    s"""WITH cells AS (
       |  SELECT CASE WHEN $bucket < 80 THEN 'train'
       |              WHEN $bucket < 90 THEN 'val'
       |              ELSE 'test' END AS split,
       |         source,
       |         count(*) AS docs,
       |         sum(len(string_split_regex(text, '\\s+'))) AS tokens
       |  FROM documents
       |  GROUP BY 1, 2
       |)
       |SELECT split, source, CAST(docs AS BIGINT) AS docs,
       |       CAST(tokens AS BIGINT) AS tokens,
       |       CAST(tokens AS DOUBLE) / sum(tokens) OVER () AS token_share
       |FROM cells
       |ORDER BY split, source""".stripMargin
  }

  // --------------------------------------------------------------- q66
  /** Curation-funnel accounting: the per-stage survival report every
    * corpus release publishes (C4/Gopher/RefinedWeb all report theirs) —
    * ingested → min-length → near-dup keeper (q50's clusters) →
    * repetition filter (q59) → quality floor (q32), with docs in/out,
    * dropped, per-stage pass fraction and cumulative survival.
    *
    * The stage predicates are THE stage queries' own shared column
    * expressions ([[TextAnalysis.qualityExpr]]/
    * [[TextAnalysis.repetitionFlagExpr]], [[clusterLabels]]) — one
    * formula, two consumers — so the funnel can never drift from what
    * the stages actually compute.
    *
    * Scale shape: ALL per-row flags evaluate in ONE corpus scan (the
    * shared expressions compose map-side; PlanSpec asserts the single
    * scan and the absence of any stage-frame join), plus a left join
    * against the (small) non-keeper set; the whole funnel then
    * collapses to ONE 5-long aggregate row before exploding to stage
    * rows — no per-stage rescans, no driver loop. At 100 TB a pipeline
    * materializes each stage's survivors anyway; this query is the
    * accounting pass over the flags at the cost of a single scan. */
  private val MinTokens = 20
  // 0.4 sits inside the survivor distribution on every tier (median
  // ~0.39 after the repetition stage), so the final stage discriminates
  // instead of degenerating to keep-all or drop-all
  private val QualityFloor = 0.4

  private def q66(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ALL per-row stage predicates evaluate in ONE corpus scan via the
    // shared column expressions (qualityExpr / repetitionFlagExpr are
    // the q32/q59 formulas themselves) — joining the stage FRAMES here
    // would re-scan the corpus per stage and shuffle it on doc_id
    // twice. The only join is against the non-keeper set (already a
    // memoized cached table from q50's component labels).
    val nonKeepers = clusterLabels(spark, dir)
      .filter($"doc_id" =!= $"lbl")
      .select($"doc_id", lit(1).as("is_dup"))
    val flags = Tables.documents(spark, dir)
      .withColumn("t", graft.functions.Portable.tokens($"text"))
      .select(
        $"doc_id",
        (size($"t") >= MinTokens).cast("long").as("f_len"),
        (lit(1) - TextAnalysis.repetitionFlagExpr($"t")).cast("long").as("f_rep"),
        (TextAnalysis.qualityExpr($"text", $"t") >= QualityFloor).cast("long").as("f_q"))
      .join(nonKeepers, Seq("doc_id"), "left_outer")
      .select($"f_len", $"is_dup".isNull.cast("long").as("f_uniq"), $"f_rep", $"f_q")
    flags
      .agg(
        count(lit(1)).as("total"),
        sum($"f_len").as("c1"),
        sum($"f_len" * $"f_uniq").as("c2"),
        sum($"f_len" * $"f_uniq" * $"f_rep").as("c3"),
        sum($"f_len" * $"f_uniq" * $"f_rep" * $"f_q").as("c4"))
      // stage rows via explode(array(struct(...))) — ONE evaluation of
      // the aggregate row fanned to 5 rows. NOT stack(): a stack() here
      // measured 18 s against this 0.09 s aggregate (it re-executes the
      // upstream flag stage many times over); the explode form is 0.1 s.
      .select(explode(array(
        struct(lit(0).as("stage_idx"), lit("ingested").as("stage"),
          $"total".as("docs_in"), $"total".as("docs_out")),
        struct(lit(1).as("stage_idx"), lit("min_length").as("stage"),
          $"total".as("docs_in"), $"c1".as("docs_out")),
        struct(lit(2).as("stage_idx"), lit("near_dup").as("stage"),
          $"c1".as("docs_in"), $"c2".as("docs_out")),
        struct(lit(3).as("stage_idx"), lit("repetition").as("stage"),
          $"c2".as("docs_in"), $"c3".as("docs_out")),
        struct(lit(4).as("stage_idx"), lit("quality").as("stage"),
          $"c3".as("docs_in"), $"c4".as("docs_out")))).as("s"), $"total")
      .select($"s.stage_idx", $"s.stage", $"s.docs_in", $"s.docs_out", $"total")
      .select(
        $"stage_idx".cast("int").as("stage_idx"),
        $"stage",
        $"docs_in".cast("long").as("docs_in"),
        $"docs_out".cast("long").as("docs_out"),
        ($"docs_in" - $"docs_out").cast("long").as("dropped"),
        when($"docs_in" === 0, lit(null).cast("double"))
          .otherwise($"docs_out".cast("double") / $"docs_in").as("pass_frac"),
        ($"docs_out".cast("double") / $"total").as("cum_frac"))
      .orderBy($"stage_idx")
  }

  private val q66Sql: String =
    s"""WITH qf AS (
       |  SELECT doc_id, n_tokens, quality FROM (${TextAnalysis.qualitySql})
       |), rf AS (
       |  SELECT doc_id, is_repetitive FROM (${TextAnalysis.repetitionSql})
       |), dups AS (
       |  SELECT doc_id FROM ($q50Sql) WHERE is_keeper = 0
       |), flags AS (
       |  SELECT CAST(qf.n_tokens >= $MinTokens AS BIGINT) AS f_len,
       |         CASE WHEN dups.doc_id IS NULL THEN 1 ELSE 0 END AS f_uniq,
       |         1 - rf.is_repetitive AS f_rep,
       |         CAST(qf.quality >= $QualityFloor AS BIGINT) AS f_q
       |  FROM qf
       |  JOIN rf ON qf.doc_id = rf.doc_id
       |  LEFT JOIN dups ON qf.doc_id = dups.doc_id
       |), c AS (
       |  SELECT count(*) AS total,
       |         sum(f_len) AS c1,
       |         sum(f_len * f_uniq) AS c2,
       |         sum(f_len * f_uniq * f_rep) AS c3,
       |         sum(f_len * f_uniq * f_rep * f_q) AS c4
       |  FROM flags
       |), s AS (
       |  SELECT 0 AS stage_idx, 'ingested' AS stage, total AS docs_in, total AS docs_out, total FROM c
       |  UNION ALL SELECT 1, 'min_length', total, c1, total FROM c
       |  UNION ALL SELECT 2, 'near_dup', c1, c2, total FROM c
       |  UNION ALL SELECT 3, 'repetition', c2, c3, total FROM c
       |  UNION ALL SELECT 4, 'quality', c3, c4, total FROM c
       |)
       |SELECT stage_idx, stage,
       |       CAST(docs_in AS BIGINT) AS docs_in,
       |       CAST(docs_out AS BIGINT) AS docs_out,
       |       CAST(docs_in - docs_out AS BIGINT) AS dropped,
       |       CASE WHEN docs_in = 0 THEN NULL
       |            ELSE CAST(docs_out AS DOUBLE) / docs_in END AS pass_frac,
       |       CAST(docs_out AS DOUBLE) / total AS cum_frac
       |FROM s
       |ORDER BY stage_idx""".stripMargin

  // --------------------------------------------------------------- q67
  /** Target-mix rebalancing: given per-source target weights, compute
    * the deterministic per-source keep rate that realizes the largest
    * corpus matching the target mix (LLaMA/Pile-style domain
    * up/down-sampling), then apply it with the same hash-threshold
    * sampling as q51/q53. Weights here are ∝ (source index + 1) — a
    * deliberately non-uniform demonstration target; production swaps
    * the `w_raw` expression for its weight table.
    *
    * The budget is the water-filling solution: T = min_s(tokens_s /
    * share_s) is the largest total token count for which every source
    * can supply its share without upsampling; the binding source keeps
    * rate exactly 1. Emits per source: inventory, target share, keep
    * rate, realized docs/tokens, realized share.
    *
    * Scale shape: one corpus scan to per-source totals (partial+final,
    * #sources cells), window algebra over those few cells, then one
    * sampling scan with the rates broadcast — the same
    * stateless-hash-threshold map as q53, so re-runs and backfills keep
    * identical documents. No driver math, no rand(). */
  private def q67(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = Window.partitionBy()
    val toks = Tables.documents(spark, dir).select(
      $"doc_id", $"source",
      size(Portable.tokens($"text")).cast("long").as("n_tokens"))
    val shares = toks.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("tokens"))
      .withColumn("w_raw", sourceWeight($"source"))
      .withColumn("target_share", $"w_raw".cast("double") / sum($"w_raw").over(all))
      .withColumn("t_max", min($"tokens" / $"target_share").over(all))
      .withColumn("keep_rate", least(lit(1.0), $"target_share" * $"t_max" / $"tokens"))
    val kept = toks
      .join(broadcast(shares.select($"source", $"keep_rate")), Seq("source"))
      .withColumn("kept",
        (Portable.hash32(concat($"doc_id".cast("string"), lit("#graft-mix"))) % 1000000L <
          floor($"keep_rate" * 1000000L).cast("long")).cast("long"))
      .groupBy($"source")
      .agg(sum($"kept").as("kept_docs"), sum($"kept" * $"n_tokens").as("kept_tokens"))
    shares.join(kept, Seq("source"))
      .withColumn("realized_share",
        $"kept_tokens".cast("double") / sum($"kept_tokens").over(all))
      .select($"source", $"n_docs", $"tokens", $"target_share", $"keep_rate",
        $"kept_docs", $"kept_tokens", $"realized_share")
      .orderBy($"source")
  }

  private val q67Sql: String = {
    val mixHash = Portable.hash32Sql("CAST(doc_id AS VARCHAR) || '#graft-mix'")
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), per AS (
       |  SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens,
       |         ${sourceWeightSql("source")} AS w_raw
       |  FROM toks GROUP BY source
       |), shares AS (
       |  SELECT source, n_docs, tokens,
       |         CAST(w_raw AS DOUBLE) / sum(w_raw) OVER () AS target_share
       |  FROM per
       |), budget AS (
       |  SELECT *, min(tokens / target_share) OVER () AS t_max FROM shares
       |), rates AS (
       |  SELECT *, least(1.0, target_share * t_max / tokens) AS keep_rate FROM budget
       |), kept AS (
       |  SELECT t.source,
       |         sum(CASE WHEN $mixHash % 1000000 < CAST(floor(r.keep_rate * 1000000) AS BIGINT)
       |                  THEN 1 ELSE 0 END) AS kept_docs,
       |         sum(CASE WHEN $mixHash % 1000000 < CAST(floor(r.keep_rate * 1000000) AS BIGINT)
       |                  THEN t.n_tokens ELSE 0 END) AS kept_tokens
       |  FROM toks t JOIN rates r ON t.source = r.source
       |  GROUP BY t.source
       |)
       |SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs, r.tokens,
       |       r.target_share, r.keep_rate,
       |       CAST(k.kept_docs AS BIGINT) AS kept_docs,
       |       CAST(k.kept_tokens AS BIGINT) AS kept_tokens,
       |       CAST(k.kept_tokens AS DOUBLE) / sum(k.kept_tokens) OVER () AS realized_share
       |FROM rates r JOIN kept k ON r.source = k.source
       |ORDER BY r.source""".stripMargin
  }

  // --------------------------------------------------------------- q73
  /** Quality-aware canonical selection: for every duplicate cluster
    * (q50's components), pick the member with the HIGHEST quality score
    * (q32's shared [[TextAnalysis.qualityExpr]]) as the keeper, instead
    * of q50's positional min-doc_id keeper — the RefinedWeb/FineWeb
    * policy of keeping the best copy of duplicated content, not an
    * arbitrary one. Emits per cluster: size, the quality-canonical
    * member, its score, the min-id keeper, and whether the two policies
    * agree — the report a curation run reviews before switching keeper
    * policy. Quality doubles are ordered raw (bit-identical per-row
    * algebra in both engines — oracle-parity rule), doc_id as tiebreak.
    *
    * Scale shape: the labels table holds only docs incident to a dup
    * edge (≪ corpus), so the quality join touches a small slice; the
    * argmax is a per-cluster window over that slice plus one
    * partial+final aggregate — no corpus-wide shuffle anywhere. */
  private def q73(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val members = clusterLabels(spark, dir).select($"doc_id", $"lbl".as("cluster_id"))
    val quality = Tables.documents(spark, dir)
      .withColumn("t", graft.functions.Portable.tokens($"text"))
      .select($"doc_id", TextAnalysis.qualityExpr($"text", $"t").as("quality"))
    val scored = members.join(quality, Seq("doc_id"))
    val w = Window.partitionBy($"cluster_id").orderBy($"quality".desc, $"doc_id".asc)
    val agg = scored.groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_members"), min($"doc_id").as("minid_doc"))
    val canon = scored.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"cluster_id", $"doc_id".as("canonical_doc"),
        $"quality".as("canonical_quality"))
    agg.join(canon, Seq("cluster_id"))
      .select($"cluster_id", $"n_members", $"canonical_doc", $"canonical_quality",
        $"minid_doc", ($"canonical_doc" === $"minid_doc").cast("int").as("same_choice"))
      .orderBy($"cluster_id")
  }

  private val q73Sql: String =
    s"""WITH m AS (
       |  SELECT doc_id, cluster_id FROM ($q50Sql)
       |), qf AS (
       |  SELECT doc_id, quality FROM (${TextAnalysis.qualitySql})
       |), s AS (
       |  SELECT m.doc_id, m.cluster_id, qf.quality FROM m JOIN qf ON m.doc_id = qf.doc_id
       |), a AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |         CAST(min(doc_id) AS BIGINT) AS minid_doc
       |  FROM s GROUP BY cluster_id
       |), c AS (
       |  SELECT cluster_id, doc_id AS canonical_doc, quality AS canonical_quality
       |  FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
       |                                     ORDER BY quality DESC, doc_id ASC) AS rn
       |        FROM s) t
       |  WHERE rn = 1
       |)
       |SELECT a.cluster_id, a.n_members, c.canonical_doc, c.canonical_quality,
       |       a.minid_doc, CAST(c.canonical_doc = a.minid_doc AS INTEGER) AS same_choice
       |FROM a JOIN c ON a.cluster_id = c.cluster_id
       |ORDER BY a.cluster_id""".stripMargin

  // --------------------------------------------------------------- q77
  /** Leakage-aware split repair: a duplicate cluster (q50) whose
    * members land in different q51 splits leaks near-identical content
    * across the train/eval boundary — the contamination q58/q65 audit
    * after the fact, repaired here at assignment time instead. Every
    * document's repaired split is the split of its CLUSTER LABEL
    * (hash-split of the min-id member), so a cluster moves as a unit
    * and the repair is still a pure function of (doc_id, edge set) —
    * deterministic under re-runs and backfills, like q51 itself.
    * Emits per document: current split, cluster, repaired split, and
    * whether the repair moved it.
    *
    * Scale shape: the labels table holds only docs incident to a dup
    * edge (≪ corpus — q73's argument), so the corpus takes one
    * broadcast left join and never shuffles; both split columns are
    * per-row hash algebra, and the repaired split needs NO second join
    * because the cluster label IS the keeper doc_id. */
  private def q77(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select($"doc_id")
      .join(broadcast(clusterLabels(spark, dir)), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce($"lbl", $"doc_id"))
      .select($"doc_id", $"cluster_id",
        splitName($"doc_id").as("split"),
        splitName($"cluster_id").as("repaired_split"))
      .withColumn("moved", ($"split" =!= $"repaired_split").cast("int"))
      .orderBy($"doc_id")
  }

  private val q77Sql: String = {
    def splitCase(key: String): String = {
      val b = splitBucketSql(key)
      s"CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val' ELSE 'test' END"
    }
    s"""WITH lbl AS (
       |  SELECT doc_id, cluster_id FROM ($q50Sql)
       |), j AS (
       |  SELECT d.doc_id,
       |         CAST(COALESCE(l.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
       |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id
       |)
       |SELECT doc_id, cluster_id,
       |       ${splitCase("doc_id")} AS split,
       |       ${splitCase("cluster_id")} AS repaired_split,
       |       CAST(${splitCase("doc_id")} <> ${splitCase("cluster_id")} AS INTEGER) AS moved
       |FROM j
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q79
  /** Per-source quality profile: exact quartiles + extrema of the q32
    * quality score grouped by source — the "which sources are dragging
    * the corpus down" report consulted before setting q67's mix targets
    * or a quality-filter threshold. Reuses q32's shared expression so
    * the profile can never drift from the score it summarizes.
    *
    * Determinism: quality is bit-identical per-row algebra; min/max
    * select element values (unrounded); the interpolated percentiles
    * do arithmetic between two elements, so they carry the 4-dp
    * rounding (q17's convention — Spark `percentile` and DuckDB
    * `quantile_cont` interpolate identically).
    *
    * Scale shape: per-group sort-based percentile over each source's
    * quality values — one shuffle keyed by source. At 100 TB with
    * billions of docs per source the same report swaps to
    * `approx_percentile` (q54's sketch), same engine surface. */
  private def q79(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("t", graft.functions.Portable.tokens($"text"))
      .withColumn("q", TextAnalysis.qualityExpr($"text", $"t"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(percentile($"q", lit(0.25)), 4).as("q25"),
        round(percentile($"q", lit(0.5)), 4).as("q50"),
        round(percentile($"q", lit(0.75)), 4).as("q75"),
        min($"q").as("q_min"),
        max($"q").as("q_max"))
      .orderBy($"source")
  }

  private val q79Sql: String =
    s"""WITH qf AS (
       |  SELECT doc_id, quality FROM (${TextAnalysis.qualitySql})
       |)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |       round(quantile_cont(qf.quality, 0.25), 4) AS q25,
       |       round(quantile_cont(qf.quality, 0.5), 4) AS q50,
       |       round(quantile_cont(qf.quality, 0.75), 4) AS q75,
       |       min(qf.quality) AS q_min,
       |       max(qf.quality) AS q_max
       |FROM documents d JOIN qf ON d.doc_id = qf.doc_id
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin

  // --------------------------------------------------------------- q80
  /** Temperature-scaled source sampling weights (the multilingual-BERT
    * / mT5 exponent trick, α = 0.5): sampling share ∝ n_tokens^α,
    * compared against the natural token share — `boost` > 1 means the
    * source is upsampled relative to its size. The report a mixture
    * designer reads next to q67's water-filling rates.
    *
    * Determinism: token counts are exact integers, so the natural
    * share is ONE exact division (unrounded); α = 0.5 is computed with
    * `sqrt` (IEEE correctly-rounded in both engines, unlike libm
    * `pow`); the sqrt-sum is the one order-dependent total, so the
    * sampled share and boost are rounded (6/4 dp).
    *
    * Scale shape: one corpus scan collapses to #sources cells
    * (partial+final aggregate); the window totals run over those few
    * cells only — same shape as q61/q67. */
  private def q80(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy()
    Tables.documents(spark, dir)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(graft.functions.Portable.tokens($"text")).cast("long")).as("n_tokens"))
      .withColumn("nat_share",
        $"n_tokens".cast("double") / sum($"n_tokens").over(w).cast("double"))
      .withColumn("scaled", sqrt($"n_tokens".cast("double")))
      .withColumn("samp_raw", $"scaled" / sum($"scaled").over(w))
      .select($"source", $"n_docs", $"n_tokens",
        $"nat_share",
        round($"samp_raw", 6).as("samp_share"),
        round($"samp_raw" / $"nat_share", 4).as("boost"))
      .orderBy($"source")
  }

  private val q80Sql: String =
    """WITH cells AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), shares AS (
      |  SELECT source, n_docs, n_tokens,
      |         CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE) AS nat_share,
      |         sqrt(CAST(n_tokens AS DOUBLE))
      |           / sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER () AS samp_raw
      |  FROM cells
      |)
      |SELECT source, n_docs, n_tokens, nat_share,
      |       round(samp_raw, 6) AS samp_share,
      |       round(samp_raw / nat_share, 4) AS boost
      |FROM shares
      |ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q87
  /** Data-constrained repeat-epoch plan: given a training token budget
    * of 2× the corpus (the data-constrained regime) and q80's
    * temperature-scaled target shares, how many EPOCHS of each source
    * to schedule — `epochs = min(4, budget·share / tokens)`, the
    * "repeat small high-value sources up to ~4 times, cap before
    * returns collapse" recipe from the data-constrained-scaling
    * literature. Emits per source: inventory, target share, planned
    * epochs, planned token draw, and whether the source is repeated.
    *
    * Scale shape: identical to q80 — ONE pruned scan contracted to
    * #sources rows, window totals over those few cells, everything
    * after the aggregate is per-cell algebra. Budget is derived from
    * the exact integer token total (no double drift); `epochs` is
    * rounded to 6 dp before the planned-token product so both engines
    * multiply identical doubles. */
  private def q87(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy()
    Tables.documents(spark, dir)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(graft.functions.Portable.tokens($"text")).cast("long")).as("n_tokens"))
      .withColumn("budget_tokens", lit(2L) * sum($"n_tokens").over(w))
      .withColumn("scaled", sqrt($"n_tokens".cast("double")))
      .withColumn("samp_raw", $"scaled" / sum($"scaled").over(w))
      // planned draws derive from the UNROUNDED epochs so Σ planned ≤
      // budget holds by construction (a 6-dp round-up of epochs times a
      // large n_tokens would overshoot budget·share); only the DISPLAY
      // column is rounded
      .withColumn("epochs_raw",
        least(lit(4.0),
          $"budget_tokens".cast("double") * $"samp_raw" / $"n_tokens".cast("double")))
      .select($"source", $"n_docs", $"n_tokens", $"budget_tokens",
        round($"samp_raw", 6).as("samp_share"),
        round($"epochs_raw", 6).as("epochs"),
        round($"epochs_raw" * $"n_tokens".cast("double"), 2).as("planned_tokens"),
        // flag derives from the displayed (rounded) epochs so the
        // emitted columns stay mutually consistent
        (round($"epochs_raw", 6) > 1.0).cast("int").as("repeated"))
      .orderBy($"source")
  }

  private val q87Sql: String =
    """WITH cells AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), plan AS (
      |  SELECT source, n_docs, n_tokens,
      |         2 * sum(n_tokens) OVER () AS budget_tokens,
      |         sqrt(CAST(n_tokens AS DOUBLE))
      |           / sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER () AS samp_raw
      |  FROM cells
      |), ep AS (
      |  SELECT *,
      |         least(4.0, CAST(budget_tokens AS DOUBLE) * samp_raw
      |                      / CAST(n_tokens AS DOUBLE)) AS epochs_raw
      |  FROM plan
      |)
      |SELECT source, n_docs, n_tokens, CAST(budget_tokens AS BIGINT) AS budget_tokens,
      |       round(samp_raw, 6) AS samp_share,
      |       round(epochs_raw, 6) AS epochs,
      |       round(epochs_raw * CAST(n_tokens AS DOUBLE), 2) AS planned_tokens,
      |       CAST(round(epochs_raw, 6) > 1.0 AS INTEGER) AS repeated
      |FROM ep
      |ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q89
  /** Cross-source duplication matrix: q25's MinHash-LSH near-dup pairs
    * rolled up by the (source, source) of their endpoints — which
    * sources mirror each other's content. The canonical curation
    * diagnostic before dropping a "new" source that is mostly a copy of
    * one already ingested (CommonCrawl snapshot overlap, mirrored
    * sites, cross-posted corpora).
    *
    * Scale shape: the pair table is the already-pruned LSH output
    * (≪ corpus); the source lookup joins it against the pruned
    * (doc_id, source) projection — two equi-joins that AQE broadcasts
    * (the pair side is tiny) — and the matrix aggregate is at most
    * #sources² cells. The corpus is scanned once, two columns wide. */
  private def q89(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir).select($"doc_id", $"source")
    val pairs = Dedup.lshCandidates(spark, dir)
    pairs
      .join(src.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(src.as("sb"), $"doc_b" === $"sb.doc_id")
      .select(
        least($"sa.source", $"sb.source").as("src_lo"),
        greatest($"sa.source", $"sb.source").as("src_hi"))
      .groupBy($"src_lo", $"src_hi")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("cross_source", ($"src_lo" =!= $"src_hi").cast("int"))
      .orderBy($"src_lo", $"src_hi")
  }

  private val q89Sql: String =
    s"""WITH ${Dedup.lshCandidatesCte}, m AS (
       |  SELECT least(da.source, db.source) AS src_lo,
       |         greatest(da.source, db.source) AS src_hi
       |  FROM cands c
       |  JOIN documents da ON da.doc_id = c.doc_a
       |  JOIN documents db ON db.doc_id = c.doc_b
       |)
       |SELECT src_lo, src_hi, CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(src_lo <> src_hi AS INTEGER) AS cross_source
       |FROM m GROUP BY src_lo, src_hi
       |ORDER BY src_lo, src_hi""".stripMargin

  // --------------------------------------------------------------- q93
  /** Sequence-length histogram: per (source, ⌊log₂ n_tokens⌋ bucket)
    * document and token counts with the bucket's token range — the
    * length-distribution report that sizes q63's packing (context-
    * length fit, truncation rates, padding waste) and catches sources
    * whose length profile shifted between crawls.
    *
    * The log₂ bucket is computed INTEGER-exactly as
    * `length(bin(n)) − 1` (binary-representation width), never
    * `floor(log2(x))` — ln-ratio floating math can land 2ᵏ on
    * k−ε and flip the floor on one engine but not the other.
    * Scale shape: per-row token count + bucket label on the scan,
    * partial+final aggregate to #sources × ~12 cells. */
  private def q93(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"source",
        size(graft.functions.Portable.tokens($"text")).as("n"))
      .withColumn("bucket", (length(bin($"n")) - 1).cast("int"))
      .groupBy($"source", $"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n".cast("long")).as("n_tokens"))
      .withColumn("bucket_lo", expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
      .withColumn("bucket_hi", expr("shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1"))
      .select($"source", $"bucket", $"bucket_lo", $"bucket_hi", $"n_docs", $"n_tokens")
      .orderBy($"source", $"bucket")
  }

  private val q93Sql: String =
    """WITH per AS (
      |  SELECT source,
      |         len(string_split_regex(text, '\s+')) AS n
      |  FROM documents
      |), b AS (
      |  SELECT source, CAST(length(bin(n)) - 1 AS INTEGER) AS bucket, n FROM per
      |)
      |SELECT source, bucket,
      |       CAST(1 << bucket AS BIGINT) AS bucket_lo,
      |       CAST((1 << (bucket + 1)) - 1 AS BIGINT) AS bucket_hi,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n) AS BIGINT) AS n_tokens
      |FROM b GROUP BY source, bucket
      |ORDER BY source, bucket""".stripMargin

  // --------------------------------------------------------------- q97
  /** k-anonymity audit over quasi-identifiers: group documents by the
    * attribute combination an adversary could link on — (lang, source,
    * ⌊log₂ n_tokens⌋ length bucket) — and flag every equivalence class
    * smaller than k = 5. A release whose rows sit in tiny classes is
    * re-identifiable even after q62's direct-identifier scrub; this is
    * the structural complement (Sweeney's k-anonymity, the standard
    * pre-release privacy gate).
    *
    * Scale shape: one pruned scan, per-row quasi-id derivation, one
    * partial+final aggregate to #classes cells; the at-risk flag and
    * the class-share are per-cell algebra over the contracted frame
    * (window total over cells, not rows). */
  private val AnonK = 5

  private def q97(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy()
    Tables.documents(spark, dir)
      .select($"lang", $"source",
        size(graft.functions.Portable.tokens($"text")).as("n"))
      .withColumn("len_bucket", (length(bin($"n")) - 1).cast("int"))
      .groupBy($"lang", $"source", $"len_bucket")
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", ($"class_size" < AnonK).cast("int"))
      .withColumn("risk_share",
        sum(when($"class_size" < AnonK, $"class_size").otherwise(0L)).over(w)
          .cast("double") / sum($"class_size").over(w))
      .orderBy($"lang", $"source", $"len_bucket")
  }

  private val q97Sql: String =
    s"""WITH per AS (
       |  SELECT lang, source,
       |         len(string_split_regex(text, '\\s+')) AS n
       |  FROM documents
       |), cls AS (
       |  SELECT lang, source, CAST(length(bin(n)) - 1 AS INTEGER) AS len_bucket,
       |         CAST(count(*) AS BIGINT) AS class_size
       |  FROM per GROUP BY 1, 2, 3
       |)
       |SELECT lang, source, len_bucket, class_size,
       |       CAST(class_size < $AnonK AS INTEGER) AS at_risk,
       |       CAST(sum(CASE WHEN class_size < $AnonK THEN class_size ELSE 0 END) OVER ()
       |            AS DOUBLE) / sum(class_size) OVER () AS risk_share
       |FROM cls
       |ORDER BY lang, source, len_bucket""".stripMargin

  // -------------------------------------------------------------- q162
  /** l-diversity audit — the companion gate to q97's k-anonymity
    * (Machanavajjhala et al., "l-Diversity: Privacy Beyond
    * k-Anonymity", ICDE'06): a class can be large (k-anonymous) yet
    * still leak if every member shares the same SENSITIVE value.
    * Quasi-identifiers here are what an adversary links on in the
    * events table — (event_type, hour-of-day); the sensitive attribute
    * is user_id. Per class: distinct-l (count of distinct sensitive
    * values), entropy-l (exp of the Shannon entropy of the sensitive
    * distribution — the strictest published variant), and the failing
    * flag at l = 3.
    *
    * Scale shape: ONE partial+final aggregate to (class, user) cells,
    * then a second contraction to #classes rows — entropy decomposes
    * over per-(class,user) counts, so no per-row state survives the
    * first map-side combine. At 100 TB both frames are tiny relative
    * to the corpus; nothing windows over raw rows. */
  private val DivL = 3

  /** Generic core of q162, opened via [[graft.Graft.lDiversity]]:
    * the diversity audit over any frame's quasi-identifier columns and
    * sensitive column. */
  private[graft] def lDiversity(df: DataFrame, quasi: Seq[String],
      sensitive: String, l: Int = DivL): DataFrame = {
    val qc = quasi.map(col)
    df.groupBy(qc :+ col(sensitive): _*)
      .agg(count(lit(1)).as("c"))
      .groupBy(qc: _*)
      .agg(sum(col("c")).as("class_size"),
        count(lit(1)).as("l_distinct"),
        // Σ c·ln c over members; entropy = ln n − (Σ c·ln c)/n
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("slc"))
      .select(qc ++ Seq(col("class_size"), col("l_distinct"),
        round(exp(log(col("class_size").cast("double")) -
          col("slc") / col("class_size").cast("double")), 4).as("l_entropy"),
        (col("l_distinct") < l).cast("int").as("at_risk")): _*)
      .orderBy(qc: _*)
  }

  private def q162(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lDiversity(
      Tables.events(spark, dir)
        .select($"event_type", hour($"ts").cast("long").as("hh"), $"user_id"),
      Seq("event_type", "hh"), "user_id")
  }

  private val q162Sql: String =
    s"""WITH cells AS (
       |  SELECT event_type, hour(ts) AS hh, user_id,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2, 3
       |)
       |SELECT event_type, CAST(hh AS BIGINT) AS hh,
       |       CAST(sum(c) AS BIGINT) AS class_size,
       |       CAST(count(*) AS BIGINT) AS l_distinct,
       |       round(exp(ln(CAST(sum(c) AS DOUBLE))
       |             - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
       |               / CAST(sum(c) AS DOUBLE)), 4) AS l_entropy,
       |       CAST(count(*) < $DivL AS INTEGER) AS at_risk
       |FROM cells
       |GROUP BY event_type, hh
       |ORDER BY event_type, hh""".stripMargin

  // -------------------------------------------------------------- q195
  /** t-closeness audit — the third privacy gate after q97 (k-anonymity:
    * classes big enough) and q162 (l-diversity: sensitive values varied
    * enough): a class can pass both yet still leak if its sensitive
    * DISTRIBUTION deviates from the table's (Li, Li & Venkatasubramanian
    * ICDE'07 — "a class of all-high salaries is diverse but tells the
    * adversary plenty"). Sensitive attribute here is the event value
    * discretized to its GLOBAL decile (ordered, so distance between
    * distributions is the ordered-EMD: EMD = Σ_j |Σ_{i≤j}(p_i − q_i)| /
    * (m−1), the closed form the paper gives for ordered attributes);
    * quasi-identifiers are q162's (event_type, hour).
    *
    * Shape: one DISTRIBUTED exact decile pass (q192's discipline —
    * [[Ranks.withGlobalRank]] + [[Ranks.ntileFromRank]], never a
    * single-task full-table window), one partial+final (class, decile)
    * contraction, a literal 10-row spine densifies absent deciles
    * (q142's trick — an absent decile still contributes |cum| mass),
    * then the EMD is a decile-ordered window cumsum + one per-class
    * aggregate over 10 rows. The cumulative differences are
    * sequential-fold deterministic (window order fixes association);
    * the terminal 6-dp round absorbs the 9-term sum. */
  private val TClose = 0.2

  private def q195(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binned = Ranks.withGlobalRank(
        Tables.events(spark, dir)
          .select($"event_type", hour($"ts").cast("long").as("hh"),
            $"value", $"event_id"),
        "value", "event_id", rn = "__rn", n = "__n")
      .withColumn("decile", Ranks.ntileFromRank("__rn", "__n", 10))
    val cells = binned.groupBy($"event_type", $"hh", $"decile")
      .agg(count(lit(1)).as("c"))
    val globals = binned.groupBy($"decile").agg(count(lit(1)).as("g"))
    val totals = globals.agg(sum($"g").as("n"))
    val classes = cells.groupBy($"event_type", $"hh")
      .agg(sum($"c").as("class_size"))
    val spine = classes.select($"event_type", $"hh", $"class_size",
      explode(sequence(lit(1), lit(10))).as("decile"))
    val wCum = Window.partitionBy($"event_type", $"hh").orderBy($"decile")
    spine
      .join(cells, Seq("event_type", "hh", "decile"), "left_outer")
      .join(broadcast(globals), Seq("decile"))
      .crossJoin(broadcast(totals))
      .withColumn("diff",
        coalesce($"c", lit(0L)).cast("double") / $"class_size" -
          $"g".cast("double") / $"n")
      .withColumn("cum", sum($"diff").over(wCum))
      .filter($"decile" < 10) // the m-th cumulative is identically 0
      .groupBy($"event_type", $"hh")
      .agg(min($"class_size").as("class_size"),
        round(sum(abs($"cum")) / 9.0, 6).as("emd"))
      .withColumn("at_risk", ($"emd" > TClose).cast("int"))
      .orderBy($"event_type", $"hh")
  }

  private val q195Sql: String =
    s"""WITH binned AS (
       |  SELECT event_type, hour(ts) AS hh,
       |         ntile(10) OVER (ORDER BY value, event_id) AS decile
       |  FROM events
       |), cells AS (
       |  SELECT event_type, hh, decile, CAST(count(*) AS BIGINT) AS c
       |  FROM binned GROUP BY 1, 2, 3
       |), globals AS (
       |  SELECT decile, CAST(count(*) AS BIGINT) AS g FROM binned GROUP BY 1
       |), totals AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM globals),
       |classes AS (
       |  SELECT event_type, hh, CAST(sum(c) AS BIGINT) AS class_size
       |  FROM cells GROUP BY 1, 2
       |), spine AS (
       |  SELECT cl.event_type, cl.hh, cl.class_size, d.decile
       |  FROM classes cl CROSS JOIN (SELECT unnest(range(1, 11)) AS decile) d
       |), cum AS (
       |  SELECT sp.event_type, sp.hh, sp.class_size, sp.decile,
       |         sum(CAST(COALESCE(ce.c, 0) AS DOUBLE) / sp.class_size -
       |             CAST(g.g AS DOUBLE) / t.n)
       |           OVER (PARTITION BY sp.event_type, sp.hh ORDER BY sp.decile) AS cum
       |  FROM spine sp
       |  LEFT JOIN cells ce ON ce.event_type = sp.event_type
       |                    AND ce.hh = sp.hh AND ce.decile = sp.decile
       |  JOIN globals g ON g.decile = sp.decile
       |  CROSS JOIN totals t
       |)
       |SELECT event_type, CAST(hh AS BIGINT) AS hh,
       |       CAST(min(class_size) AS BIGINT) AS class_size,
       |       round(sum(abs(cum)) / 9.0, 6) AS emd,
       |       CAST(round(sum(abs(cum)) / 9.0, 6) > $TClose AS INTEGER) AS at_risk
       |FROM cum
       |WHERE decile < 10
       |GROUP BY event_type, hh
       |ORDER BY event_type, hh""".stripMargin

  // ------------------------------------------------ curated snapshot
  /** The pipeline's SINK: materialize the curated corpus to parquet,
    * composing the catalog's own stages — quality-aware keeper per
    * duplicate cluster (q73's policy over q50's components), PII scrub
    * (q62's shared redaction chain), and leakage-repaired split
    * assignment (q77: the whole cluster lands in its label's split) —
    * written `partitionBy("split")` so a dataloader reads its split by
    * partition pruning alone. Returns per-split accounting (docs,
    * chars) read back from the written files, not from the plan.
    *
    * Deterministic end to end: keeper choice, scrub, and split are all
    * pure functions of (doc_id, text, edge set) — re-running overwrites
    * with bit-identical content (PipelineSpec asserts the re-run
    * equality). Scale shape: the cluster slice (docs incident to a dup
    * edge) is ≪ corpus, so keeper selection windows over that slice
    * only and rejoins by broadcast; the corpus itself is scanned once,
    * map-side scrubbed, and written with NO shuffle at all — the writer
    * partitions by split value within each task. */
  def materializeCurated(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    import spark.implicits._
    val members = clusterLabels(spark, dir) // (doc_id, lbl), dup-incident docs only
    val docs = Tables.documents(spark, dir)
    // quality argmax within each cluster, computed on the member slice
    val memberQuality = docs.join(broadcast(members), Seq("doc_id"))
      .withColumn("t", graft.functions.Portable.tokens($"text"))
      .select($"doc_id", $"lbl".as("cluster_id"),
        TextAnalysis.qualityExpr($"text", $"t").as("q"))
    val w = Window.partitionBy($"cluster_id").orderBy($"q".desc, $"doc_id".asc)
    val canon = memberQuality.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"cluster_id", $"doc_id".as("keeper"))
    val redacted = TextAnalysis.piiColumns($"text").last // the "redacted" column
    docs
      .join(broadcast(members), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce($"lbl", $"doc_id"))
      .join(broadcast(canon), Seq("cluster_id"), "left")
      .withColumn("keeper", coalesce($"keeper", $"doc_id"))
      .filter($"doc_id" === $"keeper")
      .select($"doc_id", $"cluster_id", $"source", $"lang",
        redacted.as("text"), splitName($"cluster_id").as("split"))
      .write.mode("overwrite").partitionBy("split").parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum(length($"text")).as("n_chars"))
      .orderBy($"split")
  }

  // -------------------------------------------------------------- q105
  /** Weighted sampling WITHOUT replacement via the exponential-race
    * keys of Efraimidis–Spirakis: each doc draws key = −ln(u)/w from a
    * deterministic uniform u (portable hash, q51's discipline — never
    * `rand()`, so re-runs and backfills agree) and the K smallest keys
    * win; inclusion probability is then proportional to weight w
    * (length-weighted here — the "sample tokens, not documents" knob a
    * mixture builder needs, vs q53's per-stratum rates).
    *
    * Scale: one stateless map over the corpus + TakeOrdered top-K
    * (per-partition partial top-K, K-row merge on the driver side of
    * the exchange — never a global sort). The selection key is
    * quantized to an INTEGER nano-key via `floor(x·1e9 + 0.5)` (the
    * catalog's quantization rule — never `round()` a scalar double in
    * a hashed query) with a doc_id tiebreak: both engines' `ln` agree
    * to ~1e-15 relative, six orders inside the quantum. */
  /** Generic core of q105, shared with [[graft.Graft.weightedSample]]:
    * top-`k` of any frame by exponential-race key over `weightCol` —
    * ANY positive weight, integer or fractional (inclusion ∝ w is the
    * E-S guarantee); rows with non-positive weight sit out of the race
    * entirely (zero weight = never sampled), NOT clamped to 1, which
    * would silently flatten fractional weights to uniform. The id
    * column seeds the deterministic uniform, so distinct ids draw
    * independent races. Output keeps the caller's column names:
    * (rank, id, weight, key_ns). */
  private[graft] def weightedSample(df: DataFrame, idCol: String,
      weightCol: String, k: Int, salt: String): DataFrame = {
    val keyed = df.filter(col(weightCol) > 0).select(
      col(idCol), col(weightCol),
      floor(
        -log((Portable.hash32(concat(col(idCol).cast("string"),
          lit(salt))) + 1).cast("double") / lit(4294967297.0)) /
          col(weightCol).cast("double") * lit(1e9) + lit(0.5))
        .cast("long").as("key_ns"))
    val top = keyed.orderBy(col("key_ns"), col(idCol)).limit(k)
    val w = Window.orderBy(col("key_ns"), col(idCol))
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col(idCol), col(weightCol), col("key_ns"))
      .orderBy(col("rank"))
  }

  private def q105(spark: SparkSession, dir: String): DataFrame =
    weightedSample(Tables.documents(spark, dir), "doc_id", "n_chars",
      k = 100, salt = "#graft-wsample")

  private val q105Sql: String = {
    val h = Portable.hash32Sql("CAST(doc_id AS VARCHAR) || '#graft-wsample'")
    s"""WITH keyed AS (
       |  SELECT doc_id, n_chars,
       |         CAST(floor(-ln(($h + 1) / 4294967297.0)
       |               / CAST(n_chars AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS key_ns
       |  FROM documents
       |  WHERE n_chars > 0
       |)
       |SELECT CAST(row_number() OVER (ORDER BY key_ns, doc_id) AS INTEGER) AS rank,
       |       doc_id, n_chars, key_ns
       |FROM keyed
       |ORDER BY key_ns, doc_id
       |LIMIT 100""".stripMargin
  }

  // -------------------------------------------------------------- q209
  /** EXACT-quota stratified train/val/test split (80/10/10) by largest
    * remainder — the deterministic-apportionment counterpart of q51's
    * per-row hash split: q51 gives each doc an independent 80/10/10
    * coin (binomial wobble ~√n per stratum), this one hits the quota
    * EXACTLY in every (source, lang) stratum — the property an eval
    * harness needs when "10% of every slice" is a contract, not a
    * tendency (a 40-doc slice under q51 can land 1 or 7 docs in val;
    * here it lands exactly 4).
    *
    * Quota arithmetic (Hamilton/largest-remainder, ties in split order
    * train→val→test): with n = stratum size and rv = n mod 10, the
    * fractional remainders of (8n/10, n/10, n/10) are a function of rv
    * alone, so the whole apportionment reduces to two lookup sets —
    * train gets ⌊8n/10⌋ (+1 iff rv ∈ {1,2,3,6}), val gets ⌊n/10⌋
    * (+1 iff rv ∈ {4,5,6,7,8,9}), test the rest (+1 iff rv ∈ {7,8,9})
    * — derivable by enumerating rv: R = rv − ⌊8rv/10⌋ extras go to the
    * splits with the largest fractional parts.
    *
    * WHICH docs fill each quota is the deterministic portable-hash
    * order (q51's discipline — re-runs, backfills, and the oracle
    * agree), tie-broken by doc_id. The audit emits per
    * (stratum, split): the doc count (provably = quota) AND the
    * doc_id sum — so the gate pins the exact MEMBERSHIP, not just the
    * counts.
    *
    * Scale: the per-stratum rank runs as [[Ranks]]' two-phase
    * decomposition keyed by stratum — hash-top-byte buckets (monotone
    * in the hash order), a strata×≤256-row offset histogram (window
    * over the constant-bounded histogram, q111 discipline), and local
    * ranks partitioned by (stratum, bucket) — so ONE giant stratum
    * never funnels through one task the way a plain
    * `partitionBy(stratum)` window would at 100 TB skew. The oracle's
    * naive per-stratum window spelling is the parity proof. */
  private[graft] def quotaSplit(docs: DataFrame, salt: String): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("source"), col("lang"))
      .withColumn("hkey",
        Portable.hash32(concat(col("doc_id").cast("string"), lit(salt))))
      .withColumn("bkt", expr("shiftright(hkey, 24)").cast("int"))
    val hist = keyed.groupBy(col("source"), col("lang"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val wOff = Window.partitionBy(col("source"), col("lang"))
      .orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("source"), col("lang"))))
      .select(col("source"), col("lang"), col("bkt"), col("off"), col("n"))
    val wLoc = Window.partitionBy(col("source"), col("lang"), col("bkt"))
      .orderBy(col("hkey"), col("doc_id"))
    // NULL-SAFE stratum join: a null source/lang is a legitimate
    // stratum (the oracle's window treats NULL as a group; groupBy
    // keeps it) — a plain equi-join would silently drop those rows,
    // the exact null-bucket vanishing bug Ranks fixed this round.
    val offsR = offs.select(col("source").as("__s2"), col("lang").as("__l2"),
      col("bkt").as("__b2"), col("off"), col("n"))
    keyed.join(broadcast(offsR),
        col("source") <=> col("__s2") && col("lang") <=> col("__l2") &&
          col("bkt") === col("__b2"))
      .drop("__s2", "__l2", "__b2")
      .withColumn("rn", col("off") + row_number().over(wLoc).cast("long"))
      .withColumn("q_train", expr("(8 * n) div 10") +
        when(expr("n % 10").isin(1, 2, 3, 6), 1L).otherwise(0L))
      .withColumn("q_val", expr("n div 10") +
        when(expr("n % 10").isin(4, 5, 6, 7, 8, 9), 1L).otherwise(0L))
      .withColumn("split",
        when(col("rn") <= col("q_train"), lit("train"))
          .when(col("rn") <= col("q_train") + col("q_val"), lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("source"), col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_doc_id"))
      .orderBy(col("source"), col("lang"), col("split"))
  }

  private def q209(spark: SparkSession, dir: String): DataFrame =
    quotaSplit(Tables.documents(spark, dir), QuotaSalt)

  private val QuotaSalt = "#graft-quota"

  private val q209Sql: String = {
    val h = Portable.hash32Sql(s"CAST(doc_id AS VARCHAR) || '$QuotaSalt'")
    s"""WITH ranked AS (
       |  SELECT doc_id, source, lang,
       |         row_number() OVER (PARTITION BY source, lang
       |                            ORDER BY $h, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY source, lang) AS n
       |  FROM documents
       |), q AS (
       |  SELECT *,
       |         (8 * n) // 10 +
       |           CASE WHEN n % 10 IN (1, 2, 3, 6) THEN 1 ELSE 0 END AS q_train,
       |         n // 10 +
       |           CASE WHEN n % 10 IN (4, 5, 6, 7, 8, 9) THEN 1 ELSE 0 END AS q_val
       |  FROM ranked
       |)
       |SELECT source, lang,
       |       CASE WHEN rn <= q_train THEN 'train'
       |            WHEN rn <= q_train + q_val THEN 'val'
       |            ELSE 'test' END AS split,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
       |FROM q
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin
  }

  // -------------------------------------------------------------- q201
  /** Greedy set-cover corpus selection: pick `SetCoverK` sources, one
    * per round, each maximizing MARGINAL distinct-token coverage of
    * the corpus vocabulary — the submodular data-selection primitive
    * (Nemhauser–Wolsey–Fisher '78 gives the greedy a 1−1/e guarantee)
    * behind "choose the smallest source subset that still covers the
    * vocabulary/eval surface" curation decisions.
    *
    * Scale shape per round: one anti-join of the (source, token)
    * dictionary against the covered-token set (token-keyed equi-join),
    * one partial+final gain count to the #sources frame, a
    * TakeOrdered-1 winner, and a localCheckpoint of the new covered
    * set (#vocab rows bound — q100's lineage-truncation discipline;
    * the operator is EAGER like the other fixed-round recurrences).
    * Winner tiebreak is (gain DESC, source ASC) — deterministic, and
    * the unrolled DuckDB oracle replays the exact same greedy run. */
  private val SetCoverK = 5

  private def q201(spark: SparkSession, dir: String): DataFrame =
    setCover(spark, dir, SetCoverK)

  /** Open-knob core of q201, shared with [[graft.Graft.setCover]]:
    * the selection budget is the knob. */
  private[graft] def setCover(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1 (got $k)")
    import spark.implicits._
    val dict = Tables.documents(spark, dir)
      .select($"source", explode(Portable.tokens($"text")).as("token"))
      .distinct()
      .localCheckpoint()
    val nv = dict.select($"token").distinct().count().toDouble
    // `covered` is a lazy UNION of per-round checkpointed DELTAS: each
    // round materializes ONLY the winner's new tokens (anti-joined
    // against the prior cover, so the deltas are pairwise disjoint and
    // the union is a set with no re-distinct). The old form re-ran
    // union ∪ distinct ∪ localCheckpoint over the WHOLE covered set
    // every round — a vocabulary-scale materialization × K; now the
    // per-round write is the marginal gain only, and the running total
    // is the sum of delta counts instead of a full recount.
    var covered = spark.emptyDataset[String].toDF("token")
    var coveredN = 0L
    var picked = List.empty[String]
    val out = (1 to k).map { r =>
      // keep gain-0 sources in the race (a fully-covered vocabulary
      // still picks deterministically — lexicographically first
      // remaining source), mirrored exactly in the oracle
      val unpicked =
        if (picked.isEmpty) lit(true) else !$"source".isin(picked: _*)
      val marg = dict.filter(unpicked)
        .join(covered, Seq("token"), "left_anti")
        .groupBy($"source").agg(count(lit(1)).as("g"))
      val gains = dict.select($"source").distinct().filter(unpicked)
        .join(marg, Seq("source"), "left_outer")
        .select($"source", coalesce($"g", lit(0L)).as("gain"))
        .orderBy($"gain".desc, $"source".asc).limit(1)
        .collect()
      require(gains.nonEmpty, s"set cover ran out of sources at round $r")
      val (best, gain) = (gains(0).getString(0), gains(0).getLong(1))
      picked = best :: picked
      val delta = dict.filter($"source" === best).select($"token")
        .join(covered, Seq("token"), "left_anti")
        .localCheckpoint()
      coveredN += delta.count()
      covered = covered.union(delta)
      (r, best, gain, coveredN)
    }
    out.toDF("round", "source", "gain", "covered_total")
      .withColumn("coverage_frac",
        round($"covered_total" / nv, 6))
      .orderBy($"round")
  }

  /** Unrolled greedy twin: round r's CTEs condition on rounds 1..r−1's
    * picks and covered set — the oracle replays the identical greedy
    * trajectory, so a tiebreak or marginal-gain bug anywhere in the
    * distributed loop breaks the hash. */
  private val q201Sql: String = {
    val rounds = (1 to SetCoverK).map { r =>
      val notPicked =
        if (r == 1) ""
        else (1 until r).map(i => s"t.source <> (SELECT source FROM p$i)")
          .mkString(" AND ", " AND ", "")
      val notCovered =
        if (r == 1) ""
        else s" AND NOT EXISTS (SELECT 1 FROM c${r - 1} x WHERE x.token = t.token)"
      val prevCover =
        if (r == 1) s"SELECT DISTINCT t.token FROM toks t JOIN p1 ON t.source = p1.source"
        else s"SELECT token FROM c${r - 1} UNION " +
          s"SELECT t.token FROM toks t JOIN p$r ON t.source = p$r.source"
      val notPickedS =
        if (r == 1) ""
        else (1 until r).map(i => s"s.source <> (SELECT source FROM p$i)")
          .mkString(" WHERE ", " AND ", "")
      s"""m$r AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS gain
         |  FROM toks t WHERE 1=1$notPicked$notCovered
         |  GROUP BY 1
         |), g$r AS (
         |  SELECT s.source, CAST(COALESCE(m.gain, 0) AS BIGINT) AS gain
         |  FROM (SELECT DISTINCT source FROM toks) s
         |  LEFT JOIN m$r m ON m.source = s.source$notPickedS
         |), p$r AS MATERIALIZED (
         |  SELECT source, gain FROM g$r ORDER BY gain DESC, source LIMIT 1
         |), c$r AS MATERIALIZED (
         |  $prevCover
         |)""".stripMargin
    }.mkString(", ")
    val sel = (1 to SetCoverK).map { r =>
      s"""SELECT $r AS round, source, gain,
         |       (SELECT CAST(count(*) AS BIGINT) FROM c$r) AS covered_total,
         |       round((SELECT count(*) FROM c$r) / (SELECT nv FROM v), 6)
         |         AS coverage_frac
         |FROM p$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT DISTINCT source, token FROM (
       |    SELECT source, unnest(string_split_regex(text, '\\s+')) AS token
       |    FROM documents)
       |), v AS (
       |  SELECT CAST(count(DISTINCT token) AS DOUBLE) AS nv FROM toks
       |), $rounds
       |$sel
       |ORDER BY round""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q201_set_cover", q201, Some(q201Sql)),
    Q("q50_dup_clusters", q50, Some(q50Sql)),
    Q("q51_hash_split", q51, Some(q51Sql)),
    Q("q52_tfidf", q52, Some(q52Sql)),
    Q("q53_stratified_sample", q53, Some(q53Sql)),
    Q("q105_weighted_sample", q105, Some(q105Sql)),
    Q("q209_quota_split", q209, Some(q209Sql)),
    Q("q54_approx_quantiles", q54, Some(q54Sql)), // exact quartiles + rank-guarantee verdicts hash; raw sketch values stay engine-local
    Q("q61_mix_accounting", q61, Some(q61Sql)),
    Q("q66_curation_funnel", q66, Some(q66Sql)),
    Q("q67_mix_rebalance", q67, Some(q67Sql)),
    Q("q73_cluster_canonical", q73, Some(q73Sql)),
    Q("q77_leakage_repair", q77, Some(q77Sql)),
    Q("q79_source_quality", q79, Some(q79Sql)),
    Q("q80_temperature_mix", q80, Some(q80Sql)),
    Q("q87_repeat_plan", q87, Some(q87Sql)),
    Q("q89_source_overlap", q89, Some(q89Sql)),
    Q("q93_length_histogram", q93, Some(q93Sql)),
    Q("q97_k_anonymity", q97, Some(q97Sql)),
    Q("q162_l_diversity", q162, Some(q162Sql)),
    Q("q195_t_closeness", q195, Some(q195Sql)),
  )
}
