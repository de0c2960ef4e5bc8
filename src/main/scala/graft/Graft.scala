package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The library facade: the catalog (`SparkEntry.queries`) fixes every
  * parameter so the driver's oracle gate can hash results, but a user
  * of the engine calls THESE — the same operators with the knobs open.
  * Every entry point delegates to the module internals the catalog
  * queries run, so plan shapes (and their PlanSpec locks) carry over;
  * ApiSpec pins the catalog defaults to the corresponding qNN outputs.
  */
object Graft {

  /** Okapi BM25 top-`topK` documents for an ad-hoc bag of query terms.
    * Same shape as q84: per-row HOF term counting, one-row broadcast
    * stats, TakeOrdered — no vocabulary shuffle for any term set.
    * Term-frequency columns are positional (`tf_0..`, in deduplicated
    * input order) so arbitrary terms — duplicates, dots, spaces — can
    * never break column resolution. Scored frames are memoized per
    * (terms, k1, b), so repeated searches reuse one corpus scan. */
  def bm25Search(spark: SparkSession, dir: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "bm25Search needs at least one term")
    require(topK > 0 && k1 > 0 && b >= 0 && b <= 1,
      s"need topK > 0, k1 > 0, 0 <= b <= 1 (got topK=$topK, k1=$k1, b=$b)")
    val ts = terms.distinct
    val scored = operators.TextAnalysis.bm25ScoredFor(spark, dir, ts, k1, b)
    val w = Window.orderBy(col("score6").desc, col("doc_id").asc)
    scored.orderBy(col("score6").desc, col("doc_id").asc).limit(topK)
      .withColumn("rn", row_number().over(w))
      .select((Seq(col("doc_id")) ++ ts.indices.map(i => col(s"tf_$i")) ++
        Seq(graft.functions.Portable.detRound(col("score6"), 4).as("score"), col("rn"))): _*)
      .orderBy(col("rn"))
  }

  /** The vector-search ladder with the knobs open: `probes` cells per
    * query (1 = q41, 2 = q88, `probes = nlist` = exhaustive), optional
    * SQ8 quantized scoring with exact rerank (q96's path), and `nlist`
    * — the cell count itself (default 16, the catalog's pinned
    * geometry; at a corpus where 16 cells make within-cell scans the
    * bottleneck, pass nlist ≈ √N — same centroid discipline at every
    * nlist, and exhaustive probing recovers brute results at any of
    * them). Top-`k` by exact cosine either way. */
  def vectorSearch(spark: SparkSession, dir: String, queryIds: Seq[Long],
      k: Int = 5, probes: Int = 1, quantizedScoring: Boolean = false,
      nlist: Int = 16): DataFrame =
    operators.Similarity.vectorSearch(spark, dir, queryIds, k, probes,
      quantizedScoring, nlist)

  /** IVF cell assignment for any (vec_id, embedding) frame with the
    * cell count open — the nlist ∝ √N scale rule as a call, not a
    * comment: the catalog pins nlist = 16 (its oracle SQL carries the
    * centroids as literal rows), and `ivfAssign(df, 16)` reproduces
    * that assignment bit-for-bit; at a corpus where 16 cells would
    * make within-cell quadratics (hubness, argmax mining) the
    * bottleneck, pass nlist ≈ √N and Σ cell² falls from N²/16 to
    * ~N^1.5. Deterministic prefix-seeded ±1 centroids at every nlist. */
  def ivfAssign(df: org.apache.spark.sql.DataFrame, nlist: Int): org.apache.spark.sql.DataFrame =
    operators.Similarity.assignCells(df, nlist)

  /** The nlist ∝ √N rule as arithmetic — the cell count to pass
    * [[ivfAssign]]/[[vectorSearch]] for a corpus of n vectors (floored
    * at the catalog's 16). The catalog's own cell-local quadratics
    * (q68/q213/q218) derive their geometry from this rule, oracle-
    * gated at every tested scale factor. */
  def sqrtNlist(n: Long): Int = operators.Similarity.sqrtNlist(n)

  /** Cell-local kNN graph over the embeddings table — (src,
    * neighbor_id, cosine, rn) edges, each vector ranked against its
    * own IVF cell by exact rounded cosine (6-dp ordering, id
    * tiebreak). `nlist = 0` (default) applies the √N rule, so the
    * inherent within-cell quadratic is N^1.5; the pair volume never
    * leaves its task (a dense per-cell kernel emits a rounding-margin
    * shortlist that a Catalyst window re-ranks — q218's top-5 stage IS
    * this graph at k = 5). The primitive under SemDeDup-style semantic
    * dedup, hubness audits, and graph-based curation; oracle-gated as
    * catalog row q222_knn_graph (full edge list vs a DuckDB unrolled
    * top-k). The kernel assumes task-sized cells: an explicit `nlist`
    * whose mean cell exceeds ~8k vectors falls back to the distributed
    * join+window form — same expressions, identical output, no
    * single-task corpus funnel at e.g. nlist = 1. */
  def knnGraph(spark: SparkSession, dir: String, k: Int = 5,
      nlist: Int = 0): DataFrame =
    operators.Similarity.knnGraph(spark, dir, k, nlist)

  /** Retrieval evaluation (MRR + binary NDCG@10 against the corpus's
    * own near-dup pseudo-qrels) with the candidate scope open:
    * `probes = 0` ranks the full corpus per anchor (q217's
    * ground-truth brute form); `probes ≥ 1` ranks only each anchor's
    * top-`probes` IVF cells (q220 at probes = 2) and adds the n_cand
    * cost accounting column. Read probed against brute as
    * cost-vs-ground-truth — candidate filtering makes out-of-cell
    * twins unreachable but can RAISE per-anchor rank metrics by
    * removing distractors (q220's scaladoc has the caveat in full). */
  def retrievalEval(spark: SparkSession, dir: String, probes: Int = 0): DataFrame =
    if (probes == 0) operators.Similarity.bruteRetrievalEval(spark, dir)
    else operators.Similarity.probedRetrievalEval(spark, dir, probes)

  /** MinHash-LSH candidate pairs verified by exact n-gram Jaccard,
    * filtered to `minJaccard` — q25→q26's candidates→verify chain. */
  def textNearDupPairs(spark: SparkSession, dir: String,
      minJaccard: Double = 0.8): DataFrame =
    operators.Dedup.jaccardPairs(spark, dir)
      .filter(col("jaccard") >= minJaccard)

  /** Banded-SRP embedding near-dup pairs — q55's production pipeline
    * with the calibration knobs open. `bandBits = 0` (the DEFAULT,
    * round 12) derives the width from the corpus by the occupancy rule
    * (`Similarity.bandBitsFor`: hold expected random-collision bucket
    * occupancy at the sf0.1 calibration's ≈ 7.8, so candidate volume is
    * linear in N; exactly the 16×8 production calibration for any
    * N ≤ 2000, wider — with the exact pre-flight histogram as the
    * backstop — as the corpus grows). An EXPLICIT `bandBits > 0` is
    * honored verbatim: the pre-flight raw-volume gate and the
    * candidate-fraction cap still throw on a width the corpus outgrew,
    * naming the fix. Recall at wider widths is the standard LSH trade —
    * raise `bands` alongside (recall = 1−(1−p^bits)^bands) when the
    * passing set matters more than cost. */
  def embeddingNearDupPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.85, bands: Int = 16, bandBits: Int = 0,
      capFraction: Double = 0.25): DataFrame = {
    require(bands > 0 && bandBits >= 0,
      s"need bands > 0 and bandBits >= 0 (0 = occupancy rule; got $bands, $bandBits)")
    require(threshold >= -1.0 && threshold <= 1.0 && capFraction > 0,
      s"need -1 <= threshold <= 1 and capFraction > 0 (got $threshold, $capFraction)")
    val cands =
      if (bandBits == 0)
        operators.Similarity.bandCandidatesAuto(
          spark, dir, bands, s"api:$bands,auto", capFraction)._1
      else {
        val planes = (0 until bands * bandBits)
          .map(p => operators.Similarity.testSignVector(s"p$p"))
        operators.Similarity.bandCandidates(
          spark, dir, planes, bands, bandBits, s"api:$bands,$bandBits", capFraction)
      }
    operators.Similarity.verified(
      operators.Similarity.embNorm(spark, dir), cands)
      .filter(col("cosine") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Weighted PageRank over the customer–supplier order graph with the
    * knobs open (q100 fixes iterations = 5, damping = 0.85). Returns
    * the raw `(node, r)` rank vector, Σr = 1. A non-empty `teleportTo`
    * personalizes it: restart mass lands on those nodes only, so ranks
    * measure graph proximity to the seed set (node ids are `custkey*2`
    * / `suppkey*2+1`). */
  def pagerank(spark: SparkSession, dir: String, iterations: Int = 5,
      damping: Double = 0.85, teleportTo: Seq[Long] = Nil): DataFrame = {
    require(iterations > 0 && iterations <= 64,
      s"need 0 < iterations <= 64 (got $iterations)")
    require(damping > 0 && damping < 1, s"need 0 < damping < 1 (got $damping)")
    require(teleportTo.size <= 1000,
      s"teleport seed sets are small by definition (got ${teleportTo.size}; " +
        "use a join-based variant beyond 1000 seeds)")
    operators.Graph.pagerank(spark, dir, iterations, damping, teleportTo)
  }

  /** Distributed connected components over ANY undirected edge list
    * given as one direction `(src, dst)` — the pointer-jumping core
    * behind duplicate clustering (q50) and incremental dedup (q57),
    * opened to library callers. Returns `(doc_id, lbl)`, `lbl` = min
    * node id of the component, for every node incident to an edge.
    * The returned frame is persisted by the loop (each round's
    * convergence check materializes it); the caller owns the
    * lifecycle — `.unpersist()` when done, or hand it to a memo. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 32): DataFrame = {
    require(maxRounds > 0 && maxRounds <= 64,
      s"need 0 < maxRounds <= 64 (got $maxRounds)")
    operators.Components.run(pairs, maxRounds).labels
  }

  /** BFS hop distance from a seed node over the order graph (q103
    * fixes seed = supplier 1, rounds = 3). Node ids are `custkey*2` /
    * `suppkey*2+1`; the seed must be a graph node — a typo'd id would
    * return a lone zero-distance row, so refuse it eagerly. Unreached
    * nodes are absent, not NULL. */
  def hopDistance(spark: SparkSession, dir: String, seed: Long,
      rounds: Int = 3): DataFrame = {
    // the rounds bound (and its 2^rounds-plan rationale) lives in ONE
    // place: operators.Graph.hopDistance refuses invalid values itself
    val nodes = operators.Graph.orderEdges(spark, dir)
      .select(col("src")).filter(col("src") === seed)
    require(nodes.limit(1).count() == 1,
      s"seed $seed is not a graph node (ids are custkey*2 / suppkey*2+1)")
    operators.Graph.hopDistance(spark, dir, seed, rounds)
  }

  /** Token-blocked fuzzy name matching with the edit-distance knob
    * open (q101 fixes maxDist = 2). */
  def fuzzyMatches(spark: SparkSession, dir: String, maxDist: Int = 2): DataFrame = {
    require(maxDist >= 0 && maxDist <= 16, s"need 0 <= maxDist <= 16 (got $maxDist)")
    operators.Dedup.fuzzyNamePairs(spark, dir, maxDist)
  }

  private val Identifier = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** ANALYZE-style column statistics over ANY frame (q106 fixes the
    * lineitem measures): per-column row/null/exact-NDV/min-max in one
    * Expand pass. Columns must share a type family (`lo`/`hi` share an
    * output slot) and be plain identifiers (they reach a `stack()`
    * SQL string). */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    require(cols.distinct.size == cols.size,
      s"duplicate columns: ${cols.diff(cols.distinct).distinct.mkString(", ")}")
    cols.foreach { c =>
      require(Identifier.matches(c), s"not a plain identifier: '$c'")
      require(df.columns.contains(c), s"no such column: '$c'")
    }
    operators.Relational.columnStats(df, cols)
  }

  /** Weighted sampling without replacement over ANY frame (q105 fixes
    * documents by length): top-`k` by deterministic exponential-race
    * key, inclusion ∝ `weightCol` (floor-guarded at 1), re-run stable
    * — never `rand()`. Change `salt` to draw an independent sample. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int = 100, salt: String = "#graft-wsample"): DataFrame = {
    require(k > 0, s"need k > 0 (got $k)")
    require(idCol != weightCol, "idCol and weightCol must differ")
    Seq(idCol, weightCol).foreach { c =>
      require(df.columns.contains(c), s"no such column: '$c'")
      // the output adds these two names; a colliding input column
      // would be silently overwritten (rank) or ambiguous (key_ns)
      require(c != "rank" && c != "key_ns",
        s"'$c' collides with a generated output column (rank, key_ns)")
    }
    operators.Curation.weightedSample(df, idCol, weightCol, k, salt)
  }

  /** Streaming/batch ANN-index rows for any (vec_id, embedding) frame
    * — append these per shard/micro-batch; bit-identical to a batch
    * rebuild (deterministic centroids). */
  def indexRows(vectors: DataFrame): DataFrame =
    operators.Similarity.indexRows(vectors)

  /** Materialize the curated corpus (keeper policy + PII scrub +
    * leakage-repaired splits), partitioned by split. */
  def curatedSnapshot(spark: SparkSession, dir: String, outDir: String): DataFrame =
    operators.Curation.materializeCurated(spark, dir, outDir)

  /** SCD Type-2 validity intervals for any tracked event column (q110
    * fixes event_type). The column must exist and not collide with the
    * frame the builder derives. */
  def scd2History(spark: SparkSession, dir: String,
      attrCol: String = "event_type"): DataFrame = {
    require(attrCol == "event_type" || attrCol == "props" || attrCol == "value",
      s"attrCol must be an events payload column (event_type, props, value); got '$attrCol'")
    operators.Temporal.scd2History(spark, dir, attrCol)
  }

  /** Peak session concurrency per time bucket (q111 fixes 30-min gap,
    * day buckets). `bucketUs` is the prefix-sum granularity — smaller
    * buckets bound per-task boundary counts at higher densities. */
  def concurrency(spark: SparkSession, dir: String,
      gapUs: Long = 1800000000L, bucketUs: Long = 86400000000L): DataFrame = {
    require(gapUs > 0, s"need gapUs > 0 (got $gapUs)")
    require(bucketUs >= 60000000L,
      s"need bucketUs >= 1 minute (got $bucketUs) — finer buckets make the " +
        "offset frame itself large; shrink only as densities demand")
    operators.Temporal.concurrency(spark, dir, gapUs, bucketUs)
  }

  /** As-of snapshot reconciliation at an ad-hoc cutoff (q113 fixes
    * 2024-01-16): per-user latest state before `cutoffUs` vs now,
    * labeled added / changed / unchanged. */
  def snapshotDiff(spark: SparkSession, dir: String, cutoffUs: Long): DataFrame =
    operators.Temporal.snapshotDiff(spark, dir, cutoffUs)

  /** Last-touch attribution with the touch set, conversion event, and
    * lookback horizon open (q114 fixes click/view → purchase, 7 d). */
  def attribution(spark: SparkSession, dir: String,
      touchTypes: Seq[String] = Seq("click", "view"),
      conversionType: String = "purchase",
      lookbackUs: Long = 7L * 86400000000L): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(!touchTypes.contains(conversionType),
      s"conversion '$conversionType' cannot also be a touch type — every " +
        "conversion would attribute to itself")
    require(lookbackUs > 0, s"need lookbackUs > 0 (got $lookbackUs)")
    operators.Temporal.attribution(spark, dir, touchTypes, conversionType, lookbackUs)
  }

  /** Triangle census over ANY undirected edge list `(a, b)` (q112
    * fixes the part co-purchase projection). The census core requires
    * canonical edges (distinct, a < b, no loops) — violations would
    * silently double-count degrees and wedges — so this entry point
    * NORMALIZES first: endpoints ordered, self-loops and null
    * endpoints dropped, duplicates (including reversed duplicates)
    * collapsed. */
  def triangleCensus(pairs: DataFrame): DataFrame = {
    require(pairs.columns.toSeq.take(2) == Seq("a", "b"),
      s"expected leading columns (a, b); got ${pairs.columns.toSeq.mkString(", ")}")
    val canonical = pairs
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b")) // also drops null endpoints
      .distinct()
    operators.Graph.triangleCensus(canonical)
  }

  /** Item-to-item collaborative filtering with the neighbourhood size
    * open (q140 fixes top-5): per-part top-`topK` co-purchased parts
    * by basket cosine, from the persisted basket table. */
  def itemSimilarity(spark: SparkSession, dir: String, topK: Int = 5): DataFrame =
    operators.Association.itemSimilarity(spark, dir, topK)

  /** Per-type PSI drift between the halves of the observation window,
    * with the cutoff and bin count open (q142 fixes 2024-01-16 / 10
    * bins). For continuous scoring of a live stream against a frozen
    * reference, use [[streaming.DriftStream]]. */
  def psiDrift(spark: SparkSession, dir: String,
      cutoffUs: Long = 1705363200000000L, bins: Int = 10): DataFrame =
    operators.Timeseries.psiDrift(spark, dir, cutoffUs, bins)

  /** Daily-series autocorrelation per event type up to `maxLag`
    * (q143 fixes 7). */
  def acf(spark: SparkSession, dir: String, maxLag: Int = 7): DataFrame =
    operators.Timeseries.acf(spark, dir, maxLag)

  /** Benford first-digit audit over ANY frame's positive amount
    * column (q144 fixes orders.o_totalprice at cent precision).
    * `scale` is the fixed-point precision turning amounts into the
    * exact integers whose decimal strings yield the digits. */
  def benford(df: DataFrame, amountCol: String, scale: Int = 2): DataFrame =
    operators.Stats.benford(df, amountCol, scale)

  /** Deterministic Poisson-bootstrap 95% CI for the per-type mean
    * value, with the replicate count open (q145 fixes 100). */
  def bootstrapCi(spark: SparkSession, dir: String, reps: Int = 100): DataFrame =
    operators.Stats.bootstrapCi(spark, dir, reps)

  /** MERGE INTO as set algebra over a PERSISTED base and a change feed:
    *
    *   applied = (base ANTI-JOIN feed keys) ∪ (feed upserts)
    *
    * `feed` carries `opCol` ('D' deletes the key, anything else
    * upserts) plus exactly base's columns; at most one feed row per
    * key (enforce upstream with a last-write-wins rank — see q139).
    * Cost is delta-bounded: history is never rescanned, the anti-join
    * broadcasts whenever a day's feed is small, and both inputs keep
    * their own lineage (unlike the same-scan case, where q139's fused
    * one-scan form wins — MaintenanceSpec proves the two forms agree). */
  def cdcApply(base: DataFrame, feed: DataFrame, keyCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    val keys = feed.select(keyCols.map(col): _*)
    base.join(keys, keyCols, "left_anti")
      .unionByName(feed.filter(col(opCol) =!= "D").drop(opCol))
  }

  /** Synchronous weighted label-propagation communities over the order
    * graph with the round count open (q147 fixes 4). Returns
    * `(node, lbl)`; node ids are `custkey*2` / `suppkey*2+1`, labels
    * are the node ids the votes converge on. */
  def labelPropagation(spark: SparkSession, dir: String,
      rounds: Int = 4): DataFrame =
    operators.Graph.labelPropagation(spark, dir, rounds)

  /** Equi-depth histogram over ANY frame (q148 fixes events / 10
    * bins). `tieCol` must be a unique per-row key: ntile splits ties
    * positionally, so a non-unique sort would make bucket boundaries
    * run-dependent. */
  def equidepthHistogram(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, bins: Int = 10): DataFrame =
    operators.Stats.equidepthHistogram(df, groupCol, valueCol, tieCol, bins)

  /** IVF cell assignment after `rounds` Lloyd refinements of the
    * deterministic hash centroids (q149 reports the single-round
    * census). Returns `(vec_id, cluster)` — feed it to an index
    * rebuild when q149's census says refinement pays. */
  def lloydAssign(spark: SparkSession, dir: String,
      rounds: Int = 1): DataFrame =
    operators.Similarity.lloydAssign(spark, dir, rounds)

  /** Point-in-time SCD2 enrichment of every event, with the versioned
    * attribute open (q150 fixes event_type — q110's `scd2History`
    * contract). */
  def pointInTime(spark: SparkSession, dir: String,
      attrCol: String = "event_type"): DataFrame =
    operators.Temporal.pointInTime(spark, dir, attrCol)

  /** Hashed-feature linear quality classifier over ANY (id, text)
    * frame with the weight vector OPEN (q153 fixes the 64-bucket
    * deterministic stand-in): pass a trained fastText-style export as
    * integer milli-unit weights + bias and the scoring path — portable
    * feature hashing, exact-integer pooling, one terminal divide —
    * is unchanged, zero shuffles, no retraining plumbing. */
  def qualityClassify(df: DataFrame, idCol: String, textCol: String,
      milliWeights: Seq[Long], biasMilli: Long = 0L): DataFrame =
    operators.TextAnalysis.qualityClassify(df, idCol, textCol, milliWeights, biasMilli)

  /** Salted two-phase count/sum/min/max/mean profile over ANY frame —
    * the hot-key aggregation mitigation with the bucket count open
    * (q151 fixes lineitem / 16). `saltFrom` must be a deterministic
    * function of stable row attributes (task retries must reproduce
    * it); pass the row's primary key. */
  def saltedProfile(df: DataFrame, key: String, valueCol: String,
      buckets: Int = 16, saltFrom: Column): DataFrame =
    operators.Skew.saltedProfile(df, key, valueCol, buckets, saltFrom)

  /** Intra-corpus duplicated-span accounting with the gram-width knob
    * open (q155 fixes 8): wider = only long verbatim runs count,
    * narrower = more sensitive. Per-doc (dup_grams, spans, dup_tokens,
    * dup_frac) over the whole corpus. */
  def dupSpans(spark: SparkSession, dir: String, gramWidth: Int = 8): DataFrame =
    operators.Dedup.dupSpans(spark, dir, gramWidth)

  /** Winnowed fingerprints of ANY (doc_id, text) frame — the MOSS
    * selection (q159's function verbatim): ~40 % of gram hashes with
    * the ≥ 8-token detection guarantee. Stateless per doc, so it is
    * also the streaming per-shard index append. */
  def winnowFingerprints(docs: DataFrame): DataFrame =
    operators.Dedup.winnowFingerprints(docs)

  /** Winnowed match pairs with the evidence threshold open (q160 fixes
    * minShared = 2; 1 reports single-fingerprint coincidences too). */
  def winnowedPairs(spark: SparkSession, dir: String, minShared: Int = 2): DataFrame =
    operators.Dedup.winnowedPairs(spark, dir, minShared)

  /** Adamic–Adar supplier link prediction through shared order baskets
    * with the result size open (q156 fixes top-50). */
  def linkPrediction(spark: SparkSession, dir: String, topK: Int = 50): DataFrame =
    operators.Graph.linkPrediction(spark, dir, topK)

  /** Product-quantized ANN with the query-set and depth knobs open
    * (q157 fixes the 5 canonical queries, shortlist 20, k = 5). The
    * trained 16×16×4 codebook and its persisted index stay fixed —
    * they ARE the index artifact; `shortlist` trades recall for exact
    * rerank cost. */
  def pqSearch(spark: SparkSession, dir: String, queryIds: Seq[Long],
      k: Int = 5, shortlist: Int = 20): DataFrame =
    operators.Similarity.pqSearch(spark, dir, queryIds, k, shortlist)

  /** Perceptual dHashes of the corpus image assets (q158): 64-bit
    * difference hash halves from the real-decoded PPM pixels. */
  def imageHashes(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.queries("q158_image_dhash")(spark, dir)

  /** Tie-corrected Mann–Whitney U readout over ANY per-unit frame with
    * columns `m` (INTEGRAL metric — ranks over drifting double sums
    * would be nondeterministic) and `variant` (0/1). q161 fixes the
    * frame to per-user event counts under the standard salted arms. */
  def mannWhitney(perUnit: DataFrame): DataFrame =
    operators.Segmentation.mannWhitney(perUnit)

  /** l-diversity privacy audit (q162) over ANY frame: per
    * quasi-identifier class, the distinct and entropy diversity of the
    * sensitive column plus the failing flag at `l`. q162 fixes the
    * frame to events with (event_type, hour) quasi-identifiers and
    * user_id sensitive. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int = 3): DataFrame =
    operators.Curation.lDiversity(df, quasiCols, sensitiveCol, l)

  /** 2-D strict-dominance skyline (q163) of ANY frame over integer
    * axes — the O(n log n) contraction+window rewrite, never a
    * self-join. Callers own making the axes exact integers (cents, not
    * raw doubles). */
  def skyline(df: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame =
    operators.Relational.skyline(df, idCol, xCol, yCol)

  /** Z-order vs linear layout report (q164) for ANY frame carrying two
    * non-negative integer dimensions: per-file min/max footer stats
    * under both orders — the "should I OPTIMIZE this table" readout
    * for [[sources.Layout.writeZOrdered]]. */
  def layoutReport(df: DataFrame, idCol: String, aCol: String,
      bCol: String, bits: Int = 6, nFiles: Int = 16): DataFrame =
    operators.Maintenance.layoutReport(df, idCol, aCol, bCol, bits, nFiles)

  /** Grid-density clusters (q165) of ANY (x, y) point frame:
    * cells ≥ `minPts` are cores, touching cores merge via the shared
    * pointer-jumping component engine; one row per cluster with mass
    * and bounding box. */
  def gridClusters(points: DataFrame, xCol: String, yCol: String,
      step: Double = 0.05, minPts: Long = 3): DataFrame =
    operators.Segmentation.gridClusters(points, xCol, yCol, step, minPts)

  /** Bloom-filter membership pre-test (q166): appends `hit` to `df` by
    * probing a bitmap built over `buildKeys`' single column — zero
    * false negatives, so `filter(hit = 1)` before an exact join is a
    * safe probe-side reduction (the explicit, engine-portable form of
    * Catalyst's runtime bloom join filter). */
  def withBloomHit(df: DataFrame, keyCol: String, buildKeys: DataFrame,
      bits: Int = 4096, hashes: Int = 3): DataFrame =
    operators.Relational.withBloomHit(df, keyCol, buildKeys, bits, hashes)

  /** Bloom-accelerated left-semi join: exact result (the bloom pass
    * only prunes definite non-members before the exact join). */
  def bloomSemiJoin(probe: DataFrame, keyCol: String,
      buildKeys: DataFrame): DataFrame = {
    val kc = buildKeys.columns.head
    withBloomHit(probe, keyCol, buildKeys)
      .filter(col("hit") === 1).drop("hit")
      .join(buildKeys, col(keyCol) === buildKeys(kc), "left_semi")
  }

  /** EXACT set-similarity join via prefix filtering (q167 with the
    * threshold knob open): every pair of `sets` rows (doc_id, tk) whose
    * set Jaccard ≥ `threshold` — zero false negatives, candidates
    * bounded by rare-element frequency instead of N²/2. Pass any
    * (doc_id, tk) frame — SET semantics: duplicate (doc_id, tk) rows
    * are collapsed here (they would otherwise distort set sizes, prefix
    * ranks, and the packed-array intersection); `None` uses the
    * documents table's 3-word shingle sets (raw tokens are not
    * discriminative on a common-vocabulary corpus). */
  def setSimilarityJoin(spark: SparkSession, dir: String,
      threshold: Double = 0.5, sets: Option[DataFrame] = None): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"need 0 < threshold <= 1 (got $threshold)")
    sets match {
      case Some(toks) => operators.SetSimilarity.prefixJoin(toks.distinct(), threshold)
      case None => // default shingle sets: memoized prefix table
        operators.SetSimilarity.prefixJoinDefault(spark, dir, threshold)
    }
  }

  /** Asymmetric containment audit of the LSH near-dup candidates (q168
    * with a floor knob): pairs where EITHER side's shingle containment
    * |A∩B|/|side| reaches `minContainment` — the quote-inclusion /
    * benchmark-inside-document cases symmetric Jaccard misses. */
  def containmentPairs(spark: SparkSession, dir: String,
      minContainment: Double = 0.8): DataFrame = {
    require(minContainment >= 0 && minContainment <= 1,
      s"need 0 <= minContainment <= 1 (got $minContainment)")
    SparkEntry.queries("q168_containment_audit")(spark, dir)
      .filter(greatest(col("cont_a"), col("cont_b")) >= minContainment)
  }

  /** Sorted-neighborhood ER pairs (q170 with the knobs open): verified
    * near-spellings within `window` ranks of one lexicographic sort of
    * the name dictionary — the blocking discipline that still fires
    * when a typo lands in every token (q101's token blocking finds
    * nothing to join on there); run both and union for full recall. */
  def sortedNeighborhood(spark: SparkSession, dir: String,
      window: Int = 10, maxDist: Int = 2): DataFrame = {
    require(window > 0 && maxDist >= 0,
      s"need window > 0 and maxDist >= 0 (got $window, $maxDist)")
    operators.Dedup.sortedNeighborhoodPairs(spark, dir, window, maxDist)
  }

  /** Pearson correlation matrix over arbitrary numeric columns of any
    * frame (q169 fixes the four lineitem measures): one scan computes
    * all first/second moments; output is the upper triangle
    * (var_a, var_b, n_rows, corr). */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns (got $cols)")
    operators.Stats.correlationMatrixOf(df, cols)
  }

  /** k-core of the order graph by iterative peeling (q172 fixes k = 4,
    * 3 rounds): surviving `(node, deg)` after `rounds` delete-below-k
    * passes. Fixed small `rounds` keeps the unrolled lazy plan sane;
    * peel to convergence by calling with increasing rounds until the
    * node set stabilizes (GraphSpec does exactly that). */
  def kCore(spark: SparkSession, dir: String, k: Int = 4,
      rounds: Int = 3): DataFrame =
    operators.Graph.kCore(spark, dir, k, rounds)

  /** Next-fit small-file compaction manifest over ANY
    * (source, doc_id, n_chars) frame with the target size open (q173
    * fixes documents / 32 KiB): per-file doc count, bytes and id span,
    * in (source, doc_id) pack order. */
  def compactionPlan(docs: DataFrame, targetBytes: Long = 32768L): DataFrame =
    operators.Maintenance.compactionPlan(docs, targetBytes)

  /** Quantile normalization of `events`-shaped frames
    * (event_id, event_type, value): every value mapped to the pooled
    * distribution at its within-group rank (q174). After the map every
    * group draws from the SAME distribution — the cross-source score
    * calibration step before one global threshold is meaningful. */
  def quantileNormalize(events: DataFrame): DataFrame =
    operators.Stats.quantileNormalize(events)

  /** Jaro–Winkler similarity matrix over the part-name dictionary with
    * the match threshold open (q175 fixes 0.9). The scorer itself is
    * the codegen'd `graft_jaro_winkler` expression — usable directly
    * in SQL once [[GraftSession]] or [[GraftExtensions]] registered
    * the function family. */
  def jaroWinklerPairs(spark: SparkSession, dir: String,
      matchThreshold: Double = 0.9): DataFrame = {
    require(matchThreshold >= 0 && matchThreshold <= 1,
      s"need 0 <= matchThreshold <= 1 (got $matchThreshold)")
    operators.Dedup.jaroWinklerPairs(spark, dir, matchThreshold)
  }

  /** Exact per-group lower median by histogram-refinement selection
    * (q176 fixes events / 256 buckets) — exact order statistic, no
    * per-group full sort; works on any (event_type, value, event_id)
    * shaped frame. */
  def exactMedian(events: DataFrame, buckets: Int = 256): DataFrame =
    operators.Stats.exactMedian(events, buckets)

  /** Largest-remainder proration of order totals across lineitems
    * (q177): per-lineitem integer cents summing exactly to each
    * order's total cents. */
  def prorate(lineitem: DataFrame, orders: DataFrame): DataFrame =
    operators.Allocation.prorate(lineitem, orders)

  /** Weight-of-evidence binning of order value against fulfillment
    * with the bin count open (q179 fixes 10). */
  def woeBinning(orders: DataFrame, bins: Int = 10): DataFrame =
    operators.Stats.woeBinning(orders, bins)

  /** Frequent part triples by Apriori candidate pruning with the
    * support threshold open (q180 fixes 2 — raise it on a corpus
    * where level-2 survives at scale). */
  def aprioriTriples(spark: SparkSession, dir: String, minSup: Long = 2L): DataFrame =
    operators.Association.aprioriTriples(spark, dir, minSup)

  /** Bradley–Terry strengths from within-order supplier contests with
    * the MM round count open (q181 fixes 3). */
  def bradleyTerry(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame =
    operators.Association.bradleyTerry(spark, dir, rounds)

  /** Median/MAD robust outlier report over any
    * (event_type, value, event_id) frame (q182). */
  def madOutliers(events: DataFrame): DataFrame =
    operators.Stats.madOutliers(events)

  /** Nearest-event join with tolerance over any events-shaped frame,
    * with the probe/build types and the tolerance open (q183 fixes
    * purchase→click at ±10 min). */
  def nearestEvent(events: DataFrame, probeType: String = "purchase",
      buildType: String = "click", tolUs: Long = 600000000L): DataFrame =
    operators.Temporal.nearestEvent(events, probeType, buildType, tolUs)

  /** End-to-end entity resolution over the part-name dictionary:
    * q101 ∪ q170 ∪ q175 evidence closed by the shared component
    * engine; every name with its resolved entity and canonical flag
    * (q184). */
  def entityClusters(spark: SparkSession, dir: String): DataFrame =
    operators.Dedup.entityClusters(spark, dir)

  /** Calendarized revenue recognition: order totals spread ratably
    * (integer cents, early-month remainders) over order-month →
    * latest-shipment-month, rolled up to a month ledger (q185). */
  def revenueRecognition(lineitem: DataFrame, orders: DataFrame): DataFrame =
    operators.Allocation.revenueRecognition(lineitem, orders)

  /** Exact two-sample Kolmogorov–Smirnov drift per event type with the
    * window cutoff open (q186 fixes the observation midpoint). */
  def ksDrift(spark: SparkSession, dir: String, cutoffUs: Long): DataFrame =
    operators.Timeseries.ksDrift(spark, dir, cutoffUs)

  /** Deterministic ±1 Johnson–Lindenstrauss projection of the
    * embeddings table (q187 fixes 16 target dims). */
  def jlProject(spark: SparkSession, dir: String): DataFrame =
    operators.Similarity.jlProject(spark, dir)

  /** Count-min-sketch heavy-hitter audit with the report size open
    * (q188 fixes top-20). */
  def cmsHeavyHitters(spark: SparkSession, dir: String, topK: Int = 20): DataFrame =
    operators.TextAnalysis.cmsHeavyHitters(spark, dir, topK)

  /** PMI collocation mining with the support floor and report size
    * open (q189 fixes c ≥ 5, top-20). */
  def pmiCollocations(spark: SparkSession, dir: String,
      minCount: Long = 5L, topK: Int = 20): DataFrame =
    operators.TextAnalysis.pmiCollocations(spark, dir, minCount, topK)

  /** Frame-level audio features over the real-decoded WAV corpus with
    * the frame width open (q193 fixes 256 samples). */
  def audioFrames(spark: SparkSession, dir: String, frame: Int = 256): DataFrame =
    multimodal.Multimodal.audioFrames(spark, dir, frame)

  /** LTTB shape-preserving series downsampling with the output budget
    * open (q197 fixes 24 points per type). */
  def lttb(spark: SparkSession, dir: String, nOut: Int = 24): DataFrame =
    operators.Timeseries.lttb(spark, dir, nOut)

  /** Greedy set-cover source selection with the budget open (q201
    * fixes 5 picks). */
  def setCover(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    operators.Curation.setCover(spark, dir, k)

  /** MMR diversified retrieval with query, shortlist, budget and
    * relevance/diversity blend open (q202 fixes 0, 30, 8, 0.7). */
  def mmr(spark: SparkSession, dir: String, queryId: Long = 0L,
      pool: Int = 30, k: Int = 8, lambda: Double = 0.7): DataFrame =
    operators.Similarity.mmr(spark, dir, queryId, pool, k, lambda)

  /** Newman-Girvan modularity of the LPA communities with the
    * propagation depth open (q203 fixes 4 rounds). */
  def modularity(spark: SparkSession, dir: String, rounds: Int = 4): DataFrame =
    operators.Graph.modularity(spark, dir, rounds)

  /** Rendezvous (highest-random-weight) shard for any id column, with
    * the shard count open (q207 audits the 8 → 9 reshard): attaches
    * `shard` ∈ [0, shards); growing the set moves only docs whose new
    * argmax IS the new shard. */
  def rendezvousRoute(df: DataFrame, idCol: String, shards: Int,
      out: String = "shard"): DataFrame =
    operators.Skew.rendezvousRoute(df, idCol, shards, out)

  /** Exact weight-cumulative quartiles of `valueCol` under integer
    * `weightCol` mass (q208 fixes price-by-quantity), histogram
    * refinement — no full sort. */
  def weightedQuartiles(df: DataFrame, valueCol: String, weightCol: String,
      buckets: Int = 1024): DataFrame =
    operators.Stats.weightedQuartiles(df, valueCol, weightCol, buckets)

  /** Exact-quota 80/10/10 stratified split audit by largest remainder
    * with the hash salt open (q209 fixes "#graft-quota"); counts per
    * (source, lang, split) hit the Hamilton quota exactly. */
  def quotaSplit(docs: DataFrame, salt: String = "#graft-quota"): DataFrame =
    operators.Curation.quotaSplit(docs, salt)

  /** Hilbert d-index of two [0,64) dimensions as a layout sort key
    * (q210 compares it against Z-order file spans); branch-free
    * integer algebra, per-row scalar. */
  def hilbertIndex(df: DataFrame, xCol: String, yCol: String,
      out: String = "hd"): DataFrame =
    operators.Maintenance.withHilbert(df, xCol, yCol, out)

  /** Point-level DBSCAN over any (id, x, y) frame: cell-bucketed
    * ε-join, core/border/noise trichotomy, components on the shared
    * pointer-jumping engine.
    *
    * The DEFAULT radius is DENSITY-NORMALIZED (round 12, promoting
    * q223's production rule to the facade): `eps <= 0` (the default)
    * computes ε(N) = ε₀/√(N/N₀) from the frame's own row count against
    * the (ε₀ = 0.05, N₀ = 2000) sf0.1 calibration — open via
    * `eps0`/`calibN` for a differently-calibrated corpus — so the
    * expected ε-neighborhood, hence the ε-graph edge volume and the
    * whole build, stays LINEAR in N (q223's measured ladder: 1.26× wall
    * for 100× data; the fixed radius's build was 16.5× costlier at sf30
    * and degenerates toward one giant cluster as density grows). A
    * FIXED radius is the explicit opt-in: pass `eps > 0` verbatim
    * (q212 stays the fixed-ε calibration row). ApiSpec pins the
    * dispatch: default == explicit ε₀/√(N/N₀), and an explicit eps is
    * honored unchanged. */
  def dbscan(points: DataFrame, idCol: String, xCol: String, yCol: String,
      eps: Double = 0.0, minPts: Long = 4L,
      eps0: Double = 0.05, calibN: Long = 2000L): DataFrame = {
    require(eps0 > 0 && calibN > 0,
      s"need eps0 > 0 and calibN > 0 (got $eps0, $calibN)")
    val e =
      if (eps > 0) eps
      else {
        val n = points.count()
        require(n > 0, "density-normalized dbscan needs a non-empty frame " +
          "(pass an explicit eps > 0 to scan an empty one)")
        operators.Segmentation.scaledEps(n, eps0, calibN)
      }
    operators.Segmentation.dbscan(points, idCol, xCol, yCol, e, minPts)
  }

  /** Contrastive (anchor, positive, negative) triplet mining with the
    * near-dup thresholds open (q213 fixes 80/60): text near-dup
    * positives, IVF-cell-local embedding hard negatives. */
  def contrastiveTriplets(spark: SparkSession, dir: String,
      posPct: Int = 80, exclPct: Int = 60): DataFrame =
    operators.Similarity.contrastiveTriplets(spark, dir, posPct, exclPct)
}
