package graft

/** Physical-plan regression gate: the properties that make the catalog
  * scale (SCALE.md) must stay visible in the executed plans — pushed
  * filters, pruned scans, broadcast dimensions, pre-shuffle window
  * group limits, and shuffle counts. A refactor that silently trades
  * one of these away fails here, not at 100 TB. */
class PlanSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("round-7 fused kernels own their plans (no silent fallback to column algebra)") {
    // each kernel replaced a shape that exploded rows or overwhelmed the
    // codegen budget (SCALE.md "fused-kernel discipline"); a refactor
    // that silently reverts to the algebraic form must fail here, not
    // resurface as a scale regression two rounds later
    def owns(q: String, kernel: String): Unit = {
      val p = plan(q).toLowerCase
      assert(p.contains(kernel) || p.contains(s"graft_$kernel"),
        s"$q plan lost its fused kernel $kernel")
    }
    owns("q112_triangle_census", "intersectcountsorted")
    owns("q167_set_join_prefix", "intersectcountsorted")
    owns("q194_byte_entropy", "byteentropystats")
    owns("q221_multiprobe_nlist64", "cellscores")
    owns("q41_knn_ivf", "cellscores")
    owns("q88_multiprobe_ivf", "cellscores")
    owns("q28_embedding_neardup", "bandbuckets")
  }

  test("assignCells carries its centroid matrix as O(1) Literal nodes at large nlist") {
    // round-9 parse-tax lock: the nlist×64 centroid matrix must ride
    // ONE typedLit Literal into graft_cell_scores — the previous
    // expr("array(…)") string form minted nlist×64 parsed Literal
    // nodes and taxed the DRIVER 1–13 s of plan build per query at
    // the √N geometry (AssignProbe, SCALE.md round 9; the fix bought
    // ~14 s of catalog wall). A refactor that reintroduces a parsed
    // matrix at nlist = 256 would census 16,384+ Literals and fail
    // here instead of resurfacing as silent driver drag.
    import org.apache.spark.sql.catalyst.expressions.Literal
    val assigned = Graft.ivfAssign(
      graft.sources.Tables.embeddings(spark, sfDir), 256)
    val nLits = assigned.queryExecution.analyzed
      .flatMap(_.expressions)
      .flatMap(_.collect { case l: Literal => l })
      .size
    assert(nLits >= 1, "expected at least the matrix literal")
    assert(nLits < 100,
      s"assignCells(analyzed) carries $nLits Literal nodes at nlist=256 — " +
        "the centroid matrix is no longer a single typedLit Literal")
  }

  test("q0: predicates and projection reach the parquet scan") {
    val p = plan("q0_filter_project")
    p should include("PushedFilters: [IsNotNull(l_returnflag)")
    p should include("EqualTo(l_returnflag,R)")
    p should include("GreaterThan(l_quantity,45.0)")
    (p should not).include("l_shipdate") // pruned column never read
  }

  test("q3: dimension joins broadcast, never shuffle the fact side") {
    val p = plan("q3_join_broadcast_dims")
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
  }

  test("q35: top-N pushes a pre-shuffle window group limit") {
    val p = plan("q35_flagship_analysis")
    p should include("WindowGroupLimit")
    p.split("Exchange").head // partial limit must appear before the first exchange:
    p.indexOf("WindowGroupLimit") should be > 0
    val firstExchange = p.indexOf("Exchange")
    p.lastIndexOf("WindowGroupLimit") should be > firstExchange
  }

  test("q1: aggregation is partial+final (map-side combine)") {
    val p = plan("q1_pricing_summary")
    p should include("partial_sum")
    p should include("HashAggregate")
  }

  test("q29: query vectors broadcast against the scan (no N×N shuffle)") {
    val p = plan("q29_knn_brute_force")
    p should include("BroadcastNestedLoopJoin")
    p.toLowerCase should include("dotproduct") // the native expression, not zip_with
  }

  test("q22: global top-k plans as TakeOrderedAndProject") {
    val p = plan("q22_top_global")
    p should include("TakeOrderedAndProject")
  }

  test("q52: partial+final aggregate, pruned scan, and ONE corpus explode") {
    val p = plan("q52_tfidf")
    p should include("partial_count")
    p should include("ReadSchema: struct<doc_id:bigint,text:string>")
    // df comes from a window over the tf aggregate — a second explode
    // branch would mean the corpus is read and tokenized twice
    p.sliding("Generate".length).count(_ == "Generate") shouldBe 2 // tree line + detail header
  }

  test("q53: stratified sample scan prunes to the three output columns") {
    val p = plan("q53_stratified_sample")
    p should include("ReadSchema: struct<event_id:bigint,user_id:bigint,event_type:string>")
  }

  test("q41: IVF probe broadcasts queries and joins on cluster — no fit, no cross join") {
    val p = plan("q41_knn_ivf")
    p should include("BroadcastHashJoin")
    p should include("Left keys [1]: [cluster")
    (p should not).include("BroadcastNestedLoopJoin")
  }

  test("q56: range join equi-keys on (user, time-bucket) — density-guarded, no BNLJ") {
    val p = plan("q56_range_join_bucketed")
    // the join must carry BOTH keys so a hot user's pairs are bounded
    // per 5-minute bucket, not quadratic per user (q20's shape)
    p should include("keys [2]")
    (p should not).include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
  }

  test("q62: PII scrub is map-side — no Exchange except the presentation sort") {
    val p = plan("q62_pii_scrub")
    p.sliding("Exchange".length).count(_ == "Exchange") shouldBe 2 // tree line + detail header
    p should include("rangepartitioning(doc_id") // and it IS the sort
    p should include("ReadSchema: struct<doc_id:bigint,text:string>")
  }

  test("q63: packing shuffles ONCE on the shard key, then windows in place") {
    val p = plan("q63_sequence_packing")
    p.sliding("hashpartitioning".length).count(_ == "hashpartitioning") shouldBe 1
    p should include("hashpartitioning(pack_shard")
    p should include("Window")
    (p should not).include("SortMergeJoin") // no join anywhere in packing
  }

  test("q65: gram audit equi-joins and prunes both document scans") {
    val p = plan("q65_exact_decontamination")
    (p should not).include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
    p should include("ReadSchema: struct<doc_id:bigint,text:string>")
    p should include("partial_count") // per-doc hit counts combine map-side
  }

  test("q67: sampling scan joins the per-source rates by broadcast") {
    val p = plan("q67_mix_rebalance")
    p should include("BroadcastHashJoin")
    (p should not).include("CartesianProduct")
  }

  test("q66: funnel flags evaluate in ONE corpus scan, never a stage-frame join") {
    val p = plan("q66_curation_funnel")
    // one parquet scan of documents for all per-row flags; the only
    // join is against the cached non-keeper labels
    p.sliding("documents.parquet".length).count(_ == "documents.parquet") shouldBe 1
    (p should not).include("SortMergeJoin")
  }

  test("q69: top-K vocabulary is TakeOrdered over a pruned single-column scan") {
    val p = plan("q69_vocab_coverage")
    p should include("TakeOrderedAndProject")
    p should include("partial_count")
    p should include("ReadSchema: struct<text:string>")
  }

  test("q71: chunking is a pure flatMap — Generate over a pruned scan, sort is the only exchange") {
    val p = plan("q71_doc_chunking")
    p should include("Generate") // the explode of chunk starts
    (p should not).include("hashpartitioning") // no join, no aggregate
    (p should not).include("SortMergeJoin")
    p should include("rangepartitioning(doc_id")
    p should include("ReadSchema: struct<doc_id:bigint,text:string>")
  }

  test("q72: semantic-prune pairs come from an equi-join on the cell id") {
    val p = plan("q72_semantic_prune")
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
    p should include("InMemoryTableScan") // shared persisted embNorm — one parquet read
  }

  test("q73: the small labels table broadcasts; the corpus never shuffles") {
    val p = plan("q73_cluster_canonical")
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
    p should include("WindowGroupLimit") // argmax pruned before its exchange
    p should include("ReadSchema: struct<doc_id:bigint,text:string>")
  }

  test("q74: drift re-uses the vocabulary exchange — one corpus scan at runtime") {
    val df = SparkEntry.queries("q74_token_drift")(spark, sfDir)
    df.collect() // AQE folds the totals branch onto counts' exchange
    val fin = df.queryExecution.executedPlan.toString
    fin should include("ReusedExchange")
    fin should include("TakeOrderedAndProject") // top-K, never a vocab sort
    (fin should not).include("SortMergeJoin") // totals arrive by broadcast
  }

  test("q70: interleave broadcasts the weight total and range-partitions the key order") {
    val p = plan("q70_source_interleave")
    // the 1-row weight total arrives by broadcast, never a shuffle join
    p should include("BroadcastNestedLoopJoin")
    (p should not).include("SortMergeJoin")
    // pos_in_source is a PER-SOURCE window (parallel across sources)...
    p should include("hashpartitioning(source")
    // ...and the output order is a range-partitioned sort — a dataloader
    // reads key ranges in parallel; no global row index materializes
    p should include("rangepartitioning(interleave_key")
  }

  test("sensor-partitioned entry table prunes partitions on sensor predicates") {
    import spark.implicits._
    // the Cassandra partition-key analog (reference schema.sql:9): the
    // entry table is laid out by sensor, so a per-sensor query must
    // touch only that sensor's directory — a PartitionFilter in the
    // scan, not a post-scan Filter over all partitions
    val dir = java.nio.file.Files.createTempDirectory("graft-partitioned").toString
    fixture.write.mode("overwrite").partitionBy("sensor").parquet(dir)
    val q = spark.read.parquet(dir).filter($"sensor" === FirstSensor).select($"value")
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    p should include("PartitionFilters: [isnotnull(sensor")
    p should include(s"= $FirstSensor)")
    // and the pruned scan returns exactly that sensor's rows
    q.count() shouldBe fixture.filter($"sensor" === FirstSensor).count()
  }

  test("q75: boilerplate mining never goes all-pairs") {
    val p = plan("q75_boilerplate_ngrams")
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
    p should include("Generate") // per-doc distinct grams explode map-side
  }

  test("q76: centroid explode feeds a partial aggregate — two exchanges total") {
    // executedPlan (not formatted explain) prints each node once, so the
    // Exchange count is the real shuffle count
    val p = SparkEntry.queries("q76_label_centroids")(spark, sfDir)
      .queryExecution.executedPlan.toString
    p should include("Generate") // posexplode in the scan stage
    // one hash Exchange for the (label, pos) aggregate + the final
    // presentation sort; the exploded rows themselves never shuffle
    p should include("Exchange hashpartitioning(label")
    p.sliding("Exchange ".length).count(_ == "Exchange ") shouldBe 2
  }

  test("q77: the corpus takes the cluster labels by broadcast, no corpus shuffle") {
    val p = plan("q77_leakage_repair")
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
  }

  test("q81: the metadata predicate is pushed to the documents scan") {
    val p = plan("q81_filtered_knn")
    // predicate-first filtered search: the lang filter reaches parquet,
    // and the eligible ids reach the vector table without a shuffle
    p should include("EqualTo(lang,en)")
    (p should not).include("SortMergeJoin")
  }

  test("q79/q80: source reports collapse map-side before any exchange") {
    // both scan the corpus once into #sources cells via partial+final
    // aggregation; window algebra then touches those few cells only
    plan("q79_source_quality") should include("partial_percentile")
    val p80 = plan("q80_temperature_mix")
    p80 should include("partial_sum")
    (p80 should not).include("CartesianProduct")
  }

  test("q82: topic cards never go all-pairs and combine map-side") {
    val p = plan("q82_cell_topics")
    (p should not).include("CartesianProduct")
    p should include("partial_count") // (cell, token) counts pre-shuffle
  }

  test("q83: quantize + rerank joins never go cartesian; native dot in both passes") {
    val p = plan("q83_quantized_knn")
    (p should not).include("CartesianProduct")
    p.toLowerCase should include("dotproduct")
  }

  test("q84: BM25 term counting is per-row HOF algebra — no explode, no sort-merge") {
    val p = plan("q84_bm25_search")
    (p should not).include("Generate") // tf via filter(), not explode
    (p should not).include("SortMergeJoin")
    p should include("partial_sum") // the one-row stats aggregate combines map-side
    (p should not).include("n_chars") // scan pruned to (doc_id, text)
  }

  test("q85: pair counts combine map-side; the top-20 is TakeOrdered, not a global sort") {
    val p = plan("q85_bpe_pairs")
    p should include("partial_count")
    p should include("TakeOrderedAndProject")
  }

  test("q87: the repeat plan is one pruned scan contracted to source cells") {
    val p = plan("q87_repeat_plan")
    p should include("partial_count")
    (p should not).include("SortMergeJoin")
    (p should not).include("n_chars") // only (source, text) read
  }

  test("q88: multi-probe keeps q41's equi-join shape — no fit, no cross join") {
    val p = plan("q88_multiprobe_ivf")
    p should include("BroadcastHashJoin")
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
  }

  test("q89: the source matrix joins the pruned id→source projection, never cartesian") {
    val p = plan("q89_source_overlap")
    (p should not).include("CartesianProduct")
    p should include("partial_count")
    (p should not).include("n_chars") // documents scan pruned to (doc_id, source)
  }

  test("q90: the train side contracts to distinct grams before the novelty join") {
    val p = plan("q90_ngram_novelty")
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
    p should include("partial_count")
  }

  test("q91: per-type stats broadcast back over the events scan — no sort-merge") {
    val p = plan("q91_event_outliers")
    (p should not).include("SortMergeJoin")
    p should include("partial_count")
  }

  test("q94: both retrieval branches end in TakeOrdered, never a global sort") {
    val p = plan("q94_hybrid_rrf")
    p.sliding("TakeOrderedAndProject".length).count(_ == "TakeOrderedAndProject") should be >= 2
    p.toLowerCase should include("dotproduct") // dense branch uses the native expression
  }

  test("q96: the composed ANN path keeps the cell equi-join and scores packed bytes") {
    val p = plan("q96_quantized_ivf")
    p should include("BroadcastHashJoin")
    (p should not).include("CartesianProduct")
    p.toLowerCase should include("dotproductbytes") // ADC on the packed index
  }

  test("q99: the star join broadcasts every dimension chain and combines map-side") {
    val p = plan("q99_star_revenue")
    p should include("BroadcastHashJoin")
    (p should not).include("CartesianProduct")
    p should include("partial_sum")
    // region/date predicates prune before the fact join
    p should include("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)")
    p should include("IsNotNull(o_orderdate)")
  }

  test("q92: corpus-scale work ends at the per-source signature aggregate") {
    val p = plan("q92_source_signatures")
    p should include("partial_min") // signature merge combines map-side
    (p should not).include("SortMergeJoin")
  }

  test("q93: the histogram is one pruned scan contracted map-side") {
    val p = plan("q93_length_histogram")
    p should include("partial_count")
    (p should not).include("SortMergeJoin")
    (p should not).include("n_chars") // scan pruned to (source, text)
  }

  test("q78: the LM reuses the vocabulary exchange; no sort-merge anywhere") {
    val df = SparkEntry.queries("q78_unigram_surprisal")(spark, sfDir)
    df.collect() // AQE folds the totals branch onto counts' exchange
    val fin = df.queryExecution.executedPlan.toString
    fin should include("ReusedExchange")
    (fin should not).include("SortMergeJoin")
    (fin should not).include("CartesianProduct")
  }

  test("q100: rounds stay lazy over the cached edges; shuffle-hash, no re-sort") {
    val df = SparkEntry.queries("q100_pagerank")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    // round-13 design: the K catalog rounds ride ONE lazy linear tree
    // (labelPropagation's documented shape) — the round-5 per-round
    // localCheckpoint paid K sequential actions of pure stage latency
    // once the node count became a driver literal (measured 2.13 →
    // 1.74 s min at sf0.1, ABTime 5 sweeps); deep facade runs still
    // freeze every 8 rounds. The final plan therefore joins the
    // persisted edge memo directly, one shuffle-hash join per round.
    fin should include("InMemoryTableScan")
    // the rounds' rank joins stay shuffle-hash (the hint pins them;
    // AQE may legitimately demote the tiny first round to broadcast).
    // NOTE the string dump inlines the MEMO's one-per-session rebuild
    // lineage under InMemoryRelation — its build join may sort-merge
    // (a big⋈big aggregate paid once), so no blanket no-SMJ here; the
    // per-round shape is what this spec owns.
    "ShuffledHashJoin".r.findAllIn(fin).length should be >= 4
    (fin should not).include("CartesianProduct")
    // the node count is a driver literal now — no 1-row broadcast frame
    (fin should not).include("BroadcastNestedLoopJoin")
  }

  test("runtime bloom filters wire semi-join reduction on fact⋈filtered-dim joins") {
    // At 100 TB a selective dimension filter should prune the fact scan
    // BEFORE the shuffle; Catalyst injects a runtime bloom filter when
    // the size thresholds are met (creation side < 10 MB, application
    // scan > 10 GB by default). The sf0.001 fixture sits below the
    // application threshold, so relax it — and force the shuffle join
    // the production sizes imply — to prove the engine's plans qualify.
    val conf = spark.conf
    val savedBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedEnabled = conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.functions.col
      val li = graft.sources.Tables.lineitem(spark, sfDir)
      val pt = graft.sources.Tables.part(spark, sfDir).filter(col("p_size") === 1)
      val q = li.join(pt, li("l_partkey") === pt("p_partkey"))
        .groupBy(col("p_brand")).count()
      val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
      opt should include("might_contain") // fact rows drop at the scan, not post-shuffle
    } finally {
      conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      savedEnabled match {
        case Some(v) => conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", v)
        case None => conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      }
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
    }
  }

  test("q104/q105/q106: rollup merges map-side, sample is TakeOrdered, stats are one Expand pass") {
    val rollup = plan("q104_incremental_rollup")
    rollup should include("partial_sum") // both shards combine before their shuffles
    (rollup should not).include("CartesianProduct")
    val sample = plan("q105_weighted_sample")
    sample should include("TakeOrderedAndProject") // top-K, never a global sort
    val stats = plan("q106_table_stats")
    stats should include("Expand") // 4-way multi-distinct in ONE corpus pass
    stats should include("partial_count")
    // one pass means ONE scan in the whole plan (each scan contributes
    // exactly one Location: line in the formatted details)
    stats.split("Location:").length shouldBe 2
  }

  test("q101: candidates come from a token equi-join, never all-pairs") {
    val p = plan("q101_fuzzy_match")
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin") // blocking key is an equi-join
    p should include("BroadcastHashJoin") // dictionary verdicts map back by broadcast
    // the part scan reads only the name column
    p should include("ReadSchema: struct<p_name:string>")
  }

  test("q170: rank-window join runs as a bucketed equi-join, never a nested loop") {
    val p = plan("q170_sorted_neighborhood")
    (p should not).include("CartesianProduct")
    // q56's discipline: block equi-key + rank residual — a plain
    // rank-range condition would fall back to BroadcastNestedLoopJoin
    (p should not).include("BroadcastNestedLoopJoin")
    // the part scan reads only the name column
    p should include("ReadSchema: struct<p_name:string>")
  }

  test("q113: the diff is one scan and one shuffle — no second state subtree") {
    val p = plan("q113_snapshot_diff")
    p.split("Location:").length shouldBe 2 // ONE events scan
    (p should not).include("Join") // both states fuse into one aggregate
  }

  test("q110/q119: temporal windows ride one user_id shuffle; scans prune") {
    val scd = plan("q110_scd2_history")
    // change flag, version id, and interval close share the sort order:
    // exactly two exchanges total — the user_id hash + the presentation
    // range sort (each exchange prints twice: tree line + details)
    scd.sliding("Exchange".length).count(_ == "Exchange") shouldBe 4
    val twa = plan("q119_time_weighted_avg")
    twa should include("partial_sum")
    // column pruning only — ts's PHYSICAL type varies by dataset
    // generation (bigint nanos vs timestamp_ntz micros; Tables.events
    // normalizes both), so the assertion must not pin it
    twa should include regex
      "ReadSchema: struct<event_id:bigint,ts:[a-z_0-9]+,user_id:bigint,value:double>"
  }

  test("q111: prefix-sum offsets broadcast back; no global window over the deltas") {
    val p = plan("q111_concurrency")
    p should include("BroadcastHashJoin") // the #buckets-row offset frame
    // the boundary-delta running sum stays PARTITIONED by day_idx — the
    // phase-1 window must never serialize the deltas through one task
    p should include("windowspecdefinition(day_idx")
  }

  test("q112: sorted-adjacency merge-intersect closure; census is all equi-joins") {
    val p = plan("q112_triangle_census")
    (p should not).include("CartesianProduct")
    p should include("BroadcastHashJoin")
    // the lineitem scan reads only the two projection columns
    p should include("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>")
  }

  test("q118: delta terms combine map-side and dimensions broadcast") {
    val p = plan("q118_join_view_maintenance")
    p should include("partial_sum") // each term pre-aggregates to custkey
    p should include("BroadcastHashJoin") // customer→nation chain
    (p should not).include("CartesianProduct")
  }

  test("q115/q116/q117: profiling stays one or two corpus scans with broadcast stats") {
    val reg = plan("q115_bivariate_profile")
    reg should include("partial_sum") // six sufficient sums combine map-side
    reg.split("Location:").length shouldBe 2 // ONE lineitem scan
    val hist = plan("q116_value_histogram")
    hist should include("BroadcastHashJoin") // #types-row stats frame
    (hist should not).include("SortMergeJoin")
    val chi = plan("q117_chi_square_cells")
    chi.split("Location:").length shouldBe 2 // marginals are windows OVER the cells
    (chi should not).include("Join") // no marginal re-joins at all
  }

  test("q125/q127: the corpus contracts to the daily grid in one scan; windows ride it") {
    for (q <- Seq("q125_cusum_changepoint", "q127_forecast_backtest")) {
      val p = plan(q)
      p.split("Location:").length shouldBe 2 // ONE events scan each
      p should include("partial_count") // grid aggregate combines map-side
      p should include("windowspecdefinition(event_type") // per-key ordered scan
      (p should not).include("SortMergeJoin") // q125's stats frame broadcasts
    }
  }

  test("q126: seasonal profile and residual moments are windows over one grid") {
    val p = plan("q126_seasonal_decompose")
    p.split("Location:").length shouldBe 2 // ONE events scan
    (p should not).include("Join") // components never re-join the grid
  }

  test("q131: rolling bands are per-key frame windows over one grid scan") {
    val p = plan("q131_rolling_bands")
    p.split("Location:").length shouldBe 2 // ONE events scan
    p should include("windowspecdefinition(event_type") // never an unpartitioned window
    (p should not).include("Join")
  }

  test("q132: the Pareto prefix runs per revenue band; offsets broadcast back") {
    val p = plan("q132_pareto_classes")
    p should include("windowspecdefinition(band") // phase-1 local scans are partitioned
    p should include("BroadcastHashJoin") // #bands-row offset frame joins broadcast
    (p should not).include("SortMergeJoin")
  }

  test("q133: WAU is explode + hash distinct — the range join never appears") {
    val p = plan("q133_active_users")
    p should include("Arguments: explode(") // the 7-way window fan-out (Generate node)
    p should include("partial_count(distinct") // distinct combines map-side
    // the naive form (oracle) is a BNLJ range join; the engine must not
    // plan one anywhere except the broadcast 1-row min-day crossJoin
    p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) shouldBe 1
  }

  test("q134/q135: attribution and Gini are window passes over one scan, no joins") {
    val att = plan("q134_multitouch_attribution")
    att.split("Location:").length shouldBe 2 // ONE events scan
    att should include("windowspecdefinition(user_id") // assignment + path windows
    (att should not).include("Join") // never touches×conversions
    val gini = plan("q135_gini_concentration")
    gini.split("Location:").length shouldBe 2 // ONE lineitem scan
    gini should include("windowspecdefinition(l_returnflag")
    (gini should not).include("Join")
  }

  test("q136/q139: interval sweep and CDC merge fuse to one scan, one key shuffle, no join") {
    for (q <- Seq("q136_interval_coverage", "q139_cdc_apply")) {
      val p = plan(q)
      p.split("Location:").length shouldBe 2 // ONE corpus scan
      (p should not).include("Join") // merge/sweep fuse into aggregates
      val key = if (q.startsWith("q136")) "user_id" else "o_custkey"
      p should include(s"windowspecdefinition($key")
      // the key hash + the presentation sort only (each prints twice)
      p.sliding("Exchange".length).count(_ == "Exchange") shouldBe 4
    }
  }

  test("q137: the ntile triple rides one segment shuffle; customer broadcasts") {
    val p = plan("q137_rfm_segments")
    p should include("partial_sum") // orders collapse to customers map-side
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
    // all three quintile windows share ONE exchange into segment cells —
    // the two extra sorts between them are intra-partition re-orders
    "hashpartitioning\\(c_mktsegment".r.findAllIn(p).length shouldBe 1
    "windowspecdefinition\\(c_mktsegment".r.findAllIn(p).length shouldBe 3
  }

  test("q138: experiment readout is two aggregate grains over one scan, no join") {
    val p = plan("q138_ab_test")
    p.split("Location:").length shouldBe 2
    (p should not).include("Join")
    p should include("partial_max") // per-user conversion combines map-side
  }

  test("q140: hub frames are memoized leaves; top-5 ranks limit before the shuffle") {
    graft.core.PersistedMemo.release(spark, sfDir)
    val p = plan("q140_item_similarity")
    // round-12 shape: the co-count MODEL (topK-independent) moved from a
    // per-call localCheckpoint into PersistedMemo — both union legs and
    // the mirrored half read the persisted aggregate (InMemoryTableScan),
    // and the rebuild lineage inside the memo pays exactly ONE pruned
    // lineitem scan (l_orderkey, l_partkey only). The frequency table
    // stays an eagerly truncated leaf (localCheckpoint → ExistingRDD)
    // because a broadcast exchange re-executes lineage per reference.
    p should include("InMemoryTableScan")
    p should include("Scan ExistingRDD")
    p.linesIterator.count(_.trim.startsWith("Location:")) shouldBe 1
    p should include("struct<l_orderkey:bigint,l_partkey:bigint>")
    // joins stay broadcast-hash over the leaves — no quadratic shapes
    (p should not).include("CartesianProduct")
    (p should not).include("SortMergeJoin")
    // frequencies broadcast; rank-5 prunes map-side BEFORE the part
    // shuffle as well as after — the WindowGroupLimit pair
    p should include("BroadcastHashJoin")
    "WindowGroupLimit".r.findAllIn(p).length should be >= 2
  }

  test("q141/q142: experiment and drift readouts stay in aggregate space") {
    val cuped = plan("q141_cuped_adjustment")
    // one events scan; everything after the per-user aggregate is
    // #users → 2 → 2 rows, so no join may appear anywhere
    cuped.split("Location:").length shouldBe 2
    (cuped should not).include("Join")
    cuped should include("partial_sum") // per-user sums combine map-side
    val psi = plan("q142_psi_drift")
    // per-type stats and the 10-bin spine broadcast back onto the
    // corpus — the (type,bin) count is the only wide aggregate
    psi should include("BroadcastHashJoin")
    (psi should not).include("SortMergeJoin")
    psi should include("partial_sum") // the conditional half-counts combine map-side
  }

  test("q143/q144/q145: diagnostics contract to tiny frames in one scan, no joins") {
    val acf = plan("q143_autocorrelation")
    acf.split("Location:").length shouldBe 2 // ONE events scan
    (acf should not).include("Join") // lags unpivot; nothing re-joins the grid
    acf should include("windowspecdefinition(event_type") // per-type ordered lags
    val ben = plan("q144_benford_digits")
    ben.split("Location:").length shouldBe 2 // ONE orders scan
    (ben should not).include("SortMergeJoin") // densify via map+spine, no re-join
    ben should include("partial_count") // digit counts combine map-side
    val boot = plan("q145_bootstrap_ci")
    boot.split("Location:").length shouldBe 2 // ONE events scan ×100 replicates
    (boot should not).include("Join") // replicates never materialize or join
    boot should include("partial_sum") // weighted sums combine map-side
    boot should include("windowspecdefinition(event_type") // rank over #types·100
  }

  test("q124: baskets persist once; pairs come from an equi-join on user_id") {
    graft.core.PersistedMemo.release(spark, sfDir)
    val p = plan("q124_market_basket")
    // every consumer reads the persisted basket table, not the corpus —
    // the raw events scan appears ONLY inside the one InMemoryRelation
    p should include("InMemoryTableScan")
    // one real scan node; the InMemoryRelation one-liner embeds the
    // cached build's "Location:" text inline, so count LINES, not hits
    p.linesIterator.count(_.trim.startsWith("Location:")) shouldBe 1
    // pair generation is keyed on user_id (per-user quadratic, bounded
    // by basket size) — never a cross/nested-loop over the basket table
    // (the only BNLJ is the broadcast 1-row user-count crossJoin; each
    // node prints twice in formatted mode, so count detail headers)
    p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) shouldBe 1
  }

  test("q147: LPA rounds are hash joins + aggregates, argmax never windows") {
    val p = plan("q147_label_propagation")
    (p should not).include("CartesianProduct")
    p should include("ShuffledHashJoin") // rounds shuffle the label vector only
    // (an SMJ may appear INSIDE the memoized once-per-dataset edge
    // build — q100 shares it; the per-round hint pins the label joins)
    // the per-round argmax is a max-of-struct AGGREGATE, not a window
    (p should not).include("row_number")
  }

  test("q148: equi-depth histogram reads one pruned scan into the ntile sort") {
    val p = plan("q148_equidepth_histogram")
    p.split("Location:").length shouldBe 2 // ONE events scan
    p should include("ntile(10)")
    p should include("partial_count") // bucket census is partial+final
  }

  test("q149: Lloyd reassignment is a broadcast scan, never a pairwise join") {
    val p = plan("q149_lloyd_refinement")
    (p should not).include("CartesianProduct")
    (p should not).include("SortMergeJoin")
    // the K-by-D centroid frame reaches every row as a broadcast array
    p should include("BroadcastNestedLoopJoin")
  }

  test("q151: salted profile is two stacked hash aggregates on one scan") {
    val p = plan("q151_salted_agg")
    p.split("Location:").length shouldBe 2 // ONE lineitem scan
    (p should not).include("Join")
    // four HashAggregate nodes: partial+final for each of the two stages
    "HashAggregate".r.findAllIn(p).length should be >= 4
  }


  test("q150: the interval join fuses away — one scan, one key shuffle, no join") {
    val p = plan("q150_point_in_time")
    p.split("Location:").length shouldBe 2 // ONE events scan
    (p should not).include("Join")
    // one hash exchange on user_id; the only other exchange is the
    // presentation range sort
    p.sliding("hashpartitioning".length).count(_ == "hashpartitioning") shouldBe 1
    p should include("hashpartitioning(user_id")
  }


  test("q153: classifier scoring is map-side — sort is the only exchange") {
    val p = plan("q153_quality_classifier")
    p.sliding("Exchange".length).count(_ == "Exchange") shouldBe 2 // tree line + detail header
    p should include("rangepartitioning(doc_id")
    p should include("ReadSchema: struct<doc_id:bigint,text:string>")
    (p should not).include("Join")
  }

  test("q154: bigram model aggregates partial+final; scoring never cross-joins") {
    val p = plan("q154_bigram_surprisal")
    // the (w1, w2) model and the per-doc rollup are both two-phase
    p should include("partial_count")
    (p should not).include("CartesianProduct")
    // the model and unigram joins hash; the ONLY nested loop is the
    // 1-row broadcast vocabulary total riding a Cross build
    p should include("BroadcastHashJoin")
    p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") shouldBe 2 // tree line + detail header
    p should include("BroadcastNestedLoopJoin Cross BuildRight")
    // only the two-column projection of documents is ever read
    p should include("ReadSchema: struct<doc_id:bigint,text:string>")
  }

  test("q155: span accounting joins gram-keyed, windows doc-keyed, no cartesian") {
    val p = plan("q155_dup_spans")
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
    // the islands window partitions by doc_id — never a global window
    p should include("windowspecdefinition(doc_id#")
    p should include("ReadSchema: struct<doc_id:bigint,text:string>")
  }

  test("q156: AA pairs come from equi-joins on the order key, top-50 is TakeOrdered") {
    val p = plan("q156_link_prediction")
    p should include("TakeOrderedAndProject")
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
    // only the two join columns of lineitem are scanned
    p should include("ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint>")
  }

  test("q157: PQ scoring streams the index against broadcast queries") {
    val p = plan("q157_pq_adc_knn")
    // the candidate pass is the q29/q83 broadcast shape (vec_id <> query_id
    // is a non-equi residual on a broadcast, not a shuffled join)...
    p should include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
    // ...and the ADC windows partition per query, never globally
    p should include("windowspecdefinition(query_id#")
  }

  test("q159: winnow selection is a shuffle-free scan-speed map") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val p = graft.operators.Dedup.winnowFingerprints(docs)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    p should include("MapPartitions")
    (p should not).include("Exchange") // no shuffle, no window state
    (p should not).include("Window")
  }

  test("q158: dHash is computed map-side; the only exchange is the output sort") {
    val p = plan("q158_image_dhash")
    p.sliding("Exchange".length).count(_ == "Exchange") shouldBe 2 // tree line + detail header
    p should include("rangepartitioning(asset_id")
    (p should not).include("Join")
  }

  test("q173: compaction manifest is one source-keyed window + one aggregate") {
    val p = plan("q173_compaction_plan")
    // the cumulative sum partitions by source — never a global sort of
    // the corpus; the manifest aggregate is partial+final
    p should include("hashpartitioning(source")
    p should include("partial_count")
    (p should not).include("Join")
    // scan prunes to the three packing columns
    p should include("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>")
  }

  test("q175: the name dictionary broadcasts; JW runs as the native expression") {
    val p = plan("q175_jaro_winkler")
    p should include("BroadcastNestedLoopJoin")
    p.toLowerCase should include("jarowinklersimilarity")
    // dictionary contraction feeds the pair join: the join inputs are
    // (partial+final) aggregates, so pair volume is dict², never rows²
    p should include("partial_count")
    p should include("HashAggregate")
  }

  test("q176: median refinement is histogram aggregates; the rank window sorts one bucket") {
    val p = plan("q176_exact_median")
    p should include("partial_count") // histogram + stats aggregates combine map-side
    // the selection window partitions by group — no global sort, and
    // the windowed frame is the bucket-filtered join output, not the scan
    p should include("hashpartitioning(g")
    p should include("BroadcastHashJoin")
  }

  test("q177: proration windows and rank share one orderkey shuffle") {
    val p = plan("q177_proration")
    // wsum window, base-sum window and remainder rank all partition by
    // l_orderkey: the PLAN's only hash exchange is the lineitem side —
    // the three window passes reuse it, and the orders side broadcasts
    val marker = "Arguments: hashpartitioning(l_orderkey"
    p.sliding(marker.length).count(_ == marker) shouldBe 1
    p should include("BroadcastExchange")
    val anyHash = "Arguments: hashpartitioning"
    p.sliding(anyHash.length).count(_ == anyHash) shouldBe 1
  }

  test("q180: apriori candidates and counters stay in equi-join space") {
    val p = plan("q180_apriori_triples")
    (p should not).include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
    // the two pruning semi-joins broadcast the frequent-pair frame
    p should include("BroadcastHashJoin")
    p should include("LeftSemi")
  }

  test("q186: KS contracts to the value grid with partial+final counts, no join") {
    val p = plan("q186_ks_drift")
    // corpus → (type, value) grid is ONE partial+final aggregate; the
    // cumulative/max stage rides the grid, never a self-join of raw rows
    p should include("partial_sum")
    (p should not).include("Join")
    (p should not).include("CartesianProduct")
  }

  test("q187: JL projection is a scan-speed map — the only exchange is the sort") {
    val p = plan("q187_jl_projection")
    (p should not).include("Join")
    (p should not).include("hashpartitioning")
    p.toLowerCase should include("dotproduct") // 16 fused native dots, no zip_with
  }

  test("q189: PMI counts aggregate partial+final; top-20 is TakeOrdered, no cartesian") {
    val p = plan("q189_pmi_collocations")
    p should include("partial_count")
    p should include("TakeOrderedAndProject")
    (p should not).include("CartesianProduct")
    // the unigram re-attach joins stay in hash-join space (broadcast at
    // fixture stats; SMJ at vocabulary scale — never nested-loop over
    // multi-row sides; the only BNLJ inputs are the 1-row totals)
    p should include("BroadcastHashJoin")
  }

  test("q190: all six EWMA window passes ride the grid agg + one type-keyed exchange") {
    val p = plan("q190_ewma_control")
    // exactly two hash exchanges total: the (type, day) grid aggregate
    // and the type-keyed window sort every window pass shares
    val anyHash = "Arguments: hashpartitioning"
    p.sliding(anyHash.length).count(_ == anyHash) shouldBe 2
    (p should not).include("Join")
  }

  test("q191: every FD pair scan prunes to exactly its two columns") {
    val p = plan("q191_fd_discovery")
    // Catalyst pushes the per-pair projection all the way down: each of
    // the 12 scans reads only its (LHS, RHS) pair, never the 4-column
    // base projection (and never the 6-column table)
    p should include("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>")
    p should include("ReadSchema: struct<o_orderstatus:string,o_orderpriority:string>")
    (p should not).include("o_totalprice")
    (p should not).include("Join")
    p should include("partial_count")
  }

  test("q192: margins broadcast back to the cells; no shuffle after the cell grid") {
    val p = plan("q192_mutual_information")
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
    (p should not).include("CartesianProduct")
  }

  test("q193: audio featurize is a scan-speed object map — no shuffle before the sort") {
    val p = plan("q193_audio_features")
    (p should not).include("Join")
    (p should not).include("hashpartitioning")
    p should include("MapPartitions") // the documented codec seam
  }

  test("q188: sketch builds map-side to 2048 cells and broadcasts to the probes") {
    val p = plan("q188_cms_heavy_hitters")
    // sketch shuffle width is (r, col) — partial counts combine map-side
    p should include("partial_count")
    // the 2048-cell sketch joins the 20-row probe side as a broadcast
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
    // exact top-20 is TakeOrdered, never a global sort of the vocabulary
    p should include("TakeOrderedAndProject")
  }

  test("q207: routing is one scan — no join anywhere, one aggregation") {
    val p = plan("q207_rendezvous_shards")
    (p should not).include("Join") // melt + aggregate, never two scans joined
    p should include("partial_sum") // map-side combine on the ≤2(S+1) legs
    p should include("Generate") // the melt explode
  }

  test("q208: quartile resolve joins the broadcast target buckets only") {
    val p = plan("q208_weighted_quartiles")
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
    // per-value contraction is partial+final before any window
    p should include("partial_sum")
  }

  test("q209: stratum ranks ride broadcast offsets, local windows only") {
    val p = plan("q209_quota_split")
    p should include("BroadcastHashJoin") // offsets histogram join
    (p should not).include("SortMergeJoin")
  }

  test("q210: Hilbert index is scalar algebra — no join beyond the 1-row d0") {
    val p = plan("q210_hilbert_layout")
    // the only join is the broadcast of the 1-row min-day aggregate
    (p should not).include("SortMergeJoin")
    (p should not).include("ShuffledHashJoin")
    p should include("BroadcastNestedLoopJoin") // 1-row d0 scalar
  }

  test("q211: the sweep reuses the persisted candidate scores (no re-shingle)") {
    val p = plan("q211_dedup_threshold_sweep")
    // candidate shingles come from the shared memoized cache, so the
    // corpus-shingle Generate appears only under an InMemoryRelation
    // (built once, session-wide), never as a fresh corpus explode here
    p should include("InMemoryTableScan")
  }

  test("q212: the eps-join is a cell equi-join, never a cartesian pair") {
    // the steady-state q212 plan reads the memoized members table, so
    // the ε-join's scale contract is asserted on the BUILD stage's lazy
    // candidate frame (the exact plan dbscan persists and consumes)
    import org.apache.spark.sql.functions.{col, element_at}
    val pts = graft.operators.Segmentation.dbscanPts(
      graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), element_at(col("embedding"), 1).as("x"),
          element_at(col("embedding"), 2).as("y")),
      "vec_id", "x", "y", eps = 0.05)
    val p = graft.operators.Segmentation.epsCrossPairs(pts, 0.05)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
    // candidate pairs hash-join on the raw (jx, jy) cell coordinates
    p should include("jx")
    p should include("jy")
    // the memoized steady-state plan itself never re-runs the pair join
    val steady = plan("q212_dbscan")
    (steady should not).include("CartesianProduct")
    (steady should not).include("BroadcastNestedLoopJoin")
  }

  test("catalog-wide: no unpartitioned window over an unbounded fact subtree") {
    // THE scale contract (SCALE.md): a Window with an empty partition
    // spec pulls its whole input through ONE task, so it may only ever
    // run over a frame already contracted to a bounded cardinality —
    // an Aggregate (bucket/day/band histograms: rows ≤ #groups), a
    // Limit (top-k frames), or a Filter keyed on a window-derived
    // attribute (q163's max-per-x survivor contraction). A global
    // window whose subtree reaches a relation leaf with none of these
    // in between is the q49/q174/q179/q192/q195 failure class this
    // round removed — any future reintroduction fails here, not at
    // 100 TB.
    import org.apache.spark.sql.catalyst.plans.logical._
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    var globalWindowsSeen = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      val optimized = fn(spark, sfDir).queryExecution.optimizedPlan
      optimized.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          globalWindowsSeen += 1
          val contracted = w.child.exists {
            case _: Aggregate   => true
            case _: GlobalLimit => true
            case _: LocalLimit  => true
            case f: Filter =>
              val winAttrs = f.collect {
                case iw: Window => iw.windowExpressions.map(_.exprId)
              }.flatten.toSet
              f.condition.references.exists(a => winAttrs.contains(a.exprId))
            case _ => false
          }
          if (!contracted) offenders += name
        case _ => ()
      }
    }
    // detector self-check: the catalog DOES contain (legitimate,
    // contracted-frame) global windows — q105's rank-over-limit, the
    // prefix-sum offset histograms — so zero sightings would mean the
    // walk is broken, not that the catalog is clean
    globalWindowsSeen should be > 0
    withClue("queries with a single-task window over an uncontracted subtree: ") {
      offenders.distinct.toList shouldBe empty
    }
  }

}
