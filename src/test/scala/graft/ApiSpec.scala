package graft

import org.apache.spark.sql.Row

/** The Graft facade: parameterized entry points must reproduce the
  * catalog's fixed-parameter queries at the catalog defaults (so the
  * oracle gate transitively covers the API), and stay sane off the
  * defaults. */
class ApiSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("bm25Search at catalog terms equals q84") {
    val api = Graft.bm25Search(spark, dir, Seq("spark", "join", "window"))
      .select($"doc_id", $"score", $"rn")
    val cat = SparkEntry.queries("q84_bm25_search")(spark, dir)
      .select($"doc_id", $"score", $"rn")
    rows(api) shouldBe rows(cat)
    // an ad-hoc term set runs and discriminates
    val adhoc = Graft.bm25Search(spark, dir, Seq("customer"), topK = 5).collect()
    adhoc.length shouldBe 5
    adhoc.head.getAs[Double]("score") should be > 0.0
  }

  test("sqrtNlist pins the scale rule: 16 floor, ceil(sqrt) growth, q68 geometry") {
    Graft.sqrtNlist(100) shouldBe 16
    Graft.sqrtNlist(256) shouldBe 16
    Graft.sqrtNlist(500) shouldBe 23
    Graft.sqrtNlist(2000) shouldBe 45
    Graft.sqrtNlist(20000) shouldBe 142
    // the catalog's √N-geometry audit runs exactly this cell count
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    val cells = SparkEntry.queries("q68_cluster_balance")(spark, dir)
      .select("cluster").as[Int].collect()
    all(cells) should be < Graft.sqrtNlist(n)
  }

  test("retrievalEval(probes=0) equals q217; probes=2 equals q220; probes=16 closes the gap to brute") {
    rows(Graft.retrievalEval(spark, dir, probes = 0)) shouldBe
      rows(SparkEntry.queries("q217_retrieval_eval")(spark, dir))
    rows(Graft.retrievalEval(spark, dir, probes = 2)) shouldBe
      rows(SparkEntry.queries("q220_retrieval_eval_ivf")(spark, dir))
    // probing every cell ranks the full corpus: identical metrics to
    // brute (n_cand drops away — it's the probed form's extra column)
    val metricCols = Seq($"anchor", $"n_rel", $"n_hit10", $"first_rank", $"rr", $"ndcg10")
    rows(Graft.retrievalEval(spark, dir, probes = 16).select(metricCols: _*)) shouldBe
      rows(Graft.retrievalEval(spark, dir, probes = 0).select(metricCols: _*))
  }

  test("vectorSearch(probes=1) equals q41; probes=2 equals q88; quantized equals q96") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    rows(Graft.vectorSearch(spark, dir, ids, k = 5, probes = 1)) shouldBe
      rows(SparkEntry.queries("q41_knn_ivf")(spark, dir))
    rows(Graft.vectorSearch(spark, dir, ids, k = 5, probes = 2)) shouldBe
      rows(SparkEntry.queries("q88_multiprobe_ivf")(spark, dir))
    rows(Graft.vectorSearch(spark, dir, ids, k = 5, probes = 2, quantizedScoring = true)) shouldBe
      rows(SparkEntry.queries("q96_quantized_ivf")(spark, dir))
    // exhaustive probing recovers the brute-force top-5 exactly
    val exhaustive = Graft.vectorSearch(spark, dir, ids, k = 5, probes = 16)
      .select($"query_id", $"neighbor_id", $"cosine", $"rn")
    val brute = SparkEntry.queries("q29_knn_brute_force")(spark, dir)
      .filter($"rn" <= 5).select($"query_id", $"neighbor_id", $"cosine", $"rn")
    rows(exhaustive) shouldBe rows(brute)
    // ...and at an OPEN cell count (the nlist ~ sqrt(N) rule end to
    // end): a 64-cell index partitions differently but exhaustive
    // probing still recovers the same brute top-5
    val exhaustive64 = Graft.vectorSearch(spark, dir, ids, k = 5,
        probes = 64, nlist = 64)
      .select($"query_id", $"neighbor_id", $"cosine", $"rn")
    rows(exhaustive64) shouldBe rows(brute)
  }

  test("embeddingNearDupPairs at the production calibration equals q55's passing set") {
    val api = Graft.embeddingNearDupPairs(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val cat = SparkEntry.queries("q55_neardup_production")(spark, dir)
      .filter($"passed" === 1)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    api shouldBe cat
  }

  test("pagerank at catalog knobs equals q100; fuzzyMatches equals q101") {
    val api = Graft.pagerank(spark, dir) // defaults: 5 rounds, d = 0.85
      .select($"node", org.apache.spark.sql.functions.round($"r", 6).as("pr"))
      .orderBy($"pr".desc, $"node")
    val cat = SparkEntry.queries("q100_pagerank")(spark, dir)
      .select($"node", $"pr")
    rows(api) shouldBe rows(cat)
    rows(Graft.fuzzyMatches(spark, dir)) shouldBe
      rows(SparkEntry.queries("q101_fuzzy_match")(spark, dir))
  }

  test("columnStats and weightedSample at catalog parameters equal q106/q105") {
    val li = graft.sources.Tables.lineitem(spark, dir)
    rows(Graft.columnStats(li,
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))) shouldBe
      rows(SparkEntry.queries("q106_table_stats")(spark, dir))
    val docs = graft.sources.Tables.documents(spark, dir)
    rows(Graft.weightedSample(docs, "doc_id", "n_chars")) shouldBe
      rows(SparkEntry.queries("q105_weighted_sample")(spark, dir))
    // a different salt draws a genuinely different sample
    val other = Graft.weightedSample(docs, "doc_id", "n_chars", salt = "#alt")
      .select($"doc_id").as[Long].collect().toSet
    val base = Graft.weightedSample(docs, "doc_id", "n_chars")
      .select($"doc_id").as[Long].collect().toSet
    other should not be base
    // bad inputs refuse fast
    an[IllegalArgumentException] should be thrownBy
      Graft.columnStats(li, Seq("l_quantity; DROP"))
    an[IllegalArgumentException] should be thrownBy
      Graft.weightedSample(docs, "nope", "n_chars")
  }

  test("weightedSample inclusion tracks weight for fractional and skewed weights") {
    // ids 0..999; odd ids carry 50x the weight of even ids — the
    // sample of 100 must be dominated by odd ids (E-S proportionality)
    val skewed = spark.range(1000).select($"id",
      org.apache.spark.sql.functions.when($"id" % 2 === 1, 0.5)
        .otherwise(0.01).as("wt"))
    val got = Graft.weightedSample(skewed, "id", "wt", k = 100, salt = "#t")
      .select($"id").as[Long].collect()
    got.count(_ % 2 == 1) should be > 85
    // non-positive weights never appear
    val withZero = spark.range(10).select($"id",
      org.apache.spark.sql.functions.when($"id" < 5, 0.0).otherwise(1.0).as("wt"))
    val ids = Graft.weightedSample(withZero, "id", "wt", k = 10, salt = "#z")
      .select($"id").as[Long].collect().toSet
    ids shouldBe Set(5L, 6L, 7L, 8L, 9L)
  }

  test("hopDistance at catalog knobs matches q103; bad seeds refuse") {
    val api = Graft.hopDistance(spark, dir, seed = 3L)
      .withColumn("kind",
        org.apache.spark.sql.functions.when($"node" % 2 === 0, "customer")
          .otherwise("supplier"))
      .select($"node", $"kind", $"dist").orderBy($"dist", $"node")
    rows(api) shouldBe rows(SparkEntry.queries("q103_hop_distance")(spark, dir))
    an[IllegalArgumentException] should be thrownBy
      Graft.hopDistance(spark, dir, seed = 999999L * 2)
  }

  test("connectedComponents labels an ad-hoc edge list by component minimum") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 7L))
      .toDF("src", "dst")
    val labels = Graft.connectedComponents(edges)
    val got = labels.as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 7L -> 7L)
    labels.unpersist()
  }

  test("textNearDupPairs filters q26's verified jaccard") {
    val api = Graft.textNearDupPairs(spark, dir, minJaccard = 0.5).collect()
    val q26 = SparkEntry.queries("q26_ngram_jaccard")(spark, dir)
      .filter($"jaccard" >= 0.5).collect()
    api.map(_.toSeq).toSeq shouldBe q26.map(_.toSeq).toSeq
  }

  test("temporal facade at catalog knobs equals q110/q111/q113/q114") {
    rows(Graft.scd2History(spark, dir)) shouldBe
      rows(SparkEntry.queries("q110_scd2_history")(spark, dir))
    rows(Graft.concurrency(spark, dir)) shouldBe
      rows(SparkEntry.queries("q111_concurrency")(spark, dir))
    rows(Graft.snapshotDiff(spark, dir, cutoffUs = 1705363200000000L)) shouldBe
      rows(SparkEntry.queries("q113_snapshot_diff")(spark, dir))
    rows(Graft.attribution(spark, dir)) shouldBe
      rows(SparkEntry.queries("q114_attribution")(spark, dir))
    // guards refuse nonsense instead of mis-attributing
    an[IllegalArgumentException] should be thrownBy
      Graft.attribution(spark, dir, touchTypes = Seq("purchase"))
    an[IllegalArgumentException] should be thrownBy
      Graft.concurrency(spark, dir, bucketUs = 1000L)
  }

  test("triangleCensus facade normalizes messy edge lists to the canonical census") {
    // reversed duplicates, repeats, and a self-loop must not inflate
    // degrees/wedges/triangles
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
      .toDF("a", "b")
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    rows(Graft.triangleCensus(messy)) shouldBe
      rows(operators.Graph.triangleCensus(clean))
  }

  test("diagnostics facade at catalog knobs equals q140/q142/q143/q144/q145") {
    rows(Graft.itemSimilarity(spark, dir)) shouldBe
      rows(SparkEntry.queries("q140_item_similarity")(spark, dir))
    rows(Graft.psiDrift(spark, dir)) shouldBe
      rows(SparkEntry.queries("q142_psi_drift")(spark, dir))
    rows(Graft.acf(spark, dir)) shouldBe
      rows(SparkEntry.queries("q143_autocorrelation")(spark, dir))
    rows(Graft.benford(sources.Tables.orders(spark, dir)
      .select($"o_totalprice"), "o_totalprice")) shouldBe
      rows(SparkEntry.queries("q144_benford_digits")(spark, dir))
    rows(Graft.bootstrapCi(spark, dir)) shouldBe
      rows(SparkEntry.queries("q145_bootstrap_ci")(spark, dir))
  }

  test("diagnostics facade stays sane off the catalog defaults") {
    // a smaller neighbourhood is a prefix of the larger ranked list
    val top2 = Graft.itemSimilarity(spark, dir, topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val top5 = Graft.itemSimilarity(spark, dir).collect()
      .groupBy(_.getLong(0)).values
      .flatMap(_.sortBy(r => (-r.getDouble(3), r.getLong(1))).take(2))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    top2 shouldBe top5
    // shorter ACF horizon = the same leading lags
    val acf3 = Graft.acf(spark, dir, maxLag = 3).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val acf7 = Graft.acf(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    acf3 shouldBe acf7.filter(_._1._2 <= 3)
    // coarser PSI bins still ≥ 0 per type, same population split
    val psi5 = Graft.psiDrift(spark, dir, bins = 5).collect()
    val psi10 = Graft.psiDrift(spark, dir).collect()
    psi5.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) shouldBe
      psi10.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    psi5.foreach(_.getDouble(3) should be >= 0.0)
    // Benford over a synthetic exact-Benford frame scores ~zero χ²
    val benfordish = (1 to 9).flatMap(d =>
      Seq.fill(math.round(1000 * math.log10(1.0 + 1.0 / d)).toInt)(d * 111.11))
      .toDF("amt")
    val audit = Graft.benford(benfordish, "amt").collect()
    audit.map(_.getLong(1)).sum shouldBe benfordish.count()
    audit.foreach(_.getDouble(4) should be < 1.0)
    // fewer replicates: a valid interval that still brackets the mean
    val ci50 = Graft.bootstrapCi(spark, dir, reps = 50).collect()
    ci50.foreach { r =>
      r.getDouble(2) should be < r.getDouble(3) // lo < hi
      r.getDouble(1) should (be >= r.getDouble(2) and be <= r.getDouble(3))
    }
    an[IllegalArgumentException] should be thrownBy
      Graft.bootstrapCi(spark, dir, reps = 10)
    an[IllegalArgumentException] should be thrownBy Graft.acf(spark, dir, 0)
  }

  test("concurrency at hour buckets conserves session starts and peak bounds") {
    val day = Graft.concurrency(spark, dir)
      .as[(String, Int, Long)].collect()
    val hour = Graft.concurrency(spark, dir, bucketUs = 3600000000L)
      .as[(String, Int, Long)].collect()
    // finer buckets partition the same session starts
    hour.map(_._3).sum shouldBe day.map(_._3).sum
    // a day's peak is the max of its hours' peaks (both measure the
    // same global running sum at the same boundary points)
    val hourByDay = hour.groupBy(_._1.take(10)).view.mapValues(_.map(_._2).max)
    day.foreach { case (d, peak, _) => hourByDay(d) shouldBe peak }
  }

  test("round-4 facades at catalog knobs equal q147/q148/q149-init/q150/q151") {
    import org.apache.spark.sql.functions._
    // labelPropagation(4) + presentation = q147
    val lpa = Graft.labelPropagation(spark, dir)
      .select($"node",
        when($"node" % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        $"lbl".as("community"))
      .orderBy($"community", $"node")
    rows(lpa) shouldBe rows(SparkEntry.queries("q147_label_propagation")(spark, dir))
    // equidepthHistogram at catalog knobs = q148
    val edh = Graft.equidepthHistogram(sources.Tables.events(spark, dir),
      "event_type", "value", "event_id", bins = 10)
    rows(edh) shouldBe rows(SparkEntry.queries("q148_equidepth_histogram")(spark, dir))
    // one lloydAssign round reconciles with q149's census: per-cluster
    // sizes of the refined assignment ARE the after-counts
    val sizes = Graft.lloydAssign(spark, dir, rounds = 1)
      .groupBy($"cluster").count().as[(Int, Long)].collect().toMap
    SparkEntry.queries("q149_lloyd_refinement")(spark, dir)
      .select($"cluster", $"n_after").as[(Int, Long)].collect()
      .foreach { case (c, na) => sizes.getOrElse(c, 0L) shouldBe na }
    // pointInTime at the catalog attribute = q150
    rows(Graft.pointInTime(spark, dir)) shouldBe
      rows(SparkEntry.queries("q150_point_in_time")(spark, dir))
    // saltedProfile at catalog knobs + presentation = q151
    val sp = Graft.saltedProfile(
      sources.Tables.lineitem(spark, dir)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity"),
      "l_suppkey", "l_quantity", buckets = 16,
      saltFrom = struct($"l_orderkey", $"l_linenumber"))
      .select($"l_suppkey", $"n_rows",
        $"sum_l_quantity".as("sum_qty"), $"min_l_quantity".as("min_qty"),
        $"max_l_quantity".as("max_qty"), round($"avg_l_quantity", 6).as("avg_qty"))
      .orderBy($"l_suppkey")
    rows(sp) shouldBe rows(SparkEntry.queries("q151_salted_agg")(spark, dir))
  }


  test("round-4b facades at catalog knobs equal q155/q156/q157/q160/q161") {
    rows(Graft.dupSpans(spark, dir)) shouldBe
      rows(SparkEntry.queries("q155_dup_spans")(spark, dir))
    rows(Graft.linkPrediction(spark, dir)) shouldBe
      rows(SparkEntry.queries("q156_link_prediction")(spark, dir))
    rows(Graft.pqSearch(spark, dir, Seq(0L, 1L, 2L, 3L, 4L))) shouldBe
      rows(SparkEntry.queries("q157_pq_adc_knn")(spark, dir))
    rows(Graft.winnowedPairs(spark, dir).orderBy($"doc_a", $"doc_b")) shouldBe
      rows(SparkEntry.queries("q160_winnow_pairs")(spark, dir))
    val perUser = sources.Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("m"))
      .withColumn("variant", graft.functions.Portable.hash32(
        org.apache.spark.sql.functions.concat(
          $"user_id".cast("string"),
          org.apache.spark.sql.functions.lit("#graft-exp1"))) % 2)
    rows(Graft.mannWhitney(perUser)) shouldBe
      rows(SparkEntry.queries("q161_mann_whitney")(spark, dir))
  }

  test("round-4b facades stay sane off the catalog defaults") {
    // wider grams -> duplication can only shrink (monotone knob)
    val d8 = Graft.dupSpans(spark, dir).agg(
      org.apache.spark.sql.functions.sum($"dup_tokens")).head().getLong(0)
    val d16 = Graft.dupSpans(spark, dir, gramWidth = 16).agg(
      org.apache.spark.sql.functions.sum($"dup_tokens")).head().getLong(0)
    d16 should be <= d8
    d8 should be > 0L
    // a higher evidence threshold only removes pairs
    val p2 = Graft.winnowedPairs(spark, dir).collect()
    val p5 = Graft.winnowedPairs(spark, dir, minShared = 5).collect()
    p5.length should be <= p2.length
    p5.map(r => (r.getLong(0), r.getLong(1))).toSet
      .subsetOf(p2.map(r => (r.getLong(0), r.getLong(1))).toSet) shouldBe true
    // a deeper shortlist can only improve PQ recall vs brute force
    val exact = SparkEntry.queries("q29_knn_brute_force")(spark, dir)
      .filter($"rn" <= 5).select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    def recall(shortlist: Int): Double = {
      val got = Graft.pqSearch(spark, dir, Seq(0L, 1L, 2L, 3L, 4L), 5, shortlist)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      (got intersect exact).size.toDouble / exact.size
    }
    recall(99) should be >= recall(20)
    // link prediction truncates deterministically: top-10 is a prefix
    val t50 = Graft.linkPrediction(spark, dir).collect()
    val t10 = Graft.linkPrediction(spark, dir, topK = 10).collect()
    t10.map(_.toSeq).toSeq shouldBe t50.take(10).map(_.toSeq).toSeq
  }

  test("qualityClassify at catalog weights equals q153; a custom export rescores") {
    import org.apache.spark.sql.functions._
    val weights = (0 until 64).map(j => (j * 2654435761L % 1000) - 500)
    val api = Graft.qualityClassify(sources.Tables.documents(spark, dir),
      "doc_id", "text", weights, biasMilli = -20L)
    rows(api) shouldBe rows(SparkEntry.queries("q153_quality_classifier")(spark, dir))
    // an all-positive "trained export" passes everything — the knob is live
    val lenient = Graft.qualityClassify(sources.Tables.documents(spark, dir),
      "doc_id", "text", Seq.fill(8)(100L))
    lenient.agg(min($"quality_pass")).head().getInt(0) shouldBe 1
  }

  test("round-4c facades at catalog knobs equal q162/q163/q164/q165/q166") {
    import org.apache.spark.sql.functions.{col, element_at, hour, round => fround}
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"event_type", hour($"ts").cast("long").as("hh"), $"user_id")
    rows(Graft.lDiversity(ev, Seq("event_type", "hh"), "user_id")) shouldBe
      rows(SparkEntry.queries("q162_l_diversity")(spark, dir))
    val per = graft.sources.Tables.part(spark, dir)
      .select($"p_partkey", $"p_size".cast("long").as("size"),
        fround($"p_retailprice" * 100).cast("long").as("price_cents"))
    rows(Graft.skyline(per, "p_partkey", "size", "price_cents")) shouldBe
      rows(SparkEntry.queries("q163_skyline")(spark, dir))
    val pts = graft.sources.Tables.embeddings(spark, dir)
      .select(element_at($"embedding", 1).as("x"), element_at($"embedding", 2).as("y"))
    rows(Graft.gridClusters(pts, "x", "y")) shouldBe
      rows(SparkEntry.queries("q165_grid_density")(spark, dir))
    // layoutReport needs the same derived dims the catalog query fixes
    val base = graft.sources.Tables.events(spark, dir)
      .select($"event_id", $"user_id",
        org.apache.spark.sql.functions.to_date($"ts").as("day"))
    val d0 = base.agg(org.apache.spark.sql.functions.min($"day").as("d0"))
    val feat = base.crossJoin(org.apache.spark.sql.functions.broadcast(d0))
      .select($"event_id", ($"user_id" % 64).as("ub"),
        org.apache.spark.sql.functions.least(
          org.apache.spark.sql.functions.datediff($"day", $"d0"),
          org.apache.spark.sql.functions.lit(63)).cast("long").as("di"))
    rows(Graft.layoutReport(feat, "event_id", "ub", "di")) shouldBe
      rows(SparkEntry.queries("q164_zorder_layout")(spark, dir))
  }

  test("round-4c facades stay sane off the catalog defaults") {
    import org.apache.spark.sql.functions.col
    // bloomSemiJoin is EXACT regardless of fp rate — even at a tiny,
    // collision-heavy bitmap the final semi-join scrubs false positives
    val build = graft.sources.Tables.customer(spark, dir)
      .filter($"c_acctbal" > 9000.0).select($"c_custkey")
    val probe = graft.sources.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey")
    val exact = probe.join(build, $"o_custkey" === $"c_custkey", "left_semi")
    rows(Graft.bloomSemiJoin(probe, "o_custkey", build).orderBy($"o_orderkey")) shouldBe
      rows(exact.orderBy($"o_orderkey"))
    val tiny = Graft.withBloomHit(probe, "o_custkey", build, bits = 64, hashes = 2)
    // zero false negatives even when the bitmap saturates
    tiny.join(build, $"o_custkey" === $"c_custkey", "left_semi")
      .filter(col("hit") === 0).count() shouldBe 0L
    // a coarser grid merges everything into fewer clusters; cluster
    // count is monotone non-increasing in step
    import org.apache.spark.sql.functions.element_at
    val pts = graft.sources.Tables.embeddings(spark, dir)
      .select(element_at($"embedding", 1).as("x"), element_at($"embedding", 2).as("y"))
    val fine = Graft.gridClusters(pts, "x", "y", step = 0.05).count()
    val coarse = Graft.gridClusters(pts, "x", "y", step = 0.4).count()
    coarse should be <= fine
    // skyline of a frame with one dominating row is that row
    val dom = Seq((1L, 10L, 10L), (2L, 5L, 9L), (3L, 10L, 9L)).toDF("id", "x", "y")
    rows(Graft.skyline(dom, "id", "x", "y")) shouldBe Seq(Seq(1L, 10L, 10L))
  }

  test("round-5 facade at catalog knobs equals q197/q201/q202/q203") {
    val dir = "/root/testdata/sf0.001"
    Graft.lttb(spark, dir, nOut = 24).collect() shouldBe
      SparkEntry.queries("q197_lttb_downsample")(spark, dir).collect()
    Graft.setCover(spark, dir, k = 5).collect() shouldBe
      SparkEntry.queries("q201_set_cover")(spark, dir).collect()
    Graft.mmr(spark, dir).collect() shouldBe
      SparkEntry.queries("q202_mmr_retrieval")(spark, dir).collect()
    Graft.modularity(spark, dir).collect() shouldBe
      SparkEntry.queries("q203_modularity")(spark, dir).collect()
    // and an off-catalog knob actually changes the shape
    Graft.lttb(spark, dir, nOut = 6).collect()
      .map(_.getAs[Int]("bucket")).max should be <= 5
    Graft.setCover(spark, dir, k = 2).collect().length shouldBe 2
  }

  test("late-round-5 facade at catalog knobs equals q208/q209; knobs open") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.sources.Tables.lineitem(spark, dir)
    Graft.weightedQuartiles(li, "l_extendedprice", "l_quantity").collect() shouldBe
      SparkEntry.queries("q208_weighted_quartiles")(spark, dir).collect()
    val docs = graft.sources.Tables.documents(spark, dir)
    Graft.quotaSplit(docs).collect() shouldBe
      SparkEntry.queries("q209_quota_split")(spark, dir).collect()
    // off-catalog knobs: a different salt re-deals the split membership
    // (same exact quotas), and a different shard count re-routes
    val alt = Graft.quotaSplit(docs, salt = "#other").collect()
    alt.map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getAs[Long]("n_docs")).toMap shouldBe
      Graft.quotaSplit(docs).collect().map(r =>
        (r.getString(0), r.getString(1), r.getString(2)) ->
          r.getAs[Long]("n_docs")).toMap
    val r4 = Graft.rendezvousRoute(docs.select("doc_id"), "doc_id", 4)
    r4.select("shard").distinct().count() shouldBe 4L
  }

  test("knnGraph equals the join+window reference and reproduces q218's histogram") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val g = Graft.knnGraph(spark, dir, k = 5)
      .select($"src", $"neighbor_id", $"rn")
      .as[(Long, Long, Int)].collect()
    g.length should be > 0
    // reference: the unfused cell equi-join + window over the SAME
    // assignment (√N rule at this corpus = the 16 floor)
    val nlist = Graft.sqrtNlist(
      graft.sources.Tables.embeddings(spark, dir).count())
    val nb = Graft.ivfAssign(graft.sources.Tables.embeddings(spark, dir), nlist)
      .join(graft.sources.Tables.embeddings(spark, dir), Seq("vec_id"))
      .withColumn("v", transform($"embedding", x => x.cast("double")))
      .withColumn("nrm", sqrt(aggregate($"v", lit(0.0), (a, x) => a + x * x)))
      .select($"vec_id", $"v", $"nrm", $"cluster")
    graft.functions.GraftFunctions.register(spark)
    val cos = expr("graft_dot(qv, v)") / ($"qnrm" * $"nrm")
    val wr = Window.partitionBy($"src")
      .orderBy(graft.functions.Portable.detRound(cos, 6).desc, $"vec_id".asc)
    val ref = nb.select($"cluster", $"vec_id".as("src"), $"v".as("qv"), $"nrm".as("qnrm"))
      .join(nb, Seq("cluster"))
      .filter($"vec_id" =!= $"src")
      .withColumn("rn", row_number().over(wr)).filter($"rn" <= 5)
      .select($"src", $"vec_id", $"rn".cast("int"))
      .as[(Long, Long, Int)].collect()
    g.toSet shouldBe ref.toSet
    // q218's histogram is this graph contracted: occurrence counts of
    // neighbor_id, zero-densified over the corpus
    val occ = g.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    val hist = (0L until n).map(v => occ.getOrElse(v, 0L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val q218 = SparkEntry.queries("q218_hubness_audit")(spark, dir)
      .as[(Long, Long)].collect().toMap
    hist shouldBe q218
  }

  test("knnGraph's join+window fallback is dispatch-invariant with the kernel path") {
    // the task-hostile-cell guard (mean cell > kernelMaxMeanCell →
    // distributed all-same-cell-pairs join instead of the per-task
    // kernel) is unreachable at fixture scale with the real threshold;
    // the test hook lowers it to 1 so BOTH branches run on the same
    // corpus and must emit the IDENTICAL full edge list — ids, rounded
    // cosines, AND ranks
    val dir = "/root/testdata/sf0.001"
    def edges(maxMeanCell: Long) =
      graft.operators.Similarity.knnGraph(spark, dir, k = 4,
          nlist0 = 16, kernelMaxMeanCell = maxMeanCell)
        .select($"src", $"neighbor_id", $"cosine", $"rn")
        .as[(Long, Long, Double, Int)].collect().toSeq
    val viaKernel = edges(Long.MaxValue)
    val viaFallback = edges(1L)
    viaKernel.length should be > 0
    viaFallback shouldBe viaKernel
  }

  test("bandCandidates refuses loudly BEFORE the shuffle past the raw-volume budget") {
    // the fraction cap reads the post-distinct count — too late when the
    // raw self-join is box-hostile (the sf30 rehearsal ENOSPC'd in the
    // distinct's sort-shuffle at ~1.2e10 raw rows with the fraction
    // still ~6%: a fixed band width's birthday floor grows the ABSOLUTE
    // volume as N²/2^bandBits while the fraction stays flat). The
    // pre-flight bucket-histogram gate fires first; the budget knob
    // stands in for a 1e10-row corpus at fixture scale.
    spark.conf.set("graft.neardup.maxCandidateRows", "1")
    try {
      val ex = intercept[IllegalStateException] {
        Graft.embeddingNearDupPairs(spark, dir, threshold = 0.9,
          bands = 2, bandBits = 2, capFraction = 1.0).count()
      }
      ex.getMessage should include("widen")
      ex.getMessage should include("maxCandidateRows")
    } finally spark.conf.unset("graft.neardup.maxCandidateRows")
  }

  test("knnGraph's fallback refuses loudly past its pair budget, naming the sane nlist") {
    // pairTiles' refuse-loudly contract on the join+window branch: a
    // user-supplied nlist that is BOTH task-hostile (max cell over the
    // kernel ceiling) and over the same-cell pair budget must fail with
    // the √N suggestion, not launch an N²-class shuffle. The budget
    // hook stands in for a 10⁹-pair corpus at fixture scale.
    val dir = "/root/testdata/sf0.001"
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Similarity.knnGraph(spark, dir, k = 4,
        nlist0 = 1, kernelMaxMeanCell = 1L, fallbackPairBudget = 10L)
    }
    ex.getMessage should include("pair")
    ex.getMessage should include("nlist")
    // the message names a concrete sane nlist (the √N rule's value)
    ex.getMessage should include regex "nlist ≈ \\d+"
  }

}
