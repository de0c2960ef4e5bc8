package graft

/** Structural checks for the curation operators (q50-q52) — value
  * parity is the DuckDB oracle's job; these assert the invariants the
  * oracle can't express. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q105 weighted sample is length-biased, ranked, and duplicate-free") {
    import org.apache.spark.sql.functions.avg
    val sample = SparkEntry.queries("q105_weighted_sample")(spark, sfDir).collect()
    sample.map(_.getAs[Int]("rank")).toSeq shouldBe (1 to 100)
    sample.map(_.getAs[Long]("doc_id")).distinct.length shouldBe 100
    // exponential-race keys arrive sorted
    sample.map(_.getAs[Long]("key_ns")).toSeq shouldBe sorted
    // weight ∝ length: the sample must over-represent long documents
    val corpusMean = graft.sources.Tables.documents(spark, sfDir)
      .agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = sample.map(_.getAs[Long]("n_chars")).sum.toDouble / sample.length
    sampleMean should be > corpusMean
  }

  test("q50: components agree with the LSH pairs and keepers are component minima") {
    val pairs = SparkEntry.queries("q25_minhash_lsh_pairs")(spark, sfDir)
      .as[(Long, Long)].collect()
    val rows = SparkEntry.queries("q50_dup_clusters")(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    val cluster = rows.map(r => r._1 -> r._2).toMap
    // exactly the documents that appear in some candidate pair
    cluster.keySet shouldBe pairs.flatMap(p => Seq(p._1, p._2)).toSet
    // both endpoints of every pair land in the same component
    pairs.foreach { case (a, b) => cluster(a) shouldBe cluster(b) }
    // the cluster label is the component's min doc_id, and exactly the
    // is_keeper rows carry it
    cluster.groupBy(_._2).foreach { case (c, members) =>
      members.keys.min shouldBe c
    }
    rows.foreach { case (doc, c, keep) => keep shouldBe (if (doc == c) 1 else 0) }
  }

  test("components: a deep chain converges in O(log d) pointer-jumping rounds") {
    // path graph 0-1-2-...-63: diameter 63. Plain min-propagation needs
    // ~63 rounds (and would exit the 32-round cap with WRONG labels if
    // it returned silently); pointer jumping must finish in ~log2(63)+c.
    val d = 63
    val edges = spark.range(d).selectExpr("id AS src", "id + 1 AS dst")
    val r = graft.operators.Components.run(edges)
    r.rounds should be <= 10
    val labels = r.labels.as[(Long, Long)].collect().toMap
    labels.keySet shouldBe (0L to d).toSet
    labels.values.toSet shouldBe Set(0L)
    r.labels.unpersist()
  }

  test("components: non-convergence raises instead of returning partial labels") {
    val edges = spark.range(200).selectExpr("id AS src", "id + 1 AS dst")
    an[IllegalStateException] should be thrownBy
      graft.operators.Components.run(edges, maxRounds = 2)
  }

  test("q51: split proportions approximate 80/10/10 and assignment is doc-stable") {
    val rows = SparkEntry.queries("q51_hash_split")(spark, sfDir)
      .as[(Long, Long, String)].collect()
    val n = rows.length.toDouble
    val bys = rows.groupBy(_._3).view.mapValues(_.length / n).toMap
    bys("train") shouldBe 0.8 +- 0.08
    bys("val") shouldBe 0.1 +- 0.05
    bys("test") shouldBe 0.1 +- 0.05
    // pure function of doc_id: identical across invocations
    val again = SparkEntry.queries("q51_hash_split")(spark, sfDir)
      .as[(Long, Long, String)].collect()
    again shouldBe rows
  }

  test("q53: realized sample rates match the per-stratum targets") {
    val rows = SparkEntry.queries("q53_stratified_sample")(spark, "/root/testdata/sf0.01")
      .as[(Long, String, Long)].collect()
    val total = graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy($"event_type").count().as[(String, Long)].collect().toMap
    val sampled = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val targets = Map("click" -> 0.2, "view" -> 0.2, "error" -> 0.1,
      "purchase" -> 1.0, "signup" -> 1.0)
    targets.foreach { case (t, rate) =>
      sampled.getOrElse(t, 0).toDouble / total(t) shouldBe rate +- 0.05
    }
  }

  test("q201: greedy set cover obeys submodular laws and replays by hand") {
    import spark.implicits._
    val rows = SparkEntry.queries("q201_set_cover")(spark, "/root/testdata/sf0.01")
      .as[(Int, String, Long, Long, Double)].collect().sortBy(_._1)
    rows.map(_._1).toSeq shouldBe (1 to 5)
    // marginal gains are non-increasing (submodularity of coverage)
    rows.map(_._3).sliding(2).foreach {
      case Array(a, b) => a should be >= b
      case _ =>
    }
    // covered totals are the prefix sums of the gains, and coverage <= 1
    rows.scanLeft(0L)(_ + _._3).tail.zip(rows.map(_._4)).foreach {
      case (cum, got) => got shouldBe cum
    }
    rows.foreach(_._5 should (be >= 0.0 and be <= 1.0))
    // round 1 picks the source with the largest vocabulary (ties: first)
    import org.apache.spark.sql.functions.{explode, split}
    val bySource = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select($"source", explode(split($"text", "\\s+")).as("t"))
      .distinct().groupBy($"source").count()
      .as[(String, Long)].collect()
    val want = bySource.sortBy { case (s2, c) => (-c, s2) }.head
    (rows.head._2, rows.head._3) shouldBe want
    // picked sources never repeat
    rows.map(_._2).distinct.length shouldBe 5
  }

  test("q54: rank-guarantee verdicts hold and exact quartiles reconcile (A8 sketch)") {
    // the raw approx_percentile value is engine-local, so since round 5
    // the query emits EXACT quartiles plus in-bound verdicts computed
    // IN-QUERY from the live sketch (rank interval of the estimate
    // must touch target ± n/accuracy). This test pins the verdicts to
    // 1 and the exact quartiles to an independent interpolating
    // recount; the DuckDB oracle hash-gates the same contract.
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q54_approx_quantiles")(spark, dir)
      .as[(String, Double, Double, Double, Int, Int, Int)].collect()
    val byFlag = graft.sources.Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_quantity").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // Spark's `percentile` definition: linear interpolation at
    // p·(n−1); the catalog rounds via the detRound floor form at 4 dp
    def interp(xs: Array[Double], p: Double): Double = {
      val r = p * (xs.length - 1)
      val f = r.toInt
      val v = if (f == xs.length - 1) xs(f) else xs(f) + (r - f) * (xs(f + 1) - xs(f))
      math.floor(v * 1e4 + 0.5) / 1e4
    }
    rows should not be empty
    rows.foreach { case (flag, q1, med, q3, b1, b2, b3) =>
      val xs = byFlag(flag)
      q1 shouldBe interp(xs, 0.25)
      med shouldBe interp(xs, 0.5)
      q3 shouldBe interp(xs, 0.75)
      Seq(b1, b2, b3).foreach(_ shouldBe 1)
    }
  }

  test("q66: funnel chains stage counts and matches the stage queries' own outputs") {
    val rows = SparkEntry.queries("q66_curation_funnel")(spark, sfDir)
      .as[(Int, String, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    rows.map(r => (r._1, r._2)).toSeq shouldBe Seq(
      0 -> "ingested", 1 -> "min_length", 2 -> "near_dup",
      3 -> "repetition", 4 -> "quality")
    val total = rows.head._3
    rows.sliding(2).foreach { case Array(prev, cur) =>
      cur._3 shouldBe prev._4 // stage input = previous stage output
      case _ =>
    }
    rows.foreach { case (_, _, in, out, dropped, passFrac, cumFrac) =>
      out should be <= in
      dropped shouldBe in - out
      passFrac shouldBe out.toDouble / in
      cumFrac shouldBe out.toDouble / total
    }
    // every stage discriminates on this corpus: real drops, nonzero tail
    rows.tail.foreach(_._5 should be > 0L)
    rows.last._4 should be > 0L
    // independent recomputation from the STAGE QUERIES' own outputs
    val qual = SparkEntry.queries("q32_quality_score")(spark, sfDir)
      .select($"doc_id", $"n_tokens", $"quality")
      .as[(Long, Int, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val rep = SparkEntry.queries("q59_repetition_filter")(spark, sfDir)
      .select($"doc_id", $"is_repetitive").as[(Long, Int)].collect().toMap
    val nonKeeper = SparkEntry.queries("q50_dup_clusters")(spark, sfDir)
      .filter($"is_keeper" === 0).select($"doc_id").as[Long].collect().toSet
    val ids = qual.keySet.toSeq
    val s1 = ids.filter(id => qual(id)._1 >= 20)
    val s2 = s1.filterNot(nonKeeper)
    val s3 = s2.filter(rep(_) == 0)
    val s4 = s3.filter(id => qual(id)._2 >= 0.4)
    rows.map(_._4).toSeq shouldBe Seq(ids.size, s1.size, s2.size, s3.size, s4.size)
      .map(_.toLong)
  }

  test("q67: keep rates are the water-filling solution over emitted columns") {
    val rows = SparkEntry.queries("q67_mix_rebalance")(spark, sfDir)
      .as[(String, Long, Long, Double, Double, Long, Long, Double)].collect()
    rows.length should be > 1
    val tMax = rows.map(r => r._3 / r._4).min // min over sources of tokens/target_share
    rows.foreach { case (_, nDocs, tokens, share, rate, keptDocs, keptToks, realized) =>
      share should (be > 0.0 and be < 1.0)
      rate should (be > 0.0 and be <= 1.0)
      rate shouldBe math.min(1.0, share * tMax / tokens) +- 1e-12
      keptDocs should be <= nDocs
      keptToks should be <= tokens
      realized should (be >= 0.0 and be <= 1.0)
    }
    // target shares sum to 1; realized shares sum to 1; the binding
    // source keeps everything
    rows.map(_._4).sum shouldBe 1.0 +- 1e-9
    rows.map(_._8).sum shouldBe 1.0 +- 1e-9
    rows.map(_._5).max shouldBe 1.0
    // the mix is actually rebalanced: realized shares track targets far
    // better than the raw inventory does (sum of |share error| shrinks)
    val rawTotal = rows.map(_._3).sum.toDouble
    val rawErr = rows.map(r => math.abs(r._3 / rawTotal - r._4)).sum
    val realizedErr = rows.map(r => math.abs(r._8 - r._4)).sum
    realizedErr should be < rawErr / 2
  }

  test("q52: per-doc ranks are dense from 1 and scores are non-increasing") {
    val rows = SparkEntry.queries("q52_tfidf")(spark, sfDir)
      .as[(Long, String, Double, Int)].collect()
    rows should not be empty
    rows.groupBy(_._1).foreach { case (_, terms) =>
      val byRank = terms.sortBy(_._4)
      byRank.map(_._4) shouldBe (1 to terms.length).toArray
      byRank.map(_._3).sliding(2).foreach {
        case Array(hi, lo) => hi should be >= lo - 1e-4 // rounded-score ties allowed
        case _ =>
      }
    }
  }

  test("q73: canonical is the max-quality member; minid keeper matches q50") {
    val clusters = SparkEntry.queries("q50_dup_clusters")(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    val quality = SparkEntry.queries("q32_quality_score")(spark, sfDir)
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    val rows = SparkEntry.queries("q73_cluster_canonical")(spark, sfDir)
      .as[(Long, Long, Long, Double, Long, Int)].collect()
    val members = clusters.groupBy(_._2)
    // one row per q50 cluster
    rows.map(_._1).sorted.toSeq shouldBe members.keys.toSeq.sorted
    rows.foreach { case (cid, n, canon, cq, minid, same) =>
      val ms = members(cid).map(_._1)
      n shouldBe ms.length.toLong
      // q50's keeper IS the min-id member (= the cluster label)
      minid shouldBe ms.min
      minid shouldBe cid
      // the canonical pick: max quality, min doc_id on ties
      ms should contain(canon)
      canon shouldBe ms.map(d => (quality(d), d)).sortBy { case (q, d) => (-q, d) }.head._2
      cq shouldBe quality(canon)
      same shouldBe (if (canon == minid) 1 else 0)
    }
    // the two keeper policies genuinely disagree somewhere on this corpus
    rows.map(_._6).min shouldBe 0
  }

  test("q77: repaired splits are cluster-consistent; only dup members can move") {
    val rows = SparkEntry.queries("q77_leakage_repair")(spark, sfDir)
      .as[(Long, Long, String, String, Int)].collect()
    // every document is assigned, exactly once
    rows.length.toLong shouldBe
      graft.sources.Tables.documents(spark, sfDir).count()
    rows.map(_._1).distinct.length shouldBe rows.length
    // THE leakage property: after repair, no cluster spans two splits
    rows.groupBy(_._2).foreach { case (_, ms) =>
      ms.map(_._4).toSet.size shouldBe 1
    }
    // the repaired split is the q51 split of the cluster label itself,
    // and moved is exactly the disagreement indicator
    val splitOf = rows.map(r => r._1 -> r._3).toMap
    rows.foreach { case (doc, c, s, rs, m) =>
      rs shouldBe splitOf(c) // label = min member ⇒ its own row exists
      m shouldBe (if (s != rs) 1 else 0)
    }
    // docs outside the dup graph are their own singleton cluster and
    // keep their q51 split untouched
    val labeled = SparkEntry.queries("q50_dup_clusters")(spark, sfDir)
      .as[(Long, Long, Int)].collect().map(_._1).toSet
    rows.filterNot(r => labeled(r._1)).foreach { r =>
      r._2 shouldBe r._1
      r._5 shouldBe 0
    }
    // moved count recomputed from q50 ∪ q51 directly
    val expectMoved = rows.count { case (doc, c, _, _, _) =>
      labeled(doc) && splitOf(doc) != splitOf(c)
    }
    rows.map(_._5.toLong).sum shouldBe expectMoved.toLong
  }

  test("q89: the source matrix partitions q25's pairs exactly") {
    val pairs = SparkEntry.queries("q25_minhash_lsh_pairs")(spark, sfDir)
      .as[(Long, Long)].collect()
    val src = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val expected = pairs
      .map { case (a, b) =>
        val (x, y) = (src(a), src(b)); if (x <= y) (x, y) else (y, x)
      }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rows = SparkEntry.queries("q89_source_overlap")(spark, sfDir).collect()
    rows.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_pairs")).toMap shouldBe expected
    rows.foreach { r =>
      r.getAs[Int]("cross_source") shouldBe (if (r.getString(0) == r.getString(1)) 0 else 1)
    }
    rows.map(_.getAs[Long]("n_pairs")).sum shouldBe pairs.length.toLong
  }

  test("q93: length histogram equals a from-scratch recount and tiles the corpus") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"source", $"text").as[(String, String)].collect()
    val expected = docs
      .map { case (s, t) =>
        val n = t.split("\\s+").length
        ((s, 63 - java.lang.Long.numberOfLeadingZeros(n.toLong)), n)
      }
      .groupBy(_._1)
      .map { case (k, v) => k -> ((v.length.toLong, v.map(_._2.toLong).sum)) }
    val rows = SparkEntry.queries("q93_length_histogram")(spark, sfDir).collect()
    rows.length shouldBe expected.size
    rows.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Int]("bucket"))
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")) shouldBe expected(k)
      // the bucket bounds really bracket a log2 bucket
      r.getAs[Long]("bucket_lo") shouldBe (1L << k._2)
      r.getAs[Long]("bucket_hi") shouldBe (1L << (k._2 + 1)) - 1
    }
    // histogram tiles the corpus exactly
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe docs.length.toLong
  }

  test("q97: equivalence classes tile the corpus and risk math is consistent") {
    val rows = SparkEntry.queries("q97_k_anonymity")(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("class_size")).sum
    total shouldBe graft.sources.Tables.documents(spark, sfDir).count()
    val riskTotal = rows.filter(_.getAs[Int]("at_risk") == 1).map(_.getAs[Long]("class_size")).sum
    rows.foreach { r =>
      r.getAs[Int]("at_risk") shouldBe (if (r.getAs[Long]("class_size") < 5) 1 else 0)
      r.getAs[Double]("risk_share") shouldBe riskTotal.toDouble / total +- 1e-12
    }
    // the audit discriminates on this corpus: both safe and at-risk classes exist
    rows.map(_.getAs[Int]("at_risk")).distinct.length shouldBe 2
  }

  test("q87: epochs cap at 4, draws respect inventory, and the plan fills the budget") {
    val rows = SparkEntry.queries("q87_repeat_plan")(spark, sfDir).collect()
    rows.length should be > 1
    val budget = rows.head.getAs[Long]("budget_tokens")
    rows.foreach { r =>
      val e = r.getAs[Double]("epochs")
      e should be > 0.0
      e should be <= 4.0
      (r.getAs[Int]("repeated") == 1) shouldBe (e > 1.0)
      // a source never draws more than its 4-epoch ceiling (planned is
      // displayed at 2 dp, so allow the half-cent of display rounding)
      r.getAs[Double]("planned_tokens") should be <=
        4.0 * r.getAs[Long]("n_tokens") + 0.005
    }
    // Σ planned ≤ budget by construction (draws derive from UNROUNDED
    // epochs; capped sources under-draw, uncapped draw budget·share);
    // slack = 2-dp display rounding × #sources
    val planned = rows.map(_.getAs[Double]("planned_tokens")).sum
    planned should be <= budget.toDouble + 0.005 * rows.length
    planned should be >= budget * 0.5
  }

  test("q195 t-closeness EMD equals a driver recompute and sits in [0,1]") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = SparkEntry.queries("q195_t_closeness")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    // independent decile assignment replayed from the same total order
    val rows = sources.Tables.events(spark, sfDir)
      .select($"event_type", hour($"ts").cast("long").as("hh"), $"value", $"event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val n = rows.length
    val sorted = rows.sortBy(r => (r._3, r._4))
    // ntile(k): first (n mod k) tiles get ceil(n/k) rows
    val deciles = sorted.zipWithIndex.map { case (r, i) =>
      val big = n % 10; val h = n / 10 + 1
      val d = if (i < big.toLong * h) i / h else big + (i - big * h) / (n / 10)
      (r._1, r._2) -> (d + 1)
    }
    val global = deciles.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byClass = deciles.groupBy(_._1)
    got.keySet shouldBe byClass.keySet
    for ((cls, members) <- byClass) {
      val cc = members.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val m = members.size.toLong
      var cum = 0.0; var acc = 0.0
      for (d <- 1 to 9) {
        cum += cc.getOrElse(d, 0L).toDouble / m - global(d).toDouble / n
        acc += math.abs(cum)
      }
      val emd = acc / 9.0
      val (size, gotEmd, risk) = got(cls)
      size shouldBe m
      gotEmd shouldBe emd +- 1e-5
      gotEmd should (be >= 0.0 and be <= 1.0)
      risk shouldBe (if (gotEmd > 0.2) 1 else 0)
    }
  }

  test("q209 quota split hits the Hamilton quotas EXACTLY in every stratum") {
    import org.apache.spark.sql.functions.{col, sum}
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val rows = SparkEntry.queries("q209_quota_split")(spark, sfDir).collect()
    val byStratum = rows.groupBy(r => (r.getAs[String]("source"), r.getAs[String]("lang")))
    val want = docs.groupBy(col("source"), col("lang"))
      .agg(sum(org.apache.spark.sql.functions.lit(1L)).as("n"),
        sum(col("doc_id")).as("sid"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getAs[Long]("n"), r.getAs[Long]("sid")))
      .toMap
    byStratum.keySet shouldBe want.keySet
    for ((k, grp) <- byStratum) {
      val (n, sid) = want(k)
      val m = grp.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
      val rv = (n % 10).toInt
      val qTrain = 8 * n / 10 + (if (Set(1, 2, 3, 6)(rv)) 1 else 0)
      val qVal = n / 10 + (if (Set(4, 5, 6, 7, 8, 9)(rv)) 1 else 0)
      withClue(s"stratum $k (n=$n): ") {
        m.getOrElse("train", 0L) shouldBe qTrain
        m.getOrElse("val", 0L) shouldBe qVal
        m.getOrElse("test", 0L) shouldBe n - qTrain - qVal
        // membership partition: doc_id mass is conserved across splits
        grp.map(_.getAs[Long]("sum_doc_id")).sum shouldBe sid
      }
    }
    // determinism: the same split regardless of input partitioning
    val again = graft.Graft.quotaSplit(docs.repartition(13)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_doc_id"))).toMap
    rows.map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_doc_id"))).toMap shouldBe again
    // NULL strata are legitimate groups, never dropped (the null-safe
    // stratum join): 30 docs with a null lang still split 24/3/3
    val withNull = Seq.tabulate(30)(i =>
      (1000L + i, "webz", Option.empty[String])) ++
      Seq.tabulate(10)(i => (2000L + i, "webz", Option("en")))
    val nd = withNull.toDF("doc_id", "source", "lang")
    val ns = graft.Graft.quotaSplit(nd).collect()
      .map(r => (Option(r.getString(1)), r.getString(2)) -> r.getAs[Long]("n_docs"))
      .toMap
    ns((None, "train")) shouldBe 24L
    ns((None, "val")) shouldBe 3L
    ns((None, "test")) shouldBe 3L
    ns((Some("en"), "train")) shouldBe 8L
  }
}
