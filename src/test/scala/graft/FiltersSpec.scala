package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** q58 decontamination audit + q59 repetition filters — the gating
  * passes a training-data pipeline runs before publishing a corpus. */
class FiltersSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q58: audits only test-split docs and its flags are internally consistent") {
    import spark.implicits._
    val rows = SparkEntry.queries("q58_decontamination")(spark, dir).collect()
    rows.length should be > 0
    val testIds = Dedup.newBatch(spark, dir).select($"doc_id").as[Long].collect().toSet
    rows.foreach { r =>
      val (id, nCand, nCont, maxJ, flag) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))
      testIds should contain(id)
      nCand should be >= nCont
      nCand should be > 0L
      maxJ should (be >= 0.0 and be <= 1.0)
      flag shouldBe (if (maxJ >= 0.5) 1 else 0)
      (nCont > 0) shouldBe (flag == 1)
    }
  }

  test("q58 contaminated pairs agree with q26's full-corpus verification") {
    import spark.implicits._
    // q26 verifies ALL LSH candidate pairs with the same exact Jaccard;
    // a q58 row with max_jaccard j must have a q26 pair for the same
    // test doc at exactly j (bit-identical math on both paths)
    val q26 = SparkEntry.queries("q26_ngram_jaccard")(spark, dir)
      .select($"doc_a", $"doc_b", $"jaccard").collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getDouble(2), r.getLong(1) -> r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val audit = SparkEntry.queries("q58_decontamination")(spark, dir).collect()
    audit.foreach { r =>
      val (id, maxJ) = (r.getLong(0), r.getDouble(3))
      // q26's per-doc max is >= the cross-split max (it also sees
      // test↔test and val pairs), and when the audit flags contamination
      // the pair exists in q26's output verbatim
      q26.get(id).foreach(_ should be >= maxJ)
    }
  }

  test("q59: metrics are bounded, thresholds drive the flag, n_tokens matches q33") {
    import spark.implicits._
    val rows = SparkEntry.queries("q59_repetition_filter")(spark, dir).collect()
    rows.length shouldBe 500
    rows.foreach { r =>
      val (n, t2, t3, dup, flag) =
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getInt(5))
      n should be > 0
      t2 should (be >= 0.0 and be <= 1.0)
      t3 should (be >= 0.0 and be <= 1.0)
      dup should (be >= 0.0 and be < 1.0)
      // the synthetic corpus repeats a tiny vocabulary, so 3-gram
      // repetition is never above 2-gram repetition's ceiling + slack
      flag shouldBe (if (t2 > 0.20 || t3 > 0.18 || dup > 0.30) 1 else 0)
    }
    val q33n = SparkEntry.queries("q33_token_stats")(spark, dir)
      .select($"doc_id", $"n_ws_tokens").as[(Long, Int)].collect().toMap
    SparkEntry.queries("q59_repetition_filter")(spark, dir)
      .select($"doc_id", $"n_tokens").as[(Long, Int)].collect()
      .foreach { case (id, n) => n shouldBe q33n(id) }
  }

  test("q69 vocab coverage equals a from-scratch recount and its math is internally consistent") {
    import spark.implicits._
    val rows = SparkEntry.queries("q69_vocab_coverage")(spark, dir)
      .as[(Int, String, Long, Double, Double)].collect().sortBy(_._1)
    rows.length should be > 0
    // independent recount from the raw corpus
    val counts = graft.sources.Tables.documents(spark, dir)
      .select($"text").as[String].collect()
      .flatMap(_.split("\\s+")).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    val expected = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(200)
    rows.map(r => (r._2, r._3)).toSeq shouldBe expected
    // rank density, monotone counts, exact share arithmetic, cumsum
    rows.map(_._1).toSeq shouldBe (1 to rows.length)
    rows.map(_._3).sliding(2).foreach {
      case Array(hi, lo) => hi should be >= lo
      case _ =>
    }
    var cum = 0L
    rows.foreach { case (_, _, cnt, share, cumShare) =>
      cum += cnt
      share shouldBe cnt.toDouble / total
      cumShare shouldBe cum.toDouble / total
    }
  }

  test("q60 byte-banding is LOSSLESS at Hamming <= 3: equals brute-force all-pairs") {
    // pigeonhole: <=3 differing bits touch <=3 of the 4 byte blocks, so
    // every qualifying pair shares a block — the banded candidates must
    // reproduce the brute-force result EXACTLY, not approximately
    val sims = SparkEntry.queries("q27_simhash")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    val banded = SparkEntry.queries("q60_simhash_hamming_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    banded shouldBe brute
  }

  test("q61: shares sum to 1, split proportions hold, tokens reconcile with q33") {
    import spark.implicits._
    val rows = SparkEntry.queries("q61_mix_accounting")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    rows.map(_._5).sum shouldBe 1.0 +- 1e-9
    val docsBySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val total = docsBySplit.values.sum.toDouble
    docsBySplit("train") / total shouldBe 0.80 +- 0.06
    docsBySplit("val") / total shouldBe 0.10 +- 0.05
    docsBySplit("test") / total shouldBe 0.10 +- 0.05
    val q33Total = SparkEntry.queries("q33_token_stats")(spark, dir)
      .agg(sum($"n_ws_tokens")).as[Long].head()
    rows.map(_._4).sum shouldBe q33Total
  }

  test("q59 plan is a single map-side pass: no shuffle before the presentation sort") {
    val plan = SparkEntry.queries("q59_repetition_filter")(spark, dir)
      .queryExecution.executedPlan.toString
    // exactly one Exchange — the final ORDER BY's range partitioning;
    // the metrics themselves never shuffle (per-row algebra, no explode)
    plan.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
    (plan should not).include("Generate") // no explode in the plan
  }

  test("q74: drift terms equal a from-scratch recount with Laplace smoothing") {
    import spark.implicits._
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = SparkEntry.queries("q74_token_drift")(spark, dir)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    rows should not be empty
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(graft.operators.Curation.splitBucket($"doc_id").as("b"),
        split($"text", "\\s+").as("t"))
      .as[(Long, Seq[String])].collect()
    val train = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val test = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val vocab = collection.mutable.Set.empty[String]
    docs.foreach { case (b, ts) =>
      ts.foreach { tok =>
        vocab += tok // V counts every corpus token, incl. buckets 80-89
        if (b < 80) train(tok) += 1
        if (b >= 90) test(tok) += 1
      }
    }
    val nTr = train.values.sum; val nTe = test.values.sum; val v = vocab.size.toLong
    rows.foreach { case (tok, cTr, cTe, pTr, pTe, term) =>
      cTr shouldBe train(tok)
      cTe shouldBe test(tok)
      pTr shouldBe (cTr + 1.0) / (nTr + v)
      pTe shouldBe (cTe + 1.0) / (nTe + v)
      term shouldBe r(pTr * math.log(pTr / pTe), 4)
    }
    // ranked by the 6-dp |term| guard, non-increasing
    rows.map(x => r(math.abs(x._4 * math.log(x._4 / x._5)), 6))
      .sliding(2).foreach {
        case Array(hi, lo) => hi should be >= lo
        case _ =>
      }
    // the report is two-sided on this corpus: tokens drift both ways
    rows.map(_._6).exists(_ > 0) shouldBe true
    rows.map(_._6).exists(_ < 0) shouldBe true
  }

  private def r(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q75: boilerplate coverage equals a from-scratch gram recount") {
    import spark.implicits._
    val rows = SparkEntry.queries("q75_boilerplate_ngrams")(spark, dir)
      .as[(Long, Int, Long, Double)].collect()
    rows.length should be > 0
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", split($"text", "\\s+").as("t"))
      .as[(Long, Seq[String])].collect()
    val grams: Map[Long, Set[String]] = docs.map { case (id, t) =>
      id -> (if (t.length >= 5) t.sliding(5).map(_.mkString(" ")).toSet
             else Set.empty[String])
    }.toMap
    rows.length shouldBe docs.length // every document is reported
    val docFreq = grams.values.flatten // one occurrence per containing doc
      .groupBy(identity).view.mapValues(_.size).toMap
    val boiler = docFreq.filter(_._2 >= 2).keySet
    rows.foreach { case (id, nG, nB, frac) =>
      nG shouldBe grams(id).size
      nB shouldBe grams(id).count(boiler).toLong
      frac shouldBe (if (nG > 0) r(nB.toDouble / nG, 4) else 0.0)
    }
    // the synthetic corpus plants duplicate spans — coverage is nonzero
    rows.map(_._3).sum should be > 0L
  }

  test("q78: surprisal equals a from-scratch unigram-LM recount") {
    import spark.implicits._
    val rows = SparkEntry.queries("q78_unigram_surprisal")(spark, dir)
      .as[(Long, Long, Double)].collect()
    rows.length should be > 0
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", graft.operators.Curation.splitBucket($"doc_id").as("b"),
        split($"text", "\\s+").as("t"))
      .as[(Long, Long, Seq[String])].collect()
    val train = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val vocab = collection.mutable.Set.empty[String]
    docs.foreach { case (_, b, ts) =>
      ts.foreach { tok =>
        vocab += tok
        if (b < 80) train(tok) += 1
      }
    }
    val nTr = train.values.sum; val v = vocab.size.toLong
    val expected = docs.filter(_._2 >= 90).map { case (id, _, ts) =>
      val nll = ts.map(tok => -math.log((train(tok) + 1.0) / (nTr + v)))
      id -> ((ts.length.toLong, r(nll.sum / nll.length, 4)))
    }.toMap
    rows.map(_._1).toSet shouldBe expected.keySet // exactly the test split
    rows.foreach { case (id, n, nll) =>
      n shouldBe expected(id)._1
      nll shouldBe expected(id)._2
    }
    // in-distribution docs score near ln(vocab); all finite and positive
    rows.foreach { case (_, _, nll) => nll should be > 0.0 }
  }

  test("q154: bigram surprisal equals a from-scratch conditional-LM recount") {
    import spark.implicits._
    val rows = SparkEntry.queries("q154_bigram_surprisal")(spark, dir)
      .as[(Long, Long, Double)].collect()
    rows.length should be > 0
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", graft.operators.Curation.splitBucket($"doc_id").as("b"),
        split($"text", "\\s+").as("t"))
      .as[(Long, Long, Seq[String])].collect()
    val uniTrain = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val biTrain = collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    val vocab = collection.mutable.Set.empty[String]
    docs.foreach { case (_, b, ts) =>
      ts.foreach(vocab += _)
      if (b < 80) {
        ts.foreach(uniTrain(_) += 1)
        ts.sliding(2).filter(_.size == 2).foreach(p => biTrain((p(0), p(1))) += 1)
      }
    }
    val v = vocab.size.toLong
    val expected = docs.filter(_._2 >= 90).collect {
      case (id, _, ts) if ts.length >= 2 =>
        val nll = ts.sliding(2).filter(_.size == 2).map { p =>
          -math.log((biTrain((p(0), p(1))) + 1.0) / (uniTrain(p(0)) + v))
        }.toSeq
        id -> ((nll.length.toLong, r(nll.sum / nll.length, 4)))
    }.toMap
    rows.map(_._1).toSet shouldBe expected.keySet // exactly the test split
    rows.foreach { case (id, n, nll) =>
      n shouldBe expected(id)._1
      nll shouldBe expected(id)._2
    }
    // the conditional model discriminates MORE than the unigram one:
    // unseen-continuation bigrams are charged ~ln(c(w1)+V), so the test
    // split's score spread is non-degenerate
    rows.map(_._3).distinct.length should be > 1
  }

  test("q90: novelty equals a from-scratch 3-gram recount against the train split") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", graft.operators.Curation.splitBucket($"doc_id").as("b"), $"text")
      .as[(Long, Long, String)].collect()
    def grams(t: String): Set[String] = {
      val ts = t.split("\\s+")
      if (ts.length < 3) Set.empty
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    val trainGrams = docs.filter(_._2 < 80).flatMap(d => grams(d._3)).toSet
    val expected = docs.filter(_._2 >= 90).map { case (id, _, t) =>
      val g = grams(t)
      val novel = g.count(!trainGrams.contains(_))
      id -> ((g.size.toLong, novel.toLong))
    }.filter(_._2._1 > 0).toMap
    val rows = SparkEntry.queries("q90_ngram_novelty")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    rows.map(_._1).toSet shouldBe expected.keySet
    rows.foreach { case (id, n, novel, frac) =>
      (n, novel) shouldBe expected(id)
      frac shouldBe novel.toDouble / n
      frac should (be >= 0.0 and be <= 1.0)
    }
    // the metric discriminates on this corpus (not all 0 or all 1)
    rows.map(_._4).distinct.length should be > 1
  }

  test("q84: BM25 ranking equals a from-scratch Okapi recount") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val terms = Seq("spark", "join", "window")
    val toks = docs.map { case (id, t) => (id, t.split("\\s+").toSeq) }
    val n = toks.length
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    val tf = toks.map { case (id, ts) => id -> terms.map(w => ts.count(_ == w)) }.toMap
    val df = terms.indices.map(i => tf.values.count(_(i) > 0))
    val k1 = 1.2; val b = 0.75
    val expected = toks.map { case (id, ts) =>
      val s = terms.indices.map { i =>
        val f = tf(id)(i).toDouble
        val idf = math.log((n - df(i).toDouble + 0.5) / (df(i) + 0.5) + 1.0)
        idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * (ts.length / avgdl)))
      }.sum
      (id, s)
    }.sortBy { case (id, s) => (-r(s, 6), id) }.take(10) // rank at 6dp, like the engine
      .map { case (id, s) => (id, r(r(s, 6), 4)) }
    val got = SparkEntry.queries("q84_bm25_search")(spark, dir)
      .orderBy($"rn").select($"doc_id", $"score").as[(Long, Double)].collect()
    got.map(_._1).toSeq shouldBe expected.map(_._1).toSeq
    got.zip(expected).foreach { case ((_, gs), (_, es)) => gs shouldBe es +- 0.001 }
    // the query terms actually discriminate on this corpus
    got.head._2 should be > got.last._2
  }

  test("q94: RRF scores recompute from the emitted ranks and fuse both modalities") {
    val rows = SparkEntry.queries("q94_hybrid_rrf")(spark, dir).collect()
    rows.length shouldBe 10
    rows.foreach { row =>
      val (rb, rv) = (row.getAs[Int]("rank_bm25"), row.getAs[Int]("rank_vec"))
      rb should (be >= 0 and be <= 50)
      rv should (be >= 0 and be <= 50)
      (rb, rv) should not be ((0, 0)) // a fused doc is in at least one list
      val expected = (if (rb > 0) 1.0 / (60 + rb) else 0.0) +
        (if (rv > 0) 1.0 / (60 + rv) else 0.0)
      row.getAs[Double]("rrf_score") shouldBe r(expected, 6) +- 1e-9
    }
    // the fusion is non-trivial on this corpus: some top doc carries
    // BOTH a lexical and a dense rank
    rows.exists(r => r.getAs[Int]("rank_bm25") > 0 && r.getAs[Int]("rank_vec") > 0) shouldBe true
    // scores are non-increasing in rn
    val sc = rows.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("rrf_score"))
    sc.zip(sc.tail).foreach { case (a, b) => a should be >= b }
  }

  test("q95: HLL verdicts hold, exacts reconcile, and the union merge is faithful") {
    import spark.implicits._
    val toks = graft.sources.Tables.documents(spark, dir)
      .select($"source", explode(split($"text", "\\s+")).as("token"))
    val exactBySource = toks.groupBy($"source")
      .agg(countDistinct($"token").as("n")).as[(String, Long)].collect().toMap
    val exactAll = toks.select($"token").distinct().count()
    // since round 5 the query emits (scope, exact_distinct, in_bound):
    // the verdict is computed IN-QUERY from the live sketch
    // (|est−exact|/exact ≤ 5%), so verdict=1 on __ALL__ proves the
    // register-max union tracks the CORPUS distinct — which a
    // sum-of-per-source merge would overshoot by the cross-source
    // overlap, far past 5%
    val rows = SparkEntry.queries("q95_sketch_union")(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("exact_distinct"), r.getAs[Int]("in_bound")))).toMap
    rows.keySet shouldBe exactBySource.keySet + "__ALL__"
    exactBySource.foreach { case (s, n) => rows(s) shouldBe ((n, 1)) }
    rows("__ALL__") shouldBe ((exactAll, 1))
    // and the overlap is real on this corpus (the faithfulness claim
    // above is non-vacuous): corpus distinct ≪ Σ per-source distinct
    exactAll.toDouble should be < exactBySource.values.sum * 0.9
  }

  test("q85: BPE pair counts equal a from-scratch merge-table recount") {
    import spark.implicits._
    val words = scala.collection.mutable.Map.empty[String, Long]
    graft.sources.Tables.documents(spark, dir).select($"text").as[String].collect()
      .foreach(_.split("\\s+").foreach(w => words(w) = words.getOrElse(w, 0L) + 1))
    val total = scala.collection.mutable.Map.empty[String, Long]
    val types = scala.collection.mutable.Map.empty[String, Set[String]]
    words.foreach { case (w, c) =>
      // per POSITION, as a BPE trainer counts: "aaa" contributes "aa" twice
      if (w.length >= 2) w.sliding(2).foreach { p =>
        total(p) = total.getOrElse(p, 0L) + c
        types(p) = types.getOrElse(p, Set.empty) + w
      }
    }
    val expected = total.toSeq
      .map { case (p, t) => (p, types(p).size.toLong, t) }
      .sortBy { case (p, _, t) => (-t, p) }.take(20)
    val got = SparkEntry.queries("q85_bpe_pairs")(spark, dir)
      .orderBy($"rn").select($"pair", $"n_types", $"total")
      .as[(String, Long, Long)].collect().toSeq
    got shouldBe expected
  }

  test("q153 classifier logits replay from scratch through the portable hash") {
    import spark.implicits._
    val rows = SparkEntry.queries("q153_quality_classifier")(spark, dir)
      .as[(Long, Int, Double, Int)].collect()
    val docs = sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.length shouldBe docs.size
    // independent reconstruction: same bucket formula, same milli-weights
    val milli = (0 until 64).map(j => (j * 2654435761L % 1000) - 500)
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 64).toInt
    }
    rows.foreach { case (id, n, logit, pass) =>
      val toks = docs(id).split("\\s+")
      n shouldBe toks.length
      val raw = toks.foldLeft(0L)((a, t) => a + milli(bucket(t))) - 20L * n
      // EXACT equality: one IEEE divide of exact integers, no rounding
      logit shouldBe raw.toDouble / (1000.0 * n)
      pass shouldBe (if (raw >= 0) 1 else 0)
    }
    // the classifier discriminates: both classes occur
    rows.map(_._4).distinct.sorted shouldBe Seq(0, 1)
  }

  test("q188 CMS estimates are one-sided, bounded, and the sketch merges across shards") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q188_cms_heavy_hitters")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows should have size 20
    // exact truth from an independent recount
    val toks = sources.Tables.documents(spark, dir)
      .select(explode(split($"text", "\\s+")).as("w")).collect().map(_.getString(0))
    val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = toks.length.toLong
    for ((tok, exactCnt, est, over) <- rows) {
      exactCnt shouldBe exact(tok)
      over shouldBe est - exactCnt
      // one-sided: collisions only ever ADD (the structural CMS law)
      over should be >= 0L
      // CM bound: est ≤ exact + εN with ε = e/w holds w.p. ≥ 1−e⁻ᵈ per
      // query; on this fixed fixture it must simply hold
      over should be <= (math.E * n / 512).ceil.toLong
    }
    // top-20 selection really is the exact top by (count desc, token asc)
    val wantTop = exact.toSeq.sortBy { case (w, c) => (-c, w) }.take(20).map(_._1)
    rows.map(_._1).toSeq shouldBe wantTop
    // mergeability: cell-wise sum of two shard sketches equals the
    // full-corpus sketch (the property that lets daily shards sketch
    // independently) — replay the cell build on the driver
    def h(r: Int, w: String): Int = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cms$r|$w".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md5.substring(0, 8), 16) % 512).toInt
    }
    val (aTok, bTok) = toks.splitAt(toks.length / 2)
    def sketch(ts: Array[String]): Map[(Int, Int), Long] =
      ts.flatMap(w => (0 until 4).map(r => (r, h(r, w)))).groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
    val merged = (sketch(aTok).toSeq ++ sketch(bTok).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    merged shouldBe sketch(toks)
  }

  test("q189 PMI collocations equal a driver recount; ranking key is the exact lift") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q189_pmi_collocations")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    rows should have size 20
    val docToks = sources.Tables.documents(spark, dir)
      .select(split($"text", "\\s+").as("t")).collect()
      .map(_.getSeq[String](0).toIndexedSeq)
    val uni = docToks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n1 = docToks.map(_.size.toLong).sum
    val bi = docToks.filter(_.size >= 2)
      .flatMap(t => t.zip(t.tail))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n2 = docToks.filter(_.size >= 2).map(_.size.toLong - 1).sum
    // every emitted row reconciles with the exact counts and formula
    for ((w1, w2, c12, ca, cb, lift) <- rows) {
      c12 shouldBe bi((w1, w2)); c12 should be >= 5L
      ca shouldBe uni(w1); cb shouldBe uni(w2)
      lift shouldBe (c12.toDouble / n2) / ((ca.toDouble / n1) * (cb.toDouble / n1))
    }
    // the 20 rows are the global top by (lift desc, w1, w2) over the
    // min-support survivors — recompute the full ranking on the driver
    val wantTop = bi.toSeq.filter(_._2 >= 5L).map { case ((a, b), c) =>
      val l = (c.toDouble / n2) / ((uni(a).toDouble / n1) * (uni(b).toDouble / n1))
      (a, b, l)
    }.sortBy { case (a, b, l) => (-l, a, b) }.take(20).map(t => (t._1, t._2))
    rows.map(r => (r._1, r._2)).toSeq shouldBe wantTop
  }

  test("q194 byte entropy equals a driver recompute and respects its bounds") {
    import spark.implicits._
    val got = SparkEntry.queries("q194_byte_entropy")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    got.size shouldBe docs.length
    for ((id, text) <- docs) {
      val bytes = text.getBytes("UTF-8")
      val hist = bytes.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = bytes.length.toLong
      val h = math.log(n.toDouble) -
        hist.values.map(c => c * math.log(c.toDouble)).sum / n
      val (nB, nD, entropy) = got(id)
      nB shouldBe n
      nD shouldBe hist.size.toLong
      entropy shouldBe h +- 1e-5
      // Shannon bounds: 0 ≤ H ≤ ln(distinct symbols) ≤ ln 256
      entropy should be >= 0.0
      entropy should be <= math.log(hist.size.toDouble) + 1e-6
    }
  }


  test("q196: pairwise Jaccard verdicts hold and exacts reconcile for a probe pair") {
    import spark.implicits._
    val rows = SparkEntry.queries("q196_hll_jaccard")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getAs[Int]("union_in_bound") shouldBe 1
      val j = r.getAs[Double]("jaccard")
      j should (be >= 0.0 and be <= 1.0)
      r.getAs[Long]("exact_inter") should be <=
        math.min(r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"))
    }
    // independent recount for the lexicographically first pair
    val toks = graft.sources.Tables.documents(spark, dir)
      .select($"source", explode(split($"text", "\\s+")).as("token")).distinct()
    val first = rows.map(r => (r.getString(0), r.getString(1))).min
    val sa = toks.filter($"source" === first._1).select($"token")
    val sb = toks.filter($"source" === first._2).select($"token")
    val inter = sa.intersect(sb).count()
    val row = rows.find(r => (r.getString(0), r.getString(1)) == first).get
    row.getAs[Long]("exact_inter") shouldBe inter
    row.getAs[Long]("exact_a") shouldBe sa.distinct().count()
  }

  test("q211 sweep reconciles with q26's verified pairs at every threshold") {
    val dir = "/root/testdata/sf0.001"
    val sweep = SparkEntry.queries("q211_dedup_threshold_sweep")(spark, dir)
      .collect().map(r => r.getAs[Int]("threshold_pct") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_dup_docs"))).toMap
    sweep.keySet shouldBe Set(60, 70, 80, 90, 95)
    // recover the integer union size from q26's (n_common, jaccard):
    // u = n_common / j is an integer ≤ ~10³, so the double division's
    // ulp error rounds away exactly — the reconciliation then replays
    // the sweep's own integer cross-multiple, no float compares
    val pairs = SparkEntry.queries("q26_ngram_jaccard")(spark, dir).collect()
      .map { r =>
        val nc = r.getAs[Long]("n_common")
        val j = r.getAs[Double]("jaccard")
        val u = if (nc == 0L) 1L else math.round(nc / j)
        (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), nc, u)
      }
    for (pct <- Seq(60, 70, 80, 90, 95)) {
      val hit = pairs.filter { case (_, _, nc, u) => nc * 100 >= pct * u }
      withClue(s"pct=$pct: ") {
        sweep(pct)._1 shouldBe hit.length.toLong
        sweep(pct)._2 shouldBe
          hit.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong
      }
    }
    // the curve is monotone: tighter thresholds keep fewer pairs/docs
    val ordered = Seq(60, 70, 80, 90, 95).map(sweep)
    ordered.zip(ordered.tail).foreach { case ((p1, d1), (p2, d2)) =>
      p2 should be <= p1; d2 should be <= d1
    }
    // the floor threshold covers every verified candidate pair... only
    // if LSH emitted none below 60% — so bound, don't equate
    sweep(60)._1 should be <= pairs.length.toLong
  }
}
