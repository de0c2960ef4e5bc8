package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextAnalysis}

/** q62 PII scrubbing + q65 exact n-gram decontamination — value parity
  * on the seeded corpus is the DuckDB oracle's job; these prove the
  * detectors on hand-written fixtures the synthetic corpus can't
  * contain, and the invariants the oracle hash can't express. */
class ScrubSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q62: detects and redacts each PII class on hand-written fixtures") {
    val df = Seq(
      (1L, "reach alice.smith+work@example-corp.co.uk or bob@x.io now"),
      (2L, "call 415-555-1234 today"),
      (3L, "server 192.168.0.1 and 10.0.0.255 up"),
      (4L, "ssn 123-45-6789 on file"),
      (5L, "clean text with no pii at all"),
      (6L, "mixed a@b.com 1.2.3.4 999-88-7777 650-555-0000"),
      (7L, "mail admin@10.2.3.4.net now")
    ).toDF("doc_id", "text")
    val out = df.select(Seq($"doc_id", $"text") ++ TextAnalysis.piiColumns($"text"): _*)
      .orderBy($"doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
      .toMap

    out(1L) shouldBe ((2, 0, 0, 0, 1, "reach <EMAIL> or <EMAIL> now"))
    out(2L) shouldBe ((0, 1, 0, 0, 1, "call <PHONE> today"))
    out(3L) shouldBe ((0, 0, 2, 0, 1, "server <IP> and <IP> up"))
    // xxx-xx-xxxx is an ID, not a phone — the two shapes never overlap
    out(4L) shouldBe ((0, 0, 0, 1, 1, "ssn <ID> on file"))
    out(5L) shouldBe ((0, 0, 0, 0, 0, "clean text with no pii at all"))
    out(6L) shouldBe ((1, 1, 1, 1, 1, "mixed <EMAIL> <IP> <ID> <PHONE>"))
    // an IP inside an email's domain is part of the email redaction,
    // not a separate IP hit: counts describe exactly what was redacted
    out(7L) shouldBe ((1, 0, 0, 0, 1, "mail <EMAIL> now"))
  }

  test("q62 catalog: seeding hits every class and redaction leaves no residue") {
    val rows = SparkEntry.queries("q62_pii_scrub")(spark, dir)
    val agg = rows.agg(
      sum(when($"doc_id" % 3 === 0 && $"n_emails" >= 1, 1).otherwise(0)),
      sum(when($"doc_id" % 3 === 0, 1).otherwise(0)),
      sum(when($"doc_id" % 4 === 0 && $"n_phones" >= 1, 1).otherwise(0)),
      sum(when($"doc_id" % 4 === 0, 1).otherwise(0)),
      sum(when($"doc_id" % 5 === 0 && $"n_ips" >= 1, 1).otherwise(0)),
      sum(when($"doc_id" % 5 === 0, 1).otherwise(0)),
      sum(when($"doc_id" % 7 === 0 && $"n_ids" >= 1, 1).otherwise(0)),
      sum(when($"doc_id" % 7 === 0, 1).otherwise(0))
    ).head()
    // every seeded doc detects its class (the seed IS the detector's target)
    agg.getLong(0) shouldBe agg.getLong(1)
    agg.getLong(2) shouldBe agg.getLong(3)
    agg.getLong(4) shouldBe agg.getLong(5)
    agg.getLong(6) shouldBe agg.getLong(7)
    // scrub completeness: re-running detection on redacted text finds nothing
    val residue = rows.select(TextAnalysis.piiColumns($"redacted"): _*)
      .agg(sum($"n_emails" + $"n_phones" + $"n_ips" + $"n_ids")).head().getLong(0)
    residue shouldBe 0L
  }

  test("q65 grams: a document yields len-n+1 distinct windows") {
    val doc = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val grams = Dedup.tokenGrams(doc, 8).as[(Long, String)].collect()
    grams.map(_._2).toSet shouldBe Set(
      "a b c d e f g h", "b c d e f g h i", "c d e f g h i j")
    // short documents produce no windows rather than partial ones
    val short = Seq((2L, "only seven tokens are in here x")).toDF("doc_id", "text")
    Dedup.tokenGrams(short, 8).count() shouldBe 0L
  }

  test("q65 grams: verbatim 8-token span is caught, 7-token overlap is not") {
    val train = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val hit = Seq((2L, "INTRO quick brown fox jumps over the lazy dog OUTRO"))
      .toDF("doc_id", "text")
    val near = Seq((3L, "INTRO quick brown fox jumps over the lazy cat OUTRO"))
      .toDF("doc_id", "text")
    val tg = Dedup.tokenGrams(train, 8)
    Dedup.tokenGrams(hit, 8).join(tg, "g").count() should be > 0L
    Dedup.tokenGrams(near, 8).join(tg, "g").count() shouldBe 0L
  }

  test("q65 catalog: audits exactly the test split and flags are consistent") {
    val rows = SparkEntry.queries("q65_exact_decontamination")(spark, dir).collect()
    rows.length should be > 0
    // the audit must enumerate every test-split doc long enough to have
    // an 8-gram window — clean docs included, short docs excluded
    val expected = sources.Tables.documents(spark, dir)
      .filter(Curation.splitBucket($"doc_id") >= 90)
      // NB: bare `size` here is ScalaTest's SizeWord, not Spark's — qualify
      .filter(org.apache.spark.sql.functions.size(split($"text", "\\s+")) >= 8)
      .select($"doc_id").as[Long].collect().toSet
    rows.map(_.getLong(0)).toSet shouldBe expected
    rows.foreach { r =>
      val (nGrams, nHit, nTrain, frac, flag) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5))
      nGrams should be > 0L
      nHit should be <= nGrams
      if (nHit > 0) nTrain should be > 0L else nTrain shouldBe 0L
      frac shouldBe nHit.toDouble / nGrams
      flag shouldBe (if (nHit > 0) 1 else 0)
    }
  }

  test("bloom-prefiltered decontamination equals q65 exactly (no false negatives)") {
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q65_exact_decontamination")(spark, dir)
      .as[(Long, Long, Long, Long, Double, Int)].collect().toSet
    exact.exists(_._6 == 1) shouldBe true // the corpus does leak
    // tight and deliberately sloppy calibrations: Bloom false positives
    // only add exact-verify work, never change the output
    for (fpp <- Seq(0.03, 0.5)) {
      val pre = graft.operators.Dedup.bloomDecontamination(spark, dir, fpp)
        .as[(Long, Long, Long, Long, Double, Int)].collect().toSet
      pre shouldBe exact
    }
    // the probe is Catalyst's native might_contain over a foldable
    // literal — no UDF in the surviving-grams plan
    val plan = graft.operators.Dedup.bloomDecontamination(spark, dir)
      .queryExecution.executedPlan.toString
    plan should include("might_contain")
    (plan should not).include("UDF")
  }

  test("q98 spans reconcile with q65's flags and islands are maximal") {
    import spark.implicits._
    val spans = SparkEntry.queries("q98_contamination_spans")(spark, dir).collect()
    val flagged = SparkEntry.queries("q65_exact_decontamination")(spark, dir)
      .filter($"is_contaminated" === 1).select($"doc_id").as[Long].collect().toSet
    // exactly the q65-contaminated docs carry spans
    spans.map(_.getAs[Long]("doc_id")).toSet shouldBe flagged
    spans.foreach { r =>
      val (s, e, n) = (r.getAs[Int]("span_start"), r.getAs[Int]("span_end"),
        r.getAs[Long]("span_tokens"))
      s should be >= 0
      // islands are contiguous: covered count equals the span width
      n shouldBe (e - s + 1).toLong
      // a span covers at least one whole 8-gram
      n should be >= 8L
    }
    // maximality: spans of one doc never touch or overlap
    spans.groupBy(_.getAs[Long]("doc_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("span_start"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          b.getAs[Int]("span_start") should be > a.getAs[Int]("span_end") + 1
        case _ => ()
      }
    }
  }

  test("q155 duplicated-span accounting equals a from-scratch recount") {
    import spark.implicits._
    val rows = SparkEntry.queries("q155_dup_spans")(spark, dir)
      .as[(Long, Int, Int, Long, Long, Long, Double)].collect()
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", split($"text", "\\s+").as("t"))
      .as[(Long, Seq[String])].collect()
    rows.length shouldBe docs.length // the report enumerates the whole corpus
    val W = 8
    def grams(ts: Seq[String]): Seq[(Int, String)] =
      if (ts.length < W) Seq.empty
      else ts.sliding(W).zipWithIndex.map { case (g, i) => i -> g.mkString(" ") }.toSeq
    val byDoc = docs.map { case (id, ts) => id -> grams(ts) }.toMap
    // a gram is duplicated iff it occurs in ≥ 2 distinct docs
    val docsOfGram = collection.mutable.Map.empty[String, Set[Long]].withDefaultValue(Set.empty)
    byDoc.foreach { case (id, gs) => gs.foreach { case (_, g) => docsOfGram(g) += id } }
    val dupSet = docsOfGram.collect { case (g, ds) if ds.size >= 2 => g }.toSet
    rows.foreach { case (id, nTok, nGr, dupGr, nSpans, dupTok, frac) =>
      val ts = docs.find(_._1 == id).get._2
      nTok shouldBe ts.length
      nGr shouldBe math.max(ts.length - W + 1, 0)
      val hits = byDoc(id).filter { case (_, g) => dupSet(g) }
      dupGr shouldBe hits.size.toLong
      val covered = hits.flatMap { case (i, _) => i until i + W }.toSet
      dupTok shouldBe covered.size.toLong
      // island count: covered positions split at gaps
      val sorted = covered.toSeq.sorted
      val islands =
        if (sorted.isEmpty) 0
        else 1 + sorted.sliding(2).count { case Seq(a, b) => b > a + 1; case _ => false }
      nSpans shouldBe islands.toLong
      frac shouldBe covered.size.toDouble / ts.length
    }
    // the synthetic corpus plants duplicate clusters — some spans exist,
    // and clean docs exist too (the metric discriminates)
    rows.count(_._6 > 0) should be > 0
    rows.count(_._6 == 0) should be > 0
  }

  test("q159 winnowing: density, recount, and the detection guarantee") {
    import spark.implicits._
    val fps = SparkEntry.queries("q159_winnowing")(spark, dir)
      .as[(Long, Int, Long)].collect()
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", split($"text", "\\s+").as("t"))
      .as[(Long, Seq[String])].collect()
    // ~2/(w+1) of grams selected (Schleimer et al. §4), w = 4
    val nGrams = docs.map(d => math.max(d._2.length - 4, 0)).sum
    val density = fps.length.toDouble / nGrams
    density should (be >= 0.3 and be <= 0.5)
    // from-scratch recount on a sample of docs: rightmost-min per
    // complete 4-hash window, deduplicated
    def h32(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
    val byDoc = fps.groupBy(_._1)
    docs.take(20).foreach { case (id, ts) =>
      val hs = if (ts.length < 5) Array.empty[Long]
      else ts.sliding(5).map(g => h32(g.mkString(" "))).toArray
      val expect = (0 to hs.length - 4).map { s =>
        val win = (s until s + 4).map(p => (hs(p), p))
        val mh = win.map(_._1).min
        val pos = win.filter(_._1 == mh).map(_._2).max // rightmost min
        (pos, mh)
      }.distinct.sorted
      byDoc.getOrElse(id, Array.empty).map(f => (f._2, f._3)).toSeq.sorted shouldBe expect
    }
    // THE guarantee: two docs sharing a >= k+w-1 = 8-token run always
    // share a fingerprint hash, however different the surroundings
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val pair = Seq(
      (1L, s"a1 a2 a3 a4 a5 $shared b1 b2 b3 b4 b5"),
      (2L, s"c1 c2 c3 c4 c5 c6 $shared d1 d2 d3 d4")).toDF("doc_id", "text")
    val pf = graft.operators.Dedup.winnowFingerprints(pair)
      .as[(Long, Int, Long)].collect()
    val f1 = pf.filter(_._1 == 1L).map(_._3).toSet
    val f2 = pf.filter(_._1 == 2L).map(_._3).toSet
    (f1 intersect f2) should not be empty
    // negative control: disjoint vocabularies share nothing
    val disjoint = Seq(
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
      (4L, "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10")).toDF("doc_id", "text")
    val df2 = graft.operators.Dedup.winnowFingerprints(disjoint)
      .as[(Long, Int, Long)].collect()
    (df2.filter(_._1 == 3L).map(_._3).toSet intersect
      df2.filter(_._1 == 4L).map(_._3).toSet) shouldBe empty
  }

  test("streaming winnow-index append equals the batch build row for row") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val (shard1, shard2) = docs.splitAt(docs.length / 2)
    withTempDir("winnowidx") { out =>
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val source = MemoryStream[(Long, String)]
      // selection is a stateless typed map, so the per-shard index
      // append is the SAME function the batch build runs
      val q = source.toDS().toDF("doc_id", "text").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.Dedup.winnowFingerprints(batch)
            .write.mode("append").parquet(out)
          ()
        }
        .start()
      source.addData(shard1.toSeq); q.processAllAvailable()
      source.addData(shard2.toSeq); q.processAllAvailable()
      q.stop()
      val streamed = spark.read.parquet(out)
        .as[(Long, Int, Long)].collect().toSet
      val batch = SparkEntry.queries("q159_winnowing")(spark, dir)
        .as[(Long, Int, Long)].collect().toSet
      streamed shouldBe batch
    }
  }

  test("q160 winnow pairs are well-formed, consistent with q155, and recall the MinHash pairs") {
    import spark.implicits._
    val wp = SparkEntry.queries("q160_winnow_pairs")(spark, dir)
      .as[(Long, Long, Long)].collect()
    wp.length should be > 0
    wp.foreach { case (a, b, s) => a should be < b; s should be >= 2L }
    // structural consistency: a doc in any winnow pair shares >= 1
    // cross-doc gram, so the exhaustive q155 table MUST show coverage
    val dupDocs = SparkEntry.queries("q155_dup_spans")(spark, dir)
      .filter($"dup_tokens" > 0).select($"doc_id").as[Long].collect().toSet
    wp.flatMap(p => Seq(p._1, p._2)).toSet.subsetOf(dupDocs) shouldBe true
    // the 40%-density index still recalls most MinHash-banded near-dup
    // pairs (the misses are pairs whose edits break every verbatim
    // 8-token run — a different sensitivity, not a defect)
    val mh = SparkEntry.queries("q26_ngram_jaccard")(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val wpairs = wp.map(p => (p._1, p._2)).toSet
    (wpairs intersect mh).size.toDouble / mh.size should be >= 0.6
  }
}
