package graft

import org.apache.spark.sql.functions._

import graft.core.Heuristic
import graft.ml.AnomalyForest
import graft.operators.Anomaly

/** End-to-end flagship pipeline over the reference fixture — the full
  * §3.1 path in one DataFrame program: recent window → speed-layer
  * heuristic → batch-layer RF posterior on each sensor's latest value →
  * 35/65 blend into SensorMeta rows. The Spark re-expression of
  * "GET http://:8082/" (Endpoint.scala:54-66 → Analyzer.scala:104-151). */
class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("flagship analysis end-to-end: 4 SensorMeta rows, blended scores") {
    val recent = Anomaly.recentWindow(fixture, 200)
    val fast = Anomaly.fastAnalysis(recent)
    val models = AnomalyForest.train(fixture)
    val latest = fast.select($"sensor", $"last_v".as("value"))
    val scores = AnomalyForest.scoreLatest(models, latest)
    val metas = Anomaly.analysis(fast, scores).orderBy($"name")

    val rows = metas.collect()
    rows.length shouldBe 4
    rows.map(_.getAs[String]("name")).toSeq shouldBe
      fixture.select($"sensor").distinct().as[String].collect().sorted.toSeq

    rows.foreach { r =>
      val fastA = r.getAs[Double]("fastAnomaly")
      val fullA = r.getAs[Double]("fullAnomaly")
      val avgA = r.getAs[Double]("avgAnomaly")
      fastA should (be >= 0.0 and be <= 1.0)
      if (models.contains(r.getAs[String]("name"))) {
        fullA should (be >= 0.0 and be <= 1.0)
        avgA shouldBe (fastA * 35 + fullA * 65) / 100 +- 1e-12
      } else {
        fullA shouldBe -1.0
        avgA shouldBe fastA
      }
    }

    // the whole pipeline serves as the reference JSON envelope
    val json = streaming.Serving.allMetaJson(
      metas.as[graft.core.SensorMeta].collect().toSeq)
    json should startWith("""{"entries":[{"name":"""")
    json.count(_ == '{') shouldBe 5 // envelope + 4 sensors
  }

  test("speed layer alone matches the plain-Scala reference on every sensor") {
    val fast = Anomaly.fastAnalysis(Anomaly.recentWindow(fixture, 200)).collect()
    fast.foreach { r =>
      val values = Anomaly.recentWindow(
        fixture.filter($"sensor" === r.getAs[String]("sensor")), 200)
        .orderBy($"rn").select($"value").as[Double].collect()
      val expected = Heuristic.score(
        values.head, values.sum / values.length, Heuristic.stdDevPop(values))
      r.getAs[Double]("fast_anomaly") shouldBe expected +- 1e-9
    }
  }

  test("curated snapshot: keeper-only, scrubbed, leakage-repaired, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-curated").toString
    val acct = graft.operators.Curation.materializeCurated(spark, dir, out)
      .as[(String, Long, Long)].collect()
    acct.map(_._1).toSeq shouldBe acct.map(_._1).distinct.toSeq // one row per split
    val written = spark.read.parquet(out)
      .select($"doc_id", $"split", $"text").as[(Long, String, String)].collect()
    acct.map(_._2).sum shouldBe written.length.toLong

    // exactly the q73 canonical keepers plus every untouched singleton
    val canonical = SparkEntry.queries("q73_cluster_canonical")(spark, dir)
      .select($"canonical_doc").as[Long].collect().toSet
    val clustered = SparkEntry.queries("q50_dup_clusters")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val allDocs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    written.map(_._1).toSet shouldBe ((allDocs -- clustered) ++ canonical)
    written.length should be < allDocs.size // the dedup actually dropped copies

    // every kept doc landed in its q77 repaired split, and the writer
    // laid the corpus out as split=... partitions
    val repaired = SparkEntry.queries("q77_leakage_repair")(spark, dir)
      .select($"doc_id", $"repaired_split").as[(Long, String)].collect().toMap
    written.foreach { case (id, s, _) => s shouldBe repaired(id) }
    new java.io.File(out).list().filter(_.startsWith("split=")).sorted.toSeq shouldBe
      written.map("split=" + _._2).distinct.sorted.toSeq

    // the scrub left none of the four PII shapes behind
    val pii = Seq("[A-Za-z0-9._%+-]+@", "\\b\\d{3}-\\d{3}-\\d{4}\\b",
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "\\b\\d{3}-\\d{2}-\\d{4}\\b")
    pii.foreach(p => written.count(_._3.matches(s".*$p.*")) shouldBe 0)

    // re-materializing overwrites with identical content
    graft.operators.Curation.materializeCurated(spark, dir, out).collect()
    spark.read.parquet(out).select($"doc_id", $"split", $"text")
      .as[(Long, String, String)].collect().toSet shouldBe written.toSet
  }
}
