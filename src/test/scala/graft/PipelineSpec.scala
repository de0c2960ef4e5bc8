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
}
