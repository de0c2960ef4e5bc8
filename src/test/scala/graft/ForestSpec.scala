package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ml.AnomalyForest

/** Batch-layer tests mirroring the reference's AnalyzerSpec.scala:41-98:
  * RF posterior tolerances for samples (10, 200, −100) → (0.1±0.1,
  * 0.9±0.1, 0.5±0.5), persistence round-trip, and the single-class
  * training guard (Trainer.scala:43-49). MLlib forests differ from
  * Smile's, so the contract is the reference's own tolerance bands, with
  * a fixed seed for internal reproducibility. */
class ForestSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val models = AnomalyForest.train(fixture)

  test("trains one model per sensor with two-class data") {
    val expected = fixture.filter($"anomaly" === 1)
      .select($"sensor").distinct().as[String].collect().toSet
    models.keySet shouldBe expected
    models.keySet should contain(FirstSensor)
  }

  test("golden posteriors (AnalyzerSpec.scala:41-55 tolerances)") {
    val m = models(FirstSensor)
    val samples = Seq(10.0, 200.0, -100.0).toDF("value")
    val p = AnomalyForest.posterior(m, samples)
      .select($"value", $"p_anomaly").as[(Double, Double)].collect().toMap
    p(10.0) shouldBe 0.1 +- 0.1
    p(200.0) shouldBe 0.9 +- 0.1
    p(-100.0) shouldBe 0.5 +- 0.5
  }

  test("single-class data yields no model (Trainer.scala:43-49 Try semantics)") {
    val singleClass = fixture.filter($"sensor" === FirstSensor && $"anomaly" === 0)
    AnomalyForest.train(singleClass) shouldBe empty
  }

  test("save/load round-trip preserves predictions (M4)") {
    val dir = Files.createTempDirectory("graft-models").toString
    AnomalyForest.saveAll(models, dir)
    val reloaded = AnomalyForest.load(dir, models.keys.toSeq)
    reloaded.keySet shouldBe models.keySet
    val samples = Seq(10.0, 200.0, -100.0, 130.0).toDF("value")
    val before = AnomalyForest.posterior(models(FirstSensor), samples)
      .select($"p_anomaly").as[Double].collect().toSeq
    val after = AnomalyForest.posterior(reloaded(FirstSensor), samples)
      .select($"p_anomaly").as[Double].collect().toSeq
    after shouldBe before
  }

  test("scoreLatest feeds the blend join with one score per modeled sensor") {
    val latest = fixture.sparkSession.createDataFrame(
      models.keys.toSeq.map(s => (s, 130.0))).toDF("sensor", "value")
    val scored = AnomalyForest.scoreLatest(models, latest)
    scored.count() shouldBe models.size
    scored.select(min($"full_score"), max($"full_score")).as[(Double, Double)].head() match {
      case (lo, hi) => lo should be >= 0.0; hi should be <= 1.0
    }
  }
}
