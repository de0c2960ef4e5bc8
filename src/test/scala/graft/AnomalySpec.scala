package graft

import org.apache.spark.sql.functions._

import graft.core.Heuristic
import graft.operators.Anomaly

/** Speed-layer golden tests ported from the reference's
  * AnalyzerSpec.scala:24-39 ("heuristic analysis should return correct
  * results"): heuristic over the most recent 200 values of the first
  * sensor; samples (10, 200, −100) → (0, 1, 0.5±0.5). */
class AnomalySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val recent =
    Anomaly.recentWindow(fixture.filter($"sensor" === FirstSensor), 200)

  private lazy val stats = Anomaly.fastAnalysis(recent).collect().head

  test("recent window keeps exactly the most recent N rows per sensor") {
    val all = Anomaly.recentWindow(fixture, 200)
    val counts = all.groupBy("sensor").count().collect()
    counts.length shouldBe 4
    all.count() shouldBe 800
    // newest-first: the window's max ts equals the sensor's global max ts
    val globalMax = fixture.filter($"sensor" === FirstSensor).agg(max($"ts")).head.getTimestamp(0)
    stats.getAs[java.sql.Timestamp]("ts") shouldBe globalMax
  }

  test("golden heuristic values (AnalyzerSpec.scala:24-39)") {
    val mean = stats.getAs[Double]("avg_v")
    val std = stats.getAs[Double]("std_v")
    Heuristic.score(10, mean, std) shouldBe 0.0 +- Precision
    Heuristic.score(200, mean, std) shouldBe 1.0 +- Precision
    Heuristic.score(-100, mean, std) shouldBe 0.5 +- 0.5
  }

  test("column-algebra heuristic equals the Scala reference formula") {
    val mean = stats.getAs[Double]("avg_v")
    val std = stats.getAs[Double]("std_v")
    val samples = Seq(10.0, 200.0, -100.0, 42.5, -3.25)
    val fromColumns = samples.toDF("sample")
      .select(Anomaly.heuristicScore($"sample", lit(mean), lit(std)).as("s"))
      .as[Double].collect()
    fromColumns.zip(samples.map(Heuristic.score(_, mean, std))).foreach {
      case (col, scala) => col shouldBe scala +- 1e-12
    }
  }

  test("stddev_pop matches the hand-rolled population formula") {
    val values = recent.select($"value").as[Double].collect()
    val std = stats.getAs[Double]("std_v")
    std shouldBe Heuristic.stdDevPop(values) +- 1e-9
    // and it is NOT the sample stddev (n vs n-1 — SURVEY A3)
    val sample = recent.agg(stddev_samp($"value")).head.getDouble(0)
    math.abs(std - sample) should be > 0.0
  }

  test("fast analysis latest value is the rn=1 (newest) row") {
    val newest = recent.filter($"rn" === 1).select($"value").as[Double].head()
    stats.getAs[Double]("last_v") shouldBe newest
  }

  test("heuristic clamps to [0,1] for any input (property)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val sample = (rnd.nextDouble() - 0.5) * 2e6
      val mean = (rnd.nextDouble() - 0.5) * 2e6
      val std = rnd.nextDouble() * 1e6 + 1e-9
      val s = Heuristic.score(sample, mean, std)
      assert(s >= 0.0 && s <= 1.0, s"score($sample, $mean, $std) = $s")
    }
  }

  test("blend: 35/65 with model, heuristic fallback and -1 sentinel without") {
    Heuristic.blend(0.4, Some(0.8)) shouldBe ((0.8, (0.4 * 35 + 0.8 * 65) / 100))
    Heuristic.blend(0.4, None) shouldBe ((-1.0, 0.4))
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val (fast, full) = (rnd.nextDouble(), rnd.nextDouble())
      val (_, avg) = Heuristic.blend(fast, Some(full))
      assert(avg >= math.min(fast, full) - 1e-12 && avg <= math.max(fast, full) + 1e-12)
    }
  }

  test("analysis join: sentinel and blend as columns (Analyzer.scala:138-151)") {
    val fast = Seq(("a", 0.4), ("b", 0.6)).toDF("sensor", "fast_anomaly")
      .withColumn("ts", current_timestamp())
    val scores = Seq(("a", 0.8)).toDF("sensor", "full_score")
    val out = Anomaly.analysis(fast, scores).collect().map(r =>
      r.getAs[String]("name") ->
        ((r.getAs[Double]("fastAnomaly"), r.getAs[Double]("fullAnomaly"), r.getAs[Double]("avgAnomaly")))).toMap
    out("a") shouldBe ((0.4, 0.8, (0.4 * 35 + 0.8 * 65) / 100))
    out("b") shouldBe ((0.6, -1.0, 0.6))
  }
}
