package graft.ml

import scala.util.{Failure, Success, Try}

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Anomaly

/** The reference's batch layer (lambda-sample analyzer/Trainer.scala:
  * 38-74): per-sensor Random Forest classifiers `value → anomaly`,
  * refit over the full history window, served as posterior P(anomaly).
  *
  * Spark mapping: Smile `randomForest("anomaly" ~ "value")` becomes
  * `VectorAssembler(["value"]) → RandomForestClassifier`; the per-sensor
  * model keyed by the config sensor dimension stays a small Map exactly
  * like the reference's Redis hash of serialized models — model COUNT is
  * a config dimension (4 sensors), so the driver-side loop over sensors
  * is bounded config iteration, not a data scan. Training data per model
  * is a distributed DataFrame; nothing collects.
  *
  * Failure semantics match Trainer.scala:43-49: single-class training
  * data fails the per-sensor `Try` and the sensor simply has no model
  * (heuristic-only fallback downstream, Analyzer.scala:143-147).
  */
object AnomalyForest {

  private val assembler = new VectorAssembler()
    .setInputCols(Array("value")).setOutputCol("features")

  /** maxBins matters: with the default 32, quantile-based split
    * candidates all fall inside the dense normal-value range (anomalies
    * are ~3% tail mass), leaving no threshold that separates the
    * classes → depth-0 trees predicting the prior. 512 bins give the
    * tail its own cut points. */
  private def classifier(seed: Long) = new RandomForestClassifier()
    .setLabelCol("anomaly").setFeaturesCol("features")
    .setNumTrees(20).setMaxBins(512).setSeed(seed)

  /** Train one model per sensor over its most-recent `fullWindow` rows
    * (reference `cassandra.full` = 20000). Sensors whose window holds a
    * single class yield no model. */
  def train(
      entries: DataFrame,
      fullWindow: Int = 20000,
      seed: Long = 42L): Map[String, RandomForestClassificationModel] = {
    // cached for the duration of the fit loop: every per-sensor filter
    // and single-class check below re-reads this frame — uncached, each
    // of the ~2·#sensors jobs re-scanned the entry log and re-ran the
    // window (round-7 ServeSoak measured a 20-sensor refit at ~2 min on
    // a loaded box for exactly this reason; cached it is seconds)
    val windowed = Anomaly.recentWindow(entries, fullWindow)
      .select(col("sensor"), col("value"), col("anomaly").cast("double").as("anomaly"))
      .persist()
    try {
      val sensors = windowed.select("sensor").distinct()
        .collect().map(_.getString(0)).sorted // config dimension, ≤ handful
      sensors.flatMap { s =>
        val ds = windowed.filter(col("sensor") === s)
        Try {
          require(ds.select("anomaly").distinct().count() >= 2, s"single-class data for $s")
          classifier(seed).fit(assembler.transform(ds))
        } match {
          case Success(m) => Some(s -> m)
          case Failure(_) => None // Trainer.scala:43-49 — log-and-skip
        }
      }.toMap
    } finally windowed.unpersist()
  }

  /** Posterior P(anomaly) per input row (reference Analyzer.scala:72-83:
    * `rf.predict(tuple, posteriori); posteriori(1)`): appends
    * `p_anomaly` to `values`, which needs a `value` column. */
  def posterior(model: RandomForestClassificationModel, values: DataFrame): DataFrame =
    model.transform(assembler.transform(values))
      .select(values.columns.map(col) :+
        vector_to_array(col("probability")).getItem(1).as("p_anomaly"): _*)

  /** Posterior P(anomaly) of each sensor's latest value. `latest` needs
    * (sensor, value) rows; returns (sensor, full_score) suitable for
    * [[Anomaly.analysis]]. */
  def scoreLatest(
      models: Map[String, RandomForestClassificationModel],
      latest: DataFrame): DataFrame = {
    val perSensor = models.toSeq.sortBy(_._1).map { case (s, m) =>
      posterior(m, latest.filter(col("sensor") === s))
        .select(col("sensor"), col("p_anomaly").as("full_score"))
    }
    perSensor.reduceOption(_ unionByName _)
      .getOrElse(latest.sparkSession.emptyDataFrame
        .select(lit("").as("sensor"), lit(0.0).as("full_score")).limit(0))
  }

  /** MLlib-native persistence (replaces the reference's Java-serialized
    * Redis blobs, BinarySerializer.scala:88-101 — M4). */
  def saveAll(models: Map[String, RandomForestClassificationModel], dir: String): Unit =
    models.foreach { case (s, m) => m.write.overwrite().save(s"$dir/$s") }

  /** Human-readable forest dump (reference M5: the decision-tree dot
    * export of README.md:235-239). */
  def describe(model: RandomForestClassificationModel): String =
    model.toDebugString

  def load(dir: String, sensors: Seq[String]): Map[String, RandomForestClassificationModel] =
    sensors.flatMap { s =>
      Try(RandomForestClassificationModel.load(s"$dir/$s")).toOption.map(s -> _)
    }.toMap
}
