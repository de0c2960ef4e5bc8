package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling: `operators.Skew` salts deterministically
  * when the key histogram is known (q102's triage); for the unknown
  * case, AQE must split oversized partitions at runtime. This locks
  * that the engine's join shapes actually qualify for AQE's skew-join
  * rewrite — thresholds lowered to fixture scale, the same relaxation
  * discipline as the bloom-filter proof. */
class AqeSkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("AQE splits a hot-key sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.coalescePartitions.enabled" ->
        conf.get("spark.sql.adaptive.coalescePartitions.enabled"))
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // one pathologically hot key (90% of rows) next to a flat tail —
      // q102's heavy bucket as a join key. The payload column must
      // SURVIVE into the aggregate: skew detection reads shuffle BYTES,
      // and a pruned-to-the-repeated-key partition compresses to almost
      // nothing (the first draft of this test never triggered).
      val left = spark.range(400000).select(
        when($"id" % 10 < 9, lit(7L)).otherwise($"id").as("k"),
        xxhash64($"id").as("payload"))
      val right = spark.range(512).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)), sum($"payload" % 1000)) // % 1000: ANSI-safe sum
      joined.collect()
      val fin = joined.queryExecution.executedPlan.toString
      fin should include("skew=true") // the hot partition was split
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
