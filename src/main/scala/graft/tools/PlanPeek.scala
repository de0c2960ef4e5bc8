package graft.tools

import org.apache.spark.sql.SparkSession

/** Formatted-plan dump for one or more catalog queries — the loop used
  * while shaping a plan before locking it in PlanSpec:
  *
  *   sbt "runMain graft.tools.PlanPeek q136_interval_coverage"
  *
  * Prints the same `explain("formatted")` text PlanSpec asserts
  * against, under PlanSpec's session settings (4 shuffle partitions,
  * UTC, nanos-as-long), so what you see here is what the lock sees. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    for (q <- args) {
      val p = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"===== $q\n$p")
    }
  }
}
