package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scheduler/codegen warmup so the first query isn't charged for JVM
    // startup (no table data is touched — IO stays cold per query)
    spark.range(1000).selectExpr("id % 7 AS k", "id").groupBy("k").count().count()
    // a failed query reports -1 (never a success-shaped elapsed time)
    // and is listed in "failed" so regressions can't masquerade as runs
    val runs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    val results = runs.map { case (n, t, _) => n -> t }
    val failed = runs.collect { case (n, _, false) => "\"" + n + "\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
