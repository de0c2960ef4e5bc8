package graft

/** Smoke gate for the whole catalog: every declared query must run
  * end-to-end on the t1 tier (sf0.001) — value parity against DuckDB is
  * the driver's gate (scripts/check.py locally). */
class CatalogSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("every oracle key has a query implementation") {
    SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet) shouldBe empty
  }

  test("flagship entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs end-to-end at sf0.001") {
      noException should be thrownBy fn(spark, sfDir).count()
    }
  }

  test("q39 approx distinct stays within the configured error of exact (A10)") {
    import spark.implicits._
    // a hash oracle is impossible for q39 — the HLL estimate depends on
    // Spark's sketch implementation, which DuckDB cannot reproduce — so
    // this bounds the error against the exact counts instead: the rsd
    // parameter is the sketch's relative standard deviation (default
    // 0.05; 0.01 for approx_supps), and 4σ makes a false failure
    // astronomically unlikely while still catching a broken sketch
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q39_approx_distinct")(spark, dir)
      .as[(String, Long, Long)].collect()
      .map { case (k, p, s) => k -> (p, s) }.toMap
    val exact = graft.sources.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        org.apache.spark.sql.functions.countDistinct($"l_partkey").as("p"),
        org.apache.spark.sql.functions.countDistinct($"l_suppkey").as("s"))
      .as[(String, Long, Long)].collect()
      .map { case (k, p, s) => k -> (p, s) }.toMap
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (flag, (p, s)) =>
      val (ap, as_) = approx(flag)
      math.abs(ap - p).toDouble / p should be <= 4 * 0.05
      math.abs(as_ - s).toDouble / s should be <= 4 * 0.01
    }
  }
}
