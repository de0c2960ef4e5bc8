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

  test("q39 approx distinct: verdicts hold and exact companions reconcile (A10)") {
    import spark.implicits._
    // the raw HLL estimate is engine-local (DuckDB cannot reproduce
    // it), so since round 5 the query emits exact companions plus
    // in-bound verdicts (|approx−exact|/exact ≤ 4·rsd, rsd = 0.05 /
    // 0.01) computed IN-QUERY from the live sketch — this test pins
    // the verdicts to 1 and the exacts to an independent recount; the
    // DuckDB oracle hash-gates the same contract
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q39_approx_distinct")(spark, dir)
      .as[(String, Long, Long, Int, Int)].collect()
      .map { case (k, p, s, pb, sb) => k -> ((p, s, pb, sb)) }.toMap
    val exact = graft.sources.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        org.apache.spark.sql.functions.countDistinct($"l_partkey").as("p"),
        org.apache.spark.sql.functions.countDistinct($"l_suppkey").as("s"))
      .as[(String, Long, Long)].collect()
      .map { case (k, p, s) => k -> (p, s) }.toMap
    rows.keySet shouldBe exact.keySet
    exact.foreach { case (flag, (p, s)) =>
      val (ep, es, pb, sb) = rows(flag)
      (ep, es) shouldBe ((p, s))
      pb shouldBe 1
      sb shouldBe 1
    }
  }
}
