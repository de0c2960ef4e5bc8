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
}
