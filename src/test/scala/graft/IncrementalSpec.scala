package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental corpus dedup (q57): the daily-append path must agree with
  * the full-batch rebuild (q50) while touching only the new batch and
  * the persisted index — never re-shingling the old corpus. */
class IncrementalSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def q57 = SparkEntry.queries("q57_incremental_dedup")(spark, dir)
  private def q50 = SparkEntry.queries("q50_dup_clusters")(spark, dir)

  test("incremental assignment equals the full-batch rebuild on new docs") {
    import spark.implicits._
    val inc = q57.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val full = q50.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val newIds = Dedup.newBatch(spark, dir).select($"doc_id").as[Long].collect().toSet
    inc.keySet shouldBe newIds // one row per incoming doc, no more

    newIds.foreach { id =>
      full.get(id) match {
        case Some(lbl) => // clustered in the full batch → same cluster here
          inc(id)._1 shouldBe lbl
        case None => // full-batch singleton → own cluster, joins nothing
          inc(id) shouldBe ((id, 0))
      }
    }
    // and joins_existing is exactly "my full-batch cluster contains an
    // old doc" (old = split bucket < 90)
    val oldIds = Dedup.oldCorpus(spark, dir).select($"doc_id").as[Long].collect().toSet
    val clustersWithOld = full.collect { case (id, lbl) if oldIds(id) => lbl }.toSet
    newIds.filter(full.contains).foreach { id =>
      inc(id)._2 shouldBe (if (clustersWithOld(full(id))) 1 else 0)
    }
  }

  test("warm incremental step never re-shingles: no shingle transform, index from cache") {
    q57.count() // warm the persisted state (index, prior labels, new sigs)
    val p = q57.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // assignment labels come from the persisted intermediate …
    p should include("InMemoryTableScan")
    // … so no branch of the plan tokenizes or shingles ANY document —
    // the shingle explode ("transform(sequence(…)") appears nowhere
    (p should not).include("transform(sequence")
    // the only parquet read is the new-batch id scan for the output join
    // (formatted explain names each node twice: tree line + detail header)
    p.sliding("Scan parquet".length).count(_ == "Scan parquet") shouldBe 2
  }

  test("the persisted index holds only old docs; new signatures only new docs") {
    import spark.implicits._
    val newIds = Dedup.newBatch(spark, dir).select($"doc_id").as[Long].collect().toSet
    val indexIds = Dedup.oldBands(spark, dir)
      .select($"doc_id").distinct().as[Long].collect().toSet
    indexIds.intersect(newIds) shouldBe empty
    val sigIds = Dedup.sigNew(spark, dir).select($"doc_id").as[Long].collect().toSet
    sigIds.diff(newIds) shouldBe empty
  }
}
