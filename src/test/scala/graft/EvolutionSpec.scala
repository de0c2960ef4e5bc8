package graft

/** Schema evolution on the parquet sinks: a pipeline that runs for
  * years adds columns; old files must keep reading (nulls for the new
  * column), new files must keep their data, and scans must still
  * prune. This is a read-option contract (`mergeSchema`), not a
  * rewrite — 100 TB of history is never backfilled. */
class EvolutionSpec extends SparkSpecBase {
  import spark.implicits._

  test("appending a widened schema merges on read; old rows null-fill") {
    withTempDir("evolve") { out =>
      // v1 era: two columns
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
        .write.mode("append").parquet(out)
      // v2 era: a lang column appears
      Seq((3L, "gamma", "en"), (4L, "delta", "de"))
        .toDF("doc_id", "text", "lang")
        .write.mode("append").parquet(out)
      val merged = spark.read.option("mergeSchema", "true").parquet(out)
      merged.columns.sorted shouldBe Array("doc_id", "lang", "text")
      val rows = merged.orderBy($"doc_id")
        .select($"doc_id", $"text", $"lang").collect()
      rows.map(_.getAs[Long]("doc_id")).toSeq shouldBe Seq(1L, 2L, 3L, 4L)
      // v1 rows surface the evolved column as null, v2 rows keep data
      rows.take(2).foreach(r => r.getAs[String]("lang") shouldBe null)
      rows.drop(2).map(_.getAs[String]("lang")).toSeq shouldBe Seq("en", "de")
      // predicates on the evolved column still push down and behave:
      // null-filled v1 rows never match an equality filter
      val en = merged.filter($"lang" === "en")
      en.select($"doc_id").as[Long].collect().toSeq shouldBe Seq(3L)
      val p = en.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      p should include("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]")
    }
  }
}
