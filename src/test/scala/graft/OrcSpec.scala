package graft

import org.apache.spark.sql.functions._

import graft.sources.{Orc, Tables}

/** ORC source/sink: lossless round-trip, and the same scan-side
  * pruning evidence the parquet paths carry (pushed predicates, pruned
  * columns, partition pruning on the hive layout). */
class OrcSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("documents round-trip ORC losslessly, hive-partitioned by lang") {
    withTempDir("orc") { out =>
      val src = Tables.documents(spark, sfDir)
      Orc.write(src, out, partitionBy = Seq("lang"))
      val back = Orc.read(spark, out)
      back.columns.sorted shouldBe src.columns.sorted
      val key = Seq($"doc_id", $"text", $"lang", $"source", $"n_chars")
      back.select(key: _*).orderBy($"doc_id").collect() shouldBe
        src.select(key: _*).orderBy($"doc_id").collect()
    }
  }

  test("ORC scans push predicates, prune columns, and prune partitions") {
    withTempDir("orc") { out =>
      Orc.write(Tables.documents(spark, sfDir), out, partitionBy = Seq("lang"))
      val q = Orc.read(spark, out)
        .filter($"lang" === "en" && $"n_chars" > 500)
        .select($"doc_id", $"n_chars")
      val p = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      p should include("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)")
      p should include("PartitionFilters: [isnotnull(lang") // hive layout prunes lang=en
      (p should not).include("text") // projection pruned to 2 columns at the scan
      // and the result matches the parquet source exactly
      val expect = Tables.documents(spark, sfDir)
        .filter($"lang" === "en" && $"n_chars" > 500)
        .select($"doc_id", $"n_chars").orderBy($"doc_id").collect()
      q.orderBy($"doc_id").collect() shouldBe expect
    }
  }
}
