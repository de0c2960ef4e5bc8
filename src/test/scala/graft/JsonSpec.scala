package graft

import org.apache.spark.sql.functions._

import graft.sources.{Json, Tables}

/** JSONL source/sink: lossless round-trip with the DECLARED schema,
  * and the edge conversion to parquet preserves every row. */
class JsonSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("documents round-trip jsonl losslessly under the declared schema") {
    withTempDir("jsonl") { out =>
      val src = Tables.documents(spark, sfDir)
      Json.write(src, out)
      val back = Json.read(spark, out, Json.documents)
      back.schema.fieldNames.sorted shouldBe src.columns.sorted
      val key = Seq($"doc_id", $"text", $"lang", $"source", $"n_chars")
      back.select(key: _*).orderBy($"doc_id").collect() shouldBe
        src.select(key: _*).orderBy($"doc_id").collect()
    }
  }

  test("fromJsonl converts a corpus drop to parquet row-for-row") {
    withTempDir("jsonl") { jl =>
      withTempDir("pq") { pq =>
        Json.write(Tables.documents(spark, sfDir), jl)
        Json.fromJsonl(spark, jl, pq)
        val converted = spark.read.parquet(pq)
        converted.count() shouldBe Tables.documents(spark, sfDir).count()
        // columnar after conversion: a 2-column projection prunes the scan
        val p = converted.select($"doc_id", $"lang")
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        p should include("ReadSchema: struct<doc_id:bigint,lang:string>")
      }
    }
  }

  test("streamFromJsonl picks up each landed drop exactly once") {
    withTempDir("jsonldrops") { drops =>
      withTempDir("sink") { sinkDir =>
        def drop(name: String, ids: Seq[Long]): Unit = {
          val lines = ids.map(i =>
            s"""{"doc_id": $i, "text": "t$i", "lang": "en", "source": "s", "n_chars": 2}""")
          java.nio.file.Files.write(
            java.nio.file.Paths.get(drops, name),
            lines.mkString("", "\n", "\n").getBytes("UTF-8"))
        }
        drop("a.json", Seq(1L, 2L))
        val q = Json.streamFromJsonl(spark, drops).writeStream
          .format("parquet")
          .option("path", s"$sinkDir/data")
          .option("checkpointLocation", s"$sinkDir/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(60000) shouldBe true
        // a second drop lands; a new incremental pass converts ONLY it
        drop("b.json", Seq(3L))
        val q2 = Json.streamFromJsonl(spark, drops).writeStream
          .format("parquet")
          .option("path", s"$sinkDir/data")
          .option("checkpointLocation", s"$sinkDir/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q2.awaitTermination(60000) shouldBe true
        val got = spark.read.parquet(s"$sinkDir/data")
        // exactly once: no replay of a.json on the second pass
        got.select($"doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)
      }
    }
  }

  test("a malformed line surfaces as _corrupt_record instead of killing the read") {
    withTempDir("jsonl") { out =>
      val f = java.nio.file.Paths.get(out, "part-0.json")
      java.nio.file.Files.write(f,
        ("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "a", "n_chars": 2}""" +
          "\nnot json at all\n").getBytes("UTF-8"))
      val schema = Json.documents.add("_corrupt_record", "string")
      // Spark disallows querying ONLY the corrupt-record column from the
      // raw file (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first, the
      // documented pattern
      val got = Json.read(spark, out, schema).cache()
      try {
        got.count() shouldBe 2
        got.filter($"_corrupt_record".isNotNull).count() shouldBe 1
        got.filter($"_corrupt_record".isNull)
          .select($"doc_id").as[Long].collect() shouldBe Array(1L)
      } finally got.unpersist()
    }
  }
}
