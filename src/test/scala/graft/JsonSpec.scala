package graft

import org.apache.spark.sql.functions._

import graft.sources.{Json, Tables}

/** JSONL source/sink: lossless round-trip with the DECLARED schema,
  * quarantined (never silent) malformed lines, and exactly-once
  * streaming conversion of landed drops. */
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

  test("fromJsonl converts clean rows and quarantines malformed lines") {
    withTempDir("jsonl") { jl =>
      withTempDir("pq") { pqRoot =>
        val pq = s"$pqRoot/data"
        java.nio.file.Files.write(
          java.nio.file.Paths.get(jl, "drop.json"),
          ("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "a", "n_chars": 2}""" +
            "\nnot json at all\n" +
            """{"doc_id": 2, "text": "also", "lang": "de", "source": "b", "n_chars": 4}""" +
            "\n").getBytes("UTF-8"))
        Json.fromJsonl(spark, jl, pq)
        val converted = spark.read.parquet(pq)
        // clean rows only — the malformed line is NOT a null-filled row
        converted.select($"doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
        // ...and its raw text is preserved in the rejects file
        val rejects = spark.read.text(s"$pq.rejects")
        rejects.as[String].collect() shouldBe Array("not json at all")
        // columnar after conversion: a 2-column projection prunes the scan
        val p = converted.select($"doc_id", $"lang")
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        p should include("ReadSchema: struct<doc_id:bigint,lang:string>")
      }
    }
  }

  test("streamFromJsonl converts each landed drop exactly once, corrupt lines flagged") {
    withTempDir("jsonldrops") { drops =>
      withTempDir("sink") { sinkDir =>
        def drop(name: String, lines: Seq[String]): Unit =
          java.nio.file.Files.write(
            java.nio.file.Paths.get(drops, name),
            lines.mkString("", "\n", "\n").getBytes("UTF-8"))
        drop("a.json", Seq(
          """{"doc_id": 1, "text": "t1", "lang": "en", "source": "s", "n_chars": 2}""",
          """{"doc_id": 2, "text": "t2", "lang": "en", "source": "s", "n_chars": 2}"""))
        Json.streamFromJsonl(spark, drops, s"$sinkDir/data", s"$sinkDir/ckpt")
          .awaitTermination(60000) shouldBe true
        // a second drop lands, one line truncated; a rerun on the same
        // checkpoint converts ONLY the new file
        drop("b.json", Seq(
          """{"doc_id": 3, "text": "t3", "lang": "en", "source": "s", "n_chars": 2}""",
          """{"doc_id": 4, "text"""))
        Json.streamFromJsonl(spark, drops, s"$sinkDir/data", s"$sinkDir/ckpt")
          .awaitTermination(60000) shouldBe true
        val got = spark.read.parquet(s"$sinkDir/data")
        // exactly once: no replay of a.json on the second pass
        got.filter($"_corrupt_record".isNull)
          .select($"doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)
        // the truncated line survives flagged, raw text intact
        got.filter($"_corrupt_record".isNotNull)
          .select($"_corrupt_record").as[String].collect() shouldBe
          Array("""{"doc_id": 4, "text""")
      }
    }
  }
}
