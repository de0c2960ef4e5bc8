package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing tests: asset schema, partition-batched featurize
  * determinism, and the decode-stub operators. */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("assets carry binary payloads with typed metadata") {
    val assets = Multimodal.assetsFromDocuments(spark, sfDir)
    val a = assets.filter($"asset_id" === 0L).head()
    a.kind should (be("image") or be("audio") or be("video"))
    a.content should not be empty
    assets.select($"kind").distinct().count() shouldBe 3
  }

  test("featurize is deterministic and byte-accurate across partitions") {
    val assets = Multimodal.assetsFromDocuments(spark, sfDir).repartition(7)
    val f1 = Multimodal.featurize(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.featurize(assets).collect().sortBy(_.asset_id)
    f1 shouldBe f2
    // n_bytes equals the UTF-8 length of the source text
    val expected = sources.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "octet_length(encode(text, 'UTF-8')) AS n")
      .as[(Long, Int)].collect().toMap
    f1.foreach(f => f.n_bytes shouldBe expected(f.asset_id))
    // stub decode invariants
    f1.foreach { f =>
      f.width shouldBe 64 + f.n_bytes % 512
      f.height shouldBe 64 + (f.n_bytes / 7) % 512
      if (f.kind != "video") f.n_frames shouldBe 1
    }
  }

  test("decode stub resize and frame sampling") {
    val d = Multimodal.FakeDecoder.decode("video", Array.fill(100)(7.toByte))
    Multimodal.FakeDecoder.resize(d, 32, 32).width shouldBe 32
    Multimodal.FakeDecoder.sampleFrames(d, 2).length shouldBe (d.nFrames + 1) / 2
  }
}
