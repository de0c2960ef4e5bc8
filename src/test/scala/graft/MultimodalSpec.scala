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

  // ------------------------------------------------------ MediaCodec
  test("PPM round-trips exactly and validates malformed payloads") {
    import Multimodal.MediaCodec
    val rgb = Array.tabulate(4 * 3 * 3)(i => (i * 37 % 256).toByte)
    val bytes = MediaCodec.encodePpm(4, 3, rgb)
    val p = MediaCodec.decodePpm(bytes)
    p.width shouldBe 4
    p.height shouldBe 3
    p.maxVal shouldBe 255
    // mean luminance is the exact integer sum over channel bytes / n
    p.meanLuma shouldBe rgb.map(_ & 0xff).map(_.toLong).sum.toDouble / rgb.length
    // corrupt magic / truncated body must throw, not decode garbage
    an[IllegalArgumentException] should be thrownBy
      MediaCodec.decodePpm("P5\n2 2\n255\n".getBytes("US-ASCII") ++ Array.fill(12)(0.toByte))
    an[IllegalArgumentException] should be thrownBy
      MediaCodec.decodePpm(bytes.dropRight(1))
  }

  test("WAV PCM16 round-trips exactly and validates chunk structure") {
    import Multimodal.MediaCodec
    val samples = Array.tabulate[Short](50)(i => (i * 331 - 8000).toShort)
    val bytes = MediaCodec.encodeWavPcm16(16000, samples)
    bytes.length shouldBe 44 + 100
    val w = MediaCodec.decodeWav(bytes)
    w.sampleRate shouldBe 16000
    w.nSamples shouldBe 50
    w.channels shouldBe 1
    w.bitsPerSample shouldBe 16
    w.rmsQ shouldBe math.sqrt(samples.map(s => s.toDouble * s).sum / 50) +- 1e-9
    an[IllegalArgumentException] should be thrownBy
      MediaCodec.decodeWav(bytes.dropRight(2)) // data chunk shorter than declared
    an[IllegalArgumentException] should be thrownBy
      MediaCodec.decodeWav("JUNK".getBytes("US-ASCII") ++ bytes.drop(4))
  }

  test("q152 real decode round-trips the generated corpus payloads") {
    val rows = SparkEntry.queries("q152_media_decode")(spark, sfDir).collect()
    rows.length shouldBe sources.Tables.documents(spark, sfDir).count()
    rows.foreach { r =>
      val kind = r.getAs[String]("kind")
      // every kind decodes for REAL since round 5 (GV1 closed the
      // video stub)
      r.getAs[Int]("decoded_real") shouldBe 1
      if (kind == "image") {
        r.getAs[Int]("width") should be >= 8
        r.getAs[Int]("height") should be >= 8
        r.getAs[Int]("n_frames") shouldBe 1
        // decoded dims reconcile with the payload size: header + w*h*3
        val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
        r.getAs[Int]("n_bytes") shouldBe
          9 + w.toString.length + h.toString.length + w * h * 3
      }
      if (kind == "audio") {
        r.getAs[Int]("sample_rate") % 8000 shouldBe 0
        r.getAs[Int]("n_frames") shouldBe 0
        r.getAs[Int]("n_bytes") shouldBe 44 + 2 * r.getAs[Int]("n_samples")
      }
      if (kind == "video") {
        val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
        val nf = r.getAs[Int]("n_frames")
        w should be >= 8
        h should be >= 8
        nf should (be >= 1 and be <= 5)
        // decoded dims reconcile with the payload size:
        // "GV1\n<w> <h> <nf>\n" + nf·w·h·3
        r.getAs[Int]("n_bytes") shouldBe
          7 + w.toString.length + h.toString.length + nf.toString.length +
            nf * w * h * 3
      }
    }
  }

  test("GV1 video round-trips exactly and validates malformed payloads") {
    import Multimodal.MediaCodec
    val frames = Array.tabulate(3)(f =>
      Array.tabulate(5 * 4 * 3)(i => ((i * 31 + f * 7) % 256).toByte))
    val bytes = MediaCodec.encodeVideo(5, 4, frames)
    val v = MediaCodec.decodeVideo(bytes)
    v.width shouldBe 5
    v.height shouldBe 4
    v.nFrames shouldBe 3
    // mean luminance is the exact integer sum over all frame bytes / n
    v.meanLuma shouldBe
      frames.flatten.map(b => (b & 0xff).toLong).sum.toDouble / (3 * 5 * 4 * 3)
    // corrupt magic / truncated body / frame-count mismatch must throw
    an[IllegalArgumentException] should be thrownBy
      MediaCodec.decodeVideo("XV1\n5 4 3\n".getBytes("US-ASCII") ++ frames.flatten)
    an[IllegalArgumentException] should be thrownBy
      MediaCodec.decodeVideo(bytes.dropRight(1))
    an[IllegalArgumentException] should be thrownBy
      MediaCodec.decodeVideo(MediaCodec.encodeVideo(5, 4, frames).patch(
        4, "5 4 2\n".getBytes("US-ASCII"), 6)) // header claims 2 frames
    // dimension sweep incl. 1×1×1 and digit-width changes
    for (w <- Seq(1, 9, 16); h <- Seq(1, 10); nf <- Seq(1, 5)) {
      val fs = Array.tabulate(nf)(f =>
        Array.tabulate(w * h * 3)(i => ((i + f * 13) % 256).toByte))
      val d = MediaCodec.decodeVideo(MediaCodec.encodeVideo(w, h, fs))
      (d.width, d.height, d.nFrames) shouldBe ((w, h, nf))
    }
  }


  test("MediaCodec round-trips hold across a sweep of shapes") {
    import Multimodal.MediaCodec
    // PPM: every (w, h) in a dimension sweep — including 1×1 and
    // asymmetric digit widths (9×10 exercises the header length math)
    for (w <- Seq(1, 3, 9, 24); h <- Seq(1, 7, 10, 31)) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 131 + w * 17 + h) % 256).toByte)
      val p = MediaCodec.decodePpm(MediaCodec.encodePpm(w, h, rgb))
      (p.width, p.height, p.maxVal) shouldBe ((w, h, 255))
      p.meanLuma shouldBe rgb.map(b => (b & 0xff).toLong).sum.toDouble / rgb.length
    }
    // WAV: rates and lengths including zero samples and extreme values
    for (rate <- Seq(8000, 16000, 44100); n <- Seq(0, 1, 63)) {
      val samples = Array.tabulate[Short](n)(i =>
        (if (i % 3 == 0) Short.MinValue else i * 1021).toShort)
      val wv = MediaCodec.decodeWav(MediaCodec.encodeWavPcm16(rate, samples))
      (wv.sampleRate, wv.nSamples) shouldBe ((rate, n))
      if (n == 0) wv.rmsQ shouldBe 0.0
      else wv.rmsQ shouldBe
        math.sqrt(samples.map(s => s.toDouble * s).sum / n) +- 1e-9
    }
  }

  test("q193 audio frames replay the closed-form samples; features reconcile") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q193_audio_features")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    got should not be empty
    val docs = sources.Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 1)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    var frames = 0
    for ((id, text) <- docs) {
      val tb = text.getBytes("UTF-8")
      val rate = 8000 * (1 + (id % 4).toInt)
      // independent replay straight from the generation contract —
      // NOT through the WAV codec the engine used
      val s = tb.map(b => ((b & 0xff) - 128) * 256)
      for (f <- 0 until s.length / 256) {
        frames += 1
        val fr = s.slice(f * 256, (f + 1) * 256)
        val (ss, zc, rms) = got((id, rate, f))
        ss shouldBe fr.map(x => x.toLong * x).sum
        zc shouldBe fr.sliding(2).count(p => (p(1) >= 0) != (p(0) >= 0)).toLong
        rms shouldBe math.sqrt(ss.toDouble / 256)
        // energy/ZCR sanity: silence (all-128 bytes) would be ss=0; text
        // bytes are never all 128, so every frame carries energy
        ss should be > 0L
        zc should (be >= 0L and be <= 255L)
      }
    }
    got.size shouldBe frames // no phantom frames, no dropped tails
  }

  test("q158 dHash has the perceptual-hash properties: gradient, scale invariance, locality") {
    import Multimodal.dhashOf
    def gradient(w: Int, h: Int, reverse: Boolean): Array[Byte] =
      Array.tabulate(w * h * 3) { i =>
        val x = (i / 3) % w
        val v = (x * 255 / (w - 1)).min(255)
        (if (reverse) 255 - v else v).toByte
      }
    // strictly increasing columns → every left cell darker → all bits 0
    dhashOf(9, 8, gradient(9, 8, reverse = false)) shouldBe ((0L, 0L))
    // strictly decreasing → all 64 bits set
    dhashOf(9, 8, gradient(9, 8, reverse = true)) shouldBe ((0xffffffffL, 0xffffffffL))
    // block-averaging makes the hash RESOLUTION-INVARIANT: the same
    // gradient at 4× the pixels hashes identically
    dhashOf(36, 32, gradient(36, 32, reverse = true)) shouldBe
      dhashOf(9, 8, gradient(9, 8, reverse = true))
    // locality: flipping one pixel block moves few bits (near-dup stays
    // near), while the reversed image is far away
    val base = gradient(36, 32, reverse = false)
    val dented = base.clone()
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3)
      dented((y * 36 + x) * 3 + c) = 255.toByte
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val hBase = dhashOf(36, 32, base)
    hamming(hBase, dhashOf(36, 32, dented)) should (be >= 1 and be <= 6)
    hamming(hBase, dhashOf(36, 32, gradient(36, 32, reverse = true))) shouldBe 64
    // empty-column edge (w = 8 < 9 grid columns) is well-defined
    noException should be thrownBy dhashOf(8, 8, gradient(8, 8, reverse = true))
  }

}
