package graft.multimodal

import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by partition-batched
  * typed transforms (the Scala analog of `mapInPandas` — one iterator
  * per partition, decode amortized across the batch).
  *
  * Media DECODE is REAL for all three kinds ([[MediaCodec]] — binary
  * PPM images, WAV PCM16 audio, and GV1 raw-frame video are pure byte
  * arithmetic, validated and oracle-gated via q152's encode→decode
  * round-trip). Compressed container formats would still need an
  * external demuxer; [[FakeDecoder]] keeps that deterministic stub
  * seam alive for the q36 structural-plumbing row, and a deployment
  * swaps it for ffmpeg bindings with identical signatures. Everything
  * around the codecs — the asset schema, binary encoding,
  * partition-batch shape, feature extraction, resize/frame-sample
  * operators, and the checksum path — is real Spark plumbing and is
  * oracle-/test-covered.
  *
  * Scale notes: assets are value-heavy rows; the featurize pass is
  * map-side only (no shuffle), so at 100 TB it runs at scan throughput
  * with `spark.sql.files.maxPartitionBytes` sizing the batches; the
  * binary column never participates in a shuffle key.
  */
object Multimodal {

  /** One media asset: payload + typed metadata (kind is "image"/"audio"/
    * "video"; source tracks provenance like documents.source). */
  final case class Asset(asset_id: Long, kind: String, source: String, content: Array[Byte])

  /** Extracted features; decode-derived fields come from the STUB
    * decoder and are deterministic functions of the payload. */
  final case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB — deterministic fake decode, kept ONLY as the codec seam for
    * compressed container formats a deployment would route through
    * ffmpeg bindings (q36's structural-plumbing row exercises it; the
    * real-decode path q152 uses [[MediaCodec]] for ALL kinds).
    * Signature and call sites stay identical under the swap. */
  object FakeDecoder {
    final case class Decoded(width: Int, height: Int, nFrames: Int)
    def decode(kind: String, bytes: Array[Byte]): Decoded = {
      val n = bytes.length
      Decoded(
        width = 64 + n % 512,
        height = 64 + (n / 7) % 512,
        nFrames = if (kind == "video") 1 + n % 24 else 1)
    }
    def resize(d: Decoded, w: Int, h: Int): Decoded = d.copy(width = w, height = h)
    def sampleFrames(d: Decoded, every: Int): Seq[Int] = 0 until d.nFrames by every
  }

  /** REAL encode/decode for the two container-free media formats —
    * pure byte arithmetic, zero library dependencies, so "no codecs in
    * the container" is no reason to stub them:
    *
    *  - binary PPM (P6): `P6\n<w> <h>\n255\n` + w·h RGB triplets;
    *  - WAV PCM16 mono: canonical 44-byte RIFF/fmt/data layout.
    *
    * Decoders VALIDATE (magic, bounds, chunk sizes) and throw on
    * malformed payloads — a corrupt asset must surface, not decode to
    * garbage. Derived signal features (mean luminance, RMS energy) are
    * exact integer/rational math over the samples, so they are
    * deterministic across partitionings. */
  object MediaCodec {
    final case class Ppm(width: Int, height: Int, maxVal: Int,
        meanLuma: Double)
    final case class Wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
        nSamples: Int, rmsQ: Double)

    def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && rgb.length == w * h * 3,
        s"PPM payload must be w*h*3 bytes (w=$w h=$h got ${rgb.length})")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      header ++ rgb
    }

    /** Validating P6 parse that also returns the raw RGB body — the
      * pixel-level entry point [[Multimodal.dhashOf]] consumes. */
    def decodePpmPixels(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val p = decodePpm(bytes) // full validation
      val nl3 = {
        val nl1 = bytes.indexOf('\n'.toByte)
        val nl2 = bytes.indexOf('\n'.toByte, nl1 + 1)
        bytes.indexOf('\n'.toByte, nl2 + 1)
      }
      (p.width, p.height, java.util.Arrays.copyOfRange(bytes, nl3 + 1, bytes.length))
    }

    def decodePpm(bytes: Array[Byte]): Ppm = {
      val nl1 = bytes.indexOf('\n'.toByte)
      require(nl1 == 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
      val nl2 = bytes.indexOf('\n'.toByte, nl1 + 1)
      val nl3 = bytes.indexOf('\n'.toByte, nl2 + 1)
      require(nl2 > 0 && nl3 > 0, "truncated PPM header")
      val dims = new String(bytes, nl1 + 1, nl2 - nl1 - 1, "US-ASCII").split(" ")
      require(dims.length == 2, "malformed PPM dimensions")
      val (w, h) = (dims(0).toInt, dims(1).toInt)
      val maxVal = new String(bytes, nl2 + 1, nl3 - nl2 - 1, "US-ASCII").toInt
      val body = bytes.length - (nl3 + 1)
      require(w > 0 && h > 0 && body == w * h * 3,
        s"PPM body is $body bytes, expected ${w * h * 3} (w=$w h=$h)")
      // exact integer sum over all channel bytes; ONE divide at the end
      var s = 0L
      var i = nl3 + 1
      while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
      Ppm(w, h, maxVal, s.toDouble / body)
    }

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      le16(b, o) | (le16(b, o + 2) << 16)
    private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    }
    private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
      putLe16(b, o, v & 0xffff); putLe16(b, o + 2, v >>> 16)
    }

    def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0, s"need a positive sample rate (got $sampleRate)")
      val dataLen = samples.length * 2
      val b = new Array[Byte](44 + dataLen)
      "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
      putLe32(b, 4, 36 + dataLen)
      "WAVEfmt ".getBytes("US-ASCII").copyToArray(b, 8)
      putLe32(b, 16, 16) // PCM fmt chunk size
      putLe16(b, 20, 1) // PCM
      putLe16(b, 22, 1) // mono
      putLe32(b, 24, sampleRate)
      putLe32(b, 28, sampleRate * 2) // byte rate
      putLe16(b, 32, 2) // block align
      putLe16(b, 34, 16) // bits
      "data".getBytes("US-ASCII").copyToArray(b, 36)
      putLe32(b, 40, dataLen)
      var i = 0
      while (i < samples.length) { putLe16(b, 44 + i * 2, samples(i) & 0xffff); i += 1 }
      b
    }

    def decodeWav(bytes: Array[Byte]): Wav = {
      require(bytes.length >= 44 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 8, "US-ASCII") == "WAVEfmt ", "not a PCM WAV")
      require(le16(bytes, 20) == 1, "compressed WAV needs a real codec")
      val channels = le16(bytes, 22)
      val rate = le32(bytes, 24)
      val bits = le16(bytes, 34)
      require(new String(bytes, 36, 4, "US-ASCII") == "data", "missing data chunk")
      val dataLen = le32(bytes, 40)
      require(bits == 16 && channels == 1 && dataLen == bytes.length - 44,
        s"expected mono PCM16 with exact data chunk (ch=$channels bits=$bits)")
      val n = dataLen / 2
      var s = 0.0
      var i = 0
      while (i < n) {
        val v = le16(bytes, 44 + i * 2).toShort.toDouble
        s += v * v
        i += 1
      }
      Wav(channels, rate, bits, n, if (n == 0) 0.0 else math.sqrt(s / n))
    }

    final case class Vid(width: Int, height: Int, nFrames: Int,
        meanLuma: Double)

    /** Container-free uncompressed video — "GV1": ASCII header
      * `GV1\n<w> <h> <nFrames>\n` followed by nFrames concatenated
      * w·h RGB24 frames (the P6 body discipline lifted to a frame
      * axis). A real pipeline demuxes containers to exactly this
      * raw-frame layout before feature extraction, so the format keeps
      * the decode plumbing REAL where a codec library isn't available
      * — same validate-or-throw contract as PPM/WAV. */
    def encodeVideo(w: Int, h: Int, frames: Array[Array[Byte]]): Array[Byte] = {
      require(w > 0 && h > 0 && frames.nonEmpty,
        s"GV1 needs positive dims and >=1 frame (w=$w h=$h nf=${frames.length})")
      require(frames.forall(_.length == w * h * 3),
        s"every GV1 frame must be w*h*3 bytes (w=$w h=$h)")
      val header = s"GV1\n$w $h ${frames.length}\n".getBytes("US-ASCII")
      header ++ frames.flatten
    }

    def decodeVideo(bytes: Array[Byte]): Vid = {
      val nl1 = bytes.indexOf('\n'.toByte)
      require(nl1 == 3 && bytes(0) == 'G' && bytes(1) == 'V' && bytes(2) == '1',
        "not a GV1 video")
      val nl2 = bytes.indexOf('\n'.toByte, nl1 + 1)
      require(nl2 > 0, "truncated GV1 header")
      val dims = new String(bytes, nl1 + 1, nl2 - nl1 - 1, "US-ASCII").split(" ")
      require(dims.length == 3, "malformed GV1 dimensions")
      val (w, h, nf) = (dims(0).toInt, dims(1).toInt, dims(2).toInt)
      val body = bytes.length - (nl2 + 1)
      require(w > 0 && h > 0 && nf > 0 && body.toLong == nf.toLong * w * h * 3,
        s"GV1 body is $body bytes, expected ${nf.toLong * w * h * 3} (w=$w h=$h nf=$nf)")
      // exact integer sum over all channel bytes; ONE divide at the end
      var s = 0L
      var i = nl2 + 1
      while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
      Vid(w, h, nf, s.toDouble / body)
    }

    /** The raw PCM16 sample vector of a validated mono WAV — the
      * decode surface q193's frame-level features consume (decodeWav
      * summarizes; DSP needs the samples). Same validation contract:
      * corrupt payloads throw. */
    def decodeWavSamples(bytes: Array[Byte]): Array[Short] = {
      require(bytes.length >= 44 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 8, "US-ASCII") == "WAVEfmt ", "not a PCM WAV")
      require(le16(bytes, 20) == 1, "compressed WAV needs a real codec")
      require(le16(bytes, 34) == 16 && le16(bytes, 22) == 1 &&
        new String(bytes, 36, 4, "US-ASCII") == "data" &&
        le32(bytes, 40) == bytes.length - 44,
        "expected mono PCM16 with exact data chunk")
      Array.tabulate[Short](le32(bytes, 40) / 2)(i => le16(bytes, 44 + i * 2).toShort)
    }
  }

  /** Synthesize an asset table from `documents` (text → UTF-8 payload):
    * the ingest-side plumbing a real pipeline would do from object
    * storage. Kind cycles deterministically by doc_id. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id".as("asset_id"),
        element_at(typedlit(Seq("image", "audio", "video")), ($"doc_id" % 3 + 1).cast("int")).as("kind"),
        $"source",
        encode($"text", "UTF-8").as("content"))
      .as[Asset]
  }

  /** Partition-batched featurize: decode stub + checksum per asset, one
    * iterator per partition (the mapInPandas batch shape). */
  def featurize(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val crc = new CRC32()
        crc.update(a.content)
        val d = FakeDecoder.decode(a.kind, a.content)
        AssetFeatures(a.asset_id, a.kind, a.content.length, crc.getValue, d.width, d.height, d.nFrames)
      }
    }
  }

  /** Decoded structural metadata, long-form across kinds (0 where a
    * field doesn't apply; `decoded_real` = 1 when a REAL decoder
    * produced the row — since round 5 all three kinds decode real, the
    * column stays as the honesty contract for any future codec-bound
    * format). */
  final case class MediaInfo(
      asset_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      sample_rate: Int,
      n_samples: Int,
      n_frames: Int,
      decoded_real: Int)

  /** Synthesize assets with VALID media payloads: images are binary
    * PPM, audio is WAV PCM16 — real bytes a stock `ppmtojpeg`/`aplay`
    * would accept — and video is GV1 raw-frame concatenation, all with
    * pixel/sample data derived from the document text. The
    * derivations are closed-form in (doc_id, text length) so the
    * DuckDB oracle can predict every structural field WITHOUT a
    * decoder — which is exactly what makes q152 prove the Spark side's
    * encode→bytes→decode round-trip. */
  def realAssets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)]
      .map { case (id, source, text) =>
        val tb = text.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val content = kind match {
          case "image" =>
            val w = 8 + (id % 24).toInt
            val h = 8 + tb.length % 24
            MediaCodec.encodePpm(w, h,
              Array.tabulate(w * h * 3)(i => tb(i % tb.length)))
          case "audio" =>
            val rate = 8000 * (1 + (id % 4).toInt)
            MediaCodec.encodeWavPcm16(rate,
              Array.tabulate[Short](tb.length)(i => (((tb(i) & 0xff) - 128) * 256).toShort))
          case _ =>
            val w = 8 + (id % 16).toInt
            val h = 8 + tb.length % 16
            val nf = 1 + (id % 5).toInt
            MediaCodec.encodeVideo(w, h, Array.tabulate(nf)(f =>
              Array.tabulate(w * h * 3)(i => tb((f * w * h * 3 + i) % tb.length))))
        }
        Asset(id, kind, source, content)
      }
  }

  /** Partition-batched REAL featurize: PPM/WAV/GV1 parse + validate
    * per asset (throwing on corrupt payloads — garbage must surface,
    * not flow). All three kinds decode for real since round 5. */
  def featurizeMedia(assets: Dataset[Asset]): Dataset[MediaInfo] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        a.kind match {
          case "image" =>
            val p = MediaCodec.decodePpm(a.content)
            MediaInfo(a.asset_id, a.kind, a.content.length,
              p.width, p.height, 0, 0, 1, 1)
          case "audio" =>
            val wv = MediaCodec.decodeWav(a.content)
            MediaInfo(a.asset_id, a.kind, a.content.length,
              0, 0, wv.sampleRate, wv.nSamples, 0, 1)
          case _ =>
            val v = MediaCodec.decodeVideo(a.content)
            MediaInfo(a.asset_id, a.kind, a.content.length,
              v.width, v.height, 0, 0, v.nFrames, 1)
        }
      }
    }
  }

  // -------------------------------------------------------------- q152
  /** Real media decode, oracle-gated: the Spark side ENCODES valid
    * PPM/WAV/GV1 payloads from the corpus, ships them as binary
    * columns, and DECODES them back with [[MediaCodec]]'s validating
    * parsers; the oracle predicts every structural field from the
    * generation's closed form — a header mis-parse, off-by-one chunk
    * length, or byte-order slip breaks the hash. Since round 5 video
    * decodes for REAL too (GV1 raw-frame concatenation — the layout a
    * demuxer produces), closing the last `decoded_real = 0` stub.
    * Map-side only, like q36 — the binary column never shuffles. */
  private def q152(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    featurizeMedia(realAssets(spark, dir)).toDF().orderBy($"asset_id")
  }

  private val q152Sql =
    """WITH a AS (
      |  SELECT doc_id AS asset_id,
      |         ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS tlen,
      |         doc_id
      |  FROM documents
      |)
      |SELECT asset_id, kind,
      |       CAST(CASE kind
      |            WHEN 'image' THEN 9 + length(CAST(8 + doc_id % 24 AS VARCHAR))
      |                              + length(CAST(8 + tlen % 24 AS VARCHAR))
      |                              + (8 + doc_id % 24) * (8 + tlen % 24) * 3
      |            WHEN 'audio' THEN 44 + 2 * tlen
      |            ELSE 7 + length(CAST(8 + doc_id % 16 AS VARCHAR))
      |                   + length(CAST(8 + tlen % 16 AS VARCHAR))
      |                   + length(CAST(1 + doc_id % 5 AS VARCHAR))
      |                   + (1 + doc_id % 5) * (8 + doc_id % 16) * (8 + tlen % 16) * 3
      |            END AS INTEGER) AS n_bytes,
      |       CAST(CASE kind
      |            WHEN 'image' THEN 8 + doc_id % 24
      |            WHEN 'audio' THEN 0
      |            ELSE 8 + doc_id % 16 END AS INTEGER) AS width,
      |       CAST(CASE kind
      |            WHEN 'image' THEN 8 + tlen % 24
      |            WHEN 'audio' THEN 0
      |            ELSE 8 + tlen % 16 END AS INTEGER) AS height,
      |       CAST(CASE kind WHEN 'audio' THEN 8000 * (1 + doc_id % 4)
      |            ELSE 0 END AS INTEGER) AS sample_rate,
      |       CAST(CASE kind WHEN 'audio' THEN tlen ELSE 0 END AS INTEGER) AS n_samples,
      |       CAST(CASE kind WHEN 'image' THEN 1 WHEN 'audio' THEN 0
      |            ELSE 1 + doc_id % 5 END AS INTEGER) AS n_frames,
      |       CAST(1 AS INTEGER) AS decoded_real
      |FROM a
      |ORDER BY asset_id""".stripMargin

  // --------------------------------------------------------------- q36
  /** Oracle-checked multimodal features: the real plumbing (binary
    * encode → partition-batched decode-stub featurize) must reproduce
    * the closed-form arithmetic the oracle computes from octet_length —
    * plus an md5 content digest. CRC is not portable to DuckDB, so the
    * digest column is md5 and the CRC stays test-covered. */
  private def q36(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = featurize(assetsFromDocuments(spark, dir))
      .select($"asset_id", $"kind", $"n_bytes", $"width", $"height", $"n_frames")
    val digests = Tables.documents(spark, dir)
      .select($"doc_id".as("asset_id"), md5(encode($"text", "UTF-8")).as("content_md5"))
    feats.join(digests, "asset_id").orderBy($"asset_id")
  }

  private val q36Sql =
    """WITH a AS (
      |  SELECT doc_id AS asset_id,
      |         ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
      |         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |         md5(text) AS content_md5
      |  FROM documents
      |)
      |SELECT asset_id, kind, n_bytes,
      |       CAST(64 + n_bytes % 512 AS INTEGER) AS width,
      |       CAST(64 + (n_bytes // 7) % 512 AS INTEGER) AS height,
      |       CAST(CASE WHEN kind = 'video' THEN 1 + n_bytes % 24 ELSE 1 END AS INTEGER) AS n_frames,
      |       content_md5
      |FROM a
      |ORDER BY asset_id""".stripMargin

  // -------------------------------------------------------------- q158
  /** Difference-hash (dHash) of a decoded RGB image: block-average the
    * pixels onto a 9-wide × 8-tall grid and set bit (y, x) when cell
    * (y, x) is brighter than its right neighbor — the standard 64-bit
    * perceptual fingerprint for image near-dup detection (robust to
    * re-encoding and resizing, unlike a byte checksum).
    *
    * Every comparison is EXACT INTEGER algebra: a cell carries
    * (Σ(r+g+b), pixel count) and "brighter" is the cross-multiplied
    * mean comparison `sL·nR > sR·nL` — no float division anywhere, so
    * the hash is bit-identical across engines and partitionings. A
    * source column that maps to an empty grid cell (w = 8 < 9 target
    * columns) contributes count 0, and 0 > 0 is false on both sides.
    * The two 32-bit halves ship as BIGINTs (one 64-bit word would
    * overflow the sign bit at bit 63). */
  private[graft] def dhashOf(w: Int, h: Int, rgb: Array[Byte]): (Long, Long) = {
    val s = Array.ofDim[Long](8, 9)
    val n = Array.ofDim[Long](8, 9)
    var p = 0
    val np = w * h
    while (p < np) {
      val px = p % w
      val py = p / w
      val cx = px * 9 / w
      val cy = py * 8 / h
      val base = p * 3
      val g3 = (rgb(base) & 0xff) + (rgb(base + 1) & 0xff) + (rgb(base + 2) & 0xff)
      s(cy)(cx) += g3
      n(cy)(cx) += 1
      p += 1
    }
    var hi = 0L
    var lo = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val bit = if (s(cy)(cx) * n(cy)(cx + 1) > s(cy)(cx + 1) * n(cy)(cx)) 1L else 0L
        val b = cy * 8 + cx
        if (b >= 32) hi |= bit << (b - 32) else lo |= bit << b
        cx += 1
      }
      cy += 1
    }
    (hi, lo)
  }

  /** Per-image perceptual-hash row. */
  final case class ImageHash(
      asset_id: Long, width: Int, height: Int, dhash_hi: Long, dhash_lo: Long)

  /** q158: REAL pixel path end to end — the PPM assets are decoded with
    * the validating parser and dHashed; the oracle recomputes the same
    * 64 bits from the generation's closed form (text bytes tiled over
    * w·h·3 channels, extracted byte-by-byte from the hex encoding) —
    * any slip in the parse, the tiling, the grid mapping, or the bit
    * packing breaks the hash. Map-side only: decode + hash never
    * shuffle; downstream near-dup banding joins on 16-bit hash bands
    * (q60's simhash discipline), never on pixels. */
  private def q158(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    realAssets(spark, dir)
      .filter(_.kind == "image")
      .mapPartitions { batch =>
        batch.map { a =>
          val (w, h, rgb) = MediaCodec.decodePpmPixels(a.content)
          val (hi, lo) = dhashOf(w, h, rgb)
          ImageHash(a.asset_id, w, h, hi, lo)
        }
      }
      .toDF()
      .orderBy($"asset_id")
  }

  private val q158Sql =
    """WITH imgs AS (
      |  SELECT doc_id AS asset_id,
      |         CAST(8 + doc_id % 24 AS INTEGER) AS w,
      |         CAST(8 + octet_length(encode(text)) % 24 AS INTEGER) AS h,
      |         CAST(octet_length(encode(text)) AS INTEGER) AS tlen,
      |         hex(encode(text)) AS hx
      |  FROM documents WHERE doc_id % 3 = 0
      |), px AS (
      |  SELECT asset_id,
      |         (u.p % w) * 9 // w AS cx, (u.p // w) * 8 // h AS cy,
      |         CAST(concat('0x', substr(hx, ((u.p*3 + 0) % tlen)*2 + 1, 2)) AS INTEGER)
      |       + CAST(concat('0x', substr(hx, ((u.p*3 + 1) % tlen)*2 + 1, 2)) AS INTEGER)
      |       + CAST(concat('0x', substr(hx, ((u.p*3 + 2) % tlen)*2 + 1, 2)) AS INTEGER) AS g3
      |  FROM imgs, unnest(generate_series(0, w*h - 1)) AS u(p)
      |), cells AS (
      |  SELECT asset_id, cy, cx,
      |         CAST(sum(g3) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      |  FROM px GROUP BY 1, 2, 3
      |), bits AS (
      |  SELECT l.asset_id, l.cy, l.cx,
      |         CAST(CASE WHEN l.s * r.n > r.s * l.n THEN 1 ELSE 0 END AS BIGINT) AS bit
      |  FROM cells l
      |  JOIN cells r ON r.asset_id = l.asset_id AND r.cy = l.cy AND r.cx = l.cx + 1
      |  WHERE l.cx <= 7
      |)
      |SELECT i.asset_id, i.w AS width, i.h AS height,
      |       CAST(COALESCE(sum(CASE WHEN b.cy*8 + b.cx >= 32
      |                               THEN b.bit << (b.cy*8 + b.cx - 32)
      |                               ELSE 0 END), 0) AS BIGINT) AS dhash_hi,
      |       CAST(COALESCE(sum(CASE WHEN b.cy*8 + b.cx < 32
      |                               THEN b.bit << (b.cy*8 + b.cx)
      |                               ELSE 0 END), 0) AS BIGINT) AS dhash_lo
      |FROM imgs i LEFT JOIN bits b USING (asset_id)
      |GROUP BY 1, 2, 3
      |ORDER BY asset_id""".stripMargin

  // -------------------------------------------------------------- q193
  /** Frame-level audio features over the REAL-decoded WAV payloads —
    * the DSP step after q152's structural decode: per 256-sample frame,
    * energy (Σs² exact BIGINT + RMS) and zero-crossing rate (the
    * classic voiced/unvoiced + silence-trim features an audio curation
    * pipeline gates on before transcription). The Spark side decodes
    * the actual RIFF bytes back to PCM16 ([[MediaCodec
    * .decodeWavSamples]] — validating parser, corrupt payloads throw);
    * the ORACLE never parses a WAV: it predicts every sample from the
    * generation's closed form ((byte−128)·256 per UTF-8 text byte, the
    * q152 contract) via the q158 hex-substr byte extraction — so a
    * sample-order slip, sign-extension bug, or off-by-one in the frame
    * walk breaks the hash.
    *
    * Determinism: sum_sq and zcr are exact integers (samples ≤ 2¹⁵,
    * 256-frames → Σs² < 2³⁸); rms = sqrt(sum_sq/256) is one exact
    * halving-family division + correctly-rounded sqrt — bit-identical,
    * zero rounding. Scale shape: decode + framing is mapPartitions
    * (the documented codec seam — a byte parser is per-row imperative
    * work, the one place the brief licenses it); output volume is
    * n_samples/256 rows per asset; the binary column never shuffles
    * (frames emit narrow numeric rows). */
  private[graft] def audioFrames(spark: SparkSession, dir: String,
      frame: Int = 256): DataFrame = {
    require(frame > 0, s"need frame > 0 (got $frame)")
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 1)
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val tb = text.getBytes("UTF-8")
          val rate = 8000 * (1 + (id % 4).toInt)
          val bytes = MediaCodec.encodeWavPcm16(rate,
            Array.tabulate[Short](tb.length)(i => (((tb(i) & 0xff) - 128) * 256).toShort))
          val s = MediaCodec.decodeWavSamples(bytes)
          val nf = s.length / frame
          (0 until nf).iterator.map { f =>
            var ss = 0L; var zc = 0L
            var i = f * frame
            while (i < (f + 1) * frame) {
              ss += s(i).toLong * s(i)
              if (i > f * frame && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
              i += 1
            }
            (id, rate, f, ss, zc, math.sqrt(ss.toDouble / frame))
          }
        }
      }
      .toDF("asset_id", "sample_rate", "frame", "sum_sq", "zcr", "rms")
      .orderBy($"asset_id", $"frame")
  }

  private def q193(spark: SparkSession, dir: String): DataFrame =
    audioFrames(spark, dir)

  private val q193Sql =
    """WITH au AS (
      |  SELECT doc_id AS asset_id,
      |         CAST(8000 * (1 + doc_id % 4) AS INTEGER) AS sample_rate,
      |         hex(encode(text)) AS h,
      |         octet_length(encode(text)) AS n
      |  FROM documents WHERE doc_id % 3 = 1
      |), samp AS (
      |  SELECT asset_id, sample_rate,
      |         [(CAST(concat('0x', substr(h, i*2+1, 2)) AS INTEGER) - 128) * 256
      |          for i in generate_series(0, n-1)] AS s,
      |         n // 256 AS nf
      |  FROM au
      |), fr AS (
      |  SELECT asset_id, sample_rate, s,
      |         unnest(generate_series(0, nf-1)) AS frame
      |  FROM samp WHERE nf >= 1
      |), agg AS (
      |  SELECT asset_id, sample_rate, CAST(frame AS INTEGER) AS frame,
      |         CAST(list_sum([CAST(s[frame*256+i] AS BIGINT) * s[frame*256+i]
      |                        for i in generate_series(1, 256)]) AS BIGINT) AS sum_sq,
      |         CAST(list_sum([CASE WHEN (s[frame*256+i+1] >= 0) <> (s[frame*256+i] >= 0)
      |                             THEN 1 ELSE 0 END
      |                        for i in generate_series(1, 255)]) AS BIGINT) AS zcr
      |  FROM fr
      |)
      |SELECT asset_id, sample_rate, frame, sum_sq, zcr,
      |       sqrt(CAST(sum_sq AS DOUBLE) / 256.0) AS rms
      |FROM agg
      |ORDER BY asset_id, frame""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q36_multimodal_features", q36, Some(q36Sql)),
    Q("q152_media_decode", q152, Some(q152Sql)),
    Q("q158_image_dhash", q158, Some(q158Sql)),
    Q("q193_audio_features", q193, Some(q193Sql)),
  )
}
