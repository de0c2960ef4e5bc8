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
  * The actual media DECODE is stubbed (`FakeDecoder`): this container
  * has no image/audio codecs, so the decoder derives deterministic fake
  * dimensions/frames from the byte stream. Everything around it — the
  * asset schema, binary encoding, partition-batch shape, feature
  * extraction, resize/frame-sample operators, and the checksum path —
  * is real Spark plumbing and is oracle-/test-covered.
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

  /** STUB — deterministic fake decode. A real deployment swaps this for
    * an actual codec (e.g. javax.imageio / ffmpeg bindings); signature
    * and call sites stay identical. */
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

  val all: Seq[Q] = Seq(
    Q("q36_multimodal_features", q36, Some(q36Sql)),
  )
}
