package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSON Lines source/sink — the de-facto interchange format for LLM
  * training corpora (one document object per line). Completes the
  * format triangle next to parquet ([[Tables]]) and ORC ([[Orc]]),
  * with the same contract: the reader takes a DECLARED schema, never
  * inference — schema inference over 100 TB of jsonl is a full extra
  * scan, and a single malformed line would silently widen a column to
  * string.
  *
  * Malformed lines are QUARANTINED, never silently null-filled: the
  * conversion entry points read with `_corrupt_record` attached, so a
  * truncated line keeps its raw text and is either split to a rejects
  * file (batch) or carried flagged in the output (stream) — a corpus
  * feed must account for every dropped line (jsonl is row-oriented —
  * convert to parquet/ORC at the pipeline edge, which is exactly what
  * these are for). */
object Json {

  /** The documents-corpus schema, as declared as the reference's CQL
    * DDL (lambda-sample `cassandra/schema.sql`) — TESTDATA.md shape. */
  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** [[documents]] plus the PERMISSIVE-mode quarantine column. */
  val documentsWithCorrupt: StructType =
    documents.add("_corrupt_record", StringType)

  /** Write any frame as JSON Lines under `outDir`. */
  def write(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").json(outDir)

  /** Read a jsonl root with an explicit schema (never inferred). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(dir)

  /** Ingest a jsonl documents drop into columnar form: clean rows to
    * `parquetDir`, malformed lines (raw text) to `parquetDir.rejects`
    * — the edge conversion every corpus pipeline runs, with nothing
    * silently dropped. The cache is the documented workaround for
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN on raw-file reads. */
  def fromJsonl(spark: SparkSession, jsonlDir: String, parquetDir: String): Unit = {
    val raw = read(spark, jsonlDir, documentsWithCorrupt).cache()
    try {
      raw.filter(col("_corrupt_record").isNull)
        .select(documents.fieldNames.map(col).toSeq: _*)
        .write.mode("overwrite").parquet(parquetDir)
      raw.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record"))
        .write.mode("overwrite").text(s"$parquetDir.rejects")
    } finally { raw.unpersist(); () }
  }

  /** CONTINUOUS form of [[fromJsonl]]: a Structured Streaming file
    * source over the drop directory, converted by the engine itself —
    * each newly landed jsonl file is picked up once (file-source
    * tracking in the checkpoint) and appended via the EXACTLY-ONCE
    * parquet file sink. Malformed lines ride along flagged in
    * `_corrupt_record` (all-null doc fields + raw line) rather than
    * through a second sink: one file sink keeps the exactly-once
    * guarantee a foreachBatch split would forfeit on retry; consumers
    * filter `_corrupt_record IS NULL` (and audit the rest).
    * `maxFileAge` is pinned far out so a backfilled drop with an old
    * mtime (rsync -a) is never silently age-skipped — the trade is
    * seen-map growth, bounded operationally by `cleanSource` archiving
    * on the drop directory. Runs until `AvailableNow` drains; rerun on
    * the same checkpoint to pick up later drops. */
  def streamFromJsonl(spark: SparkSession, jsonlDir: String,
      parquetDir: String, checkpointDir: String): StreamingQuery =
    spark.readStream.schema(documentsWithCorrupt)
      .option("maxFileAge", "35000d")
      .json(jsonlDir)
      .writeStream
      .format("parquet")
      .option("path", parquetDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
