package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSON Lines source/sink — the de-facto interchange format for LLM
  * training corpora (one document object per line). Completes the
  * format triangle next to parquet ([[Tables]]) and ORC ([[Orc]]),
  * with the same contract: the reader takes a DECLARED schema, never
  * inference — schema inference over 100 TB of jsonl is a full extra
  * scan, and a single malformed line would silently widen a column to
  * string. Malformed lines surface in the `_corrupt_record` column of
  * PERMISSIVE mode rather than killing the job; OrcSpec-style pruning
  * does not apply (jsonl is row-oriented — convert to parquet/ORC at
  * the pipeline edge, which is exactly what `fromJsonl` is for). */
object Json {

  /** The documents-corpus schema, as declared as the reference's CQL
    * DDL (lambda-sample `cassandra/schema.sql`) — TESTDATA.md shape. */
  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** Write any frame as JSON Lines under `outDir`. */
  def write(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").json(outDir)

  /** Read a jsonl root with an explicit schema (never inferred). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(dir)

  /** Ingest a jsonl documents drop into columnar form: read with the
    * declared schema, write parquet — the edge conversion every
    * corpus pipeline runs before analytical scans. */
  def fromJsonl(spark: SparkSession, jsonlDir: String, parquetDir: String): Unit =
    read(spark, jsonlDir, documents).write.mode("overwrite").parquet(parquetDir)

  /** CONTINUOUS form of [[fromJsonl]]: a Structured Streaming file
    * source over the drop directory — each newly landed jsonl file is
    * picked up exactly once (file-source tracking in the checkpoint)
    * and appended in columnar form. This is how a daily/hourly corpus
    * feed runs: producers drop jsonl, the engine owns the conversion,
    * and the dedup/curation chain (q57's incremental path) consumes
    * the parquet side. Caller starts/stops the returned stream. */
  def streamFromJsonl(spark: SparkSession, jsonlDir: String): DataFrame =
    spark.readStream.schema(documents).json(jsonlDir)
}
