package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Portable
import graft.sources.Tables

/** Training-batch assembly operators: GPT-style sequence packing (q63)
  * and deterministic corpus shuffling (q64) — the last mile between a
  * curated corpus and the tokenizer/dataloader.
  *
  * Both are expressed as per-shard window functions over a portable-hash
  * shard key, which is the scale story: the only shuffle is one hash
  * partition by shard (purely map-side key derivation), and each shard's
  * window is an independent linear pass. At 100 TB you raise the shard
  * count so a shard's documents fit one task (shards are independent —
  * 1 shard per ~1 GB of tokens keeps tasks uniform); no global sort, no
  * driver-side state, and the assignment is a pure function of doc_id —
  * re-running on a backfilled corpus moves only the shards whose inputs
  * changed, and two engines (or two cluster sizes) produce bit-identical
  * layouts.
  */
object Packing {

  /** Tokens per packed training sequence. Small so the sf0.01 corpus
    * (~54 tokens/doc) produces multi-doc packs with boundary spans —
    * the production value (2k-8k) only changes this constant. */
  private val SeqLen = 256L

  /** Shards for packing/shuffling. A pure function of doc_id (NOT of
    * arrival order), like q51's split bucket — deterministic under
    * re-runs and engine changes. */
  private val Shards = 8L

  private def shardOf(doc: Column, salt: String): Column =
    Portable.hash32(concat(doc.cast("string"), lit(salt))) % Shards

  private def shardOfSql(keyExpr: String, salt: String): String =
    s"${Portable.hash32Sql(s"CAST($keyExpr AS VARCHAR) || '$salt'")} % $Shards"

  // --------------------------------------------------------------- q63
  /** Sequence packing, concat-and-chunk form: documents are laid out
    * back-to-back within their shard (ordered by doc_id) and cut into
    * fixed [[SeqLen]]-token training sequences. Emits each document's
    * placement: shard, running token offset, pack index within the
    * shard, position within the pack, and whether the document straddles
    * a pack boundary (where a dataloader resets the attention mask or
    * splits the document).
    *
    * This is the packing used by GPT-style pretraining pipelines:
    * deterministic, zero padding waste, O(1) state per row via a
    * running-sum window. The alternative (first-fit bin packing, no
    * document splits) is inherently sequential per bin; the windowed
    * form is the one that scales, and the `spans_boundary` flag carries
    * exactly the information a loader needs to handle the splits. */
  private def q63(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"pack_shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        shardOf($"doc_id", "#graft-pack").as("pack_shard"),
        size(Portable.tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("tok_offset", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .select(
        $"doc_id", $"pack_shard", $"n_tokens", $"tok_offset",
        expr(s"tok_offset DIV $SeqLen").as("pack_seq"),
        ($"tok_offset" % SeqLen).as("pos_in_pack"),
        (expr(s"(tok_offset + n_tokens - 1) DIV $SeqLen") > expr(s"tok_offset DIV $SeqLen"))
          .cast("int").as("spans_boundary"))
      .orderBy($"doc_id")
  }

  private val q63Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         ${shardOfSql("doc_id", "#graft-pack")} AS pack_shard,
       |         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), o AS (
       |  SELECT doc_id, pack_shard, n_tokens,
       |         CAST(COALESCE(SUM(n_tokens) OVER (
       |           PARTITION BY pack_shard ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
       |  FROM t
       |)
       |SELECT doc_id, pack_shard, n_tokens, tok_offset,
       |       tok_offset // $SeqLen AS pack_seq,
       |       tok_offset % $SeqLen AS pos_in_pack,
       |       CAST((tok_offset + n_tokens - 1) // $SeqLen > tok_offset // $SeqLen AS INTEGER) AS spans_boundary
       |FROM o
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q64
  /** Deterministic corpus shuffle: global training order as a pure
    * function of (doc_id, epoch seed) — order by a salted portable hash,
    * emitted as (shuffle_shard, pos_in_shard). A dataloader reads shards
    * in index order and rows within a shard in pos order; changing the
    * salt re-shuffles the whole corpus without touching the data.
    *
    * `rand()`-based shuffling is not reproducible across retries or
    * engines and cannot be re-derived for a given epoch; the salted-hash
    * form is both, and needs no global sort — rank-within-shard is a
    * per-shard window, and the shard key itself is uniform by
    * construction so the layout is skew-free regardless of data skew. */
  private def q64(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val key = Portable.hash32(concat($"doc_id".cast("string"), lit("#graft-epoch0")))
    val w = Window.partitionBy($"shuffle_shard").orderBy($"sort_key", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", key.as("sort_key"))
      .withColumn("shuffle_shard", $"sort_key" % Shards)
      .withColumn("pos_in_shard", row_number().over(w).cast("long") - 1L)
      .select($"doc_id", $"shuffle_shard", $"sort_key", $"pos_in_shard")
      .orderBy($"doc_id")
  }

  private val q64Sql: String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |         ${Portable.hash32Sql("CAST(doc_id AS VARCHAR) || '#graft-epoch0'")} AS sort_key
       |  FROM documents
       |)
       |SELECT doc_id,
       |       sort_key % $Shards AS shuffle_shard,
       |       sort_key,
       |       CAST(ROW_NUMBER() OVER (
       |         PARTITION BY sort_key % $Shards ORDER BY sort_key, doc_id) AS BIGINT) - 1 AS pos_in_shard
       |FROM k
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q71
  /** Tokens per chunk / stride between chunk starts (overlap =
    * ChunkLen − ChunkStride). Sized so the sf corpus (~54 tokens/doc)
    * exercises both single- and multi-chunk docs; production swaps the
    * constants (512/384 is a common embedding-index calibration). */
  private val ChunkLen = 48L
  private val ChunkStride = 32L

  /** Overlapping token-window chunking — the RAG / embedding-index
    * preprocessing step: each document becomes ⌈max(n−C,0)/S⌉+1 chunks
    * of ≤C tokens starting every S tokens, the last chunk being the
    * smallest window that reaches the document's end (no redundant
    * tail-only chunks). Emits per chunk: index, token offset, length,
    * the chunk text itself, and the doc's chunk count — everything an
    * embedding pipeline needs to re-assemble provenance.
    *
    * Scale shape: a pure per-row flatMap (tokenize → arithmetic →
    * explode of the start sequence → slice); no join, no aggregate, no
    * shuffle besides the presentation sort. Fan-out is bounded by
    * n_tokens/S per doc, so tasks stay uniform under any corpus skew —
    * at 100 TB this runs at scan speed and is PlanSpec-locked to stay
    * Generate-over-Scan. */
  private def q71(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", Portable.tokens($"text").as("toks"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("max_start",
        expr(s"((CASE WHEN n_tokens > $ChunkLen THEN n_tokens - $ChunkLen ELSE 0 END" +
          s" + $ChunkStride - 1) DIV $ChunkStride) * $ChunkStride"))
      .withColumn("tok_start", explode(sequence(lit(0L), $"max_start", lit(ChunkStride))))
      .select(
        $"doc_id",
        expr(s"tok_start DIV $ChunkStride").as("chunk_idx"),
        $"tok_start",
        least(lit(ChunkLen), $"n_tokens" - $"tok_start").as("chunk_tokens"),
        (expr(s"max_start DIV $ChunkStride") + 1L).as("n_chunks"),
        concat_ws(" ",
          slice($"toks", ($"tok_start" + 1L).cast("int"), lit(ChunkLen.toInt))).as("chunk_text"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  private val q71Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
       |), n AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
       |         ((CASE WHEN len(toks) > $ChunkLen THEN len(toks) - $ChunkLen ELSE 0 END
       |           + $ChunkStride - 1) // $ChunkStride) * $ChunkStride AS max_start
       |  FROM t
       |), c AS (
       |  SELECT doc_id, toks, n_tokens, max_start,
       |         unnest(generate_series(0, max_start, $ChunkStride)) AS tok_start
       |  FROM n
       |)
       |SELECT doc_id,
       |       CAST(tok_start // $ChunkStride AS BIGINT) AS chunk_idx,
       |       CAST(tok_start AS BIGINT) AS tok_start,
       |       CAST(least($ChunkLen, n_tokens - tok_start) AS BIGINT) AS chunk_tokens,
       |       CAST(max_start // $ChunkStride + 1 AS BIGINT) AS n_chunks,
       |       array_to_string(list_slice(toks, tok_start + 1, tok_start + $ChunkLen), ' ') AS chunk_text
       |FROM c
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // --------------------------------------------------------------- q70
  /** Proportional source interleaving (stride scheduling): the global
    * training order that realizes per-source target weights in EVERY
    * prefix, not just in expectation — item i of source s is scheduled
    * at key (i + ½) / share_s, and reading in key order yields each
    * source at its target rate with per-prefix deviation < 1 item (the
    * classical stride-scheduling bound). This is the deterministic form
    * of the weighted-sampling interleave T5/PaLM-style pipelines use to
    * mix sources at fixed ratios without rand().
    *
    * Weights ARE q67's — the shared [[Curation.sourceWeight]] expression,
    * so the interleave rates and the rebalance targets cannot drift
    * apart. Within a source, order is
    * the q64-style salted shuffle, so the interleave composes shuffle +
    * mix in one pass.
    *
    * Scale shape: pos_in_source is a per-source window (parallel across
    * sources); the 1-row weight total broadcasts; the final key order is
    * a range-partitioned sort — a dataloader reads key ranges in
    * parallel and never needs a global row index materialized. */
  private def q70(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source")
      .withColumn("w_raw", Curation.sourceWeight($"source"))
      .withColumn("shuffle_key",
        Portable.hash32(concat($"doc_id".cast("string"), lit("#graft-interleave"))))
    val weights = docs.select($"source", $"w_raw").distinct()
      .agg(sum($"w_raw").as("w_total"))
    val wPos = Window.partitionBy($"source").orderBy($"shuffle_key", $"doc_id")
    docs
      .withColumn("pos_in_source", row_number().over(wPos).cast("long") - 1L)
      .crossJoin(broadcast(weights))
      .withColumn("interleave_key",
        ($"pos_in_source".cast("double") + 0.5) / ($"w_raw".cast("double") / $"w_total"))
      .select($"doc_id", $"source", $"pos_in_source", $"interleave_key")
      .orderBy($"interleave_key", $"source", $"doc_id")
  }

  private val q70Sql: String = {
    val shuffleHash = Portable.hash32Sql("CAST(doc_id AS VARCHAR) || '#graft-interleave'")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         ${Curation.sourceWeightSql("source")} AS w_raw,
       |         $shuffleHash AS shuffle_key
       |  FROM documents
       |), wt AS (
       |  SELECT SUM(w_raw) AS w_total FROM (SELECT DISTINCT source, w_raw FROM d)
       |), p AS (
       |  SELECT doc_id, source, w_raw,
       |         CAST(row_number() OVER (PARTITION BY source ORDER BY shuffle_key, doc_id) AS BIGINT) - 1 AS pos_in_source
       |  FROM d
       |)
       |SELECT doc_id, source, pos_in_source,
       |       (CAST(pos_in_source AS DOUBLE) + 0.5) / (CAST(w_raw AS DOUBLE) / w_total) AS interleave_key
       |FROM p, wt
       |ORDER BY interleave_key, source, doc_id""".stripMargin
  }

  // -------------------------------------------------------------- q215
  /** Span-corruption masking plan (the T5/UL2 denoising objective,
    * Raffel et al. JMLR'20 §3.1.4): select ~15% of each document's
    * tokens as short spans to mask, emitting one (doc_id, block,
    * span_start, span_len) row per span — the PLAN a denoising-data
    * builder materializes next to q63's packed sequences. Selection is
    * BLOCK-STRIDED: tokens partition into 20-token blocks and each
    * block contributes exactly one 3-token span at a hash-chosen
    * offset — corruption rate locked at 3/20 = 15%, spans
    * NON-OVERLAPPING BY CONSTRUCTION (the sequential no-overlap scan
    * every naive i.i.d. sampler needs is engineered away), and the
    * whole plan is a stateless scan-speed map: deterministic portable
    * hash (q51's discipline — re-runs, backfills, and the oracle pick
    * the same spans), no shuffle, no state. Docs shorter than one
    * block carry no span (emitted nowhere) — the standard "too short
    * to corrupt" rule. */
  private val SpanBlock = 20
  private val SpanLen = 3

  private def q215(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", size(Portable.tokens($"text")).cast("long").as("n_tokens"))
      .filter($"n_tokens" >= SpanBlock)
      .select($"doc_id", $"n_tokens",
        explode(sequence(lit(0L), expr(s"(n_tokens div $SpanBlock) - 1")))
          .as("block"))
      .select($"doc_id", $"block",
        ($"block" * SpanBlock + pmod(Portable.hash32(concat(
          $"doc_id".cast("string"), lit("#span-"), $"block".cast("string"))),
          lit((SpanBlock - SpanLen + 1).toLong))).as("span_start"),
        lit(SpanLen.toLong).as("span_len"),
        $"n_tokens")
      .orderBy($"doc_id", $"block")
  }

  private val q215Sql: String = {
    val h = Portable.hash32Sql(
      "CAST(doc_id AS VARCHAR) || '#span-' || CAST(block AS VARCHAR)")
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, n_tokens,
       |         unnest(generate_series(0, n_tokens // $SpanBlock - 1)) AS block
       |  FROM t WHERE n_tokens >= $SpanBlock
       |)
       |SELECT doc_id, CAST(block AS BIGINT) AS block,
       |       CAST(block * $SpanBlock + ($h % ${SpanBlock - SpanLen + 1})
       |            AS BIGINT) AS span_start,
       |       CAST($SpanLen AS BIGINT) AS span_len, n_tokens
       |FROM b
       |ORDER BY doc_id, block""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q63_sequence_packing", q63, Some(q63Sql)),
    Q("q64_corpus_shuffle", q64, Some(q64Sql)),
    Q("q70_source_interleave", q70, Some(q70Sql)),
    Q("q71_doc_chunking", q71, Some(q71Sql)),
    Q("q215_span_corruption", q215, Some(q215Sql)),
  )
}
