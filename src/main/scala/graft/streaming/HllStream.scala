package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous distinct-count maintenance — the streaming twin of
  * q95's mergeable HLL rollup: each micro-batch folds its tokens into
  * the per-source DataSketches HLL state through Spark's incremental
  * streaming aggregation, so per-source AND corpus-wide NDV are always
  * current without rescanning history (the cardinality-domain sibling
  * of [[CmsStream]]'s frequency sketch).
  *
  * Scale/state design: state is one fixed-size HLL buffer per source
  * (kilobytes at lgK=12) — NDV needs no watermark or eviction because
  * register-max updates never grow the state; each micro-batch
  * shuffles only its partial sketches (map-side combined by the same
  * merge that unions shards in q95). Register-max is ORDER-INDEPENDENT,
  * so a streamed sketch is bit-equal to a batch rebuild over the same
  * tokens — HllStreamSpec locks that identity, estimate-for-estimate,
  * across micro-batch boundaries. */
object HllStream {

  /** Per-source sketch estimates over a (streaming or batch) frame
    * with columns (source, w). On a stream, run in `complete` mode —
    * the snapshot is #sources rows. On a batch frame the same
    * expression is q95's per-source build: that identity is the
    * spec's oracle. */
  def perSource(tokens: DataFrame): DataFrame =
    tokens.groupBy(col("source"))
      .agg(hll_sketch_agg(col("w")).as("sk"))
      .select(col("source"),
        hll_sketch_estimate(col("sk")).as("est_distinct"))

  /** Corpus-wide estimate — q95's register-max union, spelled as ONE
    * global sketch over the tokens rather than a merge of the
    * per-source sketches: at equal lgK the two are register-identical
    * (max over a partition refinement = max over the whole), and the
    * single-aggregate form is the one Structured Streaming accepts
    * (chaining groupBy(source) → union would be two streaming
    * aggregations, which Spark rejects). Run in `complete` mode on a
    * stream; on a batch frame HllStreamSpec pins it to the exact
    * distinct within the sketch's error. */
  def union(tokens: DataFrame): DataFrame =
    tokens.agg(hll_sketch_agg(col("w")).as("u"))
      .select(hll_sketch_estimate(col("u")).as("est_distinct"))
}
