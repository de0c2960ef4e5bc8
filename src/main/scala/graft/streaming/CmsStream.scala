package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Continuous count-min-sketch maintenance — the streaming twin of
  * q188's batch sketch build: each micro-batch of tokens updates the
  * (r, col) cell counters through Spark's incremental streaming
  * aggregation, so the sketch is ALWAYS current without rescanning
  * history (the same always-on shape as [[DriftStream]]/[[DedupStream]],
  * applied to the frequency domain).
  *
  * The cell family comes from [[TextAnalysis.cmsProbes]] — the ONE probe
  * definition the batch build, the probe side, and this stream share, so
  * a streamed sketch can never fork from a batch rebuild of the same
  * tokens (CmsStreamSpec locks cell-for-cell equality).
  *
  * Scale/state design: state is EXACTLY d·w = 2 048 counter rows no
  * matter how much streams through — the sketch IS the watermark-free
  * bounded-state trick (frequencies need no eviction because the state
  * never grows); each micro-batch shuffles only its partial cell counts
  * (map-side combined) to the 2 048-cell state store. Readers either
  * subscribe in complete mode (the full sketch every trigger — it is
  * tiny) or update mode (changed cells only). */
object CmsStream {

  /** Cell-count frame over a (streaming or batch) token frame with one
    * string column `w`. On a stream, aggregate incrementally (run with
    * `complete` output for the full sketch per trigger); on a batch
    * frame the same expression is q188's sketch build — that identity
    * is the spec's oracle. */
  def cells(tokens: DataFrame): DataFrame =
    tokens
      .select(inline(TextAnalysis.cmsProbes(col("w"))))
      .groupBy(col("r"), col("col"))
      .agg(count(lit(1)).as("cell"))
}
