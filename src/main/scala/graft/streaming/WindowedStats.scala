package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with late-data handling — the
  * deliberate EXTENSION beyond the reference (SURVEY §2.8 T2: the
  * reference is processing-time only, count-based windows; watermarked
  * event-time windows are what the same pipeline needs once events
  * arrive with their own timestamps, e.g. replayed logs at 100 TB).
  *
  * Tumbling window per sensor: count / mean / population σ — the same
  * speed-layer statistics, computed per event-time window instead of
  * per trailing-N window. State is bounded by the watermark: windows
  * older than `lateness` are finalized and evicted.
  */
object WindowedStats {

  def tumbling(
      entries: DataFrame, // streaming (sensor, ts, value, ...)
      windowLength: String = "1 minute",
      lateness: String = "2 minutes"): DataFrame =
    entries
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength), col("sensor"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("value")).as("avg_v"),
        stddev_pop(col("value")).as("std_v"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("sensor"), col("n"), col("avg_v"), col("std_v"))

  /** Streaming heavy hitters: per event-time tumbling window, the
    * Misra–Gries top-items sketch ([[graft.functions.MisraGries]] —
    * q128's sketch twin) as a windowed streaming aggregation. The MG
    * buffer is the streaming STATE: k (item, count) counters per open
    * window, merged incrementally by the aggregator's own mergeable-
    * summaries algebra as micro-batches arrive — so "trending items
    * this hour over an unbounded item domain" runs with
    * O(k × open windows) state where an exact streaming groupBy would
    * hold every distinct item ever seen inside the lateness horizon.
    * The watermark finalizes windows and evicts their counters; the
    * PODS'12 bound (est ∈ [true − n/(k+1), true]) holds per window
    * because batch-incremental merge IS the sketch's merge
    * (StreamingSpec proves stream ≡ batch sketch bound on the same
    * data). */
  def trendingItems(
      events: DataFrame, // streaming (ts: timestamp, item: long)
      k: Int,
      windowLength: String = "1 minute",
      lateness: String = "2 minutes"): DataFrame = {
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.MisraGries(k),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength))
      .agg(mg(col("item")).as("top_items"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("top_items"))
  }

  /** Gap-based session windows per key — the streaming twin of the q44
    * batch sessionizer, on Spark's native `session_window` (dynamic
    * merging windows: a session closes only when no event lands within
    * `gap` of its end). The watermark finalizes closed sessions and
    * evicts their state, so state is bounded by keys with an OPEN
    * session inside the lateness horizon — at 100 TB the state store
    * holds active sessions only, never history. */
  def sessions(
      entries: DataFrame, // streaming (sensor, ts, value, ...)
      gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    entries
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("sensor"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_v"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("sensor"), col("n_events"), col("sum_v"))
}
