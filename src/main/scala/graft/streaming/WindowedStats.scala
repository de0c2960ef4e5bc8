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
