package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap sessionization — the continuous twin of q44's batch
  * window-lag formulation, built on Spark's NATIVE `session_window`
  * aggregation (merging event-time session state, watermark-driven
  * closure) instead of hand-rolled `flatMapGroupsWithState`: when the
  * built-in operator expresses the semantics, the built-in wins
  * (SURVEY §7.2's rule) — it gets state-store-backed incremental
  * merging, late-data handling, and AQE-planned shuffles for free.
  *
  * Semantics: events of one user belong to one session while each
  * inter-event gap is under `gap`; a session CLOSES (append-mode
  * emission, exactly once) when the watermark passes its end. This is
  * q44's rule — q44 starts a new session at gap > 30 min, the native
  * operator at ≥ — identical off the measure-zero exact-boundary gap,
  * and SessionStreamSpec locks streamed output to the batch recompute
  * on the same data (the [[DriftStream]] batch-equivalence contract).
  *
  * Scale: one shuffle on user_id per micro-batch; state is one
  * (start, end, count) record per OPEN session, bounded by the
  * watermark horizon, merged by the session-window state store —
  * never a per-event buffer. */
object SessionStream {

  /** Per-user session aggregate over a (streaming or batch) frame with
    * `user_id` and timestamp `ts` columns. On a stream, emits each
    * session once when the watermark (`lateness`) passes its end; on a
    * batch frame the same expression computes the full history —
    * that identity is the spec's oracle. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", lateness) else events
    withWm
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"))
  }
}
