package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming attribution matching — the CONTINUOUS twin of q183's batch
  * tolerance join, built on Spark's NATIVE watermarked stream-stream
  * inner join: purchases and clicks arrive as two independent streams
  * and every (purchase, click) pair of one user within ±`tolerance`
  * is emitted as soon as both sides are present (the built-in operator
  * expresses the semantics, so the built-in wins — SURVEY §7.2's rule;
  * it gets state-store-backed buffering and watermark-driven state
  * EVICTION for free).
  *
  * Semantics: inner join on `user_id` with the event-time range
  * predicate |p_ts − c_ts| ≤ tolerance. Unlike batch q183 (which
  * selects the single NEAREST click), the stream emits EVERY in-window
  * pair — the nearest-selection is a per-purchase argmin that can only
  * close once the purchase's window expires, so a streaming consumer
  * either takes all pairs (this operator; dedupe-downstream) or runs
  * the q183 argmin over the emitted pairs per closed window.
  * AttributionStreamSpec locks the streamed pairs to the SAME join
  * expression evaluated in batch over the union of all micro-batches —
  * the [[SessionStream]] batch-equivalence contract.
  *
  * Scale/state design: both sides carry watermarks, and the range
  * predicate bounds how long a row can still find partners — Spark
  * derives per-side state watermarks from it and evicts buffered rows
  * past `watermark + tolerance`. State per user is the rows inside one
  * tolerance horizon, NEVER unbounded history; the join itself is one
  * stream-stream shuffle on `user_id` per micro-batch. */
object AttributionStream {

  /** Join purchases to clicks of the same user within ±`tolerance`.
    * Inputs are (streaming or batch) frames: `purchases` with columns
    * `(user_id, purchase_id, p_ts)`, `clicks` with `(c_user, click_id,
    * c_ts)` — distinct column names because stream-stream joins need
    * unambiguous event-time columns on both sides. On batch frames the
    * same expression computes the full history (the spec's oracle). */
  def matches(purchases: DataFrame, clicks: DataFrame,
      tolerance: String = "10 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val p = if (purchases.isStreaming) purchases.withWatermark("p_ts", lateness)
            else purchases
    val c = if (clicks.isStreaming) clicks.withWatermark("c_ts", lateness)
            else clicks
    p.join(c, expr(
      s"""user_id = c_user AND
         |c_ts >= p_ts - INTERVAL $tolerance AND
         |c_ts <= p_ts + INTERVAL $tolerance""".stripMargin))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"),
        (unix_micros(col("c_ts")) - unix_micros(col("p_ts"))).as("dt_us"))
  }
}
