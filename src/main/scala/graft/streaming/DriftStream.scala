package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitor — the continuous twin of
  * q142's batch PSI (`operators.Timeseries`): a reference histogram
  * (training window) is frozen up front, and the live stream's values
  * accumulate into per-type tumbling event-time windows; when a
  * window closes, its Population Stability Index against the
  * reference emits downstream. This is the monitor an ML platform
  * runs BETWEEN the training snapshot and the serving stream — the
  * reference's analyzer recomputes per-sensor stats on every
  * micro-batch (lambda-sample analyzer/src/main/scala/analyzer/
  * Analyzer.scala); this operator keeps that cadence but scores the
  * live window against a frozen baseline instead of refitting.
  *
  * Contract (the [[Scd2Stream]] discipline): a window is EMITTED
  * exactly once, when a later-window reading arrives for its type —
  * the open window is state, not output, so an append sink stays
  * exactly-once under replay. Readings behind the open window drop
  * (the same bounded-state horizon trade as [[DedupStream]]); state
  * is one 10-counter record per type, independent of stream length.
  * PSI algebra is IDENTICAL to q142 (shares clamped at 1e-6, each
  * term (p−q)·ln(p/q) ≥ 0) — DriftStreamSpec locks streamed windows
  * to the batch recompute. Live values outside the reference range
  * clamp into the edge bins: mass piling at bin 0/9 is exactly how
  * range drift surfaces. */
object DriftStream {

  /** One monitored value; `us` is event-time in epoch micros. */
  final case class ValueReading(event_type: String, us: Long, value: Double)

  /** Frozen reference histogram: 10 equal-width bins from `lo` with
    * width `w` (w = (hi−lo)/10 at freeze time), and the reference
    * share of each bin. */
  final case class RefSpec(lo: Double, w: Double, shares: Seq[Double]) {
    require(shares.length == 10, s"need 10 reference shares, got ${shares.length}")
  }

  /** A closed window's drift score. */
  final case class WindowPsi(event_type: String, window_start_us: Long,
      n: Long, psi: Double)

  /** Per-type open window (streaming state). */
  final case class OpenWindow(startUs: Long, counts: Seq[Long])

  private def binOf(ref: RefSpec, v: Double): Int =
    if (ref.w == 0) 0
    else math.min(9, math.max(0, math.floor((v - ref.lo) / ref.w).toInt))

  /** q142's PSI over a closed window's counts — same clamp, same
    * spelling, so the spec's streamed ≡ batch check is exact. */
  private def psiOf(ref: RefSpec, counts: Array[Long]): (Long, Double) = {
    val n = counts.sum
    val psi = (0 until 10).map { b =>
      val p = math.max(counts(b).toDouble / n, 1e-6)
      val q = math.max(ref.shares(b), 1e-6)
      (p - q) * math.log(p / q)
    }.sum
    (n, psi)
  }

  /** Freeze a reference from a batch frame with (event_type, value)
    * columns: per-type exact min/max edges (q116's discipline) and bin
    * shares. One corpus scan + a #types·10-row collect. */
  def referenceOf(df: DataFrame): Map[String, RefSpec] = {
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df.groupBy($"event_type")
      .agg(min($"value").as("lo"), max($"value").as("hi"),
        count(lit(1)).as("n"))
      .withColumn("w", ($"hi" - $"lo") / lit(10.0))
    val counts = df.join(broadcast(stats), Seq("event_type"))
      .select($"event_type",
        when($"w" === 0, lit(0))
          .otherwise(least(floor(($"value" - $"lo") / $"w"), lit(9.0)).cast("int"))
          .as("bin"))
      .groupBy($"event_type", $"bin").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    stats.select($"event_type", $"lo", $"w", $"n").collect().map { r =>
      val (tpe, n) = (r.getString(0), r.getLong(3).toDouble)
      tpe -> RefSpec(r.getDouble(1), r.getDouble(2),
        (0 until 10).map(b => counts.getOrElse((tpe, b), 0L) / n))
    }.toMap
  }

  /** Closed-window PSI stream; types absent from `ref` are unmonitored
    * and pass through silently. One shuffle on event_type per
    * micro-batch; state per type is O(1). */
  def monitor(readings: Dataset[ValueReading], ref: Map[String, RefSpec],
      windowUs: Long): Dataset[WindowPsi] = {
    require(windowUs > 0, s"need windowUs > 0 (got $windowUs)")
    val spark = readings.sparkSession
    import spark.implicits._
    readings
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, batch: Iterator[ValueReading], state: GroupState[OpenWindow]) =>
          ref.get(tpe) match {
            case None => Iterator.empty
            case Some(rs) =>
              // the micro-batch is unordered; window closure needs time order
              val ordered = batch.toSeq.sortBy(_.us)
              var cur = state.getOption.map(a => (a.startUs, a.counts.toArray))
              val out = Seq.newBuilder[WindowPsi]
              for (r <- ordered) {
                val ws = r.us - java.lang.Math.floorMod(r.us, windowUs)
                cur match {
                  case None =>
                    val c = Array.fill(10)(0L); c(binOf(rs, r.value)) = 1L
                    cur = Some((ws, c))
                  case Some((s, c)) =>
                    if (ws == s) c(binOf(rs, r.value)) += 1
                    else if (ws > s) {
                      val (n, psi) = psiOf(rs, c)
                      out += WindowPsi(tpe, s, n, psi)
                      val nc = Array.fill(10)(0L); nc(binOf(rs, r.value)) = 1L
                      cur = Some((ws, nc))
                    } // ws < s: behind the open window — dropped (see scaladoc)
                }
              }
              cur.foreach { case (s, c) => state.update(OpenWindow(s, c.toSeq)) }
              out.result().iterator
          }
      }
  }
}
