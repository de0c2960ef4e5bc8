package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD Type-2 maintenance — the continuous twin of the batch
  * history build (q110, `operators.Temporal.scd2History`): each key
  * holds its OPEN version in bounded state, and a micro-batch whose
  * attribute differs from the open version CLOSES it downstream. The
  * reference's consumer loop applies last-write-wins upserts
  * continuously (lambda-sample mqtt/Consumer.scala:59-66, discarding
  * history); this operator is the same continuous loop keeping the
  * history instead.
  *
  * Contract: emitted rows are exactly the batch build's CLOSED versions
  * (`is_current = 0`) when the same readings arrive in order — the
  * open version is state, not output, so an append sink stays
  * exactly-once (emitting the open row every batch would duplicate it
  * on replay; Scd2StreamSpec locks the equivalence). Out-of-order
  * arrivals BEHIND the open version's last-seen (us, event_id) are
  * dropped, the same horizon trade `DedupStream` makes — state is one
  * small record per key, independent of history length. */
object Scd2Stream {

  /** One attribute reading; `us` is the event-time in epoch micros. */
  final case class AttrReading(user_id: Long, us: Long, event_id: Long, attr: String)

  /** Per-key open version (streaming state). */
  final case class OpenVersion(ver: Int, attr: String, validFromUs: Long,
      lastUs: Long, lastEventId: Long, nObs: Long)

  /** A closed validity interval `[validFromUs, validToUs)`. */
  final case class ClosedVersion(user_id: Long, ver: Int, attr: String,
      validFromUs: Long, validToUs: Long, nObs: Long)

  private def update(user: Long, batch: Iterator[AttrReading],
      state: GroupState[OpenVersion]): Iterator[ClosedVersion] = {
    // the micro-batch is unordered; the fold below needs event order
    val ordered = batch.toSeq.sortBy(r => (r.us, r.event_id))
    var cur = state.getOption
    val closed = Seq.newBuilder[ClosedVersion]
    ordered.foreach { r =>
      cur match {
        case None =>
          cur = Some(OpenVersion(1, r.attr, r.us, r.us, r.event_id, 1))
        case Some(c) =>
          val late = r.us < c.lastUs ||
            (r.us == c.lastUs && r.event_id <= c.lastEventId)
          if (late) () // behind the open version: dropped (see scaladoc)
          else if (r.attr == c.attr)
            cur = Some(c.copy(lastUs = r.us, lastEventId = r.event_id,
              nObs = c.nObs + 1))
          else {
            closed += ClosedVersion(user, c.ver, c.attr, c.validFromUs, r.us, c.nObs)
            cur = Some(OpenVersion(c.ver + 1, r.attr, r.us, r.us, r.event_id, 1))
          }
      }
    }
    cur.foreach(state.update)
    closed.result().iterator
  }

  /** Closed-version stream over a typed reading stream; state is one
    * [[OpenVersion]] per key, one shuffle on the key per micro-batch
    * (the [[AnalysisStream]] plan shape). */
  def versions(readings: Dataset[AttrReading]): Dataset[ClosedVersion] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
