package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a typed mergeable Aggregator —
  * the frequent-items companion of [[MinHashAggregator]] (set
  * similarity) and q95's theta-union (distinct counting): at most `k`
  * (item, count) counters summarize any stream, with the classic
  * deterministic guarantee
  *
  *   true − n/(k+1)  ≤  estimate  ≤  true
  *
  * for every item, where n is the stream length. Merge follows the
  * mergeable-summaries construction (Agarwal, Cormode, Huang, Phillips,
  * Wei, Yi — PODS'12): sum counters pairwise, then subtract the
  * (k+1)-largest merged count from every counter and drop the
  * non-positive ones. That keeps the buffer ≤ k AND the error bound
  * additive across merges, so partial sketches combine map-side like
  * any algebraic aggregate — at 100 TB each of thousands of input
  * partitions ships k counters to the reducer, never its item
  * universe. Exact heavy hitters (q128) shuffle #distinct-items rows;
  * this shuffles k rows per partition with a proven bound — the same
  * exact↔sketch swap the catalog documents for q17→q54 quantiles.
  *
  * The buffer is a pair of parallel primitive arrays (items, counts) —
  * UnsafeArrayData on the shuffle, no Kryo blob (MinHashAggregator's
  * r1 lesson). Counters stay sorted by item for a deterministic
  * output independent of merge order: ties in the k+1-selection
  * truncate by count THEN item, so two merge trees over the same
  * multiset yield byte-identical sketches.
  */
final class MisraGries(k: Int)
    extends Aggregator[Long, MisraGries.Buf, Array[(Long, Long)]] {

  require(k >= 1, s"MisraGries needs k >= 1, got $k")

  import MisraGries.Buf

  override def zero: Buf = Buf(Array.emptyLongArray, Array.emptyLongArray)

  /** Classic MG step: hit → increment; room → insert; full → decrement
    * every counter (dropping zeros) instead of inserting. */
  override def reduce(buf: Buf, item: Long): Buf = {
    val i = java.util.Arrays.binarySearch(buf.items, item)
    if (i >= 0) { buf.counts(i) += 1L; buf }
    else if (buf.items.length < k) {
      val at = -i - 1
      Buf(insert(buf.items, at, item), insert(buf.counts, at, 1L))
    } else {
      var j = 0
      var kept = 0
      while (j < buf.counts.length) {
        buf.counts(j) -= 1L
        if (buf.counts(j) > 0L) kept += 1
        j += 1
      }
      if (kept == buf.counts.length) buf
      else {
        val items = new Array[Long](kept)
        val counts = new Array[Long](kept)
        var o = 0
        j = 0
        while (j < buf.counts.length) {
          if (buf.counts(j) > 0L) {
            items(o) = buf.items(j); counts(o) = buf.counts(j); o += 1
          }
          j += 1
        }
        Buf(items, counts)
      }
    }
  }

  /** Mergeable-summaries merge: pairwise-sum the counter maps, find
    * the (k+1)-largest count (0 if ≤ k survive), subtract it from all,
    * keep the strictly-positive — deterministic via the (count, item)
    * tie order. */
  override def merge(x: Buf, y: Buf): Buf = {
    if (x.items.isEmpty) return y
    if (y.items.isEmpty) return x
    val m = mutable.TreeMap.empty[Long, Long]
    var j = 0
    while (j < x.items.length) { m.update(x.items(j), x.counts(j)); j += 1 }
    j = 0
    while (j < y.items.length) {
      m.updateWith(y.items(j)) {
        case Some(c) => Some(c + y.counts(j))
        case None => Some(y.counts(j))
      }
      j += 1
    }
    val sub =
      if (m.size <= k) 0L
      else {
        // (k+1)-th largest by (count desc, item asc) — total order, so
        // the subtrahend is independent of merge shape
        val ordered = m.toArray.sortBy { case (it, c) => (-c, it) }
        ordered(k)._2
      }
    val kept = m.iterator
      .map { case (it, c) => (it, c - sub) }
      .filter(_._2 > 0L)
      .toArray // TreeMap iterates item-ascending: arrays stay sorted
    Buf(kept.map(_._1), kept.map(_._2))
  }

  /** (item, estimate) pairs, item-ascending. */
  override def finish(buf: Buf): Array[(Long, Long)] =
    buf.items.zip(buf.counts)

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()

  private def insert(a: Array[Long], at: Int, v: Long): Array[Long] = {
    val out = new Array[Long](a.length + 1)
    System.arraycopy(a, 0, out, 0, at)
    out(at) = v
    System.arraycopy(a, at, out, at + 1, a.length - at)
    out
  }
}

object MisraGries {
  /** Sorted parallel counter arrays (items ascending, counts aligned);
    * a case class of primitive arrays keeps the shuffle representation
    * native (no Kryo). */
  final case class Buf(items: Array[Long], counts: Array[Long])
}
