package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed sketch aggregator (SURVEY §2.10's one declared custom-agg
  * need): folds hashed shingles into a k-wide MinHash signature in a
  * single pass — the `Aggregator[IN, BUF, OUT]` form of Dedup's 8-way
  * `min()` aggregation, with an associative element-wise-min merge so
  * partial sketches combine map-side exactly like any algebraic
  * aggregate. At 100 TB the buffer is k longs per group regardless of
  * shingle count — constant-size partial state is the whole point of
  * sketch aggregation.
  *
  * IN  = portable 32-bit shingle hash ([[Portable.hash32]]);
  * BUF/OUT = the k permuted minima, h_j(x) = (a(j)·x + b(j)) mod p.
  */
final class MinHashAggregator(
    k: Int,
    a: IndexedSeq[Long],
    b: IndexedSeq[Long],
    p: Long) extends Aggregator[Long, Array[Long], Array[Long]] {

  require(a.length == k && b.length == k)

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < k) {
      val v = (a(j) * h + b(j)) % p
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (y(j) < x(j)) x(j) = y(j); j += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // native primitive-array encoder: the shuffled partial buffer is an
  // UnsafeArrayData of k longs, not an opaque Kryo blob — no serializer
  // round-trip on the hot merge path
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
