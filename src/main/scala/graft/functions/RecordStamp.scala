package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Unique consume-time stamp in microseconds: `graft_record_stamp(base)`
  * returns `max(previous + 1, base)` off a JVM-wide monotonic register —
  * the classic unique-timestamp clamp. Within one JVM two records can
  * NEVER receive the same stamp, under any per-batch volume (an earlier
  * row-index×1024 offset scheme let a >500-record partition batch drift
  * past the next batch's stamp space, re-enabling cross-batch (sensor,
  * ts) collisions under sustained load). Drift above the wall clock only
  * accumulates beyond 1M records/s/JVM sustained — far above the
  * reference cadence — and self-heals the moment the clock catches up.
  *
  * Across executor JVMs the register is per-JVM, so two executors can
  * (like the reference's per-record `Instant.now()`,
  * mqtt/Consumer.scala:64) collide on a wall-clock microsecond — rare
  * and non-structural, the same contract as the reference's ms-granular
  * stamps.
  *
  * Exists because `monotonically_increasing_id()` is rejected in
  * streaming plans; this is the streaming-safe form, sound here because
  * the value is CONSUMED as a timestamp (cross-replay stability is
  * already bounded by `current_timestamp()` itself). Codegen'd like the
  * built-in it replaces.
  */
case class RecordStamp(child: Expression) extends UnaryExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_record_stamp"

  override protected def initializeInternal(partitionIndex: Int): Unit = ()

  override protected def evalInternal(input: InternalRow): Any =
    RecordStamp.next(child.eval(input).asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        final long ${ev.value} = graft.functions.RecordStamp.next(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RecordStamp =
    copy(child = newChild)
}

object RecordStamp {
  private val last = new AtomicLong(Long.MinValue)

  /** Strictly increasing per JVM; equals `base` when the clock has moved
    * past every stamp already handed out. Thread-safe (CAS loop). */
  def next(base: Long): Long = last.updateAndGet(prev => math.max(prev + 1, base))
}
