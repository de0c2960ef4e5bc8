package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Per-record microsecond offset for consume-time stamping:
  * `row-index-in-partition * 1024 + partition-id` — distinct across all
  * records of a micro-batch for ≤1024 partitions, bounded drift of
  * ~1 ms per same-partition record.
  *
  * Exists because `monotonically_increasing_id()` is rejected in
  * streaming plans (its values change under partition-count replans,
  * which would break sinks keyed on them) — this expression makes the
  * same per-partition counter available where the USE is sound: a
  * tie-breaking offset added to the batch timestamp, where cross-replay
  * stability is already bounded by `current_timestamp()` itself.
  * Stateful per partition (counter resets in `initialize`), codegen'd
  * like the built-in it replaces.
  */
case class RecordOffset() extends LeafExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_record_offset"

  @transient private var count: Long = _
  @transient private var pid: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    count = 0L
    pid = partitionIndex.toLong
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val v = count * 1024L + pid
    count += 1
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val countTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "graftRecOffCount")
    val pidTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "graftRecOffPid")
    ctx.addPartitionInitializationStatement(s"$countTerm = 0L;")
    ctx.addPartitionInitializationStatement(s"$pidTerm = (long) partitionIndex;")
    ev.copy(
      code = code"""
        final long ${ev.value} = $countTerm * 1024L + $pidTerm;
        $countTerm++;""",
      isNull = FalseLiteral)
  }
}
