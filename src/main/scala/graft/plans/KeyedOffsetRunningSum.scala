package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Stateful run-length EXCLUSIVE running sum with pre-computed per-run
  * starting offsets — the executor half of the two-phase prefix-sum
  * scaffold ([[PrefixSum]]) behind both the scalable order-preserving pack
  * (`etl/FixedWidth.packScalable`, value = 1 → global row numbers; the T3
  * reconstruction of /root/reference/main.py:414-423) and the token-budget
  * sequence packer ([[graft.ops.SeqPack]], value = token count).
  *
  * Contract: input partitions are clustered and sorted so every distinct
  * value of `left` (the run key, e.g. "bucket␁source") occupies ONE
  * contiguous run in ONE partition, runs follow the global order, and the
  * offsets table holds each run's global starting sum (the total of all
  * `right` values ordered before the run).
  * On a key change the accumulator reloads from the offsets table; each row
  * yields the sum of all prior rows' values in its key (exclusive prefix
  * sum), then adds its own. The result equals the exact global
  * `sum(value) OVER (PARTITION BY key ORDER BY order ROWS UNBOUNDED
  * PRECEDING AND 1 PRECEDING)` (null→0), computed with full parallelism —
  * no single-reducer per-key window sort.
  *
  * `Nondeterministic` with `stateful = true` so the optimizer never
  * collapses, reorders, or re-evaluates it; full codegen with the offsets
  * table as a codegen reference object. Key must be a non-null string;
  * value a non-null long.
  */
case class KeyedOffsetRunningSum(
    left: Expression,
    right: Expression,
    offsets: java.util.HashMap[String, java.lang.Long])
  extends BinaryExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def stateful: Boolean = true

  @transient private var acc: Long = _
  @transient private var curKey: UTF8String = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    acc = 0L
    curKey = null
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val k = left.eval(input).asInstanceOf[UTF8String]
    if (curKey == null || !k.equals(curKey)) {
      curKey = k.clone()
      val off = offsets.get(k.toString)
      acc = if (off == null) 0L else off.longValue()
    }
    val r = acc
    acc += right.eval(input).asInstanceOf[java.lang.Long].longValue()
    r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapTerm = ctx.addReferenceObj("offsets", offsets, "java.util.HashMap")
    val accTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "korsAcc")
    val curKeyTerm = ctx.addMutableState("UTF8String", "korsCurKey")
    ctx.addPartitionInitializationStatement(s"$accTerm = 0L;")
    ctx.addPartitionInitializationStatement(s"$curKeyTerm = null;")
    val keyGen = left.genCode(ctx)
    val valGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${keyGen.code}
      ${valGen.code}
      if ($curKeyTerm == null || !${keyGen.value}.equals($curKeyTerm)) {
        $curKeyTerm = ${keyGen.value}.clone();
        Object off = $mapTerm.get(${keyGen.value}.toString());
        $accTerm = off == null ? 0L : ((java.lang.Long) off).longValue();
      }
      final long ${ev.value} = $accTerm;
      $accTerm += ${valGen.value};""", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "keyed_offset_running_sum"
}

object KeyedOffsetRunningSum {
  /** DataFrame-API entry: exclusive running sum of `value` over run-key
    * `key` with pre-computed per-run starting `offsets`.
    */
  def column(key: Column, value: Column,
             offsets: java.util.HashMap[String, java.lang.Long]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(KeyedOffsetRunningSum(
      ColumnBridge.expression(key), ColumnBridge.expression(value), offsets))
  }
}
