package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Stateful run-length row-number with pre-computed per-run starting
  * offsets — the Tungsten-resident half of the scalable order-preserving
  * pack ([[graft.etl.FixedWidth.packScalable]], the T3 reconstruction of
  * /root/reference/main.py:414-423).
  *
  * Contract: the input partitions are clustered and sorted so that every
  * distinct value of `child` (the run key, e.g. "bucket␁partkey") occupies
  * ONE contiguous run in ONE partition, and the offsets table holds each
  * run's global starting row number. The expression walks each partition
  * once: on a key change it looks up the run's offset, then counts up. The
  * result is the exact global `row_number() OVER (PARTITION BY key ORDER BY
  * order)` − 1, computed with full parallelism — no single-reducer per-key
  * window sort, no external-Row `mapPartitions` (rows never leave
  * UnsafeRow; only the key column is evaluated).
  *
  * Modeled on Spark's own partition-stateful expressions
  * (`MonotonicallyIncreasingID`): `Nondeterministic` with `stateful = true`
  * so the optimizer never collapses, reorders, or re-evaluates it, plus
  * full codegen (the offsets table rides along as a codegen reference
  * object). The key must be a non-null string column
  * ([[graft.etl.FixedWidth.packScalable]] builds one with `concat_ws`,
  * which never returns null).
  */
case class KeyedOffsetRowNumber(
    child: Expression,
    offsets: java.util.HashMap[String, java.lang.Long])
  extends UnaryExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def stateful: Boolean = true

  @transient private var counter: Long = _
  @transient private var curKey: UTF8String = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    counter = 0L
    curKey = null
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val k = child.eval(input).asInstanceOf[UTF8String]
    if (curKey == null || !k.equals(curKey)) {
      curKey = k.clone()
      val off = offsets.get(k.toString)
      counter = if (off == null) 0L else off.longValue()
    }
    val r = counter
    counter += 1
    r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapTerm = ctx.addReferenceObj("offsets", offsets, "java.util.HashMap")
    val counterTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "kornCounter")
    val curKeyTerm = ctx.addMutableState("UTF8String", "kornCurKey")
    ctx.addPartitionInitializationStatement(s"$counterTerm = 0L;")
    ctx.addPartitionInitializationStatement(s"$curKeyTerm = null;")
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      if ($curKeyTerm == null || !${childGen.value}.equals($curKeyTerm)) {
        $curKeyTerm = ${childGen.value}.clone();
        Object off = $mapTerm.get(${childGen.value}.toString());
        $counterTerm = off == null ? 0L : ((java.lang.Long) off).longValue();
      }
      final long ${ev.value} = $counterTerm;
      $counterTerm++;""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "keyed_offset_row_number"
}

object KeyedOffsetRowNumber {
  /** DataFrame-API entry: wrap the expression over a run-key Column. */
  def column(key: Column,
             offsets: java.util.HashMap[String, java.lang.Long]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(KeyedOffsetRowNumber(ColumnBridge.expression(key), offsets))
  }
}
