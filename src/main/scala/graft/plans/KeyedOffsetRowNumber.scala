package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Stateful per-partition row-number with pre-computed per-(partition, key)
  * starting offsets — the Tungsten-resident half of the scalable
  * order-preserving pack ([[graft.etl.FixedWidth.packScalable]], the T3
  * reconstruction of /root/reference/main.py:414-423).
  *
  * Contract: the input partitions are range-partitioned and sorted on
  * (key, order), so each key occupies one contiguous run per partition and
  * runs across partitions follow the global order. The expression walks each
  * partition once: on a key change it looks up the key's starting offset for
  * this partition (rows of the same key in earlier partitions), then counts
  * up. The result is the exact global `row_number() OVER (PARTITION BY key
  * ORDER BY order)` − 1, computed with full parallelism — no single-reducer
  * per-key window sort, no external-Row `mapPartitions` (rows never leave
  * UnsafeRow; only the key column is evaluated).
  *
  * Modeled on Spark's own partition-stateful expressions
  * (`MonotonicallyIncreasingID`): `Nondeterministic` with
  * `stateful = true` so the optimizer never collapses, reorders, or
  * re-evaluates it, plus full codegen (the offsets table rides along as a
  * codegen reference object).
  *
  * The key must be a non-null string column (callers concat multi-column
  * keys; [[graft.etl.FixedWidth.packScalable]] builds one with `concat_ws`,
  * which never returns null).
  */
case class KeyedOffsetRowNumber(
    child: Expression,
    offsets: java.util.HashMap[Integer, java.util.HashMap[String, java.lang.Long]])
  extends UnaryExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def stateful: Boolean = true

  @transient private var counter: Long = _
  @transient private var curKey: UTF8String = _
  @transient private var perKey: java.util.HashMap[String, java.lang.Long] = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    counter = 0L
    curKey = null
    perKey = offsets.get(Integer.valueOf(partitionIndex))
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val k = child.eval(input).asInstanceOf[UTF8String]
    if (curKey == null || !k.equals(curKey)) {
      curKey = k.clone()
      val off = if (perKey == null) null else perKey.get(k.toString)
      counter = if (off == null) 0L else off.longValue()
    }
    val r = counter
    counter += 1
    r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapTerm = ctx.addReferenceObj("offsets", offsets, "java.util.HashMap")
    val perKeyTerm = ctx.addMutableState("java.util.HashMap", "kornPerKey")
    val counterTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "kornCounter")
    val curKeyTerm = ctx.addMutableState("UTF8String", "kornCurKey")
    ctx.addPartitionInitializationStatement(
      s"$perKeyTerm = (java.util.HashMap) $mapTerm.get(Integer.valueOf(partitionIndex));")
    ctx.addPartitionInitializationStatement(s"$counterTerm = 0L;")
    ctx.addPartitionInitializationStatement(s"$curKeyTerm = null;")
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      if ($curKeyTerm == null || !${childGen.value}.equals($curKeyTerm)) {
        $curKeyTerm = ${childGen.value}.clone();
        Object off = $perKeyTerm == null ? null : $perKeyTerm.get(${childGen.value}.toString());
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
  /** DataFrame-API entry: wrap the expression over a key Column. */
  def column(key: Column,
             offsets: java.util.HashMap[Integer, java.util.HashMap[String, java.lang.Long]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(KeyedOffsetRowNumber(ColumnBridge.expression(key), offsets))
  }
}
