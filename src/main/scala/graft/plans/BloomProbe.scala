package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe of a BROADCAST Bloom filter over a long key —
  * the pre-shuffle prune of [[graft.ops.Relational.bloomSemiJoin]]
  * (q_bloom_semijoin). Replaces the last Scala UDF in the main tree (r13
  * verdict nicety): Spark exposes no public `might_contain` for an
  * explicitly-built filter (its own `BloomFilterMightContain` is internal
  * to the InjectRuntimeFilter rewrite and takes the SERIALIZED filter as a
  * plan-side subquery — re-deserializing ~10 bits/key of filter through a
  * literal is exactly wrong for an explicit 120 MB broadcast at 100 TB), so
  * this is the [[VecDot]] pattern applied to the probe: a native Expression
  * inside whole-stage codegen, no per-row boxing of the key (the UDF paid
  * Long → java.lang.Long per row), no codegen fence around the scan filter.
  *
  * The filter rides the expression as a [[Broadcast]] HANDLE (a codegen
  * reference object resolved to the torrent-shipped value once per task),
  * never as serialized bytes in the plan — plan size stays O(1) no matter
  * the key count. Probe semantics are exactly
  * `BloomFilter.mightContainLong`: false positives possible (removed by the
  * exact semi-join downstream), false negatives impossible, so the rewrite
  * is result-invariant and the query keeps its oracle.
  */
case class BloomProbe(child: Expression, bloomBc: Broadcast[BloomFilter])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint key, got ${child.dataType}")

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(k: Any): Any =
    bloomBc.value.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val fCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc, bcCls)
    // .value() resolved ONCE per codegen object, not per row: the broadcast
    // lookup is a synchronized block-manager read — cheap but not free at
    // scan row rates
    val filterTerm = ctx.addMutableState(fCls, "bloomFilter",
      v => s"$v = ($fCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, k =>
      s"${ev.value} = $filterTerm.mightContainLong($k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_probe"
}

object BloomProbe {
  /** DataFrame-API entry: `true` iff `key` might be in the broadcast
    * filter. Not registered as a SQL function — the filter handle has no
    * SQL-literal form, the [[KeyedOffsetRunningSum]] precedent.
    */
  def column(key: Column, bloomBc: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomProbe(ColumnBridge.expression(key), bloomBc))
}
