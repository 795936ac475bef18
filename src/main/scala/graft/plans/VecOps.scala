package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd element-wise vector primitives — the per-row array math of
  * the embedding operators (quantization, cast-widening, scalar-quantizer
  * reconstruction), replacing `transform(...)` higher-order-function
  * chains on the hot paths.
  *
  * Why not the HOF forms: Catalyst higher-order functions are
  * CodegenFallback — every element evaluates an interpreted expression
  * tree (boxed lambda variable, ElementAt/Divide/Floor `eval` calls per
  * element), and CollapseProject inlines a transform-producing alias into
  * each of its downstream references, so a column used k times evaluates
  * the whole interpreted loop k times (and a transform referencing
  * another transform's output via element_at re-evaluates the inner loop
  * PER ELEMENT — the O(dim²) shape q_knn_sq's dequant exhibited:
  * StackProfile top frames were ElementAt/Divide/BinaryArithmetic.eval,
  * 22 CPU-s over 2000 rows). These expressions are one tight primitive
  * loop inside the generated stage (native Expression > HOF > UDF — the
  * build-brief ladder, same as [[VecDot]]), with arithmetic bit-identical
  * to the HOF forms they replace: IEEE double ops in the same order, so
  * no hash-compared result changes (spec-locked in VecOpsSpec).
  *
  * Null semantics: a null ARRAY input nulls the result (as `transform`
  * does). Null ELEMENTS: [[VecCastDouble]] and [[VecScaleFloor]] map null
  * to null exactly like their HOF lambdas (`cast` / `floor(x*s)` both
  * null-propagate per element). [[SqDequant]] nulls the output element
  * when any input element is null — the embedding fixtures are dense
  * (non-null floats), where this is vacuous; the HOF chain it replaces
  * had no coherent per-element null story (its `least` SKIPPED the null
  * from a null-propagating floor, coding a null component as level
  * max-1), so the clean rule is documented rather than mirrored.
  */
object VecOps {

  private def isNumeric(t: DataType): Boolean = t match {
    case FloatType | DoubleType | IntegerType | LongType => true
    case _ => false
  }

  /** array<float|double|int|long> → array<double>, element-wise widening
    * cast (exact for all four element types). Interpreted and generated
    * paths share this helper.
    */
  def castDouble(a: ArrayData, elem: DataType): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    elem match {
      case FloatType =>
        while (i < n) { if (!a.isNullAt(i)) out(i) = a.getFloat(i).toDouble; i += 1 }
      case DoubleType =>
        while (i < n) { if (!a.isNullAt(i)) out(i) = a.getDouble(i); i += 1 }
      case IntegerType =>
        while (i < n) { if (!a.isNullAt(i)) out(i) = a.getInt(i).toDouble; i += 1 }
      case LongType =>
        while (i < n) { if (!a.isNullAt(i)) out(i) = a.getLong(i).toDouble; i += 1 }
      case other => throw new IllegalStateException(s"vec_cast_double: $other")
    }
    new GenericArrayData(out)
  }

  /** array<double> → array<long>: `floor(x * scale)` per element — the
    * exact-integer quantization step (floor of a double, then the
    * double→long floor-cast Spark's `floor` performs). Null elements stay
    * null.
    */
  def scaleFloor(a: ArrayData, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i))
        out(i) = java.lang.Long.valueOf(Math.floor(a.getDouble(i) * scale).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Two-factor quantize: `floor((x * u) * scale)` per element — the
    * power-iteration accumulator's projection step. TWO multiplies in
    * this exact order (never pre-folding `u * scale`: double rounding
    * differs), matching the HOF lambda and the oracle. Null elements
    * stay null.
    */
  def mulScaleFloor(a: ArrayData, u: Double, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i))
        out(i) = java.lang.Long.valueOf(
          Math.floor((a.getDouble(i) * u) * scale).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Centered difference against a quantized centroid sum: per dimension
    * i, `v(i) - (qsl(i).toDouble / d)` — the exact IEEE op order of the
    * `element_at(v,i) - element_at(qsl,i) / (n*scale)` HOF lambda it
    * replaces (long→double cast, divide, subtract). Null on length
    * mismatch; null elements null the output element (as the HOF's
    * null-propagating arithmetic did).
    */
  def centeredDiff(v: ArrayData, qsl: ArrayData, d: Double): ArrayData = {
    val n = v.numElements()
    if (qsl.numElements() != n) return null
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i) && !qsl.isNullAt(i))
        out(i) = java.lang.Double.valueOf(v.getDouble(i) - qsl.getLong(i).toDouble / d)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused scalar-quantizer code+reconstruct: per dimension i,
    * `c = if (mx == mn) 0 else min(floor((x-mn)/(mx-mn)*levels), levels-1)`
    * then `mn + ((c + 0.5) * (mx - mn)) / levels` — the exact IEEE op
    * order of the two-transform HOF chain it replaces (and of the oracle's
    * list_transform mirror). Returns null on length mismatch; null
    * elements null the output element.
    */
  def sqDequant(v: ArrayData, mns: ArrayData, mxs: ArrayData,
                levels: Int): ArrayData = {
    val n = v.numElements()
    if (mns.numElements() != n || mxs.numElements() != n) return null
    val lv = levels.toDouble
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i) && !mns.isNullAt(i) && !mxs.isNullAt(i)) {
        val x = v.getDouble(i)
        val mn = mns.getDouble(i)
        val mx = mxs.getDouble(i)
        val c =
          if (mx == mn) 0L
          else Math.min(Math.floor(((x - mn) / (mx - mn)) * lv).toLong, levels - 1L)
        out(i) = java.lang.Double.valueOf(mn + ((c + 0.5d) * (mx - mn)) / lv)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `vec_cast_double(a)` — see [[VecOps.castDouble]]. */
case class VecCastDouble(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if Seq(FloatType, DoubleType, IntegerType, LongType).contains(t) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double|int|long>, got $other")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)

  override protected def nullSafeEval(a: Any): Any =
    VecOps.castDouble(a.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dt = ctx.addReferenceObj("elemType", elemType, classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.VecOps.castDouble($a, $dt);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_cast_double"
}

/** `vec_scale_floor(a, scale)` — see [[VecOps.scaleFloor]]. `scale` is a
  * double expression (a constant of the operator, or a 1-row-broadcast
  * scalar riding the row).
  */
case class VecScaleFloor(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(DoubleType, _) if right.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, double), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = ArrayType(LongType,
    containsNull = left.dataType.asInstanceOf[ArrayType].containsNull)

  override protected def nullSafeEval(a: Any, s: Any): Any =
    VecOps.scaleFloor(a.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) =>
      s"${ev.value} = graft.plans.VecOps.scaleFloor($a, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_scale_floor"
}

/** `vec_mul_scale_floor(a, u, scale)` — see [[VecOps.mulScaleFloor]]. */
case class VecMulScaleFloor(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, double, double), got $other")
    }

  override def dataType: DataType = ArrayType(LongType,
    containsNull = first.dataType.asInstanceOf[ArrayType].containsNull)

  override protected def nullSafeEval(a: Any, u: Any, s: Any): Any =
    VecOps.mulScaleFloor(a.asInstanceOf[ArrayData],
      u.asInstanceOf[Double], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, u, s) =>
      s"${ev.value} = graft.plans.VecOps.mulScaleFloor($a, $u, $s);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "vec_mul_scale_floor"
}

object VecMulScaleFloor {
  def column(a: Column, u: Column, scale: Column): Column =
    ColumnBridge.column(VecMulScaleFloor(ColumnBridge.expression(a),
      ColumnBridge.expression(u), ColumnBridge.expression(scale)))
}

/** `sq_dequant(v, mns, mxs)` at [[SqDequant.levels]] quantization levels —
  * see [[VecOps.sqDequant]].
  */
case class SqDequant(first: Expression, second: Expression, third: Expression,
                     levels: Int) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects three array<double> arguments, got " +
        children.map(_.dataType).mkString(", "))

  // null on length mismatch, so nullable regardless of child nullability
  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull =
    children.exists(_.dataType.asInstanceOf[ArrayType].containsNull))

  override protected def nullSafeEval(v: Any, mns: Any, mxs: Any): Any =
    VecOps.sqDequant(v.asInstanceOf[ArrayData], mns.asInstanceOf[ArrayData],
      mxs.asInstanceOf[ArrayData], levels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mns, mxs) =>
      s"""${ev.value} = graft.plans.VecOps.sqDequant($v, $mns, $mxs, $levels);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "sq_dequant"
}

/** `vec_centered_diff(v, qsl, d)` — see [[VecOps.centeredDiff]]. */
case class VecCenteredDiff(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<long>, double), got $other")
    }

  // null on length mismatch, so nullable regardless of child nullability
  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull =
    Seq(first, second).exists(_.dataType.asInstanceOf[ArrayType].containsNull))

  override protected def nullSafeEval(v: Any, qsl: Any, d: Any): Any =
    VecOps.centeredDiff(v.asInstanceOf[ArrayData], qsl.asInstanceOf[ArrayData],
      d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, qsl, d) =>
      s"""${ev.value} = graft.plans.VecOps.centeredDiff($v, $qsl, $d);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "vec_centered_diff"
}

object VecCastDouble {
  def column(a: Column): Column =
    ColumnBridge.column(VecCastDouble(ColumnBridge.expression(a)))
}

object VecCenteredDiff {
  def column(v: Column, qsl: Column, d: Column): Column =
    ColumnBridge.column(VecCenteredDiff(ColumnBridge.expression(v),
      ColumnBridge.expression(qsl), ColumnBridge.expression(d)))
}

object VecScaleFloor {
  def column(a: Column, scale: Column): Column =
    ColumnBridge.column(VecScaleFloor(
      ColumnBridge.expression(a), ColumnBridge.expression(scale)))
}

object SqDequant {
  def column(v: Column, mns: Column, mxs: Column, levels: Int): Column =
    ColumnBridge.column(SqDequant(ColumnBridge.expression(v),
      ColumnBridge.expression(mns), ColumnBridge.expression(mxs), levels))
}
