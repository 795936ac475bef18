package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token counter over UTF-8 bytes — a fully codegen'd scalar
  * `Expression` (`doGenCode`, no UDF boxing, stays inside whole-stage
  * codegen). Counts maximal runs of non-whitespace; whitespace is the ASCII
  * set `[ \t\n\x0B\f\r]` (Java regex `\s`), which is byte-safe in UTF-8
  * because continuation bytes are ≥ 0x80.
  *
  * The declarative equivalent — `size(filter(split(trim(s),'\\s+'), …))` —
  * allocates a token array per row and evaluates outside codegen
  * (higher-order functions are CodegenFallback). This expression is the
  * preference-order demonstration from the build brief: native Expression >
  * UDF. Registered as SQL `ascii_token_count(str)`.
  */
case class AsciiTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string argument")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    AsciiTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AsciiTokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ascii_token_count"
}

object AsciiTokenCount {
  val Name = "ascii_token_count"

  /** Called from both interpreted eval and generated Java. */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var cnt = 0
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      val ws = c == 32 || (c >= 9 && c <= 13)
      if (ws) inTok = false
      else if (!inTok) { cnt += 1; inTok = true }
      i += 1
    }
    cnt
  }

  private val info = new ExpressionInfo(classOf[AsciiTokenCount].getName, Name)
  private val builder: Seq[Expression] => Expression = {
    case Seq(c) => AsciiTokenCount(c)
    case other => throw new IllegalArgumentException(
      s"$Name expects 1 argument, got ${other.length}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name), info, builder)

  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(Name), info, builder))
}
