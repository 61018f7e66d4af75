package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: dot product of two `array<bigint>` columns.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0L, _+_)` runs
  * the higher-order lambdas interpreted per row and allocates an
  * intermediate array per pair — the hot inner loop of brute-force ANN.
  * This expression generates a tight primitive `long` loop inside
  * whole-stage codegen (no allocation, no virtual calls), with a matching
  * interpreted path for completeness.
  *
  * Exactness contract: inputs are grid-quantized longs (OracleSafe.quant),
  * so the sum is exact integer arithmetic — equal on any engine in any
  * order.
  */
case class LongArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: exact dot product of two quantized long arrays. */
  def long_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
