package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd fused multiply-accumulate over two `array<double>` columns —
  * the GEMM inner loop of every reference operator (reference attention.py:6,
  * mlp.py:7, xentropy.py:10) as a single whole-stage-codegen expression.
  *
  * Replaces the interpreted `aggregate(zip_with(...))` higher-order-function
  * form (CodegenFallback + one intermediate 64-element array per pair) with a
  * tight primitive loop over the two ArrayData buffers — no allocation, no
  * boxing, stays inside the join→aggregate codegen stage.
  *
  * Accumulation order is the sequential left fold, matching DuckDB's
  * `list_dot_product`, so oracle comparison is exact to the last ulp.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-construction helpers for the native expressions/aggregates. */
object NativeExprs {
  def toExpr(c: Column): Expression = ColumnBridge.expression(c)
  def toCol(e: Expression): Column = ColumnBridge.column(e)

  /** `dot(a, b)` over two array<double> columns, codegen'd. */
  def dot(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))
}
