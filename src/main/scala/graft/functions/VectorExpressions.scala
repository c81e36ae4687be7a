package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native Catalyst dot product over two double arrays, with whole-stage
 * codegen (doGenCode) — the hot inner loop of every cosine-similarity
 * operator. Accumulates strictly left-to-right so results are
 * bit-identical to a sequential fold (`aggregate(zip_with(...))`, or
 * DuckDB's `list_reduce`) — the engine/oracle determinism contract.
 *
 * Versus the higher-order-function formulation this avoids the
 * intermediate zipped array allocation and lambda interpretation
 * entirely: one fused loop over the unsafe array data.
 */
case class DotProductD(left: Expression, right: Expression)
  extends BinaryExpression {

  // Callers (VectorFunctions.vecDot / the SQL registration) guarantee
  // array<double> inputs; no ExpectsInputTypes (private[sql]).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh names: several DotProductD instances can land in ONE generated
    // function (e.g. cosine = dot/(sqrt(dot)*sqrt(dot)) in a predicate)
    val n = ctx.freshName("dotN")
    val acc = ctx.freshName("dotAcc")
    val i = ctx.freshName("dotI")
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[DotProductD]]. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
