package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<float>` columns — the hot
  * kernel of the similarity-search family.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * evaluates its lambda INTERPRETED, one function dispatch per element; this
  * expression compiles to a primitive Java loop inside whole-stage codegen
  * (no boxing, no per-element dispatch). The accumulation is the same
  * ascending-index left fold in double precision, so results are
  * bit-identical to both the HOF version and the DuckDB oracle's
  * `list_reduce` (FP addition order matters; q_simsearch_topk's hash check
  * would catch any deviation).
  *
  * Internal-use contract: inputs must be `array<float>` with non-null
  * elements (the embeddings fixture schema); lengths are folded to the
  * shorter side.
  */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}
