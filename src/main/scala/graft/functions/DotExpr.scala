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
  * Null semantics also mirror the HOF exactly — `zip_with` pads the shorter
  * array with nulls and `acc + null` poisons the fold — so mismatched
  * lengths or any null element yield NULL. This is what makes the
  * [[graft.plans.DotProductRewrite]] optimizer rule semantics-preserving,
  * not just numerically equal on clean inputs.
  */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${ev.value} += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}
