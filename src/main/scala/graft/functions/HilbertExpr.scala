package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst Hilbert-curve index over two long columns at a fixed
  * `bits` order — the layout kernel of `q_layout_hilbert`.
  *
  * The column-fold formulation ([[graft.operators.Relational.hilbertVal]],
  * kept as the parity reference) chains 17 levels of mutually-referencing
  * CASE projections; Catalyst's projection collapse INLINES each level into
  * the next, so the final expression tree grows multiplicatively with depth
  * — measured 3.9 s bench-isolated at sf0.1, nearly all of it analysis +
  * codegen, for what is arithmetically a 17-iteration loop. This expression
  * emits that loop directly: primitive longs, no boxing, one fused stage —
  * bit-identical to the fold (LayoutSpec parity test) and to the DuckDB
  * oracle's chained CTEs.
  *
  * The transiently NEGATIVE reflected frames (s−1−x with high bits still
  * set) are part of the construction; two's-complement `&` handles them
  * identically in Java, the collapsed Catalyst CASE chain, and DuckDB.
  */
case class HilbertExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertExpr.index(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val hx = ctx.freshName("hx")
      val hy = ctx.freshName("hy")
      val hv = ctx.freshName("hv")
      val lvl = ctx.freshName("lvl")
      val sv = ctx.freshName("sv")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $hx = $a; long $hy = $b; long $hv = 0L;
         |for (int $lvl = ${bits - 1}; $lvl >= 0; $lvl--) {
         |  long $sv = 1L << $lvl;
         |  long $rx = (($hx & $sv) != 0L) ? 1L : 0L;
         |  long $ry = (($hy & $sv) != 0L) ? 1L : 0L;
         |  $hv += $sv * $sv * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $hx = $sv - 1L - $hx; $hy = $sv - 1L - $hy; }
         |    long $t = $hx; $hx = $hy; $hy = $t;
         |  }
         |}
         |${ev.value} = $hv;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertExpr {
  /** The interpreted fold (also the spec's driver-side reference). */
  def index(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var lvl = bits - 1
    while (lvl >= 0) {
      val s = 1L << lvl
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      lvl -= 1
    }
    d
  }
}
