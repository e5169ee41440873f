package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst |A ∩ B| over two ASCENDING-SORTED `array<long>` columns —
  * the per-edge kernel of the triangle count (`|N⁺(u) ∩ N⁺(v)|` for every
  * oriented edge).
  *
  * The built-in `size(array_intersect(a, b))` is correct but allocates: per
  * row it builds an OpenHashSet over one side, probes with the other, and
  * MATERIALIZES the intersection array — only to take its size. On the
  * triangle plan that is |E| hash sets and |E| throwaway arrays per run.
  * Because the adjacency arrays arrive sorted (`sort_array` at build), the
  * count is a two-pointer merge walk: zero allocation, no hashing, O(|a|+|b|)
  * primitive compares inside whole-stage codegen.
  *
  * Sortedness is the CALLER's contract (it holds by construction in the
  * triangle plan); unsorted inputs would undercount, so the function is
  * exposed as `graft_isect_count` with the "sorted" requirement documented
  * rather than silently sorting (a per-row sort would give the allocation
  * back). Null arrays yield NULL; a null ELEMENT yields NULL (mirroring the
  * poison semantics of the vector kernels — sorted long arrays from
  * `collect_list` never contain one).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_isect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0;
         |${ev.value} = 0L;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { ${ev.value}++; $i++; $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}
