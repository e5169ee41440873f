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
  * back). Null arrays yield NULL; a null ELEMENT — anywhere in EITHER
  * array, including past the point where the shorter side exhausts —
  * yields NULL (mirroring the poison semantics of the vector kernels;
  * both arrays are scanned for nulls up front so the contract is total,
  * not just over elements the merge walk happens to visit). Sorted long
  * arrays from `collect_list` never contain one, so the scan is the
  * fast path in practice.
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
    // total null-poison: scan BOTH arrays, not just elements the merge
    // walk visits — a trailing null after one side exhausts must poison too
    var k = 0
    while (k < n) { if (x.isNullAt(k)) return null; k += 1 }
    k = 0
    while (k < m) { if (y.isNullAt(k)) return null; k += 1 }
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
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
      val k = ctx.freshName("k")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |for (int $k = 0; $k < $n && !${ev.isNull}; $k++)
         |  if ($a.isNullAt($k)) ${ev.isNull} = true;
         |for (int $k = 0; $k < $m && !${ev.isNull}; $k++)
         |  if ($b.isNullAt($k)) ${ev.isNull} = true;
         |int $i = 0; int $j = 0;
         |${ev.value} = 0L;
         |while (!${ev.isNull} && $i < $n && $j < $m) {
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

/** Native A ∩ B ELEMENTS over two ascending-sorted, deduplicated
  * `array<long>` columns — the triangle-ENUMERATION kernel behind the
  * staged k-truss round-1 support (each w ∈ N⁺(u) ∩ N⁺(v) credits three
  * edges, so the elements are needed, not just the count).
  *
  * Replaces `array_intersect(nu, nv)`: the built-in builds an OpenHashSet
  * per row; on sorted deduplicated inputs its result (left order, deduped)
  * IS the sorted merge intersection, so a two-pointer walk produces the
  * identical array with zero hashing. Sortedness/dedup is the caller's
  * contract exactly as for [[SortedIntersectCountExpr]], and the null
  * semantics mirror it: NULL array → NULL, any null element → NULL.
  */
case class SortedIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_isect"

  /** The merge kernel — public so generated code can call it. */
  def isect(aa: Any, bb: Any): ArrayData = {
    val x = aa.asInstanceOf[ArrayData]
    val y = bb.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var k = 0
    while (k < n) { if (x.isNullAt(k)) return null; k += 1 }
    k = 0
    while (k < m) { if (y.isNullAt(k)) return null; k += 1 }
    val buf = new Array[Long](math.min(n, m))
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { buf(c) = xv; c += 1; i += 1; j += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(buf, c))
  }

  override def nullSafeEval(a: Any, b: Any): Any = isect(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("isect", this, classOf[SortedIntersectExpr].getName)
      s"""
         |${ev.value} = $ref.isect($a, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectExpr =
    copy(left = newLeft, right = newRight)
}
