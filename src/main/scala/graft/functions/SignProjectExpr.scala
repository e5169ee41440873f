package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native sign-random-projection LSH bucket over an `array<float>` embedding
  * — the candidate-generation kernel of `q_dedup_embed`.
  *
  * Replicates the HOF formulation bit-for-bit: hyperplane sign (p, j) is the
  * low bit of `xxhash64((p + salt·1000)·dims + j)` (Spark's int-typed
  * xxhash64, seed 42), the projection is an ascending-j left fold of
  * x_j·sign in double precision, and bit p of the bucket is set iff the
  * projection is ≥ 0. Two wins over the nested `aggregate(transform(...))`
  * expression it replaces: the lambdas there evaluate interpreted (~nBits ×
  * dims dispatches per row), and the sign vectors are recomputed per row —
  * here they are precomputed once on the driver and the codegen'd loop is
  * primitive multiply-adds.
  */
case class SignProjectExpr(child: Expression, nBits: Int, dims: Int, salt: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  /** Hyperplane signs, row-major by (p, j) — deterministic constants. */
  @transient private lazy val signs: Array[Double] = {
    val out = new Array[Double](nBits * dims)
    var p = 0
    while (p < nBits) {
      var j = 0
      while (j < dims) {
        val h = XXH64.hashInt((p + salt * 1000) * dims + j, 42L)
        out(p * dims + j) = if ((h & 1L) == 1L) 1.0 else -1.0
        j += 1
      }
      p += 1
    }
    out
  }

  // HOF parity for a NULL embedding: each plane's CASE falls to ELSE 0 and
  // the outer fold sums zeros → bucket 0, never SQL NULL. The expression is
  // therefore total (nullable = false) and nullable inputs group identically
  // under either formulation.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) 0L else nullSafeEval(a)
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // HOF parity: a length mismatch or null element null-poisons every
    // plane's fold, its CASE predicate, and thus every bit → bucket 0
    if (n != dims) return 0L
    var j = 0
    while (j < n) { if (arr.isNullAt(j)) return 0L; j += 1 }
    var bucket = 0L
    var p = 0
    while (p < nBits) {
      var acc = 0.0
      val off = p * dims
      j = 0
      while (j < n) { acc += arr.getFloat(j).toDouble * signs(off + j); j += 1 }
      if (acc >= 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    val a = c.value
    val (p, j, n, acc, off, ok) = (ctx.freshName("p"), ctx.freshName("j"),
      ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("off"),
      ctx.freshName("ok"))
    ev.copy(isNull = FalseLiteral, code = code"""
      ${c.code}
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        int $n = $a.numElements();
        boolean $ok = ($n == $dims);
        for (int $j = 0; $ok && $j < $n; $j++) {
          if ($a.isNullAt($j)) $ok = false;
        }
        if ($ok) {
          for (int $p = 0; $p < $nBits; $p++) {
            double $acc = 0.0;
            int $off = $p * $dims;
            for (int $j = 0; $j < $n; $j++) {
              $acc += (double) $a.getFloat($j) * $signsRef[$off + $j];
            }
            if ($acc >= 0.0) ${ev.value} |= (1L << $p);
          }
        }
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SignProjectExpr =
    copy(child = newChild)
}
