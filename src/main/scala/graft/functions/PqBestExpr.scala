package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StructField, StructType}

/** Native Catalyst PQ-subspace argmin: for the `sub`-wide slice of an
  * `array<float>` embedding starting at `offset` (0-based), the nearest
  * centroid of the driver-held per-subspace codebook `cb`, returned as
  * `struct(s: double, c: int)` — score s = ce·ce − 2·x·ce (the x·x term is
  * subspace-constant and irrelevant to the argmin), code c the tie-lowest
  * centroid index.
  *
  * This replaces the expression-tree argmin (ks literal-centroid
  * [[DotExpr]] kernels per subspace combined through struct ordering —
  * first array_sort, then a least() chain): both forms produced per-row
  * per-cell slice allocations, struct materializations and either an
  * interpreted subtree (ArraySort is CodegenFallback) or a generated
  * method too large to JIT. Here the whole subspace argmin is ONE virtual
  * call into this JIT-compiled Scala loop — no slice copy, no per-cell
  * struct, ~m calls per row (guide §1.2 step 2, §4.2: hand whole batches
  * of work to native code).
  *
  * Bit parity with the tree form (and the DuckDB oracle's
  * row_number() OVER (ORDER BY score, c)):
  *   - the inner product is the same ascending-index double fold over
  *     float-widened elements as [[DotExpr]];
  *   - ce·ce is folded at CONSTRUCTION time with the same ascending fold
  *     the old code computed via foldDot;
  *   - s = cc − 2.0·acc, the identical IEEE expression;
  *   - the comparison is java.lang.Double.compare — Catalyst's DoubleType
  *     ordering (NaN greatest, −0.0 < 0.0), i.e. exactly the struct min —
  *     with strict-less replacement keeping the LOWEST c on ties.
  *
  * Null scope (the [[SumSqExpr]] precedent): a NULL array yields NULL, and
  * any NULL element inside the subspace slice yields NULL, mirroring the
  * DotExpr-based cells whose null score poisoned the struct ordering.
  */
case class PqBestExpr(child: Expression, offset: Int, cb: Array[Array[Float]])
    extends UnaryExpression {

  private val sub = cb(0).length
  // ce·ce per centroid — ascending double fold, the same driver-side
  // constant the expression-tree form embedded as lit(foldDot(ce, ce))
  private val cc: Array[Double] = cb.map { ce =>
    var acc = 0.0
    var i = 0
    while (i < ce.length) { acc += ce(i).toDouble * ce(i).toDouble; i += 1 }
    acc
  }

  override def dataType: DataType = StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_best"

  /** The argmin kernel — public so generated code can call it. */
  def best(a: ArrayData): InternalRow = {
    if (a.numElements() < offset + sub) return null
    var bk = -1
    var bs = 0.0
    var k = 0
    while (k < cb.length) {
      val ce = cb(k)
      var acc = 0.0
      var i = 0
      while (i < sub) {
        if (a.isNullAt(offset + i)) return null
        acc += a.getFloat(offset + i).toDouble * ce(i).toDouble
        i += 1
      }
      val s = cc(k) - 2.0 * acc
      if (bk < 0 || java.lang.Double.compare(s, bs) < 0) { bs = s; bk = k }
      k += 1
    }
    new GenericInternalRow(Array[Any](bs, bk))
  }

  override def nullSafeEval(a: Any): Any = best(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqBest", this, classOf[PqBestExpr].getName)
      s"""
         |${ev.value} = $ref.best($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqBestExpr =
    copy(child = newChild)
}
