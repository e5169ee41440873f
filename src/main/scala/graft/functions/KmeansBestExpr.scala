package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst k-means assignment over integer-micro vectors: for an
  * `array<bigint>` vector and the driver-held centroid table `cents`
  * (k × dims longs), the exact squared distance to the nearest centroid,
  * returned as `struct(d2: bigint, cid: int)` with ties to the LOWEST
  * centroid id — the oracle's row_number() OVER (ORDER BY d2, cid).
  *
  * Replaces the per-iteration higher-order-function distance columns
  * (`aggregate(zip_with(vm, array(<literals>), ...))` per cluster): HOFs
  * are CodegenFallback, so k 64-term kernels ran interpreted per row, and
  * each Lloyd round planned a brand-new statement around its new centroid
  * literals. Here the whole assignment is ONE virtual call into this
  * JIT-compiled loop, and because the centroids ride the expression object
  * (a codegen reference slot, not inlined source), every round's generated
  * code is byte-identical — compiled once, codegen-cache hits thereafter
  * (guide §1.2 step 2, §4.2).
  *
  * All arithmetic is exact Long — (a−b)² summed ascending — identical
  * integers to the HOF fold it replaces. Null scope ([[SumSqExpr]]
  * precedent): NULL array or any NULL element yields NULL; a vector/
  * centroid length mismatch yields NULL (the zip_with null-pad poisoning).
  */
case class KmeansBestExpr(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kmeans_best"

  /** The assignment kernel — public so generated code can call it. */
  def best(a: ArrayData): InternalRow = {
    val dims = cents(0).length
    if (a.numElements() != dims) return null
    var bk = -1
    var bd = 0L
    var k = 0
    while (k < cents.length) {
      val ce = cents(k)
      var d2 = 0L
      var i = 0
      while (i < dims) {
        if (a.isNullAt(i)) return null
        val diff = a.getLong(i) - ce(i)
        d2 += diff * diff
        i += 1
      }
      if (bk < 0 || d2 < bd) { bd = d2; bk = k }
      k += 1
    }
    new GenericInternalRow(Array[Any](bd, bk))
  }

  override def nullSafeEval(a: Any): Any = best(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("kmBest", this, classOf[KmeansBestExpr].getName)
      s"""
         |${ev.value} = $ref.best($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KmeansBestExpr =
    copy(child = newChild)
}
