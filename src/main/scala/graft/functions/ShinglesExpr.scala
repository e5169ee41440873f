package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native per-document shingle kernel: token array in, DISTINCT 3-gram
  * shingle hashes out (xxhash64 of each token, xxhash64-combined over each
  * consecutive triple, deduplicated in-row).
  *
  * This replaces the `lead()`-window + global `distinct()` formulation of
  * the shingle table, which cost TWO full shuffles of the exploded token
  * rows (sort by (doc_id, pos), then distinct). Here the whole computation
  * is a scan-side projection — the dedup family's shared artifact now
  * materializes with zero shuffles. The expression is eval-mode
  * (CodegenFallback): one virtual call per DOCUMENT against hundreds of
  * hash operations inside, a negligible dispatch cost that buys the removal
  * of two wide exchanges — the opposite trade of a per-element lambda.
  * Docs with fewer than 3 tokens produce an empty array (they cannot be
  * 3-gram near-dups), and `explode` then drops them, as before.
  */
case class ShinglesExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 3) new GenericArrayData(Array.empty[Long])
    else {
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        // null tokens hash to the seed, mirroring xxhash64's null-skip
        // (split() never produces them; registered-SQL callers might)
        hs(i) = if (arr.isNullAt(i)) 42L
        else {
          val t = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        }
        i += 1
      }
      val seen = new java.util.HashSet[java.lang.Long](n * 2)
      val out = new Array[Long](n - 2)
      var m = 0
      i = 0
      while (i + 2 < n) {
        val s = XXH64.hashLong(hs(i + 2),
          XXH64.hashLong(hs(i + 1), XXH64.hashLong(hs(i), 42L)))
        if (seen.add(s)) { out(m) = s; m += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, m))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}
