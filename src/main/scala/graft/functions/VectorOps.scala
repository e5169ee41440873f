package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels over `array<float>` embedding columns (SURVEY.md §2B
  * north star: similarity search / embedding near-dup).
  *
  * Everything is built on codegen'd higher-order functions; accumulation is
  * a sequential left fold in BOTH Spark (`aggregate`) and the DuckDB oracle
  * (`list_reduce`), so dot products and norms are bit-identical across
  * engines without rounding. Floats are widened to double before any
  * arithmetic.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ as a double left fold — the native codegen'd [[DotExpr]]
    * (callers must have run [[GraftFunctions.register]] on the session).
    * Bit-identical to the HOF `aggregate(zip_with(...))` formulation, ~10×
    * cheaper: the HOF lambda evaluates interpreted per element.
    */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** ‖a‖₂ (exact: sqrt of a left-fold sum of squares). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity dot/(‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane sign for (plane p, dimension j):
    * ±1 from the low bit of xxhash64(p*dims + j). Used for sign-random-
    * projection (SimHash-for-vectors) LSH bucketing: P[bit match] =
    * 1 - θ/π for angle θ, so near vectors collide with high probability.
    */
  private def planeSignsSql(p: String, dims: Int): String =
    s"transform(sequence(0, ${dims - 1}), j -> IF((xxhash64($p * $dims + j) & 1) = 1, 1.0D, -1.0D))"

  /** `nBits`-bit random-hyperplane bucket id of an embedding column.
    * `table` salts the planes so multiple independent hash tables can be
    * unioned. Native [[SignProjectExpr]] (precomputed sign constants,
    * codegen'd loop); [[lshBucketHof]] is the bit-equal HOF formulation it
    * replaced, kept as the parity reference for FunctionsSpec.
    */
  def lshBucket(embCol: String, nBits: Int, dims: Int, table: Int): Column =
    call_function("graft_lsh_bucket", col(embCol), lit(nBits), lit(dims), lit(table))

  /** PORTABLE random-hyperplane bucket: plane signs are an md5-derived
    * Rademacher matrix (sign(t, p, j) = +1 iff the first hex digit of
    * md5("graftlsh:t:p:j") is in 0..7 — the `embedProject` construction),
    * compiled into `nBits` literal-plane [[DotExpr]] kernels; bit p of the
    * bucket is dot(v, plane_p) ≥ 0. Everything — md5, the sign decision,
    * the ascending dot fold — exists identically in DuckDB, so an oracle
    * can rebuild every bucket from raw vectors (which xxhash64-plane
    * [[lshBucket]] buckets cannot). Callers must have run
    * [[GraftFunctions.register]].
    */
  def lshBucketPortable(embCol: String, nBits: Int, dims: Int, table: Int): Column = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(p: Int, j: Int): Float = {
      val hex = md.digest(s"graftlsh:$table:$p:$j".getBytes("UTF-8"))
      if (((hex(0) >> 4) & 0xf) < 8) 1.0f else -1.0f
    }
    (0 until nBits).map { p =>
      val plane = typedlit((0 until dims).map(j => sign(p, j)))
      when(dot(col(embCol), plane) >= 0d, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** The interpreted HOF formulation of [[lshBucket]] (parity oracle). */
  def lshBucketHof(embCol: String, nBits: Int, dims: Int, table: Int): Column =
    expr(s"""aggregate(
            |  transform(sequence(0, ${nBits - 1}),
            |    p -> CASE WHEN aggregate(
            |           zip_with($embCol, ${planeSignsSql(s"(p + ${table * 1000})", dims)},
            |                    (x, s) -> CAST(x AS DOUBLE) * s),
            |           0D, (acc, v) -> acc + v) >= 0
            |         THEN shiftleft(1L, p) ELSE 0L END),
            |  0L, (acc, b) -> acc + b)""".stripMargin)

  /** DuckDB SQL for the same left-fold dot product (bit-identical). */
  def sqlDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      "(acc, v) -> acc + v)"

  def sqlCosine(a: String, b: String): String =
    s"${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}))"
}
