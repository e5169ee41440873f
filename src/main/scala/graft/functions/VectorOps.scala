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

  /** Σ aᵢ·bᵢ as a double left fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

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

  /** `nBits`-bit random-hyperplane bucket id of an embedding column (column
    * name, because the expression indexes it inside lambdas). `table` salts
    * the planes so multiple independent hash tables can be unioned.
    */
  def lshBucket(embCol: String, nBits: Int, dims: Int, table: Int): Column =
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
