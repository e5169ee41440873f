package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for the LLM-data text operators (SURVEY.md §2B north
  * star: dedup / text analysis). All of these compose built-in higher-order
  * functions through `expr(...)` (several need column-valued array indices /
  * shift amounts, which the typed DSL only accepts as literals), so every
  * kernel stays codegen-friendly and fully distributed — no UDFs, no
  * collects.
  *
  * Functions take *column names* (not Columns) because the expressions index
  * into the named arrays inside lambda scopes.
  */
object TextOps {

  /** Whitespace tokens of a text column. */
  def tokens(textCol: String): Column = split(col(textCol), " ")

  // NOTE: shingling and MinHash signatures deliberately do NOT live here as
  // array-lambda Column builders. Higher-order-function lambdas evaluate
  // interpreted in Spark, and per-row signature loops are 1-2 orders of
  // magnitude slower than the codegen'd explode + hash-aggregate formulation
  // used in graft.operators.LlmData (posexplode + lead() windows for
  // shingles, min(xxhash64(sh, seed)) aggregates for signatures).

  /** 64-bit SimHash of a (multiset) token-hash array column: per bit, sum
    * +1/-1 over tokens by that bit of the token hash, then take signs.
    */
  def simhash64(hashesCol: String): Column =
    expr(s"""aggregate(
            |  transform(sequence(0, 63),
            |    i -> CASE WHEN aggregate($hashesCol, 0L,
            |           (acc, h) -> acc + IF((shiftright(h, i) & 1) = 1, 1L, -1L)) >= 0
            |         THEN shiftleft(1L, i) ELSE 0L END),
            |  0L, (acc, b) -> acc + b)""".stripMargin)

  /** 16-bit chunk `j` (0..3) of a 64-bit simhash column — the banding key
    * for Hamming-distance candidate generation: two hashes within Hamming
    * distance 3 of each other must agree on at least one of 4 chunks.
    */
  def simhashChunks(simhashCol: String): Column =
    expr(s"transform(sequence(0, 3), j -> shiftright($simhashCol, j * 16) & 65535)")

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03 style): hash every
    * token, take the minimum hash of each sliding window of `w` hashes, and
    * keep the distinct minima, sorted. Robust to small edits.
    */
  def winnowFingerprints(hashesCol: String, w: Int): Column =
    expr(s"""CASE WHEN size($hashesCol) >= $w THEN
            |array_sort(array_distinct(transform(sequence(1, size($hashesCol) - ${w - 1}),
            |  i -> array_min(slice($hashesCol, i, $w)))))
            |ELSE array_sort(array_distinct($hashesCol)) END""".stripMargin)
}
