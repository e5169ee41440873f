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

  /** Banding keys for Hamming-distance-≤3 candidate generation over a
    * 64-bit simhash: the hash splits into 5 blocks (13+13+13+13+12 bits)
    * and the 10 bands are all pairs of blocks packed into one 26-bit value.
    * Pigeonhole: ≤3 differing bits touch ≤3 blocks, so ≥2 blocks are
    * identical and their pair-band collides — candidate generation stays
    * exact for Hamming ≤ 3 (Manku et al., WWW'07 block-permutation scheme).
    *
    * Why pairs instead of single blocks: a single-block key has at most
    * 2^16 distinct values, so at corpus scale every band bucket holds
    * ~n/65k docs and the within-bucket self-join is quadratic (the skew
    * the r3 verdict flagged). A 26-bit pair key gives 2^26 ≈ 67M distinct
    * values — bucket sizes shrink 1000×, at the cost of exploding 10 band
    * rows per doc instead of 4 (each row is ~24 bytes; docs/SCALING.md
    * "SimHash banding keyspace").
    */
  def simhashBands(simhashCol: String): Column = {
    val offs = Seq((0, 8191L), (13, 8191L), (26, 8191L), (39, 8191L), (52, 4095L))
    def block(i: Int) = s"(shiftright($simhashCol, ${offs(i)._1}) & ${offs(i)._2})"
    val bands = for (i <- 0 until 5; j <- i + 1 until 5)
      yield s"(shiftleft(${block(i)}, 13) | ${block(j)})"
    expr(bands.mkString("array(", ",", ")"))
  }

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
