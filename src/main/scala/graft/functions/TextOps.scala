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

  /** Word k-gram shingles (k=3) of a token-array column: one string per
    * consecutive token triple. Callers must guard `size >= 3` (an undersized
    * array yields an empty shingle list via the sequence guard).
    */
  def shingles3(tokensCol: String): Column =
    expr(s"""CASE WHEN size($tokensCol) >= 3 THEN
            |transform(sequence(1, size($tokensCol) - 2),
            |  i -> concat_ws(' ', element_at($tokensCol, i),
            |                 element_at($tokensCol, i + 1),
            |                 element_at($tokensCol, i + 2)))
            |ELSE array() END""".stripMargin)

  /** MinHash signature (k independent permutations approximated by seeded
    * xxhash64 re-hashing) over a distinct-shingle-hash array column.
    * `sig[i] = min_s xxhash64(hash(s), i)` — standard one-permutation-per-
    * seed MinHash; deterministic and shuffle-free (pure per-row compute).
    */
  def minhashSignature(hashesCol: String, k: Int): Column =
    expr(s"""transform(sequence(0, ${k - 1}),
            |  i -> array_min(transform($hashesCol, h -> xxhash64(h, i))))""".stripMargin)

  /** LSH band keys: hash `r` consecutive signature rows per band; two docs
    * collide on a band iff those rows all match (b bands of r rows gives the
    * standard s-curve with threshold ≈ (1/b)^(1/r)).
    */
  def bandKeys(sigCol: String, bands: Int, rows: Int): Column =
    expr(s"""transform(sequence(0, ${bands - 1}),
            |  b -> xxhash64(slice($sigCol, b * $rows + 1, $rows)))""".stripMargin)

  /** Band keys computed directly from the shingle-hash array, skipping the
    * intermediate signature column: band b = xxhash64 of its `rows` minhash
    * values. Exactly `bands*rows` array_min passes — referencing a separate
    * sig column instead would let ProjectCollapse re-inline the whole
    * signature expression once per band (a 16× blowup that took one query
    * from 2 s to 335 s at sf0.01). Callers should still materialize the
    * hash column behind a shuffle/persist barrier.
    */
  def bandKeysFromHashes(hashesCol: String, bands: Int, rows: Int): Column =
    expr(s"""transform(sequence(0, ${bands - 1}),
            |  b -> xxhash64(transform(sequence(0, ${rows - 1}),
            |    r -> array_min(transform($hashesCol, h -> xxhash64(h, b * $rows + r))))))""".stripMargin)

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
