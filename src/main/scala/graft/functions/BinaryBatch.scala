package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Batched binary-decode seam — the Scala analogue of a `mapInPandas`
  * vectorized decode UDF (SURVEY.md §2B multimodal): rows flow through
  * `mapPartitions` in fixed-size batches, the decoder sees a whole batch at
  * once (the shape a real codec/model wants for amortized setup), and the
  * output is a typed Dataset that rejoins the columnar plan.
  *
  * The decoder in this container is a STUB — no image/audio codecs exist
  * here — but the plumbing (schema, partition preservation, batch shape) is
  * real and unit-tested; a production decoder replaces [[stubDecode]] only.
  */
object BinaryBatch {

  /** One media item in. */
  case class MediaIn(doc_id: Long, content: Array[Byte])

  /** Decoded metadata out (deterministic fake values from the bytes).
    * `resized_sig` stands in for a resize/thumbnail op: a real pipeline
    * would emit the downsampled payload; the stub emits a hash of the
    * 4x-downsampled bytes so the dataflow (and its determinism) is
    * identical in shape.
    */
  case class MediaMeta(doc_id: Long, fake_width: Int, fake_height: Int,
      fake_duration_ms: Long, resized_sig: Long, decoder_batch_size: Int)

  val BatchSize = 64

  /** STUB DECODE of one batch: a real implementation would hand
    * `batch.map(_.content)` to a codec in one call. The fakes are
    * deterministic functions of the payload so tests and reruns agree.
    */
  def stubDecode(batch: Seq[MediaIn]): Seq[MediaMeta] =
    batch.map { m =>
      val b0 = if (m.content.nonEmpty) m.content(0) & 0xff else 0
      val b1 = if (m.content.length > 1) m.content(1) & 0xff else 0
      // stub "resize": keep every 4th byte, fold into a 64-bit signature
      var sig = 1125899906842597L
      var i = 0
      while (i < m.content.length) { sig = sig * 31 + m.content(i); i += 4 }
      MediaMeta(m.doc_id, 16 + b0 % 64, 16 + b1 % 64,
        m.content.length.toLong * 10, sig, batch.size)
    }

  /** Run the batched decode over a (doc_id, content) frame. */
  def decode(spark: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id"), col("content")).as[MediaIn]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => stubDecode(g.toSeq)))
  }
}
