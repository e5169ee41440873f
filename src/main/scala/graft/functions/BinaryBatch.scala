package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Batched binary-decode seam — the Scala analogue of a `mapInPandas`
  * vectorized decode UDF (SURVEY.md §2B multimodal): rows flow through
  * `mapPartitions` in fixed-size batches, the decoder sees a whole batch at
  * once (the shape a real codec/model wants for amortized setup), and the
  * output is a typed Dataset that rejoins the columnar plan.
  *
  * The image path is REAL: payloads are decoded with the JDK's ImageIO
  * (PNG/JPEG/GIF/BMP), dimensions come from the codec, and the "resize"
  * stage is a 2× nearest-neighbor downsample whose pixel signature is
  * deterministic integer arithmetic (no interpolation, no float). Payloads
  * no installed codec accepts (audio/video in this container) fall back to
  * a byte-level signature with width/height = -1 — the fallback is the
  * remaining stub seam where an external codec would plug in.
  */
object BinaryBatch {

  /** One media item in. */
  case class MediaIn(doc_id: Long, content: Array[Byte])

  /** Decoded metadata out. `resized_sig` is the 64-bit rolling signature of
    * the 2× nearest-neighbor downsample's ARGB stream (a real pipeline
    * would emit the downsampled payload itself; the signature keeps the
    * dataflow identical in shape while staying comparable across runs).
    */
  case class MediaMeta(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, resized_sig: Long, decoder_batch_size: Int)

  val BatchSize = 64

  // executors must not spill ImageIO scratch files to a disk cache
  ImageIO.setUseCache(false)

  private def byteSig(content: Array[Byte]): Long = {
    var sig = 1125899906842597L
    var i = 0
    while (i < content.length) { sig = sig * 31 + content(i); i += 4 }
    sig
  }

  /** Decode one batch: a real codec call per payload, one batch at a time. */
  def decodeBatch(batch: Seq[MediaIn]): Seq[MediaMeta] =
    batch.map { m =>
      val img =
        try ImageIO.read(new ByteArrayInputStream(m.content))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img != null) {
        val w = img.getWidth
        val h = img.getHeight
        // 2x nearest-neighbor downsample, folded into a rolling signature
        var sig = 1125899906842597L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sig = sig * 31 + img.getRGB(x, y); x += 2 }
          y += 2
        }
        MediaMeta(m.doc_id, w, h, w.toLong * h, sig, batch.size)
      } else {
        // non-image payload: no codec in this container — byte-level stub
        MediaMeta(m.doc_id, -1, -1, -1L, byteSig(m.content), batch.size)
      }
    }

  /** Run the batched decode over a (doc_id, content) frame. */
  def decode(spark: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id"), col("content")).as[MediaIn]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Write deterministic PNG fixtures `img_<id>.png` (dimensions and pixels
    * are pure functions of the id) plus one non-image decoy that the
    * suffix filter must skip — the landed state a media ingest produces.
    */
  def writeMediaFixtures(dir: java.nio.file.Path, n: Int = 48): Unit = {
    java.nio.file.Files.createDirectories(dir)
    (0 until n).foreach { id =>
      val w = 8 + id % 16
      val h = 8 + (id * 7) % 16
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y,
          (((id * 31 + x) & 0xff) << 16) | (((y * 17) & 0xff) << 8) | (((x ^ y) + id) & 0xff))
      ImageIO.write(img, "png", dir.resolve(f"img_$id%03d.png").toFile)
    }
    java.nio.file.Files.write(dir.resolve("notes.txt"), "not an image".getBytes("UTF-8"))
  }
}
