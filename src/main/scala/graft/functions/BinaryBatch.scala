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

  /** Decoded audio metadata: all fields come from the REAL wav codec
    * (javax.sound.sampled), not from file names or formulas.
    */
  case class AudioMeta(audio_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, duration_ms: Long)

  /** Decode one batch of WAV payloads through the JDK's audio codec.
    * Undecodable payloads degrade to a -1 stub row (mirroring the image
    * path's fallback) instead of failing the task — one corrupt byte
    * array must not kill a whole-corpus decode job.
    */
  def decodeAudioBatch(batch: Seq[(Long, Array[Byte])]): Seq[AudioMeta] =
    batch.map { case (id, bytes) =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          AudioMeta(id, fmt.getSampleRate.toInt, fmt.getChannels, frames,
            frames * 1000L / fmt.getSampleRate.toLong)
        } finally ais.close()
      } catch {
        case scala.util.control.NonFatal(_) => AudioMeta(id, -1, -1, -1L, -1L)
      }
    }

  /** Batched audio decode over an (audio_id, content) frame. */
  def decodeAudio(spark: SparkSession, df: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    df.as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => decodeAudioBatch(g.toSeq)))
  }

  /** Write deterministic 16-bit mono PCM WAV fixtures `audio_<id>.wav`
    * (8 kHz, 800 + 40·id frames of a (440 + 10·id) Hz sine).
    */
  def writeAudioFixtures(dir: java.nio.file.Path, n: Int = 24): Unit = {
    java.nio.file.Files.createDirectories(dir)
    val rate = 8000
    (0 until n).foreach { id =>
      val frames = 800 + 40 * id
      val freq = 440.0 + 10 * id
      val pcm = new Array[Byte](frames * 2)
      var i = 0
      while (i < frames) {
        val v = (StrictMath.sin(2 * StrictMath.PI * freq * i / rate) * 12000).toInt
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, frames.toLong)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE,
        dir.resolve(f"audio_$id%03d.wav").toFile)
    }
  }

  /** One 64-bit dHash as four 16-bit band values (kept apart — 16-bit
    * bands sidestep the sign-bit-literal problem a single BIGINT mask
    * carries into SQL engines, and they ARE the LSH banding keys). */
  case class DHashSig(img_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Decode one batch of image payloads into 8×8 difference-hash band
    * signatures: REAL codec decode (ImageIO), 9×8 nearest-neighbor
    * grayscale grid from the decoded pixels (integer luminance
    * (299r+587g+114b)/1000), bit (gy·8+gx) = grid[gy][gx+1] > grid[gy][gx]
    * — the standard dHash, brightness-shift-invariant by construction.
    */
  def dhashBatch(batch: Seq[(Long, Array[Byte])]): Seq[DHashSig] =
    batch.map { case (id, bytes) =>
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      // fail loudly, not with a zero signature: an undecodable payload
      // hashing to 0 would silently near-collide with every other failure
      require(img != null, s"image $id failed to decode — dHash undefined")
      val g = Array.ofDim[Int](8, 9)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 9) {
          val p = img.getRGB(gx * img.getWidth / 9, gy * img.getHeight / 8)
          g(gy)(gx) = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
            114 * (p & 0xff)) / 1000
          gx += 1
        }
        gy += 1
      }
      val bands = new Array[Long](4)
      gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          val j = gy * 8 + gx
          if (g(gy)(gx + 1) > g(gy)(gx)) bands(j / 16) |= 1L << (j % 16)
          gx += 1
        }
        gy += 1
      }
      DHashSig(id, bands(0), bands(1), bands(2), bands(3))
    }

  /** Batched dHash decode over an (img_id, content) frame. */
  def dhash(spark: SparkSession, df: DataFrame): Dataset[DHashSig] = {
    import spark.implicits._
    df.as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => dhashBatch(g.toSeq)))
  }

  /** The pHash fixture's pixel formula — shared by the PNG generator and
    * the DuckDB oracle (which recomputes the sampled grid from this
    * formula while the engine decodes the PNG bytes; equality proves the
    * decode really recovered the drawn pixels). Image ids 30–39 are
    * uniform +16-brightness copies of families 0–9 (dHash-invariant —
    * Hamming 0 planted dups); ids 40–44 copy families 0–4 with the ONE
    * sampled pixel (10, 6) forced to white (≤ 2 dHash bits flip — planted
    * near-dups); everything else is a distinct family. Channels stay
    * ≤ 215 so the brightness shift never clamps.
    */
  def phashPixel(id: Int, x: Int, y: Int): (Int, Int, Int) = {
    val f =
      if (id >= 30 && id < 40) id - 30
      else if (id >= 40 && id < 45) id - 40
      else id
    val br = if (id >= 30 && id < 40) 16 else 0
    if (id >= 40 && id < 45 && x == 10 && y == 6) (255, 255, 255)
    else ((f * 37 + x * 11) % 200 + br, (f * 53 + y * 13) % 200 + br,
      (f * 29 + x * y) % 200 + br)
  }

  /** Write the deterministic 24×16 PNG pHash fixtures `ph_<id>.png` from
    * [[phashPixel]]. */
  def writePhashFixtures(dir: java.nio.file.Path, n: Int = 48): Unit = {
    java.nio.file.Files.createDirectories(dir)
    (0 until n).foreach { id =>
      val img = new BufferedImage(24, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 24) {
        val (r, g, b) = phashPixel(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      ImageIO.write(img, "png", dir.resolve(f"ph_$id%03d.png").toFile)
    }
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

  // ------------------------------------------------- audio fingerprinting

  /** Audio-fingerprint fixture scheme — ONE copy shared by the WAV writer
    * and the DuckDB oracle builder: (id, freq, amp, kind). Bases 0–23;
    * ids 10x+k are byte-exact duplicates of base k; ids 20x+k are
    * amplitude-attenuated NEAR-duplicates (same waveform shape, ~8%
    * quieter — loudness normalization); id 313 is base 13 with a small
    * deterministic dither (kind 1, lands at Hamming 1) and id 416 is
    * base 16 saturation-clipped at ±9000 (kind 2, Hamming 1) — the
    * re-encode artifacts that exercise the verify stage's tolerance
    * beyond exact signature equality. The waveform is an integer
    * sawtooth so writer, codec round-trip, and oracle replay are all
    * exact integer arithmetic — no float trig anywhere. */
  def audioFpParams: Seq[(Int, Int, Int, Int)] =
    (0 until 24).map(id => (id, 40 + 7 * id, 12000, 0)) ++
      Seq(101, 104, 109).map(id => (id, 40 + 7 * (id % 100), 12000, 0)) ++
      Seq(202, 206).map(id => (id, 40 + 7 * (id % 100), 11000, 0)) ++
      Seq((313, 40 + 7 * 13, 12000, 1), (416, 40 + 7 * 16, 12000, 2))

  val AudioFpRate = 8000
  val AudioFpWindowLen = 48
  /** 33 windows → 32 energy-difference bits → four 8-bit LSH bands. */
  val AudioFpFrames: Int = 33 * AudioFpWindowLen

  /** The integer sample at frame i: an exact sawtooth
    * (`((i*f) % rate) * 2 * amp // rate - amp`, all operands
    * non-negative before the subtract), plus the kind-selected
    * perturbation — dither `(i mod 5 − 2)·40` (kind 1) or saturation
    * clip at ±9000 (kind 2). Exact in both Scala and DuckDB. */
  def audioFpSample(i: Int, f: Int, amp: Int, kind: Int): Int = {
    val v = ((i * f) % AudioFpRate) * 2 * amp / AudioFpRate - amp
    kind match {
      case 1 => v + (i % 5 - 2) * 40
      case 2 => math.max(-9000, math.min(9000, v))
      case _ => v
    }
  }

  /** Write the fingerprint-dedup WAV corpus `afp_<id>.wav` (16-bit mono
    * PCM little-endian at [[AudioFpRate]], [[AudioFpFrames]] frames). */
  def writeAudioFpFixtures(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    audioFpParams.foreach { case (id, f, amp, kind) =>
      val pcm = new Array[Byte](AudioFpFrames * 2)
      var i = 0
      while (i < AudioFpFrames) {
        val v = audioFpSample(i, f, amp, kind)
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(AudioFpRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, AudioFpFrames.toLong)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE,
        dir.resolve(f"afp_$id%03d.wav").toFile)
    }
  }

  /** One 32-bit audio fingerprint as four 8-bit band values (the LSH
    * banding keys, mirroring [[DHashSig]]'s layout). */
  case class AudioFpSig(audio_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Fingerprint one batch of WAV payloads: REAL codec decode
    * (javax.sound.sampled), 33 fixed windows of per-window absolute
    * energy, bit j = E(j+1) > E(j) — the chromaprint family's
    * energy-difference shape, loudness-shift tolerant because only the
    * SIGN of adjacent-window change survives into the bits. */
  def audioFpBatch(batch: Seq[(Long, Array[Byte])]): Seq[AudioFpSig] =
    batch.map { case (id, bytes) =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"audio $id is not 16-bit mono LE PCM")
        val data = ais.readAllBytes()
        val nw = data.length / 2 / AudioFpWindowLen
        require(nw >= 33, s"audio $id too short for a 33-window fingerprint")
        val e = new Array[Long](33)
        var i = 0
        while (i < 33 * AudioFpWindowLen) {
          val v = (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
          e(i / AudioFpWindowLen) += math.abs(v)
          i += 1
        }
        val bands = new Array[Long](4)
        var j = 0
        while (j < 32) {
          if (e(j + 1) > e(j)) bands(j / 8) |= 1L << (j % 8)
          j += 1
        }
        AudioFpSig(id, bands(0), bands(1), bands(2), bands(3))
      } finally ais.close()
    }

  /** Batched fingerprint over an (audio_id, content) frame. */
  def audioFp(spark: SparkSession, df: DataFrame): Dataset[AudioFpSig] = {
    import spark.implicits._
    df.as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => audioFpBatch(g.toSeq)))
  }

  // --------------------------------------------- audio segment fixture

  /** Audio-segment fixture geometry: [[AudioSegClips]] clips of
    * [[AudioSegWindows]] windows × [[AudioSegWinLen]] samples (16-bit
    * mono PCM LE at [[AudioFpRate]]). Window w of clip c is ACTIVE
    * (speech/tone) iff (c·3 + w) mod 7 < 4 — runs of up to 4 active and
    * 3 silent windows; silent windows are digital zero. Mirrored
    * literally by the DuckDB oracle. */
  val AudioSegClips = 8
  val AudioSegWindows = 24
  val AudioSegWinLen = 256

  /** Active-window rule shared by the WAV writer, the spec, and the
    * oracle. */
  def audioSegActive(c: Int, w: Int): Boolean = (c * 3 + w) % 7 < 4

  /** Sample i (clip-global) of clip c: the [[audioFpSample]] integer
    * sawtooth at period 40 + 7c inside active windows, exact zero in
    * silent ones. */
  def audioSegSample(c: Int, i: Int): Int =
    if (audioSegActive(c, i / AudioSegWinLen))
      audioFpSample(i, 40 + 7 * c, 12000, 0)
    else 0

  /** Write the segment-detection WAV corpus `seg_<id>.wav`. */
  def writeAudioSegFixtures(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    val frames = AudioSegWindows * AudioSegWinLen
    (0 until AudioSegClips).foreach { c =>
      val pcm = new Array[Byte](frames * 2)
      var i = 0
      while (i < frames) {
        val v = audioSegSample(c, i)
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        AudioFpRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, frames.toLong)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE,
        dir.resolve(f"seg_$c%03d.wav").toFile)
    }
  }

  /** One decoded window's absolute-energy feature. */
  case class WinEnergy(audio_id: Long, win: Long, energy: Long)

  /** Decode one batch of WAV payloads to per-window absolute energies:
    * REAL codec decode, [[AudioSegWinLen]]-sample windows, exact integer
    * |sample| sums. */
  def audioSegBatch(batch: Seq[(Long, Array[Byte])]): Seq[WinEnergy] =
    batch.flatMap { case (id, bytes) =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"audio $id is not 16-bit mono LE PCM")
        val data = ais.readAllBytes()
        val nw = data.length / 2 / AudioSegWinLen
        (0 until nw).map { w =>
          var e = 0L
          var i = w * AudioSegWinLen
          val end = i + AudioSegWinLen
          while (i < end) {
            val v = (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
            e += math.abs(v)
            i += 1
          }
          WinEnergy(id, w.toLong, e)
        }
      } finally ais.close()
    }

  /** Batched window-energy decode over an (audio_id, content) frame. */
  def audioSeg(spark: SparkSession, df: DataFrame): Dataset[WinEnergy] = {
    import spark.implicits._
    df.as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => audioSegBatch(g.toSeq)))
  }

  // ------------------------------------------------- video scene fixture

  /** Video-scene fixture geometry: [[VideoSceneVideos]] clips of
    * [[VideoSceneFrames]] 16×12 PNG frames each (the frame-extracted
    * layout video lands in after sampling). A CUT occurs at frame f ≥ 1
    * iff (v·5 + f) mod 9 = 0; [[videoSceneOf]] counts cuts ≤ f. All
    * constants are mirrored literally by the DuckDB oracle. */
  val VideoSceneVideos = 6
  val VideoSceneFrames = 24

  /** Scene index of frame f in video v: the number of cuts at or before f. */
  def videoSceneOf(v: Int, f: Int): Int =
    (1 to f).count(ff => (v * 5 + ff) % 9 == 0)

  /** The video fixture's pixel formula — shared by the PNG generator and
    * the DuckDB oracle (the [[phashPixel]] doctrine): the color base is a
    * function of (video, SCENE) with a ±2-level within-scene flicker on
    * the red channel keyed by f mod 3, so consecutive same-scene frames
    * differ by ≤ 1 luminance level per pixel while a cut re-rolls the
    * whole base. */
  def videoScenePixel(v: Int, f: Int, s: Int, x: Int, y: Int): (Int, Int, Int) =
    ((v * 37 + s * 151 + x * 11) % 200 + f % 3,
      (v * 53 + s * 103 + y * 13) % 200,
      (v * 29 + s * 57 + x * y) % 200)

  /** Write the deterministic frame fixtures `vid_<v>_f_<f>.png`. */
  def writeVideoFixtures(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    for (v <- 0 until VideoSceneVideos; f <- 0 until VideoSceneFrames) {
      val s = videoSceneOf(v, f)
      val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16) {
        val (r, g, b) = videoScenePixel(v, f, s, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      ImageIO.write(img, "png",
        dir.resolve(f"vid_${v}%02d_f_${f}%03d.png").toFile)
    }
  }

  /** One decoded frame's luminance feature. */
  case class FrameLum(video_id: Long, frame_no: Long, lum: Long)

  /** Decode one batch of frames to the 8×6-grid luminance sum: REAL
    * ImageIO decode, sample x = gx·w/8, y = gy·h/6 (= 2gx, 2gy on the
    * 16×12 fixture — the constant the oracle mirrors), integer luminance
    * (299r + 587g + 114b)/1000 summed over the grid. */
  def frameLumBatch(batch: Seq[(Long, Long, Array[Byte])]): Seq[FrameLum] =
    batch.map { case (v, f, bytes) =>
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, s"frame ($v, $f) failed to decode — feature undefined")
      var lum = 0L
      var gy = 0
      while (gy < 6) {
        var gx = 0
        while (gx < 8) {
          val p = img.getRGB(gx * img.getWidth / 8, gy * img.getHeight / 6)
          lum += (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
            114 * (p & 0xff)) / 1000
          gx += 1
        }
        gy += 1
      }
      FrameLum(v, f, lum)
    }

  /** Batched frame-luminance decode over a (video_id, frame_no, content)
    * frame. */
  def frameLum(spark: SparkSession, df: DataFrame): Dataset[FrameLum] = {
    import spark.implicits._
    df.as[(Long, Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => frameLumBatch(g.toSeq)))
  }
}
