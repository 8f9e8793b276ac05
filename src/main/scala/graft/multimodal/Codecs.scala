package graft.multimodal

import java.awt.image.BufferedImage
import java.awt.RenderingHints
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** Real media codecs over the JDK's built-in decoders — no external
  * dependency: `javax.imageio` ships PNG/JPEG/BMP/GIF codecs in every
  * Java 17 runtime, `javax.sound.sampled` parses RIFF/WAV. This replaces
  * the round-6 "deterministic fake" decode for the image and audio
  * modalities; video remains a declared stub (the JDK has no video
  * codec and the container ships none).
  *
  * Mirrors the reference's media-handling posture (payload bytes on the
  * data path, decode at the edge): `s3/_read.py` byte-range fetch +
  * user-side decode. All functions are total: corrupt bytes yield `None`
  * rather than throwing, so a bad object degrades one row, not a task.
  */
object Codecs {

  // ImageIO defaults to spooling through a disk cache per decode; at
  // cluster scale that is a hidden per-row temp-file round-trip. Memory
  // cache is correct for batch decode of bounded payloads.
  ImageIO.setUseCache(false)

  /** Decompression-bomb ceiling: a tiny PNG can DECLARE arbitrary
    * dimensions and make ImageIO allocate width*height*4 bytes before a
    * single compressed byte is inspected — OOMing the executor instead
    * of degrading one row. 64M pixels (≈256 MB ARGB) comfortably covers
    * real photography while bounding the allocation. */
  val MaxPixels: Long = 64L * 1024 * 1024

  /** Decode via an ImageReader so declared dimensions are read from the
    * header FIRST; anything over [[MaxPixels]] (or undecodable) is None
    * without touching the pixel data. */
  private def boundedRead(bytes: Array[Byte]): Option[BufferedImage] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) None
            else Option(r.read(0))
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }

  // ---------------------------------------------------------------- image

  /** Encode an ARGB pixel function into real PNG bytes (test/fixture
    * synthesis and the write side of a resize). Deterministic: PNG
    * encoding of identical pixels is identical bytes within one JDK. */
  def encodePng(width: Int, height: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream(width * height / 2 + 64)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  final case class ImageInfo(
      width: Int,
      height: Int,
      bands: Int,
      meanR: Float,
      meanG: Float,
      meanB: Float,
      luma: Array[Float]) // thumbSide×thumbSide grayscale thumbnail, row-major, [0,1]

  /** Decode image bytes (any ImageIO-supported container: PNG, JPEG,
    * BMP, GIF) into geometry + per-channel means + a small grayscale
    * thumbnail — the fixed-width feature contract of the decode stage.
    * Returns None on corrupt/undecodable bytes. */
  def decodeImage(bytes: Array[Byte], thumbSide: Int = 8): Option[ImageInfo] = {
    val img = boundedRead(bytes).orNull
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      // thumbnail accumulators: average luminance of the pixels mapping
      // into each of thumbSide×thumbSide cells
      val acc = new Array[Double](thumbSide * thumbSide)
      val cnt = new Array[Int](thumbSide * thumbSide)
      var y = 0
      while (y < h) {
        val ty = math.min(y * thumbSide / h, thumbSide - 1)
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val tx = math.min(x * thumbSide / w, thumbSide - 1)
          val cell = ty * thumbSide + tx
          acc(cell) += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
          cnt(cell) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val luma = Array.tabulate(thumbSide * thumbSide) { i =>
        if (cnt(i) == 0) 0f else (acc(i) / cnt(i)).toFloat
      }
      Some(ImageInfo(w, h, img.getRaster.getNumBands,
        sr.toFloat / n / 255f, sg.toFloat / n / 255f, sb.toFloat / n / 255f, luma))
    }
  }

  /** Real image resize: decode, scale so the longer side is ≤ maxSide
    * (never upscale), re-encode as PNG. Bilinear; geometry matches
    * `Multimodal.planResize`'s ceil arithmetic so the metadata plan and
    * the pixel work agree. None on corrupt input. */
  def resizeImage(bytes: Array[Byte], maxSide: Int): Option[Array[Byte]] = {
    val img = boundedRead(bytes).orNull
    if (img == null) None
    else {
      val scale = math.min(1.0,
        math.min(maxSide.toDouble / img.getWidth, maxSide.toDouble / img.getHeight))
      val ow = math.ceil(img.getWidth * scale).toInt.max(1)
      val oh = math.ceil(img.getHeight * scale).toInt.max(1)
      val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, ow, oh, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }

  // ---------------------------------------------------------------- audio

  /** Encode 16-bit mono PCM samples into real RIFF/WAV bytes. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  final case class AudioInfo(
      sampleRate: Int,
      channels: Int,
      nFrames: Long,
      durationSec: Double,
      rms: Float,
      peak: Float)

  /** Decode WAV bytes via javax.sound: header fields from the parsed
    * format, RMS/peak from the PCM frames. The stream is converted to
    * canonical signed 16-bit PCM first, so 8-bit (unsigned), 24-bit and
    * 32-bit payloads measure correctly instead of being misread as raw
    * shorts — the JDK's PCM-to-PCM codec does the widening/narrowing.
    * None on corrupt input. */
  def decodeWav(bytes: Array[Byte]): Option[AudioInfo] = {
    try {
      val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val srcFmt = raw.getFormat
        val nFrames = raw.getFrameLength
        val canonical = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          srcFmt.getSampleRate, 16, srcFmt.getChannels,
          srcFmt.getChannels * 2, srcFmt.getSampleRate, false)
        val in =
          if (srcFmt.matches(canonical)) raw
          else AudioSystem.getAudioInputStream(canonical, raw)
        val data = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(data)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var sumSq = 0.0; var peak = 0f; var n = 0
        while (bb.remaining() >= 2) {
          val v = bb.getShort / 32768.0f
          sumSq += v * v; if (math.abs(v) > peak) peak = math.abs(v); n += 1
        }
        Some(AudioInfo(srcFmt.getSampleRate.toInt, srcFmt.getChannels, nFrames,
          if (srcFmt.getSampleRate > 0) nFrames / srcFmt.getSampleRate.toDouble
          else 0.0,
          if (n == 0) 0f else math.sqrt(sumSq / n).toFloat, peak))
      } finally raw.close()
    } catch { case _: Exception => None }
  }
}
