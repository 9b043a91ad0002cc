package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** REAL media codecs with zero external dependencies:
  *
  *  - images: the JDK's own `javax.imageio` (PNG/JPEG/BMP/GIF readers ship
  *    with `java.desktop`), plus a real area-average resample for thumbnail
  *    embeddings — no AWT display needed, everything runs headless;
  *  - audio: PCM16 WAV via a direct RIFF chunk parse (the format is a
  *    44-byte header + little-endian samples; parsing it manually avoids the
  *    javax.sound SPI machinery and is deterministic across JVMs).
  *
  * Video decode is the one kernel that genuinely needs a native library
  * (ffmpeg) absent from both the JDK and this container — it remains the
  * declared stub in [[Multimodal.FakeDecoder]].
  */
object ImageCodec {

  // Executors have no display; ImageIO + BufferedImage are fully headless.
  System.setProperty("java.awt.headless", "true")

  /** Deterministic synthetic PNG: a gradient + interference pattern seeded by
    * `seed` — real, decodable image bytes for the asset fixtures. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = ((x * 255) / math.max(1, width - 1) + seed) % 256
        val g = ((y * 255) / math.max(1, height - 1) + seed * 3) % 256
        val b = (x * y + seed * 7) % 256
        img.setRGB(x, y, ((r.toInt & 0xff) << 16) | ((g.toInt & 0xff) << 8) | (b.toInt & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF). None when the
    * payload is not a decodable image. */
  def decode(payload: Array[Byte]): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Mean luminance (ITU-R BT.601 weights) in [0, 255]. */
  def brightness(img: BufferedImage): Double = {
    var sum = 0.0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        sum += luma(img.getRGB(x, y))
        x += 1
      }
      y += 1
    }
    sum / (img.getWidth.toLong * img.getHeight)
  }

  /** One fused pixel pass for the hot decode path: bulk-reads the pixel
    * array once (per-pixel `getRGB(x, y)` pays a colormodel conversion per
    * CALL, and [[brightness]] + [[grayThumb]] + a checksum loop would walk
    * the pixels three times) and computes the FNV checksum over RGB ints,
    * the mean luminance, and the (tw × th) area-average gray thumbnail in
    * a single traversal. Bit-identical to the three separate passes. */
  /** BT.601 luminance of one packed RGB int — the ONE copy of the weights
    * shared by [[brightness]], [[grayThumb]] and [[analyze]]. */
  @inline private def luma(p: Int): Double =
    0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)

  def analyze(img: BufferedImage, tw: Int, th: Int): (Long, Double, Array[Float]) = {
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var cs = 1469598103934665603L
    var sum = 0.0
    var i = 0
    while (i < px.length) {
      val p = px(i)
      cs = (cs ^ (p & 0xffffffffL)) * 1099511628211L
      sum += luma(p)
      i += 1
    }
    // thumbnail cells re-derive luminance from px directly — no O(w·h)
    // double buffer (12 MP would mean ~96 MB of avoidable allocation per
    // decode task on top of the pixel array)
    val out = new Array[Float](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th
      val y1 = math.max(y0 + 1, (ty + 1) * h / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw
        val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        var acc = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { acc += luma(px(y * w + x)); x += 1 }
          y += 1
        }
        out(ty * tw + tx) = (acc / ((y1 - y0).toLong * (x1 - x0)) / 255.0).toFloat
        tx += 1
      }
      ty += 1
    }
    (cs, sum / px.length, out)
  }

  /** Real resize: area-average resample to (tw × th), returned as a
    * row-major grayscale embedding in [0, 1] — the classic thumbnail
    * feature vector (feeds the ANN operators directly). */
  def grayThumb(img: BufferedImage, tw: Int, th: Int): Array[Float] = {
    val out = new Array[Float](tw * th)
    val w = img.getWidth
    val h = img.getHeight
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th
      val y1 = math.max(y0 + 1, (ty + 1) * h / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw
        val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            sum += luma(img.getRGB(x, y))
            x += 1
          }
          y += 1
        }
        out(ty * tw + tx) = (sum / ((y1 - y0).toLong * (x1 - x0)) / 255.0).toFloat
        tx += 1
      }
      ty += 1
    }
    out
  }
}

/** PCM16 mono/stereo WAV: 12-byte RIFF header, then chunks; samples are
  * little-endian int16 in the `data` chunk. */
object WavCodec {

  /** Deterministic synthetic WAV: a seeded sine tone — real, parseable
    * PCM16 bytes for the asset fixtures. */
  def encodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  def sineTone(sampleRate: Int, ms: Int, freqHz: Double, amp: Double = 0.5): Array[Short] = {
    val n = sampleRate * ms / 1000
    Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * freqHz * i / sampleRate) * amp * Short.MaxValue).toShort)
  }

  /** Amplitude-modulated sine: a seeded loudness envelope over the carrier,
    * giving each clip a distinctive windowed-RMS profile (a pure tone's
    * envelope is flat, which would make every clip embed identically). */
  def amTone(sampleRate: Int, ms: Int, freqHz: Double, seed: Long): Array[Short] = {
    val n = sampleRate * ms / 1000
    val envF = 3.0 + (seed % 7) // envelope cycles per clip
    val phase = (seed % 13) * 0.483
    Array.tabulate(n) { i =>
      val t = i.toDouble / math.max(1, n)
      val amp = 0.30 + 0.20 * math.sin(2 * math.Pi * envF * t + phase)
      (math.sin(2 * math.Pi * freqHz * i / sampleRate) * amp * Short.MaxValue).toShort
    }
  }

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def durationMs: Int = (samples.length.toLong * 1000 / (sampleRate.toLong * channels)).toInt
  }

  /** Real decode: walks the RIFF chunk list to `fmt ` + `data`. None when
    * the payload is not PCM16 WAV — including truncated/hostile headers
    * (never throws: one corrupt blob must yield ok=false, not a dead Spark
    * task). Odd-length chunks carry a RIFF pad byte; the walk jumps to
    * `start + 8 + len + (len & 1)` so real-world files with e.g. LIST/INFO
    * metadata chunks stay in sync. */
  def decodePcm16(payload: Array[Byte]): Option[Wav] =
    try {
      if (payload.length < 44) return None
      val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val riff = new Array[Byte](4); buf.get(riff)
      buf.getInt() // riff size
      val wave = new Array[Byte](4); buf.get(wave)
      if (new String(riff, "US-ASCII") != "RIFF" || new String(wave, "US-ASCII") != "WAVE")
        return None
      var sampleRate = 0
      var channels = 0
      var bits = 0
      var samples: Array[Short] = null
      while (buf.remaining() >= 8) {
        val id = new Array[Byte](4); buf.get(id)
        val len = buf.getInt()
        if (len < 0) return None
        val next = buf.position().toLong + len + (len & 1) // RIFF pad byte
        val name = new String(id, "US-ASCII")
        if (name == "fmt ") {
          if (len < 16 || buf.remaining() < 16) return None
          val fmt = buf.getShort(); channels = buf.getShort()
          sampleRate = buf.getInt(); buf.getInt(); buf.getShort()
          bits = buf.getShort()
          if (fmt != 1) return None // PCM only
        } else if (name == "data") {
          val n = math.min(len, buf.remaining()) / 2
          samples = Array.fill(n)(buf.getShort())
        }
        if (next >= buf.limit()) return {
          if (sampleRate > 0 && bits == 16 && samples != null)
            Some(Wav(sampleRate, math.max(1, channels), samples))
          else None
        }
        buf.position(next.toInt)
      }
      if (sampleRate > 0 && bits == 16 && samples != null)
        Some(Wav(sampleRate, math.max(1, channels), samples))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** RMS loudness in [0, 1] relative to full scale. */
  def rms(samples: Array[Short]): Double = {
    if (samples.isEmpty) return 0.0
    var acc = 0.0
    samples.foreach { s => val v = s.toDouble / Short.MaxValue; acc += v * v }
    math.sqrt(acc / samples.length)
  }

  /** Windowed RMS profile — the audio analog of the image thumbnail: `dim`
    * equal windows, RMS each, a fixed-width loudness-envelope embedding. */
  def rmsProfile(samples: Array[Short], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    var i = 0
    while (i < dim) {
      val from = i * samples.length / dim
      val to = math.max(from + 1, (i + 1) * samples.length / dim)
      var acc = 0.0
      var j = from
      while (j < to) { val v = samples(j).toDouble / Short.MaxValue; acc += v * v; j += 1 }
      out(i) = math.sqrt(acc / (to - from)).toFloat
      i += 1
    }
    out
  }
}
