package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** REAL video decode with zero external dependencies: MJPEG-in-AVI.
  *
  * AVI is a RIFF container (the same chunk grammar as WAV — 4-byte id,
  * LE u32 length, even-padded payload); MJPEG stores every frame as an
  * independent baseline JPEG in a `..dc`/`..db` chunk inside the `movi`
  * LIST, and the JDK's own ImageIO decodes baseline JPEG. So one container
  * walk plus `javax.imageio` gives genuine frame decode for the one video
  * codec that needs no native library. Codecs that DO need one (H.264/VP9
  * in MP4/WebM — ffmpeg territory) remain the declared stub in
  * [[Multimodal.FakeDecoder]].
  *
  * Layouts from the public AVI RIFF spec (msdn AVIMAINHEADER /
  * AVISTREAMHEADER / BITMAPINFOHEADER).
  */
object AviCodec {

  final case class Avi(usPerFrame: Int, width: Int, height: Int,
      frames: Vector[Array[Byte]]) {
    def durationMs: Int = (frames.length.toLong * usPerFrame / 1000L).toInt
    /** Real per-frame decode (baseline JPEG via ImageIO). */
    def decodeFrame(i: Int): Option[BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(frames(i))))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---- encoder (fixture duty: real, decodable MJPEG-AVI bytes) ----

  /** Deterministic synthetic MJPEG-AVI: `nFrames` seeded gradient frames
    * (the image fixture pattern, phase-shifted per frame so frames differ)
    * JPEG-encoded into a spec-shaped AVI container. */
  def encodeMjpegAvi(width: Int, height: Int, nFrames: Int, fps: Int,
      seed: Long): Array[Byte] = {
    val jpegs = (0 until nFrames).map { f =>
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val r = ((x * 255) / math.max(1, width - 1) + seed + f * 11) % 256
          val g = ((y * 255) / math.max(1, height - 1) + seed * 3 + f * 29) % 256
          val b = (x * y + seed * 7 + f * 53) % 256
          img.setRGB(x, y,
            ((r.toInt & 0xff) << 16) | ((g.toInt & 0xff) << 8) | (b.toInt & 0xff))
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    buildAvi(width, height, fps, jpegs)
  }

  /** Spec-shaped container assembly around pre-encoded JPEG frames. */
  def buildAvi(width: Int, height: Int, fps: Int,
      jpegs: Seq[Array[Byte]]): Array[Byte] = {
    require(jpegs.nonEmpty, "an AVI needs at least one frame")
    require(fps > 0, s"fps out of range: $fps")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val b = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val usPerFrame = 1000000 / fps
    val maxFrame = jpegs.map(_.length).max
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(usPerFrame).putInt(maxFrame * fps).putInt(0).putInt(0)
      .putInt(jpegs.length).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps) // dwScale=1, dwRate=fps
      .putInt(0).putInt(jpegs.length).putInt(maxFrame).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
      .array()
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .put("MJPG".getBytes("US-ASCII")).putInt(maxFrame)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  // ---- decoder ----

  /** Real decode: walks the RIFF chunk tree to `avih` (dimensions, frame
    * period) and the `movi` LIST's `..dc`/`..db` frame chunks. None when the
    * payload is not MJPEG-AVI — including truncated/hostile bytes (one
    * corrupt blob must yield ok=false, not a dead Spark task). Chunk walks
    * honor the RIFF even-padding rule, so containers with extra LISTs
    * (INFO, idx1) stay in sync. */
  def decode(payload: Array[Byte]): Option[Avi] =
    try {
      if (payload.length < 24) return None
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (fourcc() != "RIFF") return None
      val riffLen = buf.getInt()
      if (riffLen < 4) return None
      if (fourcc() != "AVI ") return None
      var usPerFrame = 0
      var width = 0
      var height = 0
      val frames = Vector.newBuilder[Array[Byte]]
      def finish(): Option[Avi] = {
        val fs = frames.result()
        if (fs.nonEmpty && width > 0 && height > 0)
          Some(Avi(math.max(1, usPerFrame), width, height, fs))
        else None
      }
      // iterative chunk walk with an explicit end-stack (LIST bodies nest)
      var ends = List(math.min(buf.limit().toLong, 8L + riffLen))
      while (buf.remaining() >= 8 && ends.nonEmpty) {
        while (ends.nonEmpty && buf.position() >= ends.head) ends = ends.tail
        if (ends.nonEmpty && buf.remaining() >= 8) {
          val id = fourcc()
          val len = buf.getInt()
          if (len < 0 || buf.position() + len > buf.limit()) return finish()
          val next = buf.position().toLong + len + (len & 1)
          id match {
            case "LIST" if len >= 4 =>
              fourcc() // hdrl/strl/movi/...: descend — frames sit inside movi
              ends = math.min(next, buf.limit().toLong) :: ends
            case "avih" if len >= 40 =>
              usPerFrame = buf.getInt()
              buf.position(buf.position() + 28)
              width = buf.getInt(); height = buf.getInt()
              buf.position(math.min(next, buf.limit().toLong).toInt)
            case _ =>
              if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) && len > 0) {
                val body = new Array[Byte](len)
                buf.get(body)
                frames += body
              }
              buf.position(math.min(next, buf.limit().toLong).toInt)
          }
        }
      }
      finish()
    } catch { case scala.util.control.NonFatal(_) => None }
}
