package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("asset table has the typed schema and deterministic payloads") {
    val a = Multimodal.syntheticAssets(spark, 30)
    assert(a.schema.fieldNames.toSeq ===
      Seq("asset_id", "kind", "media_type", "payload", "width", "height", "duration_ms"))
    val twice = Multimodal.syntheticAssets(spark, 30)
    val cs1 = Multimodal.extractFeatures(a).collect().map(f => f.asset_id -> f.checksum).toMap
    val cs2 = Multimodal.extractFeatures(twice).collect().map(f => f.asset_id -> f.checksum).toMap
    assert(cs1 === cs2)
  }

  test("feature extraction preserves row count and types, ok=true for non-empty payloads") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, 50))
    assert(feats.count() === 50)
    assert(feats.filter(!col("ok")).count() === 0)
    // real per-kind decode: 8x8 gray thumbnail, 16-window loudness envelope,
    // temporal-mean frame thumbnail for MJPEG-AVI video
    val dims = feats.toDF().groupBy("kind").agg(collect_set("feat_dim").as("d"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSet).toMap
    assert(dims === Map("image" -> Set(64), "audio" -> Set(16), "video" -> Set(64)))
    assert(feats.filter(!col("real")).count() === 0,
      "every fixture asset decodes through a real kernel now")
  }

  test("image decode is real: PNG roundtrip is pixel-exact and thumbnail is in range") {
    import graft.multimodal.ImageCodec
    val png = ImageCodec.encodePng(37, 23, seed = 42L)
    val img = ImageCodec.decode(png).get
    assert(img.getWidth === 37 && img.getHeight === 23)
    // PNG is lossless: re-encoding the decoded image must reproduce identical pixels
    val again = ImageCodec.decode(ImageCodec.encodePng(37, 23, seed = 42L)).get
    assert((0 until 23).forall(y => (0 until 37).forall(x =>
      (img.getRGB(x, y) & 0xffffff) === (again.getRGB(x, y) & 0xffffff))))
    val b = ImageCodec.brightness(img)
    assert(b > 0.0 && b < 255.0)
    val thumb = ImageCodec.grayThumb(img, 8, 8)
    assert(thumb.length === 64 && thumb.forall(v => v >= 0f && v <= 1f))
    // garbage bytes are rejected, not crashed on
    assert(ImageCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("audio decode is real: WAV roundtrip is sample-exact and RMS matches the sine") {
    import graft.multimodal.WavCodec
    val tone = WavCodec.sineTone(8000, ms = 100, freqHz = 440.0, amp = 0.5)
    val wav = WavCodec.decodePcm16(WavCodec.encodePcm16(8000, tone)).get
    assert(wav.sampleRate === 8000 && wav.channels === 1)
    assert(wav.samples.toSeq === tone.toSeq)
    // RMS of a 0.5-amplitude sine is 0.5 / sqrt(2) ~= 0.3536
    assert(math.abs(WavCodec.rms(wav.samples) - 0.5 / math.sqrt(2)) < 0.01)
    assert(WavCodec.rmsProfile(wav.samples, 16).length === 16)
    assert(WavCodec.decodePcm16("not a wav at all".getBytes("UTF-8")).isEmpty)
  }

  test("fused analyze() is bit-identical to the three standalone passes") {
    import graft.multimodal.ImageCodec
    val img = ImageCodec.decode(ImageCodec.encodePng(41, 29, seed = 7L)).get
    val (cs, bright, thumb) = ImageCodec.analyze(img, 8, 8)
    // checksum twin: the original row-major FNV over getRGB(x, y)
    var want = 1469598103934665603L
    for (y <- 0 until 29; x <- 0 until 41)
      want = (want ^ (img.getRGB(x, y) & 0xffffffffL)) * 1099511628211L
    assert(cs === want)
    assert(bright === ImageCodec.brightness(img))
    assert(thumb.toSeq === ImageCodec.grayThumb(img, 8, 8).toSeq)
  }

  test("WAV decode survives hostile input and RIFF oddities") {
    import graft.multimodal.WavCodec
    import java.nio.{ByteBuffer, ByteOrder}
    // truncated fmt chunk: >= 44 bytes (past the length pre-check) with a
    // junk chunk padding the front, then a declared 16-byte fmt body that
    // the payload cuts off — must hit the remaining()<16 guard, not throw
    val truncated = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(36)
      .put("WAVE".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(16).put(new Array[Byte](16))
      .put("fmt ".getBytes("US-ASCII")).putInt(16).array()
    assert(truncated.length === 44)
    assert(WavCodec.decodePcm16(truncated).isEmpty)
    // negative / absurd chunk length — None, no throw
    val badLen = ByteBuffer.allocate(52).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(44)
      .put("WAVE".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(-5).array()
    assert(WavCodec.decodePcm16(badLen).isEmpty)
    // an ODD-length metadata chunk before data carries a RIFF pad byte;
    // the walk must stay in sync and still find fmt + data
    val tone = WavCodec.sineTone(8000, ms = 20, freqHz = 440.0)
    val clean = WavCodec.encodePcm16(8000, tone)
    val meta = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val withMeta = clean.take(12) ++ meta ++ clean.drop(12)
    // patch the RIFF size (not validated, but keep the file honest)
    val wav = WavCodec.decodePcm16(withMeta)
    assert(wav.isDefined, "odd-length chunk desynced the walk")
    assert(wav.get.samples.toSeq === tone.toSeq)
  }

  test("video decode is real: MJPEG-AVI roundtrip, per-frame JPEG decode, hostile input") {
    import graft.multimodal.{AviCodec, ImageCodec}
    val bytes = AviCodec.encodeMjpegAvi(20, 14, nFrames = 6, fps = 4, seed = 9L)
    val avi = AviCodec.decode(bytes).get
    assert(avi.width === 20 && avi.height === 14)
    assert(avi.frames.length === 6)
    assert(avi.usPerFrame === 250000 && avi.durationMs === 1500)
    // every frame chunk decodes as a real JPEG with the container dimensions
    val imgs = (0 until 6).map(avi.decodeFrame(_).get)
    assert(imgs.forall(i => i.getWidth === 20 && i.getHeight === 14))
    // frames are phase-shifted: decoded-pixel checksums must all differ
    val css = imgs.map(i => ImageCodec.analyze(i, 1, 1)._1)
    assert(css.distinct.length === 6, "frames must decode to distinct content")
    // decode is deterministic
    val again = AviCodec.decode(bytes).get
    assert((0 until 6).forall(i =>
      ImageCodec.analyze(again.decodeFrame(i).get, 1, 1)._1 === css(i)))
    // JPEG is lossy but sane: mean luminance survives the roundtrip closely
    val src = ImageCodec.decode(ImageCodec.encodePng(20, 14, seed = 9L)).get
    assert(math.abs(ImageCodec.brightness(imgs.head) - ImageCodec.brightness(src)) < 20.0)
    // hostile input: garbage, truncation mid-frame, zero-length — None, no throw
    assert(AviCodec.decode("not an avi".getBytes("UTF-8")).isEmpty)
    assert(AviCodec.decode(bytes.take(bytes.length / 2)).isEmpty ||
      AviCodec.decode(bytes.take(bytes.length / 2)).get.frames.length < 6)
    assert(AviCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("stub provenance fencing: non-AVI video features carry real=false and never reach cosine") {
    val rows = Seq(
      (0L, "video", "video/mp4",
        Array.tabulate[Byte](128)(j => ((j * 17) % 256 - 128).toByte), // not AVI → stub
        Option.empty[Int], Option.empty[Int], Some(2000)),
      (1L, "video", "video/x-msvideo",
        graft.multimodal.AviCodec.encodeMjpegAvi(16, 12, 4, 4, 1L),
        Some(16), Some(12), Some(1000)),
      (2L, "video", "video/x-msvideo",
        graft.multimodal.AviCodec.encodeMjpegAvi(16, 12, 4, 4, 1L), // byte-identical dup
        Some(16), Some(12), Some(1000)))
    import spark.implicits._
    val assets = rows.toDF("asset_id", "kind", "media_type", "payload",
      "width", "height", "duration_ms")
    val feats = Multimodal.extractFeatures(assets).collect().map(f => f.asset_id -> f).toMap
    assert(!feats(0L).real && feats(0L).feat_dim === 8, "non-AVI video must be stub-flagged")
    assert(feats(1L).real && feats(1L).ok && feats(1L).feat_dim === 64)
    // near-dup sees ONLY the real pair; the stub asset is fenced out
    val pairs = Multimodal.mediaNearDupPairs(assets, "video", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("perceptual near-dup finds every planted duplicate; LSH path is a subset of exact") {
    // 90 assets, dupCycle=10: 30 images = 10 distinct contents x 3 byte-identical
    // replicas (same for audio) -> C(3,2)*10 = 30 planted pairs per kind
    val assets = Multimodal.syntheticAssets(spark, 90, dupCycle = 10)
    for (kind <- Seq("image", "audio", "video")) {
      val exact = Multimodal.mediaNearDupPairs(assets, kind, threshold = 0.9999, exact = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Multimodal.mediaNearDupPairs(assets, kind, threshold = 0.9999)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // planted: asset ids of the same kind whose kind-ordinal is congruent mod 10
      val kindOff = Seq("image", "audio", "video").indexOf(kind)
      val ids = (0 until 90).filter(_ % 3 == kindOff).map(_.toLong)
      val planted = (for {
        a <- ids; b <- ids
        if a < b && ((a - kindOff) / 3) % 10 === ((b - kindOff) / 3) % 10
      } yield (a, b)).toSet
      assert(planted.size === 30)
      assert(planted.subsetOf(exact), s"$kind: exact path missed a byte-identical pair")
      // identical embeddings share every LSH band, so planted pairs can't be missed
      assert(planted.subsetOf(lsh), s"$kind: LSH path missed an identical pair")
      assert(lsh.subsetOf(exact), s"$kind: LSH emitted a pair the exact path rejects")
      // discriminative: distinct contents do NOT all collapse above the threshold
      val allPairs = ids.size.toLong * (ids.size - 1) / 2
      assert(exact.size < allPairs, s"$kind: embedding is degenerate (all pairs matched)")
    }
  }

  test("video frame sampling yields ceil(duration/every) frames per video") {
    val assets = Multimodal.syntheticAssets(spark, 60)
    val frames = Multimodal.sampleVideoFrames(assets, everyMs = 5000)
      .groupBy("asset_id").count()
    val expected = assets.filter(col("kind") === "video")
      .select(col("asset_id"), ceil(col("duration_ms").cast("double") / 5000).cast("long").as("exp"))
    val bad = frames.join(expected, Seq("asset_id"))
      .filter(col("count") =!= col("exp")).count()
    assert(bad === 0)
    assert(frames.count() === assets.filter(col("kind") === "video").count())
  }

  test("decoded frame sampling: real frames at the everyMs cadence, distinct checksums") {
    // fixture videos run at 4 fps (250 ms/frame): everyMs=500 → every 2nd
    // frame → ceil(nFrames / 2) rows per asset, each a REAL JPEG decode
    val assets = Multimodal.syntheticAssets(spark, 30)
    val frames = Multimodal.sampleVideoFramesDecoded(assets, everyMs = 500)
    val perAsset = frames.groupBy("asset_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nFrames = assets.filter(col("kind") === "video")
      .select(col("asset_id"), (col("duration_ms") / 250).cast("long").as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perAsset.keySet === nFrames.keySet, "every fixture AVI must parse")
    nFrames.foreach { case (id, nf) =>
      assert(perAsset(id) === (nf + 1) / 2, s"asset $id: ${perAsset(id)} vs nf=$nf")
    }
    val rows = frames.collect()
    assert(rows.forall(f => f.frame_ms === f.frame_idx * 250))
    // checksums are over decoded pixels; phase-shifted frames must differ
    rows.groupBy(_.asset_id).foreach { case (id, fs) =>
      assert(fs.map(_.checksum).distinct.length === fs.length,
        s"asset $id: sampled frames decode to identical pixels")
    }
  }
}
