package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-batched form.
  *
  * The decode/feature kernels are STUBBED (no image/audio libs in this
  * container — see the builder prompt): [[FakeDecoder]] is a deterministic
  * stand-in with the same signature a real decoder (JNI/FFM to libjpeg /
  * ffmpeg on the executors) would have. Everything Spark-side — schema,
  * partitioning, batch shape, columnar handoff — is real and tested.
  *
  * Scale design: media rows are orders of magnitude wider than text rows, so
  *  - the asset table keeps blobs out of the shuffle: transforms key on
  *    `asset_id` and only metadata/features move;
  *  - decode runs as mapPartitions over an iterator (case (d) of the
  *    custom-op preference order — genuinely imperative per-partition work),
  *    never collect();
  *  - `maxRecordsPerBatch`-style batching is modeled by the iterator shape:
  *    one kernel call per row, state amortized per partition.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", IntegerType, nullable = true)
  ))

  /** Deterministic synthetic asset table (payload = seeded pseudo-bytes). */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    val mt = Map("image" -> "image/jpeg", "audio" -> "audio/wav", "video" -> "video/mp4")
    (0 until n).map { i =>
      val kind = kinds(i % 3)
      val len = 64 + (i * 37) % 192
      val payload = Array.tabulate[Byte](len)(j => ((i * 131 + j * 17) % 256 - 128).toByte)
      (i.toLong, kind, mt(kind), payload,
        if (kind == "image") Some(64 + i % 512) else None,
        if (kind == "image") Some(64 + (i * 3) % 512) else None,
        if (kind != "image") Some(1000 + (i * 97) % 60000) else None)
    }.toDF("asset_id", "kind", "media_type", "payload", "width", "height", "duration_ms")
  }

  /** Stand-in decode kernel: deterministic features from the payload bytes.
    * A real build replaces the body (marked) and nothing else changes. */
  object FakeDecoder {
    final case class Features(ok: Boolean, featDim: Int, checksum: Long, brightness: Double)
    def decode(kind: String, payload: Array[Byte]): Features = {
      // >>> STUB: replace with libjpeg/ffmpeg decode + model features <<<
      var cs = 1469598103934665603L
      var sum = 0L
      payload.foreach { b => cs = (cs ^ b) * 1099511628211L; sum += (b & 0xff) }
      Features(ok = payload.nonEmpty, featDim = 8,
        checksum = cs, brightness = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length)
    }
    /** Frame-sample stub: deterministic frame offsets for a video payload. */
    def sampleFrames(durationMs: Int, everyMs: Int): Seq[Int] =
      (0 until durationMs by everyMs).toSeq
  }

  final case class AssetFeatures(
      asset_id: Long, kind: String, ok: Boolean,
      feat_dim: Int, checksum: Long, brightness: Double)

  /** Partition-batched decode: binary in, typed features out. */
  def extractFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("asset_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition kernel state would be initialized here (decoder ctx)
        it.map { case (id, kind, payload) =>
          val f = FakeDecoder.decode(kind, payload)
          AssetFeatures(id, kind, f.ok, f.featDim, f.checksum, f.brightness)
        }
      }
  }

  /** Video frame sampling: one row per sampled frame offset. */
  def sampleVideoFrames(assets: DataFrame, everyMs: Int): DataFrame =
    assets
      .filter(col("kind") === "video")
      .select(col("asset_id"), col("duration_ms"),
        explode(sequence(lit(0), col("duration_ms") - 1, lit(everyMs))).as("frame_ms"))
}
