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
    assert(feats.select("feat_dim").distinct().collect().map(_.getInt(0)).toSeq === Seq(8))
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
}
