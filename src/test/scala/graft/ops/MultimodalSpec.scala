package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  lazy val media = Multimodal.syntheticMedia(spark, 300L, 4).cache()

  test("synthetic media is deterministic across parallelism levels") {
    val a = Multimodal.syntheticMedia(spark, 50L, 2).toDF()
      .select(col("media_id"), xxhash64(col("content")).as("h"))
    val b = Multimodal.syntheticMedia(spark, 50L, 4).toDF()
      .select(col("media_id"), xxhash64(col("content")).as("h"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("decode stub: typed output, deterministic, content column pruned away") {
    val decoded = Multimodal.decodeStub(media)
    assert(decoded.columns.toSeq ===
      Seq("media_id", "media_type", "width", "height", "n_frames", "features"))
    assert(decoded.count() === 300L)
    val bad = decoded.filter(col("width") < 16 || col("width") >= 256 ||
      col("height") < 16 || col("height") >= 256 || size(col("features")) =!= 8).count()
    assert(bad === 0)
    // images decode to exactly one frame; audio/video to >=1
    assert(decoded.filter(col("media_type") === "image" && col("n_frames") =!= 1).count() === 0)
    // determinism
    val again = Multimodal.decodeStub(Multimodal.syntheticMedia(spark, 300L, 8)).toDF()
    assert(decoded.toDF().exceptAll(again).isEmpty)
  }

  test("decode runs partition-parallel (mapPartitions, one pass)") {
    val n = media.rdd.getNumPartitions
    assert(n === 4)
    val decoded = Multimodal.decodeStub(media)
    assert(decoded.rdd.getNumPartitions === n, "decode must not shuffle")
  }

  test("frame sampling explodes video payloads into 64-byte frames") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
    assert(frames.columns.toSeq === Seq("media_id", "frame_idx", "frame_bytes"))
    assert(frames.count() > 0)
    assert(frames.filter(pmod(col("frame_idx"), lit(2)) =!= 0).count() === 0)
    assert(frames.filter(length(col("frame_bytes")) > 64).count() === 0)
    // only videos contribute
    val vids = media.toDF().filter(col("media_type") === "video").select("media_id")
    assert(frames.select("media_id").distinct().exceptAll(vids).isEmpty)
  }
}
