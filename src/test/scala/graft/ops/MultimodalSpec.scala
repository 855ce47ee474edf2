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

  test("decode: typed output, deterministic, content column pruned away") {
    val decoded = Multimodal.decode(media)
    assert(decoded.columns.toSeq ===
      Seq("media_id", "media_type", "ok", "width", "height", "n_frames", "features"))
    assert(decoded.count() === 300L)
    // determinism
    val again = Multimodal.decode(Multimodal.syntheticMedia(spark, 300L, 8)).toDF()
    assert(decoded.toDF().exceptAll(again).isEmpty)
  }

  test("PGM images decode for real: exact planted dimensions + pixel stats") {
    // plant a known 4x2 gradient image and decode it
    val px = Array[Int](0, 10, 20, 30, 40, 50, 60, 70)
    val bytes = Multimodal.pgmBytes(4, 2, (x, y) => px(y * 4 + x))
    val Some((w, h, pixels)) = Multimodal.parsePgm(bytes)
    assert(w === 4 && h === 2)
    assert(pixels.map(_ & 0xff).toSeq === px.toSeq)
    val one = Multimodal.decode(
      Seq(MediaRow(1L, "image", bytes, Map.empty)).toDS()).head()
    assert(one.ok && one.width === 4 && one.height === 2)
    assert(math.abs(one.features(0) - 35.0f) < 1e-5) // mean of 0..70 by 10
    assert(one.features(2) === 0.0f && one.features(3) === 70.0f) // min, max
    // quadrant means: q0 = mean(0,10)=5, q1 = mean(20,30)=25,
    //                 q2 = mean(40,50)=45, q3 = mean(60,70)=65
    assert(one.features.slice(4, 8).toSeq === Seq(5.0f, 25.0f, 45.0f, 65.0f))
  }

  test("WAV audio decodes for real: exact sample count, rate, RMS, crossings") {
    val samples = Array[Short](100, -100, 200, -200, 0, 300)
    val bytes = Multimodal.wavBytes(8000, samples)
    val Some((rate, back)) = Multimodal.parseWav(bytes)
    assert(rate === 8000 && back.toSeq === samples.toSeq)
    val one = Multimodal.decode(
      Seq(MediaRow(2L, "audio", bytes, Map.empty)).toDS()).head()
    assert(one.ok && one.width === 8000 && one.n_frames === 6)
    assert(one.features(2) === 300.0f) // peak
    assert(one.features(3) === 4.0f)   // sign changes: +,-,+,-,0(neg? no),+
  }

  test("unparsable payloads become ok=false poison rows, never task failures") {
    val decoded = Multimodal.decode(media).toDF().cache()
    try {
      val poisoned = decoded.filter(!col("ok")).count()
      // syntheticMedia truncates ~2% of image/audio payloads
      assert(poisoned > 0)
      assert(decoded.filter(!col("ok") && col("media_type") === "video").count() === 0)
      // poison + decoded PARTITION the input: every row lands in exactly one
      assert(poisoned + decoded.filter(col("ok")).count() === 300L)
    } finally { decoded.unpersist(); () }
  }

  test("decode runs partition-parallel (mapPartitions, one pass)") {
    val n = media.rdd.getNumPartitions
    assert(n === 4)
    val decoded = Multimodal.decode(media)
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
