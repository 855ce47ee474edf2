package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque binary payload + typed metadata. */
case class MediaRow(media_id: Long, media_type: String,
                    content: Array[Byte], meta: Map[String, String])

/** Output of the (stubbed) decode stage. */
case class DecodedMedia(media_id: Long, media_type: String,
                        width: Int, height: Int, n_frames: Int,
                        features: Array[Float])

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/video
 * as opaque `binary` columns with typed metadata, decoded per partition.
 *
 * The actual codec step is a ==== STUB ==== (no image/audio libraries in
 * this container): `decodeStub` derives deterministic fake dimensions and
 * features from the payload bytes. Everything AROUND the stub is real and
 * load-bearing at scale:
 *   - schema: (media_id long, media_type string, content binary, meta map)
 *   - batch shape: `mapPartitions` over a typed Dataset — the Scala analog
 *     of Python's mapInPandas; one iterator per task, streaming, no
 *     row-at-a-time UDF overhead, codec context reusable per partition
 *   - partitioning: decode is embarrassingly parallel; repartition upstream
 *     by size, never shuffle the binary payload afterwards
 *   - projection: the decode output drops `content`, so the heavy bytes die
 *     at the earliest stage boundary (column pruning does the rest)
 */
object Multimodal {

  /** Deterministic synthetic media table: payload bytes derived from the id
    * (stand-in for a real binary scan; sized 64-1024 bytes). */
  def syntheticMedia(spark: SparkSession, n: Long, parts: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).map { row =>
      val id = row
      val size = 64 + (mix(id, 1) % 961).toInt
      val bytes = Array.tabulate[Byte](size)(i => (mix(id, i.toLong + 2) & 0xff).toByte)
      val mtype = Seq("image", "audio", "video")((mix(id, 0) % 3).toInt)
      MediaRow(id, mtype, bytes, Map("origin" -> s"synth-$id", "codec" -> "fake"))
    }
  }

  /** splitmix64-style deterministic mix (public-domain constant schedule). */
  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9E3779B97F4A7C15L + b
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    math.abs(z ^ (z >>> 31))
  }

  /**
   * ==== STUB ==== decode stage. A real deployment swaps the body of
   * `decodeOne` for the codec call (e.g. javax.imageio / ffmpeg JNI); the
   * mapPartitions batch shape, schema, and laziness stay identical.
   */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup happens once here (codec init in a real impl)
      it.map(decodeOne)
    }
  }

  private def decodeOne(m: MediaRow): DecodedMedia = {
    // STUB: "parse" the first bytes as a fake header; deterministic output.
    val h = m.content.take(8).foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
    val width = 16 + (h % 240).toInt
    val height = 16 + ((h >> 8) % 240).toInt
    val frames = m.media_type match {
      case "video" => 1 + (h % 32).toInt
      case "audio" => 1 + (h % 128).toInt
      case _       => 1
    }
    val features = Array.tabulate(8)(i =>
      ((mix(h, i.toLong) % 2000001L) / 1000000.0f) - 1.0f)
    DecodedMedia(m.media_id, m.media_type, width, height, frames, features)
  }

  /** Frame sampling: every `stride`-th fake frame of video payloads —
    * demonstrates the explode shape (one row per sampled frame) with the
    * binary payload sliced per frame, not copied whole. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    val df = media.toDF()
    df.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), (length(col("content")) / 64 - 1).cast("int"), lit(stride))))
      .select(col("media_id"), col("frame_idx"),
        col("content").substr(col("frame_idx") * 64 + 1, lit(64)).as("frame_bytes"))
  }
}
