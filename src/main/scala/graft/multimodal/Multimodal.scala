package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed partition-parallel.
  *
  * The actual codecs (JPEG decode, audio resample, video frame extraction)
  * are NOT available in this container, so `decodeStub` derives a
  * deterministic fake decode from the payload bytes — clearly marked. The
  * Spark-side plumbing is real and tested: binary column + metadata struct
  * schema, mapPartitions batching (one codec init per partition, the same
  * shape a JNI/FFI decoder needs), and partition-count preservation.
  *
  * Scale notes: payloads ride in the row (parquet binary). At 100 TB the
  * pattern is identical but payloads live in object storage with the row
  * carrying a URI + byte-range; mapPartitions then does ranged GETs with a
  * per-partition client — the schema and operator shape below don't change.
  */
object Multimodal {

  final case class Media(media_id: Long, format: String, payload: Array[Byte])
  final case class DecodedImage(media_id: Long, format: String,
      width: Int, height: Int, channels: Int, mean_luma: Double)
  final case class Frame(media_id: Long, frame_idx: Int, luma: Double)

  /** Build a media table from the documents table (text bytes stand in for
    * encoded payloads — same schema a real ingest would produce). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        concat(lit("img/fake-"), col("source")).as("format"),
        encode(col("text"), "UTF-8").cast("binary").as("payload"))
      .as[Media]
  }

  /** STUB DECODE — deterministic fake in place of a real image codec (none
    * shipped in this container). Dimensions/luma derive from payload bytes
    * so results are stable and assertable. A real deployment swaps only the
    * body of this function for the codec call. */
  private def decodeOne(m: Media): DecodedImage = {
    val bytes = m.payload
    val w = 64 + (if (bytes.isEmpty) 0 else (bytes(0) & 0x7f))
    val h = 64 + (if (bytes.length < 2) 0 else (bytes(1) & 0x7f))
    val luma = if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    DecodedImage(m.media_id, m.format, w, h, 3, luma)
  }

  /** Partition-parallel decode: mapPartitions so a real codec initializes
    * once per partition, not once per row. */
  def decodeImages(media: Dataset[Media]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" init would go here
      it.map(decodeOne)
    }
  }

  /** Frame sampling: every Nth "frame" of the payload (stride over bytes in
    * the stub; stride over decoded frames with a real video codec). */
  def frameSample(media: Dataset[Media], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.indices.by(everyN).map { i =>
        Frame(m.media_id, i / everyN, (m.payload(i) & 0xff).toDouble)
      }
    }
  }

  /** RESIZE stub — nearest-neighbor downsample of the payload to a fixed
    * side×side sample grid (position k reads byte floor(k·len/n), the 1-D
    * stand-in for a 2-D resampler; a real deployment swaps the body for
    * the image library's resize). Integer byte sums keep the output
    * hash-stable. Upsampling (len < n) duplicates positions, exactly like
    * nearest-neighbor. */
  def resizeThumb(media: Dataset[Media], side: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    val n = side * side
    media.map { m =>
      val len = m.payload.length
      if (len == 0) (m.media_id, n.toLong, 0L, 0L, 0L)
      else {
        val s = (0 until n).map(k => (m.payload((k.toLong * len / n).toInt) & 0xff).toLong)
        (m.media_id, n.toLong, s.sum, s.min, s.max)
      }
    }.toDF("media_id", "n_samples", "sample_sum", "sample_min", "sample_max")
  }

  /** Perceptual-hash bands from the 8×8 resize grid: bit k is set iff
    * sample k is strictly above the grid mean (integer-exact: v·64 >
    * Σv), packed into four 16-bit band values — the pHash layout that
    * lets near-dup search bucket on band equality and verify by Hamming
    * distance. Runs on the same stub resampler as [[resizeThumb]]; a
    * real deployment swaps the sampling for DCT coefficients and keeps
    * the banding unchanged. */
  def phashBands(media: Dataset[Media], side: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    val n = side * side
    media.map { m =>
      val len = m.payload.length
      val s =
        if (len == 0) Array.fill(n)(0L)
        else Array.tabulate(n)(k => (m.payload((k.toLong * len / n).toInt) & 0xff).toLong)
      val total = s.sum
      val bits = s.map(v => if (v * n > total) 1 else 0)
      val bands = Array.tabulate(4)(j =>
        (0 until 16).foldLeft(0)((acc, i) => acc | (bits(16 * j + i) << i)))
      (m.media_id, bands(0), bands(1), bands(2), bands(3))
    }.toDF("media_id", "b0", "b1", "b2", "b3")
  }

  /** Feature extraction to a fixed-width embedding (byte histogram — the
    * stub for a vision-model embedding; schema matches `embeddings`). */
  def featurize(media: Dataset[Media], dim: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.map { m =>
      val hist = new Array[Double](dim)
      m.payload.foreach(b => hist((b & 0xff) % dim) += 1.0)
      val n = math.max(1, m.payload.length)
      (m.media_id, hist.map(_ / n))
    }.toDF("media_id", "embedding")
  }
}
