package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as partition-local batch transforms.
  *
  * The decode kernels themselves are STUBBED (this container has no media
  * codecs): `stubFeatures` is a deterministic byte-sampling fake standing in
  * for a real decoder. Everything around it — the binary column schema, the
  * typed Dataset batch shape, the mapPartitions execution (one iterator per
  * partition, so a real decoder would amortize model/codec init per
  * partition, the same shape `mapInPandas` batches take in PySpark) — is
  * real and tested.
  */
object BinaryOps {

  /** Row shape for decoded fixed-width feature batches. */
  case class MediaFeatures(doc_id: Long, features: Array[Double])

  /** Attach an opaque binary payload column (here: the utf-8 bytes of a text
    * column; in production: image/audio bytes read via `binaryFile` source).
    */
  def withPayload(df: DataFrame, textCol: String, name: String): DataFrame =
    df.withColumn(name, col(textCol).cast("binary"))

  /** STUB decode kernel — deterministic byte sampling in place of a real
    * image/audio decoder: feature j = byte[j * stride] / 255.0 (0.0 past
    * the end). Replace the body with a codec call; the batch plumbing
    * stays identical.
    */
  def stubFeatures(bytes: Array[Byte], dims: Int, stride: Int): Array[Double] =
    Array.tabulate(dims) { j =>
      val idx = j * stride
      if (idx < bytes.length) (bytes(idx) & 0xff) / 255.0 else 0.0
    }

  /** Partition-local "decode": binary payload in, fixed-width feature vector
    * out. mapPartitions so a real decoder initializes once per partition —
    * the Scala analogue of a Pandas `mapInPandas` batch UDF.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, id: String,
      payload: String, dims: Int, stride: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of a real codec/model would go here
        it.map { case (docId, bytes) =>
          MediaFeatures(docId, stubFeatures(bytes, dims, stride))
        }
      }
  }

  /** "Frame sampling" over a binary payload: cut the byte stream into
    * `frameLen`-sized frames and keep every `every`-th one, with its offset —
    * the video-keyframe plumbing shape (explode to one row per kept frame).
    */
  def sampleFrames(df: DataFrame, id: String, payload: String,
      frameLen: Int, every: Int): DataFrame = {
    val step = frameLen * every
    // empty payloads yield zero frames — unguarded, sequence(0, -1) would
    // walk backwards and emit two bogus frame rows
    df.filter(length(col(payload)) > 0)
      .select(col(id), col(payload),
        explode(sequence(lit(0),
          floor((length(col(payload)) - 1) / step).cast("int"))).as("frame_no"))
      .select(col(id), col("frame_no"),
        (col("frame_no") * step).cast("long").as("byte_offset"),
        col(payload).substr(col("frame_no") * step + 1, lit(frameLen)).as("frame_bytes"))
  }
}
