package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The heavy codecs (JPEG/PNG/audio) are NOT available in this
  * environment, so the decode kernel is a clearly-marked deterministic
  * STUB — but everything Spark-side is real and tested: the schema
  * convention, the per-partition batch shape (one iterator pass, no
  * per-row setup cost), partition sizing, and the feature schema. Swapping
  * `stubDecode` for a real codec is a one-function change.
  *
  * At 100 TB: binary payloads ride the scan (parquet keeps them
  * column-pruned away unless referenced); feature extraction is
  * mapPartitions (Spark's Scala analogue of `mapInPandas` batching), so
  * codec init amortizes across a partition, and
  * `spark.sql.files.maxPartitionBytes` bounds executor memory per task.
  */
object Multimodal {

  /** Canonical media-table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  /** Feature row produced per media item. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** STUB decode: a real build replaces this with the codec call
    * (e.g. TwelveMonkeys ImageIO / JavaCV decode + resize + embed).
    * Deterministic fake: 8 features derived from byte statistics, so the
    * plumbing is testable end-to-end.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below
    val n = payload.length.max(1)
    val sums = new Array[Long](8)
    var i = 0
    while (i < payload.length) { sums(i % 8) += payload(i) & 0xff; i += 1 }
    sums.map(s => (s.toDouble / n).toFloat)
  }

  /** Per-partition feature extraction over the binary payload column.
    * One decoder instantiation per partition (the `iter.map` closure),
    * mirroring arrow-batched `mapInPandas` economics.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media
      .select("media_id", "payload")
      .rdd
      .mapPartitions { iter =>
        // per-partition decoder init would go here
        iter.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val feats = stubDecode(payload)
          var h = 1469598103934665603L // FNV-1a over payload: cheap content id
          payload.foreach { b => h ^= (b & 0xffL); h *= 1099511628211L }
          Row(id, payload.length, h, feats.toSeq)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame-sampling stub for video payloads: every `stride`-th frame index
    * up to `n_frames` — pure plan-side arithmetic (the real decoder seeks
    * those frames).
    */
  def sampleFrameIndexes(media: DataFrame, stride: Int): DataFrame =
    media
      .filter(col("media_type") === "video" && col("n_frames").isNotNull)
      .select(
        col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
