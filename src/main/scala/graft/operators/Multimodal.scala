package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * IMAGE payloads decode for real through the JDK's built-in
  * `javax.imageio` (PNG/BMP/JPEG/GIF — no external dependency): decode →
  * fixed 8×8 luminance resample → 64 features. AUDIO payloads decode for
  * real through the JDK's built-in `javax.sound.sampled` (WAV/AIFF/AU
  * PCM): mono mixdown → per-segment RMS + zero-crossing features.
  * VIDEO payloads decode for real when they are MJPEG-in-AVI — the RIFF
  * container is hand-parsed and frames are ImageIO JPEGs: sampled-frame
  * luminance cells + temporal profile. Payloads none of these can read
  * (compressed audio and the H.264-family video codecs are genuinely
  * absent from the JDK) fall back to the clearly-marked deterministic
  * byte-statistics STUB, which is also the bit-portable oracle tier.
  * Everything Spark-side is real and tested either way: the schema
  * convention, the per-partition batch shape (one iterator pass, no
  * per-row setup cost), partition sizing, and the feature schema.
  *
  * At 100 TB: binary payloads ride the scan (parquet keeps them
  * column-pruned away unless referenced); feature extraction is
  * mapPartitions (Spark's Scala analogue of `mapInPandas` batching), so
  * codec init amortizes across a partition, and
  * `spark.sql.files.maxPartitionBytes` bounds executor memory per task.
  */
object Multimodal {

  /** The codec PLUG-POINT for payload formats the offline JDK cannot
    * read (H.264-family video, MP3/OGG audio): implement this, call
    * [[registerCodec]], and [[extractFeatures]] offers every payload of
    * a claimed media type to the codec BEFORE the JDK built-ins — an
    * explicit registration is an override (a JavaCV/ffmpeg binding
    * would claim "video" and "audio" and decode what ImageIO/javax.sound
    * return None for). `decode` returning None passes the payload to
    * the next codec, then the built-ins, then the deterministic
    * [[stubDecode]] tier — the operator degrades, it never fails.
    * Serializable because the registered snapshot is captured into the
    * mapPartitions closure at plan time. MultimodalSpec proves the
    * contract with a fake codec: registered → routed; absent → stub.
    */
  trait Codec extends Serializable {
    /** media_type values this codec claims (e.g. Set("video")). */
    def mediaTypes: Set[String]
    /** Feature vector, or None when this payload is unreadable here. */
    def decode(payload: Array[Byte]): Option[Array[Float]]
  }

  @volatile private var codecs: Seq[Codec] = Nil

  /** Register a codec for [[extractFeatures]] routing (driver-side,
    * before the plan is built — the snapshot ships in the closure).
    */
  def registerCodec(c: Codec): Unit = synchronized { codecs = codecs :+ c }

  /** Drop all registered codecs (tests; built-ins are unaffected). */
  def clearCodecs(): Unit = synchronized { codecs = Nil }

  /** The current registered-codec snapshot, custom-first routing order. */
  def registeredCodecs: Seq[Codec] = codecs

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

  /** STUB decode — the fallback for payloads no available codec reads
    * (and the bit-portable oracle tier): 8 features derived from byte
    * statistics, so the plumbing is testable end-to-end. Video and
    * compressed-audio codecs are absent in this environment; a real
    * build supplies them through the [[Codec]] plug-point
    * ([[registerCodec]] a JavaCV/ffmpeg binding — MultimodalSpec proves
    * the routing contract with a fake) the same way [[decodeImage]]
    * plugs in ImageIO and [[decodeAudio]] plugs in javax.sound.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    // ??? <- real codecs register via the Codec plug-point; deterministic fake below
    val n = payload.length.max(1)
    val sums = new Array[Long](8)
    var i = 0
    while (i < payload.length) { sums(i % 8) += payload(i) & 0xff; i += 1 }
    sums.map(s => (s.toDouble / n).toFloat)
  }

  /** Number of luminance cells per image axis (64 features total). */
  val ImageGrid = 8

  /** Time segments for audio features (2 features per segment). */
  val AudioSegments = 8

  /** REAL audio decode via the JDK's built-in `javax.sound.sampled` (WAV
    * / AIFF / AU PCM — zero external dependencies): decode to 16-bit
    * signed PCM, mix down to mono, and emit per-segment RMS energy and
    * zero-crossing rate over [[AudioSegments]] equal time slices — 16
    * features, resolution- and duration-independent in shape. Returns
    * None when the payload is not decodable audio — callers fall back to
    * [[stubDecode]] (compressed codecs like MP3/OGG are genuinely absent
    * from the JDK; they'd plug in here the same way).
    */
  def decodeAudio(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null || payload.length == 0) return None
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val target = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED,
        fmt.getSampleRate, 16, fmt.getChannels, 2 * fmt.getChannels,
        fmt.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, ais)
      val bytes =
        try pcm.readAllBytes()
        finally { pcm.close(); ais.close() }
      val ch = target.getChannels.max(1)
      val nSamples = bytes.length / 2 / ch
      if (nSamples == 0) return None
      val mono = new Array[Double](nSamples)
      var i = 0
      while (i < nSamples) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val off = (i * ch + c) * 2 // little-endian 16-bit
          acc += (((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort) / 32768.0
          c += 1
        }
        mono(i) = acc / ch
        i += 1
      }
      val seg = AudioSegments
      val feats = new Array[Float](seg * 2)
      var g = 0
      while (g < seg) {
        val lo = (g.toLong * nSamples / seg).toInt
        val hi = ((g + 1).toLong * nSamples / seg).toInt
        var ss = 0.0
        var zc = 0
        var j = lo
        while (j < hi) {
          ss += mono(j) * mono(j)
          if (j > lo && (mono(j) >= 0) != (mono(j - 1) >= 0)) zc += 1
          j += 1
        }
        val n = (hi - lo).max(1)
        feats(g) = math.sqrt(ss / n).toFloat
        feats(seg + g) = zc.toFloat / n
        g += 1
      }
      Some(feats)
    } catch { case _: Exception => None }
  }

  /** REAL image decode via the JDK's built-in ImageIO readers (PNG, BMP,
    * JPEG, GIF, WBMP — zero external dependencies): decode, resample on a
    * fixed (8·grid)² point lattice, and emit one mean luminance in [0,1]
    * per 8×8 cell. Resolution-independent (the lattice, not the pixel
    * count, bounds work per image) and deterministic. Returns None when
    * the payload is not a decodable image — callers fall back to
    * [[stubDecode]].
    */
  def decodeImage(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null || payload.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(cellLuminance(img).map(_.toFloat))
    } catch { case _: Exception => None }
  }

  /** Shared decode kernel: mean luminance in [0,1] per 8×8 cell, sampled
    * on a fixed (8·grid)² lattice — resolution-independent (the lattice,
    * not the pixel count, bounds work per image/frame).
    */
  private[operators] def cellLuminance(img: java.awt.image.BufferedImage): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val sub = 8 // sample points per cell axis: 64 samples per cell
    val lattice = ImageGrid * sub
    val sums = new Array[Double](ImageGrid * ImageGrid)
    var sy = 0
    while (sy < lattice) {
      val y = (sy * h) / lattice
      val cy = sy / sub
      var sx = 0
      while (sx < lattice) {
        val x = (sx * w) / lattice
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        sums(cy * ImageGrid + sx / sub) += lum
        sx += 1
      }
      sy += 1
    }
    sums.map(_ / (sub * sub * 255.0))
  }

  /** REAL image RESIZE — decode via ImageIO, then an area-average
    * luminance downsample to (outW × outH), hand-rolled with integer box
    * edges (`y0 = r·h / outH`, exclusive `y1 = max(y0+1, (r+1)·h / outH)`)
    * so the result is a pure function of the pixels — deterministic
    * across JVMs, unlike Graphics2D's platform-dependent scalers. Output
    * is row-major luminance in [0,1]. None for undecodable payloads
    * (caller falls back, same contract as [[decodeImage]]).
    */
  def resizeImage(payload: Array[Byte], outW: Int, outH: Int): Option[Array[Float]] = {
    require(outW > 0 && outH > 0, s"bad resize target ${outW}x$outH")
    if (payload == null || payload.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Float](outW * outH)
        var r = 0
        while (r < outH) {
          val y0 = r * h / outH
          val y1 = math.max(y0 + 1, (r + 1) * h / outH)
          var c = 0
          while (c < outW) {
            val x0 = c * w / outW
            val x1 = math.max(x0 + 1, (c + 1) * w / outW)
            var sum = 0.0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) +
                  0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            out(r * outW + c) = (sum / ((y1 - y0).toLong * (x1 - x0) * 255.0)).toFloat
            c += 1
          }
          r += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }
  }

  /** PLAN-SIDE nearest-neighbor resize of an opaque byte-grid payload —
    * the hash-exact TWIN of the resize kernel: the payload is read as a
    * raw `srcW`-wide grayscale grid (height = ⌊bytes / srcW⌋, tail
    * truncated; payloads shorter than one row are dropped) and resampled
    * to (outW × outH) with `src = ⌊dst · srcLen / outLen⌋` index
    * arithmetic — the SAME mapping [[resizeImage]] uses for its box
    * starts — entirely as codegen'd column expressions (sequence/explode,
    * substr, hex), so an engine-independent oracle can replay every
    * output pixel. Long form: (media_id, r, c, px).
    */
  def resizeRawGrid(media: DataFrame, srcW: Int, outW: Int, outH: Int): DataFrame = {
    require(srcW > 0 && outW > 0 && outH > 0, s"bad grid ${srcW}→${outW}x$outH")
    val r = floor(col("__i") / lit(outW)).cast("long")
    val c = col("__i") % lit(outW.toLong)
    val srcR = floor(r * col("__h") / lit(outH)).cast("long")
    val srcC = floor(c * lit(srcW) / lit(outW)).cast("long")
    val idx = srcR * lit(srcW.toLong) + srcC // 0-based byte offset
    media
      .select(col("media_id"), col("payload"), length(col("payload")).cast("long").as("__nb"))
      .filter(col("__nb") >= srcW)
      .withColumn("__h", floor(col("__nb") / lit(srcW)).cast("long"))
      .withColumn("__i", explode(sequence(lit(0L), lit((outH.toLong * outW) - 1L))))
      .select(
        col("media_id"),
        r.as("r"),
        c.as("c"),
        conv(hex(col("payload").substr((idx + 1L).cast("int"), lit(1))), 16, 10)
          .cast("long").as("px"))
  }

  /** Frames sampled per video for feature extraction. */
  val VideoFrameSample = 8

  /** REAL video decode for MJPEG-in-AVI — the one video coding the JDK
    * can fully handle without external codecs: the AVI (RIFF) container
    * is walked chunk-by-chunk and each `..db`/`..dc` movi payload is a
    * standalone JPEG frame ImageIO decodes. Up to [[VideoFrameSample]]
    * frames are sampled on an even stride (seek-style — work per video is
    * bounded by the sample count, not the frame count); features are the
    * per-cell luminance means over sampled frames (64) plus the per-frame
    * mean-luminance temporal profile (8) = 72 features. Returns None for
    * containers/codecs this build cannot read (H.264 etc. would plug in
    * here via a JavaCV/ffmpeg binding exactly like this decoder plugs in
    * ImageIO) — callers fall back to [[stubDecode]].
    */
  def decodeVideo(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null || payload.length < 12) return None
    def ascii(off: Int): String = new String(payload, off, 4, "US-ASCII")
    def le32(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    if (ascii(0) != "RIFF" || ascii(8) != "AVI ") return None
    try {
      // walk the chunk tree collecting movi video payloads (ids ...db/...dc)
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (offset, length)
      def walk(off0: Int, end: Int): Unit = {
        var off = off0
        while (off + 8 <= end) {
          val id = ascii(off)
          val size = le32(off + 4).toInt
          if (size < 0 || off + 8 + size > payload.length) return
          if (id == "LIST" && size >= 4) walk(off + 12, off + 8 + size)
          else if ((id.endsWith("db") || id.endsWith("dc")) && size > 0)
            frames += ((off + 8, size))
          off += 8 + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, math.min(12 + le32(4).toInt - 4, payload.length))
      if (frames.isEmpty) return None
      val n = frames.length
      val take = math.min(VideoFrameSample, n)
      val sampled = (0 until take).map(i => frames((i.toLong * n / take).toInt))
      val cells = new Array[Double](ImageGrid * ImageGrid)
      val profile = new Array[Float](VideoFrameSample)
      var decoded = 0
      sampled.foreach { case (off, len) =>
        // per-frame tolerance: one truncated frame skips, it doesn't drop
        // the whole video to the stub tier
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload, off, len))
          catch { case _: Exception => null }
        if (img != null && img.getWidth > 0 && img.getHeight > 0) {
          val c = cellLuminance(img)
          var i = 0
          var mean = 0.0
          while (i < cells.length) { cells(i) += c(i); mean += c(i); i += 1 }
          if (decoded < VideoFrameSample) profile(decoded) = (mean / cells.length).toFloat
          decoded += 1
        }
      }
      if (decoded == 0) None
      else Some(cells.map(s => (s / decoded).toFloat) ++ profile)
    } catch { case _: Exception => None }
  }

  /** Per-partition feature extraction over the binary payload column.
    * One decoder instantiation per partition (the `iter.map` closure),
    * mirroring arrow-batched `mapInPandas` economics. Image payloads go
    * through the real ImageIO decoder when readable; everything else
    * (and undecodable bytes) takes the deterministic stub tier, so the
    * operator never fails on a corrupt payload — it degrades.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val typed =
      if (media.columns.contains("media_type"))
        media.select(col("media_id"), col("payload"), col("media_type"))
      else // opaque-payload callers: stub tier (also the oracle tier)
        media.select(col("media_id"), col("payload"), lit("binary").as("media_type"))
    // snapshot the registered codecs at PLAN time — the Seq serializes
    // into the closure, so executors route identically to the driver
    val plugged = registeredCodecs
    val rdd = typed.rdd
      .mapPartitions { iter =>
        // ImageIO plugin scan happens once per JVM; per-partition decoder
        // state (scratch buffers, codec contexts) would init here
        iter.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val mediaType = r.getString(2)
          // routing contract: registered codecs (claimed types, in
          // registration order) → JDK built-ins → deterministic stub
          val custom = plugged.iterator
            .filter(_.mediaTypes.contains(mediaType))
            .map(_.decode(payload))
            .collectFirst { case Some(f) => f }
          val feats = custom.getOrElse {
            if (mediaType == "image") decodeImage(payload).getOrElse(stubDecode(payload))
            else if (mediaType == "audio") decodeAudio(payload).getOrElse(stubDecode(payload))
            else if (mediaType == "video") decodeVideo(payload).getOrElse(stubDecode(payload))
            else stubDecode(payload)
          }
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
