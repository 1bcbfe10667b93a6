package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def media() = {
    import spark.implicits._
    Seq(
      (1L, "abcdef".getBytes("UTF-8"), "image", Some(4), Some(4), None: Option[Int], None: Option[Int]),
      (2L, Array[Byte](), "image", Some(0), Some(0), None, None),
      (3L, "0123456789".getBytes("UTF-8"), "video", None, None, None, Some(10)))
      .toDF("media_id", "payload", "media_type", "width", "height", "sample_rate", "n_frames")
  }

  test("extractFeatures: byte length, stable content hash, 8 stub features") {
    val f = Multimodal.extractFeatures(media()).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getInt(1) == 6)
    assert(f(2L).getInt(1) == 0)
    assert(f(1L).getSeq[Float](3).length == 8)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media()).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(f.map { case (k, v) => k -> v.getLong(2) } == again)
  }

  private def pngBytes(w: Int, h: Int)(color: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImage: real PNG decodes to a 64-cell luminance grid") {
    // left half black, right half white
    val png = pngBytes(32, 32)((x, _) => if (x < 16) 0x000000 else 0xffffff)
    val feats = Multimodal.decodeImage(png).get
    assert(feats.length == Multimodal.ImageGrid * Multimodal.ImageGrid)
    // cells in the left 4 columns ~0, right 4 columns ~1
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val v = feats(cy * 8 + cx)
      if (cx < 4) assert(v < 0.05, s"cell ($cx,$cy)=$v should be dark")
      else assert(v > 0.95, s"cell ($cx,$cy)=$v should be bright")
    }
    // non-image bytes: None (caller falls back to the stub tier)
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("extractFeatures routes decodable images through ImageIO, the rest through the stub") {
    import spark.implicits._
    val png = pngBytes(16, 16)((_, _) => 0x808080)
    val df = Seq(
      (10L, png, "image"), // real decode: 64 features
      (11L, png, "audio"), // same bytes, non-image type: stub 8
      (12L, "garbage".getBytes("UTF-8"), "image")) // undecodable image: stub 8
      .toDF("media_id", "payload", "media_type")
    val got = Multimodal.extractFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(got(10L).length == 64)
    assert(got(10L).forall(v => math.abs(v - 128.0 / 255.0) < 0.01))
    assert(got(11L).length == 8)
    assert(got(12L).length == 8)
  }

  private def wavBytes(
      freq: Double, secs: Double, rate: Float = 8000f, amp: Double = 0.5): Array[Byte] = {
    val n = (secs * rate).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeAudio: real WAV decodes to per-segment RMS + zero-crossing features") {
    val wav = wavBytes(440.0, 0.5)
    val feats = Multimodal.decodeAudio(wav).get
    assert(feats.length == Multimodal.AudioSegments * 2)
    val rms = 0.5 / math.sqrt(2) // pure sine: amp/√2 in every segment
    val zcr = 2 * 440.0 / 8000.0 // two crossings per cycle
    for (g <- 0 until Multimodal.AudioSegments) {
      assert(math.abs(feats(g) - rms) < 0.01, s"seg $g rms=${feats(g)}")
      assert(math.abs(feats(Multimodal.AudioSegments + g) - zcr) < 0.01,
        s"seg $g zcr=${feats(Multimodal.AudioSegments + g)}")
    }
    // non-audio bytes: None (caller falls back to the stub tier)
    assert(Multimodal.decodeAudio("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)
  }

  test("extractFeatures routes decodable WAV audio through javax.sound") {
    import spark.implicits._
    val df = Seq(
      (20L, wavBytes(440.0, 0.25), "audio"), // real decode: 16 features
      (21L, "not a wav".getBytes("UTF-8"), "audio")) // undecodable: stub 8
      .toDF("media_id", "payload", "media_type")
    val got = Multimodal.extractFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(got(20L).length == Multimodal.AudioSegments * 2)
    assert(got(21L).length == 8)
  }

  private def jpegBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Minimal MJPEG-in-AVI container: RIFF(AVI (LIST hdrl(avih), LIST
    * movi(00dc JPEG frames))) with little-endian sizes and word-aligned
    * chunks — the shape a real MJPEG capture produces.
    */
  private def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad: Array[Byte] = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ chunk("avih", new Array[Byte](56)))
    val movi = chunk(
      "LIST",
      "movi".getBytes("US-ASCII") ++ frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("decodeVideo: MJPEG-in-AVI decodes to sampled-frame cells + temporal profile") {
    val avi = aviBytes(Seq(
      jpegBytes(16, 16, 0x20), jpegBytes(16, 16, 0x80), jpegBytes(16, 16, 0xe0)))
    val feats = Multimodal.decodeVideo(avi).get
    assert(feats.length == 64 + Multimodal.VideoFrameSample)
    // cell means = average of the three gray frames (JPEG-lossy tolerance)
    val expectedMean = (0x20 + 0x80 + 0xe0) / 3.0 / 255.0
    for (i <- 0 until 64)
      assert(math.abs(feats(i) - expectedMean) < 0.05, s"cell $i=${feats(i)}")
    // temporal profile follows the dark → mid → bright frame order
    val profile = feats.drop(64)
    assert(profile(0) < profile(1) && profile(1) < profile(2))
    assert(profile.drop(3).forall(_ == 0.0f)) // unfilled sample slots
    // non-AVI / corrupt payloads: None (caller falls back to the stub tier)
    assert(Multimodal.decodeVideo("not a video".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeVideo(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeVideo(aviBytes(Seq("junk frame".getBytes("UTF-8")))).isEmpty)
  }

  test("extractFeatures routes MJPEG AVI video through the real decoder") {
    import spark.implicits._
    val avi = aviBytes(Seq(jpegBytes(16, 16, 0x40), jpegBytes(16, 16, 0xc0)))
    val df = Seq(
      (30L, avi, "video"), // real decode: 64 + 8 features
      (31L, "mp4-ish garbage".getBytes("UTF-8"), "video")) // undecodable: stub 8
      .toDF("media_id", "payload", "media_type")
    val got = Multimodal.extractFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(got(30L).length == 64 + Multimodal.VideoFrameSample)
    assert(got(31L).length == 8)
  }

  test("sampleFrameIndexes strides only video rows") {
    val idx = Multimodal.sampleFrameIndexes(media(), stride = 3).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue())).toSet
    assert(idx == Set((3L, 0L), (3L, 3L), (3L, 6L), (3L, 9L)))
  }

  test("resizeImage: real PNG area-averages to exact quadrant means at any target") {
    // quadrant image: TL black, TR white, BL white, BR black — a 2×2
    // resize must hit the exact per-quadrant means, an upscale to 3×3
    // must stay in [0,1] with the checker structure, and the center 3×3
    // cell (box spanning all four quadrants equally) must average ~0.5
    val png = pngBytes(32, 32)((x, y) =>
      if ((x < 16) == (y < 16)) 0x000000 else 0xffffff)
    val small = Multimodal.resizeImage(png, 2, 2).get
    assert(small.length == 4)
    assert(small(0) < 0.01 && small(3) < 0.01, small.toSeq.toString) // black quads
    assert(small(1) > 0.99 && small(2) > 0.99, small.toSeq.toString) // white quads
    val up = Multimodal.resizeImage(png, 3, 3).get
    assert(up.length == 9 && up.forall(v => v >= 0f && v <= 1f))
    assert(math.abs(up(4) - 0.5) < 0.05, s"center ${up(4)}") // spans all quadrants
    assert(Multimodal.resizeImage("not an image".getBytes("UTF-8"), 2, 2).isEmpty)
    // deterministic across calls (pure pixel function, no Graphics2D)
    assert(Multimodal.resizeImage(png, 5, 7).get.toSeq ==
      Multimodal.resizeImage(png, 5, 7).get.toSeq)
  }

  test("resizeRawGrid: plan-side nearest-neighbor selects the exact source bytes") {
    import spark.implicits._
    // 32-byte payload = a 16-wide, 2-row grid with distinct byte values;
    // resize to 2×2 must pick bytes at (row 0/1 via floor(r*2/2)=r,
    // col 0/8 via floor(c*16/2))
    val payload = (0 until 32).map(_.toByte).toArray
    val df = Seq((1L, payload), (2L, Array[Byte](1, 2, 3))) // doc 2: under one row — dropped
      .toDF("media_id", "payload")
    val got = Multimodal.resizeRawGrid(df, srcW = 16, outW = 2, outH = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, 0L, 0L), (1L, 0L, 1L, 8L),
      (1L, 1L, 0L, 16L), (1L, 1L, 1L, 24L)), got.toString)
  }

  // ------------------------------------------------- codec plug-point

  test("codec plug-point: a registered codec routes its media type, absent falls to stub") {
    import spark.implicits._
    val h264ish = Array[Byte](0x42, 1, 2, 3, 4) // magic the fake claims
    val unreadable = Array[Byte](9, 9, 9, 9, 9) // no codec reads this
    val df = Seq(
      (1L, h264ish, "video"), (2L, unreadable, "video"),
      (3L, h264ish, "image")) // fake claims ONLY video — image untouched
      .toDF("media_id", "payload", "media_type")

    Multimodal.clearCodecs()
    try {
      Multimodal.registerCodec(new FakeVideoCodec)
      val got = Multimodal.extractFeatures(df).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
      // claimed payload of a claimed type: the PLUGGED codec's output
      assert(got(1L) == Seq(7f, 7f, 7f), got(1L).toString)
      // claimed type, unreadable payload: codec declines -> stub tier
      assert(got(2L) == Multimodal.stubDecode(unreadable).toSeq, got(2L).toString)
      // unclaimed type never routes through the codec (magic or not):
      // ImageIO declines these bytes too, so it lands on the stub
      assert(got(3L) == Multimodal.stubDecode(h264ish).toSeq, got(3L).toString)
    } finally Multimodal.clearCodecs()

    // codec ABSENT: the same claimed payload now takes the stub tier —
    // the swap is the contract, not a recompile
    val bare = Multimodal.extractFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(bare(1L) == Multimodal.stubDecode(h264ish).toSeq, bare(1L).toString)
  }

  test("GIF codec: the committed 3-frame animated GIF decodes through registerCodec with real bytes") {
    import spark.implicits._
    import graft.operators.GifCodec
    val gif = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/fixtures/anim3.gif"))
    assert(GifCodec.frameCount(gif) == 3, "fixture must hold 3 frames")

    // direct decode: decodeVideo's 64+8 layout, with the three solid-gray
    // frames (32/128/224) appearing as the temporal profile lanes and
    // their average as every cell mean — real pixel values, not stub
    // byte statistics
    val direct = GifCodec.decode(gif).get
    assert(direct.length == 72, s"got ${direct.length} features")
    val exp = graft.tools.MakeGifFixture.Levels.map(_ / 255.0)
    exp.indices.foreach { i =>
      assert(math.abs(direct(64 + i) - exp(i)) < 2.0 / 255,
        s"profile lane $i: ${direct(64 + i)} vs ${exp(i)}")
    }
    (exp.length until 8).foreach(i =>
      assert(direct(64 + i) == 0f, s"unfilled lane $i nonzero"))
    val avg = exp.sum / exp.length
    (0 until 64).foreach(i =>
      assert(math.abs(direct(i) - avg) < 2.0 / 255, s"cell $i: ${direct(i)}"))
    // hash twin: the decode is a pure function of the bytes
    assert(java.util.Arrays.equals(direct, GifCodec.decode(gif).get))

    // the REGISTRATION path with real bytes: registered -> the codec's
    // output arrives through extractFeatures verbatim
    val df = Seq((1L, gif, "video")).toDF("media_id", "payload", "media_type")
    Multimodal.clearCodecs()
    try {
      Multimodal.registerCodec(GifCodec)
      val got = Multimodal.extractFeatures(df).collect().head.getSeq[Float](3)
      assert(got == direct.toSeq, "registered codec not routed")
    } finally Multimodal.clearCodecs()
    // absent: the AVI-only built-in declines a GIF payload of type
    // video, landing on the stub tier — the swap stays the contract
    val bare = Multimodal.extractFeatures(df).collect().head.getSeq[Float](3)
    assert(bare == Multimodal.stubDecode(gif).toSeq, "unregistered must stub")

    // real-bytes n_frames feeds the frame sampler (the mm_frames
    // operator): stride-2 over the codec-counted 3 frames = indexes 0, 2
    val media = Seq((7L, "video", GifCodec.frameCount(gif)))
      .toDF("media_id", "media_type", "n_frames")
    val idx = Multimodal.sampleFrameIndexes(media, stride = 2)
      .collect().map(_.getInt(1)).toSeq
    assert(idx == Seq(0, 2), idx.toString)
  }

  /** In-memory GIF with an explicit per-frame GIF89a disposalMethod —
    * the writer-side mirror of what [[graft.operators.GifCodec]] reads
    * back from the GraphicControlExtension node (r12 ADVICE: the
    * restore modes must actually composite, not silently degrade to
    * doNotDispose).
    */
  private def gifWithDisposal(
      frames: Seq[(java.awt.image.BufferedImage, String)]): Array[Byte] = {
    import javax.imageio.metadata.IIOMetadataNode
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (img, disposal) =>
      val spec = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
      val md = writer.getDefaultImageMetadata(spec, null)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val kids = tree.getChildNodes
      var gce: IIOMetadataNode = null
      var j = 0
      while (j < kids.getLength) {
        if (kids.item(j).getNodeName == "GraphicControlExtension")
          gce = kids.item(j).asInstanceOf[IIOMetadataNode]
        j += 1
      }
      if (gce == null) {
        gce = new IIOMetadataNode("GraphicControlExtension")
        tree.appendChild(gce)
      }
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", "0")
      md.setFromTree(fmt, tree)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    baos.toByteArray
  }

  private def solid(w: Int, h: Int, gray: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("GIF codec: restoreToBackgroundColor clears the frame rect between frames") {
    import graft.operators.GifCodec
    // f0: full-canvas gray 200, disposed to background (-> black);
    // f1: a 16x12 gray rect at (0,0) — 1/16 of the 64x48 canvas.
    // Disposal-correct: profile(1) ~ (200/255)/16 ~ 0.049.
    // Cumulative (the old bug): the rest of the canvas would still be
    // gray from f0 -> profile(1) ~ 0.784.
    val gif = gifWithDisposal(Seq(
      (solid(64, 48, 200), "restoreToBackgroundColor"),
      (solid(16, 12, 200), "doNotDispose")))
    val f = GifCodec.decode(gif).get
    val g = 200.0 / 255
    assert(math.abs(f(64) - g) < 2.0 / 255, s"profile(0)=${f(64)}")
    assert(math.abs(f(65) - g / 16) < 2.0 / 255,
      s"profile(1)=${f(65)} — background disposal must clear the f0 rect")
  }

  test("GIF codec: restoreToPrevious reverts the canvas to pre-frame pixels") {
    import graft.operators.GifCodec
    // f0: full gray 100 (kept); f1: full white, restored-to-previous
    // after rendering; f2: 16x12 black rect over the REVERTED canvas.
    // Disposal-correct: profile(2) ~ (100/255)*(15/16) ~ 0.368.
    // Cumulative: f2 would sit on the white f1 canvas -> ~ 0.9375.
    val gif = gifWithDisposal(Seq(
      (solid(64, 48, 100), "doNotDispose"),
      (solid(64, 48, 255), "restoreToPrevious"),
      (solid(16, 12, 0), "doNotDispose")))
    val f = GifCodec.decode(gif).get
    val g = 100.0 / 255
    assert(math.abs(f(64) - g) < 2.0 / 255, s"profile(0)=${f(64)}")
    assert(math.abs(f(65) - 1.0) < 2.0 / 255, s"profile(1)=${f(65)}")
    assert(math.abs(f(66) - g * 15 / 16) < 2.0 / 255,
      s"profile(2)=${f(66)} — previous disposal must revert the white frame")
  }
}

/** A stand-in for the missing H.264/MP3 decoders: claims video, reads
  * payloads starting with a magic byte, emits a recognizable vector.
  * Top-level (not an inner class) so the closure serializes without
  * dragging the spec instance along — exactly what a real codec
  * binding must satisfy too (Codec extends Serializable).
  */
private class FakeVideoCodec extends Multimodal.Codec {
  def mediaTypes: Set[String] = Set("video")
  def decode(payload: Array[Byte]): Option[Array[Float]] =
    if (payload.nonEmpty && payload(0) == 0x42.toByte)
      Some(Array(7f, 7f, 7f)) // the marker the spec looks for
    else None
}
