package graft.tools

import java.awt.image.BufferedImage

import javax.imageio.ImageIO

/** One-shot generator for the committed animated-GIF test fixture
  * (`src/test/resources/fixtures/anim3.gif`): three 64×48 solid-gray
  * frames at luminance 32 / 128 / 224, written as one GIF sequence via
  * stock ImageIO. Kept in-tree as the fixture's provenance — rerunning
  * it reproduces the committed bytes.
  *
  * Run: sbt "runMain graft.tools.MakeGifFixture [outPath]"
  */
object MakeGifFixture {
  val Levels = Seq(32, 128, 224)

  def main(args: Array[String]): Unit = {
    val out = new java.io.File(
      if (args.nonEmpty) args(0)
      else "src/test/resources/fixtures/anim3.gif")
    out.getParentFile.mkdirs()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Levels.foreach { g =>
      val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- 0 until 48; x <- 0 until 64) img.setRGB(x, y, rgb)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    println(s"wrote ${out.getAbsolutePath} (${out.length()} bytes)")
  }
}
