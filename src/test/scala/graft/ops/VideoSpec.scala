package graft.ops

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** The real-video-decode contract (Multimodal.videoFrames /
  * decodeVideoFrames): every frame of a multi-image container decodes
  * to a FULLY-COMPOSED logical-screen frame — delta-encoded GIFs
  * (dirty-rectangle frames at nonzero offsets, disposal semantics)
  * must come out as what a player renders, because every downstream
  * frame op (featureExtract, aHash, featureGrid dedup) assumes whole
  * images. The delta fixtures are hand-built through the JDK GIF
  * writer with explicit per-frame ImageDescriptor offsets and
  * GraphicControlExtension disposal — the exact metadata the
  * compositor reads back.
  */
class VideoSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  /** Decode one composed frame's pixel (x, y) as its red channel
    * (fixtures are gray: R = G = B). */
  private def px(img: BufferedImage, x: Int, y: Int): Int =
    (img.getRGB(x, y) >> 16) & 255

  /** Hand-built GIF with explicit per-frame placement + disposal:
    * frames are (image, left, top, disposalMethod). Frame 0 should be
    * full-size — the writer derives the logical screen from it.
    */
  private def gifWithGeometry(
      frames: Seq[(BufferedImage, Int, Int, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach { case (img, left, top, disposal) =>
        val itype =
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
        val md = w.getDefaultImageMetadata(itype, null)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = md.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        // the default LocalColorTable node does NOT round-trip through
        // setFromTree faithfully (observed: gray 100 → 102, 200 → 255);
        // dropping it makes the writer take the palette from the
        // image's own IndexColorModel, which is exact
        val lct = root.getElementsByTagName("LocalColorTable")
        if (lct.getLength > 0) root.removeChild(lct.item(0))
        def node(tag: String): javax.imageio.metadata.IIOMetadataNode = {
          val nl = root.getElementsByTagName(tag)
          if (nl.getLength > 0)
            nl.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          else {
            val n = new javax.imageio.metadata.IIOMetadataNode(tag)
            root.appendChild(n)
            n
          }
        }
        val desc = node("ImageDescriptor")
        desc.setAttribute("imageLeftPosition", left.toString)
        desc.setAttribute("imageTopPosition", top.toString)
        desc.setAttribute("imageWidth", img.getWidth.toString)
        desc.setAttribute("imageHeight", img.getHeight.toString)
        desc.setAttribute("interlaceFlag", "FALSE")
        val gce = node("GraphicControlExtension")
        gce.setAttribute("disposalMethod", disposal)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        md.setFromTree(fmt, root)
        w.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  behavior of "Multimodal.decodeVideoFrames (JDK multi-frame decode)"

  it must "decode every frame of a synthetic GIF to its exact gray level" in {
    val (seed, w, h, nf) = (7L, 20, 12, 5)
    val frames =
      Multimodal.decodeVideoFrames(Multimodal.syntheticGif(seed, w, h, nf))
        .toSeq
    frames.map(_._1) must be(0 until nf)
    frames.foreach { case (f, img) =>
      img.getWidth must be(w)
      img.getHeight must be(h)
      val g = Multimodal.grayLevel(seed, f)
      // the indexed 256-gray palette stores levels exactly — every
      // pixel of frame f must be the construction formula's gray
      for (y <- Seq(0, h / 2, h - 1); x <- Seq(0, w / 2, w - 1))
        px(img, x, y) must be(g)
    }
  }

  it must "compose a delta frame at its ImageDescriptor offset onto the carried canvas" in {
    // frame 0: full 16x10 at gray 100; frame 1: a 4x3 patch at
    // (5, 2), gray 200, doNotDispose. A player shows frame 1 as
    // frame 0 with the patch painted in — NOT a 4x3 image.
    val bytes = gifWithGeometry(Seq(
      (Multimodal.solidGrayFrame(16, 10, 100), 0, 0, "doNotDispose"),
      (Multimodal.solidGrayFrame(4, 3, 200), 5, 2, "doNotDispose")))
    val frames = Multimodal.decodeVideoFrames(bytes).toSeq
    frames.length must be(2)
    val f1 = frames(1)._2
    f1.getWidth must be(16)
    f1.getHeight must be(10)
    // inside the patch
    px(f1, 5, 2) must be(200)
    px(f1, 8, 4) must be(200)
    // outside the patch: the carried frame-0 canvas
    px(f1, 0, 0) must be(100)
    px(f1, 15, 9) must be(100)
    px(f1, 4, 2) must be(100)
    px(f1, 9, 2) must be(100)
  }

  it must "clear the frame rect on restoreToBackgroundColor before the next frame" in {
    // frame 1's rect is disposed to background (black) before frame 2
    // lands elsewhere — frame 2 must show black where frame 1 was.
    val bytes = gifWithGeometry(Seq(
      (Multimodal.solidGrayFrame(16, 10, 100), 0, 0, "doNotDispose"),
      (Multimodal.solidGrayFrame(4, 3, 200), 5, 2, "restoreToBackgroundColor"),
      (Multimodal.solidGrayFrame(2, 2, 50), 0, 0, "doNotDispose")))
    val frames = Multimodal.decodeVideoFrames(bytes).toSeq
    frames.length must be(3)
    val f2 = frames(2)._2
    px(f2, 0, 0) must be(50) // the new frame
    px(f2, 6, 3) must be(0) // disposed rect → background
    px(f2, 14, 8) must be(100) // untouched frame-0 canvas
  }

  it must "restore disposal-2 rects to the logical screen's NON-BLACK background color" in {
    // r13 stretch: disposal-2 used a deterministic black fill; GIF89a
    // says the fill is the global color table entry the logical screen
    // descriptor's backgroundColorIndex names. Build a stream whose
    // global palette entry 7 is gray 180 and set it as the background;
    // the disposed rect must read back 180, not 0.
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      w.setOutput(ios)
      val f0 = Multimodal.solidGrayFrame(16, 10, 100)
      val itype =
        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(f0)
      val smd = w.getDefaultStreamMetadata(null)
      val sfmt = "javax_imageio_gif_stream_1.0"
      val sroot = smd.getAsTree(sfmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val old = sroot.getElementsByTagName("GlobalColorTable")
      if (old.getLength > 0) sroot.removeChild(old.item(0))
      val gct = new javax.imageio.metadata.IIOMetadataNode("GlobalColorTable")
      gct.setAttribute("sizeOfGlobalColorTable", "256")
      gct.setAttribute("backgroundColorIndex", "7")
      gct.setAttribute("sortFlag", "FALSE")
      (0 until 256).foreach { i =>
        val e = new javax.imageio.metadata.IIOMetadataNode("ColorTableEntry")
        e.setAttribute("index", i.toString)
        // entry 7 carries the distinguished background gray 180; the
        // rest is the identity gray ramp the frames already use
        val g = if (i == 7) 180 else i
        e.setAttribute("red", g.toString)
        e.setAttribute("green", g.toString)
        e.setAttribute("blue", g.toString)
        gct.appendChild(e)
      }
      sroot.appendChild(gct)
      smd.setFromTree(sfmt, sroot)
      w.prepareWriteSequence(smd)
      Seq(
        (f0, 0, 0, "doNotDispose"),
        (Multimodal.solidGrayFrame(4, 3, 200), 5, 2,
          "restoreToBackgroundColor"),
        (Multimodal.solidGrayFrame(2, 2, 50), 0, 0, "doNotDispose"))
        .foreach { case (img, left, top, disposal) =>
          val md = w.getDefaultImageMetadata(
            javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
            null)
          val fmt = "javax_imageio_gif_image_1.0"
          val root = md.getAsTree(fmt)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val lct = root.getElementsByTagName("LocalColorTable")
          if (lct.getLength > 0) root.removeChild(lct.item(0))
          def node(tag: String): javax.imageio.metadata.IIOMetadataNode = {
            val nl = root.getElementsByTagName(tag)
            if (nl.getLength > 0)
              nl.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            else {
              val n = new javax.imageio.metadata.IIOMetadataNode(tag)
              root.appendChild(n)
              n
            }
          }
          val desc = node("ImageDescriptor")
          desc.setAttribute("imageLeftPosition", left.toString)
          desc.setAttribute("imageTopPosition", top.toString)
          desc.setAttribute("imageWidth", img.getWidth.toString)
          desc.setAttribute("imageHeight", img.getHeight.toString)
          desc.setAttribute("interlaceFlag", "FALSE")
          val gce = node("GraphicControlExtension")
          gce.setAttribute("disposalMethod", disposal)
          gce.setAttribute("userInputFlag", "FALSE")
          gce.setAttribute("transparentColorFlag", "FALSE")
          gce.setAttribute("delayTime", "10")
          gce.setAttribute("transparentColorIndex", "0")
          md.setFromTree(fmt, root)
          w.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
        }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    val frames = Multimodal.decodeVideoFrames(bos.toByteArray).toSeq
    frames.length must be(3)
    val f2 = frames(2)._2
    px(f2, 0, 0) must be(50) // the new frame
    px(f2, 6, 3) must be(180) // disposed rect → the PALETTE background
    px(f2, 14, 8) must be(100) // untouched frame-0 canvas
  }

  it must "roll the canvas back on restoreToPrevious" in {
    val bytes = gifWithGeometry(Seq(
      (Multimodal.solidGrayFrame(16, 10, 100), 0, 0, "doNotDispose"),
      (Multimodal.solidGrayFrame(4, 3, 200), 5, 2, "restoreToPrevious"),
      (Multimodal.solidGrayFrame(2, 2, 50), 10, 6, "doNotDispose")))
    val frames = Multimodal.decodeVideoFrames(bytes).toSeq
    val f2 = frames(2)._2
    // frame 1's patch rolled back to frame 0's gray, not 200
    px(f2, 6, 3) must be(100)
    px(f2, 10, 6) must be(50)
  }

  it must "roll back to the PRE-DRAW canvas on restoreToPrevious after a disposing frame" in {
    // GIF89a disposal 3 restores the canvas state prior to rendering
    // the current frame — which differs from the previous EMITTED
    // frame whenever frame i-1 itself disposed. Frame 1 disposes its
    // rect to background; frame 2 (restoreToPrevious) must roll back
    // to [frame 0 + black rect], not to emitted frame 1 (which still
    // showed the 200 patch). Frame 3 then reads the rolled-back canvas.
    val bytes = gifWithGeometry(Seq(
      (Multimodal.solidGrayFrame(16, 10, 100), 0, 0, "doNotDispose"),
      (Multimodal.solidGrayFrame(4, 3, 200), 5, 2, "restoreToBackgroundColor"),
      (Multimodal.solidGrayFrame(2, 2, 50), 0, 0, "restoreToPrevious"),
      (Multimodal.solidGrayFrame(2, 2, 220), 12, 8, "doNotDispose")))
    val frames = Multimodal.decodeVideoFrames(bytes).toSeq
    frames.length must be(4)
    val f2 = frames(2)._2
    px(f2, 0, 0) must be(50) // frame 2's own patch
    px(f2, 6, 3) must be(0) // frame 1's rect already disposed to black
    val f3 = frames(3)._2
    px(f3, 12, 8) must be(220) // frame 3's own patch
    px(f3, 0, 0) must be(100) // frame 2's patch rolled back to frame 0
    // the load-bearing pixel: pre-draw rollback keeps frame 1's rect
    // BLACK; restoring emitted frame i-2 would resurrect the 200 patch
    px(f3, 6, 3) must be(0)
  }

  it must "decode other multi-image containers (multi-page TIFF) through the same loop" in {
    // the scaladoc's TIFF claim, pinned: the stock JDK ships a TIFF
    // plugin, frames carry no GIF geometry (zero offsets, disposal
    // none), so each page decodes to its own full frame
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      for (g <- Seq(30, 90, 150))
        w.writeToSequence(new javax.imageio.IIOImage(
          Multimodal.solidGrayFrame(12, 7, g), null, null), null)
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    val frames = Multimodal.decodeVideoFrames(bos.toByteArray).toSeq
    frames.map(_._1) must be(0 until 3)
    frames.zip(Seq(30, 90, 150)).foreach { case ((_, img), g) =>
      (img.getWidth, img.getHeight) must be((12, 7))
      px(img, 0, 0) must be(g)
      px(img, 11, 6) must be(g)
    }
  }

  it must "cap a many-frame payload at maxFrames and drop undecodable payloads" in {
    val bytes = Multimodal.syntheticGif(3L, 8, 8, 9)
    Multimodal.decodeVideoFrames(bytes, maxFrames = 4).length must be(4)
    Multimodal.decodeVideoFrames("not a video".getBytes).toSeq must be(empty)
    Multimodal.decodeVideoFrames(Array.emptyByteArray).toSeq must be(empty)
  }

  behavior of "Multimodal.videoFrames (frames as first-class image rows)"

  it must "explode videos into per-frame PNG rows the image machinery reads back" in {
    val s = spark
    import s.implicits._
    val bin = Seq(
      ("/vid/0", Multimodal.syntheticGif(0L, 10, 6, 3)),
      ("/vid/1", Multimodal.syntheticGif(1L, 8, 8, 2)),
      ("/vid/junk", "not a video".getBytes))
      .toDF("path", "data")
    val frames = Multimodal.videoFrames(bin)
    val rows = frames.orderBy("path", "frame_idx").collect()
    rows.map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSeq must be(Seq(
        ("/vid/0", 0, 10, 6), ("/vid/0", 1, 10, 6), ("/vid/0", 2, 10, 6),
        ("/vid/1", 0, 8, 8), ("/vid/1", 1, 8, 8)))
    // a frame row IS an image row: featureGrid's real decode over the
    // re-encoded PNG recovers the construction gray exactly
    val stats = Multimodal.featureGrid(
        frames.select(
          concat(col("path"), lit("#"), col("frame_idx")).as("path"),
          col("frame").as("data")),
        grid = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    for (f <- 0 until 3) {
      val g = Multimodal.grayLevel(0L, f).toLong * 10 * 6
      stats("/vid/0#" + f) must be((g, g, g))
    }
    for (f <- 0 until 2) {
      val g = Multimodal.grayLevel(1L, f).toLong * 8 * 8
      stats("/vid/1#" + f) must be((g, g, g))
    }
  }
}
