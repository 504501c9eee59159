package graft

import graft.operators.{MediaHeaders, MultimodalOps}
import graft.operators.MultimodalOps.MediaRow
import org.apache.spark.sql.functions._

/** Byte-level media header codecs (generator must round-trip through the
  * parser), decode totality on malformed blobs, and the byte-balancing
  * repartition contract under pathological size skew.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("PNG header round-trips and parses at the spec offsets") {
    val b = MediaHeaders.pngBytes(1920, 1080) ++ "payload".getBytes
    assert(MediaHeaders.png(b).contains((1920, 1080, 33)))
    // signature + IHDR really is 33 bytes; CRC32 is the real one
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 17)
    assert(java.nio.ByteBuffer.wrap(b, 29, 4).getInt == crc.getValue.toInt)
  }

  test("JPEG SOF0 walk skips leading segments and reads dims") {
    val plain = MediaHeaders.jpegBytes(640, 480)
    assert(MediaHeaders.jpeg(plain).contains((640, 480, 15)))
    // insert an APP0 segment between SOI and SOF0 — the walk must skip it
    val app0 = Array(0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46).map(_.toByte)
    val shifted = plain.take(2) ++ app0 ++ plain.drop(2)
    assert(MediaHeaders.jpeg(shifted).contains((640, 480, 21)))
  }

  test("WAV fmt chunk parses channels and sample rate, canonical 44-byte header") {
    val b = MediaHeaders.wavBytes(2, 44100, 1000) ++
      Array.fill(1000)(7.toByte)
    assert(MediaHeaders.wav(b).contains((2, 44100, 44)))
  }

  test("parsers are total: malformed and truncated blobs yield None") {
    val junk = "definitely not media".getBytes
    assert(MediaHeaders.png(junk).isEmpty)
    assert(MediaHeaders.jpeg(junk).isEmpty)
    assert(MediaHeaders.wav(junk).isEmpty)
    assert(MediaHeaders.png(MediaHeaders.pngBytes(8, 8).take(20)).isEmpty)
    assert(MediaHeaders.jpeg(Array(0xff, 0xd8).map(_.toByte)).isEmpty)
    assert(MediaHeaders.wav(MediaHeaders.wavBytes(1, 8000, 9).take(30))
      .isEmpty)
    assert(Seq(junk, Array.emptyByteArray).forall { bytes =>
      val f = MultimodalOps.Decoder.decode(MediaRow(1L, "image", bytes))
      f.width == 0 && f.sample_rate == 0 // no header → no crash, zeros
    })
  }

  test("poison container sizes: no hang, no out-of-bounds, decode drops to zeros") {
    // WAV with a leading chunk whose LE size is -8: naive `i += 8 + size`
    // is a no-op → infinite loop. Must return None promptly instead.
    val loopWav = ("RIFF".getBytes("US-ASCII") :+ 0.toByte) ++
      Array[Byte](0, 0, 0) ++ "WAVE".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      Array.fill(24)(0.toByte)
    assert(MediaHeaders.wav(loopWav).isEmpty)
    // fmt chunk size larger than the buffer: header length must never
    // point past the end (decode would crash in copyOfRange)
    val overWav = MediaHeaders.wavBytes(1, 8000, 4).take(20) ++
      Array.fill(20)(0.toByte)
    assert(MediaHeaders.wav(overWav).forall(_._3 <= overWav.length))
    // JPEG SOF0 declaring a 0xFFFF segment length on an 11-byte buffer
    val lyingJpeg = Array(0xff, 0xd8, 0xff, 0xc0, 0xff, 0xff,
      1, 2, 3, 4, 5).map(_.toByte)
    assert(MediaHeaders.jpeg(lyingJpeg).isEmpty)
    // all three poison shapes survive the full decode as droppable zeros
    for (bytes <- Seq(loopWav, lyingJpeg)) {
      val f = MultimodalOps.Decoder.decode(MediaRow(9L, "image", bytes))
      assert(f.width == 0 && f.sample_rate == 0 && f.n_bytes == bytes.length)
    }
  }

  test("WAV overflow-sized chunk and JPEG standalone markers stay total") {
    // positive chunk size near Int.MaxValue: `i + 8 + size` wraps
    // negative, so a naive `> b.length` check passes and the walk
    // indexes with a negative offset — must return None, never throw
    def withChunkSize(size: Int): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](36, 0, 0, 0) ++
        "WAVE".getBytes("US-ASCII") ++ "LIST".getBytes("US-ASCII") ++
        java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(size).array() ++
        Array.fill(24)(0.toByte)
    assert(MediaHeaders.wav(withChunkSize(0x7ffffff0)).isEmpty)
    assert(MediaHeaders.wav(withChunkSize(Int.MaxValue)).isEmpty)
    // same overflow declared on the fmt chunk itself
    val overFmt = withChunkSize(0).patch(12,
      "fmt ".getBytes("US-ASCII") ++ java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(0x7ffffff0).array(),
      8)
    assert(MediaHeaders.wav(overFmt).isEmpty)
    // JPEG: 0xFF fill bytes, TEM (01) and RST0 (D0) standalone markers
    // before SOF0 carry no length field — a walk reading their payload
    // bytes as a segment length would misparse this valid stream
    val standalone = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0x01,
      0xff, 0xd0).map(_.toByte) ++ MediaHeaders.jpegBytes(320, 200).drop(2)
    assert(MediaHeaders.jpeg(standalone).map(d => (d._1, d._2))
      .contains((320, 200)))
    // EOI before any SOF: stream has no frame header
    val eoiFirst = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte) ++
      MediaHeaders.jpegBytes(320, 200).drop(2)
    assert(MediaHeaders.jpeg(eoiFirst).isEmpty)
    // every poison shape survives the full decode as droppable zeros
    for (bytes <- Seq(withChunkSize(0x7ffffff0), overFmt, eoiFirst)) {
      val f = MultimodalOps.Decoder.decode(MediaRow(9L, "audio", bytes))
      assert(f.sample_rate == 0 && f.width == 0)
    }
  }

  test("WAV chunk walk honors the RIFF pad byte after odd-sized chunks") {
    // odd-sized LIST chunk before fmt: the size field excludes the pad
    // byte, so a walk ignoring alignment reads garbage chunk ids
    val fmtTail = MediaHeaders.wavBytes(2, 22050, 7).drop(12) // fmt+data
    val infoOdd = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](73, 78, 70) :+ 0.toByte // pad
    val riffLen = 4 + infoOdd.length + fmtTail.length
    val b = "RIFF".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(riffLen).array() ++
      "WAVE".getBytes("US-ASCII") ++ infoOdd ++ fmtTail
    assert(MediaHeaders.wav(b).map(f => (f._1, f._2)).contains((2, 22050)))
  }

  test("decode falls back to header fields when the payload is unreadable") {
    val payload = "media payload".getBytes("UTF-8")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    // a PNG header on a non-PNG payload: no pixels decode (n_frames 0),
    // but the header dims still come back and the payload is hashed
    val png = MultimodalOps.Decoder.decode(
      MediaRow(1L, "image", MediaHeaders.pngBytes(320, 200) ++ payload))
    assert(png.width == 320 && png.height == 200 && png.n_frames == 0)
    assert(png.format == "png-header" && png.px_sum.isEmpty)
    assert(png.payload_sha256.contains(sha) &&
      png.n_bytes == 33L + payload.length)
    val wav = MultimodalOps.Decoder.decode(
      MediaRow(2L, "audio", MediaHeaders.wavBytes(1, 16000, payload.length)
        ++ payload))
    assert(wav.channels == 1 && wav.sample_rate == 16000 && wav.width == 0)
    assert(wav.format == "wav" && wav.payload_sha256.contains(sha))
  }

  test("PNG round-trips losslessly through ImageCodec and the feature decode") {
    import graft.operators.ImageCodec
    val px = (x: Int, y: Int) => MultimodalOps.fixturePixel(42L, 0, x, y)
    val bytes = ImageCodec.encodePng(20, 14)(px)
    val img = ImageCodec.decodeGray(bytes).get
    assert(img.width == 20 && img.height == 14 && img.format == "png")
    assert(img.frames.length == 1)
    assert(img.frames.head.zipWithIndex.forall {
      case (v, i) => v == px(i % 20, i / 20)
    }, "PNG decode is not bit-exact against the painted pixels")
    // the Decoder's moments are the exact sums over those pixels
    val expSum = (for (y <- 0 until 14; x <- 0 until 20)
      yield px(x, y).toLong).sum
    val expSq = (for (y <- 0 until 14; x <- 0 until 20)
      yield { val v = px(x, y).toLong; v * v }).sum
    val f = MultimodalOps.Decoder.decode(MediaRow(42L, "image", bytes))
    assert(f.format == "png" && f.n_frames == 1)
    assert(f.px_sum.contains(expSum) && f.px_sq.contains(expSq))
    assert(f.payload_sha256.isEmpty)
  }

  test("animated GIF round-trips losslessly frame by frame, n_frames is real") {
    import graft.operators.ImageCodec
    val px = (f: Int, x: Int, y: Int) => MultimodalOps.fixturePixel(7L, f, x, y)
    val bytes = ImageCodec.encodeGif(11, 9, 3)(px)
    val img = ImageCodec.decodeGray(bytes).get
    assert(img.width == 11 && img.height == 9 && img.format == "gif")
    assert(img.frames.length == 3)
    for (f <- 0 until 3)
      assert(img.frames(f).zipWithIndex.forall {
        case (v, i) => v == px(f, i % 11, i / 11)
      }, s"GIF frame $f is not bit-exact against the painted pixels")
    val feat = MultimodalOps.Decoder.decode(MediaRow(7L, "video", bytes))
    assert(feat.format == "gif" && feat.n_frames == 3)
  }

  test("JPEG decodes real pixels with exact dims (values are not pinned)") {
    import graft.operators.ImageCodec
    val bytes = ImageCodec.encodeJpeg(24, 16)((x, y) => (x * 9 + y) % 256)
    val img = ImageCodec.decodeGray(bytes).get
    assert(img.width == 24 && img.height == 16 && img.format == "jpeg")
    assert(img.frames.head.length == 24 * 16)
    assert(img.frames.head.forall(v => v >= 0 && v <= 255))
    // lossy: the Decoder must NOT claim exact moments for JPEG
    val f = MultimodalOps.Decoder.decode(MediaRow(3L, "image", bytes))
    assert(f.format == "jpeg" && f.px_sum.isEmpty && f.px_sq.isEmpty)
  }

  test("optimized GIF with a shrunken later frame composites onto the previous screen") {
    import graft.operators.ImageCodec
    // a sequence whose second frame is a smaller sub-raster — the shape
    // real GIF optimizers emit: the codec must RENDER it (patch over
    // the retained previous frame), not index it as a full screen
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    def f1(x: Int, y: Int) = (x + y) % 256
    def f2(x: Int, y: Int) = (200 + 13 * x + 7 * y) % 256
    def gray(w: Int, h: Int, px: (Int, Int) => Int) = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        im.getRaster.setSample(x, y, 0, px(x, y))
      im
    }
    // the JDK gif writer mis-writes interlaced rows for frames shorter
    // than the 8-row interlace stride — force interlace off (real
    // optimizers emit non-interlaced patches anyway)
    def plainMeta(img: java.awt.image.BufferedImage) = {
      val m = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), null)
      val fmtName = "javax_imageio_gif_image_1.0"
      val root = m.getAsTree(fmtName)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val kids = root.getChildNodes
      (0 until kids.getLength).map(kids.item).foreach {
        case n: javax.imageio.metadata.IIOMetadataNode
            if n.getNodeName == "ImageDescriptor" =>
          n.setAttribute("interlaceFlag", "FALSE")
        case _ => ()
      }
      m.setFromTree(fmtName, root)
      m
    }
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val im1 = gray(10, 8, f1)
      writer.writeToSequence(
        new javax.imageio.IIOImage(im1, null, plainMeta(im1)), null)
      val im2 = gray(4, 3, f2)
      writer.writeToSequence(
        new javax.imageio.IIOImage(im2, null, plainMeta(im2)), null)
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    val img = ImageCodec.decodeGray(bos.toByteArray).get
    assert(img.width == 10 && img.height == 8 && img.frames.length == 2)
    for (y <- 0 until 8; x <- 0 until 10) {
      assert(img.frames(0)(y * 10 + x) == f1(x, y))
      val want = if (x < 4 && y < 3) f2(x, y) else f1(x, y)
      assert(img.frames(1)(y * 10 + x) == want,
        s"composited frame 2 wrong at ($x,$y)")
    }
  }

  test("decompression bomb: a 44-byte GIF declaring 65535x65535 is rejected before allocating") {
    import graft.operators.ImageCodec
    // hand-built GIF whose descriptors self-declare 65535×65535 (17 GB
    // of Int pixels) over ~2 bytes of actual data — the classic bomb
    // shape. The cap must reject it from the HEADER dims, returning
    // None without touching a pixel array; the pre-cap code allocated
    // first and died on OutOfMemoryError, which the totality catch
    // (deliberately) does not swallow.
    def u16(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val bomb = ("GIF89a".getBytes("US-ASCII").toSeq ++
      u16(0xffff) ++ u16(0xffff) ++ // logical screen 65535×65535
      Seq(0x80.toByte, 0.toByte, 0.toByte) ++ // GCT flag, 2-entry table
      Seq(0, 0, 0, 255, 255, 255).map(_.toByte) ++ // the GCT
      Seq(0x2c.toByte) ++ u16(0) ++ u16(0) ++ // image descriptor at (0,0)
      u16(0xffff) ++ u16(0xffff) ++ Seq(0x00.toByte) ++ // image 65535×65535
      Seq(0x02.toByte, 0x02.toByte, 0x4c.toByte, 0x01.toByte) ++ // LZW stub
      Seq(0x00.toByte, 0x3b.toByte)).toArray // block terminator + trailer
    // the reader must genuinely see the declared dims (else the test is
    // vacuous — a reader that rejects the container outright would pass
    // without exercising the cap)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bomb))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getWidth(0) == 65535 && reader.getHeight(0) == 65535)
    reader.dispose(); iis.close()
    assert(ImageCodec.decodeGray(bomb).isEmpty)
    // variant: tiny DECLARED screen (passes the pixel cap) but a huge
    // frame raster — must reject on the frame-rect header check before
    // the reader can allocate the raster
    val rectBomb = ("GIF89a".getBytes("US-ASCII").toSeq ++
      u16(4) ++ u16(3) ++ // logical screen 4×3
      Seq(0x80.toByte, 0.toByte, 0.toByte) ++
      Seq(0, 0, 0, 255, 255, 255).map(_.toByte) ++
      Seq(0x2c.toByte) ++ u16(0) ++ u16(0) ++
      u16(0xffff) ++ u16(0xffff) ++ Seq(0x00.toByte) ++ // frame 65535²
      Seq(0x02.toByte, 0x02.toByte, 0x4c.toByte, 0x01.toByte) ++
      Seq(0x00.toByte, 0x3b.toByte)).toArray
    assert(ImageCodec.decodeGray(rectBomb).isEmpty)
    // sanity: the cap is about total pixels, not container validity — a
    // modest image decodes as before
    assert(ImageCodec.decodeGray(
      ImageCodec.encodePng(64, 64)((x, y) => x ^ y)).isDefined)
  }

  test("optimized GIF with an OFFSET sub-raster frame composites at its declared position") {
    import graft.operators.ImageCodec
    import javax.imageio.metadata.IIOMetadataNode
    // a real GIF optimizer stores frame 2 as a smaller raster at a
    // nonzero (left, top) offset to be composited per disposal
    // metadata — write exactly that through the writer's image
    // metadata, then require the codec to render the patch at its
    // offset over the retained previous frame
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    def gray(w: Int, h: Int) = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        im.getRaster.setSample(x, y, 0, (7 * x + 3 * y) % 256)
      im
    }
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      writer.writeToSequence(
        new javax.imageio.IIOImage(gray(10, 8), null, null), null)
      val sub = gray(4, 3)
      val spec = new javax.imageio.ImageTypeSpecifier(sub)
      val meta = writer.getDefaultImageMetadata(spec, null)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val kids = root.getChildNodes
      val desc = (0 until kids.getLength).map(kids.item)
        .collectFirst { case n: IIOMetadataNode
          if n.getNodeName == "ImageDescriptor" => n }
        .getOrElse {
          val d = new IIOMetadataNode("ImageDescriptor")
          root.appendChild(d); d
        }
      desc.setAttribute("imageLeftPosition", "3")
      desc.setAttribute("imageTopPosition", "2")
      desc.setAttribute("imageWidth", "4")
      desc.setAttribute("imageHeight", "3")
      desc.setAttribute("interlaceFlag", "FALSE")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(sub, null, meta),
        null)
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    val bytes = bos.toByteArray
    // verify the fixture really carries the offset sub-raster
    val iis2 = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis2).next()
    reader.setInput(iis2)
    assert(reader.getNumImages(true) == 2)
    assert(reader.getWidth(1) == 4 && reader.getHeight(1) == 3)
    reader.dispose(); iis2.close()
    val img = ImageCodec.decodeGray(bytes).get
    def f(x: Int, y: Int) = (7 * x + 3 * y) % 256
    assert(img.width == 10 && img.height == 8 && img.frames.length == 2)
    for (y <- 0 until 8; x <- 0 until 10) {
      val want =
        if (x >= 3 && x < 7 && y >= 2 && y < 5) f(x - 3, y - 2) // the patch
        else f(x, y) // previous frame shows through around it
      assert(img.frames(1)(y * 10 + x) == want,
        s"offset composite wrong at ($x,$y)")
    }
  }

  test("GIF restore-to-background disposal clears the frame rect before the next draw") {
    import graft.operators.ImageCodec
    import javax.imageio.metadata.IIOMetadataNode
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    def gray(w: Int, h: Int, v: Int) = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        im.getRaster.setSample(x, y, 0, v)
      im
    }
    def metaFor(img: java.awt.image.BufferedImage, left: Int, top: Int,
        disposal: String) = {
      val spec = new javax.imageio.ImageTypeSpecifier(img)
      val m = writer.getDefaultImageMetadata(spec, null)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = m.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val kids = root.getChildNodes
      (0 until kids.getLength).map(kids.item).foreach {
        case n: IIOMetadataNode if n.getNodeName == "ImageDescriptor" =>
          n.setAttribute("imageLeftPosition", left.toString)
          n.setAttribute("imageTopPosition", top.toString)
          // the JDK writer mis-writes interlaced rows on sub-8-row frames
          n.setAttribute("interlaceFlag", "FALSE")
        case _ => ()
      }
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      m.setFromTree(fmt, root)
      m
    }
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val base = gray(6, 4, 100)
      writer.writeToSequence(new javax.imageio.IIOImage(base, null,
        metaFor(base, 0, 0, "none")), null)
      val patch = gray(2, 2, 200)
      writer.writeToSequence(new javax.imageio.IIOImage(patch, null,
        metaFor(patch, 1, 1, "restoreToBackgroundColor")), null)
      val dot = gray(1, 1, 50)
      writer.writeToSequence(new javax.imageio.IIOImage(dot, null,
        metaFor(dot, 0, 0, "none")), null)
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    val img = ImageCodec.decodeGray(bos.toByteArray).get
    assert(img.width == 6 && img.height == 4 && img.frames.length == 3)
    def px(f: Int, x: Int, y: Int) = img.frames(f)(y * 6 + x)
    for (y <- 0 until 4; x <- 0 until 6) {
      assert(px(0, x, y) == 100)
      val inPatch = x >= 1 && x < 3 && y >= 1 && y < 3
      assert(px(1, x, y) == (if (inPatch) 200 else 100))
      // frame 3 renders AFTER frame 2's rect restored to background (0)
      val want3 =
        if (x == 0 && y == 0) 50
        else if (inPatch) 0
        else 100
      assert(px(2, x, y) == want3, s"disposal composite wrong at ($x,$y)")
    }
  }

  test("restoreToBackgroundColor honors a non-black LSD background index") {
    // Same 3-frame disposal layout as the test above, but the stream
    // declares a global palette whose backgroundColorIndex points at
    // gray 200 — the restored rect must read 200, not 0 (r12 verdict
    // ask #6: the LSD background is pixel-defined when a global palette
    // exists, and clear-to-0 was a grayscale-world shortcut).
    import javax.imageio.metadata.IIOMetadataNode
    import graft.operators.ImageCodec
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    def gray(w: Int, h: Int, v: Int) = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        im.getRaster.setSample(x, y, 0, v)
      im
    }
    def metaFor(img: java.awt.image.BufferedImage, left: Int, top: Int,
        disposal: String) = {
      val spec = new javax.imageio.ImageTypeSpecifier(img)
      val m = writer.getDefaultImageMetadata(spec, null)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = m.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val kids = root.getChildNodes
      (0 until kids.getLength).map(kids.item).foreach {
        case n: IIOMetadataNode if n.getNodeName == "ImageDescriptor" =>
          n.setAttribute("imageLeftPosition", left.toString)
          n.setAttribute("imageTopPosition", top.toString)
          n.setAttribute("interlaceFlag", "FALSE")
        case _ => ()
      }
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      m.setFromTree(fmt, root)
      m
    }
    try {
      writer.setOutput(ios)
      // stream metadata with an explicit 256-gray global palette and
      // backgroundColorIndex=200 (the JDK default writes bg index 0)
      val sm = writer.getDefaultStreamMetadata(null)
      val sFmt = "javax_imageio_gif_stream_1.0"
      val sRoot = sm.getAsTree(sFmt).asInstanceOf[IIOMetadataNode]
      val gct = new IIOMetadataNode("GlobalColorTable")
      gct.setAttribute("sizeOfGlobalColorTable", "256")
      gct.setAttribute("backgroundColorIndex", "200")
      gct.setAttribute("sortFlag", "FALSE")
      for (i <- 0 until 256) {
        val e = new IIOMetadataNode("ColorTableEntry")
        e.setAttribute("index", i.toString)
        e.setAttribute("red", i.toString)
        e.setAttribute("green", i.toString)
        e.setAttribute("blue", i.toString)
        gct.appendChild(e)
      }
      sRoot.appendChild(gct)
      sm.setFromTree(sFmt, sRoot)
      writer.prepareWriteSequence(sm)
      val base = gray(6, 4, 100)
      writer.writeToSequence(new javax.imageio.IIOImage(base, null,
        metaFor(base, 0, 0, "none")), null)
      val patch = gray(2, 2, 230)
      writer.writeToSequence(new javax.imageio.IIOImage(patch, null,
        metaFor(patch, 1, 1, "restoreToBackgroundColor")), null)
      val dot = gray(1, 1, 50)
      writer.writeToSequence(new javax.imageio.IIOImage(dot, null,
        metaFor(dot, 0, 0, "none")), null)
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    val img = ImageCodec.decodeGray(bos.toByteArray).get
    assert(img.width == 6 && img.height == 4 && img.frames.length == 3)
    def px(f: Int, x: Int, y: Int) = img.frames(f)(y * 6 + x)
    for (y <- 0 until 4; x <- 0 until 6) {
      assert(px(0, x, y) == 100)
      val inPatch = x >= 1 && x < 3 && y >= 1 && y < 3
      assert(px(1, x, y) == (if (inPatch) 230 else 100))
      // frame 3 renders AFTER frame 2's rect restored to BACKGROUND=200
      val want3 =
        if (x == 0 && y == 0) 50
        else if (inPatch) 200
        else 100
      assert(px(2, x, y) == want3,
        s"background-color restore wrong at ($x,$y): ${px(2, x, y)}")
    }
  }

  test("audio fingerprint is gain-invariant and matches the hand-folded energy comparisons") {
    // int16 LE PCM under a canonical WAV header; samples chosen so a
    // 2x gain never clips. The sketch must be IDENTICAL across gains
    // (energy comparisons are monotone under s -> c*s) and equal the
    // independently folded bit pattern.
    def wav(samples: Seq[Int]): Array[Byte] = {
      val payload = samples.flatMap(s =>
        Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
      MediaHeaders.wavBytes(1, 8000, payload.length) ++ payload
    }
    // 4 frames of 5 samples with energies roughly up, down, up
    val base = Seq(10, 20, 30, 10, 5, 40, 50, 60, 40, 30,
      5, 10, 5, 5, 5, 100, 90, 80, 110, 120)
    val rows = Seq(
      MediaRow(1L, "audio", wav(base)),
      MediaRow(2L, "audio", wav(base.map(_ * 2))))
    val got = MultimodalOps.audioFingerprint(frame = 5)(rows.toDS())
      .select(col("doc_id"), col("n_frames"), col("fp"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    def energy(f: Int) =
      base.slice(f * 5, f * 5 + 5).map(s => s.toLong * s).sum
    val expFp = (0 until 3).map(f =>
      if (energy(f + 1) > energy(f)) 1L << f else 0L).sum
    assert(got.map(_._2).toSeq == Seq(4L, 4L))
    assert(got.map(_._3).toSeq == Seq(expFp, expFp),
      s"fingerprint must be gain-invariant and equal $expFp: ${got.toSeq}")
    assert(expFp != 0L, "fixture must exercise at least one rising edge")
  }

  test("encodeGifPatches round-trips through the compositing decode (last-writer model)") {
    import graft.operators.ImageCodec
    import graft.operators.ImageCodec.GifPatch
    val (sw, sh) = (11, 9)
    val patches = Seq(GifPatch(0, 0, sw, sh), GifPatch(2, 3, 6, 4),
      GifPatch(5, 0, 5, 7), GifPatch(0, 5, 11, 3))
    def px(f: Int, u: Int, v: Int) = (f * 53 + u * 7 + v * 13 + 11) % 256
    val img = ImageCodec.decodeGray(
      ImageCodec.encodeGifPatches(sw, sh, patches)(px)).get
    assert(img.width == sw && img.height == sh &&
      img.frames.length == patches.length)
    // last-writer-wins reference model, computed independently
    for (f <- patches.indices; y <- 0 until sh; x <- 0 until sw) {
      val g = (0 to f).filter { f2 =>
        val p = patches(f2)
        x >= p.left && x < p.left + p.pw && y >= p.top && y < p.top + p.ph
      }.max // frame 0 covers everything, so a writer always exists
      val p = patches(g)
      assert(img.frames(f)(y * sw + x) == px(g, x - p.left, y - p.top),
        s"frame $f pixel ($x,$y): want writer $g")
    }
  }

  test("pixel-stats variance is exact past the Long-overflow point of the naive formula") {
    import graft.operators.ImageCodec
    // 256×256 checkerboard: n = 65536 pixels, variance 16256.25 —
    // the old Long path ((n·Σp² − (Σp)²)·10⁶) needs ~6.98e19 and
    // silently wrapped negative; the BigInt path must return the exact
    // floor(n²·var·10⁶ / n²) = 16_256_250_000
    val media = Seq(MediaRow(77L, "image",
      ImageCodec.encodePng(256, 256)((x, y) => ((x + y) % 2) * 255))).toDS()
    val row = MultimodalOps.imagePixelStats(media, minContrast = 16)
      .select(col("n_pixels"), col("var_fp"), col("keep"))
      .as[(Long, Long, Boolean)].head()
    assert(row == ((65536L, 16256250000L, true)), s"got $row")
  }

  test("box-filter resize averages the exact source blocks") {
    import graft.operators.ImageCodec
    // 10×9 source → 8×8 target: uneven blocks (the floor-division grid),
    // every output pixel hand-checkable as floor(mean of its block)
    val w = 10; val h = 9
    val px = (x: Int, y: Int) => MultimodalOps.fixturePixel(5L, 0, x, y)
    val media = Seq(MediaRow(5L, "image", ImageCodec.encodePng(w, h)(px)))
      .toDS()
    val out = MultimodalOps.resizeBox(media, 8, 8)
      .as[(Long, Int, Int, Long)].collect()
      .map { case (_, ox, oy, v) => (ox, oy) -> v }.toMap
    assert(out.size == 64)
    for (oy <- 0 until 8; ox <- 0 until 8) {
      val (x0, x1) = (ox * w / 8, (ox + 1) * w / 8)
      val (y0, y1) = (oy * h / 8, (oy + 1) * h / 8)
      val block = for (y <- y0 until y1; x <- x0 until x1)
        yield px(x, y).toLong
      assert(out((ox, oy)) == block.sum / block.length,
        s"cell ($ox,$oy) drifted from its exact block mean")
    }
    // JPEG rows must be excluded (their pixels can't be pinned)
    val jm = Seq(MediaRow(6L, "image",
      ImageCodec.encodeJpeg(16, 16)((x, y) => x + y))).toDS()
    assert(MultimodalOps.resizeBox(jm, 8, 8).count() == 0L)
  }

  test("frame delta computes exact consecutive-frame SAD on real GIF decodes") {
    import graft.operators.ImageCodec
    val w = 6; val h = 5; val nf = 3
    val px = (f: Int, x: Int, y: Int) => MultimodalOps.fixturePixel(9L, f, x, y)
    val media = Seq(
      MediaRow(9L, "video", ImageCodec.encodeGif(w, h, nf)(px)),
      // single-frame GIF: no pair, no rows
      MediaRow(10L, "video", ImageCodec.encodeGif(4, 4, 1)(px)),
      // constant frames: delta must be exactly zero
      MediaRow(11L, "video", ImageCodec.encodeGif(4, 4, 2)((_, _, _) => 77)))
      .toDS()
    val out = MultimodalOps.frameDelta(media)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, f, sad, mx, ch) => (id, f) -> ((sad, mx, ch)) }.toMap
    assert(out.size == (nf - 1) + 1) // doc 9's two pairs + doc 11's one
    for (f <- 1 until nf) {
      val ds = for (y <- 0 until h; x <- 0 until w)
        yield math.abs(px(f, x, y) - px(f - 1, x, y)).toLong
      assert(out((9L, f.toLong)) ==
        ((ds.sum, ds.max, ds.count(_ != 0L).toLong)),
        s"frame $f delta drifted from the exact pixel replay")
    }
    assert(out((11L, 1L)) == ((0L, 0L, 0L)), "static frames must delta to 0")
  }

  test("pixel stats are exact moments; the contrast gate drops flat images") {
    import graft.operators.ImageCodec
    val w = 7; val h = 6
    val px = (x: Int, y: Int) => MultimodalOps.fixturePixel(3L, 0, x, y)
    val media = Seq(
      MediaRow(3L, "image", ImageCodec.encodePng(w, h)(px)),
      // flat image: zero variance, zero contrast, gated out
      MediaRow(4L, "image", ImageCodec.encodePng(5, 5)((_, _) => 200)))
      .toDS()
    val rows = MultimodalOps.imagePixelStats(media, minContrast = 32)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    val vs = (for (y <- 0 until h; x <- 0 until w) yield px(x, y).toLong)
    val (n, sum, sq) = (vs.length.toLong, vs.sum, vs.map(v => v * v).sum)
    assert(rows(3L) == ((3L, n, vs.min, vs.max, vs.max - vs.min, sum, sq,
      (n * sq - sum * sum) * 1000000L / (n * n), true)))
    val flat = rows(4L)
    assert(flat._5 == 0L && flat._8 == 0L && !flat._9,
      s"flat image must gate out with zero variance: $flat")
  }

  test("MediaHeaders.wav agrees with javax.sound.sampled, accepts AND rejects") {
    import javax.sound.sampled.AudioSystem
    def jdk(b: Array[Byte]) =
      try {
        val f = AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(b)).getFormat
        Some((f.getChannels, f.getSampleRate.toInt))
      } catch { case _: Exception => None }
    // the generator grid: both parsers read identical channels/rate
    for (ch <- 1 to 2; rate <- Seq(8000, 16000, 22050, 44100);
         n <- Seq(0, 7, 1000)) {
      val b = MediaHeaders.wavBytes(ch, rate, n) ++
        Array.fill(n)(1.toByte)
      assert(MediaHeaders.wav(b).contains((ch, rate, 44)))
      assert(jdk(b).contains((ch, rate)),
        s"javax.sound disagreed on ch=$ch rate=$rate n=$n")
    }
    // corrupt-reject parity on the r10 guard paths: zero channels,
    // zero/negative rate, undersized fmt chunk — OUR parser must reject
    // (downstream duration math divides by rate·channels); the JDK's
    // laxer parser may accept some, so the pin is one-directional on
    // acceptance but both-ways on the values whenever both accept
    def patched(at: Int, bytes: Array[Byte]): Array[Byte] = {
      val b = MediaHeaders.wavBytes(1, 8000, 4) ++ Array.fill(4)(0.toByte)
      b.patch(at, bytes, bytes.length)
    }
    val zeroCh = patched(22, Array[Byte](0, 0))
    val zeroRate = patched(24, Array[Byte](0, 0, 0, 0))
    val negRate = patched(24, Array[Byte](0, 0, 0, 0x80.toByte))
    val tinyFmt = patched(16, Array[Byte](4, 0, 0, 0))
    for (bad <- Seq(zeroCh, zeroRate, negRate, tinyFmt))
      assert(MediaHeaders.wav(bad).isEmpty, "corrupt WAV accepted")
    // truly-structureless bytes: both engines reject
    assert(jdk("RIFFxxxxWAVEjunk".getBytes("US-ASCII")).isEmpty)
    assert(MediaHeaders.wav("RIFFxxxxWAVEjunk".getBytes("US-ASCII")).isEmpty)
  }

  test("repartitionBySize bounds per-partition byte skew on pathological sizes") {
    // the layout that defeats both count-based and lexicographic-range
    // partitioning: a few huge blobs (nearly all the bytes) sorted in
    // front of a sea of tiny ones
    val rows = (0L until 8L).map(i => (i, Array.fill(1 << 20)(i.toByte))) ++
      (8L until 1000L).map(i => (i, Array.fill(1024)(i.toByte)))
    val df = rows.toDF("doc_id", "content")
    val out = MultimodalOps.repartitionBySize(df, 4)
    val perPart = out
      .select(spark_partition_id().as("p"), length($"content").as("n"))
      .groupBy($"p").agg(sum($"n").as("bytes"))
      .as[(Int, Long)].collect().toMap
    assert(perPart.size == 4, s"empty partitions: $perPart")
    val total = perPart.values.sum
    val avg = total.toDouble / 4
    val worst = perPart.values.max
    assert(worst <= avg * 1.5,
      s"byte skew ${worst / avg}x across partitions: $perPart")
    // nothing lost or duplicated by the re-layout
    assert(out.count() == 1000L)
  }
}
