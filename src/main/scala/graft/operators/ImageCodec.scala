package graft.operators

import java.awt.image.{BufferedImage, IndexColorModel, WritableRaster}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

/** REAL image/animation pixel codecs over the JDK's `javax.imageio` —
  * zero extra dependencies (`java.desktop` ships with every JRE this
  * library targets). PNG and GIF are lossless for 8-bit grayscale, so a
  * decode is bit-exact against the producer's pixel function and an
  * external oracle can verify decoded statistics closed-form; JPEG
  * decodes real pixels too but lossily (dims are exact, pixel values are
  * encoder/decoder-pair dependent — callers must not pin JPEG pixel
  * stats across engines).
  *
  * Decoders are TOTAL: malformed bytes return None, never throw (the
  * same poison-blob drop discipline as [[MediaHeaders]] / D6 — one bad
  * blob in a 100 TB scan must cost one dropped row, not the job).
  * Everything here is per-row executor work with no Spark dependency;
  * the distributed plumbing lives in [[MultimodalOps]].
  */
object ImageCodec {

  // never spool decodes through temp files on executor-local disk —
  // blobs are already in memory and the file cache is global-lock-happy
  ImageIO.setUseCache(false)

  /** A decoded image/animation: grayscale frames in row-major order
    * (pixel (x,y) at index y*width+x), values 0-255. `format` is the
    * lowercased container name the reader identified ("png", "jpeg",
    * "gif").
    */
  final case class GrayImage(width: Int, height: Int, format: String,
      frames: Seq[Array[Int]])

  /** Grayscale view of one decoded frame. Three cases matter:
    * single-band non-indexed rasters (PNG/JPEG gray) read the RAW
    * sample (getRGB would gamma-convert gray→sRGB and corrupt the
    * round trip — a classic AWT trap); indexed rasters (GIF) must go
    * through the palette (the raw sample is a palette INDEX); color
    * rasters reduce by integer luma (299R+587G+114B)/1000.
    */
  private def grayPixels(img: BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](w * h)
    val indexed = img.getColorModel.isInstanceOf[IndexColorModel]
    val raster = img.getRaster
    if (!indexed && raster.getNumBands == 1) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          out(y * w + x) =
            if (r == g && g == b) r else (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
    }
    out
  }

  /** Total decoded pixels (w·h·frames) a single blob may expand to. A
    * container's header self-declares its dimensions and frame count; a
    * decompression-bomb blob (a tiny GIF/PNG declaring 65535×65535, or
    * thousands of frames) would otherwise drive the pixel-array
    * allocations into OutOfMemoryError — an Error, which the totality
    * catch below deliberately does NOT swallow, so one poison blob
    * would kill the executor instead of costing one row. 2^24 pixels
    * (a 4096×4096 still, or 64 frames of 512×512) is 64 MiB of Int
    * per blob — bounded even at 32 decode threads.
    */
  val MaxDecodePixels: Long = 1L << 24

  /** Decode ALL frames to grayscale: PNG/JPEG as single stills; GIF
    * through full disposal-metadata COMPOSITING ([[decodeGifFrames]]) —
    * every emitted frame is the rendered logical screen, so optimized
    * GIFs (sub-rasters at nonzero offsets, transparency holes showing
    * the previous frame, restore-to-background/previous disposal) decode
    * to what a viewer displays, frame by frame. For the full-frame
    * opaque animations [[encodeGif]] emits, compositing degenerates to
    * the plain per-frame decode, so the lossless round-trip pins are
    * unchanged. None on anything unreadable. Both the dims checks and
    * the [[MaxDecodePixels]] bomb cap run on HEADER dimensions
    * (`ImageReader.getWidth/getHeight` read descriptors, not pixels),
    * before any frame allocates.
    */
  def decodeGray(bytes: Array[Byte]): Option[GrayImage] =
    if (bytes == null || bytes.length == 0) None
    else try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val n = reader.getNumImages(true)
            if (n <= 0) None
            else if (fmt == "gif") decodeGifFrames(reader, n)
            else {
              val w = reader.getWidth(0)
              val h = reader.getHeight(0)
              val dimsOk = w > 0 && h > 0 &&
                w.toLong * h * n <= MaxDecodePixels &&
                (1 until n).forall(i => reader.getWidth(i) == w &&
                  reader.getHeight(i) == h)
              if (!dimsOk) None
              else {
                val imgs = (0 until n).map(reader.read)
                // belt-and-suspenders: a corrupt container whose decoded
                // raster disagrees with its header dims is rejected too
                if (imgs.exists(f => f.getWidth != w || f.getHeight != h))
                  None
                else Some(GrayImage(w, h, fmt, imgs.map(grayPixels)))
              }
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** The GIF logical-screen dims from the stream metadata (what frames
    * composite onto); a stream without the descriptor falls back to
    * frame 0's raster dims.
    */
  private def gifScreen(reader: javax.imageio.ImageReader): (Int, Int) = {
    val sm = reader.getStreamMetadata
    val fallback = (reader.getWidth(0), reader.getHeight(0))
    if (sm == null) fallback
    else {
      val root = sm.getAsTree("javax_imageio_gif_stream_1.0")
      val kids = root.getChildNodes
      (0 until kids.getLength).map(kids.item)
        .collectFirst {
          case e: org.w3c.dom.Element
              if e.getNodeName == "LogicalScreenDescriptor" =>
            (e.getAttribute("logicalScreenWidth").toInt,
              e.getAttribute("logicalScreenHeight").toInt)
        }
        .getOrElse(fallback)
    }
  }

  /** The logical-screen background as a gray level: the LSD's
    * backgroundColorIndex resolved through the GLOBAL color table and
    * luma-folded like every other decode path. A stream with no global
    * palette has no defined background (GIF89a spec) → 0, matching the
    * old clear-to-black behavior.
    */
  private def gifBackground(reader: javax.imageio.ImageReader): Int =
    try {
      val sm = reader.getStreamMetadata
      if (sm == null) 0
      else {
        val root = sm.getAsTree("javax_imageio_gif_stream_1.0")
        val kids = root.getChildNodes
        (0 until kids.getLength).map(kids.item).collectFirst {
          case e: org.w3c.dom.Element
              if e.getNodeName == "GlobalColorTable" =>
            val bg = e.getAttribute("backgroundColorIndex").toInt
            val entries = e.getChildNodes
            (0 until entries.getLength).map(entries.item).collectFirst {
              case c: org.w3c.dom.Element
                  if c.getNodeName == "ColorTableEntry" &&
                    c.getAttribute("index").toInt == bg =>
                val r = c.getAttribute("red").toInt
                val g = c.getAttribute("green").toInt
                val b = c.getAttribute("blue").toInt
                if (r == g && g == b) r
                else (299 * r + 587 * g + 114 * b) / 1000
            }.getOrElse(0) // index outside the table: undefined → black
        }.getOrElse(0)
      }
    } catch { case _: Exception => 0 } // malformed attrs: undefined → black

  /** Frame placement + disposal from the per-image metadata tree. */
  private def gifFrameMeta(reader: javax.imageio.ImageReader,
      i: Int): (Int, Int, String) = {
    val root = reader.getImageMetadata(i)
      .getAsTree("javax_imageio_gif_image_1.0")
    val kids = root.getChildNodes
    var left = 0; var top = 0; var disposal = "none"
    (0 until kids.getLength).map(kids.item).foreach {
      case e: org.w3c.dom.Element if e.getNodeName == "ImageDescriptor" =>
        left = e.getAttribute("imageLeftPosition").toInt
        top = e.getAttribute("imageTopPosition").toInt
      case e: org.w3c.dom.Element
          if e.getNodeName == "GraphicControlExtension" =>
        val d = e.getAttribute("disposalMethod")
        if (d != null && d.nonEmpty) disposal = d
      case _ => ()
    }
    (left, top, disposal)
  }

  /** GIF89a frame compositing onto the logical screen: each frame is a
    * sub-raster drawn at its (left, top) offset — transparent pixels
    * (alpha 0 through the palette) leave the canvas showing through —
    * and after emission the disposal method runs: `none`/`doNotDispose`
    * keep the canvas, `restoreToBackgroundColor` fills the frame's rect
    * with the LSD background color resolved through the global palette
    * ([[gifBackground]]; streams without a global palette fall back to
    * 0 — browsers render the restore transparent-over-page, a
    * presentation detail with no pixel-true answer, but a declared
    * background index IS pixel-defined and honored here),
    * `restoreToPrevious` reverts to the pre-draw canvas. A frame whose
    * declared rect escapes the screen is a corrupt container: the whole
    * decode is rejected, never clipped silently. The bomb cap applies to screen·frames BEFORE the canvas
    * allocates.
    */
  private def decodeGifFrames(reader: javax.imageio.ImageReader,
      n: Int): Option[GrayImage] = {
    val (sw, sh) = gifScreen(reader)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh * n > MaxDecodePixels) None
    else {
      // every frame rect must fit the screen — checked on HEADER dims
      // (descriptor reads, no pixel decode), so a bomb declaring a tiny
      // screen but a huge frame raster is rejected before reader.read
      // can allocate it
      val rectsOk = (0 until n).forall { i =>
        val (left, top, _) = gifFrameMeta(reader, i)
        val fw = reader.getWidth(i)
        val fh = reader.getHeight(i)
        left >= 0 && top >= 0 && fw > 0 && fh > 0 &&
          left + fw <= sw && top + fh <= sh
      }
      if (!rectsOk) return None
      val bg = gifBackground(reader)
      var canvas = new Array[Int](sw * sh)
      val frames = Seq.newBuilder[Array[Int]]
      var i = 0
      var bad = false
      while (i < n && !bad) {
        val (left, top, disposal) = gifFrameMeta(reader, i)
        val img = reader.read(i)
        val fw = img.getWidth
        val fh = img.getHeight
        if (left < 0 || top < 0 || left + fw > sw || top + fh > sh) {
          bad = true // decoded raster disagreeing with its header
        } else {
          val snapshot =
            if (disposal == "restoreToPrevious") canvas.clone() else null
          var y = 0
          while (y < fh) {
            var x = 0
            while (x < fw) {
              val argb = img.getRGB(x, y)
              if ((argb >>> 24) != 0) { // opaque: draw; transparent: show through
                val r = (argb >> 16) & 0xff
                val g = (argb >> 8) & 0xff
                val b = argb & 0xff
                canvas((top + y) * sw + (left + x)) =
                  if (r == g && g == b) r
                  else (299 * r + 587 * g + 114 * b) / 1000
              }
              x += 1
            }
            y += 1
          }
          frames += canvas.clone()
          disposal match {
            case "restoreToBackgroundColor" =>
              var yy = 0
              while (yy < fh) {
                java.util.Arrays.fill(canvas, (top + yy) * sw + left,
                  (top + yy) * sw + left + fw, bg)
                yy += 1
              }
            case "restoreToPrevious" => canvas = snapshot
            case _ => ()
          }
        }
        i += 1
      }
      if (bad) None else Some(GrayImage(sw, sh, "gif", frames.result()))
    }
  }

  private def grayImage(w: Int, h: Int)(px: (Int, Int) => Int)
      : BufferedImage = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster: WritableRaster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, px(x, y) & 0xff); x += 1 }
      y += 1
    }
    img
  }

  /** Real PNG encode of a grayscale pixel function — LOSSLESS, so
    * decodeGray returns exactly `px`.
    */
  def encodePng(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] =
    encodeVia("png", w, h, px)

  /** Real JPEG encode (lossy: decoded dims are exact, pixels are not). */
  def encodeJpeg(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] =
    encodeVia("jpg", w, h, px)

  private def encodeVia(fmt: String, w: Int, h: Int,
      px: (Int, Int) => Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    // write returns false when the JRE has no writer for the format —
    // an empty byte array here would poison downstream decodes as a
    // quiet None instead of a clear producer-side failure
    if (!ImageIO.write(grayImage(w, h)(px), fmt, bos))
      throw new IllegalStateException(s"no ImageIO writer for '$fmt'")
    bos.toByteArray
  }

  /** Real multi-frame animated GIF encode via the writer's sequence API.
    * Grayscale frames with ≤256 distinct values fit the palette exactly,
    * so the round trip is LOSSLESS frame by frame (pinned in
    * MultimodalSpec).
    */
  def encodeGif(w: Int, h: Int, nFrames: Int)(
      px: (Int, Int, Int) => Int): Array[Byte] = {
    require(nFrames > 0, s"nFrames must be positive, got $nFrames")
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val frame = grayImage(w, h)((x, y) => px(f, x, y))
        writer.writeToSequence(new IIOImage(frame, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** One frame of an OPTIMIZED animated GIF: a `pw`×`ph` sub-raster
    * drawn at (`left`, `top`) of the logical screen. Frame-local pixel
    * function, screen placement via the image-descriptor metadata.
    */
  final case class GifPatch(left: Int, top: Int, pw: Int, ph: Int)

  /** Real OPTIMIZED-GIF encode: frame f is stored as `patches(f)` — a
    * sub-raster at its declared offset, exactly the layout real GIF
    * optimizers emit (and what [[decodeGray]]'s compositing path
    * renders back onto the logical screen). `px(f, u, v)` supplies the
    * frame-LOCAL pixels. Frames are written non-interlaced explicitly:
    * the JDK writer mis-writes interlaced rows for rasters shorter
    * than the 8-row interlace stride.
    */
  def encodeGifPatches(sw: Int, sh: Int, patches: Seq[GifPatch])(
      px: (Int, Int, Int) => Int): Array[Byte] = {
    require(patches.nonEmpty, "need at least one frame")
    patches.foreach { p =>
      require(p.left >= 0 && p.top >= 0 && p.pw > 0 && p.ph > 0 &&
        p.left + p.pw <= sw && p.top + p.ph <= sh,
        s"patch $p escapes the ${sw}x$sh screen")
    }
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      // pin the logical screen to (sw, sh) in the stream metadata —
      // otherwise the writer would size it to frame 0's raster
      val streamMeta = writer.getDefaultStreamMetadata(null)
      val sFmt = "javax_imageio_gif_stream_1.0"
      val sRoot = streamMeta.getAsTree(sFmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val sKids = sRoot.getChildNodes
      (0 until sKids.getLength).map(sKids.item).foreach {
        case e: javax.imageio.metadata.IIOMetadataNode
            if e.getNodeName == "LogicalScreenDescriptor" =>
          e.setAttribute("logicalScreenWidth", sw.toString)
          e.setAttribute("logicalScreenHeight", sh.toString)
        case _ => ()
      }
      streamMeta.setFromTree(sFmt, sRoot)
      writer.prepareWriteSequence(streamMeta)
      patches.zipWithIndex.foreach { case (p, f) =>
        val img = grayImage(p.pw, p.ph)((u, v) => px(f, u, v))
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), null)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val kids = root.getChildNodes
        (0 until kids.getLength).map(kids.item).foreach {
          case e: javax.imageio.metadata.IIOMetadataNode
              if e.getNodeName == "ImageDescriptor" =>
            e.setAttribute("imageLeftPosition", p.left.toString)
            e.setAttribute("imageTopPosition", p.top.toString)
            e.setAttribute("interlaceFlag", "FALSE")
          case _ => ()
        }
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }
}
