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

  /** Decode ALL frames (PNG/JPEG: 1; animated GIF: each frame) to
    * grayscale. None on anything unreadable — INCLUDING an animated GIF
    * whose later frames differ in size from frame 0: optimized GIFs
    * routinely store smaller sub-rasters with nonzero offsets that must
    * be composited onto the logical screen per disposal metadata, and
    * indexing such a frame as a full-screen raster would mis-map every
    * pixel. This codec supports full-frame animations only (what
    * [[encodeGif]] emits); anything else is rejected whole, never
    * silently mis-decoded (MultimodalSpec pins the rejection).
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
            val n = reader.getNumImages(true)
            if (n <= 0) None
            else {
              val first = reader.read(0)
              val rest = (1 until n).map(reader.read)
              if (rest.exists(f => f.getWidth != first.getWidth ||
                  f.getHeight != first.getHeight)) None
              else Some(GrayImage(first.getWidth, first.getHeight,
                reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
                grayPixels(first) +: rest.map(grayPixels)))
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

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
}
