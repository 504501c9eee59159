package graft.operators

/** Byte-level media-container header codecs: width/height/sample-rate
  * live at fixed or walkable byte offsets in every common container, so
  * header parsing needs no codec dependency. Pixel decode lives in
  * [[ImageCodec]] (JDK ImageIO); these parsers are the fallback for
  * blobs whose payload is unreadable ([[MultimodalOps.Decoder]]) and the
  * WAV entry point for the PCM sample decoders.
  *
  * Each format has a parser (bytes => typed fields + header length) and a
  * generator (the test-producer dual that writes a well-formed header the
  * parser must read back bit-exactly). Parsers are total: anything
  * malformed returns None, never throws — a poison blob must not fail the
  * decode stage (same drop discipline as D6).
  */
object MediaHeaders {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, "US-ASCII")

  /** Parsed image header: (width, height, headerLength). */
  type ImageDims = (Int, Int, Int)
  /** Parsed audio format: (channels, sampleRate, headerLength). */
  type AudioFmt = (Int, Int, Int)

  // ------------------------------------------------------------------ PNG

  private val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** PNG: 8-byte signature, then the mandatory-first IHDR chunk — width
    * and height are big-endian int32 at offsets 16 and 20 (PNG spec
    * §5.2/§11.2.2). Header = signature + full IHDR chunk (33 bytes).
    */
  def png(b: Array[Byte]): Option[ImageDims] =
    if (b.length >= 33 && b.startsWith(pngSig) &&
      ascii(b, 12, 16) == "IHDR")
      Some((be32(b, 16), be32(b, 20), 33))
    else None

  /** Well-formed PNG signature + IHDR (bit depth 8, color type 2 = RGB),
    * with a REAL CRC32 over type+data like any PNG writer emits.
    */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(33)
    buf.put(pngSig)
    buf.putInt(13) // IHDR data length
    val crcFrom = buf.position()
    buf.put("IHDR".getBytes("US-ASCII"))
    buf.putInt(width).putInt(height)
    buf.put(8.toByte).put(2.toByte) // bit depth 8, color RGB
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // compress/filter/interlace
    val crc = new java.util.zip.CRC32
    crc.update(buf.array(), crcFrom, buf.position() - crcFrom)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  // ----------------------------------------------------------------- JPEG

  /** JPEG: walk marker segments from SOI (FFD8) to the first start-of-
    * frame (SOF0/1/2 — baseline/extended/progressive); height is the
    * big-endian int16 at segment offset +5, width at +7 (ITU T.81 §B.2.2).
    * Header length = end of the SOF segment.
    */
  def jpeg(b: Array[Byte]): Option[ImageDims] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 2 <= b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xff) {
        // 0xFF fill byte before a marker (T.81 §B.1.1.2): skip one byte
        i += 1
      } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
        // standalone markers carry no length field: TEM (01), RST0-7
        // (D0-D7), and a repeated SOI (D8) — reading payload bytes as a
        // segment length here would misparse unusual-but-valid streams
        i += 2
      } else if (marker == 0xd9) {
        // EOI before any SOF: no frame header in this stream
        return None
      } else {
        if (i + 4 > b.length) return None
        val segLen = be16(b, i + 2)
        // a declared segment length below 2 (it includes itself) or past
        // the end of the buffer is corrupt — drop, and never return a
        // header length beyond the bytes we actually have
        if (segLen < 2 || segLen > b.length - i - 2) return None
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (i + 9 > b.length) return None
          return Some((be16(b, i + 7), be16(b, i + 5), i + 2 + segLen))
        }
        i += 2 + segLen
      }
    }
    None
  }

  /** SOI + a minimal single-component SOF0 (15 bytes total). */
  def jpegBytes(width: Int, height: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(15)
    buf.put(0xff.toByte).put(0xd8.toByte) // SOI
    buf.put(0xff.toByte).put(0xc0.toByte) // SOF0
    buf.putShort(11.toShort)              // segment length (self-inclusive)
    buf.put(8.toByte)                     // precision
    buf.putShort(height.toShort).putShort(width.toShort)
    buf.put(1.toByte)                     // 1 component
    buf.put(1.toByte).put(0x11.toByte).put(0.toByte) // id/sampling/qtable
    buf.array()
  }

  // ------------------------------------------------------------------ WAV

  /** WAV: RIFF/WAVE container, then chunk-walk to `fmt ` — channels is
    * the little-endian int16 at chunk offset +2, sample rate the int32 at
    * +4 (RIFF WAVE spec). Header length = the canonical 44-byte PCM
    * preamble (fmt + data chunk headers) when the layout is canonical,
    * else the end of the fmt chunk.
    */
  def wav(b: Array[Byte]): Option[AudioFmt] = {
    if (b.length < 36 || ascii(b, 0, 4) != "RIFF" ||
      ascii(b, 8, 12) != "WAVE") return None
    var i = 12
    while (i + 8 <= b.length) {
      val id = ascii(b, i, i + 4)
      val size = le32(b, i + 4)
      // a negative (sign-bit) or past-the-end declared chunk size is
      // corrupt: bail rather than loop forever / index out of bounds.
      // Compare against the remaining bytes — `i + 8 + size` wraps
      // negative for sizes near Int.MaxValue and would dodge the check
      if (size < 0 || size > b.length - i - 8) return None
      if (id == "fmt ") {
        if (size < 8 || i + 16 > b.length) return None
        val channels = le16(b, i + 10)
        val rate = le32(b, i + 12)
        // channels=0 / rate<=0 is corrupt (le32 can even read a negative
        // rate): downstream duration math divides by rate*channels, so a
        // poison-but-RIFF/WAVE blob must drop here, not throw in a task
        if (channels <= 0 || rate <= 0) return None
        val fmtEnd = i + 8 + size
        // canonical PCM layout: data chunk header right after fmt
        val hdrLen =
          if (fmtEnd + 8 <= b.length && ascii(b, fmtEnd, fmtEnd + 4) == "data")
            fmtEnd + 8
          else fmtEnd
        return Some((channels, rate, hdrLen))
      }
      // RIFF chunks are word-aligned: odd sizes carry a pad byte the
      // size field excludes
      i += 8 + size + (size & 1)
    }
    None
  }

  /** Canonical 44-byte PCM WAV preamble for `dataLen` payload bytes. */
  def wavBytes(channels: Int, sampleRate: Int, dataLen: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort)               // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate (16-bit samples)
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16.toShort)              // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    buf.array()
  }
}
