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
      val f = MultimodalOps.StubDecoder.decode(MediaRow(1L, "image", bytes))
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
      val f = MultimodalOps.StubDecoder.decode(MediaRow(9L, "image", bytes))
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
      val f = MultimodalOps.StubDecoder.decode(MediaRow(9L, "audio", bytes))
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

  test("decode reads header fields back from the BYTES, payload hashed after header") {
    val payload = "media payload".getBytes("UTF-8")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    val png = MultimodalOps.StubDecoder.decode(
      MediaRow(1L, "image", MediaHeaders.pngBytes(320, 200) ++ payload))
    assert(png.width == 320 && png.height == 200 && png.n_frames == 1)
    assert(png.payload_sha256 == sha && png.n_bytes == 33L + payload.length)
    val wav = MultimodalOps.StubDecoder.decode(
      MediaRow(2L, "audio", MediaHeaders.wavBytes(1, 16000, payload.length)
        ++ payload))
    assert(wav.channels == 1 && wav.sample_rate == 16000 && wav.width == 0)
    assert(wav.payload_sha256 == sha)
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
