package graft

import graft.multimodal.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM BMP/WAV codec: parsed against HAND-WRITTEN golden byte
  * arrays (not the synthesizer's output), so the parser provably reads
  * the little-endian header bytes rather than echoing fixture
  * formulas; plus endianness, top-down-height, truncation and
  * magic-sniff cases. */
class MediaCodecSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // the canonical 58-byte 1x1 24bpp red-pixel BMP (BITMAPINFOHEADER)
  private val Bmp1x1 = hex(
    "42 4D 3A 00 00 00 00 00 00 00 36 00 00 00 28 00 00 00" +
    "01 00 00 00 01 00 00 00 01 00 18 00 00 00 00 00 04 00 00 00" +
    "13 0B 00 00 13 0B 00 00 00 00 00 00 00 00 00 00" +
    "00 00 FF 00")

  // 44-byte RIFF/PCM header: mono 16-bit 44100 Hz, declared data size
  // 0x00015888 = 88200 bytes (= exactly 1 s at 88200 B/s), no payload
  private val Wav44k = hex(
    "52 49 46 46 AC 58 01 00 57 41 56 45 66 6D 74 20" +
    "10 00 00 00 01 00 01 00 44 AC 00 00 88 58 01 00" +
    "02 00 10 00 64 61 74 61 88 58 01 00")

  test("golden 1x1 BMP parses from raw bytes") {
    val d = MediaCodec.decode(7L, Bmp1x1)
    assert(d.kind == "image" && d.width.contains(1) && d.height.contains(1))
    assert(d.n_bytes == 58L && d.sample_rate.isEmpty && d.duration_ms.isEmpty)
  }

  test("golden 44.1kHz WAV header parses; duration from DECLARED data size") {
    val d = MediaCodec.decode(8L, Wav44k)
    assert(d.kind == "audio" && d.sample_rate.contains(44100))
    assert(d.duration_ms.contains(1000L), s"got ${d.duration_ms}")
    assert(d.width.isEmpty && d.height.isEmpty)
  }

  test("synthesized headers are little-endian on the wire and roundtrip") {
    val b = MediaCodec.bmp(260, 2) // 260 = 0x0104 -> bytes 04 01 00 00
    assert((b(18) & 0xff, b(19) & 0xff, b(20) & 0xff, b(21) & 0xff)
      == ((0x04, 0x01, 0x00, 0x00)))
    val d = MediaCodec.decode(1L, b)
    assert(d.width.contains(260) && d.height.contains(2))
    val w = MediaCodec.wav(11025, 44100)
    assert((w(24) & 0xff, w(25) & 0xff) == ((0x11, 0x2B))) // 11025 = 0x2B11
    val dw = MediaCodec.decode(2L, w)
    assert(dw.sample_rate.contains(11025) &&
      dw.duration_ms.contains(44100L * 1000L / (11025L * 2L)))
  }

  test("top-down BMP (negative height) reports absolute height") {
    val b = MediaCodec.bmp(4, 2)
    // overwrite height with -2 (little-endian two's complement)
    b(22) = 0xFE.toByte; b(23) = 0xFF.toByte; b(24) = 0xFF.toByte; b(25) = 0xFF.toByte
    val d = MediaCodec.decode(1L, b)
    assert(d.kind == "image" && d.height.contains(2))
  }

  test("truncated, corrupt and unknown payloads come back as error rows, never throw") {
    assert(MediaCodec.decode(1L, Bmp1x1.take(6)).kind == "error")
    assert(MediaCodec.decode(2L, Wav44k.take(43)).kind == "error")
    assert(MediaCodec.decode(3L, Array.fill[Byte](100)('x'.toByte)).kind == "error")
    assert(MediaCodec.decode(4L, Array.emptyByteArray).kind == "error")
    // right magic, wrong DIB header size -> not BITMAPINFOHEADER -> error
    val bad = Bmp1x1.clone(); bad(14) = 12 // BITMAPCOREHEADER
    assert(MediaCodec.decode(5L, bad).kind == "error")
    // zero-width BMP is invalid
    val zw = MediaCodec.bmp(1, 1)
    zw(18) = 0; assert(MediaCodec.decode(6L, zw).kind == "error")
  }

  /** Independent in-test aHash straight over the byte array — the
    * parser must agree with BYTES, wherever the header says the pixels
    * live, never with the texture formula. */
  private def refPhash(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
    val off = (bytes(10) & 0xff) | ((bytes(11) & 0xff) << 8) |
      ((bytes(12) & 0xff) << 16) | ((bytes(13) & 0xff) << 24)
    val px = (0 until 64).map(i => bytes(off + i) & 0xff)
    val mean = px.sum / 64
    val bands = new Array[Int](4)
    var n = 0
    px.zipWithIndex.foreach { case (p, i) =>
      if (p > mean) { n += 1; bands(i >> 4) |= 1 << (i & 15) } }
    (bands(0), bands(1), bands(2), bands(3), n)
  }

  test("phashBmp agrees with an independent byte-level aHash and tracks byte edits") {
    val b = MediaCodec.bmpTextured(37, 101)
    assert(MediaCodec.phashBmp(b).contains(refPhash(b)))
    // force ONE pixel byte to the opposite side of the mean: the
    // parser must see it (pixel 0 is above the mean in this texture —
    // zeroing it clears bit 0)
    val mutated = b.clone()
    mutated(54) = 0x00.toByte
    assert(MediaCodec.phashBmp(mutated).contains(refPhash(mutated)))
    assert(MediaCodec.phashBmp(mutated) != MediaCodec.phashBmp(b),
      "a pixel edit must move the hash — else the parser isn't reading bytes")
    // a NON-STANDARD pixel offset (padding between header and pixels):
    // the parser must follow the header field, not assume 54
    val shifted = new Array[Byte](b.length + 10)
    System.arraycopy(b, 0, shifted, 0, 54)
    System.arraycopy(b, 54, shifted, 64, b.length - 54)
    shifted(10) = 64 // pixel-array offset field -> 64
    assert(MediaCodec.phashBmp(shifted).contains(refPhash(shifted)))
    assert(MediaCodec.phashBmp(shifted) == MediaCodec.phashBmp(b),
      "same pixels behind a padded header must hash identically")
    // truncated/corrupt payloads yield None, never throw
    assert(MediaCodec.phashBmp(b.take(6)).isEmpty)
    assert(MediaCodec.phashBmp(b.take(60)).isEmpty)
    assert(MediaCodec.phashBmp(Array.fill[Byte](200)('x'.toByte)).isEmpty)
  }
}
