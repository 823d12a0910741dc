package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal payload row: media as an opaque `binary` column plus
  * typed metadata — the layout a 100 TB image/audio/video corpus uses
  * (the bytes are never interpreted by the engine; only decode-time
  * code touches them). */
final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

/** Deterministic-fake decoded features — see [[Multimodal.decodeStub]]. */
final case class MediaFeatures(doc_id: Long, n_bytes: Long, head_byte: Int,
                               byte_sum: Long)

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

  /** STUB DECODER — deterministic fake. A real deployment swaps the
    * body for an image/audio codec over the same `Iterator` batch
    * shape; the Spark-side contract (typed input row, per-partition
    * batching, typed output schema) is the part under test. The fake
    * "features" are reproducible byte statistics so the output is
    * oracle-checkable. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // ??? <- real codec call goes here; fake features below.
        val bytes = r.payload
        MediaFeatures(
          doc_id = r.doc_id,
          n_bytes = bytes.length.toLong,
          head_byte = if (bytes.nonEmpty) bytes(0) & 0xff else -1,
          byte_sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff)))
      }
    }
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
