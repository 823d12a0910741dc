package graft

import graft.multimodal.{MediaCodec, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def media(texts: (Long, String)*) =
    Multimodal.asMedia(texts.toDF("doc_id", "text"), "doc_id", "text")

  test("asMedia wraps text as binary payload with typed metadata") {
    val r = media((1L, "abc")).first()
    assert(r.getAs[Array[Byte]]("payload").toSeq == "abc".getBytes("UTF-8").toSeq)
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[String]("mime") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") == 3L)
  }

  test("binaryStats sniffs magic bytes and fingerprints content") {
    val r = Multimodal.binaryStats(media((1L, "abcdef"))).first()
    assert(r.getAs[String]("magic_hex") == "61626364")
    assert(r.getAs[Long]("n_bytes") == 6L)
  }

  test("frameSample covers edge cases: exact multiple, short tail, tiny payload") {
    // stride 4, frameLen 2: 10 bytes -> frames at 0,4,8; last frame is 2 bytes
    val f = Multimodal.frameSample(media((1L, "0123456789"), (2L, "ab")), 2, 4)
      .orderBy($"doc_id", $"frame_no").collect()
    val d1 = f.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 1, 2))
    assert(d1.map(_.getAs[Long]("frame_bytes")).toSeq == Seq(2L, 2L, 2L))
    // 2-byte payload -> one frame of 2 bytes
    val d2 = f.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.length == 1 && d2.head.getAs[Long]("frame_bytes") == 2L)
  }

  test("frameSample of an empty payload emits zero frames") {
    // regression: sequence(0, -1) yields [0, -1] — two phantom frames
    val f = Multimodal.frameSample(media((1L, "")), 2, 4)
    assert(f.count() == 0)
  }

  test("decodeMedia parses synthesized payloads over typed batches, errors included") {
    val docs = Seq((2L, 20L), (3L, 100L), (0L, 5L)).toDF("doc_id", "n_chars")
    val got = Multimodal.decodeMedia(
        Multimodal.synthesizeMedia(spark, docs, "doc_id", "n_chars"))
      .collect().sortBy(_.doc_id)
    // id 0: % 97 == 0 -> truncated -> error row
    assert(got(0).kind == "error" && got(0).n_bytes == 6L &&
      got(0).width.isEmpty && got(0).sample_rate.isEmpty)
    // id 2 (even): BMP 21 x 3
    assert(got(1).kind == "image" && got(1).width.contains(21) &&
      got(1).height.contains(3) && got(1).n_bytes == 54L + MediaCodec.BmpStub)
    // id 3 (odd): WAV rate 11000, dataSize 2148 -> 2148*1000/22000 ms
    assert(got(2).kind == "audio" && got(2).sample_rate.contains(11000) &&
      got(2).duration_ms.contains(2148L * 1000L / 22000L))
  }

  test("resizeStub: short payloads pass through; long ones bound at target") {
    val docs = Seq((1L, "short"), (2L, "x" * 500), (3L, "")).toDF("doc_id", "text")
    val got = Multimodal.resizeStub(
        Multimodal.asMedia(docs, "doc_id", "text"), targetBytes = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("orig_bytes"), r.getAs[Long]("stride"), r.getAs[Long]("thumb_bytes"))))
      .toMap
    assert(got(1L) == ((5L, 1L, 5L)), "short payload passes through (stride 1)")
    val (o2, s2, t2) = got(2L)
    assert(o2 == 500L && s2 == 8L && t2 <= 64L, s"long payload must bound: $got")
    assert(got(3L) == ((0L, 1L, 0L)), "empty payload yields an empty thumb")
  }

  test("mediaSimhashNearDup pairs identical and block-reordered payloads, not distinct ones") {
    // 16 distinct 8-byte blocks; doc 3 carries the SAME blocks reordered
    // — the re-muxed-container case: identical chunk bag => identical
    // simhash => hamming 0, deterministically (no vote margins in play)
    val blocks = (0 until 16).map(i => f"blk${i}%02dxx")
    val base = blocks.mkString
    val reordered = (blocks.drop(8) ++ blocks.take(8)).mkString
    val docs = Seq(
      (1L, base),
      (2L, base),      // identical bytes -> hamming 0
      (3L, reordered), // same chunk bag  -> hamming 0
      (4L, "completely different content with nothing shared at all here xyz")
    ).toDF("doc_id", "text")
    val got = Multimodal.mediaSimhashNearDup(
        Multimodal.asMedia(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("hamming")).toMap
    assert(got.get((1L, 2L)).contains(0L), s"identical payloads must pair at 0: $got")
    assert(got.get((1L, 3L)).contains(0L) && got.get((2L, 3L)).contains(0L),
      s"block-reordered payload (same chunk bag) must pair at 0: $got")
    assert(!got.keySet.exists { case (a, b) => b == 4L || a == 4L },
      s"distinct content must not pair: $got")
  }
}
