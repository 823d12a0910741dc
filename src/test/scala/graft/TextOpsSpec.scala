package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenStats counts whitespace tokens, BPE-ish tokens, and chars") {
    val docs = Seq((1L, "Hello world42 !")).toDF("doc_id", "text")
    val r = TextOps.tokenStats(docs, "doc_id", "text").first()
    assert(r.getAs[Long]("n_tok_ws") == 3L)
    // H + ello + world + 42 + ! = 5 (case-run + letter-run + digit-run + symbol)
    assert(r.getAs[Long]("n_tok_bpe") == 5L)
    assert(r.getAs[Long]("n_chars") == 15L)
  }

  test("qualityScore ratios are exact int/int divisions") {
    val docs = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextOps.qualityScore(docs, "doc_id", "text").first()
    assert(r.getAs[Long]("n_tok") == 6L)
    assert(r.getAs[Long]("stop_cnt") == 2L) // "the" twice
    assert(r.getAs[Double]("stop_ratio") == 2.0 / 6.0)
    assert(r.getAs[Double]("avg_tok_len") == 17.0 / 6.0)
  }

  test("langId predicts the max-marker language, alphabetical on ties") {
    val docs = Seq(
      (1L, "the cat and the dog is here"),   // en
      (2L, "der hund und die katze ist da"), // de
      (3L, "xyz qrs tuv")                    // no markers: tie -> 'de'
    ).toDF("doc_id", "text")
    val r = TextOps.langId(docs, "doc_id", "text")
      .orderBy($"doc_id").collect().map(_.getAs[String]("pred_lang")).toSeq
    assert(r == Seq("en", "de", "de"))
  }

  test("simhash of identical token bags is identical; near bags are close") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // same bag, different order
      (3L, "alpha beta gamma epsilon")
    ).toDF("doc_id", "text")
    val r = TextOps.simhash(docs, "doc_id", "text")
      .orderBy($"doc_id").collect().map(_.getAs[Long]("simhash")).toSeq
    assert(r(0) == r(1), "simhash must be order-independent over the token bag")
    val hamming = java.lang.Long.bitCount(r(0) ^ r(2))
    assert(hamming > 0 && hamming <= 30, s"near docs should be close, hamming=$hamming")
  }

  test("fingerprint: exact dups share both fingerprints") {
    val docs = Seq(
      (1L, "one two three four five six seven"),
      (2L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val r = TextOps.fingerprint(docs, "doc_id", "text").collect()
    assert(r(0).getAs[String]("min_shingle_fp") == r(1).getAs[String]("min_shingle_fp"))
    assert(r(0).getAs[String]("content_fp") == r(1).getAs[String]("content_fp"))
  }
}
