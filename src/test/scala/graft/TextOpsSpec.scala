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

  test("redactPii replaces emails, IPv4s, phone runs; leaves clean text alone") {
    import graft.text.TextOps
    val df = Seq("mail a.b@x.co end", "ip 10.1.2.3 here",
      "call +44 20 7946 0958 now", "clean words only").toDF("t")
    val out = df.select(TextOps.redactPii($"t").as("r"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("mail [EMAIL] end", "ip [IP] here",
      "call [PHONE] now", "clean words only"))
  }

  test("stratifiedSample is deterministic and honors per-stratum rates") {
    import graft.text.TextOps
    val docs = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val s1 = TextOps.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 40, "de" -> 100))
    val s2 = TextOps.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 40, "de" -> 100))
    assertSameRows(s1, s2) // same rows every run — no rand()
    val en = s1.filter($"lang" === "en").count().toDouble / 1000
    assert(en > 0.3 && en < 0.5, s"en keep-rate $en should be ~0.40")
    assert(s1.filter($"lang" === "de").count() == 1000, "absent/100% strata keep all")
    // every kept row's bucket is below its stratum rate
    assert(s1.filter($"lang" === "en")
      .filter(TextOps.sampleBucket($"doc_id") >= 40).isEmpty)
  }
}
