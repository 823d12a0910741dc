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

  test("repetitionStats: total vs distinct bigrams and the repeated fraction") {
    val docs = Seq(
      (1L, "a b a b a b"), // bigrams: ab ba ab ba ab -> 5 total, 2 distinct
      (2L, "x y z"),       // 2 total, 2 distinct -> ratio 0
      (3L, "solo")         // < 2 tokens: whole-text fallback, 1/1, ratio 0
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(docs, "doc_id", "text", n = 2)
      .orderBy($"doc_id").collect()
    assert(r(0).getAs[Long]("n_grams") == 5L)
    assert(r(0).getAs[Long]("n_distinct") == 2L)
    assert(r(0).getAs[Double]("rep_ratio") == 1.0 - 2.0 / 5.0)
    assert(r(1).getAs[Double]("rep_ratio") == 0.0)
    assert(r(2).getAs[Long]("n_grams") == 1L)
    assert(r(2).getAs[Double]("rep_ratio") == 0.0)
  }

  test("rarityStats: corpus token frequencies, hapax counts, exact mean") {
    val docs = Seq(
      (1L, "the the rare"),  // 'the' corpus count 3, 'rare' 1
      (2L, "the common")     // 'common' 1
    ).toDF("doc_id", "text")
    val r = TextOps.rarityStats(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(r(0).getAs[Long]("n_tok") == 3L)
    assert(r(0).getAs[Long]("sum_freq") == 3L + 3L + 1L)
    assert(r(0).getAs[Long]("n_hapax") == 1L)
    assert(r(0).getAs[Double]("avg_tok_freq") == 7.0 / 3.0)
    assert(r(1).getAs[Long]("sum_freq") == 3L + 1L)
    assert(r(1).getAs[Long]("n_hapax") == 1L)
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),       // benchmark doc
      (2L, "prefix alpha beta gamma delta epsilon suffix"), // contains bm 5-gram
      (3L, "alpha beta gamma zeta eta theta iota"), // shares no complete 5-gram
      (4L, "totally unrelated words without overlap anywhere")
    ).toDF("doc_id", "text")
    val r = TextOps.decontaminate(docs, docs.filter($"doc_id" === 1L),
        "doc_id", "text", n = 5)
      .orderBy($"doc_id").collect()
    assert(r.map(_.getAs[Boolean]("is_contaminated")).toSeq ==
      Seq(true, true, false, false))
    assert(r(0).getAs[Long]("n_hits") == 1L)
    assert(r(1).getAs[Long]("n_hits") == 1L)
    assert(r(3).getAs[Long]("n_hits") == 0L)
  }

  test("mixCorpus derives integer-exact keep-rates, capping at availability") {
    val docs = (1L to 100L).map(i => (i, if (i <= 80) "a" else "b"))
      .toDF("doc_id", "stratum")
    // budget = 50; rate_a = floor(50*50/80) = 31, rate_b = min(100, 125) = 100
    val got = TextOps.mixCorpus(docs, "doc_id", "stratum", Map("a" -> 50, "b" -> 50))
    val rates = got.select($"stratum", $"rate").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates == Map("a" -> 31L, "b" -> 100L))
    assert(got.filter($"stratum" === "b").count() == 20, "capped stratum keeps all")
    // deterministic: same rows every run
    assertSameRows(got, TextOps.mixCorpus(docs, "doc_id", "stratum",
      Map("a" -> 50, "b" -> 50)))
    // unlisted strata get share 0 -> dropped
    val none = TextOps.mixCorpus(docs, "doc_id", "stratum", Map("b" -> 100))
    assert(none.filter($"stratum" === "a").isEmpty)
  }

  test("packSequences matches the single-window running sum exactly") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 500L)
      .map(i => (i, Seq.fill((i % 17 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.packSequences(docs, "doc_id", "text", budget = 64L)
    val naive = docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
      .withColumn("__cum", sum($"n_tok").over(
        Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, 0)))
      .select($"doc_id", $"n_tok",
        floor(($"__cum" - $"n_tok") / 64L).cast("long").as("pack_id"))
    assertSameRows(got.orderBy($"doc_id"), naive.orderBy($"doc_id"))
    // packs fill to ~the budget: every pack but the last holds >= budget
    // tokens counting its straddling tail doc
    val packs = got.groupBy($"pack_id").agg(sum($"n_tok").as("t"))
      .orderBy($"pack_id").collect()
    assert(packs.length > 3)
    assert(packs.dropRight(1).forall(_.getAs[Long]("t") >= 64L - 17L))
  }

  test("chunkWindows: boundaries, overlap, and codepoint (not byte) offsets") {
    // codepoint-exact reference: slice by code points, md5 the UTF-8 bytes
    def cpSub(s: String, start: Int, len: Int): String = {
      val cps = s.codePoints().toArray
      if (start >= cps.length) ""
      else new String(cps, start, math.min(len, cps.length - start))
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val short = "ab"                      // < width: one whole-doc chunk
    val exact = "x" * 10                  // == width: still one chunk
    val two = "y" * 11                    // width+1: second chunk is the tail
    val cjk = "世界" * 9          // 18 3-byte chars: byte math would misalign
    val docs = Seq((1L, short), (2L, exact), (3L, two), (4L, cjk))
      .toDF("doc_id", "text")
    val got = TextOps.chunkWindows(docs, "doc_id", "text", width = 10, stride = 6)
      .orderBy($"doc_id", $"chunk_ix")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = Seq((1L, short), (2L, exact), (3L, two), (4L, cjk)).flatMap {
      case (id, s) =>
        val len = s.codePoints().count().toInt
        val n = 1 + math.ceil(math.max(len - 10, 0) / 6.0).toInt
        (0 until n).map { i =>
          val c = cpSub(s, i * 6, 10)
          (id, i.toLong, c.codePoints().count(), md5hex(c))
        }
    }
    assert(got.toSeq == want)
    // adjacent chunks overlap by width - stride codepoints
    assert(cpSub(two, 6, 10) == "y" * 5) // tail chunk shorter than width
    assert(got.count(_._1 == 4L) == 3)   // 18 chars -> ceil(8/6)+1 = 3 chunks
  }

  test("boilerplatePassages flags the cross-doc passage, not unique text") {
    val header = "A" * 10 // one full window of shared boilerplate
    val docs = Seq(
      (1L, header + "unique-one"),   // header chunk + unique tail chunk
      (2L, header + "unique-twoo"),
      (3L, header + "unique-3"),
      (4L, "entirely original text") // no shared window
    ).toDF("doc_id", "text")
    val got = TextOps.boilerplatePassages(docs, "doc_id", "text",
        width = 10, minDocs = 2)
      .collect()
    assert(got.length == 1) // only the header window recurs
    val r = got.head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_occ") == 3L)
    assert(r.getAs[Long]("first_doc") == 1L)
    // raising the bar above the carrier count empties the result
    assert(TextOps.boilerplatePassages(docs, "doc_id", "text",
      width = 10, minDocs = 4).isEmpty)
  }

  test("bigramCrossEntropy matches the hand-computed add-1 model") {
    import spark.implicits._
    // corpus: "a b a b", "a b", "c" -> c(a,b)=3, c(b,a)=1,
    // prefix counts a=3, b=1, vocab {a,b,c} -> V=3
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val got = TextOps.bigramCrossEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val lpAB = math.round(-math.log((3 + 1.0) / (3 + 3.0)) * 1e6) // micro-nats
    val lpBA = math.round(-math.log((1 + 1.0) / (1 + 3.0)) * 1e6)
    // doc 3 has no bigrams and is excluded
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(got(0).getAs[Long]("n_bigrams") == 3L)
    assert(got(0).getAs[Double]("xent") == (2 * lpAB + lpBA).toDouble / 3 / 1e6)
    assert(got(1).getAs[Long]("n_bigrams") == 1L)
    assert(got(1).getAs[Double]("xent") == lpAB.toDouble / 1 / 1e6)
  }

  test("gopherGates: each rule fires on its planted pathological doc") {
    import spark.implicits._
    val good = "the cat of every house and the dog agree to live in peace"
    val docs = Seq(
      (1L, good),                                     // passes everything
      (2L, "too short"),                              // rule_words (< 5)
      (3L, "the of incomprehensibilities " +
        "extraordinarily " * 20),                     // rule_word_len (mean > 10)
      (4L, "the of # # # # word # # # # # # " +
        "# # # # # # # # # # # # # # # #"),           // rule_symbols
      (5L, (1 to 10).map(i => s"- the item $i of")
        .mkString("\n")),                             // rule_bullets (all lines)
      (6L, "the of 1 2 3 4 5 6 7 8 9 10 11 12"),      // rule_alpha (digit words)
      (7L, "cats dogs birds fish horses goats sheep") // rule_stopwords (0 distinct)
    ).toDF("doc_id", "text")
    val got = TextOps.gopherGates(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def flags(i: Int): Seq[Boolean] =
      Seq("rule_words", "rule_word_len", "rule_symbols", "rule_bullets",
        "rule_alpha", "rule_stopwords", "keep").map(got(i).getAs[Boolean])
    assert(flags(0).forall(identity), s"clean doc must pass all: ${flags(0)}")
    // each planted doc fails (at least) its targeted rule and keep
    assert(!got(1).getAs[Boolean]("rule_words") && !got(1).getAs[Boolean]("keep"))
    assert(!got(2).getAs[Boolean]("rule_word_len") && !got(2).getAs[Boolean]("keep"))
    assert(!got(3).getAs[Boolean]("rule_symbols") && !got(3).getAs[Boolean]("keep"))
    assert(!got(4).getAs[Boolean]("rule_bullets") && !got(4).getAs[Boolean]("keep"))
    assert(!got(5).getAs[Boolean]("rule_alpha") && !got(5).getAs[Boolean]("keep"))
    assert(!got(6).getAs[Boolean]("rule_stopwords") && !got(6).getAs[Boolean]("keep"))
  }

  test("bm25TopK ranks by tf, penalizes length, caps at k") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x y"),              // highest tf, short
      (2L, "x y y y"),              // tf=1, same length
      (3L, "x " + ("y " * 40).trim), // tf=1, long (length-penalized)
      (4L, "y y y y")               // no hit -> absent
    ).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 3).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    val sc = got.map(_.getAs[Double]("score"))
    assert(sc(0) > sc(1) && sc(1) > sc(2))
    assert(TextOps.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 2)
      .count() == 2)
  }

  test("ppsSample is systematic PPS: stride replay, heavy-doc guarantee, partition-independent") {
    import spark.implicits._
    // weights with a heavy doc (id 7, w=500) and a zero-weight doc (dropped)
    val docs = Seq(3L -> 10L, 1L -> 40L, 7L -> 500L, 4L -> 0L, 9L -> 25L,
      2L -> 80L, 5L -> 60L, 6L -> 35L, 8L -> 50L)
      .toDF("doc_id", "w")
    val k = 10
    val got = TextOps.ppsSample(docs, "doc_id", "w", k)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver-side replay of the same integer recurrence
    val ws = Seq(1L -> 40L, 2L -> 80L, 3L -> 10L, 5L -> 60L, 6L -> 35L,
      7L -> 500L, 8L -> 50L, 9L -> 25L)
    val total = ws.map(_._2).sum
    val stride = math.max(1L, total / k)
    var cum = 0L
    val want = ws.flatMap { case (id, w) =>
      val prev = cum; cum += w
      val picks = cum / stride - prev / stride
      if (picks >= 1) Some((id, w, picks)) else None
    }
    assert(got.toSeq == want)
    // the heavy doc is guaranteed in, with multiplicity ~ w/stride
    val heavy = got.find(_._1 == 7L).get
    assert(heavy._3 >= 500L / stride && heavy._3 <= 500L / stride + 1)
    // total picks ≈ k (systematic sampling picks floor(total/stride) ± 1)
    assert(math.abs(got.map(_._3).sum - k) <= 1)
    // partitioning-independence: a single-partition run agrees exactly
    val one = TextOps.ppsSample(docs.coalesce(1), "doc_id", "w", k)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(one.toSeq == got.toSeq)
  }
}
