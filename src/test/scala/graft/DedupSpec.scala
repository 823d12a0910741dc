package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Dedup operators against brute-force ground truth on a small corpus. */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.Column

  /** Test-only array-valued shingle twin of [[Dedup.shingleRows]]: an
    * interpreted HOF fold kept OUT of main (it dominated near-dup
    * runtime 3× there) but handy here as an independent formulation to
    * cross-check the codegen'd row form against. */
  private def wordShingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    val last = size(toks) - n // 0-based index of the final shingle start
    val grams = transform(sequence(lit(0), last), i =>
      concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    array_distinct(when(last >= 0, grams).otherwise(array(text)))
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (4L, "completely different text about spark plans and shuffles here"),
    (5L, "completely different text about spark plans and shuffles there"), // near-dup of 4
    (6L, "short text"),
    (7L, "an unrelated sentence with no overlap at all whatsoever")
  ).toDF("doc_id", "text")

  test("exactDedup keeps the minimum id per distinct text") {
    val got = Dedup.exactDedup(corpus, "doc_id", "text")
    assert(got.count() == 6) // 3 collapses into 1
    assert(got.filter($"doc_id" === 3L).count() == 0)
    assert(got.filter($"doc_id" === 1L).count() == 1)
  }

  test("duplicateRanges finds exact shared-substring spans, merged maximally") {
    // A: [0-9 block][30 shared chars][tail]; B: [different head][same 30
    // shared chars][different tail]; C: no 10-char window repeated.
    val shared = "SHARED-BLOCK-OF-THIRTY-CHARS!!"
    assert(shared.length == 30)
    val docs = Seq(
      (1L, "aaaaaaaaaa" + shared + "bbbbbbbbbb"),
      (2L, "cccccccccc" + shared + "dddddddddd"),
      (3L, "unique text with no repeats anywhere at all")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateRanges(docs, "doc_id", "text", minLen = 10)
      .orderBy($"doc_id", $"dup_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // the 30 shared chars = starts 11..31 of each doc (1-based), i.e.
    // one maximal island [11, 31+10-1=40] per doc; doc 3 absent
    assert(got.toSeq == Seq((1L, 11, 40), (2L, 11, 40)))
  }

  test("duplicateRanges: within-document repetition counts as duplication") {
    val docs = Seq(
      (1L, "xxxxxxxxxxZZZxxxxxxxxxx"), // "xxxxxxxxxx" occurs twice in ONE doc
      (2L, "totally unrelated words")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateRanges(docs, "doc_id", "text", minLen = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.forall(_._1 == 1L) && got.nonEmpty)
  }

  test("duplicateRanges: docs shorter than the window never explode or error") {
    val docs = Seq((1L, "tiny"), (2L, "tiny")).toDF("doc_id", "text")
    assert(Dedup.duplicateRanges(docs, "doc_id", "text", minLen = 10).count() == 0)
  }

  test("minhashNearDup equals brute-force all-pairs Jaccard at the threshold") {
    val sh = corpus.select($"doc_id", wordShingles($"text", 3).as("s"))
    val a = sh.select($"doc_id".as("id_a"), $"s".as("sa"))
    val b = sh.select($"doc_id".as("id_b"), $"s".as("sb"))
    val brute = a.join(b, $"id_a" < $"id_b")
      .select($"id_a", $"id_b", Dedup.jaccard($"sa", $"sb").as("jaccard"))
      .filter($"jaccard" >= 0.5)
    val got = Dedup.minhashNearDup(corpus, "doc_id", "text",
      Dedup.MinhashConfig(threshold = 0.5))
    assertSameRows(got.orderBy($"id_a", $"id_b"), brute.orderBy($"id_a", $"id_b"))
    // sanity: the expected pairs are found at all
    assert(canon(got.select($"id_a", $"id_b")) ==
      Seq(Seq("1", "2"), Seq("1", "3"), Seq("2", "3"), Seq("4", "5")))
  }

  test("jaccardNearDup equals brute-force all-pairs Jaccard (exact, no LSH)") {
    val sh = corpus.select($"doc_id", wordShingles($"text", 3).as("s"))
    val a = sh.select($"doc_id".as("id_a"), $"s".as("sa"))
    val b = sh.select($"doc_id".as("id_b"), $"s".as("sb"))
    val brute = a.join(b, $"id_a" < $"id_b")
      .select($"id_a", $"id_b", Dedup.jaccard($"sa", $"sb").as("jaccard"))
      .filter($"jaccard" >= 0.3) // low threshold: bands would miss here
    val got = Dedup.jaccardNearDup(corpus, "doc_id", "text", n = 3, threshold = 0.3)
    assertSameRows(got.orderBy($"id_a", $"id_b"), brute.orderBy($"id_a", $"id_b"))
  }

  test("viral-band guard caps candidate volume; non-viral near-dups survive") {
    import graft.dedup.Dedup.MinhashConfig
    // 40 exact copies (one viral band-key cluster) + one genuine
    // near-dup pair + noise
    val viral = (1L to 40L).map(i => (i, "the same boilerplate text repeated everywhere always"))
    val pair = Seq(
      (100L, "completely different text about spark plans and shuffles here"),
      (101L, "completely different text about spark plans and shuffles there"))
    val noise = Seq((200L, "an unrelated sentence with no overlap at all whatsoever"))
    val docs = (viral ++ pair ++ noise).toDF("doc_id", "text")
    val sh = graft.dedup.Dedup.shingleRows(docs, "doc_id", "text", 3)
    val sigs = graft.dedup.Dedup.minhashSignatures(sh, "doc_id", "shingle", 32)
    val unguarded = graft.dedup.Dedup.lshCandidates(sigs, "doc_id", "sig", 16, 2)
    val guarded = graft.dedup.Dedup.lshCandidates(sigs, "doc_id", "sig", 16, 2, maxBandDf = 10)
    assert(unguarded.count() >= 40L * 39 / 2, "the viral cluster is quadratic unguarded")
    assert(guarded.count() < 40L, "the guard must drop the viral band keys")
    // the genuine near-dup pair's bands have df=2 — it must survive
    val got = Dedup.minhashNearDup(docs, "doc_id", "text",
      MinhashConfig(threshold = 0.5, maxBandDf = 10))
    assert(canon(got.select($"id_a", $"id_b")).contains(Seq("100", "101")))
  }

  test("wordShingles falls back to whole text below n tokens") {
    val got = spark.sql("SELECT 'a b' AS t")
      .select(wordShingles(col("t"), 3).as("s"))
      .first().getSeq[String](0)
    assert(got == Seq("a b"))
  }

  test("connectedComponents merges transitive chains; clusterSurvivors keeps min per cluster") {
    import spark.implicits._
    // chain 1-2-3 (transitive via 2), island 7-8, singleton 9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val comp = graft.dedup.Dedup.connectedComponents(pairs, "id_a", "id_b")
    assert(canon(comp) == Seq(
      Seq("1", "1"), Seq("2", "1"), Seq("3", "1"),
      Seq("7", "7"), Seq("8", "7")).sortBy(_.mkString("")))
    val docs = Seq(1L, 2L, 3L, 7L, 8L, 9L).toDF("doc_id")
    val surv = graft.dedup.Dedup.clusterSurvivors(docs, pairs, "doc_id")
    assert(canon(surv) == Seq(
      Seq("1", "1", "true"), Seq("2", "1", "false"), Seq("3", "1", "false"),
      Seq("7", "7", "true"), Seq("8", "7", "false"),
      Seq("9", "9", "true")).sortBy(_.mkString("")))
    // a long path needs diameter rounds, not 2 — pin convergence
    val path10 = (1L to 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp10 = graft.dedup.Dedup.connectedComponents(path10, "id_a", "id_b")
    assert(comp10.filter($"component" =!= 1L).isEmpty, "all nodes reach label 1")
  }

  test("connectedComponents converges in O(log n) rounds on an adversarial chain") {
    // a 128-node path has diameter 127: min-label propagation would
    // need 127 rounds; alternating large/small-star contraction halves
    // chains per round. maxIter=10 makes the log bound BE the test —
    // reversed edge order and shuffled ids so orientation does not
    // accidentally help.
    val chain = (1L to 127L).map(i => (i, i + 1)).reverse.toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 10)
    assert(comp.count() == 128)
    assert(comp.filter($"component" =!= 1L).isEmpty, "all chain nodes reach label 1")
    assert(Dedup.lastCcRounds <= 10,
      s"expected O(log n) rounds, took ${Dedup.lastCcRounds}")
  }

  test("connectedComponents survives self-loops and duplicate/reversed pairs") {
    val pairs = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
    assert(canon(comp) == Seq(
      Seq("1", "1"), Seq("2", "1"), Seq("3", "3"), Seq("5", "5"))
      .sortBy(_.mkString("")))
  }

  test("connectedComponents takes the reliable-checkpoint path when a dir is set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
      val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      assert(canon(comp) == Seq(
        Seq("1", "1"), Seq("2", "1"), Seq("3", "1"),
        Seq("7", "7"), Seq("8", "7")).sortBy(_.mkString("")))
      // the reliable path actually wrote DFS-backed checkpoint data
      val wrote = graft.merge.FsList.walk(dir).exists(p =>
        java.nio.file.Files.isRegularFile(p))
      assert(wrote, "checkpoint dir should contain materialized round state")
    } finally {
      // restore the localCheckpoint default for the rest of the suite
      spark.sparkContext.setCheckpointDir(null)
      graft.merge.Scd1Merge.deleteRecursively(dir)
    }
  }

  test("simhashNearDup warns on a viral band bucket; small corpora stay quiet") {
    // 30 exact copies = one band bucket with df=30 in every band
    val viral = (1L to 30L).map(i => (i, "the same boilerplate text repeated everywhere always"))
    val rest = Seq((100L, "completely different text about spark plans and shuffles here"))
    val docs = (viral ++ rest).toDF("doc_id", "text")
    Dedup.simhashNearDup(docs, "doc_id", "text", warnBandDf = 10).count()
    assert(Dedup.lastSimhashSkewWarning.exists(_.contains("exactDedup")),
      "planted duplicate cluster must trip the skew tripwire")
    Dedup.simhashNearDup(corpus, "doc_id", "text", warnBandDf = 10).count()
    assert(Dedup.lastSimhashSkewWarning.isEmpty,
      "a skew-free corpus must not warn")
  }

  test("containmentPairs flags a truncated copy that symmetric Jaccard misses") {
    val full = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 8).map(i => s"w$i").mkString(" ") // first 20%
    val docs = Seq((1L, excerpt), (2L, full),
      (3L, "entirely unrelated words with zero shingle overlap anywhere at all"))
      .toDF("doc_id", "text")
    // excerpt: 6 trigrams, all inside full's 38 -> containment 1.0,
    // Jaccard 6/38 = 0.158
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.9)
      .collect()
    assert(cont.length == 1)
    assert(cont.head.getLong(0) == 1L && cont.head.getLong(1) == 2L)
    assert(cont.head.getAs[Double]("containment_a_in_b") == 1.0)
    assert(cont.head.getAs[Double]("containment_b_in_a") == 6.0 / 38.0)
    assert(Dedup.jaccardNearDup(docs, "doc_id", "text", n = 3, threshold = 0.5).isEmpty,
      "the same pair is invisible to a symmetric 0.5 threshold")
  }

  test("clusterSurvivorsBy keeps the max-quality doc per component, min id on ties") {
    val docs = Seq(
      (1L, "aa"), (2L, "aaaa"), (3L, "aaaa"), // cluster {1,2,3}: 2 wins (len 4, tie -> min id)
      (9L, "solo")                            // singleton survives
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.clusterSurvivorsBy(docs, pairs, "doc_id", length($"text"))
      .orderBy($"doc_id").collect()
    assert(got.map(r => r.getLong(0) -> r.getBoolean(3)).toSeq ==
      Seq(1L -> false, 2L -> true, 3L -> false, 9L -> true))
    assert(got.forall(r => if (r.getLong(0) == 9L) r.getLong(1) == 9L else r.getLong(1) == 1L))
  }

  test("minhashNearDupIncremental equals the full run restricted to new-touching pairs") {
    val isNew = $"doc_id" >= 4L
    val cfg = Dedup.MinhashConfig(threshold = 0.5)
    val full = Dedup.minhashNearDup(corpus, "doc_id", "text", cfg)
      .filter($"id_a" >= 4L || $"id_b" >= 4L)
    val inc = Dedup.minhashNearDupIncremental(corpus, "doc_id", "text", isNew, cfg)
    assertSameRows(inc.orderBy($"id_a", $"id_b"), full.orderBy($"id_a", $"id_b"))
    // corpus-only pairs are genuinely excluded, not filtered post-hoc:
    // 1~2 (both old) is found by the full run but never generated here
    assert(Dedup.minhashNearDup(corpus, "doc_id", "text", cfg)
      .filter($"id_a" === 1L && $"id_b" === 2L).count() == 1)
    assert(inc.filter($"id_a" === 1L && $"id_b" === 2L).isEmpty)
    // pairs between two NEW docs are still found (4~5 are near-dups)
    assert(inc.filter($"id_a" === 4L && $"id_b" === 5L).count() == 1)
  }

  test("persisted signature index: probe equals the incremental run; corpus never re-shingled") {
    val idx = Tmp.dir("sigidx_spec") + "/sig_index"
    val cfg = Dedup.MinhashConfig(threshold = 0.5)
    val isNew = $"doc_id" >= 4L
    val oldDocs = corpus.filter(!isNew)
    val newDocs = corpus.filter(isNew)
    // ingest 1: sign the corpus once
    Dedup.signatureIndexUpdate(spark, idx, oldDocs, "doc_id", "text", cfg,
      batchId = "corpus@1")
    assert(graft.merge.Scd1Merge.readTable(spark, idx).count() == 3)
    // ingest 2: sign + merge the batch, probe, verify candidates only
    val got = Dedup.minhashNearDupIndexed(spark, idx, corpus, newDocs,
      "doc_id", "text", cfg, batchId = "batch@2")
    val want = Dedup.minhashNearDupIncremental(corpus, "doc_id", "text", isNew, cfg)
    assertSameRows(got.orderBy($"id_a", $"id_b"), want.orderBy($"id_a", $"id_b"))
    // the no-recompute pins:
    // (a) the candidate stage reads ONLY the signature table — its scan
    //     has no text column to shingle (structural) and its input
    //     files all live under the index path
    val candFiles = Dedup.indexedCandidates(spark, idx,
      newDocs.select($"doc_id"), "doc_id", cfg).inputFiles
    assert(candFiles.nonEmpty && candFiles.forall(_.contains("sig_index")),
      s"candidates must come from the persisted index alone: ${candFiles.toSeq}")
    // (b) verification re-shingled only candidate docs, not the corpus
    val (indexRows, shingled) = Dedup.lastIndexedStats
    assert(indexRows == 7, "index holds corpus + merged batch")
    assert(shingled < 7 && shingled > 0,
      s"verify must re-shingle candidates only, got $shingled of 7 docs")
    // (c) the index survives for ingest 3: replaying batch 2 upserts
    //     identical rows (idempotent by content), commit count advances
    val before = graft.merge.Scd1Merge.readTable(spark, idx).count()
    Dedup.signatureIndexUpdate(spark, idx, newDocs, "doc_id", "text", cfg,
      batchId = "batch@2retry")
    assert(graft.merge.Scd1Merge.readTable(spark, idx).count() == before)
  }

  test("cdcChunks: chunks tile the doc exactly; boundaries survive a local edit") {
    val a = ("the quick brown fox jumps over the lazy dog and then " * 8).trim
    // local edit near the FRONT; everything after it is byte-identical
    val b = "XYZ " + a
    val docs = Seq((1L, a), (2L, b), (3L, "tiny")).toDF("doc_id", "text")
    val got = Dedup.cdcChunks(docs, "doc_id", "text", w = 8, mod = 16)
      .orderBy($"doc_id", $"chunk_start").collect()
    // chunks TILE each document: contiguous, gap-free, full-cover
    for ((id, t) <- Seq(1L -> a, 2L -> b, 3L -> "tiny")) {
      val ch = got.filter(_.getLong(0) == id)
        .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      assert(ch.head._1 == 1L)
      assert(ch.last._1 + ch.last._2 - 1 == t.length)
      ch.sliding(2).foreach {
        case Array(x, y) => assert(x._1 + x._2 == y._1); case _ => ()
      }
      // chunk md5s really are of the tile substrings
      ch.foreach { case (s0, l, h) =>
        val sub = t.substring(s0.toInt - 1, (s0 + l - 1).toInt)
        assert(h == java.security.MessageDigest.getInstance("MD5")
          .digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      }
    }
    // EDIT STABILITY (the content-defined property): past the edited
    // prefix, doc 2 re-synchronizes onto doc 1's chunk sequence — the
    // shared suffix chunks hash-match, so n_copies ≥ 2 there. With a
    // fixed-stride chunker ZERO chunks would survive the 4-char shift.
    val h1 = got.filter(_.getLong(0) == 1L).map(_.getString(3)).toSet
    val h2 = got.filter(_.getLong(0) == 2L).map(_.getString(3)).toSet
    val shared = h1.intersect(h2)
    assert(shared.size >= (h1.size * 3) / 4,
      s"only ${shared.size}/${h1.size} chunks survived the edit")
    assert(got.filter(r => shared.contains(r.getString(3)))
      .forall(_.getLong(4) >= 2L))
    // a doc shorter than the window is one whole-doc chunk
    assert(got.count(_.getLong(0) == 3L) == 1)
  }

  test("fuzzyPairs equals brute-force levenshtein, including short-string pairs") {
    // planted vocabulary exercising every recall regime:
    //  - "kitten"/"sitten" (dist 1) and "kitten"/"sitting" (dist 3 — out)
    //  - "cat"/"bat" (dist 1, len 3): share NO bigram — only the
    //    short-bucket cross join can find this pair
    //  - "cat"/"cart" (dist 1, lens 3/4): also below the gram bound
    //  - "abcdef"/"ghijkl" (dist 6): shares nothing, stays out
    //  - "red gear"/"red bear" (dist 2): found via shared grams
    val names = Seq("kitten", "sitten", "sitting", "cat", "bat", "cart",
      "abcdef", "ghijkl", "red gear", "red bear", "red gear")
      .toDF("name")
    val got = Dedup.fuzzyPairs(names, "name", maxDist = 2)
      .orderBy("name_a", "name_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // brute force over the distinct vocabulary
    val vocab = names.distinct().collect().map(_.getString(0))
    val want = (for {
      a <- vocab; b <- vocab if a < b
      d = {
        val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        dp(a.length)(b.length)
      } if d <= 2
    } yield (a, b, d)).sorted
    assert(got.toSeq == want.toSeq)
    assert(got.exists(p => p._1 == "bat" && p._2 == "cat")) // short bucket fired
    assert(!got.exists(p => p._1 == "kitten" && p._2 == "sitting")) // dist 3 excluded
  }
}
