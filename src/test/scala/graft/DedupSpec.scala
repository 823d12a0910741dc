package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Dedup operators against brute-force ground truth on a small corpus. */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

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

  test("minhashNearDup equals brute-force all-pairs Jaccard at the threshold") {
    val sh = corpus.select($"doc_id", Dedup.wordShingles($"text", 3).as("s"))
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

  test("wordShingles falls back to whole text below n tokens") {
    val got = spark.sql("SELECT 'a b' AS t")
      .select(Dedup.wordShingles(col("t"), 3).as("s"))
      .first().getSeq[String](0)
    assert(got == Seq("a b"))
  }
}
