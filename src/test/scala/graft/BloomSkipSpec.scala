package graft

import graft.functions.BloomUtil
import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._

/** Bloom file-skipping: the bitmap math can never false-negative
  * (that would be a WRONG prune), the judged lever really prunes
  * where min/max cannot, and the absence of the bloom column leaves
  * reads conservative. */
class BloomSkipSpec extends SparkSpecBase {

  import spark.implicits._

  test("BloomUtil has zero false negatives and a sane false-positive rate") {
    val m = BloomUtil.DefaultBits; val k = BloomUtil.DefaultProbes
    val bits = new Array[Long](m / 64)
    val rnd = new scala.util.Random(42)
    val in = Array.fill(1000)(rnd.nextLong())
    in.foreach(BloomUtil.set(bits, m, k, _))
    assert(in.forall(BloomUtil.test(bits, m, k, _)),
      "a bloom filter must never false-negative")
    val probes = Array.fill(10000)(rnd.nextLong()).filterNot(in.contains)
    val fp = probes.count(BloomUtil.test(bits, m, k, _)).toDouble / probes.length
    assert(fp < 0.10, f"false-positive rate $fp%.3f out of spec at n=1000")
    // serialization round-trips bit-exactly
    assert(BloomUtil.fromBytes(BloomUtil.toBytes(bits)).sameElements(bits))
  }

  test("equality on a bloomed hash column prunes where min/max cannot") {
    val df = (1L to 500L)
      .map(i => (i, s"name_$i")).toDF("k", "name")
      .withColumn("tag", md5(col("k").cast("string")))

    // twin WITHOUT the bloom: uniformly-distributed strings overlap
    // every bucket's min/max range — no pruning at all
    val plain = Tmp.dir("bloom_plain") + "/t"
    Scd1Merge.upsert(spark, plain, df, Seq("k"), numBuckets = 16,
      statsColumns = Seq("tag"))
    val probeVal = md5(lit("137"))
    assert(Scd1Merge.readTableWhere(spark, plain, col("tag") === probeVal)
      .count() == 1)
    assert(Scd1Merge.lastPrune._1 == 16,
      s"min/max must NOT prune a uniform hash column: ${Scd1Merge.lastPrune}")

    // with the bloom: the same probe reads ~1 bucket
    val path = Tmp.dir("bloom_skip") + "/t"
    Scd1Merge.upsert(spark, path, df, Seq("k"), numBuckets = 16,
      statsColumns = Seq(Scd1Merge.BloomTag + "tag"))
    val got = Scd1Merge.readTableWhere(spark, path, col("tag") === probeVal)
    assert(canon(got.select(col("k"), col("name"))) ==
      canon(df.filter(col("k") === 137L).select(col("k"), col("name"))))
    assert(Scd1Merge.lastPrune._1 <= 2,
      s"bloom should prune a point lookup to ~1 of 16 buckets: ${Scd1Merge.lastPrune}")

    // an ABSENT value prunes everything (bar false positives)
    assert(Scd1Merge.readTableWhere(spark, path,
      col("tag") === md5(lit("no_such"))).count() == 0)
    assert(Scd1Merge.lastPrune._1 <= 2,
      s"an absent value should prune ~all buckets: ${Scd1Merge.lastPrune}")

    // IN-lists veto per element; two values live in at most 2+fp buckets
    assert(Scd1Merge.readTableWhere(spark, path,
      col("tag").isin(/* k=42, k=256 */ "a1d0c6e83f027327d8461063f4ac58a6",
        "f718499c1c8cef6730f9fd03c8125cab")).count() == 2)
    assert(Scd1Merge.lastPrune._1 <= 4,
      s"IN-list should prune to the union of member buckets: ${Scd1Merge.lastPrune}")
  }

  test("the delete probe consults the bloom too") {
    val df = (1L to 300L)
      .map(i => (i, s"v$i")).toDF("k", "v")
      .withColumn("tag", md5(col("k").cast("string")))
    val path = Tmp.dir("bloom_del") + "/t"
    Scd1Merge.upsert(spark, path, df, Seq("k"), numBuckets = 16,
      statsColumns = Seq(Scd1Merge.BloomTag + "tag"))
    val n = Scd1Merge.delete(spark, path, Seq("k"), col("tag") === md5(lit("99")))
    assert(n == 1, s"exactly the probed row deletes, got $n")
    assert(Scd1Merge.lastPrune._1 <= 2,
      s"the delete rewrite should only touch bloom-candidate buckets: ${Scd1Merge.lastPrune}")
    assert(Scd1Merge.readTable(spark, path).count() == 299)
  }
}
