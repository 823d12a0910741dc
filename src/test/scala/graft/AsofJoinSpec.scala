package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("asofLeft matches the latest right time at or before each left time") {
    val left = Seq((1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L),
                   (4L, "u2", 50L), (5L, "u3", 7L)).toDF("id", "k", "t")
    val right = Seq(("u1", 10L), ("u1", 15L), ("u2", 60L)).toDF("k", "rt")
    val got = canon(AsofJoin.asofLeft(left, right, Seq("k"), "t", "rt", "m")
      .select($"id", $"m"))
    assert(got == Seq(
      Seq("1", "10"),   // exact tie: >= semantics match
      Seq("2", "15"),   // latest of two priors
      Seq("3", "null"), // right rows all later
      Seq("4", "null"), // u2's only right row is later
      Seq("5", "null")  // key with no right rows at all
    ))
  }

  test("asofLeft keeps every left row and all left columns") {
    val left = Seq((1L, "u1", 10L, "x")).toDF("id", "k", "t", "payload")
    val right = Seq(("u1", 9L)).toDF("k", "rt")
    val out = AsofJoin.asofLeft(left, right, Seq("k"), "t", "rt", "m")
    assert(out.columns.toSeq == Seq("id", "k", "t", "payload", "m"))
    assert(out.count() == 1)
  }

  test("asofLeftChunked ≡ asofLeft, with a hot key holding 50% of rows") {
    val rnd = new scala.util.Random(7)
    def key(i: Int) = if (i % 2 == 0) "hot" else s"u${rnd.nextInt(20)}"
    val left = (1 to 4000).map(i => (i.toLong, key(i), rnd.nextInt(800000).toLong))
      .toDF("id", "k", "t")
    // right times unique per construction (i*1009): payload pick at a
    // (key, time) tie is order-dependent, so the fixture avoids ties
    val right = (1 to 800).map(i => (key(i), i * 1009L, s"p$i", i / 10.0))
      .toDF("k", "rt", "tag", "price")
    val chunkSpan = 50000L // ~16 chunks over the time range
    val plain = AsofJoin.asofLeft(left, right, Seq("k"), "t", "rt", "m",
      payloadCols = Seq("tag", "price"))
    val chunked = AsofJoin.asofLeftChunked(left, right, Seq("k"), "t", "rt", "m",
      chunkSpan = chunkSpan, payloadCols = Seq("tag", "price"))
    assert(chunked.columns.toSeq.sorted == plain.columns.toSeq.sorted)
    assertSameRows(chunked.select(plain.columns.map(col): _*), plain)
    // the scale point: the hot key's biggest (key, chunk) window
    // partition is a fraction of its full run
    val hotRows = left.filter(col("k") === "hot").count()
    val maxGroup = left.withColumn("chunk", (col("t") / chunkSpan).cast("long"))
      .groupBy(col("k"), col("chunk")).count()
      .agg(max("count")).first().getLong(0)
    assert(maxGroup <= hotRows / 8,
      s"chunking must bound the hot key's partition: max=$maxGroup hot=$hotRows")
  }

  test("asofLeft carries right-side payload columns; null when unmatched") {
    val left = Seq((1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L),
                   (4L, "u2", 50L)).toDF("id", "k", "t")
    val right = Seq(("u1", 10L, "p10", 1.5), ("u1", 15L, "p15", 2.5),
                    ("u2", 60L, "p60", 9.9)).toDF("k", "rt", "tag", "price")
    val got = canon(AsofJoin.asofLeft(left, right, Seq("k"), "t", "rt", "m",
        payloadCols = Seq("tag", "price"))
      .select($"id", $"m", $"tag", $"price"))
    assert(got == Seq(
      Seq("1", "10", "p10", "1.5"),      // tie: the payload of the same-instant row
      Seq("2", "15", "p15", "2.5"),      // latest prior row's payload
      Seq("3", "null", "null", "null"),  // unmatched -> all-null payload
      Seq("4", "null", "null", "null")))
  }
}
