package graft

import graft.graph.PageRank

/** The distributed fixed-point PageRank must match an independent
  * driver-side replay of the same integer recurrence (the in-test
  * oracle), and a regular graph must sit exactly on the uniform fixed
  * point — floor division makes both checks EXACT equalities. */
class PageRankSpec extends SparkSpecBase {

  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val unit = scale / nodes.size
    val base = 15L * unit / 100L
    var r = nodes.map(_ -> unit).toMap
    for (_ <- 0 until iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (u, v) => in(v) += r(u) / deg(u) }
      r = nodes.map(v => v -> (base + 85L * in(v) / 100L)).toMap
    }
    r
  }

  test("integer PageRank matches a driver-side replay of the recurrence") {
    val raw = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L))
    val sym = (raw ++ raw.map(_.swap)).distinct
    val got = PageRank.pageRank(sym.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(sym, 10, 1000000000L))
    assert(PageRank.lastRounds == 10)
  }

  test("a regular graph sits exactly on the uniform fixed point") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.pageRank(e, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // unit = 5e8; base + 85%·unit folds back to exactly unit
    assert(got == Map(1L -> 500000000L, 2L -> 500000000L))
  }
}
