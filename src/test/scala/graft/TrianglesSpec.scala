package graft

import graft.graph.Triangles
import org.apache.spark.sql.functions._

/** Triangle counts on planted graphs with known answers. */
class TrianglesSpec extends SparkSpecBase {
  import spark.implicits._

  test("triangleCounts: K4 + pendant + triangle-free path, any input orientation") {
    // K4 on {1,2,3,4} (4 triangles, each node on 3), pendant 5-1 (on
    // none), path 6-7-8 (wedge, no closure). Edges fed DISORDERED and
    // DUPLICATED (both orientations + repeats) plus a self-loop —
    // the canonicalization must absorb all of it.
    val edges = Seq(
      (2L, 1L), (1L, 3L), (4L, 1L), (2L, 3L), (4L, 2L), (3L, 4L),
      (3L, 2L), (2L, 3L), // duplicate + reverse
      (5L, 5L),           // self-loop: dropped
      (1L, 5L), (6L, 7L), (8L, 7L)
    ).toDF("s", "d")
    val got = Triangles.triangleCounts(edges, "s", "d")
      .orderBy($"node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // global count = Σ n_tri / 3
    assert(got.map(_._2).sum / 3 == 4)
    // orientation choice cannot change per-node counts
    val idOrdered = Triangles.triangleCounts(edges, "s", "d", byDegree = false)
      .orderBy($"node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(idOrdered.toSeq == got.toSeq)
  }

  test("degree ordering collapses the hub's wedge blowup on a star; counts unchanged on a planted hub") {
    // star: hub id 50 in the MIDDLE of leaf ids 1..100 (hub excluded).
    // id order: leaves < 50 point INTO the hub, leaves > 50 point OUT
    // — the hub is a wedge middle with indeg·outdeg = 49·50 = 2450.
    // degree order: every edge points leaf → hub (deg 1 < deg 99), so
    // indeg(hub)·outdeg(hub) = 99·0 = 0 wedges. This is the measured
    // form of the O(E^{3/2}) claim, not a Scaladoc promise.
    val leaves = (1L to 100L).filter(_ != 50L)
    val star = leaves.map(l => (50L, l)).toDF("s", "d")
    assert(Triangles.wedgeCount(star, "s", "d", byDegree = false) == 49L * 50L)
    assert(Triangles.wedgeCount(star, "s", "d", byDegree = true) == 0L)
    // planted hub PLUS triangles touching it: hub 50 joins the triangle
    // {50, 10, 90} — counts must be identical under both orientations
    val withTri = star.unionByName(Seq((10L, 90L)).toDF("s", "d"))
    def counts(byDeg: Boolean) =
      Triangles.triangleCounts(withTri, "s", "d", byDeg)
        .orderBy($"node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byDeg = counts(true)
    assert(byDeg == Seq(10L -> 1L, 50L -> 1L, 90L -> 1L))
    assert(byDeg == counts(false))
  }
}
