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
  }
}
