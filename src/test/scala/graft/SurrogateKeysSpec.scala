package graft

import graft.ops.KeyGenStrategy
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Scalable keys must be byte-identical to the fidelity GlobalWindow
  * strategy for unique order keys — the invariant that lets the
  * pipeline run the scale path while w1_rownumber_keys pins fidelity.
  * Property cases are drawn from scalacheck Gens with fixed seeds
  * (scalatestplus isn't resolvable offline; explicit seeds also make
  * failures exactly reproducible). */
class SurrogateKeysSpec extends SparkSpecBase {
  import spark.implicits._

  private val uniqueKeys: Gen[List[String]] =
    Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.identifier.map(_.take(12))).map(_.distinct))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  test("Scalable ≡ GlobalWindow for unique natural keys (property, 5 seeded cases)") {
    for (seed <- 1L to 5L) {
      val keys = sample(uniqueKeys, seed)
      val base = sample(Gen.chooseNum(0L, 1000L), seed * 31)
      val df = keys.toDF("nk").repartition(4)
      val g = KeyGenStrategy.GlobalWindow.assign(df, "nk", "key", base)
        .select($"key", $"nk")
      // assignPartitioned: exercise the two-pass scale path directly
      // (plain assign would route these small inputs to the window path)
      val sc = KeyGenStrategy.Scalable.assignPartitioned(df, "nk", "key", base)
        .select($"key", $"nk")
      assert(canon(g) == canon(sc), s"diverged for seed=$seed n=${keys.size} base=$base")
    }
  }

  test("Scalable keys are dense base+1..base+n in natural-key order") {
    val df = (1 to 100).map(i => f"k$i%03d").toDF("nk").repartition(3)
    val keyed = KeyGenStrategy.Scalable.assignPartitioned(df, "nk", "key", 1L)
    val rows = keyed.orderBy($"key").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("nk")))
    assert(rows.map(_._1).toSeq == (2L to 101L))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
  }

  test("MonotonicId keys are unique and count-preserving (structural, Q4)") {
    val df = (1 to 500).map(i => s"k$i").toDF("nk").repartition(4)
    val keyed = KeyGenStrategy.MonotonicId.assign(df, "nk", "key", 10L)
    assert(keyed.select($"key").distinct().count() == 500)
    assert(keyed.agg(min($"key")).first().getLong(0) >= 11L)
  }
}
