package graft

import graft.merge.Scd1Merge
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Model-based check of the manifest-committed upsert: a random
  * sequence of batches applied to the on-disk table must equal the
  * same sequence folded into a plain Map (last write per key wins —
  * SCD1's whole contract). Covers create, insert, update, replay,
  * empty-batch, and bucket-spread paths in one property. */
class Scd1ModelSpec extends SparkSpecBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen failed"))

  test("random upsert sequences ≡ last-write-wins Map model (4 seeded cases)") {
    val batchGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, for {
        k <- Gen.chooseNum(1L, 60L)
        v <- Gen.identifier.map(_.take(6))
      } yield (k, v)).map(_.distinctBy(_._1))) // unique keys per batch (Q8)
    for (seed <- 1L to 4L) {
      val nBatches = sample(Gen.chooseNum(2, 6), seed * 13)
      val batches = (1 to nBatches).map(i => sample(batchGen, seed * 1000 + i))
      val path = Tmp.dir(s"scd1_model$seed") + "/t"
      var model = Map.empty[Long, String]
      batches.foreach { b =>
        Scd1Merge.upsert(spark, path, b.toDF("k", "v"), Seq("k"), numBuckets = 8)
        model = model ++ b.toMap
      }
      if (model.isEmpty) {
        // every batch was empty: the table was never created
        assert(!new java.io.File(path).exists())
      } else {
        val got = Scd1Merge.readTable(spark, path)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == model, s"disk table diverged from model for seed=$seed")
      }
    }
  }
}
