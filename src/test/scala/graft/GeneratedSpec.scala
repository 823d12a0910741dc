package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._

/** Generated-column mechanics: compute-when-absent,
  * validate-when-present, loud contradiction rejection. */
class GeneratedSpec extends SparkSpecBase {

  import spark.implicits._

  private val gen = Map("doubled" -> (col("v") * 2))

  test("absent generated column is computed; consistent supplied values pass") {
    val path = Tmp.dir("gen_spec") + "/t"
    Scd1Merge.upsertGenerated(spark, path,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), Seq("k"), gen, numBuckets = 2)
    val got = Scd1Merge.readTable(spark, path)
    assert(got.filter(col("k") === 1L).select("doubled").first().getLong(0) == 20L)
    // supplying the column with CORRECT values is accepted
    Scd1Merge.upsertGenerated(spark, path,
      Seq((3L, 30L, 60L)).toDF("k", "v", "doubled"), Seq("k"), gen)
    assert(Scd1Merge.readTable(spark, path).count() == 3)
  }

  test("a contradicting supplied value fails the whole batch") {
    val path = Tmp.dir("gen_spec2") + "/t"
    Scd1Merge.upsertGenerated(spark, path,
      Seq((1L, 10L)).toDF("k", "v"), Seq("k"), gen, numBuckets = 2)
    intercept[IllegalArgumentException] {
      Scd1Merge.upsertGenerated(spark, path,
        Seq((2L, 20L, 41L)).toDF("k", "v", "doubled"), Seq("k"), gen)
    }
    assert(Scd1Merge.readTable(spark, path).count() == 1, "batch must not land")
  }
}
