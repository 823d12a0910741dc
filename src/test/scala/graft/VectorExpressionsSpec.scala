package graft

import graft.functions.VectorFunctions.{vecCosine, vecDot}
import org.apache.spark.sql.functions._

/** The native expressions must be bit-identical to the HOF formulation
  * they replaced (sequential float→double folds) and must stay inside
  * whole-stage codegen. */
class VectorExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private val vectors = {
    val rng = new scala.util.Random(7)
    Seq.fill(50)((Array.fill(64)(rng.nextFloat() * 2 - 1),
                  Array.fill(64)(rng.nextFloat() * 2 - 1))).toDF("a", "b")
  }

  test("vecDot is bit-identical to the sequential HOF fold") {
    val diff = vectors
      .select((vecDot($"a", $"b") - hofDot($"a", $"b")).as("d"))
      .filter($"d" =!= 0.0).count()
    assert(diff == 0, "native and HOF dot products must match bit-for-bit")
  }

  test("vecCosine equals dot/(|a||b|) with sequential folds, bit-for-bit") {
    val expected = hofDot($"a", $"b") / (sqrt(hofDot($"a", $"a")) * sqrt(hofDot($"b", $"b")))
    val diff = vectors
      .select((vecCosine($"a", $"b") - expected).as("d"))
      .filter($"d" =!= 0.0).count()
    assert(diff == 0)
  }

  test("native expressions run inside WholeStageCodegen") {
    // a file-backed scan: LocalTableScan projects driver-side with no
    // codegen stage at all, proving nothing either way
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(vecCosine($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    // "*(n)" is the simple-string marker for a WholeStageCodegen stage;
    // an interpreted fallback would print a bare Project
    assert(plan.contains("*(1) Project"), s"expected codegen span in:\n$plan")
  }

  test("null inputs yield null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(vecCosine($"a", $"b")).first().isNullAt(0))
  }

  test("mismatched vector lengths yield null, not a partial dot") {
    // HOF parity: zip_with pads with null and the fold propagates it —
    // a malformed embedding must be detectable, not plausibly wrong
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(vecDot($"a", $"b")).first().isNullAt(0))
    assert(df.select(vecCosine($"a", $"b")).first().isNullAt(0))
  }

  test("vec_dot / vec_cosine are callable from SQL after registration") {
    GraftExtensions.register(spark)
    vectors.createOrReplaceTempView("vecs")
    val sqlSide = spark.sql(
      "SELECT vec_cosine(a, b) AS c, vec_dot(a, b) AS d FROM vecs")
    val dfSide = vectors.select(vecCosine($"a", $"b").as("c"), vecDot($"a", $"b").as("d"))
    assertSameRows(sqlSide, dfSide)
  }
}
