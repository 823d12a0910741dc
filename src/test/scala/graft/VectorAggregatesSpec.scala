package graft

import graft.functions.VectorAggregates.vecSum
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** The native element-wise vector-sum aggregate: numerically equivalent
  * to the posexplode → per-position agg shape it replaces, SQL-SUM null
  * posture, loud on malformed inputs, and executed as a (partial-agg)
  * ObjectHashAggregate — never a dim× row explosion. */
class VectorAggregatesSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(11)
  private val vecs = Seq.tabulate(400)(i =>
      (i.toLong, i % 5, Array.fill(16)(rng.nextFloat() * 2 - 1)))
    .toDF("id", "grp", "v")
    .repartition(8) // force real partial/merge paths

  test("vec_sum equals the posexplode per-position sum to 1e-9") {
    val native = vecs.groupBy($"grp").agg(vecSum($"v").as("s"))
      .select($"grp", posexplode($"s")).withColumnRenamed("col", "ns")
    val exploded = vecs.select($"grp", posexplode($"v"))
      .groupBy($"grp", $"pos").agg(sum($"col".cast("double")).as("es"))
    val joined = native.join(exploded, Seq("grp", "pos"))
      .select(abs($"ns" - $"es").as("d"))
    assert(joined.agg(max($"d")).head.getDouble(0) < 1e-9)
  }

  test("null rows are skipped; all-null group is SQL NULL") {
    val df = Seq((0, Some(Array(1f, 2f))), (0, None), (1, None))
      .toDF("grp", "v")
    val out = df.groupBy($"grp").agg(vecSum($"v").as("s"))
      .orderBy($"grp").collect()
    assert(out(0).getSeq[Double](1) == Seq(1.0, 2.0))
    assert(out(1).isNullAt(1))
  }

  test("dimension mismatch throws instead of zero-padding") {
    val df = Seq((0, Array(1f, 2f)), (0, Array(1f, 2f, 3f))).toDF("grp", "v")
    val e = intercept[SparkException] {
      df.groupBy($"grp").agg(vecSum($"v")).collect()
    }
    assert(e.getMessage.contains("dimension mismatch")
      || e.getCause.getMessage.contains("dimension mismatch"))
  }

  test("plans as ObjectHashAggregate with a partial stage, no explode") {
    val plan = vecs.groupBy($"grp").agg(vecSum($"v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.toLowerCase.contains("generate"))
    // two aggregate stages = map-side partial sums merge as buffers
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2)
  }

  test("SQL registration: vec_sum usable from spark.sql") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("vecs_agg_sql")
    val n = spark.sql(
      "SELECT grp, vec_sum(v) AS s FROM vecs_agg_sql GROUP BY grp").count()
    assert(n == 5)
  }
}
