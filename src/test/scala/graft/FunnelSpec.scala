package graft

import graft.ops.Funnel
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpecBase {

  // user 1: full ordered funnel; user 2: click BEFORE view (must not
  // count), later click counts; user 3: view only; user 4: purchase
  // with no prior steps -> stage 0
  private lazy val ev = {
    import spark.implicits._
    Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 15L),
      (3L, "view", 7L), (3L, "purchase", 6L),
      (4L, "purchase", 1L)
    ).toDF("user_id", "event_type", "ts")
  }

  test("funnel: strict ordering, per-step times, stage") {
    val got = Funnel.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    def row(i: Int) = (got(i).getAs[Long]("user_id"),
      Option(got(i).get(1)), Option(got(i).get(2)), Option(got(i).get(3)),
      got(i).getAs[Int]("stage"))
    assert(row(0) == ((1L, Some(10L), Some(20L), Some(30L), 3)))
    assert(row(1) == ((2L, Some(10L), Some(15L), None, 2)))
    // user 3's purchase precedes the view -> not reached
    assert(row(2) == ((3L, Some(7L), None, None, 1)))
    assert(row(3) == ((4L, None, None, None, 0)))
  }

  test("k-step funnel plans exactly one exchange") {
    val df = Funnel.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"expected the 3-step funnel to reuse one user partitioning, got $exchanges:\n$p")
  }
}
