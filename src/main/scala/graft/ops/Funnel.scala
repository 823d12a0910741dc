package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — the classic product-analytics operator:
  * for an ordered step sequence (view → click → purchase), find per
  * user the earliest time each step was reached STRICTLY AFTER the
  * previous step, and the furthest stage reached.
  *
  * Implementation is k stacked conditional window-mins over ONE
  * `partitionBy(user)` partitioning: step i's time is
  * `min(ts WHERE type = step_i AND ts > t_{i-1})` over the user's
  * partition, where `t_{i-1}` is the previous window's result — later
  * windows may reference earlier ones because each lives in its own
  * projection over the same Exchange. One shuffle total for any k
  * (Catalyst stacks the Window operators over a single hash
  * partitioning, and the final per-user collapse reuses it), vs the
  * naive k self-join chain's k shuffles — the difference between one
  * pass and k passes at 100 TB.
  */
object Funnel {

  /** @param steps   ordered event-type literals, first = entry step
    * @return one row per user: `ts_<step>` (null while unreached) per
    *         step and `stage` = number of consecutive steps reached */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val u = col(userCol)
    val w = Window.partitionBy(u)
    val stepCols = steps.map("ts_" + _)
    var df = events.select(u, col(typeCol).as("__ty"), col(tsCol).as("__ts"))
    var prev: Option[String] = None
    steps.zip(stepCols).foreach { case (st, c) =>
      val cond = prev match {
        case None    => col("__ty") === st
        case Some(p) => col("__ty") === st && col("__ts") > col(p)
      }
      df = df.withColumn(c, min(when(cond, col("__ts"))).over(w))
      prev = Some(c)
    }
    val aggs = stepCols.map(c => max(col(c)).as(c))
    df.groupBy(u).agg(aggs.head, aggs.tail: _*)
      .withColumn("stage",
        stepCols.map(c => when(col(c).isNotNull, 1).otherwise(0)).reduce(_ + _))
  }
}
