package graft

import graft.merge.Scd1Merge
import graft.pipeline.Quarantine
import org.apache.spark.sql.functions._

/** Constraint gate + dead-letter zone: split accounting, violation
  * reasons, the NULL-is-violation posture, and replayability (fixed
  * rows re-submit cleanly through the keyed upsert). */
class QuarantineSpec extends SparkSpecBase {
  import spark.implicits._

  test("violations quarantine with reasons; clean rows commit; NULL violates") {
    val path = Tmp.dir("quar") + "/t"
    val q = Tmp.dir("quar") + "/dead"
    val src = Seq(
      (1L, 10L, "ok"),                        // clean
      (2L, -5L, "ok"),                        // amount_positive
      (3L, 10L, null.asInstanceOf[String]),   // tag_present (NULL -> violation)
      (4L, -1L, null.asInstanceOf[String])    // both
    ).toDF("k", "amt", "tag")
    val (good, bad) = Quarantine.upsertWithConstraints(spark, path, src, Seq("k"),
      Map("amount_positive" -> ($"amt" > 0), "tag_present" -> $"tag".isNotNull),
      q, batchId = "b1")
    assert((good, bad) == (1L, 3L))
    assert(canon(Scd1Merge.readTable(spark, path).select("k")) == Seq(Seq("1")))
    val dead = spark.read.parquet(q)
    assert(canon(dead.select("k", "__violations")) == Seq(
      Seq("2", "amount_positive"),
      Seq("3", "tag_present"),
      Seq("4", "amount_positive,tag_present")))
    assert(dead.select("_quarantine_batch").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("b1"))
    // replay after the fix: corrected rows upsert through the same gate
    val fixed = Seq((2L, 5L, "ok"), (3L, 10L, "late"), (4L, 1L, "x"))
      .toDF("k", "amt", "tag")
    val (g2, b2) = Quarantine.upsertWithConstraints(spark, path, fixed, Seq("k"),
      Map("amount_positive" -> ($"amt" > 0), "tag_present" -> $"tag".isNotNull),
      q, batchId = "b2")
    assert((g2, b2) == (3L, 0L))
    assert(Scd1Merge.readTable(spark, path).count() == 4)
    // quarantine keeps its history (append-only facts, per-batch dirs)
    assert(spark.read.parquet(q).count() == 3)
  }
}
