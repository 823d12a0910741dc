package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** VACUUM reclaims retained history (the judged `s37_vacuum` entry
  * shows it is invisible to current readers; this spec pins the
  * reclamation itself): version dirs beyond the retain depth are
  * physically deleted, snapshots past the new horizon fail loudly,
  * and everything inside the horizon reads byte-identically. */
class VacuumSpec extends SparkSpecBase {

  import spark.implicits._

  private def build(): String = {
    val path = Tmp.dir("vacuum_spec") + "/t"
    val dim = (0 until 40).map(i => (i.toLong, s"name_$i")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = 4,
      retainVersions = 5)
    Scd1Merge.upsert(spark, path,
      dim.filter(col("k") % 4 === 0)
        .withColumn("v", concat(col("v"), lit("_v2"))),
      Seq("k"), retainVersions = 5)
    Scd1Merge.upsert(spark, path,
      dim.filter(col("k") < 5).withColumn("k", col("k") + 100L),
      Seq("k"), retainVersions = 5)
    path
  }

  private def dataDirs(path: String): Set[String] =
    graft.merge.FsList.list(Paths.get(path, "data")).iterator
      .map(_.getFileName.toString).toSet

  test("vacuum deletes aged-out version dirs and the deep snapshot fails loudly") {
    val path = build()
    assert(Scd1Merge.readTableAt(spark, path, 2).count() == 40,
      "commit-1 snapshot readable while retention still covers it")
    val before = dataDirs(path)
    Scd1Merge.vacuum(path, retain = 0)
    val after = dataDirs(path)
    assert(after.subsetOf(before) && after.size < before.size,
      s"vacuum must physically delete aged-out version dirs " +
        s"(before=${before.size}, after=${after.size})")
    val e = intercept[IllegalStateException] {
      Scd1Merge.readTableAt(spark, path, 2).count()
    }
    assert(e.getMessage.contains("vacuumed"),
      s"pre-horizon snapshot must name the vacuum, got: ${e.getMessage}")
  }

  test("reads inside the retain horizon are identical across the vacuum") {
    val path = build()
    val liveBefore = canon(Scd1Merge.readTable(spark, path))
    val backBefore = canon(Scd1Merge.readTableAt(spark, path, 1))
    Scd1Merge.vacuum(path, retain = 1)
    assert(canon(Scd1Merge.readTable(spark, path)) == liveBefore,
      "live state must be untouched by vacuum")
    assert(canon(Scd1Merge.readTableAt(spark, path, 1)) == backBefore,
      "the retained 1-back snapshot must survive a retain=1 vacuum")
  }

  test("age-based vacuum: the time window decides, snapshots inside survive, older reclaim") {
    // injected clock: commits at t=1000, 2000, 3000 (ms)
    var now = 1000L
    Scd1Merge.clockMillis = () => now
    try {
      val path = Tmp.dir("vacuum_age") + "/t"
      val dim = (0 until 40).map(i => (i.toLong, s"name_$i")).toDF("k", "v")
      Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = 4,
        retainVersions = 5)
      now = 2000L
      Scd1Merge.upsert(spark, path,
        dim.filter(col("k") % 4 === 0)
          .withColumn("v", concat(col("v"), lit("_v2"))),
        Seq("k"), retainVersions = 5)
      now = 3000L
      Scd1Merge.upsert(spark, path,
        dim.filter(col("k") < 5).withColumn("k", col("k") + 100L),
        Seq("k"), retainVersions = 5)

      // at t=3500, retain 2 s => cutoff 1500: commit 1 (t=1000) ages
      // out, commits 2+3 survive
      now = 3500L
      val backBefore = canon(Scd1Merge.readTableAt(spark, path, 1))
      Scd1Merge.vacuumRetainHours(path, 2.0 / 3600) // 2 seconds
      assert(canon(Scd1Merge.readTableAt(spark, path, 1)) == backBefore,
        "commit-2 snapshot is inside the window and must survive")
      val e = intercept[IllegalStateException] {
        Scd1Merge.readTableAt(spark, path, 2).count()
      }
      assert(e.getMessage.contains("vacuumed"))
      // ...and the timestamp coordinate agrees: a read at t=2500 (post
      // commit 2) resolves; a read at t=1500 (only commit 1 could
      // serve it) is gone
      assert(canon(Scd1Merge.readTableAtTime(spark, path, 2500L)) == backBefore)
      intercept[IllegalStateException] {
        Scd1Merge.readTableAtTime(spark, path, 1500L).count()
      }
      // wide window: nothing reclaimed, live untouched
      val liveBefore = canon(Scd1Merge.readTable(spark, path))
      Scd1Merge.vacuumRetainHours(path, 24.0)
      assert(canon(Scd1Merge.readTable(spark, path)) == liveBefore)
    } finally Scd1Merge.clockMillis = () => System.currentTimeMillis()
  }

  test("readTableAtTime resolves between commits and at/after the live stamp") {
    var now = 10000L
    Scd1Merge.clockMillis = () => now
    try {
      val path = Tmp.dir("tt_time") + "/t"
      val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      Scd1Merge.upsert(spark, path, v1, Seq("k"), numBuckets = 2,
        retainVersions = 5)
      now = 20000L
      Scd1Merge.upsert(spark, path, Seq((2L, "b2"), (3L, "c")).toDF("k", "v"),
        Seq("k"), retainVersions = 5)
      // strictly between the stamps -> commit 1; at commit-2's stamp
      // and far future -> live; equality with the commit-count read
      assertSameRows(Scd1Merge.readTableAtTime(spark, path, 15000L).orderBy("k"),
        Scd1Merge.readTableAt(spark, path, 1).orderBy("k"))
      assertSameRows(Scd1Merge.readTableAtTime(spark, path, 20000L).orderBy("k"),
        Scd1Merge.readTable(spark, path).orderBy("k"))
      assertSameRows(Scd1Merge.readTableAtTime(spark, path, 99999L).orderBy("k"),
        Scd1Merge.readTable(spark, path).orderBy("k"))
      // exactly the first stamp -> commit 1 (<= semantics)
      assertSameRows(Scd1Merge.readTableAtTime(spark, path, 10000L).orderBy("k"),
        Scd1Merge.readTableAt(spark, path, 1).orderBy("k"))
      // before the table existed -> loud
      val e = intercept[IllegalStateException] {
        Scd1Merge.readTableAtTime(spark, path, 9999L).count()
      }
      assert(e.getMessage.contains("predates"))
    } finally Scd1Merge.clockMillis = () => System.currentTimeMillis()
  }
}
