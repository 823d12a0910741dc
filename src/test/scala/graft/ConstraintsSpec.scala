package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._

/** CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT` parity):
  * ADD validates all existing rows, every write validates its
  * delta-sized batch (SQL CHECK semantics — NULL passes, one FALSE
  * row rejects the whole commit before anything lands), UPDATE
  * validates the post-image, deletes are exempt, constraints ride
  * the manifest through unrelated commits, and the SQL statements
  * route to the same engine calls. */
class ConstraintsSpec extends SparkSpecBase {
  import spark.implicits._

  private def mk(tag: String): String = {
    val path = Tmp.dir(s"constraints_$tag") + "/t"
    val df = (1 to 20).map(i => (i.toLong, i * 100L, s"n$i")).toDF("k", "cents", "name")
    Scd1Merge.upsert(spark, path, df, Seq("k"), numBuckets = 2)
    path
  }

  test("addConstraint validates existing rows; a violating ADD is loud and uncommitted") {
    val path = mk("add")
    val before = Scd1Merge.tableCommit(path).get
    val e = intercept[IllegalStateException] {
      Scd1Merge.addConstraint(spark, path, "big", "cents > 500")
    }
    assert(e.getMessage.contains("big") && e.getMessage.contains("violated"))
    assert(Scd1Merge.tableCommit(path).get == before, "failed ADD must not commit")
    Scd1Merge.addConstraint(spark, path, "pos", "cents > 0")
    assert(Scd1Merge.tableConstraints(path) == Map("pos" -> "cents > 0"))
    intercept[Exception] { // duplicate name
      Scd1Merge.addConstraint(spark, path, "pos", "cents > 1")
    }
  }

  test("writes validate the batch: one FALSE row rejects the whole commit; NULL passes") {
    val path = mk("write")
    Scd1Merge.addConstraint(spark, path, "pos", "cents > 0")
    val before = Scd1Merge.tableCommit(path).get
    val bad = Seq((100L, Some(5L), "ok"), (101L, Some(-1L), "bad"),
      (102L, None, "null_passes")).toDF("k", "cents", "name")
    val e = intercept[IllegalStateException] {
      Scd1Merge.upsert(spark, path, bad, Seq("k"))
    }
    assert(e.getMessage.contains("'pos'") && e.getMessage.contains("1 row"))
    assert(Scd1Merge.tableCommit(path).get == before,
      "a rejected batch must leave NOTHING behind")
    assert(Scd1Merge.readTable(spark, path).count() == 20)
    // NULL passes (SQL CHECK), valid rows commit
    Scd1Merge.upsert(spark, path,
      Seq((100L, Some(5L), "ok"), (102L, None, "null_passes"))
        .toDF("k", "cents", "name"), Seq("k"))
    assert(Scd1Merge.readTable(spark, path).count() == 22)
    // the optimistic path enforces identically
    intercept[IllegalStateException] {
      Scd1Merge.upsertConcurrent(spark, path,
        Seq((103L, Some(-7L), "bad")).toDF("k", "cents", "name"), Seq("k"))
    }
  }

  test("UPDATE validates the post-image; deletes are exempt; CDC checks upsert legs only") {
    val path = mk("upd")
    Scd1Merge.addConstraint(spark, path, "pos", "cents > 0")
    intercept[IllegalStateException] {
      Scd1Merge.update(spark, path, Seq("k"), $"k" <= 3,
        Map("cents" -> ($"cents" - 1000L)))
    }
    assert(Scd1Merge.readTable(spark, path).filter($"k" <= 3 && $"cents" <= 0).count() == 0)
    assert(Scd1Merge.update(spark, path, Seq("k"), $"k" <= 3,
      Map("cents" -> ($"cents" + 1L))) == 3L)
    // deletes remove rows — nothing to check
    Scd1Merge.deleteSoft(spark, path, Seq("k"), $"k" === 20)
    // CDC: delete-tagged rows are exempt, upsert-tagged rows validate
    intercept[IllegalStateException] {
      Scd1Merge.applyCdc(spark, path,
        Seq((5L, -5L, "bad", "upsert")).toDF("k", "cents", "name", "_op"), Seq("k"))
    }
    Scd1Merge.applyCdc(spark, path,
      Seq((6L, 0L, "whatever", "delete")).toDF("k", "cents", "name", "_op"), Seq("k"))
    assert(Scd1Merge.readTable(spark, path).filter($"k" === 6).count() == 0)
  }

  test("constraints ride the manifest; DROP is loud on unknown names and frees writes") {
    val path = mk("carry")
    Scd1Merge.addConstraint(spark, path, "pos", "cents > 0")
    Scd1Merge.upsert(spark, path, Seq((50L, 1L, "x")).toDF("k", "cents", "name"), Seq("k"))
    Scd1Merge.deleteSoft(spark, path, Seq("k"), $"k" === 50)
    assert(Scd1Merge.tableConstraints(path).contains("pos"),
      "constraints must survive unrelated commits")
    intercept[IllegalArgumentException] {
      Scd1Merge.dropConstraint(spark, path, "nope")
    }
    Scd1Merge.dropConstraint(spark, path, "pos")
    Scd1Merge.upsert(spark, path, Seq((51L, -1L, "now ok")).toDF("k", "cents", "name"), Seq("k"))
    assert(Scd1Merge.readTable(spark, path).filter($"cents" < 0).count() == 1)
  }

  test("UPDATE SET cannot silently change a column's type (mixed-file corruption guard)") {
    val path = mk("settype")
    // cents is BIGINT; SET to a string or a double must reject BEFORE
    // any bucket rewrites — a half-written type change is unreadable
    val before = Scd1Merge.tableCommit(path).get
    val e = intercept[IllegalArgumentException] {
      Scd1Merge.update(spark, path, Seq("k"), $"k" === 1,
        Map("cents" -> lit(1.5)))
    }
    assert(e.getMessage.contains("cents") && e.getMessage.contains("cast"))
    assert(Scd1Merge.tableCommit(path).get == before)
    intercept[IllegalArgumentException] {
      Scd1Merge.updateConcurrent(spark, path, Seq("k"), $"k" === 1,
        Map("cents" -> lit("oops")))
    }
    // an explicit cast back is the supported spelling
    assert(Scd1Merge.update(spark, path, Seq("k"), $"k" === 1,
      Map("cents" -> ($"cents" * 2).cast("long"))) == 1L)
    assert(Scd1Merge.readTable(spark, path).filter($"k" === 1)
      .select("cents").as[Long].head() == 200L)
    // store assignment: a LOSSLESS up-cast (int literal into the
    // bigint column) widens the VALUE implicitly — SQL semantics
    assert(Scd1Merge.update(spark, path, Seq("k"), $"k" === 2,
      Map("cents" -> lit(7))) == 1L)
    assert(Scd1Merge.readTable(spark, path).filter($"k" === 2)
      .select("cents").as[Long].head() == 7L)
  }

  test("SQL surface: ALTER TABLE ADD/DROP CONSTRAINT; INSERT rejects violations") {
    val path = mk("sql")
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$path` ADD CONSTRAINT pos CHECK (cents > 0)")
    assert(Scd1Merge.tableConstraints(path) == Map("pos" -> "cents > 0"))
    val e = intercept[Exception] {
      graft.sql.GraftSql.sql(spark,
        s"INSERT INTO graft.`$path` BY NAME SELECT CAST(900 AS BIGINT) k, " +
        "CAST(-1 AS BIGINT) cents, 'bad' name")
    }
    assert(e.getMessage.contains("pos"))
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$path` DROP CONSTRAINT pos")
    assert(Scd1Merge.tableConstraints(path).isEmpty)
  }
}
