package graft

import graft.merge.{PartitionedTable, Scd1Merge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Partition-column layout: path-level pruning BEFORE any stats
  * consult, partition-routed merges that touch only their partitions'
  * files, cross-partition commit atomicity via the parent pin set,
  * dynamic overwrite, metadata-only partition drops + vacuum, and the
  * loud spec-violation rejections. */
class PartitionedTableSpec extends SparkSpecBase {
  import spark.implicits._

  private def fact(months: Seq[String], perMonth: Int = 10): DataFrame =
    months.flatMap(m => (0 until perMonth).map(i =>
      (m, s"$m#$i".hashCode.toLong & 0xffffff, (i + 1).toLong * 100)))
      .toDF("month", "id", "cents")
      .dropDuplicates("month", "id")

  private val keys = Seq("month", "id")

  test("partition-routed upsert: read parity, incremental touches only its partitions") {
    val path = graft.Tmp.dir("ptab_route") + "/t"
    val base = fact(Seq("2024-01", "2024-02", "2024-03"))
    PartitionedTable.upsert(spark, path, base, keys, "month", numBuckets = 2)
    assertSameRows(
      PartitionedTable.readTable(spark, path).orderBy("month", "id"),
      base.orderBy("month", "id"))

    // snapshot the untouched partitions' live child commits and files
    def commitOf(m: String) =
      Scd1Merge.tableCommit(s"$path/p=$m").get
    val (c1, c3) = (commitOf("2024-01"), commitOf("2024-03"))
    // incremental batch: updates into 2024-02 + a brand-new partition
    val batch = fact(Seq("2024-02")).withColumn("cents", $"cents" + 1)
      .unionByName(fact(Seq("2024-04")))
    PartitionedTable.upsert(spark, path, batch, keys, "month")
    // untouched partitions' child tables did not commit
    assert(commitOf("2024-01") == c1 && commitOf("2024-03") == c3)
    assert(commitOf("2024-02") == 2)
    val expect = base.filter($"month" =!= "2024-02")
      .unionByName(batch)
    assertSameRows(
      PartitionedTable.readTable(spark, path).orderBy("month", "id"),
      expect.orderBy("month", "id"))
  }

  test("readTableWhere prunes by PATH: inputFiles confined to the predicate's partitions") {
    val path = graft.Tmp.dir("ptab_prune") + "/t"
    PartitionedTable.upsert(spark, path,
      fact(Seq("2024-01", "2024-02", "2024-03", "2024-04")),
      keys, "month", numBuckets = 2)
    val pruned = PartitionedTable.readTableWhere(spark, path,
      $"month" === "2024-02" && $"cents" > 0)
    assert(PartitionedTable.lastPartitionPrune == (1, 4),
      s"expected 1/4 partitions, got ${PartitionedTable.lastPartitionPrune}")
    val files = pruned.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/p=2024-02/")),
      s"files outside the predicate partition: ${files.filterNot(_.contains("/p=2024-02/")).mkString(",")}")
    // pruning is an optimization, never a semantic
    assertSameRows(pruned.orderBy("id"),
      PartitionedTable.readTable(spark, path)
        .filter($"month" === "2024-02" && $"cents" > 0).orderBy("id"))
    // range predicates prune too (Spark semantics on the value frame)
    PartitionedTable.readTableWhere(spark, path,
      $"month" >= "2024-03").count()
    assert(PartitionedTable.lastPartitionPrune == (2, 4))
    // a predicate with NO partition conjunct reads everything
    PartitionedTable.readTableWhere(spark, path, $"cents" === 100).count()
    assert(PartitionedTable.lastPartitionPrune == (4, 4))
  }

  test("dim-driven probe (DPP shape): only the partitions the dim names are read") {
    val path = graft.Tmp.dir("ptab_dpp") + "/t"
    PartitionedTable.upsert(spark, path,
      fact(Seq("2024-01", "2024-02", "2024-03", "2024-04")),
      keys, "month", numBuckets = 2)
    // the months to scan are only known after filtering the dim
    val dim = Seq(("2024-01", "jan", true), ("2024-02", "feb", false),
      ("2024-03", "mar", true), ("2024-04", "apr", false))
      .toDF("month", "label", "wanted")
    val probe = PartitionedTable.readTablePartitions(spark, path,
      dim.filter($"wanted").select("month"))
    assert(PartitionedTable.lastPartitionPrune == (2, 4))
    assert(probe.inputFiles.forall(f =>
      f.contains("/p=2024-01/") || f.contains("/p=2024-03/")))
    assertSameRows(probe.orderBy("month", "id"),
      PartitionedTable.readTable(spark, path)
        .filter($"month".isin("2024-01", "2024-03")).orderBy("month", "id"))
  }

  test("cross-partition atomicity: un-pinned child commits are invisible; re-pin heals") {
    val path = graft.Tmp.dir("ptab_atomic") + "/t"
    val base = fact(Seq("2024-01", "2024-02"))
    PartitionedTable.upsert(spark, path, base, keys, "month", numBuckets = 2)
    // simulate a writer that crashed AFTER its child commit but BEFORE
    // the parent swap: the child advances, the parent pin does not
    val orphan = fact(Seq("2024-01")).withColumn("cents", lit(999L))
    Scd1Merge.upsert(spark, s"$path/p=2024-01", orphan, keys)
    assert(Scd1Merge.tableCommit(s"$path/p=2024-01").contains(2))
    // readers still see the PINNED (pre-crash) snapshot
    assertSameRows(
      PartitionedTable.readTable(spark, path).orderBy("month", "id"),
      base.orderBy("month", "id"))
    // the idempotent retry re-runs the batch and re-pins
    PartitionedTable.upsert(spark, path, orphan, keys, "month")
    assert(PartitionedTable.readTable(spark, path)
      .filter($"month" === "2024-01").select("cents").distinct()
      .as[Long].collect().toSeq == Seq(999L))
  }

  test("overwritePartitions replaces present partitions wholesale, keeps the rest") {
    val path = graft.Tmp.dir("ptab_ovw") + "/t"
    PartitionedTable.upsert(spark, path,
      fact(Seq("2024-01", "2024-02", "2024-03")), keys, "month",
      numBuckets = 2)
    // replacement for 2024-02 only: fewer rows (vanished keys must go)
    val repl = fact(Seq("2024-02"), perMonth = 3)
      .withColumn("cents", lit(7L))
    PartitionedTable.overwritePartitions(spark, path, repl)
    val t = PartitionedTable.readTable(spark, path)
    assert(t.filter($"month" === "2024-02").count() == 3)
    assert(t.filter($"month" === "2024-02").select("cents").distinct()
      .as[Long].collect().toSeq == Seq(7L))
    assert(t.filter($"month" === "2024-01").count() == 10)
    assert(t.count() == 23)
  }

  test("dropPartitionsWhere is metadata-only; vacuum reclaims unreferenced trees") {
    val path = graft.Tmp.dir("ptab_drop") + "/t"
    PartitionedTable.upsert(spark, path,
      fact(Seq("2024-01", "2024-02", "2024-03")), keys, "month",
      numBuckets = 2)
    val n = PartitionedTable.dropPartitionsWhere(spark, path,
      $"month" < "2024-02")
    assert(n == 1)
    assert(PartitionedTable.readTable(spark, path)
      .select("month").distinct().as[String].collect().sorted.toSeq ==
      Seq("2024-02", "2024-03"))
    // the dropped tree survives for lagging readers (retained parents)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/p=2024-01")))
    // age the parent history out, then vacuum removes the tree
    val hist = java.nio.file.Paths.get(path, "_graft_phistory")
    graft.merge.FsList.list(hist)
      .filter(_.getFileName.toString.toIntOption.exists(_ < 2))
      .foreach(java.nio.file.Files.delete)
    PartitionedTable.vacuum(path)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/p=2024-01")))
    // surviving partitions unharmed
    assert(PartitionedTable.readTable(spark, path).count() == 20)
  }

  test("time travel: readTableAt resolves the old pin set") {
    val path = graft.Tmp.dir("ptab_tt") + "/t"
    val base = fact(Seq("2024-01"))
    PartitionedTable.upsert(spark, path, base, keys, "month", numBuckets = 2)
    PartitionedTable.upsert(spark, path,
      base.withColumn("cents", $"cents" * 2)
        .unionByName(fact(Seq("2024-02"))), keys, "month")
    assertSameRows(
      PartitionedTable.readTableAt(spark, path, 1).orderBy("month", "id"),
      base.orderBy("month", "id"))
    assert(PartitionedTable.readTable(spark, path).count() == 20)
    assert(PartitionedTable.history(spark, path).count() == 2)
  }

  test("loud rejections: partition column not a key, null values, float types, spec drift") {
    val path = graft.Tmp.dir("ptab_rej") + "/t"
    val e1 = intercept[IllegalArgumentException] {
      PartitionedTable.upsert(spark, path, fact(Seq("2024-01")),
        Seq("id"), "month")
    }
    assert(e1.getMessage.contains("must be one of the merge keys"))
    val e2 = intercept[IllegalArgumentException] {
      PartitionedTable.upsert(spark, path,
        Seq((1.5d, 1L, 1L)).toDF("month", "id", "cents"),
        Seq("month", "id"), "month")
    }
    assert(e2.getMessage.contains("not supported"))
    PartitionedTable.upsert(spark, path, fact(Seq("2024-01")), keys, "month",
      numBuckets = 2)
    val e3 = intercept[Exception] {
      PartitionedTable.upsert(spark, path,
        fact(Seq("2024-01")).withColumnRenamed("month", "m2")
          .withColumn("month", lit("x")),
        Seq("m2", "id", "month"), "m2")
    }
    assert(e3.getMessage.contains("partitioned by"))
    val e4 = intercept[IllegalArgumentException] {
      PartitionedTable.upsert(spark, path,
        Seq((null.asInstanceOf[String], 1L, 1L)).toDF("month", "id", "cents"),
        keys, "month")
    }
    assert(e4.getMessage.contains("NULL"))
  }

  test("parent-level CHECK constraints: batch-validated once, new partitions inherit") {
    val path = graft.Tmp.dir("ptab_constraints") + "/t"
    val base = fact(Seq("2024-01", "2024-02"))
    PartitionedTable.upsert(spark, path, base, keys, "month", numBuckets = 2)
    PartitionedTable.addConstraint(spark, path, "pos", "cents > 0")
    assert(PartitionedTable.tableConstraints(path) == Map("pos" -> "cents > 0"))
    // violating ADD is loud against existing rows
    intercept[IllegalStateException] {
      PartitionedTable.addConstraint(spark, path, "big", "cents > 100000")
    }
    // a violating batch rejects BEFORE any child write — including a
    // batch that would have CREATED a new partition
    val before = PartitionedTable.partitions(spark, path).count()
    intercept[IllegalStateException] {
      PartitionedTable.upsert(spark, path,
        Seq(("2024-09", 1L, -5L)).toDF("month", "id", "cents"), keys, "month")
    }
    assert(PartitionedTable.partitions(spark, path).count() == before,
      "the rejected batch must not create its partition")
    // a NEW partition from a valid batch is still constraint-guarded
    PartitionedTable.upsert(spark, path,
      Seq(("2024-09", 1L, 5L)).toDF("month", "id", "cents"), keys, "month")
    intercept[IllegalStateException] {
      PartitionedTable.upsert(spark, path,
        Seq(("2024-09", 2L, -1L)).toDF("month", "id", "cents"), keys, "month")
    }
    // UPDATE post-image validates; overwrite validates; DROP frees
    intercept[IllegalStateException] {
      PartitionedTable.updateWhere(spark, path, col("month") === "2024-01",
        Map("cents" -> (col("cents") - 100000L)))
    }
    intercept[IllegalStateException] {
      PartitionedTable.overwritePartitions(spark, path,
        Seq(("2024-02", 1L, -9L)).toDF("month", "id", "cents"))
    }
    PartitionedTable.dropConstraint(spark, path, "pos")
    PartitionedTable.upsert(spark, path,
      Seq(("2024-09", 3L, -1L)).toDF("month", "id", "cents"), keys, "month")
    assert(PartitionedTable.readTable(spark, path).filter($"cents" < 0).count() == 1)
  }

  test("timestampAsOf resolves the parent history (library + format read)") {
    val path = graft.Tmp.dir("ptab_ts") + "/t"
    val v1 = fact(Seq("2024-01"))
    PartitionedTable.upsert(spark, path, v1, keys, "month", numBuckets = 2)
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    PartitionedTable.upsert(spark, path, fact(Seq("2024-02")), keys, "month")
    assertSameRows(
      PartitionedTable.readTableAtTime(spark, path, between)
        .orderBy("month", "id"),
      v1.orderBy("month", "id"))
    assertSameRows(
      spark.read.format("graft")
        .option("timestampAsOf", between.toString).load(path)
        .orderBy("month", "id"),
      v1.orderBy("month", "id"))
    intercept[IllegalStateException] {
      PartitionedTable.readTableAtTime(spark, path, 1L)
    }
  }

  private def mmFact(months: Seq[String], regions: Seq[String]): DataFrame =
    months.flatMap(m => regions.flatMap(r => (0 until 5).map(i =>
      (m, r, s"$m$r#$i".hashCode.toLong & 0xffffff, (i + 1).toLong))))
      .toDF("month", "region", "id", "cents")
      .dropDuplicates("month", "region", "id")

  test("multi-column PARTITIONED BY (month, region): routing, parity, per-tuple children") {
    val path = graft.Tmp.dir("ptab_multi") + "/t"
    val base = mmFact(Seq("2024-01", "2024-02"), Seq("EU", "US"))
    val mkeys = Seq("month", "region", "id")
    PartitionedTable.upsert(spark, path, base, mkeys, "month,region", numBuckets = 2)
    assertSameRows(
      PartitionedTable.readTable(spark, path).orderBy("month", "region", "id"),
      base.orderBy("month", "region", "id"))
    // one child per (month, region) tuple
    assert(PartitionedTable.partitions(spark, path).count() == 4)
    val cols = PartitionedTable.partitions(spark, path).columns.toSeq
    assert(cols.take(2) == Seq("month_value", "region_value"))
    // an incremental batch touches ONLY its tuple's child files
    val before = PartitionedTable.readTable(spark, path).inputFiles.toSet
    PartitionedTable.upsert(spark, path,
      Seq(("2024-02", "EU", 999999L, 7L)).toDF("month", "region", "id", "cents"),
      mkeys, "month,region")
    val after = PartitionedTable.readTable(spark, path).inputFiles.toSet
    val changed = (after -- before) ++ (before -- after)
    assert(changed.nonEmpty && changed.forall(f =>
      f.contains("month") && f.contains("2024-02") && f.contains("EU")),
      s"only the touched tuple's child may change: $changed")
  }

  test("multi-column pruning: conjuncts over any SUBSET of the partition columns prune by path") {
    val path = graft.Tmp.dir("ptab_multi_prune") + "/t"
    val base = mmFact(Seq("2024-01", "2024-02", "2024-03"), Seq("EU", "US"))
    PartitionedTable.upsert(spark, path, base,
      Seq("month", "region", "id"), "month,region", numBuckets = 2)
    // both columns pinned → exactly one of 6 children
    val r1 = PartitionedTable.readTableWhere(spark, path,
      col("month") === "2024-02" && col("region") === "EU")
    assert(r1.count() == base.filter($"month" === "2024-02" && $"region" === "EU").count())
    assert(PartitionedTable.lastPartitionPrune == (1, 6),
      s"got ${PartitionedTable.lastPartitionPrune}")
    // one column only → that column's slice (2 of 6)
    val r2 = PartitionedTable.readTableWhere(spark, path, col("month") === "2024-03")
    assert(r2.count() == base.filter($"month" === "2024-03").count())
    assert(PartitionedTable.lastPartitionPrune == (2, 6))
    // region-only (the SECOND column) prunes too — 3 of 6
    val r3 = PartitionedTable.readTableWhere(spark, path,
      col("region") === "US" && col("cents") > 1L)
    assert(r3.count() == base.filter($"region" === "US" && $"cents" > 1L).count())
    assert(PartitionedTable.lastPartitionPrune == (3, 6))
    // UPDATE/DELETE prune the same way
    PartitionedTable.updateWhere(spark, path,
      col("month") === "2024-01" && col("region") === "US",
      Map("cents" -> ($"cents" + 100L)))
    assert(PartitionedTable.lastPartitionPrune == (1, 6))
    assertSameRows(
      PartitionedTable.readTable(spark, path).orderBy("month", "region", "id"),
      base.withColumn("cents",
        when($"month" === "2024-01" && $"region" === "US", $"cents" + 100L)
          .otherwise($"cents"))
        .orderBy("month", "region", "id"))
  }

  test("multi-column: dynamic overwrite per tuple; spec drift and non-key columns reject") {
    val path = graft.Tmp.dir("ptab_multi_ow") + "/t"
    val base = mmFact(Seq("2024-01"), Seq("EU", "US"))
    val mkeys = Seq("month", "region", "id")
    PartitionedTable.upsert(spark, path, base, mkeys, "month,region")
    PartitionedTable.overwritePartitions(spark,
      path, Seq(("2024-01", "EU", 1L, 42L)).toDF("month", "region", "id", "cents"))
    val now = PartitionedTable.readTable(spark, path)
    assert(now.filter($"region" === "EU").count() == 1)   // replaced wholesale
    assert(now.filter($"region" === "US").count() == 5)   // untouched
    // partition spec drift is loud
    val e = intercept[Exception] {
      PartitionedTable.upsert(spark, path, base, mkeys, "month")
    }
    assert(e.getMessage.contains("partitioned by"))
    // every partition column must be a merge key
    val e2 = intercept[Exception] {
      PartitionedTable.upsert(spark, graft.Tmp.dir("ptab_multi_bad") + "/t",
        base, Seq("month", "id"), "month,region")
    }
    assert(e2.getMessage.contains("region"))
  }
}
