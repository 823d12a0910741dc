package graft

import graft.merge.{PartitionedTable, Scd1Merge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RESTORE and CLONE on the partitioned layout: a restore is a
  * parent-level pin rewind (O(partitions) metadata, loud when a child
  * vacuumed past its pin), a clone forks every child AT ITS PIN.
  * Divergence after a shallow clone must be copy-on-write in both
  * directions. */
class PartitionedRestoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def fact(months: Seq[String], perMonth: Int = 8): DataFrame =
    months.flatMap(m => (0 until perMonth).map(i =>
      (m, s"$m#$i".hashCode.toLong & 0xffffff, (i + 1).toLong * 100)))
      .toDF("month", "id", "cents")
      .dropDuplicates("month", "id")

  private val keys = Seq("month", "id")

  test("restore rewinds the pin set as a NEW commit; later partitions drop out; feed is the reverse diff") {
    val path = Tmp.dir("prestore") + "/t"
    val v1 = fact(Seq("2024-01", "2024-02"))
    PartitionedTable.upsert(spark, path, v1, keys, "month", numBuckets = 2)
    // commit 2: update 2024-02 + NEW partition 2024-03
    PartitionedTable.upsert(spark, path,
      fact(Seq("2024-02")).withColumn("cents", $"cents" + 7)
        .unionByName(fact(Seq("2024-03"))), keys, "month")
    assert(PartitionedTable.tableCommit(path).contains(2))
    val restored = PartitionedTable.restore(path, 1)
    assert(restored == 3, s"restore must land as a NEW commit, got $restored")
    // content == the v1 snapshot; 2024-03 gone from the pin set
    assertSameRows(PartitionedTable.readTable(spark, path)
      .orderBy("month", "id"), v1.orderBy("month", "id"))
    // history after the restore point stays readable (time travel
    // across a restore serves the pre-restore state)
    assert(canon(PartitionedTable.readTableAt(spark, path, 1)
        .filter($"month" === "2024-03")).nonEmpty)
    // the change feed across the restore is the reverse diff: the
    // 2024-03 rows surface as deletes, the cents+7 rows as updates
    val feed = PartitionedTable.readChanges(spark, path, 1, 0)
    val types = feed.groupBy($"_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types.getOrElse("delete", 0L) == 8L, types.toString)
    assert(types.getOrElse("update", 0L) == 8L, types.toString)
    // the restored table keeps working: upsert after restore
    PartitionedTable.upsert(spark, path, fact(Seq("2024-04")), keys, "month")
    assert(canon(PartitionedTable.readTable(spark, path)
      .filter($"month" === "2024-04")).size == 8)
  }

  test("restore is all-or-nothing: a child vacuumed past its pin fails loudly, table untouched") {
    val path = Tmp.dir("prestore_vac") + "/t"
    PartitionedTable.upsert(spark, path, fact(Seq("2024-01")), keys,
      "month", numBuckets = 2)
    // many commits into the same partition, then vacuum the child hard
    for (i <- 1 to 3)
      PartitionedTable.upsert(spark, path,
        fact(Seq("2024-01")).withColumn("cents", $"cents" + i), keys, "month")
    Scd1Merge.vacuum(s"$path/p=2024-01", retain = 0)
    val e = intercept[IllegalStateException] {
      PartitionedTable.restore(path, 3)
    }
    assert(e.getMessage.contains("2024-01") &&
      e.getMessage.contains("pinned child commit"), e.getMessage)
    // live table untouched: still the latest content
    assert(canon(PartitionedTable.readTable(spark, path)
      .filter($"cents" === 103L)).nonEmpty)
  }

  test("SQL RESTORE routes to the partitioned layer (version + out-of-range loudness)") {
    val path = Tmp.dir("prestore_sql") + "/t"
    PartitionedTable.upsert(spark, path, fact(Seq("2024-01")), keys,
      "month", numBuckets = 2)
    PartitionedTable.upsert(spark, path,
      fact(Seq("2024-01")).withColumn("cents", $"cents" * 2), keys, "month")
    graft.sql.GraftSql.sql(spark,
      s"RESTORE TABLE graft.`$path` TO VERSION AS OF 1").collect()
    assertSameRows(PartitionedTable.readTable(spark, path)
      .orderBy("month", "id"), fact(Seq("2024-01")).orderBy("month", "id"))
    val e = intercept[IllegalStateException] {
      graft.sql.GraftSql.sql(spark,
        s"RESTORE TABLE graft.`$path` TO VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("out of range"), e.getMessage)
  }

  test("partition evolution: new layout in one swap, time travel across it, feed guarded, vacuum sweeps old gens") {
    import java.nio.file.{Files, Paths}
    val path = Tmp.dir("pevolve") + "/t"
    // keyed (month, id) with id ALSO usable as a bucket spec source
    PartitionedTable.upsert(spark, path,
      fact(Seq("2024-01", "2024-02", "2024-03")), keys, "month",
      numBuckets = 2)
    val before = canon(PartitionedTable.readTable(spark, path))
    val n = graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$path` SET PARTITIONED BY (bucket(4, id))")
      .as[Long].head()
    assert(n >= 2, s"expected multiple bucket partitions, got $n")
    // content identical through the evolution; new layout answers
    assert(canon(PartitionedTable.readTable(spark, path)) == before)
    assert(PartitionedTable.partitionColumn(path).contains("bucket(4,id)"))
    // pruned read through the NEW spec: an id-equality predicate
    // touches one bucket partition
    val someId = PartitionedTable.readTable(spark, path)
      .select($"id").head().getLong(0)
    PartitionedTable.readTableWhere(spark, path, $"id" === someId).collect()
    assert(PartitionedTable.lastPartitionPrune._1 == 1,
      s"prune: ${PartitionedTable.lastPartitionPrune}")
    // time travel ACROSS the evolution serves the old layout's content
    assert(canon(PartitionedTable.readTableAt(spark, path, 1)) == before)
    // the feed across the evolution is guarded loudly
    val e = intercept[IllegalStateException] {
      PartitionedTable.readChanges(spark, path, 1, 0)
    }
    assert(e.getMessage.contains("PARTITION EVOLUTION"), e.getMessage)
    // ingest continues through the new layout
    PartitionedTable.upsertMulti(spark, path,
      fact(Seq("2024-04")), keys, Seq("bucket(4, id)"))
    assert(canon(PartitionedTable.readTable(spark, path)).size ==
      before.size + 8)
    // vacuum(0): old-generation children unreferenced → swept
    PartitionedTable.vacuum(path, retain = 0)
    assert(!Files.exists(Paths.get(path, "p=2024-01")),
      "old layout children must be swept by vacuum")
    assert(canon(PartitionedTable.readTable(spark, path)).size ==
      before.size + 8, "live table must survive its vacuum")
  }

  test("recluster: per-child Z-order behind ONE parent swap, content identical, SQL OPTIMIZE ZORDER routes") {
    val path = Tmp.dir("precluster") + "/t"
    PartitionedTable.upsert(spark, path,
      fact(Seq("2024-01", "2024-02", "2024-03"), perMonth = 40), keys,
      "month", numBuckets = 2)
    val before = canon(PartitionedTable.readTable(spark, path))
    val pc0 = PartitionedTable.tableCommit(path).get
    val n = graft.sql.GraftSql.sql(spark,
      s"OPTIMIZE graft.`$path` ZORDER BY (cents)")
      .collect().head.getLong(0)
    assert(n > 0, "recluster must rewrite buckets")
    assert(PartitionedTable.tableCommit(path).contains(pc0 + 1),
      "the re-layout must be ONE atomic parent swap")
    assert(canon(PartitionedTable.readTable(spark, path)) == before,
      "clustering is content-identical")
    // maintenance is idempotent: nothing dirty → nothing rewritten
    assert(PartitionedTable.recluster(spark, path, Seq("cents"),
      dirtyOnly = true) == 0)
  }

  test("shallow clone forks at the PIN, diverges copy-on-write both ways; deep clone survives source vacuum") {
    val root = Tmp.dir("pclone")
    val src = root + "/src"
    PartitionedTable.upsert(spark, src,
      fact(Seq("2024-01", "2024-02")), keys, "month", numBuckets = 2)
    val sh = root + "/shallow"
    assert(PartitionedTable.cloneShallow(src, sh) == 1)
    assertSameRows(PartitionedTable.readTable(spark, sh).orderBy("month", "id"),
      PartitionedTable.readTable(spark, src).orderBy("month", "id"))
    // divergence: write to the clone, source unchanged; write to the
    // source, clone unchanged
    PartitionedTable.upsert(spark, sh,
      fact(Seq("2024-01")).withColumn("cents", lit(1L)), keys, "month")
    assert(canon(PartitionedTable.readTable(spark, src)
      .filter($"cents" === 1L)).isEmpty)
    PartitionedTable.upsert(spark, src,
      fact(Seq("2024-03")), keys, "month")
    assert(canon(PartitionedTable.readTable(spark, sh)
      .filter($"month" === "2024-03")).isEmpty)
    // deep clone: byte-independent — vacuum + rewrite the source, the
    // clone still reads its snapshot
    val dp = root + "/deep"
    assert(PartitionedTable.cloneDeep(src, dp) == 1)
    PartitionedTable.upsert(spark, src,
      fact(Seq("2024-01", "2024-02", "2024-03"))
        .withColumn("cents", $"cents" + 9), keys, "month")
    Seq("2024-01", "2024-02", "2024-03").foreach(m =>
      Scd1Merge.vacuum(s"$src/p=$m", retain = 0))
    assert(canon(PartitionedTable.readTable(spark, dp)).size == 24)
    assert(canon(PartitionedTable.readTable(spark, dp)
      .filter($"cents" === 109L)).isEmpty, "deep clone must not see post-clone writes")
    // clone refuses to overwrite an existing table
    val e = intercept[IllegalStateException] {
      PartitionedTable.cloneShallow(src, sh)
    }
    assert(e.getMessage.contains("already"), e.getMessage)
  }
}
