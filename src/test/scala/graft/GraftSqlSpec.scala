package graft

import graft.merge.Scd1Merge
import graft.sql.{GraftSql, GraftTables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL DML ≡ Scala API: every statement form the parser routes must
  * produce the bit-identical table state its API twin does, and every
  * rejected form must fail loudly — never silently run the wrong
  * merge. */
class GraftSqlSpec extends SparkSpecBase {
  import spark.implicits._

  private def dim(n: Int) =
    (0 until n).map(i => (i.toLong, s"name_$i", (i % 5).toLong))
      .toDF("k", "name", "region")

  private def mkTable(tag: String, n: Int = 20): String = {
    val path = graft.Tmp.dir(s"graft_sql_$tag") + "/t"
    Scd1Merge.upsert(spark, path, dim(n), Seq("k"), numBuckets = 4)
    path
  }

  test("DELETE FROM SQL == API delete, returns num_affected_rows") {
    val sqlT = mkTable("del_sql"); val apiT = mkTable("del_api")
    val got = GraftSql.sql(spark,
      s"DELETE FROM graft.`$sqlT` WHERE k >= 10 AND region = 2")
    Scd1Merge.delete(spark, apiT, Seq("k"), $"k" >= 10 && $"region" === 2)
    assert(got.as[Long].head() == 2L) // k=12, k=17
    assertSameRows(Scd1Merge.readTable(spark, sqlT).orderBy($"k"),
      Scd1Merge.readTable(spark, apiT).orderBy($"k"))
  }

  test("UPDATE SET SQL == API update; WHERE optional; keys cannot be SET") {
    val sqlT = mkTable("upd_sql"); val apiT = mkTable("upd_api")
    val got = GraftSql.sql(spark,
      s"UPDATE graft.`$sqlT` SET name = concat(name, '_v2'), region = region + 10 WHERE k < 5")
    Scd1Merge.update(spark, apiT, Seq("k"), $"k" < 5,
      Map("name" -> concat($"name", lit("_v2")), "region" -> ($"region" + 10)))
    assert(got.as[Long].head() == 5L)
    assertSameRows(Scd1Merge.readTable(spark, sqlT).orderBy($"k"),
      Scd1Merge.readTable(spark, apiT).orderBy($"k"))
    // no WHERE = all rows
    val all = GraftSql.sql(spark, s"UPDATE graft.`$sqlT` SET region = 0")
    assert(all.as[Long].head() == 20L)
    assert(Scd1Merge.readTable(spark, sqlT)
      .filter($"region" =!= 0).count() == 0)
    // merge keys are immutable under UPDATE
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"UPDATE graft.`$sqlT` SET k = k + 1")
    }
  }

  test("MERGE upsert form == API upsert; registered short names work") {
    val sqlT = mkTable("mrg_sql"); val apiT = mkTable("mrg_api")
    val batch = Seq((3L, "three_v2", 30L), (100L, "hundred", 0L))
      .toDF("k", "name", "region")
    batch.createOrReplaceTempView("mrg_batch")
    GraftTables.register("mrg_target", sqlT)
    GraftSql.sql(spark,
      """MERGE INTO mrg_target AS t USING mrg_batch AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    GraftTables.unregister("mrg_target")
    Scd1Merge.upsert(spark, apiT, batch, Seq("k"))
    assertSameRows(Scd1Merge.readTable(spark, sqlT).orderBy($"k"),
      Scd1Merge.readTable(spark, apiT).orderBy($"k"))
  }

  test("MERGE CDC form (MATCHED AND op DELETE / UPDATE * / INSERT *) == applyCdc") {
    val sqlT = mkTable("cdc_sql"); val apiT = mkTable("cdc_api")
    // op-tagged source: source-only column consumed by the AND cond,
    // dropped by the target projection
    val cdc = Seq(
      (1L, "one_v2", 10L, "update"),
      (100L, "new", 0L, "insert"),
      (5L, "five", 1L, "delete"),
      // delete-tag on an ABSENT key: SQL semantics say the matched-
      // clause condition never applies to unmatched rows — this row
      // falls through to WHEN NOT MATCHED THEN INSERT * and INSERTS
      // (Delta parity; routing it to a delete no-op would silently
      // diverge from the identical SQL on Delta)
      (999L, "ghost", 0L, "delete")
    ).toDF("k", "name", "region", "_op")
    cdc.createOrReplaceTempView("cdc_batch")
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$sqlT` t USING cdc_batch s ON t.k = s.k
         |WHEN MATCHED AND s._op = 'delete' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // API twin of the SQL semantics: delete only where MATCHED
    Scd1Merge.applyCdc(spark, apiT,
      cdc.withColumn("_op",
        when($"_op" === "delete" && $"k" < 20, "delete").otherwise("upsert")),
      Seq("k"))
    assertSameRows(Scd1Merge.readTable(spark, sqlT).orderBy($"k"),
      Scd1Merge.readTable(spark, apiT).orderBy($"k"))
    assert(Scd1Merge.readTable(spark, sqlT).filter($"k" === 5).count() == 0)
    assert(Scd1Merge.readTable(spark, sqlT).filter($"k" === 999)
      .select("name").as[String].head() == "ghost")
  }

  test("MERGE single-clause forms: delete-matched, update-only, insert-only") {
    val t1 = mkTable("one_del")
    Seq((2L, "x", 0L), (999L, "x", 0L)).toDF("k", "name", "region")
      .createOrReplaceTempView("del_keys")
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$t1` t USING del_keys s ON t.k = s.k
         |WHEN MATCHED THEN DELETE""".stripMargin)
    val left = Scd1Merge.readTable(spark, t1)
    assert(left.count() == 19 && left.filter($"k" === 2).count() == 0)

    val t2 = mkTable("one_upd")
    Seq((3L, "three_v2", 0L), (500L, "absent", 0L))
      .toDF("k", "name", "region").createOrReplaceTempView("upd_rows")
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$t2` t USING upd_rows s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val afterUpd = Scd1Merge.readTable(spark, t2)
    assert(afterUpd.count() == 20) // no insert of k=500
    assert(afterUpd.filter($"k" === 3).select("name").as[String].head() == "three_v2")

    val t3 = mkTable("one_ins")
    Seq((3L, "SHOULD_NOT_LAND", 0L), (500L, "landed", 0L))
      .toDF("k", "name", "region").createOrReplaceTempView("ins_rows")
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$t3` t USING ins_rows s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val afterIns = Scd1Merge.readTable(spark, t3)
    assert(afterIns.count() == 21)
    assert(afterIns.filter($"k" === 3).select("name").as[String].head() == "name_3")
    assert(afterIns.filter($"k" === 500).select("name").as[String].head() == "landed")
  }

  test("MERGE column-level SET: both-frame refs bind correctly; conditions order first-match-wins") {
    val t = mkTable("colset", 10)
    // source carries a fresher name for even keys, staler for odd ones
    Seq((2L, "two_new", 20L, 5L), (3L, "three_stale", 30L, -1L),
        (100L, "hundred", 0L, 9L))
      .toDF("k", "name", "region", "ver")
      .createOrReplaceTempView("colset_src")
    // t.ver does not exist — the guard condition compares a TARGET
    // column with a SOURCE column; region proxies the target version.
    // Before the qualifier fix this would silently become region <
    // region (always false) on the source frame.
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$t` t USING colset_src s ON t.k = s.k
         |WHEN MATCHED AND t.region < s.ver THEN UPDATE SET name = concat(t.name, '->', s.name), region = s.region
         |WHEN MATCHED THEN UPDATE SET region = -1
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val r = Scd1Merge.readTable(spark, t)
    // k=2: target region 2 < s.ver 5 → first clause: name concat, region 20
    assert(r.filter($"k" === 2).select("name").as[String].head() == "name_2->two_new")
    assert(r.filter($"k" === 2).select("region").as[Long].head() == 20L)
    // k=3: target region 3 > s.ver -1 → second clause: region -1, name kept
    assert(r.filter($"k" === 3).select("name").as[String].head() == "name_3")
    assert(r.filter($"k" === 3).select("region").as[Long].head() == -1L)
    // k=100 inserts via INSERT * (ver dropped)
    assert(r.filter($"k" === 100).select("name").as[String].head() == "hundred")
    // untouched rows stay
    assert(r.count() == 11)
    assert(r.filter($"k" === 7).select("name").as[String].head() == "name_7")
  }

  test("MERGE NOT MATCHED BY SOURCE (DELETE + UPDATE) and INSERT column list, one commit") {
    val t = mkTable("bysrc", 10)
    val commitBefore = Scd1Merge.tableCommit(t).get
    Seq((3L, "three_v2"), (50L, "fifty"))
      .toDF("k", "name").createOrReplaceTempView("bysrc_src")
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$t` t USING bysrc_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET name = s.name
         |WHEN NOT MATCHED THEN INSERT (k, name, region) VALUES (s.k, s.name, 99)
         |WHEN NOT MATCHED BY SOURCE AND t.k >= 8 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.k >= 6 THEN UPDATE SET name = 'stale'""".stripMargin)
    val r = Scd1Merge.readTable(spark, t)
    // matched update: k=3
    assert(r.filter($"k" === 3).select("name").as[String].head() == "three_v2")
    // insert list: k=50 with region literal
    assert(r.filter($"k" === 50).select("region").as[Long].head() == 99L)
    // by-source delete: k=8,9 gone (k=3 matched, survives)
    assert(r.filter($"k" >= 8 && $"k" < 50).count() == 0)
    // by-source conditional update, first-match-wins: k=6,7 stale
    assert(r.filter($"name" === "stale").select("k").as[Long].collect().sorted
      .toSeq == Seq(6L, 7L))
    // untouched: k=0..5 except 3
    assert(r.filter($"k" === 1).select("name").as[String].head() == "name_1")
    assert(r.count() == 9) // 10 - 2 deleted + 1 inserted
    // the whole clause set landed as ONE commit
    assert(Scd1Merge.tableCommit(t).contains(commitBefore + 1))
  }

  test("MERGE general path keeps the multiple-match error") {
    val t = mkTable("mm", 5)
    Seq((2L, "a", 0L), (2L, "b", 1L)).toDF("k", "name", "region")
      .createOrReplaceTempView("mm_src")
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""MERGE INTO graft.`$t` t USING mm_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET name = s.name""".stripMargin)
    }
    assert(e.getMessage.contains("more than one source row"))
  }

  test("loud rejections: wrong ON keys, key assignment, scope errors, non-graft passthrough") {
    val t = mkTable("rej")
    dim(3).createOrReplaceTempView("rej_src")
    // ON clause not the table's merge keys
    val e1 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""MERGE INTO graft.`$t` t USING rej_src s ON t.name = s.name
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e1.getMessage.contains("merge keys"))
    // UPDATE may not assign a merge key
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""MERGE INTO graft.`$t` t USING rej_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET k = s.k + 1""".stripMargin)
    }
    assert(e2.getMessage.contains("cannot be assigned"))
    // an INSERT column list must assign every merge key
    val e3 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""MERGE INTO graft.`$t` t USING rej_src s ON t.k = s.k
           |WHEN NOT MATCHED THEN INSERT (name) VALUES (s.name)""".stripMargin)
    }
    assert(e3.getMessage.contains("must assign merge key"))
    // unqualified reference held by BOTH frames is ambiguous, loudly
    val e4 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""MERGE INTO graft.`$t` t USING rej_src s ON t.k = s.k
           |WHEN MATCHED AND name = 'x' THEN DELETE""".stripMargin)
    }
    assert(e4.getMessage.contains("ambiguous"))
    // a target-qualified reference in an INSERT value is out of scope
    // (the target row does not exist for a NOT MATCHED source row) —
    // must fail loudly, never silently bind to the source frame
    val e5 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""MERGE INTO graft.`$t` t USING rej_src s ON t.k = s.k
           |WHEN NOT MATCHED THEN INSERT (k, name, region) VALUES (s.k, t.name, s.region)""".stripMargin)
    }
    assert(e5.getMessage.contains("not in scope"))
    // a non-graft DML statement is NOT intercepted: Spark's own error
    // surfaces (table does not exist / does not support DML), proving
    // passthrough rather than a graft-side hijack
    intercept[Exception] {
      GraftSql.sql(spark, "DELETE FROM totally_unknown_table WHERE 1=1")
    }
    // ...and plain queries route through untouched
    assert(GraftSql.sql(spark, "SELECT 1 AS one").as[Int].head() == 1)
  }

  test("SELECT over graft tables: bare reads, joins, subqueries, MERGE sources") {
    val t = mkTable("sel", 10)
    GraftTables.register("sel_t", t)
    try {
      // bare read
      assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM graft.`$t`")
        .as[Long].head() == 10L)
      // registered name + aggregation
      val agg = GraftSql.sql(spark,
        "SELECT region, count(*) AS n FROM sel_t GROUP BY region ORDER BY region")
      assert(agg.count() == 5)
      // self-join through two graft references
      val joined = GraftSql.sql(spark,
        s"""SELECT a.k FROM graft.`$t` a JOIN sel_t b ON a.k = b.k
           |WHERE a.region = 0 ORDER BY a.k""".stripMargin)
      assert(joined.as[Long].collect().toSeq == Seq(0L, 5L))
      // graft table as a MERGE source
      val t2 = mkTable("sel_dst", 3)
      GraftSql.sql(spark,
        s"""MERGE INTO graft.`$t2` d USING (SELECT * FROM sel_t WHERE k >= 3) s
           |ON d.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(Scd1Merge.readTable(spark, t2).count() == 10)
    } finally GraftTables.unregister("sel_t")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF resolve snapshots") {
    var now = 50000L
    Scd1Merge.clockMillis = () => now
    try {
      val t = graft.Tmp.dir("graft_sql_tt") + "/t"
      Scd1Merge.upsert(spark, t, dim(5), Seq("k"), numBuckets = 2,
        retainVersions = 5)
      now = 60000L
      Scd1Merge.upsert(spark, t,
        Seq((0L, "zero_v2", 9L)).toDF("k", "name", "region"),
        Seq("k"), retainVersions = 5)
      val v1 = GraftSql.sql(spark,
        s"SELECT name FROM graft.`$t` VERSION AS OF 1 WHERE k = 0")
      assert(v1.as[String].head() == "name_0")
      val v2 = GraftSql.sql(spark,
        s"SELECT name FROM graft.`$t` VERSION AS OF 2 WHERE k = 0")
      assert(v2.as[String].head() == "zero_v2")
      // epoch-millis literal between the commits -> commit 1
      val ts = GraftSql.sql(spark,
        s"SELECT name FROM graft.`$t` TIMESTAMP AS OF 55000 WHERE k = 0")
      assert(ts.as[String].head() == "name_0")
    } finally Scd1Merge.clockMillis = () => System.currentTimeMillis()
  }

  test("maintenance statements: OPTIMIZE, ZORDER, DESCRIBE HISTORY, VACUUM RETAIN") {
    val t = mkTable("maint", 20)
    // fragment a bucket with a second commit, then OPTIMIZE compacts
    Scd1Merge.upsert(spark, t,
      Seq((100L, "x", 0L), (101L, "y", 1L)).toDF("k", "name", "region"), Seq("k"))
    val hist = GraftSql.sql(spark, s"DESCRIBE HISTORY graft.`$t`")
    assert(hist.columns.toSeq == Seq("commit", "batch_id", "num_buckets",
      "n_live_buckets", "commit_ts"))
    assert(hist.count() == 2)
    val n = GraftSql.sql(spark, s"OPTIMIZE graft.`$t`")
    assert(n.columns.toSeq == Seq("num_buckets_rewritten"))
    // ZORDER route: recluster by a declared column
    GraftSql.sql(spark, s"OPTIMIZE graft.`$t` ZORDER BY (region)")
    assertSameRows(
      Scd1Merge.readTable(spark, t).orderBy("k"),
      dim(20).unionByName(
        Seq((100L, "x", 0L), (101L, "y", 1L)).toDF("k", "name", "region"))
        .orderBy("k"))
    // VACUUM with RETAIN window parses and runs (age-based sweep)
    GraftSql.sql(spark, s"VACUUM graft.`$t` RETAIN 168 HOURS")
    GraftSql.sql(spark, s"VACUUM graft.`$t`")
    assert(Scd1Merge.readTable(spark, t).count() == 22)
  }

  test("CREATE GRAFT TABLE AS SELECT and INSERT INTO (keyed upsert / overwrite)") {
    val src = mkTable("ctas_src", 12)
    val dst = graft.Tmp.dir("graft_sql_ctas") + "/t"
    GraftSql.sql(spark,
      s"""CREATE GRAFT TABLE graft.`$dst` KEYS (k) BUCKETS 2 AS
         |SELECT k, name, region FROM graft.`$src` WHERE k < 8""".stripMargin)
    assert(Scd1Merge.readTable(spark, dst).count() == 8)
    assert(Scd1Merge.tableKeys(dst).contains(Seq("k")))
    // creating over an existing table is loud
    intercept[IllegalStateException] {
      GraftSql.sql(spark,
        s"CREATE GRAFT TABLE graft.`$dst` KEYS (k) AS SELECT 1L AS k, 'x' AS name, 0L AS region")
    }
    // plain INSERT INTO text is REJECTED loudly: its graft semantics
    // would be a keyed upsert (replace-on-key), not the SQL append a
    // user reading standard INSERT expects — the BY NAME spelling is
    // the explicit opt-in
    val eIns = intercept[UnsupportedOperationException] {
      GraftSql.sql(spark,
        s"INSERT INTO graft.`$dst` SELECT k, name, region FROM graft.`$src` WHERE k = 7")
    }
    assert(eIns.getMessage.contains("BY NAME"))
    // INSERT INTO ... BY NAME = keyed upsert: k=7 replaced, k=8,9 inserted
    GraftSql.sql(spark,
      s"""INSERT INTO graft.`$dst` BY NAME
         |SELECT k, concat(name, '_ins') AS name, region FROM graft.`$src`
         |WHERE k >= 7 AND k < 10""".stripMargin)
    val t = Scd1Merge.readTable(spark, dst)
    assert(t.count() == 10)
    assert(t.filter($"k" === 7).select("name").as[String].head() == "name_7_ins")
    assert(t.filter($"k" === 3).select("name").as[String].head() == "name_3")
    // INSERT OVERWRITE replaces content in ONE atomic commit (readers
    // never see the emptied middle state)
    val commitBefore = Scd1Merge.tableCommit(dst).get
    GraftSql.sql(spark,
      s"INSERT OVERWRITE graft.`$dst` SELECT k, name, region FROM graft.`$src` WHERE k >= 10")
    val after = Scd1Merge.readTable(spark, dst)
    assert(after.count() == 2)
    assert(after.select("k").as[Long].collect().sorted.toSeq == Seq(10L, 11L))
    assert(Scd1Merge.tableCommit(dst).contains(commitBefore + 1),
      "overwrite must be exactly one commit")
  }

  test("SQL DELETE inherits hash pruning: a key-equality predicate probes ONE bucket") {
    val t = mkTable("prune", 40)
    GraftSql.sql(spark, s"DELETE FROM graft.`$t` WHERE k = 7")
    assert(Scd1Merge.lastPrune._1 == 1,
      s"key-equality SQL delete must probe one bucket, got ${Scd1Merge.lastPrune}")
    assert(Scd1Merge.readTable(spark, t).count() == 39)
  }

  test("ALTER TABLE RENAME/DROP COLUMN and RESTORE (version + timestamp)") {
    var now = 100000L
    Scd1Merge.clockMillis = () => now
    try {
      val t = graft.Tmp.dir("graft_sql_ddl") + "/t"
      Scd1Merge.upsert(spark, t, dim(6), Seq("k"), numBuckets = 2,
        retainVersions = 5)
      // rename through the column mapping (metadata-only)
      GraftSql.sql(spark, s"ALTER TABLE graft.`$t` RENAME COLUMN name TO label")
      assert(Scd1Merge.readTable(spark, t).columns.toSeq ==
        Seq("k", "label", "region"))
      // second data commit after the rename
      now = 200000L
      GraftSql.sql(spark,
        s"UPDATE graft.`$t` SET label = 'changed' WHERE k = 0")
      assert(Scd1Merge.readTable(spark, t)
        .filter($"k" === 0).select("label").as[String].head() == "changed")
      // RESTORE to the pre-update version (rename survives: commit 2
      // IS the renamed schema)
      GraftSql.sql(spark, s"RESTORE graft.`$t` TO VERSION AS OF 2")
      assert(Scd1Merge.readTable(spark, t)
        .filter($"k" === 0).select("label").as[String].head() == "name_0")
      // drop a column (metadata-only)
      GraftSql.sql(spark, s"ALTER TABLE graft.`$t` DROP COLUMN region")
      assert(Scd1Merge.readTable(spark, t).columns.toSeq == Seq("k", "label"))
      // RESTORE TO TIMESTAMP: resolve by commit stamp
      val t2 = graft.Tmp.dir("graft_sql_rst2") + "/t"
      now = 300000L
      Scd1Merge.upsert(spark, t2, dim(3), Seq("k"), numBuckets = 2,
        retainVersions = 5)
      now = 400000L
      Scd1Merge.upsert(spark, t2,
        Seq((0L, "v2", 0L)).toDF("k", "name", "region"), Seq("k"),
        retainVersions = 5)
      GraftSql.sql(spark, s"RESTORE TABLE graft.`$t2` TO TIMESTAMP AS OF 350000")
      assert(Scd1Merge.readTable(spark, t2)
        .filter($"k" === 0).select("name").as[String].head() == "name_0")
    } finally Scd1Merge.clockMillis = () => System.currentTimeMillis()
  }

  test("partitioned SQL lifecycle: CREATE PARTITIONED BY, BY NAME insert, pruned UPDATE/DELETE, SHOW PARTITIONS, overwrite, MERGE upsert") {
    import graft.merge.PartitionedTable
    (0 until 40).map(i => (s"p${i % 4}", i.toLong, i.toLong * 10))
      .toDF("part", "k", "cents").createOrReplaceTempView("psrc")
    val t = graft.Tmp.dir("graft_sql_part") + "/t"
    GraftSql.sql(spark,
      s"""CREATE GRAFT TABLE graft.`$t` KEYS (part, k) BUCKETS 2
         |PARTITIONED BY (part) AS SELECT * FROM psrc WHERE part <> 'p3'""".stripMargin)
    assert(PartitionedTable.partitions(spark, t).count() == 3)
    // BY NAME insert routes to partitions (incl. a brand-new one)
    GraftSql.sql(spark,
      s"INSERT INTO graft.`$t` BY NAME SELECT * FROM psrc WHERE part = 'p3'")
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM graft.`$t`")
      .as[Long].head() == 40L)
    // UPDATE prunes to ONE partition by path
    val nU = GraftSql.sql(spark,
      s"UPDATE graft.`$t` SET cents = cents + 1 WHERE part = 'p1'")
    assert(nU.as[Long].head() == 10L)
    assert(PartitionedTable.lastPartitionPrune == (1, 4),
      s"UPDATE must prune to 1/4 partitions, got ${PartitionedTable.lastPartitionPrune}")
    // DELETE prunes too
    val nD = GraftSql.sql(spark,
      s"DELETE FROM graft.`$t` WHERE part = 'p0' AND k >= 20")
    assert(nD.as[Long].head() == 5L)
    assert(PartitionedTable.lastPartitionPrune == (1, 4))
    // SHOW PARTITIONS lists the inventory
    val shown = GraftSql.sql(spark, s"SHOW PARTITIONS graft.`$t`")
    assert(shown.columns.toSeq == Seq("partition", "pinned_commit", "live_commit"))
    assert(shown.count() == 4)
    // MERGE upsert form routes per partition
    Seq(("p2", 2L, 999L), ("p2", 100L, 1L)).toDF("part", "k", "cents")
      .createOrReplaceTempView("pmerge")
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$t` t USING pmerge s ON t.part = s.part AND t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(GraftSql.sql(spark,
      s"SELECT cents FROM graft.`$t` WHERE part = 'p2' AND k = 2")
      .as[Long].head() == 999L)
    // dynamic INSERT OVERWRITE replaces only the partitions present
    // (partitionOverwriteMode is consulted exactly like the
    // DataFrame-writer path; Spark's session default is static)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      GraftSql.sql(spark,
        s"INSERT OVERWRITE graft.`$t` SELECT 'p1' AS part, 7::LONG AS k, 0::LONG AS cents")
    } finally
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val after = PartitionedTable.readTable(spark, t)
    assert(after.filter($"part" === "p1").count() == 1)
    assert(after.filter($"part" === "p0").count() == 5) // untouched
    // the general MERGE form (per-column SET) lowers onto the
    // partition-routed applyCdc — the dedicated test covers the full
    // clause surface; here: one conditional per-column update lands
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$t` t USING pmerge s ON t.part = s.part AND t.k = s.k
         |WHEN MATCHED THEN UPDATE SET cents = s.cents + 1""".stripMargin)
    assert(GraftSql.sql(spark,
      s"SELECT cents FROM graft.`$t` WHERE part = 'p2' AND k = 2")
      .as[Long].head() == 1000L)
    // the partition column cannot be SET (it is a merge key)
    intercept[Exception] {
      GraftSql.sql(spark, s"UPDATE graft.`$t` SET part = 'x' WHERE k = 1")
    }
    // STATIC (the session default) INSERT OVERWRITE = full atomic
    // replacement — Spark's default posture: partitions absent from
    // the batch drop, matching the DataFrame-writer Truncate path
    GraftSql.sql(spark,
      s"INSERT OVERWRITE graft.`$t` SELECT 'p1' AS part, 8::LONG AS k, 3::LONG AS cents")
    val whole = PartitionedTable.readTable(spark, t)
    assert(whole.count() == 1)
    assert(whole.select($"part", $"k", $"cents").as[(String, Long, Long)]
      .head() == (("p1", 8L, 3L)))
  }

  test("extension-built session: spark.sql() runs graft DML via injectParser") {
    val t = mkTable("ext")
    // building a SECOND session against the same SparkContext with the
    // extensions applied (getOrCreate only applies extensions to a NEW
    // session, so the default must be cleared first and restored after)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val n = s2.sql(s"DELETE FROM graft.`$t` WHERE k >= 15")
      assert(n.collect().map(_.getLong(0)).head == 5L)
      s2.sql(s"UPDATE graft.`$t` SET name = 'flat' WHERE k = 0")
      // MERGE through spark.sql too
      s2.range(2).selectExpr("id + 100 AS k", "'ins' AS name", "0L AS region")
        .createOrReplaceTempView("ext_src")
      s2.sql(
        s"""MERGE INTO graft.`$t` t USING ext_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // the read surface works through plain spark.sql too
      assert(s2.sql(s"SELECT count(*) AS n FROM graft.`$t`")
        .collect()(0).getLong(0) == 17L)
      // history spans RETAINED commits (default retention 1 -> 2 rows)
      assert(s2.sql(s"DESCRIBE HISTORY graft.`$t`").count() == 2)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
    val after = Scd1Merge.readTable(spark, t)
    assert(after.count() == 17) // 20 - 5 deleted + 2 inserted
    assert(after.filter($"k" === 0).select("name").as[String].head() == "flat")
    assert(after.filter($"k" === 101).count() == 1)
  }

  test("SQL multi-column PARTITIONED BY (m, r): create, subset-pruned DML, SHOW PARTITIONS") {
    val path = graft.Tmp.dir("sql_multipart") + "/t"
    (0 until 40).map(i => (s"2024-0${i % 2 + 1}", if (i % 4 < 2) "EU" else "US",
        i.toLong, i.toLong * 10))
      .toDF("m", "r", "id", "cents").createOrReplaceTempView("mp_src")
    graft.sql.GraftSql.sql(spark,
      s"""CREATE GRAFT TABLE graft.`$path` KEYS (m, r, id) BUCKETS 2
         |PARTITIONED BY (m, r) AS SELECT * FROM mp_src""".stripMargin)
    assert(graft.merge.PartitionedTable.partitions(spark, path).count() == 4)
    val shown = graft.sql.GraftSql.sql(spark, s"SHOW PARTITIONS graft.`$path`")
    assert(shown.select("partition").as[String].collect().sorted.toSeq ==
      Seq("2024-01/EU", "2024-01/US", "2024-02/EU", "2024-02/US"))
    // a one-column conjunct prunes to that column's slice (2 of 4)
    graft.sql.GraftSql.sql(spark,
      s"UPDATE graft.`$path` SET cents = cents + 1 WHERE r = 'EU'")
    assert(graft.merge.PartitionedTable.lastPartitionPrune == (2, 4))
    // both columns pinned → one of 4
    graft.sql.GraftSql.sql(spark,
      s"DELETE FROM graft.`$path` WHERE m = '2024-01' AND r = 'US' AND id % 2 = 0")
    assert(graft.merge.PartitionedTable.lastPartitionPrune == (1, 4))
    val got = graft.sql.GraftSql.sql(spark,
      s"SELECT * FROM graft.`$path` ORDER BY id")
    val want = spark.table("mp_src")
      .withColumn("cents", when($"r" === "EU", $"cents" + 1).otherwise($"cents"))
      .filter(!($"m" === "2024-01" && $"r" === "US" && $"id" % 2 === 0))
    assertSameRows(got, want.orderBy("id"))
  }

  test("SQL hidden partitioning: CREATE PARTITIONED BY (month(d)), source-column-pruned DML") {
    import graft.merge.PartitionedTable
    val path = graft.Tmp.dir("sql_hidden") + "/t"
    Seq("2024-01-05", "2024-02-10", "2024-03-15", "2024-04-01")
      .zipWithIndex.flatMap { case (d, p) => (0 until 10).map(i =>
        (java.sql.Date.valueOf(d), (p * 100 + i).toLong, i.toLong * 10)) }
      .toDF("d", "id", "cents").createOrReplaceTempView("hp_src")
    graft.sql.GraftSql.sql(spark,
      s"""CREATE GRAFT TABLE graft.`$path` KEYS (id, d) BUCKETS 2
         |PARTITIONED BY (month(d)) AS SELECT * FROM hp_src""".stripMargin)
    assert(PartitionedTable.partitions(spark, path)
      .select("month(d)_value").as[String].collect().sorted.toSeq ==
      Seq("2024-01", "2024-02", "2024-03", "2024-04"))
    // no derived column in the data
    assert(graft.sql.GraftSql.sql(spark, s"SELECT * FROM graft.`$path`")
      .columns.sorted.toSeq == Seq("cents", "d", "id"))
    // DML with a plain date predicate prunes by the derived interval
    val nU = graft.sql.GraftSql.sql(spark,
      s"UPDATE graft.`$path` SET cents = cents + 1 " +
      "WHERE d >= DATE '2024-02-01' AND d < DATE '2024-03-01'")
    assert(nU.as[Long].head() == 10L)
    assert(PartitionedTable.lastPartitionPrune == (1, 4),
      s"UPDATE must prune to 1/4 months, got ${PartitionedTable.lastPartitionPrune}")
    val nD = graft.sql.GraftSql.sql(spark,
      s"DELETE FROM graft.`$path` WHERE d = DATE '2024-04-01'")
    assert(nD.as[Long].head() == 10L)
    assert(PartitionedTable.lastPartitionPrune == (1, 4))
    assert(graft.sql.GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM graft.`$path`").as[Long].head() == 30L)
  }

  test("COPY INTO: file-level idempotence, PATTERN, FORMAT_OPTIONS, up-cast alignment") {
    import java.nio.file.{Files, Paths}
    val root = graft.Tmp.dir("sql_copy")
    val in = Paths.get(root, "in")
    Files.createDirectories(in)
    Files.writeString(in.resolve("a.csv"), "k,v\n1,one\n2,two\n")
    Files.writeString(in.resolve("b.csv"), "k,v\n3,three\n")
    Files.writeString(in.resolve("skip.txt"), "k,v\n99,ignored\n")
    val t = root + "/t"
    Scd1Merge.upsert(spark, t, Seq((0L, "zero")).toDF("k", "v"), Seq("k"),
      numBuckets = 2)
    def copy(): (Long, Long) = {
      val r = graft.sql.GraftSql.sql(spark,
        s"COPY INTO graft.`$t` FROM '$in' FILEFORMAT = CSV " +
        "PATTERN = '*.csv' " +
        "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')")
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    // run 1: both csvs (skip.txt excluded by PATTERN), int k up-casts
    assert(copy() == ((2L, 3L)))
    // verbatim re-run: the log skips everything
    assert(copy() == ((0L, 0L)))
    // a late file loads alone; rows ride the keyed upsert (k=1 replaced)
    Files.writeString(in.resolve("c.csv"), "k,v\n1,uno\n9,nine\n")
    assert(copy() == ((1L, 2L)))
    val got = graft.sql.GraftSql.sql(spark,
      s"SELECT k, v FROM graft.`$t` ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((0L, "zero"), (1L, "uno"), (2L, "two"),
      (3L, "three"), (9L, "nine")), got.toString)
    // a lossy alignment is rejected loudly before anything lands
    Files.writeString(in.resolve("d.csv"), "k,v\nnot_a_number,x\n")
    val e = intercept[IllegalArgumentException] { copy() }
    assert(e.getMessage.contains("up-cast"), e.getMessage)
  }

  test("general MERGE on a PARTITIONED target: conditional clauses, deletes, BY SOURCE, one parent swap") {
    import graft.merge.PartitionedTable
    val path = graft.Tmp.dir("sql_pmerge") + "/t"
    PartitionedTable.upsert(spark,
      path,
      Seq(("2024-01", 1L, 100L), ("2024-01", 2L, 200L),
        ("2024-02", 3L, 300L), ("2024-02", 4L, 400L))
        .toDF("month", "id", "cents"),
      Seq("month", "id"), "month", numBuckets = 2)
    Seq(("2024-01", 1L, 5L), ("2024-02", 3L, -1L), ("2024-03", 9L, 900L))
      .toDF("month", "id", "delta").createOrReplaceTempView("pmerge_src")
    val pc0 = PartitionedTable.tableCommit(path).get
    graft.sql.GraftSql.sql(spark,
      s"""MERGE INTO graft.`$path` t USING pmerge_src s
         |ON t.month = s.month AND t.id = s.id
         |WHEN MATCHED AND s.delta < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET cents = t.cents + s.delta
         |WHEN NOT MATCHED THEN INSERT (month, id, cents)
         |  VALUES (s.month, s.id, s.delta)
         |WHEN NOT MATCHED BY SOURCE AND t.id = 4 THEN DELETE
         |""".stripMargin).collect()
    assert(PartitionedTable.tableCommit(path).contains(pc0 + 1),
      "the whole MERGE must be ONE parent swap")
    val got = graft.sql.GraftSql.sql(spark,
      s"SELECT month, id, cents FROM graft.`$path` ORDER BY month, id")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("2024-01", 1L, 105L), ("2024-01", 2L, 200L),
      ("2024-03", 9L, 900L)), got.toString)
    // deletes aimed at a partition that never existed: clean no-op
    Seq(("2099-01", 77L, -1L)).toDF("month", "id", "delta")
      .createOrReplaceTempView("pmerge_src2")
    graft.sql.GraftSql.sql(spark,
      s"""MERGE INTO graft.`$path` t USING pmerge_src2 s
         |ON t.month = s.month AND t.id = s.id
         |WHEN MATCHED AND s.delta < 0 THEN DELETE
         |""".stripMargin).collect()
    assert(graft.sql.GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM graft.`$path`").as[Long].head() == 3L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "p=2099-01")),
      "an all-delete slice must not create a phantom partition")
  }

  test("PERSISTENT CATALOG: names and MV arming survive a session restart") {
    import graft.sql.{GraftCatalog, GraftTables}
    import graft.plans.GraftMvRewrite
    val root = graft.Tmp.dir("sql_catalog")
    GraftCatalog.setRoot(root + "/cat")
    val base = root + "/base"; val mv = root + "/mv"
    try {
      Scd1Merge.upsert(spark, base,
        (1L to 80L).map(i => (i, s"g${i % 4}", i * 10))
          .toDF("k", "g", "cents"), Seq("k"), numBuckets = 2)
      GraftTables.register("cat_base", base)
      graft.sql.GraftSql.sql(spark,
        s"CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS " +
        s"SELECT g, sum(cents) AS sc, count(*) AS n " +
        s"FROM graft.`$base` GROUP BY g").collect()
      // ---- "restart": wipe EVERY in-memory registry
      GraftTables.clearMemory()
      GraftMvRewrite.clear()
      // the short name resolves through the disk catalog
      assert(graft.sql.GraftSql.sql(spark,
        "SELECT count(*) AS n FROM cat_base").as[Long].head() == 80L)
      assert(GraftTables.registered.contains("cat_base"))
      // a PLAIN aggregate over the base AUTO-ARMS the rewrite from
      // the catalog — no REFRESH ritual — and answers from the MV
      val before = GraftMvRewrite.rewriteCount
      val q = graft.sql.GraftSql.sql(spark,
        s"SELECT g, sum(cents) AS sc FROM graft.`$base` GROUP BY g")
      val scans = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.inputFiles.toSeq
            case _ => Nil
          }
      }.flatten
      assert(scans.nonEmpty && scans.forall(_.contains(mv + "/")),
        s"auto-armed MV must answer the fresh query: $scans")
      assert(GraftMvRewrite.rewriteCount > before)
      // values match a from-base recompute (rule disarmed)
      GraftMvRewrite.clear()
      GraftCatalog.clearRoot() // also disables arming for the recompute
      assertSameRows(q.orderBy("g"),
        Scd1Merge.readTable(spark, base).groupBy($"g")
          .agg(sum($"cents").as("sc")).orderBy("g"))
      // DROP MATERIALIZED VIEW scrubs the catalog row
      GraftCatalog.setRoot(root + "/cat")
      assert(GraftCatalog.mvsOver(base) == Seq(mv))
      graft.sql.GraftSql.sql(spark,
        s"DROP MATERIALIZED VIEW graft.`$mv`").collect()
      assert(GraftCatalog.mvsOver(base).isEmpty)
      // unregister scrubs the name
      GraftTables.unregister("cat_base")
      assert(!GraftTables.registered.contains("cat_base"))
    } finally {
      GraftCatalog.clearRoot()
      GraftMvRewrite.clear()
      GraftTables.unregister("cat_base")
    }
  }

  test("SHOW MATERIALIZED VIEWS: catalog inventory with live freshness") {
    val root = graft.Tmp.dir("sql_show_mv")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      (1L to 60L).map(i => (i, s"g${i % 3}", i)).toDF("k", "g", "cents"),
      Seq("k"), numBuckets = 1, retainVersions = 4)
    graft.sql.GraftSql.sql(spark,
      s"CREATE GRAFT MATERIALIZED VIEW graft.`$mv` AS " +
      s"SELECT g, sum(cents) AS sc, count(*) AS n " +
      s"FROM graft.`$base` GROUP BY g").collect()
    try {
      def rowOf() = graft.sql.GraftSql.sql(spark, "SHOW MATERIALIZED VIEWS")
        .filter($"mv" === mv).collect()
      val r1 = rowOf()
      assert(r1.length == 1 && r1.head.getString(1) == base &&
        r1.head.getString(2) == "aggregate" && r1.head.getBoolean(6),
        s"fresh MV must list fresh: ${r1.mkString}")
      Scd1Merge.upsert(spark, base, Seq((1L, "g0", 5L)).toDF("k", "g", "cents"),
        Seq("k"), retainVersions = 4)
      assert(!rowOf().head.getBoolean(6), "a lagging MV must list stale")
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect()
      assert(rowOf().head.getBoolean(6), "REFRESH must restore freshness")
    } finally graft.plans.GraftMvRewrite.unregister(base)
  }

  test("STAR MV via SQL: CREATE over fact JOIN dim JOIN dim, rewrite + REFRESH + DROP; loud star rejections") {
    import graft.plans.GraftMvRewrite
    val root = graft.Tmp.dir("sql_star_mv")
    val fact = root + "/fact"; val d1 = root + "/cust"
    val d2 = root + "/prod"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, fact,
      (1L to 200L).map(i => (i, i % 20 + 1, i % 7 + 1, i * 10))
        .toDF("k", "ck", "pk", "cents"),
      Seq("k"), numBuckets = 2, retainVersions = 4)
    Scd1Merge.upsert(spark, d1,
      (1L to 20L).map(c => (c, s"seg${c % 4}")).toDF("ck", "seg"),
      Seq("ck"), numBuckets = 1, retainVersions = 4)
    Scd1Merge.upsert(spark, d2,
      (1L to 7L).map(p => (p, s"cat${p % 3}")).toDF("pk", "cat"),
      Seq("pk"), numBuckets = 1, retainVersions = 4)
    try {
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS
           |SELECT seg, cat, sum(cents) AS sc, count(*) AS n
           |FROM graft.`$fact` f
           |JOIN graft.`$d1` c ON f.ck = c.ck
           |JOIN graft.`$d2` p ON f.pk = p.pk
           |GROUP BY seg, cat""".stripMargin).collect()
      val d = graft.pipeline.MvDef.read(mv).get
      assert(d.basePath == fact && d.joins.map(_.dimPath).toSet == Set(d1, d2))
      def q = graft.sql.GraftSql.sql(spark,
        s"""SELECT seg, cat, sum(cents) AS sc FROM graft.`$fact` f
           |JOIN graft.`$d1` c ON f.ck = c.ck
           |JOIN graft.`$d2` p ON f.pk = p.pk
           |GROUP BY seg, cat""".stripMargin)
      def scans(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      assert(scans(q).nonEmpty && scans(q).forall(_.contains(mv + "/")),
        s"SQL-created star MV must answer the SQL star query: ${scans(q)}")
      // a wave on every side, ONE SQL REFRESH folds all three
      Scd1Merge.upsert(spark, fact,
        Seq((201L, 3L, 2L, 99L)).toDF("k", "ck", "pk", "cents"),
        Seq("k"), retainVersions = 4)
      Scd1Merge.upsert(spark, d1, Seq((3L, "segX")).toDF("ck", "seg"),
        Seq("ck"), retainVersions = 4)
      Scd1Merge.upsert(spark, d2, Seq((2L, "catY")).toDF("pk", "cat"),
        Seq("pk"), retainVersions = 4)
      assert(scans(q).exists(_.contains(fact + "/")), "stale → real join")
      val rr = graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").as[(Long, Long)].head()
      assert(rr._2 == 3L, rr.toString)
      val fresh = q
      assert(scans(fresh).forall(_.contains(mv + "/")))
      GraftMvRewrite.unregisterJoin(mv)
      assertSameRows(fresh.orderBy("seg", "cat"),
        Scd1Merge.readTable(spark, fact).as("f")
          .join(Scd1Merge.readTable(spark, d1), "ck")
          .join(Scd1Merge.readTable(spark, d2), "pk")
          .groupBy($"seg", $"cat").agg(sum($"cents").as("sc"))
          .orderBy("seg", "cat"))
      // DROP disarms and removes
      graft.sql.GraftSql.sql(spark,
        s"DROP MATERIALIZED VIEW graft.`$mv`").collect()
      assert(!Scd1Merge.tableExists(mv))
      // loud rejections: dim keyed on the wrong column; measures
      // split across tables; outer join
      val badDim = root + "/baddim"
      Scd1Merge.upsert(spark, badDim,
        (1L to 20L).map(c => (c, c, s"x$c")).toDF("id", "ck", "v"),
        Seq("id"), numBuckets = 1)
      val e1 = intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          s"CREATE GRAFT MATERIALIZED VIEW graft.`$root/m2` AS " +
          s"SELECT v, sum(cents) AS sc, count(*) AS n FROM graft.`$fact` f " +
          s"JOIN graft.`$badDim` b ON f.ck = b.ck GROUP BY v").collect()
      }
      assert(e1.getMessage.contains("keyed on exactly its join key"))
      val e2 = intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          s"CREATE GRAFT MATERIALIZED VIEW graft.`$root/m3` AS " +
          s"SELECT seg, sum(cents) AS sc, sum(c.ck) AS s2, count(*) AS n " +
          s"FROM graft.`$d1` c JOIN graft.`$fact` f ON f.ck = c.ck GROUP BY seg").collect()
      }
      assert(e2.getMessage.toLowerCase.contains("measure"))
      // a filter hidden inside a joined subquery would be absent from
      // the persisted definition — rejected, never silently dropped
      val e3 = intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          s"CREATE GRAFT MATERIALIZED VIEW graft.`$root/m4` AS " +
          s"SELECT seg, sum(cents) AS sc, count(*) AS n " +
          s"FROM (SELECT * FROM graft.`$fact` WHERE cents > 10) f " +
          s"JOIN graft.`$d1` c ON f.ck = c.ck GROUP BY seg").collect()
      }
      assert(e3.getMessage.contains("top-level WHERE"))
    } finally GraftMvRewrite.unregisterJoin(mv)
  }

  test("MATERIALIZED VIEW lifecycle: CREATE bootstraps+rewrites, REFRESH folds missed commits, loud rejections") {
    import graft.plans.GraftMvRewrite
    val root = graft.Tmp.dir("sql_mv")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      (1L to 120L).map(i => (i, s"g${i % 4}", i * 10)).toDF("k", "g", "cents"),
      Seq("k"), numBuckets = 2)
    try {
      graft.sql.GraftSql.sql(spark,
        s"CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS " +
        s"SELECT g, sum(cents) AS sum_cents, count(*) AS n " +
        s"FROM graft.`$base` GROUP BY g").collect()
      assert(graft.pipeline.MvDef.read(mv).exists(_.basePath == base))
      def q = graft.sql.GraftSql.sql(spark,
        s"SELECT g, sum(cents) AS sum_cents FROM graft.`$base` GROUP BY g")
      def scans(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      assert(scans(q).forall(_.contains(mv + "/")), "fresh MV must answer")
      // two base commits the MV has not seen — retention must cover
      // the refresh lag (the change feed is subject to the same
      // retention contract as any CDC consumer; a default-retention
      // base folds at most 1 commit per refresh)
      Scd1Merge.upsert(spark, base,
        Seq((200L, "g1", 5L)).toDF("k", "g", "cents"), Seq("k"),
        retainVersions = 8)
      Scd1Merge.delete(spark, base, Seq("k"), $"g" === "g2",
        retainVersions = 8)
      assert(scans(q).forall(_.contains(base + "/")), "stale MV must not")
      val r = graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").as[(Long, Long)].head()
      assert(r == ((3L, 2L)), s"refresh accounting: $r")
      assert(scans(q).forall(_.contains(mv + "/")), "refreshed MV must answer")
      assertSameRows(q.orderBy("g"), graft.sql.GraftSql.sql(spark,
        s"SELECT g, sum_cents FROM graft.`$mv` ORDER BY g"))
      // idempotent refresh applies nothing
      assert(graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`")
        .as[(Long, Long)].head() == ((3L, 0L)))
      // loud rejections: avg, count(col), missing count(*), joins
      def rejects(sql: String, why: String): Unit = {
        val e = intercept[IllegalArgumentException] {
          graft.sql.GraftSql.sql(spark, sql).collect()
        }
        assert(e.getMessage.contains(why), s"$sql → ${e.getMessage}")
      }
      rejects(s"CREATE GRAFT MATERIALIZED VIEW graft.`$root/m2` AS " +
        s"SELECT g, avg(cents) AS a, count(*) AS n FROM graft.`$base` GROUP BY g",
        "avg rewrites automatically")
      rejects(s"CREATE GRAFT MATERIALIZED VIEW graft.`$root/m3` AS " +
        s"SELECT g, count(cents) AS n FROM graft.`$base` GROUP BY g",
        "count(col)")
      rejects(s"CREATE GRAFT MATERIALIZED VIEW graft.`$root/m4` AS " +
        s"SELECT g, sum(cents) AS s FROM graft.`$base` GROUP BY g",
        "count(*)")
    } finally GraftMvRewrite.unregister(base)
  }

  test("COPY INTO a PARTITIONED table: files route per partition, idempotence holds") {
    import graft.merge.PartitionedTable
    import java.nio.file.{Files, Paths}
    val root = graft.Tmp.dir("sql_copy_part")
    val in = Paths.get(root, "in")
    Files.createDirectories(in)
    val t = root + "/t"
    PartitionedTable.upsert(spark, t,
      Seq(("2024-01", 1L, 10L)).toDF("month", "id", "cents"),
      Seq("month", "id"), "month", numBuckets = 2)
    Seq(("2024-01", 2L, 20L), ("2024-02", 3L, 30L))
      .toDF("month", "id", "cents").coalesce(1)
      .write.parquet(root + "/stage")
    import scala.jdk.CollectionConverters._
    val part = graft.merge.FsList.list(Paths.get(root, "stage")).iterator
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, in.resolve("f1.parquet"))
    def copy() = graft.sql.GraftSql.sql(spark,
      s"COPY INTO graft.`$t` FROM '$in' FILEFORMAT = PARQUET")
      .as[(Long, Long)].head()
    assert(copy() == ((1L, 2L)))
    assert(copy() == ((0L, 0L)), "re-run must load nothing")
    assert(PartitionedTable.partitions(spark, t).count() == 2,
      "the new month must have routed to its own partition")
    assert(canon(PartitionedTable.readTable(spark, t)).size == 3)
  }

  test("DROP TABLE / DROP MATERIALIZED VIEW: symlink-safe removal, MV disarm, loud guards") {
    import java.nio.file.{Files, Paths}
    val root = graft.Tmp.dir("sql_drop")
    val base = root + "/base"; val mv = root + "/mv"; val cl = root + "/clone"
    Scd1Merge.upsert(spark, base,
      (1L to 60L).map(i => (i, s"g${i % 3}", i)).toDF("k", "g", "cents"),
      Seq("k"), numBuckets = 2)
    graft.sql.GraftSql.sql(spark,
      s"CREATE GRAFT MATERIALIZED VIEW graft.`$mv` AS " +
      s"SELECT g, sum(cents) AS sc, count(*) AS n FROM graft.`$base` GROUP BY g")
      .collect()
    // guards: wrong statement for the object kind
    assert(intercept[IllegalStateException] {
      graft.sql.GraftSql.sql(spark, s"DROP TABLE graft.`$mv`").collect()
    }.getMessage.contains("MATERIALIZED"))
    assert(intercept[IllegalStateException] {
      graft.sql.GraftSql.sql(spark,
        s"DROP MATERIALIZED VIEW graft.`$base`").collect()
    }.getMessage.contains("plain table"))
    // dropping a shallow clone removes LINKS, never the source's files
    Scd1Merge.cloneShallow(base, cl)
    graft.sql.GraftSql.sql(spark, s"DROP TABLE graft.`$cl`").collect()
    assert(!Files.exists(Paths.get(cl)))
    assert(Scd1Merge.readTable(spark, base).count() == 60L,
      "dropping a clone must not touch the source")
    // dropping the MV disarms the rewrite; the base keeps answering
    graft.sql.GraftSql.sql(spark, s"DROP MATERIALIZED VIEW graft.`$mv`")
      .collect()
    assert(!Files.exists(Paths.get(mv)))
    val q = Scd1Merge.readTable(spark, base).groupBy($"g")
      .agg(sum($"cents").as("sc"))
    assert(q.inputFiles.forall(_.contains(base + "/")))
    assert(q.count() == 3)
    // dropping the base; IF EXISTS is quiet, bare is loud
    graft.sql.GraftSql.sql(spark, s"DROP TABLE graft.`$base`").collect()
    assert(!Files.exists(Paths.get(base)))
    graft.sql.GraftSql.sql(spark,
      s"DROP TABLE IF EXISTS graft.`$base`").collect()
    assert(intercept[IllegalStateException] {
      graft.sql.GraftSql.sql(spark, s"DROP TABLE graft.`$base`").collect()
    }.getMessage.contains("not a graft table"))
  }

  test("vacuum keeps the durable sidecars: MV definition and COPY INTO log survive GC") {
    import java.nio.file.{Files, Paths}
    val root = graft.Tmp.dir("sql_sidecars")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      Seq((1L, "g1", 10L), (2L, "g2", 20L)).toDF("k", "g", "cents"),
      Seq("k"), numBuckets = 2)
    graft.sql.GraftSql.sql(spark,
      s"CREATE GRAFT MATERIALIZED VIEW graft.`$mv` AS " +
      s"SELECT g, sum(cents) AS sc, count(*) AS n FROM graft.`$base` GROUP BY g")
      .collect()
    Scd1Merge.vacuum(mv, retain = 0)
    assert(graft.pipeline.MvDef.read(mv).isDefined,
      "vacuum must not reclaim the MV definition")
    // COPY INTO's loaded-files log must survive a vacuum too — the
    // file-level idempotence contract depends on it
    val in = Paths.get(root, "in")
    Files.createDirectories(in)
    Files.writeString(in.resolve("a.csv"), "k,g,cents\n3,g3,30\n")
    def copy() = graft.sql.GraftSql.sql(spark,
      s"COPY INTO graft.`$base` FROM '$in' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')")
      .as[(Long, Long)].head()
    assert(copy() == ((1L, 1L)))
    Scd1Merge.vacuum(base, retain = 0)
    assert(copy() == ((0L, 0L)),
      "vacuum must not reclaim the COPY INTO log (files would reload)")
  }

  test("DESCRIBE DETAIL: manifest-only metadata row for flat and partitioned tables") {
    val flat = graft.Tmp.dir("sql_detail") + "/flat"
    Scd1Merge.upsert(spark,
      flat, (1 to 12).map(i => (i.toLong, s"v$i")).toDF("k", "v"), Seq("k"),
      numBuckets = 3)
    Scd1Merge.addConstraint(spark, flat, "kpos", "k > 0")
    val d = graft.sql.GraftSql.sql(spark, s"DESCRIBE DETAIL graft.`$flat`")
      .collect().head
    assert(d.getAs[String]("format") == "graft")
    assert(d.getAs[String]("merge_keys") == "k")
    assert(d.getAs[Int]("num_buckets") == 3)
    assert(d.getAs[Long]("num_rows") == 12L)
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[String]("constraints") == "kpos CHECK (k > 0)")
    val part = graft.Tmp.dir("sql_detail") + "/part"
    graft.merge.PartitionedTable.upsert(spark, part,
      Seq(("a", 1L, 1L), ("b", 2L, 2L)).toDF("p", "id", "n"),
      Seq("p", "id"), "p")
    val dp = graft.sql.GraftSql.sql(spark, s"DESCRIBE DETAIL graft.`$part`")
      .collect().head
    assert(dp.getAs[String]("format") == "graft/partitioned")
    assert(dp.getAs[String]("partition_columns") == "p")
    assert(dp.getAs[Int]("num_partitions") == 2)
    assert(dp.getAs[Long]("num_rows") == 2L)
    // ALTER CONSTRAINT routes to the PARENT level on partitioned tables
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$part` ADD CONSTRAINT npos CHECK (n > 0)")
    assert(graft.merge.PartitionedTable.tableConstraints(part) == Map("npos" -> "n > 0"))
    intercept[Exception] {
      graft.sql.GraftSql.sql(spark,
        s"INSERT INTO graft.`$part` BY NAME SELECT 'c' p, CAST(3 AS BIGINT) id, CAST(-1 AS BIGINT) n")
    }
    graft.sql.GraftSql.sql(spark, s"ALTER TABLE graft.`$part` DROP CONSTRAINT npos")
    assert(graft.merge.PartitionedTable.tableConstraints(part).isEmpty)
  }
}
