package graft

import graft.merge.Scd1Merge
import graft.pipeline.IncrementalAgg
import graft.pipeline.IncrementalAgg.AggSpec
import graft.plans.GraftMvRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The MV query-rewrite rule (GraftMvRewrite): soundness gates, the
  * roll-up algebra, and the observability hooks. Every positive case
  * asserts BOTH that the answer equals a from-base recompute AND that
  * the optimized plan actually reads the MV's files (a rewrite that
  * silently didn't fire would still pass a value-only check). */
class MvRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  private def scanPaths(df: DataFrame): Seq[String] = {
    df.queryExecution.optimizedPlan.collectLeaves()
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten
  }

  private def readsOnly(df: DataFrame, dir: String): Boolean = {
    val ps = scanPaths(df)
    ps.nonEmpty && ps.forall(_.contains(dir + "/"))
  }

  private def fixture(): (String, String, AggSpec) = {
    val root = Tmp.dir("mv_rewrite")
    val base = root + "/base"; val mv = root + "/mv"
    val rows = (1L to 400L).map(i =>
      (i, s"g${i % 7}", s"p${i % 3}", i * 10 + i % 5))
      .toDF("id", "g", "p", "cents")
    Scd1Merge.upsert(spark, base, rows, Seq("id"), numBuckets = 4)
    // proves the avg measure non-null for the AVG lowering gate
    Scd1Merge.addConstraint(spark, base, "cents_nn", "cents IS NOT NULL")
    val spec = AggSpec(Seq("g", "p"), Seq("cents" -> "sum_cents"), "n")
    IncrementalAgg.bootstrapFrom(spark, mv, base, spec, numBuckets = 2)
    GraftMvRewrite.register(base, mv, spec)
    (base, mv, spec)
  }

  test("full-group and roll-up aggregates rewrite onto the MV; values match a recompute") {
    val (base, mv, _) = fixture()
    try {
      val b = Scd1Merge.readTable(spark, base)
      val full = b.groupBy($"g", $"p").agg(
        sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(full, mv), s"full-group plan reads ${scanPaths(full)}")
      val rollup = b.groupBy($"g").agg(
        sum($"cents").as("sc"), count(lit(1)).as("n"), avg($"cents").as("a"))
      assert(readsOnly(rollup, mv))
      val global = b.agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(global, mv))
      // values: compare against a recompute with the rule disabled
      GraftMvRewrite.unregister(base)
      assertSameRows(full.orderBy("g", "p"),
        b.groupBy($"g", $"p").agg(sum($"cents").as("sc"),
          count(lit(1)).as("n")).orderBy("g", "p"))
      assertSameRows(rollup.orderBy("g"),
        b.groupBy($"g").agg(sum($"cents").as("sc"), count(lit(1)).as("n"),
          avg($"cents").as("a")).orderBy("g"))
      assertSameRows(global, b.agg(sum($"cents").as("sc"),
        count(lit(1)).as("n")))
    } finally GraftMvRewrite.unregister(base)
  }

  test("freshness gate: a base commit not yet applied disables the rewrite; applying re-enables it") {
    val (base, mv, spec) = fixture()
    try {
      def q = Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(sum($"cents").as("sc"))
      assert(readsOnly(q, mv))
      // new base commit → MV stale → the query reads the BASE (fresh data)
      Scd1Merge.upsert(spark, base,
        Seq((9001L, "g1", "p1", 77L)).toDF("id", "g", "p", "cents"), Seq("id"))
      assert(readsOnly(q, base), "stale MV must not answer the query")
      assert(canon(q.filter($"g" === "g1")).nonEmpty)
      // fold the commit in → rewrite resumes, new row included
      IncrementalAgg.applyChanges(spark, mv, base, Seq("id"), spec)
      val fresh = q
      assert(readsOnly(fresh, mv))
      GraftMvRewrite.unregister(base)
      assertSameRows(fresh.orderBy("g"), Scd1Merge.readTable(spark, base)
        .groupBy($"g").agg(sum($"cents").as("sc")).orderBy("g"))
    } finally GraftMvRewrite.unregister(base)
  }

  test("soundness fall-throughs: filters, distinct, count(col), expressions, time travel, ungrouped columns") {
    val (base, mv, _) = fixture()
    try {
      val b = Scd1Merge.readTable(spark, base)
      // WHERE between scan and aggregate
      assert(readsOnly(b.filter($"cents" > 100)
        .groupBy($"g").agg(sum($"cents").as("s")), base))
      // DISTINCT aggregate
      assert(readsOnly(b.groupBy($"g")
        .agg(countDistinct($"p").as("d")), base))
      // count(col) counts non-nulls — not answerable from the MV
      assert(readsOnly(b.groupBy($"g").agg(count($"cents").as("c")), base))
      // computed measure
      assert(readsOnly(b.groupBy($"g")
        .agg(sum($"cents" * 2).as("s")), base))
      // unregistered aggregate function
      assert(readsOnly(b.groupBy($"g").agg(max($"cents").as("m")), base))
      // group by a non-MV column
      assert(readsOnly(b.groupBy($"id").agg(sum($"cents").as("s")), base))
      // time travel: same shape, older file set — never rewritten
      Scd1Merge.upsert(spark, base,
        Seq((9002L, "g2", "p2", 5L)).toDF("id", "g", "p", "cents"), Seq("id"))
      val old = Scd1Merge.readTableAt(spark, base, 1)
        .groupBy($"g").agg(sum($"cents").as("s"))
      assert(readsOnly(old, base))
    } finally GraftMvRewrite.unregister(base)
  }

  test("stamp survives group-killing deletes and tombstone sweeps; wrapped aggregates rewrite") {
    // the pipe19 lifecycle in miniature: a delete that kills whole
    // groups makes applyChanges commit zero-count tombstones AND
    // sweep them with a second (stamp-preserving) delete commit — the
    // freshness stamp must survive both, and a collapsed projection
    // (round over avg folded INTO the Aggregate) must still lower
    val (base, mv, spec) = fixture()
    try {
      def q = Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"), avg($"cents").as("a"))
        .select($"g", $"sc", $"n", round($"a", 4).as("ar"))
      Scd1Merge.delete(spark, base, Seq("id"), $"g" === "g3")
      IncrementalAgg.applyChanges(spark, mv, base, Seq("id"), spec)
      assert(readsOnly(q, mv))
      GraftMvRewrite.unregister(base)
      assertSameRows(q.orderBy("g"), Scd1Merge.readTable(spark, base)
        .groupBy($"g").agg(sum($"cents").as("sc"), count(lit(1)).as("n"),
          avg($"cents").as("a"))
        .select($"g", $"sc", $"n", round($"a", 4).as("ar")).orderBy("g"))
    } finally GraftMvRewrite.unregister(base)
  }

  test("nullable measure without a NOT NULL constraint: avg falls through to the base, sum/count still rewrite") {
    // parquet measures are nullable; avg(x) -> sum(sum_x)/sum(count)
    // divides by count(*), which under-averages when x has nulls —
    // so without the constraint proof the avg query must read the
    // BASE (and return the right answer), while sum/count-only
    // queries keep rewriting
    val root = Tmp.dir("mv_nullable")
    val base = root + "/base"; val mv = root + "/mv"
    val rows = (1L to 60L).map(i => (i, s"g${i % 3}",
      if (i % 5 == 0) None else Some(i * 7)))
      .toDF("id", "g", "cents")
    Scd1Merge.upsert(spark, base, rows, Seq("id"), numBuckets = 2)
    val spec = AggSpec(Seq("g"), Seq("cents" -> "sum_cents"), "n")
    IncrementalAgg.bootstrapFrom(spark, mv, base, spec, numBuckets = 2)
    GraftMvRewrite.register(base, mv, spec)
    try {
      val b = Scd1Merge.readTable(spark, base)
      val sums = b.groupBy($"g").agg(sum($"cents").as("s"),
        count(lit(1)).as("n"))
      assert(readsOnly(sums, mv), s"sum/count should rewrite: ${scanPaths(sums)}")
      val avgs = b.groupBy($"g").agg(avg($"cents").as("a"))
      assert(readsOnly(avgs, base),
        s"nullable-measure avg must NOT rewrite: ${scanPaths(avgs)}")
      // and the un-rewritten answer is the true non-null-count average
      val got = avgs.orderBy("g").collect().map(r => (r.getString(0),
        math.rint(r.getDouble(1) * 1e6) / 1e6))
      val want = rows.groupBy($"g").agg(avg($"cents").as("a"))
        .orderBy("g").collect().map(r => (r.getString(0),
          math.rint(r.getDouble(1) * 1e6) / 1e6))
      assert(got.sameElements(want))
    } finally GraftMvRewrite.unregister(base)
  }

  test("FILTERED MV: same-predicate query rewrites; different/missing predicate falls through; maintenance nets boundary crossings") {
    val root = Tmp.dir("mv_filtered")
    val base = root + "/base"; val mv = root + "/mv"
    val rows = (1L to 300L).map(i => (i, s"g${i % 5}", i * 3))
      .toDF("id", "g", "cents")
    Scd1Merge.upsert(spark, base, rows, Seq("id"), numBuckets = 2,
      retainVersions = 4)
    val spec = AggSpec(Seq("g"), Seq("cents" -> "sum_cents"), "n",
      filterSql = Some("cents > 450"))
    IncrementalAgg.bootstrapFrom(spark, mv, base, spec, numBuckets = 2)
    GraftMvRewrite.register(base, mv, spec)
    try {
      def b = Scd1Merge.readTable(spark, base)
      def q = b.filter("cents > 450").groupBy($"g")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(q, mv), s"same-predicate query: ${scanPaths(q)}")
      // unfiltered query must NOT be answered by the filtered MV
      assert(readsOnly(b.groupBy($"g").agg(sum($"cents").as("sc")), base))
      // different predicate falls through
      assert(readsOnly(b.filter("cents > 100").groupBy($"g")
        .agg(sum($"cents").as("sc")), base))
      // values match a from-base recompute
      def recompute = Scd1Merge.readTable(spark, base)
        .filter("cents > 450").groupBy($"g")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assertSameRows(q.orderBy("g"), recompute.orderBy("g"))
      // maintenance across the predicate boundary: an update that
      // DROPS a row below the threshold (pass -> fail = -old), one
      // that RAISES a row over it (fail -> pass = +new), an insert
      // on each side, and a delete of a passing row
      Scd1Merge.upsert(spark, base, Seq(
        (200L, "g0", 100L),  // was 600 (pass) -> now fails
        (100L, "g0", 9000L), // was 300 (fail) -> now passes
        (901L, "g1", 8000L), // new, passes
        (902L, "g1", 10L)    // new, fails
      ).toDF("id", "g", "cents"), Seq("id"), retainVersions = 4)
      Scd1Merge.delete(spark, base, Seq("id"), $"id" === 250L,
        retainVersions = 4) // was 750: passing row deleted
      IncrementalAgg.applyChanges(spark, mv, base, Seq("id"), spec,
        fromBack = 2)
      assert(readsOnly(q, mv), "refreshed filtered MV must answer again")
      assertSameRows(q.orderBy("g"), recompute.orderBy("g"))
    } finally GraftMvRewrite.unregister(base)
  }

  test("EXPRESSION-GROUP MV via SQL: WHERE + month() group materialize; same-shape query rewrites; refresh folds") {
    val root = Tmp.dir("mv_exprgroup")
    val base = root + "/base"; val mv = root + "/mv"
    val rows = (1L to 400L).map { i =>
      (i, java.sql.Date.valueOf(f"1995-${i % 6 + 1}%02d-${i % 27 + 1}%02d"),
        i * 7)
    }.toDF("id", "d", "cents")
    Scd1Merge.upsert(spark, base, rows, Seq("id"), numBuckets = 2,
      retainVersions = 4)
    try {
      graft.sql.GraftSql.sql(spark,
        s"CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS " +
        s"SELECT date_format(d, 'yyyy-MM') AS m, sum(cents) AS sc, " +
        s"count(*) AS n FROM graft.`$base` " +
        "WHERE cents > 70 GROUP BY date_format(d, 'yyyy-MM')").collect()
      // the definition persisted BOTH the filter and the group expr
      val d = graft.pipeline.MvDef.read(mv).get
      assert(d.spec.filterSql.nonEmpty)
      assert(d.spec.groupExprs.keySet == Set("m"))
      // the MV materialized the month as a real column
      assert(Scd1Merge.readTable(spark, mv).columns.toSet ==
        Set("m", "sc", "n"))
      def q = graft.sql.GraftSql.sql(spark,
        s"SELECT date_format(d, 'yyyy-MM') AS m, sum(cents) AS sc " +
        s"FROM graft.`$base` WHERE cents > 70 " +
        "GROUP BY date_format(d, 'yyyy-MM')")
      assert(readsOnly(q, mv), s"expression-group query: ${scanPaths(q)}")
      // values match a recompute; global roll-up over the expr works too
      GraftMvRewrite.unregisterMv(mv)
      assertSameRows(q.orderBy("m"),
        Scd1Merge.readTable(spark, base).filter("cents > 70")
          .groupBy(date_format($"d", "yyyy-MM").as("m"))
          .agg(sum($"cents").as("sc")).orderBy("m"))
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect()
      assert(readsOnly(q, mv))
      // a month-moving update + inserts fold O(delta) through REFRESH
      Scd1Merge.upsert(spark, base, Seq(
        (10L, java.sql.Date.valueOf("1995-06-15"), 7000L),
        (991L, java.sql.Date.valueOf("1995-01-02"), 900L))
        .toDF("id", "d", "cents"), Seq("id"), retainVersions = 4)
      assert(readsOnly(q, base), "stale filtered MV must route to base")
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect()
      assert(readsOnly(q, mv))
      GraftMvRewrite.unregisterMv(mv)
      assertSameRows(q.orderBy("m"),
        Scd1Merge.readTable(spark, base).filter("cents > 70")
          .groupBy(date_format($"d", "yyyy-MM").as("m"))
          .agg(sum($"cents").as("sc")).orderBy("m"))
    } finally GraftMvRewrite.unregister(base)
  }

  test("PARTITIONED base: union-of-scans rewrites, SQL REFRESH folds, a partition drop feeds deletes") {
    import graft.merge.PartitionedTable
    val root = Tmp.dir("mv_part")
    val base = root + "/base"; val mv = root + "/mv"
    def fact(months: Seq[String], bump: Long = 0): org.apache.spark.sql.DataFrame =
      months.flatMap(m => (0 until 6).map(i =>
        (m, s"$m#$i".hashCode.toLong & 0xffffff, (i + 1) * 100L + bump)))
        .toDF("month", "id", "cents").dropDuplicates("month", "id")
    PartitionedTable.upsert(spark, base, fact(Seq("2024-01", "2024-02")),
      Seq("month", "id"), "month", numBuckets = 2, retainVersions = 4)
    try {
      graft.sql.GraftSql.sql(spark,
        s"CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS " +
        s"SELECT month, sum(cents) AS sc, count(*) AS n " +
        s"FROM graft.`$base` GROUP BY month").collect()
      def q = PartitionedTable.readTable(spark, base).groupBy($"month")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(q, mv), s"union-of-scans must rewrite: ${scanPaths(q)}")
      // touch one partition + add one → stale → base answers
      PartitionedTable.upsert(spark, base,
        fact(Seq("2024-02"), bump = 7).unionByName(fact(Seq("2024-03"))),
        Seq("month", "id"), "month", retainVersions = 4)
      assert(readsOnly(q, base))
      val r1 = graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").as[(Long, Long)].head()
      assert(r1 == ((2L, 1L)), r1.toString)
      assert(readsOnly(q, mv))
      // a metadata-only partition DROP must still feed deletes: the
      // group disappears from the refreshed MV
      PartitionedTable.dropPartitionsWhere(spark, base, $"month" === "2024-01")
      assert(readsOnly(q, base))
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect()
      assert(readsOnly(q, mv))
      GraftMvRewrite.unregister(base)
      assertSameRows(q.orderBy("month"),
        PartitionedTable.readTable(spark, base).groupBy($"month")
          .agg(sum($"cents").as("sc"), count(lit(1)).as("n")).orderBy("month"))
      assert(canon(Scd1Merge.readTable(spark, mv)
        .filter($"month" === "2024-01")).isEmpty,
        "dropped partition's group must leave the MV")
    } finally GraftMvRewrite.unregister(base)
  }

  test("FILTERED MV over a PARTITIONED base: per-branch pushed filters match canonically; maintenance rides the partitioned feed") {
    import graft.merge.PartitionedTable
    val root = Tmp.dir("mv_part_filt")
    val base = root + "/base"; val mv = root + "/mv"
    def fact(months: Seq[String], bump: Long = 0): org.apache.spark.sql.DataFrame =
      months.flatMap(m => (0 until 8).map(i =>
        (m, s"$m#$i".hashCode.toLong & 0xffffff, (i + 1) * 100L + bump)))
        .toDF("month", "id", "cents").dropDuplicates("month", "id")
    PartitionedTable.upsert(spark, base, fact(Seq("2024-01", "2024-02")),
      Seq("month", "id"), "month", numBuckets = 2, retainVersions = 4)
    try {
      graft.sql.GraftSql.sql(spark,
        s"CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS " +
        s"SELECT month, sum(cents) AS sc, count(*) AS n " +
        s"FROM graft.`$base` WHERE cents > 300 GROUP BY month").collect()
      // the filter pushes into EVERY union branch of the partitioned
      // read; the canonical per-branch condition matches the MV's
      def q = PartitionedTable.readTable(spark, base)
        .filter($"cents" > 300).groupBy($"month")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(q, mv),
        s"filtered union-of-scans must rewrite: ${scanPaths(q)}")
      // the unfiltered query must NOT use the filtered MV
      assert(readsOnly(PartitionedTable.readTable(spark, base)
        .groupBy($"month").agg(sum($"cents").as("sc")), base))
      // boundary-crossing wave through the PARTITIONED feed: bump
      // crosses rows over 300 in one month, a new month arrives
      PartitionedTable.upsert(spark, base,
        fact(Seq("2024-02"), bump = 250).unionByName(fact(Seq("2024-03"))),
        Seq("month", "id"), "month", retainVersions = 4)
      assert(readsOnly(q, base))
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect()
      assert(readsOnly(q, mv))
      GraftMvRewrite.unregister(base)
      assertSameRows(q.orderBy("month"),
        PartitionedTable.readTable(spark, base).filter($"cents" > 300)
          .groupBy($"month")
          .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
          .orderBy("month"))
    } finally GraftMvRewrite.unregister(base)
  }

  test("several MVs per base: each query lowers onto an MV whose groups cover it") {
    val (base, mv, _) = fixture()
    val mv2 = base.stripSuffix("/base") + "/mv_by_p"
    val spec2 = AggSpec(Seq("p"), Seq("cents" -> "sum_cents"), "n")
    IncrementalAgg.bootstrapFrom(spark, mv2, base, spec2, numBuckets = 2)
    GraftMvRewrite.register(base, mv2, spec2)
    try {
      val b = Scd1Merge.readTable(spark, base)
      // group by g: only the (g,p) MV covers it
      assert(readsOnly(b.groupBy($"g").agg(sum($"cents").as("s")), mv))
      // group by p: both cover; the rewrite picks one MV, values exact
      val byP = b.groupBy($"p").agg(sum($"cents").as("s"), count(lit(1)).as("n"))
      val ps = scanPaths(byP)
      assert(ps.nonEmpty && (ps.forall(_.contains(mv + "/")) ||
        ps.forall(_.contains(mv2 + "/"))), ps.toString)
      GraftMvRewrite.unregister(base)
      assertSameRows(byP.orderBy("p"), b.groupBy($"p")
        .agg(sum($"cents").as("s"), count(lit(1)).as("n")).orderBy("p"))
    } finally GraftMvRewrite.unregister(base)
  }

  test("JOIN MV: the star aggregate rewrites; either side's new commit disables until refresh; soundness") {
    import graft.pipeline.IncrementalJoinAgg
    import graft.plans.GraftMvRewrite.JoinMvReg
    val root = Tmp.dir("mv_join")
    val factT = root + "/fact"; val dimT = root + "/dim"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, factT,
      (1L to 300L).map(i => (i, i % 40 + 1, i * 10)).toDF("id", "ck", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 4)
    Scd1Merge.upsert(spark, dimT,
      (1L to 40L).map(c => (c, s"seg${c % 5}")).toDF("ck", "seg"),
      Seq("ck"), numBuckets = 2, retainVersions = 4)
    val spec = AggSpec(Seq("seg"), Seq("cents" -> "sc"), "n")
    IncrementalJoinAgg.createMv(spark, mv, factT, Seq("id"),
      dimT, Seq("ck"), "ck", "ck", spec, numBuckets = 2)
    assert(graft.pipeline.MvDef.read(mv).exists(_.joins.nonEmpty))
    try {
      def q = Scd1Merge.readTable(spark, factT)
        .join(Scd1Merge.readTable(spark, dimT), "ck")
        .groupBy($"seg").agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(q, mv), s"join MV must answer: ${scanPaths(q)}")
      // fact-side commit → stale → the real join answers
      Scd1Merge.upsert(spark, factT,
        Seq((301L, 7L, 999L)).toDF("id", "ck", "cents"), Seq("id"),
        retainVersions = 4)
      assert(!readsOnly(q, mv) && scanPaths(q).exists(_.contains(factT + "/")))
      assert(IncrementalJoinAgg.refresh(spark, mv, factT, Seq("id"),
        dimT, Seq("ck"), "ck", "ck", spec) == ((1, 0)))
      assert(readsOnly(q, mv))
      // dim-side group move → stale → SQL REFRESH (routed through the
      // persisted join definition) folds the mass between groups
      Scd1Merge.upsert(spark, dimT,
        Seq((7L, "segX")).toDF("ck", "seg"), Seq("ck"), retainVersions = 4)
      assert(!readsOnly(q, mv))
      val rr = graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").as[(Long, Long)].head()
      assert(rr == ((2L, 1L)), rr.toString)
      val fresh = q
      assert(readsOnly(fresh, mv))
      GraftMvRewrite.unregisterJoin(mv)
      assertSameRows(fresh.orderBy("seg"),
        Scd1Merge.readTable(spark, factT)
          .join(Scd1Merge.readTable(spark, dimT), "ck")
          .groupBy($"seg").agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
          .orderBy("seg"))
      // soundness: outer join, extra condition, measure from the dim
      // side, filtered sides — none rewrite
      GraftMvRewrite.registerJoin(JoinMvReg(factT, dimT, "ck", "ck", mv, spec))
      val f = Scd1Merge.readTable(spark, factT)
      val d = Scd1Merge.readTable(spark, dimT)
      assert(!readsOnly(f.join(d, Seq("ck"), "left")
        .groupBy($"seg").agg(sum($"cents").as("sc")), mv))
      assert(!readsOnly(f.join(d, f("ck") === d("ck") && f("cents") > 10)
        .groupBy(d("seg")).agg(sum(f("cents")).as("sc")), mv))
      assert(!readsOnly(f.filter($"cents" > 100).join(d, "ck")
        .groupBy($"seg").agg(sum($"cents").as("sc")), mv))
    } finally GraftMvRewrite.unregisterJoin(mv)
  }

  test("MIN/MAX MV: inserts fold O(delta); deleting the stored extreme recomputes only that group; rewrite + roll-up answer from the MV") {
    val root = Tmp.dir("mv_minmax")
    val base = root + "/base"; val mv = root + "/mv"
    val rows = (1L to 300L).map(i => (i, s"g${i % 5}", i * 10))
      .toDF("id", "g", "cents")
    Scd1Merge.upsert(spark, base, rows, Seq("id"), numBuckets = 2,
      retainVersions = 6)
    val spec = AggSpec(Seq("g"), Seq("cents" -> "sum_cents"), "n",
      mins = Seq("cents" -> "min_cents"), maxs = Seq("cents" -> "max_cents"))
    IncrementalAgg.bootstrapFrom(spark, mv, base, spec, numBuckets = 2)
    GraftMvRewrite.register(base, mv, spec)
    def recompute = Scd1Merge.readTable(spark, base).groupBy($"g")
      .agg(sum($"cents").as("sc"), min($"cents").as("mn"),
        max($"cents").as("mx"), count(lit(1)).as("n"))
    def q = Scd1Merge.readTable(spark, base).groupBy($"g")
      .agg(sum($"cents").as("sc"), min($"cents").as("mn"),
        max($"cents").as("mx"), count(lit(1)).as("n"))
    try {
      assert(readsOnly(q, mv), s"min/max MV must answer: ${scanPaths(q)}")
      assertSameRows(q.orderBy("g"), recompute.orderBy("g"))
      // lifecycle hitting every extreme leg: delete g0's MAXIMUM (id
      // 300, cents 3000 — forces a recompute), insert a new global
      // MINIMUM into g1 (pure fold), update g2's max row DOWNWARD
      // (retraction at the stored max — recompute), plain mid-range
      // inserts (no flags)
      Scd1Merge.delete(spark, base, Seq("id"), $"id" === 300L,
        retainVersions = 6)
      Scd1Merge.upsert(spark, base, Seq(
        (901L, "g1", 1L),       // new global min: fold leg
        (902L, "g3", 1500L),    // mid-range: no flag
        (299L, "g4", 100L)      // was 2990 = g4 max: downward update
      ).toDF("id", "g", "cents"), Seq("id"), retainVersions = 6)
      IncrementalAgg.applyChanges(spark, mv, base, Seq("id"), spec,
        fromBack = 2)
      assert(readsOnly(q, mv), "refreshed min/max MV must answer again")
      assertSameRows(q.orderBy("g"), recompute.orderBy("g"))
      // roll-up: global min/max re-aggregate from the MV (idempotent)
      val roll = Scd1Merge.readTable(spark, base)
        .agg(min($"cents").as("mn"), max($"cents").as("mx"))
      assert(readsOnly(roll, mv))
      GraftMvRewrite.unregister(base)
      assertSameRows(roll, Scd1Merge.readTable(spark, base)
        .agg(min($"cents").as("mn"), max($"cents").as("mx")))
      GraftMvRewrite.register(base, mv, spec)
      // a group emptied entirely tombstones away
      Scd1Merge.delete(spark, base, Seq("id"), $"g" === "g0",
        retainVersions = 6)
      IncrementalAgg.applyChanges(spark, mv, base, Seq("id"), spec)
      assert(Scd1Merge.readTable(spark, mv).filter($"g" === "g0").isEmpty)
      assertSameRows(q.orderBy("g"), recompute.orderBy("g"))
    } finally GraftMvRewrite.unregister(base)
  }

  test("SKETCH MV: HLL distinct-count sketches fold on insert, rescan on retraction; rewrite + roll-up estimates equal a from-base sketch exactly") {
    val root = Tmp.dir("mv_sketch")
    val base = root + "/base"; val mv = root + "/mv"
    // values deliberately repeat ACROSS groups and WITHIN groups so
    // retractions hit both last-copy and still-present distinct values
    val rows = (1L to 400L).map(i => (i, s"g${i % 4}", i % 37))
      .toDF("id", "g", "u")
    Scd1Merge.upsert(spark, base, rows, Seq("id"), numBuckets = 2,
      retainVersions = 6)
    graft.sql.GraftSql.sql(spark,
      s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS
         |SELECT g, hll_sketch_agg(u) AS sk, count(*) AS n
         |FROM graft.`$base` GROUP BY g""".stripMargin).collect()
    assert(graft.pipeline.MvDef.read(mv).exists(
      _.spec.sketches == Seq("u" -> "sk")))
    val spec = graft.pipeline.MvDef.read(mv).get.spec
    def q = Scd1Merge.readTable(spark, base).groupBy($"g")
      .agg(hll_sketch_estimate(hll_sketch_agg($"u")).as("d"),
        count(lit(1)).as("n"))
    def recompute = Scd1Merge.readTable(spark, base).groupBy($"g")
      .agg(hll_sketch_estimate(hll_sketch_agg($"u")).as("d"),
        count(lit(1)).as("n"))
    try {
      assert(readsOnly(q, mv), s"sketch MV must answer: ${scanPaths(q)}")
      assertSameRows(q.orderBy("g"), recompute.orderBy("g"))
      // estimates track EXACT distinct counts at this cardinality
      // (hll_sketch_estimate returns BIGINT)
      val exact = Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(countDistinct($"u").as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      GraftMvRewrite.unregister(base)
      val est0 = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      GraftMvRewrite.register(base, mv, spec)
      exact.foreach { case (g, e) =>
        assert(math.abs(est0(g) - e) <= e * 0.05 + 1,
          s"$g: estimate ${est0(g)} vs exact $e") }
      // INSERT-ONLY wave: new distincts union in (pure fold)
      Scd1Merge.upsert(spark, base,
        (401L to 480L).map(i => (i, s"g${i % 4}", i % 61 + 100))
          .toDF("id", "g", "u"), Seq("id"), retainVersions = 6)
      IncrementalAgg.applyChanges(spark, mv, base, Seq("id"), spec)
      assert(readsOnly(q, mv))
      assertSameRows(q.orderBy("g"), recompute.orderBy("g"))
      // RETRACTION wave: delete every copy of u=5 in g1 (a distinct
      // value dies — the blunt flag rescans), plus a copy-remains
      // delete in g2 — estimates must equal a from-scratch sketch
      Scd1Merge.delete(spark, base, Seq("id"),
        ($"g" === "g1" && $"u" === 5) || $"id" === 2L,
        retainVersions = 6)
      IncrementalAgg.applyChanges(spark, mv, base, Seq("id"), spec)
      assert(readsOnly(q, mv))
      assertSameRows(q.orderBy("g"), recompute.orderBy("g"))
      // ROLL-UP: the global sketch is the exact union of group
      // sketches — same estimate as a direct base-wide sketch
      val roll = Scd1Merge.readTable(spark, base)
        .agg(hll_sketch_estimate(hll_sketch_agg($"u")).as("d"))
      assert(readsOnly(roll, mv), s"roll-up must answer: ${scanPaths(roll)}")
      GraftMvRewrite.unregister(base)
      assertSameRows(roll, Scd1Merge.readTable(spark, base)
        .agg(hll_sketch_estimate(hll_sketch_agg($"u")).as("d")))
      GraftMvRewrite.register(base, mv, spec)
      // non-default precision falls through (different-lgK sketches
      // cannot union with the stored ones)
      assert(readsOnly(Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(hll_sketch_estimate(hll_sketch_agg($"u", 14)).as("d")), base))
      // CREATE rejects a non-default precision loudly
      val e = intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          s"""CREATE GRAFT MATERIALIZED VIEW graft.`$root/mv14` AS
             |SELECT g, hll_sketch_agg(u, 14) AS sk, count(*) AS n
             |FROM graft.`$base` GROUP BY g""".stripMargin).collect()
      }
      assert(e.getMessage.contains("lgK"))
    } finally { GraftMvRewrite.unregister(base); GraftMvRewrite.clear() }
  }

  test("STAR MV (2 dims): dashboard aggregate + roll-up rewrite; commits on all three sides fold in ONE refresh; soundness") {
    import graft.pipeline.{IncrementalJoinAgg, MvDef}
    val root = Tmp.dir("mv_star")
    val factT = root + "/fact"; val d1T = root + "/cust"
    val d2T = root + "/prod"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, factT,
      (1L to 400L).map(i => (i, i % 40 + 1, i % 11 + 1, i * 10))
        .toDF("id", "ck", "pk", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 4)
    Scd1Merge.upsert(spark, d1T,
      (1L to 40L).map(c => (c, s"seg${c % 5}")).toDF("ck", "seg"),
      Seq("ck"), numBuckets = 2, retainVersions = 4)
    Scd1Merge.upsert(spark, d2T,
      (1L to 11L).map(p => (p, s"cat${p % 3}")).toDF("pk", "cat"),
      Seq("pk"), numBuckets = 2, retainVersions = 4)
    val spec = AggSpec(Seq("seg", "cat"), Seq("cents" -> "sc"), "n")
    IncrementalJoinAgg.createMvStar(spark, mv, factT, Seq("id"),
      Seq(MvDef.JoinSrc(d1T, Seq("ck"), "ck", "ck"),
        MvDef.JoinSrc(d2T, Seq("pk"), "pk", "pk")), spec, numBuckets = 2)
    // the persisted definition round-trips BOTH dims
    assert(MvDef.read(mv).exists(_.joins.size == 2))
    try {
      def f = Scd1Merge.readTable(spark, factT)
      def d1 = Scd1Merge.readTable(spark, d1T)
      def d2 = Scd1Merge.readTable(spark, d2T)
      def q = f.join(d1, "ck").join(d2, "pk")
        .groupBy($"seg", $"cat")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(q, mv), s"star MV must answer: ${scanPaths(q)}")
      // roll-up to one dim's group rewrites too
      val roll = f.join(d1, "ck").join(d2, "pk")
        .groupBy($"cat").agg(sum($"cents").as("sc"))
      assert(readsOnly(roll, mv))
      // commits on ALL THREE sides: a fact insert + correction, a
      // group move on each dim (mass shifts between groups on both
      // axes) — stale until ONE refresh telescopes all three lags
      Scd1Merge.upsert(spark, factT,
        Seq((401L, 7L, 3L, 999L), (14L, 14L % 40 + 1, 14L % 11 + 1, 5L))
          .toDF("id", "ck", "pk", "cents"), Seq("id"), retainVersions = 4)
      Scd1Merge.upsert(spark, d1T,
        Seq((7L, "segX")).toDF("ck", "seg"), Seq("ck"), retainVersions = 4)
      Scd1Merge.upsert(spark, d2T,
        Seq((3L, "catY")).toDF("pk", "cat"), Seq("pk"), retainVersions = 4)
      assert(!readsOnly(q, mv), "a 3-sided lag must route to the real join")
      val rr = graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").as[(Long, Long)].head()
      assert(rr._2 == 3L, s"one commit per side must fold: $rr")
      val fresh = q
      assert(readsOnly(fresh, mv))
      GraftMvRewrite.unregisterJoin(mv)
      assertSameRows(fresh.orderBy("seg", "cat"),
        f.join(d1, "ck").join(d2, "pk").groupBy($"seg", $"cat")
          .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
          .orderBy("seg", "cat"))
      assert(IncrementalJoinAgg.refreshStar(spark, mv, factT, Seq("id"),
        MvDef.read(mv).get.joins, spec) == Seq(0, 0, 0), "replay is a no-op")
      // soundness: a query joining only ONE of the two dims, or
      // grouping by a non-MV column, must fall through
      GraftMvRewrite.registerJoin(GraftMvRewrite.JoinMvReg(factT,
        Seq(GraftMvRewrite.DimJoin(d1T, "ck", "ck"),
          GraftMvRewrite.DimJoin(d2T, "pk", "pk")), mv, spec))
      assert(!readsOnly(f.join(d1, "ck").groupBy($"seg")
        .agg(sum($"cents").as("sc")), mv))
      assert(!readsOnly(f.join(d1, "ck").join(d2, "pk").groupBy($"ck")
        .agg(sum($"cents").as("sc")), mv))
    } finally GraftMvRewrite.unregisterJoin(mv)
  }

  test("FILTERED STAR MV: fact-column WHERE bakes in via SQL; same-predicate star query rewrites; boundary crossings + dim move fold; dim-column filters reject") {
    import graft.pipeline.MvDef
    val root = Tmp.dir("mv_star_filt")
    val factT = root + "/fact"; val dimT = root + "/dim"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, factT,
      (1L to 300L).map(i => (i, i % 20 + 1, i * 10)).toDF("id", "ck", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 4)
    Scd1Merge.upsert(spark, dimT,
      (1L to 20L).map(c => (c, s"seg${c % 4}")).toDF("ck", "seg"),
      Seq("ck"), numBuckets = 1, retainVersions = 4)
    try {
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS
           |SELECT seg, sum(cents) AS sc, count(*) AS n
           |FROM graft.`$factT` f JOIN graft.`$dimT` d ON f.ck = d.ck
           |WHERE cents > 1500 GROUP BY seg""".stripMargin).collect()
      assert(MvDef.read(mv).exists(_.spec.filterSql.nonEmpty))
      def f = Scd1Merge.readTable(spark, factT)
      def d = Scd1Merge.readTable(spark, dimT)
      def q = f.filter($"cents" > 1500).join(d, "ck").groupBy($"seg")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(q, mv),
        s"same-predicate star query must rewrite: ${scanPaths(q)}")
      // unfiltered and different-predicate star queries fall through
      assert(!readsOnly(f.join(d, "ck").groupBy($"seg")
        .agg(sum($"cents").as("sc")), mv))
      assert(!readsOnly(f.filter($"cents" > 10).join(d, "ck")
        .groupBy($"seg").agg(sum($"cents").as("sc")), mv))
      // boundary-crossing fact wave + a dim segment move, ONE refresh
      Scd1Merge.upsert(spark, factT, Seq(
        (200L, 200L % 20 + 1, 100L),   // was 2000 (pass) -> fails
        (100L, 100L % 20 + 1, 9000L),  // was 1000 (fail) -> passes
        (901L, 3L, 8000L)              // new, passes
      ).toDF("id", "ck", "cents"), Seq("id"), retainVersions = 4)
      Scd1Merge.upsert(spark, dimT, Seq((3L, "segX")).toDF("ck", "seg"),
        Seq("ck"), retainVersions = 4)
      assert(!readsOnly(q, mv))
      val rr = graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").as[(Long, Long)].head()
      assert(rr._2 == 2L, rr.toString)
      val fresh = q
      assert(readsOnly(fresh, mv))
      GraftMvRewrite.unregisterJoin(mv)
      assertSameRows(fresh.orderBy("seg"),
        f.filter($"cents" > 1500).join(d, "ck").groupBy($"seg")
          .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
          .orderBy("seg"))
      // a DIM-column predicate LOWERS: the dim's fact-side key joins
      // the MV groups (the predicate applies at rewrite time through
      // a re-join — never baked into the maintained content)
      graft.sql.GraftSql.sql(spark,
        s"CREATE GRAFT MATERIALIZED VIEW graft.`$root/m2` AS " +
        s"SELECT seg, sum(cents) AS sc, count(*) AS n " +
        s"FROM graft.`$factT` f JOIN graft.`$dimT` d ON f.ck = d.ck " +
        s"WHERE seg <> 'seg0' GROUP BY seg").collect()
      val m2 = MvDef.read(root + "/m2").get
      assert(m2.spec.groupCols.map(_.toLowerCase) == Seq("seg", "ck") &&
        m2.spec.filterSql.isEmpty,
        s"dim filter must lower to fk-in-groups, got ${m2.spec}")
      GraftMvRewrite.unregisterJoin(root + "/m2")
      // a conjunct MIXING sides is rejected loudly — by exprId, so a
      // dim-qualified column never silently rebinds to the fact
      val e = intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          s"CREATE GRAFT MATERIALIZED VIEW graft.`$root/m3` AS " +
          s"SELECT seg, sum(cents) AS sc, count(*) AS n " +
          s"FROM graft.`$factT` f JOIN graft.`$dimT` d ON f.ck = d.ck " +
          s"WHERE cents > d.ck + 1 GROUP BY seg").collect()
      }
      assert(e.getMessage.contains("mixes"))
    } finally GraftMvRewrite.unregisterJoin(mv)
  }

  test("PARTITIONED star fact: union-of-scans fact leaf matches; feed-riding refresh folds a month ingest beside a dim move") {
    import graft.merge.PartitionedTable
    import graft.pipeline.{IncrementalJoinAgg, MvDef}
    val root = Tmp.dir("mv_pstar")
    val factT = root + "/fact"; val dimT = root + "/dim"; val mv = root + "/mv"
    def fact(months: Seq[String], bump: Long = 0) =
      months.flatMap(m => (0 until 10).map(i =>
        (m, (s"$m#$i".hashCode.toLong & 0xffffff), i.toLong % 6 + 1,
          (i + 1) * 100L + bump)))
        .toDF("month", "id", "ck", "cents").dropDuplicates("month", "id")
    PartitionedTable.upsert(spark, factT, fact(Seq("2024-01", "2024-02")),
      Seq("month", "id"), "month", numBuckets = 2, retainVersions = 4)
    Scd1Merge.upsert(spark, dimT,
      (1L to 6L).map(c => (c, s"seg${c % 3}")).toDF("ck", "seg"),
      Seq("ck"), numBuckets = 1, retainVersions = 4)
    IncrementalJoinAgg.createMvStar(spark, mv, factT, Seq("month", "id"),
      Seq(MvDef.JoinSrc(dimT, Seq("ck"), "ck", "ck")),
      AggSpec(Seq("seg"), Seq("cents" -> "sc"), "n"), numBuckets = 2)
    try {
      def q = PartitionedTable.readTable(spark, factT)
        .join(Scd1Merge.readTable(spark, dimT), "ck")
        .groupBy($"seg").agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(q, mv),
        s"partitioned fact leaf must match: ${scanPaths(q)}")
      // ONE parent commit: new month + corrections into an old one;
      // plus a dim segment move — one refresh folds both sides
      PartitionedTable.upsert(spark, factT,
        fact(Seq("2024-03")).unionByName(fact(Seq("2024-01"), bump = 3)),
        Seq("month", "id"), "month", retainVersions = 4)
      Scd1Merge.upsert(spark, dimT, Seq((2L, "segX")).toDF("ck", "seg"),
        Seq("ck"), retainVersions = 4)
      assert(!readsOnly(q, mv))
      assert(IncrementalJoinAgg.refreshStar(spark, mv, factT,
        Seq("month", "id"), MvDef.read(mv).get.joins,
        MvDef.read(mv).get.spec) == Seq(1, 1))
      val fresh = q
      assert(readsOnly(fresh, mv))
      GraftMvRewrite.unregisterJoin(mv)
      assertSameRows(fresh.orderBy("seg"),
        PartitionedTable.readTable(spark, factT)
          .join(Scd1Merge.readTable(spark, dimT), "ck")
          .groupBy($"seg").agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
          .orderBy("seg"))
      // a partition DROP is a fact commit too: stale until refreshed
      GraftMvRewrite.registerJoin(GraftMvRewrite.JoinMvReg(factT,
        Seq(GraftMvRewrite.DimJoin(dimT, "ck", "ck")), mv,
        MvDef.read(mv).get.spec))
      PartitionedTable.dropPartitionsWhere(spark, factT, $"month" === "2024-01")
      assert(!readsOnly(q, mv))
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect()
      val afterDrop = q
      assert(readsOnly(afterDrop, mv))
      GraftMvRewrite.unregisterJoin(mv)
      assertSameRows(afterDrop.orderBy("seg"),
        PartitionedTable.readTable(spark, factT)
          .join(Scd1Merge.readTable(spark, dimT), "ck")
          .groupBy($"seg").agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
          .orderBy("seg"))
    } finally GraftMvRewrite.unregisterJoin(mv)
  }

  test("rewrite survives parent operators: sort and HAVING keep the MV plan and the answer") {
    val (base, mv, _) = fixture()
    try {
      val q = Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
        .filter($"n" > 10).orderBy($"sc".desc)
      assert(readsOnly(q, mv))
      GraftMvRewrite.unregister(base)
      assertSameRows(q, Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
        .filter($"n" > 10).orderBy($"sc".desc))
    } finally GraftMvRewrite.unregister(base)
  }

  test("PREDICATE SUBSUMPTION: query conjuncts ⊇ definition rewrite with the residual over the MV; measures/disjunctions/literal-case fall through") {
    val root = Tmp.dir("mv_subsume")
    val base = root + "/orders"; val mv = root + "/mv"
    val rows = (1L to 400L).map(i =>
      (i, s"P${i % 3}", f"1997-${i % 12 + 1}%02d", i * 10))
      .toDF("id", "pri", "mth", "cents")
    Scd1Merge.upsert(spark, base, rows, Seq("id"), numBuckets = 2,
      retainVersions = 4)
    try {
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS
           |SELECT pri, mth, sum(cents) AS sc, count(*) AS n
           |FROM graft.`$base` WHERE pri = 'P1'
           |GROUP BY pri, mth""".stripMargin).collect()
      def b = Scd1Merge.readTable(spark, base)
      // definition predicate + a residual on a GROUP column: the
      // residual applies over the MV (roll-up to mth)
      def q = b.filter($"pri" === "P1" && $"mth" >= "1997-07")
        .groupBy($"mth").agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(q, mv), s"residual query must rewrite: ${scanPaths(q)}")
      // residual on a MEASURE cannot commute with the aggregation
      assert(readsOnly(b.filter($"pri" === "P1" && $"cents" > 50)
        .groupBy($"mth").agg(sum($"cents").as("sc")), base))
      // a top-level disjunction is ONE unmatched conjunct
      assert(readsOnly(b.filter($"pri" === "P1" || $"mth" === "1997-01")
        .groupBy($"mth").agg(sum($"cents").as("sc")), base))
      // literal case matters: 'p1' is a DIFFERENT value than 'P1'
      assert(readsOnly(b.filter($"pri" === "p1")
        .groupBy($"mth").agg(sum($"cents").as("sc")), base))
      // values: residual rewrite equals the from-base recompute
      val got = q
      GraftMvRewrite.unregisterMv(mv)
      assertSameRows(got.orderBy("mth"),
        b.filter($"pri" === "P1" && $"mth" >= "1997-07").groupBy($"mth")
          .agg(sum($"cents").as("sc"), count(lit(1)).as("n")).orderBy("mth"))
    } finally { GraftMvRewrite.unregisterMv(mv); GraftMvRewrite.clear() }
  }

  test("SUBSUMPTION over an UNFILTERED MV: a group-column filter alone becomes the residual") {
    val (base, mv, _) = fixture()
    try {
      val b = Scd1Merge.readTable(spark, base)
      val q = b.filter($"g" === "g1").groupBy($"p")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(q, mv), s"group-col filter must rewrite: ${scanPaths(q)}")
      GraftMvRewrite.unregister(base)
      assertSameRows(q.orderBy("p"),
        b.filter($"g" === "g1").groupBy($"p")
          .agg(sum($"cents").as("sc"), count(lit(1)).as("n")).orderBy("p"))
    } finally GraftMvRewrite.unregister(base)
  }

  test("DIM-ATTRIBUTE-FILTERED STAR MV: WHERE on a dim column lowers to fk-in-groups; the rewrite re-joins the dim; attribute flips need no MV wave") {
    import graft.pipeline.MvDef
    val root = Tmp.dir("mv_dimfilt")
    val factT = root + "/fact"; val dimT = root + "/dim"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, factT,
      (1L to 300L).map(i => (i, i % 20 + 1, s"b${i % 5}", i * 10))
        .toDF("id", "ck", "bucket", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 4)
    Scd1Merge.upsert(spark, dimT,
      (1L to 20L).map(c => (c, s"seg${c % 4}")).toDF("ck", "seg"),
      Seq("ck"), numBuckets = 1, retainVersions = 4)
    try {
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS
           |SELECT bucket, sum(cents) AS sc, count(*) AS n
           |FROM graft.`$factT` f JOIN graft.`$dimT` d ON f.ck = d.ck
           |WHERE d.seg = 'seg1' GROUP BY bucket""".stripMargin).collect()
      assert(MvDef.read(mv).exists(d =>
        d.spec.groupCols.map(_.toLowerCase) == Seq("bucket", "ck")))
      def f = Scd1Merge.readTable(spark, factT)
      def d = Scd1Merge.readTable(spark, dimT)
      def q = f.as("f").join(d.as("d"), col("f.ck") === col("d.ck"))
        .filter($"seg" === "seg1").groupBy($"bucket")
        .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      // the rewritten plan reads the MV + the dim, never the fact
      def answersFromMv(df: DataFrame): Boolean = {
        val ps = scanPaths(df)
        ps.nonEmpty && ps.exists(_.contains(mv + "/")) &&
          !ps.exists(_.contains(factT + "/"))
      }
      assert(answersFromMv(q), s"dim-filtered query must rewrite: ${scanPaths(q)}")
      // ANY predicate on the keyed dim applies — not just the created one
      assert(answersFromMv(f.as("f").join(d.as("d"), col("f.ck") === col("d.ck"))
        .filter($"seg" =!= "seg0").groupBy($"bucket")
        .agg(sum($"cents").as("sc"))))
      // a dim attribute FLIP: no MV content change, but the stamp
      // gates until refresh; after refresh the re-join sees new segs
      Scd1Merge.upsert(spark, dimT,
        Seq((5L, "seg1"), (9L, "seg0")).toDF("ck", "seg"),
        Seq("ck"), retainVersions = 4)
      assert(!answersFromMv(q), "a lagging dim must route to the base")
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect()
      val fresh = q
      assert(answersFromMv(fresh))
      GraftMvRewrite.unregisterJoin(mv)
      assertSameRows(fresh.orderBy("bucket"),
        f.as("f").join(d.as("d"), col("f.ck") === col("d.ck"))
          .filter($"seg" === "seg1").groupBy($"bucket")
          .agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
          .orderBy("bucket"))
    } finally { GraftMvRewrite.unregisterJoin(mv); GraftMvRewrite.clear() }
  }

  test("STAR ROLLUP MV: expression group + max over the join maintain through the telescoped delta and rewrite") {
    import graft.pipeline.MvDef
    val root = Tmp.dir("mv_starroll")
    val factT = root + "/fact"; val dimT = root + "/dim"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, factT,
      (1L to 300L).map(i =>
        (i, i % 10 + 1, f"1997-${i % 6 + 1}%02d-15", i * 10))
        .toDF("id", "ck", "d", "cents")
        .withColumn("d", to_date($"d")),
      Seq("id"), numBuckets = 2, retainVersions = 4)
    Scd1Merge.upsert(spark, dimT,
      (1L to 11L).map(c => (c, s"seg${c % 3}")).toDF("ck", "seg"),
      Seq("ck"), numBuckets = 1, retainVersions = 4)
    try {
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS
           |SELECT date_format(d, 'yyyy-MM') AS mth, seg,
           |  sum(cents) AS sc, max(cents) AS mx,
           |  hll_sketch_agg(f.ck) AS cust_sk, count(*) AS n
           |FROM graft.`$factT` f JOIN graft.`$dimT` dm ON f.ck = dm.ck
           |GROUP BY date_format(d, 'yyyy-MM'), seg""".stripMargin).collect()
      val def0 = MvDef.read(mv).get
      assert(def0.spec.groupExprs.keySet == Set("mth") &&
        def0.spec.maxs == Seq("cents" -> "mx") &&
        def0.spec.sketches == Seq("ck" -> "cust_sk"), s"${def0.spec}")
      def f = Scd1Merge.readTable(spark, factT)
      def dm = Scd1Merge.readTable(spark, dimT)
      def q = f.join(dm, "ck")
        .groupBy(date_format($"d", "yyyy-MM").as("mth"), $"seg")
        .agg(sum($"cents").as("sc"), max($"cents").as("mx"),
          hll_sketch_estimate(hll_sketch_agg($"ck")).as("uc"),
          count(lit(1)).as("n"))
      assert(readsOnly(q, mv), s"star rollup must rewrite: ${scanPaths(q)}")
      // wave: delete the global max row (retraction AT the extreme →
      // flagged-group rescan over the re-joined view), move a dim seg,
      // and insert a new month — ONE refresh folds all three
      Scd1Merge.delete(spark, factT, Seq("id"), $"id" === 300L,
        retainVersions = 4)
      Scd1Merge.upsert(spark, dimT, Seq((3L, "segX")).toDF("ck", "seg"),
        Seq("ck"), retainVersions = 4)
      Scd1Merge.upsert(spark, factT,
        Seq((901L, 4L, java.sql.Date.valueOf("1997-09-15"), 70L))
          .toDF("id", "ck", "d", "cents"),
        Seq("id"), retainVersions = 4)
      assert(!readsOnly(q, mv))
      val rr = graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").as[(Long, Long)].head()
      assert(rr._2 == 3L, rr.toString)
      val fresh = q
      assert(readsOnly(fresh, mv))
      GraftMvRewrite.unregisterJoin(mv)
      assertSameRows(fresh.orderBy("mth", "seg"),
        f.join(dm, "ck")
          .groupBy(date_format($"d", "yyyy-MM").as("mth"), $"seg")
          .agg(sum($"cents").as("sc"), max($"cents").as("mx"),
            hll_sketch_estimate(hll_sketch_agg($"ck")).as("uc"),
            count(lit(1)).as("n"))
          .orderBy("mth", "seg"))
    } finally { GraftMvRewrite.unregisterJoin(mv); GraftMvRewrite.clear() }
  }

  test("STAR SUBSUMPTION: fact conjuncts ⊇ definition rewrite with residuals over the MV; measures/missing-definition-predicate fall through") {
    val root = Tmp.dir("mv_star_subsume")
    val factT = root + "/fact"; val dimT = root + "/dim"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, factT,
      (1L to 300L).map(i => (i, i % 10 + 1, s"b${i % 5}",
        if (i % 2 == 0) "A" else "B", i * 10))
        .toDF("id", "ck", "bucket", "flag", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 4)
    Scd1Merge.upsert(spark, dimT,
      (1L to 11L).map(c => (c, s"seg${c % 3}")).toDF("ck", "seg"),
      Seq("ck"), numBuckets = 1, retainVersions = 4)
    try {
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS
           |SELECT bucket, seg, sum(cents) AS sc, count(*) AS n
           |FROM graft.`$factT` f JOIN graft.`$dimT` d ON f.ck = d.ck
           |WHERE f.flag = 'A' GROUP BY bucket, seg""".stripMargin).collect()
      def f = Scd1Merge.readTable(spark, factT)
      def d = Scd1Merge.readTable(spark, dimT)
      // definition predicate + a residual on a GROUP column: the
      // residual applies over the MV (and the groups roll up)
      def q = f.join(d, "ck")
        .filter($"flag" === "A" && $"bucket" >= "b2")
        .groupBy($"seg").agg(sum($"cents").as("sc"), count(lit(1)).as("n"))
      assert(readsOnly(q, mv), s"star residual must rewrite: ${scanPaths(q)}")
      // residual on a MEASURE cannot commute with the aggregation
      assert(!scanPaths(f.join(d, "ck")
        .filter($"flag" === "A" && $"cents" > 50)
        .groupBy($"seg").agg(sum($"cents").as("sc")))
        .exists(_.contains(mv + "/")))
      // the definition predicate MISSING is not subsumption
      assert(!scanPaths(f.join(d, "ck").filter($"bucket" >= "b2")
        .groupBy($"seg").agg(sum($"cents").as("sc")))
        .exists(_.contains(mv + "/")))
      // values: the residual rewrite equals the from-base recompute
      val got = q
      GraftMvRewrite.unregisterJoin(mv)
      assertSameRows(got.orderBy("seg"),
        f.join(d, "ck").filter($"flag" === "A" && $"bucket" >= "b2")
          .groupBy($"seg").agg(sum($"cents").as("sc"),
            count(lit(1)).as("n")).orderBy("seg"))
    } finally { GraftMvRewrite.unregisterJoin(mv); GraftMvRewrite.clear() }
  }

  test("MV CHAIN: an MV over an MV maintains from the first layer's feed; RETAIN covers the lag; default retention fails loudly") {
    import graft.pipeline.MvDef
    val root = Tmp.dir("mv_chain")
    val base = root + "/base"
    val mvD = root + "/mv_day"; val mvM = root + "/mv_month"
    Scd1Merge.upsert(spark, base,
      (1L to 300L).map(i => (i, f"1997-${i % 6 + 1}%02d-${i % 3 + 1}%02d", i * 10))
        .toDF("id", "d", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 4)
    try {
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvD` BUCKETS 2
           |RETAIN 4 AS
           |SELECT d, sum(cents) AS sc, count(*) AS n
           |FROM graft.`$base` GROUP BY d""".stripMargin).collect()
      assert(MvDef.read(mvD).exists(_.retain == 4),
        "RETAIN must persist in the definition")
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvM` BUCKETS 1 AS
           |SELECT substring(d, 1, 7) AS m, sum(sc) AS sc,
           |  sum(n) AS n_rows, count(*) AS nd
           |FROM graft.`$mvD` GROUP BY substring(d, 1, 7)""".stripMargin)
        .collect()
      def qM = Scd1Merge.readTable(spark, mvD)
        .groupBy(substring($"d", 1, 7).as("m"))
        .agg(sum($"sc").as("sc"), sum($"n").as("n_rows"))
      assert(readsOnly(qM, mvM), s"second layer must answer: ${scanPaths(qM)}")
      // a base wave: correction + group-killing delete (forces the
      // tombstone sweep — mv_day advances by 2 commits per refresh)
      Scd1Merge.upsert(spark, base,
        Seq((7L, "1997-02-01", 999L)).toDF("id", "d", "cents"),
        Seq("id"), retainVersions = 4)
      Scd1Merge.delete(spark, base, Seq("id"), $"d" === "1997-01-01",
        retainVersions = 4)
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mvD`").collect()
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mvM`").collect()
      assert(readsOnly(qM, mvM))
      // values track a full recompute from the base
      GraftMvRewrite.clear()
      assertSameRows(qM.orderBy("m"),
        Scd1Merge.readTable(spark, base)
          .groupBy(substring($"d", 1, 7).as("m"))
          .agg(sum($"cents").as("sc"), count(lit(1)).as("n_rows"))
          .orderBy("m"))
      // the NEGATIVE: a first layer at DEFAULT retention (1) cannot
      // feed a lagging consumer across a sweep-bearing refresh
      val mvD1 = root + "/mv_day1"; val mvM1 = root + "/mv_month1"
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvD1` BUCKETS 2 AS
           |SELECT d, sum(cents) AS sc, count(*) AS n
           |FROM graft.`$base` GROUP BY d""".stripMargin).collect()
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvM1` BUCKETS 1 AS
           |SELECT substring(d, 1, 7) AS m, sum(sc) AS sc, count(*) AS nd
           |FROM graft.`$mvD1` GROUP BY substring(d, 1, 7)""".stripMargin)
        .collect()
      Scd1Merge.delete(spark, base, Seq("id"), $"d" === "1997-02-01",
        retainVersions = 4)
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mvD1`").collect()
      val e = intercept[Exception] {
        graft.sql.GraftSql.sql(spark,
          s"REFRESH MATERIALIZED VIEW graft.`$mvM1`").collect()
      }
      assert(e.getMessage.contains("not retained") ||
        e.getMessage.contains("retain"),
        s"default-retention chain must fail loudly: ${e.getMessage}")
    } finally {
      GraftMvRewrite.clear()
    }
  }

  test("registry hygiene: clear() wipes join MVs; unregisterJoin lets a catalog re-arm over the same fact") {
    import graft.pipeline.MvDef
    val root = Tmp.dir("mv_hygiene")
    val factT = root + "/fact"; val dimT = root + "/dim"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, factT,
      (1L to 50L).map(i => (i, i % 5 + 1, i * 10)).toDF("id", "ck", "cents"),
      Seq("id"), numBuckets = 1, retainVersions = 4)
    Scd1Merge.upsert(spark, dimT,
      (1L to 6L).map(c => (c, s"s$c")).toDF("ck", "seg"),
      Seq("ck"), numBuckets = 1, retainVersions = 4)
    graft.sql.GraftCatalog.setRoot(root)
    try {
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` AS
           |SELECT seg, sum(cents) AS sc, count(*) AS n
           |FROM graft.`$factT` f JOIN graft.`$dimT` d ON f.ck = d.ck
           |GROUP BY seg""".stripMargin).collect()
      assert(GraftMvRewrite.registeredMvPaths.contains(mv))
      GraftMvRewrite.clear()
      assert(!GraftMvRewrite.registeredMvPaths.contains(mv),
        "clear() must wipe the join registry too")
      // the catalog still knows the MV: the next matching query
      // re-arms (clear() also reset the armed-bases memo)
      def q = Scd1Merge.readTable(spark, factT)
        .join(Scd1Merge.readTable(spark, dimT), "ck")
        .groupBy($"seg").agg(sum($"cents").as("sc"))
      assert(readsOnly(q, mv), "catalog re-arm after clear() must fire")
      // unregisterJoin (the DROP path) must also forget the memo so a
      // later CREATE over the same fact can re-arm from the catalog
      GraftMvRewrite.unregisterJoin(mv)
      assert(readsOnly(q, mv), "re-arm after unregisterJoin must fire")
    } finally {
      GraftMvRewrite.unregisterJoin(mv)
      GraftMvRewrite.clear()
      graft.sql.GraftCatalog.clearRoot()
    }
  }

  test("NONDETERMINISTIC residual never re-expresses over the MV: rand() samples ROWS on the base, not groups") {
    val (base, mv, _) = fixture()
    try {
      val b = Scd1Merge.readTable(spark, base)
      // σ_p ∘ γ_G = γ_G ∘ σ_p needs p to be a function of the group
      // columns; `rand() < x` is not — over the MV it would sample
      // whole GROUPS. Must fall through to the base however the
      // nondeterminism is nested.
      val q = b.filter(rand(7) < 0.5).groupBy($"g")
        .agg(sum($"cents").as("sc"))
      assert(readsOnly(q, base),
        s"rand() residual must fall through, read ${scanPaths(q)}")
      val nested = b.filter((length($"g") + rand(7)) > -1.0).groupBy($"g")
        .agg(sum($"cents").as("sc"))
      assert(readsOnly(nested, base), "nested rand() must fall through")
      // the deterministic twin (a group-column residual) still serves
      val det = b.filter($"g" =!= "nope").groupBy($"g")
        .agg(sum($"cents").as("sc"))
      assert(readsOnly(det, mv), s"${scanPaths(det)}")
    } finally GraftMvRewrite.unregister(base)
  }

  test("COST-AWARE selection: when two MVs both admit a query the SMALLER answers, not the path-first") {
    val root = Tmp.dir("mv_cost")
    val base = root + "/base"
    // path order would pick a_big; row counts must pick z_small
    val mvBig = root + "/a_big"; val mvSmall = root + "/z_small"
    val rows = (1L to 400L).map(i =>
      (i, s"g${i % 7}", s"p${i % 3}", i * 10)).toDF("id", "g", "p", "cents")
    Scd1Merge.upsert(spark, base, rows, Seq("id"), numBuckets = 4)
    val specBig = AggSpec(Seq("g", "p"), Seq("cents" -> "sum_cents"), "n")
    val specSmall = AggSpec(Seq("g"), Seq("cents" -> "sum_cents"), "n")
    IncrementalAgg.bootstrapFrom(spark, mvBig, base, specBig, numBuckets = 2)
    IncrementalAgg.bootstrapFrom(spark, mvSmall, base, specSmall, numBuckets = 2)
    GraftMvRewrite.register(base, mvBig, specBig)
    GraftMvRewrite.register(base, mvSmall, specSmall)
    try {
      val b = Scd1Merge.readTable(spark, base)
      val q = b.groupBy($"g").agg(sum($"cents").as("sc"))
      assert(readsOnly(q, mvSmall),
        s"smallest admissible MV must serve, read ${scanPaths(q)}")
      // a (g,p) ask only the big one admits — still serves
      val q2 = b.groupBy($"g", $"p").agg(sum($"cents").as("sc"))
      assert(readsOnly(q2, mvBig), s"${scanPaths(q2)}")
      GraftMvRewrite.unregister(base)
      assertSameRows(q.orderBy("g"),
        b.groupBy($"g").agg(sum($"cents").as("sc")).orderBy("g"))
    } finally GraftMvRewrite.unregister(base)
  }
}
