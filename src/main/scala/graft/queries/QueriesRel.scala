package graft.queries

import graft.Tables.{cents, table}
import graft.merge.Scd1Merge
import graft.ops.{KeyGenStrategy, RelOps}
import graft.pipeline.IngestRunner
import graft.store.WatermarkStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY.md §2 relational operator inventory wired to the driver
  * testdata, one judged query per operator id, each with a DuckDB twin
  * in [[oracle]]. Every query ends in a total ORDER BY so result rows
  * are reproducible independent of partitioning.
  */
object QueriesRel {

  type Q = (SparkSession, String) => DataFrame

  private def tmpDir(prefix: String): String = graft.Tmp.dir(prefix)

  /** Drop a managed table AND its warehouse directory. The in-memory
    * catalog forgets tables between sessions but their directories
    * persist, which fails the next `saveAsTable` with
    * LOCATION_ALREADY_EXISTS. */
  private def dropManaged(s: SparkSession, db: String, tbl: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $db.$tbl")
    val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(wh, s"$db.db", tbl)
    if (Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      graft.merge.FsList.walk(loc).reverse.foreach(Files.delete)
    }
  }

  val queries: Map[String, Q] = Map(
    // ---- S: scans / sources / sinks ------------------------------------
    "s1_incremental_ingest" -> ((s, dir) => {
      // Full watermark loop (S1+F5+S6+S11): three source snapshots replayed
      // through IngestRunner; bronze must equal the full table at the end.
      val orders = table(s, dir, "orders")
        .withColumn("o_date", to_date(col("o_orderdate")))
      val bronze = tmpDir("graft_bronze")
      val store = new WatermarkStore(tmpDir("graft_wm"))
      store.init("0000-00-00")
      Seq("1997-01-01", "1999-01-01", "9999-12-31").foreach { cut =>
        val snapshot = orders.filter(col("o_date") <= to_date(lit(cut)))
        IngestRunner.run(s, snapshot, "o_date", store, bronze)
      }
      s.read.parquet(bronze)
        .select(col("o_orderkey"), col("o_date"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),
    "s2_csv_roundtrip" -> ((s, dir) => {
      // CSV source semantics (S2): header, RFC-4180 quoting, empty-as-null.
      val c = table(s, dir, "customer")
      val csv = tmpDir("graft_csv")
      c.coalesce(1).write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true").csv(csv)
      s.read.schema(c.schema)
        .option("header", "true").option("nullValue", "").csv(csv)
        .orderBy(col("c_custkey"))
    }),
    "s3_parquet_scan" -> ((s, dir) =>
      table(s, dir, "region").orderBy(col("r_regionkey"))),
    "s14_json_roundtrip" -> ((s, dir) => {
      // JSON-lines source semantics: explicit schema (no sampling-based
      // inference at scale), null passthrough, full double precision
      val c = table(s, dir, "customer")
      val out = tmpDir("graft_json")
      c.coalesce(1).write.mode("overwrite").json(out)
      s.read.schema(c.schema).json(out).orderBy(col("c_custkey"))
    }),
    "s15_orc_roundtrip" -> ((s, dir) => {
      // ORC source/sink — the other columnar format a lakehouse ingests
      val n = table(s, dir, "nation")
      val out = tmpDir("graft_orc")
      n.write.mode("overwrite").orc(out)
      s.read.orc(out).orderBy(col("n_nationkey"))
    }),
    "s4_sql_over_files" -> ((s, dir) =>
      s.sql(s"SELECT p_partkey, p_name, p_brand FROM parquet.`$dir/part.parquet` ORDER BY p_partkey")),
    "s5_catalog_scan" -> ((s, dir) => {
      s.sql("CREATE DATABASE IF NOT EXISTS graft")
      dropManaged(s, "graft", "supplier_cat")
      table(s, dir, "supplier").write.mode("overwrite").saveAsTable("graft.supplier_cat")
      s.table("graft.supplier_cat").orderBy(col("s_suppkey"))
    }),
    "s6_parquet_append_sink" -> ((s, dir) => {
      val n = table(s, dir, "nation")
      val out = tmpDir("graft_append")
      n.filter(col("n_regionkey") < 2).write.mode("append").parquet(out)
      n.filter(col("n_regionkey") >= 2).write.mode("append").parquet(out)
      s.read.parquet(out).orderBy(col("n_nationkey"))
    }),
    "s7_overwrite_saveastable" -> ((s, dir) => {
      s.sql("CREATE DATABASE IF NOT EXISTS graft")
      dropManaged(s, "graft", "region_cat")
      val r = table(s, dir, "region")
      r.limit(2).write.mode("overwrite").saveAsTable("graft.region_cat")
      r.write.mode("overwrite").saveAsTable("graft.region_cat")
      s.table("graft.region_cat").orderBy(col("r_regionkey"))
    }),
    "s8_scd1_upsert" -> ((s, dir) => {
      // J3+S8: SCD1 merge on a single key; overlap [10,20) must take the
      // source's (fresh) value, [0,10) keeps target, [20,25) inserted.
      val n = table(s, dir, "nation")
      val target = n.filter(col("n_nationkey") < 20)
        .select(col("n_nationkey").as("k"), concat(col("n_name"), lit("_old")).as("name"))
      val source = n.filter(col("n_nationkey") >= 10)
        .select(col("n_nationkey").as("k"), col("n_name").as("name"))
      Scd1Merge.merge(target, source, Seq("k")).orderBy(col("k"))
    }),
    "s9_s10_catalog_ddl_probe" -> ((s, dir) => {
      s.sql("CREATE DATABASE IF NOT EXISTS graft_ddl")
      dropManaged(s, "graft_ddl", "probe")
      val before = s.catalog.tableExists("graft_ddl.probe")
      table(s, dir, "region").write.mode("overwrite").saveAsTable("graft_ddl.probe")
      val after = s.catalog.tableExists("graft_ddl.probe")
      val dbExists = s.catalog.databaseExists("graft_ddl")
      s.range(1).select(
        lit(dbExists).as("db_exists"),
        lit(before).as("exists_before"),
        lit(after).as("exists_after"))
    }),
    "s11_watermark_state" -> ((s, dir) => {
      // Dedicated S11 row: init -> read -> advance -> read, and the
      // monotonicity guard rejects a regression (WatermarkStore doc).
      val store = new WatermarkStore(tmpDir("graft_wmstate"))
      store.init("DT00000")
      val initial = store.read()
      store.advance("DT00042")
      val advanced = store.read()
      val rejected =
        try { store.advance("DT00001"); false }
        catch { case _: IllegalArgumentException => true }
      s.range(1).select(
        lit(initial).as("initial"),
        lit(advanced).as("advanced"),
        lit(store.read()).as("after_reject"),
        lit(rejected).as("regression_rejected"))
    }),
    "s12_scalar_collect" -> ((s, dir) => {
      // A3/S12: a deliberate 1-row driver barrier feeding a literal back
      // into the plan (ref gold_dim_branch.py:128).
      val maxKey = RelOps.maxKeyScalar(table(s, dir, "orders"), "o_orderkey", 0L)
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") === lit(maxKey))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_linenumber"))
    }),

    "s13_schema_evolution" -> ((s, dir) => {
      // Delta mergeSchema parity: a later batch ADDS a column (only its
      // touched buckets rewrite; readTable null-fills older rows), and
      // a third batch WIDENS a measure int→long (Delta type-widening
      // parity, r9 ask #8): the touched buckets rewrite wide, the
      // untouched buckets keep their narrow files, and the manifest's
      // widened map lets every reader present one BIGINT column over
      // the mixed files (mergedRead). WideningSpec pins the mechanics
      // (old buckets readable, snapshots narrow, key widening
      // rejected); the judged frame carries the widened value range a
      // 32-bit pop could not hold.
      val n = table(s, dir, "nation")
      val path = tmpDir("graft_evo") + "/dim"
      Scd1Merge.upsert(s, path,
        n.select(col("n_nationkey").as("k"), col("n_name").as("name"),
          col("n_regionkey").cast("int").as("pop")),
        Seq("k"), numBuckets = 4)
      val batch = n.filter(col("n_nationkey") < 5)
        .select(col("n_nationkey").as("k"),
          concat(col("n_name"), lit("_v2")).as("name"),
          col("n_regionkey").cast("int").as("pop"),
          col("n_regionkey").cast("long").as("region"))
      Scd1Merge.upsert(s, path, batch, Seq("k"), evolveSchema = true)
      val widen = n.filter(col("n_nationkey") >= 20)
        .select(col("n_nationkey").as("k"), col("n_name").as("name"),
          (col("n_regionkey").cast("long") + lit(10000000000L)).as("pop"))
      Scd1Merge.upsert(s, path, widen, Seq("k"), evolveSchema = true)
      Scd1Merge.readTable(s, path).orderBy(col("k"))
    }),

    // ---- P: projections / derived columns ------------------------------
    "p1_projection" -> ((s, dir) =>
      table(s, dir, "customer").select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),
    "p2_qualified_select" -> ((s, dir) => {
      // Both sides share the column name `custkey`; DF-qualified columns
      // resolve the ambiguity (ref gold_dim_branch.py:79).
      val o = table(s, dir, "orders").withColumnRenamed("o_custkey", "custkey")
      val c = table(s, dir, "customer").withColumnRenamed("c_custkey", "custkey")
      o.join(c, o("custkey") === c("custkey"), "inner")
        .select(o("o_orderkey"), o("custkey"), c("c_name"))
        .orderBy(o("o_orderkey"))
    }),
    "p3_split_derive" -> ((s, dir) =>
      RelOps.deriveSplitHead(table(s, dir, "part"), "p_type", " ", "category")
        .select(col("p_partkey"), col("category")).orderBy(col("p_partkey"))),
    "p4_ratio_derive" -> ((s, dir) =>
      RelOps.deriveRatio(table(s, dir, "part"), "p_retailprice", "p_size", "price_per_size")
        .select(col("p_partkey"), col("price_per_size")).orderBy(col("p_partkey"))),
    "p5_lit_add" -> ((s, dir) =>
      table(s, dir, "orders")
        .select(col("o_orderkey"), (col("o_orderkey") + lit(1000000L)).as("shifted_key"))
        .orderBy(col("o_orderkey"))),
    "p6_lit_alias" -> ((s, dir) =>
      table(s, dir, "nation").select(lit(1L).as("one"), col("n_name"))
        .orderBy(col("n_name"))),
    "p7_drop" -> ((s, dir) =>
      RelOps.dropCols(table(s, dir, "customer"), "c_acctbal", "c_mktsegment")
        .orderBy(col("c_custkey"))),

    "p8_agg_alias" -> ((s, dir) =>
      // Dedicated P8 row: alias inside agg (ref silver_notebook.py:48).
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg((sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"))
        .orderBy(col("l_returnflag"))),

    // ---- F: filters -----------------------------------------------------
    "f1_empty_schema" -> ((s, dir) =>
      RelOps.emptyWithSchema(
        table(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus")))),
    "f2_isnotnull_old" -> ((s, dir) => {
      val (old, _) = custSplit(s, dir)
      old.orderBy(col("c_custkey"))
    }),
    "f3_isnull_new" -> ((s, dir) => {
      val (_, fresh) = custSplit(s, dir)
      fresh.orderBy(col("c_custkey"))
    }),
    "f4_sql_string_filter" -> ((s, dir) =>
      table(s, dir, "orders")
        .filter("o_totalprice > 150000.0 AND o_orderstatus = 'O'")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))),
    "f5_watermark_range" -> ((s, dir) =>
      table(s, dir, "orders")
        .filter(col("o_orderdate") > to_timestamp(lit("1996-12-31 00:00:00")) &&
                col("o_orderdate") <= to_timestamp(lit("1997-12-31 00:00:00")))
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"))
        .orderBy(col("o_orderkey"))),

    "f6_null_handling" -> ((s, dir) =>
      // null plumbing: a derived nullable column through coalesce /
      // nullif / null-aware CASE — the ops every null-attr dim needs
      table(s, dir, "orders")
        .withColumn("maybe_price",
          when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_totalprice")))
        .select(col("o_orderkey"),
          coalesce(col("maybe_price"), lit(-1.0)).as("price_or_default"),
          nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
          col("maybe_price").isNull.as("is_open"))
        .orderBy(col("o_orderkey"))),
    "p9_date_funcs" -> ((s, dir) =>
      // calendar battery over the watermark column: extract parts,
      // shift, diff, truncate — all pushed-down-friendly projections
      table(s, dir, "orders")
        .withColumn("o_date", to_date(col("o_orderdate")))
        .select(col("o_orderkey"),
          year(col("o_date")).as("y"),
          month(col("o_date")).as("m"),
          dayofmonth(col("o_date")).as("d"),
          date_add(col("o_date"), 30).as("plus30"),
          datediff(to_date(lit("1998-12-31")), col("o_date")).as("days_to_end"),
          trunc(col("o_date"), "month").as("month_start"))
        .orderBy(col("o_orderkey"))),
    "p10_string_funcs" -> ((s, dir) =>
      // string battery: case, slicing, padding, regex extraction,
      // search — the silver-transform toolkit beyond split-head
      table(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          substring(col("p_name"), 1, 8).as("name_head"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
          regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("type_head"),
          instr(col("p_name"), "o").cast("int").as("first_o"),
          length(col("p_name")).as("name_len"))
        .orderBy(col("p_partkey"))),

    // ---- J: joins -------------------------------------------------------
    "j1_left_outer" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .select(c("c_custkey"), c("c_name"), n("n_name"))
        .orderBy(c("c_custkey"))
    }),
    "j2_4way_join" -> ((s, dir) => {
      // Fact FK resolution (ref gold_fact.py:34-38): chain of left joins,
      // small dims broadcast, the orders side a shuffle join.
      val l = table(s, dir, "lineitem")
      val p = table(s, dir, "part")
      val sup = table(s, dir, "supplier")
      val n = table(s, dir, "nation")
      val o = table(s, dir, "orders")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"), "left")
        .join(o, col("l_orderkey") === col("o_orderkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("p_name"), col("s_name"), col("n_name"), col("o_orderstatus"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "j3_surrogate_merge" -> ((s, dir) => {
      // Dedicated J3 row: SCD1 merge keyed on the SURROGATE key (quirk
      // Q3), one batch carrying both attribute updates for existing keys
      // and brand-new keys — through the durable bucketed upsert (not
      // just the in-memory merge), then read back from the table dir.
      val n = table(s, dir, "nation")
      val dim = n.select((col("n_nationkey") + lit(2L)).as("dim_key"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val path = tmpDir("graft_j3") + "/dim"
      Scd1Merge.upsert(s, path, dim, Seq("dim_key"))
      val batch = n.filter(col("n_nationkey") % 5 === 0)
        .select((col("n_nationkey") + lit(2L)).as("dim_key"),
          concat(col("n_name"), lit("_v2")).as("name"),
          col("n_regionkey").as("region"))
        .unionByName(n.filter(col("n_nationkey") < 3)
          .select((col("n_nationkey") + lit(100L)).as("dim_key"),
            concat(col("n_name"), lit("_new")).as("name"),
            col("n_regionkey").as("region")))
      Scd1Merge.upsert(s, path, batch, Seq("dim_key"))
      Scd1Merge.readTable(s, path).orderBy(col("dim_key"))
    }),
    "j4_composite_merge" -> ((s, dir) => {
      // S8 on a 4-column composite key (ref gold_fact.py:56-59):
      // re-ingested rows overwrite measures for the same key tuple
      // (quirk Q8).
      val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      val l = table(s, dir, "lineitem")
        .select((keys :+ "l_quantity").map(col): _*)
      val source = l.filter(col("l_orderkey") % 10 === 0)
        .withColumn("l_quantity", col("l_quantity") + 100.0)
      Scd1Merge.merge(l, source, keys)
        .orderBy(keys.map(col): _*)
    }),

    "j8_bucketed_join" -> ((s, dir) => {
      // co-located join via bucketed tables (the brief's "bucketing for
      // co-located joins"): both sides bucketBy the join key with the
      // same count, so the SortMergeJoin reads bucket-aligned files
      // with NO shuffle on either side (PlanSpec pins the plan shape;
      // at 100 TB this is the difference between a join that moves
      // 100 TB and one that moves nothing)
      s.sql("CREATE DATABASE IF NOT EXISTS graft")
      dropManaged(s, "graft", "orders_bkt")
      dropManaged(s, "graft", "customer_bkt")
      table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft.orders_bkt")
      table(s, dir, "customer").select(col("c_custkey"), col("c_name"))
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft.customer_bkt")
      s.table("graft.orders_bkt")
        .join(s.table("graft.customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
        .orderBy(col("o_orderkey"))
    }),
    "j10_full_outer" -> ((s, dir) =>
      // FULL OUTER: the reconciliation-join shape — BOTH null-extended
      // legs provably fire (orders restricted to custkey > 300 vs
      // customers <= 500: matched 301-500, order-side-unmatched > 500,
      // customer-side-unmatched <= 300); one shuffle.
      table(s, dir, "orders")
        .filter(col("o_custkey") > 300)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, dir, "customer")
            .filter(col("c_custkey") <= 500)
            .select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"), "full_outer")
        .orderBy(col("o_orderkey"), col("c_custkey"))),
    "j12_bloom_prune" -> ((s, dir) => {
      // bloom-pruned join (BloomJoin Scaladoc): lineitem probes a
      // bloom sketch of the URGENT orders' keys BEFORE its shuffle —
      // the regime where the build side's key set out-sizes a
      // broadcast hash relation but its sketch is ~MBs. Result ≡ the
      // plain join by construction (false positives die in the exact
      // join); the oracle derives it that way. Exact-cents revenue.
      val urgent = table(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_returnflag"),
          col("l_extendedprice"))
      graft.ops.BloomJoin.bloomPrunedJoin(li, urgent, Seq("o_orderkey"),
          expectedItems = 10000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          graft.Tables.sumMoney(col("l_extendedprice")).as("revenue"))
        .orderBy(col("l_returnflag"))
    }),
    "j9_range_join" -> ((s, dir) => {
      // interval join via BIN-BUCKETED equi-join (RangeJoin.binned):
      // orders matched to OVERLAPPING price bands — the naive theta
      // join is O(|L|x|R|) nested-loop/cartesian; binning quantizes
      // the value domain so only bin-colocated candidates materialize,
      // shuffle-parallel like any equi-join, exact predicate re-check.
      val bands = table(s, dir, "region").select(
        col("r_regionkey").as("band_id"),
        (col("r_regionkey") * 100000.0).as("lo"),
        (col("r_regionkey") * 100000.0 + 150000.0).as("hi"))
      graft.ops.RangeJoin.binned(
          table(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
          "o_totalprice", bands, "lo", "hi", binWidth = 50000.0)
        .select(col("o_orderkey"), col("band_id"), col("o_totalprice"))
        .orderBy(col("o_orderkey"), col("band_id"))
    }),
    "j6_semi_join" -> ((s, dir) =>
      // left-semi: customers with at least one open order — the EXISTS
      // shape (one shuffle, no row multiplication, left columns only)
      table(s, dir, "customer").join(
          table(s, dir, "orders").filter(col("o_orderstatus") === "O")
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),
    "j7_anti_join" -> ((s, dir) =>
      // left-anti: customers with NO orders at all — the NOT EXISTS
      // shape (null-safe by construction, unlike NOT IN)
      table(s, dir, "customer").join(
          table(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // ---- U2/U3: set ops beyond positional union -------------------------
    "u2_except" -> ((s, dir) =>
      table(s, dir, "customer").select(col("c_custkey"))
        .except(table(s, dir, "orders").select(col("o_custkey").as("c_custkey")))
        .orderBy(col("c_custkey"))),
    "u3_intersect" -> ((s, dir) =>
      table(s, dir, "customer").select(col("c_custkey"))
        .intersect(table(s, dir, "orders").select(col("o_custkey").as("c_custkey")))
        .orderBy(col("c_custkey"))),

    // ---- A: aggregations ------------------------------------------------
    "a1_groupby_sum" -> ((s, dir) =>
      // The flagship silver ad-hoc aggregate (ref silver_notebook.py:47-50).
      // Money sums run on exact integer cents — see Tables.sumMoney.
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),
    "a2_dup_audit" -> ((s, dir) =>
      RelOps.dupAudit(table(s, dir, "orders"), Seq("o_custkey"))
        .withColumnRenamed("count", "cnt")
        .orderBy(col("o_custkey"))),
    "a3_global_max" -> ((s, dir) =>
      table(s, dir, "orders").agg(max(col("o_orderkey")).as("max_key"))),
    "a4_global_min" -> ((s, dir) =>
      table(s, dir, "orders").agg(to_date(min(col("o_orderdate"))).as("min_date"))),
    "a5_distinct" -> ((s, dir) =>
      table(s, dir, "customer").select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))),

    "a14_grouping_sets" -> ((s, dir) => {
      // arbitrary GROUPING SETS + grouping() markers — the general form
      // rollup/cube specialize, with subtotal-NULL disambiguated from
      // data-NULL by the grouping flags
      table(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
              |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
              |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
              |  count(*) AS n
              |FROM orders_gs
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST,
              |  g_status, g_prio""".stripMargin)
    }),
    "a13_stats" -> ((s, dir) =>
      // statistical aggregate family. Floating summation order differs
      // between Spark's partition-parallel partials and DuckDB's serial
      // fold, so moments agree only to ~1e-11 relative — both sides
      // round to 4 decimals (same guard as the money-cents rule: make
      // the compared value independent of partitioning).
      table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(avg(col("o_totalprice")), 4).as("avg_price"),
          round(stddev_samp(col("o_totalprice")), 4).as("sd_price"),
          round(var_samp(col("o_totalprice")), 4).as("var_price"),
          round(corr(col("o_totalprice"), col("o_custkey")), 4).as("corr_pc"))
        .orderBy(col("o_orderstatus"))),
    "a9_percentile" -> ((s, dir) =>
      // EXACT percentiles (sort-based Percentile agg, not the GK
      // sketch): computed over integer cents so the interpolation
      // arithmetic (a + (b-a)·f on exact integers-as-doubles) is
      // bit-identical to DuckDB's quantile_cont
      table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          (expr("percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)") / 100.0)
            .as("p50"),
          (expr("percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.9)") / 100.0)
            .as("p90"))
        .orderBy(col("o_orderstatus"))),
    "a20_approx_quantile" -> ((s, dir) => {
      // approx_percentile (Greenwald–Khanna sketch, mergeable — the
      // 100 TB quantile path where a9's exact sort-based percentile
      // stops scaling): accuracy 100 guarantees rank error ≤ n/100.
      // The ESTIMATE is partitioning-dependent (merge order), so the
      // judged row is the GUARANTEE, not the value: exact rank of each
      // estimate (one conditional-agg pass) vs the bound — a pinned
      // boolean oracle, spec-swept in ApproxSpec (the a7/recall
      // posture). Driver collects 3 doubles — sketch-sized, never
      // data-sized.
      val ps = Seq(0.5, 0.9, 0.99)
      val o = table(s, dir, "orders").select(col("o_totalprice").as("x"))
      val vs = o.agg(expr(
          s"approx_percentile(x, array(${ps.mkString(", ")}), 100)").as("vs"))
        .head.getSeq[Double](0)
      val cnts = (count(lit(1)).as("n") +:
        ps.zip(vs).map { case (p, v) =>
          sum(when(col("x") <= v, 1L).otherwise(0L)).as(s"r_$p") })
      val r = o.agg(cnts.head, cnts.tail: _*).head
      val n = r.getLong(0)
      import s.implicits._
      ps.zipWithIndex.map { case (p, i) =>
          (p, math.abs(r.getLong(i + 1) - p * n) <= n / 100.0 + 1) }
        .toDF("p", "within_bound").orderBy(col("p"))
    }),
    "a16_outlier_iqr" -> ((s, dir) => {
      // IQR outlier screen (Tukey fences) per status: exact-cents
      // quantiles (bit-identical interpolation, the a9 argument), 1.5×
      // fences, then a broadcast join back for the flag counts — the
      // data-profiling gate a training pipeline runs on numeric
      // columns. Two passes, both map-side-combinable; the stats side
      // is group-cardinality-sized.
      val o = table(s, dir, "orders").select(col("o_orderstatus").as("st"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      val stats = o.groupBy(col("st")).agg(
          expr("percentile(c, 0.25)").as("q1"),
          expr("percentile(c, 0.75)").as("q3"))
        .select(col("st"), col("q1"), col("q3"),
          (col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lo"),
          (col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("hi"))
      val counts = o.join(broadcast(stats), "st")
        .groupBy(col("st"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c") < col("lo") || col("c") > col("hi"), 1L)
            .otherwise(0L)).as("n_out"))
      stats.join(counts, "st")
        .select(col("st"), (col("q1") / 100.0).as("q1"), (col("q3") / 100.0).as("q3"),
          (col("lo") / 100.0).as("lo"), (col("hi") / 100.0).as("hi"),
          col("n"), col("n_out"))
        .orderBy(col("st"))
    }),
    "a17_histogram" -> ((s, dir) =>
      // equi-width histogram (20 × 30k bins, top bin clamped) — the
      // profiling staple; one hash-agg, bin arithmetic is a single
      // deterministic floor-divide.
      table(s, dir, "orders")
        .select(least(floor(col("o_totalprice") / lit(30000.0)), lit(19L)).as("bin"),
          col("o_totalprice"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("bin"))),
    "a10_pivot" -> ((s, dir) =>
      // pivot: order counts per (priority, status) as a wide table —
      // compiles to a single Expand-free conditional aggregation
      table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot(col("o_orderstatus"), Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))),
    "a11_cube" -> ((s, dir) =>
      // CUBE: all 4 grouping combinations in one Expand-based pass
      table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),
    "a24_sketch_rollup" -> ((s, dir) => {
      // REAGGREGABLE distinct-count sketches (DataSketches HLL — the
      // 100 TB cube answer): per-status sketches, grand total from the
      // sketch UNION, never a recount of the base — the merge is the
      // whole point (pre-aggregated sketch tables roll up to any
      // grouping). Deterministic (hash-based, order-independent);
      // estimates pinned in the oracle, ApproxSpec holds the
      // error-vs-exact bound and pins union-vs-direct drift ≤1%.
      val o = table(s, dir, "orders")
      val per = o.groupBy(col("o_orderstatus"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      per.select(col("o_orderstatus"),
          hll_sketch_estimate(col("sk")).as("approx_cust"))
        .unionByName(per.agg(hll_union_agg(col("sk")).as("u"))
          .select(lit("ALL").as("o_orderstatus"),
            hll_sketch_estimate(col("u")).as("approx_cust")))
        .orderBy(col("o_orderstatus"))
    }),
    "a23_regression_slope" -> ((s, dir) => {
      // per-group OLS trend (price drift per priority class): slope
      // from the five CLOSED-FORM sums — n, Σx, Σy, Σxy, Σx² — each an
      // EXACT integer aggregate (days × cents), combined by one final
      // double formula written identically in the oracle, so partition
      // order can't move a bit. Every sum casts to double BEFORE the
      // combination: n·Σxy overflows int64 already at sf0.1 (the
      // error-honest bench caught it), while the double path is exact
      // until the sums themselves pass 2^53; past that scale the same
      // shape runs on per-partition Welford/decimal accumulators.
      val o = table(s, dir, "orders")
        .select(col("o_orderpriority"),
          datediff(to_date(col("o_orderdate")),
            to_date(lit("1992-01-01"))).cast("long").as("x"),
          cents(col("o_totalprice")).as("y"))
      o.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("o_orderpriority"), col("n"),
          ((col("n").cast("double") * col("sxy").cast("double")
             - col("sx").cast("double") * col("sy").cast("double")) /
           (col("n").cast("double") * col("sxx").cast("double")
             - col("sx").cast("double") * col("sx").cast("double")))
            .as("slope_cents_per_day"))
        .orderBy(col("o_orderpriority"))
    }),
    "a22_mode" -> ((s, dir) => {
      // per-group MODE (most frequent value, ties → smallest value):
      // phase 1 is one map-side-combinable hash-agg over (group, value)
      // — the only pass that sees data-sized input; phase 2 picks the
      // argmax over the tiny (groups × distinct-values) count table via
      // one struct-max agg (count, reverse-rank proxy): no window, no
      // second shuffle of the base data. The tie-break rides the same
      // struct compare by negating on the count and using min on the
      // value via a two-level max_by.
      val counts = table(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
      counts
        .groupBy(col("o_orderstatus"))
        // min_by on (−cnt, value): the struct compares field-wise, so
        // this is argmax-count with ties going to the smallest value —
        // one agg, no window.
        .agg(min_by(col("o_orderpriority"),
          struct((-col("cnt")).as("neg"), col("o_orderpriority").as("v")))
          .as("mode_priority"))
        .orderBy(col("o_orderstatus"))
    }),
    "a8_rollup" -> ((s, dir) =>
      // hierarchical subtotals (Expand-based plan); money on exact cents
      table(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg((sum(cents(col("o_totalprice"))) / 100.0).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // ---- W/O/U: windows, sort, union -----------------------------------
    "w1_rownumber_keys" -> ((s, dir) =>
      // Fidelity-mode surrogate keys: base=1 on initial load so keys
      // start at 2 (quirk Q4).
      KeyGenStrategy.GlobalWindow
        .assign(table(s, dir, "nation").select(col("n_nationkey"), col("n_name")),
          "n_name", "dim_key", 1L)
        .select(col("dim_key"), col("n_nationkey"), col("n_name"))
        .orderBy(col("dim_key"))),
    "w1_scalable_keys" -> ((s, dir) =>
      // Scale-mode surrogate keys: identical output to w1_rownumber_keys'
      // strategy but numbered per-partition with prefix-sum offsets.
      KeyGenStrategy.Scalable
        .assignPartitioned(table(s, dir, "customer").select(col("c_custkey"), col("c_name")),
          "c_name", "dim_key", 1L)
        .select(col("dim_key"), col("c_custkey"), col("c_name"))
        .orderBy(col("dim_key"))),
    "w2_mono_id_structural" -> ((s, dir) => {
      // monotonically_increasing_id keys are layout-dependent (quirk Q4):
      // judged structurally — n_keys must equal n_rows.
      val keyed = KeyGenStrategy.MonotonicId
        .assign(table(s, dir, "supplier").select(col("s_suppkey")), "s_suppkey", "k", 0L)
      keyed.agg(count(lit(1)).as("n_rows"), countDistinct(col("k")).as("n_keys"))
    }),
    "w3_running_sum" -> ((s, dir) =>
      // per-customer running money total, ordered by (date, key) so the
      // frame is total-ordered; cents keep the sum exact
      table(s, dir, "orders")
        .withColumn("o_date", to_date(col("o_orderdate")))
        .withColumn("run_total",
          (sum(cents(col("o_totalprice")))
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("o_custkey"))
              .orderBy(col("o_date"), col("o_orderkey"))
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                org.apache.spark.sql.expressions.Window.currentRow)) / 100.0))
        .select(col("o_orderkey"), col("o_custkey"), col("run_total"))
        .orderBy(col("o_orderkey"))),
    "w4_lag_lead" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("o_date"), col("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("o_date", to_date(col("o_orderdate")))
        .select(col("o_orderkey"), col("o_custkey"),
          lag(col("o_date"), 1).over(w).as("prev_date"),
          lead(col("o_date"), 1).over(w).as("next_date"))
        .orderBy(col("o_orderkey"))
    }),
    "w5_rank_ntile" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("o_orderkey"))
    }),
    "w9_range_frame" -> ((s, dir) => {
      // RANGE-frame window (the value-distance frame class, distinct
      // from every ROWS frame already judged): per customer, a rolling
      // 30-day revenue sum keyed by ORDER DATE distance — RANGE frames
      // include peers (same-day orders see the same sum), which no
      // ROWS frame can express. Day = integer epoch-days and money =
      // integer cents, so the rolling sum is bit-exact on both
      // engines. One window sort per customer partition.
      import org.apache.spark.sql.expressions.Window
      val o = table(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-30, 0)
      o.select(col("o_orderkey"), col("o_custkey"), col("day"),
          sum(col("cents")).over(w).as("cents_30d"))
        .orderBy(col("o_orderkey"))
    }),
    "w8_first_last" -> ((s, dir) => {
      // value-window family: first_value / last_value / nth_value. The
      // default window frame ends at CURRENT ROW, which makes
      // last_value degenerate (≡ current row) — both sides pin the
      // full-partition frame explicitly so the semantics judged are
      // the ones a user actually wants (cheapest/priciest/runner-up
      // order per customer). One window sort, three O(1) frame reads.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          first(col("o_orderkey")).over(w).as("cheapest_key"),
          last(col("o_orderkey")).over(w).as("priciest_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_cheapest_key"))
        .orderBy(col("o_orderkey"))
    }),
    "w7_percent_rank_cume" -> ((s, dir) => {
      // distribution window family: percent_rank / cume_dist — the
      // remaining ranking primitives (relative standing within a
      // group; both are rank arithmetic over the same single window
      // sort, no extra pass). Ratios are exact small-int divisions —
      // deterministic bit patterns on both engines.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("o_orderkey"))
    }),

    "s35_generated_columns" -> ((s, dir) => {
      // GENERATED COLUMNS (Delta parity): o_date / o_month are DEFINED
      // by expressions over o_orderdate — batch 1 supplies neither
      // (computed in-plan), batch 2 supplies o_date (validated
      // null-safely; a contradiction fails the batch — GeneratedSpec
      // pins the rejection). The table always satisfies the invariant,
      // so derived partition/stats columns can be trusted downstream.
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      val gen = Map(
        "o_date" -> to_date(col("o_orderdate")),
        "o_month" -> date_format(col("o_orderdate"), "yyyy-MM"))
      val path = tmpDir("graft_gen35") + "/t"
      Scd1Merge.upsertGenerated(s, path,
        o.filter(col("o_orderkey") % 2 === 0), Seq("o_orderkey"), gen)
      Scd1Merge.upsertGenerated(s, path,
        o.filter(col("o_orderkey") % 2 === 1)
          .withColumn("o_date", to_date(col("o_orderdate"))),
        Seq("o_orderkey"), gen)
      Scd1Merge.readTable(s, path)
        .select(col("o_orderkey"), col("o_date"), col("o_month"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),
    "w10_gap_fill" -> ((s, dir) => {
      // TIME-SERIES GAP FILL + FORWARD FILL (the warehouse
      // densification op): per-user hourly revenue series over each
      // user's own [min, max] hour span — `sequence` + explode
      // generates the grid (no driver loop, no cross join), a left
      // join marks the gaps, and `last(_, ignoreNulls)` over a
      // per-user ordered frame carries the previous hour's value
      // forward. Window is PARTITIONED by user — no global-window
      // single-partition hazard; output is O(users × span), the op's
      // inherent size. The oracle mirrors with generate_series +
      // last_value IGNORE NULLS.
      import org.apache.spark.sql.expressions.Window
      val e = s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val span = e.groupBy(col("user_id"))
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      val grid = span.select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("hour"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(e, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"),
          last(col("cents"), ignoreNulls = true).over(w).as("cents_filled"),
          col("cents").isNull.as("is_gap"))
        .orderBy(col("user_id"), col("hour"))
    }),
    "s39_deep_clone" -> ((s, dir) => {
      // DEEP CLONE (Delta full CLONE parity, the backup face of s29's
      // shallow): byte-copy the live state, then prove INDEPENDENCE —
      // the clone takes its own writes while the source is mutated
      // and vacuumed to live-only underneath it. A shallow clone
      // would be left with dangling links by that vacuum (its
      // documented retention contract); the deep clone reads its own
      // bytes. DeepCloneSpec pins no-symlinks, isolation in both
      // directions, and survival of a full source vacuum.
      val sup = table(s, dir, "supplier")
      val dim = sup.select(col("s_suppkey").as("k"),
        col("s_name").as("name"), col("s_acctbal").as("bal"))
      val base = tmpDir("graft_deep39")
      val srcT = base + "/src"; val dstT = base + "/backup"
      Scd1Merge.upsert(s, srcT, dim, Seq("k"), numBuckets = 4)
      Scd1Merge.upsert(s, srcT,
        dim.filter(col("k") % 4 === 0).withColumn("bal", col("bal") + 1.0),
        Seq("k"))
      Scd1Merge.cloneDeep(srcT, dstT)
      Scd1Merge.upsert(s, dstT,
        dim.filter(col("k") % 7 === 0)
          .withColumn("name", concat(col("name"), lit("_bk"))), Seq("k"))
      Scd1Merge.delete(s, srcT, Seq("k"), col("k") % 2 === 0)
      Scd1Merge.vacuum(srcT, retain = 0)
      Scd1Merge.readTable(s, dstT)
        .select(col("k"), col("name"), col("bal")).orderBy(col("k"))
    }),
    "s38_bloom_skipping" -> ((s, dir) => {
      // BLOOM FILE-SKIPPING (the point-lookup complement of s21's
      // min/max): a `bloom:`-tagged stats column writes a per-bucket
      // bloom bitmap at commit time, and equality probes veto buckets
      // whose bitmap provably never saw the literal's hash. The probe
      // column is md5(custkey) — uniformly distributed, so every
      // bucket's min/max RANGE covers every probe and range stats
      // prune NOTHING; the bloom turns the same point lookup into ~1
      // bucket read out of 8 (`bloom_pruned` witnesses lastPrune,
      // deterministic because the bitmaps are). At 100 TB this is the
      // needle-in-haystack dial: content-hash / id lookups on columns
      // a hash-bucketed layout cannot key-prune.
      val c = table(s, dir, "customer")
      val dim = c.select(col("c_custkey").as("k"), col("c_name"),
        md5(col("c_custkey").cast("string")).as("tag"))
      val path = tmpDir("graft_bloom38") + "/t"
      Scd1Merge.upsert(s, path, dim, Seq("k"), numBuckets = 8,
        statsColumns = Seq(Scd1Merge.BloomTag + "tag"))
      val hit = Scd1Merge.readTableWhere(s, path, col("tag") === md5(lit("73")))
        .select(col("k"), col("c_name"), col("tag"))
      val pruned = Scd1Merge.lastPrune._1 < Scd1Merge.lastPrune._2
      hit.withColumn("bloom_pruned", lit(pruned)).orderBy(col("k"))
    }),
    "s37_vacuum" -> ((s, dir) => {
      // VACUUM lifecycle (Delta VACUUM + retention parity): four
      // stamped commits retained at depth 5 give time travel to every
      // prior state; vacuum at retain=1 then reclaims the aged-out
      // snapshots' version dirs under the writer lock while the live
      // state and the 1-commit isolation window stay readable. The
      // judged output is the post-vacuum live state — reclamation must
      // be INVISIBLE to current readers; VacuumSpec pins the
      // reclamation itself (bytes actually freed, pre-retention
      // snapshots now fail loudly, retained ones byte-identical). At
      // 100 TB this is the storage-cost dial: retention is paid per
      // commit, vacuum is when you stop paying.
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"), col("n_name").as("name"))
      val path = tmpDir("graft_vac37") + "/t"
      Scd1Merge.upsert(s, path, dim, Seq("k"), numBuckets = 4,
        retainVersions = 5, batchId = "B1")
      Scd1Merge.upsert(s, path,
        dim.filter(col("k") % 5 === 0)
          .withColumn("name", concat(col("name"), lit("_v2"))),
        Seq("k"), retainVersions = 5, batchId = "B2")
      Scd1Merge.upsert(s, path,
        dim.filter(col("k") < 3).withColumn("k", col("k") + lit(100).cast("int")),
        Seq("k"), retainVersions = 5, batchId = "B3")
      Scd1Merge.deleteSoft(s, path, Seq("k"), col("k") % 3 === 0,
        retainVersions = 5)
      // the deep snapshot reads pre-vacuum, and the live + 1-back
      // isolation window must survive the vacuum itself
      assert(Scd1Merge.readTableAt(s, path, 3).count() == n.count(),
        "pre-vacuum: the commit-1 snapshot must be readable")
      Scd1Merge.vacuum(path, retain = 1)
      Scd1Merge.readTableAt(s, path, 1).count()
      Scd1Merge.readTable(s, path)
        .select(col("k"), col("name")).orderBy(col("k"))
    }),
    "s36_column_drop" -> ((s, dir) => {
      // COLUMN DROP lifecycle (Delta drop-without-rewrite parity, the
      // other half of column mapping): drop a column with ZERO data
      // movement (one manifest swap — DropSpec pins no dir churn, the
      // bytes still physically in the files, and the pre-drop snapshot
      // still SHOWING the column), then rename a survivor and merge a
      // batch speaking the narrowed post-rename schema. Re-adding the
      // dropped name is rejected until a rebucket frees it (DropSpec).
      val sup = table(s, dir, "supplier")
      val dim = sup.select(col("s_suppkey").as("k"),
        col("s_name").as("name"), col("s_nationkey").as("nation"),
        col("s_acctbal"))
      val path = tmpDir("graft_drop36") + "/t"
      Scd1Merge.upsert(s, path, dim, Seq("k"))
      Scd1Merge.dropColumn(s, path, "nation")
      Scd1Merge.renameColumn(s, path, "s_acctbal", "balance")
      val batch = sup.filter(col("s_suppkey") % 3 === 0)
        .select(col("s_suppkey").as("k"),
          concat(col("s_name"), lit("_v2")).as("name"),
          col("s_acctbal").as("balance"))
      Scd1Merge.upsert(s, path, batch, Seq("k"))
      Scd1Merge.readTable(s, path)
        .select(col("k"), col("name"), col("balance"))
        .orderBy(col("k"))
    }),
    "s34_column_rename" -> ((s, dir) => {
      // COLUMN MAPPING lifecycle (Delta rename-without-rewrite
      // parity): rename two columns — one of them the MERGE KEY —
      // with zero data movement (one manifest swap each; RenameSpec
      // pins no dir churn + physical names in files), then merge a
      // batch speaking the NEW names. The judged frame reads back
      // through the mapping.
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val path = tmpDir("graft_ren34") + "/t"
      Scd1Merge.upsert(s, path, dim, Seq("k"))
      Scd1Merge.renameColumn(s, path, "name", "label")
      Scd1Merge.renameColumn(s, path, "k", "nation_id")
      val batch = n.filter(col("n_nationkey") % 5 === 0)
        .select(col("n_nationkey").as("nation_id"),
          concat(col("n_name"), lit("_v2")).as("label"),
          col("n_regionkey").as("region"))
        .unionByName(n.filter(col("n_nationkey") < 3)
          .select((col("n_nationkey") + lit(100L)).cast("int").as("nation_id"),
            concat(col("n_name"), lit("_new")).as("label"),
            col("n_regionkey").as("region")))
      Scd1Merge.upsert(s, path, batch, Seq("nation_id"))
      Scd1Merge.readTable(s, path)
        .select(col("nation_id"), col("label"), col("region"))
        .orderBy(col("nation_id"))
    }),
    "s33_deletion_vectors" -> ((s, dir) => {
      // SOFT-DELETE lifecycle (Delta deletion-vector parity): a point
      // delete tombstones keys WITHOUT rewriting buckets (O(matched
      // keys), not O(buckets) — DvSpec pins zero dir churn), an upsert
      // RESURRECTS every 21st key (its tombstone clears), and
      // materializeDeletes folds the rest into the data (content
      // invariant). The judged frame is the final table. The fixture
      // slice is SF-capped (same review as s31): the op under test is
      // dv mechanics, not the initial table-load commit, so the
      // 4-commit lifecycle shouldn't scale its BENCH cost with the
      // customer row count.
      val c = table(s, dir, "customer")
        .filter(col("c_custkey") <= 2000)
        .select(col("c_custkey").as("k"), col("c_name").as("name"),
          col("c_acctbal"))
      val path = tmpDir("graft_dv33") + "/t"
      Scd1Merge.upsert(s, path, c, Seq("k"))
      Scd1Merge.deleteSoft(s, path, Seq("k"), col("k") % 7 === 0)
      Scd1Merge.upsert(s, path,
        c.filter(col("k") % 21 === 0)
          .withColumn("name", concat(col("name"), lit("_back"))), Seq("k"))
      Scd1Merge.materializeDeletes(s, path)
      Scd1Merge.readTable(s, path).orderBy(col("k"))
    }),
    "s31_compact_maintenance" -> ((s, dir) => {
      // compaction as a judged MAINTENANCE op: a bounded-file-size
      // commit (maxRecordsPerFile, what a real 100 TB writer sets)
      // fragments every bucket into many small files; compact
      // coalesces each fragmented bucket through the standard
      // crash-safe commit; the judged artifact is the content-identity
      // invariant. The conf is scoped and restored (no session leak).
      // The fixture slice is SF-capped so the planted fragmentation
      // (files ∝ rows/50) doesn't scale the BENCH cost with data
      // volume — the op under test is the commit machinery, not the
      // row count.
      val c = table(s, dir, "customer")
        .filter(col("c_custkey") <= 1000)
        .select(col("c_custkey").as("k"), col("c_name").as("name"),
          col("c_acctbal"))
      val path = tmpDir("graft_compact31") + "/t"
      val key = "spark.sql.files.maxRecordsPerFile"
      val prev = s.conf.getOption(key)
      // 4 explicit buckets + a 20-row file cap: ≥2 files per bucket
      // from sf0.001's 150 rows up — the fixture fragments at EVERY
      // judged/benched SF (32 default buckets at sf0.01 left buckets
      // under a 50-row cap and nothing fragmented)
      s.conf.set(key, "20")
      try Scd1Merge.upsert(s, path, c, Seq("k"), numBuckets = 4)
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
      val rewrote = Scd1Merge.compact(s, path)
      if (rewrote == 0) throw new IllegalStateException(
        "compaction fixture must fragment at least one bucket")
      Scd1Merge.readTable(s, path).orderBy(col("k"))
    }),
    "s32_history" -> ((s, dir) => {
      // DESCRIBE HISTORY parity: three stamped commits, then the
      // metadata-only commit log (commit, batch id, bucket counts) —
      // the audit surface a pipeline debugger reads before any data.
      // retainVersions=5 keeps all three in the log for the fixture;
      // production depth follows the table's retention dial.
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"), col("n_name").as("name"))
      val path = tmpDir("graft_hist32") + "/t"
      Scd1Merge.upsert(s, path, dim, Seq("k"), numBuckets = 4,
        retainVersions = 5, batchId = "B1")
      Scd1Merge.upsert(s, path,
        dim.filter(col("k") % 5 === 0)
          .withColumn("name", concat(col("name"), lit("_v2"))),
        Seq("k"), retainVersions = 5, batchId = "B2")
      Scd1Merge.upsert(s, path,
        dim.filter(col("k") < 3).withColumn("k", col("k") + lit(100).cast("int")),
        Seq("k"), retainVersions = 5, batchId = "B3")
      // commit_ts is wall time — projected out of the judged frame
      // (the cross-engine hash can't pin a clock); s40_time_travel_ts
      // judges the timestamps' RESOLUTION behavior instead
      Scd1Merge.history(s, path)
        .select(col("commit"), col("batch_id"), col("num_buckets"),
          col("n_live_buckets"))
        .orderBy(col("commit"))
    }),
    "sql_alter_restore" -> ((s, dir) => {
      // SQL DDL + RESTORE surface: ALTER TABLE RENAME COLUMN rides the
      // engine's column mapping (metadata-only — no data rewritten),
      // an UPDATE then mutates through the renamed schema, RESTORE TO
      // VERSION rolls the table back to the post-rename/pre-update
      // snapshot (Delta RESTORE parity — a new commit referencing the
      // retained versions), and DROP COLUMN narrows the logical view.
      // Final state: original names under the renamed label column,
      // region gone — all five statements pure SQL text.
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val path = graft.Tmp.dir("graft_sqlddl") + "/dim"
      Scd1Merge.upsert(s, path, dim, Seq("k"), numBuckets = 4)
      graft.sql.GraftSql.sql(s,
        s"ALTER TABLE graft.`$path` RENAME COLUMN name TO label")
      graft.sql.GraftSql.sql(s,
        s"UPDATE graft.`$path` SET label = 'CLOBBERED' WHERE k < 10")
      graft.sql.GraftSql.sql(s,
        s"RESTORE TABLE graft.`$path` TO VERSION AS OF 2")
      graft.sql.GraftSql.sql(s,
        s"ALTER TABLE graft.`$path` DROP COLUMN region")
      Scd1Merge.readTable(s, path).orderBy(col("k"))
    }),
    "sql_copy_into" -> ((s, dir) => {
      // COPY INTO — idempotent FILE-LEVEL ingest (Delta's statement;
      // the lakehouse spelling of the reference's watermark-directory
      // loop): the landing dir accumulates files across three runs —
      // run 1 loads the two staged files, a verbatim re-run loads
      // NOTHING (the loaded-files log), and after one more file lands
      // the third run loads exactly it. The in-row requires pin all
      // three file counts; rows ride the keyed upsert, so the crash
      // window between data commit and log append replays as a no-op.
      val o = table(s, dir, "orders")
      val fact = o.select(col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val root = graft.Tmp.dir("graft_copy")
      val in = java.nio.file.Paths.get(root, "in")
      java.nio.file.Files.createDirectories(in)
      def stage(df: DataFrame, name: String): Unit = {
        import scala.jdk.CollectionConverters._
        val t = java.nio.file.Paths.get(root, "stage_" + name)
        df.coalesce(1).write.parquet(t.toString)
        val part = graft.merge.FsList.list(t).iterator
          .find(_.getFileName.toString.endsWith(".parquet")).get
        java.nio.file.Files.move(part, in.resolve(name + ".parquet"))
      }
      def slice(lo: String, hi: String) =
        fact.filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      stage(slice("1995-01-01", "1995-03-01"), "f1")
      stage(slice("1995-03-01", "1995-04-01"), "f2")
      val t = root + "/t"
      Scd1Merge.upsert(s, t, fact.limit(0), Seq("o_orderkey"), numBuckets = 4)
      def copy(): (Long, Long) = {
        val r = graft.sql.GraftSql.sql(s,
          s"COPY INTO graft.`$t` FROM '$in' FILEFORMAT = PARQUET")
          .collect().head
        (r.getLong(0), r.getLong(1))
      }
      val r1 = copy(); val r2 = copy()
      stage(slice("1995-04-01", "1995-05-01"), "f3")
      val r3 = copy()
      require(r1._1 == 2 && r2 == ((0L, 0L)) && r3._1 == 1,
        s"COPY INTO file-level idempotence broken: $r1 / $r2 / $r3")
      Scd1Merge.readTable(s, t).orderBy(col("o_orderkey"))
    }),
    "sql_ctas_insert" -> ((s, dir) => {
      // SQL creation + write surface: CREATE GRAFT TABLE ... KEYS (...)
      // AS SELECT (the one graft-specific statement — merge keys are
      // create-time properties standard CTAS has no slot for), then
      // INSERT INTO ... BY NAME with keyed-upsert semantics (k>=15
      // rows replaced/inserted; a blind Delta-style append would break
      // the one-row-per-key invariant). BY NAME is the REQUIRED
      // opt-in spelling — plain INSERT INTO text is rejected loudly so
      // standard-SQL expectations are never silently diverged from.
      // The spec covers INSERT OVERWRITE and the exists/duplicate/
      // plain-INSERT rejections.
      val n = table(s, dir, "nation")
      n.createOrReplaceTempView("sql_ctas_nation")
      val path = graft.Tmp.dir("graft_sqlctas") + "/t"
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT TABLE graft.`$path` KEYS (k) BUCKETS 4 AS
           |SELECT n_nationkey AS k, n_name AS name, n_regionkey AS region
           |FROM sql_ctas_nation WHERE n_nationkey < 20""".stripMargin)
      graft.sql.GraftSql.sql(s,
        s"""INSERT INTO graft.`$path` BY NAME
           |SELECT n_nationkey AS k, concat(n_name, '_ins') AS name,
           |       n_regionkey AS region
           |FROM sql_ctas_nation WHERE n_nationkey >= 15""".stripMargin)
      Scd1Merge.readTable(s, path).orderBy(col("k"))
    }),
    "sql_catalog_persist" -> ((s, dir) => {
      // PERSISTENT CATALOG (the r10 verdict's "SQL catalog is
      // session-memory only" gap): table names and MV arming survive
      // a JVM restart. Session 1 registers a short name and CREATEs
      // an MV with a catalog root configured; the "restart" wipes
      // EVERY in-memory registry; session 2 then (a) resolves the
      // short name from the disk catalog and (b) runs a PLAIN
      // aggregate over the base that AUTO-ARMS the rewrite from the
      // catalog's MV inventory — no re-register, no REFRESH. In-row
      // requires pin both mechanisms (name resolution post-wipe, MV
      // files answering the fresh query, rewriteCount advancing); the
      // oracle recomputes the aggregate from the base content.
      import graft.plans.GraftMvRewrite
      import graft.sql.{GraftCatalog, GraftSql, GraftTables}
      val root = graft.Tmp.dir("graft_sqlcat")
      val base = root + "/base"; val mv = root + "/mv"
      GraftCatalog.setRoot(root + "/cat")
      try {
        val o = table(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4)
        GraftTables.register("catalog_orders", base)
        GraftSql.sql(s,
          s"CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS " +
          s"SELECT o_orderpriority, sum(cents) AS sum_cents, " +
          s"count(*) AS n_orders FROM graft.`$base` " +
          "GROUP BY o_orderpriority").collect()
        // ---- "JVM restart": wipe every in-memory registry
        GraftTables.clearMemory()
        GraftMvRewrite.clear()
        // (a) the short name resolves through the disk catalog
        val viaName = GraftSql.sql(s,
          "SELECT count(*) AS n FROM catalog_orders")
          .collect().head.getLong(0)
        require(viaName == o.count(), "disk-cataloged name must resolve")
        // (b) the plain aggregate auto-arms and answers from the MV
        val before = GraftMvRewrite.rewriteCount
        val q = GraftSql.sql(s,
          s"SELECT o_orderpriority, sum(cents) AS sum_cents, " +
          s"count(*) AS n_orders FROM graft.`$base` " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")
        val scans = q.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
        require(scans.nonEmpty && scans.forall(_.contains(mv + "/")),
          s"auto-armed MV must answer the post-restart query: $scans")
        require(GraftMvRewrite.rewriteCount > before,
          "rewriteCount must advance on the cross-session arm")
        q
      } finally {
        GraftTables.unregister("catalog_orders")
        GraftCatalog.clearRoot()
      }
    }),
    "sql_mv_lifecycle" -> ((s, dir) => {
      // SQL-ONLY MV LIFECYCLE: CREATE GRAFT MATERIALIZED VIEW
      // bootstraps the O(delta)-maintained aggregate (IncrementalAgg),
      // PERSISTS the definition (_graft_mv), and arms the transparent
      // query rewrite (GraftMvRewrite); the user's plain GROUP BY over
      // the 100 TB base then reads the MV — until a base commit the
      // MV has not folded, which routes the SAME query text back to
      // the base (fresh data beats fast data); REFRESH MATERIALIZED
      // VIEW folds the missed commit O(delta) and re-arms. In-row
      // requires pin the routing at each step; the oracle recomputes
      // the final answer from the base content, so a rewrite that
      // lied about values breaks the hash.
      val o = table(s, dir, "orders")
      o.createOrReplaceTempView("sql_mv_orders")
      val root = graft.Tmp.dir("graft_sqlmv")
      val base = root + "/fact"; val mv = root + "/mv"
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT TABLE graft.`$base` KEYS (o_orderkey) BUCKETS 4 AS
           |SELECT o_orderkey, o_orderpriority,
           |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |FROM sql_mv_orders WHERE o_orderkey % 3 != 0""".stripMargin)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 2 AS
           |SELECT o_orderpriority, sum(cents) AS sum_cents,
           |  count(*) AS n_orders
           |FROM graft.`$base` GROUP BY o_orderpriority""".stripMargin)
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def q(): DataFrame = graft.sql.GraftSql.sql(s,
        s"""SELECT o_orderpriority, sum(cents) AS sum_cents,
           |  count(*) AS n_orders
           |FROM graft.`$base`
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      require(scansOf(q()).forall(_.contains(mv + "/")),
        "a fresh CREATE must arm the rewrite")
      // late data: the %3 rows land (with a visible marker) — the MV
      // is now STALE and must not answer
      graft.sql.GraftSql.sql(s,
        s"""INSERT INTO graft.`$base` BY NAME
           |SELECT o_orderkey, o_orderpriority,
           |  CAST(round(o_totalprice * 100) AS BIGINT) + 50 AS cents
           |FROM sql_mv_orders WHERE o_orderkey % 3 = 0""".stripMargin)
      require(scansOf(q()).forall(_.contains(base + "/")),
        "a stale MV must route back to the base")
      val r = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect().head
      require(r.getLong(1) == 1L, s"refresh must fold exactly 1 commit: $r")
      val out = q()
      require(scansOf(out).forall(_.contains(mv + "/")),
        "a refreshed MV must answer again")
      out
    }),
    "sql_time_travel" -> ((s, dir) => {
      // SQL READ surface + time travel: graft relations resolve inside
      // plain SQL text (GraftDml.resolveRelations — SELECT, joins,
      // subqueries, MERGE sources all work), and `VERSION AS OF`
      // resolves the commit snapshot through the same retained-history
      // machinery as readTableAt. One statement unions the VERSION AS
      // OF 1 snapshot against the live table — the SQL spelling of the
      // s40 shape, judged against the same two-sided oracle. The spec
      // covers TIMESTAMP AS OF and the maintenance statements
      // (VACUUM/OPTIMIZE/DESCRIBE HISTORY).
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val path = graft.Tmp.dir("graft_sqltt") + "/dim"
      Scd1Merge.upsert(s, path, dim, Seq("k"), numBuckets = 4)
      Scd1Merge.upsert(s, path,
        dim.filter(col("k") % 5 === 0)
          .withColumn("name", concat(col("name"), lit("_v2"))),
        Seq("k"))
      graft.sql.GraftSql.sql(s,
        s"""SELECT k, name, region, 'asof' AS side FROM graft.`$path` VERSION AS OF 1
           |UNION ALL
           |SELECT k, name, region, 'live' AS side FROM graft.`$path`
           |ORDER BY side, k""".stripMargin)
    }),
    "s41_concurrent_upsert" -> ((s, dir) => {
      // OPTIMISTIC CONCURRENCY — two writers, one table, no lost
      // update and no spurious failure: writer B stages its merge
      // UNLOCKED against the snapshot manifest; inside B's window
      // writer A commits an upsert to DISJOINT buckets; B's commit
      // detects the intervening commit via the manifest's recorded
      // bucket footprint (touched= line), proves disjointness, and
      // REBASES onto A's manifest — both land, serialized as A then B
      // (commit numbers 2 and 3). The interleave is forced with the
      // engine's deterministic hook so the judged artifact is stable;
      // OptimisticConcurrencySpec drives the same machinery with real
      // parallel threads and pins the overlap/metadata conflict paths.
      // This is what lets compaction run beside ingest at 100 TB.
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val path = graft.Tmp.dir("graft_occ41") + "/dim"
      Scd1Merge.upsert(s, path, dim, Seq("k"), numBuckets = 4)
      // nationkeys 1 and 2 land in different buckets of 4 (pinned by
      // the same hash the engine buckets with)
      val aBatch = dim.filter(col("k") === 1)
        .withColumn("name", concat(col("name"), lit("_A")))
      val bBatch = dim.filter(col("k") === 2)
        .withColumn("name", concat(col("name"), lit("_B")))
      Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
        Scd1Merge.testHooks = Map.empty
        Scd1Merge.upsert(s, path, aBatch, Seq("k"))
      })
      try Scd1Merge.upsertConcurrent(s, path, bBatch, Seq("k"))
      finally Scd1Merge.testHooks = Map.empty
      if (!Scd1Merge.tableCommit(path).contains(3))
        throw new IllegalStateException(
          s"expected 3 commits (create, A, B-rebased), got ${Scd1Merge.tableCommit(path)}")
      Scd1Merge.readTable(s, path).orderBy(col("k"))
    }),
    "sql_partitioned" -> ((s, dir) => {
      // SQL surface over the PARTITIONED layout — a SQL-only user
      // runs the full two-level lifecycle: CREATE ... PARTITIONED BY
      // (the partition column is a merge key, enforced), INSERT BY
      // NAME routed per partition, UPDATE and DELETE that prune whole
      // partitions BY PATH before any child stats consult
      // (GraftSqlSpec pins lastPartitionPrune == 1/N for both), and
      // the read resolving through the same graft.`path` doorway.
      // SHOW PARTITIONS / dynamic INSERT OVERWRITE / the MERGE upsert
      // form are spec-covered.
      val o = table(s, dir, "orders")
      o.createOrReplaceTempView("sqlpart_orders")
      val path = graft.Tmp.dir("graft_sqlpart") + "/fact"
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT TABLE graft.`$path` KEYS (o_month, o_orderkey)
           |BUCKETS 2 PARTITIONED BY (o_month) AS
           |SELECT date_format(o_orderdate, 'yyyy-MM') AS o_month, o_orderkey,
           |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |FROM sqlpart_orders
           |WHERE o_orderdate >= DATE'1995-01-01' AND o_orderdate < DATE'1995-07-01'""".stripMargin)
      graft.sql.GraftSql.sql(s,
        s"""INSERT INTO graft.`$path` BY NAME
           |SELECT date_format(o_orderdate, 'yyyy-MM') AS o_month, o_orderkey,
           |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |FROM sqlpart_orders
           |WHERE o_orderdate >= DATE'1995-07-01' AND o_orderdate < DATE'1995-08-01'""".stripMargin)
      graft.sql.GraftSql.sql(s,
        s"UPDATE graft.`$path` SET cents = cents + 1 WHERE o_month = '1995-03'")
      graft.sql.GraftSql.sql(s,
        s"DELETE FROM graft.`$path` WHERE o_month = '1995-02' AND cents % 10 = 0")
      graft.sql.GraftSql.sql(s,
        s"SELECT o_month, o_orderkey, cents FROM graft.`$path` ORDER BY o_orderkey")
    }),
    "s48_multipart" -> ((s, dir) => {
      // MULTI-COLUMN partition layout: (month, priority-class) tuple
      // partitions over the orders fact — the composite layout a real
      // warehouse uses (date × tenant/class). Every DML statement
      // prunes by PATH on whatever SUBSET of the partition columns its
      // predicate pins: the priority-only UPDATE touches exactly the
      // four (month, '1') children; the fully-pinned DELETE touches
      // ONE of twenty. The in-row requires pin both prune fractions
      // against counts derived from the data itself (SF-independent);
      // PartitionedTableSpec pins routing, drift rejection and
      // per-tuple overwrite.
      import graft.merge.PartitionedTable
      val o = table(s, dir, "orders")
      val fact = o.select(
          date_format(col("o_orderdate"), "yyyy-MM").as("m"),
          substring(col("o_orderpriority"), 1, 1).as("prio"),
          col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("m").between("1995-01", "1995-04"))
      val path = graft.Tmp.dir("graft_part48") + "/fact"
      val keys = Seq("m", "prio", "o_orderkey")
      PartitionedTable.upsertMulti(s, path, fact, keys, Seq("m", "prio"),
        numBuckets = 2)
      val parts = fact.select("m", "prio").distinct().count().toInt
      val prio1 = fact.filter(col("prio") === "1")
        .select("m").distinct().count().toInt
      PartitionedTable.updateWhere(s, path, col("prio") === "1",
        Map("cents" -> (col("cents") + 1)))
      require(PartitionedTable.lastPartitionPrune == (prio1, parts),
        s"priority-only conjunct must prune by path to its slice: " +
        s"${PartitionedTable.lastPartitionPrune} vs ($prio1, $parts)")
      PartitionedTable.deleteWhere(s, path,
        col("m") === "1995-02" && col("prio") === "3" &&
          col("o_orderkey") % 2 === 0)
      require(PartitionedTable.lastPartitionPrune == (1, parts),
        "a fully-pinned tuple must prune to ONE partition")
      PartitionedTable.readTableWhere(s, path,
          col("m").between("1995-02", "1995-03"))
        .orderBy(col("o_orderkey"))
    }),
    "s47_describe_detail" -> ((s, dir) => {
      // DESCRIBE DETAIL (Delta's statement): ONE metadata row per
      // table answered ENTIRELY from manifests — layout, merge keys,
      // bucket/partition shape, exact row count via the
      // SupportsPushDownAggregates stats path, live constraints. At
      // 100 TB this is the difference between a catalog UI rendering
      // instantly and a full scan per table card. Judged frame:
      // the deterministic columns for a flat AND a partitioned
      // table (location/ts/bytes projected out — wall-clock and
      // encoder-version carriers, pinned instead by GraftSqlSpec).
      val n = table(s, dir, "nation")
      val flat = graft.Tmp.dir("graft_detail") + "/flat"
      Scd1Merge.upsert(s, flat,
        n.select(col("n_nationkey").as("k"), col("n_name").as("name")),
        Seq("k"), numBuckets = 3)
      Scd1Merge.addConstraint(s, flat, "kpos", "k >= 0")
      val o = table(s, dir, "orders")
      val part = graft.Tmp.dir("graft_detail") + "/part"
      graft.merge.PartitionedTable.upsert(s, part,
        o.select(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
          col("o_orderkey")).filter(col("o_month") < "1993-01"),
        Seq("o_month", "o_orderkey"), "o_month", numBuckets = 2)
      val cols = Seq("format", "merge_keys", "num_buckets",
        "partition_columns", "num_partitions", "num_rows", "constraints")
      graft.sql.GraftSql.sql(s, s"DESCRIBE DETAIL graft.`$flat`")
        .unionByName(graft.sql.GraftSql.sql(s, s"DESCRIBE DETAIL graft.`$part`"))
        .select(cols.map(col): _*)
        .orderBy(col("format"))
    }),
    "s46_constraints" -> ((s, dir) => {
      // CHECK CONSTRAINTS (Delta ALTER TABLE ADD CONSTRAINT parity):
      // data-quality enforcement at the COMMIT boundary. ADD validates
      // every existing row (one scan); after that every write
      // validates its own DELTA-SIZED batch — at 100 TB the thing
      // that must never rescan is the table, and it doesn't. One
      // violating row rejects the WHOLE batch before anything lands
      // (the in-row requires pin both the loud error and the
      // unchanged commit counter); valid upserts and a post-image-
      // validated UPDATE then proceed under the live constraint.
      // ConstraintsSpec pins NULL-passes, CDC-delete exemption,
      // concurrent-path enforcement, and the SQL statements.
      val n = table(s, dir, "nation")
      val path = graft.Tmp.dir("graft_constraints") + "/t"
      val base = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      Scd1Merge.upsert(s, path, base, Seq("k"), numBuckets = 2)
      Scd1Merge.addConstraint(s, path, "region_range", "region BETWEEN 0 AND 4")
      val before = Scd1Merge.tableCommit(path).get
      val rejected = try {
        Scd1Merge.upsert(s, path,
          base.limit(3).withColumn("region", lit(99).cast("int")), Seq("k"))
        false
      } catch {
        case e: IllegalStateException => e.getMessage.contains("region_range")
      }
      require(rejected, "a violating batch must reject loudly")
      require(Scd1Merge.tableCommit(path).contains(before),
        "a rejected batch must not commit")
      Scd1Merge.upsert(s, path,
        base.filter(col("k") < 3)
          .withColumn("name", concat(col("name"), lit("_v2"))), Seq("k"))
      Scd1Merge.update(s, path, Seq("k"), col("k") === 10,
        Map("region" -> lit(0).cast("int")))
      Scd1Merge.readTable(s, path).orderBy(col("k"))
    }),
    "s45_agg_pushdown" -> ((s, dir) => {
      // METADATA-ONLY AGGREGATES (DSv2 SupportsPushDownAggregates,
      // the JDBC-source interface answered from the MANIFEST): an
      // unfiltered COUNT(*)/MIN/MAX over a graft table resolves at
      // plan time from the per-bucket footer stats the commits
      // already recorded — ZERO data files read, at 100 TB a bare
      // count is a driver-side manifest read instead of a full scan.
      // The `require` pins that the plan really took the metadata
      // path (lastStatsAgg observability hook); GraftDsv2Spec pins
      // every conservative-bail face (filters, strings, deletion
      // vectors, grouping → real scan, same answers).
      val l = table(s, dir, "lineitem").filter(col("l_orderkey") <= 20000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
      val path = graft.Tmp.dir("graft_aggpush") + "/t"
      Scd1Merge.upsert(s, path, l, Seq("l_orderkey", "l_linenumber"),
        numBuckets = 8, statsColumns = Seq("l_quantity", "l_shipdate"))
      Scd1Merge.lastStatsAgg = None
      val r = s.read.format("graft").load(path).agg(
        count(lit(1)).as("cnt"),
        min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"),
        min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("min_sd"), max(col("l_shipdate")).as("max_sd"))
      r.queryExecution.executedPlan // force planning (pushdown decides here)
      require(Scd1Merge.lastStatsAgg.isDefined,
        "agg pushdown must answer from the manifest, not a scan")
      r
    }),
    "s44_dsv2_write" -> ((s, dir) => {
      // DATASOURCE V2 WRITE surface: the standard writer API drives
      // the full engine write path on a vanilla session —
      // `df.write.format("graft").option("keys",...).option(
      // "partitionBy",...).save` CREATES a partitioned graft table
      // (child commit protocol, parent pin swap), and a second
      // `mode("append")` batch lands as the KEYED UPSERT the graft
      // invariant requires (Hudi's documented append-as-upsert
      // posture for keyed tables): replaced keys replaced, new keys
      // inserted — including a brand-new partition. The read back is
      // the DSv2 scan. Must hash-match the pure-SQL merge oracle —
      // the writer API is a doorway, never a semantic.
      val c = table(s, dir, "customer")
      val b1 = c.filter(col("c_custkey") <= 500).select(
        col("c_mktsegment").as("seg"), col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      val path = graft.Tmp.dir("graft_dsv2w") + "/fact"
      b1.write.format("graft")
        .option("keys", "seg,k").option("buckets", "2")
        .option("partitionBy", "seg")
        .mode("append").save(path)
      val b2 = b1.filter(col("k") % 7 === 0)
        .withColumn("cents", col("cents") + 5)
        .unionByName(b1.filter(col("k") % 13 === 0).select(
          lit("SEG_NEW").as("seg"), (col("k") + 100000).as("k"),
          lit(4242L).as("cents")))
      b2.write.format("graft").mode("append").save(path)
      // round 11: the write path is a NATIVE BatchWrite (staged
      // UnsafeRow files → one engine commit — no V1 fallback), which
      // is what makes `writeTo(...).overwritePartitions()` plannable:
      // replace the SEG_NEW partition wholesale, others untouched
      graft.sql.GraftTables.register("s44_dsv2w", path)
      s.conf.set("spark.sql.catalog.gds44",
        classOf[graft.sources.GraftCatalog].getName)
      try {
        b1.filter(col("k") % 13 === 0).select(
          lit("SEG_NEW").as("seg"), (col("k") + 200000).as("k"),
          lit(777L).as("cents"))
          .writeTo("gds44.default.s44_dsv2w").overwritePartitions()
      } finally {
        graft.sql.GraftTables.unregister("s44_dsv2w")
        s.conf.unset("spark.sql.catalog.gds44")
      }
      s.read.format("graft").load(path)
        .select(col("seg"), col("k"), col("cents"))
        .orderBy(col("seg"), col("k"))
    }),
    "s43_dsv2_read" -> ((s, dir) => {
      // DATASOURCE V2 surface: the same dim read through Spark's
      // standard connector API — spark.read.format("graft").load —
      // on a vanilla session (TableProvider via META-INF/services,
      // execution through the V1Scan bridge, the JDBC-source
      // pattern). The filter pushes through the DSv2 scan into the
      // engine's manifest-level pruning (GraftDsv2Spec pins
      // lastPrune + the PushedFilters plan line); the projection
      // prunes columns before the scan materializes. Must hash-match
      // the plain relational oracle — DSv2 is a doorway, never a
      // semantic.
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val path = graft.Tmp.dir("graft_dsv2q") + "/dim"
      Scd1Merge.upsert(s, path, dim, Seq("k"), numBuckets = 4)
      s.read.format("graft").load(path)
        .filter(col("region") < 3 && col("k") >= 2)
        .select(col("k"), col("name"))
        .orderBy(col("k"))
    }),
    "s50_partitioned_cdf" -> ((s, dir) => {
      // CHANGE-DATA FEED over the PARTITIONED layout: the flat
      // table's tagged diff (s19) lifted through the parent pin set —
      // only partitions whose pinned child commit moved are read at
      // all. The lifecycle exercises every leg: an updated month
      // (update + update_preimage from the child's O(changed buckets)
      // diff), a NEW month partition (full snapshot as inserts), and
      // a month dropped by a metadata-only whole-partition drop
      // (containment-checked — surfaced as deletes so a downstream
      // consumer can apply it). Hidden month(o_orderdate)
      // partitioning: the feed machinery and the derived layout
      // compose. At 100 TB a parent commit touches O(few) partitions;
      // the feed reads exactly those.
      val o = table(s, dir, "orders")
      val fact = o.select(col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val path = graft.Tmp.dir("graft_cdf50") + "/fact"
      val keys = Seq("o_orderkey", "o_orderdate")
      import graft.merge.PartitionedTable
      def slice(lo: String, hi: String) =
        fact.filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      PartitionedTable.upsert(s, path, slice("1995-01-01", "1995-04-01"),
        keys, "month(o_orderdate)", numBuckets = 2)
      PartitionedTable.upsert(s, path,
        slice("1995-02-01", "1995-03-01").withColumn("cents", col("cents") + 1)
          .unionByName(slice("1995-04-01", "1995-05-01")),
        keys, "month(o_orderdate)")
      val nDropped = PartitionedTable.dropPartitionsWhere(s, path,
        col("o_orderdate") < "1995-02-01")
      require(nDropped == 1,
        s"expected to drop exactly the January partition, got $nDropped")
      PartitionedTable.readChanges(s, path, fromCommitsBack = 2)
        .orderBy(col("_change_type"), col("o_orderkey"))
    }),
    "s49_hidden_partitions" -> ((s, dir) => {
      // HIDDEN PARTITIONING (Iceberg-style derived partition columns):
      // the fact is partitioned by month(o_orderdate) — a TRANSFORM
      // of a merge key, with NO month column anywhere in the data —
      // and the user's plain date-range predicate prunes whole month
      // partitions by PATH (inclusive projection: the range overlaps
      // each month's half-open interval) before any stats/bloom
      // consult. s42's layout needed a materialized o_month column; a
      // 100 TB fact keyed (o_orderkey, o_orderdate) gets the same
      // layout from the date it already has — the in-row require pins
      // the scan to exactly the 3 predicate months out of the table's
      // full month inventory.
      val o = table(s, dir, "orders")
      val fact = o.select(col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val path = graft.Tmp.dir("graft_hp49") + "/fact"
      val keys = Seq("o_orderkey", "o_orderdate")
      graft.merge.PartitionedTable.upsert(s, path,
        fact.filter(col("o_orderdate") < "1996-01-01"), keys,
        "month(o_orderdate)", numBuckets = 2)
      // the incremental quarter lands three NEW month partitions
      graft.merge.PartitionedTable.upsert(s, path,
        fact.filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1996-04-01"), keys, "month(o_orderdate)")
      val pruned = graft.merge.PartitionedTable.readTableWhere(s, path,
        col("o_orderdate") >= "1995-05-01" &&
        col("o_orderdate") < "1995-08-01")
      val (kept, total) = graft.merge.PartitionedTable.lastPartitionPrune
      require(kept == 3 && total > 12,
        s"hidden partition pruning must confine the scan: $kept/$total")
      pruned.orderBy(col("o_orderkey"))
    }),
    "s53_partitioned_concurrent" -> ((s, dir) => {
      // OPTIMISTIC CONCURRENCY on the partitioned layout (the r10
      // verdict's #1 scale gap): a month-01 BACKFILL and a month-05
      // INGEST run CONCURRENTLY — the backfill stages its child
      // commit, and INSIDE its unlocked window the ingest stages AND
      // adopts a full parent commit; the backfill's adopt then
      // REBASES over the partition-disjoint intervening commit
      // instead of failing or silently losing it. In-row requires
      // pin the mechanism: the interleave actually happened (hook
      // fired), BOTH parent commits landed (commit advances by 2),
      // and every pin equals its child's live commit (no residue).
      // The oracle recomputes the serial outcome — a lost update on
      // either side breaks the hash.
      import graft.merge.{PartitionedTable, Scd1Merge}
      val o = table(s, dir, "orders")
      val fact = o.select(
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("o_month").between("1995-01", "1995-05"))
      val path = graft.Tmp.dir("graft_part53") + "/fact"
      val keys = Seq("o_month", "o_orderkey")
      PartitionedTable.upsert(s, path,
        fact.filter(col("o_month") <= "1995-04"), keys, "o_month",
        numBuckets = 2, retainVersions = 3)
      val backfill = fact.filter(col("o_month") === "1995-01")
        .withColumn("cents", col("cents") + 7)
      val ingest = fact.filter(col("o_month") === "1995-05")
      val interleaved = new java.util.concurrent.atomic.AtomicBoolean(false)
      Scd1Merge.testHooks = Map("p-optimistic-staged" -> { () =>
        // fires inside the BACKFILL's unlocked window, exactly once
        Scd1Merge.testHooks = Map.empty
        PartitionedTable.upsertConcurrent(s, path, ingest, keys, "o_month")
        interleaved.set(true)
      })
      try PartitionedTable.upsertConcurrent(s, path, backfill, keys,
        "o_month")
      finally Scd1Merge.testHooks = Map.empty
      require(interleaved.get(), "the ingest must commit mid-backfill")
      require(PartitionedTable.tableCommit(path).contains(3),
        s"create + ingest + rebased backfill = 3 parent commits, got " +
        s"${PartitionedTable.tableCommit(path)}")
      val pins = PartitionedTable.partitions(s, path).collect()
      require(pins.forall(r =>
          r.getAs[Int]("pinned_commit") == r.getAs[Int]("live_commit")),
        "every pin must equal its child's live commit (no residue)")
      PartitionedTable.readTable(s, path)
        .orderBy(col("o_orderkey"), col("o_month"))
    }),
    "s52_partition_evolution" -> ((s, dir) => {
      // PARTITION EVOLUTION (Iceberg's flagship, via SQL): the fact
      // starts month-partitioned (ingest-friendly: each batch touches
      // its month), then the access pattern shifts to key lookups and
      // the layout evolves to bucket(8, o_orderkey) — a FULL REWRITE
      // (the price every engine pays; Delta cannot do it in place at
      // all) landed in a fresh generation dir behind ONE atomic
      // parent swap. In-row requires pin the mechanism: the new
      // layout prunes a key-equality probe to ONE partition by PATH,
      // time travel ACROSS the evolution still serves the old pin
      // set, and ingest continues through the new spec. The oracle
      // recomputes the final content — a row lost or duplicated in
      // the rewrite breaks the hash.
      import graft.merge.PartitionedTable
      val o = table(s, dir, "orders")
      val fact = o.select(
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("o_month").between("1995-01", "1995-05"))
      val path = graft.Tmp.dir("graft_part52") + "/fact"
      val keys = Seq("o_month", "o_orderkey")
      PartitionedTable.upsert(s, path,
        fact.filter(col("o_month") <= "1995-04"), keys, "o_month",
        numBuckets = 2)
      val before = PartitionedTable.readTable(s, path).count()
      val nParts = graft.sql.GraftSql.sql(s,
        s"ALTER TABLE graft.`$path` SET PARTITIONED BY (bucket(8, o_orderkey))")
        .collect().head.getLong(0)
      require(nParts >= 4, s"expected several bucket partitions, got $nParts")
      // the evolved layout serves the shifted access pattern: a key
      // probe prunes to ONE partition by path
      val probeKey = fact.select(col("o_orderkey")).head().getLong(0)
      PartitionedTable.readTableWhere(s, path,
        col("o_orderkey") === probeKey).collect()
      require(PartitionedTable.lastPartitionPrune._1 == 1,
        s"key probe must prune to 1 partition: ${PartitionedTable.lastPartitionPrune}")
      // time travel ACROSS the evolution: the old pin set still reads
      require(PartitionedTable.readTableAt(s, path, 1).count() == before,
        "time travel across the evolution must serve the old layout")
      // ingest continues through the new spec
      PartitionedTable.upsertMulti(s, path,
        fact.filter(col("o_month") === "1995-05"), keys,
        Seq("bucket(8, o_orderkey)"))
      PartitionedTable.readTable(s, path)
        .orderBy(col("o_orderkey"), col("o_month"))
    }),
    "s51_partitioned_restore" -> ((s, dir) => {
      // RESTORE + reverse change feed on the PARTITIONED layout: a
      // bad batch (corrupted cents into 1995-02 + a whole new
      // 1995-08 partition) is rolled back by SQL RESTORE — an
      // O(partitions) parent-level PIN REWIND committed forward (no
      // child table touched, no data moved: the only restore shape
      // that is sane on a 100 TB fact). The in-row requires pin the
      // mechanism: the restore lands as a NEW parent commit, the
      // cross-restore change feed is the REVERSE diff (the bad
      // partition's rows surface as deletes, the corrupted rows as
      // updates back to their pre-image), and the table stays live
      // for the next ingest (1995-09 lands after the restore).
      import graft.merge.PartitionedTable
      val o = table(s, dir, "orders")
      val fact = o.select(
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("o_month").between("1995-01", "1995-09"))
      val path = graft.Tmp.dir("graft_part51") + "/fact"
      val keys = Seq("o_month", "o_orderkey")
      PartitionedTable.upsert(s, path,
        fact.filter(col("o_month") <= "1995-06"), keys, "o_month",
        numBuckets = 2)
      PartitionedTable.upsert(s, path,
        fact.filter(col("o_month") === "1995-07")
          .unionByName(fact.filter(col("o_month") === "1995-03")
            .withColumn("cents", col("cents") + 5)), keys, "o_month")
      // the BAD batch: corrupted measures + a partition that should
      // never have landed
      PartitionedTable.upsert(s, path,
        fact.filter(col("o_month") === "1995-08")
          .unionByName(fact.filter(col("o_month") === "1995-02")
            .withColumn("cents", col("cents") + 999999L)), keys, "o_month")
      graft.sql.GraftSql.sql(s,
        s"RESTORE TABLE graft.`$path` TO VERSION AS OF 2").collect()
      require(PartitionedTable.tableCommit(path).contains(4),
        "restore must land as a NEW parent commit")
      val feed = PartitionedTable.readChanges(s, path, 1, 0)
        .groupBy(col("_change_type")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val n08 = fact.filter(col("o_month") === "1995-08").count()
      val n02 = fact.filter(col("o_month") === "1995-02").count()
      require(feed.getOrElse("delete", 0L) == n08 &&
        feed.getOrElse("update", 0L) == n02,
        s"reverse feed shape wrong: $feed (want delete=$n08 update=$n02)")
      // life goes on: the next month lands on the restored line
      PartitionedTable.upsert(s, path,
        fact.filter(col("o_month") === "1995-09"), keys, "o_month")
      PartitionedTable.readTable(s, path).orderBy(col("o_orderkey"))
    }),
    "s42_partitioned_table" -> ((s, dir) => {
      // PARTITION-COLUMN layout (the r9 verdict's #1 scale gap): a
      // month-partitioned orders fact through the FULL commit
      // protocol — parent manifest over per-partition child graft
      // tables (PartitionedTable). Initial load lands every 1995-and-
      // earlier month; the incremental batch INSERTS three new 1996
      // partitions and UPDATES one existing one (cents+1 into
      // 1995-06) — routed per partition, untouched partitions' files
      // never rewritten (spec pins child commits + inputFiles). The
      // judged frame is a partition-PRUNED read: months 1995-05..07
      // discarded-by-path vs the ~80 live partitions before any
      // stats/bloom consult — the layout the engine's own j13_dpp
      // demo previously had to build from bare parquet.
      val o = table(s, dir, "orders")
      val fact = o.select(
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val path = graft.Tmp.dir("graft_part42") + "/fact"
      val keys = Seq("o_month", "o_orderkey")
      graft.merge.PartitionedTable.upsert(s, path,
        fact.filter(col("o_month") < "1996-01"), keys, "o_month",
        numBuckets = 2)
      val batch = fact.filter(col("o_month").between("1996-01", "1996-03"))
        .unionByName(fact.filter(col("o_month") === "1995-06")
          .withColumn("cents", col("cents") + 1))
      graft.merge.PartitionedTable.upsert(s, path, batch, keys, "o_month")
      graft.merge.PartitionedTable.readTableWhere(s, path,
          col("o_month").between("1995-05", "1995-07"))
        .orderBy(col("o_orderkey"))
    }),
    "s40_time_travel_ts" -> ((s, dir) => {
      // TIMESTAMP AS OF — the operator-facing time-travel coordinate
      // (readTableAtTime): two stamped commits, then a read AT a wall
      // time strictly between them must materialize the FIRST commit's
      // snapshot (identical to readTableAt(commitsBack=1)), while the
      // live read shows the second. The probe time is commit-2's stamp
      // minus 1 ms; the sleep guarantees the two stamps differ so the
      // probe lands strictly inside the window. Judged frame carries
      // both sides tagged — resolution correctness AND live divergence
      // in one hash. Metadata cost of resolution: one driver listing
      // of retained history manifests, no data read until the winner
      // is known.
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val path = graft.Tmp.dir("graft_tt40") + "/dim"
      Scd1Merge.upsert(s, path, dim, Seq("k"), numBuckets = 4)
      Thread.sleep(5) // commit stamps are millis; force ts2 > ts1
      Scd1Merge.upsert(s, path,
        dim.filter(col("k") % 5 === 0)
          .withColumn("name", concat(col("name"), lit("_v2"))),
        Seq("k"))
      val ts2 = Scd1Merge.history(s, path)
        .filter(col("commit") === 2).select(col("commit_ts"))
        .first().getLong(0)
      val asOf = Scd1Merge.readTableAtTime(s, path, ts2 - 1)
      val live = Scd1Merge.readTableAtTime(s, path, ts2)
      asOf.withColumn("side", lit("asof"))
        .unionByName(live.withColumn("side", lit("live")))
        .orderBy(col("side"), col("k"))
    }),
    "j14_existence_join" -> ((s, dir) => {
      // EXISTENCE join — the marked semi-join (Spark's ExistenceJoin
      // physical type): every left row survives, carrying a boolean
      // for whether a match EXISTS, instead of being filtered (j6) or
      // duplicated (j1). One shuffle, no fan-out on multi-match right
      // sides — the shape behind `CASE WHEN EXISTS(...)` projections.
      val o = table(s, dir, "orders")
      o.createOrReplaceTempView("j14_orders")
      table(s, dir, "lineitem").createOrReplaceTempView("j14_lineitem")
      s.sql("""
        SELECT o_orderkey, o_orderstatus,
          EXISTS(SELECT 1 FROM j14_lineitem l
                 WHERE l.l_orderkey = j14_orders.o_orderkey
                   AND l.l_quantity > 45.0) AS has_bulk_line
        FROM j14_orders ORDER BY o_orderkey""")
    }),
    "s30_merge_cdc" -> ((s, dir) => {
      // FULL MERGE surface (Delta WHEN MATCHED DELETE parity): one
      // CDC batch carrying updates (k%5=0 → name_v2), inserts
      // (k+100 for k<3) and deletes (10<=k<15) applies in ONE
      // crash-safe commit — Scd1Merge.applyCdc. The judged frame is
      // the post-merge table; CdcSpec pins single-commit atomicity,
      // emptied-bucket handling and the change-feed tags.
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val path = tmpDir("graft_cdc30") + "/dim"
      Scd1Merge.upsert(s, path, dim, Seq("k"))
      val cdc = n.filter(col("n_nationkey") % 5 === 0 && col("n_nationkey") < 10)
        .select(col("n_nationkey").as("k"),
          concat(col("n_name"), lit("_v2")).as("name"),
          col("n_regionkey").as("region"), lit("update").as("_op"))
        .unionByName(n.filter(col("n_nationkey") < 3)
          .select((col("n_nationkey") + lit(100L)).cast("int").as("k"),
            concat(col("n_name"), lit("_new")).as("name"),
            col("n_regionkey").as("region"), lit("insert").as("_op")))
        .unionByName(n.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 15)
          .select(col("n_nationkey").as("k"), col("n_name").as("name"),
            col("n_regionkey").as("region"), lit("delete").as("_op")))
      Scd1Merge.applyCdc(s, path, cdc, Seq("k"))
      Scd1Merge.readTable(s, path).orderBy(col("k"))
    }),
    "sql_merge" -> ((s, dir) => {
      // SQL DML surface — the s30 batch driven ENTIRELY from SQL text:
      // `MERGE INTO` in the CDC-apply shape (conditional DELETE +
      // UPDATE SET * + INSERT *), then an UPDATE and a DELETE
      // statement, all parsed by Spark's own grammar and routed onto
      // Scd1Merge by graft.sql.GraftDml (GraftSqlParser is the
      // injectParser hook for extension-built sessions; GraftSql.sql
      // is the live-session twin used here). Merge keys come from the
      // table's own manifest — SQL never restates them. The final
      // state must hash-match the DuckDB re-derivation, i.e. the SQL
      // path is bit-identical to the API path (GraftSqlSpec pins the
      // API twins statement by statement).
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val path = graft.Tmp.dir("graft_sqldml") + "/dim"
      Scd1Merge.upsert(s, path, dim, Seq("k"))
      n.filter(col("n_nationkey") % 5 === 0 && col("n_nationkey") < 10)
        .select(col("n_nationkey").as("k"),
          concat(col("n_name"), lit("_v2")).as("name"),
          col("n_regionkey").as("region"), lit("update").as("_op"))
        .unionByName(n.filter(col("n_nationkey") < 3)
          .select((col("n_nationkey") + lit(100L)).cast("int").as("k"),
            concat(col("n_name"), lit("_new")).as("name"),
            col("n_regionkey").as("region"), lit("insert").as("_op")))
        .unionByName(n.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 15)
          .select(col("n_nationkey").as("k"), col("n_name").as("name"),
            col("n_regionkey").as("region"), lit("delete").as("_op")))
        .createOrReplaceTempView("sql_merge_cdc_src")
      graft.sql.GraftSql.sql(s,
        s"""MERGE INTO graft.`$path` t USING sql_merge_cdc_src s ON t.k = s.k
           |WHEN MATCHED AND s._op = 'delete' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      graft.sql.GraftSql.sql(s,
        s"UPDATE graft.`$path` SET name = concat(name, '_upd') WHERE k >= 100")
      graft.sql.GraftSql.sql(s,
        s"DELETE FROM graft.`$path` WHERE k >= 15 AND k < 20")
      Scd1Merge.readTable(s, path).orderBy(col("k"))
    }),
    "sql_merge_full" -> ((s, dir) => {
      // FULL MERGE clause surface: column-level UPDATE SET whose value
      // references BOTH frames (t.name / s.name — the qualifier
      // binding the r9 advisor flagged as silently collapsing),
      // conditional clauses in first-match-wins order, INSERT with an
      // explicit column list + literal, and WHEN NOT MATCHED BY SOURCE
      // DELETE — the whole combination lowered onto ONE applyCdc
      // commit (GraftMergeCommand: single full-outer join, per-clause
      // when-chain). The oracle re-derives the three populations
      // (matched / source-only / target-only) relationally in DuckDB.
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val path = graft.Tmp.dir("graft_sqlmergefull") + "/dim"
      Scd1Merge.upsert(s, path, dim, Seq("k"), numBuckets = 4)
      n.filter(col("n_nationkey") % 3 === 0 && col("n_nationkey") < 15)
        .select(col("n_nationkey").as("k"),
          concat(col("n_name"), lit("_m")).as("name"))
        .unionByName(n.filter(col("n_nationkey") < 2)
          .select((col("n_nationkey") + lit(200L)).cast("int").as("k"),
            concat(col("n_name"), lit("_new")).as("name")))
        .createOrReplaceTempView("sql_merge_full_src")
      graft.sql.GraftSql.sql(s,
        s"""MERGE INTO graft.`$path` t USING sql_merge_full_src s ON t.k = s.k
           |WHEN MATCHED AND t.region < 2 THEN UPDATE SET name = concat(t.name, '+', s.name)
           |WHEN MATCHED THEN UPDATE SET region = t.region + 10
           |WHEN NOT MATCHED THEN INSERT (k, name, region) VALUES (s.k, s.name, 77)
           |WHEN NOT MATCHED BY SOURCE AND t.k >= 20 THEN DELETE""".stripMargin)
      Scd1Merge.readTable(s, path).orderBy(col("k"))
    }),
    "s29_shallow_clone" -> ((s, dir) => {
      // SHALLOW CLONE (Delta CLONE parity): zero-copy table fork. The
      // clone's first commit symlinks the source's bucket versions
      // (O(buckets) metadata); the divergence batch then copy-on-write
      // rewrites only the clone buckets it touches. The judged frame
      // carries BOTH post-divergence states side-tagged — the clone
      // shows the merge, the source must read back bit-identical to
      // its pre-clone content (isolation both ways). CloneSpec pins
      // the zero-copy mechanics (symlinked dirs, file sharing,
      // source-safe GC).
      val n = table(s, dir, "nation")
      val dim = n.select(col("n_nationkey").as("k"),
        col("n_name").as("name"), col("n_regionkey").as("region"))
      val root = tmpDir("graft_clone29")
      val srcT = root + "/src"; val cloneT = root + "/clone"
      Scd1Merge.upsert(s, srcT, dim, Seq("k"))
      Scd1Merge.cloneShallow(srcT, cloneT)
      val batch = n.filter(col("n_nationkey") % 5 === 0)
        .select(col("n_nationkey").as("k"),
          concat(col("n_name"), lit("_v2")).as("name"),
          col("n_regionkey").as("region"))
        .unionByName(n.filter(col("n_nationkey") < 3)
          .select((col("n_nationkey") + lit(100L)).cast("int").as("k"),
            concat(col("n_name"), lit("_new")).as("name"),
            col("n_regionkey").as("region")))
      Scd1Merge.upsert(s, cloneT, batch, Seq("k"))
      Scd1Merge.readTable(s, cloneT).withColumn("side", lit("clone"))
        .unionByName(
          Scd1Merge.readTable(s, srcT).withColumn("side", lit("source")))
        .orderBy(col("side"), col("k"))
    }),
    "j13_dpp" -> ((s, dir) => {
      // DYNAMIC PARTITION PRUNING — the star-schema scan killer at
      // 100 TB: the fact is laid out partitioned by month, the filter
      // lives on a DIM attribute (label), and the months to scan are
      // only known after filtering the dim — a static planner must
      // read every partition. Spark's DPP inserts a runtime subquery:
      // the broadcast dim's join keys become a partition filter on the
      // fact scan, so 12 of ~80 month directories are read (PlanSpec
      // pins the dynamicpruningexpression in the scan). The dim is
      // MATERIALIZED through parquet so label⇒month is data, not an
      // expression Catalyst could fold statically.
      val base = tmpDir("graft_dpp")
      val factPath = base + "/fact"
      val dimPath = base + "/dim"
      val orders = table(s, dir, "orders")
        .withColumn("d_month", date_format(col("o_orderdate"), "yyyy-MM"))
      orders.write.partitionBy("d_month").mode("overwrite").parquet(factPath)
      orders.select(col("d_month")).distinct()
        .withColumn("label", concat(lit("M-"), col("d_month")))
        .write.mode("overwrite").parquet(dimPath)
      val fact = s.read.parquet(factPath)
      val dim = s.read.parquet(dimPath).filter(col("label").startsWith("M-1995"))
      fact.join(broadcast(dim), "d_month")
        .groupBy(col("d_month"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))) / 100.0).as("revenue"))
        .orderBy(col("d_month"))
    }),
    "o1_sort" -> ((s, dir) =>
      table(s, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"), col("o_totalprice"))
        .orderBy(col("o_date").asc, col("o_totalprice").desc, col("o_orderkey").asc)),
    "o2_limit_topk" -> ((s, dir) =>
      // ORDER BY + LIMIT compiles to TakeOrderedAndProject — per-
      // partition top-k then a k-row merge, never a global sort
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),
    "u4_union_evolution" -> ((s, dir) => {
      // schema-drift union: unionByName(allowMissingColumns) aligns BY
      // NAME and null-fills each side's absent columns — the
      // batch-combining primitive under schema evolution (positional
      // union silently mismatches reordered/added fields).
      val a = table(s, dir, "nation")
        .select(col("n_nationkey").as("k"), col("n_name").as("name"))
      val b = table(s, dir, "region")
        .select((col("r_regionkey") + 100).cast("int").as("k"),
          col("r_name").as("name"), lit("region").as("origin"))
      a.unionByName(b, allowMissingColumns = true).orderBy(col("k"))
    }),
    "a28_skew_report" -> ((s, dir) =>
      // join-key skew diagnostic — the measurement behind every
      // salting/AQE decision (saltedEquiJoin's Scaladoc, sessionize
      // time-chunking, degree-ordered triangles): exact per-key count
      // quantiles, top-5 heavy hitters, max/avg skew ratio, in one
      // keyed agg + a |keys|-row percentile pass + a TakeOrdered.
      graft.ops.RelOps.skewReport(table(s, dir, "lineitem"),
          Seq("l_suppkey"), topN = 5)
        .orderBy(col("rank"))),
    "a27_profile" -> ((s, dir) => {
      // Generic per-column table profiler (the data-quality dataset
      // card for relational tables, text_corpus_report's cousin):
      // count / nulls / exact distinct / min / max for every lineitem
      // column in ONE scan — an explode over a column→string map turns
      // 16 per-column aggregations into one 10-group hash agg (Expand
      // ×2 for the exact distinct; all measures partial-aggregatable,
      // the shuffle carries group states, never rows). Doubles profile
      // through a decimal(18,2) rendering so min/max/distinct are
      // engine-independent strings; numeric columns declare themselves
      // so their extremes order NUMERICALLY ('2.00' < '10.00'), not
      // lexicographically; at 100 TB this is the same one
      // scan — profiling cost never exceeds one pass over the table.
      graft.ops.RelOps.profile(table(s, dir, "lineitem"), Seq(
        "l_orderkey" -> col("l_orderkey"),
        "l_partkey" -> col("l_partkey"),
        "l_suppkey" -> col("l_suppkey"),
        "l_linenumber" -> col("l_linenumber"),
        "l_quantity" -> col("l_quantity").cast("decimal(18,2)"),
        "l_extendedprice" -> col("l_extendedprice").cast("decimal(18,2)"),
        "l_discount" -> col("l_discount").cast("decimal(18,2)"),
        "l_returnflag" -> col("l_returnflag"),
        "l_linestatus" -> col("l_linestatus"),
        "l_shipdate" -> col("l_shipdate")),
        numericCols = Set("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"))
        .orderBy(col("column"))
    }),
    "a26_unpivot" -> ((s, dir) =>
      // UNPIVOT / melt — the inverse of a10_pivot and the missing
      // reshape primitive: four lineitem measures become (measure,
      // value) rows via one Expand projection (no shuffle, no join);
      // the deterministic id slice keeps the judged artifact
      // row-bounded at any SF
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))),
    "a25_bool_aggs" -> ((s, dir) =>
      // boolean aggregate family: count_if / bool_and / bool_or — the
      // predicate-rollup primitives (data-quality dashboards run on
      // these); map-side-combinable single hash-agg
      table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(count_if(col("o_totalprice") > 200000.0).as("n_big"),
          bool_and(col("o_totalprice") > 900.0).as("all_over_900"),
          bool_or(col("o_totalprice") > 400000.0).as("any_over_400k"))
        .orderBy(col("o_orderstatus"))),
    "u1_union" -> ((s, dir) => {
      val (old, fresh) = custSplit(s, dir)
      RelOps.positionalUnion(fresh, old.drop("dim_key"))
        .orderBy(col("c_custkey"))
    })
  )

  /** Shared J1+F2+F3 fixture: a fake existing dim holds every third
    * customer; the left-join split classifies the rest as new. */
  private def custSplit(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val src = table(s, dir, "customer").select(col("c_custkey"), col("c_name"))
    val sink = table(s, dir, "customer")
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), (col("c_custkey") * 10).as("dim_key"))
    val joined = src.join(broadcast(sink), Seq("c_custkey"), "left")
    (joined.filter(col("dim_key").isNotNull),
     joined.filter(col("dim_key").isNull).select(col("c_custkey"), col("c_name")))
  }

  val oracle: Map[String, String] = Map(
    "s1_incremental_ingest" ->
      "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice FROM orders ORDER BY o_orderkey",
    "s2_csv_roundtrip" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey",
    "s3_parquet_scan" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "s4_sql_over_files" ->
      "SELECT p_partkey, p_name, p_brand FROM part ORDER BY p_partkey",
    "s14_json_roundtrip" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey",
    "s15_orc_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "s5_catalog_scan" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",
    "s6_parquet_append_sink" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "s7_overwrite_saveastable" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "s8_scd1_upsert" ->
      """WITH target AS (SELECT n_nationkey AS k, n_name || '_old' AS name FROM nation WHERE n_nationkey < 20),
         |source AS (SELECT n_nationkey AS k, n_name AS name FROM nation WHERE n_nationkey >= 10)
         |SELECT k, name FROM (
         |  SELECT t.k, t.name FROM target t WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.k = t.k)
         |  UNION ALL SELECT k, name FROM source) ORDER BY k""".stripMargin,
    "s9_s10_catalog_ddl_probe" ->
      "SELECT TRUE AS db_exists, FALSE AS exists_before, TRUE AS exists_after",
    "s11_watermark_state" ->
      "SELECT 'DT00000' AS initial, 'DT00042' AS advanced, 'DT00042' AS after_reject, TRUE AS regression_rejected",
    "s12_scalar_collect" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey = (SELECT max(o_orderkey) FROM orders) ORDER BY l_linenumber",
    "p1_projection" ->
      "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey",
    "p2_qualified_select" ->
      "SELECT o_orderkey, o_custkey AS custkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey",
    "p3_split_derive" ->
      "SELECT p_partkey, split_part(p_type, ' ', 1) AS category FROM part ORDER BY p_partkey",
    "p4_ratio_derive" ->
      "SELECT p_partkey, p_retailprice / p_size AS price_per_size FROM part ORDER BY p_partkey",
    "p5_lit_add" ->
      "SELECT o_orderkey, o_orderkey + 1000000 AS shifted_key FROM orders ORDER BY o_orderkey",
    "p6_lit_alias" ->
      "SELECT CAST(1 AS BIGINT) AS one, n_name FROM nation ORDER BY n_name",
    "p7_drop" ->
      "SELECT c_custkey, c_name, c_nationkey FROM customer ORDER BY c_custkey",
    "p8_agg_alias" ->
      "SELECT l_returnflag, SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty FROM lineitem GROUP BY 1 ORDER BY l_returnflag",
    "f1_empty_schema" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE 1 = 0",
    "f2_isnotnull_old" ->
      "SELECT c_custkey, c_name, c_custkey * 10 AS dim_key FROM customer WHERE c_custkey % 3 = 0 ORDER BY c_custkey",
    "f3_isnull_new" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 <> 0 ORDER BY c_custkey",
    "f4_sql_string_filter" ->
      "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O' ORDER BY o_orderkey",
    "f5_watermark_range" ->
      "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date FROM orders WHERE o_orderdate > TIMESTAMP '1996-12-31 00:00:00' AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00' ORDER BY o_orderkey",
    "j1_left_outer" ->
      "SELECT c_custkey, c_name, n_name FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey ORDER BY c_custkey",
    "j2_4way_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, p_name, s_name, n_name, o_orderstatus
         |FROM lineitem
         |LEFT JOIN part ON l_partkey = p_partkey
         |LEFT JOIN supplier ON l_suppkey = s_suppkey
         |LEFT JOIN nation ON s_nationkey = n_nationkey
         |LEFT JOIN orders ON l_orderkey = o_orderkey
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "j3_surrogate_merge" ->
      """WITH dim AS (SELECT (n_nationkey + 2)::BIGINT AS dim_key, n_name AS name, n_regionkey AS region FROM nation),
         |batch AS (
         |  SELECT (n_nationkey + 2)::BIGINT AS dim_key, n_name || '_v2' AS name, n_regionkey AS region FROM nation WHERE n_nationkey % 5 = 0
         |  UNION ALL
         |  SELECT (n_nationkey + 100)::BIGINT AS dim_key, n_name || '_new' AS name, n_regionkey AS region FROM nation WHERE n_nationkey < 3)
         |SELECT dim_key, name, region FROM (
         |  SELECT d.* FROM dim d WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.dim_key = d.dim_key)
         |  UNION ALL SELECT * FROM batch)
         |ORDER BY dim_key""".stripMargin,
    "j4_composite_merge" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity FROM lineitem),
         |s AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity + 100.0 AS l_quantity FROM lineitem WHERE l_orderkey % 10 = 0)
         |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity FROM (
         |  SELECT t.* FROM t WHERE NOT EXISTS (
         |    SELECT 1 FROM s WHERE s.l_orderkey = t.l_orderkey AND s.l_linenumber = t.l_linenumber
         |      AND s.l_partkey = t.l_partkey AND s.l_suppkey = t.l_suppkey)
         |  UNION ALL SELECT * FROM s) ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "s13_schema_evolution" ->
      """SELECT n_nationkey AS k,
         |  CASE WHEN n_nationkey < 5 THEN n_name || '_v2' ELSE n_name END AS name,
         |  CASE WHEN n_nationkey >= 20 THEN n_regionkey::BIGINT + 10000000000
         |       ELSE n_regionkey::BIGINT END AS pop,
         |  CASE WHEN n_nationkey < 5 THEN n_regionkey::BIGINT ELSE NULL END AS region
         |FROM nation ORDER BY k""".stripMargin,
    "w3_running_sum" ->
      """SELECT o_orderkey, o_custkey,
         |  (sum(CAST(round(o_totalprice * 100) AS BIGINT))
         |     OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
         |           ROWS UNBOUNDED PRECEDING)) / 100.0 AS run_total
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "w4_lag_lead" ->
      """SELECT o_orderkey, o_custkey,
         |  lag(CAST(o_orderdate AS DATE)) OVER w AS prev_date,
         |  lead(CAST(o_orderdate AS DATE)) OVER w AS next_date
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
         |ORDER BY o_orderkey""".stripMargin,
    "w5_rank_ntile" ->
      """SELECT o_orderkey, o_orderstatus,
         |  CAST(rank() OVER w AS INT) AS rnk,
         |  CAST(dense_rank() OVER w AS INT) AS drnk,
         |  CAST(ntile(4) OVER w AS INT) AS quartile
         |FROM orders
         |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
         |ORDER BY o_orderkey""".stripMargin,
    "s31_compact_maintenance" ->
      "SELECT c_custkey AS k, c_name AS name, c_acctbal FROM customer WHERE c_custkey <= 1000 ORDER BY k",
    "s35_generated_columns" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
         |  strftime(o_orderdate, '%Y-%m') AS o_month, o_totalprice
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "w10_gap_fill" ->
      """WITH e AS (
         |  SELECT user_id, date_trunc('hour', ts) AS hour,
         |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM events GROUP BY 1, 2),
         |span AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
         |         FROM e GROUP BY 1),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
         |  FROM span)
         |SELECT g.user_id, g.hour,
         |  last_value(e.cents IGNORE NULLS) OVER (
         |    PARTITION BY g.user_id ORDER BY g.hour
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_filled,
         |  e.cents IS NULL AS is_gap
         |FROM grid g LEFT JOIN e ON g.user_id = e.user_id AND g.hour = e.hour
         |ORDER BY g.user_id, g.hour""".stripMargin,
    "s39_deep_clone" ->
      // clone state: bal+1 where k%4==0 (source commit 2), then the
      // CLONE-side batch rebuilds k%7==0 rows from the ORIGINAL dim
      // (name gains _bk, bal reverts); the source's later delete and
      // full vacuum must be invisible here
      """SELECT s_suppkey AS k,
         |  CASE WHEN s_suppkey % 7 = 0 THEN s_name || '_bk' ELSE s_name END AS name,
         |  s_acctbal + CASE WHEN s_suppkey % 4 = 0 AND s_suppkey % 7 <> 0
         |              THEN 1.0 ELSE 0.0 END AS bal
         |FROM supplier ORDER BY k""".stripMargin,
    "s38_bloom_skipping" ->
      """SELECT c_custkey AS k, c_name,
         |  md5(CAST(c_custkey AS VARCHAR)) AS tag, true AS bloom_pruned
         |FROM customer
         |WHERE md5(CAST(c_custkey AS VARCHAR)) = md5('73')
         |ORDER BY k""".stripMargin,
    "s37_vacuum" ->
      // final state: B2 bumps %5==0 names, B3 inserts k+100 for k<3
      // (with their ORIGINAL names — the bump predates those keys),
      // the soft delete removes k%3==0; vacuum changes nothing a
      // current reader sees
      """WITH state AS (
         |  SELECT n_nationkey AS k,
         |    CASE WHEN n_nationkey % 5 = 0 THEN n_name || '_v2' ELSE n_name END AS name
         |  FROM nation
         |  UNION ALL
         |  SELECT n_nationkey + 100 AS k, n_name FROM nation WHERE n_nationkey < 3)
         |SELECT k, name FROM state WHERE k % 3 <> 0 ORDER BY k""".stripMargin,
    "s36_column_drop" ->
      """WITH dim AS (SELECT s_suppkey AS k, s_name AS name, s_acctbal AS balance FROM supplier),
         |batch AS (
         |  SELECT s_suppkey AS k, s_name || '_v2' AS name, s_acctbal AS balance
         |  FROM supplier WHERE s_suppkey % 3 = 0)
         |SELECT k, name, balance FROM (
         |  SELECT d.* FROM dim d WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.k = d.k)
         |  UNION ALL SELECT * FROM batch)
         |ORDER BY k""".stripMargin,
    "s34_column_rename" ->
      """WITH dim AS (SELECT n_nationkey AS nation_id, n_name AS label, n_regionkey AS region FROM nation),
         |batch AS (
         |  SELECT n_nationkey AS nation_id, n_name || '_v2' AS label, n_regionkey AS region FROM nation WHERE n_nationkey % 5 = 0
         |  UNION ALL
         |  SELECT n_nationkey + 100 AS nation_id, n_name || '_new' AS label, n_regionkey AS region FROM nation WHERE n_nationkey < 3)
         |SELECT nation_id, label, region FROM (
         |  SELECT d.* FROM dim d WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.nation_id = d.nation_id)
         |  UNION ALL SELECT * FROM batch)
         |ORDER BY nation_id""".stripMargin,
    "s33_deletion_vectors" ->
      """SELECT c_custkey AS k,
         |  CASE WHEN c_custkey % 21 = 0 THEN c_name || '_back' ELSE c_name END AS name,
         |  c_acctbal
         |FROM customer
         |WHERE c_custkey <= 2000
         |  AND (c_custkey % 7 <> 0 OR c_custkey % 21 = 0)
         |ORDER BY k""".stripMargin,
    "s32_history" ->
      """SELECT * FROM (VALUES
         |  (1, 'B1', 4, 4), (2, 'B2', 4, 4), (3, 'B3', 4, 4))
         |  t(commit, batch_id, num_buckets, n_live_buckets)
         |ORDER BY commit""".stripMargin,
    "sql_alter_restore" ->
      """SELECT n_nationkey AS k, n_name AS label
         |FROM nation ORDER BY k""".stripMargin,
    "sql_copy_into" ->
      """SELECT o_orderkey, o_orderdate,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |FROM orders
         |WHERE o_orderdate >= DATE '1995-01-01'
         |  AND o_orderdate < DATE '1995-05-01'
         |ORDER BY o_orderkey""".stripMargin,
    "sql_ctas_insert" ->
      """SELECT n_nationkey AS k,
         |  CASE WHEN n_nationkey >= 15 THEN n_name || '_ins' ELSE n_name END AS name,
         |  n_regionkey AS region
         |FROM nation ORDER BY k""".stripMargin,
    "sql_catalog_persist" ->
      """SELECT o_orderpriority,
         |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS sum_cents,
         |  count(*) AS n_orders
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    "sql_mv_lifecycle" ->
      """WITH f AS (
         |  SELECT o_orderpriority,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      + CASE WHEN o_orderkey % 3 = 0 THEN 50 ELSE 0 END AS cents
         |  FROM orders)
         |SELECT o_orderpriority, sum(cents)::BIGINT AS sum_cents,
         |  count(*) AS n_orders
         |FROM f GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sql_time_travel" ->
      """WITH dim AS (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS region FROM nation),
         |live AS (
         |  SELECT k, CASE WHEN k % 5 = 0 THEN name || '_v2' ELSE name END AS name, region
         |  FROM dim)
         |SELECT k, name, region, side FROM (
         |  SELECT *, 'asof' AS side FROM dim
         |  UNION ALL SELECT *, 'live' AS side FROM live)
         |ORDER BY side, k""".stripMargin,
    "sql_partitioned" ->
      """WITH fact AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders
         |  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-08-01'),
         |upd AS (
         |  SELECT o_month, o_orderkey,
         |    CASE WHEN o_month = '1995-03' THEN cents + 1 ELSE cents END AS cents
         |  FROM fact)
         |SELECT o_month, o_orderkey, cents FROM upd
         |WHERE NOT (o_month = '1995-02' AND cents % 10 = 0)
         |ORDER BY o_orderkey""".stripMargin,
    "s48_multipart" ->
      """WITH fact AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS m,
         |         substr(o_orderpriority, 1, 1) AS prio,
         |         o_orderkey,
         |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders
         |  WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-04'),
         |upd AS (
         |  SELECT m, prio, o_orderkey,
         |         CASE WHEN prio = '1' THEN cents + 1 ELSE cents END AS cents
         |  FROM fact),
         |del AS (
         |  SELECT * FROM upd
         |  WHERE NOT (m = '1995-02' AND prio = '3' AND o_orderkey % 2 = 0))
         |SELECT m, prio, o_orderkey, cents FROM del
         |WHERE m BETWEEN '1995-02' AND '1995-03'
         |ORDER BY o_orderkey""".stripMargin,
    "s47_describe_detail" ->
      """SELECT 'graft' AS format, 'k' AS merge_keys,
         |  CAST(3 AS INTEGER) AS num_buckets,
         |  CAST(NULL AS VARCHAR) AS partition_columns,
         |  CAST(NULL AS INTEGER) AS num_partitions,
         |  (SELECT count(*) FROM nation) AS num_rows,
         |  'kpos CHECK (k >= 0)' AS constraints
         |UNION ALL
         |SELECT 'graft/partitioned', 'o_month,o_orderkey',
         |  CAST(NULL AS INTEGER), 'o_month',
         |  CAST((SELECT count(DISTINCT strftime(o_orderdate, '%Y-%m'))
         |        FROM orders
         |        WHERE strftime(o_orderdate, '%Y-%m') < '1993-01') AS INTEGER),
         |  (SELECT count(*) FROM orders
         |   WHERE strftime(o_orderdate, '%Y-%m') < '1993-01'),
         |  CAST(NULL AS VARCHAR)
         |ORDER BY format""".stripMargin,
    "s46_constraints" ->
      """SELECT n_nationkey AS k,
         |  CASE WHEN n_nationkey < 3 THEN n_name || '_v2' ELSE n_name END AS name,
         |  CASE WHEN n_nationkey = 10 THEN 0 ELSE n_regionkey END AS region
         |FROM nation ORDER BY k""".stripMargin,
    "s45_agg_pushdown" ->
      """SELECT count(*) AS cnt,
         |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
         |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         |  min(l_shipdate) AS min_sd, max(l_shipdate) AS max_sd
         |FROM lineitem WHERE l_orderkey <= 20000""".stripMargin,
    "s44_dsv2_write" ->
      """WITH b1 AS (
         |  SELECT c_mktsegment AS seg, c_custkey AS k,
         |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
         |  FROM customer WHERE c_custkey <= 500),
         |b2 AS (
         |  SELECT seg, k, cents + 5 AS cents FROM b1 WHERE k % 7 = 0
         |  UNION ALL
         |  SELECT 'SEG_NEW' AS seg, k + 100000 AS k,
         |         CAST(4242 AS BIGINT) AS cents
         |  FROM b1 WHERE k % 13 = 0),
         |merged AS (
         |  SELECT seg, k, cents FROM b2
         |  UNION ALL
         |  SELECT seg, k, cents FROM b1
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM b2 WHERE b2.seg = b1.seg AND b2.k = b1.k))
         |SELECT seg, k, cents FROM merged WHERE seg <> 'SEG_NEW'
         |UNION ALL
         |SELECT 'SEG_NEW' AS seg, k + 200000 AS k,
         |       CAST(777 AS BIGINT) AS cents
         |FROM b1 WHERE k % 13 = 0
         |ORDER BY seg, k""".stripMargin,
    "s43_dsv2_read" ->
      """SELECT n_nationkey AS k, n_name AS name
         |FROM nation
         |WHERE n_regionkey < 3 AND n_nationkey >= 2
         |ORDER BY k""".stripMargin,
    "s50_partitioned_cdf" ->
      """WITH fact AS (
         |  SELECT o_orderkey, o_orderdate,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |feb AS (SELECT * FROM fact WHERE o_orderdate >= DATE '1995-02-01'
         |  AND o_orderdate < DATE '1995-03-01'),
         |jan AS (SELECT * FROM fact WHERE o_orderdate >= DATE '1995-01-01'
         |  AND o_orderdate < DATE '1995-02-01'),
         |apr AS (SELECT * FROM fact WHERE o_orderdate >= DATE '1995-04-01'
         |  AND o_orderdate < DATE '1995-05-01')
         |SELECT o_orderkey, o_orderdate, cents + 1 AS cents,
         |  'update' AS _change_type FROM feb
         |UNION ALL SELECT o_orderkey, o_orderdate, cents,
         |  'update_preimage' FROM feb
         |UNION ALL SELECT o_orderkey, o_orderdate, cents, 'insert' FROM apr
         |UNION ALL SELECT o_orderkey, o_orderdate, cents, 'delete' FROM jan
         |ORDER BY _change_type, o_orderkey""".stripMargin,
    "s49_hidden_partitions" ->
      """SELECT o_orderkey, o_orderdate,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |FROM orders
         |WHERE o_orderdate >= DATE '1995-05-01'
         |  AND o_orderdate < DATE '1995-08-01'
         |ORDER BY o_orderkey""".stripMargin,
    "s53_partitioned_concurrent" ->
      """WITH fact AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders
         |  WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-05')
         |SELECT o_month, o_orderkey,
         |  CASE WHEN o_month = '1995-01' THEN cents + 7 ELSE cents END AS cents
         |FROM fact
         |ORDER BY o_orderkey, o_month""".stripMargin,
    "s52_partition_evolution" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_orderkey,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |FROM orders
         |WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-05'
         |ORDER BY o_orderkey, o_month""".stripMargin,
    "s51_partitioned_restore" ->
      """WITH fact AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders
         |  WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-09')
         |SELECT o_month, o_orderkey,
         |  CASE WHEN o_month = '1995-03' THEN cents + 5 ELSE cents END AS cents
         |FROM fact
         |WHERE o_month <= '1995-07' OR o_month = '1995-09'
         |ORDER BY o_orderkey""".stripMargin,
    "s42_partitioned_table" ->
      """WITH fact AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |merged AS (
         |  SELECT o_month, o_orderkey,
         |    CASE WHEN o_month = '1995-06' THEN cents + 1 ELSE cents END AS cents
         |  FROM fact WHERE o_month <= '1996-03')
         |SELECT o_month, o_orderkey, cents FROM merged
         |WHERE o_month BETWEEN '1995-05' AND '1995-07'
         |ORDER BY o_orderkey""".stripMargin,
    "s41_concurrent_upsert" ->
      """SELECT n_nationkey AS k,
         |  CASE WHEN n_nationkey = 1 THEN n_name || '_A'
         |       WHEN n_nationkey = 2 THEN n_name || '_B'
         |       ELSE n_name END AS name,
         |  n_regionkey AS region
         |FROM nation ORDER BY k""".stripMargin,
    "s40_time_travel_ts" ->
      """WITH dim AS (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS region FROM nation),
         |live AS (
         |  SELECT k, CASE WHEN k % 5 = 0 THEN name || '_v2' ELSE name END AS name, region
         |  FROM dim)
         |SELECT k, name, region, side FROM (
         |  SELECT *, 'asof' AS side FROM dim
         |  UNION ALL SELECT *, 'live' AS side FROM live)
         |ORDER BY side, k""".stripMargin,
    "j14_existence_join" ->
      """SELECT o_orderkey, o_orderstatus,
         |  EXISTS(SELECT 1 FROM lineitem l
         |         WHERE l.l_orderkey = orders.o_orderkey
         |           AND l.l_quantity > 45.0) AS has_bulk_line
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "s30_merge_cdc" ->
      """WITH dim AS (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS region FROM nation),
         |ups AS (
         |  SELECT n_nationkey AS k, n_name || '_v2' AS name, n_regionkey AS region
         |  FROM nation WHERE n_nationkey % 5 = 0 AND n_nationkey < 10
         |  UNION ALL
         |  SELECT n_nationkey + 100 AS k, n_name || '_new' AS name, n_regionkey AS region
         |  FROM nation WHERE n_nationkey < 3),
         |dels AS (SELECT n_nationkey AS k FROM nation WHERE n_nationkey >= 10 AND n_nationkey < 15)
         |SELECT k, name, region FROM (
         |  SELECT d.* FROM dim d
         |  WHERE NOT EXISTS (SELECT 1 FROM ups u WHERE u.k = d.k)
         |    AND NOT EXISTS (SELECT 1 FROM dels x WHERE x.k = d.k)
         |  UNION ALL SELECT * FROM ups)
         |ORDER BY k""".stripMargin,
    "sql_merge" ->
      """WITH dim AS (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS region FROM nation),
         |ups AS (
         |  SELECT n_nationkey AS k, n_name || '_v2' AS name, n_regionkey AS region
         |  FROM nation WHERE n_nationkey % 5 = 0 AND n_nationkey < 10
         |  UNION ALL
         |  SELECT n_nationkey + 100 AS k, n_name || '_new' AS name, n_regionkey AS region
         |  FROM nation WHERE n_nationkey < 3),
         |dels AS (SELECT n_nationkey AS k FROM nation WHERE n_nationkey >= 10 AND n_nationkey < 15),
         |merged AS (
         |  SELECT k, name, region FROM (
         |    SELECT d.* FROM dim d
         |    WHERE NOT EXISTS (SELECT 1 FROM ups u WHERE u.k = d.k)
         |      AND NOT EXISTS (SELECT 1 FROM dels x WHERE x.k = d.k)
         |    UNION ALL SELECT * FROM ups)),
         |updated AS (
         |  SELECT k, CASE WHEN k >= 100 THEN name || '_upd' ELSE name END AS name, region
         |  FROM merged)
         |SELECT k, name, region FROM updated
         |WHERE NOT (k >= 15 AND k < 20)
         |ORDER BY k""".stripMargin,
    "sql_merge_full" ->
      """WITH dim AS (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS region FROM nation),
         |src AS (
         |  SELECT n_nationkey AS k, n_name || '_m' AS name
         |  FROM nation WHERE n_nationkey % 3 = 0 AND n_nationkey < 15
         |  UNION ALL
         |  SELECT n_nationkey + 200 AS k, n_name || '_new' AS name
         |  FROM nation WHERE n_nationkey < 2)
         |SELECT k, name, region FROM (
         |  SELECT d.k,
         |    CASE WHEN d.region < 2 THEN d.name || '+' || s.name ELSE d.name END AS name,
         |    CASE WHEN d.region < 2 THEN d.region ELSE d.region + 10 END AS region
         |  FROM dim d JOIN src s ON d.k = s.k
         |  UNION ALL
         |  SELECT s.k, s.name, 77 AS region FROM src s
         |  WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.k = s.k)
         |  UNION ALL
         |  SELECT d.k, d.name, d.region FROM dim d
         |  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.k = d.k) AND d.k < 20)
         |ORDER BY k""".stripMargin,
    "s29_shallow_clone" ->
      """WITH dim AS (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS region FROM nation),
         |batch AS (
         |  SELECT n_nationkey AS k, n_name || '_v2' AS name, n_regionkey AS region FROM nation WHERE n_nationkey % 5 = 0
         |  UNION ALL
         |  SELECT n_nationkey + 100 AS k, n_name || '_new' AS name, n_regionkey AS region FROM nation WHERE n_nationkey < 3),
         |clone AS (
         |  SELECT d.* FROM dim d WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.k = d.k)
         |  UNION ALL SELECT * FROM batch)
         |SELECT k, name, region, side FROM (
         |  SELECT *, 'clone' AS side FROM clone
         |  UNION ALL SELECT *, 'source' AS side FROM dim)
         |ORDER BY side, k""".stripMargin,
    "j13_dpp" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS d_month,
         |  count(*) AS n_orders,
         |  SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
         |FROM orders
         |WHERE strftime(o_orderdate, '%Y-%m') LIKE '1995-%'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w8_first_last" ->
      """SELECT o_orderkey, o_custkey,
         |  first_value(o_orderkey) OVER w AS cheapest_key,
         |  last_value(o_orderkey) OVER w AS priciest_key,
         |  nth_value(o_orderkey, 2) OVER w AS second_cheapest_key
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         |ORDER BY o_orderkey""".stripMargin,
    "w9_range_frame" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
         |  (epoch_us(o_orderdate) // 86400000000)::BIGINT AS day,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
         |SELECT o_orderkey, o_custkey, day,
         |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY day
         |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_30d
         |FROM o ORDER BY o_orderkey""".stripMargin,
    "a28_skew_report" ->
      """WITH c AS (SELECT CAST(l_suppkey AS VARCHAR) AS key, count(*)::BIGINT AS cnt
         |  FROM lineitem GROUP BY 1),
         |s AS (SELECT count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS n_rows,
         |  max(cnt)::BIGINT AS max_cnt,
         |  quantile_cont(cnt, 0.5) AS p50_cnt, quantile_cont(cnt, 0.9) AS p90_cnt,
         |  quantile_cont(cnt, 0.99) AS p99_cnt FROM c),
         |t AS (SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key) AS rank
         |  FROM c QUALIFY rank <= 5)
         |SELECT rank, key, cnt, n_keys, n_rows, max_cnt, p50_cnt, p90_cnt, p99_cnt,
         |  max_cnt / (n_rows / n_keys::DOUBLE) AS skew_ratio
         |FROM t, s ORDER BY rank""".stripMargin,
    "a27_profile" ->
      """WITH p AS (
         |  SELECT 'l_orderkey' AS "column", CAST(l_orderkey AS VARCHAR) AS value FROM lineitem
         |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_quantity', CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_extendedprice', CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_discount', CAST(CAST(l_discount AS DECIMAL(18,2)) AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
         |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
         |  UNION ALL SELECT 'l_shipdate', CAST(l_shipdate AS VARCHAR) FROM lineitem)
         |SELECT "column", CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
         |  CASE WHEN "column" IN ('l_orderkey','l_partkey','l_suppkey',
         |      'l_linenumber','l_quantity','l_extendedprice','l_discount')
         |    THEN arg_min(value, TRY_CAST(value AS DOUBLE)) ELSE min(value) END AS min_val,
         |  CASE WHEN "column" IN ('l_orderkey','l_partkey','l_suppkey',
         |      'l_linenumber','l_quantity','l_extendedprice','l_discount')
         |    THEN arg_max(value, TRY_CAST(value AS DOUBLE)) ELSE max(value) END AS max_val
         |FROM p GROUP BY "column" ORDER BY "column"""".stripMargin,
    "a26_unpivot" ->
      """WITH s AS (SELECT * FROM lineitem WHERE l_orderkey % 50 = 0)
         |SELECT l_orderkey, l_linenumber, measure, value FROM (
         |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM s
         |  UNION ALL
         |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM s
         |  UNION ALL
         |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM s
         |  UNION ALL
         |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM s)
         |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    // pinned deterministic HLL estimates at sf0.01 (exact distinct
    // custkeys: 1500 total; per-status exacts within 5% of the pins) —
    // hash-based and order-independent, so stable across runs;
    // ApproxSpec holds the error bound and the union≡direct identity
    "a24_sketch_rollup" ->
      """SELECT * FROM (VALUES
         |  ('ALL', 1488::BIGINT), ('F', 1412::BIGINT),
         |  ('O', 1456::BIGINT), ('P', 1439::BIGINT))
         |  t(o_orderstatus, approx_cust)
         |ORDER BY o_orderstatus""".stripMargin,
    "u4_union_evolution" ->
      """SELECT n_nationkey AS k, n_name AS name, NULL AS origin FROM nation
         |UNION ALL
         |SELECT r_regionkey + 100 AS k, r_name AS name, 'region' AS origin FROM region
         |ORDER BY k""".stripMargin,
    "a25_bool_aggs" ->
      """SELECT o_orderstatus,
         |  count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
         |  bool_and(o_totalprice > 900.0) AS all_over_900,
         |  bool_or(o_totalprice > 400000.0) AS any_over_400k
         |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "a23_regression_slope" ->
      """WITH b AS (SELECT o_orderpriority,
         |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))::BIGINT AS x,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
         |  FROM orders),
         |agg AS (SELECT o_orderpriority, count(*)::BIGINT AS n,
         |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         |    sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
         |  FROM b GROUP BY 1)
         |SELECT o_orderpriority, n,
         |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |    AS slope_cents_per_day
         |FROM agg ORDER BY o_orderpriority""".stripMargin,
    "a22_mode" ->
      """WITH counts AS (
         |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         |  FROM orders GROUP BY 1, 2),
         |r AS (SELECT o_orderstatus, o_orderpriority,
         |  row_number() OVER (PARTITION BY o_orderstatus
         |                     ORDER BY cnt DESC, o_orderpriority ASC) AS rn
         |  FROM counts)
         |SELECT o_orderstatus, o_orderpriority AS mode_priority
         |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "w7_percent_rank_cume" ->
      """SELECT o_orderkey, o_orderstatus,
         |  percent_rank() OVER w AS pr,
         |  cume_dist() OVER w AS cd
         |FROM orders
         |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
         |ORDER BY o_orderkey""".stripMargin,
    "f6_null_handling" ->
      """SELECT o_orderkey,
         |  coalesce(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END, -1.0) AS price_or_default,
         |  nullif(o_orderstatus, 'P') AS status_or_null,
         |  (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END) IS NULL AS is_open
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "p9_date_funcs" ->
      """SELECT o_orderkey,
         |  year(CAST(o_orderdate AS DATE))::INT AS y,
         |  month(CAST(o_orderdate AS DATE))::INT AS m,
         |  day(CAST(o_orderdate AS DATE))::INT AS d,
         |  CAST(o_orderdate AS DATE) + 30 AS plus30,
         |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')::INT AS days_to_end,
         |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "p10_string_funcs" ->
      """SELECT p_partkey,
         |  upper(p_brand) AS brand_upper,
         |  substring(p_name, 1, 8) AS name_head,
         |  lpad(p_size::VARCHAR, 4, '0') AS size_padded,
         |  regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
         |  instr(p_name, 'o')::INT AS first_o,
         |  length(p_name)::INT AS name_len
         |FROM part ORDER BY p_partkey""".stripMargin,
    "j10_full_outer" ->
      """SELECT o_orderkey, o_custkey, c_custkey, c_name
         |FROM (SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey > 300) o
         |FULL OUTER JOIN
         |  (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 500) c
         |  ON o_custkey = c_custkey
         |ORDER BY o_orderkey, c_custkey""".stripMargin,
    "j12_bloom_prune" ->
      """SELECT l.l_returnflag,
         |  count(*) AS n,
         |  sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_orderpriority = '1-URGENT'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j9_range_join" ->
      """SELECT o.o_orderkey, r.r_regionkey AS band_id, o.o_totalprice
         |FROM orders o JOIN region r
         |  ON o.o_totalprice >= r.r_regionkey * 100000.0
         | AND o.o_totalprice <  r.r_regionkey * 100000.0 + 150000.0
         |ORDER BY o_orderkey, band_id""".stripMargin,
    "j8_bucketed_join" ->
      """SELECT o_orderkey, o_custkey, c_name
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_orderkey""".stripMargin,
    "j6_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
         |ORDER BY c_custkey""".stripMargin,
    "j7_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |ORDER BY c_custkey""".stripMargin,
    "u2_except" ->
      """SELECT c_custkey FROM customer
         |EXCEPT SELECT o_custkey FROM orders
         |ORDER BY c_custkey""".stripMargin,
    "u3_intersect" ->
      """SELECT c_custkey FROM customer
         |INTERSECT SELECT o_custkey FROM orders
         |ORDER BY c_custkey""".stripMargin,
    "a14_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
         |  grouping(o_orderstatus)::INT AS g_status,
         |  grouping(o_orderpriority)::INT AS g_prio,
         |  count(*) AS n
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST,
         |  g_status, g_prio""".stripMargin,
    "a13_stats" ->
      """SELECT o_orderstatus,
         |  round(avg(o_totalprice), 4) AS avg_price,
         |  round(stddev_samp(o_totalprice), 4) AS sd_price,
         |  round(var_samp(o_totalprice), 4) AS var_price,
         |  round(corr(o_totalprice, o_custkey), 4) AS corr_pc
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a9_percentile" ->
      """SELECT o_orderstatus,
         |  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) / 100.0 AS p50,
         |  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.9) / 100.0 AS p90
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // pinned boolean oracle: the GK rank-error guarantee (ApproxSpec
    // sweeps the accuracy dial; see SparkEntry.pinnedOracles)
    "a20_approx_quantile" ->
      """SELECT p::DOUBLE AS p, within_bound FROM (VALUES
         |  (0.5, true), (0.9, true), (0.99, true)) t(p, within_bound)
         |ORDER BY p""".stripMargin,
    "a16_outlier_iqr" ->
      """WITH c AS (SELECT o_orderstatus AS st,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
         |s AS (SELECT st, quantile_cont(c, 0.25) AS q1, quantile_cont(c, 0.75) AS q3
         |      FROM c GROUP BY st),
         |b AS (SELECT st, q1, q3, q1 - 1.5 * (q3 - q1) AS lo,
         |             q3 + 1.5 * (q3 - q1) AS hi FROM s),
         |n AS (SELECT c.st, count(*) AS n,
         |        sum(CASE WHEN c.c < b.lo OR c.c > b.hi THEN 1 ELSE 0 END)::BIGINT AS n_out
         |      FROM c JOIN b USING (st) GROUP BY c.st)
         |SELECT b.st, b.q1 / 100.0 AS q1, b.q3 / 100.0 AS q3,
         |  b.lo / 100.0 AS lo, b.hi / 100.0 AS hi, n.n, n.n_out
         |FROM b JOIN n USING (st) ORDER BY b.st""".stripMargin,
    "a17_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 30000.0), 19.0) AS BIGINT) AS bin,
         |  count(*) AS n, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "a10_pivot" ->
      """SELECT o_orderpriority,
         |  count(*) FILTER (o_orderstatus = 'F') AS "F",
         |  count(*) FILTER (o_orderstatus = 'O') AS "O",
         |  count(*) FILTER (o_orderstatus = 'P') AS "P"
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a11_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "a1_groupby_sum" ->
      """SELECT l_returnflag, l_linestatus,
         |  SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
         |  SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a2_dup_audit" ->
      "SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey HAVING count(*) > 1 ORDER BY o_custkey",
    "a3_global_max" ->
      "SELECT max(o_orderkey) AS max_key FROM orders",
    "a4_global_min" ->
      "SELECT CAST(min(o_orderdate) AS DATE) AS min_date FROM orders",
    "a5_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "w1_rownumber_keys" ->
      "SELECT 1 + row_number() OVER (ORDER BY n_name) AS dim_key, n_nationkey, n_name FROM nation ORDER BY dim_key",
    "w1_scalable_keys" ->
      "SELECT 1 + row_number() OVER (ORDER BY c_name) AS dim_key, c_custkey, c_name FROM customer ORDER BY dim_key",
    "w2_mono_id_structural" ->
      "SELECT count(*) AS n_rows, count(*) AS n_keys FROM supplier",
    "o1_sort" ->
      "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice FROM orders ORDER BY o_date ASC, o_totalprice DESC, o_orderkey ASC",
    "o2_limit_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10",
    "a8_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
         |  SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price,
         |  count(*) AS n
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "u1_union" ->
      """SELECT c_custkey, c_name FROM (
         |  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 <> 0
         |  UNION ALL SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0)
         |ORDER BY c_custkey""".stripMargin
  )
}
