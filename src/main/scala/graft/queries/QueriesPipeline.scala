package graft.queries

import graft.Tables.table
import graft.merge.{Scd1Merge, Scd2Merge}
import graft.ops.KeyGenStrategy
import graft.pipeline.{DimBuilder, DimSpec, FactBuilder, IngestRunner, Quarantine, SilverJob}
import graft.store.WatermarkStore
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end pipeline stages as judged queries (SURVEY.md §3, §7.1
  * steps 5-6), mapped onto the testdata star schema: `customer` plays
  * the dim source, `lineitem` the fact source.
  */
object QueriesPipeline {

  type Q = (SparkSession, String) => DataFrame

  private def tmpDir(prefix: String): String = graft.Tmp.dir(prefix)

  val queries: Map[String, Q] = Map(
    "pipe1_silver_transform" -> ((s, dir) =>
      // Bronze→Silver (silver_notebook.py:26,34): both derived columns in
      // one pass; plan should stay a single Project over the scan.
      SilverJob.transform(table(s, dir, "part"),
          splitCol = "p_type", sep = " ", catCol = "category",
          numCol = "p_retailprice", denCol = "p_size", ratioCol = "price_per_size")
        .select(col("p_partkey"), col("p_brand"), col("category"), col("price_per_size"))
        .orderBy(col("p_partkey"))),

    "pipe2_dim_build_incremental" -> ((s, dir) => {
      // Full dim lifecycle (gold_dim_branch.py trace, SURVEY.md §3.3):
      // initial load (keys start at 2, quirk Q4), an incremental batch
      // continuing from max(key), then a replayed batch that must be a
      // no-op (SCD1 idempotency, quirk Q3). Committed through the atomic
      // tmp-swap upsert each time.
      // Scalable keys: byte-identical to GlobalWindow for unique natural
      // keys (w1_rownumber_keys pins the fidelity semantics; this entry
      // runs the scale path — no single-partition WindowExec).
      val spec = DimSpec("dim_customer", Seq("c_custkey", "c_name"), "dim_key",
        distinctSource = false, keyGen = KeyGenStrategy.Scalable)
      val path = tmpDir("graft_dim") + "/dim_customer"
      val full = table(s, dir, "customer")
      val batch1 = full.filter(col("c_custkey") <= 1000)
      DimBuilder.buildAndCommit(s, batch1, spec, path, incrementalFlag = "0")
      DimBuilder.buildAndCommit(s, full, spec, path, incrementalFlag = "1")
      DimBuilder.buildAndCommit(s, full, spec, path, incrementalFlag = "1")
        .orderBy(col("dim_key"))
    }),

    "pipe4_sales_gold" -> ((s, dir) =>
      // Golden end-to-end replay of the reference's OWN data
      // (raw_data/SalesData.csv: UTF-8 BOM header, RFC-4180 quoted
      // commas, 31 empty DealerName -> null) in 3 Date_ID-watermarked
      // batches: ingest -> silver transform -> 4 dims -> fact, the full
      // medallion lifecycle per batch (SalesReplay). Deviations from
      // the notebooks, both deliberate: dims dedup their source (the
      // faithful non-distinct Q2 path and MonotonicId keys are pinned
      // in GoldenSalesSpec — non-deterministic keys can't be
      // hash-judged) and dim_date's dead-typo merge branch (Q5) is
      // implemented as the intended upsert.
      graft.pipeline.SalesReplay.run(s, tmpDir("graft_sales"))
        .orderBy(col("dim_branch_key"), col("dim_dealer_key"),
          col("dim_model_key"), col("dim_date_key"))),

    "pipe5_sales_gold_scale" -> ((s, dir) =>
      // The Q9 SCALE fix, judged: same 3-batch medallion replay as
      // pipe4, but silver is partitioned by batch watermark and each
      // batch's dims + fact are built from ONLY the new partition
      // (partition-pruned scan, cost O(batch) instead of O(table) —
      // the reference re-reads full silver every run, gold_fact.py:12).
      // Hash-judged against the SAME DuckDB oracle as pipe4: the two
      // modes must produce identical gold content.
      graft.pipeline.SalesReplay.runScale(s, tmpDir("graft_sales_scale"))
        .orderBy(col("dim_branch_key"), col("dim_dealer_key"),
          col("dim_model_key"), col("dim_date_key"))),

    "s16_scd2_dim" -> ((s, dir) => {
      // SCD2 history dim over 3 batch snapshots of customer: the
      // mktsegment attribute changes deterministically (batch 2 touches
      // custkey%3==0, batch 3 touches custkey%5==0, %5 winning where
      // both apply), so each key's history is 1-3 versioned rows with
      // (valid_from, valid_to, is_current) intervals. Replayed through
      // Scd2Merge's close-old + insert-new bucketed commit; judged
      // against a DuckDB twin that derives the same history with a
      // lag/lead window over the batch sequence. Batch 3 is also
      // REPLAYED to pin idempotency (the replay must be a no-op).
      def seg(seq: Int) = concat(col("c_mktsegment"),
        when(pmod(col("c_custkey"), lit(5)) === 0 && lit(seq >= 3), lit("+3"))
          .when(pmod(col("c_custkey"), lit(3)) === 0 && lit(seq >= 2), lit("+2"))
          .otherwise(lit("")))
      val path = tmpDir("graft_scd2") + "/dim_customer_hist"
      val cust = table(s, dir, "customer")
      for (q <- Seq(1, 2, 3, 3)) // 3 batches + idempotent replay of the last
        Scd2Merge.upsertBatch(s, path,
          cust.select(col("c_custkey"), seg(q).as("segment")),
          Seq("c_custkey"), batchSeq = q.toLong, numBuckets = 4)
      // explicit column order: the composite-key merge's USING join
      // rearranges keys first; pin the history-table contract order
      Scd1Merge.readTable(s, path)
        .select(col("c_custkey"), col("segment"), col("valid_from"),
          col("valid_to"), col("is_current"))
        .orderBy(col("c_custkey"), col("valid_from"))
    }),

    "s17_late_reprocess" -> ((s, dir) => {
      // Late-data reprocessing (SURVEY §2.6 extension), judged: run 1
      // ingests a snapshot MISSING the "late" rows (o_orderkey%97==0)
      // and advances the watermark to the max date; the late rows then
      // arrive with in-the-past dates — the faithful loop would never
      // see them. Run 2 passes a reprocessing floor below the data's
      // range: the re-scan picks the late rows up, and the keyed
      // bronze upsert lands every row EXACTLY ONCE (re-scanned rows
      // dedup on o_orderkey). Run 3 replays run 2 to pin idempotency.
      // Oracle: plain batch SQL over ALL rows, each exactly once.
      val path = tmpDir("graft_late") + "/bronze_orders"
      val store = new WatermarkStore(tmpDir("graft_late_wm"))
      store.init("0")
      val orders = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderdate"))
      val onTime = orders.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      IngestRunner.runWithReprocess(s, onTime, "o_orderdate", store, path,
        keys = Seq("o_orderkey"), numBuckets = 4)
      for (_ <- 1 to 2) // late rows arrived; reprocess from the floor, then replay
        IngestRunner.runWithReprocess(s, orders, "o_orderdate", store, path,
          keys = Seq("o_orderkey"), reprocessFloor = Some("0"), numBuckets = 4)
      Scd1Merge.readTable(s, path)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderdate"))
        .orderBy(col("o_orderkey"))
    }),

    "s18_time_travel" -> ((s, dir) => {
      // SNAPSHOT READS (time travel): three commits to a keyed table —
      // initial load, an update batch (custkey%7 rows re-segmented),
      // an insert batch — then the table is read at EVERY commit via
      // the retained manifest history (readTableAt), each snapshot
      // tagged. retainVersions=2 keeps both historical versions of
      // every rewritten bucket, so all three states reconstruct
      // exactly; the oracle derives the same three states in plain
      // SQL. This is the judged face of reader isolation: the bytes a
      // lagging reader would see ARE the snapshot.
      val path = tmpDir("graft_tt") + "/t"
      val cust = table(s, dir, "customer")
      val base = cust.select(col("c_custkey"), col("c_mktsegment").as("seg"))
      // parity split, not a key range: every batch nonempty at every SF
      // (custkey > 1000 was empty at sf0.001 — a skipped commit made
      // the snapshot count wrong there)
      val b1 = base.filter(pmod(col("c_custkey"), lit(2)) === 1)
      val b2 = b1.filter(pmod(col("c_custkey"), lit(7)) === 0)
        .withColumn("seg", concat(col("seg"), lit("+u")))
      val b3 = base.filter(pmod(col("c_custkey"), lit(2)) === 0)
      for (b <- Seq(b1, b2, b3))
        Scd1Merge.upsert(s, path, b, Seq("c_custkey"), numBuckets = 4,
          retainVersions = 2)
      Seq(2, 1, 0).map { back =>
        Scd1Merge.readTableAt(s, path, back)
          .select(lit(3L - back).as("snapshot"), col("c_custkey"), col("seg"))
      }.reduce(_.unionByName(_))
        .orderBy(col("snapshot"), col("c_custkey"))
    }),

    "s27_constraints" -> ((s, dir) => {
      // CHECK constraints + dead-letter quarantine (Delta constraint /
      // DLT expectation parity): an orders batch gates on price > 0 ∧
      // status ∈ {O,F,P} ∧ custkey NOT NULL; violations (planted by
      // construction in the synthetic data via a poisoning union)
      // land in the quarantine zone stamped with WHICH constraint
      // failed, clean rows commit. Judged artifact = the committed
      // table's rollup UNION the quarantine's per-reason counts — both
      // populations accounted, nothing silently dropped.
      val path = tmpDir("graft_constraints") + "/ord"
      val q = tmpDir("graft_constraints") + "/quarantine"
      val base = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      // poison 1 in 50 rows deterministically: negative price; plus a
      // bogus-status batch — both constraint legs provably fire
      val poisoned = base.withColumn("o_totalprice",
          when(col("o_orderkey") % 50 === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 97 === 0, lit("ZZ"))
            .otherwise(col("o_orderstatus")))
      Quarantine.upsertWithConstraints(s, path, poisoned, Seq("o_orderkey"),
        Map("price_positive" -> (col("o_totalprice") > 0),
            "status_known" -> col("o_orderstatus").isin("O", "F", "P")),
        q, batchId = "b1", numBuckets = 8)
      val good = Scd1Merge.readTable(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .select(lit("committed").as("side"), col("o_orderstatus").as("k"), col("n"))
      val bad = s.read.parquet(q)
        .groupBy(col("__violations"))
        .agg(count(lit(1)).as("n"))
        .select(lit("quarantined").as("side"), col("__violations").as("k"), col("n"))
      good.unionByName(bad).orderBy(col("side"), col("k"))
    }),

    "s26_update" -> ((s, dir) => {
      // Delta `UPDATE ... SET` parity: open orders get a 10% price
      // uplift IN PLACE — the stats-pruned delete probe finds matching
      // buckets, only those rewrite, keys are immutable (spec pins the
      // key-SET rejection). Exact-cents rollup proves updated and
      // untouched populations; the x1.1 double multiply is one IEEE op
      // on both engines, so cents round identically.
      val path = tmpDir("graft_update") + "/ord"
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      Scd1Merge.upsert(s, path, o, Seq("o_orderkey"), numBuckets = 8)
      Scd1Merge.update(s, path, Seq("o_orderkey"),
        col("o_orderstatus") === "O",
        Map("o_totalprice" -> col("o_totalprice") * 1.1))
      Scd1Merge.readTable(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          graft.Tables.sumMoney(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    "s24_delete" -> ((s, dir) => {
      // Delta `DELETE FROM` parity as a first-class judged entry (the
      // delete engine already drives pipe7/pipe8 and the specs; this is
      // its standalone face): load orders, DELETE WHERE %13 = 0 (the
      // stats-pruned probe scans only buckets the predicate can match,
      // only matched buckets rewrite), then a key-equality delete that
      // hash-prunes to exactly ONE bucket. Judged artifact = exact-cents
      // rollup of the survivors — deleted and untouched populations both
      // accounted.
      val path = tmpDir("graft_delete") + "/ord"
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      Scd1Merge.upsert(s, path, o, Seq("o_orderkey"), numBuckets = 8)
      Scd1Merge.delete(s, path, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(13)) === 0)
      Scd1Merge.delete(s, path, Seq("o_orderkey"), col("o_orderkey") === 32L)
      Scd1Merge.readTable(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          graft.Tables.sumMoney(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    "s28_restore" -> ((s, dir) => {
      // RESTORE TO VERSION (Delta RESTORE parity): three commits — load
      // odd keys, update the %7 subset (+u), insert the evens — then
      // restore 2 commits back to the initial state as a NEW commit:
      // zero data movement, one manifest swap re-referencing the
      // retained bucket versions (restoring a 100 TB table costs the
      // same swap). Judged artifact = (a) the change feed ACROSS the
      // restore commit — the honest reverse diff: b3's inserts come
      // back as deletes, b2's updates as updates back to the old
      // image — and (b) the final state after a post-restore upsert
      // (+r on the %5 keys), proving the restored table is live and
      // writable. The oracle re-derives both legs in plain SQL.
      val path = tmpDir("graft_restore") + "/t"
      val base = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val b1 = base.filter(pmod(col("c_custkey"), lit(2)) === 1)
      val b2 = b1.filter(pmod(col("c_custkey"), lit(7)) === 0)
        .withColumn("seg", concat(col("seg"), lit("+u")))
      val b3 = base.filter(pmod(col("c_custkey"), lit(2)) === 0)
      for (b <- Seq(b1, b2, b3))
        Scd1Merge.upsert(s, path, b, Seq("c_custkey"), numBuckets = 4,
          retainVersions = 3)
      Scd1Merge.restore(path, commitsBack = 2, retainVersions = 3)
      val b4 = b1.filter(pmod(col("c_custkey"), lit(5)) === 0)
        .withColumn("seg", concat(col("seg"), lit("+r")))
      Scd1Merge.upsert(s, path, b4, Seq("c_custkey"), numBuckets = 4,
        retainVersions = 3)
      // commits: 1=b1 2=b2 3=b3 4=restore 5=b4 — the restore diff is
      // (2 back → 1 back); offsets resolved AFTER b4 so no laziness
      // races against the post-restore rewrite
      val feed = Scd1Merge.readChanges(s, path, Seq("c_custkey"), 2, 1)
        .select(lit("restore_feed").as("part"), col("c_custkey"), col("seg"),
          col("_change_type").as("change"))
      val fin = Scd1Merge.readTable(s, path)
        .select(lit("final").as("part"), col("c_custkey"), col("seg"),
          lit("").as("change"))
      feed.unionByName(fin)
        .orderBy(col("part"), col("c_custkey"), col("change"))
    }),

    "s19_change_feed" -> ((s, dir) => {
      // CHANGE DATA FEED over the snapshot history (Delta CDF parity):
      // four commits — load ≤1000, update %7 keys, insert >1000, then
      // DELETE FROM WHERE %13 = 0 — and the judged artifact is the
      // union of every per-commit delta read via readChanges: commit
      // 2's feed is the updated rows as BOTH images (`update` = new,
      // `update_preimage` = old — the Delta pre/postimage pair),
      // commit 3's the inserts, commit 4's the deleted rows (OLD image).
      // Manifest-diff bucket pruning makes each read O(changed
      // buckets); the oracle re-derives all three deltas in plain SQL.
      val path = tmpDir("graft_cdf") + "/t"
      val cust = table(s, dir, "customer")
      val base = cust.select(col("c_custkey"), col("c_mktsegment").as("seg"))
      // parity split — same SF-robustness rationale as s18
      val b1 = base.filter(pmod(col("c_custkey"), lit(2)) === 1)
      val b2 = b1.filter(pmod(col("c_custkey"), lit(7)) === 0)
        .withColumn("seg", concat(col("seg"), lit("+u")))
      val b3 = base.filter(pmod(col("c_custkey"), lit(2)) === 0)
      for (b <- Seq(b1, b2, b3))
        Scd1Merge.upsert(s, path, b, Seq("c_custkey"), numBuckets = 4,
          retainVersions = 3)
      Scd1Merge.delete(s, path, Seq("c_custkey"),
        pmod(col("c_custkey"), lit(13)) === 0, retainVersions = 3)
      Seq((3, 2, 2L), (2, 1, 3L), (1, 0, 4L)).map { case (from, to, commit) =>
        Scd1Merge.readChanges(s, path, Seq("c_custkey"), from, to)
          .select(lit(commit).as("commit"), col("c_custkey"), col("seg"),
            col("_change_type"))
      }.reduce(_.unionByName(_))
        .orderBy(col("commit"), col("c_custkey"))
    }),

    "s20_rebucket" -> ((s, dir) => {
      // Bucket-count resizing (the create-time sizing dial re-applied
      // as a table grows): load at 2 buckets, rebucket to 8 (one
      // full-rewrite commit through the standard protocol), then keep
      // upserting at the new layout — content must equal the plain
      // batch state throughout. The post-rebucket upsert declares
      // numBuckets=8 explicitly, proving the new layout took.
      val path = tmpDir("graft_rebkt") + "/t"
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      Scd1Merge.upsert(s, path, c.filter(col("c_custkey") <= 1000),
        Seq("c_custkey"), numBuckets = 2)
      Scd1Merge.rebucket(s, path, Seq("c_custkey"), 8)
      Scd1Merge.upsert(s, path, c.filter(col("c_custkey") > 1000),
        Seq("c_custkey"), numBuckets = 8)
      Scd1Merge.readTable(s, path)
        .select(col("c_custkey"), col("seg"))
        .orderBy(col("c_custkey"))
    }),

    "s21_data_skipping" -> ((s, dir) => {
      // DATA SKIPPING, judged (Delta file-skipping parity over the
      // manifest, gold_dim_branch.py:177-184's reliance re-expressed):
      // orders keyed on o_orderkey with o_orderdate + o_totalprice as
      // declared stats columns; the judged result is a key-equality
      // read (hash-pruned to ONE bucket) unioned with a date-range +
      // price read (min/max-pruned) through readTableWhere. Pruning is
      // metadata-only — the result must be exactly what a plain filter
      // over the full table returns, which is what the oracle derives.
      val path = tmpDir("graft_skip") + "/orders"
      val o = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
      Scd1Merge.upsert(s, path, o, Seq("o_orderkey"), numBuckets = 16,
        statsColumns = Seq("o_orderdate", "o_totalprice"))
      def utcTs(iso: String) = java.sql.Timestamp.from(
        java.time.LocalDateTime.parse(iso).toInstant(java.time.ZoneOffset.UTC))
      val eq = Scd1Merge.readTableWhere(s, path, col("o_orderkey") === 7L)
      val rng = Scd1Merge.readTableWhere(s, path,
        col("o_orderdate") >= lit(utcTs("1995-01-01T00:00:00")) &&
        col("o_orderdate") < lit(utcTs("1995-02-01T00:00:00")) &&
        col("o_totalprice") > lit(200000.0))
      eq.unionByName(rng)
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("o_date"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    "s22_zorder_cluster" -> ((s, dir) => {
      // Z-ORDER CLUSTERING (Delta OPTIMIZE ZORDER BY parity): rewrite
      // lineitem clustered on (l_orderkey, l_partkey) — equi-depth
      // Morton binning, range-partitioned, sorted within files — then
      // answer a two-column range query FROM THE CLUSTERED LAYOUT.
      // Correctness gate: the clustered copy must be content-complete
      // (the oracle derives from the original table); the skipping
      // payoff (both columns prune files) is pinned by ZOrderSpec.
      val path = tmpDir("graft_zorder") + "/lineitem_z"
      val li = table(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"))
      graft.store.ZOrder.writeClustered(s, li, path,
        Seq("l_orderkey", "l_partkey"), numFiles = 16)
      s.read.parquet(path)
        .filter(col("l_orderkey").between(1000L, 3000L) &&
                col("l_partkey").between(50L, 250L))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          min(col("l_suppkey")).as("min_supp"),
          max(col("l_extendedprice")).as("max_price"))
    }),

    "s23_recluster" -> ((s, dir) => {
      // WITHIN-BUCKET Z-ORDER MAINTENANCE (Delta OPTIMIZE ZORDER BY
      // over the hash-bucketed layout): lineitem upserted on its
      // composite key, reclustered by (l_partkey, l_suppkey) Morton
      // order through the standard commit protocol, then answered
      // FROM THE RECLUSTERED TABLE via the stats read path with a
      // two-column range predicate. Content must equal the plain
      // filter over the source; row-group tightening is pinned by
      // ReclusterSpec.
      val path = tmpDir("graft_recluster") + "/li"
      val li = table(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
      Scd1Merge.upsert(s, path, li, Seq("l_orderkey", "l_linenumber"),
        numBuckets = 8)
      Scd1Merge.recluster(s, path, Seq("l_partkey", "l_suppkey"),
        zOrderBits = 5)
      // a delete rewrites (and so un-clusters) SOME buckets; the
      // dirty-only maintenance pass re-sorts just those (manifest
      // markers — see recluster), the rest keep their sorted files
      Scd1Merge.delete(s, path, Seq("l_orderkey", "l_linenumber"),
        col("l_orderkey") <= 100)
      Scd1Merge.recluster(s, path, Seq("l_partkey", "l_suppkey"),
        zOrderBits = 5, dirtyOnly = true)
      Scd1Merge.readTableWhere(s, path,
          col("l_partkey").between(100L, 300L) && col("l_suppkey") <= 60L)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"))
    }),

    "pipe6_batch_recovery" -> ((s, dir) => {
      // CROSS-TABLE BATCH CONSISTENCY (VERDICT r5 ask #8), judged:
      // a two-table pipeline (customer dim -> orders fact) runs batch
      // B0001 fully, then batch B0002 "crashes" between the dim and
      // fact commits — the fact commit is INJECTED to fail mid-
      // protocol (before-manifest), exactly the torn state a real
      // crash leaves. Pipeline.verifyConsistent must (a) call the
      // completed run consistent, (b) detect the torn run and name the
      // fact table as the rerun target, (c) call the idempotent rerun
      // (dim re-commit = content no-op re-stamp; fact commit lands)
      // consistent again. The probe outcomes ride as literal columns
      // on the repaired fact content, which the oracle re-derives —
      // wrong detection or wrong repair both break the hash.
      import graft.pipeline.Pipeline
      val base = tmpDir("graft_batchrec")
      val dimPath = base + "/dim_customer"
      val factPath = base + "/fact_orders"
      val spec = DimSpec("dim_customer", Seq("c_custkey"), "dim_key",
        distinctSource = true, keyGen = KeyGenStrategy.Scalable)
      val cust = table(s, dir, "customer").select(col("c_custkey"))
      val ords = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          col("o_totalprice"))
      // batch membership by key MODULO, not range: nonempty at every
      // SF (a range split left batch 2 empty at sf0.001, so the
      // injected crash never fired there)
      val inB1 = pmod(col("c_custkey"), lit(3)) =!= 2
      def factOf(batchCond: org.apache.spark.sql.Column) = FactBuilder.resolve(
        ords.filter(batchCond),
        measures = Seq("o_orderkey", "o_totalprice"),
        dims = Seq((Scd1Merge.readTable(s, dimPath), Seq("c_custkey"), "dim_key")))
      // batch B0001: dim + fact both commit, then the batch PUBLISHES
      // (one atomic pointer flip covering both tables — r7 ask #3)
      import graft.pipeline.Publish
      DimBuilder.buildAndCommit(s, cust.filter(inB1), spec,
        dimPath, incrementalFlag = "0", batchId = "B0001")
      FactBuilder.commit(s, factPath, factOf(inB1),
        Seq("o_orderkey"), batchId = "B0001")
      val r1 = Pipeline.verifyConsistent(Seq(dimPath, factPath))
      Publish.publish(base, Map("dim" -> dimPath, "fact" -> factPath), "B0001")
      val dimRowsB1 = Scd1Merge.readTable(s, dimPath).count()
      // batch B0002: dim commits, fact commit dies mid-protocol
      DimBuilder.buildAndCommit(s, cust, spec, dimPath, batchId = "B0002")
      Scd1Merge.testFailpoint = "before-manifest"
      val crashed =
        try { FactBuilder.commit(s, factPath, factOf(!inB1),
                Seq("o_orderkey"), batchId = "B0002"); false }
        catch { case _: IllegalStateException => true }
        finally Scd1Merge.testFailpoint = "" // never leak into later queries
      val r2 = Pipeline.verifyConsistent(Seq(dimPath, factPath))
      // PREVENTION, not just detection: a reader resolving through the
      // pipeline pointer mid-crash still sees the OLD consistent set —
      // the dim's B0002 commit is pinned away, the fact never moved
      val isolated =
        Publish.readPublished(s, base, "dim").count() == dimRowsB1 &&
        Publish.published(base).exists(_._1 == "B0001")
      // repair = rerun batch B0002 start to finish (idempotent), then
      // the rerun publishes — the only moment B0002 becomes visible
      DimBuilder.buildAndCommit(s, cust, spec, dimPath, batchId = "B0002")
      FactBuilder.commit(s, factPath, factOf(!inB1),
        Seq("o_orderkey"), batchId = "B0002")
      val r3 = Pipeline.verifyConsistent(Seq(dimPath, factPath))
      Publish.publish(base, Map("dim" -> dimPath, "fact" -> factPath), "B0002")
      Publish.readPublished(s, base, "fact")
        .select(col("o_orderkey"), col("dim_key"), col("o_totalprice"),
          lit(r1.consistent).as("b1_consistent"),
          lit(crashed && r2.behind == Seq(factPath) &&
            r2.head.contains("B0002")).as("crash_detected"),
          lit(isolated).as("publish_isolated"),
          lit(r3.consistent).as("repaired_consistent"))
        .orderBy(col("o_orderkey"))
    }),

    "pipe7_incremental_agg" -> ((s, dir) => {
      // INCREMENTAL AGGREGATE MAINTENANCE (IncrementalAgg), judged: a
      // per-customer revenue aggregate maintained purely from the base
      // table's change feed across 4 commits — load, measure update,
      // insert, then a delete that both decrements groups (%13 orders)
      // and kills whole groups (%11 customers). After bootstrap the
      // base is NEVER rescanned; the oracle recomputes from the final
      // base state, so any drift in the delta algebra (double-counted
      // update, missed preimage, undead group) breaks the hash.
      // Measures ride as integer cents: abelian-group maintenance is
      // exact only for exact types.
      import graft.pipeline.IncrementalAgg
      import graft.pipeline.IncrementalAgg.AggSpec
      val base = tmpDir("graft_incagg")
      val ordT = base + "/orders"
      val aggT = base + "/agg_by_cust"
      val o = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val spec = AggSpec(Seq("o_custkey"), Seq("cents" -> "sum_cents"), "n_orders")
      val b1 = o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      Scd1Merge.upsert(s, ordT, b1, Seq("o_orderkey"), numBuckets = 8)
      IncrementalAgg.bootstrap(s, aggT, Scd1Merge.readTable(s, ordT), spec,
        numBuckets = 4)
      val b2 = b1.filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .withColumn("cents", col("cents") + 100L)
      val b3 = o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      for (b <- Seq(b2, b3)) {
        Scd1Merge.upsert(s, ordT, b, Seq("o_orderkey"))
        IncrementalAgg.applyChanges(s, aggT, ordT, Seq("o_orderkey"), spec)
      }
      Scd1Merge.delete(s, ordT, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(13)) === 0 || pmod(col("o_custkey"), lit(11)) === 0)
      IncrementalAgg.applyChanges(s, aggT, ordT, Seq("o_orderkey"), spec)
      Scd1Merge.readTable(s, aggT)
        .select(col("o_custkey"), col("sum_cents"), col("n_orders"))
        .orderBy(col("o_custkey"))
    }),

    "pipe15_cdc_scd2" -> ((s, dir) => {
      // CDC FEEDS THE HISTORY DIM: the upstream SCD1 dim's commit
      // stream (ChangeStream) maintains a downstream SCD2 history
      // table (Scd2Merge.applyChanges) — the medallion leg a
      // full-snapshot SCD2 load cannot express, because a change feed
      // names only the moved keys and carries DELETES. Four upstream
      // commits: snapshot, %5 rename (close+reopen), %9 hard delete
      // (close with NO successor), %18 re-insert (a fresh version
      // after the history ended). batchSeq = the delivered commit
      // number, so validity intervals ARE commit numbers and a
      // replayed trigger delivers nothing. The oracle derives every
      // key's version set from the rules; a missed close, phantom
      // successor, or re-opened delete breaks the hash.
      import graft.merge.Scd2Merge
      import graft.streaming.ChangeStream
      val root = tmpDir("graft_cdcscd2")
      val up = root + "/dim_customer"; val hist = root + "/dim_history"
      val ckpt = root + "/ckpt"
      val c = table(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_name").as("name"))
      val K = Seq("k")
      def sync(): Int =
        ChangeStream.runAvailableNow(s, up, K, ckpt) { (changes, bid) =>
          Scd2Merge.applyChanges(s, hist, changes, K,
            batchSeq = bid.split("@")(1).toLong, numBuckets = 4)
        }
      Scd1Merge.upsert(s, up, c, K, numBuckets = 4, retainVersions = 8)
      sync()
      Scd1Merge.upsert(s, up,
        c.filter(col("k") % 5 === 0)
          .withColumn("name", concat(col("name"), lit("_v2"))),
        K, retainVersions = 8)
      sync()
      Scd1Merge.delete(s, up, K, col("k") % 9 === 0, retainVersions = 8)
      sync()
      Scd1Merge.upsert(s, up,
        c.filter(col("k") % 18 === 0)
          .withColumn("name", concat(col("name"), lit("_back"))),
        K, retainVersions = 8)
      val delivered = sync()
      assert(delivered == 1 && sync() == 0,
        "the replayed trigger must deliver nothing")
      Scd1Merge.readTable(s, hist)
        .select(col("k"), col("name"), col("valid_from"), col("valid_to"),
          col("is_current"))
        .orderBy(col("k"), col("valid_from"))
    }),

    "pipe14_incremental_join_mv" -> ((s, dir) => {
      // INCREMENTAL JOIN-MV (delta-rule view maintenance, the step up
      // from pipe7's single-table aggregate): the star-schema gold
      // view γ_{custkey, Σcents}(lineitem ⋈ orders) maintained from
      // the two tables' CHANGE FEEDS via the exact bilinear rule
      // Δ(F⋈D) = ΔF⋈D_new ∪ F_old⋈ΔD (IncrementalJoinAgg). The run
      // exercises both legs: a fact batch that inserts the even
      // orders' lines AND re-prices %13==3 lines (+50, preimage
      // algebra), then a dim batch that MOVES %10==1 orders to a new
      // custkey (+10000) — every affected line's mass must migrate
      // between groups without a rescan of either base table. The
      // oracle recomputes the view from the final base states; any
      // missed preimage, double-applied delta, or unmoved group
      // breaks the hash.
      import graft.pipeline.IncrementalAgg.AggSpec
      import graft.pipeline.IncrementalJoinAgg
      val base = tmpDir("graft_joinmv")
      val factP = base + "/fact_lineitem"
      val dimP = base + "/dim_orders"
      val mv = base + "/mv_by_custkey"
      val R = 5
      val spec = AggSpec(Seq("custkey"), Seq("cents" -> "sum_cents"), "n_lines")
      // the synthetic lineitem is NOT unique on (orderkey, linenumber)
      // — pre-aggregate to a line-level fact so the merge key is
      // genuine (the oracle mirrors the same grouping). SF-CAP
      // (orderkey < 10000, the s31/s33 precedent): the op under test
      // is the delta ALGEBRA — six commits of fixture load scaling
      // with SF measured 17 s at sf0.1 while teaching nothing new
      // about the deltas.
      val li = table(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      val ord = table(s, dir, "orders")
        .filter(col("o_orderkey") < 10000)
        .select(col("o_orderkey"), col("o_custkey").as("custkey"))
      val FK = Seq("l_orderkey", "l_linenumber")
      val DK = Seq("o_orderkey")
      Scd1Merge.upsert(s, factP,
        li.filter(pmod(col("l_orderkey"), lit(2)) === 1), FK,
        numBuckets = 8, retainVersions = R)
      Scd1Merge.upsert(s, dimP, ord, DK, numBuckets = 4, retainVersions = R)
      IncrementalJoinAgg.bootstrap(s, mv,
        Scd1Merge.readTable(s, factP), Scd1Merge.readTable(s, dimP),
        "l_orderkey", "o_orderkey", spec, numBuckets = 4, batchId = "boot")
      Scd1Merge.upsert(s, factP,
        li.filter(pmod(col("l_orderkey"), lit(2)) === 0 ||
            pmod(col("l_orderkey"), lit(13)) === 3)
          .withColumn("cents", col("cents") +
            when(pmod(col("l_orderkey"), lit(13)) === 3, 50L).otherwise(0L)),
        FK, retainVersions = R)
      IncrementalJoinAgg.applyChanges(s, mv, factP, FK, dimP, DK,
        "l_orderkey", "o_orderkey", spec, factBack = Some((1, 0)))
      Scd1Merge.upsert(s, dimP,
        ord.filter(pmod(col("o_orderkey"), lit(10)) === 1)
          .withColumn("custkey", col("custkey") + 10000L),
        DK, retainVersions = R)
      IncrementalJoinAgg.applyChanges(s, mv, factP, FK, dimP, DK,
        "l_orderkey", "o_orderkey", spec, dimBack = Some((1, 0)))
      Scd1Merge.readTable(s, mv)
        .select(col("custkey"), col("sum_cents"), col("n_lines"))
        .orderBy(col("custkey"))
    }),

    "pipe16_incremental_distinct_mv" -> ((s, dir) => {
      // COUNT(DISTINCT) VIEW MAINTENANCE — the canonical aggregate
      // IncrementalAgg's abelian contract REFUSES (a deleted value
      // only lowers the count if it was the group's last copy),
      // maintained exactly by composing two abelian layers: a
      // (supp, part)-keyed multiplicity table whose zero-count
      // tombstone sweep is the last-copy-died detector, and a
      // distinct-count table fed by the MULT table's own change feed
      // (insert = value born +1, delete = value died −1, update =
      // multiplicity move, nets 0). See IncrementalDistinct. The run
      // exercises every transition: bootstrap on odd orders, a value
      // MOVE (part%5==0 → part+1: possible death of the old value AND
      // birth of the new, same batch), an insert wave (evens), then a
      // delete that decrements multiplicities (%13 orders) and kills
      // whole groups (%11 supps). Same SF-cap as pipe14 (orderkey <
      // 10000): the judged object is the transition algebra, not
      // fixture load. The oracle recomputes COUNT(DISTINCT) from the
      // final base state; a missed last-copy death, an undead value,
      // or a double-counted birth breaks the hash.
      import graft.pipeline.IncrementalDistinct
      import graft.pipeline.IncrementalDistinct.Spec
      val base = tmpDir("graft_dcmv")
      val baseT = base + "/fact_lines"
      val multT = base + "/mult_supp_part"
      val dcT = base + "/dc_by_supp"
      val FK = Seq("l_orderkey", "l_linenumber")
      // line-level base keyed on (orderkey, linenumber) — the synthetic
      // lineitem is not unique on that pair (pipe14 precedent)
      val li = table(s, dir, "lineitem").filter(col("l_orderkey") < 10000)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min(col("l_suppkey")).as("supp"), min(col("l_partkey")).as("part"))
      val spec = Spec(Seq("supp"), "part")
      val b1 = li.filter(pmod(col("l_orderkey"), lit(2)) === 1)
      Scd1Merge.upsert(s, baseT, b1, FK, numBuckets = 8)
      IncrementalDistinct.bootstrap(s, multT, dcT,
        Scd1Merge.readTable(s, baseT), spec, numBuckets = 4)
      val b2 = b1.filter(pmod(col("part"), lit(5)) === 0)
        .withColumn("part", col("part") + 1L)
      val b3 = li.filter(pmod(col("l_orderkey"), lit(2)) === 0)
      for (b <- Seq(b2, b3)) {
        Scd1Merge.upsert(s, baseT, b, FK)
        IncrementalDistinct.applyChanges(s, multT, dcT, baseT, FK, spec)
      }
      Scd1Merge.delete(s, baseT, FK,
        pmod(col("l_orderkey"), lit(13)) === 0 ||
        pmod(col("supp"), lit(11)) === 0)
      IncrementalDistinct.applyChanges(s, multT, dcT, baseT, FK, spec)
      Scd1Merge.readTable(s, dcT)
        .select(col("supp"), col("n_distinct"))
        .orderBy(col("supp"))
    }),

    "pipe13_stream_medallion" -> ((s, dir) => {
      // STREAMING MEDALLION CHAIN — the reference's architecture
      // (bronze→silver→gold as SEPARATE jobs, silver_notebook.py:59-62
      // → gold_fact.py:12) as a DECOUPLED table-to-table streaming
      // chain: the gold job consumes the silver TABLE's commit stream
      // (ChangeStream — stream_table_source's source) and maintains
      // its aggregate from the delivered feed alone
      // (IncrementalAgg.applyChangesFrame) — silver is never rescanned
      // after the first snapshot batch, offsets are durable, and a
      // replayed trigger delivers nothing (pinned in-row). Five silver
      // commits: three ingest batches, a group-MOVING update (%17 →
      // status 'X': −old +new through the preimage algebra), a delete
      // (%23); gold syncs after each. The oracle recomputes from the
      // final silver state in plain SQL, so any drift in the chain —
      // missed commit, double-applied batch, broken preimage — breaks
      // the hash.
      import graft.pipeline.IncrementalAgg
      import graft.pipeline.IncrementalAgg.AggSpec
      import graft.streaming.ChangeStream
      val base = tmpDir("graft_medallion")
      val silver = base + "/silver_orders"
      val gold = base + "/gold_by_status"
      val ckpt = base + "/gold_ckpt"
      val spec = AggSpec(Seq("o_orderstatus"), Seq("cents" -> "sum_cents"), "n_orders")
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      def syncGold(): Int =
        ChangeStream.runAvailableNow(s, silver, Seq("o_orderkey"), ckpt) {
          (changes, bid) =>
            IncrementalAgg.applyChangesFrame(s, gold, changes, spec,
              numBuckets = 4, stamp = bid)
        }
      for (m <- 0 to 2) {
        Scd1Merge.upsert(s, silver,
          o.filter(pmod(col("o_orderkey"), lit(3)) === m),
          Seq("o_orderkey"), numBuckets = 8)
        syncGold()
      }
      Scd1Merge.update(s, silver, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(17)) === 0,
        Map("o_orderstatus" -> lit("X")))
      syncGold()
      Scd1Merge.delete(s, silver, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(23)) === 0)
      val replayNoop = syncGold() >= 1 && syncGold() == 0
      Scd1Merge.readTable(s, gold)
        .select(col("o_orderstatus"), col("sum_cents"), col("n_orders"),
          lit(replayNoop).as("replay_noop"))
        .orderBy(col("o_orderstatus"))
    }),

    "pipe18_stream_star" -> ((s, dir) => {
      // THE FULL STAR SCHEMA AS DECOUPLED STREAMING JOBS (VERDICT r8
      // ask #5): the reference's gold layer (4 dim notebooks + fact,
      // gold_fact.py:34-38) re-architected so silver is a bucketed
      // TABLE and every gold job — each dim AND the fact — is an
      // independent ChangeStream consumer with its OWN durable
      // checkpoint. Per silver commit: each dim consumer receives the
      // delta (first delivery = the snapshot), mints surrogate keys
      // for unseen naturals (delta ≡ full-silver build — a natural in
      // an older batch was keyed when it arrived, the runScale
      // argument); the fact consumer then resolves FKs against the
      // incrementally-maintained dim TABLES and composite-merges. No
      // job ever rescans silver (O(delta) per trigger); offsets are
      // durable per consumer, so any job can lag and catch up
      // independently. Final fact state must hash-match the pipe4
      // fidelity replay's DuckDB oracle, and a replayed trigger on
      // EVERY consumer must deliver nothing (enforced in-query).
      import graft.pipeline.SalesReplay
      import graft.streaming.ChangeStream
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      val prevCsv = s.conf.getOption("spark.sql.csv.filterPushdown.enabled")
      s.conf.set("spark.sql.shuffle.partitions", 4)
      s.conf.set("spark.sql.csv.filterPushdown.enabled", "false")
      try {
        val root = tmpDir("graft_star18")
        val silverT = root + "/silver"
        val naturals = Seq("Branch_ID", "Dealer_ID", "Model_ID", "Date_ID")
        val raw = SalesReplay.readSalesCsv(s)
        def syncDims(): Int = SalesReplay.dimSpecs.map { sp =>
          ChangeStream.runAvailableNow(s, silverT, naturals,
            s"$root/ckpt_${sp.name}") { (changes, bid) =>
            val newRows = changes
              .filter(col("_change_type").isin("insert", "update"))
              .drop("_change_type")
            val first = !Scd1Merge.tableExists(s"$root/${sp.name}")
            DimBuilder.buildAndCommit(s, newRows, sp, s"$root/${sp.name}",
              incrementalFlag = if (first) "0" else "1", numBuckets = 4,
              batchId = bid)
            ()
          }
        }.sum
        def syncFact(): Int =
          ChangeStream.runAvailableNow(s, silverT, naturals,
            s"$root/ckpt_fact") { (changes, bid) =>
            val newRows = changes
              .filter(col("_change_type").isin("insert", "update"))
              .drop("_change_type")
            val dims = SalesReplay.dimSpecs.map(sp =>
              (sp, Scd1Merge.readTable(s, s"$root/${sp.name}")))
            val fact = FactBuilder.resolve(newRows, Seq("Revenue", "Units_Sold"),
              dims.map { case (sp, d) => (d, sp.naturalKeys, sp.keyCol) })
            FactBuilder.commit(s, s"$root/factsales", fact,
              SalesReplay.dimSpecs.map(_.keyCol), numBuckets = 4, batchId = bid)
          }
        var last = "DT00000"
        Seq("DT00400", "DT00800", "DT99999").foreach { cut =>
          val batch = raw.filter(col("Date_ID") > lit(last) && col("Date_ID") <= lit(cut))
          val transformed = SilverJob.transform(batch, "Model_ID", "-",
            "model_category", "Revenue", "Units_Sold", "revenue_per_unit")
          Scd1Merge.upsert(s, silverT, transformed, naturals, numBuckets = 4,
            batchId = s"wm@$cut")
          syncDims(); syncFact()
          last = cut
        }
        // exactly-once: a replayed trigger on every consumer delivers 0
        val replayed = syncDims() + syncFact()
        if (replayed != 0) throw new IllegalStateException(
          s"replayed triggers must deliver nothing, got $replayed batches")
        Scd1Merge.readTable(s, s"$root/factsales")
          .orderBy(col("dim_branch_key"), col("dim_dealer_key"),
            col("dim_model_key"), col("dim_date_key"))
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        prevCsv match {
          case Some(v) => s.conf.set("spark.sql.csv.filterPushdown.enabled", v)
          case None => s.conf.unset("spark.sql.csv.filterPushdown.enabled")
        }
      }
    }),

    "pipe19_mv_rewrite" -> ((s, dir) => {
      // TRANSPARENT MV QUERY REWRITE (GraftMvRewrite), judged: the
      // user's plain aggregate over the BASE table is answered from
      // the O(delta)-maintained aggregate table — query text never
      // changes, the optimizer swaps the scan when (and only when)
      // the MV is provably FRESH. Base lifecycle mirrors
      // pipe7_incremental_agg (load, measure update, insert, group-
      // killing delete); the MV here carries a 2-level group
      // (priority, custkey) and the judged query ROLLS UP to priority
      // — sum/count re-aggregate, avg lowers to sum/sum. In-row
      // requires pin the mechanism: the stale window (base commit not
      // yet folded) must read the BASE, the fresh query must read
      // ONLY the MV's files; the DuckDB oracle recomputes the answer
      // from the final base content, so a rewrite that lied about
      // values would break the hash.
      import graft.pipeline.IncrementalAgg
      import graft.pipeline.IncrementalAgg.AggSpec
      import graft.plans.GraftMvRewrite
      val root = tmpDir("graft_mvrw")
      val ordT = root + "/orders"; val mvT = root + "/mv"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val spec = AggSpec(Seq("o_orderpriority", "o_custkey"),
        Seq("cents" -> "sum_cents"), "n_orders")
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def q(): DataFrame =
        Scd1Merge.readTable(s, ordT).groupBy(col("o_orderpriority"))
          .agg(sum(col("cents")).as("sum_cents"),
            count(lit(1)).as("n_orders"), avg(col("cents")).as("avg_raw"))
          .select(col("o_orderpriority"), col("sum_cents"),
            col("n_orders"), round(col("avg_raw"), 4).as("avg_cents"))
          .orderBy(col("o_orderpriority"))
      val b1 = o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      Scd1Merge.upsert(s, ordT, b1, Seq("o_orderkey"), numBuckets = 8)
      // the avg lowering divides by the MV's count(*) — sound only
      // for a PROVEN non-null measure; the enforced CHECK is that
      // proof (parquet scan attributes are always nullable)
      Scd1Merge.addConstraint(s, ordT, "cents_nn", "cents IS NOT NULL")
      IncrementalAgg.bootstrapFrom(s, mvT, ordT, spec, numBuckets = 4)
      GraftMvRewrite.register(ordT, mvT, spec)
      val b2 = b1.filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .withColumn("cents", col("cents") + 100L)
      Scd1Merge.upsert(s, ordT, b2, Seq("o_orderkey"))
      // STALE WINDOW: the unfolded commit must route the query to the base
      val stale = scansOf(q())
      require(stale.nonEmpty && stale.forall(_.contains(ordT + "/")),
        s"stale MV answered the query: $stale")
      IncrementalAgg.applyChanges(s, mvT, ordT, Seq("o_orderkey"), spec)
      val b3 = o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      Scd1Merge.upsert(s, ordT, b3, Seq("o_orderkey"))
      IncrementalAgg.applyChanges(s, mvT, ordT, Seq("o_orderkey"), spec)
      Scd1Merge.delete(s, ordT, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(13)) === 0 || pmod(col("o_custkey"), lit(11)) === 0)
      IncrementalAgg.applyChanges(s, mvT, ordT, Seq("o_orderkey"), spec)
      // FRESH: the same query text now reads ONLY the MV's files
      val out = q()
      val fresh = scansOf(out)
      require(fresh.nonEmpty && fresh.forall(_.contains(mvT + "/")),
        s"fresh MV did not answer the query: $fresh")
      out
    }),

    "pipe20_partitioned_mv" -> ((s, dir) => {
      // MV OVER A PARTITIONED BASE — the production composition: the
      // 100 TB fact is month-partitioned (path-pruned reads, routed
      // merges), its dashboard aggregate is an incrementally-
      // maintained MV, and the transparent rewrite answers the
      // user's plain GROUP BY from the MV — through the UNION-of-
      // child-scans plan a partitioned read produces. Maintenance
      // rides the PARTITIONED change feed (per-partition child
      // diffs): one batch = one parent commit folded O(delta); a
      // metadata-only PARTITION DROP still feeds its rows as deletes,
      // so the refreshed MV loses exactly that month's contribution.
      // In-row requires pin the routing (fresh→MV, stale→base,
      // refreshed→MV) and the refresh accounting.
      import graft.merge.PartitionedTable
      val o = table(s, dir, "orders")
      val fact = o.select(
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("o_month").between("1995-01", "1995-07"))
      val root = tmpDir("graft_pmv")
      val base = root + "/fact"; val mv = root + "/mv"
      val keys = Seq("o_month", "o_orderkey")
      PartitionedTable.upsert(s, base,
        fact.filter(col("o_month") <= "1995-06"), keys, "o_month",
        numBuckets = 2, retainVersions = 4)
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
      def q(): DataFrame =
        PartitionedTable.readTable(s, base).groupBy(col("o_orderpriority"))
          .agg(sum(col("cents")).as("sum_cents"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      require(scansOf(q()).forall(_.contains(mv + "/")),
        "fresh partitioned MV must answer through the union-of-scans plan")
      // one batch: a NEW month + a bump into an existing one
      PartitionedTable.upsert(s, base,
        fact.filter(col("o_month") === "1995-07")
          .unionByName(fact.filter(col("o_month") === "1995-02")
            .withColumn("cents", col("cents") + 3)), keys, "o_month",
        retainVersions = 4)
      require(scansOf(q()).forall(_.contains(base + "/")),
        "stale MV must route to the base")
      val r = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect().head
      require(r.getLong(1) == 1L, s"refresh must fold exactly 1 parent commit: $r")
      // metadata-only partition drop → its rows feed as deletes
      PartitionedTable.dropPartitionsWhere(s, base, col("o_month") === "1995-01")
      graft.sql.GraftSql.sql(s, s"REFRESH MATERIALIZED VIEW graft.`$mv`")
        .collect()
      val out = q()
      require(scansOf(out).forall(_.contains(mv + "/")),
        "refreshed MV must answer again")
      out
    }),

    "pipe21_join_mv_rewrite" -> ((s, dir) => {
      // JOIN-MV REWRITE — the star-schema dashboard closed end to
      // end: the gold aggregate over fact ⋈ dim is maintained
      // incrementally (IncrementalJoinAgg's exact bilinear delta
      // rule: ΔF⋈D_new ∪ F_old⋈ΔD) AND the user's plain join-
      // aggregate query is transparently answered from it. The gates
      // are two-sided: BOTH scans must equal their tables' current
      // snapshots and the MV must carry the fact@F,dim@D stamp for
      // both current commits — a commit on EITHER side (here: a fact
      // correction wave, then a dim segment move that shifts fact
      // mass between groups) routes the query back to the real join
      // until refresh() folds the lag. In-row requires pin the
      // routing and the two-sided refresh accounting; the oracle
      // recomputes the final answer from both tables' final content.
      import graft.pipeline.IncrementalJoinAgg
      import graft.pipeline.IncrementalAgg.AggSpec
      val root = tmpDir("graft_jmv")
      val factT = root + "/fact"; val dimT = root + "/dim"
      val mvT = root + "/mv"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val c = table(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment").as("seg"))
      Scd1Merge.upsert(s, factT, o, Seq("o_orderkey"), numBuckets = 8,
        retainVersions = 4)
      Scd1Merge.upsert(s, dimT, c, Seq("c_custkey"), numBuckets = 4,
        retainVersions = 4)
      val spec = AggSpec(Seq("seg"), Seq("cents" -> "sum_cents"), "n_orders")
      // createMv = stamped bootstrap + PERSISTED definition (_graft_mv,
      // so SQL REFRESH works from any session) + the rewrite armed
      IncrementalJoinAgg.createMv(s, mvT, factT, Seq("o_orderkey"),
        dimT, Seq("c_custkey"), "o_custkey", "c_custkey", spec,
        numBuckets = 2)
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def q(): DataFrame =
        Scd1Merge.readTable(s, factT).as("f")
          .join(Scd1Merge.readTable(s, dimT).as("d"),
            col("f.o_custkey") === col("d.c_custkey"))
          .groupBy(col("d.seg"))
          .agg(sum(col("f.cents")).as("sum_cents"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("seg"))
      require(scansOf(q()).forall(_.contains(mvT + "/")),
        "fresh join MV must answer the star aggregate")
      // fact correction wave → stale on the fact side
      Scd1Merge.upsert(s, factT,
        o.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("cents", col("cents") + 50L),
        Seq("o_orderkey"), retainVersions = 4)
      require(scansOf(q()).exists(_.contains(factT + "/")),
        "a stale join MV must route to the real join")
      val r1 = IncrementalJoinAgg.refresh(s, mvT, factT, Seq("o_orderkey"),
        dimT, Seq("c_custkey"), "o_custkey", "c_custkey", spec)
      require(r1 == ((1, 0)), s"fact-side refresh accounting: $r1")
      // dim segment move → fact mass shifts between groups
      Scd1Merge.upsert(s, dimT,
        c.filter(pmod(col("c_custkey"), lit(5)) === 0)
          .withColumn("seg", lit("MOVED")),
        Seq("c_custkey"), retainVersions = 4)
      val r2 = IncrementalJoinAgg.refresh(s, mvT, factT, Seq("o_orderkey"),
        dimT, Seq("c_custkey"), "o_custkey", "c_custkey", spec)
      require(r2 == ((0, 1)), s"dim-side refresh accounting: $r2")
      val out = q()
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the refreshed join MV must answer again")
      out
    }),

    "pipe23_star_mv" -> ((s, dir) => {
      // MULTI-DIM STAR MV — the 2-dim dashboard shape pipe21's
      // single-dim rewrite could not answer: the gold aggregate over
      // fact ⋈ dim1 ⋈ dim2 is maintained by the TELESCOPED bilinear
      // delta (IncrementalJoinAgg.applyStarChanges: ΔF⋈P_new⋈S_new ∪
      // F_old⋈ΔP⋈S_new ∪ F_old⋈P_old⋈ΔS — exact over table states,
      // however the commits interleaved) and the user's plain 3-table
      // star query is transparently answered from it. The wave
      // commits on ALL THREE sides — a fact correction, a brand move
      // on dim1, a nation move on dim2 (fact mass shifts between
      // groups on BOTH axes) — then ONE refresh folds the three lags
      // in a single stamped batch. In-row requires pin the routing
      // (fresh→MV, any-side lag→real join, refreshed→MV) and the
      // 3-commit refresh accounting; the oracle recomputes the final
      // answer from all three tables' final content.
      import graft.pipeline.{IncrementalJoinAgg, MvDef}
      import graft.pipeline.IncrementalAgg.AggSpec
      val root = tmpDir("graft_smv")
      val factT = root + "/fact"; val d1T = root + "/part"
      val d2T = root + "/supp"; val mvT = root + "/mv"
      // line-grain rollup first: the synthetic lineitem is NOT unique
      // on (orderkey, linenumber) — the fact's SCD1 key must be
      // (min-FK rollup keeps the grain deterministic; the oracle
      // mirrors it exactly)
      val li = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min(col("l_partkey")).as("l_partkey"),
          min(col("l_suppkey")).as("l_suppkey"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      val pt = table(s, dir, "part").select(col("p_partkey"),
        col("p_brand").as("brand"))
      val sp = table(s, dir, "supplier").select(col("s_suppkey"),
        col("s_nationkey").as("nation"))
      Scd1Merge.upsert(s, factT, li, Seq("l_orderkey", "l_linenumber"),
        numBuckets = 8, retainVersions = 4)
      Scd1Merge.upsert(s, d1T, pt, Seq("p_partkey"), numBuckets = 4,
        retainVersions = 4)
      Scd1Merge.upsert(s, d2T, sp, Seq("s_suppkey"), numBuckets = 4,
        retainVersions = 4)
      // created through the SQL surface (runStar lowers onto
      // createMvStar: fact = the measure-bearing side, dims + (fk,dk)
      // read from the analyzed equi-join conditions)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvT` BUCKETS 4 AS
           |SELECT brand, nation, sum(cents) AS sum_cents,
           |  count(*) AS n_items
           |FROM graft.`$factT` f
           |JOIN graft.`$d1T` p ON f.l_partkey = p.p_partkey
           |JOIN graft.`$d2T` sp ON f.l_suppkey = sp.s_suppkey
           |GROUP BY brand, nation""".stripMargin)
      val d = MvDef.read(mvT).get
      require(d.basePath == factT && d.joins.size == 2,
        s"SQL star CREATE must persist fact + 2 dims: $d")
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def q(): DataFrame =
        Scd1Merge.readTable(s, factT).as("f")
          .join(Scd1Merge.readTable(s, d1T).as("p"),
            col("f.l_partkey") === col("p.p_partkey"))
          .join(Scd1Merge.readTable(s, d2T).as("sup"),
            col("f.l_suppkey") === col("sup.s_suppkey"))
          .groupBy(col("brand"), col("nation"))
          .agg(sum(col("cents")).as("sum_cents"),
            count(lit(1)).as("n_items"))
          .orderBy(col("brand"), col("nation"))
      require(scansOf(q()).forall(_.contains(mvT + "/")),
        "fresh star MV must answer the 2-dim dashboard query")
      // the wave: one commit on EVERY side
      Scd1Merge.upsert(s, factT,
        li.filter(pmod(col("l_orderkey"), lit(7)) === 0)
          .withColumn("cents", col("cents") + 25L),
        Seq("l_orderkey", "l_linenumber"), retainVersions = 4)
      Scd1Merge.upsert(s, d1T,
        pt.filter(pmod(col("p_partkey"), lit(10)) === 0)
          .withColumn("brand", lit("BrandX")),
        Seq("p_partkey"), retainVersions = 4)
      Scd1Merge.upsert(s, d2T,
        sp.filter(pmod(col("s_suppkey"), lit(5)) === 0)
          .withColumn("nation", lit(99)),
        Seq("s_suppkey"), retainVersions = 4)
      require(scansOf(q()).exists(_.contains(factT + "/")),
        "a 3-sided lag must route to the real star join")
      // ONE refresh telescopes all three lags
      val r = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mvT`").collect().head
      require(r.getLong(1) == 3L, s"refresh must fold 1 commit per side: $r")
      val out = q()
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the refreshed star MV must answer again")
      out
    }),

    "pipe27_dim_filtered_star_mv" -> ((s, dir) => {
      // DIM-ATTRIBUTE-FILTERED STAR MV — the universal dashboard
      // filter (`WHERE d.seg = 'BUILDING'`: measures by dim
      // attribute, the exact shape the reference's gold star serves,
      // README.md:36-43, gold_fact.py:34-38). A dim predicate cannot
      // bake into the maintained content (a dim-row attribute flip
      // would move fact rows across the filter without any fact
      // change), so CREATE lowers it: the filter dim's FACT-SIDE KEY
      // joins the MV's group columns, the MV maintains the UNFILTERED
      // per-key star (dimension-bounded rows, plain telescoped
      // maintenance), and the transparent rewrite applies the
      // attribute predicate through a BROADCAST re-join against the
      // snapshot-checked, freshness-stamped dim — group-sized work,
      // and ANY predicate on that dim is admissible, not just the
      // created one. A dim attribute flip therefore costs the MV
      // NOTHING: one stamp-advancing refresh and the re-join sees the
      // new attributes. In-row requires pin the routing (fresh →
      // MV+dim never fact; other-predicate query → same; lag → base;
      // refreshed → MV again); the oracle recomputes from both
      // tables' final content, so a mis-lowered filter breaks the hash.
      import graft.pipeline.MvDef
      val root = tmpDir("graft_dfsmv")
      val factT = root + "/fact"; val dimT = root + "/cust"
      val mvT = root + "/mv"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, factT, o, Seq("o_orderkey"), numBuckets = 8,
        retainVersions = 4)
      Scd1Merge.upsert(s, dimT, table(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment").as("seg")),
        Seq("c_custkey"), numBuckets = 4, retainVersions = 4)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvT` BUCKETS 4 AS
           |SELECT pri, sum(cents) AS sum_cents, count(*) AS n_orders
           |FROM graft.`$factT` f
           |JOIN graft.`$dimT` c ON f.o_custkey = c.c_custkey
           |WHERE c.seg = 'BUILDING' GROUP BY pri""".stripMargin)
      require(MvDef.read(mvT).exists(d =>
        d.spec.groupCols.map(_.toLowerCase) == Seq("pri", "o_custkey") &&
        d.spec.filterSql.isEmpty),
        "the dim filter must lower to fk-in-groups, never baked content")
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      // the rewritten plan reads the MV + the broadcast dim — never
      // the fact (the 100 TB side of the join)
      def fromMv(df: DataFrame): Boolean = {
        val ps = scansOf(df)
        ps.nonEmpty && ps.exists(_.contains(mvT + "/")) &&
          !ps.exists(_.contains(factT + "/"))
      }
      def q(seg: String): DataFrame =
        Scd1Merge.readTable(s, factT).as("f")
          .join(Scd1Merge.readTable(s, dimT).as("c"),
            col("f.o_custkey") === col("c.c_custkey"))
          .filter(col("seg") === seg)
          .groupBy(col("pri"))
          .agg(sum(col("cents")).as("sum_cents"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("pri"))
      require(fromMv(q("BUILDING")),
        "the created dim-attribute filter must answer from the MV")
      require(fromMv(q("MACHINERY")),
        "ANY predicate on the keyed dim must answer from the MV")
      // the wave: a fact correction + a dim attribute FLIP that moves
      // customers across the filter boundary BOTH ways
      Scd1Merge.upsert(s, factT,
        o.filter(pmod(col("o_orderkey"), lit(11)) === 0)
          .withColumn("cents", col("cents") + 7L),
        Seq("o_orderkey"), retainVersions = 4)
      Scd1Merge.upsert(s, dimT, table(s, dir, "customer")
        .filter(pmod(col("c_custkey"), lit(6)) === 0)
        .select(col("c_custkey"),
          when(col("c_mktsegment") === "BUILDING", "MOVED")
            .otherwise("BUILDING").as("seg")),
        Seq("c_custkey"), retainVersions = 4)
      require(!fromMv(q("BUILDING")),
        "a lagging MV must route to the real join")
      val r = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mvT`").collect().head
      require(r.getLong(1) == 2L, s"refresh must fold fact+dim lags: $r")
      val out = q("BUILDING")
      require(fromMv(out),
        "the refreshed MV must answer with the flipped dim attributes")
      out
    }),

    "pipe28_star_rollup_mv" -> ((s, dir) => {
      // STAR ROLLUP MV — expression groups + min/max OVER A JOIN (the
      // time-rolled dashboard: `GROUP BY month(date), seg` with a
      // max() beside the sums). The group expression is a FACT-column
      // expression, derived on the fact side BEFORE the joins, so it
      // commutes with every telescoped delta term exactly like a
      // column; max() maintenance is the two-speed flat algebra lifted
      // through the star — inserts fold via greatest(), and only
      // groups where a retraction lands AT/PAST the stored extreme
      // rescan, against the RE-JOINED new state (fact@target ⋈
      // dims@target), group-semi-joined. The rewrite matches the
      // pulled `_groupingexpression` tree canonically against the
      // definition resolved on the same fact. The wave forces all
      // legs: the global-max row is DELETED (retraction at the
      // extreme → rescan), a dim seg moves (group mass migrates), and
      // a new month arrives (pure fold) — ONE refresh folds all
      // three commits. Oracle recomputes all aggregates from final
      // content.
      import graft.pipeline.MvDef
      val root = tmpDir("graft_srmv")
      val factT = root + "/fact"; val dimT = root + "/cust"
      val mvT = root + "/mv"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, factT, o, Seq("o_orderkey"), numBuckets = 8,
        retainVersions = 4)
      Scd1Merge.upsert(s, dimT, table(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment").as("seg")),
        Seq("c_custkey"), numBuckets = 4, retainVersions = 4)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvT` BUCKETS 4 AS
           |SELECT date_format(o_orderdate, 'yyyy-MM') AS o_month, seg,
           |  sum(cents) AS sum_cents, max(cents) AS max_cents,
           |  count(*) AS n_orders
           |FROM graft.`$factT` f
           |JOIN graft.`$dimT` c ON f.o_custkey = c.c_custkey
           |GROUP BY date_format(o_orderdate, 'yyyy-MM'), seg""".stripMargin)
      require(MvDef.read(mvT).exists(d =>
        d.spec.groupExprs.keySet == Set("o_month") &&
        d.spec.maxs == Seq("cents" -> "max_cents")),
        "the star definition must persist the group expression + max")
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
        s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS o_month, seg,
           |  sum(cents) AS sum_cents, max(cents) AS max_cents,
           |  count(*) AS n_orders
           |FROM graft.`$factT` f
           |JOIN graft.`$dimT` c ON f.o_custkey = c.c_custkey
           |GROUP BY date_format(o_orderdate, 'yyyy-MM'), seg
           |ORDER BY o_month, seg""".stripMargin)
      require(scansOf(q()).forall(_.contains(mvT + "/")),
        "the fresh star rollup MV must answer the month/seg dashboard")
      // the wave: downward corrections (retractions at stored maxima
      // for the touched groups), deletes (some removing extremes),
      // and a dim segment move — ONE refresh folds all three
      Scd1Merge.upsert(s, factT,
        o.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("cents", col("cents") - 100000L),
        Seq("o_orderkey"), retainVersions = 4)
      Scd1Merge.delete(s, factT, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(13)) === 0, retainVersions = 4)
      Scd1Merge.upsert(s, dimT, table(s, dir, "customer")
        .filter(pmod(col("c_custkey"), lit(6)) === 0)
        .select(col("c_custkey"), lit("MOVED").as("seg")),
        Seq("c_custkey"), retainVersions = 4)
      require(scansOf(q()).exists(_.contains(factT + "/")),
        "a lagging star rollup MV must route to the real join")
      val r = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mvT`").collect().head
      require(r.getLong(1) == 3L, s"refresh must fold 3 commits: $r")
      val out = q()
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the refreshed star rollup MV must answer again")
      out
    }),

    "pipe31_topn_mv" -> ((s, dir) => {
      // TOP-N-PER-GROUP MV — the leaderboard dashboard ("top 3
      // orders by value per priority") no aggregate MV can serve: the
      // answer is N whole ROWS per group. The MV stores exactly the
      // top-N rows keyed by the BASE KEY, and maintenance is the
      // min/max two-speed shape lifted to row sets: inserts compete
      // only against the stored N (O(delta·N), never the base — an
      // evicted row is not lost, the base keeps it); a retraction of
      // a STORED row flags its group for a semi-joined base rescan
      // (the replacement is exactly what the MV evicted earlier),
      // while a never-stored retraction folds to nothing. The
      // deterministic ordering ALWAYS tie-breaks by the base key, so
      // stored content is a pure function of base state. The
      // transparent rewrite answers the row_number()-top-k shape
      // (k ≤ N, same partition, EXACTLY the registered ordering) by
      // replacing only the window's child — the query's own
      // Window/Filter recompute ranks over ≤N rows per group. In-row
      // requires pin routing (fresh MV / lag to base / refreshed MV)
      // and the rescan resurrection; the oracle recomputes the
      // leaderboard from final base content.
      import graft.pipeline.TopNMv
      import graft.pipeline.TopNMv.TopNSpec
      val root = tmpDir("graft_topnmv")
      val base = root + "/orders"; val mvT = root + "/mv"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 4)
      TopNMv.createMv(s, mvT, base,
        TopNSpec(Seq("pri"), "cents", desc = true, n = 3,
          cols = Seq("o_orderkey", "pri", "cents")),
        numBuckets = 1, retain = 4)
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pri"))
        .orderBy(col("cents").desc, col("o_orderkey").asc)
      def q(): DataFrame = Scd1Merge.readTable(s, base)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("pri"), col("rn"))
      require(scansOf(q()).forall(_.contains(mvT + "/")),
        "the fresh top-N MV must answer the leaderboard")
      // the wave: new leaders into two groups (fold leg), then DELETE
      // the current top row of '1-URGENT' (stored retraction → that
      // group rescans and resurrects its previously-evicted 4th row)
      Scd1Merge.upsert(s, base,
        s.range(2).select((col("id") + 90000000L).as("o_orderkey"),
          when(col("id") === 0, "1-URGENT").otherwise("5-LOW").as("pri"),
          (col("id") * 1000L + 77777777L).as("cents")),
        Seq("o_orderkey"), retainVersions = 4)
      val topUrgent = Scd1Merge.readTable(s, base)
        .filter(col("pri") === "1-URGENT")
        .orderBy(col("cents").desc, col("o_orderkey").asc)
        .select(col("o_orderkey")).head().getLong(0)
      Scd1Merge.delete(s, base, Seq("o_orderkey"),
        col("o_orderkey") === topUrgent, retainVersions = 4)
      require(scansOf(q()).exists(_.contains(base + "/")),
        "a lagging top-N MV must route to the base")
      require(TopNMv.refresh(s, mvT) == 2L, "refresh must fold 2 commits")
      val out = q()
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the refreshed top-N MV must answer again")
      out
    }),

    "pipe32_topn_rank_mv" -> ((s, dir) => {
      // RANK() TIES LEADERBOARD MV (r12 verdict #6) — `rank() <= k`
      // includes every row TIED into the top k positions, so a
      // row_number-maintained MV (which CUTS ties at the storage
      // boundary) can never serve it. A `ties = true` TopNMv stores
      // the `rank() <= n` row SET (n + ties rows per group) and the
      // rewrite now admits: rank() ordered by the order column alone
      // (tie-stable, no tie-break needed), row_number with the full
      // deterministic ordering (the ties set is a superset of the
      // row_number top-n), and a BELOW-window filter on GROUP columns
      // (Catalyst pushes partition-column predicates below the
      // Window; σ_g keeps/drops whole groups, commuting with the
      // per-group top-N). dense_rank still falls through by design —
      // its ≤k set is not contained in rank ≤ n storage. In-row
      // requires pin all four routings plus maintenance: tied
      // leaders fold in on insert, a retracted leader rescans its
      // group. Oracle recomputes the ties leaderboard from final
      // base content — cents is BUCKETIZED so real ties exist.
      import graft.pipeline.TopNMv
      import graft.pipeline.TopNMv.TopNSpec
      val root = tmpDir("graft_topnrank")
      val base = root + "/orders"; val mvT = root + "/mv"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderpriority").as("pri"),
        (round(col("o_totalprice")).cast("long") % 97L * 100L).as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 4)
      TopNMv.createMv(s, mvT, base,
        TopNSpec(Seq("pri"), "cents", desc = true, n = 3,
          cols = Seq("o_orderkey", "pri", "cents"), ties = true),
        numBuckets = 1, retain = 4)
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pri")).orderBy(col("cents").desc)
      def q(): DataFrame = Scd1Merge.readTable(s, base)
        .withColumn("rn", rank().over(wRank))
        .filter(col("rn") <= 2)
        .orderBy(col("pri"), col("rn"), col("o_orderkey"))
      require(scansOf(q()).forall(_.contains(mvT + "/")),
        "the fresh ties MV must answer the rank leaderboard")
      // a GROUP-column filter pushes below the Window and still serves
      val filtered = Scd1Merge.readTable(s, base)
        .filter(col("pri") === "1-URGENT")
        .withColumn("rn", rank().over(wRank)).filter(col("rn") <= 2)
      require(scansOf(filtered).forall(_.contains(mvT + "/")),
        "a below-window group filter must serve")
      // row_number (full deterministic ordering) serves from the
      // ties superset too
      val wRn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pri"))
        .orderBy(col("cents").desc, col("o_orderkey").asc)
      require(scansOf(Scd1Merge.readTable(s, base)
        .withColumn("rn", row_number().over(wRn)).filter(col("rn") <= 3))
        .forall(_.contains(mvT + "/")),
        "row_number must serve from the ties MV")
      // dense_rank falls through by design
      require(scansOf(Scd1Merge.readTable(s, base)
        .withColumn("rn", dense_rank().over(wRank)).filter(col("rn") <= 2))
        .exists(_.contains(base + "/")),
        "dense_rank must fall through to the base")
      // maintenance wave: a tied pair of new leaders into 1-URGENT
      // (fold), then DELETE every current top-value row of 5-LOW
      // (stored retraction → rescan surfaces the next value's ties)
      Scd1Merge.upsert(s, base,
        s.range(2).select((col("id") + 90000000L).as("o_orderkey"),
          lit("1-URGENT").as("pri"), lit(99999900L).as("cents")),
        Seq("o_orderkey"), retainVersions = 4)
      val topLow = Scd1Merge.readTable(s, base)
        .filter(col("pri") === "5-LOW").agg(max(col("cents"))).head().getLong(0)
      Scd1Merge.delete(s, base, Seq("o_orderkey"),
        col("pri") === "5-LOW" && col("cents") === topLow,
        retainVersions = 4)
      require(scansOf(q()).exists(_.contains(base + "/")),
        "a lagging ties MV must route to the base")
      require(TopNMv.refresh(s, mvT) == 2L, "refresh must fold 2 commits")
      val out = q()
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the refreshed ties MV must answer again")
      out
    }),

    "pipe33_auto_mv" -> ((s, dir) => {
      // AUTO-MAINTAINED MVs (r12 verdict #3) — closing the pull-only
      // gap: a stale MV silently falls through to the full base scan
      // until someone remembers REFRESH; at 100 TB that fall-through
      // IS the outage. `CREATE ... AUTO REFRESH` persists an `auto`
      // flag in the MV definition and arms a POST-COMMIT hook (fired
      // from the table layer's single commit choke point, AFTER the
      // writer's lock drops, so the base's critical section never
      // grows): every base commit folds its own delta into the MV on
      // the writer's thread — O(delta), the standard refresh path —
      // and a CHAIN cascades for free (mv_day's refresh commit fires
      // the hook that refreshes mv_month). A crash between base
      // commit and maintenance leaves a stale-but-sound MV (freshness
      // gates keep answers right); the next touch — any later commit,
      // or the `REFRESH ALL MATERIALIZED VIEWS` sweep — folds the
      // whole lag. In-row requires pin: immediate serving after a
      // wave with NO manual refresh, chain freshness in dependency
      // order, crash-window fallback, and sweep convergence. Oracle
      // recomputes the monthly rollup from final base content.
      import graft.pipeline.MvMaintenance
      MvMaintenance.reset() // hermetic: no hook leaks between entries
      val root = tmpDir("graft_automv")
      val base = root + "/orders"
      val mvD = root + "/mv_day"; val mvM = root + "/mv_month"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 6)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvD` BUCKETS 2
           |RETAIN 6 AUTO REFRESH AS
           |SELECT d, sum(cents) AS sc, count(*) AS n
           |FROM graft.`$base` GROUP BY d""".stripMargin)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvM` BUCKETS 1
           |RETAIN 6 AUTO REFRESH AS
           |SELECT substring(d, 1, 7) AS m, sum(sc) AS sc, count(*) AS n_days
           |FROM graft.`$mvD` GROUP BY substring(d, 1, 7)""".stripMargin)
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def qDay(): DataFrame = Scd1Merge.readTable(s, base)
        .groupBy(col("d")).agg(sum(col("cents")).as("sc"))
      try {
        // ---- wave 1: IMMEDIATE serving, chain fresh in order
        Scd1Merge.upsert(s, base,
          s.range(1).select(lit(90000001L).as("o_orderkey"),
            lit("1997-03-15").as("d"), lit(123456L).as("cents")),
          Seq("o_orderkey"), retainVersions = 6)
        require(scansOf(qDay()).forall(_.contains(mvD + "/")),
          "an AUTO MV must serve IMMEDIATELY after a base wave — " +
          "no manual REFRESH")
        val cBase = Scd1Merge.tableCommit(base).get
        require(Scd1Merge.tableBatchId(mvD)
          .contains(f"base-commit-$cBase%09d"), "mv_day fresh")
        val cDay = Scd1Merge.tableCommit(mvD).get
        require(Scd1Merge.tableBatchId(mvM)
          .contains(f"base-commit-$cDay%09d"),
          "the CHAIN must cascade: mv_month fresh w.r.t. mv_day")
        // ---- crash window: hook disarmed for one wave (the process
        // died between the base commit and its maintenance rider)
        Scd1Merge.onCommitHook = _ => ()
        Scd1Merge.upsert(s, base,
          s.range(1).select(lit(90000002L).as("o_orderkey"),
            lit("1997-03-16").as("d"), lit(654321L).as("cents")),
          Seq("o_orderkey"), retainVersions = 6)
        require(scansOf(qDay()).exists(_.contains(base + "/")),
          "the missed wave must route to the base (stale-but-sound)")
        // ---- the SWEEP converges the crash window (chains too)
        val swept = graft.sql.GraftSql.sql(s,
          "REFRESH ALL MATERIALIZED VIEWS").collect()
        require(swept.exists(_.getString(0) == mvD) &&
          swept.exists(_.getString(0) == mvM),
          s"the sweep must refresh both layers, got ${swept.mkString(",")}")
        require(scansOf(qDay()).forall(_.contains(mvD + "/")),
          "the swept MV must serve again")
        // ---- hook re-armed by the sweep? No — re-arm is explicit;
        // a THIRD wave through the armed hook serves immediately again
        MvMaintenance.armHooks()
        Scd1Merge.upsert(s, base,
          s.range(1).select(lit(90000003L).as("o_orderkey"),
            lit("1997-03-17").as("d"), lit(111111L).as("cents")),
          Seq("o_orderkey"), retainVersions = 6)
        require(scansOf(qDay()).forall(_.contains(mvD + "/")),
          "the re-armed hook must maintain through the next wave")
        // the judged output: the monthly rollup OVER THE CHAIN —
        // reading mv_month's content directly (its rows are the
        // maintained state the oracle recomputes from final base)
        Scd1Merge.readTable(s, mvM)
          .select(col("m"), col("sc"), col("n_days"))
          .orderBy(col("m"))
      } finally MvMaintenance.reset()
    }),

    "pipe34_quantile_mv" -> ((s, dir) => {
      // QUANTILE-SKETCH MV (r12 verdict #5) — percentile dashboards
      // (p50/p95 latency, price distributions) need mergeable
      // quantile state; exact per-group percentiles cannot
      // re-aggregate on roll-up at all. The MV stores ONE
      // graft.functions.QuantileSketch binary per group: a
      // DETERMINISTIC bottom-k-by-row-hash sample (KMV over rows) —
      // chosen over Datasketches KLL because bottom-k unions are
      // LOSSLESS and build-path-independent (KLL's randomized
      // compaction makes merged sketches differ from one-pass builds,
      // which would break the transparent rewrite's exact-answer
      // contract; the trade is O(k) entries vs KLL's tighter curve).
      // Maintenance is the pipe29 two-speed shape verbatim: inserts
      // UNION O(delta); any non-null retraction flags its group for a
      // semi-joined rescan. The rewrite answers
      // `qsk_agg(xxhash64(key), m)` from unioned stored sketches —
      // BIT-EXACTLY the one-pass result — with `qsk_quantile` riding
      // as an output wrapper. At this SF k (1024) exceeds every group,
      // so the sample is complete and the estimates are EXACT —
      // letting the oracle cross-derive them in DuckDB (stronger than
      // a pin); QuantileMvSpec separately floors the sampled-mode
      // rank error. In-row requires pin routing and that the
      // maintained sketch equals a from-base rebuild byte-for-byte.
      import graft.pipeline.IncrementalAgg
      import graft.pipeline.IncrementalAgg.AggSpec
      import graft.functions.{QskAgg, QskQuantile}
      import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
      val root = tmpDir("graft_qskmv")
      val base = root + "/orders"; val mvT = root + "/mv"
      val o = table(s, dir, "orders")
        .filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 4)
      val spec = AggSpec(Seq("status"), Seq("cents" -> "sum_cents"), "n",
        quantiles = Seq("cents" -> "qsk_cents"),
        sampleKeys = Seq("o_orderkey"))
      IncrementalAgg.bootstrapFrom(s, mvT, base, spec, numBuckets = 1,
        retainVersions = 4)
      graft.plans.GraftMvRewrite.register(base, mvT, spec)
      def qskAggC(h: org.apache.spark.sql.Column,
                  v: org.apache.spark.sql.Column) =
        column(QskAgg(expression(h), expression(v)).toAggregateExpression())
      def qskQ(sk: org.apache.spark.sql.Column, p: Double) =
        column(QskQuantile(expression(sk), expression(lit(p))))
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def q(): DataFrame = Scd1Merge.readTable(s, base)
        .groupBy(col("status"))
        .agg(
          qskQ(qskAggC(xxhash64(col("o_orderkey")), col("cents")), 0.5)
            .as("p50"),
          qskQ(qskAggC(xxhash64(col("o_orderkey")), col("cents")), 0.95)
            .as("p95"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("status"))
      require(scansOf(q()).forall(_.contains(mvT + "/")),
        "the fresh quantile MV must answer the percentile dashboard")
      // the wave: two inserts into 'F' (fold leg) and the deletion of
      // a deterministic 'O' row (retraction → that group rescans)
      Scd1Merge.upsert(s, base,
        s.range(2).select((col("id") + 90000001L).as("o_orderkey"),
          lit("F").as("status"), (col("id") * 100L + 123456L).as("cents")),
        Seq("o_orderkey"), retainVersions = 4)
      val delKey = Scd1Merge.readTable(s, base).filter(col("status") === "O")
        .agg(min(col("o_orderkey"))).head().getLong(0)
      Scd1Merge.delete(s, base, Seq("o_orderkey"),
        col("o_orderkey") === delKey, retainVersions = 4)
      require(scansOf(q()).exists(_.contains(base + "/")),
        "a lagging quantile MV must route to the base")
      IncrementalAgg.applyChanges(s, mvT, base, Seq("o_orderkey"), spec,
        fromBack = 2)
      val out = q()
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the refreshed quantile MV must answer again")
      // the maintained sketches equal a from-base rebuild BYTE-FOR-
      // BYTE (lossless unions + deterministic sampling — the property
      // that makes the transparent rewrite exact)
      val stored = Scd1Merge.readTable(s, mvT)
        .select(col("status"), col("qsk_cents")).collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      val rebuilt = Scd1Merge.readTable(s, base).groupBy(col("status"))
        .agg(qskAggC(xxhash64(col("o_orderkey")), col("cents")).as("sk"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      require(stored.keySet == rebuilt.keySet &&
        stored.forall { case (g, b) =>
          java.util.Arrays.equals(b, rebuilt(g)) },
        "maintained sketches must equal a from-base rebuild exactly")
      graft.plans.GraftMvRewrite.unregister(base)
      out
    }),

    "pipe35_topn_sql_mv" -> ((s, dir) => {
      // SQL-CREATED TOP-N MV + CROSS-SESSION SWEEP (r13 verdict #2/#3)
      // — the reference's consumers are SQL notebooks
      // (ref: databricks_notebooks/gold_dim_branch.py:60-65 queries by
      // SQL), so the leaderboard MV the rewrite serves must be
      // creatable from SQL, not only the engine API. `CREATE GRAFT
      // MATERIALIZED VIEW ... AS SELECT <cols> FROM (SELECT *,
      // row_number() OVER (PARTITION BY g ORDER BY m DESC, keys)) AS
      // rn WHERE rn <= n` lowers onto TopNMv.createMv with the same
      // persisted-definition contract qsk_agg got in r13, and the
      // definition now also lands in the DURABLE catalog
      // (_graft_catalog_topn), which closes r13's REFRESH ALL hole:
      // a FRESH session's sweep folds a stale top-N MV it never
      // queried. In-row requires pin the SQL lifecycle end-to-end
      // (CREATE → serve → wave → stale → cross-session REFRESH ALL →
      // serve) with the session registry WIPED before the sweep.
      import graft.pipeline.{MvMaintenance, TopNMv}
      val root = tmpDir("graft_topnsql")
      val base = root + "/orders"; val mvT = root + "/mv"
      graft.sql.GraftCatalog.setRoot(root + "/cat")
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderpriority").as("pri"),
        (round(col("o_totalprice")).cast("long") % 97L * 100L).as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 4)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvT` BUCKETS 1 RETAIN 4 AS
           |SELECT o_orderkey, pri, cents FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY pri ORDER BY cents DESC, o_orderkey ASC) AS rn
           |  FROM graft.`$base`) WHERE rn <= 3""".stripMargin)
      require(TopNMv.readDef(mvT).exists(d =>
        d._1 == base && d._3.n == 3 && !d._3.ties),
        "the SQL CREATE must persist the _graft_topn definition")
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pri"))
        .orderBy(col("cents").desc, col("o_orderkey").asc)
      def q(): DataFrame = Scd1Merge.readTable(s, base)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .orderBy(col("pri"), col("rn"))
      require(scansOf(q()).forall(_.contains(mvT + "/")),
        "the SQL-created top-N MV must serve the leaderboard")
      // wave → stale; then simulate a RESTART (session registries
      // wiped — only the durable catalog + sidecar definitions
      // remain) and converge with ONE statement
      Scd1Merge.upsert(s, base,
        s.range(2).select((col("id") + 91000000L).as("o_orderkey"),
          lit("2-HIGH").as("pri"),
          (lit(99999900L) - col("id") * 100L).as("cents")),
        Seq("o_orderkey"), retainVersions = 4)
      require(scansOf(q()).exists(_.contains(base + "/")),
        "a lagging top-N MV must route to the base")
      graft.plans.GraftTopNRewrite.clear()
      val swept = MvMaintenance.refreshAllStale(s)
      require(swept.exists(_._1 == mvT),
        s"the FRESH session's REFRESH ALL must find the cataloged " +
        s"top-N MV it never queried: $swept")
      val out = q()
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the swept top-N MV must serve again")
      graft.sql.GraftCatalog.clearRoot()
      out
    }),

    "pipe36_qsk_k_mv" -> ((s, dir) => {
      // NON-DEFAULT-k QUANTILE MV VIA SQL (r13 verdict #4/#6) — the
      // p99.9-at-100TB dial is k (rank error ~1.65/√k at O(k) state
      // per group); r13's SQL surface admitted default k only, so the
      // dial was unreachable from SQL. Now `qsk_agg(hash, m, k)`
      // persists its precision (MvDef `qskk`), maintenance builds at
      // that k, and the rewrite serves EXACTLY a query asking for the
      // stored precision — a k=1024 query over a k=256 MV falls
      // through (the stored sketches are not the sketch the query
      // names). Under the hood r13's mismatched-k union hazard is
      // fixed: unions keep bottom-MIN(k) (the largest provably-valid
      // uniform sample), so no merge ever claims more evidence than
      // it has. At this SF the %37 slice keeps every group under
      // k=256, so estimates are exact and the oracle cross-derives
      // them; QuantileMvSpec pins the sampled mode. In-row requires
      // pin the k-routing both ways and the SQL REFRESH fold.
      import graft.functions.{QskAgg, QskQuantile, QuantileSketch}
      import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
      graft.GraftExtensions.register(s) // qsk_agg in SQL text
      val root = tmpDir("graft_qskk")
      val base = root + "/orders"; val mvT = root + "/mv"
      val o = table(s, dir, "orders")
        .filter(col("o_orderkey") % 37 === 0)
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 4)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvT` BUCKETS 1 RETAIN 4 AS
           |SELECT status, qsk_agg(xxhash64(o_orderkey), cents, 256)
           |    AS qsk_cents,
           |  count(*) AS n_orders
           |FROM graft.`$base` GROUP BY status""".stripMargin)
      require(graft.pipeline.MvDef.read(mvT).exists(_.spec.qskK == 256),
        "the definition must persist the stored precision")
      require(QuantileSketch.decode(Scd1Merge.readTable(s, mvT)
        .select(col("qsk_cents")).head().getAs[Array[Byte]](0)).k == 256,
        "stored sketches must carry k=256")
      def qskAggC(h: org.apache.spark.sql.Column,
                  v: org.apache.spark.sql.Column, k: Int) =
        column(QskAgg(expression(h), expression(v), k)
          .toAggregateExpression())
      def qskQ(sk: org.apache.spark.sql.Column, p: Double) =
        column(QskQuantile(expression(sk), expression(lit(p))))
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def q(k: Int): DataFrame = Scd1Merge.readTable(s, base)
        .groupBy(col("status"))
        .agg(
          qskQ(qskAggC(xxhash64(col("o_orderkey")), col("cents"), k), 0.5)
            .as("p50"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("status"))
      require(scansOf(q(256)).forall(_.contains(mvT + "/")),
        "a k=256 query must serve from the k=256 MV")
      require(scansOf(q(QuantileSketch.DefaultK))
        .exists(_.contains(base + "/")),
        "a default-k query must fall through a k=256 MV")
      // wave → stale → SQL REFRESH folds at the stored precision
      Scd1Merge.upsert(s, base,
        s.range(2).select((col("id") + 92000000L).as("o_orderkey"),
          lit("F").as("status"), (col("id") * 100L + 77777L).as("cents")),
        Seq("o_orderkey"), retainVersions = 4)
      require(scansOf(q(256)).exists(_.contains(base + "/")),
        "a lagging MV must route to the base")
      graft.sql.GraftSql.sql(s, s"REFRESH MATERIALIZED VIEW graft.`$mvT`")
      val out = q(256)
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the refreshed k=256 MV must serve again")
      graft.plans.GraftMvRewrite.unregister(base)
      out
    }),

    "pipe37_approx_pctile_mv" -> ((s, dir) => {
      // OPT-IN approx_percentile SERVING (r13 verdict #7) — real
      // dashboards emit Spark's native `approx_percentile(m, p,
      // acc)`, not the engine's qsk spelling; r13 always fell through
      // (sound but never served). With
      // spark.graft.mv.serveApproxPercentile=true the rewrite swaps
      // approximate-FOR-approximate: approx_percentile(acc) bounds
      // rank error by 1/acc deterministically, the stored bottom-k
      // sample by ~1.65/√k at 95% — so the gate requires the MV's
      // bound be at least as tight (acc ≤ √k/1.65; k=1024 admits
      // acc ≤ 19.4). A tighter-accuracy query (or the 10000 default,
      // or conf off) falls through. At this SF the sample is complete
      // (k ≥ every group), so the served estimate is the EXACT
      // floor-indexed element — cross-derived in DuckDB — cast back
      // to the measure's type (approx_percentile returns its child's
      // type). In-row requires pin all three routings.
      import graft.pipeline.IncrementalAgg
      import graft.pipeline.IncrementalAgg.AggSpec
      val root = tmpDir("graft_appct")
      val base = root + "/orders"; val mvT = root + "/mv"
      val o = table(s, dir, "orders")
        .filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 4)
      val spec = AggSpec(Seq("status"), Nil, "n",
        quantiles = Seq("cents" -> "qsk_cents"),
        sampleKeys = Seq("o_orderkey"))
      IncrementalAgg.bootstrapFrom(s, mvT, base, spec, numBuckets = 1,
        retainVersions = 4)
      graft.plans.GraftMvRewrite.register(base, mvT, spec)
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def q(acc: Int): DataFrame = Scd1Merge.readTable(s, base)
        .groupBy(col("status"))
        .agg(expr(s"approx_percentile(cents, 0.5D, $acc)").as("p50"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("status"))
      require(scansOf(q(10)).forall(_.contains(base + "/")),
        "approx_percentile must never serve without the opt-in conf")
      s.conf.set("spark.graft.mv.serveApproxPercentile", "true")
      require(scansOf(q(10)).forall(_.contains(mvT + "/")),
        "acc=10 must serve from the sketch MV under the opt-in")
      require(scansOf(q(100)).forall(_.contains(base + "/")),
        "a tighter-accuracy query must fall through")
      require(scansOf(q(10000)).forall(_.contains(base + "/")),
        "the default accuracy must fall through")
      val out = q(10)
      require(scansOf(out).forall(_.contains(mvT + "/")))
      // materialize WHILE served: a later re-planning (the driver
      // re-optimizes on write) with the conf unset would compute a
      // NATIVE acc=10 estimate, which is legitimately different —
      // the judged rows are the served ones
      val rows = out.collect()
      s.conf.unset("spark.graft.mv.serveApproxPercentile")
      graft.plans.GraftMvRewrite.unregister(base)
      require(rows.nonEmpty)
      s.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    }),

    "pipe38_approx_pctile_array_mv" -> ((s, dir) => {
      // ARRAY-form approx_percentile SERVING (r14 verdict #8) —
      // dashboards emit `approx_percentile(m, array(0.25, 0.5, 0.95),
      // acc)`, one call for the whole percentile band; r14 served the
      // scalar form only (its own comment: "out of scope until asked
      // for"). The rewrite now lowers the array form to a CreateArray
      // of per-percentile estimates over ONE stored-sketch union
      // (physical planning dedups the repeated aggregate), same
      // accuracy gate (acc ≤ √k/1.65). At this SF the sample is
      // complete, so each element is the EXACT floor-indexed value —
      // cross-derived in DuckDB. The result explodes to (status,
      // pidx, pval) rows so the compare stays scalar. In-row requires
      // pin: conf-off falls through, acc=10 serves, acc=100 and the
      // default fall through.
      import graft.pipeline.IncrementalAgg
      import graft.pipeline.IncrementalAgg.AggSpec
      val root = tmpDir("graft_appctarr")
      val base = root + "/orders"; val mvT = root + "/mv"
      val o = table(s, dir, "orders")
        .filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 4)
      val spec = AggSpec(Seq("status"), Nil, "n",
        quantiles = Seq("cents" -> "qsk_cents"),
        sampleKeys = Seq("o_orderkey"))
      IncrementalAgg.bootstrapFrom(s, mvT, base, spec, numBuckets = 1,
        retainVersions = 4)
      graft.plans.GraftMvRewrite.register(base, mvT, spec)
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def q(acc: Int): DataFrame = Scd1Merge.readTable(s, base)
        .groupBy(col("status"))
        .agg(expr(
          s"approx_percentile(cents, array(0.25D, 0.5D, 0.95D), $acc)")
          .as("ps"), count(lit(1)).as("n_orders"))
      require(scansOf(q(10)).forall(_.contains(base + "/")),
        "the array form must never serve without the opt-in conf")
      s.conf.set("spark.graft.mv.serveApproxPercentile", "true")
      require(scansOf(q(10)).forall(_.contains(mvT + "/")),
        "acc=10 array form must serve from the sketch MV")
      require(scansOf(q(100)).forall(_.contains(base + "/")),
        "a tighter-accuracy array query must fall through")
      require(scansOf(q(10000)).forall(_.contains(base + "/")),
        "the default accuracy must fall through")
      val out = q(10)
        .select(col("status"), col("n_orders"),
          posexplode(col("ps")).as(Seq("pidx", "pval")))
        .select(col("status"), col("pidx"), col("pval"), col("n_orders"))
        .orderBy(col("status"), col("pidx"))
      require(scansOf(out).forall(_.contains(mvT + "/")))
      // materialize WHILE served (the pipe37 argument: a re-plan
      // after opt-out computes a legitimately different native
      // estimate — the judged rows are the served ones)
      val rows = out.collect()
      s.conf.unset("spark.graft.mv.serveApproxPercentile")
      graft.plans.GraftMvRewrite.unregister(base)
      require(rows.nonEmpty)
      s.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    }),

    "pipe30_mv_chain" -> ((s, dir) => {
      // MV-OVER-MV CHAIN — the rollup cascade every warehouse runs
      // (base → daily MV → monthly MV): an MV table IS a graft table
      // with a change feed and commit stamps, so the SECOND layer
      // needs no new machinery — mv_month registers mv_day as its
      // base, maintenance consumes mv_day's feed (a daily row's
      // update nets -old +new through the signed algebra), and
      // freshness gates PER LINK: a base wave stales mv_day's rewrite
      // while mv_month stays fresh w.r.t. its OWN base (mv_day's
      // unchanged content) — pinned in-row; each REFRESH re-arms its
      // link. The 100 TB shape: the monthly dashboard reads O(months)
      // rows maintained from O(days) rows maintained from O(delta)
      // base changes — no layer ever re-reads the one below in full.
      val root = tmpDir("graft_mvchain")
      val base = root + "/orders"
      val mvD = root + "/mv_day"; val mvM = root + "/mv_month"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 4)
      // RETAIN 4: the chain's CDC contract — mv_day's history must
      // cover mv_month's lag window (a refresh can land a maintenance
      // commit AND a tombstone-sweep commit; the default retain of 1
      // would loudly expire the feed before mv_month consumes it)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvD` BUCKETS 2
           |RETAIN 4 AS
           |SELECT d, sum(cents) AS sc, count(*) AS n
           |FROM graft.`$base` GROUP BY d""".stripMargin)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvM` BUCKETS 1 AS
           |SELECT substring(d, 1, 7) AS m, sum(sc) AS sc,
           |  sum(n) AS n_orders, count(*) AS nd
           |FROM graft.`$mvD` GROUP BY substring(d, 1, 7)""".stripMargin)
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def qMonth(): DataFrame = graft.sql.GraftSql.sql(s,
        s"""SELECT substring(d, 1, 7) AS m, sum(sc) AS sc,
           |  sum(n) AS n_orders
           |FROM graft.`$mvD` GROUP BY substring(d, 1, 7)
           |ORDER BY m""".stripMargin)
      def qDay(): DataFrame = graft.sql.GraftSql.sql(s,
        s"""SELECT d, sum(cents) AS sc FROM graft.`$base`
           |GROUP BY d ORDER BY d""".stripMargin)
      require(scansOf(qMonth()).forall(_.contains(mvM + "/")),
        "the monthly dashboard must answer from the second-layer MV")
      require(scansOf(qDay()).forall(_.contains(mvD + "/")),
        "the daily query must answer from the first-layer MV")
      // the wave: a correction + a delete on the BASE
      Scd1Merge.upsert(s, base,
        o.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("cents", col("cents") + 5L),
        Seq("o_orderkey"), retainVersions = 4)
      Scd1Merge.delete(s, base, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(13)) === 0, retainVersions = 4)
      // link-local freshness: mv_day is stale (its base moved), but
      // mv_month is still fresh w.r.t. ITS base — mv_day's content
      // has not changed yet
      require(scansOf(qDay()).exists(_.contains(base + "/")),
        "a lagging first layer must route to the base")
      require(scansOf(qMonth()).forall(_.contains(mvM + "/")),
        "the second layer stays fresh until its OWN base moves")
      val r1 = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mvD`").collect().head
      require(r1.getLong(1) == 2L, s"mv_day must fold 2 commits: $r1")
      // now the SECOND link is stale: mv_day's content moved
      require(scansOf(qMonth()).exists(_.contains(mvD + "/")) &&
        !scansOf(qMonth()).exists(_.contains(mvM + "/")),
        "a refreshed first layer stales the second")
      val r2 = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mvM`").collect().head
      require(r2.getLong(1) >= 1L, s"mv_month must fold mv_day's commit: $r2")
      val out = qMonth()
      require(scansOf(out).forall(_.contains(mvM + "/")),
        "the refreshed chain must answer from the top again")
      out
    }),

    "pipe29_sketch_mv" -> ((s, dir) => {
      // APPROXIMATE (HLL-SKETCH) MV — the distinct-count dashboard
      // (`unique customers per status`) at 100 TB: exact
      // COUNT(DISTINCT) cannot re-aggregate from any per-group
      // scalar, and the exact IncrementalDistinct multiplicity table
      // is value-cardinality-sized; the sketch MV stores ONE KB-scale
      // Datasketches HLL binary per group instead. Register maxima
      // merge losslessly, so maintenance is the min/max two-speed
      // shape with a blunter flag: inserts UNION into the stored
      // sketch (pure O(delta) — the append hot path sketches exist
      // for), and ANY non-null retraction flags its group for a
      // semi-joined base rescan (a sketch has no inverse). The
      // transparent rewrite answers `hll_sketch_agg(x)` with the
      // EXACT union of stored sketches — same estimate a base scan
      // would build — and `hll_sketch_estimate` rides along as an
      // output wrapper. In-row requires pin routing (fresh MV / lag
      // to base / refreshed MV); the oracle computes the final
      // n_orders exactly and pins the (deterministic: register-max
      // merges commute) estimates as literals.
      val root = tmpDir("graft_skmv")
      val base = root + "/orders"; val mvT = root + "/mv"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus").as("status"), col("o_custkey"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 4)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvT` BUCKETS 2 AS
           |SELECT status, hll_sketch_agg(o_custkey) AS sk_cust,
           |  count(*) AS n_orders
           |FROM graft.`$base` GROUP BY status""".stripMargin)
      import graft.pipeline.MvDef
      require(MvDef.read(mvT).exists(
        _.spec.sketches == Seq("o_custkey" -> "sk_cust")),
        "the definition must persist the sketch spec")
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
        s"""SELECT status,
           |  hll_sketch_estimate(hll_sketch_agg(o_custkey)) AS est_cust,
           |  count(*) AS n_orders
           |FROM graft.`$base` GROUP BY status ORDER BY status""".stripMargin)
      require(scansOf(q()).forall(_.contains(mvT + "/")),
        "the fresh sketch MV must answer the distinct-count dashboard")
      // the wave: an INSERT-ONLY commit (new orders, new customers —
      // the pure union-fold leg) then a retraction commit (deletes,
      // some removing a customer's last order in its status — the
      // blunt flag's rescan leg); ONE refresh folds both
      Scd1Merge.upsert(s, base,
        o.filter(pmod(col("o_orderkey"), lit(5)) === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("status"), (col("o_custkey") + 1000000L).as("o_custkey")),
        Seq("o_orderkey"), retainVersions = 4)
      Scd1Merge.delete(s, base, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(17)) === 0, retainVersions = 4)
      require(scansOf(q()).exists(_.contains(base + "/")),
        "a lagging sketch MV must route to the base")
      val r = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mvT`").collect().head
      require(r.getLong(1) == 2L, s"refresh must fold both commits: $r")
      val out = q()
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the refreshed sketch MV must answer again")
      out
    }),

    "pipe26_filtered_star_mv" -> ((s, dir) => {
      // FILTERED STAR MV — the dashboard-filter shape over a join:
      // `WHERE` on FACT columns bakes into the star MV (the predicate
      // commutes with every telescoped delta term because it reads
      // fact columns only — enforced loudly at CREATE; a dim-column
      // predicate would change which fact rows pass when the DIM row
      // changes). Maintenance evaluates it per signed change row
      // (boundary crossings net exactly the visible transition) and
      // applies it to the fact legs BEFORE the joins — filtered-out
      // mass never joins. The rewrite matches the predicate ON THE
      // FACT LEAF (where the optimizer pushes it), canonically
      // against the definition; a different or missing predicate
      // falls through. In-row requires pin routing; the oracle
      // recomputes from the final content of both tables.
      import graft.pipeline.MvDef
      val root = tmpDir("graft_fsmv")
      val factT = root + "/fact"; val dimT = root + "/part"
      val mvT = root + "/mv"
      val li = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min(col("l_partkey")).as("l_partkey"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      Scd1Merge.upsert(s, factT, li, Seq("l_orderkey", "l_linenumber"),
        numBuckets = 8, retainVersions = 4)
      Scd1Merge.upsert(s, dimT, table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand").as("brand")),
        Seq("p_partkey"), numBuckets = 4, retainVersions = 4)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvT` BUCKETS 4 AS
           |SELECT brand, sum(cents) AS sum_cents, count(*) AS n_items
           |FROM graft.`$factT` f
           |JOIN graft.`$dimT` p ON f.l_partkey = p.p_partkey
           |WHERE cents > 2000000 GROUP BY brand""".stripMargin)
      require(MvDef.read(mvT).exists(_.spec.filterSql.nonEmpty),
        "the star definition must persist the fact filter")
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def q(): DataFrame =
        Scd1Merge.readTable(s, factT).filter(col("cents") > 2000000L).as("f")
          .join(Scd1Merge.readTable(s, dimT).as("p"),
            col("f.l_partkey") === col("p.p_partkey"))
          .groupBy(col("brand"))
          .agg(sum(col("cents")).as("sum_cents"),
            count(lit(1)).as("n_items"))
          .orderBy(col("brand"))
      require(scansOf(q()).forall(_.contains(mvT + "/")),
        "same-predicate star query must answer from the filtered MV")
      // a DIFFERENT-predicate star query must fall through, always
      val other = Scd1Merge.readTable(s, factT)
        .filter(col("cents") > 10L).as("f")
        .join(Scd1Merge.readTable(s, dimT).as("p"),
          col("f.l_partkey") === col("p.p_partkey"))
        .groupBy(col("brand")).agg(sum(col("cents")).as("sum_cents"))
      require(!scansOf(other).forall(_.contains(mvT + "/")),
        "a different predicate must never use the filtered star MV")
      // boundary-crossing fact wave (corrections push rows across the
      // threshold both ways) + a brand move, ONE refresh folds both
      Scd1Merge.upsert(s, factT,
        li.filter(pmod(col("l_orderkey"), lit(9)) === 0)
          .withColumn("cents",
            when(col("cents") > 2000000L, col("cents") - 1500000L)
              .otherwise(col("cents") + 1500000L)),
        Seq("l_orderkey", "l_linenumber"), retainVersions = 4)
      Scd1Merge.upsert(s, dimT, table(s, dir, "part")
        .filter(pmod(col("p_partkey"), lit(10)) === 0)
        .select(col("p_partkey"), lit("BrandX").as("brand")),
        Seq("p_partkey"), retainVersions = 4)
      require(scansOf(q()).exists(_.contains(factT + "/")),
        "a lagging filtered star MV must route to the real join")
      val r = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mvT`").collect().head
      require(r.getLong(1) == 2L, s"refresh must fold fact+dim lags: $r")
      val out = q()
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the refreshed filtered star MV must answer again")
      out
    }),

    "pipe25_partitioned_star_mv" -> ((s, dir) => {
      // STAR MV OVER A PARTITIONED FACT — the actual 100 TB
      // composition: the fact is month-partitioned (routed merges,
      // path-pruned reads), the dashboard star aggregate over
      // fact ⋈ customer ⋈ priority is maintained by the telescoped
      // delta riding the PARTITIONED change feed (per-partition child
      // diffs — a month-B ingest + month-A correction is ONE parent
      // commit whose feed reads only those two months), and the
      // transparent rewrite matches the UNION-of-child-scans fact
      // leaf inside the join tree. Dims stay flat (dimension-sized
      // SCD1 — enforced loudly). In-row requires pin the routing
      // (fresh→MV through the union leaf, any-side lag→real join,
      // refreshed→MV) and the refresh accounting; the oracle
      // recomputes from all three tables' final content.
      import graft.merge.PartitionedTable
      import graft.pipeline.MvDef
      val root = tmpDir("graft_psmv")
      val factT = root + "/fact"; val d1T = root + "/cust"
      val d2T = root + "/pri"; val mvT = root + "/mv"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        col("o_custkey"), col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("o_month").between("1995-01", "1995-06"))
      val keys = Seq("o_month", "o_orderkey")
      PartitionedTable.upsert(s, factT,
        o.filter(col("o_month") <= "1995-05"), keys, "o_month",
        numBuckets = 2, retainVersions = 4)
      Scd1Merge.upsert(s, d1T, table(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment").as("seg")),
        Seq("c_custkey"), numBuckets = 4, retainVersions = 4)
      Scd1Merge.upsert(s, d2T, table(s, dir, "orders")
        .select(col("o_orderpriority").as("pri")).distinct()
        .withColumn("band", substring(col("pri"), 1, 1)),
        Seq("pri"), numBuckets = 1, retainVersions = 4)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mvT` BUCKETS 4 AS
           |SELECT seg, band, sum(cents) AS sum_cents,
           |  count(*) AS n_orders
           |FROM graft.`$factT` f
           |JOIN graft.`$d1T` c ON f.o_custkey = c.c_custkey
           |JOIN graft.`$d2T` p ON f.pri = p.pri
           |GROUP BY seg, band""".stripMargin)
      require(MvDef.read(mvT).exists(d =>
        d.basePath == factT && d.joins.size == 2),
        "SQL star CREATE must persist the partitioned fact + 2 dims")
      def scansOf(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten
      def q(): DataFrame =
        PartitionedTable.readTable(s, factT).as("f")
          .join(Scd1Merge.readTable(s, d1T).as("c"),
            col("f.o_custkey") === col("c.c_custkey"))
          .join(Scd1Merge.readTable(s, d2T).as("p"),
            col("f.pri") === col("p.pri"))
          .groupBy(col("seg"), col("band"))
          .agg(sum(col("cents")).as("sum_cents"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("seg"), col("band"))
      require(scansOf(q()).forall(_.contains(mvT + "/")),
        "fresh star MV must answer through the union-of-scans fact leaf")
      // the wave: ONE parent commit carrying a month-B ingest + a
      // correction into loaded months, plus a dim-1 segment move
      PartitionedTable.upsert(s, factT,
        o.filter(col("o_month") === "1995-06").unionByName(
          o.filter(col("o_month") <= "1995-05" &&
            pmod(col("o_orderkey"), lit(11)) === 0)
            .withColumn("cents", col("cents") + 7L)),
        keys, "o_month", retainVersions = 4)
      Scd1Merge.upsert(s, d1T,
        table(s, dir, "customer")
          .filter(pmod(col("c_custkey"), lit(6)) === 0)
          .select(col("c_custkey"), lit("MOVED").as("seg")),
        Seq("c_custkey"), retainVersions = 4)
      require(scansOf(q()).exists(_.contains(factT + "/")),
        "a lagging star MV must route to the real join")
      val r = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mvT`").collect().head
      require(r.getLong(1) == 2L, s"refresh must fold fact+dim lags: $r")
      val out = q()
      require(scansOf(out).forall(_.contains(mvT + "/")),
        "the refreshed star MV must answer again")
      out
    }),

    "pipe24_minmax_mv" -> ((s, dir) => {
      // MIN/MAX MV — the non-abelian aggregates every dashboard wants
      // next to its sums: maintenance is TWO-SPEED (IncrementalAgg):
      // inserts FOLD via least/greatest (pure O(delta) — the append
      // hot path never touches the base), and only groups where a
      // retraction lands AT or PAST the stored extreme RESCAN, via a
      // group-semi-joined base aggregation — the honest price every
      // IVM system pays for min/max under deletes, confined to the
      // flagged groups. The wave forces both legs: a big downward
      // correction (new minima = retractions at stored maxima for the
      // touched groups) plus deletes (some removing group extremes).
      // The rewrite answers sum/min/max/count from the MV (min/max
      // re-aggregate exactly on roll-up — idempotent semilattice);
      // in-row requires pin the routing, the oracle recomputes all
      // four aggregates from the final base content.
      val root = tmpDir("graft_mmx")
      val base = root + "/orders"; val mv = root + "/mv"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 8,
        retainVersions = 4)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 4 AS
           |SELECT pri, sum(cents) AS sum_cents, min(cents) AS min_cents,
           |  max(cents) AS max_cents, count(*) AS n_orders
           |FROM graft.`$base` GROUP BY pri""".stripMargin)
      val d = graft.pipeline.MvDef.read(mv).get
      require(d.spec.mins == Seq("cents" -> "min_cents") &&
        d.spec.maxs == Seq("cents" -> "max_cents"),
        s"SQL CREATE must persist the extreme specs: ${d.spec}")
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
        s"""SELECT pri, sum(cents) AS sum_cents, min(cents) AS min_cents,
           |  max(cents) AS max_cents, count(*) AS n_orders
           |FROM graft.`$base` GROUP BY pri ORDER BY pri""".stripMargin)
      require(scansOf(q()).forall(_.contains(mv + "/")),
        "fresh min/max MV must answer the query")
      // the wave: big downward corrections + deletes, then one REFRESH
      Scd1Merge.upsert(s, base,
        o.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("cents", col("cents") - 100000L),
        Seq("o_orderkey"), retainVersions = 4)
      Scd1Merge.delete(s, base, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(13)) === 0, retainVersions = 4)
      require(scansOf(q()).forall(_.contains(base + "/")),
        "the stale MV must route to the base")
      val r = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect().head
      require(r.getLong(1) == 2L, s"refresh must fold 2 commits: $r")
      val out = q()
      require(scansOf(out).forall(_.contains(mv + "/")),
        "the refreshed min/max MV must answer again")
      out
    }),

    "pipe22_filtered_mv" -> ((s, dir) => {
      // FILTERED + EXPRESSION-GROUP MV — the two most common
      // production MV shapes, created through SQL in one definition:
      // a WHERE predicate baked into the MV (only urgent orders
      // contribute; maintenance evaluates the predicate per change
      // row, so an update CROSSING the boundary nets exactly the
      // visible transition: pass→fail = −old, fail→pass = +new) and
      // a `date_format(date,'yyyy-MM')` grouping EXPRESSION
      // materialized as a real MV column (the Iceberg-transform-style
      // roll-up: `GROUP BY month(d)` answered O(months)). The
      // transparent rewrite admits exactly a query carrying the SAME
      // canonical predicate and group expression — matched through
      // the optimizer's PullOutGroupingExpressions aliasing — and
      // falls through for any other predicate. In-row requires pin
      // the routing (fresh→MV, boundary-crossing wave→base,
      // REFRESH→MV again, wrong-predicate query→base always); the
      // oracle recomputes the answer from the final base content, so
      // a maintenance step that mis-netted a boundary crossing would
      // break the hash.
      val root = tmpDir("graft_fmv")
      val base = root + "/orders"; val mv = root + "/mv"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderdate"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scd1Merge.upsert(s, base, o, Seq("o_orderkey"), numBuckets = 8,
        retainVersions = 4)
      graft.sql.GraftSql.sql(s,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 4 AS
           |SELECT date_format(o_orderdate, 'yyyy-MM') AS o_month,
           |  sum(cents) AS sum_cents, count(*) AS n_orders
           |FROM graft.`$base`
           |WHERE o_orderpriority = '1-URGENT'
           |GROUP BY date_format(o_orderdate, 'yyyy-MM')""".stripMargin)
      // the definition persisted BOTH shapes
      val d = graft.pipeline.MvDef.read(mv).get
      require(d.spec.filterSql.nonEmpty && d.spec.groupExprs.keySet == Set("o_month"),
        s"MV definition must carry filter + group expression: ${d.spec}")
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
        s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS o_month,
           |  sum(cents) AS sum_cents, count(*) AS n_orders
           |FROM graft.`$base`
           |WHERE o_orderpriority = '1-URGENT'
           |GROUP BY date_format(o_orderdate, 'yyyy-MM')
           |ORDER BY o_month""".stripMargin)
      require(scansOf(q()).forall(_.contains(mv + "/")),
        "fresh filtered MV must answer the same-shape query")
      // a DIFFERENT predicate must fall through to the base, always
      def qOther(): DataFrame = graft.sql.GraftSql.sql(s,
        s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS o_month,
           |  sum(cents) AS sum_cents
           |FROM graft.`$base` WHERE o_orderpriority = '5-LOW'
           |GROUP BY date_format(o_orderdate, 'yyyy-MM')""".stripMargin)
      require(scansOf(qOther()).forall(_.contains(base + "/")),
        "a different predicate must never be answered by the filtered MV")
      // boundary-crossing wave: keys %7==0 FLIP across the predicate
      // (urgent→low = pass→fail nets −old; other→urgent = fail→pass
      // nets +new) and bump cents; then delete keys %13==0
      Scd1Merge.upsert(s, base,
        o.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("o_orderpriority",
            when(col("o_orderpriority") === "1-URGENT", "5-LOW")
              .otherwise("1-URGENT"))
          .withColumn("cents", col("cents") + 10L),
        Seq("o_orderkey"), retainVersions = 4)
      require(scansOf(q()).forall(_.contains(base + "/")),
        "the stale filtered MV must route to the base")
      Scd1Merge.delete(s, base, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(13)) === 0, retainVersions = 4)
      // one REFRESH folds BOTH lagging commits O(delta)
      val r = graft.sql.GraftSql.sql(s,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`").collect().head
      require(r.getLong(1) == 2L, s"refresh must fold exactly 2 commits: $r")
      val out = q()
      require(scansOf(out).forall(_.contains(mv + "/")),
        "the refreshed filtered MV must answer again")
      // PREDICATE SUBSUMPTION: the definition's predicate AND a
      // residual on the materialized group EXPRESSION — the residual
      // re-expresses over the MV's month column and applies over the
      // MV-sized table (conjuncts ⊇ definition, residual
      // group-measurable); a residual on a non-MV column or a
      // disjunction still falls through (MvRewriteSpec pins those)
      val resid = graft.sql.GraftSql.sql(s,
        s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS o_month,
           |  sum(cents) AS sum_cents
           |FROM graft.`$base`
           |WHERE o_orderpriority = '1-URGENT'
           |  AND date_format(o_orderdate, 'yyyy-MM') >= '1996-01'
           |GROUP BY date_format(o_orderdate, 'yyyy-MM')""".stripMargin)
      require(scansOf(resid).forall(_.contains(mv + "/")),
        "a subsuming predicate with a group-expression residual must " +
        "answer from the MV")
      out
    }),

    "pipe8_incremental_dedup" -> ((s, dir) => {
      // INCREMENTAL EXACT DEDUP AS A MAINTAINED TABLE: the seen-hash
      // set every continuously-ingesting corpus keeps — batches arrive
      // (membership by doc_id mod 3, nonempty at every SF), each batch
      // hashes its texts, anti-joins the PERSISTED seen table (one
      // metadata-pruned read, no corpus rescan), and commits only the
      // genuinely-new hashes through the crash-safe batch-stamped
      // protocol. First-seen wins (not global min-id): the oracle
      // re-derives survivor = min (batch, doc_id) per hash. A replay of
      // the last batch proves idempotence — the anti-join leaves
      // nothing, the commit is a manifest-only stamp advance, and the
      // row count is unchanged (the `rerun_noop` literal).
      val path = tmpDir("graft_incdd") + "/seen_hashes"
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      def batch(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .groupBy(sha2(col("text"), 256).as("content_hash"))
        .agg(min(col("doc_id")).as("doc_id"))
      for (i <- 0 until 3) {
        val fresh =
          if (i == 0) batch(i)
          else batch(i).join(Scd1Merge.readTable(s, path).select(col("content_hash")),
            Seq("content_hash"), "left_anti")
        Scd1Merge.upsert(s, path, fresh, Seq("content_hash"), numBuckets = 8,
          batchId = f"B${i + 1}%04d")
      }
      val before = Scd1Merge.readTable(s, path).count()
      val replay = batch(2).join(Scd1Merge.readTable(s, path).select(col("content_hash")),
        Seq("content_hash"), "left_anti")
      val replayEmpty = replay.isEmpty
      Scd1Merge.upsert(s, path, replay, Seq("content_hash"), batchId = "B0003")
      val after = Scd1Merge.readTable(s, path).count()
      Scd1Merge.readTable(s, path)
        .select(col("content_hash"), col("doc_id"),
          lit(replayEmpty && before == after).as("rerun_noop"))
        .orderBy(col("content_hash"))
    }),

    "pipe3_fact_build" -> ((s, dir) => {
      // Fact FK resolution (gold_fact.py:34-38): dims built with
      // deterministic surrogate keys, then broadcast-joined into the
      // fact; measures + surrogate keys kept.
      val dimPart = KeyGenStrategy.GlobalWindow.assign(
        table(s, dir, "part").select(col("p_partkey")), "p_partkey", "dim_part_key", 1L)
      val dimSupp = KeyGenStrategy.GlobalWindow.assign(
        table(s, dir, "supplier").select(col("s_suppkey")), "s_suppkey", "dim_supp_key", 1L)
      val silver = table(s, dir, "lineitem")
        .withColumnRenamed("l_partkey", "p_partkey")
        .withColumnRenamed("l_suppkey", "s_suppkey")
      FactBuilder.resolve(silver,
          measures = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
          dims = Seq(
            (dimPart, Seq("p_partkey"), "dim_part_key"),
            (dimSupp, Seq("s_suppkey"), "dim_supp_key")))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("dim_part_key"), col("dim_supp_key"))
    })
  )

  /** DuckDB twin of one dim's 3-batch incremental key assignment:
    * batch-1 keys start at 2 (Q4), each later batch continues from the
    * running max, new rows detected by join-key absence and numbered by
    * the id column — mirroring DimBuilder + KeyGenStrategy.Scalable. */
  private def dimOracle(alias: String, key: String, id: String, attrsSel: String): String = {
    val a = if (attrsSel.isEmpty) "" else s", $attrsSel"
    s"""${alias}1 AS (SELECT 1 + row_number() OVER (ORDER BY $id) AS $key, $id$a
       |  FROM (SELECT DISTINCT $id$a FROM r1)),
       |${alias}2 AS (SELECT (SELECT max($key) FROM ${alias}1) + row_number() OVER (ORDER BY $id) AS $key, $id$a
       |  FROM (SELECT DISTINCT $id$a FROM r2 WHERE $id NOT IN (SELECT $id FROM ${alias}1))),
       |${alias}3 AS (SELECT (SELECT max($key) FROM (SELECT $key FROM ${alias}1 UNION ALL SELECT $key FROM ${alias}2)) + row_number() OVER (ORDER BY $id) AS $key, $id$a
       |  FROM (SELECT DISTINCT $id$a FROM raw
       |        WHERE $id NOT IN (SELECT $id FROM ${alias}1 UNION ALL SELECT $id FROM ${alias}2))),
       |$alias AS (SELECT * FROM ${alias}1 UNION ALL SELECT * FROM ${alias}2 UNION ALL SELECT * FROM ${alias}3)""".stripMargin
  }

  private val SalesGoldOracle =
    s"""WITH raw AS (
       |  SELECT Branch_ID, Dealer_ID, Model_ID, Revenue, Units_Sold, Date_ID,
       |         BranchName, DealerName, split_part(Model_ID, '-', 1) AS model_category
       |  FROM read_csv('/root/reference/raw_data/SalesData.csv', header=true, nullstr='')),
       |r1 AS (SELECT * FROM raw WHERE Date_ID <= 'DT00400'),
       |r2 AS (SELECT * FROM raw WHERE Date_ID <= 'DT00800'),
       |${dimOracle("dbranch", "dim_branch_key", "Branch_ID", "BranchName")},
       |${dimOracle("ddealer", "dim_dealer_key", "Dealer_ID", "DealerName")},
       |${dimOracle("dmodel", "dim_model_key", "Model_ID", "model_category")},
       |${dimOracle("ddate", "dim_date_key", "Date_ID", "")}
       |SELECT f.Revenue, f.Units_Sold, b.dim_branch_key, d.dim_dealer_key,
       |       m.dim_model_key, t.dim_date_key
       |FROM raw f
       |LEFT JOIN dbranch b ON f.Branch_ID = b.Branch_ID
       |LEFT JOIN ddealer d ON f.Dealer_ID = d.Dealer_ID
       |LEFT JOIN dmodel m ON f.Model_ID = m.Model_ID
       |LEFT JOIN ddate t ON f.Date_ID = t.Date_ID
       |ORDER BY dim_branch_key, dim_dealer_key, dim_model_key, dim_date_key""".stripMargin

  val oracle: Map[String, String] = Map(
    "pipe4_sales_gold" -> SalesGoldOracle,
    // the streaming star schema must land the SAME final state as the
    // batch fidelity replay — identical key assignment (delta ≡ full
    // silver for dim naturals), identical FK resolution
    "pipe18_stream_star" -> SalesGoldOracle,
    "pipe5_sales_gold_scale" -> SalesGoldOracle,
    "pipe1_silver_transform" ->
      """SELECT p_partkey, p_brand, split_part(p_type, ' ', 1) AS category,
         |  p_retailprice / p_size AS price_per_size
         |FROM part ORDER BY p_partkey""".stripMargin,
    "pipe2_dim_build_incremental" ->
      """WITH b1 AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 1000),
         |d1 AS (SELECT 1 + row_number() OVER (ORDER BY c_custkey) AS dim_key, c_custkey, c_name FROM b1),
         |b2 AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey > 1000),
         |d2 AS (SELECT (SELECT max(dim_key) FROM d1) + row_number() OVER (ORDER BY c_custkey) AS dim_key,
         |        c_custkey, c_name FROM b2)
         |SELECT dim_key, c_custkey, c_name FROM d1
         |UNION ALL SELECT dim_key, c_custkey, c_name FROM d2
         |ORDER BY dim_key""".stripMargin,
    "s17_late_reprocess" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "s27_constraints" ->
      """WITH p AS (SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 97 = 0 THEN 'ZZ' ELSE o_orderstatus END AS st,
         |    CASE WHEN o_orderkey % 50 = 0 THEN -o_totalprice ELSE o_totalprice END AS price
         |  FROM orders),
         |v AS (SELECT st,
         |    concat_ws(',',
         |      CASE WHEN NOT (price > 0) THEN 'price_positive' END,
         |      CASE WHEN NOT (st IN ('O','F','P')) THEN 'status_known' END) AS viol
         |  FROM p)
         |SELECT 'committed' AS side, st AS k, count(*) AS n FROM v
         |WHERE viol = '' GROUP BY 2
         |UNION ALL
         |SELECT 'quarantined' AS side, viol AS k, count(*) AS n FROM v
         |WHERE viol <> '' GROUP BY 2
         |ORDER BY side, k""".stripMargin,
    "s26_update" ->
      """SELECT o_orderstatus, count(*) AS n,
         |  sum(CAST(round(CASE WHEN o_orderstatus = 'O'
         |        THEN o_totalprice * 1.1 ELSE o_totalprice END * 100) AS BIGINT)) / 100.0
         |    AS total
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "s24_delete" ->
      """SELECT o_orderstatus, count(*) AS n,
         |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
         |FROM orders WHERE o_orderkey % 13 <> 0 AND o_orderkey <> 32
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s28_restore" ->
      """SELECT 'restore_feed' AS part, c_custkey, c_mktsegment AS seg,
         |       'update' AS change
         |FROM customer WHERE c_custkey % 2 = 1 AND c_custkey % 7 = 0
         |UNION ALL
         |SELECT 'restore_feed', c_custkey, c_mktsegment || '+u', 'update_preimage'
         |FROM customer WHERE c_custkey % 2 = 1 AND c_custkey % 7 = 0
         |UNION ALL
         |SELECT 'restore_feed', c_custkey, c_mktsegment, 'delete'
         |FROM customer WHERE c_custkey % 2 = 0
         |UNION ALL
         |SELECT 'final', c_custkey,
         |  c_mktsegment || CASE WHEN c_custkey % 5 = 0 THEN '+r' ELSE '' END, ''
         |FROM customer WHERE c_custkey % 2 = 1
         |ORDER BY part, c_custkey, change""".stripMargin,
    "s19_change_feed" ->
      """SELECT 2::BIGINT AS commit, c_custkey,
         |       c_mktsegment || '+u' AS seg, 'update' AS _change_type
         |FROM customer WHERE c_custkey % 2 = 1 AND c_custkey % 7 = 0
         |UNION ALL
         |SELECT 2::BIGINT, c_custkey, c_mktsegment, 'update_preimage'
         |FROM customer WHERE c_custkey % 2 = 1 AND c_custkey % 7 = 0
         |UNION ALL
         |SELECT 3::BIGINT, c_custkey, c_mktsegment, 'insert'
         |FROM customer WHERE c_custkey % 2 = 0
         |UNION ALL
         |SELECT 4::BIGINT, c_custkey,
         |       c_mktsegment ||
         |         CASE WHEN c_custkey % 2 = 1 AND c_custkey % 7 = 0 THEN '+u' ELSE '' END,
         |       'delete'
         |FROM customer WHERE c_custkey % 13 = 0
         |ORDER BY commit, c_custkey""".stripMargin,
    "s20_rebucket" ->
      """SELECT c_custkey, c_mktsegment AS seg FROM customer
         |ORDER BY c_custkey""".stripMargin,
    "s21_data_skipping" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice
         |FROM orders WHERE o_orderkey = 7
         |UNION ALL
         |SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1995-02-01 00:00:00'
         |  AND o_totalprice > 200000.0
         |ORDER BY o_orderkey""".stripMargin,
    "s22_zorder_cluster" ->
      """SELECT count(*) AS n_rows, sum(l_quantity) AS sum_qty,
         |       min(l_suppkey) AS min_supp, max(l_extendedprice) AS max_price
         |FROM lineitem
         |WHERE l_orderkey BETWEEN 1000 AND 3000
         |  AND l_partkey BETWEEN 50 AND 250""".stripMargin,
    "s23_recluster" ->
      """SELECT count(*) AS n_rows, sum(l_quantity) AS sum_qty,
         |       min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
         |FROM lineitem
         |WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey <= 60
         |  AND l_orderkey > 100""".stripMargin,
    "s18_time_travel" ->
      """WITH s1 AS (SELECT c_custkey, c_mktsegment AS seg FROM customer WHERE c_custkey % 2 = 1),
         |s2 AS (SELECT c_custkey,
         |         c_mktsegment || CASE WHEN c_custkey % 7 = 0 THEN '+u' ELSE '' END AS seg
         |       FROM customer WHERE c_custkey % 2 = 1),
         |s3 AS (SELECT * FROM s2
         |       UNION ALL
         |       SELECT c_custkey, c_mktsegment AS seg FROM customer WHERE c_custkey % 2 = 0)
         |SELECT 1::BIGINT AS snapshot, * FROM s1
         |UNION ALL SELECT 2::BIGINT, * FROM s2
         |UNION ALL SELECT 3::BIGINT, * FROM s3
         |ORDER BY snapshot, c_custkey""".stripMargin,
    "s16_scd2_dim" ->
      """WITH b AS (
         |  SELECT c_custkey,
         |         c_mktsegment || CASE WHEN seq >= 3 AND c_custkey % 5 = 0 THEN '+3'
         |                              WHEN seq >= 2 AND c_custkey % 3 = 0 THEN '+2'
         |                              ELSE '' END AS segment,
         |         seq
         |  FROM customer CROSS JOIN (VALUES (1),(2),(3)) s(seq)),
         |m AS (
         |  SELECT *, lag(segment) OVER (PARTITION BY c_custkey ORDER BY seq) AS prev FROM b),
         |v AS (
         |  SELECT c_custkey, segment, seq FROM m
         |  WHERE prev IS NULL OR prev <> segment),
         |h AS (
         |  SELECT c_custkey, segment, seq::BIGINT AS valid_from,
         |         (lead(seq) OVER (PARTITION BY c_custkey ORDER BY seq))::BIGINT AS valid_to
         |  FROM v)
         |SELECT c_custkey, segment, valid_from, valid_to, valid_to IS NULL AS is_current
         |FROM h ORDER BY c_custkey, valid_from""".stripMargin,
    "pipe6_batch_recovery" ->
      """WITH d1 AS (SELECT 1 + row_number() OVER (ORDER BY c_custkey) AS dim_key, c_custkey
         |  FROM customer WHERE c_custkey % 3 <> 2),
         |d2 AS (SELECT (SELECT max(dim_key) FROM d1) + row_number() OVER (ORDER BY c_custkey) AS dim_key, c_custkey
         |  FROM customer WHERE c_custkey % 3 = 2),
         |d AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
         |SELECT o_orderkey, dim_key, o_totalprice,
         |  TRUE AS b1_consistent, TRUE AS crash_detected,
         |  TRUE AS publish_isolated, TRUE AS repaired_consistent
         |FROM orders LEFT JOIN d ON o_custkey = c_custkey
         |ORDER BY o_orderkey""".stripMargin,
    "pipe15_cdc_scd2" ->
      // version rules per key k: v1 lives [1, 2) if renamed at c2,
      // else [1, 3) if deleted at c3, else open; the rename's v2
      // lives [2, 3) if deleted, else open; %18 keys (all deleted —
      // 18 is a multiple of 9) reopen at c4. CASE without ELSE = NULL
      // = still current.
      """WITH c AS (SELECT c_custkey AS k, c_name AS name FROM customer),
         |v1 AS (SELECT k, name, 1 AS valid_from,
         |         CASE WHEN k % 5 = 0 THEN 2 WHEN k % 9 = 0 THEN 3 END AS valid_to
         |       FROM c),
         |v2 AS (SELECT k, name || '_v2' AS name, 2 AS valid_from,
         |         CASE WHEN k % 9 = 0 THEN 3 END AS valid_to
         |       FROM c WHERE k % 5 = 0),
         |v3 AS (SELECT k, name || '_back' AS name, 4 AS valid_from,
         |         NULL AS valid_to
         |       FROM c WHERE k % 18 = 0)
         |SELECT k, name, CAST(valid_from AS BIGINT) AS valid_from,
         |  CAST(valid_to AS BIGINT) AS valid_to,
         |  valid_to IS NULL AS is_current
         |FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2
         |      UNION ALL SELECT * FROM v3)
         |ORDER BY k, valid_from""".stripMargin,
    "pipe16_incremental_distinct_mv" ->
      """WITH b0 AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CAST(min(l_suppkey) AS BIGINT) AS supp,
         |    CAST(min(l_partkey) AS BIGINT) AS part
         |  FROM lineitem WHERE l_orderkey < 10000
         |  GROUP BY l_orderkey, l_linenumber),
         |b AS (
         |  SELECT supp,
         |    part + CASE WHEN l_orderkey % 2 = 1 AND part % 5 = 0
         |                THEN 1 ELSE 0 END AS part
         |  FROM b0
         |  WHERE NOT (l_orderkey % 13 = 0 OR supp % 11 = 0))
         |SELECT supp, CAST(count(DISTINCT part) AS BIGINT) AS n_distinct
         |FROM b GROUP BY supp ORDER BY supp""".stripMargin,
    "pipe14_incremental_join_mv" ->
      """WITH fact0 AS (
         |  SELECT l_orderkey,
         |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM lineitem WHERE l_orderkey < 10000
         |  GROUP BY l_orderkey, l_linenumber),
         |fact AS (
         |  SELECT l_orderkey, cents
         |    + CASE WHEN l_orderkey % 13 = 3 THEN 50 ELSE 0 END AS cents
         |  FROM fact0),
         |dim AS (
         |  SELECT o_orderkey,
         |    o_custkey + CASE WHEN o_orderkey % 10 = 1 THEN 10000 ELSE 0 END AS custkey
         |  FROM orders WHERE o_orderkey < 10000)
         |SELECT d.custkey, CAST(sum(f.cents) AS BIGINT) AS sum_cents,
         |  count(*) AS n_lines
         |FROM fact f JOIN dim d ON f.l_orderkey = d.o_orderkey
         |GROUP BY d.custkey ORDER BY d.custkey""".stripMargin,
    "pipe13_stream_medallion" ->
      """WITH f AS (
         |  SELECT CASE WHEN o_orderkey % 17 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders WHERE o_orderkey % 23 <> 0)
         |SELECT o_orderstatus, CAST(sum(cents) AS BIGINT) AS sum_cents,
         |  count(*) AS n_orders, true AS replay_noop
         |FROM f GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "pipe7_incremental_agg" ->
      """WITH o AS (
         |  SELECT o_orderkey, o_custkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      + CASE WHEN o_orderkey % 2 = 1 AND o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS cents
         |  FROM orders
         |  WHERE NOT (o_orderkey % 13 = 0 OR o_custkey % 11 = 0))
         |SELECT o_custkey, sum(cents)::BIGINT AS sum_cents, count(*) AS n_orders
         |FROM o GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "pipe19_mv_rewrite" ->
      """WITH o AS (
         |  SELECT o_orderkey, o_custkey, o_orderpriority,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      + CASE WHEN o_orderkey % 2 = 1 AND o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS cents
         |  FROM orders
         |  WHERE NOT (o_orderkey % 13 = 0 OR o_custkey % 11 = 0))
         |SELECT o_orderpriority, sum(cents)::BIGINT AS sum_cents,
         |  count(*) AS n_orders,
         |  round(sum(cents)::DOUBLE / count(*), 4) AS avg_cents
         |FROM o GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "pipe20_partitioned_mv" ->
      """WITH f AS (
         |  SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS m,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      + CASE WHEN strftime(o_orderdate, '%Y-%m') = '1995-02'
         |             THEN 3 ELSE 0 END AS cents
         |  FROM orders
         |  WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-02' AND '1995-07')
         |SELECT o_orderpriority, sum(cents)::BIGINT AS sum_cents,
         |  count(*) AS n_orders
         |FROM f GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "pipe21_join_mv_rewrite" ->
      """WITH f AS (
         |  SELECT o_custkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      + CASE WHEN o_orderkey % 7 = 0 THEN 50 ELSE 0 END AS cents
         |  FROM orders),
         |d AS (
         |  SELECT c_custkey,
         |    CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
         |  FROM customer)
         |SELECT seg, sum(cents)::BIGINT AS sum_cents, count(*) AS n_orders
         |FROM f JOIN d ON o_custkey = c_custkey
         |GROUP BY seg ORDER BY seg""".stripMargin,
    "pipe23_star_mv" ->
      """WITH f0 AS (
         |  SELECT l_orderkey, l_linenumber,
         |    min(l_partkey) AS l_partkey, min(l_suppkey) AS l_suppkey,
         |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents0
         |  FROM lineitem GROUP BY 1, 2),
         |f AS (
         |  SELECT l_partkey, l_suppkey,
         |    cents0 + CASE WHEN l_orderkey % 7 = 0 THEN 25 ELSE 0 END AS cents
         |  FROM f0),
         |p AS (
         |  SELECT p_partkey,
         |    CASE WHEN p_partkey % 10 = 0 THEN 'BrandX' ELSE p_brand END AS brand
         |  FROM part),
         |s AS (
         |  SELECT s_suppkey,
         |    CASE WHEN s_suppkey % 5 = 0 THEN 99 ELSE s_nationkey END AS nation
         |  FROM supplier)
         |SELECT brand, nation, sum(cents)::BIGINT AS sum_cents,
         |  count(*) AS n_items
         |FROM f JOIN p ON l_partkey = p_partkey
         |       JOIN s ON l_suppkey = s_suppkey
         |GROUP BY brand, nation ORDER BY brand, nation""".stripMargin,
    "pipe27_dim_filtered_star_mv" ->
      """WITH f AS (
         |  SELECT o_orderkey, o_custkey, o_orderpriority AS pri,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      + CASE WHEN o_orderkey % 11 = 0 THEN 7 ELSE 0 END AS cents
         |  FROM orders),
         |c AS (
         |  SELECT c_custkey,
         |    CASE WHEN c_custkey % 6 = 0 THEN
         |      (CASE WHEN c_mktsegment = 'BUILDING'
         |            THEN 'MOVED' ELSE 'BUILDING' END)
         |    ELSE c_mktsegment END AS seg
         |  FROM customer)
         |SELECT pri, sum(cents)::BIGINT AS sum_cents, count(*) AS n_orders
         |FROM f JOIN c ON o_custkey = c_custkey
         |WHERE seg = 'BUILDING'
         |GROUP BY pri ORDER BY pri""".stripMargin,
    "pipe28_star_rollup_mv" ->
      """WITH f AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_custkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      - CASE WHEN o_orderkey % 7 = 0 THEN 100000 ELSE 0 END AS cents
         |  FROM orders WHERE o_orderkey % 13 <> 0),
         |c AS (
         |  SELECT c_custkey,
         |    CASE WHEN c_custkey % 6 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
         |  FROM customer)
         |SELECT o_month, seg, sum(cents)::BIGINT AS sum_cents,
         |  max(cents)::BIGINT AS max_cents, count(*) AS n_orders
         |FROM f JOIN c ON o_custkey = c_custkey
         |GROUP BY o_month, seg ORDER BY o_month, seg""".stripMargin,
    "pipe31_topn_mv" ->
      """WITH f AS (
         |  SELECT o_orderkey, o_orderpriority AS pri,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders
         |  UNION ALL SELECT 90000001, '5-LOW', 77778777),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY pri ORDER BY cents DESC, o_orderkey) AS rn
         |  FROM f)
         |SELECT o_orderkey, pri, cents, rn::INT AS rn
         |FROM r WHERE rn <= 3 ORDER BY pri, rn""".stripMargin,
    // CROSS-ENGINE oracle (no pin): at sf0.01 the sample (k=1024)
    // covers every group, so the sketch estimate IS the empirical
    // quantile at index ⌊p·(n−1)⌋ of the sorted group values —
    // DuckDB re-derives it from final content with the same formula.
    "pipe34_quantile_mv" ->
      """WITH f0 AS (
         |  SELECT o_orderkey, o_orderstatus AS status,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders WHERE o_orderkey % 11 = 0),
         |f AS (
         |  SELECT * FROM f0
         |  WHERE o_orderkey <>
         |    (SELECT min(o_orderkey) FROM f0 WHERE status = 'O')
         |  UNION ALL SELECT 90000001::BIGINT, 'F', 123456::BIGINT
         |  UNION ALL SELECT 90000002::BIGINT, 'F', 123556::BIGINT)
         |SELECT status,
         |  (list_sort(list(cents)))[1 + CAST(floor(0.5 * (count(*) - 1)) AS INT)]::DOUBLE AS p50,
         |  (list_sort(list(cents)))[1 + CAST(floor(0.95 * (count(*) - 1)) AS INT)]::DOUBLE AS p95,
         |  count(*) AS n_orders
         |FROM f GROUP BY status ORDER BY status""".stripMargin,
    "pipe35_topn_sql_mv" ->
      """WITH f0 AS (
         |  SELECT o_orderkey, o_orderpriority AS pri,
         |    (CAST(round(o_totalprice) AS BIGINT) % 97) * 100 AS cents
         |  FROM orders),
         |f AS (
         |  SELECT * FROM f0
         |  UNION ALL SELECT 91000000::BIGINT, '2-HIGH', 99999900::BIGINT
         |  UNION ALL SELECT 91000001::BIGINT, '2-HIGH', 99999800::BIGINT),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY pri ORDER BY cents DESC, o_orderkey ASC) AS rn
         |  FROM f)
         |SELECT o_orderkey, pri, cents, rn::INT AS rn
         |FROM r WHERE rn <= 3 ORDER BY pri, rn""".stripMargin,
    "pipe36_qsk_k_mv" ->
      """WITH f AS (
         |  SELECT o_orderkey, o_orderstatus AS status,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders WHERE o_orderkey % 37 = 0
         |  UNION ALL SELECT 92000000::BIGINT, 'F', 77777::BIGINT
         |  UNION ALL SELECT 92000001::BIGINT, 'F', 77877::BIGINT)
         |SELECT status,
         |  (list_sort(list(cents)))[1 + CAST(floor(0.5 * (count(*) - 1)) AS INT)]::DOUBLE AS p50,
         |  count(*) AS n_orders
         |FROM f GROUP BY status ORDER BY status""".stripMargin,
    "pipe37_approx_pctile_mv" ->
      """WITH f AS (
         |  SELECT o_orderkey, o_orderstatus AS status,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders WHERE o_orderkey % 11 = 0)
         |SELECT status,
         |  (list_sort(list(cents)))[1 + CAST(floor(0.5 * (count(*) - 1)) AS INT)]::BIGINT AS p50,
         |  count(*) AS n_orders
         |FROM f GROUP BY status ORDER BY status""".stripMargin,
    "pipe38_approx_pctile_array_mv" ->
      """WITH f AS (
         |  SELECT o_orderkey, o_orderstatus AS status,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders WHERE o_orderkey % 13 = 0),
         |g AS (
         |  SELECT status, list_sort(list(cents)) AS xs, count(*) AS n
         |  FROM f GROUP BY status)
         |SELECT g.status, p.pidx,
         |  (g.xs)[1 + CAST(floor(p.pq * (g.n - 1)) AS INT)]::BIGINT AS pval,
         |  g.n AS n_orders
         |FROM g CROSS JOIN (VALUES (0, 0.25), (1, 0.5), (2, 0.95))
         |  AS p(pidx, pq)
         |ORDER BY g.status, p.pidx""".stripMargin,
    "pipe32_topn_rank_mv" ->
      """WITH f0 AS (
         |  SELECT o_orderkey, o_orderpriority AS pri,
         |    (CAST(round(o_totalprice) AS BIGINT) % 97) * 100 AS cents
         |  FROM orders),
         |top_low AS (SELECT max(cents) AS mx FROM f0 WHERE pri = '5-LOW'),
         |f AS (
         |  SELECT * FROM f0
         |  WHERE NOT (pri = '5-LOW' AND cents = (SELECT mx FROM top_low))
         |  UNION ALL SELECT 90000000::BIGINT, '1-URGENT', 99999900::BIGINT
         |  UNION ALL SELECT 90000001::BIGINT, '1-URGENT', 99999900::BIGINT),
         |r AS (SELECT *, rank() OVER (
         |    PARTITION BY pri ORDER BY cents DESC) AS rn
         |  FROM f)
         |SELECT o_orderkey, pri, cents, rn::INT AS rn
         |FROM r WHERE rn <= 2 ORDER BY pri, rn, o_orderkey""".stripMargin,
    "pipe33_auto_mv" ->
      """WITH f AS (
         |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders
         |  UNION ALL SELECT '1997-03-15', 123456
         |  UNION ALL SELECT '1997-03-16', 654321
         |  UNION ALL SELECT '1997-03-17', 111111),
         |g AS (SELECT d, sum(cents)::BIGINT AS sc FROM f GROUP BY d)
         |SELECT substring(d, 1, 7) AS m, sum(sc)::BIGINT AS sc,
         |  count(*) AS n_days
         |FROM g GROUP BY 1 ORDER BY m""".stripMargin,
    "pipe30_mv_chain" ->
      """WITH f AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS m,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      + CASE WHEN o_orderkey % 7 = 0 THEN 5 ELSE 0 END AS cents
         |  FROM orders WHERE o_orderkey % 13 <> 0)
         |SELECT m, sum(cents)::BIGINT AS sc, count(*) AS n_orders
         |FROM f GROUP BY m ORDER BY m""".stripMargin,
    // PINNED estimates: Datasketches HLL register-max merges commute,
    // so the per-status estimate is deterministic for fixed final
    // content regardless of partitioning (the a7 argument); n_orders
    // recomputes exactly
    "pipe29_sketch_mv" ->
      """WITH f AS (
         |  SELECT o_orderkey, o_orderstatus AS status, o_custkey FROM orders
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_orderstatus, o_custkey + 1000000
         |  FROM orders WHERE o_orderkey % 5 = 0),
         |g AS (SELECT * FROM f WHERE o_orderkey % 17 <> 0)
         |SELECT status,
         |  CASE status WHEN 'F' THEN 2109 WHEN 'O' THEN 2137
         |    ELSE 2160 END::BIGINT AS est_cust,
         |  count(*) AS n_orders
         |FROM g GROUP BY status ORDER BY status""".stripMargin,
    "pipe26_filtered_star_mv" ->
      """WITH f0 AS (
         |  SELECT l_orderkey, l_linenumber,
         |    min(l_partkey) AS l_partkey,
         |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents0
         |  FROM lineitem GROUP BY 1, 2),
         |f AS (
         |  SELECT l_partkey,
         |    CASE WHEN l_orderkey % 9 = 0 THEN
         |      (CASE WHEN cents0 > 2000000 THEN cents0 - 1500000
         |            ELSE cents0 + 1500000 END)
         |    ELSE cents0 END AS cents
         |  FROM f0),
         |p AS (
         |  SELECT p_partkey,
         |    CASE WHEN p_partkey % 10 = 0 THEN 'BrandX' ELSE p_brand END AS brand
         |  FROM part)
         |SELECT brand, sum(cents)::BIGINT AS sum_cents, count(*) AS n_items
         |FROM f JOIN p ON l_partkey = p_partkey
         |WHERE cents > 2000000
         |GROUP BY brand ORDER BY brand""".stripMargin,
    "pipe25_partitioned_star_mv" ->
      """WITH f AS (
         |  SELECT o_custkey, o_orderpriority AS pri,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      + CASE WHEN o_orderkey % 11 = 0
         |             AND strftime(o_orderdate, '%Y-%m') <= '1995-05'
         |             THEN 7 ELSE 0 END AS cents
         |  FROM orders
         |  WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-06'),
         |c AS (
         |  SELECT c_custkey,
         |    CASE WHEN c_custkey % 6 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
         |  FROM customer),
         |p AS (
         |  SELECT DISTINCT o_orderpriority AS pri,
         |    substr(o_orderpriority, 1, 1) AS band
         |  FROM orders)
         |SELECT seg, band, sum(cents)::BIGINT AS sum_cents,
         |  count(*) AS n_orders
         |FROM f JOIN c ON o_custkey = c_custkey
         |       JOIN p ON f.pri = p.pri
         |GROUP BY seg, band ORDER BY seg, band""".stripMargin,
    "pipe24_minmax_mv" ->
      """WITH o AS (
         |  SELECT o_orderpriority AS pri,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      - CASE WHEN o_orderkey % 7 = 0 THEN 100000 ELSE 0 END AS cents
         |  FROM orders WHERE o_orderkey % 13 <> 0)
         |SELECT pri, sum(cents)::BIGINT AS sum_cents,
         |  min(cents)::BIGINT AS min_cents, max(cents)::BIGINT AS max_cents,
         |  count(*) AS n_orders
         |FROM o GROUP BY pri ORDER BY pri""".stripMargin,
    "pipe22_filtered_mv" ->
      """WITH o AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
         |    CASE WHEN o_orderkey % 7 = 0 THEN
         |      (CASE WHEN o_orderpriority = '1-URGENT'
         |            THEN '5-LOW' ELSE '1-URGENT' END)
         |    ELSE o_orderpriority END AS pri,
         |    CAST(round(o_totalprice * 100) AS BIGINT)
         |      + CASE WHEN o_orderkey % 7 = 0 THEN 10 ELSE 0 END AS cents
         |  FROM orders WHERE o_orderkey % 13 <> 0)
         |SELECT o_month, sum(cents)::BIGINT AS sum_cents,
         |  count(*) AS n_orders
         |FROM o WHERE pri = '1-URGENT'
         |GROUP BY o_month ORDER BY o_month""".stripMargin,
    "pipe8_incremental_dedup" ->
      """WITH r AS (SELECT sha256(text) AS content_hash, doc_id,
         |    row_number() OVER (PARTITION BY sha256(text)
         |                       ORDER BY doc_id % 3, doc_id) AS rn
         |  FROM documents)
         |SELECT content_hash, doc_id, TRUE AS rerun_noop
         |FROM r WHERE rn = 1 ORDER BY content_hash""".stripMargin,
    "pipe3_fact_build" ->
      """WITH dp AS (SELECT 1 + row_number() OVER (ORDER BY p_partkey) AS dim_part_key, p_partkey FROM part),
         |ds AS (SELECT 1 + row_number() OVER (ORDER BY s_suppkey) AS dim_supp_key, s_suppkey FROM supplier)
         |SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, dim_part_key, dim_supp_key
         |FROM lineitem
         |LEFT JOIN dp ON l_partkey = p_partkey
         |LEFT JOIN ds ON l_suppkey = s_suppkey
         |ORDER BY l_orderkey, l_linenumber, dim_part_key, dim_supp_key""".stripMargin
  )
}
