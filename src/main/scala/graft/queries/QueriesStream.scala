package graft.queries

import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Structured-Streaming surface as judged queries. The stream result
  * must equal the batch answer over the same files, so the DuckDB twin
  * is the plain batch SQL — the strongest check a bounded stream
  * admits.
  */
object QueriesStream {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "stream_dedup" -> ((s, dir) => {
      // Cross-micro-batch exact dedup: the SAME events file lands
      // twice (two micro-batches via maxFilesPerTrigger=1); state
      // filters every batch-2 row, so the sink equals one copy.
      val src = graft.Tmp.dir("graft_sdedup_src")
      Files.copy(Paths.get(s"$dir/events.parquet"), Paths.get(src, "a.parquet"))
      Files.copy(Paths.get(s"$dir/events.parquet"), Paths.get(src, "b.parquet"))
      val out = graft.Tmp.dir("graft_sdedup_out") + "/dedup"
      val ckpt = graft.Tmp.dir("graft_sdedup_ckpt")
      Streaming.runDedupAvailableNow(s, src, out, ckpt,
          keyCols = Seq("event_id"), maxFilesPerTrigger = Some(1))
        .orderBy(col("event_id"))
    }),
    "stream_dedup_persistent" -> ((s, dir) => {
      // PERSISTENT streaming dedup: same duplicated source as
      // stream_dedup, but the seen-key state is the batch-stamped
      // bucketed TABLE, not the checkpoint's private store — per
      // micro-batch: in-batch dedup, anti-join the table, commit only
      // new keys. foreachBatch retries are absorbed by the anti-join
      // (the table is exactly-once under an at-least-once driver);
      // StreamingSpec replays a batch to pin that.
      val src = graft.Tmp.dir("graft_spdedup_src")
      Files.copy(Paths.get(s"$dir/events.parquet"), Paths.get(src, "a.parquet"))
      Files.copy(Paths.get(s"$dir/events.parquet"), Paths.get(src, "b.parquet"))
      val out = graft.Tmp.dir("graft_spdedup_out") + "/seen"
      val ckpt = graft.Tmp.dir("graft_spdedup_ckpt")
      Streaming.runDedupPersistentAvailableNow(s, src, out, ckpt,
          keyCols = Seq("event_id"), maxFilesPerTrigger = Some(1))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),
    "stream_incremental_agg" -> ((s, dir) => {
      // STREAMING MATERIALIZED VIEW: per-user revenue maintained from
      // the base table's change feed across 2 micro-batches — chunk A
      // inserts the odd events, chunk B inserts the evens AND replays
      // the %14==7 events with bumped cents (an UPDATE through the
      // keyed base upsert). The aggregate moves by exactly the signed
      // delta; the oracle recomputes from the final base state, so a
      // double-counted update or missed preimage breaks the hash.
      val src = graft.Tmp.dir("graft_sincagg_src")
      val root = graft.Tmp.dir("graft_sincagg")
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"),
          round(col("value") * 100).cast("long").as("cents"))
      val a = ev.filter(pmod(col("event_id"), lit(2)) === 1)
      val b = ev.filter(pmod(col("event_id"), lit(2)) === 0).unionByName(
        ev.filter(pmod(col("event_id"), lit(14)) === 7)
          .withColumn("cents", col("cents") + 100L))
      stageChunk(a, src, "a")
      stageChunk(b, src, "b")
      Streaming.runIncrementalAggAvailableNow(s, src,
          "event_id BIGINT, user_id BIGINT, cents BIGINT",
          root + "/base", root + "/agg", graft.Tmp.dir("graft_sincagg_ckpt"),
          baseKeys = Seq("event_id"),
          spec = graft.pipeline.IncrementalAgg.AggSpec(
            Seq("user_id"), Seq("cents" -> "sum_cents"), "n_events"),
          maxFilesPerTrigger = Some(1))
        .select(col("user_id"), col("sum_cents"), col("n_events"))
        .orderBy(col("user_id"))
    }),
    "w6_session_window" -> ((s, dir) => {
      // Spark's NATIVE session_window operator (the built-in
      // merge-on-gap aggregation the hand-rolled gaps-and-islands
      // twins reproduce): 30-min gap sessions per user, one
      // aggregation, mergeable session state. Window end = last event
      // + gap and the boundary is END-EXCLUSIVE (an event exactly
      // 30 min after the previous starts a NEW session) — the oracle
      // mirrors both.
      val ev = Streaming.withEventTime(
        s.read.schema(Streaming.EventsRawSchema).parquet(s"$dir/events.parquet"))
      ev.groupBy(col("user_id"), session_window(col("ets"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }),
    "a15_funnel" -> ((s, dir) => {
      // Ordered funnel view -> click -> purchase: per-user earliest
      // strictly-after step times + furthest stage, via stacked
      // conditional window-mins over ONE user partitioning (Funnel
      // Scaladoc). Exact integer µs both sides (unix_micros here,
      // epoch_us in the oracle — the µs-TIMESTAMP events convention).
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .withColumn("ts", unix_micros(col("ts")))
      graft.ops.Funnel.funnel(ev, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))
    }),

    "s25_dynamic_overwrite" -> ((s, dir) => {
      // dynamic partition overwrite (Hive dynamic mode / Delta
      // replaceWhere parity): the backfill primitive — a corrected
      // batch replaces ONLY the date partitions it contains, every
      // other partition's files untouched (per-write option, no
      // session mutation). Day 2024-01-05 is republished as purchases
      // only; the read-back rollup proves day 5 replaced and all
      // other days intact. At 100 TB this is the difference between
      // rewriting one day and rewriting the table.
      val path = graft.Tmp.dir("graft_dynover") + "/ev"
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"),
          to_date(col("ts")).as("d"))
      ev.write.partitionBy("d").mode("overwrite").parquet(path)
      ev.filter(col("d") === lit("2024-01-05").cast("date") &&
          col("event_type") === "purchase")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("d").parquet(path)
      s.read.parquet(path)
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("d"))
    }),

    "a19_sliding_window" -> ((s, dir) => {
      // batch sliding-window rollup: 2-hour windows every 30 minutes
      // over the event stream via Spark's native window() — each event
      // Expands into duration/slide = 4 cells BEFORE the hash agg, the
      // documented cost dial of sliding windows (half the slide, twice
      // the agg input); windows with no events don't exist, which the
      // oracle mirrors with an inner range-join against the aligned
      // start series. Exact integer counts; epoch-aligned boundaries
      // agree across engines (UTC session, µs-truncated events).
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .select(col("ts").as("ets"),
          col("user_id"))
      ev.groupBy(window(col("ets"), "2 hours", "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .select(col("window.start").as("w_start"),
          col("window.end").as("w_end"), col("n_events"), col("n_users"))
        .orderBy(col("w_start"))
    }),

    "a18_cohort_retention" -> ((s, dir) => {
      // daily cohort retention matrix (DN retention) — the product-
      // analytics staple: cohort = date of each user's FIRST event;
      // cell (cohort, offset) = distinct users active offset days
      // later. Plan (audited): the per-user first-seen agg is user-
      // cardinality-sized and BROADCASTS onto the (user, day) distinct
      // — the events-sized side shuffles ONCE; cohort sizes are a
      // date-cardinality frame, broadcast back. Beyond broadcastable
      // user counts this degrades to a user_id-keyed shuffle join —
      // still aggregate-sized, never events×days. Counts are integer-
      // exact — no float ratio in the judged row. Dates are
      // ns-truncation-proof (both engines agree on the DATE of a
      // µs-vs-ns timestamp).
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .select(col("user_id"),
          to_date(col("ts")).as("d"))
      val firsts = ev.groupBy(col("user_id"))
        .agg(min(col("d")).as("cohort_day"))
      val daily = ev.distinct()
      val cells = daily.join(firsts, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("d"), col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_active")) // daily is distinct per (user, d)
      val sizes = firsts.groupBy(col("cohort_day"))
        .agg(count(lit(1)).as("cohort_size"))
      cells.join(broadcast(sizes), "cohort_day")
        .select(col("cohort_day"), col("day_offset"), col("n_active"),
          col("cohort_size"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    "stream_sessionize" -> ((s, dir) => {
      // gaps-and-islands sessionization (30-min inactivity gap) over
      // the event stream — lag + running-sum windows per user.
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
      Streaming.sessionize(ev, gapMinutes = 30)
        .orderBy(col("user_id"), col("session_id"))
    }),
    "j11_skew_salted" -> ((s, dir) => {
      // Salted skew join (RelOps.saltedEquiJoin): events (hot-key left)
      // ⟕ customer replicated across 16 salts, then a per-segment
      // rollup. Content must equal the plain unsalted left join — the
      // oracle derives it that way; user 0 has no customer row, so the
      // null-extended leg provably fires.
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"))
      val c = graft.Tables.table(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("seg"))
      graft.ops.RelOps.saltedEquiJoin(ev, c, Seq("user_id"),
          saltOn = col("event_id"), salts = 16, joinType = "left")
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("seg"))
    }),
    "j15_asof_forward" -> ((s, dir) => {
      // FORWARD as-of: each event matched to the EARLIEST purchase by
      // the same user AT OR AFTER its timestamp ("first response
      // after") — time negation over the backward as-of, same single
      // window pass (AsofJoin.asofLeftForward).
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("__us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("__us"))
      graft.ops.AsofJoin.asofLeftForward(
          ev.select(col("event_id"), col("user_id"), col("__us")),
          purchases, Seq("user_id"), "__us", "__us", "__match")
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("__match")).as("next_purchase_ts"))
        .orderBy(col("event_id"))
    }),
    "j5_asof_join" -> ((s, dir) => {
      // as-of join: each event matched to the latest purchase by the
      // same user at or before its timestamp — one union + one window
      // pass, no range join (AsofJoin Scaladoc).
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("__us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("__us"))
      graft.ops.AsofJoin.asofLeft(
          ev.select(col("event_id"), col("user_id"), col("__us")),
          purchases, Seq("user_id"), "__us", "__us", "__match")
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("__match")).as("last_purchase_ts"))
        .orderBy(col("event_id"))
    }),
    "stream_stream_join" -> ((s, dir) => {
      // watermarked stream-stream inner join (view -> purchase by the
      // same user within 1h), 2 time-split micro-batches so matches
      // cross the batch boundary through buffered join state; the
      // result must equal the batch time-range join.
      val src = graft.Tmp.dir("graft_ssj_src")
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
      val cut = lit(java.time.Instant.parse("2024-01-15T00:00:00Z"))
      ev.filter(col("ts") < cut).coalesce(1).write.mode("append").parquet(src)
      ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)
      val out = graft.Tmp.dir("graft_ssj_out") + "/pairs"
      val ckpt = graft.Tmp.dir("graft_ssj_ckpt")
      Streaming.runStreamJoinAvailableNow(s, src, out, ckpt,
          maxFilesPerTrigger = Some(1))
        .orderBy(col("view_id"), col("purchase_id"))
    }),
    "stream_stream_left_join" -> ((s, dir) => {
      // watermarked stream-stream LEFT OUTER join: matches emit
      // eagerly; a view with no purchase inside its 1h window emits
      // null-extended ONLY once the watermark proves no match can
      // still arrive (view_ts + window < final watermark = max ts −
      // 1h delay). Views younger than that boundary are withheld at
      // end of stream — correctness under possible late data — and
      // the oracle mirrors the boundary exactly.
      val src = graft.Tmp.dir("graft_sslj_src")
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
      val cut = lit(java.time.Instant.parse("2024-01-15T00:00:00Z"))
      ev.filter(col("ts") < cut).coalesce(1).write.mode("append").parquet(src)
      ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)
      val out = graft.Tmp.dir("graft_sslj_out") + "/pairs"
      val ckpt = graft.Tmp.dir("graft_sslj_ckpt")
      Streaming.runStreamLeftJoinAvailableNow(s, src, out, ckpt,
          maxFilesPerTrigger = Some(1))
        .orderBy(col("view_id"), col("purchase_id"))
    }),
    "stream_late_drop" -> ((s, dir) => {
      // WATERMARK LATE-DATA DROP, judged: batches stream day 1, then
      // day 2, then a late-only batch of day-1-noon clones (shifted
      // event_ids, values +1000 so ANY leak corrupts the noon sums).
      // Spark filters late input against the PREVIOUS batch's
      // watermark (the lateEvents/eviction split), so the clones —
      // arriving two batches after day 1 set the watermark past noon —
      // are deterministically dropped: the committed table equals the
      // batch aggregate of the legitimate rows only. This drop is the
      // semantic that bounds state at 100 TB — without it every
      // historical window stays updatable forever. (A late row in the
      // very NEXT batch may still aggregate — Spark's documented
      // one-sided guarantee; the lifecycle here is the guaranteed
      // side.)
      val src = graft.Tmp.dir("graft_late_src")
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
      def at(iso: String) = lit(java.time.Instant.parse(iso))
      val d1 = ev.filter(col("ts") < at("2024-01-02T00:00:00Z"))
      val d2 = ev.filter(col("ts") >= at("2024-01-02T00:00:00Z") &&
        col("ts") < at("2024-01-03T00:00:00Z"))
      val late = d1.filter(col("ts") >= at("2024-01-01T12:00:00Z") &&
          col("ts") < at("2024-01-01T13:00:00Z"))
        .withColumn("event_id", col("event_id") + 1000000000L)
        .withColumn("value", col("value") + 1000.0)
      // three writes = three files = three micro-batches
      // (maxFilesPerTrigger=1; each write's job latency separates mtimes)
      d1.coalesce(1).write.mode("append").parquet(src)
      d2.coalesce(1).write.mode("append").parquet(src)
      late.coalesce(1).write.mode("append").parquet(src)
      val out = graft.Tmp.dir("graft_late_out") + "/win"
      val ckpt = graft.Tmp.dir("graft_late_ckpt")
      Streaming.runAvailableNow(s, src, out, ckpt,
          watermarkDelay = "1 hour", maxFilesPerTrigger = Some(1))
        .orderBy(col("window_start"), col("event_type"))
    }),

    "stream_checkpoint_resume" -> ((s, dir) => {
      // CHECKPOINT RESUME — the scheduled-incremental-run shape (the
      // reference's watermark loop, re-expressed as AvailableNow runs
      // sharing one checkpoint): run 1 drains day 1 and stops; day 2
      // lands; run 2 reuses the checkpoint, so its source offsets skip
      // day 1 ENTIRELY (no reprocessing, no duplicate aggregation
      // into the upsert sink) and the window state carries across
      // process restarts. Committed table must equal the one-shot
      // batch aggregate over both days.
      val src = graft.Tmp.dir("graft_resume_src")
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
      def at(iso: String) = lit(java.time.Instant.parse(iso))
      val d1 = ev.filter(col("ts") < at("2024-01-02T00:00:00Z"))
      val d2 = ev.filter(col("ts") >= at("2024-01-02T00:00:00Z") &&
        col("ts") < at("2024-01-03T00:00:00Z"))
      val out = graft.Tmp.dir("graft_resume_out") + "/win"
      val ckpt = graft.Tmp.dir("graft_resume_ckpt")
      d1.coalesce(1).write.mode("append").parquet(src)
      Streaming.runAvailableNow(s, src, out, ckpt, "1 hour")
      d2.coalesce(1).write.mode("append").parquet(src)
      Streaming.runAvailableNow(s, src, out, ckpt, "1 hour")
        .orderBy(col("window_start"), col("event_type"))
    }),

    "stream_stateful_agg" -> ((s, dir) => {
      // CUSTOM cross-batch state via flatMapGroupsWithState: per-user
      // running profile (count, exact money sum, last event time) over
      // 2 micro-batches (time-split halves, maxFilesPerTrigger=1); the
      // committed table must equal the batch aggregate — profile
      // updates are commutative, so chunk order is immaterial.
      val src = graft.Tmp.dir("graft_state_src")
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
      val cut = lit(java.time.Instant.parse("2024-01-15T00:00:00Z"))
      ev.filter(col("ts") < cut).coalesce(1).write.mode("append").parquet(src)
      ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)
      val out = graft.Tmp.dir("graft_state_out") + "/profiles"
      val ckpt = graft.Tmp.dir("graft_state_ckpt")
      Streaming.runStatefulAvailableNow(s, src, out, ckpt,
          maxFilesPerTrigger = Some(1))
        .orderBy(col("user_id"))
    }),
    "stream_sessionize_scale" -> ((s, dir) => {
      // the hot-key-safe twin of stream_sessionize: two-stage windows
      // within (user, 24h-chunk) + O(chunks) boundary stitching —
      // identical output (same DuckDB oracle), partitions bounded by
      // one user-day instead of one user's full history.
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
      Streaming.sessionizeChunked(ev, gapMinutes = 30, chunkHours = 24)
        .orderBy(col("user_id"), col("session_id"))
    }),
    "j5c_asof_chunked" -> ((s, dir) => {
      // the hot-key-safe twin of j5b: as-of with payload via time-
      // chunked two-stage windows (1-day chunks); same DuckDB oracle.
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("__us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("__us"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      graft.ops.AsofJoin.asofLeftChunked(
          ev.select(col("event_id"), col("user_id"), col("__us")),
          purchases, Seq("user_id"), "__us", "__us", "__match",
          chunkSpan = 24L * 3600 * 1000000,
          payloadCols = Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("__match")).as("last_purchase_ts"),
          col("purchase_id"), col("purchase_value"))
        .orderBy(col("event_id"))
    }),
    "j5b_asof_payload" -> ((s, dir) => {
      // as-of join carrying right-side PAYLOAD: each event gets the
      // latest purchase's timestamp, id, and value — the "price as of
      // trade time" shape; one struct carried through the same single
      // window pass.
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("__us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("__us"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      graft.ops.AsofJoin.asofLeft(
          ev.select(col("event_id"), col("user_id"), col("__us")),
          purchases, Seq("user_id"), "__us", "__us", "__match",
          payloadCols = Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("__match")).as("last_purchase_ts"),
          col("purchase_id"), col("purchase_value"))
        .orderBy(col("event_id"))
    }),
    "stream_table_source" -> ((s, dir) => {
      // THE TABLE AS A STREAMING SOURCE (Delta CDF-stream parity,
      // VERDICT r7 ask #1): an upstream bucketed table lands 4 commits
      // — snapshot load, insert batch, keyed update, soft delete —
      // while a downstream ChangeStream consumer chains each commit's
      // change feed into a SECOND bucketed table through exactly-once
      // stamped commits (ChangeStream.upsertSink). The replayed
      // trigger delivers nothing. Cost per batch is O(changed
      // buckets), never a rescan — the silver→gold shape
      // (gold_fact.py:12) as one incremental pipeline.
      import graft.merge.Scd1Merge
      import graft.streaming.ChangeStream
      val root = graft.Tmp.dir("graft_stsrc")
      val up = root + "/up"; val down = root + "/down"
      val ckpt = root + "/ckpt"
      // SF-CAP (orderkey < 10000, the s31/s33/pipe14 precedent): the
      // judged object is commit-stream DELIVERY — TaxProbe isolated
      // this at 15-17 s at sf0.1, ~all of it the seven full-orders
      // commits' load, none of it teaching anything about delivery
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") < 10000)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderstatus").as("status"))
      val K = Seq("o_orderkey")
      // retention >= the consumer's max lag in commits — the same
      // contract as Delta CDF + VACUUM (ChangeStream Scaladoc)
      val R = 8
      Scd1Merge.upsert(s, up, orders.filter(col("status") === "O"), K,
        retainVersions = R)
      val sink = ChangeStream.upsertSink(s, down, K)
      val b1 = ChangeStream.runAvailableNow(s, up, K, ckpt)(sink)
      assert(b1 == 1, s"expected the snapshot batch, got $b1")
      // three commits land while the consumer is away
      Scd1Merge.upsert(s, up, orders.filter(col("status") === "F"), K,
        retainVersions = R)
      Scd1Merge.upsert(s, up,
        orders.filter(col("status").isin("O", "F") &&
            pmod(col("o_orderkey"), lit(10)) === 1)
          .withColumn("cents", col("cents") + 100L), K, retainVersions = R)
      Scd1Merge.deleteSoft(s, up, K, pmod(col("o_orderkey"), lit(7)) === 0,
        retainVersions = R)
      val b2 = ChangeStream.runAvailableNow(s, up, K, ckpt)(sink)
      assert(b2 == 3, s"one batch per pending commit, got $b2")
      val b3 = ChangeStream.runAvailableNow(s, up, K, ckpt)(sink)
      assert(b3 == 0, s"a replayed trigger must deliver nothing, got $b3")
      Scd1Merge.readTable(s, down)
        .select(col("o_orderkey"), col("o_custkey"), col("cents"), col("status"))
        .orderBy(col("o_orderkey"))
    }),
    "stream_graft_source" -> ((s, dir) => {
      // THE TABLE'S CHANGE FEED THROUGH THE STANDARD STREAMING API:
      // `spark.readStream.format("graft")` (GraftSource — V1 Source
      // over commit-counter offsets, batches = O(changed buckets)
      // readChanges, engine-checkpointed). Trigger 1 delivers the
      // initial snapshot tagged `insert`; an update commit lands; the
      // SAME checkpoint's trigger 2 delivers exactly the
      // update/update_preimage pairs. The judged frame is the FULL
      // FEED — the oracle derives every tagged row from the orders
      // table, so the _change_type semantics themselves are
      // hash-checked. GraftSourceSpec pins paging, caught-up silence,
      // and the source→sink standard-API mirror chain.
      import graft.merge.Scd1Merge
      import org.apache.spark.sql.streaming.Trigger
      val root = graft.Tmp.dir("graft_gsrc")
      val up = root + "/up"; val feedDir = root + "/feed"
      val ckpt = root + "/ckpt"
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") < 10000 && col("o_orderstatus") === "O")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      // retention >= consumer lag in commits (the CDF+VACUUM contract)
      Scd1Merge.upsert(s, up, orders, Seq("o_orderkey"), numBuckets = 4,
        retainVersions = 4)
      def drain(): Unit = {
        val q = s.readStream.format("graft").load(up)
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("append").parquet(feedDir); () }
          .start()
        q.awaitTermination()
      }
      drain()
      Scd1Merge.upsert(s, up,
        orders.filter(pmod(col("o_orderkey"), lit(10)) === 1)
          .withColumn("cents", col("cents") + 100L), Seq("o_orderkey"),
        retainVersions = 4)
      drain()
      s.read.parquet(feedDir)
        .orderBy(col("o_orderkey"), col("_change_type"))
    }),
    "stream_graft_sink" -> ((s, dir) => {
      // THE TABLE AS A STREAMING SINK (write-side twin of
      // stream_table_source): `df.writeStream.format("graft")` with NO
      // foreachBatch glue — the standard streaming writer API drives
      // the engine's committed write path (GraftSink via the V1
      // StreamSinkProvider seam). Two micro-batches
      // (maxFilesPerTrigger=1, mtime-ordered files) land as
      // exactly-once keyed upserts: the second batch's overlapping
      // keys REPLACE the first's (last-write-wins by arrival), new
      // keys insert — one live row per key, the graft invariant.
      // GraftSinkSpec pins the replay-skip, Complete-mode replacement,
      // and partitionBy-layout faces.
      val root = graft.Tmp.dir("graft_gsink")
      val src = root + "/src"; val out = root + "/t"
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
        .filter(col("event_id") < 20000)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      ev.filter(col("event_id") % 3 =!= 0)
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100) // distinct mtimes => deterministic batch order
      ev.filter(col("event_id") % 2 === 0)
        .withColumn("cents", col("cents") + 1000L)
        .coalesce(1).write.mode("append").parquet(src)
      val q = s.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("graft")
        .option("keys", "event_id").option("buckets", "4")
        .option("checkpointLocation", root + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(out)
      q.awaitTermination()
      graft.merge.Scd1Merge.readTable(s, out).orderBy(col("event_id"))
    }),
    "stream_ann_maintain" -> ((s, dir) => {
      // STREAMING INGEST × AUTO-MAINTAINED VECTOR INDEX (r15 verdict
      // #6 — the one serving × streaming composite that was spec-only,
      // MvMaintenanceSpec's "STREAMING ingest keeps an autoMaintain
      // vector index fresh"): micro-batches land through
      // `writeStream.format("graft")`, each addBatch commit fires the
      // post-commit hook ON THE STREAMING THREAD, which folds exactly
      // that batch's change feed into the persisted codes (O(batch),
      // never a rebuild) and re-stamps the registration — so the ANN
      // rewrite keeps serving BETWEEN triggers with every streamed
      // vector findable, and NO refresh statement exists anywhere in
      // this entry. In-row requires pin: the corpus reaches 306 rows
      // over two micro-batches, the covered commit equals the live
      // commit after the stream drains, the top-k plan reads the
      // index codes, and a streamed-in twin of the query vector is
      // found through the index.
      val root = graft.Tmp.dir("graft_sann")
      val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 300)
      graft.merge.Scd1Merge.upsert(s, corpusT, emb, Seq("vec_id"),
        numBuckets = 1, retainVersions = 8, batchId = "c1")
      graft.similarity.Similarity.ivfPqIndexBuild(s, idx,
        graft.merge.Scd1Merge.readTable(s, corpusT), "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16, iters = 1, dim = 64, batchId = "b1")
      graft.plans.GraftAnnRewrite.register(s, corpusT, idx,
        "vec_id", "embedding", dim = 64, autoMaintain = true)
      val src = root + "/src"
      val b1 = emb.filter(col("vec_id") < 3)
        .withColumn("vec_id", col("vec_id") + 800000L)
      val b2 = emb.filter(col("vec_id") >= 3 && col("vec_id") < 6)
        .withColumn("vec_id", col("vec_id") + 900000L)
      b1.coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100) // distinct mtimes => deterministic batch order
      b2.coalesce(1).write.mode("append").parquet(src)
      val q = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream.format("graft")
        .option("keys", "vec_id")
        .option("checkpointLocation", root + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(corpusT)
      q.awaitTermination()
      val total = graft.merge.Scd1Merge.readTable(s, corpusT).count()
      require(total == 306, s"two micro-batches must land: $total rows")
      val live = graft.merge.Scd1Merge.tableCommit(corpusT).get
      val coveredFresh = graft.plans.GraftAnnRewrite
        .coveredCommit(corpusT).contains(live)
      require(coveredFresh,
        "the hook must have folded every micro-batch in-line: covered " +
        s"${graft.plans.GraftAnnRewrite.coveredCommit(corpusT)} vs $live")
      val qv = emb.filter(col("vec_id") === 4)
        .select(col("embedding")).head().getSeq[Float](0)
      val KK = 5
      val topq = graft.merge.Scd1Merge.readTable(s, corpusT)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("cos_sim"))
        .orderBy(col("cos_sim").desc).limit(KK)
      val servedFromIdx = topq.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.inputFiles.toSeq
            case _ => Nil
          }
      }.flatten.exists(_.contains(idx + "/codes/"))
      require(servedFromIdx,
        "the streamed-into corpus must serve from the index")
      val ids = topq.collect().map(_.getLong(0))
      val twinFound = ids.contains(900004L)
      require(twinFound,
        s"the streamed twin must be findable through the index: " +
        ids.mkString(","))
      graft.plans.GraftAnnRewrite.unregister(corpusT)
      graft.pipeline.MvMaintenance.reset()
      s.range(1).select(lit(306L).as("corpus_rows"),
        lit(2L).as("micro_batches"), lit(KK.toLong).as("k"),
        lit(ids.length.toLong).as("n_rows"),
        lit(coveredFresh).as("covered_fresh"),
        lit(true).as("served_from_index"),
        lit(twinFound).as("twin_found"))
    }),
    "stream_dedup_watermarked" -> ((s, dir) => {
      // BOUNDED-STATE streaming dedup (dropDuplicatesWithinWatermark —
      // the scale fix for stream_dedup's grow-forever seen-key state):
      // the same events file lands twice; batch 2's clones are either
      // inside the 1-hour watermark horizon (deduped by the retained
      // keys) or behind it (late data, dropped by the watermark
      // contract) — the sink equals one copy either way, while state
      // holds only the horizon's keys (StreamingSpec pins the bound
      // via the state-store row counter).
      val src = graft.Tmp.dir("graft_swdedup_src")
      Files.copy(Paths.get(s"$dir/events.parquet"), Paths.get(src, "a.parquet"))
      Files.copy(Paths.get(s"$dir/events.parquet"), Paths.get(src, "b.parquet"))
      val out = graft.Tmp.dir("graft_swdedup_out") + "/dedup"
      val ckpt = graft.Tmp.dir("graft_swdedup_ckpt")
      Streaming.runDedupWithinWatermarkAvailableNow(s, src, out, ckpt,
          keyCols = Seq("event_id"), maxFilesPerTrigger = Some(1))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .orderBy(col("event_id"))
    }),
    "stream_static_join" -> ((s, dir) => {
      // STREAM-STATIC enrichment join (the stateless member of the
      // streaming-join family): events stream in two micro-batches
      // (maxFilesPerTrigger=1) and each batch inner-joins the STATIC
      // customer dim with a broadcast hint — no state store, no
      // watermark, append sink. The oracle is the batch join over the
      // same rows: stream-static must be indistinguishable from batch
      // because the dim never changes mid-run.
      val src = graft.Tmp.dir("graft_ssj_src")
      val ev = s.read.schema(Streaming.EventsRawSchema)
        .parquet(s"$dir/events.parquet")
      stageChunk(ev.filter(pmod(col("event_id"), lit(2)) === 1), src, "a")
      stageChunk(ev.filter(pmod(col("event_id"), lit(2)) === 0), src, "b")
      val dim = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val out = graft.Tmp.dir("graft_ssj_out") + "/enriched"
      val ckpt = graft.Tmp.dir("graft_ssj_ckpt")
      Streaming.runStreamStaticJoinAvailableNow(s, src, dim,
          "user_id", "c_custkey", out, ckpt, maxFilesPerTrigger = Some(1))
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          col("c_name"), col("c_mktsegment"))
        .orderBy(col("event_id"))
    }),
    "stream_window_agg" -> ((s, dir) => {
      // Trigger.AvailableNow file stream -> event-time watermark ->
      // 1h tumbling window agg -> foreachBatch SCD1-upsert, then read
      // the committed table. One source file = one micro-batch here;
      // StreamingSpec covers the multi-batch path (in-order chunks).
      val src = graft.Tmp.dir("graft_stream_src")
      Files.copy(Paths.get(s"$dir/events.parquet"),
        Paths.get(src, "events.parquet"))
      val out = graft.Tmp.dir("graft_stream_out") + "/win_agg"
      val ckpt = graft.Tmp.dir("graft_stream_ckpt")
      Streaming.runAvailableNow(s, src, out, ckpt)
        .orderBy(col("window_start"), col("event_type"))
    })
  )

  /** Write `df` as ONE parquet file named `<name>.parquet` under
    * `srcDir` — in-order chunk staging for the file-stream sources
    * (later copies get later mtimes, and the name is the path-order
    * tiebreak, so chunk order is deterministic). */
  private def stageChunk(df: org.apache.spark.sql.DataFrame, srcDir: String,
                         name: String): Unit = {
    val tmp = graft.Tmp.dir(s"graft_chunk_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = graft.merge.FsList.list(Paths.get(tmp)).iterator
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
    Files.move(f, Paths.get(srcDir, s"$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private val SessionizeOracle =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |m AS (SELECT user_id, us,
      |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
      |         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
      |       THEN 1 ELSE 0 END AS ns FROM e),
      |s AS (SELECT user_id, us,
      |  (sum(ns) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id FROM m)
      |SELECT user_id, session_id,
      |  make_timestamp(min(us)) AS session_start,
      |  make_timestamp(max(us)) AS session_end,
      |  count(*) AS n_events
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  private val AsofPayloadOracle =
    """SELECT e.event_id, e.user_id, p.ts AS last_purchase_ts,
      |  p.event_id AS purchase_id, p.value AS purchase_value
      |FROM events e ASOF LEFT JOIN
      |  (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id AND e.ts >= p.ts
      |ORDER BY e.event_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "j11_skew_salted" ->
      """SELECT c.c_mktsegment AS seg, count(*) AS n_events,
         |  count(DISTINCT e.user_id) AS n_users
         |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s25_dynamic_overwrite" ->
      """SELECT CAST(ts AS DATE) AS d, count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users
         |FROM events
         |WHERE NOT (CAST(ts AS DATE) = DATE '2024-01-05'
         |           AND event_type <> 'purchase')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a19_sliding_window" ->
      """WITH b AS (SELECT min(ts) AS lo, max(ts) AS hi FROM events),
         |starts AS (SELECT unnest(generate_series(
         |    to_timestamp(CAST(floor(epoch(lo) / 1800) * 1800 AS BIGINT) - 5400),
         |    to_timestamp(CAST(floor(epoch(hi) / 1800) * 1800 AS BIGINT)),
         |    INTERVAL 30 MINUTE)) AS w_start FROM b)
         |SELECT s.w_start::TIMESTAMP AS w_start,
         |  (s.w_start + INTERVAL 2 HOUR)::TIMESTAMP AS w_end,
         |  count(*) AS n_events,
         |  count(DISTINCT e.user_id) AS n_users
         |FROM starts s JOIN events e
         |  ON e.ts >= s.w_start AND e.ts < s.w_start + INTERVAL 2 HOUR
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "a18_cohort_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |f AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id),
         |a AS (SELECT f.cohort_day,
         |        CAST(e.d - f.cohort_day AS INT) AS day_offset,
         |        count(*) AS n_active
         |      FROM e JOIN f USING (user_id) GROUP BY 1, 2),
         |s AS (SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY 1)
         |SELECT a.cohort_day, a.day_offset, a.n_active, s.cohort_size
         |FROM a JOIN s USING (cohort_day) ORDER BY 1, 2""".stripMargin,
    "a15_funnel" ->
      """WITH t1 AS (SELECT user_id,
         |    min(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS ts_view
         |  FROM events GROUP BY user_id),
         |t2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS ts_click
         |  FROM events e JOIN t1 USING (user_id)
         |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.ts_view
         |  GROUP BY e.user_id),
         |t3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS ts_purchase
         |  FROM events e JOIN t2 USING (user_id)
         |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.ts_click
         |  GROUP BY e.user_id)
         |SELECT u.user_id, t1.ts_view, t2.ts_click, t3.ts_purchase,
         |  (CASE WHEN t1.ts_view IS NOT NULL THEN 1 ELSE 0 END
         |   + CASE WHEN t2.ts_click IS NOT NULL THEN 1 ELSE 0 END
         |   + CASE WHEN t3.ts_purchase IS NOT NULL THEN 1 ELSE 0 END) AS stage
         |FROM (SELECT DISTINCT user_id FROM events) u
         |LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
         |LEFT JOIN t3 USING (user_id)
         |ORDER BY u.user_id""".stripMargin,
    "stream_stream_join" ->
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
         |  v.ts AS view_ts, p.ts AS purchase_ts
         |FROM events v JOIN events p
         |  ON v.user_id = p.user_id AND v.event_type = 'view' AND p.event_type = 'purchase'
         | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
         |ORDER BY view_id, purchase_id""".stripMargin,
    "stream_stream_left_join" ->
      // matched pairs emit unconditionally; unmatched views only once
      // provably past hope: view_ts + 1h window + 1h watermark delay
      // before the final watermark anchor max(ts)
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
         |  v.ts AS view_ts, p.ts AS purchase_ts
         |FROM events v JOIN events p
         |  ON v.user_id = p.user_id AND v.event_type = 'view' AND p.event_type = 'purchase'
         | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
         |UNION ALL
         |SELECT v.event_id, CAST(NULL AS BIGINT), v.user_id, v.ts,
         |  CAST(NULL AS TIMESTAMP)
         |FROM events v
         |WHERE v.event_type = 'view'
         |  AND NOT EXISTS (SELECT 1 FROM events p
         |    WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
         |      AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR)
         |  AND v.ts + INTERVAL 2 HOUR < (SELECT max(ts) FROM events)
         |ORDER BY view_id, purchase_id""".stripMargin,
    "stream_stateful_agg" ->
      """SELECT user_id, count(*) AS n_events,
         |  SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
         |  max(ts) AS last_event
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_sessionize_scale" -> SessionizeOracle,
    "j5c_asof_chunked" -> AsofPayloadOracle,
    "stream_dedup" ->
      """SELECT event_id, user_id, event_type, value
         |FROM events ORDER BY event_id""".stripMargin,
    "stream_dedup_persistent" ->
      """SELECT event_id, user_id, event_type, value
         |FROM events ORDER BY event_id""".stripMargin,
    "w6_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         |m AS (SELECT user_id, us,
         |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
         |         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
         |       THEN 1 ELSE 0 END AS ns FROM e),
         |s AS (SELECT user_id, us,
         |  (sum(ns) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING))::BIGINT AS sid FROM m)
         |SELECT user_id, make_timestamp(min(us)) AS session_start,
         |  make_timestamp(max(us) + 1800000000) AS session_end,
         |  count(*) AS n_events
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,
    "stream_incremental_agg" ->
      """WITH ev AS (SELECT event_id, user_id,
         |    CAST(round(value * 100) AS BIGINT)
         |      + CASE WHEN event_id % 14 = 7 THEN 100 ELSE 0 END AS cents
         |  FROM events)
         |SELECT user_id, sum(cents)::BIGINT AS sum_cents, count(*) AS n_events
         |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_sessionize" -> SessionizeOracle,
    "j15_asof_forward" ->
      """SELECT e.event_id, e.user_id, p.ts AS next_purchase_ts
         |FROM events e ASOF LEFT JOIN
         |  (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
         |  ON e.user_id = p.user_id AND e.ts <= p.ts
         |ORDER BY e.event_id""".stripMargin,
    "j5_asof_join" ->
      """SELECT e.event_id, e.user_id, p.ts AS last_purchase_ts
         |FROM events e ASOF LEFT JOIN
         |  (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
         |  ON e.user_id = p.user_id AND e.ts >= p.ts
         |ORDER BY e.event_id""".stripMargin,
    "j5b_asof_payload" -> AsofPayloadOracle,
    "stream_checkpoint_resume" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS n_events,
         |  SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
         |FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
         |GROUP BY 1, 2
         |ORDER BY window_start, event_type""".stripMargin,
    "stream_late_drop" ->
      // the LEGITIMATE first-two-days rows only: the planted late
      // clones must leave no trace in the committed table
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS n_events,
         |  SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
         |FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
         |GROUP BY 1, 2
         |ORDER BY window_start, event_type""".stripMargin,
    "stream_dedup_watermarked" ->
      // event_id is unique within the file, so one copy = all rows
      """SELECT event_id, user_id, event_type,
         |  CAST(round(value * 100) AS BIGINT) AS cents
         |FROM events ORDER BY event_id""".stripMargin,
    "stream_static_join" ->
      """SELECT e.event_id, e.event_type,
         |  CAST(round(e.value * 100) AS BIGINT) AS cents,
         |  c.c_name, c.c_mktsegment
         |FROM events e JOIN customer c ON e.user_id = c.c_custkey
         |ORDER BY e.event_id""".stripMargin,
    "stream_window_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS n_events,
         |  SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
         |FROM events GROUP BY 1, 2
         |ORDER BY window_start, event_type""".stripMargin,
    "stream_table_source" ->
      // the streamed table-to-table chain must equal the one-pass
      // derivation of the same final state: O∪F orders, %10==1 keys
      // bumped by the update commit, %7==0 keys gone via the delete
      """SELECT o_orderkey, o_custkey,
         |  (CAST(round(o_totalprice * 100) AS BIGINT)
         |   + CASE WHEN o_orderkey % 10 = 1 THEN 100 ELSE 0 END) AS cents,
         |  o_orderstatus AS status
         |FROM orders
         |WHERE o_orderstatus IN ('O', 'F') AND o_orderkey % 7 <> 0
         |  AND o_orderkey < 10000
         |ORDER BY o_orderkey""".stripMargin,
    "stream_graft_source" ->
      // the full feed: every O row tagged insert (original cents) plus
      // the %10==1 keys' update_preimage (original) and update (+100)
      """WITH o AS (
         |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders WHERE o_orderkey < 10000 AND o_orderstatus = 'O')
         |SELECT o_orderkey, cents, 'insert' AS _change_type FROM o
         |UNION ALL
         |SELECT o_orderkey, cents, 'update_preimage' AS _change_type
         |FROM o WHERE o_orderkey % 10 = 1
         |UNION ALL
         |SELECT o_orderkey, cents + 100 AS cents, 'update' AS _change_type
         |FROM o WHERE o_orderkey % 10 = 1
         |ORDER BY o_orderkey, _change_type""".stripMargin,
    "stream_graft_sink" ->
      // last-write-wins by batch arrival: batch2 (event_id % 2 = 0,
      // cents + 1000) overrides batch1 (event_id % 3 <> 0)
      """WITH ev AS (
         |  SELECT event_id, user_id, event_type,
         |         CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_id < 20000),
         |b1 AS (SELECT * FROM ev WHERE event_id % 3 <> 0),
         |b2 AS (SELECT event_id, user_id, event_type, cents + 1000 AS cents
         |       FROM ev WHERE event_id % 2 = 0)
         |SELECT * FROM b2
         |UNION ALL
         |SELECT * FROM b1 WHERE NOT EXISTS (
         |  SELECT 1 FROM b2 WHERE b2.event_id = b1.event_id)
         |ORDER BY event_id""".stripMargin,
    // PINNED (flags + counts; MvMaintenanceSpec's streaming-ingest ×
    // autoMaintain test is the spec-side floor): the in-row requires
    // pin the hook-folded freshness, the index-serving plan, and the
    // streamed twin's findability.
    "stream_ann_maintain" ->
      """SELECT 306::BIGINT AS corpus_rows, 2::BIGINT AS micro_batches,
         |  5::BIGINT AS k, 5::BIGINT AS n_rows,
         |  TRUE AS covered_fresh, TRUE AS served_from_index,
         |  TRUE AS twin_found""".stripMargin
  )
}
