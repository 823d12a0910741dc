package graft

import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** The stream result over in-order file chunks must equal the batch
  * answer — the multi-micro-batch path the judged single-file entry
  * doesn't exercise. */
class StreamingSpec extends SparkSpecBase {

  test("AvailableNow over 2 in-order chunks ≡ batch aggregation") {
    val events = spark.read
      .schema(Streaming.EventsRawSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")

    // split on event time; write chunks in order so the second batch
    // never carries data older than the first batch's watermark
    val cut = lit(java.time.Instant.parse("2024-01-15T00:00:00Z"))
    val src = Tmp.dir("stream_src")
    events.filter(col("ts") < cut).coalesce(1)
      .write.mode("append").parquet(src)
    Thread.sleep(1100) // distinct mtimes => deterministic file order
    events.filter(col("ts") >= cut).coalesce(1)
      .write.mode("append").parquet(src)

    val got = Streaming.runAvailableNow(spark, src,
      Tmp.dir("stream_out") + "/agg", Tmp.dir("stream_ckpt"),
      maxFilesPerTrigger = Some(1))

    val want = Streaming.windowAgg(events, "1 hour")
    assertSameRows(
      got.orderBy(col("window_start"), col("event_type")),
      want.orderBy(col("window_start"), col("event_type")))
  }

  test("watermark drops a late-only batch two triggers past its event time") {
    // Spark's one-sided guarantee, both sides pinned: late input is
    // filtered against the PREVIOUS batch's watermark, so clones
    // arriving 2 batches after day 1 (watermark long past noon) MUST
    // drop — the committed table equals the legit-rows aggregate,
    // poison values (+1000) would corrupt sums on any leak.
    val ev = spark.read.schema(Streaming.EventsRawSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    def at(iso: String) = lit(java.time.Instant.parse(iso))
    val d1 = ev.filter(col("ts") < at("2024-01-02T00:00:00Z"))
    val d2 = ev.filter(col("ts") >= at("2024-01-02T00:00:00Z") &&
      col("ts") < at("2024-01-03T00:00:00Z"))
    val late = d1.filter(col("ts") >= at("2024-01-01T12:00:00Z") &&
        col("ts") < at("2024-01-01T13:00:00Z"))
      .withColumn("event_id", col("event_id") + 1000000000L)
      .withColumn("value", col("value") + 1000.0)
    assert(late.count() > 0, "fixture must plant real late rows")
    val src = Tmp.dir("late_src")
    d1.coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    d2.coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    late.coalesce(1).write.mode("append").parquet(src)
    val got = Streaming.runAvailableNow(spark, src,
      Tmp.dir("late_out") + "/agg", Tmp.dir("late_ckpt"),
      watermarkDelay = "1 hour", maxFilesPerTrigger = Some(1))
    val want = Streaming.windowAgg(d1.unionByName(d2), "1 hour")
    assertSameRows(
      got.orderBy(col("window_start"), col("event_type")),
      want.orderBy(col("window_start"), col("event_type")))
  }

  test("flatMapGroupsWithState profile over 2 chunks ≡ batch aggregate") {
    val events = spark.read
      .schema(Streaming.EventsRawSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    val cut = lit(java.time.Instant.parse("2024-01-15T00:00:00Z"))
    val src = Tmp.dir("state_src")
    events.filter(col("ts") < cut).coalesce(1)
      .write.mode("append").parquet(src)
    events.filter(col("ts") >= cut).coalesce(1)
      .write.mode("append").parquet(src)

    val got = Streaming.runStatefulAvailableNow(spark, src,
      Tmp.dir("state_out") + "/profiles", Tmp.dir("state_ckpt"),
      maxFilesPerTrigger = Some(1))

    val want = events.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"),
      max(col("ts")).as("last_event"))
    assertSameRows(got.orderBy(col("user_id")), want.orderBy(col("user_id")))
  }

  test("stream-stream join over 2 chunks ≡ batch time-range join") {
    val events = spark.read
      .schema(Streaming.EventsRawSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    val cut = lit(java.time.Instant.parse("2024-01-15T00:00:00Z"))
    val src = Tmp.dir("ssj_src")
    events.filter(col("ts") < cut).coalesce(1).write.mode("append").parquet(src)
    events.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)
    val got = Streaming.runStreamJoinAvailableNow(spark, src,
      Tmp.dir("ssj_out") + "/pairs", Tmp.dir("ssj_ckpt"),
      maxFilesPerTrigger = Some(1))
    val e = Streaming.withEventTime(events)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ets").as("view_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ets").as("purchase_ts"))
    val want = v.join(p, col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        col("view_ts"), col("purchase_ts"))
    assertSameRows(
      got.orderBy(col("view_id"), col("purchase_id")),
      want.orderBy(col("view_id"), col("purchase_id")))
  }

  test("sessionizeChunked ≡ sessionize, with a hot user holding 50% of events") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dayUs = 86400L * 1000000L
    // hot user: 5000 events over 7 days (avg gap ~2 min => long sessions
    // crossing chunk boundaries); 20 cold users: 250 events each (avg
    // gap ~40 min => plenty of genuine session breaks)
    val rows =
      (1 to 5000).map(_ => (0L, math.abs(rnd.nextLong()) % (7 * dayUs))) ++
      (1 to 5000).map(_ => (1L + rnd.nextInt(20), math.abs(rnd.nextLong()) % (7 * dayUs)))
    val ev = rows.toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val plain = Streaming.sessionize(ev, gapMinutes = 30)
    val chunked = Streaming.sessionizeChunked(ev, gapMinutes = 30, chunkHours = 6)
    assertSameRows(chunked, plain)
    // the scale point: the hot user's largest (user, chunk) partition is
    // bounded by a chunk's share, not the full 5000-event history
    val maxGroup = ev
      .withColumn("chunk", (unix_micros(col("ts")) / (6 * 3600L * 1000000L)).cast("long"))
      .groupBy($"user_id", $"chunk").count().agg(max("count")).first().getLong(0)
    assert(maxGroup <= 1000, s"6h chunks over 7 days must bound partitions: max=$maxGroup")
  }

  test("native session_window sessions match the gaps-and-islands form") {
    val ev = spark.read.schema(Streaming.EventsRawSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    val native = Streaming.withEventTime(ev)
      .groupBy(col("user_id"), session_window(col("ets"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
    val rolled = Streaming.sessionize(ev, gapMinutes = 30)
      .select(col("user_id"), col("session_start"), col("n_events"))
    // same sessions: identical (user, start, count) triples — ends
    // differ by design (native end = last event + gap)
    assertSameRows(native.orderBy(col("user_id"), col("session_start")),
      rolled.orderBy(col("user_id"), col("session_start")))
  }

  test("persistent dedup sink: a replayed micro-batch commits nothing (exactly-once table)") {
    import spark.implicits._
    val out = Tmp.dir("pdedup_out") + "/seen"
    val b1 = Seq((1L, 10L, "view", 1.0), (2L, 11L, "purchase", 2.0),
        (1L, 10L, "view", 1.0)) // in-batch duplicate
      .toDF("event_id", "user_id", "event_type", "value")
    val b2 = Seq((2L, 11L, "purchase", 2.0), (3L, 12L, "view", 3.0))
      .toDF("event_id", "user_id", "event_type", "value")
    Streaming.dedupSinkBatch(spark, out, b1, Seq("event_id"), "S000001", numBuckets = 2)
    Streaming.dedupSinkBatch(spark, out, b2, Seq("event_id"), "S000002")
    val once = graft.merge.Scd1Merge.readTable(spark, out)
    assert(once.count() == 3, "in-batch + cross-batch dups collapse")
    // at-least-once driver: batch 2 re-runs after a "failure"
    Streaming.dedupSinkBatch(spark, out, b2, Seq("event_id"), "S000002")
    val twice = graft.merge.Scd1Merge.readTable(spark, out)
    assert(twice.count() == 3, "a replayed batch must commit nothing")
    assert(twice.filter(col("event_id") === 3L).count() == 1)
  }

  test("ChangeStream: crash between sink and offset redelivers the SAME batch id; stamped sink absorbs it") {
    import spark.implicits._
    import graft.merge.Scd1Merge
    import graft.streaming.ChangeStream
    val root = Tmp.dir("cs_replay")
    val up = root + "/up"; val down = root + "/down"; val ckpt = root + "/ckpt"
    val K = Seq("k")
    Scd1Merge.upsert(spark, up,
      (0 until 20).map(i => (i.toLong, s"v$i")).toDF("k", "v"), K,
      numBuckets = 4, retainVersions = 8)
    val sink = ChangeStream.upsertSink(spark, down, K)
    assert(ChangeStream.runAvailableNow(spark, up, K, ckpt)(sink) == 1)
    Scd1Merge.upsert(spark, up, Seq((3L, "V3'"), (100L, "new")).toDF("k", "v"), K,
      retainVersions = 8)
    // run the pending commit, then simulate "crash before offset
    // advance" by rewinding the offset file and triggering again: the
    // batch is REDELIVERED under the same id and must commit nothing
    assert(ChangeStream.runAvailableNow(spark, up, K, ckpt)(sink) == 1)
    val commitsAfter = Scd1Merge.tableCommit(down).get
    val state = canon(Scd1Merge.readTable(spark, down))
    java.nio.file.Files.write(java.nio.file.Paths.get(ckpt, "offset"),
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(ChangeStream.runAvailableNow(spark, up, K, ckpt)(sink) == 1,
      "the rewound batch is redelivered")
    assert(Scd1Merge.tableCommit(down).get == commitsAfter,
      "a redelivered batch must land ZERO new commits (stamp match)")
    assert(canon(Scd1Merge.readTable(spark, down)) == state)
    assert(Scd1Merge.readTable(spark, down).filter(col("k") === 3L)
      .select("v").first().getString(0) == "V3'")
  }

  test("ChangeStream: a crash between the upsert and delete legs resumes without double-apply") {
    import spark.implicits._
    import graft.merge.Scd1Merge
    import graft.streaming.ChangeStream
    val root = Tmp.dir("cs_twoleg")
    val up = root + "/up"; val down = root + "/down"; val ckpt = root + "/ckpt"
    val K = Seq("k")
    Scd1Merge.upsert(spark, up,
      (0 until 20).map(i => (i.toLong, i.toLong * 10)).toDF("k", "x"), K,
      numBuckets = 4, retainVersions = 8)
    val sink = ChangeStream.upsertSink(spark, down, K)
    assert(ChangeStream.runAvailableNow(spark, up, K, ckpt)(sink) == 1)
    // ONE upstream window carrying both legs: an update and a delete
    // (two upstream commits, consumed as one net batch)
    Scd1Merge.upsert(spark, up, Seq((5L, 555L)).toDF("k", "x"), K,
      retainVersions = 8)
    Scd1Merge.deleteSoft(spark, up, K, col("k") === 7L, retainVersions = 8)
    // crash simulation: apply ONLY the upsert leg by hand under the
    // half stamp, as if the sink died before its delete leg
    val live = Scd1Merge.tableCommit(up).get
    val changes = Scd1Merge.readChanges(spark, up, K,
      fromCommitsBack = live - 1, toCommitsBack = 0)
    val batchId = ChangeStream.batchIdFor(live)
    Scd1Merge.upsert(spark, down,
      changes.filter(col("_change_type").isin("insert", "update"))
        .drop("_change_type"), K, batchId = batchId + ":u")
    // ...offset never advanced, so the trigger redelivers: the upsert
    // leg must be SKIPPED (half stamp) and the delete leg applied
    val downCommits = Scd1Merge.tableCommit(down).get
    assert(ChangeStream.runAvailableNow(spark, up, K, ckpt,
      maxCommitsPerBatch = 2)(sink) == 1)
    assert(Scd1Merge.tableCommit(down).get == downCommits + 1,
      "resume must land exactly the missing delete commit")
    val got = Scd1Merge.readTable(spark, down)
    assert(got.count() == 19, "k=7 deleted")
    assert(got.filter(col("k") === 5L).select("x").first().getLong(0) == 555L)
    assert(got.filter(col("k") === 7L).isEmpty)
  }

  test("ChangeStream: maxCommitsPerBatch pages commits; net-effect collapse is exact") {
    import spark.implicits._
    import graft.merge.Scd1Merge
    import graft.streaming.ChangeStream
    val root = Tmp.dir("cs_paging")
    val up = root + "/up"
    val K = Seq("k")
    Scd1Merge.upsert(spark, up,
      (0 until 10).map(i => (i.toLong, "a")).toDF("k", "v"), K,
      numBuckets = 2, retainVersions = 8)
    // consumer A sees the snapshot now (offset 1); then 4 commits land
    val ckptA = root + "/ckptA"; val downA = root + "/downA"
    val sinkA = ChangeStream.upsertSink(spark, downA, K)
    ChangeStream.runAvailableNow(spark, up, K, ckptA)(sinkA)
    Scd1Merge.upsert(spark, up, Seq((3L, "b")).toDF("k", "v"), K, retainVersions = 8)
    Scd1Merge.upsert(spark, up, Seq((3L, "c"), (20L, "n")).toDF("k", "v"), K,
      retainVersions = 8)
    Scd1Merge.deleteSoft(spark, up, K, col("k") === 20L, retainVersions = 8)
    Scd1Merge.upsert(spark, up, Seq((4L, "d")).toDF("k", "v"), K, retainVersions = 8)
    // page through them 2 commits per batch: 2 batches, same final
    // state as the upstream table
    assert(ChangeStream.runAvailableNow(spark, up, K, ckptA,
      maxCommitsPerBatch = 2)(sinkA) == 2)
    assert(canon(Scd1Merge.readTable(spark, downA)) ==
      canon(Scd1Merge.readTable(spark, up)),
      "paged consumption must converge to the upstream state")
    assert(Scd1Merge.readTable(spark, downA).filter(col("k") === 20L).isEmpty,
      "a key inserted then deleted upstream stays deleted downstream")
  }

  test("ChangeStream: maxBucketsPerTrigger pages a backfill commit; equals the unlimited run; crash resumes") {
    import spark.implicits._
    import graft.merge.Scd1Merge
    import graft.streaming.ChangeStream
    val root = Tmp.dir("cs_bucketpage")
    val up = root + "/up"
    val K = Seq("k")
    // 64 keys over 8 buckets — every bucket populated
    Scd1Merge.upsert(spark, up,
      (0 until 64).map(i => (i.toLong, "a")).toDF("k", "v"), K,
      numBuckets = 8, retainVersions = 8)
    // the INITIAL SNAPSHOT pages too: 8 live buckets / limit 2 = 4 batches
    val ckptL = root + "/ckptL"; val downL = root + "/downL"
    val sinkL = ChangeStream.upsertSink(spark, downL, K)
    assert(ChangeStream.runAvailableNow(spark, up, K, ckptL,
      maxBucketsPerTrigger = 2)(sinkL) == 4)
    assert(canon(Scd1Merge.readTable(spark, downL)) ==
      canon(Scd1Merge.readTable(spark, up)))
    // a BACKFILL commit touching every bucket — the giant-micro-batch
    // case admission control exists for
    Scd1Merge.upsert(spark, up,
      (0 until 64).map(i => (i.toLong, "b")).toDF("k", "v"), K,
      retainVersions = 8)
    // unlimited twin consumer for the equality pin
    val ckptU = root + "/ckptU"; val downU = root + "/downU"
    val sinkU = ChangeStream.upsertSink(spark, downU, K)
    ChangeStream.runAvailableNow(spark, up, K, ckptU)(sinkU)
    // the 8-bucket commit drains in exactly 4 limited batches...
    assert(ChangeStream.runAvailableNow(spark, up, K, ckptL,
      maxBucketsPerTrigger = 2)(sinkL) == 4)
    // ...and the paged consumer's final state equals the unlimited run
    assert(canon(Scd1Merge.readTable(spark, downL)) ==
      canon(Scd1Merge.readTable(spark, downU)))
    assert(canon(Scd1Merge.readTable(spark, downL)) ==
      canon(Scd1Merge.readTable(spark, up)))
    // CRASH MID-DRAIN: two pages land, the third throws; the durable
    // sub-commit offset resumes the remaining pages without
    // double-applying the first two
    Scd1Merge.upsert(spark, up,
      (0 until 64 by 2).map(i => (i.toLong, "c")).toDF("k", "v"), K,
      retainVersions = 8)
    var delivered = 0
    val crashing: (org.apache.spark.sql.DataFrame, String) => Unit =
      (df, id) => {
        if (delivered == 2) throw new RuntimeException("simulated crash")
        delivered += 1
        sinkL(df, id)
      }
    intercept[RuntimeException] {
      ChangeStream.runAvailableNow(spark, up, K, ckptL,
        maxBucketsPerTrigger = 1)(crashing)
    }
    val resumed = ChangeStream.runAvailableNow(spark, up, K, ckptL,
      maxBucketsPerTrigger = 1)(sinkL)
    assert(resumed >= 1, "resume must drain the remaining pages")
    assert(canon(Scd1Merge.readTable(spark, downL)) ==
      canon(Scd1Merge.readTable(spark, up)),
      "crash + resume must converge to the upstream state")
  }

  test("watermarked dedup: state stays horizon-bounded while the sink dedups exactly") {
    val events = spark.read
      .schema(Streaming.EventsRawSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    val total = events.count()
    val src = Tmp.dir("swd_src")
    events.coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    events.coalesce(1).write.mode("append").parquet(src) // full clone batch
    val got = Streaming.runDedupWithinWatermarkAvailableNow(spark, src,
      Tmp.dir("swd_out") + "/dedup", Tmp.dir("swd_ckpt"),
      keyCols = Seq("event_id"), maxFilesPerTrigger = Some(1))
    assert(got.count() == total, "clones must leave exactly one copy")
    // THE scale claim: after eviction catches up, the store RETAINS
    // only the watermark horizon's keys, not every key ever seen (the
    // spread of event times is ~weeks vs a 1-hour delay — plain
    // dropDuplicates state retains `total` forever)
    val state = Streaming.lastDedupStateRows
    assert(state >= 0, "state metrics must be observed")
    assert(state < total / 5,
      s"retained state must be horizon-bounded: held $state of $total keys")
  }

  test("stream-static join over 2 micro-batches ≡ batch broadcast join") {
    val events = spark.read
      .schema(Streaming.EventsRawSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    val dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val src = Tmp.dir("ssj_src")
    events.filter(pmod(col("event_id"), lit(2)) === 1).coalesce(1)
      .write.mode("append").parquet(src)
    Thread.sleep(1100)
    events.filter(pmod(col("event_id"), lit(2)) === 0).coalesce(1)
      .write.mode("append").parquet(src)
    val out = Tmp.dir("ssj_out") + "/enriched"
    val got = Streaming.runStreamStaticJoinAvailableNow(spark, src, dim,
      "user_id", "c_custkey", out, Tmp.dir("ssj_ckpt"),
      maxFilesPerTrigger = Some(1))
    // two micro-batches really happened: the append sink holds >= 2 files
    assert(got.inputFiles.length >= 2,
      s"expected one sink file per micro-batch, got ${got.inputFiles.length}")
    val want = events.join(broadcast(dim),
      events("user_id") === dim("c_custkey"))
    val cols = Seq("event_id", "event_type", "c_name", "c_mktsegment")
    assertSameRows(
      got.select(cols.map(col): _*).orderBy(col("event_id"), col("c_name")),
      want.select(cols.map(col): _*).orderBy(col("event_id"), col("c_name")))
  }

  test("streaming runs leave no session conf mutated (order-independence)") {
    val before = Seq("spark.sql.shuffle.partitions",
      "spark.sql.csv.filterPushdown.enabled")
      .map(k => k -> spark.conf.getOption(k))
    val src = Tmp.dir("conf_src")
    spark.read.schema(Streaming.EventsRawSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
      .coalesce(1).write.mode("append").parquet(src)
    Streaming.runAvailableNow(spark, src,
      Tmp.dir("conf_out") + "/agg", Tmp.dir("conf_ckpt"))
    Streaming.runDedupAvailableNow(spark, src,
      Tmp.dir("conf_dout") + "/dedup", Tmp.dir("conf_dckpt"), Seq("event_id"))
    graft.pipeline.SalesReplay.run(spark, Tmp.dir("conf_sales"))
    val after = before.map { case (k, _) => k -> spark.conf.getOption(k) }
    assert(after == before, "session confs must be restored after each run")
  }
}
