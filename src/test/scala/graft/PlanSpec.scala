package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan pins for the scale claims SCALE.md makes in prose:
  * filters reach the scan, projections prune the read schema, small
  * dims broadcast, ORDER BY+LIMIT is a top-k operator (not a global
  * sort), and the chunked window twins really partition by
  * (key, chunk). Plan-string checks are deliberately loose (substring
  * presence) so Spark-version formatting drift doesn't false-alarm. */
class PlanSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("watermark range filter is PUSHED to the parquet scan (F5)") {
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,150000.0)]"),
      s"expected pushed filter in:\n$p")
  }

  test("a 2-column projection prunes the scan's ReadSchema (P1)") {
    val df = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string>"),
      s"expected pruned ReadSchema in:\n$p")
  }

  test("small dim joins broadcast (J1); ORDER BY+LIMIT is TakeOrderedAndProject (O2)") {
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val n = spark.read.parquet(s"$dir/nation.parquet")
    val j = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
    assert(plan(j).contains("BroadcastHashJoin"), s"expected broadcast join:\n${plan(j)}")
    val topk = spark.read.parquet(s"$dir/orders.parquet")
      .orderBy(col("o_totalprice").desc).limit(10)
    assert(plan(topk).contains("TakeOrderedAndProject"),
      s"expected top-k operator, not a global sort:\n${plan(topk)}")
  }

  test("watermark range over a date-partitioned source prunes partitions (S1 at scale)") {
    // SCALE.md's ingest rule: a 100 TB source must be partitioned on
    // the watermark column so the range predicate prunes at the file
    // index — pinned here on a partitioned copy of orders
    val src = Tmp.dir("plan_part_src") + "/orders"
    spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("o_date", to_date(col("o_orderdate")))
      .write.partitionBy("o_date").parquet(src)
    val df = spark.read.parquet(src)
      .filter(col("o_date") > to_date(lit("1997-06-01")))
    val p = plan(df)
    assert(p.contains("PartitionFilters: [isnotnull(o_date"),
      s"expected partition filters in:\n$p")
    val scanned = df.queryExecution.executedPlan.collectLeaves().head
      .metrics.get("numFiles")
    df.count()
    val total = spark.read.parquet(src).inputFiles.length
    assert(scanned.exists(_.value < total),
      s"pruned scan must read fewer than all $total files")
  }

  test("bucketed tables join WITHOUT a shuffle on either side") {
    val spark2 = spark
    spark2.sql("CREATE DATABASE IF NOT EXISTS graft_plan")
    spark2.sql("DROP TABLE IF EXISTS graft_plan.o_bkt")
    spark2.sql("DROP TABLE IF EXISTS graft_plan.c_bkt")
    val wh = java.net.URI.create(spark2.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("o_bkt", "c_bkt")) {
      val loc = java.nio.file.Paths.get(wh, "graft_plan.db", t)
      if (java.nio.file.Files.exists(loc)) Tmp.deleteRecursively(loc)
    }
    spark2.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("graft_plan.o_bkt")
    spark2.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("graft_plan.c_bkt")
    val prev = spark2.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force the merge-join path
    try {
      val j = spark2.table("graft_plan.o_bkt")
        .join(spark2.table("graft_plan.c_bkt"), col("o_custkey") === col("c_custkey"))
      val p = plan(j)
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucket-aligned join must not shuffle either side:\n$p")
    } finally spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE skew-join splits a hot-key SMJ partition (skew=true)") {
    // The engine's answer to JOIN-side skew (window-side skew is solved
    // by the chunked twins): AQE detects an oversized shuffle partition
    // and splits it across tasks. Forced-low thresholds make the
    // detection fire at test scale; at 100 TB the defaults (256 MB)
    // play the same role. The skew split only exists in the FINAL
    // adaptive plan, so assert after execution.
    val s = spark
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> s.conf.getOption(k))
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // ~90% of the fact rows share one hot key
      val fact = s.range(0, 500000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = s.range(0, 1000).select(col("id").as("k"), col("id").as("attr"))
      val joined = fact.join(dim, "k")
      // materialize THIS dataset's own query execution (count() would
      // build a different one and leave this plan isFinalPlan=false)
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"expected AQE skew-split SMJ in the final plan:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("j13_dpp fact scan carries a runtime dynamicpruning partition filter") {
    // the star-schema scan killer: the months to read are only known
    // after filtering the dim on its label ATTRIBUTE, so a static
    // planner reads all ~80 month partitions — DPP must inject the
    // broadcast dim's keys as a runtime partition filter on the fact
    val df = graft.queries.QueriesRel.queries("j13_dpp")(spark, dir)
    df.collect() // materialize THIS dataset's adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruningexpression partition filter on the fact scan:\n$p")
  }

  test("knnGraph's directed pass broadcasts the query side (corpus never shuffles)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = plan(graft.similarity.Similarity.knnGraph(emb, "vec_id", "embedding", 3))
    // the scoring join is non-equi (id != id) against an explicitly
    // broadcast query set -> BroadcastNestedLoopJoin by design: one
    // narrow corpus pass, no corpus-side exchange before scoring
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected the broadcast scoring join:\n$p")
  }

  test("gopherGates is one explode→agg pass (2 exchanges: the distinct-agg pair, both on doc_id)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.text.TextOps.gopherGates(docs, "doc_id", "text"))
    // countDistinct(stopwords) makes this Spark's standard two-phase
    // distinct aggregation — two doc_id-keyed exchanges over
    // AGGREGATED rows, never a second pass over the token stream; any
    // third exchange would mean the rule math left the agg
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected the distinct-agg exchange pair, got $exchanges:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global-partition stage belongs in a per-doc gate:\n$p")
  }

  test("chunked twins window by (key, chunk), not by key alone") {
    import spark.implicits._
    val ev = Seq((1L, 1000000000L)).toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val p = plan(graft.streaming.Streaming.sessionizeChunked(ev, 30, 6))
    // the stage-1 window's partition spec must carry the chunk column
    assert(p.contains("windowspecdefinition(user_id") && p.contains("__chunk"),
      s"expected (user_id, __chunk) window partitioning:\n$p")
  }
  test("decontaminate probes the benchmark gram set via a broadcast join") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"w$i x y z q r s t u v")).toDF("doc_id", "text")
    val p = plan(graft.text.TextOps.decontaminate(
      docs, docs.filter($"doc_id" === 1L), "doc_id", "text", n = 5))
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark gram set must broadcast, not shuffle:\n$p")
  }

  test("packSequences has NO single-partition exchange (global cumsum via prefix sums)") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    val got = graft.text.TextOps.packSequences(docs, "doc_id", "text", budget = 64L)
    val p = plan(got)
    assert(!p.contains("Exchange SinglePartition"),
      s"the running sum must not serialize through one partition:\n$p")
    assert(p.contains("windowspecdefinition(__pid"),
      s"the cumsum window must partition by __pid:\n$p")
  }
  test("chunkWindows is a pure scan->project->explode: NO exchange at all") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, "x" * 500)).toDF("doc_id", "text")
    val got = graft.text.TextOps.chunkWindows(docs, "doc_id", "text")
    val p = plan(got)
    assert(!p.contains("Exchange"),
      s"chunking must be shuffle-free (linear explode over the scan):\n$p")
    assert(p.contains("Generate explode"), s"expected an explode Generate:\n$p")
  }

  // (WholeStageCodegen placement of the native vec expressions is
  // already pinned in VectorExpressionsSpec.)
}
