package graft

import graft.merge.Scd1Merge
import graft.pipeline.IncrementalAgg
import graft.pipeline.IncrementalAgg.AggSpec
import graft.plans.GraftMvRewrite
import graft.functions.{QskAgg, QskQuantile, QuantileSketch}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import org.apache.spark.sql.functions._

/** Quantile-sketch MVs: the deterministic bottom-k row-sample sketch
  * (losslessly mergeable — the property the transparent rewrite's
  * exact-answer contract requires), its two-speed maintenance, the
  * rank-error bound in sampled mode, and the rewrite routing. */
class QuantileMvSpec extends SparkSpecBase {
  import spark.implicits._

  private def qskAgg(h: Column, v: Column,
                     k: Int = QuantileSketch.DefaultK): Column =
    column(QskAgg(expression(h), expression(v), k).toAggregateExpression())
  private def qskQuantile(sk: Column, p: Double): Column =
    column(QskQuantile(expression(sk), expression(lit(p))))

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten
  private def readsOnly(df: DataFrame, dir: String): Boolean = {
    val ps = scanPaths(df)
    ps.nonEmpty && ps.forall(_.contains(dir + "/"))
  }

  test("the sketch is a pure function of the row set: partial unions are byte-equal to the one-pass build; complete samples estimate exactly") {
    val rows = (1L to 2000L).map(i => (i, s"g${i % 4}", (i * 37 % 1000)))
      .toDF("id", "g", "v")
    // one-pass global sketch
    val direct = rows.agg(qskAgg(xxhash64($"id"), $"v").as("sk"))
      .head().getAs[Array[Byte]](0)
    // union of per-group sketches (disjoint row sets)
    val viaGroups = rows.groupBy($"g")
      .agg(qskAgg(xxhash64($"id"), $"v").as("sk"))
      .agg(column(graft.functions.QskUnionAgg(
        expression($"sk")).toAggregateExpression()).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, viaGroups),
      "bottom-k unions must be lossless: bytes must match exactly")
    // and under a different partitioning
    val repart = rows.repartition(13).agg(
      qskAgg(xxhash64($"id"), $"v").as("sk")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, repart),
      "the sketch must be partitioning-independent")
    // k ≥ n ⇒ the sample is complete and estimates are EXACT
    val small = rows.filter($"id" <= 500)
    val sk = small.agg(qskAgg(xxhash64($"id"), $"v").as("sk"))
    val est = sk.select(qskQuantile($"sk", 0.5).as("p50"),
      qskQuantile($"sk", 0.95).as("p95")).head()
    val vs = small.select($"v").as[Long].collect().sorted
    def exact(p: Double): Double = vs(math.floor(p * (vs.length - 1)).toInt).toDouble
    assert(est.getDouble(0) == exact(0.5) && est.getDouble(1) == exact(0.95))
  }

  test("sampled mode (k < n): rank error stays within the uniform-sample bound") {
    val n = 20000L
    val rows = (1L to n).map(i => (i, (i * 7919L) % 100000L)).toDF("id", "v")
    val sk = rows.agg(qskAgg(xxhash64($"id"), $"v", k = 256).as("sk"))
    val vs = rows.select($"v").as[Long].collect().sorted
    Seq(0.1, 0.5, 0.9, 0.99).foreach { p =>
      val est = sk.select(qskQuantile($"sk", p)).head().getDouble(0)
      // true rank of the estimate (fraction of values below it)
      val rank = vs.count(_ < est).toDouble / vs.length
      val err = math.abs(rank - p)
      info(f"p=$p%.2f est-rank=$rank%.4f err=$err%.4f (k=256)")
      // 1.65/sqrt(256) ≈ 0.103 at 95% confidence; the sketch is
      // deterministic on this fixed data, so the observed error is a
      // stable regression pin, floored with headroom
      assert(err <= 0.12, s"rank error $err at p=$p exceeded the bound")
    }
  }

  test("mismatched-k unions keep exactly the provably-valid bottom-min(k) sample; same-k unions adopt that k (never a hardcoded default)") {
    val rows = (1L to 4000L).map(i => (i, (i * 37) % 1000)).toDF("id", "v")
    def sk(df: DataFrame, k: Int): Array[Byte] =
      df.agg(qskAgg(xxhash64($"id"), $"v", k).as("sk"))
        .head().getAs[Array[Byte]](0)
    val a = sk(rows.filter($"id" <= 2000L), 64)   // truncated at 64
    val b = sk(rows.filter($"id" > 2000L), 256)   // truncated at 256
    val merged = QuantileSketch.merge(a, b)
    val dec = QuantileSketch.decode(merged)
    assert(dec.k == 64 && dec.entries.length == 64 && dec.n == 4000L,
      s"mixed-k union must claim min(k): got k=${dec.k} size=${dec.entries.length}")
    // bottom-64(bottom64(A) ∪ bottom256(B)) == bottom-64(A ∪ B): the
    // merged bytes equal a one-pass k=64 build over the whole set
    assert(java.util.Arrays.equals(merged, sk(rows, 64)),
      "min-k union must be byte-equal to the one-pass min-k build")
    // and merge is commutative (build-path-free bytes)
    assert(java.util.Arrays.equals(QuantileSketch.merge(b, a), merged))
    // qsk_union_agg adopts the CONTRIBUTORS' k — a non-default-k MV's
    // serving union must stamp that k, not DefaultK
    val viaUnion = rows.withColumn("half", $"id" <= 2000L)
      .groupBy($"half")
      .agg(qskAgg(xxhash64($"id"), $"v", 256).as("sk"))
      .agg(column(graft.functions.QskUnionAgg(
        expression($"sk")).toAggregateExpression()).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(QuantileSketch.decode(viaUnion).k == 256)
    assert(java.util.Arrays.equals(viaUnion, sk(rows, 256)),
      "same-k union-agg must be byte-equal to the one-pass build at that k")
    // the union of ZERO sketches stamps k=0 on the wire and
    // constrains nothing when merged onward
    val unset = Seq.empty[Array[Byte]].toDF("sk")
      .agg(column(graft.functions.QskUnionAgg(
        expression($"sk")).toAggregateExpression()).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(QuantileSketch.decode(unset).k == 0)
    assert(java.util.Arrays.equals(QuantileSketch.merge(unset, a), a),
      "the empty union sketch must be the merge identity")
  }

  test("QUANTILE MV: inserts fold, a retraction rescans its group, and the maintained sketch equals a from-base rebuild byte-for-byte") {
    val root = Tmp.dir("qsk_mv")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      (1L to 600L).map(i => (i, s"g${i % 3}", i * 10)).toDF("id", "g", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 6)
    val spec = AggSpec(Seq("g"), Seq("cents" -> "sum_cents"), "n",
      quantiles = Seq("cents" -> "qsk_cents"), sampleKeys = Seq("id"))
    IncrementalAgg.bootstrapFrom(spark, mv, base, spec, numBuckets = 1,
      retainVersions = 6)
    GraftMvRewrite.register(base, mv, spec)
    def rebuildEquals(): Unit = {
      val stored = Scd1Merge.readTable(spark, mv)
        .select($"g", $"qsk_cents").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      val fresh = Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(qskAgg(xxhash64($"id"), $"cents").as("sk")).collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(stored.keySet == fresh.keySet,
        s"groups diverged: ${stored.keySet} vs ${fresh.keySet}")
      stored.foreach { case (g, bytes) =>
        assert(java.util.Arrays.equals(bytes, fresh(g)),
          s"group $g: maintained sketch diverged from a from-base rebuild")
      }
    }
    try {
      rebuildEquals()
      // insert-only wave folds
      Scd1Merge.upsert(spark, base,
        Seq((900L, "g0", 5L), (901L, "g1", 123456L))
          .toDF("id", "g", "cents"), Seq("id"), retainVersions = 6)
      IncrementalAgg.applyChanges(spark, mv, base, Seq("id"), spec)
      rebuildEquals()
      // a retraction (delete + an update's preimage) flags groups
      Scd1Merge.delete(spark, base, Seq("id"), $"id" === 901L)
      Scd1Merge.upsert(spark, base,
        Seq((10L, "g1", 999999L)).toDF("id", "g", "cents"), Seq("id"),
        retainVersions = 6)
      IncrementalAgg.applyChanges(spark, mv, base, Seq("id"), spec,
        fromBack = 2)
      rebuildEquals()
    } finally GraftMvRewrite.unregister(base)
  }

  test("SQL lifecycle: CREATE GRAFT MV with qsk_agg; SQL percentile query serves; REFRESH folds; wrong hash spellings reject loudly") {
    graft.GraftExtensions.register(spark)
    val root = Tmp.dir("qsk_sql")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      (1L to 600L).map(i => (i, s"g${i % 3}", i * 10)).toDF("id", "g", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 6)
    try {
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 1 RETAIN 6 AS
           |SELECT g, qsk_agg(xxhash64(id), cents) AS qsk_cents,
           |  sum(cents) AS sum_cents, count(*) AS n
           |FROM graft.`$base` GROUP BY g""".stripMargin)
      assert(graft.pipeline.MvDef.read(mv).exists(d =>
        d.spec.quantiles == Seq("cents" -> "qsk_cents") &&
        d.spec.sampleKeys == Seq("id")),
        "the definition must persist the quantile spec + sample keys")
      Scd1Merge.readTable(spark, base).createOrReplaceTempView("qsk_sql_base")
      def sqlQ(): DataFrame = graft.sql.GraftSql.sql(spark,
        """SELECT g,
          |  qsk_quantile(qsk_agg(xxhash64(id), cents), 0.5D) AS p50,
          |  count(*) AS n
          |FROM qsk_sql_base GROUP BY g ORDER BY g""".stripMargin)
      assert(readsOnly(sqlQ(), mv),
        s"the SQL percentile query must serve from the MV: ${scanPaths(sqlQ())}")
      // wave → stale → SQL REFRESH folds → serves again
      Scd1Merge.upsert(spark, base,
        Seq((900L, "g0", 7L)).toDF("id", "g", "cents"), Seq("id"),
        retainVersions = 6)
      assert(readsOnly(sqlQ(), base))
      graft.sql.GraftSql.sql(spark,
        s"REFRESH MATERIALIZED VIEW graft.`$mv`")
      // the temp view pinned the PRE-wave file snapshot (correct
      // reader isolation — the snapshot gate refuses it); re-resolve
      Scd1Merge.readTable(spark, base).createOrReplaceTempView("qsk_sql_base")
      assert(readsOnly(sqlQ(), mv))
      // loud rejections: a non-key hash, wrong key order is covered
      // by the single-key mismatch here
      val e = intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          s"""CREATE GRAFT MATERIALIZED VIEW graft.`${mv}2` AS
             |SELECT g, qsk_agg(xxhash64(cents), cents) AS q,
             |  count(*) AS n
             |FROM graft.`$base` GROUP BY g""".stripMargin)
      }
      assert(e.getMessage.contains("merge keys"), e.getMessage)
    } finally {
      GraftMvRewrite.unregister(base)
      spark.catalog.dropTempView("qsk_sql_base")
    }
  }

  test("non-default k: SQL CREATE with qsk_agg(..., 256) persists the precision; a k=256 query serves from the MV, a k=1024 one falls through; mixed-k CREATE rejects") {
    graft.GraftExtensions.register(spark)
    val root = Tmp.dir("qsk_k")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      (1L to 3000L).map(i => (i, s"g${i % 3}", i * 10)).toDF("id", "g", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 6)
    try {
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 1 RETAIN 6 AS
           |SELECT g, qsk_agg(xxhash64(id), cents, 256) AS qsk_cents,
           |  count(*) AS n
           |FROM graft.`$base` GROUP BY g""".stripMargin)
      assert(graft.pipeline.MvDef.read(mv).exists(_.spec.qskK == 256),
        "the definition must persist the stored precision")
      // the stored sketches really are k=256 (truncated: groups of 1000)
      val stored = Scd1Merge.readTable(spark, mv)
        .select($"qsk_cents").head().getAs[Array[Byte]](0)
      assert(QuantileSketch.decode(stored).k == 256)
      def q(k: Int): DataFrame =
        Scd1Merge.readTable(spark, base).groupBy($"g")
          .agg(qskQuantile(qskAgg(xxhash64($"id"), $"cents", k), 0.5)
            .as("p50"), count(lit(1)).as("n"))
      assert(readsOnly(q(256), mv),
        s"a k=256 query must serve from the k=256 MV: ${scanPaths(q(256))}")
      assert(readsOnly(q(QuantileSketch.DefaultK), base),
        "a default-k query must fall through a k=256 MV")
      // served answer == base recompute exactly (same k, lossless)
      val served = q(256).orderBy("g").collect().map(_.toSeq).toSeq
      GraftMvRewrite.unregister(base)
      assert(served == q(256).orderBy("g").collect().map(_.toSeq).toSeq)
      GraftMvRewrite.register(base, mv,
        graft.pipeline.MvDef.read(mv).get.spec)
      // mixed-k in one CREATE rejects loudly
      val e = intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          s"""CREATE GRAFT MATERIALIZED VIEW graft.`${mv}2` AS
             |SELECT g, qsk_agg(xxhash64(id), cents, 256) AS q1,
             |  qsk_agg(xxhash64(id), cents, 512) AS q2, count(*) AS n
             |FROM graft.`$base` GROUP BY g""".stripMargin)
      }
      assert(e.getMessage.contains("same k"), e.getMessage)
    } finally GraftMvRewrite.unregister(base)
  }

  test("approx_percentile serving is OPT-IN: a coarser-or-equal accuracy serves from the sketch MV, a tighter one (or the default conf) falls through") {
    val root = Tmp.dir("qsk_ap")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      (1L to 3000L).map(i => (i, s"g${i % 3}", i * 10)).toDF("id", "g", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 6)
    val spec = AggSpec(Seq("g"), Nil, "n",
      quantiles = Seq("cents" -> "qsk_cents"), sampleKeys = Seq("id"))
    IncrementalAgg.bootstrapFrom(spark, mv, base, spec, numBuckets = 1,
      retainVersions = 6)
    GraftMvRewrite.register(base, mv, spec)
    // k=1024 ⇒ the MV's rank-error bound is ~1.65/√1024 ≈ 0.0516,
    // i.e. it can stand in for approx_percentile accuracies ≤ √k/1.65
    // ≈ 19.4 (rank error 1/acc ≥ 0.0516) — acc=10 serves, acc=100
    // (and the 10000 default) are TIGHTER claims the sample can't
    // honor and must fall through
    def q(acc: Int): DataFrame =
      Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(expr(s"approx_percentile(cents, 0.5D, $acc)").as("p50"),
          count(lit(1)).as("n"))
    try {
      // conf off (default): never serves
      assert(readsOnly(q(10), base),
        "approx_percentile must not serve without the opt-in conf")
      spark.conf.set("spark.graft.mv.serveApproxPercentile", "true")
      assert(readsOnly(q(10), mv),
        s"acc=10 must serve from the MV: ${scanPaths(q(10))}")
      assert(readsOnly(q(100), base),
        "a tighter-accuracy query must fall through")
      // the served estimate is the sample's empirical quantile in the
      // child's type — here k ≥ every group, so it is EXACT
      val served = q(10).orderBy("g").collect().map(_.toSeq).toSeq
      val exact = Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(expr("percentile(cents, 0.5D)").as("p50"),
          count(lit(1)).as("n"))
        .orderBy("g").collect().map(_.toSeq).toSeq
      served.zip(exact).foreach { case (s, e) =>
        assert(s.head == e.head && s(2) == e(2), s"$s vs $e")
        // percentile() interpolates between adjacent elements; the
        // sample estimate picks an element — allow one value step
        assert(math.abs(s(1).toString.toDouble - e(1).toString.toDouble)
          <= 30.0, s"served p50 ${s(1)} too far from exact ${e(1)}")
      }
    } finally {
      spark.conf.unset("spark.graft.mv.serveApproxPercentile")
      GraftMvRewrite.unregister(base)
    }
  }

  test("ARRAY-form approx_percentile serves from the sketch MV: one union, per-percentile estimates; tighter accuracy still falls through") {
    val root = Tmp.dir("qsk_ap_arr")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      (1L to 3000L).map(i => (i, s"g${i % 3}", i * 10)).toDF("id", "g", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 6)
    val spec = AggSpec(Seq("g"), Nil, "n",
      quantiles = Seq("cents" -> "qsk_cents"), sampleKeys = Seq("id"))
    IncrementalAgg.bootstrapFrom(spark, mv, base, spec, numBuckets = 1,
      retainVersions = 6)
    GraftMvRewrite.register(base, mv, spec)
    // the shape dashboards emit: one call, several percentiles
    def q(acc: Int): DataFrame =
      Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(expr(s"approx_percentile(cents, array(0.25D, 0.5D, 0.95D), $acc)")
          .as("ps"), count(lit(1)).as("n"))
    try {
      spark.conf.set("spark.graft.mv.serveApproxPercentile", "true")
      assert(readsOnly(q(10), mv),
        s"the array form must serve from the MV: ${scanPaths(q(10))}")
      assert(readsOnly(q(100), base),
        "a tighter-accuracy array query must fall through")
      // served estimates track the exact per-percentile values (the
      // sample holds every row at this size, so element-exactness up
      // to percentile() interpolation)
      val served = q(10).orderBy("g").collect()
        .map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2)))
      val exact = Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(expr("percentile(cents, array(0.25D, 0.5D, 0.95D))").as("ps"),
          count(lit(1)).as("n"))
        .orderBy("g").collect()
        .map(r => (r.getString(0), r.getSeq[Double](1), r.getLong(2)))
      served.zip(exact).foreach { case ((g1, ps, n1), (g2, es, n2)) =>
        assert(g1 == g2 && n1 == n2)
        assert(ps.length == 3, s"three estimates, got $ps")
        ps.zip(es).foreach { case (p, e) =>
          assert(math.abs(p.toDouble - e) <= 30.0,
            s"group $g1: served $p too far from exact $e") }
      }
    } finally {
      spark.conf.unset("spark.graft.mv.serveApproxPercentile")
      GraftMvRewrite.unregister(base)
    }
  }

  test("REWRITE: qsk_agg(xxhash64(keys), m) over the base answers from the MV exactly — full group, roll-up, staleness, wrong-hash fall-through") {
    val root = Tmp.dir("qsk_rw")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      (1L to 600L).map(i => (i, s"g${i % 3}", s"p${i % 2}", i * 10))
        .toDF("id", "g", "p", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 6)
    val spec = AggSpec(Seq("g", "p"), Seq("cents" -> "sum_cents"), "n",
      quantiles = Seq("cents" -> "qsk_cents"), sampleKeys = Seq("id"))
    IncrementalAgg.bootstrapFrom(spark, mv, base, spec, numBuckets = 1,
      retainVersions = 6)
    GraftMvRewrite.register(base, mv, spec)
    def q(groups: Column*): DataFrame =
      Scd1Merge.readTable(spark, base).groupBy(groups: _*)
        .agg(qskQuantile(qskAgg(xxhash64($"id"), $"cents"), 0.5).as("p50"),
          count(lit(1)).as("n"))
    try {
      val full = q($"g", $"p")
      assert(readsOnly(full, mv), s"${scanPaths(full)}")
      val roll = q($"g")
      assert(readsOnly(roll, mv), "the roll-up must union stored samples")
      // values equal the base recompute EXACTLY (lossless unions)
      val servedFull = full.orderBy("g", "p").collect().map(_.toSeq).toSeq
      val servedRoll = roll.orderBy("g").collect().map(_.toSeq).toSeq
      GraftMvRewrite.unregister(base)
      assert(servedFull ==
        q($"g", $"p").orderBy("g", "p").collect().map(_.toSeq).toSeq)
      assert(servedRoll == q($"g").orderBy("g").collect().map(_.toSeq).toSeq)
      GraftMvRewrite.register(base, mv, spec)
      // a DIFFERENT hash spelling samples different row identities —
      // must fall through (never serve a mismatched sample)
      val wrongHash = Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(qskQuantile(qskAgg(xxhash64($"cents"), $"cents"), 0.5).as("p50"),
          count(lit(1)).as("n"))
      assert(readsOnly(wrongHash, base),
        "a mismatched sample hash must fall through")
      // non-default k falls through (different precision than stored)
      val wrongK = Scd1Merge.readTable(spark, base).groupBy($"g")
        .agg(qskQuantile(qskAgg(xxhash64($"id"), $"cents", k = 32), 0.5)
          .as("p50"), count(lit(1)).as("n"))
      assert(readsOnly(wrongK, base), "non-default k must fall through")
      // staleness: a base wave routes to the base until refreshed
      Scd1Merge.upsert(spark, base,
        Seq((900L, "g0", "p0", 77L)).toDF("id", "g", "p", "cents"),
        Seq("id"), retainVersions = 6)
      assert(readsOnly(q($"g", $"p"), base), "stale MV must not serve")
      IncrementalAgg.applyChanges(spark, mv, base, Seq("id"), spec)
      assert(readsOnly(q($"g", $"p"), mv), "refreshed MV must serve")
    } finally GraftMvRewrite.unregister(base)
  }
}
