package graft.queries

import graft.Tables.table
import graft.ops.KeyGenStrategy
import graft.pipeline.{DimBuilder, DimSpec, FactBuilder, SilverJob}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val oracle: Map[String, String] = Map(
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
