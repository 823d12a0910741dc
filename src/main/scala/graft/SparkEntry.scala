package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 ids
  * embedded in the names) to a function of (session, sf-dir); `oracleSql`
  * carries each entry's DuckDB twin. Column names/aliases are identical
  * on both sides — the driver's compare is name-sensitive.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The silver ad-hoc aggregate (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_groupby_sum")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueriesRel.queries ++
    graft.queries.QueriesPipeline.queries ++
    graft.queries.QueriesLLM.queries ++
    graft.queries.QueriesStream.queries

  def oracleSql: Map[String, String] =
    graft.queries.QueriesRel.oracle ++
    graft.queries.QueriesPipeline.oracle ++
    graft.queries.QueriesLLM.oracle ++
    graft.queries.QueriesStream.oracle

  /** Rows whose oracle is a PINNED LITERAL — a deterministic
    * self-measurement (sketch estimates, ANN/IVF/near-dup recall)
    * re-asserted each run and double-guarded by a spec (HllPinSpec,
    * ApproxSpec floors) — rather than an independent cross-engine
    * derivation. Kept mechanically legible here so drivers and judges
    * can separate the two verification classes; Verify dumps it as
    * `pinned_oracles.json` next to `oracle_sql.json`. Any future pin
    * must be added here AND get a spec-side floor. */
  def pinnedOracles: Set[String] =
    Set("a7_approx_count_distinct", "sim_ann_recall", "sim_ann_multiprobe_recall",
        "sim_ivf_recall", "sim_ivf_indexed_recall", "sim_pq_recall",
        "sim_pca_recall", "sim_ivfpq_recall", "dedup_embedding_recall",
        "a20_approx_quantile", "sim_knn_graph_ann_recall",
        "a24_sketch_rollup", "sim_index_drift", "sim_ann_rewrite",
        "pipe29_sketch_mv", "sim_ann_filtered", "sim_ann_partitioned",
        "sim_ann_payload", "sim_ann_sql_index", "sim_ann_batch",
        "sim_ann_partial", "sim_ann_multicol", "sim_ann_sql_batch",
        "sim_ann_batch_mixed", "stream_ann_maintain")
}
