package graft.sql

import graft.merge.Scd1Merge
import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SQL DML surface for graft tables — `MERGE INTO` / `UPDATE` /
  * `DELETE` statements routed onto the [[Scd1Merge]] engine, closing
  * the last Delta-parity gap for SQL-only users (the reference's own
  * merge IS Delta SQL/API, `gold_dim_branch.py:177-184`; until now a
  * SQL user could not touch a graft table's write path at all).
  *
  * HOW: Spark's OWN parser already produces `MergeIntoTable` /
  * `UpdateTable` / `DeleteFromTable` logical plans for the three
  * statements — it just has no way to EXECUTE them against parquet
  * tables. [[GraftDml.rewrite]] pattern-matches those plans when the
  * target is a graft table and swaps in a `LeafRunnableCommand`
  * (Spark's eager-DML contract) that calls the existing engine —
  * every statement therefore inherits the full commit protocol: lock
  * + lease, manifest swap, retention, stats, bloom, change feed,
  * column mapping. Non-graft targets pass through untouched.
  *
  * Two entry points, same translation:
  *  - session-built: `GraftExtensions` injects [[GraftSqlParser]] via
  *    `injectParser`, so `spark.sql("MERGE INTO ...")` just works on a
  *    session built with `spark.sql.extensions=graft.GraftExtensions`.
  *  - live session: [[GraftSql.sql]] parses with the session's parser
  *    and applies the same rewrite (the extensions hook only fires at
  *    session build — the registerFunction posture).
  *
  * Table addressing: `graft.`/abs/path`` names a table by path (the
  * Delta ``delta.`/path``` convention), or a short name registered via
  * [[GraftTables.register]]. Merge keys are NOT restated in SQL —
  * the manifest records them ([[Scd1Merge.tableKeys]]), and the MERGE
  * ON clause must be exactly the key-equality conjunction (anything
  * else would silently not be the bucketed merge the engine runs —
  * rejected loudly instead).
  *
  * Supported MERGE forms (everything else fails loudly, naming the
  * restriction — never a silent semantic drift):
  *  - `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *    → [[Scd1Merge.upsert]] (optionally `WITH SCHEMA EVOLUTION`).
  *  - `WHEN MATCHED AND <cond> THEN DELETE WHEN MATCHED THEN UPDATE
  *    SET * WHEN NOT MATCHED THEN INSERT *` → [[Scd1Merge.applyCdc]]
  *    (the CDC-apply shape; `<cond>` speaks source columns).
  *  - `WHEN MATCHED THEN DELETE` (alone) → all-delete [[Scd1Merge
  *    .applyCdc]] (delete exactly the target keys the source carries).
  *  - `WHEN MATCHED THEN UPDATE SET *` (alone) → update-only: source
  *    semi-joined to the target's live keys, then upsert.
  *  - `WHEN NOT MATCHED THEN INSERT *` (alone) → insert-only: source
  *    anti-joined, then upsert.
  * Per-column `UPDATE SET c = expr` inside MERGE and `WHEN NOT
  * MATCHED BY SOURCE` are not offered (use the UPDATE statement /
  * [[Scd1Merge.deleteSoft]]).
  *
  * At 100 TB nothing changes: the commands are thin routing — cost
  * and plan shape are exactly the Scala API's (probe-pruned bucket
  * rewrites, stats/hash skipping on UPDATE/DELETE predicates).
  */
object GraftDml {

  /** Swap a parsed DML plan for a graft command when (and only when)
    * the target resolves to a graft table. None = not ours: hand the
    * plan back to Spark untouched. */
  def rewrite(plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case d: DeleteFromTable =>
      targetPath(d.table).map { path =>
        GraftDeleteCommand(path, toColumn(d.condition))
      }
    case u: UpdateTable =>
      targetPath(u.table).map { path =>
        val set = u.assignments.map { a =>
          attrName(a.key) -> toColumn(a.value)
        }
        GraftUpdateCommand(path, set,
          u.condition.map(toColumn).getOrElse(lit(true)))
      }
    case m: MergeIntoTable =>
      targetPath(m.targetTable).map { path => translateMerge(m, path) }
    case _ => None
  }

  /** Resolve a DML target plan to a graft table path: an (optionally
    * aliased) relation named either `graft`.`<path>` or a
    * [[GraftTables]]-registered short name. */
  private def targetPath(p: LogicalPlan): Option[String] = p match {
    case r: UnresolvedRelation => GraftTables.pathOf(r.multipartIdentifier)
    case s: SubqueryAlias => targetPath(s.child)
    case _ => None
  }

  /** Unresolved parser expressions → Column, with alias qualifiers
    * stripped: the engine evaluates conditions against ONE frame (the
    * target's logical view for UPDATE/DELETE, the source batch for
    * MERGE cond), where the SQL alias does not exist. Column names in
    * a single-table DML statement are unambiguous without it. */
  private def toColumn(e: Expression): Column =
    GraftExpressionBridge.column(e.transform {
      case a: UnresolvedAttribute => UnresolvedAttribute(Seq(a.nameParts.last))
    })

  private def attrName(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => throw new UnsupportedOperationException(
      s"graft DML: expected a column reference, got ${other.sql}")
  }

  /** The MERGE ON clause must be the key-equality conjunction
    * `t.k1 = s.k1 AND ...` — returns the key names or None. */
  private def keyEqualities(e: Expression): Option[Seq[String]] = e match {
    case And(l, r) =>
      for { a <- keyEqualities(l); b <- keyEqualities(r) } yield a ++ b
    case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
        if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
      Some(Seq(a.nameParts.last))
    case _ => None
  }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE: $what. Supported forms: " +
      "[WHEN MATCHED AND cond THEN DELETE] WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *; WHEN MATCHED THEN DELETE alone; " +
      "either clause alone. Per-column SET inside MERGE and NOT MATCHED " +
      "BY SOURCE are not offered — use the UPDATE statement / the Scala API.")

  private def translateMerge(m: MergeIntoTable, path: String): LogicalPlan = {
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE is not supported")
    val onKeys = keyEqualities(m.mergeCondition).getOrElse(unsupported(
      s"ON clause must be the key-equality conjunction, got ${m.mergeCondition.sql}"))
    // matched actions, in source order (SQL first-match-wins):
    //   optional conditional DELETE, then at most one unconditional
    //   UPDATE SET * / DELETE
    val (mode, deleteCond) = (m.matchedActions.toList, m.notMatchedActions.toList) match {
      case (UpdateStarAction(None) :: Nil, InsertStarAction(None) :: Nil) =>
        ("upsert", None)
      case (DeleteAction(Some(c)) :: UpdateStarAction(None) :: Nil,
            InsertStarAction(None) :: Nil) =>
        ("cdc", Some(toColumn(c)))
      case (DeleteAction(None) :: Nil, Nil) => ("delete_matched", None)
      case (UpdateStarAction(None) :: Nil, Nil) => ("update_only", None)
      case (Nil, InsertStarAction(None) :: Nil) => ("insert_only", None)
      case _ => unsupported("unsupported WHEN-clause combination " +
        s"(matched: ${m.matchedActions.mkString(", ")}; " +
        s"not matched: ${m.notMatchedActions.mkString(", ")})")
    }
    if (m.withSchemaEvolution && mode != "upsert")
      unsupported("WITH SCHEMA EVOLUTION is only supported on the pure " +
        "UPDATE SET * / INSERT * form")
    GraftMergeCommand(path, m.sourceTable, onKeys, mode, deleteCond,
      m.withSchemaEvolution)
  }
}

/** `DELETE FROM <graft table> WHERE ...` — [[Scd1Merge.delete]] with
  * the manifest's own keys; returns `num_affected_rows` (the Delta
  * convention). */
case class GraftDeleteCommand(path: String, condition: Column)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val keys = GraftTables.keysOf(path)
    Seq(Row(Scd1Merge.delete(spark, path, keys, condition)))
  }
}

/** `UPDATE <graft table> SET ... [WHERE ...]` — [[Scd1Merge.update]];
  * returns `num_affected_rows`. */
case class GraftUpdateCommand(path: String, set: Seq[(String, Column)],
                              condition: Column)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val keys = GraftTables.keysOf(path)
    Seq(Row(Scd1Merge.update(spark, path, keys, condition, set.toMap)))
  }
}

/** `MERGE INTO <graft table> USING <source> ON <keys> WHEN ...` —
  * routed per [[GraftDml]]'s supported forms. The source plan is any
  * query Spark can run (table, view, subquery); it is projected onto
  * the target's columns (extra source columns — e.g. a CDC op tag
  * consumed by the MATCHED AND condition — are dropped, missing ones
  * are a loud analysis error from the projection). */
case class GraftMergeCommand(path: String, source: LogicalPlan,
                             onKeys: Seq[String], mode: String,
                             deleteCond: Option[Column],
                             evolveSchema: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val keys = GraftTables.keysOf(path)
    require(onKeys.map(_.toLowerCase).toSet == keys.map(_.toLowerCase).toSet,
      s"graft MERGE: ON clause keys (${onKeys.mkString(",")}) must be exactly " +
      s"the table's merge keys (${keys.mkString(",")})")
    val target = Scd1Merge.readTable(spark, path)
    val src = GraftExpressionBridge.ofRows(spark, source)
    // project the source onto the target schema BY NAME — `INSERT *` /
    // `UPDATE SET *` semantics; the delete condition (if any) is
    // evaluated on the full source row first, so it may reference
    // source-only columns (the CDC op tag)
    def aligned(df: DataFrame): DataFrame =
      df.select(target.columns.toIndexedSeq.map(col): _*)
    mode match {
      case "upsert" =>
        Scd1Merge.upsert(spark, path, aligned(src), keys,
          evolveSchema = evolveSchema)
      case "cdc" =>
        val opCol = "__graft_sql_op"
        val tagged = src.withColumn(opCol,
          when(coalesce(deleteCond.get, lit(false)), lit("delete"))
            .otherwise(lit("upsert")))
        Scd1Merge.applyCdc(spark, path,
          tagged.select((target.columns.toIndexedSeq.map(col) :+ col(opCol)): _*),
          keys, opCol = opCol)
      case "delete_matched" =>
        val opCol = "__graft_sql_op"
        Scd1Merge.applyCdc(spark, path,
          aligned(src).withColumn(opCol, lit("delete")), keys, opCol = opCol)
      case "update_only" =>
        Scd1Merge.upsert(spark, path,
          aligned(src).join(target.select(keys.map(col): _*), keys, "left_semi"),
          keys)
      case "insert_only" =>
        Scd1Merge.upsert(spark, path,
          aligned(src).join(target.select(keys.map(col): _*), keys, "left_anti"),
          keys)
    }
    Nil
  }
}

/** The live-session SQL entry point: parse with the session's parser,
  * apply the graft DML rewrite, execute. On an extension-built session
  * `spark.sql(...)` does the same thing through [[GraftSqlParser]];
  * this is for sessions that were built without the extension (the
  * Verify/Bench/driver contract). */
object GraftSql {
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    val parsed = GraftExpressionBridge.parsePlan(spark, sqlText)
    GraftExpressionBridge.ofRows(spark,
      GraftDml.rewrite(parsed).getOrElse(parsed))
  }
}
