package graft.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** The `injectParser` hook: delegate EVERYTHING to Spark's parser,
  * then swap graft-table DML plans for runnable graft commands
  * ([[GraftDml.rewrite]]). Sessions built with
  * `spark.sql.extensions=graft.GraftExtensions` get `MERGE INTO` /
  * `UPDATE` / `DELETE` on graft tables through plain `spark.sql`.
  *
  * No grammar of our own: Spark's SqlBase grammar already parses all
  * three statements (quoting, comments, subqueries, CTE sources all
  * come for free) — intercepting the PLAN instead of the text is what
  * keeps this parser 30 lines and un-driftable from Spark's SQL
  * dialect. */
class GraftSqlParser(delegate: ParserInterface,
                     session: () => org.apache.spark.sql.SparkSession)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftDml.maintenanceStatement(sqlText).getOrElse {
      val plan = delegate.parsePlan(sqlText)
      GraftDml.rewrite(session(), plan).getOrElse(plan)
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
