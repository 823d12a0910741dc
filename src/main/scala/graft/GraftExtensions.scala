package graft

import graft.functions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL surface for graft, registered through the standard
  * `SparkSessionExtensions` hook
  * (`spark.sql.extensions=graft.GraftExtensions`):
  *  - functions: `vec_dot`/`vec_cosine`/`vec_sum`/`approx_top_k`
  *    become first-class SQL functions, analyzable and codegen'd like
  *    any built-in;
  *  - parser: [[graft.sql.GraftSqlParser]] routes `MERGE INTO` /
  *    `UPDATE` / `DELETE` statements on graft tables onto the
  *    [[graft.merge.Scd1Merge]] engine (the SQL DML surface —
  *    `graft.sql.GraftDml` documents the supported forms). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProduct].getName, name),
        builder))
    }
    ext.injectParser((session, delegate) =>
      new graft.sql.GraftSqlParser(delegate, () => session))
    // DSv2 graft dims under the broadcast threshold auto-broadcast
    // (the V1ScanWrapper stats gap — see GraftAutoBroadcast)
    ext.injectPreCBORule(_ => graft.plans.GraftAutoBroadcast)
    // aggregates over a base table answer from its registered,
    // FRESH incremental MV (GraftMvRewrite Scaladoc has the gates)
    ext.injectOptimizerRule(_ => graft.plans.GraftMvRewrite)
    // vec_cosine ORDER BY ... LIMIT k over a REGISTERED corpus is
    // served from its persisted IVF-PQ index (GraftAnnRewrite)
    ext.injectOptimizerRule(_ => graft.plans.GraftAnnRewrite)
    // row_number()-top-k leaderboards over a registered base answer
    // from its maintained top-N MV (GraftTopNRewrite)
    ext.injectOptimizerRule(_ => graft.plans.GraftTopNRewrite)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args =>
      require(args.length == 2, "vec_dot takes exactly 2 arguments")
      DotProduct(args(0), args(1))
    },
    "vec_cosine" -> { args =>
      require(args.length == 2, "vec_cosine takes exactly 2 arguments")
      CosineSimilarity(args(0), args(1))
    },
    // aggregate: the analyzer wraps a bare AggregateFunction in its
    // AggregateExpression, same as the built-in sum/avg builders
    "vec_sum" -> { args =>
      require(args.length == 1, "vec_sum takes exactly 1 argument")
      graft.functions.VecSum(args(0))
    },
    "approx_top_k" -> { args =>
      require(args.length == 2, "approx_top_k takes exactly 2 arguments")
      val cap = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case e if e.foldable => e.eval().asInstanceOf[Number].intValue
        case _ => throw new IllegalArgumentException(
          "approx_top_k: capacity must be a literal integer")
      }
      graft.functions.ApproxTopK(args(0), cap)
    },
    // quantile row-sample sketch family (QuantileSketch Scaladoc)
    "qsk_agg" -> { args =>
      require(args.length == 2 || args.length == 3,
        "qsk_agg takes (hash, value[, k])")
      if (args.length == 2) graft.functions.QskAgg(args(0), args(1))
      else {
        val k = args(2) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue
          case _ => throw new IllegalArgumentException(
            "qsk_agg: k must be a literal integer")
        }
        graft.functions.QskAgg(args(0), args(1), k)
      }
    },
    "qsk_union_agg" -> { args =>
      require(args.length == 1, "qsk_union_agg takes exactly 1 argument")
      graft.functions.QskUnionAgg(args(0))
    },
    "qsk_merge" -> { args =>
      require(args.length == 2, "qsk_merge takes exactly 2 arguments")
      graft.functions.QskMerge(args(0), args(1))
    },
    "qsk_quantile" -> { args =>
      require(args.length == 2, "qsk_quantile takes exactly 2 arguments")
      graft.functions.QskQuantile(args(0),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.DoubleType))
    })

  /** Inject the same functions into an already-running session (the
    * extensions hook only fires at session build). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.GraftExpressionBridge.registerFunction(spark, name, b)
    }
}
