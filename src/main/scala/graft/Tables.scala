package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables plus shared column helpers.
  *
  * All money-typed doubles in the testdata carry exactly 2 decimals, so
  * aggregate math is done on exact integer cents (`sumMoney`) — a
  * floating-point `sum(double)` is partition-order dependent and would
  * not hash-match a single-threaded oracle.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Exact integer cents of a 2-decimal money double. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Order-independent exact sum of a 2-decimal money column, as double. */
  def sumMoney(c: Column): Column = sum(cents(c)) / 100.0

  /** Order-independent exact avg of a 2-decimal money column, as double. */
  def avgMoney(c: Column): Column = (sum(cents(c)) / 100.0) / count(lit(1))
}
