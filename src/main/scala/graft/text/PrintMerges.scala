package graft.text

import org.apache.spark.sql.SparkSession

/** Regeneration utility for [[Bpe.PinnedMerges]]: prints the trained
  * merge list for a given sf dir as Scala source. Run after a testdata
  * regeneration if BpeSpec's pin check fails:
  * {{{ sbt "runMain graft.text.PrintMerges /root/testdata/sf0.01" }}} */
object PrintMerges {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val merges = Bpe.trainMerges(docs, "text")
    println(merges.grouped(4).map(_.map { case (l, r) => s"""("$l", "$r")""" }
      .mkString(", ")).mkString(",\n    "))
    spark.stop()
  }
}
