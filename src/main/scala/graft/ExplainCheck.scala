package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of one
  * `SparkEntry.queries` entry (plan-audit loop — the per-operator
  * "is this the plan I'd want at 100 TB" check).
  *
  * Usage: `sbt "runMain graft.ExplainCheck <query_name> [sfDir]"`.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
