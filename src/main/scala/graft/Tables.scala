package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Schema'd loaders for the driver-generated star schema.
  *
  * Reading with an explicit path per table keeps the scan narrow: Spark's
  * parquet source prunes columns and pushes filters down automatically
  * once the plan is declarative (verify with `.explain("formatted")` —
  * look for `PushedFilters` / `ReadSchema`).
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/lineitem.parquet")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. With `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set in Verify/Bench sessions) it arrives as a long; convert via
    * integer division (`div`, not `/`: nanos ≈ 1.7e18 overflows double
    * precision) to microseconds, truncating exactly like DuckDB's
    * ns→us read, and keep it NTZ so written parquet matches the oracle.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    else raw
  }
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
}
