package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Object-store changefeed file source.
  *
  * Reference: `internal/source/objstore` reads buckets of CockroachDB
  * changefeed ndjson files; `internal/util/cdcjson/ndjson_parser.go`
  * parses one mutation per line with `after` / `key` / `updated` fields
  * (the changefeed wire format).
  *
  * Spark-first design: a directory of ndjson files IS a Spark data
  * source. We read with an explicit schema — never schema inference,
  * which would double-scan 100 TB — and project the envelope into the
  * engine's mutation shape (key / data / hlc time). In streaming mode the
  * same schema feeds `readStream.json` with `maxFilesPerTrigger`
  * bounding each micro-batch.
  */
object Changefeed {

  /** Changefeed envelope: `after` is the row image (null for deletes),
    * `key` the primary-key array, `updated` the HLC string `NNNN.LLL`.
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("after", StringType),
    StructField("key", StringType),
    StructField("updated", StringType)))

  /** Parse an `updated`-style HLC string `NNNN.LLLLLLLLLL` into the
    * engine's HLC struct (reference: `hlc.go:Parse`).
    */
  def parseHlc(colName: String) =
    struct(
      split(col(colName), "\\.").getItem(0).cast("long").as("nanos"),
      split(col(colName), "\\.").getItem(1).cast("int").as("logical"))

  /** Batch read of a changefeed directory → mutation DataFrame with
    * columns (key, data, hlc, is_delete).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(envelopeSchema).json(dir)
      .select(
        col("key"),
        col("after").as("data"),
        parseHlc("updated").as("hlc"),
        (col("after").isNull || col("after") === "null").as("is_delete"))

  /** Streaming read of the same layout; `maxFilesPerTrigger` keeps
    * micro-batches bounded on a large backlog.
    */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(envelopeSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
      .select(
        col("key"),
        col("after").as("data"),
        parseHlc("updated").as("hlc"),
        (col("after").isNull || col("after") === "null").as("is_delete"))
}
