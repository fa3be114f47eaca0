package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka changefeed envelope source.
  *
  * Reference: `internal/source/kafka/payload.go:29` (`asPayload`) — a
  * consumer message's value is a JSON envelope carrying either a
  * mutation (`after` / `before` / `updated`) or a `resolved` timestamp;
  * `consumer.go:accumulate` classifies the two, builds mutations (key
  * from the message key, time parsed from `updated` via `hlc.Parse`)
  * and, on a resolved message, advances that partition's frontier and
  * flushes the accumulated batch.
  *
  * Spark-first: the wire log is a DataFrame of (topic, partition,
  * offset, key, value) rows — the exact projection Spark's Kafka
  * connector (or an archived topic dump) exposes. Classification and
  * envelope extraction are pure column expressions (no consumer loop),
  * the per-partition frontier is one aggregation, and "applied up to
  * the frontier" is a join — so the same semantics run identically over
  * a 100 TB topic archive or a `readStream` feed.
  */
object Kafka {

  /** The consumer-message projection: partition/offset metadata plus the
    * opaque key and value strings. Explicit schema — never inference.
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", LongType),
    StructField("offset", LongType),
    StructField("key", StringType),
    StructField("value", StringType)))

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(wireSchema).json(dir)

  /** Mutation messages → (topic, partition, offset, key, data, hlc,
    * is_delete). A message whose envelope has `resolved` is not a
    * mutation; `after` null/absent is a delete (tombstone), matching
    * the reference's payload contract.
    */
  def mutations(raw: DataFrame): DataFrame =
    raw.filter(get_json_object(col("value"), "$.resolved").isNull)
      .withColumn("__updated", get_json_object(col("value"), "$.updated"))
      .select(col("topic"), col("partition"), col("offset"), col("key"),
        get_json_object(col("value"), "$.before").as("before"),
        get_json_object(col("value"), "$.after").as("data"),
        Changefeed.parseHlc("__updated").as("hlc"))
      .withColumn("is_delete", col("data").isNull || col("data") === "null")

  /** Streaming read of the same wire layout — the natural mode for a
    * live topic (the batch path covers archives/backfills). All the
    * projections below are stateless column expressions, so they apply
    * to a streaming frame unchanged: batch and stream parses can never
    * diverge. `maxFilesPerTrigger` bounds micro-batches on a backlog.
    */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream.schema(wireSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Adapt parsed mutations to the stateful-apply shape
    * ([[graft.streaming.StreamApply.KeyedMutText]]).
    *
    * - key: the WHOLE key text, verbatim. The key's identity is the
    *   text itself — the reference only hashes a key to pick a lockset
    *   SHARD, never to identify it, and a 64-bit hash collision must
    *   not merge two primary keys' mutation histories. Spark's shuffle
    *   already hash-partitions the string key for sharding, so no
    *   explicit hash column is needed at all.
    * - version: HLC (nanos, logical) — the logical counter is the
    *   tiebreak, so equal-nanos mutations resolve exactly as
    *   `hlc.Compare` would (a Kafka offset is per-partition and
    *   carries no cross-partition order).
    * - rows whose key or HLC failed to parse, or upserts whose value
    *   payload is malformed, are EXCLUDED here — they belong to the
    *   DLQ path, not the apply path (the reference errors the
    *   mutation, not the feed).
    */
  def toKeyedMuts(muts: DataFrame): DataFrame =
    muts.select(
      col("key").as("key"),
      col("key").isNotNull.as("__key_ok"),
      col("hlc.nanos").as("versionNanos"),
      col("hlc.logical").cast("long").as("tiebreak"),
      when(col("is_delete"), "delete").otherwise("upsert").as("op"),
      col("is_delete"),
      expr("try_cast(get_json_object(data, '$.value') as double)").as("__v"),
      concat_ws("|", col("key"), coalesce(col("data"), lit(""))).as("payload"))
      .filter(col("__key_ok") && col("versionNanos").isNotNull &&
        (col("is_delete") || col("__v").isNotNull))
      .select(col("key"), col("versionNanos"), col("tiebreak"), col("op"),
        coalesce(col("__v"), lit(0.0)).as("value"), col("payload"))

  /** Resolved messages → (topic, partition, offset, hlc). */
  def resolved(raw: DataFrame): DataFrame =
    raw.withColumn("__resolved", get_json_object(col("value"), "$.resolved"))
      .filter(col("__resolved").isNotNull)
      .select(col("topic"), col("partition"), col("offset"),
        Changefeed.parseHlc("__resolved").as("hlc"))
}
