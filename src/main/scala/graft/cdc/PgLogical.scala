package graft.cdc

import graft.ops.AsOf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** pglogical-specific wire framing: RELATION descriptor messages plus
  * positional data tuples.
  *
  * Reference: `internal/source/pglogical/conn.go:110` — `onRelation`
  * learns `relations[RelationID] → table` from RelationMessages (the
  * server re-sends a descriptor before any use of its id, including
  * after a schema change), `onDataTuple` (conn.go:377) resolves every
  * INSERT/UPDATE/DELETE tuple's RelationID against the most recently
  * learned descriptor, and an unknown relation id is a per-mutation
  * error, never a feed abort.
  *
  * Spark-first: the relations map is not mutable driver state —
  * "latest descriptor at or before this tuple's LSN, per relation id"
  * IS a temporal as-of join ([[graft.ops.AsOf]]): one shuffle on
  * rel_id and one ordered window pass, no matter how many times
  * descriptors are re-sent. Tuples are positional; zipping the
  * resolved descriptor's column names with the tuple values rebuilds
  * the named row as a map, exactly what the reference's TupleData →
  * column loop produces.
  */
object PgLogical {

  /** One frame per line. RELATION carries (rel_name, cols =
    * comma-joined column names); data ops carry tuple = JSON array of
    * the positional values. Explicit schema — never inference.
    */
  val frameSchema: StructType = StructType(Seq(
    StructField("lsn", LongType),
    StructField("op", StringType),
    StructField("rel_id", LongType),
    StructField("rel_name", StringType),
    StructField("cols", StringType),
    StructField("tuple", StringType)))

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(frameSchema).json(dir)

  /** Resolve each data tuple against the latest preceding RELATION
    * descriptor for its rel_id. Output: the data frames with
    * (rel_name, col_names, row_data = name→value map,
    * unknown_relation / malformed_tuple / arity_mismatch). A tuple
    * whose relation was never declared, whose payload is missing or
    * unparseable, or whose arity disagrees with the resolved
    * descriptor keeps a NULL row_data and flags instead of failing
    * the feed. The three flags are mutually exclusive: a
    * DELETE/keepalive frame carrying no tuple is `malformed_tuple`,
    * never mislabeled as an arity error (size(NULL) is NULL, so the
    * arity check alone cannot distinguish the two).
    *
    * `knownGiants`: a resolver looping over batches of one feed sees
    * the SAME rel_id keyspace every batch — compute
    * [[AsOf.giantKeys]] once (or carry it between batches) and pass
    * it here to skip the per-batch control read; plan choice only,
    * a stale profile can never change the resolved rows.
    */
  def resolve(frames: DataFrame,
      giantKeyThreshold: Long = AsOf.DefaultGiantKeyThreshold,
      knownGiants: Option[(Seq[Any], Boolean)] = None): DataFrame = {
    val rels = frames.filter(col("op") === "RELATION")
      .select(col("rel_id"), col("lsn").as("rel_lsn"),
        col("rel_name"), col("cols"))
    val rows = frames.filter(col("op").isin("INSERT", "UPDATE", "DELETE"))
      .select("lsn", "op", "rel_id", "tuple")
    // one busy table = one hot rel_id: the as-of auto-switch (or a
    // forced threshold) keeps descriptor resolution off a single task
    AsOf.asOfJoin(rows, rels, key = "rel_id",
        leftTime = "lsn", rightTime = "rel_lsn",
        rightTiebreak = col("rel_lsn"), valueCols = Seq("rel_name", "cols"),
        giantKeyThreshold = giantKeyThreshold, knownGiants = knownGiants)
      .withColumn("col_names", split(col("cols"), ","))
      .withColumn("__vals", from_json(col("tuple"), ArrayType(StringType)))
      .withColumn("unknown_relation", col("rel_name").isNull)
      .withColumn("malformed_tuple",
        !col("unknown_relation") && col("__vals").isNull)
      .withColumn("arity_mismatch",
        !col("unknown_relation") && !col("malformed_tuple") &&
          size(col("col_names")) =!= size(col("__vals")))
      .withColumn("row_data",
        when(!col("unknown_relation") && !col("malformed_tuple") && !col("arity_mismatch"),
          map_from_arrays(col("col_names"), col("__vals"))))
      .drop("__vals", "cols")
  }
}
