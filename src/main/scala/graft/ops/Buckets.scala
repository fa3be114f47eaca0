package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared hot-bucket bounding for LSH candidate joins. */
object Buckets {

  /** The cap's hash-smallest members of every bucket — the ANCHOR side
    * of a capped candidate join. Pairing bucket members against
    * anchors instead of the whole bucket bounds per-bucket candidates
    * at occupancy × cap (linear), while a bucket at or under the cap
    * keeps its full membership (the join degenerates to the uncapped
    * one). The order is a seeded hash of the id: deterministic across
    * runs and partitionings, uncorrelated with id assignment. The
    * window sorts only within one bucket — n log n in occupancy,
    * strictly cheaper than the n² join it caps.
    */
  def anchors(banded: DataFrame, bucketCols: Seq[String], idCol: String,
      cap: Int): DataFrame = {
    val w = Window.partitionBy(bucketCols.map(col): _*)
      .orderBy(xxhash64(col(idCol), lit(7)), col(idCol))
    banded.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= cap)
      .drop("__r")
  }

  /** Exact `ntile(n)` over the total order (orderCol, tieCol) WITHOUT a
    * global sort — the 100 TB drop-in for curriculum bucketing.
    *
    * The corpus is never globally ordered. One bounded shuffle builds
    * the orderCol histogram (distinct-value-sized — a control frame);
    * cumulative offsets + the total run in a single-partition window
    * over THAT frame only. Each histogram row then knows the global
    * rank range [off+1, off+cnt] of its tie group, hence the bucket of
    * its first and last member; the frame broadcast-joins back to the
    * corpus. Rows whose group lies inside one bucket (everything except
    * at most n-1 boundary groups) get their bucket from the broadcast
    * alone — a per-row CASE, zero extra shuffle. Only the boundary
    * groups rank within the group by tieCol (a window partitioned by
    * orderCol — sorts those groups alone, never the corpus) so ties
    * split across the boundary EXACTLY as ntile's (orderCol, tieCol)
    * order does. Worst case is a boundary landing inside one massive
    * tie group: still one group's sort, parallel across the n-1
    * boundaries, vs ntile's sort of everything.
    *
    * `partCols` generalizes to PARTITIONED ntile — `ntile(n) OVER
    * (PARTITION BY partCols ORDER BY orderCol, tieCol)` — with the
    * same machinery per partition: the histogram window partitions by
    * partCols (its "single-partition" cost becomes per-group,
    * distinct-value-sized), and the broadcast/boundary logic keys on
    * partCols + orderCol. This is the giant-source fallback for
    * per-source terciles (text_lm_buckets): one dominant source stops
    * being one task's sort and becomes its histogram + at most n-1
    * boundary-group sorts.
    *
    * Rank arithmetic uses floor() on doubles — exact below 2^53 rows.
    * Both this and [[ntileByRange]] equi-join back on the order/group
    * keys: rows with NULL in orderCol or partCols would silently drop
    * (NULL never equi-matches). The contract is ENFORCED, not just
    * documented: [[requireKeys]] raises on the first null key row, so
    * misuse is loud instead of silently lossy.
    */
  def ntileByHistogram(df0: DataFrame, orderCol: String, tieCol: String,
      n: Int, partCols: Seq[String] = Nil): DataFrame = {
    val df = requireKeys(df0, orderCol +: partCols, "ntileByHistogram")
    val histW = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
    val hist = df.groupBy((partCols :+ orderCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(histW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(
        histW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))

    def bucketOf(rank: Column): Column = ntileBucket(rank, col("__n"), n)

    val marked = hist
      .withColumn("__blo", bucketOf(col("__off") + 1))
      .withColumn("__bhi", bucketOf(col("__off") + col("__cnt")))
      .drop("__cnt")
    val joined = df.join(broadcast(marked), partCols :+ orderCol)
    val easy = joined.filter(col("__blo") === col("__bhi"))
      .withColumn("bucket", col("__blo"))
    val tieW = Window.partitionBy((partCols :+ orderCol).map(col): _*)
      .orderBy(col(tieCol))
    val hard = joined.filter(col("__blo") =!= col("__bhi"))
      .withColumn("bucket", bucketOf(col("__off") + row_number().over(tieW)))
    easy.unionByName(hard).drop("__off", "__n", "__blo", "__bhi")
  }

  /** ntile semantics: N rows over n buckets = (N mod n) buckets of
    * floor(N/n)+1 rows, then buckets of floor(N/n) rows. floor() on
    * doubles — exact below 2^53 rows.
    */
  private def ntileBucket(rank: Column, total: Column, n: Int): Column = {
    val size = floor(total / n).cast("long")
    val rem = total % n
    val cut = rem * (size + 1)
    when(rank <= cut, floor((rank - 1) / (size + 1)).cast("long") + 1)
      .otherwise((rem + floor((rank - cut - 1) / greatest(size, lit(1L)))
        .cast("long") + 1).cast("long"))
  }

  /** Exact `ntile(n) OVER (PARTITION BY partCols ORDER BY orderCol,
    * tieCol)` via DISTRIBUTED RANK — the giant-group fallback for
    * CONTINUOUS order columns, where [[ntileByHistogram]]'s
    * distinct-value histogram degenerates to corpus size (measured:
    * on a 475k-doc dominant source with near-distinct double scores
    * the histogram path was slower than the window it replaces, 28 s
    * vs 16 s at 100×, and its broadcast+single-partition window owned
    * the max task — ScaleSmoke round 11).
    *
    * One range repartition on (partCols, orderCol, tieCol) splits
    * every group across tasks with sampling-balanced boundaries — a
    * dominant group stops being one task's sort; the biggest sort
    * anywhere is one range partition (~N/parts rows), whatever the
    * group skew. The range invariant (pid order = sort order) makes
    * each row's group-global rank = its within-(pid, group) local
    * rank + the count of same-group rows in earlier pids; those
    * counts are a (parts + groups)-sized control frame, cumulated in
    * a per-group window over THAT frame only and broadcast back. No
    * corpus-sized broadcast, no single-task sort, same exact ntile
    * arithmetic as [[ntileByHistogram]].
    */
  def ntileByRange(df: DataFrame, orderCol: String, tieCol: String,
      n: Int, partCols: Seq[String] = Nil): DataFrame = {
    val ranged = rangedWithPid(df, orderCol, tieCol, partCols, "ntileByRange")
    val groupPid = col("__pid") +: partCols.map(col)
    // rank within (partition, group): each task ranks only its slice
    val localW = Window.partitionBy(groupPid: _*)
      .orderBy(col(orderCol), col(tieCol))
    val local = ranged.withColumn("__lr", row_number().over(localW))
    val offW = Window.partitionBy(partCols.map(col): _*).orderBy(col("__pid"))
    val ctl = ranged.groupBy(groupPid: _*).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(offW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(
        offW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .drop("__cnt")
    local.join(broadcast(ctl), "__pid" +: partCols)
      .withColumn("bucket",
        ntileBucket(col("__off") + col("__lr"), col("__n"), n))
      .drop("__pid", "__lr", "__off", "__n")
  }

  /** Exact `SUM(valueCol) OVER (PARTITION BY partCols ORDER BY
    * orderCol, tieCol ROWS UNBOUNDED PRECEDING)` — INCLUSIVE of the
    * current row — via the same distributed-rank machinery as
    * [[ntileByRange]]: a running sum IS a rank where each row weighs
    * `valueCol` instead of 1. One range repartition bounds every
    * per-task sort at ~N/parts rows regardless of group skew; each
    * row's global prefix = its local per-(pid, group) prefix + the
    * per-group sum of earlier pids, read off a (parts + groups)-sized
    * broadcast control frame. This is the giant-source fallback for
    * unbounded-preceding per-source windows (sequence packing's token
    * prefix, interleave order's per-source position): at 100 TB
    * "common-crawl" stops being ONE task's sort+scan. Callers wanting
    * the EXCLUSIVE prefix subtract the row's own value. The summed
    * column must be non-null (a null would poison its suffix under the
    * window too); order/partition nulls raise via [[requireKeys]].
    *
    * EXACTNESS CONTRACT: bit-identical to the window for INTEGRAL
    * value columns (every in-repo caller: token counts, unit weights
    * — integer addition is associative). A float/double valueCol sums
    * in a different order than the window (local prefix + carry vs
    * strict row order), so drop-in bit-equality does not hold there;
    * sum in fixed-point integers first (the repo-wide convention for
    * cross-engine arithmetic) if you need it.
    */
  def runningSumByRange(df: DataFrame, valueCol: String, orderCol: String,
      tieCol: String, partCols: Seq[String] = Nil,
      out: String = "running_sum"): DataFrame = {
    val ranged = rangedWithPid(df, orderCol, tieCol, partCols, "runningSumByRange")
    val groupPid = col("__pid") +: partCols.map(col)
    val localW = Window.partitionBy(groupPid: _*)
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = ranged.withColumn("__ls", sum(col(valueCol)).over(localW))
    val offW = Window.partitionBy(partCols.map(col): _*).orderBy(col("__pid"))
    val ctl = ranged.groupBy(groupPid: _*).agg(sum(col(valueCol)).as("__s"))
      .withColumn("__off", coalesce(
        sum(col("__s")).over(offW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__s")
    local.join(broadcast(ctl), "__pid" +: partCols)
      .withColumn(out, col("__off") + col("__ls"))
      .drop("__pid", "__ls", "__off")
  }

  /** `LAST_VALUE(valueCol) IGNORE NULLS OVER (PARTITION BY partCols
    * ORDER BY orderCol, tieCol ROWS UNBOUNDED PRECEDING)` — the
    * carry-forward — via the same distributed-rank machinery as
    * [[runningSumByRange]]: a carry IS a running "sum" where + is
    * "rightmost non-null", which is associative, so the same
    * local-prefix-plus-broadcast-carry decomposition is EXACT (and,
    * being pure selection with no arithmetic, bit-identical to the
    * window for any value type). One range repartition bounds every
    * per-task sort at ~N/parts rows regardless of key skew; each
    * row's carry = its local per-(pid, group) carry, falling back to
    * the latest non-null final carry of earlier pids — a
    * (parts + groups)-row broadcast control frame cumulated with one
    * per-group window over THAT frame only. This is the giant-key
    * fallback for as-of joins ([[AsOf.asOfJoin]]) and descriptor
    * resolution ([[graft.cdc.PgLogical]]): at 100 TB one dominant
    * entity key (or one busy table's rel_id) stops being ONE task's
    * sort+scan of that key's whole history.
    *
    * `valueCol` MAY be null (nulls are what the carry skips);
    * order/partition nulls raise via [[requireKeys]]. (orderCol,
    * tieCol) must totally order rows within each group — the same
    * determinism contract as the window it replaces.
    */
  def lastValueByRange(df: DataFrame, valueCol: String, orderCol: String,
      tieCol: String, partCols: Seq[String] = Nil,
      out: String = "last_value"): DataFrame = {
    val ranged = rangedWithPid(df, orderCol, tieCol, partCols, "lastValueByRange")
    val groupPid = col("__pid") +: partCols.map(col)
    val localW = Window.partitionBy(groupPid: _*)
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = ranged.withColumn("__lc",
      last(col(valueCol), ignoreNulls = true).over(localW))
    // each (pid, group)'s FINAL carry = the local carry of its last
    // row in (orderCol, tieCol) order — max_by reads it off without
    // another window pass
    val ctl = local.groupBy(groupPid: _*)
      .agg(max_by(col("__lc"), struct(col(orderCol), col(tieCol))).as("__pl"))
    val carryW = Window.partitionBy(partCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = ctl
      .withColumn("__carry", last(col("__pl"), ignoreNulls = true).over(carryW))
      .drop("__pl")
    local.join(broadcast(boundary), "__pid" +: partCols)
      .withColumn(out, coalesce(col("__lc"), col("__carry")))
      .drop("__pid", "__lc", "__carry")
  }

  /** The giant-group plan choice as ONE bounded control read (the
    * lmBuckets precedent generalized to ANY key type): per-group
    * counts aggregate server-side, the giants filter runs INSIDE the
    * aggregate, and the total group count rides the same single output
    * row — the driver holds O(giants), never O(distinct groups). NULL
    * group values are never giants (collect_list skips them) and COUNT
    * toward the all-giant test's total, so a frame containing null-key
    * rows never reports all-giant — callers' mixed path keeps routing
    * those rows to its window/no-match leg (spec-pinned in
    * PackRangeSpec). Returns (giant group values, all-groups-giant?).
    */
  private[graft] def giantGroups(d: DataFrame, groupCol: String,
      giantThreshold: Long): (Seq[Any], Boolean) = {
    val row = d.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("__total"),
        collect_list(when(col("__n") >= giantThreshold, col(groupCol)))
          .as("__giants"))
      .collect()(0)
    val total = row.getAs[Long]("__total")
    val giants = row.getAs[scala.collection.Seq[Any]]("__giants").toSeq
    (giants, total > 0 && giants.size == total)
  }

  /** EXACT discrete quantiles — per group, or global with empty
    * `partCols` — WITHOUT a per-group (or global) sort: the quantile
    * value at q is the row at rank ⌈q·n⌉ of `ORDER BY valueCol,
    * tieCol`, and the distributed rank is the same machinery as
    * [[ntileByRange]]. One range repartition bounds every local sort
    * at ~N/parts rows whatever the group skew (a global exact median
    * at 100 TB never becomes one task's sort); each row's global rank
    * is its local per-(pid, group) rank plus the broadcast control
    * frame's earlier-pid count. The TARGET ranks — ⌈q·n⌉ for each
    * requested q, one row per (group, q) — derive from the same
    * control frame (per-group n is already there) and broadcast back
    * as a hash-set probe: only the ≤ groups×|qs| matching rows
    * survive, zero extra shuffle.
    *
    * Output: partCols ++ (q DOUBLE, value) — `value` keeps valueCol's
    * type. Rank selection means EXACT discrete quantiles (the value at
    * the boundary row, `percentile_disc` semantics), not interpolated:
    * discrete is what cross-engine bit-equality can promise for any
    * input type, and an oracle re-derives it with one window.
    * Duplicate target ranks (tiny groups where ⌈q₁·n⌉ = ⌈q₂·n⌉) each
    * emit their own q row. Nulls in value/partition keys raise via
    * [[requireKeys]]; q must sit in (0, 1].
    */
  def quantilesByRange(df: DataFrame, valueCol: String, tieCol: String,
      qs: Seq[Double], partCols: Seq[String] = Nil): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must sit in (0, 1]")
    val ranged = rangedWithPid(df, valueCol, tieCol, partCols, "quantilesByRange")
    val groupPid = col("__pid") +: partCols.map(col)
    val localW = Window.partitionBy(groupPid: _*)
      .orderBy(col(valueCol), col(tieCol))
    val local = ranged.withColumn("__lr", row_number().over(localW))
    val offW = Window.partitionBy(partCols.map(col): _*).orderBy(col("__pid"))
    val ctl = ranged.groupBy(groupPid: _*).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(offW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(
        offW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .drop("__cnt")
    val targets = ctl.select(partCols.map(col) :+ col("__n"): _*).distinct()
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("__rank",
        ceil(col("q") * col("__n").cast("double")).cast("long"))
      .drop("__n")
    local.join(broadcast(ctl.drop("__n")), "__pid" +: partCols)
      .withColumn("__rank", col("__off") + col("__lr"))
      .join(broadcast(targets), partCols :+ "__rank")
      .select(partCols.map(col) :+ col("q") :+ col(valueCol).as("value"): _*)
  }

  /** The shared range leg: null-checked keys, one range repartition,
    * pid stamped, then MATERIALIZED ([[Materialize.barrier]]) before
    * any consumer derives from it. The barrier is load-bearing for
    * correctness, not just cost: the local leg and the control leg
    * both read this frame, and without a barrier each re-evaluates the
    * repartitionByRange independently — column pruning makes the two
    * exchanges canonically different (no exchange reuse) and
    * RangePartitioner's reservoir sample is seeded by the RDD id, so
    * under PARTIAL sampling (exactly the giant-source scale this
    * fallback exists for) the legs can disagree on partition
    * boundaries and `__pid`, double-counting ranks near boundaries.
    * Materializing once pins a single physical partitioning that both
    * legs share (the lmBucketsOn/semanticDedup precedent); the seam
    * picks a cluster-safe materializer off local masters.
    */
  private def rangedWithPid(df0: DataFrame, orderCol: String, tieCol: String,
      partCols: Seq[String], op: String): DataFrame =
    Materialize.barrier(rangedPlan(df0, orderCol, tieCol, partCols, op))

  /** The un-materialized ranged leg — exposed (package-private) so
    * PlanInvariantSpec can pin the RangePartitioning exchange that the
    * checkpoint job executes; the final query plan only shows the
    * checkpoint's ExistingRDD scan.
    */
  private[graft] def rangedPlan(df0: DataFrame, orderCol: String,
      tieCol: String, partCols: Seq[String],
      op: String = "ntileByRange"): DataFrame = {
    val df = requireKeys(df0, orderCol +: partCols, op)
    // SCALE-ADAPTIVE width (r16): an explicit numPartitions disables
    // AQE coalescing, and the `__pid` math makes the count part of the
    // physical contract — so pinning the session constant
    // (shuffle.partitions) gave every ranged operator a 32-wide
    // near-empty exchange at bench scale, and every stage downstream
    // of the pin inherited 32 near-empty tasks (the r16 stage audit's
    // corpus_training_manifest signature). Size the width from the
    // plan's own estimate against the session's advisory partition
    // bytes — exactly what AQE would do — capped at shuffle.partitions
    // (the configured intent at cluster scale; unknown/huge estimates
    // saturate the cap, i.e. the old behavior). Any width is correct:
    // ranks derive from per-pid offsets, not from the count.
    val conf = df.sparkSession.sessionState.conf
    val maxParts = conf.numShufflePartitions
    val advisory = math.max(1L, conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val est = df0.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = ((est / advisory) + 1).min(BigInt(maxParts)).max(BigInt(1)).toInt
    val sortCols = partCols.map(col) ++ Seq(col(orderCol), col(tieCol))
    df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
  }

  /** Loud null-key contract: every bucket/prefix operator here joins
    * its control frame back on the order/group keys, where a NULL key
    * would silently drop the row (NULL never equi-matches). Rewrite
    * each key through a per-row check that raises on the first null —
    * codegen'd, branch-predicted, free on the non-null path.
    */
  private def requireKeys(df: DataFrame, keyCols: Seq[String],
      op: String): DataFrame =
    keyCols.distinct.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).isNotNull, col(c)).otherwise(raise_error(
        lit(s"graft.Buckets.$op: NULL in key column '$c' — null order/" +
          "partition keys are not supported (they would silently drop rows)"))))
    }
}
