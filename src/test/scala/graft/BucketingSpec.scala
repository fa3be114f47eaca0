package graft

import org.apache.spark.sql.functions._

/** Bucketing: the §5 co-located-join lever, demonstrated. Writing both
  * fact tables bucketed on the join key lets the join read
  * pre-partitioned buckets — NO shuffle exchange in the plan. At 100 TB
  * this converts the one repeated orderkey shuffle (q3/q5/q18 all pay
  * it) into a one-time cost at ingest.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val wh = s"${sys.props("java.io.tmpdir")}/graft_bucketing_" +
      ProcessHandle.current().pid()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      val lineitem = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/b_orders").saveAsTable("b_orders")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // the JOIN itself must read co-located buckets: the only exchange
      // allowed is the one for the FINAL groupBy on o_custkey
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges <= 1, s"expected at most the aggregation exchange, plan:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // and the answer matches the unbucketed join
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
