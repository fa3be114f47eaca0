package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics over the TPC-H-ish star schema + the events stream.
  *
  * Determinism rules (shared with every oracle pair in this repo):
  *  - monetary aggregates go through DECIMAL(28,6) (exact, associative,
  *    partial-aggregable) and are cast back to double at the end;
  *  - divisions happen in double on both engines, in the same order;
  *  - every result carries a total ORDER BY on a unique key.
  */
object Analytics {

  private val dec = "decimal(28,6)"
  private def cents(value: Column): Column = round(value * 100).cast("long")

  /** TPC-H Q1-shaped pricing summary: single scan, hash agg with
    * map-side partial aggregation; the shipdate filter is pushed to the
    * parquet scan.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val discPrice = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec)
    val charge = (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      (lit(1.0) + col("l_tax"))).cast(dec)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(dec)).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-shaped shipping priority. Broadcast ONLY the filtered
    * customer dim (bounded); orders⋈lineitem is a shuffle join on
    * orderkey — the date-filtered orders side is still fact-sized at
    * 100×, so broadcasting it would OOM the driver. AQE may still
    * convert to broadcast at runtime when the filtered side turns out
    * small; top-k via TakeOrdered on the (small) aggregate.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp_ntz")
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped local-supplier revenue: all dims broadcast; the
    * orders→lineitem join shuffles on orderkey once, then one agg.
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_nationkey")
    Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Top users by purchase volume: pre-aggregate per user (shuffle
    * once), take the top 25 via orderBy+limit — a distributed
    * TakeOrdered, every partition contributes its local top 25 — then
    * rank only those ≤25 rows. A global rank() window over the raw
    * per-user aggregate would sort hundreds of millions of rows in a
    * single task at 100×. The ordering key includes the unique user_id,
    * so rank() has no ties and limit(25) is exactly the rnk<=25 set.
    */
  def topUsersWindow(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"), sum(cents(col("value"))).as("purchase_cents"))
    val top = per.orderBy(col("purchase_cents").desc, col("user_id")).limit(25)
    // unpartitioned window is safe HERE: it runs over the limit(25)
    // output — 25 rows in one partition regardless of corpus size; the
    // distributed work (groupBy + top-k) already happened above
    val w = Window.orderBy(col("purchase_cents").desc, col("user_id"))
    top.withColumn("rnk", rank().over(w).cast("long"))
      .orderBy("rnk", "user_id")
  }

  val topUsersSql: String =
    """WITH per AS (
      |  SELECT user_id, COUNT(*) AS n_purchases,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS purchase_cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
      |SELECT user_id, n_purchases, purchase_cents, rnk
      |FROM (SELECT *, RANK() OVER (ORDER BY purchase_cents DESC, user_id) AS rnk FROM per)
      |WHERE rnk <= 25
      |ORDER BY rnk, user_id""".stripMargin

  /** Gap-based sessionization (30-min inactivity): lag + running sum,
    * both windows partitioned by user (one shuffle on user_id).
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prevUs = lag(unix_micros(col("ts").cast("timestamp")), 1).over(wOrd)
    val isNew = when(prevUs.isNull || unix_micros(col("ts").cast("timestamp")) - prevUs > 1800000000L, 1)
      .otherwise(0)
    Tables.events(s, dir)
      .withColumn("is_new", isNew)
      .withColumn("session_id",
        sum(col("is_new")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS session_id FROM x)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM y GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Signup→purchase funnel: two keyed aggregates + one join; the
    * conditional "first purchase after signup" stays set-based.
    */
  def eventFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(signups, "user_id")
      .filter(col("ts") >= col("signup_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("first_purchase_ts"))
    signups.join(purchases, "user_id")
      .select("user_id", "signup_ts", "first_purchase_ts")
      .orderBy("user_id")
  }

  val eventFunnelSql: String =
    """WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
      |  FROM events e JOIN s USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      |  GROUP BY e.user_id)
      |SELECT s.user_id, s.signup_ts, p.first_purchase_ts
      |FROM s JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** TPC-H Q6-shaped revenue forecast: a pure filter+agg whose entire
    * predicate set pushes to the parquet scan — the canonical test that
    * scan pruning works (at 100 TB this reads a fraction of the table).
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice") * col("l_discount")).cast(dec))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q4-shaped order-priority check: EXISTS over lineitem as a
    * left-semi join (no row multiplication, the build side streams).
    */
  def q4PriorityCheck(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp_ntz"))
    val lateLines = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey")
    o.join(lateLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Rolling 7-bucket purchase metrics: daily aggregate then a ROWS
    * window — the aggregate is tiny, so the global sort is free; the
    * heavy lifting stays in the first (distributed) aggregation.
    */
  def rolling7d(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("cents"))
    // unpartitioned window is safe HERE: the frame is one row per
    // DISTINCT DAY (post-aggregate), thousands of rows at any corpus
    // size — the per-row work was distributed in the daily groupBy
    val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("n_7d", sum(col("n")).over(w))
      .withColumn("cents_7d", sum(col("cents")).over(w))
      .orderBy("day")
  }

  val rolling7dSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS day, COUNT(*) AS n,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT day, n, cents,
      |  CAST(SUM(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d,
      |  CAST(SUM(cents) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_7d
      |FROM daily ORDER BY day""".stripMargin

  /** Cohort retention — the activity-over-time matrix every analytics
    * deployment ships: cohort = DAY of a user's first event, cell =
    * how many of that cohort were active in week k after it (daily
    * cohorts × weekly offsets, the granularity matching this stream's
    * one-month span; the month×month variant is the same plan with a
    * coarser index). Time is carried as the INTEGER epoch-day from
    * `datediff` — no timestamp arithmetic whose truncation could
    * diverge between engines — and retention is one double division
    * at the edge. Shape: distinct (user, week-bucket) collapses the
    * event volume first (map-side combine), the cohort derivation
    * re-groups the SAME user-keyed shuffle, and the per-cohort sizes
    * broadcast back — the event table is read once and shuffles once
    * on user_id.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val days = Tables.events(s, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), epoch).cast("long").as("d"))
    val cohorts = days.groupBy("user_id").agg(min("d").as("cohort_day"))
    val weeks = days.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_day"),
        expr("(d - cohort_day) div 7").as("week_offset"))
      .distinct()
    val sizes = cohorts.groupBy("cohort_day").agg(count(lit(1)).as("cohort_size"))
    val active = weeks.groupBy("cohort_day", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    active.join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
      .select("cohort_day", "week_offset", "n_active", "cohort_size", "retention")
      .orderBy("cohort_day", "week_offset")
  }

  val cohortRetentionSql: String =
    """WITH dd AS (
      |  SELECT user_id,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
      |  FROM events),
      |co AS (SELECT user_id, MIN(d) AS cohort_day FROM dd GROUP BY 1),
      |wk AS (
      |  SELECT DISTINCT dd.user_id, co.cohort_day,
      |    (dd.d - co.cohort_day) // 7 AS week_offset
      |  FROM dd JOIN co USING (user_id)),
      |sz AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM co GROUP BY 1),
      |ac AS (
      |  SELECT cohort_day, week_offset, COUNT(*) AS n_active
      |  FROM wk GROUP BY 1, 2)
      |SELECT ac.cohort_day, ac.week_offset, ac.n_active, sz.cohort_size,
      |  CAST(ac.n_active AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE) AS retention
      |FROM ac JOIN sz USING (cohort_day)
      |ORDER BY cohort_day, week_offset""".stripMargin

  /** Strict-order windowed funnel — the production funnel shape
    * (`q_event_funnel` is the unordered conditional-min variant):
    * signup → first click STRICTLY AFTER it → first purchase strictly
    * after THAT click, all within 7 days of signup, rolled up per
    * signup-day cohort with stepwise conversion rates. Three
    * conditional-min aggregations all keyed on user_id — the event
    * table's one shuffle key — so the step joins co-partition with no
    * extra exchange; the event-type predicates push to the scans.
    * Interval arithmetic (`ts + INTERVAL 7 DAY`) and the epoch-day
    * cohort index are engine-portable exact.
    */
  def funnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
    val su = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t_signup"))
    val cl = ev.filter(col("event_type") === "click")
      .join(su, "user_id")
      .filter(col("ts") > col("t_signup") &&
        col("ts") <= col("t_signup") + expr("INTERVAL 7 DAY"))
      .groupBy("user_id")
      .agg(min("ts").as("t_click"), min("t_signup").as("t_signup"))
    val pu = ev.filter(col("event_type") === "purchase")
      .join(cl, "user_id")
      .filter(col("ts") > col("t_click") &&
        col("ts") <= col("t_signup") + expr("INTERVAL 7 DAY"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    val epoch = to_date(lit("1970-01-01"))
    su.join(cl.select(col("user_id"), lit(true).as("__c")), Seq("user_id"), "left")
      .join(pu.select(col("user_id"), lit(true).as("__p")), Seq("user_id"), "left")
      .groupBy(datediff(to_date(col("t_signup")), epoch).cast("long")
        .as("signup_day"))
      .agg(count(lit(1)).as("n_signup"),
        sum(when(col("__c"), 1L).otherwise(0L)).as("n_clicked"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("n_purchased"))
      .withColumn("click_rate",
        col("n_clicked").cast("double") / col("n_signup").cast("double"))
      .withColumn("purchase_rate",
        col("n_purchased").cast("double") / col("n_signup").cast("double"))
      .orderBy("signup_day")
  }

  val funnelWindowedSql: String =
    """WITH su AS (
      |  SELECT user_id, MIN(ts) AS t_signup FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |cl AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_click, MIN(su.t_signup) AS t_signup
      |  FROM events e JOIN su USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > su.t_signup
      |    AND e.ts <= su.t_signup + INTERVAL 7 DAY
      |  GROUP BY e.user_id),
      |pu AS (
      |  SELECT c.user_id, MIN(e.ts) AS t_purchase
      |  FROM events e JOIN cl c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |    AND e.ts <= c.t_signup + INTERVAL 7 DAY
      |  GROUP BY c.user_id)
      |SELECT
      |  CAST(datediff('day', DATE '1970-01-01', CAST(su.t_signup AS DATE)) AS BIGINT)
      |    AS signup_day,
      |  COUNT(*) AS n_signup,
      |  CAST(COUNT(cl.user_id) AS BIGINT) AS n_clicked,
      |  CAST(COUNT(pu.user_id) AS BIGINT) AS n_purchased,
      |  CAST(COUNT(cl.user_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS click_rate,
      |  CAST(COUNT(pu.user_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS purchase_rate
      |FROM su
      |LEFT JOIN cl ON cl.user_id = su.user_id
      |LEFT JOIN pu ON pu.user_id = su.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Daily purchase-count anomaly gate — the ops-monitoring query
    * every event pipeline runs (alert when a day deviates > 3σ from
    * the period mean). The whole 3σ test is INTEGER-EXACT cross-
    * multiplication, so both engines agree bit-for-bit with no float
    * mean/variance: with `dev_i = cnt_i·n − total`, the condition
    * `(cnt_i−μ)² > 9σ²` is exactly `dev_i²·n > 9·Σ dev_j²` (multiply
    * through by n³). The z column is one double chain for
    * readability; the VERDICT never touches a float. One day-grain
    * aggregation plus two 1-row control broadcasts (mean inputs, then
    * the variance numerator).
    */
  def purchaseAnomalyDays(s: SparkSession, dir: String): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(datediff(to_date(col("ts")), epoch).cast("long").as("day"))
      .agg(count(lit(1)).as("n_purchases"))
    val m = daily.agg(count(lit(1)).as("n_days"),
      sum("n_purchases").as("total"))
    val dev = daily.crossJoin(broadcast(m))
      .withColumn("dev_num", col("n_purchases") * col("n_days") - col("total"))
    // Square in DECIMAL, not Long: dev_num can exceed ~3e9 at the 100 TB
    // target, where a LongType product would silently wrap pre-cast.
    val devSq = col("dev_num").cast("decimal(18,0)") *
      col("dev_num").cast("decimal(18,0)")
    val v = dev.agg(sum(devSq).as("var_num"))
    dev.crossJoin(broadcast(v))
      .withColumn("z", (col("dev_num").cast("double") *
        sqrt(col("n_days").cast("double"))) / sqrt(col("var_num").cast("double")))
      .withColumn("is_anomaly", devSq * col("n_days") > col("var_num") * 9)
      .select("day", "n_purchases", "dev_num", "z", "is_anomaly")
      .orderBy("day")
  }

  val purchaseAnomalyDaysSql: String =
    """WITH daily AS (
      |  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
      |    COUNT(*) AS n_purchases
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |m AS (SELECT COUNT(*) AS n_days, CAST(SUM(n_purchases) AS BIGINT) AS total FROM daily),
      |dev AS (
      |  SELECT day, n_purchases, n_days,
      |    n_purchases * n_days - total AS dev_num
      |  FROM daily CROSS JOIN m),
      |v AS (SELECT SUM(CAST(dev_num AS DECIMAL(18,0)) * CAST(dev_num AS DECIMAL(18,0))) AS var_num FROM dev)
      |SELECT day, n_purchases, dev_num,
      |  (CAST(dev_num AS DOUBLE) * sqrt(CAST(n_days AS DOUBLE))) /
      |    sqrt(CAST(var_num AS DOUBLE)) AS z,
      |  CAST(dev_num AS DECIMAL(18,0)) * CAST(dev_num AS DECIMAL(18,0)) * n_days > var_num * 9 AS is_anomaly
      |FROM dev CROSS JOIN v
      |ORDER BY day""".stripMargin

  /** Pivot: orders per market segment × order year. `groupBy.pivot`
    * with explicit pivot values (never let Spark scan for distinct
    * pivot keys at 100 TB — declare them).
    */
  def pivotSegmentYear(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_orderdate"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").between(1996, 1998))
      .groupBy(col("c_mktsegment"))
      .pivot("yr", Seq(1996, 1997, 1998))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnRenamed("1996", "y1996")
      .withColumnRenamed("1997", "y1997")
      .withColumnRenamed("1998", "y1998")
      .orderBy("c_mktsegment")
  }

  val pivotSql: String =
    """SELECT c_mktsegment,
      |  CAST(COUNT(*) FILTER (WHERE year(o_orderdate) = 1996) AS BIGINT) AS y1996,
      |  CAST(COUNT(*) FILTER (WHERE year(o_orderdate) = 1997) AS BIGINT) AS y1997,
      |  CAST(COUNT(*) FILTER (WHERE year(o_orderdate) = 1998) AS BIGINT) AS y1998
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE year(o_orderdate) BETWEEN 1996 AND 1998
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Salted two-phase aggregation (skew mitigation): identical result
    * to the direct aggregation — which is exactly what the oracle
    * asserts — while spreading any hot key over 16 sub-keys.
    */
  def saltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedAgg(
        Tables.events(s, dir), Seq("event_type"), saltBuckets = 16,
        partials = Seq(count(lit(1)).as("pn"), sum(cents(col("value"))).as("pc")),
        finals = Seq(sum(col("pn")).as("n"), sum(col("pc")).as("cents")))
      .orderBy("event_type")

  val saltedAggSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** TPC-H Q14-shaped promo revenue: one year of lineitem joins the
    * part dim (broadcast — parts are bounded), conditional aggregate
    * over the promo flag. The date predicate pushes to the scan; the
    * single shuffle is the final 1-group aggregate. The division runs
    * in double on both engines, denominator-zero guarded identically.
    */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val p = broadcast(Tables.part(s, dir).select("p_partkey", "p_type"))
    val revenue = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", revenue)).cast("double") * 100.0 /
          sum(revenue).cast("double")).as("promo_revenue_pct"),
        sum(revenue).cast("double").as("total_revenue"),
        count(lit(1)).as("n_items"))
  }

  val q14Sql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
      |        THEN CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6)) END)
      |      AS DOUBLE) * 100.0 /
      |    CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
      |    AS promo_revenue_pct,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
      |    AS total_revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin

  /** TPC-H Q10-shaped returned-item report: revenue lost to returns per
    * customer over a quarter. Lineitem carries the full predicate set
    * to the scan (returnflag + date), orders shuffle-joins it on
    * orderkey, and the customer/nation dims broadcast onto the (small)
    * per-customer aggregate. Top 20 via TakeOrdered, never a global
    * sort.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val c = broadcast(Tables.customer(s, dir)
      .select("c_custkey", "c_name", "c_nationkey"))
    val n = broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
        .cast("double").as("revenue"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c.c_custkey, c.c_name, n.n_name,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue DESC, c.c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q18-shaped large-volume customers: orders whose total
    * quantity crosses a threshold. The HAVING reduces on the fact's
    * own key (one shuffle on orderkey, map-side combined) BEFORE any
    * dim joins — the survivors are few, so customer broadcasts onto
    * them.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("total_qty"))
      .filter(col("total_qty") > 150.0)
    val o = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val c = broadcast(Tables.customer(s, dir).select("c_custkey", "c_name"))
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) > 150.0)
      |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, big.total_qty
      |FROM big
      |JOIN orders o ON big.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY big.total_qty DESC, o.o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q17-shaped small-quantity revenue: lineitems below 20% of
    * their part's average quantity. The correlated subquery becomes a
    * per-part aggregate joined back to the fact — BOTH sides shuffle
    * once on partkey (co-partitioned join, no broadcast of a fact-sized
    * aggregate), the part dim broadcasts, and the threshold compare
    * runs in double identically on both engines.
    */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val p = broadcast(Tables.part(s, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey"))
    val l = Tables.lineitem(s, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgQ = l.groupBy(col("l_partkey").as("ap"))
      .agg((sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1)))
        .as("avg_qty"))
    l.join(avgQ, col("l_partkey") === col("ap"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        (sum(col("l_extendedprice").cast(dec)).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  val q17Sql: String =
    """WITH l AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'PROMO'),
      |a AS (
      |  SELECT l_partkey AS ap,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM l GROUP BY 1)
      |SELECT
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_items
      |FROM l JOIN a ON l.l_partkey = a.ap
      |WHERE l.l_quantity < 0.2 * a.avg_qty""".stripMargin

  // -- TPC-H Q7-shaped volume shipping ---------------------------------------
  /** Revenue shipped between two nations, by direction and year. Both
    * nation dims broadcast; the only shuffles are lineitem⋈orders on
    * orderkey and the final small aggregate. Supplier and customer
    * nations resolve through their own broadcast chains, so the fact
    * table moves once.
    */
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    // nation groups (even/odd key) instead of two named nations: the
    // reduced testdata has 10 suppliers at sf0.001, so any specific
    // nation pair is empty at some scale — the JOIN SHAPE (two
    // broadcast dim chains onto one fact shuffle, direction × year
    // matrix) is Q7's
    val side = when(pmod(col("n_nationkey"), lit(2L)) === 0, "EVEN").otherwise("ODD")
    val n = Tables.nation(s, dir).select(col("n_nationkey"), side.as("n_side"))
    val su = broadcast(Tables.supplier(s, dir).join(n,
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_side").as("supp_nation")))
    val cu = broadcast(Tables.customer(s, dir).join(n,
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_side").as("cust_nation")))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec).as("rev"),
        year(col("l_shipdate")).cast("long").as("l_year"))
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(cu, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    """SELECT
      |  CASE WHEN sn.n_nationkey % 2 = 0 THEN 'EVEN' ELSE 'ODD' END AS supp_nation,
      |  CASE WHEN cn.n_nationkey % 2 = 0 THEN 'EVEN' ELSE 'ODD' END AS cust_nation,
      |  CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |WHERE (sn.n_nationkey % 2) <> (cn.n_nationkey % 2)
      |  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // -- TPC-H Q9-shaped product-type profit -----------------------------------
  /** Revenue by supplier nation × year for parts whose name carries a
    * marker substring (the testdata schema has no partsupp cost side,
    * so profit reduces to revenue — the JOIN SHAPE is Q9's: part
    * filter broadcast onto the fact, supplier→nation broadcast chain,
    * one fact shuffle).
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val p = broadcast(Tables.part(s, dir)
      .filter(col("p_name").contains("s"))
      .select("p_partkey"))
    val su = broadcast(Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation")))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec).as("rev"),
        year(col("l_shipdate")).cast("long").as("o_year"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .groupBy("nation", "o_year")
      .agg(sum(col("rev")).cast("double").as("sum_profit"),
        count(lit(1)).as("n_items"))
      .orderBy("nation", "o_year")
  }

  val q9Sql: String =
    """SELECT n.n_name AS nation,
      |  CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_profit,
      |  COUNT(*) AS n_items
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%s%'
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- TPC-H Q16-shaped supplier-count report --------------------------------
  /** Distinct suppliers per (brand, type, size-band): the part dim
    * broadcasts onto the lineitem (partkey, suppkey) pair set; the
    * distinct + count aggregate is the only shuffle. (The testdata has
    * no partsupp table; lineitem's observed pairs are its stand-in.)
    */
  def q16SupplierCount(s: SparkSession, dir: String): DataFrame = {
    val p = broadcast(Tables.part(s, dir)
      .filter(col("p_size").isin(5, 10, 15, 20))
      .select("p_partkey", "p_brand", "p_type", "p_size"))
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey").distinct()
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16Sql: String =
    """SELECT p.p_brand, p.p_type, p.p_size,
      |  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_size IN (5, 10, 15, 20)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // -- TPC-H Q19-shaped disjunctive discounted revenue ------------------------
  /** Revenue under an OR-of-ANDs predicate over (brand, size, quantity)
    * bands — Q19's shape with the testdata's columns. The disjunction
    * lives INSIDE the join: part broadcasts, each conjunct references
    * both sides, and Catalyst still pushes the brand/size restriction
    * to the part scan (the union of the bands).
    */
  def q19DiscountedRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = broadcast(Tables.part(s, dir).select("p_partkey", "p_brand", "p_size"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec).as("rev"))
    val band1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
      col("l_quantity").between(1, 15)
    val band2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
      col("l_quantity").between(10, 25)
    val band3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
      col("l_quantity").between(20, 35)
    l.join(p, col("l_partkey") === col("p_partkey") && (band1 || band2 || band3))
      .agg(sum(col("rev")).cast("double").as("revenue"), count(lit(1)).as("n_items"))
  }

  val q19Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 1 AND 15)
      |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20 AND l.l_quantity BETWEEN 10 AND 25)
      |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30 AND l.l_quantity BETWEEN 20 AND 35)""".stripMargin

  // -- TPC-H Q22-shaped sales opportunity -------------------------------------
  /** Customers with above-average account balance and no URGENT
    * orders (every synthetic customer has SOME order, so the
    * opportunity predicate is priority-scoped): the average is a 1-row
    * broadcast, the "none exists" test a left anti join on custkey —
    * never a correlated per-row subquery.
    */
  def q22SalesOpportunity(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("__avg"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("__avg"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("cntrycode", pmod(col("c_nationkey"), lit(5L)))
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(dec)).cast("double").as("totacctbal"))
      .orderBy("cntrycode")
  }

  val q22Sql: String =
    """SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- TPC-H Q13-shaped customer order distribution ---------------------------
  /** Order-count histogram over customers, INCLUDING zero-order
    * customers (the left join is the point of Q13 — an inner join
    * silently loses them). The synthetic schema carries no o_comment,
    * so the classic comment-exclusion filter is omitted; the shape —
    * left join, per-customer count, count-of-counts — is the query.
    * Two shuffles (join + first groupBy); the histogram re-agg is tiny.
    */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select("c_custkey")
    val o = Tables.orders(s, dir).select("o_custkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_custkey")).as("c_count")) // count() skips NULLs → 0
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c.c_custkey, COUNT(o.o_custkey) AS c_count
      |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY c.c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // -- TPC-H Q15-shaped top supplier ------------------------------------------
  /** Highest-revenue supplier over the feed's first quarter. Revenue
    * sums are DECIMAL(28,6) (exact, associative), so the `= max` gate
    * is an exact comparison — the double-rounding tie risk the classic
    * Q15 view has is absent. Both scalar gates (window start, max
    * revenue) are 1-row broadcasts, never correlated subqueries.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val cut = l.agg(min(col("l_shipdate")).as("__start"))
    val rev = l.crossJoin(broadcast(cut))
      .filter(col("l_shipdate") < col("__start") + expr("INTERVAL 3 MONTH"))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
        .as("__rev"))
    val maxRev = rev.agg(max(col("__rev")).as("__max"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("__rev") === col("__max"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("__rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS r
      |  FROM lineitem
      |  WHERE l_shipdate < (SELECT MIN(l_shipdate) FROM lineitem) + INTERVAL 3 MONTH
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON s_suppkey = l_suppkey
      |WHERE r = (SELECT MAX(r) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // -- TPC-H Q8-shaped national market share ----------------------------------
  /** NATION_7's share of PROMO-part revenue among ASIA customers, per
    * order year. All dims broadcast (region-filtered customers, PROMO
    * parts, supplier→nation); the only shuffle join is
    * lineitem⋈orders on orderkey. Numerator and denominator are
    * DECIMAL(28,6) sums in ONE aggregation pass (a separate
    * numerator query would re-scan lineitem); the share is a single
    * double division, same order both engines.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nCust = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("__cn"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(nCust), col("c_nationkey") === col("__cn"))
      .select("c_custkey")
    val o = Tables.orders(s, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    val p = Tables.part(s, dir).filter(col("p_type") === "PROMO").select("p_partkey")
    val supNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec)
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_7", vol)
          .otherwise(lit(0.0).cast(dec))).as("__num"),
        sum(vol).as("__den"))
      .select(col("o_year"),
        (col("__num").cast("double") / col("__den").cast("double")).as("mkt_share"),
        col("__den").cast("double").as("total_volume"))
      .orderBy("o_year")
  }

  val q8Sql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_7'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_volume
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation sn ON sn.n_nationkey = s_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation cn ON cn.n_nationkey = c_nationkey
      |JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q8_market_share" -> (q8MarketShare _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q16_supplier_count" -> (q16SupplierCount _),
    "q19_discounted_revenue" -> (q19DiscountedRevenue _),
    "q22_sales_opportunity" -> (q22SalesOpportunity _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "q4_priority_check" -> (q4PriorityCheck _),
    "q6_revenue_forecast" -> (q6Forecast _),
    "q_rolling_7d" -> (rolling7d _),
    "q_cohort_retention" -> (cohortRetention _),
    "q_funnel_windowed" -> (funnelWindowed _),
    "q_purchase_anomaly_days" -> (purchaseAnomalyDays _),
    "q_pivot_segment_year" -> (pivotSegmentYear _),
    "q_salted_agg" -> (saltedAgg _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q_top_users_window" -> (topUsersWindow _),
    "q_sessionize" -> (sessionize _),
    "q_event_funnel" -> (eventFunnel _))

  val oracles: Map[String, String] = Map(
    "q8_market_share" -> q8Sql,
    "q13_customer_distribution" -> q13Sql,
    "q15_top_supplier" -> q15Sql,
    "q7_volume_shipping" -> q7Sql,
    "q9_product_profit" -> q9Sql,
    "q16_supplier_count" -> q16Sql,
    "q19_discounted_revenue" -> q19Sql,
    "q22_sales_opportunity" -> q22Sql,
    "q17_small_quantity" -> q17Sql,
    "q10_returned_items" -> q10Sql,
    "q18_large_orders" -> q18Sql,
    "q14_promo_revenue" -> q14Sql,
    "q4_priority_check" -> q4Sql,
    "q6_revenue_forecast" -> q6Sql,
    "q_rolling_7d" -> rolling7dSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_funnel_windowed" -> funnelWindowedSql,
    "q_purchase_anomaly_days" -> purchaseAnomalyDaysSql,
    "q_pivot_segment_year" -> pivotSql,
    "q_salted_agg" -> saltedAggSql,
    "q1_pricing_summary" -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier" -> q5Sql,
    "q_top_users_window" -> topUsersSql,
    "q_sessionize" -> sessionizeSql,
    "q_event_funnel" -> eventFunnelSql)
}
