package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryConventions.MaterializeSyntax

import graft.sources.Tables

/** Extension tier (SURVEY.md §2.4/§2.7/§7.3-4): the relational surface the
  * reference lacks but any monitoring/analytics engine needs — equi-joins
  * over the star schema, top-k, analytic windows, sessionization, as-of.
  *
  * Scale notes (the 100 TB story):
  *  - `nation`/`region` are broadcast explicitly — dimension tables stay
  *    broadcast at any fact-table scale.
  *  - fact⋈fact joins (lineitem⋈orders) shuffle on the join key; AQE
  *    handles skew/coalescing at runtime.
  *  - as-of is expressed as a partitioned analytic window (shuffle on
  *    user_id, sort within partition), NOT a range self-join — the join
  *    form explodes quadratically on hot keys; the window form is linear.
  *  - sessionization uses `session_window`, Spark's native merging-window
  *    aggregate, which also runs incrementally under Structured Streaming.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  import QueryConventions.decSum

  private val revenueExpr: Column =
    col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q1-shaped pricing summary: multi-key hash aggregate with
    * arithmetic inside the aggregates, filter pushed to the parquet scan. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSum(revenueExpr).as("sum_disc_price"),
        decSum(revenueExpr * (lit(1) + col("l_tax"))).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base_price,
      |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_disc_price,
      |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_charge,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       round(avg(l_extendedprice), 6) AS avg_price,
      |       round(avg(l_discount), 6) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Star-schema rollup: revenue per nation. The biggest fact table is
    * pre-aggregated to one row per order BEFORE the fact⋈fact join —
    * partial aggregation pushdown Catalyst doesn't do on its own. At
    * sf0.1 that shrinks the join's left side 4× (600k lineitems → 150k
    * order partials); at 100 TB it is the difference between shuffling
    * the lineitem table and shuffling one decimal per order. Exactness is
    * preserved because the DECIMAL partial sums re-sum associatively.
    * The dimension join stays broadcast. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val liAgg = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        sum(revenueExpr.cast("decimal(18,6)")).as("order_rev"),
        count(lit(1)).as("order_items"))
    liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("order_rev")).cast("double"), 2).as("revenue"),
        sum(col("order_items")).as("n_items"))
      .orderBy("n_name")
  }

  private val revenueByNationSql: String =
    """SELECT n_name,
      |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Top-k: global order-by + limit. Spark executes this as TakeOrdered
    * (per-partition heap + driver merge of k rows), which is exactly the
    * plan that survives at scale — no global sort materialization.
    * Lineitem is pre-aggregated per order before the join (see
    * [[revenueByNation]] — same pushdown, same exactness argument). */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val liAgg = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(revenueExpr.cast("decimal(18,6)")).as("order_rev"))
    liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(col("order_rev")).cast("double"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  private val topCustomersSql: String =
    """SELECT c_custkey, c_name,
      |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 10""".stripMargin

  /** Ratio-to-report: every nation's share of total revenue plus its
    * revenue rank — the classic "percent of total" analytic. The share
    * arithmetic runs in exact CENTS (the rounded revenue × 100 is an
    * exact integer, so the total and the fixed-point share ratio cannot
    * drift with summation order); the total is a broadcast 1-row frame,
    * not a whole-partition window sum of doubles. */
  def nationRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = revenueByNation(spark, dir)
      .withColumn("cents", round(col("revenue") * 100).cast("long"))
    val tot = rev.agg(sum(col("cents")).as("tot"))
    val w = Window.orderBy(col("revenue").desc)
    rev.crossJoin(broadcast(tot))
      .withColumn("share", floor(col("cents") * 1e6 / col("tot")) / lit(1e6))
      .withColumn("rk", rank().over(w))
      .select("rk", "n_name", "revenue", "share")
      .orderBy("rk", "n_name")
  }

  private val nationRevenueShareSql: String =
    """WITH r AS (
      |  SELECT n_name,
      |         round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation   ON c_nationkey = n_nationkey
      |  GROUP BY n_name),
      |c AS (SELECT n_name, revenue, CAST(round(revenue * 100, 0) AS BIGINT) AS cents FROM r),
      |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM c)
      |SELECT rank() OVER (ORDER BY revenue DESC) AS rk,
      |       n_name, revenue,
      |       floor(cents * 1e6 / t.tot) / 1e6 AS share
      |FROM c CROSS JOIN t
      |ORDER BY rk, n_name""".stripMargin

  /** TPC-H Q3-shaped "open orders" priority report: revenue of orders
    * placed before the cutoff whose lineitems shipped after it, for one
    * market segment — the canonical 3-way fact⋈fact⋈dim join with
    * filters on ALL THREE inputs pushed to the parquet scans before any
    * join (the open-order predicate o_orderdate < D < l_shipdate is what
    * makes the join sides small). Top-10 by revenue with key tiebreak =
    * TakeOrdered, no global sort. (Orders carry no ship-priority column
    * in this harness schema; o_orderpriority plays its role.) */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1998-01-01"))
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(decSum(revenueExpr).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3ShippingPrioritySql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** SCD-2 (slowly-changing-dimension) history build: each customer's
    * order-priority timeline collapsed into validity periods — consecutive
    * same-priority runs become one row with [valid_from, valid_to) and an
    * is_current flag on the open period. This is the warehouse MERGE
    * pattern expressed as a batch derivation: gaps-and-islands on the
    * change marker, then lead() closes each period with the next one's
    * start. One shuffle on the customer key; windows are per-customer
    * (small, bounded by order count per customer). */
  def customerPriorityScd2(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val runs = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .withColumn("chg",
        when(lag(col("o_orderpriority"), 1).over(byCust).isNull ||
          lag(col("o_orderpriority"), 1).over(byCust) =!= col("o_orderpriority"), 1)
          .otherwise(0))
      .withColumn("version",
        sum(col("chg")).over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val byVersion = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
    runs.groupBy(col("o_custkey"), col("version"))
      .agg(
        min(col("o_orderpriority")).as("priority"), // constant within a run
        min(col("o_orderdate")).as("valid_from"),
        count(lit(1)).as("n_orders"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .select("o_custkey", "version", "priority", "valid_from", "valid_to", "is_current", "n_orders")
      .orderBy("o_custkey", "version")
  }

  private val customerPriorityScd2Sql: String =
    """WITH r AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |         CASE WHEN lag(o_orderpriority) OVER w IS NULL
      |                OR lag(o_orderpriority) OVER w <> o_orderpriority
      |              THEN 1 ELSE 0 END AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |v AS (
      |  SELECT o_custkey, o_orderdate, o_orderpriority,
      |         sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                        ROWS UNBOUNDED PRECEDING) AS version
      |  FROM r),
      |runs AS (
      |  SELECT o_custkey, CAST(version AS BIGINT) AS version,
      |         min(o_orderpriority) AS priority,
      |         min(o_orderdate) AS valid_from,
      |         count(*) AS n_orders
      |  FROM v GROUP BY o_custkey, version)
      |SELECT o_custkey, version, priority, valid_from,
      |       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version) AS valid_to,
      |       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version) IS NULL AS is_current,
      |       n_orders
      |FROM runs
      |ORDER BY o_custkey, version""".stripMargin

  /** Pareto (cumulative-contribution) analysis: every supplier ranked by
    * revenue with its exact-cents cumulative share and the 80%-coverage
    * head flag — the "which 20% of suppliers carry 80% of revenue" view.
    * The fact side collapses to one row per supplier in a single
    * partial-agg shuffle; the ordered cumulative pass runs through
    * [[graft.queries.GlobalWindow.rowNumberAndRunningSum]] — rank and
    * cumulative cents in ONE two-phase range-partitioned pass — so even
    * a fact-sized supplier dimension never serializes through a
    * single-task sort. Share arithmetic runs in exact integer cents; the
    * head flag compares 5·(preceding cumulative) < 4·total so no float
    * can flip a boundary row. */
  def supplierPareto(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(round(sum(revenueExpr.cast("decimal(18,6)")).cast("double"), 2).as("revenue"))
    val bySupp = Tables.supplier(spark, dir)
      .join(rev, col("s_suppkey") === col("l_suppkey"), "left")
      .withColumn("revenue", coalesce(col("revenue"), lit(0.0)))
      .withColumn("cents", round(col("revenue") * 100).cast("long"))
    val tot = bySupp.agg(sum(col("cents")).as("tot"))
    GlobalWindow.rowNumberAndRunningSum(
      bySupp.crossJoin(broadcast(tot)), col("cents"), "rk", "cum_cents")(
      col("cents").desc, col("s_suppkey"))
      .withColumn("rk", col("rk").cast("int"))
      .withColumn("cum_share", floor(col("cum_cents") * 1e6 / col("tot")) / lit(1e6))
      .withColumn("in_top80", (col("cum_cents") - col("cents")) * 5 < col("tot") * 4)
      .select("rk", "s_suppkey", "s_name", "revenue", "cum_share", "in_top80")
      .orderBy("rk")
  }

  private val supplierParetoSql: String =
    """WITH r AS (
      |  SELECT l_suppkey,
      |         round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
      |  FROM lineitem GROUP BY l_suppkey),
      |j AS (
      |  SELECT s_suppkey, s_name, coalesce(revenue, 0.0) AS revenue,
      |         CAST(round(coalesce(revenue, 0.0) * 100, 0) AS BIGINT) AS cents
      |  FROM supplier LEFT JOIN r ON s_suppkey = l_suppkey),
      |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM j),
      |c AS (
      |  SELECT s_suppkey, s_name, revenue, cents,
      |         row_number() OVER (ORDER BY cents DESC, s_suppkey) AS rk,
      |         CAST(sum(cents) OVER (ORDER BY cents DESC, s_suppkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      |  FROM j)
      |SELECT rk, s_suppkey, s_name, revenue,
      |       floor(cum_cents * 1e6 / t.tot) / 1e6 AS cum_share,
      |       (cum_cents - cents) * 5 < t.tot * 4 AS in_top80
      |FROM c CROSS JOIN t
      |ORDER BY rk""".stripMargin

  /** Analytic ranking window: top-3 parts per brand by retail price.
    * Deterministic tie-break on p_partkey in the ORDER BY on both sides. */
  def rankPartsPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("p_brand", "rk", "p_partkey", "p_name", "p_retailprice")
      .orderBy("p_brand", "rk")
  }

  private val rankPartsPerBrandSql: String =
    """SELECT p_brand, rk, p_partkey, p_name, p_retailprice
      |FROM (SELECT p_brand, p_partkey, p_name, p_retailprice,
      |             row_number() OVER (PARTITION BY p_brand
      |                                ORDER BY p_retailprice DESC, p_partkey) AS rk
      |      FROM part)
      |WHERE rk <= 3
      |ORDER BY p_brand, rk""".stripMargin

  /** Calendar rollup over orders (date_trunc month). */
  def ordersPerMonth(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).as("total_price"))
      .orderBy("month")

  private val ordersPerMonthSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |       count(*) AS n_orders,
      |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_price
      |FROM orders
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Sessionization: Spark's native merging session windows (gap 30 min)
    * per user over the events stream-table. New session iff the gap since
    * the previous event is >= the gap duration (windows merge on strict
    * overlap only). */
  def userSessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  private val userSessionsSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |d AS (SELECT user_id, ts,
      |             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
      |                  THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |s AS (SELECT user_id, ts,
      |             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                              ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM d)
      |SELECT user_id,
      |       min(ts) AS session_start,
      |       max(ts) + INTERVAL '30 minutes' AS session_end,
      |       count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** The O(k)-state top-k path under the value oracle: same contract as
    * [[rankPartsPerBrand]] (top-3 per brand by retail price, partkey
    * tiebreak) but computed with the typed [[graft.functions.TopKAggregator]]
    * — a bounded heap through partial AND merge phases, so a group's
    * millions of rows shuffle as k rows. The window form sorts each
    * group's full row set; this is the form that wins when groups are
    * huge. Registering it gives the typed-Aggregator code path its own
    * DuckDB-oracle leg (TypedApiSpec already pins aggregator ≡ window). */
  def rankPartsHeap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_retailprice"), col("p_partkey"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.functions.TopKAggregator(3).toColumn.name("ids"))
      .toDF("p_brand", "ids")
      .select(col("p_brand"), posexplode(col("ids")).as(Seq("pos", "p_partkey")))
      .select(col("p_brand"), (col("pos") + 1).cast("int").as("rk"), col("p_partkey"))
      .orderBy("p_brand", "rk")
  }

  private val rankPartsHeapSql: String =
    """SELECT p_brand, CAST(rk AS INT) AS rk, p_partkey
      |FROM (
      |  SELECT p_brand, p_partkey,
      |         row_number() OVER (PARTITION BY p_brand
      |                            ORDER BY p_retailprice DESC, p_partkey) AS rk
      |  FROM part)
      |WHERE rk <= 3
      |ORDER BY p_brand, rk""".stripMargin

  /** Month-over-month and year-over-year growth — the reporting layer
    * over [[ordersPerMonth]]: lag(1) and lag(12) on the monthly rollup,
    * growth as fixed-point basis-point ratios (the revenue operands are
    * already exact 2-dp numbers, so the ratio arithmetic is
    * engine-identical). The window runs over the MONTH frame — dozens of
    * rows regardless of fact scale. First months (no prior/no
    * year-prior) report NULL growth rather than a fake 0. */
  def ordersMomGrowth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("month"))
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("revenue"))
      .withColumn("prev_rev", lag(col("revenue"), 1).over(w))
      .withColumn("yoy_rev", lag(col("revenue"), 12).over(w))
      .withColumn("mom_pct",
        when(col("prev_rev") > 0,
          floor((col("revenue") - col("prev_rev")) * 1e4 / col("prev_rev")) / lit(1e4)))
      .withColumn("yoy_pct",
        when(col("yoy_rev") > 0,
          floor((col("revenue") - col("yoy_rev")) * 1e4 / col("yoy_rev")) / lit(1e4)))
      .select("month", "n_orders", "revenue", "mom_pct", "yoy_pct")
      .orderBy("month")
  }

  private val ordersMomGrowthSql: String =
    """WITH m AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |         count(*) AS n_orders,
      |         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
      |  FROM orders GROUP BY 1),
      |g AS (
      |  SELECT month, n_orders, revenue,
      |         lag(revenue, 1) OVER (ORDER BY month) AS prev_rev,
      |         lag(revenue, 12) OVER (ORDER BY month) AS yoy_rev
      |  FROM m)
      |SELECT month, n_orders, revenue,
      |       CASE WHEN prev_rev > 0
      |            THEN floor((revenue - prev_rev) * 1e4 / prev_rev) / 1e4 END AS mom_pct,
      |       CASE WHEN yoy_rev > 0
      |            THEN floor((revenue - yoy_rev) * 1e4 / yoy_rev) / 1e4 END AS yoy_pct
      |FROM g
      |ORDER BY month""".stripMargin

  /** Peak concurrency by sweep-line: the maximum number of simultaneously
    * open user sessions and the first instant it is reached — the
    * capacity-planning number over [[userSessions]]' intervals. Each
    * session emits +1 at start and −1 at end (ends sort before starts at
    * the same instant, so back-to-back sessions never double-count); a
    * running sum over the event stream is the concurrency curve. The
    * ordered pass runs over 2·|sessions| delta rows through
    * [[graft.queries.GlobalWindow.runningSum]] (per-range partial sums +
    * broadcast offsets), so the sweep parallelizes across range
    * partitions. Peer rows (identical ts, delta) make row-level prefix
    * sums order-ambiguous, but the (ts, concurrency) MULTISET is
    * permutation-invariant within peers, so the max and its first
    * timestamp are engine-deterministic. */
  def maxConcurrentSessions(spark: SparkSession, dir: String): DataFrame = {
    val s = userSessions(spark, dir)
    val deltas = s.select(col("session_start").as("ts"), lit(1).as("d"))
      .unionAll(s.select(col("session_end").as("ts"), lit(-1).as("d")))
    GlobalWindow.runningSum(deltas, col("d"), "concurrent")(
      col("ts"), col("d"))
      .orderBy(col("concurrent").desc, col("ts"))
      .limit(1)
      .select(col("concurrent").as("max_concurrent"), col("ts").as("first_at"))
  }

  private val maxConcurrentSessionsSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |d AS (SELECT user_id, ts,
      |             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
      |                  THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |s AS (SELECT user_id, ts,
      |             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                              ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM d),
      |sess AS (SELECT min(ts) AS session_start,
      |                max(ts) + INTERVAL '30 minutes' AS session_end
      |         FROM s GROUP BY user_id, sid),
      |del AS (SELECT session_start AS ts, 1 AS delta FROM sess
      |        UNION ALL
      |        SELECT session_end, -1 FROM sess),
      |r AS (SELECT ts,
      |             CAST(sum(delta) OVER (ORDER BY ts, delta
      |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrent
      |      FROM del)
      |SELECT concurrent AS max_concurrent, ts AS first_at
      |FROM r ORDER BY concurrent DESC, ts LIMIT 1""".stripMargin

  /** DYNAMIC-gap sessionization: the session gap is a per-event
    * EXPRESSION (purchases hold a session open 60 min, everything else
    * 30) — Spark's `session_window(ts, gapColumn)` merging-interval
    * semantics, which almost no SQL engine has natively. The oracle
    * re-derives it relationally: an event opens a new session iff its ts
    * is at/after the RUNNING MAX of (ts + gap) over all earlier events
    * (running max, not lag — a long purchase window can bridge over a
    * shorter later window's end), then gaps-and-islands as usual.
    * Same scale shape as fixed-gap sessions: shuffle on user_id, one
    * sort, merging aggregate — and the identical query runs incrementally
    * under Structured Streaming with a watermark. */
  def userSessionsDynamic(spark: SparkSession, dir: String): DataFrame = {
    val gap = when(col("event_type") === "purchase", lit("60 minutes"))
      .otherwise(lit("30 minutes"))
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchases"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("n_purchases"))
      .orderBy("user_id", "session_start")
  }

  private val userSessionsDynamicSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |         CASE WHEN event_type = 'purchase' THEN INTERVAL '60 minutes'
      |              ELSE INTERVAL '30 minutes' END AS gap,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      |  FROM events),
      |d AS (
      |  SELECT user_id, ts, gap, is_p,
      |         max(ts + gap) OVER (PARTITION BY user_id ORDER BY ts
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS max_end
      |  FROM e),
      |f AS (
      |  SELECT user_id, ts, gap, is_p,
      |         CASE WHEN max_end IS NULL OR ts >= max_end THEN 1 ELSE 0 END AS new_s
      |  FROM d),
      |s AS (
      |  SELECT user_id, ts, gap, is_p,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM f)
      |SELECT user_id,
      |       min(ts) AS session_start,
      |       max(ts + gap) AS session_end,
      |       count(*) AS n_events,
      |       CAST(sum(is_p) AS BIGINT) AS n_purchases
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** As-of lookup: for every purchase, the most recent strictly-earlier
    * click by the same user — expressed as a partitioned analytic window
    * (linear, shuffle on user_id) instead of a range self-join (quadratic
    * on hot keys). */
  def asOfLastClick(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "last_click_ts")
      .orderBy("event_id")
  }

  private val asOfLastClickSql: String =
    """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, last_click_ts
      |FROM (SELECT event_id, user_id, ts, event_type,
      |             last_value(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
      |               OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      |      FROM events)
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** Full dimension hierarchy: region → nation → customer counts with
    * both dimension joins broadcast (completes coverage of every harness
    * table). */
  def regionHierarchy(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        countDistinct(col("n_name")).as("n_nations"),
        count(lit(1)).as("n_customers"),
        decSum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("r_name")

  private val regionHierarchySql: String =
    """SELECT r_name,
      |       count(DISTINCT n_name) AS n_nations,
      |       count(*) AS n_customers,
      |       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** Relational division — "customers whose orders span EVERY priority
    * class": the classic ∀-coverage operator (suppliers-of-all-parts
    * family). Expressed as count-distinct-equals-total: one shuffle on
    * the group key plus a broadcast 1-row divisor frame — no correlated
    * subquery, no N×M anti-join double scan; this is the form that holds
    * at 100 TB (the divisor side is an aggregate, always tiny). */
  def customersAllPriorities(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val total = orders.agg(countDistinct(col("o_orderpriority")).as("n_total"))
    orders.groupBy(col("o_custkey"))
      .agg(
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(total), col("n_prio") === col("n_total"))
      .select(col("o_custkey"), col("n_prio"), col("n_orders"))
      .orderBy("o_custkey")
  }

  private val customersAllPrioritiesSql: String =
    """SELECT o_custkey,
      |       count(DISTINCT o_orderpriority) AS n_prio,
      |       count(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(DISTINCT o_orderpriority) =
      |       (SELECT count(DISTINCT o_orderpriority) FROM orders)
      |ORDER BY o_custkey""".stripMargin

  /** Correlated scalar subquery — "orders more than TWICE their own
    * customer's average": the classic per-group-threshold filter (the 2x
    * factor keeps the result a meaningful outlier set rather than ~half
    * of every customer's orders). Spark decorrelates this into an
    * aggregate + equi-join (no per-row re-execution), which is exactly
    * the plan to want at scale; the query runs the SAME ANSI text on
    * both engines through spark.sql. The threshold is FIXED-POINT
    * FLOORED, not rounded: an integer-count ratio mean lands on exact .5
    * decimal boundaries where the engines' HALF_UP disagree. */
  def ordersAboveCustomerAvg(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders_v")
    spark.sql(ordersAboveCustomerAvgText("graft_orders_v"))
  }

  private def ordersAboveCustomerAvgText(t: String): String =
    s"""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
       |FROM $t o
       |WHERE o_totalprice > 2 * (SELECT floor(avg(i.o_totalprice) * 1e6) / 1e6
       |                          FROM $t i
       |                          WHERE i.o_custkey = o.o_custkey)
       |ORDER BY o_custkey, o_orderkey""".stripMargin

  private val ordersAboveCustomerAvgSql: String =
    ordersAboveCustomerAvgText("orders")

  /** Quantified comparison (> ALL): customers whose account balance beats
    * every supplier's in their nation — expressed as a comparison against
    * the per-nation MAX (the aggregate form Spark and every planner
    * rewrite ALL into: one tiny aggregate, broadcast, one filter; no
    * per-row subquery at any scale). Faithful to the quantifier's
    * empty-set case: `> ALL (empty)` is TRUE, so customers in nations
    * with no suppliers qualify — hence the LEFT join and the NULL
    * max_bal branch (an inner join would silently drop them). */
  def customersAboveAllSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val smax = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey"))
      .agg(round(max(col("s_acctbal")), 6).as("max_bal"))
    Tables.customer(spark, dir)
      .join(broadcast(smax), col("c_nationkey") === col("s_nationkey"), "left")
      .filter(col("max_bal").isNull || col("c_acctbal") > col("max_bal"))
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("balance"), col("max_bal"))
      .orderBy("c_custkey")
  }

  private val customersAboveAllSuppliersSql: String =
    """WITH m AS (
      |  SELECT s_nationkey, round(max(s_acctbal), 6) AS max_bal
      |  FROM supplier GROUP BY s_nationkey)
      |SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS balance, m.max_bal
      |FROM customer LEFT JOIN m ON c_nationkey = m.s_nationkey
      |WHERE m.max_bal IS NULL OR c_acctbal > m.max_bal
      |ORDER BY c_custkey""".stripMargin

  /** Recursive-CTE graph traversal (`WITH RECURSIVE`, native in Spark 4):
    * BFS over the event-type transition graph. The edge set is derived
    * distributedly — consecutive events per user (event_id order, an
    * analytic window) become distinct (src, dst) transitions — then the
    * recursion walks min-hop reachability from 'view'. Both engines run
    * the SAME recursive SQL text over the derived edge view.
    *
    * Scale: the heavy stage is the edge derivation (shuffle on user_id +
    * window sort, then a distinct — linear in events); the recursion runs
    * on the contracted type graph (|V| = #event types, tiny by
    * construction), bounded by hops < 4. This is the right split at
    * 100 TB: recurse on the aggregated graph, never the raw events. */
  def eventTypeReachability(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val edges = Tables.events(spark, dir)
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("event_type"))
      .select(col("src"), col("event_type").as("dst"))
      .distinct()
      .materializeOnce
    edges.count() // materialize: each recursive step re-reads the view,
                  // and without the cache each re-read would replay the
                  // full window + distinct over the events scan
    edges.createOrReplaceTempView("graft_type_edges")
    spark.sql(reachabilitySql("graft_type_edges"))
  }

  /** Shared recursive text — identical on both engines modulo the edge
    * source (Spark: the derived temp view; DuckDB: a CTE over events);
    * `typeName` is STRING on Spark, VARCHAR on DuckDB. */
  private def walkCte(edges: String, typeName: String): String =
    s"""walk(node, hops) AS (
       |  SELECT CAST('view' AS $typeName) AS node, 0 AS hops
       |  UNION ALL
       |  SELECT e.dst AS node, w.hops + 1 AS hops
       |  FROM walk w JOIN $edges e ON e.src = w.node
       |  WHERE w.hops < 4)""".stripMargin

  private val walkSelect: String =
    """SELECT node, CAST(min(hops) AS INT) AS min_hops
      |FROM walk GROUP BY node ORDER BY node""".stripMargin

  private def reachabilitySql(edges: String): String =
    s"""WITH RECURSIVE ${walkCte(edges, "STRING")}
       |$walkSelect""".stripMargin

  private val eventTypeReachabilitySql: String =
    s"""WITH RECURSIVE edges AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS src,
       |           event_type AS dst
       |    FROM events)
       |  WHERE src IS NOT NULL AND src <> dst),
       |${walkCte("edges", "VARCHAR")}
       |$walkSelect""".stripMargin

  /** Weighted single-source shortest paths over the same contracted
    * transition graph — reachability's min-hop walk upgraded to min-COST:
    * edge cost is the exact integer 1000000 div n + 1 (rare transitions
    * cost more), so "cheapest path" = "most-travelled route" from 'view'
    * to every other event type. Positive integer costs on a ≤ |types|-node
    * graph mean a shortest path has < |V| edges; the hops < 5 recursion
    * bound therefore EXHAUSTS all candidate shortest paths and min(cost)
    * is the true SSSP answer, not an approximation. Same scale split as
    * reachability: the weighted edge list is derived distributedly
    * (window + count over the events feed — the only data-sized stage),
    * the recursion runs on the tiny contracted graph, and both engines
    * execute the identical recursive ANSI text. */
  def eventTypeSssp(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val edges = Tables.events(spark, dir)
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("event_type"))
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
      .select(col("src"), col("dst"), expr("1000000 div n + 1").cast("long").as("cost"))
      .materializeOnce
    edges.count() // materialize: each recursive step re-reads the view
    edges.createOrReplaceTempView("graft_type_wedges")
    spark.sql(ssspSql("graft_type_wedges", "STRING"))
  }

  private def ssspCte(edges: String, typeName: String): String =
    s"""paths(node, cost, hops) AS (
       |  SELECT CAST('view' AS $typeName) AS node, CAST(0 AS BIGINT) AS cost, 0 AS hops
       |  UNION ALL
       |  SELECT e.dst AS node, p.cost + e.cost AS cost, p.hops + 1 AS hops
       |  FROM paths p JOIN $edges e ON e.src = p.node
       |  WHERE p.hops < 5)""".stripMargin

  private val ssspSelect: String =
    """SELECT node, min(cost) AS min_cost
      |FROM paths GROUP BY node ORDER BY node""".stripMargin

  private def ssspSql(edges: String, typeName: String): String =
    s"""WITH RECURSIVE ${ssspCte(edges, typeName)}
       |$ssspSelect""".stripMargin

  private val eventTypeSsspSql: String =
    s"""WITH RECURSIVE wedges AS (
       |  SELECT src, dst, 1000000 // n + 1 AS cost FROM (
       |    SELECT src, dst, count(*) AS n FROM (
       |      SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS src,
       |             event_type AS dst
       |      FROM events)
       |    WHERE src IS NOT NULL AND src <> dst
       |    GROUP BY src, dst)),
       |${ssspCte("wedges", "VARCHAR")}
       |$ssspSelect""".stripMargin

  /** Spark-4 VARIANT path for semi-structured props: `parse_json` once
    * into the binary Variant encoding, then typed `try_variant_get`
    * extraction — the open-schema ingestion form (vs `from_json` with a
    * declared schema, P2). At scale Variant beats per-query JSON string
    * re-parsing: the cast to Variant happens once at ingest and the
    * shredded binary is columnar-friendly. Oracle = DuckDB's native JSON
    * extraction over the same strings. */
  def eventsVariantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("v", expr("parse_json(props)"))
      .select(
        col("event_id"),
        expr("try_variant_get(v, '$.k', 'int')").as("k"),
        expr("CAST(try_variant_get(v, '$.k', 'int') div 10 AS INT)").as("k_decile"),
        expr("try_variant_get(v, '$.missing', 'int')").as("k_missing"))
      .orderBy("event_id")

  private val eventsVariantExtractSql: String =
    """SELECT event_id,
      |       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
      |       CAST(CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS INTEGER) AS k_decile,
      |       CAST(json_extract(props, '$.missing') AS INTEGER) AS k_missing
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Incremental view maintenance — the partial-aggregate MERGE that
    * keeps a 100 TB rollup fresh without rescanning history: the
    * monthly revenue "materialized view" is built from the frozen
    * history partition (o_orderdate < cutoff) as mergeable partials
    * (COUNT + un-rounded DECIMAL SUM — the two classic self-merging
    * aggregates), the delta partition (>= cutoff) produces the same
    * partials from a pushed-filter scan that reads ONLY the new data,
    * and the view refresh is a re-aggregation of (at most) 2 rows per
    * month — never a history rescan. At scale the snapshot leg is a
    * stored table and only the delta leg runs per refresh; here both
    * legs run so the oracle (a direct full GROUP BY) can certify the
    * merge is EXACT — associativity is why the partials must stay
    * DECIMAL until the final presentation round. AVG is deliberately
    * derived from the merged (sum, count), the standard IVM treatment
    * of non-self-merging aggregates. */
  def ordersIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "2001-06-01"
    def partials(o: DataFrame): DataFrame = o
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_part"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("rev_part"))
    val orders = Tables.orders(spark, dir)
    val snapshot = partials(orders.filter(col("o_orderdate") < lit(cutoff)))
      .materializeOnce // the stored MV: built once, reused every refresh
    val delta = partials(orders.filter(col("o_orderdate") >= lit(cutoff)))
    snapshot.unionByName(delta)
      .groupBy(col("month"))
      .agg(sum(col("n_part")).as("n_orders"),
        sum(col("rev_part")).as("rev"))
      .select(col("month"), col("n_orders"),
        round(col("rev").cast("double"), 2).as("revenue"),
        round((col("rev") / col("n_orders")).cast("double"), 6).as("avg_price"))
      .orderBy("month")
  }

  private val ordersIncrementalAggSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |       count(*) AS n_orders,
      |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
      |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
      |             / count(*) AS DOUBLE), 6) AS avg_price
      |FROM orders
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Product-line profit by supplier nation and order year (the TPC-H
    * Q9 shape adapted to this catalog — no partsupp table, so unit cost
    * is proxied by the part's retail price): lineitem ⋈ part(filtered)
    * ⋈ supplier ⋈ nation ⋈ orders, aggregated to (nation, year). The
    * plan a 100 TB run wants, and this builds: the `p_name` filter
    * cuts part BEFORE its join (pushed to the part scan), and every
    * dimension side — filtered part, supplier, nation — broadcasts, so
    * the fact table is never shuffled for them; the only exchange is
    * the lineitem⋈orders fact join and the final (nation, year)
    * aggregate with map-side partials. Profit per item is
    * revenue − cost, kept DECIMAL-exact until the presentation round. */
  def q9ProfitByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_name").contains("widget"))
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n_items"),
        round((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)"))
          - sum((col("p_retailprice") * col("l_quantity"))
            .cast("decimal(18,6)"))).cast("double"), 2).as("profit"))
      .orderBy(col("nation"), col("o_year"))
  }

  private val q9ProfitByNationSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |       count(*) AS n_items,
      |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
      |             - sum(CAST(p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS profit
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN orders   ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Local supplier volume (the TPC-H Q5 shape): revenue from orders
    * where the CUSTOMER's nation and the SUPPLIER's nation are the SAME
    * — two independent FK paths (order→customer→nation,
    * lineitem→supplier→nation) constrained equal, the join topology
    * that distinguishes Q5 from every star rollup: the nation key
    * reaches the fact row twice by different routes and the predicate
    * joins the routes, not the dims. One order-date year keeps the
    * pushed-filter discipline.
    *
    * Plan shape: both dimension chains broadcast (customer and supplier
    * carry only their nationkey), the date filter reaches the orders
    * scan, and the only exchanges are the lineitem⋈orders fact join and
    * the final per-nation aggregate. The same-nation predicate is a
    * post-broadcast-join filter — never a shuffle of its own. */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5LocalSupplierVolumeSql: String =
    """SELECT n_name,
      |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE c_nationkey = s_nationkey
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "orders_incremental_agg" -> (ordersIncrementalAgg _),
    "q5_local_supplier_volume" -> (q5LocalSupplierVolume _),
    "q9_profit_by_nation"    -> (q9ProfitByNation _),
    "orders_above_customer_avg"    -> (ordersAboveCustomerAvg _),
    "customers_above_all_suppliers" -> (customersAboveAllSuppliers _),
    "customers_all_priorities" -> (customersAllPriorities _),
    "event_type_reachability"  -> (eventTypeReachability _),
    "event_type_sssp"          -> (eventTypeSssp _),
    "events_variant_extract"   -> (eventsVariantExtract _),
    "region_hierarchy"     -> (regionHierarchy _),
    "q1_pricing_summary"   -> (pricingSummary _),
    "revenue_by_nation"    -> (revenueByNation _),
    "nation_revenue_share" -> (nationRevenueShare _),
    "supplier_pareto"      -> (supplierPareto _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "customer_priority_scd2" -> (customerPriorityScd2 _),
    "top_customers"        -> (topCustomers _),
    "rank_parts_per_brand" -> (rankPartsPerBrand _),
    "rank_parts_heap"      -> (rankPartsHeap _),
    "orders_mom_growth"    -> (ordersMomGrowth _),
    "orders_per_month"     -> (ordersPerMonth _),
    "user_sessions"        -> (userSessions _),
    "max_concurrent_sessions" -> (maxConcurrentSessions _),
    "user_sessions_dynamic" -> (userSessionsDynamic _),
    "asof_last_click"      -> (asOfLastClick _))

  val oracle: Map[String, String] = Map(
    "orders_incremental_agg" -> ordersIncrementalAggSql,
    "q5_local_supplier_volume" -> q5LocalSupplierVolumeSql,
    "q9_profit_by_nation"    -> q9ProfitByNationSql,
    "orders_above_customer_avg"    -> ordersAboveCustomerAvgSql,
    "customers_above_all_suppliers" -> customersAboveAllSuppliersSql,
    "customers_all_priorities" -> customersAllPrioritiesSql,
    "event_type_reachability"  -> eventTypeReachabilitySql,
    "event_type_sssp"          -> eventTypeSsspSql,
    "events_variant_extract"   -> eventsVariantExtractSql,
    "region_hierarchy"     -> regionHierarchySql,
    "q1_pricing_summary"   -> pricingSummarySql,
    "revenue_by_nation"    -> revenueByNationSql,
    "nation_revenue_share" -> nationRevenueShareSql,
    "supplier_pareto"      -> supplierParetoSql,
    "q3_shipping_priority" -> q3ShippingPrioritySql,
    "customer_priority_scd2" -> customerPriorityScd2Sql,
    "top_customers"        -> topCustomersSql,
    "rank_parts_per_brand" -> rankPartsPerBrandSql,
    "rank_parts_heap"      -> rankPartsHeapSql,
    "orders_mom_growth"    -> ordersMomGrowthSql,
    "orders_per_month"     -> ordersPerMonthSql,
    "user_sessions"        -> userSessionsSql,
    "max_concurrent_sessions" -> maxConcurrentSessionsSql,
    "user_sessions_dynamic" -> userSessionsDynamicSql,
    "asof_last_click"      -> asOfLastClickSql)
}
