package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational operator catalog, part 1: scans, joins (broadcast / semi /
  * anti / range / as-of), aggregations, windows, set ops, rollup/cube,
  * percentiles, JSON, date & string functions (SURVEY.md §2.B/C/F/G).
  *
  * Every query has a DuckDB oracle (t2 compares value-for-value at
  * sf0.01), so both sides: identical aliases, identical ORDER BY,
  * doubles rounded, no raw timestamps (formatted to strings), no NULL
  * grouping keys (coalesced) — see SURVEY.md §7.6 #6.
  */
object CatalogCore {

  private def t(s: SparkSession, d: String, n: String) = s.read.parquet(s"$d/$n.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 style pricing aggregate: partial+final hash agg, pruned scan
    "r_pricing_agg" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // shuffle join + agg
    "r_join_orders_customer" -> ((s, d) => t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(round(sum(col("o_totalprice")), 2).as("segment_revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))),

    // broadcast dimension chain: lineitem ⋈ supplier ⋈ nation ⋈ region
    "r_broadcast_dims" -> ((s, d) => t(s, d, "lineitem")
      .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))),

    // left semi: customers having orders, counted per nation
    "r_semi_join" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))),

    // left anti: customers with no orders
    "r_anti_join" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))),

    // running-sum window (frame rowsBetween unbounded..current)
    "r_window_running" -> ((s, d) => t(s, d, "lineitem")
      .where(col("l_suppkey") < 5)
      .withColumn("running_qty",
        round(sum(col("l_quantity")).over(
          Window.partitionBy(col("l_suppkey"))
            .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))),

    // per-group top-k via row_number
    "r_topk_per_group" -> ((s, d) => t(s, d, "part")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))))
      .where(col("rk") <= 3)
      .select(col("p_brand"), col("rk"), col("p_partkey"), round(col("p_retailprice"), 2).as("price"))
      .orderBy(col("p_brand"), col("rk"))),

    // rollup with coalesced subtotal keys (no NULL ordering divergence)
    "r_rollup" -> ((s, d) => t(s, d, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("n"), col("total"))
      .orderBy(col("status"), col("priority"))),

    // cube
    "r_cube" -> ((s, d) => t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"), col("n"))
      .orderBy(col("flag"), col("status"))),

    // set ops: nations having customers INTERSECT nations having suppliers,
    // then EXCEPT those with > 8 customers
    "r_setops" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk")).distinct()
      val su = t(s, d, "supplier").select(col("s_nationkey").as("nk")).distinct()
      val big = t(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n")).where(col("n") > 8).select(col("nk"))
      c.intersect(su).except(big).orderBy(col("nk"))
    }),

    // stats battery
    "r_stats" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"))
      .orderBy(col("l_returnflag"))),

    // exact percentiles (linear interpolation — same def as quantile_cont)
    "r_percentiles" -> ((s, d) => t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
      .orderBy(col("o_orderstatus"))),

    // JSON-ish extraction from events.props (regex — dialect-identical)
    "r_json_extract" -> ((s, d) => t(s, d, "events")
      .withColumn("k_val", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
      .groupBy(col("event_type"))
      .agg(sum(col("k_val")).as("k_sum"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))),

    // date functions
    "r_date_parts" -> ((s, d) => t(s, d, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("yr"), col("mo"))),

    // string battery incl. levenshtein (SURVEY.md §2 row 21)
    "r_string_funcs" -> ((s, d) => t(s, d, "customer")
      .where(col("c_custkey") <= 100)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 9).as("prefix"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev_seg"))
      .orderBy(col("c_custkey"))),

    // lag/lead deltas per user
    "r_lag_lead" -> ((s, d) => t(s, d, "events")
      .where(col("user_id") < 10)
      .withColumn("prev_value", lag(col("value"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .withColumn("delta", round(col("value") - coalesce(col("prev_value"), lit(0.0)), 4))
      .select(col("user_id"), col("event_id"), col("delta"))
      .orderBy(col("user_id"), col("event_id"))),

    // scalar subquery: orders above global average
    "r_scalar_subquery" -> ((s, d) => {
      val avgPrice = t(s, d, "orders").agg(avg(col("o_totalprice"))).first().getDouble(0)
      t(s, d, "orders").where(col("o_totalprice") > avgPrice)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_above"))
        .orderBy(col("o_orderstatus"))
    }),

    // range/interval join: events within 7 days after an order by the
    // same key (interval-overlap shape, SURVEY.md §2 rows 38/49)
    "r_range_join" -> ((s, d) => {
      val e = t(s, d, "events").where(col("user_id") < 50)
      val o = t(s, d, "orders").where(col("o_custkey") < 50)
      e.join(o, col("user_id") === col("o_custkey") &&
          col("ts") >= col("o_orderdate") && col("ts") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_hits"))
        .orderBy(col("o_orderpriority"))
    }),

    // as-of: latest event per user at or before a cutoff
    "r_asof_latest" -> ((s, d) => t(s, d, "events")
      .where(col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)))
      .where(col("rk") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .orderBy(col("user_id"))),

    // gap-based sessionization (30 min), SURVEY.md §2 row 56
    "r_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(coalesce(lag(col("ts"), 1).over(w), col("ts"))))
        .withColumn("new_session", when(col("gap_s") > 1800, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg((sum(col("new_session")) + 1).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // ntile quartiles over account balances
    "r_ntile" -> ((s, d) => t(s, d, "customer")
      .withColumn("quartile", ntile(4).over(Window.orderBy(col("c_acctbal"), col("c_custkey"))))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"), round(avg(col("c_acctbal")), 4).as("avg_bal"))
      .orderBy(col("quartile"))),

    // manual pivot via conditional aggregation
    "r_pivot_status_priority" -> ((s, d) => t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("urgent"),
        sum(when(col("o_orderpriority") === "2-HIGH", 1).otherwise(0)).as("high"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0).otherwise(1)).as("other"))
      .orderBy(col("o_orderstatus"))),

    // distinct aggregation
    "r_count_distinct" -> ((s, d) => t(s, d, "lineitem")
      .where(col("l_suppkey") < 10)
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_suppkey"))),

    // hourly tumbling aggregation (batch twin of the streaming window)
    "r_hourly_counts" -> ((s, d) => t(s, d, "events")
      .groupBy(date_format(date_trunc("HOUR", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("value_sum"))
      .orderBy(col("hour"), col("event_type")))
  )

  def oracleSql: Map[String, String] = Map(
    "r_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "r_join_orders_customer" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS segment_revenue,
        |count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_broadcast_dims" ->
      """SELECT r_name, round(sum(l_extendedprice), 2) AS revenue, count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_semi_join" ->
      """SELECT c_nationkey, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY 1""".stripMargin,
    "r_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem WHERE l_suppkey < 5 ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "r_topk_per_group" ->
      """SELECT p_brand, rk, p_partkey, price FROM (
        |  SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "r_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |coalesce(o_orderpriority, 'ALL') AS priority,
        |count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "r_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |coalesce(l_linestatus, 'ALL') AS status, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "r_setops" ->
      """SELECT nk FROM (
        |  SELECT DISTINCT c_nationkey AS nk FROM customer
        |  INTERSECT SELECT DISTINCT s_nationkey FROM supplier
        |  EXCEPT SELECT c_nationkey FROM customer GROUP BY 1 HAVING count(*) > 8
        |) ORDER BY nk""".stripMargin,
    "r_stats" ->
      """SELECT l_returnflag, round(min(l_extendedprice), 2) AS min_price,
        |round(max(l_extendedprice), 2) AS max_price,
        |round(avg(l_extendedprice), 4) AS avg_price,
        |round(stddev_samp(l_extendedprice), 4) AS sd_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_percentiles" ->
      """SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_json_extract" ->
      """SELECT event_type, sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS k_sum,
        |count(*) AS n FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_date_parts" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo, count(*) AS n_orders
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "r_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS uname, length(c_name) AS name_len,
        |substring(c_name, 1, 9) AS prefix,
        |levenshtein(c_mktsegment, 'BUILDING') AS lev_seg
        |FROM customer WHERE c_custkey <= 100 ORDER BY 1""".stripMargin,
    "r_lag_lead" ->
      """SELECT user_id, event_id,
        |round(value - coalesce(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 4) AS delta
        |FROM events WHERE user_id < 10 ORDER BY user_id, event_id""".stripMargin,
    "r_scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n_above FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_range_join" ->
      """SELECT o_orderpriority, count(*) AS n_hits
        |FROM events JOIN orders ON user_id = o_custkey
        |  AND ts >= o_orderdate AND ts < o_orderdate + INTERVAL 7 DAY
        |WHERE user_id < 50 AND o_custkey < 50
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_asof_latest" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,
    "r_sessionize" ->
      """SELECT user_id, sum(new_session) + 1 AS n_sessions, count(*) AS n_events FROM (
        |  SELECT user_id,
        |  CASE WHEN epoch(ts) - epoch(coalesce(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)) > 1800
        |  THEN 1 ELSE 0 END AS new_session
        |  FROM events) GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_ntile" ->
      """SELECT quartile, count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal FROM (
        |  SELECT c_acctbal, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        |  FROM customer) GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_pivot_status_priority" ->
      """SELECT o_orderstatus,
        |sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS urgent,
        |sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS high,
        |sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS other
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_count_distinct" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        |count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem WHERE l_suppkey < 10 GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_hourly_counts" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |event_type, count(*) AS n, round(sum(value), 4) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
