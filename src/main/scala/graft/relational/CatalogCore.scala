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

  /** Exact global NTILE(k) without the single-task `Window.orderBy()`:
    * range-partition by the sort key, sort within partitions, then
    * `rdd.zipWithIndex` (one light job for per-partition counts, then a
    * narrow map attaching offsets) gives a distributed global rank; the
    * standard NTILE bucket formula maps rank → bucket. Every stage
    * scales with partitions. RDD use is deliberate and contained here:
    * Catalyst has no distributed global row-number (SURVEY.md §4.3(d)).
    * Result is pinned to DuckDB's `ntile(k) OVER (ORDER BY ...)` by the
    * r_ntile oracle.
    */
  private def globalNtile(
      df: DataFrame, k: Int, sortCols: Seq[org.apache.spark.sql.Column],
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val sorted = df.repartitionByRange(parts, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val withIdx = sorted.rdd.zipWithIndex()
    val n = withIdx.count()
    val big = n % k            // first `big` buckets hold (n/k + 1) rows
    val sizeBig = n / k + 1
    val cutoff = big * sizeBig
    val sizeSmall = n / k
    val bucketed = withIdx.map { case (row, r0) =>
      val b =
        if (r0 < cutoff) r0 / sizeBig + 1
        else big + (r0 - cutoff) / sizeSmall + 1
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ b.toInt)
    }
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(outCol, org.apache.spark.sql.types.IntegerType))
    spark.createDataFrame(bucketed, schema)
  }

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

    // left anti: customers with no URGENT order (every customer has SOME
    // order in the testdata, so the plain variant proved nothing — this
    // one returns non-trivial rows at sf0.01)
    "r_anti_join" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
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
    // then EXCEPT nations with an above-average customer count (the
    // threshold is data-relative so the result is non-trivial at any sf)
    "r_setops" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk")).distinct()
      val su = t(s, d, "supplier").select(col("s_nationkey").as("nk")).distinct()
      val perNation = t(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n"))
      val avgN = perNation.agg(avg(col("n"))).first().getDouble(0)
      val big = perNation.where(col("n") > avgN).select(col("nk"))
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

    // range/interval join (SURVEY.md §2 rows 38/49): follow-up events
    // within 10 minutes of an earlier event by the same user — a genuine
    // interval self-join bounded by the equi key (user_id), returning
    // non-trivial rows at every sf (the old orders×events variant had
    // disjoint date ranges and always returned 0)
    "r_range_join" -> ((s, d) => {
      val e = t(s, d, "events").where(col("user_id") < 20)
      e.as("a").join(e.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.ts") > col("a.ts") &&
            col("b.ts") <= col("a.ts") + expr("INTERVAL 10 MINUTES"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(count(lit(1)).as("n_followups"))
        .orderBy(col("event_type"))
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

    // ntile quartiles over account balances — computed via the
    // distributed global-rank path (globalNtile below), NOT a
    // Window.orderBy with no partitionBy (that is a single-task global
    // sort: fine at sf0.1, a one-task driver at 100×). The oracle pins
    // the result to DuckDB's ntile(4), proving the distributed
    // computation matches standard NTILE semantics exactly.
    "r_ntile" -> ((s, d) => globalNtile(
        t(s, d, "customer").select(col("c_acctbal"), col("c_custkey")),
        4, Seq(col("c_acctbal"), col("c_custkey")), "quartile")
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"), round(avg(col("c_acctbal")), 4).as("avg_bal"))
      .orderBy(col("quartile"))),

    // GROUPING SETS (SURVEY.md §2 row 57, alongside rollup/cube): two
    // independent one-dimensional summaries in one pass
    "r_grouping_sets" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |  coalesce(o_orderpriority, 'ALL') AS priority,
          |  count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
          |ORDER BY status, priority""".stripMargin)
    }),

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
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
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
        |  EXCEPT SELECT c_nationkey FROM customer GROUP BY 1
        |    HAVING count(*) > (SELECT avg(n) FROM (
        |      SELECT count(*) AS n FROM customer GROUP BY c_nationkey))
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
    // CAST the sum: DuckDB sum(INT) yields HUGEINT (int128 → float64 in
    // pandas) while Spark yields BIGINT — the driver's value hash treats
    // 5.0 and 5 as different. Same for every summed-int oracle below.
    "r_json_extract" ->
      """SELECT event_type,
        |CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS BIGINT) AS k_sum,
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
      """SELECT a.event_type, count(*) AS n_followups
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |WHERE a.user_id < 20 AND b.user_id < 20
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_asof_latest" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,
    "r_sessionize" ->
      """SELECT user_id, CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
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
        |CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
        |CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
        |CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS other
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |coalesce(o_orderpriority, 'ALL') AS priority,
        |count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY 1, 2""".stripMargin,
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
