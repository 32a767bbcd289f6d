package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Reference-parity operators (SURVEY.md §2 A/B) + the analytics gap table
  * (§2 D) over the driver corpus. Every query here is a declarative
  * DataFrame plan — filters/projections reach the parquet scan, joins pick
  * broadcast for dimension tables, aggregates are partial (map-side
  * combine) by construction.
  */
object CoreQueries {

  /** Exact, order-independent sum of a double column via decimal widening
    * (see Q scaladoc). */
  private def moneySum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(25,$scale)")).cast("double")

  val all: Seq[Q] = Seq(
    // ---- A1+A2+A3 parity: multi-source scan → union → global time sort.
    // The compactor's entire SQL surface (kompactor.ts:107): scan N files,
    // SELECT *, ORDER BY time. row_number materializes the sort order into
    // values so the oracle hash actually verifies ordering.
    //
    // The global rank is computed DISTRIBUTED (round-1 nit: a bare
    // Window.orderBy is one sequential partition): rows shard by hour of
    // the time axis — monotone in the sort key — rank = local row_number
    // within the shard + the broadcast prefix-count of earlier shards.
    // Same two-pass scan as q45's packing; the only global window runs
    // over the tiny per-shard count table.
    // NOTE on precision: the engine keeps full int64 ns internally; queries
    // that EXPORT timestamps for the oracle emit µs (ts_ns div 1000) because
    // DuckDB 1.x truncates parquet timestamp[ns] to µs on read.
    Q(
      "a_scan_sort_merge",
      (s, d) => {
        val shardUs = 3600L * 1000000L // 1-hour shards of the time axis
        val e = Tables.events(s, d)
          .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"))
        // two disjoint "files" unioned back = multi-file scan semantics
        val merged = e.filter(col("event_id") % 2 === 0)
          .unionAll(e.filter(col("event_id") % 2 === 1))
          .withColumn("shard", expr(s"ts_us div $shardUs"))
        val wLocal = Window.partitionBy(col("shard"))
          .orderBy(col("ts_us"), col("event_id"))
        // TINY-TABLE INVARIANT: this global window runs over the
        // per-shard COUNT table (#shards rows ≈ time-span/shardUs, never
        // the events themselves) — bounded by construction, so the
        // single-partition stage is O(shards); WindowExec's global-window
        // WARN is silenced for exactly this class of site
        // (Sessions.quietBenignWarnings).
        val wShard = Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = merged.groupBy(col("shard"))
          .agg(count(lit(1)).as("n"))
          .withColumn("offset", coalesce(sum(col("n")).over(wShard), lit(0L)))
          .select(col("shard"), col("offset"))
        merged
          .withColumn("local_rn", row_number().over(wLocal).cast("bigint"))
          .join(broadcast(offsets), "shard")
          .select(col("event_id"), col("ts_us"),
            (col("local_rn") + col("offset")).as("rn"))
      },
      Some("""SELECT event_id, epoch_us(ts) AS ts_us,
             |  row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn
             |FROM events""".stripMargin)),

    // ---- TPC-H Q1-shaped pricing summary: filter → groupBy → 8 aggregates.
    Q(
      "q1_pricing_summary",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            moneySum(col("l_extendedprice")).as("sum_base_price"),
            moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("sum_disc_price"),
            moneySum(
              (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) *
                (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
            (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (moneySum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  SUM(l_quantity) AS sum_qty,
              |  ${Q.moneySum("l_extendedprice")} AS sum_base_price,
              |  ${Q.moneySum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
              |  ${Q.moneySum("(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)", 6)} AS sum_charge,
              |  SUM(l_quantity) / COUNT(1) AS avg_qty,
              |  ${Q.moneySum("l_extendedprice")} / COUNT(1) AS avg_price,
              |  COUNT(1) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- Top-k: Catalyst plans TakeOrderedAndProject (no global sort).
    Q(
      "q2_topk_orders",
      (s, d) =>
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // ---- 3-way join (fact ⋈ fact ⋈ broadcast dim) + group agg.
    Q(
      "q3_segment_revenue",
      (s, d) => {
        val l = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
        val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT c_mktsegment,
              |  ${Q.moneySum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
              |  COUNT(1) AS n_items
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment""".stripMargin)),

    // ---- Semi join (EXISTS).
    Q(
      "q4_semi_join",
      (s, d) => {
        val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
          .select("l_orderkey")
        Tables.orders(s, d)
          .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""SELECT o_orderpriority, COUNT(1) AS n_orders FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
             |GROUP BY o_orderpriority""".stripMargin)),

    // ---- Anti join (NOT EXISTS).
    Q(
      "q5_anti_join",
      (s, d) => {
        // customers with no high-value order (non-empty at every SF,
        // unlike "no orders at all" which TPC-H-ish data never has)
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0)
          .select("o_custkey")
        Tables.customer(s, d)
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"),
            moneySum(col("c_acctbal")).as("sum_acctbal"))
      },
      Some(s"""SELECT c_mktsegment, COUNT(1) AS n_customers,
              |  ${Q.moneySum("c_acctbal")} AS sum_acctbal
              |FROM customer
              |WHERE NOT EXISTS (SELECT 1 FROM orders
              |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
              |GROUP BY c_mktsegment""".stripMargin)),

    // ---- Window functions: per-group top-N with unique tie-break.
    Q(
      "q6_window_topn",
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        Tables.lineitem(s, d)
          .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .filter(col("rn") <= 3)
      },
      Some("""SELECT * FROM (
             |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             |    row_number() OVER (PARTITION BY l_suppkey
             |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
             |  FROM lineitem) WHERE rn <= 3""".stripMargin)),

    // ---- Running / framed window aggregates.
    Q(
      "q7_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
          .withColumn("run_spend",
            sum(col("o_totalprice").cast("decimal(25,2)"))
              .over(w.rowsBetween(Window.unboundedPreceding, 0))
              .cast("double"))
          .withColumn("prev_order", lag(col("o_orderkey"), 1).over(w))
          .withColumn("rk", rank().over(
            Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .cast("bigint"))
          .drop("o_orderdate")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend,
             |  lag(o_orderkey, 1) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
             |  rank() OVER (
             |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |FROM orders""".stripMargin)),

    // ---- ROLLUP (grouping sets) with grouping() disambiguation markers.
    Q(
      "q8_rollup",
      (s, d) =>
        Tables.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity")).as("sum_qty"),
            moneySum(col("l_extendedprice")).as("sum_price"),
            grouping(col("l_returnflag")).cast("bigint").as("g_rf"),
            grouping(col("l_linestatus")).cast("bigint").as("g_ls")),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(1) AS n,
              |  SUM(l_quantity) AS sum_qty,
              |  ${Q.moneySum("l_extendedprice")} AS sum_price,
              |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
              |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // ---- Exact distinct aggregates.
    Q(
      "q9_distinct_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
             |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(1) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- approx_count_distinct: HLL sketches differ across engines by
    // design, so the oracle checks the EXACT distinct instead and the spec
    // (DedupSpec) asserts the approx lands within rel. error of exact.
    Q(
      "q10_set_ops",
      (s, d) => {
        val o = Tables.orders(s, d)
        val a = o.filter(col("o_orderstatus") === "O").select("o_custkey")
        val b = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        a.intersect(b).withColumnRenamed("o_custkey", "custkey")
          .withColumn("which", lit("both"))
          .unionAll(
            a.except(b).withColumnRenamed("o_custkey", "custkey")
              .withColumn("which", lit("o_only")))
      },
      Some("""SELECT o_custkey AS custkey, 'both' AS which FROM (
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |  INTERSECT
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
             |UNION ALL
             |SELECT o_custkey AS custkey, 'o_only' AS which FROM (
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |  EXCEPT
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin)),

    // ---- Scalar function families: string / regex / math / conditional.
    Q(
      "q11_scalar_funcs",
      (s, d) =>
        Tables.part(s, d).select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("name8"),
          length(col("p_name")).cast("bigint").as("name_len"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          (col("p_size") % 7).as("size_mod"),
          round(col("p_retailprice") * 1.1, 2).as("uplift"),
          round(log(col("p_size").cast("double") + 1.0), 6).as("ln_size"),
          when(col("p_size") > 25, "big")
            .when(col("p_size") > 10, "mid")
            .otherwise("small").as("size_class"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type")),
      Some("""SELECT p_partkey,
             |  upper(substr(p_name, 1, 8)) AS name8,
             |  length(p_name) AS name_len,
             |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
             |  p_size % 7 AS size_mod,
             |  round(p_retailprice * 1.1, 2) AS uplift,
             |  round(ln(CAST(p_size AS DOUBLE) + 1.0), 6) AS ln_size,
             |  CASE WHEN p_size > 25 THEN 'big'
             |       WHEN p_size > 10 THEN 'mid' ELSE 'small' END AS size_class,
             |  concat_ws('|', p_brand, p_type) AS brand_type
             |FROM part""".stripMargin)),

    // ---- Date/time function family over timestamp[ms].
    Q(
      "q12_date_funcs",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(
            year(col("o_orderdate")).cast("bigint").as("y"),
            month(col("o_orderdate")).cast("bigint").as("m"),
            date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .agg(count(lit(1)).as("n_orders"),
            moneySum(col("o_totalprice")).as("sum_price")),
      Some(s"""SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
              |  strftime(o_orderdate, '%Y-%m') AS ym,
              |  COUNT(1) AS n_orders, ${Q.moneySum("o_totalprice")} AS sum_price
              |FROM orders GROUP BY 1, 2, 3""".stripMargin)),

    // ---- JSON extraction (events.props) + conditional agg.
    Q(
      "q13_json_extract",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high")),
      Some("""SELECT event_type, COUNT(1) AS n,
             |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
             |  CAST(SUM(CASE WHEN CAST(props->>'k' AS BIGINT) > 50
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
             |FROM events GROUP BY event_type""".stripMargin)),

    // ---- ns-epoch time bucketing (int64 division — no double path, no
    // precision loss above 2^53; SURVEY §1.1 / §7.4 bug 1).
    Q(
      "q14_time_bucket",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("hour_bucket", expr("ts_ns div 3600000000000"))
          .groupBy(col("hour_bucket"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            moneySum(col("value")).as("sum_value"),
            min(expr("ts_ns div 1000")).as("min_ts_us"),
            max(expr("ts_ns div 1000")).as("max_ts_us")),
      Some(s"""SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
              |  COUNT(1) AS n, ${Q.moneySum("value")} AS sum_value,
              |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // ---- As-of join (time-series enrichment): for each click, the most
    // recent strictly-earlier error by the same user. Spark lacks a native
    // as-of join; the scalable formulation is union + last_value window —
    // one shuffle on user_id, no range cross-join blowup. (Strategy lives
    // in operators.AsOf; q33 exercises its broadcast-probe path.)
    Q(
      "q15_asof_join",
      (s, d) => {
        // µs precision on BOTH sides (DuckDB truncates parquet ns to µs);
        // errors deduped to one per (user, µs) so the "most recent" pick is
        // well-defined at equal timestamps.
        val e = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
        val clicks = e.filter(col("event_type") === "click")
          .select("user_id", "ts_us", "event_id")
        val errors = e.filter(col("event_type") === "error")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max(col("event_id")).as("err_id"))
        graft.operators.AsOf.unionWindow(clicks, errors,
          "user_id", "ts_us", "event_id", "err_id")
      },
      Some("""SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us,
             |  b.err_id
             |FROM (SELECT * FROM events WHERE event_type = 'click') a
             |ASOF LEFT JOIN (
             |  SELECT user_id, epoch_us(ts) AS ts_us, MAX(event_id) AS err_id
             |  FROM events WHERE event_type = 'error' GROUP BY 1, 2) b
             |  ON a.user_id = b.user_id AND epoch_us(a.ts) > b.ts_us""".stripMargin)),

    // ---- Sessionization (batch form of streaming session_window):
    // 30-minute inactivity gap per user, µs precision in both engines.
    Q(
      "q16_sessionize",
      (s, d) => {
        val gapUs = 30L * 60 * 1000000
        val e = Tables.events(s, d)
          .withColumn("ts_us", expr("ts_ns div 1000"))
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        e.withColumn("prev_us", lag(col("ts_us"), 1).over(wOrd))
          .withColumn("new_sess",
            when(col("prev_us").isNull || col("ts_us") - col("prev_us") >= gapUs, 1)
              .otherwise(0))
          .withColumn("sess_id",
            sum(col("new_sess")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(
            min(col("ts_us")).as("sess_start_us"),
            max(col("ts_us")).as("sess_last_us"),
            count(lit(1)).as("n_events"),
            moneySum(col("value")).as("sum_value"))
          .drop("sess_id")
      },
      Some(s"""WITH t AS (
              |  SELECT user_id, epoch_us(ts) AS ts_us, value,
              |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_us
              |  FROM events),
              |m AS (
              |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000
              |    THEN 1 ELSE 0 END AS new_sess FROM t),
              |g AS (
              |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM m)
              |SELECT user_id, MIN(ts_us) AS sess_start_us, MAX(ts_us) AS sess_last_us,
              |  COUNT(1) AS n_events, ${Q.moneySum("value")} AS sum_value
              |FROM g GROUP BY user_id, sess_id""".stripMargin)),

    // ---- CUBE grouping sets (rollup's full-lattice sibling).
    Q(
      "q18_cube",
      (s, d) =>
        Tables.orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            moneySum(col("o_totalprice")).as("sum_price"),
            grouping(col("o_orderstatus")).cast("bigint").as("g_s"),
            grouping(col("o_orderpriority")).cast("bigint").as("g_p")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n,
              |  ${Q.moneySum("o_totalprice")} AS sum_price,
              |  GROUPING(o_orderstatus) AS g_s, GROUPING(o_orderpriority) AS g_p
              |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // ---- approx_count_distinct (HyperLogLog++): sketches are
    // engine-specific by design, so no value oracle — the driver records
    // the rows-only check and ApproxSpec asserts relative error vs exact.
    Q(
      "q19_approx_distinct",
      // The HLL estimate itself cannot hash-match a different engine's
      // sketch — so the gate-able surface is (a) the exact counts and
      // (b) an in-query accuracy bound on the sketch (rsd 0.02 → 6% is
      // 3σ). The oracle emits the exact counts plus literal TRUE: if the
      // sketch ever drifts outside its bound, the boolean flips and the
      // driver's hash gate goes red — the sketch is verified, not just
      // row-counted. (ApproxSpec additionally bounds it numerically.)
      // The sketch and exact aggregations run SEPARATELY and join on the
      // tiny grouped result: mixed exact-distinct + HLL in one agg makes
      // Catalyst's Expand plan carry a 4 KB HLL buffer behind every
      // partial (group × distinct-value) key — measured 4 s vs 1 s at
      // sf0.1. Apart, each is its own well-shaped hash aggregate.
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val exact = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_orderkey")).as("n_orders"))
        val sketch = li.groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
        exact.join(sketch, "l_returnflag")
          .select(col("l_returnflag"), col("n_parts"), col("n_orders"),
            (abs(col("approx_parts") - col("n_parts")).cast("double") <=
              lit(0.06) * col("n_parts").cast("double")).as("parts_ok"),
            (abs(col("approx_orders") - col("n_orders")).cast("double") <=
              lit(0.06) * col("n_orders").cast("double")).as("orders_ok"))
      },
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS n_parts,
             |  COUNT(DISTINCT l_orderkey) AS n_orders,
             |  TRUE AS parts_ok, TRUE AS orders_ok
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // ---- Exact interpolated percentiles (Spark `percentile` == DuckDB
    // `quantile_cont`); rounded to absorb last-ulp interpolation noise.
    Q(
      "q20_percentiles",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          // ONE percentile buffer for all three quantiles (the per-group
          // value buffer is the whole cost of an exact percentile; three
          // separate calls triple it — measured 2.8 s -> 1.0 s at sf0.1)
          .agg(
            expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"),
            round(element_at(col("ps"), 1), 4).as("p50"),
            round(element_at(col("ps"), 2), 4).as("p90"),
            round(element_at(col("ps"), 3), 4).as("p99"),
            col("n")),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
             |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
             |  COUNT(1) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- approx_percentile (t-digest-style sketch): the scale path next
    // to q20's exact form — exact percentile holds every group value in
    // one buffer (state O(group), parallelism O(groups)); the sketch is
    // O(1) per group and partial-aggregatable. Sketches are
    // engine-specific, so rows-only gate + ApproxPercentileSpec accuracy
    // bound vs the exact values. Accuracy 1000 (r8 verdict #5: the
    // 10000 default made q34 the 4th most expensive query on the
    // contended driver host — the Greenwald-Khanna buffer each
    // partition serializes scales with accuracy, and 1000 keeps rank
    // error at 0.1% of the group, 50x inside the 5% value gate).
    Q(
      "q34_approx_percentiles",
      // Same gating pattern as q19: the t-digest estimate can't
      // hash-match cross-engine, so the output carries the exact
      // percentiles (hash-gated against quantile_cont) plus an in-query
      // 5%-relative accuracy bound on each sketch value, which the
      // oracle pins to literal TRUE. Scalar columns only — the compare
      // layer can't hash array cells.
      (s, d) => {
        def ap(i: Int) = element_at(col("aps"), i)
        def ep(i: Int) = element_at(col("eps"), i)
        def ok(i: Int) = abs(ap(i) - ep(i)) <= lit(0.05) * ep(i)
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)")
            .as("aps"),
            expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("eps"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"),
            round(ep(1), 4).as("ep50"), round(ep(2), 4).as("ep90"),
            round(ep(3), 4).as("ep99"),
            ok(1).as("ap50_ok"), ok(2).as("ap90_ok"), ok(3).as("ap99_ok"),
            col("n"))
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS ep50,
             |  round(quantile_cont(l_extendedprice, 0.9), 4) AS ep90,
             |  round(quantile_cont(l_extendedprice, 0.99), 4) AS ep99,
             |  TRUE AS ap50_ok, TRUE AS ap90_ok, TRUE AS ap99_ok,
             |  COUNT(1) AS n
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // ---- Native session_window operator in batch mode (the streaming
    // session operator — q16 is the windowed-emulation twin).
    Q(
      "q21_session_window",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("event_time", timestamp_micros(expr("ts_ns div 1000")))
          .groupBy(session_window(col("event_time"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            moneySum(col("value")).as("sum_value"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("sess_start_us"),
            col("n_events"), col("sum_value")),
      Some(s"""WITH t AS (
              |  SELECT user_id, epoch_us(ts) AS ts_us, value,
              |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_us
              |  FROM events),
              |g AS (
              |  SELECT *, SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000
              |    THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts_us
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM t)
              |SELECT user_id, MIN(ts_us) AS sess_start_us,
              |  COUNT(1) AS n_events, ${Q.moneySum("value")} AS sum_value
              |FROM g GROUP BY user_id, sess_id""".stripMargin)),

    // ---- Range join via time-bucket decomposition: "clicks within ±5
    // minutes of each error, same user". The naive inequality join is a
    // per-user cross product; bucketing time into window-width cells turns
    // it into an equi-join on (user, cell) over at most 3 adjacent cells —
    // the standard scalable range-join layout. Exact filter re-applied
    // after the equi-join, so semantics equal the naive form (the oracle).
    Q(
      "q22_range_join",
      (s, d) => {
        val win = 5L * 60 * 1000000 // ±5 minutes in µs
        val e = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id"),
            col("ts_us").as("err_us"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts_us").as("click_us"))
        val cells = errors
          .withColumn("off", explode(array(lit(-1L), lit(0L), lit(1L))))
          .withColumn("cell", expr(s"err_us div $win") + col("off"))
          .drop("off")
        val clickCells = clicks.withColumn("cell", expr(s"click_us div $win"))
        cells.join(clickCells,
            col("user_id") === col("c_user") && cells("cell") === clickCells("cell"))
          .filter(abs(col("click_us") - col("err_us")) <= win)
          .groupBy(col("err_id"), col("user_id"), col("err_us"))
          .agg(count(lit(1)).as("n_nearby_clicks"),
            min(col("click_us")).as("first_click_us"))
      },
      Some("""SELECT a.event_id AS err_id, a.user_id, epoch_us(a.ts) AS err_us,
             |  COUNT(1) AS n_nearby_clicks, MIN(epoch_us(b.ts)) AS first_click_us
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id
             | AND a.event_type = 'error' AND b.event_type = 'click'
             | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 300000000
             |GROUP BY 1, 2, 3""".stripMargin)),

    // ---- Multi-way broadcast join chain through the dimension snowflake.
    Q(
      "q17_snowflake_join",
      (s, d) => {
        val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        val n = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
        val r = Tables.region(s, d).select("r_regionkey", "r_name")
        val o = Tables.orders(s, d).select("o_custkey", "o_totalprice")
        // customer SCALES WITH FACTS (unlike nation/region): no forced
        // broadcast — Catalyst/AQE picks broadcast while its measured
        // size is under the threshold and flips to a shuffle join when a
        // bigger corpus outgrows it (the dims-scaled octave's lesson: a
        // hard hint here is a driver OOM at 100 TB)
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
            moneySum(col("o_totalprice")).as("sum_price"))
      },
      Some(s"""SELECT r_name, n_name, COUNT(1) AS n_orders,
              |  ${Q.moneySum("o_totalprice")} AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name, n_name""".stripMargin))
  )
}
