package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType, StringType, StructField, StructType}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator family from SURVEY.md §2 (or
  * a beyond-reference training-data op) over the driver's testdata tables;
  * `oracleSql` carries the equivalent DuckDB SQL for the correctness gate.
  *
  * Float-compare discipline: any SUM over double columns is cast to
  * decimal BEFORE aggregating (decimal addition is exact and
  * order-independent, double addition is not), then the final value is
  * cast back to double — both engines then produce bit-identical results
  * regardless of partition/row order. MIN/MAX over doubles are exact and
  * need no cast.
  */
object SparkEntry {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** sum(cast(c as decimal(p,s))) — exact, order-independent. Left as
    * decimal (NOT cast back to double): the gate reads both sides through
    * DuckDB, whose decimal→float64 conversion then matches bit-for-bit,
    * whereas Spark's and DuckDB's own decimal→double casts differ in the
    * last ulp.
    */
  private def dsum(c: Column, prec: Int = 28, scale: Int = 10): Column =
    sum(c.cast(DecimalType(prec, scale)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── A-family: aggregations ────────────────────────────────────────────
    // A2/A3 + F2: wide hash aggregation (TPC-H Q1 shape); partial agg
    // (map-side combine) keeps the shuffle tiny at any scale.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 18, 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 18, 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .as("sum_charge"),
          count(lit(1)).as("count_order"))
    }),
    // P4 + A2: tight range-filtered scan-aggregate (TPC-H Q6 shape);
    // predicates push to the parquet scan.
    "q6_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    }),
    // A3: grouped MIN/MAX + midrange-"AVG" — the reference's datamart daily
    // rollup quirk (AVG is (max+min)/2, not the mean; load_datamart.py:128).
    "a3_midrange_by_brand" -> ((s, dir) => {
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(max("p_retailprice").as("max_price"), min("p_retailprice").as("min_price"))
        .withColumn("avg_price", (col("max_price") + col("min_price")) / 2)
    }),
    // A4 + F7: quarterly trend rollup with Q-label concat
    // (load_datamart.py:141-158).
    "a4_quarterly_trend" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("calendar_year"),
          concat(lit("Q"), quarter(col("o_orderdate")).cast("string")).as("quarter_name"),
          col("o_orderpriority"))
        .agg(
          min("o_totalprice").as("quarter_min_price"),
          max("o_totalprice").as("quarter_max_price"))
        .withColumn("quarter_avg_price", (col("quarter_min_price") + col("quarter_max_price")) / 2)
    }),
    // A1: scalar COUNT existence gate (check_status.py:19-30 shape).
    "a1_count_gate" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("event_type") === "purchase" && to_date(col("ts")) === lit("2024-01-15").cast("date"))
        .agg(count(lit(1)).as("n_today"))
    }),
    // A6: latest-per-group via window row_number (load_staging.py:89-102's
    // per-row ORDER BY ... LIMIT 1 made set-based).
    "a6_latest_event_per_user" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
    }),

    // ── J-family: joins ──────────────────────────────────────────────────
    // J6 + A: star join, fact×fact shuffle join + broadcast dim.
    "j6_revenue_by_nation" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),
    // J1: left-outer dimension lookup with sentinel default
    // (db_control_sql.sql:195-198 shape: missing lookup → 'Unknown').
    "j1_left_lookup_sentinel" -> ((s, dir) => {
      val bigParts = t(s, dir, "part").filter(col("p_size") > 40).select("p_partkey", "p_brand")
      t(s, dir, "lineitem")
        .join(broadcast(bigParts), col("l_partkey") === col("p_partkey"), "left")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          coalesce(col("p_brand"), lit("Unknown")).as("brand"))
    }),
    // J2: anti join (new-key detection shape, db_control_sql.sql:228-236).
    "j2_customers_without_orders" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),
    // J3: inner equi join + NULL-rejecting <> residual (SCD2 change
    // detection, db_control_sql.sql:241-252). The staged side derives
    // deterministic mutations incl. NULLs to pin MySQL <> semantics.
    "j3_change_detection" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val staged = part.select(
        col("p_partkey"),
        when(col("p_partkey") % 10 === 0, col("p_retailprice") + lit(100.0))
          .otherwise(col("p_retailprice")).as("new_price"),
        when(col("p_partkey") % 50 === 0, lit(null).cast("int"))
          .otherwise(col("p_size")).as("new_size"))
      part.alias("p")
        .join(staged.alias("n"), col("p.p_partkey") === col("n.p_partkey"))
        .where(col("p.p_retailprice") =!= col("n.new_price") || col("p.p_size") =!= col("n.new_size"))
        .select(col("p.p_partkey").as("p_partkey"))
    }),
    // J5: left-semi join (re-insert key-list shape, db_control_sql.sql:261-271).
    "j5_orders_with_bulk_items" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(
          t(s, dir, "lineitem").filter(col("l_quantity") > 45),
          col("o_orderkey") === col("l_orderkey"),
          "left_semi")
        .select("o_orderkey", "o_totalprice")
    }),
    // J9: set-based surrogate-key assignment replacing the reference's
    // per-row lookup-or-insert loop (load_dwh.py:141-227).
    "j9_brand_surrogate_keys" -> ((s, dir) => {
      val emptyDim = s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("brand_sk", LongType),
          StructField("brand_name", StringType))))
      val incoming = t(s, dir, "part").select(col("p_brand").as("brand_name"))
      SurrogateKeys.ensureKeys(emptyDim, incoming, Seq("brand_name"), "brand_sk")
    }),

    // ── P-family: projections / filters ──────────────────────────────────
    // P2: text-substance quality filter (db_control_sql.sql:199).
    "p2_quality_filter" -> ((s, dir) => {
      val part = t(s, dir, "part")
      part
        .filter(Clean.qualityFilter(Seq(col("p_name"), col("p_brand"), col("p_type")), 24))
        .select("p_partkey", "p_name")
    }),

    // ── S-family: sinks / merge primitives ───────────────────────────────
    // S7: upsert (INSERT..ON DUPLICATE KEY UPDATE, load_aggregate.py:90-107).
    "s7_upsert_orders" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val updates = orders
        .filter(col("o_orderstatus") === "O")
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      Upsert.upsert(orders, updates, Seq("o_orderkey"))
    }),
    // S8: insert-ignore (INSERT IGNORE..SELECT, db_staging_sql.sql:94-96).
    "s8_insert_ignore_parts" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val target = part.filter(col("p_partkey") % 2 === 0).select("p_partkey", "p_name")
      val incoming = part.select(col("p_partkey"), upper(col("p_name")).as("p_name"))
      Upsert.insertIgnore(target, incoming, Seq("p_partkey"))
    }),

    // ── Set ops (SURVEY §2.6) ────────────────────────────────────────────
    "set_union_nations" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
    }),
    "set_except_nations" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    }),

    // ── W-family: windows / sort / top-k ─────────────────────────────────
    "w1_top3_orders_per_segment" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
    }),
    "w2_top10_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    }),

    // ── F-family: scalar functions ───────────────────────────────────────
    // F8: first-match-wins substring classification (load_dwh.py:142-153),
    // retargeted at p_name color words.
    "f8_classify_brand" -> ((s, dir) => {
      val rules = Seq("green" -> "Green", "blue" -> "Blue", "red" -> "Red", "small" -> "Small")
      t(s, dir, "part")
        .select(col("p_partkey"), Clean.classifyBrand(col("p_name"), rules).as("brand_class"))
    }),
    // F13-ish: JSON extraction from the events props payload.
    "f13_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") > 50)
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        |  SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS sum_disc_price,
        |  SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(28,10))) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT SUM(CAST(l_extendedprice*l_discount AS DECIMAL(28,10))) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "a3_midrange_by_brand" ->
      """SELECT p_brand, MAX(p_retailprice) AS max_price, MIN(p_retailprice) AS min_price,
        |  (MAX(p_retailprice)+MIN(p_retailprice))/2 AS avg_price
        |FROM part GROUP BY p_brand""".stripMargin,
    "a4_quarterly_trend" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS calendar_year,
        |  'Q' || CAST(quarter(o_orderdate) AS VARCHAR) AS quarter_name, o_orderpriority,
        |  MIN(o_totalprice) AS quarter_min_price, MAX(o_totalprice) AS quarter_max_price,
        |  (MIN(o_totalprice)+MAX(o_totalprice))/2 AS quarter_avg_price
        |FROM orders GROUP BY 1, 2, 3""".stripMargin,
    "a1_count_gate" ->
      """SELECT COUNT(*) AS n_today FROM events
        |WHERE event_type = 'purchase' AND CAST(ts AS DATE) = DATE '2024-01-15'""".stripMargin,
    "a6_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "j6_revenue_by_nation" ->
      """SELECT n_name,
        |  SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "j1_left_lookup_sentinel" ->
      """SELECT l_orderkey, l_linenumber, COALESCE(p_brand, 'Unknown') AS brand
        |FROM lineitem LEFT JOIN (SELECT p_partkey, p_brand FROM part WHERE p_size > 40) p
        |ON l_partkey = p_partkey""".stripMargin,
    "j2_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "j3_change_detection" ->
      """WITH staged AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 10 = 0 THEN p_retailprice + 100.0 ELSE p_retailprice END AS new_price,
        |    CASE WHEN p_partkey % 50 = 0 THEN NULL ELSE p_size END AS new_size
        |  FROM part)
        |SELECT p.p_partkey FROM part p JOIN staged n ON p.p_partkey = n.p_partkey
        |WHERE p.p_retailprice <> n.new_price OR p.p_size <> n.new_size""".stripMargin,
    "j5_orders_with_bulk_items" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)""".stripMargin,
    "j9_brand_surrogate_keys" ->
      """SELECT CAST(row_number() OVER (ORDER BY brand_name) AS BIGINT) AS brand_sk, brand_name
        |FROM (SELECT DISTINCT p_brand AS brand_name FROM part)""".stripMargin,
    "p2_quality_filter" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE length(COALESCE(p_name,'')) + length(COALESCE(p_brand,'')) + length(COALESCE(p_type,'')) > 24""".stripMargin,
    "s7_upsert_orders" ->
      """WITH updates AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1.0 AS o_totalprice,
        |         o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderstatus = 'O')
        |SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        |UNION ALL SELECT * FROM updates""".stripMargin,
    "s8_insert_ignore_parts" ->
      """WITH target AS (SELECT p_partkey, p_name FROM part WHERE p_partkey % 2 = 0),
        |  incoming AS (SELECT p_partkey, upper(p_name) AS p_name FROM part)
        |SELECT * FROM target
        |UNION ALL
        |SELECT * FROM incoming WHERE p_partkey NOT IN (SELECT p_partkey FROM target)""".stripMargin,
    "set_union_nations" ->
      "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier",
    "set_except_nations" ->
      "SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier",
    "w1_top3_orders_per_segment" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) WHERE rn <= 3""".stripMargin,
    "w2_top10_orders" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "f8_classify_brand" ->
      """SELECT p_partkey,
        |  CASE WHEN contains(lower(p_name), 'green') THEN 'Green'
        |       WHEN contains(lower(p_name), 'blue') THEN 'Blue'
        |       WHEN contains(lower(p_name), 'red') THEN 'Red'
        |       WHEN contains(lower(p_name), 'small') THEN 'Small'
        |       ELSE 'Khác' END AS brand_class
        |FROM part""".stripMargin,
    "f13_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50""".stripMargin
  )
}
