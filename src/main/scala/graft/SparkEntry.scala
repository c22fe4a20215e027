package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType, StringType, StructField, StructType}

import graft.control.RunLedger
import graft.operators._
import graft.sources.CsvIngest

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
  *
  * The final cast to double matters: round 1 kept SUMs as DecimalType and
  * the driver gate flagged hash_match:false on exactly the 11 queries
  * with decimal output columns (values proven identical — the mismatch
  * was the decimal *representation* in the driver's hasher). DOUBLE is
  * representation-free: both engines hand the comparator the same float64
  * bits because the decimal value being cast is identical on both sides.
  */
object SparkEntry {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** events.ts has shipped as both TIMESTAMP(NANOS) — surfaced as long
    * nanos under `nanosAsLong` — and native TIMESTAMP(MICROS); the
    * streaming gates normalize to a micro-precision LTZ timestamp
    * (session TZ is UTC) whichever the testdata carries, mirroring
    * [[Tables.load]]'s schema-adaptive conversion.
    */
  private def eventTsToMicros(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  /** sum(cast(c as decimal(p,s))) cast to double — the accumulation is
    * exact and order-independent (decimal addition), and the single final
    * decimal→double rounding is deterministic on the identical decimal
    * value, so Spark and the DuckDB oracle emit the same float64 bits.
    * (Verified bitwise at sf0.001/0.01/0.1 by scripts/check_bitwise.py.)
    */
  private def dsum(c: Column, prec: Int = 28, scale: Int = 10): Column =
    sum(c.cast(DecimalType(prec, scale))).cast("double")

  /** Reference-derived fixture corpus (FIXTURES.md §A), resolved whether
    * the JVM starts in /root/repo or elsewhere.
    */
  private def fixturesDir: String =
    Seq("src/test/resources/fixtures", "/root/repo/src/test/resources/fixtures")
      .find(p => new java.io.File(p).isDirectory)
      .getOrElse(sys.error("fixtures directory not found"))

  /** The reference's control-DB dump holding the SQL_COMMANDS rows. */
  private val referenceControlSql = "/root/reference/sql_script/db_control_sql.sql"

  /** Decode one SQL_COMMANDS blob from the public reference snapshot — a
    * missing snapshot fails the verbatim-replay gates (sp5/sp6) with a
    * clear, named error instead of a raw IO stack.
    */
  private def referenceBlob(command: String): String = {
    if (!new java.io.File(referenceControlSql).isFile)
      sys.error(s"reference snapshot unavailable at $referenceControlSql " +
        s"(required by the verbatim $command replay gate)")
    graft.control.SqlRegistry.loadReferenceCommand(referenceControlSql, command)
  }

  /** De-skewed per-source running token total (two-phase distributed
    * prefix sum), shared by c4_token_budget and c5_pack_sequences.
    *
    * A plain `Window.partitionBy("source")` funnels each entire source
    * domain through ONE reducer task — fine at sf0.1 where a source is
    * ~1k docs, a single-task straggler at 100 TB where one domain can be
    * 30% of the corpus. Instead:
    *   1. range-bucket each row on the first two hex chars of its md5
    *      rank `rk` (uniform, and a prefix of the sort key — so each of
    *      the 256 buckets is a CONTIGUOUS range of the (rk, doc_id)
    *      order, and equal rk always lands in the same bucket);
    *   2. local running totals inside (source, bkt) — 256× smaller
    *      reducer tasks, bounded regardless of domain skew;
    *   3. per-bucket totals (map-side partial agg → #sources × 256 rows
    *      at ANY corpus size) turned into exclusive prefix offsets by a
    *      window over that tiny frame;
    *   4. broadcast the offsets back and add.
    * Long addition is associative, so the result is bit-identical to the
    * single-window form the DuckDB oracle runs.
    *
    * Input must carry `source`, `rk` (md5 hex), `doc_id`, `n_tok`;
    * output adds `cum_tokens` (the inclusive per-source running total in
    * (rk, doc_id) order).
    */
  private def cumTokensBySource(docs: DataFrame): DataFrame = {
    val bucketed = docs.withColumn("bkt",
      conv(substring(col("rk"), 1, 2), 16, 10).cast("int"))
    val wLocal = Window.partitionBy("source", "bkt")
      .orderBy(col("rk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOffset = Window.partitionBy("source").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("source", "bkt")
      .agg(sum(col("n_tok")).as("bkt_tok"))
      .select(col("source"), col("bkt"),
        coalesce(sum(col("bkt_tok")).over(wOffset), lit(0L)).as("tok_offset"))
    bucketed
      .withColumn("local_cum", sum(col("n_tok")).over(wLocal))
      .join(broadcast(offsets), Seq("source", "bkt"))
      .withColumn("cum_tokens", col("local_cum") + col("tok_offset"))
  }

  /** Shared SCD2 two-snapshot scenario over `part`: day 2 changes prices
    * (÷10), drops rows (÷7) and adds new keys (÷13). Used by
    * scd2_two_rounds, a2_scd_out_params and sp3_log_message.
    */
  private def scdSnaps(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val snap1 = t(s, dir, "part")
      .select(col("p_partkey").as("id"), col("p_retailprice").as("price"), col("p_size").as("psize"))
    val snap2 = snap1
      .filter(col("id") % 7 =!= 0)
      .withColumn("price", when(col("id") % 10 === 0, col("price") + 100.0).otherwise(col("price")))
      .unionByName(snap1.filter(col("id") % 13 === 0).withColumn("id", col("id") + 100000))
    (snap1, snap2)
  }

  /** Round-2 SCD2 stats over [[scdSnaps]] (shared by a2/sp3 gates). */
  private def scdRound2Stats(s: SparkSession, dir: String): ScdStats = {
    val ts1 = lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    val ts2 = lit("2024-01-02 00:00:00").cast("timestamp_ntz")
    val sentinel = lit(Scd2.SentinelTs).cast("timestamp_ntz")
    val (snap1, snap2) = scdSnaps(s, dir)
    val h1 = Scd2.apply(
      Scd2.emptyHistory(snap1, "timestamp_ntz"), snap1,
      Seq("id"), Seq("id"), Seq("price", "psize"), ts1, sentinel)
    Scd2.applyWithStats(h1, snap2, Seq("id"), Seq("id"), Seq("price", "psize"), ts2, sentinel)._2
  }

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
    // TPC-H Q3 shape: selective dim filter + fact join + grouped top-k.
    "q3_shipping_priority" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        .join(
          t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),
    // TPC-H Q5 shape: 6-way snowflake join with region filter — the join-
    // order/broadcast stress test (nation+region broadcast, facts shuffle).
    "q5_local_supplier_volume" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),
    // TPC-H Q2 shape: correlated scalar subquery (cheapest part per
    // brand), decorrelated by Catalyst into a join on the grouped min.
    "q2_cheapest_per_brand" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val minPrice = part.groupBy(col("p_brand").as("mb"))
        .agg(min("p_retailprice").as("min_price"))
      part
        .join(broadcast(minPrice),
          col("p_brand") === col("mb") && col("p_retailprice") === col("min_price"))
        .select("p_partkey", "p_brand", "p_retailprice")
    }),
    // null-safe equality join (MySQL <=> / SQL IS NOT DISTINCT FROM):
    // NULL keys MATCH each other, unlike plain equi-joins.
    "j10_nullsafe_join" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val a = part.select(
        col("p_partkey"),
        when(col("p_size") % 7 === 0, lit(null).cast("int")).otherwise(col("p_size")).as("sz"))
      val b = part.select(
        (col("p_partkey") + 1000000).as("other_key"),
        when(col("p_size") % 7 === 0, lit(null).cast("int")).otherwise(col("p_size")).as("sz"))
        .filter(col("other_key") % 200 === 0)
      a.join(b, a("sz") <=> b("sz"))
        .groupBy("other_key")
        .agg(count(lit(1)).as("n_matches"))
    }),
    // TPC-H Q12 shape: fact-fact join + categorical count matrix (count-
    // only aggregates — no float surface at all).
    "q12_priority_distribution" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_quantity") >= 25)
        .groupBy("l_returnflag", "o_orderpriority")
        .agg(count(lit(1)).as("n_items"))
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
    // Hierarchical ROLLUP with subtotal rows (beyond-reference breadth;
    // grouping-set nulls mark the subtotal levels).
    "a7_rollup_revenue" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(year(col("o_orderdate")).as("calendar_year"), col("o_orderpriority"))
        .agg(dsum(col("o_totalprice"), 18, 2).as("revenue"), count(lit(1)).as("n_orders"))
    }),
    // exact distinct aggregation (expands to two-phase distinct+agg).
    "a8_distinct_counts" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),
    // discrete percentiles (exact order-statistic elements — no
    // interpolation, so engine-comparable on doubles).
    "a9_percentile_disc" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
          expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)").as("p95"),
          count(lit(1)).as("n"))
    }),
    // continuous (interpolated) percentile: both engines compute
    // lo + (hi−lo)·frac at (n−1)·p indexing — verified bit-identical, so
    // the interpolated values hash-compare exactly like discrete ones.
    "a14_percentile_cont" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          expr("percentile(o_totalprice, 0.25)").as("q25"),
          expr("percentile(o_totalprice, 0.5)").as("q50"),
          expr("percentile(o_totalprice, 0.9)").as("q90"),
          count(lit(1)).as("n"))
    }),
    // grouped quantile MATRIX: one multi-probability percentile pass per
    // group (the array form sorts each group's values ONCE and reads all
    // five order statistics from it — five scalar percentiles would sort
    // five times), unnested to (group, pos, q) rows so the interpolated
    // values hash-compare position-by-position against the oracle's
    // quantile_cont(list).
    "a15_quantile_matrix" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          expr("percentile(o_totalprice, array(0.1, 0.25, 0.5, 0.75, 0.9))").as("qs"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"), posexplode(col("qs")).as(Seq("pos", "q")), col("n"))
    }),
    // landing-zone column profiling: one scan produces every column's
    // row/null/distinct/min/max, stacked to long form (nulls injected on
    // p_size so the null path is actually exercised).
    "a16_column_profile" -> ((s, dir) => {
      val src = t(s, dir, "part").select(
        col("p_brand"),
        when(col("p_size") % 7 === 0, lit(null)).otherwise(col("p_size")).as("p_size"),
        col("p_retailprice"))
      Profiling.profile(src, Seq("p_brand", "p_size", "p_retailprice"))
    }),
    // join-key skew report: the pre-join hot-key sweep that decides
    // whether a shuffle key needs sk1's salting — exact counts, ties on
    // the smallest key string, ratios as correctly-rounded divisions of
    // exact longs.
    "a22_skew_report" -> ((s, dir) => {
      Profiling.skewReport(t(s, dir, "events"), "user_id")
    }),
    // snapshot-diff CDC: the insert/update/delete delta between two full
    // snapshots (the same mutations the SCD2 gates replay), from ONE
    // full-outer hash join — the standalone form of what the reference's
    // SCD procedure does implicitly, feeding incremental consumers.
    "cdc1_snapshot_diff" -> ((s, dir) => {
      val (snap1, snap2) = scdSnaps(s, dir)
      ChangeCapture.snapshotDiff(snap1, snap2, Seq("id"), Seq("price", "psize"))
    }),
    // equi-width histogram: numeric distribution profile via
    // width_bucket — the landing-zone distribution sweep next to a16's
    // per-column profile. DuckDB lacks width_bucket, so the oracle
    // replays Spark's boundary arithmetic explicitly (width 600000/12 =
    // 50000 is exact in binary64, so floor(x/width)+1 is bit-identical).
    "a18_histogram" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0), lit(12)).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
    }),
    // bloom pre-filter ahead of a fact⋈selected-keys join: one small agg
    // builds the filter, it broadcasts into the fact scan as a codegen'd
    // might_contain — the rows the join would discard die BEFORE the
    // shuffle (at 100 TB this is the difference between shuffling the
    // fact table and shuffling the ~selectivity% that can match). False
    // positives die in the exact join, so the result is EXACTLY the
    // plain join the oracle runs.
    "bf1_bloom_prefilter_join" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("bf1_orders")
      t(s, dir, "lineitem").createOrReplaceTempView("bf1_lineitem")
      s.sql(
        """WITH sel AS (
          |  SELECT o_orderkey FROM bf1_orders WHERE o_orderpriority = '1-URGENT')
          |SELECT COUNT(*) AS n,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS total
          |FROM bf1_lineitem JOIN sel ON l_orderkey = o_orderkey
          |WHERE graft_might_contain(
          |  (SELECT graft_bloom_agg(o_orderkey) FROM bf1_orders
          |   WHERE o_orderpriority = '1-URGENT'),
          |  l_orderkey)""".stripMargin)
    }),
    // incremental aggregate maintenance: the nightly rollup absorbs each
    // day's increment by merging aggregate STATE (decimal sums + counts
    // per key) — never rescanning history. Mergeability is the property:
    // state(h ∪ d) == merge(state(h), state(d)); the gate computes the
    // rollup as two state merges and must equal the oracle's one-shot
    // full aggregate.
    "a17_incremental_rollup" -> ((s, dir) => {
      def state(df: DataFrame): DataFrame = df
        .groupBy("o_orderpriority")
        .agg(
          sum(col("o_totalprice").cast(DecimalType(28, 10))).as("s"),
          count(lit(1)).as("n"))
      val orders = t(s, dir, "orders").withColumn("yr", year(col("o_orderdate")))
      val merged = state(orders.filter(col("yr") <= 1995))
        .unionByName(state(orders.filter(col("yr") >= 1996)))
        .groupBy("o_orderpriority")
        .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
      merged.select(
        col("o_orderpriority"),
        col("n"),
        col("s").cast("double").as("total"),
        (col("s").cast("double") / col("n")).as("avg_price"))
    }),
    // A3 via a typed custom Aggregator: single-pass (min,max) buffer
    // midrange — same answer as a3, different machinery (udaf surface).
    "a11_midrange_udaf" -> ((s, dir) => {
      s.udf.register("midrange", udaf(graft.functions.Midrange))
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(expr("midrange(p_retailprice)").as("avg_price"))
    }),
    // conditional aggregation (TPC-H Q14 shape): promo vs total revenue,
    // both accumulated as exact decimals then emitted as double (a
    // cross-engine double ratio would drift — consumers do the division).
    "q14_promo_share" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)))
            .as("promo_revenue"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
    }),
    // HLL sketch distinct. The sketch value itself is engine-specific, so
    // the gate emits what an oracle CAN check: the exact distinct count
    // (computed alongside, one extra shuffle at gate scale) and the
    // sketch's ≤5% relative-error bound as a boolean — the driver's
    // rows+schema+hash all go green iff the sketch stays in-bound, so the
    // error floor is part of the compared result, not just a ScalaTest
    // (SketchSpec still asserts the numeric bound directly).
    "a10_hll_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("n_exact"))
        .select(
          col("l_returnflag"), col("n_exact"),
          (abs(col("approx_parts") - col("n_exact")).cast("double") / col("n_exact") <= 0.05)
            .as("within_5pct"))
    }),
    // MERGEABLE distinct-count sketches (Datasketches HLL builtins):
    // per-month sketch states unioned WITHOUT rescanning raw rows — the
    // at-scale incremental form of COUNT DISTINCT, where daily/monthly
    // states persist and any rollup is a union of states. Emits the
    // exact count plus two floors as data: the union estimate within 5%
    // of exact, and union-of-parts within 2% of the single-shot sketch
    // (not bit-equal: HLL mode transitions — sparse coupon list vs dense
    // registers — make union-of-parts a slightly different state;
    // measured gap ≤0.6% at sf0.01/0.1).
    "a19_hll_merge" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val monthly = li
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      val merged = monthly.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("merged_est"))
      val single = li.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("single_est"),
        countDistinct(col("l_partkey")).as("n_exact"))
      merged.crossJoin(single).select(
        col("n_exact"),
        (abs(col("merged_est") - col("n_exact")).cast("double") / col("n_exact") <= 0.05)
          .as("within_5pct"),
        (abs(col("merged_est") - col("single_est")).cast("double") / col("single_est") <= 0.02)
          .as("merge_within_2pct"))
    }),
    // A20: mergeable KLL quantile states — the percentile analog of
    // a19's HLL union: per-month sketch states merged WITHOUT rescanning
    // raw rows (Spark's approx_percentile exposes no reusable state).
    // KLL compaction flips random coins, so estimates vary run to run;
    // the compared data is exact values + rank-error-band flags (the
    // d4/k2 planted-floor frame): the merged estimate's EXACT rank must
    // sit within 0.04 of its target (k=200 → ε≈1.65% @99%; 0.04≈2.4ε)
    // and merged vs single-pass ranks within 0.06 of each other. The
    // rank check is one extra scan with the 1-row estimates broadcast.
    "a20_kll_merge" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_extendedprice").cast("double").as("price"))
      val merged = t(s, dir, "lineitem")
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(expr("kll_sketch_agg(cast(l_extendedprice as double), 200)").as("sk"))
        .agg(expr("kll_quantiles(kll_merge_agg(sk), array(0.5d, 0.9d))").as("mq"))
      val single = li.agg(
        expr("kll_quantiles(kll_sketch_agg(price, 200), array(0.5d, 0.9d))").as("sq"),
        count(lit(1)).as("n_exact"))
      li.crossJoin(broadcast(merged.crossJoin(single)))
        .agg(
          max(col("n_exact")).as("n_exact"),
          avg((col("price") <= element_at(col("mq"), 1)).cast("double")).as("r50m"),
          avg((col("price") <= element_at(col("mq"), 2)).cast("double")).as("r90m"),
          avg((col("price") <= element_at(col("sq"), 1)).cast("double")).as("r50s"),
          avg((col("price") <= element_at(col("sq"), 2)).cast("double")).as("r90s"))
        .select(
          col("n_exact"),
          (abs(col("r50m") - 0.5) <= 0.04).as("p50_in_band"),
          (abs(col("r90m") - 0.9) <= 0.04).as("p90_in_band"),
          (abs(col("r50m") - col("r50s")) <= 0.06 &&
            abs(col("r90m") - col("r90s")) <= 0.06).as("merge_consistent"))
    }),
    // A21: the PERSISTED form of a19+a20 — a stats zone of per-month
    // (epoch × returnflag) sketch states built once per sf dir; the
    // rollup answers exact counts, KLL quantiles, and HLL distincts per
    // flag by merging stored kilobyte states (PlanAuditSpec proves the
    // rollup plan's only file scan is the zone). In-gate verification
    // joins the 3-row estimates back to lineitem for exact ranks and
    // exact distincts; compared data = exact n_rows (bitwise — counts
    // sum losslessly from states) + the a20/a19 error-band flags.
    "a21_stats_zone_rollup" -> ((s, dir) => {
      val zone = monthlyStatsZone(s, dir)
      val roll = Profiling.rollupStats(
        Profiling.readStatsZone(s, zone), Seq(0.5, 0.9))
      val est = broadcast(roll.select(
        col("grp"), col("n_rows"),
        element_at(col("value_quantiles"), 1).as("q50"),
        element_at(col("value_quantiles"), 2).as("q90"),
        col("key_distinct_est").as("nd_est")))
      t(s, dir, "lineitem")
        .join(est, col("l_returnflag") === col("grp"))
        .groupBy("grp")
        .agg(
          max(col("n_rows")).as("n_rows"),
          avg((col("l_extendedprice") <= col("q50")).cast("double")).as("r50"),
          avg((col("l_extendedprice") <= col("q90")).cast("double")).as("r90"),
          countDistinct(col("l_partkey")).as("nd_exact"),
          max(col("nd_est")).as("nd_est"))
        .select(
          col("grp").as("l_returnflag"), col("n_rows"),
          (abs(col("r50") - 0.5) <= 0.04).as("p50_in_band"),
          (abs(col("r90") - 0.9) <= 0.04).as("p90_in_band"),
          (abs(col("nd_est") - col("nd_exact")).cast("double") / col("nd_exact") <= 0.05)
            .as("distinct_in_5pct"))
    }),
    // B1: equi-depth binning from the PERSISTED stats zone — quartile
    // cutpoints decoded from the merged KLL state (kilobytes), rows
    // labeled by k pure comparisons: no sort, no shuffle, the 100 TB
    // feature-bucketization shape. Cut values are sketch estimates
    // (randomized), so compared data = the deterministic frame (bin ids,
    // exact total) + per-bin occupancy flags: each quartile bin must
    // hold 25% ± 5 pts of rows (two ε≈1.65% boundary ranks per bin).
    "b1_quantile_bins" -> ((s, dir) => {
      val zone = monthlyStatsZone(s, dir)
      val cuts = Profiling.readStatsZone(s, zone)
        .agg(expr("kll_quantiles(kll_merge_agg(value_kll), array(0.25d, 0.5d, 0.75d))").as("q"))
        .head().getSeq[Double](0)
      val binned = Profiling.bucketizeByQuantiles(
        t(s, dir, "lineitem"), "l_extendedprice", cuts)
      binned
        .groupBy("bin")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(binned.agg(count(lit(1)).as("n_total"))))
        .select(
          col("bin"), col("n_total"),
          (abs(col("n").cast("double") / col("n_total") - 0.25) <= 0.05)
            .as("frac_in_band"))
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
    "set_intersect_nations" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    }),
    // full outer join with coalesced key + presence flags.
    "j11_full_outer_presence" -> ((s, dir) => {
      val custN = t(s, dir, "customer").groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val suppN = t(s, dir, "supplier").filter(col("s_suppkey") % 3 === 0)
        .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
      custN.join(suppN, col("ck") === col("sk"), "full_outer")
        .select(
          coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),
    // aggregation to a deterministic array (sorted distinct collect).
    "g1_collect_sorted_sets" -> ((s, dir) => {
      t(s, dir, "supplier")
        .groupBy("s_nationkey")
        .agg(concat_ws(",", sort_array(collect_set(col("s_suppkey")))).as("supp_keys"))
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
    // categorical pivot (wide matrix from long facts).
    "w3_pivot_status_matrix" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .withColumnRenamed("F", "n_f")
        .withColumnRenamed("O", "n_o")
    }),
    // unpivot (melt): the wide status matrix back to long form — the
    // inverse of w3's pivot, a narrow generator with no shuffle.
    "w6_unpivot" -> ((s, dir) => {
      queries("w3_pivot_status_matrix")(s, dir)
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("n_f"), col("n_o")),
          "status_col", "n")
    }),
    // generator/explode: token frequency table via unnest.
    "t4_token_frequencies" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
    }),
    // T12: Misra-Gries heavy hitters over document tokens — bounded-
    // memory, MERGEABLE token stats (exact t4 shuffles every token
    // occurrence; the standing 100 TB statistic moves kilobyte sketch
    // states instead). The corpus vocabulary is near-uniform (31 tokens
    // at ~2-3% each), exactly where MG guarantees nothing — so the gate
    // PLANTS 3 hot tokens (40 copies per doc → ~14% mass each at every
    // sf; background tokens are ~2-3%) and sizes the map (32) BELOW
    // the vocabulary so purges genuinely occur; ε = 3.5/32 ≈ 10.9% of
    // the stream sits between background and planted mass.
    // Estimates depend on purge/merge order (task scheduling), so the
    // compared data is the deterministic MG guarantees only: every
    // above-ε·N token is captured, with lb ≤ exact ≤ ub — after the
    // per-source states are MERGED (the mergeability path under test).
    "t12_heavy_hitters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))
        .unionByName(docs.select(col("source"),
          explode(array(Seq.fill(40)(
            concat(lit("hot"), (col("doc_id") % 3).cast("string"))): _*)).as("token")))
      val items = toks.groupBy("source").agg(expr("freq_items_agg(token, 32)").as("sk"))
        .agg(expr("freq_top_items(freq_items_merge_agg(sk))").as("fis"))
        .select(explode(col("fis")).as("fi"))
        .select(col("fi.item").as("item"), col("fi.lb").as("lb"), col("fi.ub").as("ub"))
      val exact = toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      exact.crossJoin(broadcast(total))
        .filter(col("n_exact") > lit(3.5 / 32.0) * col("n_total"))
        .join(broadcast(items), col("token") === col("item"), "left")
        .select(col("token"), col("n_exact"),
          col("item").isNotNull.as("captured"),
          (col("item").isNotNull && col("lb") <= col("n_exact") &&
            col("n_exact") <= col("ub")).as("bounds_ok"))
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
    }),
    // F3/F5: MySQL-style price parsing with -1 sentinel (currency-string →
    // decimal; db_control_sql.sql:181-186). Raw strings are constructed
    // deterministically from order totals so the oracle can replay them.
    "f3_price_parse" -> ((s, dir) => {
      val raw = Tables.rebalance(t(s, dir, "orders"), 0L).select(
        col("o_orderkey"),
        when(col("o_orderkey") % 100 === 0, lit(""))
          .otherwise(concat(round(col("o_totalprice") * 100).cast("long").cast("string"), lit("đ")))
          .as("raw_price"))
      // parsePrice keeps MySQL's DECIMAL(18,2) semantics internally; the
      // gate output is cast to double (see dsum note on representation).
      raw.select(col("o_orderkey"), Clean.parsePrice(col("raw_price")).cast("double").as("price"))
    }),
    // F4/F5: regex numeric extraction + bounded decimal cast with -1
    // sentinel (screen size, db_control_sql.sql:188).
    "f4_screen_size_parse" -> ((s, dir) => {
      val raw = Tables.rebalance(t(s, dir, "part"), 0L).select(
        col("p_partkey"),
        when(col("p_partkey") % 100 === 0, lit(""))
          .otherwise(concat(col("p_size").cast("string"), lit("."), (col("p_partkey") % 10).cast("string"), lit(" inches")))
          .as("raw_size"))
      raw.select(col("p_partkey"), Clean.parseScreenSize(col("raw_size")).cast("double").as("screen_size"))
    }),
    // F10: RAM-vs-storage disambiguation of combined "8 GB - 256 GB"
    // fields (crawl.py:218-228).
    "f10_ram_storage_split" -> ((s, dir) => {
      val raw = t(s, dir, "part").select(
        col("p_partkey"),
        when(col("p_partkey") % 3 === 0,
          concat(col("p_size").cast("string"), lit(" GB - "), (col("p_size") * 8).cast("string"), lit(" GB")))
          .when(col("p_partkey") % 3 === 1, concat((col("p_size") % 60).cast("string"), lit(" GB")))
          .otherwise(concat((col("p_size") + 100).cast("string"), lit(" GB")))
          .as("raw"))
      val (ram, storage) = Clean.splitRamStorage(col("raw"))
      raw.select(col("p_partkey"), ram.as("ram"), storage.as("storage"))
    }),
    // A5: the 4-branch min/max price derivation (load_dwh.py:166-184):
    // -1/NULL mean "absent"; both absent → NULL.
    "a5_price_minmax" -> ((s, dir) => {
      val raw = t(s, dir, "part").select(
        col("p_partkey"),
        when(col("p_partkey") % 5 === 0, lit(-1.0))
          .when(col("p_partkey") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("p_retailprice")).as("gia_cu"),
        when(col("p_partkey") % 3 === 0, lit(-1.0))
          .otherwise(col("p_retailprice") * 0.9).as("gia_moi"))
      val (minP, maxP) =
        graft.pipeline.ProductPipeline.priceMinMax(col("gia_cu"), col("gia_moi"))
      raw.select(col("p_partkey"), minP.as("min_price"), maxP.as("max_price"))
    }),
    // F9: URL normalization — relative links get the site base prefix,
    // blank/NULL become 'Unknown' (crawl.py:197-200).
    "f9_normalize_url" -> ((s, dir) => {
      val raw = t(s, dir, "part").select(
        col("p_partkey"),
        when(col("p_partkey") % 10 === 0, lit(""))
          .when(col("p_partkey") % 10 === 1, lit(null).cast("string"))
          .when(col("p_partkey") % 3 === 0, concat(lit("/sp/item-"), col("p_partkey").cast("string")))
          .otherwise(concat(lit("https://base.example/item-"), col("p_partkey").cast("string")))
          .as("link"))
      raw.select(
        col("p_partkey"),
        Clean.normalizeUrl(col("link"), lit("https://base.example")).as("url"))
    }),
    // F14/F5: MySQL CAST(s AS SIGNED) fallback semantics on RAM-like
    // strings — leading-digit prefix, 0 when none, -1 sentinel for
    // missing ('1 TB'→1, 'Đen512'→0, ''→-1; db_control_sql.sql:191-193).
    "f14_int_parse" -> ((s, dir) => {
      val raw = t(s, dir, "part").select(
        col("p_partkey"),
        when(col("p_partkey") % 13 === 0, lit(""))
          .when(col("p_partkey") % 11 === 0, lit("Đen512"))
          .when(col("p_partkey") % 7 === 0, lit("1 TB"))
          .when(col("p_partkey") % 3 === 0, concat(col("p_size").cast("string"), lit(" GB")))
          .otherwise(col("p_size").cast("string"))
          .as("raw"))
      val stripped = regexp_replace(col("raw"), "GB| ", "")
      raw.select(
        col("p_partkey"),
        when(col("raw").isNull || col("raw") === "", lit(-1))
          .otherwise(graft.pipeline.ProductPipeline.mysqlIntCast(stripped))
          .as("v"))
    }),
    // F12: date-dimension generation (populate_dim_date.py:36-81) — 19
    // Vietnamese-calendar attributes incl. the quirky week-0 numbering.
    "f12_dim_date" -> ((s, _) => DimDate.generate(s, "2020-01-01", "2021-12-31")),

    // ── SCD2 (SURVEY §2.9 SP_ETL_SCD_Update_Product) ─────────────────────
    // Two snapshot rounds over part-derived products: day 2 changes prices
    // (÷10), drops rows (÷7 — they stay current; the reference never
    // expires missing keys) and adds new keys (÷13).
    "scd2_two_rounds" -> ((s, dir) => {
      val ts1 = lit("2024-01-01 00:00:00").cast("timestamp_ntz")
      val ts2 = lit("2024-01-02 00:00:00").cast("timestamp_ntz")
      val sentinel = lit(Scd2.SentinelTs).cast("timestamp_ntz")
      val (snap1, snap2) = scdSnaps(s, dir)
      val h1 = Scd2.apply(
        Scd2.emptyHistory(snap1, "timestamp_ntz"), snap1,
        Seq("id"), Seq("id"), Seq("price", "psize"), ts1, sentinel)
      Scd2.apply(h1, snap2, Seq("id"), Seq("id"), Seq("price", "psize"), ts2, sentinel)
    }),
    // the AT-SCALE SCD2 path: same two-round scenario, but through the
    // day-partitioned history zone (Scd2.applyZoned) — each round
    // rewrites only the sentinel (live) partition and creates that day's
    // expired partition, so daily cost is O(live + churn) instead of the
    // flat zone's O(all history). The zone union must equal the flat
    // apply: the oracle is scd2_two_rounds' SQL verbatim.
    "scd3_zoned_history" -> ((s, dir) => {
      val ts1 = lit("2024-01-01 00:00:00").cast("timestamp_ntz")
      val ts2 = lit("2024-01-02 00:00:00").cast("timestamp_ntz")
      val sentinel = lit(Scd2.SentinelTs).cast("timestamp_ntz")
      val (snap1, snap2) = scdSnaps(s, dir)
      val zone = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_scd3_zone").getAbsolutePath
      // deterministic location, cleaned before re-use (Hadoop FS delete)
      graft.sources.Zones.delete(s, zone)
      Scd2.applyZoned(s, zone, snap1,
        Seq("id"), Seq("id"), Seq("price", "psize"), ts1, sentinel, tsType = "timestamp_ntz")
      Scd2.applyZoned(s, zone, snap2,
        Seq("id"), Seq("id"), Seq("price", "psize"), ts2, sentinel, tsType = "timestamp_ntz")
      s.read.parquet(zone)
        .select("id", "price", "psize", "created_at", "updated_at", "expired_at")
    }),
    // J12: collation-insensitive SCD2 — the reference's SCD2 key columns
    // collate utf8mb4_unicode_ci (db_staging.sql:4077): staging 'PROD-15'
    // and history 'Prod-15' are the SAME key in MySQL. keyNorm =
    // Scd2.mysqlCiNorm folds keys at join time only; stored rows keep
    // their crawled case (so a re-inserted changed row carries staging's
    // case, an unchanged case-variant row keeps history's case).
    "j12_ci_scd2" -> ((s, dir) => {
      val ts1 = lit("2024-01-01 00:00:00").cast("timestamp_ntz")
      val ts2 = lit("2024-01-02 00:00:00").cast("timestamp_ntz")
      val sentinel = lit(Scd2.SentinelTs).cast("timestamp_ntz")
      val base = t(s, dir, "part").select(
        col("p_partkey").as("id"),
        concat(lit("Prod-"), col("p_partkey")).as("pname"),
        col("p_retailprice").as("price"))
      val h1 = base.select(
        col("pname"), col("price"),
        ts1.as(Scd2.CreatedAt), ts1.as(Scd2.UpdatedAt), sentinel.as(Scd2.ExpiredAt))
      // day-2 staging: every 3rd key arrives UPPER-cased (same key under
      // CI), every 10th price changes, every 7th is missing (stays
      // current), every 13th is brand new.
      val snap2 = base
        .filter(col("id") % 7 =!= 0)
        .select(
          when(col("id") % 3 === 0, upper(col("pname"))).otherwise(col("pname")).as("pname"),
          when(col("id") % 10 === 0, col("price") + 100.0).otherwise(col("price")).as("price"))
        .unionByName(base.filter(col("id") % 13 === 0)
          .select(concat(lit("NEW-"), col("id")).as("pname"), col("price")))
      Scd2.apply(h1, snap2, Seq("pname"), Seq("pname"), Seq("price"), ts2, sentinel,
        keyNorm = Scd2.mysqlCiNorm)
    }),
    // measurement-driven skew join — the CONSUMER of a22's report
    // (SkewJoin.autoJoin): the big side's key is counted once, and the
    // measured skew_ratio picks plain vs salted. Planted hot key: 3/4 of
    // lineitem collapses onto nation 0 (ratio ≈ 19 ≫ threshold 4) so the
    // salted plan ENGAGES here (PlanAuditSpec pins that, and that a
    // uniform key stays plain) — and the salted join is result-identical
    // to the plain join, which is exactly what the oracle replays.
    "j13_auto_skew_join" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").select(
        when(col("l_orderkey") % 4 =!= 0, lit(0L))
          .otherwise(col("l_orderkey") % 25).as("n_nationkey"),
        col("l_quantity"))
      val small = t(s, dir, "nation")
        .select(col("n_nationkey").cast("bigint").as("n_nationkey"), col("n_name"))
      SkewJoin.autoJoin(big, small, Seq("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_quantity"), 18, 2).as("hot_qty"), count(lit(1)).as("n_lines"))
    }),
    // A2/SP2: the SCD2 SP's scalar OUT params (p_rows_input /
    // p_rows_inserted / p_rows_expired — db_control_sql.sql:213-216) as a
    // one-row frame from applyWithStats over the shared two-round scenario.
    "a2_scd_out_params" -> ((s, dir) => {
      import s.implicits._
      val stats = scdRound2Stats(s, dir)
      Seq((stats.rowsInput, stats.rowsInserted, stats.rowsExpired))
        .toDF("rows_input", "rows_inserted", "rows_expired")
    }),
    // SP3 SP_ETL_Update_Log_Status: close the ledger row with the EXACT
    // reference message format (db_control_sql.sql:279-307), stats wired
    // from the real SCD2 round — the full start→transform→finish path.
    "sp3_log_message" -> ((s, dir) => {
      val stats = scdRound2Stats(s, dir)
      val (ledger0, runId) =
        RunLedger.startRun(RunLedger.empty(s), "transform_data", "2024-01-02 00:00:00")
      RunLedger.finishRun(ledger0, runId, "SUCCESS", "2024-01-02 00:05:00", Some(stats))
        .select(col("id"), col("process_name"), col("status"), col("message"))
    }),
    // S9: row UPDATE by key (SP_ETL_Update_Log_Status's UPDATE ... WHERE
    // ID = p_id): 25 RUNNING ledger rows, close exactly #13 — only that
    // row flips to SUCCESS with end_time + message set.
    "s9_ledger_update" -> ((s, dir) => {
      val ledger = t(s, dir, "nation").select(
        (col("n_nationkey") + 1).cast("long").as("id"),
        concat(lit("proc_"), lower(col("n_name"))).as("process_name"),
        lit("2024-03-01 08:00:00").cast("timestamp").as("start_time"),
        lit(null).cast("timestamp").as("end_time"),
        lit("RUNNING").as("status"),
        lit(null).cast("string").as("message"))
      RunLedger.finishRun(ledger, 13L, "SUCCESS", "2024-03-01 09:00:00",
          messageOverride = Some("closed by daily run"))
        .select(col("id"), col("process_name"), col("status"), col("message"),
          col("end_time").cast("timestamp_ntz").as("end_time"))
    }),
    // J7: the reference's PROCESS_LOG ⋈ PROCESS equi-join
    // (check_status.py:21-23, load_datamart.py:44-48) — log rows resolve
    // their process name through the broadcast process registry.
    "j7_process_log_join" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val proc = nation.select(
        (col("n_nationkey") + 1).cast("int").as("pid"),
        concat(lit("proc_"), lower(col("n_name"))).as("process_name"))
      val done = nation.select(
        (col("n_nationkey") * 2 + 1).cast("int").as("id_log"),
        (col("n_nationkey") + 1).cast("int").as("id_process"),
        lit("SUCCESS").as("status"),
        lit("2024-03-01 08:00:00").cast("timestamp_ntz").as("start_time"))
      val running = nation.filter(col("n_nationkey") % 3 === 0).select(
        (col("n_nationkey") * 2 + 2).cast("int").as("id_log"),
        (col("n_nationkey") + 1).cast("int").as("id_process"),
        lit("RUNNING").as("status"),
        lit("2024-03-01 09:00:00").cast("timestamp_ntz").as("start_time"))
      done.unionByName(running)
        .join(broadcast(proc), col("id_process") === col("pid"))
        .select("id_log", "process_name", "status", "start_time")
    }),
    // S10 control plane: the CONFIG table + crawl_log daily gate
    // (crawl.py:284-291) — sites with no SUCCESS log row today, as one
    // anti join instead of the reference's N+1 point lookups. Site %3==0
    // succeeded today, %3==1 succeeded only yesterday and is RUNNING now,
    // %3==2 never ran → the needing-crawl set is everything but %3==0.
    "s10_crawl_meta" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val cfg = nation.select(
        (col("n_nationkey") + 1).cast("long").as("id"),
        col("n_name").as("site_name"),
        concat(lit("https://"), lower(col("n_name")), lit(".example.com")).as("url"))
      val idc = (col("n_nationkey") + 1).cast("long").as("id_config")
      val log = nation.filter(col("n_nationkey") % 3 === 0).select(
        idc, lit("2024-01-05 08:00:00").cast("timestamp").as("run_date"),
        lit("SUCCESS").as("status"))
        .unionByName(nation.filter(col("n_nationkey") % 3 === 1).select(
          idc, lit("2024-01-04 08:00:00").cast("timestamp").as("run_date"),
          lit("SUCCESS").as("status")))
        .unionByName(nation.filter(col("n_nationkey") % 3 === 1).select(
          idc, lit("2024-01-05 09:00:00").cast("timestamp").as("run_date"),
          lit("RUNNING").as("status")))
      graft.control.CrawlMeta.sitesNeedingCrawl(cfg, log, "2024-01-05")
        .select("id", "site_name", "url")
    }),
    // SP lifecycle (transform_staging.py:24-58): a registry row carrying
    // a DELIMITER-wrapped CREATE PROCEDURE … END$$ blob (with non-ASCII
    // comment chars, as the reference rows have) is regex-extracted,
    // cleaned, installed under its declared name and called over a view.
    "sp4_proc_install" -> ((s, dir) => {
      val registry = Map(
        "SP_NATION_COUNTS" -> ("DELIMITER $$\n" +
          "CREATE PROCEDURE SP_Nation_Counts ()\n" +
          "BEGIN\n-- đếm quốc gia theo vùng\n" +
          "SELECT n_regionkey AS region_key, count(*) AS n_nations" +
          " FROM nations_v GROUP BY n_regionkey;\nEND$$\nDELIMITER ;"),
        "PLAIN_DML" -> "UPDATE PROCESS_LOG SET STATUS = %s WHERE ID = %s")
      graft.control.SqlRegistry.callProcedure(
        s, graft.control.SqlRegistry.installProcedures(registry),
        "SP_NATION_COUNTS", Map("nations_v" -> t(s, dir, "nation")))
    }),
    // The reference's REAL multi-statement procedure end-to-end: the
    // verbatim SP_ETL_SCD_UPDATE_PRODUCT blob is decoded from the control
    // dump (db_control_sql.sql:210-276), regex-extracted + installed (the
    // transform_staging.py:24-58 lifecycle), then RUN as a statement list
    // — DECLARE, SELECT…INTO, self-referencing INSERT…SELECT, TRUNCATE,
    // UPDATE…INNER JOIN…SET, SET var = ROW_COUNT() — over the 239-row
    // fixture day. Round 1 against empty history must report the
    // reference's (239, 239, 0); round 2 with 40 price edits drives the
    // expire + re-insert path (239, 40, 40).
    "sp5_proc_body" -> ((s, dir) => {
      import graft.control.SqlRegistry
      val blob = referenceBlob("SP_ETL_SCD_UPDATE_PRODUCT")
      val proc = SqlRegistry
        .installProcedures(Map("SP_ETL_SCD_UPDATE_PRODUCT" -> blob))("SP_ETL_SCD_UPDATE_PRODUCT")
      val transform = s.read.parquet(s"$fixturesDir/products_transform.parquet")
      val r1 = SqlRegistry.runProcedure(s, proc, Map(
          "PRODUCTS_TRANSFORM" -> transform,
          "PRODUCTS_EXPIRED" -> s.read.parquet(s"$fixturesDir/products_expired.parquet").limit(0),
          "EXPIRED_KEYS" -> transform.select("TEN", "LINK").limit(0)),
        "2025-11-23 18:51:37")
      val day2 = transform.withColumn("GIA_MOI",
        when(col("ID") <= 40, col("GIA_MOI") + 500).otherwise(col("GIA_MOI")))
      val r2 = SqlRegistry.runProcedure(
        s, proc, r1.tables + ("PRODUCTS_TRANSFORM" -> day2), "2025-11-24 18:51:37")
      def asRow(round: Int, r: SqlRegistry.ProcedureRun): (Int, Long, Long, Long, Long) = {
        val m = r.outParams.toMap
        val nCurrent = r.tables("PRODUCTS_EXPIRED")
          .filter(col("EXPIRED_AT") === lit("9999-12-31").cast("timestamp")).count()
        (round, m("p_RowsInput"), m("p_RowsInserted"), m("p_RowsUpdated"), nCurrent)
      }
      import s.implicits._
      Seq(asRow(1, r1), asRow(2, r2))
        .toDF("round", "p_rowsinput", "p_rowsinserted", "p_rowsupdated", "n_current")
    }),
    // The reference's OTHER real procedure, closing the last verbatim-
    // replay gap: the SP_ETL_CLEAN_DATA blob (db_control_sql.sql:165-207)
    // decoded from the control dump, installed through the
    // transform_staging.py:24-58 lifecycle (whose non-ASCII collapse
    // turns the '₫'/'đ' REPLACE literals into ' ' — the deployed
    // escape-loss), and RUN as a statement list: TRUNCATE + CTE
    // INSERT…SELECT with MySQL prefix-parse casts and the deployed
    // screen-size regex truncation (SqlRegistry dialect scaladoc). The
    // oracle is the live PRODUCTS_TRANSFORM dump itself — the procedure
    // must reproduce deployed MySQL output on all 239 golden rows, which
    // also proves ≡ ProductPipeline.clean (CleanSpec ties clean to the
    // same dump; ModulesSpec asserts the triangle directly).
    "sp6_clean_proc_body" -> ((s, dir) => {
      import graft.control.SqlRegistry
      val blob = referenceBlob("SP_ETL_CLEAN_DATA")
      val proc =
        SqlRegistry.installProcedures(Map("SP_ETL_CLEAN_DATA" -> blob))("SP_ETL_CLEAN_DATA")
      val run = SqlRegistry.runProcedure(s, proc, Map(
          "PRODUCTS_GENERAL" -> s.read.parquet(s"$fixturesDir/products_general.parquet"),
          "PRODUCTS_TRANSFORM" ->
            s.read.parquet(s"$fixturesDir/products_transform.parquet").limit(0),
          "DIM_DATE" -> s.read.parquet(s"$fixturesDir/dim_date.parquet")),
        "2025-11-23 18:51:37")
      run.tables("PRODUCTS_TRANSFORM").drop("ID_SR")
    }),

    // ── Text analysis (training-data ops; beyond-reference) ──────────────
    // token counting, subword estimate, alpha ratio, quality score.
    "t1_text_quality" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords"),
        TextAnalysis.alphaRatio(col("text")).as("alpha_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    }),
    // language-ID n-gram/stopword heuristic.
    "t2_lang_id" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
    }),
    // document fingerprinting: exact md5 + positional rolling hash.
    "t3_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"),
        TextAnalysis.positionalFingerprint(col("text")).as("fp_pos"))
    }),

    // bigram language-model statistics: P(w2|w1) = c(w1,w2)/c(w1·) —
    // the n-gram conditional-probability table perplexity-ish quality
    // filters build on. Two hash aggregations + one join on the prefix
    // token; the division is one IEEE op on identical longs, so the
    // probabilities hash-compare exactly.
    "t11_bigram_lm" -> ((s, dir) => {
      val pairs = t(s, dir, "documents")
        .select(TextAnalysis.tokens(col("text")).as("tk"))
        .select(explode(zip_with(
          slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
        .filter(col("n12") >= 3)
      val uni = pairs.groupBy("w1").agg(count(lit(1)).as("n1"))
      big.join(uni, "w1")
        .select(col("w1"), col("w2"), col("n12"), col("n1"),
          (col("n12") / col("n1")).as("p_cond"))
    }),
    // LM-based quality scoring (the CCNet signal): every doc scored under
    // t11's self-estimated pruned bigram LM — bigram coverage + scaled
    // INTEGER mean conditional probability (⌊n12·10^10/n1⌋ per bigram),
    // so the per-doc aggregation has no float accumulation and the gate
    // compares exactly; the lone double is one division of exact longs.
    "t13_lm_score" -> ((s, dir) => {
      TextAnalysis.lmScoreDocs(t(s, dir, "documents"), "doc_id", "text", 3L)
    }),
    // token-window chunking with overlap (width 32, stride 8): the
    // context-window preprocessing for embedding pipelines. Pure integer
    // and string derivation — chunk spans and bodies compare exactly.
    "t14_chunk_documents" -> ((s, dir) => {
      TextAnalysis.chunkDocuments(t(s, dir, "documents"), "doc_id", "text", 32, 8)
    }),
    // BPE vocabulary training on the corpus (Sennrich 2016): 10 merge
    // rounds on the word-frequency table, deterministic (integer pair
    // counts, lexicographic tie-break) — the merge table compares
    // exactly against a DuckDB replay of every round.
    "t15_bpe_merges" -> ((s, dir) => {
      TextAnalysis.bpeTrain(t(s, dir, "documents"), "text", 10)
    }),
    // the trained merges APPLIED (tokenize): 6 rounds, then every doc
    // rewritten to its subword stream — train + apply in one gate, the
    // whole tokenizer lifecycle oracle-checked on exact strings/counts.
    "t16_bpe_tokenize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.bpeApply(docs, "doc_id", "text",
        TextAnalysis.bpeTrain(docs, "text", 6))
    }),
    // BATCHED BPE training (the 32k-vocabulary scale shape): pair counts
    // are snapshotted once per batch of 5 merges, the batch's merges
    // chosen top-5 by (count desc, lhs, rhs) from the stale snapshot and
    // applied sequentially — 10 merges in 2 corpus-independent word-table
    // scans instead of 10. Deterministic (the documented stale-counts
    // rule), oracle-replayed batch by batch in DuckDB.
    "t17_bpe_merges_batched" -> ((s, dir) => {
      TextAnalysis.bpeTrain(t(s, dir, "documents"), "text", 10, batchRounds = 5)
    }),

    // ── Dedup (training-data ops; beyond-reference) ──────────────────────
    // exact dedup over a corpus salted with literal copies.
    "d1_dedup_exact" -> ((s, dir) => {
      Dedup.exact(dupCorpus(s, dir), "doc_id", "text")
    }),
    // brute-force n-gram Jaccard near-dup pairs (inverted-index join).
    "d2_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(nearDupCorpus(s, dir), "doc_id", "text", 3, 0.6)
    }),
    // MinHash + banded LSH, exact-Jaccard-confirmed — must equal d2's
    // output when recall is 1 (32 hashes / 16 bands: P(miss|J=0.8) ≈ 5e-8).
    "d3_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(nearDupCorpus(s, dir), "doc_id", "text", 3, 32, 16, 0.6)
    }),
    // SimHash near-dup pairs. maxHamming=3 → 4×16-bit pigeonhole chunks:
    // the scale configuration (2^16-value band keys keep buckets
    // selective on a large corpus). The xxhash64-based pair set has no
    // SQL oracle, so the gate measures in-gate recall against the
    // CONSTRUCTED truth (the planted prefix-dropped mutations of every
    // doc_id%5==0 document) — the truth-set size is oracle-computable
    // and the recall floor is part of the compared result. Wider radii
    // (collide-y 4-bit chunks) stay recall-covered in DedupSimilaritySpec.
    "d4_simhash_pairs" -> ((s, dir) => {
      val corpus = nearDupCorpus(s, dir)
      val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", 3)
      val planted = corpus.filter(col("doc_id") < NearDupOffset && col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + NearDupOffset).as("id_b"))
      val recalled = planted
        .join(pairs.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_semi")
      // measured planted recall is deterministic ≈0.37–0.41 across sf
      // (the planted mutation drops 5 leading tokens — a heavy edit for
      // hamming≤3); the gate floors it at 0.30 so the driver sees the
      // floor as data while DedupSimilaritySpec tracks the raw values
      planted.agg(count(lit(1)).as("n_planted"))
        .crossJoin(recalled.agg(count(lit(1)).as("n_recalled")))
        .select(col("n_planted"),
          (col("n_recalled").cast("double") / col("n_planted") >= 0.30).as("recall_ge_030"))
    }),
    // edit-distance near-dup confirmation: each mutated doc vs its
    // original (levenshtein is exact-integer in both engines).
    "d5_edit_distance" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val mutated = nearDupCorpus(s, dir).filter(col("doc_id") >= NearDupOffset)
        .select((col("doc_id") - NearDupOffset).as("doc_id"), col("text").as("text_mut"))
      docs.join(mutated, "doc_id")
        .select(
          col("doc_id"),
          levenshtein(col("text"), col("text_mut")).as("edit_dist"),
          (levenshtein(col("text"), col("text_mut")).cast("double") /
            greatest(length(col("text")), length(col("text_mut")))).as("rel_dist"))
    }),
    // TPC-H Q13 shape: count-of-counts distribution — customers BY how
    // many orders they have, zeros included via the left join.
    "q13_count_distribution" -> ((s, dir) => {
      val perCust = t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count").agg(count(lit(1)).as("custdist"))
    }),
    // TPC-H Q18 shape: IN-subquery over a grouped HAVING → left-semi join
    // on the aggregated key set.
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
        .filter(col("qty") > 150)
        .select("l_orderkey")
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),
    // TPC-H Q11 shape: groups exceeding a fraction of the GLOBAL total —
    // the scalar subquery broadcasts one row against the grouped frame.
    "q11_value_share" -> ((s, dir) => {
      val byNation = t(s, dir, "supplier")
        .groupBy("s_nationkey")
        .agg(dsum(col("s_acctbal"), 18, 2).as("nation_bal"))
      val total = t(s, dir, "supplier")
        .agg(dsum(col("s_acctbal"), 18, 2).as("total_bal"))
      byNation.crossJoin(broadcast(total))
        .filter(col("nation_bal") > col("total_bal") * 0.04)
        .select("s_nationkey", "nation_bal")
    }),
    // TPC-H Q22 shape: above-average-balance customers with no orders —
    // scalar-subquery threshold + anti join.
    "q22_idle_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(dsum(col("c_acctbal"), 18, 2).as("s"), count(lit(1)).as("n"))
        .select((col("s") / col("n")).as("avg_bal"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(
          t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_idle"), dsum(col("c_acctbal"), 18, 2).as("idle_bal"))
    }),
    // TPC-H Q7 shape: nation-pair trade volume by ship year — two dim
    // joins on the same broadcast table under different roles, fact joins
    // shuffle on their keys, conditional pair filter before aggregation.
    "q7_volume_shipping" -> ((s, dir) => {
      val n1 = t(s, dir, "nation").select(
        col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(
        col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(
          col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),
    // TPC-H Q8 shape: one nation's market share inside a region by order
    // year — ratio of two exact decimal sums (single IEEE division).
    "q8_market_share" -> ((s, dir) => {
      val nc = t(s, dir, "nation").select(
        col("n_nationkey").as("c_nk"), col("n_regionkey"))
      val ns = t(s, dir, "nation").select(
        col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val asia = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val vol = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nc), col("c_nationkey") === col("c_nk"))
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(ns), col("s_nationkey") === col("s_nk"))
        .select(
          year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
          col("supp_nation"))
      vol.groupBy("o_year")
        .agg(
          (dsum(when(col("supp_nation") === "NATION_5", col("volume")).otherwise(0.0)) /
            dsum(col("volume"))).as("mkt_share"))
    }),
    // TPC-H Q4 shape: order-priority checking — EXISTS-correlated semi
    // join (the testdata has no l_commitdate/l_receiptdate, so "late" is
    // adapted to l_shipdate > o_orderdate + 60 days). The semi join
    // shuffles on orderkey once; count aggregation is partial-agg'd.
    "q4_order_priority" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(
          col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .join(
          t(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),
    // TPC-H Q9 shape: product-type profit by nation×year. The testdata
    // has no partsupp, so supply cost is adapted to 0.6×p_retailprice per
    // unit. 5-table join: facts shuffle on their keys, part filter prunes
    // before the join, nation broadcasts.
    "q9_product_profit" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_name").contains("red")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            lit(0.6) * col("p_retailprice") * col("l_quantity")).as("sum_profit"))
    }),
    // TPC-H Q10 shape: returned-item reporting — top 20 customers by
    // refund-quarter revenue from 'R' lines; deterministic tie-break on
    // c_custkey so the LIMIT picks identical rows on both engines.
    "q10_returned_items" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),
    // TPC-H Q15 shape: top supplier — per-supplier quarter revenue vs its
    // global max, the max joined back as a broadcast one-row scalar (no
    // global sort / single-partition window).
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
      // both sides carry the identical float64 bits (decimal-exact sum →
      // one deterministic cast), so the equality join is engine-stable
      val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
      t(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(top), col("total_revenue") === col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    }),
    // TPC-H Q16 shape: supplier count per (brand,type,size). The testdata
    // has no partsupp, so the part↔supplier relation is taken from
    // lineitem; the comment-LIKE supplier exclusion is adapted to
    // s_acctbal < 0, applied as a broadcast anti join (NOT IN with
    // non-null keys ≡ anti join).
    "q16_supplier_cnt" -> ((s, dir) => {
      val excluded = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      t(s, dir, "lineitem")
        .join(
          t(s, dir, "part").filter(
            col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),
    // TPC-H Q17 shape: small-quantity-order revenue — the correlated
    // per-part AVG decorrelated into a grouped aggregate joined back on
    // partkey (Catalyst's own decorrelation shape). Quantities are
    // integral doubles; the avg is decimal-sum/count so the 0.2×avg
    // threshold is bit-identical on both engines.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val perPart = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((dsum(col("l_quantity"), 18, 2) / count(lit(1))).as("avg_qty"))
      li
        .join(t(s, dir, "part").filter(
          col("p_brand") === "Brand#3" && col("p_type") === "SMALL"),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    }),
    // TPC-H Q19 shape: discounted revenue under three OR'd brand/size/
    // quantity branches — a single scan with one disjunctive residual
    // predicate after the part join (no union of three scans).
    "q19_discounted_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#21" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),
    // TPC-H Q20 shape: potential part promotion — suppliers whose 1997
    // shipped volume of 'red' parts exceeds a threshold (partsupp
    // availqty adapted to shipped-quantity HAVING). Nested IN subqueries
    // become two semi joins; the part filter broadcasts.
    "q20_potential_promotion" -> ((s, dir) => {
      val redParts = t(s, dir, "part")
        .filter(col("p_name").contains("red")).select("p_partkey")
      val bigShippers = t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum(col("l_quantity"), 18, 2).as("ship_qty"))
        .filter(col("ship_qty") > 300.0)
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    }),
    // TPC-H Q21 shape: suppliers who kept orders waiting — the double
    // EXISTS/NOT EXISTS correlation kept as one semi + one anti join on
    // orderkey ("late" adapted to l_shipdate > o_orderdate + 60 days; no
    // receipt/commit dates in the testdata). The late frame appears on
    // both sides of a self-join → cache() it so the exprId-dedup rewrite
    // doesn't recompute its lineage twice.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val late = li
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .cache()
      val l2 = li.select(col("l_orderkey").as("x_orderkey"), col("l_suppkey").as("x_suppkey"))
      val l3 = late.select(col("l_orderkey").as("y_orderkey"), col("l_suppkey").as("y_suppkey"))
      late
        .join(l2,
          col("x_orderkey") === col("l_orderkey") && col("x_suppkey") =!= col("l_suppkey"),
          "left_semi")
        .join(l3,
          col("y_orderkey") === col("l_orderkey") && col("y_suppkey") =!= col("l_suppkey"),
          "left_anti")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),
    // repetition/quality signals (Gopher-style): most-frequent-trigram
    // share + symbol ratio + mean token length per doc. One explode +
    // two hash aggregations keyed on the doc — linear at any corpus size.
    "t6_quality_signals" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tri = docs
        .select(col("doc_id"), explode(TextAnalysis.wordNgramsAll(col("text"), 3)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(max(col("c")).as("top_tri_n"), sum(col("c")).as("n_tri"))
      docs
        .join(tri, "doc_id")
        .select(
          col("doc_id"),
          col("top_tri_n"), col("n_tri"),
          (col("top_tri_n").cast("double") / col("n_tri")).as("top_tri_frac"),
          (length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", "")).cast("double") /
            length(col("text"))).as("symbol_ratio"),
          TextAnalysis.avgTokenLen(col("text")).as("avg_token_len"))
    }),
    // PII redaction + per-kind hit counts over a corpus salted with
    // synthetic emails/phones/IPs (deterministic from doc_id). One
    // codegen'd regexp chain — linear scan, no shuffle.
    "t7_pii_redact" -> ((s, dir) => {
      val salted = t(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com")))
          .when(col("doc_id") % 7 === 1,
            concat(col("text"), lit(" call +1 555 01"), col("doc_id")))
          .when(col("doc_id") % 7 === 2,
            concat(col("text"), lit(" from 10.0."), col("doc_id") % 256, lit(".1")))
          .otherwise(col("text")).as("text"))
      val (ne, np, nip) = TextAnalysis.piiCounts(col("text"))
      salted.select(
        col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("clean_text"),
        ne.as("n_email"), np.as("n_phone"), nip.as("n_ip"))
    }),
    // Gopher repetition signals (dup-line / dup-paragraph fractions +
    // char-mass variants). The flat corpus has no newlines, so the gate
    // synthesizes structure deterministically: ' merge ' → blank line
    // (paragraph break), ' the ' → line break; every doc re-appends its
    // first line and every 4th doc its first paragraph, so both signal
    // families are non-trivial. Exact integer ratios in one double
    // division — engine-exact.
    "t8_repetition_signals" -> ((s, dir) => {
      val st0 = regexp_replace(
        regexp_replace(col("text"), " merge ", "\n\n"), " the ", "\n")
      // first-line copy BEFORE the paragraph copy: a trailing single-\n
      // append would otherwise merge into the copied paragraph and no
      // paragraph would ever repeat verbatim
      val st = concat(
        st0, lit("\n"), substring_index(st0, "\n", 1),
        when(col("doc_id") % 4 === 0,
          concat(lit("\n\n"), substring_index(st0, "\n\n", 1))).otherwise(lit("")))
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.dupLineFraction(st).as("dup_line_frac"),
        TextAnalysis.dupLineCharFraction(st).as("dup_line_char_frac"),
        TextAnalysis.dupParagraphFraction(st).as("dup_para_frac"),
        TextAnalysis.dupParagraphCharFraction(st).as("dup_para_char_frac"))
    }),
    // C4-style heuristic document filter: word-count bounds, mean word
    // length bounds, blocklist terms, terminal punctuation — the flat
    // synthetic corpus is salted deterministically (doc_id mod) so every
    // rule fires on a known subset. Pure column expressions: one codegen'd
    // scan, no shuffle, flags kept for filter-rate reporting.
    "t9_c4_filters" -> ((s, dir) => {
      val salted = t(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" javascript required")))
          .when(col("doc_id") % 11 === 1, concat(col("text"), lit(" lorem ipsum dolor")))
          .when(col("doc_id") % 11 === 2, concat(col("text"), lit(".")))
          .otherwise(col("text")).as("text"))
      val nWords = TextAnalysis.tokenCount(col("text"))
      val meanLen = TextAnalysis.avgTokenLen(col("text"))
      salted.select(
        col("doc_id"),
        nWords.as("n_words"),
        meanLen.as("mean_word_len"),
        (nWords >= 10 && nWords <= 10000).cast("int").as("ok_wordcount"),
        (meanLen >= 3.0 && meanLen <= 10.0).cast("int").as("ok_mean_len"),
        (!col("text").contains("javascript") &&
          !col("text").contains("lorem ipsum")).cast("int").as("ok_blocklist"),
        col("text").endsWith(".").cast("int").as("ends_terminal"))
        .withColumn("keep",
          (col("ok_wordcount") === 1 && col("ok_mean_len") === 1 &&
            col("ok_blocklist") === 1).cast("int"))
    }),
    // frame-sampling plan for video-like payloads: stride-spaced indices,
    // shuffle-free explode (the stage before per-frame decode at scale).
    "mm2_frame_sample" -> ((s, dir) => {
      val clips = t(s, dir, "documents")
        .select(col("doc_id"), (col("n_chars") % 100 + 1).as("frame_count"))
      Multimodal.sampleFrames(clips, "frame_count", 5)
        .select("doc_id", "frame_count", "frame_idx")
    }),
    // CUBE superaggregate (all four grouping sets in one pass) with the
    // grouping-id bitmask — map-side partial agg per set, single shuffle.
    "a12_cube_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
          grouping_id().cast("long").as("gid"),
          dsum(col("l_quantity"), 18, 2).as("sum_qty"),
          count(lit(1)).as("n"))
    }),
    // ranking-function suite over a unique total order (no ties → every
    // rank/quantile value is deterministic; the divisions are single IEEE
    // ops, exact in both engines).
    "w4_rank_suite" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(
          col("o_orderkey"), col("o_orderpriority"),
          dense_rank().over(w).as("drank"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"))
    }),
    // bounded-frame moving aggregate: trailing-4 average per customer.
    // The frame sum accumulates in decimal (exact at any row order), so
    // the windowed value is engine-reproducible; avg = one IEEE division.
    "w5_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-3, 0)
      t(s, dir, "orders")
        .filter(col("o_custkey") % 20 === 0)
        .select(
          col("o_orderkey"), col("o_custkey"),
          sum(col("o_totalprice").cast(DecimalType(28, 10))).over(w)
            .cast("double").as("sum_w"),
          count(lit(1)).over(w).as("n_w"))
        .withColumn("mov_avg", col("sum_w") / col("n_w"))
    }),
    // mergeable quantile sketch (KLL-family builtin). The sketch picks an
    // engine-specific data element, so the gate emits the exact
    // interpolated quantiles (oracle-reproducible, the a14 mechanism) and
    // brackets the sketch values inside the exact ±0.01-rank band — with
    // accuracy 10000 the sketch's rank error is ≤1e-4, so the booleans
    // are robustly true and the accuracy floor rides the compared result.
    "a13_approx_quantiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          approx_percentile(
            col("o_totalprice"), array(lit(0.5), lit(0.9)), lit(10000))
            .as("qs"),
          expr("percentile(o_totalprice, array(0.49, 0.5, 0.51, 0.89, 0.9, 0.91))").as("ex"),
          count(lit(1)).as("n"))
        .select(
          col("o_orderpriority"), col("n"),
          element_at(col("ex"), 2).as("p50_exact"),
          element_at(col("ex"), 5).as("p90_exact"),
          (element_at(col("qs"), 1) >= element_at(col("ex"), 1) &&
            element_at(col("qs"), 1) <= element_at(col("ex"), 3)).as("p50_in_band"),
          (element_at(col("qs"), 2) >= element_at(col("ex"), 4) &&
            element_at(col("qs"), 2) <= element_at(col("ex"), 6)).as("p90_in_band"))
    }),
    // S2 CSV landing source, gate-visible: parquet → headered CSV files →
    // readAligned back (name intersection, try_cast to target types,
    // stamped system column). The round trip is exact: Spark renders
    // doubles as their shortest round-trippable decimal form.
    "s2_csv_roundtrip" -> ((s, dir) => {
      val src = t(s, dir, "part")
        .select("p_partkey", "p_name", "p_brand", "p_retailprice", "p_size")
      val tmp = java.nio.file.Files.createTempDirectory("graft_csv_gate").toString
      src.write.mode("overwrite").option("header", "true").csv(tmp)
      val target = org.apache.spark.sql.types.StructType(
        src.schema.fields :+
          org.apache.spark.sql.types.StructField("ingest_note", StringType))
      CsvIngest.readAligned(s, tmp, target, stamps = Map("ingest_note" -> lit("stamped")))
    }),
    // JSON-lines sink + source round trip (landing-format variant): the
    // frame written as json and read back must be byte-identical to the
    // parquet original — the oracle just reads the original.
    "s3_jsonl_roundtrip" -> ((s, dir) => {
      val src = t(s, dir, "documents").select("doc_id", "lang", "source", "n_chars", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_gate").toString
      src.write.mode("overwrite").json(tmp)
      s.read.schema(src.schema).json(tmp)
    }),
    // ORC sink + source round trip (columnar-format variant), same
    // identity contract.
    "s11_orc_roundtrip" -> ((s, dir) => {
      val src = t(s, dir, "supplier")
      val tmp = java.nio.file.Files.createTempDirectory("graft_orc_gate").toString
      src.write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
    }),
    // the bucketed-zone production path, gate-visible: two daily upserts
    // land orders in a year-partitioned, custkey-bucketed zone
    // (ensureBucketedTable catalog metadata, only the increment shuffles
    // into the bucket layout), then the AGGREGATE⋈DIM star join reads
    // THROUGH the table so the zone side scans pre-distributed by its
    // bucket key — the no-Exchange property ZonesSpec asserts on this
    // same plan shape. Day 2 re-snapshots every (3∤k, 5|k) key with a
    // doubled price, so the result also proves new-version-wins.
    "z1_bucketed_zone" -> ((s, dir) => {
      import graft.sources.Zones
      // deterministic table name + zone location, cleaned BEFORE
      // re-creating: the gate re-runs under the bench harness (warmup +
      // timed passes) and must not accumulate orphan catalog tables or
      // on-disk zone copies per invocation; cleanup-after is impossible
      // because the returned frame reads the table lazily
      val tbl = "graft_z1_zone"
      val tmp = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_z1_zone").getAbsolutePath
      s.sql(s"DROP TABLE IF EXISTS `$tbl`")
      Zones.delete(s, tmp) // scheme-agnostic (Hadoop FS) recursive delete
      val orders = t(s, dir, "orders")
        .withColumn("year_sk", year(col("o_orderdate")))
        .select("o_orderkey", "o_custkey", "o_totalprice", "year_sk")
      val inc1 = orders.filter(col("o_orderkey") % 3 =!= 0)
      Zones.upsertBucketed(
        s, tbl, s"$tmp/agg", inc1, Seq("o_orderkey"), "year_sk", Seq("o_custkey"), 8)
      val inc2 = orders.filter(col("o_orderkey") % 3 === 0)
        .unionByName(
          orders.filter(col("o_orderkey") % 3 =!= 0 && col("o_orderkey") % 5 === 0)
            .withColumn("o_totalprice", col("o_totalprice") * 2))
      Zones.upsertBucketed(
        s, tbl, s"$tmp/agg", inc2, Seq("o_orderkey"), "year_sk", Seq("o_custkey"), 8)
      s.table(tbl)
        .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }),
    // duplicate-cluster resolution: connected components over the LSH-
    // confirmed near-dup pairs (label propagation, one shuffle join per
    // round, rounds = cluster diameter); the oracle closes the same pair
    // set with a recursive CTE. Downstream keep-is_canonical = the dedup.
    "d6_dup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(nearDupCorpus(s, dir), "doc_id", "text", 3, 32, 16, 0.6)
      Curation.dupClusters(pairs, "id_a", "id_b")
    }),
    // test-set decontamination: coverage of each (excerpted) test doc's
    // 3-grams inside any train doc — prefix-filtered inverted-index join,
    // exact-confirmed. Containment = |A∩B|/|B| (asymmetric by design).
    "d7_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val test = docs.filter(col("doc_id") % 10 === 0).select(
        col("doc_id"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 3, 40)).as("text"))
      Curation.containmentPairs(docs, "doc_id", test, "doc_id", "text", 3, 0.8)
    }),
    // corpus-wide line dedup (C4-style: a repeated line survives only at
    // its first (doc,position) occurrence). The flat corpus gets line
    // structure from common-word separators — ~19% of lines repeat
    // somewhere in the corpus, so the op is non-trivial.
    "d8_line_dedup_corpus" -> ((s, dir) => {
      val structured = t(s, dir, "documents").select(
        col("doc_id"),
        regexp_replace(col("text"), " (the|a|value|table) ", "\n").as("text"))
      TextAnalysis.lineDedupCorpus(structured, "doc_id", "text")
    }),
    // incremental dedup against a PERSISTED signature index: day-1 corpus
    // signatures land in a zone once; the day-2 increment computes ITS
    // signatures only and joins the stored index (cross-batch + within-
    // increment pairs). day-1 pairs ∪ new pairs ≡ the full recompute over
    // the union — the oracle is d3's brute-force Jaccard SQL verbatim.
    // At 100 TB this is the daily shape: O(increment) compute against an
    // O(corpus) scan, never an O(corpus) re-shingle (plan-audited).
    "d9_incremental_dedup" -> ((s, dir) => {
      val (idx, day2, idxCounts) = day1SignatureZone(s, dir)
      // day-1 pairs from stored state + the increment against the index:
      // zero shingling of day-1 anywhere in the plan
      Dedup.minhashLshPairsFromIndex(idx, 32, 16, 0.6)
        .unionByName(Dedup.minhashLshPairsIncremental(
          idx, day2, "doc_id", "text", 3, 32, 16, 0.6,
          indexCounts = idxCounts))
    }),
    // incremental CLUSTER maintenance — the consumer of d9's increments:
    // yesterday's assignment (star edges) ∪ today's new pairs re-labels
    // in O(log new-diameter) rounds, no old-pair re-propagation. Result
    // ≡ dupClusters over the full corpus pair set, so the oracle is d6's
    // recursive-CTE closure verbatim.
    "d12_incremental_clusters" -> ((s, dir) => {
      val (idx, day2, idxCounts) = day1SignatureZone(s, dir)
      val assignment = Curation.dupClusters(
        Dedup.minhashLshPairsFromIndex(idx, 32, 16, 0.6), "id_a", "id_b")
      val newPairs = Dedup.minhashLshPairsIncremental(
        idx, day2, "doc_id", "text", 3, 32, 16, 0.6, indexCounts = idxCounts)
      Curation.dupClustersIncremental(assignment, newPairs, "id_a", "id_b")
    }),
    // paragraph-granularity dedup with span offsets: duplicate paragraphs
    // are flagged (not excised) with their [span_start, span_end) in the
    // original text, preserving document identity for surgical cuts.
    // Structure comes from common-word separators as in d8 (different
    // word set → different paragraph population).
    "d10_paragraph_dedup" -> ((s, dir) => {
      val structured = t(s, dir, "documents").select(
        col("doc_id"),
        regexp_replace(col("text"), " (key|row|scan) ", "\n\n").as("text"))
      TextAnalysis.paragraphDedupSpans(structured, "doc_id", "text")
    }),
    // the spans CONSUMED: documents rebuilt from their kept paragraphs by
    // substr over the emitted [span_start, span_end) offsets, while the
    // oracle reassembles the same text from the paragraph VALUES — the
    // two derivations agree bitwise only if every span is exact.
    "d11_paragraph_excise" -> ((s, dir) => {
      val structured = t(s, dir, "documents").select(
        col("doc_id"),
        regexp_replace(col("text"), " (key|row|scan) ", "\n\n").as("text"))
      TextAnalysis.exciseParagraphs(structured, "doc_id", "text",
        TextAnalysis.paragraphDedupSpans(structured, "doc_id", "text"))
    }),
    // TF-IDF term weights (linear idf N/df — one IEEE division, exactly
    // oracle-comparable; log-idf variant is spec-tested).
    "t5_tfidf" -> ((s, dir) => {
      Curation.tfIdf(t(s, dir, "documents"), "doc_id", "text", minDf = 5, minTf = 2)
    }),
    // Okapi BM25 (rational RSJ idf — every factor a single IEEE op chain,
    // so the full score matrix is oracle-checked bitwise).
    "t10_bm25" -> ((s, dir) => {
      Curation.bm25(t(s, dir, "documents"), "doc_id", "text", minDf = 5, minTf = 2)
        .withColumnRenamed("id", "doc_id")
    }),
    // deterministic train/val/test assignment from md5-hash buckets —
    // split membership is reproducible across engines, runs and clusters.
    "c1_hash_split" -> ((s, dir) => {
      Curation.hashSplit(
          t(s, dir, "documents").select("doc_id"), "doc_id",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select("doc_id", "split")
    }),
    // leakage-safe GROUP split: bucket on the source (domain), not the
    // doc — every doc of a source lands in the same split, so near-dup
    // documents within one domain can never straddle train/test.
    "c6_group_split" -> ((s, dir) => {
      Curation.hashSplit(
          t(s, dir, "documents").select("doc_id", "source"), "source",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select("doc_id", "source", "split")
    }),
    // stratified Bernoulli sample over the same buckets: per-language
    // keep rates (en downsampled, fr upsampled, rest at the default).
    "c2_stratified_sample" -> ((s, dir) => {
      Curation.stratifiedSample(
          t(s, dir, "documents").select("doc_id", "lang"), "doc_id", "lang",
          Map("en" -> 25, "fr" -> 75), defaultPct = 50)
        .select("doc_id", "lang")
    }),
    // corpus composition report (the "data mixture" table every training
    // run starts from): per source×lang doc/token counts plus corpus
    // shares. One partial-agg'd groupBy; the totals join back as a
    // broadcast one-row frame — no second pass over the corpus.
    "c3_source_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("source"), col("lang"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
      val grouped = docs.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok").cast("long")).as("n_tokens"))
      val totals = grouped.agg(
        sum(col("n_docs")).as("tot_docs"), sum(col("n_tokens")).as("tot_tokens"))
      grouped.join(broadcast(totals))
        .select(
          col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          (col("n_docs").cast("double") / col("tot_docs")).as("doc_share"),
          (col("n_tokens").cast("double") / col("tot_tokens")).as("token_share"))
    }),
    // sequence packing (pretraining concat-then-chunk): docs ordered by
    // hash within each source stream, concatenated, and cut into
    // fixed-size context windows — each doc gets its window id and start
    // offset. Running total via the de-skewed two-phase prefix sum
    // (cumTokensBySource) so no reducer owns a whole source domain.
    "c5_pack_sequences" -> ((s, dir) => {
      val ctx = 512L
      cumTokensBySource(t(s, dir, "documents")
          .select(
            col("doc_id"), col("source"),
            md5(col("doc_id").cast("string")).as("rk"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok")))
        .select(
          col("doc_id"), col("source"), col("n_tok"),
          floor((col("cum_tokens") - col("n_tok")) / ctx).as("seq_idx"),
          ((col("cum_tokens") - col("n_tok")) % ctx).as("seq_offset"))
    }),
    // per-source token-budget cap (domain-balanced subsampling): docs
    // ranked by md5(doc_id) inside each source, kept while the running
    // token total stays under budget. Running total via the de-skewed
    // two-phase prefix sum (cumTokensBySource): the big window keys on
    // (source, md5-range-bucket), never source alone.
    "c4_token_budget" -> ((s, dir) => {
      cumTokensBySource(t(s, dir, "documents")
          .select(
            col("doc_id"), col("source"),
            md5(col("doc_id").cast("string")).as("rk"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok")))
        .filter(col("cum_tokens") <= 2000L)
        .select("doc_id", "source", "n_tok", "cum_tokens")
    }),
    // deterministic fixed-iteration PageRank over a synthetic link graph
    // (u → u²+1 mod N hubs, u → u div 2 ancestry chain — 56 distinct rank
    // values at sf0.01, so uniformity bugs can't hide): the web-corpus
    // quality signal. 3 Lloyd-style rounds, decimal in-rank sums, oracle
    // unrolls the identical iterations in SQL.
    "g2_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count() // N is a plan literal on both sides
      val edges = docs
        .select(col("doc_id").as("src"), ((col("doc_id") * col("doc_id") + 1) % n).as("dst"))
        .unionByName(
          docs.select(col("doc_id").as("src"), expr("doc_id div 2").as("dst")))
      Curation.pageRankLite(edges, "src", "dst", 3)
        .select(col("node"), round(col("rank"), 12).as("rank_r12"))
    }),
    // PageRank over a graph WITH sinks (¼ of nodes emit no edges):
    // per-round dangling-mass redistribution keeps Σrank = 1 — the
    // production variant for real domain graphs, bitwise against the
    // same unrolled-SQL oracle shape as g2 (the dangling sum is one
    // decimal aggregation per round on both sides).
    "g3_pagerank_dangling" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count() // N is a plan literal on both sides
      val srcs = docs.filter(col("doc_id") % 4 =!= 0)
      val edges = srcs
        .select(col("doc_id").as("src"), ((col("doc_id") * col("doc_id") + 7) % n).as("dst"))
        .unionByName(srcs.select(col("doc_id").as("src"), expr("doc_id div 3").as("dst")))
      Curation.pageRankDangling(edges, "src", "dst", 3)
        .select(col("node"), round(col("rank"), 12).as("rank_r12"))
    }),
    // deterministic token-weight-proportional sampling: systematic
    // selection on the corpus-wide running token total — a doc is picked
    // iff a sampling boundary (k·W/n, k=1..n) falls inside its weight
    // interval, so big documents are proportionally more likely and the
    // whole thing is pure integer arithmetic (no RNG, no transcendental —
    // engine-exact). The running total rides the same de-skewed two-phase
    // prefix sum as c4, under a single constant stratum.
    "c7_weighted_sample" -> ((s, dir) => {
      val n = 100L
      val docs = t(s, dir, "documents").select(
        col("doc_id"), lit("all").as("source"),
        md5(col("doc_id").cast("string")).as("rk"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      val w = docs.agg(sum(col("n_tok")).as("w_total"))
      cumTokensBySource(docs)
        .crossJoin(broadcast(w)) // one-row scalar frame
        .withColumn("sample_bucket", expr(s"(cum_tokens * $n) div w_total"))
        .filter(col("sample_bucket") >
          expr(s"((cum_tokens - n_tok) * $n) div w_total"))
        .select("doc_id", "n_tok", "cum_tokens", "sample_bucket")
    }),
    // ── c8/c9: the corpus pipeline END-TO-END ────────────────────────────
    // Three fixed daily increments — planted cross-day exact dups (+2e7),
    // cross-day near-dups (+4e7), within-day near-dups (+5e7), semantic
    // dups (+6e7: unrelated reversed-token text, identical embedding) and
    // quality rejects (8e7+x) — run through CorpusRun.run, the composition
    // of every incremental dedup operator. c8 compares the PUBLISHED corpus
    // (doc_id, day, text md5, source); the oracle replays the whole
    // quality → exact → near-dup → cluster-keep → semantic chain in DuckDB
    // (per-day closures — a later day's pairs must not retract an earlier
    // day's publish verdict). Semantic geometry is k=1 / θ=0.999: with one
    // cluster the SemDeDup rule degenerates to the global pairwise rule
    // (clustering arithmetic is oracle-pinned separately by e4/e5), and at
    // θ=0.999 only identical embeddings qualify — the testdata embeddings
    // are verified pairwise-distinct with max natural cosine ≤ 0.61 at
    // sf0.001/0.01/0.1, so the oracle's embedding-identity map is exact.
    "c8_corpus_run_3day" -> ((s, dir) => {
      val wh = corpusRunWarehouse(s, dir)
      s.read.parquet(s"$wh/corpus/docs").select(
        col("doc_id"),
        col("ingest_day").cast("string").as("ingest_day"),
        md5(col("text")).as("text_md5"),
        col("source"))
    }),
    // the same three runs' LEDGER counts: per-day input / per-stage drop /
    // published tallies parsed from the SUCCESS rows' messages — the
    // pipeline's own bookkeeping must agree with the oracle's independent
    // stage replay, row for row.
    "c9_corpus_run_ledger" -> ((s, dir) => {
      val wh = corpusRunWarehouse(s, dir)
      def n(pat: String) = regexp_extract(col("message"), pat, 1).cast("bigint")
      graft.sources.Zones.read(s, s"$wh/control/corpus_log")
        .filter(col("process_name") === graft.pipeline.CorpusRun.ProcessName &&
          col("status") === "SUCCESS")
        .select(
          substring(col("start_time").cast("string"), 1, 10).as("run_day"),
          n("input (\\d+),").as("n_input"),
          n("quality-dropped (\\d+)").as("n_quality_dropped"),
          n("exact-dup-dropped (\\d+)").as("n_exact_dropped"),
          n("near-dup-dropped (\\d+)").as("n_neardup_dropped"),
          n("sem-dup-dropped (\\d+)").as("n_sem_dropped"),
          n("fully-excised-docs (\\d+)").as("n_excised_docs"),
          n("published (\\d+)\\.").as("n_published"))
    }),
    // embedding-cosine near-dup: perturbed probes matched back to corpus
    // through the banded sign-bit LSH bucket join (the 100 TB path — no
    // cross join; probe⇄source angle ≈ 0.01 rad → miss P ~1e-13). The
    // brute-force form stays as the ScalaTest oracle (DedupSimilaritySpec).
    "e1_embedding_neardup" -> ((s, dir) => {
      val v = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val probes = v.filter(col("vec_id") % 10 === 0).select(
        (col("vec_id") + 10000000).as("probe_id"),
        concat(
          array(element_at(col("e"), 1) + lit(0.01)),
          slice(col("e"), 2, 10000)).as("pe"))
      // geometry pinned 8x8: the rung this gate's brute-force oracle
      // certifies, stable whatever sf the gate runs at (the AutoGeometry
      // default would size from the corpus — same 8x8 below 4097 rows,
      // but the gate's contract shouldn't move with the data)
      Dedup.embeddingNearDupJoin(probes, "probe_id", "pe", v, "vec_id", "e", 0.99,
          bands = 8, bitsPerBand = 8)
        .select(col("id_a").as("probe_id"), col("id_b").as("match_id"))
    }),
    // e1's INCREMENTAL form: the corpus's sign-bit band keys are persisted
    // once (build-once zone, commit-marker validated); the probe batch
    // computes its own keys only and joins the STORED index — no corpus
    // re-hash anywhere in the query plan (the embedding analog of d9).
    // Same pair set as e1, so e1's brute-force cosine oracle is verbatim.
    "e3_embedding_neardup_incremental" -> ((s, dir) => {
      import graft.sources.Zones
      val v = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val probes = v.filter(col("vec_id") % 10 === 0).select(
        (col("vec_id") + 10000000).as("probe_id"),
        concat(
          array(element_at(col("e"), 1) + lit(0.01)),
          slice(col("e"), 2, 10000)).as("pe"))
      val zone = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft_e3_sigzone_${zoneKey(dir)}").getAbsolutePath
      if (!Zones.exists(s, s"$zone/_SUCCESS")) {
        Zones.delete(s, zone)
        // geometry pinned 8x8 (the e1 note): the gate certifies this
        // rung; production writers default through the size policy
        Dedup.writeEmbeddingSignatureIndex(s, zone, v, "vec_id", "e",
          bands = 8, bitsPerBand = 8, mode = "overwrite")
      }
      // probe ids are offset above every corpus id, so id_a is always the
      // corpus match and id_b the probe (no within-probe pair reaches
      // 0.99 — distinct sources are near-orthogonal; one would fail the
      // oracle hash loudly). The probe keys itself under the zone's
      // recorded geometry/seed (the production path).
      Dedup.embeddingNearDupIncrementalAt(s, zone, probes, "probe_id", "pe", 0.99)
        .select(col("id_b").as("probe_id"), col("id_a").as("match_id"))
    }),
    // deterministic k-means (init vec_id%k, 2 Lloyd rounds, decimal-mean
    // centroids, cid tie-break) — corpus clustering oracle-checked on the
    // full assignment. k=64 puts the gate on the fused NearestCells
    // kernel path (kernelFrom=64): one corpus scan per round, no k-row
    // join amplification — the plan that survives large k. dist is
    // rounded to 6dp for the compare: the two engines' double→decimal
    // casts can round a tie-sitting input one ulp apart (shortest-string
    // vs exact-binary rounding), which wobbles centroid means at ~1e-12
    // — far below assignment margins but visible to a bitwise hash of
    // the raw squared distance.
    "e2_kmeans_clusters" -> ((s, dir) => {
      val v = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      Clustering.kmeansLite(v, "vec_id", "e", 64, 2)
        .select(col("vec_id"), col("cluster"), round(col("dist"), 6).as("dist_r6"))
    }),
    // SemDeDup (semantic dedup, arXiv:2303.09540): e2's deterministic
    // k-means partition + within-cluster cosine pruning with the
    // keep-smallest-id ε-ball rule — oracle-checked on the FULL
    // (vec_id, cluster, is_kept) assignment. Corpus = embeddings ∪
    // perturbed near-copies (cos vs source ≈ 0.99995); natural pairwise
    // cosines top out ≈ 0.60 at both sf, so threshold 0.95 sits in a
    // wide gap and the compare is ulp-safe.
    "e4_semantic_dedup" -> ((s, dir) => {
      val v = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val probes = v.filter(col("vec_id") % 10 === 0).select(
        (col("vec_id") + 10000000).as("vec_id"),
        concat(
          array(element_at(col("e"), 1) + lit(0.01)),
          slice(col("e"), 2, 10000)).as("e"))
      Dedup.semanticDedup(v.unionByName(probes), "vec_id", "e", 64, 2, 0.95)
    }),
    // e4's DAILY shape (the e3/d9 pattern for the semantic family): the
    // day-1 corpus is clustered once into an assignment index; the
    // increment re-derives the decimal-exact centroids from the STORED
    // assignment, assigns itself, and runs the ε-ball rule
    // increment×index + increment×increment — day 1 is never
    // re-clustered. Oracle = a DuckDB replay of the full derivation
    // (two Lloyd rounds, third centroid recompute, probe argmin, both
    // drop rules) — bitwise.
    "e5_semantic_dedup_incremental" -> ((s, dir) => {
      val v = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val probes = v.filter(col("vec_id") % 10 === 0).select(
        (col("vec_id") + 10000000).as("vec_id"),
        concat(
          array(element_at(col("e"), 1) + lit(0.01)),
          slice(col("e"), 2, 10000)).as("e"))
      // standing zone built once per sf dir — the measured work is the
      // daily increment path only (centroids from stored rows onward)
      Dedup.semanticDedupIncremental(day1SemanticZone(s, dir), probes, "vec_id", "e", 0.95)
    }),

    // ── Similarity search (beyond-reference) ─────────────────────────────
    // exact brute-force cosine top-k (rank output, float-free compare).
    "k1_knn_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
    }),
    // LSH-bucketed ANN (scale path). Bucketing makes recall<1 by design,
    // so the gate measures in-gate recall of the PLANTED true neighbor
    // (annPlantedQueries) against the exact brute-force top-10 — the
    // exact side certifies the ground truth, the recall floor rides the
    // compared result as data.
    "k2_knn_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = annPlantedQueries(emb, 20)
      annRecallFrame(
        SimilaritySearch.lshTopK(emb, queries, "vec_id", "embedding", 10),
        SimilaritySearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 10), 20)
    }),
    // IVF ANN (scale path #2), same in-gate planted-recall measurement.
    // nCells=256 exercises the production quantizer shape: the fused
    // NearestCells kernel keeps the plan flat (the literal-array form
    // would put 256×64 coordinates in the expression tree), nProbe=32
    // keeps the probed fraction at 1/8 of the corpus.
    "k3_knn_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = annPlantedQueries(emb, 20)
      annRecallFrame(
        SimilaritySearch.ivfTopK(emb, queries, "vec_id", "embedding", 10,
          nCells = 256, nProbe = 32),
        SimilaritySearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 10), 20)
    }),
    // IVF against a PERSISTED index zone: centroids + cell-partitioned
    // assignments are written once by a build step; the query step reads
    // them — no training, no corpus re-assignment per query (k3 rebuilds
    // both on every call — the one-shot shape). Deterministic build ⇒
    // results identical to k3 on the same planted queries; the only file
    // scans in the query plan are the index zone (plan-audited).
    "k4_knn_ivf_persisted" -> ((s, dir) => {
      import graft.sources.Zones
      val emb = t(s, dir, "embeddings")
      val queries = annPlantedQueries(emb, 20)
      // build-once per sf dir (deterministic build, commit-marker
      // validated): re-invocations measure the query path — the shape
      // this index exists for (build nightly, query all day)
      val zone = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft_k4_ivf_${zoneKey(dir)}").getAbsolutePath
      if (!Zones.exists(s, s"$zone/centroids/_SUCCESS") ||
        !Zones.exists(s, s"$zone/assignments/_SUCCESS")) {
        Zones.delete(s, zone)
        SimilaritySearch.buildIvfIndex(s, zone, emb, "vec_id", "embedding", nCells = 256)
      }
      annRecallFrame(
        SimilaritySearch.ivfTopKPersisted(s, zone, queries, "vec_id", "embedding", 10,
          nProbe = 32),
        SimilaritySearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 10), 20)
    }),
    // INCREMENTAL maintenance of the persisted IVF index: the zone is
    // built from "day 1" (even vec_ids) and "day 2" (odd vec_ids) is
    // folded in by ASSIGNMENT ONLY — quantized against the standing
    // centroids and appended into cell partitions, no sampling and no
    // Lloyd rounds on the increment (plan-audited), with the
    // quantization-drift retrain policy measured on the same pass.
    // Queries over the appended index ≡ an index whose day-2 rows were
    // assigned at build time (same centroids ⇒ same cells), so the
    // recall frame is k3/k4's oracle verbatim over the full corpus.
    "k5_knn_ivf_incremental" -> ((s, dir) => {
      import graft.sources.Zones
      val emb = t(s, dir, "embeddings")
      val queries = annPlantedQueries(emb, 20)
      val zone = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft_k5_ivf_${zoneKey(dir)}").getAbsolutePath
      // build-once day 1 + append-once day 2, both marker-validated: a
      // crash between build and append rebuilds the whole zone (append
      // twice would double day 2)
      if (!Zones.exists(s, s"$zone/centroids/_SUCCESS") ||
        !Zones.exists(s, s"$zone/assignments/_SUCCESS") ||
        !Zones.exists(s, s"$zone/appended/_SUCCESS")) {
        Zones.delete(s, zone)
        // 128 cells: the day-1 half must still exceed the cell count at
        // the smallest sf (250 vectors); nProbe=16 keeps k3's 1/8 probed
        // fraction
        SimilaritySearch.buildIvfIndex(
          s, zone, emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", nCells = 128)
        SimilaritySearch.appendIvfIndex(
          s, zone, emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
        s.range(1).write.mode("overwrite").parquet(s"$zone/appended")
      }
      annRecallFrame(
        SimilaritySearch.ivfTopKPersisted(s, zone, queries, "vec_id", "embedding", 10,
          nProbe = 16),
        SimilaritySearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 10), 20)
    }),

    // ── Temporal joins (beyond-reference; Spark has no native as-of) ─────
    // backward as-of: every event carries the user's last purchase value
    // at that moment (union + window — no inequality nested loop).
    "tj1_asof_last_purchase" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val purchases = events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      TemporalJoins.asofBackward(
        events.select("event_id", "user_id", "ts"),
        purchases, Seq("user_id"), "ts", "ts",
        payloadCols = Seq("value"), rightOrder = Some("event_id"))
        .select(
          col("event_id"), col("user_id"),
          col("asof.value").as("last_purchase_value"))
    }),
    // binned point-in-interval range join: lineitems shipped within 30
    // days of a sampled order's date (equi-join on time bins + residual).
    "tj2_range_ship_window" -> ((s, dir) => {
      val dayUs = 86400000000L
      val windows = t(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey").as("w_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("w_start"))
        .withColumn("w_end", col("w_start") + lit(30L) * dayUs)
      val ships = t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      TemporalJoins.pointInInterval(ships, windows, "ship_us", "w_start", "w_end", 30L * dayUs)
        .groupBy("w_orderkey")
        .agg(count(lit(1)).as("n_shipped"))
    }),
    // forward AS-OF: each event's NEXT purchase (earliest ≥ ts, same
    // user) — the mirror of tj1, one union + window shuffle, no
    // inequality nested loop.
    "tj3_asof_next_purchase" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val purchases = events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      TemporalJoins.asofForward(
        events.select("event_id", "user_id", "ts"),
        purchases, Seq("user_id"), "ts", "ts",
        payloadCols = Seq("value"), rightOrder = Some("event_id"))
        .select(
          col("event_id"), col("user_id"),
          col("asof").getField("value").as("next_purchase_value"))
    }),
    // nearest AS-OF: each event's closest purchase in TIME, either side
    // (equidistant → the backward one) — the feature-attribution join
    // ("which purchase is this impression about") both tj1 and tj3 only
    // half-answer.
    "tj4_asof_nearest_purchase" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val purchases = events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      TemporalJoins.asofNearest(
        events.select("event_id", "user_id", "ts"),
        purchases, Seq("user_id"), "event_id", "ts", "ts",
        payloadCols = Seq("value"), rightOrder = Some("event_id"))
        .select(
          col("event_id"), col("user_id"),
          col("asof").getField("value").as("nearest_purchase_value"))
    }),
    // time-range window frame (RANGE BETWEEN INTERVAL): trailing-1h
    // event count and value sum per user — value-based frames (not ROWS)
    // over event time; the per-user trailing-window feature every
    // behavioral pipeline computes. Decimal frame sum → engine-exact.
    "w7_time_range_frame" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("w7_events")
      s.sql(
        """SELECT event_id, user_id, ts,
          |  COUNT(*) OVER w AS n_1h,
          |  CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE) AS sum_1h
          |FROM w7_events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin)
    }),

    // ── Time-series / streaming-parity (beyond-reference) ────────────────
    // batch run of the streaming windowed aggregation (EventStreams).
    "st1_windowed_counts" -> ((s, dir) => {
      graft.streaming.EventStreams.windowedCounts(t(s, dir, "events"))
        .withColumn("window_start", col("window_start").cast("timestamp_ntz"))
        .withColumn("total_value", col("total_value").cast("double"))
    }),
    // gap sessionization, batch form: window-function islands (lag → gap
    // flag → running session index) — the set-based equivalent of the
    // streaming flatMapGroupsWithState operator.
    "st2_sessionize_batch" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gapUs = 30L * 60 * 1000 * 1000
      val tsUs = unix_micros(col("ts").cast("timestamp")) // exact integer µs
      t(s, dir, "events")
        .withColumn("ts_us", tsUs)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn(
          "new_session",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1)
            .otherwise(0))
        .withColumn("session_idx", sum(col("new_session")).over(byUser))
        .groupBy("user_id", "session_idx")
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
    }),
    // TRUE streaming run of the sessionizer (flatMapGroupsWithState +
    // event-time timeout) over the events parquet via Trigger.AvailableNow.
    // Append mode emits the deterministic closed-session subset: sessions
    // closed inline by a later event of the same user, plus final sessions
    // whose timeout (end + gap) the final watermark (max ts − gap) passed;
    // the per-user trailing session stays in state. The oracle derives
    // exactly that subset from the batch window-function form.
    "st3_sessionize_stream" -> ((s, dir) => {
      import s.implicits._
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      // the drop is a single file; a glob path keeps FileStreamSource from
      // injecting basePath=<the file> (which its own per-batch relation
      // then rejects as "must be a directory")
      val stream = s.readStream.schema(batchSchema).parquet(s"$dir/events*.parquet")
      val rows = stream
        .transform(eventTsToMicros) // nanos-or-micros → µs LTZ (Tables.load parity)
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[graft.streaming.EventStreams.EventRow]
      val name = s"st3_sessions_${System.nanoTime()}"
      graft.streaming.EventStreams
        .sessionizeAvailableNow(s, rows, 30, name, statePartitions = 8)
        .select(
          col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
    }),
    // the PRODUCTION sink path of st3: the same sessionize stream lands
    // in a durable parquet sink under a checkpoint (exactly-once per
    // epoch, nothing collects to the driver) and the gate reads the sink
    // back — proving the restartable path emits the identical closed-
    // session set the memory-sink gate does.
    "st5_sessionize_durable" -> ((s, dir) => {
      import s.implicits._
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(batchSchema).parquet(s"$dir/events*.parquet")
      val rows = stream
        .transform(eventTsToMicros) // nanos-or-micros → µs LTZ (Tables.load parity)
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[graft.streaming.EventStreams.EventRow]
      val tmp = java.nio.file.Files.createTempDirectory("graft_st5_gate")
      graft.streaming.EventStreams
        .sessionizeToParquet(s, rows, 30,
          sinkDir = tmp.resolve("sink").toString,
          checkpointDir = tmp.resolve("ckpt").toString,
          statePartitions = 8)
        .select(
          col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
    }),
    // streaming exact dedup, watermark-bounded state: every event row is
    // DOUBLED in-stream (the crawler-re-delivery shape), then
    // dropDuplicatesWithinWatermark on event_id must emit exactly the
    // original set — each key's state lives only inside the watermark.
    "st6_stream_dedup" -> ((s, dir) => {
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val doubled = s.readStream.schema(batchSchema).parquet(s"$dir/events*.parquet")
        .transform(eventTsToMicros) // nanos-or-micros → µs LTZ (Tables.load parity)
        .withColumn("__copy", explode(array(lit(1), lit(2))))
        .drop("__copy")
      val name = s"st6_dedup_${System.nanoTime()}"
      graft.streaming.EventStreams
        .dedupAvailableNow(s, doubled, Seq("event_id"), name, statePartitions = 8)
        .select(
          col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("event_type"), col("value"))
    }),
    // cross-RUN streaming dedup: st6's watermark state dies with the run;
    // here the fingerprint ZONE is the memory that survives a restart.
    // The stream runs TWICE over the same doubled feed with FRESH
    // checkpoints (the re-delivered-crawl shape) and the output zone must
    // hold exactly the original set once — in-batch dups die in the
    // batch, cross-run dups die on the zone anti-join.
    "st7_stream_dedup_crossrun" -> ((s, dir) => {
      import graft.sources.Zones
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      def feed = s.readStream.schema(batchSchema).parquet(s"$dir/events*.parquet")
        .transform(eventTsToMicros) // nanos-or-micros → µs LTZ (Tables.load parity)
        .withColumn("__copy", explode(array(lit(1), lit(2))))
        .drop("__copy")
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_st7_zones").getAbsolutePath
      Zones.delete(s, root) // the cross-run memory IS what's tested: reset per invocation
      Seq("run1", "run2").foreach { r =>
        graft.streaming.EventStreams.dedupAgainstZone(
          s, feed, Seq("event_id"), s"$root/fp", s"$root/out", s"$root/ckpt_$r")
      }
      s.read.parquet(s"$root/out").select(
        col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("event_type"), col("value"))
    }),
    // ST8: streaming maintenance of the a21 stats zone — each batch's
    // per-(month × event_type) KLL/HLL/count states merge into the
    // stored zone via the staged swap, with the batchId INSIDE the
    // swapped data. Two full runs over the same feed with FRESH
    // checkpoints (the redelivery shape): run 2 must no-op on the
    // high-water mark, so the rollup equals exactly-once stats — counts
    // bitwise vs the batch oracle, sketch estimates in the a21 bands.
    "st8_stats_zone_stream" -> ((s, dir) => {
      import graft.sources.Zones
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      def feed = s.readStream.schema(batchSchema).parquet(s"$dir/events*.parquet")
        .transform(eventTsToMicros) // nanos-or-micros → µs LTZ (Tables.load parity)
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_st8_zones").getAbsolutePath
      Zones.delete(s, root) // the replay protection IS what's tested: reset per invocation
      Seq("run1", "run2").foreach { r =>
        graft.streaming.EventStreams.maintainStatsZone(
          s, feed, s"$root/stats", s"$root/ckpt_$r",
          epochExpr = "date_format(ts, 'yyyy-MM')",
          groupExpr = "event_type",
          valueExpr = "value",
          keyExpr = "user_id")
      }
      val roll = Profiling.rollupStats(
        Profiling.readStatsZone(s, s"$root/stats"), Seq(0.5, 0.9))
      val est = broadcast(roll.select(
        col("grp"), col("n_rows"),
        element_at(col("value_quantiles"), 1).as("q50"),
        element_at(col("value_quantiles"), 2).as("q90"),
        col("key_distinct_est").as("nd_est")))
      t(s, dir, "events")
        .join(est, col("event_type") === col("grp"))
        .groupBy("grp")
        .agg(
          max(col("n_rows")).as("n_rows"),
          avg((col("value") <= col("q50")).cast("double")).as("r50"),
          avg((col("value") <= col("q90")).cast("double")).as("r90"),
          countDistinct(col("user_id")).as("nd_exact"),
          max(col("nd_est")).as("nd_est"))
        .select(
          col("grp").as("event_type"), col("n_rows"),
          (abs(col("r50") - 0.5) <= 0.04).as("p50_in_band"),
          (abs(col("r90") - 0.9) <= 0.04).as("p90_in_band"),
          (abs(col("nd_est") - col("nd_exact")).cast("double") / col("nd_exact") <= 0.05)
            .as("distinct_in_5pct"))
    }),
    // true stream-stream interval join (watermark-bounded state on both
    // sides): each click joined to same-user purchases within the next
    // 4 hours. Inner joins emit on match — over a finite AvailableNow
    // drop the streamed output IS the batch join, which the oracle runs.
    "st4_interval_join_stream" -> ((s, dir) => {
      import s.implicits._
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      def side(eventType: String) = s.readStream.schema(batchSchema)
        .parquet(s"$dir/events*.parquet")
        .transform(eventTsToMicros) // nanos-or-micros → µs LTZ (Tables.load parity)
        .filter(col("event_type") === eventType)
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[graft.streaming.EventStreams.EventRow]
      val name = s"st4_pairs_${System.nanoTime()}"
      graft.streaming.EventStreams
        .intervalJoinAvailableNow(s, side("click"), side("purchase"), 240, name,
          statePartitions = 8)
        .select(
          col("user_id"),
          col("left_ts").cast("timestamp_ntz").as("left_ts"),
          col("right_ts").cast("timestamp_ntz").as("right_ts"),
          col("right_value"))
    }),
    // salted hot-key join (result ≡ plain join; the salt spreads one key
    // over many reducers).
    "sk1_salted_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
        .withColumn("user_bucket", when(col("user_id") % 3 === 0, 0L).otherwise(col("user_id") % 50))
      val dim = t(s, dir, "events").select((col("user_id") % 50).as("user_bucket")).distinct()
        .withColumn("bucket_name", concat(lit("bucket_"), col("user_bucket")))
      SkewJoin.saltedInnerJoin(events, dim, Seq("user_bucket"), 8)
        .groupBy("bucket_name")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
    }),

    // ── Multimodal (beyond-reference) ────────────────────────────────────
    // binary payload column + partition-wise (stub) decode: documents'
    // utf-8 bytes stand in for media blobs; features derive from the raw
    // bytes so the oracle can replay them (docs are ascii → md5(text) ==
    // md5(bytes)).
    "mm_binary_features" -> ((s, dir) => {
      val withPayload = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.decodeFeatures(withPayload, "payload")
        .select(
          col("doc_id"),
          col("media.byte_len").as("byte_len"),
          col("media.width").as("width"),
          col("media.height").as("height"),
          col("media.checksum").as("checksum"))
    }),
    // REAL media-header decode: each doc carries a synthetic-but-valid
    // PNG / JPEG / WAV payload (by doc_id mod 3) whose parameters derive
    // from doc_id; HeaderDecoder parses them back OUT OF THE BYTES (PNG
    // IHDR u32be, JPEG SOF segment walk, WAV RIFF chunk walk — audio maps
    // width=sample rate, height=channels), and the oracle recomputes the
    // deterministic fields arithmetically — if the byte parse is off by
    // even one offset, every row hash-mismatches.
    "mm3_image_headers" -> ((s, dir) => {
      import s.implicits._
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val bytes = (id % 3) match {
            case 0 => Multimodal.Fixtures.pngBytes((id % 800 + 1).toInt, (id % 600 + 1).toInt)
            case 1 => Multimodal.Fixtures.jpegBytes((id % 800 + 1).toInt, (id % 600 + 1).toInt)
            case _ => Multimodal.Fixtures.wavBytes((8000 + (id % 5) * 8000).toInt, (id % 2 + 1).toInt)
          }
          (id, bytes)
        }
        .toDF("doc_id", "payload")
      Multimodal.decodeFeatures(payloads, "payload", decoder = Multimodal.HeaderDecoder)
        .select(
          col("doc_id"),
          col("media.format").as("format"),
          col("media.width").as("width"),
          col("media.height").as("height"),
          col("media.byte_len").as("byte_len"))
    }),

    // MP4/ISO-BMFF header decode: synthetic ftyp+moov(mvhd+trak/tkhd)
    // fixtures with arithmetic-determined params; every 7th payload is
    // TRUNCATED mid-box and must surface as a null meta struct (the
    // malformed-media row-level contract), mirrored by the oracle's CASE
    "mm4_video_headers" -> ((s, dir) => {
      import s.implicits._
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = (id % 1920 + 1).toInt
          val h = (id % 1080 + 1).toInt
          val ts = 1000L + (id % 5) * 600L
          val dur = ts * (id % 300 + 1)
          val full = Multimodal.Fixtures.mp4Bytes(w, h, ts, dur)
          (id, if (id % 7 == 0) full.take(40) else full)
        }
        .toDF("doc_id", "payload")
      Multimodal.decodeVideoMeta(payloads, "payload")
        .select(
          col("doc_id"),
          col("video.timescale").as("timescale"),
          col("video.duration_ticks").as("duration_ticks"),
          (col("video.duration_ticks").cast("double") /
            col("video.timescale").cast("double")).as("duration_sec"),
          col("video.width").as("width"),
          col("video.height").as("height"))
    })
  )

  /** Corpus salted with exact duplicates: every 5th doc re-appears under
    * doc_id+10^7 (mirrored in the oracle SQL CTEs).
    */
  private def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0).withColumn("doc_id", col("doc_id") + 10000000))
  }

  /** Corpus salted with near-duplicates: every 5th doc re-appears under
    * doc_id+2·10^7 with its first five tokens dropped.
    */
  /** ANN gate queries with a PLANTED true neighbor: each query vector is
    * a small deterministic perturbation of corpus vector `vec_id < n`
    * (per-coordinate scaling, cos ≈ 0.998 to its source), so its exact
    * nearest neighbor is known by construction — the testdata embeddings
    * are otherwise near-orthogonal (max cos ≈ 0.5), where "top-10 recall"
    * measures noise ranking, not retrieval. Query ids are offset by 10^6
    * to stay disjoint from corpus ids.
    */
  private val annQueryIdOffset = 100000000L

  private def annPlantedQueries(emb: DataFrame, n: Int): DataFrame =
    emb.filter(col("vec_id") < n).select(
      (col("vec_id") + annQueryIdOffset).as("vec_id"),
      expr("transform(embedding, (x, i) -> double(x) * (1.0d + 0.02d * double(i % 7 - 3)))")
        .as("embedding"))

  /** The oracle-comparable quality frame for an ANN gate: how many
    * planted queries ranked their true (constructed) neighbor first in
    * the EXACT top-k (certifies the ground truth — must be all), and how
    * many the approximate index retrieved anywhere in ITS top-k (the
    * recall under measurement).
    */
  private def annRecallFrame(approx: DataFrame, exact: DataFrame, nQueries: Int): DataFrame = {
    val src = col("query_id") - annQueryIdOffset
    val top1 = exact.filter(col("rank") === 1 && col("neighbor_id") === src)
      .agg(count(lit(1)).as("n_top1_exact"))
    val hit = approx.filter(col("neighbor_id") === src)
      .select(countDistinct(col("query_id")).as("n_hit"))
    // measured planted recall is 1.0 for both k2 and k3 at sf0.001/0.01/
    // 0.1 (perturbed queries keep cos≈0.998 to their source — multi-probe
    // LSH and 32-of-256-cell IVF both retrieve it); the gate floors it at
    // 0.9 so the driver compares the floor as data while the raw values
    // stay spec-tracked in DedupSimilaritySpec
    top1.crossJoin(hit).select(
      lit(nQueries.toLong).as("n_queries"),
      col("n_top1_exact"),
      (col("n_hit").cast("double") / nQueries >= 0.9).as("recall_ge_090"))
  }

  /** Mutation-id offset of [[nearDupCorpus]]: mutated copies land at
    * doc_id + 2·10^7. Verified at corpus construction — if the documents
    * table ever carried ids ≥ the offset (a larger SF), mutated ids would
    * COLLIDE with originals and every planted-truth count would silently
    * diverge from its oracle; failing loudly here is the guard. The d4
    * oracle mirrors the same `doc_id < offset` bound.
    */
  private val NearDupOffset = 20000000L

  /** Filesystem-safe key for per-sf-dir build-once index zones. */
  private def zoneKey(dir: String): String = dir.replaceAll("[^A-Za-z0-9]+", "_")

  /** The shared day-1 MinHash signature zone of the incremental dedup
    * gates (d9, d12): BUILD-ONCE per sf dir (a stale zone from a
    * different scale must never serve), validated by the parquet commit
    * marker — the build is deterministic, so re-invocations (bench
    * warmup + timed passes) measure the STEADY STATE the operators are
    * designed for. Returns (stored index, day-2 increment).
    */
  /** a21's stats zone, built once per sf dir (commit-marker validated,
    * dir-keyed like the d9/k4/e3 index zones): per-month × returnflag
    * KLL/HLL states over lineitem — the steady-state nightly build whose
    * rollups then never rescan raw rows.
    */
  private def monthlyStatsZone(s: SparkSession, dir: String): String = {
    import graft.sources.Zones
    val zone = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_a21_statszone_${zoneKey(dir)}").getAbsolutePath
    if (!Zones.exists(s, s"$zone/_SUCCESS")) {
      Zones.delete(s, zone)
      Profiling.writeStatsZone(
        t(s, dir, "lineitem"), zone,
        epochExpr = "date_format(l_shipdate, 'yyyy-MM')",
        groupExpr = "l_returnflag",
        valueExpr = "l_extendedprice",
        keyExpr = "l_partkey")
    }
    zone
  }

  private def day1SignatureZone(
      s: SparkSession, dir: String): (DataFrame, DataFrame, Option[DataFrame]) = {
    import graft.sources.Zones
    val corpus = nearDupCorpus(s, dir)
    val day1 = corpus.filter(col("doc_id") % 3 =!= 0)
    val day2 = corpus.filter(col("doc_id") % 3 === 0)
    val zone = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_d9_sigzone_${zoneKey(dir)}").getAbsolutePath
    if (!Zones.exists(s, s"$zone/_SUCCESS")) {
      Zones.delete(s, zone)
      Dedup.writeSignatureIndex(s, zone, day1, "doc_id", "text", 3, 32,
        mode = "overwrite", bands = 16)
    }
    // stored bucket counts (absent only for a zone written pre-upgrade):
    // the increment probe then skips the index-side counting scan
    (Dedup.readSignatureIndex(s, zone), day2, Dedup.readBucketCounts(s, zone))
  }

  /** e5's standing day-1 semantic assignment zone, built ONCE per sf dir
    * (the d9/k4 pattern): the gate then measures the DAILY path —
    * centroid replay from the stored rows + increment assignment + the
    * ε-ball joins — not the day-1 clustering it would never redo in
    * production.
    */
  private def day1SemanticZone(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Zones
    val zone = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_e5_semzone_${zoneKey(dir)}").getAbsolutePath
    if (!Zones.exists(s, s"$zone/_SUCCESS")) {
      Zones.delete(s, zone)
      val v = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      // zone file count from the corpus row count (Zones.sizedForWrite):
      // one assignment row per embedding, so the embeddings count IS the
      // zone's row count — a straight write landed one near-empty file
      // per shuffle partition and every e5 probe then paid file-count
      // scan tasks
      val nVecs = v.count()
      Zones.sizedForWrite(
        Dedup.semanticDedup(v, "vec_id", "e", 64, 2, 0.95)
          .select(col("vec_id").as("id"), col("cluster"))
          .join(v.select(col("vec_id").as("id"), col("e").as("v")), "id"),
        nVecs)
        .write.mode("overwrite").parquet(zone)
    }
    s.read.parquet(zone)
  }

  /** c8/c9's standing 3-day corpus warehouse, built ONCE per sf dir (the
    * d9/k4/e5 build-once pattern, marker-validated): three deterministic
    * increments through [[graft.pipeline.CorpusRun.run]] end to end —
    * quality suite, exact/near/semantic dedup against the standing zones,
    * paragraph excision, publish, stats, ledger. Re-invocations hit the
    * ranToday gate (SKIPPED) and measure reads of the standing output.
    *
    * Planted structure (all offsets collision-free: base doc_id < 10^7):
    *   day1 = base docs with doc_id % 3 == 0
    *   day2 = base % 3 == 1
    *        ∪ +2e7 exact copies of day-1 docs (% 15 == 0)
    *        ∪ three quality rejects (null text / all-symbol / 3 tokens)
    *   day3 = base % 3 == 2
    *        ∪ +4e7 drop-5-token mutations of day-1 docs (% 15 == 6)
    *        ∪ +5e7 same mutations of day-3 docs (% 15 == 2 — the
    *          WITHIN-day near-dup leg)
    *        ∪ +6e7 semantic probes of day-1 docs (% 15 == 9, with an
    *          embedding): reversed-token text (no shingle overlap with
    *          the source) carrying the source's EXACT embedding — they
    *          reach the semantic stage and drop there iff their source
    *          was published.
    * The quality suite is the oracle-replayable 3-rule prefix of the
    * default suite (null / alpha-ratio / token floor); semantic runs at
    * k=1, θ=0.999 (see the c8 gate comment for why that makes the
    * chain clustering-independent and the oracle exact).
    */
  private def corpusRunWarehouse(s: SparkSession, dir: String): String = {
    import graft.pipeline.CorpusRun
    import graft.sources.Zones
    val wh = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_c8_wh_${zoneKey(dir)}").getAbsolutePath
    val marker = s"$wh/_GATE_DONE"
    if (!Zones.exists(s, marker)) {
      Zones.delete(s, wh)
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"), col("source"))
      def mut5(c: Column): Column =
        concat_ws(" ", slice(TextAnalysis.tokens(c), 6, 1000000))
      def revTok(c: Column): Column =
        concat_ws(" ", reverse(TextAnalysis.tokens(c)))
      val emb = t(s, dir, "embeddings").select(col("vec_id").as("doc_id"), col("embedding"))
      val semSrc = docs.filter(col("doc_id") % 15 === 9).join(emb, Seq("doc_id"))
      def junkRow(id: Long, text: Column) = s.range(1).select(
        lit(id).as("doc_id"), text.as("text"), lit("junk").as("source"))
      val day1 = docs.filter(col("doc_id") % 3 === 0)
      val day2 = docs.filter(col("doc_id") % 3 === 1)
        .unionByName(docs.filter(col("doc_id") % 15 === 0).select(
          (col("doc_id") + 20000000L).as("doc_id"), col("text"), lit("replant").as("source")))
        .unionByName(junkRow(80000001L, lit(null).cast("string")))
        .unionByName(junkRow(80000002L, lit("!!! ??? !!!")))
        .unionByName(junkRow(80000003L, lit("a b c")))
      val day3 = docs.filter(col("doc_id") % 3 === 2)
        .unionByName(docs.filter(col("doc_id") % 15 === 6).select(
          (col("doc_id") + 40000000L).as("doc_id"), mut5(col("text")).as("text"),
          lit("neardup").as("source")))
        .unionByName(docs.filter(col("doc_id") % 15 === 2).select(
          (col("doc_id") + 50000000L).as("doc_id"), mut5(col("text")).as("text"),
          lit("neardup_intra").as("source")))
        .unionByName(semSrc.select(
          (col("doc_id") + 60000000L).as("doc_id"), revTok(col("text")).as("text"),
          lit("semdup").as("source")))
      Seq(day1 -> "day1", day2 -> "day2", day3 -> "day3").foreach { case (df, name) =>
        df.write.mode("overwrite").parquet(s"$wh/feed/$name")
      }
      emb.unionByName(
          semSrc.select((col("doc_id") + 60000000L).as("doc_id"), col("embedding")))
        .write.mode("overwrite").parquet(s"$wh/feed/emb")
      val rules = Seq(
        CorpusRun.QualityRule("null_text", col("text").isNull),
        CorpusRun.QualityRule("alpha_ratio", TextAnalysis.alphaRatio(col("text")) < 0.25),
        CorpusRun.QualityRule("min_tokens", TextAnalysis.tokenCount(col("text")) < 5))
      // targetOccupancy 64: the versioned semantic index re-clusters
      // mid-gate at sf0.01 (cumulative ~130 embedded rows trip >128 on
      // day 2) and twice at sf0.1 — the END-TO-END proof that the
      // occupancy lifecycle cannot move the published corpus: identical
      // embeddings co-cluster under ANY geometry (same nearest centroid,
      // ties to lower cid) and the natural pairwise cosine ceiling
      // (≤0.61) sits far under θ=0.999, so the oracle's k-independent
      // identity replay stays exact across every flip.
      val sem = Some(CorpusRun.SemanticStage(
        s"$wh/feed/emb", k = 1, iters = 2, threshold = 0.999,
        targetOccupancy = 64))
      Seq("2026-01-01" -> "day1", "2026-01-02" -> "day2", "2026-01-03" -> "day3").foreach {
        case (d, name) =>
          CorpusRun.run(s, s"$wh/feed/$name", wh, s"$d 08:00:00",
            qualityRules = rules, semantic = sem)
      }
      val fs = new org.apache.hadoop.fs.Path(marker)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.create(new org.apache.hadoop.fs.Path(marker), true).close()
    }
    wh
  }

  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val maxId = docs.agg(max(col("doc_id")).cast("long")).head().getLong(0)
    require(maxId < NearDupOffset,
      s"documents doc_id max $maxId collides with the nearDupCorpus mutation " +
        s"offset $NearDupOffset — raise the offset for this scale factor")
    docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + NearDupOffset).as("doc_id"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 6, 1000000)).as("text")))
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier_volume" ->
      """SELECT n_name, CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "q2_cheapest_per_brand" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part p
        |WHERE p_retailprice = (
        |  SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)""".stripMargin,
    "j10_nullsafe_join" ->
      """WITH a AS (
        |  SELECT p_partkey, CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_size END AS sz FROM part),
        |b AS (
        |  SELECT p_partkey + 1000000 AS other_key,
        |    CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_size END AS sz
        |  FROM part WHERE (p_partkey + 1000000) % 200 = 0)
        |SELECT other_key, COUNT(*) AS n_matches
        |FROM a JOIN b ON a.sz IS NOT DISTINCT FROM b.sz
        |GROUP BY other_key""".stripMargin,
    "q12_priority_distribution" ->
      """SELECT l_returnflag, o_orderpriority, COUNT(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_quantity >= 25
        |GROUP BY l_returnflag, o_orderpriority""".stripMargin,
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
    "a7_rollup_revenue" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS calendar_year, o_orderpriority,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue, COUNT(*) AS n_orders
        |FROM orders GROUP BY ROLLUP (1, 2)""".stripMargin,
    "a8_distinct_counts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a11_midrange_udaf" ->
      """SELECT p_brand, (MAX(p_retailprice)+MIN(p_retailprice))/2 AS avg_price
        |FROM part GROUP BY p_brand""".stripMargin,
    "q14_promo_share" ->
      """SELECT
        |  CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS promo_revenue,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "a9_percentile_disc" ->
      """SELECT o_orderpriority,
        |  quantile_disc(o_totalprice, 0.5) AS p50,
        |  quantile_disc(o_totalprice, 0.95) AS p95,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "a14_percentile_cont" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.25) AS q25,
        |  quantile_cont(o_totalprice, 0.5) AS q50,
        |  quantile_cont(o_totalprice, 0.9) AS q90,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // the sketch gates compare the EXACT side plus the sketch's error/
    // recall floor as data (the sketch values themselves are
    // engine-specific): the oracle recomputes the exact values and
    // asserts the floors as literals — any out-of-bound sketch flips the
    // boolean and fails the hash compare
    "a10_hll_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact, TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a19_hll_merge" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_exact,
        |  TRUE AS within_5pct, TRUE AS merge_within_2pct
        |FROM lineitem""".stripMargin,
    "a20_kll_merge" ->
      """SELECT COUNT(*) AS n_exact, TRUE AS p50_in_band,
        |  TRUE AS p90_in_band, TRUE AS merge_consistent
        |FROM lineitem""".stripMargin,
    "a21_stats_zone_rollup" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows, TRUE AS p50_in_band,
        |  TRUE AS p90_in_band, TRUE AS distinct_in_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "b1_quantile_bins" ->
      """SELECT CAST(r.range AS INT) AS bin,
        |  (SELECT COUNT(*) FROM lineitem) AS n_total,
        |  TRUE AS frac_in_band
        |FROM range(4) r""".stripMargin,
    "t12_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                            x -> x <> '')) AS token
        |  FROM documents
        |  UNION ALL
        |  SELECT 'hot' || CAST(doc_id % 3 AS VARCHAR) AS token
        |  FROM documents CROSS JOIN range(40)
        |), c AS (SELECT token, COUNT(*) AS n_exact FROM toks GROUP BY token),
        |tot AS (SELECT COUNT(*) AS n_total FROM toks)
        |SELECT token, n_exact, TRUE AS captured, TRUE AS bounds_ok
        |FROM c CROSS JOIN tot
        |WHERE n_exact > 3.5 / 32.0 * n_total""".stripMargin,
    "a13_approx_quantiles" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  quantile_cont(o_totalprice, 0.5) AS p50_exact,
        |  quantile_cont(o_totalprice, 0.9) AS p90_exact,
        |  TRUE AS p50_in_band, TRUE AS p90_in_band
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "d4_simhash_pairs" ->
      """SELECT COUNT(*) AS n_planted, TRUE AS recall_ge_030
        |FROM documents WHERE doc_id % 5 = 0 AND doc_id < 20000000""".stripMargin,
    "k2_knn_lsh" ->
      """SELECT CAST(20 AS BIGINT) AS n_queries, CAST(20 AS BIGINT) AS n_top1_exact,
        |  TRUE AS recall_ge_090""".stripMargin,
    "k3_knn_ivf" ->
      """SELECT CAST(20 AS BIGINT) AS n_queries, CAST(20 AS BIGINT) AS n_top1_exact,
        |  TRUE AS recall_ge_090""".stripMargin,
    "k4_knn_ivf_persisted" ->
      """SELECT CAST(20 AS BIGINT) AS n_queries, CAST(20 AS BIGINT) AS n_top1_exact,
        |  TRUE AS recall_ge_090""".stripMargin,
    "k5_knn_ivf_incremental" ->
      """SELECT CAST(20 AS BIGINT) AS n_queries, CAST(20 AS BIGINT) AS n_top1_exact,
        |  TRUE AS recall_ge_090""".stripMargin,
    "a22_skew_report" ->
      """WITH c AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |t AS (SELECT key, n FROM c ORDER BY n DESC, key LIMIT 10),
        |o AS (SELECT CAST(SUM(n) AS BIGINT) AS n_rows, COUNT(*) AS n_keys FROM c),
        |t1 AS (SELECT key AS max_key, n AS max_key_n FROM t ORDER BY n DESC, key LIMIT 1),
        |ts AS (SELECT CAST(SUM(n) AS BIGINT) AS top10_n FROM t)
        |SELECT n_rows, n_keys, max_key, max_key_n, top10_n,
        |  max_key_n / (CAST(n_rows AS DOUBLE) / n_keys) AS skew_ratio,
        |  CAST(top10_n AS DOUBLE) / n_rows AS top10_share
        |FROM o, t1, ts""".stripMargin,
    "a16_column_profile" ->
      """WITH src AS (
        |  SELECT p_brand,
        |    CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_size END AS p_size,
        |    p_retailprice
        |  FROM part),
        |a AS (SELECT COUNT(*) AS n_rows,
        |  COUNT(p_brand) AS b_nn, COUNT(DISTINCT p_brand) AS b_nd,
        |  CAST(MIN(p_brand) AS VARCHAR) AS b_min, CAST(MAX(p_brand) AS VARCHAR) AS b_max,
        |  COUNT(p_size) AS s_nn, COUNT(DISTINCT p_size) AS s_nd,
        |  CAST(MIN(p_size) AS VARCHAR) AS s_min, CAST(MAX(p_size) AS VARCHAR) AS s_max,
        |  COUNT(p_retailprice) AS r_nn, COUNT(DISTINCT p_retailprice) AS r_nd,
        |  CAST(MIN(p_retailprice) AS VARCHAR) AS r_min, CAST(MAX(p_retailprice) AS VARCHAR) AS r_max
        |  FROM src)
        |SELECT 'p_brand' AS col_name, n_rows, n_rows - b_nn AS n_nulls,
        |  b_nd AS n_distinct, b_min AS min_str, b_max AS max_str FROM a
        |UNION ALL SELECT 'p_size', n_rows, n_rows - s_nn, s_nd, s_min, s_max FROM a
        |UNION ALL SELECT 'p_retailprice', n_rows, n_rows - r_nn, r_nd, r_min, r_max FROM a""".stripMargin,
    "cdc1_snapshot_diff" ->
      """WITH snap1 AS (SELECT p_partkey AS id, p_retailprice AS price, p_size AS psize FROM part),
        |snap2 AS (
        |  SELECT id, CASE WHEN id % 10 = 0 THEN price + 100.0 ELSE price END AS price, psize
        |  FROM snap1 WHERE id % 7 <> 0
        |  UNION ALL SELECT id + 100000, price, psize FROM snap1 WHERE id % 13 = 0),
        |j AS (
        |  SELECT o.id AS oid, o.price AS oprice, o.psize AS opsize,
        |         c.id AS cid, c.price AS cprice, c.psize AS cpsize
        |  FROM snap1 o FULL OUTER JOIN snap2 c ON o.id = c.id)
        |SELECT
        |  CASE WHEN oid IS NULL THEN 'insert'
        |       WHEN cid IS NULL THEN 'delete'
        |       WHEN oprice IS DISTINCT FROM cprice OR opsize IS DISTINCT FROM cpsize
        |         THEN 'update' END AS op,
        |  COALESCE(cid, oid) AS id,
        |  CASE WHEN cid IS NULL THEN oprice ELSE cprice END AS price,
        |  CASE WHEN cid IS NULL THEN opsize ELSE cpsize END AS psize
        |FROM j
        |WHERE oid IS NULL OR cid IS NULL
        |   OR oprice IS DISTINCT FROM cprice OR opsize IS DISTINCT FROM cpsize""".stripMargin,
    "a18_histogram" ->
      """SELECT CASE WHEN o_totalprice < 0.0 THEN 0
        |            WHEN o_totalprice >= 600000.0 THEN 13
        |            ELSE CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1 END AS bucket,
        |  COUNT(*) AS n
        |FROM orders GROUP BY bucket""".stripMargin,
    "bf1_bloom_prefilter_join" ->
      """WITH sel AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total
        |FROM lineitem JOIN sel ON l_orderkey = o_orderkey""".stripMargin,
    "a17_incremental_rollup" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "a15_quantile_matrix" ->
      """WITH g AS (
        |  SELECT o_orderpriority,
        |    quantile_cont(o_totalprice, [0.1, 0.25, 0.5, 0.75, 0.9]) AS qs,
        |    COUNT(*) AS n
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, CAST(generate_subscripts(qs, 1) - 1 AS INT) AS pos,
        |  unnest(qs) AS q, n
        |FROM g""".stripMargin,
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
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
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
    "set_intersect_nations" ->
      "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier",
    "j11_full_outer_presence" ->
      """WITH c AS (SELECT c_nationkey AS ck, COUNT(*) AS n_cust FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS sk, COUNT(*) AS n_supp FROM supplier
        |      WHERE s_suppkey % 3 = 0 GROUP BY 1)
        |SELECT COALESCE(ck, sk) AS nationkey, COALESCE(n_cust, 0) AS n_cust,
        |  COALESCE(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON ck = sk""".stripMargin,
    "g1_collect_sorted_sets" ->
      """SELECT s_nationkey, array_to_string(list_sort(list(DISTINCT s_suppkey)), ',') AS supp_keys
        |FROM supplier GROUP BY s_nationkey""".stripMargin,
    "w1_top3_orders_per_segment" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) WHERE rn <= 3""".stripMargin,
    "w2_top10_orders" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "w3_pivot_status_matrix" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "t4_token_frequencies" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
        |  FROM documents)
        |GROUP BY token""".stripMargin,
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
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50""".stripMargin,
    "f3_price_parse" ->
      """WITH raw AS (
        |  SELECT o_orderkey, CASE WHEN o_orderkey % 100 = 0 THEN ''
        |    ELSE CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR) || 'đ' END AS raw_price
        |  FROM orders)
        |SELECT o_orderkey, CAST(CAST(COALESCE(TRY_CAST(NULLIF(regexp_replace(raw_price, '[.,đ₫\s]', '', 'g'), '') AS DECIMAL(18,2)),
        |  CAST(-1 AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS price
        |FROM raw""".stripMargin,
    "f4_screen_size_parse" ->
      """WITH raw AS (
        |  SELECT p_partkey, CASE WHEN p_partkey % 100 = 0 THEN ''
        |    ELSE CAST(p_size AS VARCHAR) || '.' || CAST(p_partkey % 10 AS VARCHAR) || ' inches' END AS raw_size
        |  FROM part)
        |SELECT p_partkey, CAST(CAST(COALESCE(TRY_CAST(NULLIF(regexp_extract(raw_size, '[0-9]*\.?[0-9]+', 0), '') AS DECIMAL(4,2)),
        |  CAST(-1 AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS screen_size
        |FROM raw""".stripMargin,
    "a5_price_minmax" ->
      """WITH raw AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 5 = 0 THEN -1.0
        |         WHEN p_partkey % 7 = 0 THEN NULL
        |         ELSE p_retailprice END AS gia_cu,
        |    CASE WHEN p_partkey % 3 = 0 THEN -1.0
        |         ELSE p_retailprice * 0.9 END AS gia_moi
        |  FROM part),
        |eff AS (
        |  SELECT p_partkey,
        |    CASE WHEN gia_cu IS NOT NULL AND gia_cu <> -1 THEN gia_cu END AS cu,
        |    CASE WHEN gia_moi IS NOT NULL AND gia_moi <> -1 THEN gia_moi END AS moi
        |  FROM raw)
        |SELECT p_partkey,
        |  COALESCE(LEAST(cu, moi), cu, moi) AS min_price,
        |  COALESCE(GREATEST(cu, moi), cu, moi) AS max_price
        |FROM eff""".stripMargin,
    "f9_normalize_url" ->
      """WITH raw AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 10 = 0 THEN ''
        |         WHEN p_partkey % 10 = 1 THEN NULL
        |         WHEN p_partkey % 3 = 0 THEN '/sp/item-' || CAST(p_partkey AS VARCHAR)
        |         ELSE 'https://base.example/item-' || CAST(p_partkey AS VARCHAR) END AS link
        |  FROM part)
        |SELECT p_partkey,
        |  CASE WHEN link IS NULL OR link = '' THEN 'Unknown'
        |       WHEN NOT starts_with(link, 'http') THEN 'https://base.example' || link
        |       ELSE link END AS url
        |FROM raw""".stripMargin,
    "f14_int_parse" ->
      """WITH raw AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 13 = 0 THEN ''
        |         WHEN p_partkey % 11 = 0 THEN 'Đen512'
        |         WHEN p_partkey % 7 = 0 THEN '1 TB'
        |         WHEN p_partkey % 3 = 0 THEN CAST(p_size AS VARCHAR) || ' GB'
        |         ELSE CAST(p_size AS VARCHAR) END AS raw
        |  FROM part)
        |SELECT p_partkey,
        |  CASE WHEN raw IS NULL OR raw = '' THEN -1
        |       ELSE COALESCE(TRY_CAST(regexp_extract(regexp_replace(raw, 'GB| ', '', 'g'), '^-?[0-9]+', 0) AS INT), 0)
        |       END AS v
        |FROM raw""".stripMargin,
    "f10_ram_storage_split" ->
      """WITH raw AS (
        |  SELECT p_partkey, CASE
        |    WHEN p_partkey % 3 = 0 THEN CAST(p_size AS VARCHAR) || ' GB - ' || CAST(p_size*8 AS VARCHAR) || ' GB'
        |    WHEN p_partkey % 3 = 1 THEN CAST(p_size % 60 AS VARCHAR) || ' GB'
        |    ELSE CAST(p_size + 100 AS VARCHAR) || ' GB' END AS raw
        |  FROM part),
        |parsed AS (
        |  SELECT p_partkey, string_split(raw, ' - ') AS parts,
        |    COALESCE(TRY_CAST(NULLIF(regexp_replace(parts[1], 'GB|\s', '', 'gi'), '') AS INT), -1) AS first_v,
        |    CASE WHEN len(parts) >= 2
        |      THEN COALESCE(TRY_CAST(NULLIF(regexp_replace(parts[2], 'GB|\s', '', 'gi'), '') AS INT), -1)
        |      ELSE NULL END AS second_v
        |  FROM raw)
        |SELECT p_partkey,
        |  CASE WHEN len(parts) >= 2 THEN first_v
        |       WHEN first_v >= 64 THEN -1 ELSE first_v END AS ram,
        |  CASE WHEN len(parts) >= 2 THEN second_v
        |       WHEN first_v >= 64 THEN first_v ELSE -1 END AS storage
        |FROM parsed""".stripMargin,
    "f12_dim_date" ->
      """WITH days AS (
        |  SELECT CAST(i AS INT) + 1 AS date_sk, DATE '2020-01-01' + CAST(i AS INT) AS d,
        |    (dayofweek(DATE '2020-01-01' + CAST(i AS INT)) + 6) % 7 AS wd
        |  FROM generate_series(0, datediff('day', DATE '2020-01-01', DATE '2021-12-31')) t(i)),
        |wk AS (
        |  SELECT *, d - CAST(((wd + 1) % 7) AS INT) AS sun_week, d - CAST(wd AS INT) AS mon_week,
        |    CAST(year(d) AS INT) AS yr FROM days),
        |wn AS (
        |  SELECT *,
        |    CAST(floor(datediff('day', make_date(yr, 1, 1), sun_week) / 7.0) AS INT) + 1 AS sun_woy,
        |    CAST(floor(datediff('day', make_date(yr, 1, 1), mon_week) / 7.0) AS INT) + 1 AS mon_woy
        |  FROM wk)
        |SELECT date_sk, d AS full_date,
        |  CAST(dayofmonth(d) AS INT) AS int_day, CAST(month(d) AS INT) AS int_month,
        |  ['Thứ Hai','Thứ Ba','Thứ Tư','Thứ Năm','Thứ Sáu','Thứ Bảy','Chủ Nhật'][CAST(wd AS INT)+1] AS day_of_week,
        |  'Tháng ' || CAST(month(d) AS VARCHAR) AS calendar_month,
        |  yr AS calendar_year, strftime(d, '%Y-%m') AS calendar_year_month,
        |  CAST(dayofmonth(d) AS INT) AS date_of_month, CAST(dayofyear(d) AS INT) AS day_of_year,
        |  sun_woy AS sun_week_of_year, printf('%d-W%02d (Sun)', yr, sun_woy) AS sun_year_week, sun_week,
        |  mon_woy AS mon_week_of_year, printf('%d-W%02d (Mon)', yr, mon_woy) AS mon_year_week, mon_week,
        |  'Q' || CAST(quarter(d) AS VARCHAR) AS quarter,
        |  make_date(yr, (CAST(month(d) AS INT)-1)//3*3 + 1, 1) AS quarter_of_year,
        |  'Không' AS holiday,
        |  CASE WHEN wd >= 5 THEN 'Cuối tuần' ELSE 'Ngày thường' END AS day_type
        |FROM wn""".stripMargin,
    "scd2_two_rounds" ->
      """WITH snap1 AS (SELECT p_partkey AS id, p_retailprice AS price, p_size AS psize FROM part),
        |snap2 AS (
        |  SELECT id, CASE WHEN id % 10 = 0 THEN price + 100.0 ELSE price END AS price, psize
        |  FROM snap1 WHERE id % 7 <> 0
        |  UNION ALL SELECT id + 100000, price, psize FROM snap1 WHERE id % 13 = 0),
        |h1 AS (
        |  SELECT id, price, psize, TIMESTAMP '2024-01-01 00:00:00' AS created_at,
        |    TIMESTAMP '2024-01-01 00:00:00' AS updated_at, TIMESTAMP '9999-12-31 00:00:00' AS expired_at
        |  FROM snap1),
        |new2 AS (
        |  SELECT s.id, s.price, s.psize, TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-02 00:00:00',
        |    TIMESTAMP '9999-12-31 00:00:00'
        |  FROM snap2 s WHERE NOT EXISTS (
        |    SELECT 1 FROM h1 t WHERE t.id = s.id AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00')),
        |ek AS (
        |  SELECT t.id FROM h1 t JOIN snap2 s ON t.id = s.id AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00'
        |  WHERE t.price <> s.price OR t.psize <> s.psize),
        |h1m AS (
        |  SELECT t.id, t.price, t.psize, t.created_at,
        |    CASE WHEN ek.id IS NOT NULL AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00'
        |      THEN TIMESTAMP '2024-01-02 00:00:00' ELSE t.updated_at END AS updated_at,
        |    CASE WHEN ek.id IS NOT NULL AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00'
        |      THEN TIMESTAMP '2024-01-02 00:00:00' ELSE t.expired_at END AS expired_at
        |  FROM h1 t LEFT JOIN (SELECT DISTINCT id FROM ek) ek ON t.id = ek.id),
        |reins AS (
        |  SELECT s.id, s.price, s.psize, TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-02 00:00:00',
        |    TIMESTAMP '9999-12-31 00:00:00'
        |  FROM snap2 s WHERE s.id IN (SELECT id FROM ek))
        |SELECT * FROM h1m UNION ALL SELECT * FROM new2 UNION ALL SELECT * FROM reins""".stripMargin,
    // identical restatement for the zoned form (the zone union must
    // equal the flat apply bit-for-bit)
    "scd3_zoned_history" ->
      """WITH snap1 AS (SELECT p_partkey AS id, p_retailprice AS price, p_size AS psize FROM part),
        |snap2 AS (
        |  SELECT id, CASE WHEN id % 10 = 0 THEN price + 100.0 ELSE price END AS price, psize
        |  FROM snap1 WHERE id % 7 <> 0
        |  UNION ALL SELECT id + 100000, price, psize FROM snap1 WHERE id % 13 = 0),
        |h1 AS (
        |  SELECT id, price, psize, TIMESTAMP '2024-01-01 00:00:00' AS created_at,
        |    TIMESTAMP '2024-01-01 00:00:00' AS updated_at, TIMESTAMP '9999-12-31 00:00:00' AS expired_at
        |  FROM snap1),
        |new2 AS (
        |  SELECT s.id, s.price, s.psize, TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-02 00:00:00',
        |    TIMESTAMP '9999-12-31 00:00:00'
        |  FROM snap2 s WHERE NOT EXISTS (
        |    SELECT 1 FROM h1 t WHERE t.id = s.id AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00')),
        |ek AS (
        |  SELECT t.id FROM h1 t JOIN snap2 s ON t.id = s.id AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00'
        |  WHERE t.price <> s.price OR t.psize <> s.psize),
        |h1m AS (
        |  SELECT t.id, t.price, t.psize, t.created_at,
        |    CASE WHEN ek.id IS NOT NULL AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00'
        |      THEN TIMESTAMP '2024-01-02 00:00:00' ELSE t.updated_at END AS updated_at,
        |    CASE WHEN ek.id IS NOT NULL AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00'
        |      THEN TIMESTAMP '2024-01-02 00:00:00' ELSE t.expired_at END AS expired_at
        |  FROM h1 t LEFT JOIN (SELECT DISTINCT id FROM ek) ek ON t.id = ek.id),
        |reins AS (
        |  SELECT s.id, s.price, s.psize, TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-02 00:00:00',
        |    TIMESTAMP '9999-12-31 00:00:00'
        |  FROM snap2 s WHERE s.id IN (SELECT id FROM ek))
        |SELECT * FROM h1m UNION ALL SELECT * FROM new2 UNION ALL SELECT * FROM reins""".stripMargin,
    "j12_ci_scd2" ->
      """WITH base AS (
        |  SELECT p_partkey AS id, 'Prod-' || CAST(p_partkey AS VARCHAR) AS pname, p_retailprice AS price
        |  FROM part),
        |h1 AS (
        |  SELECT pname, price, TIMESTAMP '2024-01-01 00:00:00' AS created_at,
        |    TIMESTAMP '2024-01-01 00:00:00' AS updated_at, TIMESTAMP '9999-12-31 00:00:00' AS expired_at
        |  FROM base),
        |snap2 AS (
        |  SELECT CASE WHEN id % 3 = 0 THEN upper(pname) ELSE pname END AS pname,
        |         CASE WHEN id % 10 = 0 THEN price + 100.0 ELSE price END AS price
        |  FROM base WHERE id % 7 <> 0
        |  UNION ALL SELECT 'NEW-' || CAST(id AS VARCHAR), price FROM base WHERE id % 13 = 0),
        |new2 AS (
        |  SELECT s.pname, s.price, TIMESTAMP '2024-01-02 00:00:00' AS created_at,
        |    TIMESTAMP '2024-01-02 00:00:00' AS updated_at, TIMESTAMP '9999-12-31 00:00:00' AS expired_at
        |  FROM snap2 s WHERE NOT EXISTS (
        |    SELECT 1 FROM h1 t WHERE lower(t.pname) = lower(s.pname)
        |      AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00')),
        |ek AS (
        |  SELECT DISTINCT lower(t.pname) AS ck
        |  FROM h1 t JOIN snap2 s ON lower(t.pname) = lower(s.pname)
        |    AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00'
        |  WHERE t.price <> s.price),
        |h1m AS (
        |  SELECT t.pname, t.price, t.created_at,
        |    CASE WHEN ek.ck IS NOT NULL AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00'
        |      THEN TIMESTAMP '2024-01-02 00:00:00' ELSE t.updated_at END AS updated_at,
        |    CASE WHEN ek.ck IS NOT NULL AND t.expired_at = TIMESTAMP '9999-12-31 00:00:00'
        |      THEN TIMESTAMP '2024-01-02 00:00:00' ELSE t.expired_at END AS expired_at
        |  FROM h1 t LEFT JOIN ek ON lower(t.pname) = ek.ck),
        |reins AS (
        |  SELECT s.pname, s.price, TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-02 00:00:00',
        |    TIMESTAMP '9999-12-31 00:00:00'
        |  FROM snap2 s WHERE lower(s.pname) IN (SELECT ck FROM ek))
        |SELECT * FROM h1m UNION ALL SELECT * FROM new2 UNION ALL SELECT * FROM reins""".stripMargin,
    // the salted auto-join is result-identical to the plain join — the
    // oracle replays the PLAIN join
    "j13_auto_skew_join" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS hot_qty,
        |  COUNT(*) AS n_lines
        |FROM (
        |  SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0 ELSE l_orderkey % 25 END AS n_nationkey,
        |         l_quantity
        |  FROM lineitem) b
        |JOIN nation USING (n_nationkey)
        |GROUP BY n_name""".stripMargin,
    "a2_scd_out_params" ->
      """WITH snap1 AS (SELECT p_partkey AS id, p_retailprice AS price, p_size AS psize FROM part),
        |snap2 AS (
        |  SELECT id, CASE WHEN id % 10 = 0 THEN price + 100.0 ELSE price END AS price, psize
        |  FROM snap1 WHERE id % 7 <> 0
        |  UNION ALL SELECT id + 100000, price, psize FROM snap1 WHERE id % 13 = 0),
        |new2 AS (SELECT s.id FROM snap2 s WHERE NOT EXISTS (SELECT 1 FROM snap1 t WHERE t.id = s.id)),
        |ek AS (
        |  SELECT DISTINCT t.id FROM snap1 t JOIN snap2 s ON t.id = s.id
        |  WHERE t.price <> s.price OR t.psize <> s.psize),
        |reins AS (SELECT s.id FROM snap2 s WHERE s.id IN (SELECT id FROM ek))
        |SELECT CAST((SELECT count(*) FROM snap2) AS BIGINT) AS rows_input,
        |  CAST((SELECT count(*) FROM new2) + (SELECT count(*) FROM reins) AS BIGINT) AS rows_inserted,
        |  CAST((SELECT count(*) FROM ek) AS BIGINT) AS rows_expired""".stripMargin,
    "sp3_log_message" ->
      """WITH snap1 AS (SELECT p_partkey AS id, p_retailprice AS price, p_size AS psize FROM part),
        |snap2 AS (
        |  SELECT id, CASE WHEN id % 10 = 0 THEN price + 100.0 ELSE price END AS price, psize
        |  FROM snap1 WHERE id % 7 <> 0
        |  UNION ALL SELECT id + 100000, price, psize FROM snap1 WHERE id % 13 = 0),
        |new2 AS (SELECT s.id FROM snap2 s WHERE NOT EXISTS (SELECT 1 FROM snap1 t WHERE t.id = s.id)),
        |ek AS (
        |  SELECT DISTINCT t.id FROM snap1 t JOIN snap2 s ON t.id = s.id
        |  WHERE t.price <> s.price OR t.psize <> s.psize),
        |reins AS (SELECT s.id FROM snap2 s WHERE s.id IN (SELECT id FROM ek))
        |SELECT CAST(1 AS BIGINT) AS id, 'transform_data' AS process_name, 'SUCCESS' AS status,
        |  'SCD Type 2 completed successfully. Rows Processed: '
        |    || CAST((SELECT count(*) FROM snap2) AS VARCHAR)
        |    || '. New Rows Inserted: '
        |    || CAST((SELECT count(*) FROM new2) + (SELECT count(*) FROM reins) AS VARCHAR)
        |    || '. Old Rows Expired (Updated): '
        |    || CAST((SELECT count(*) FROM ek) AS VARCHAR) || '.' AS message""".stripMargin,
    "s9_ledger_update" ->
      """SELECT CAST(n_nationkey + 1 AS BIGINT) AS id,
        |  'proc_' || lower(n_name) AS process_name,
        |  CASE WHEN n_nationkey + 1 = 13 THEN 'SUCCESS' ELSE 'RUNNING' END AS status,
        |  CASE WHEN n_nationkey + 1 = 13 THEN 'closed by daily run' ELSE NULL END AS message,
        |  CASE WHEN n_nationkey + 1 = 13 THEN TIMESTAMP '2024-03-01 09:00:00' ELSE NULL END AS end_time
        |FROM nation""".stripMargin,
    "j7_process_log_join" ->
      """WITH proc AS (
        |  SELECT CAST(n_nationkey + 1 AS INT) AS pid, 'proc_' || lower(n_name) AS process_name
        |  FROM nation),
        |logs AS (
        |  SELECT CAST(n_nationkey * 2 + 1 AS INT) AS id_log, CAST(n_nationkey + 1 AS INT) AS id_process,
        |    'SUCCESS' AS status, TIMESTAMP '2024-03-01 08:00:00' AS start_time FROM nation
        |  UNION ALL
        |  SELECT CAST(n_nationkey * 2 + 2 AS INT), CAST(n_nationkey + 1 AS INT), 'RUNNING',
        |    TIMESTAMP '2024-03-01 09:00:00'
        |  FROM nation WHERE n_nationkey % 3 = 0)
        |SELECT id_log, process_name, status, start_time FROM logs JOIN proc ON id_process = pid""".stripMargin,
    "s10_crawl_meta" ->
      """WITH cfg AS (
        |  SELECT CAST(n_nationkey + 1 AS BIGINT) AS id, n_name AS site_name,
        |    'https://' || lower(n_name) || '.example.com' AS url
        |  FROM nation),
        |log AS (
        |  SELECT CAST(n_nationkey + 1 AS BIGINT) AS id_config,
        |    TIMESTAMP '2024-01-05 08:00:00' AS run_date, 'SUCCESS' AS status
        |  FROM nation WHERE n_nationkey % 3 = 0
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 1 AS BIGINT), TIMESTAMP '2024-01-04 08:00:00', 'SUCCESS'
        |  FROM nation WHERE n_nationkey % 3 = 1
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 1 AS BIGINT), TIMESTAMP '2024-01-05 09:00:00', 'RUNNING'
        |  FROM nation WHERE n_nationkey % 3 = 1)
        |SELECT id, site_name, url FROM cfg
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM log
        |  WHERE id_config = cfg.id AND status = 'SUCCESS'
        |    AND CAST(run_date AS DATE) = DATE '2024-01-05')""".stripMargin,
    "sp4_proc_install" ->
      """SELECT n_regionkey AS region_key, COUNT(*) AS n_nations
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    // independent restatement of SP_ETL_SCD_Update_Product's two-round
    // counters over the same fixture: round 1 inserts everything (empty
    // history); round 2's EXPIRED_KEYS set is the TEN-join diff, expiry
    // is the EXISTS over (TEN, LINK), re-insert joins back with bag
    // multiplicity — the same relational ops the statement list performs
    "sp5_proc_body" ->
      """WITH s1 AS (SELECT * FROM read_parquet('/root/repo/src/test/resources/fixtures/products_transform.parquet')),
        |s2 AS (SELECT * REPLACE (CASE WHEN ID <= 40 THEN GIA_MOI + 500 ELSE GIA_MOI END AS GIA_MOI) FROM s1),
        |chg AS (
        |  SELECT t.TEN, t.LINK FROM s1 t JOIN s2 s ON t.TEN = s.TEN
        |  WHERE t.GIA_CU <> s.GIA_CU OR t.GIA_MOI <> s.GIA_MOI
        |     OR t.KICH_THUOC_MAN_HINH <> s.KICH_THUOC_MAN_HINH
        |     OR t.RAM <> s.RAM OR t.BO_NHO <> s.BO_NHO),
        |upd AS (SELECT COUNT(*) AS n FROM s1 t
        |        WHERE EXISTS (SELECT 1 FROM chg ek WHERE t.TEN = ek.TEN AND t.LINK = ek.LINK)),
        |newk AS (SELECT COUNT(*) AS n FROM s2 s
        |         WHERE NOT EXISTS (SELECT 1 FROM s1 t WHERE s.TEN = t.TEN)),
        |reins AS (SELECT COUNT(*) AS n FROM s2 s JOIN chg ek ON s.TEN = ek.TEN AND s.LINK = ek.LINK)
        |SELECT CAST(1 AS INT) AS round,
        |       (SELECT COUNT(*) FROM s1) AS p_rowsinput,
        |       (SELECT COUNT(*) FROM s1) AS p_rowsinserted,
        |       CAST(0 AS BIGINT) AS p_rowsupdated,
        |       (SELECT COUNT(*) FROM s1) AS n_current
        |UNION ALL
        |SELECT CAST(2 AS INT),
        |       (SELECT COUNT(*) FROM s2),
        |       (SELECT n FROM newk) + (SELECT n FROM reins),
        |       (SELECT n FROM upd),
        |       (SELECT COUNT(*) FROM s1) - (SELECT n FROM upd)
        |         + (SELECT n FROM newk) + (SELECT n FROM reins)""".stripMargin,
    // the live dump IS the oracle: deployed MySQL's own output for the
    // same 239 input rows (FIXTURES.md A2) — the strongest possible
    // ground truth for a verbatim replay
    "sp6_clean_proc_body" ->
      """SELECT * EXCLUDE (ID_SR)
        |FROM read_parquet('/root/repo/src/test/resources/fixtures/products_transform.parquet')""".stripMargin,
    "t1_text_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, text, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
        |  FROM documents)
        |SELECT doc_id, CAST(len(tk) AS INT) AS n_tokens,
        |  CAST(list_sum(list_transform(tk, x -> CAST(ceil(length(x)/4.0) AS BIGINT))) AS BIGINT)
        |    + length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS n_subwords,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio,
        |  least(CAST(length(text) AS DOUBLE)/500.0, 1.0)*0.3
        |    + (CASE WHEN length(text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) END)*0.4
        |    + (CASE WHEN len(tk) = 0 THEN 0.0
        |        ELSE CAST(len(list_filter(tk, x -> list_contains(['the','a','an','of','and','to','in','is','it','that'], x))) AS DOUBLE) / len(tk) END)*0.3
        |    AS quality
        |FROM toks""".stripMargin,
    "t2_lang_id" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    len(list_filter(tk, x -> list_contains(['the','a','of','and','to','is','in','that','it','for'], x))) AS s_en,
        |    len(list_filter(tk, x -> list_contains(['el','la','de','que','y','los','las','un','una','es'], x))) AS s_es,
        |    len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','zu'], x))) AS s_de,
        |    len(list_filter(tk, x -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], x))) AS s_fr
        |  FROM toks)
        |SELECT doc_id, CASE
        |  WHEN s_en = greatest(s_en, s_es, s_de, s_fr) AND s_en > 0 THEN 'en'
        |  WHEN s_es = greatest(s_en, s_es, s_de, s_fr) AND s_es > 0 THEN 'es'
        |  WHEN s_de = greatest(s_en, s_es, s_de, s_fr) AND s_de > 0 THEN 'de'
        |  WHEN s_fr = greatest(s_en, s_es, s_de, s_fr) AND s_fr > 0 THEN 'fr'
        |  ELSE 'und' END AS lang_pred
        |FROM sc""".stripMargin,
    "t3_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''), ' ')) AS fp_md5,
        |  (SELECT COALESCE(CAST(sum(ascii(c) * ((i-1) % 64 + 1)) AS BIGINT), 0)
        |   FROM (SELECT unnest(string_split(text, '')) AS c,
        |                generate_subscripts(string_split(text, ''), 1) AS i)) AS fp_pos
        |FROM documents""".stripMargin,
    "d1_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 5 = 0)
        |SELECT md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''), ' ')) AS fp,
        |  min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM corpus GROUP BY 1""".stripMargin,
    "d5_edit_distance" ->
      """WITH mutated AS (
        |  SELECT doc_id,
        |    array_to_string((list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))[6:], ' ') AS text_mut
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT d.doc_id, levenshtein(d.text, m.text_mut) AS edit_dist,
        |  CAST(levenshtein(d.text, m.text_mut) AS DOUBLE) / greatest(length(d.text), length(m.text_mut)) AS rel_dist
        |FROM documents d JOIN mutated m ON d.doc_id = m.doc_id""".stripMargin,
    "d2_ngram_jaccard" -> ngramJaccardOracle,
    "d3_minhash_lsh" -> ngramJaccardOracle,
    // index-incremental form: same result set as the full recompute by
    // the union contract, so the oracle is d3's verbatim
    "d9_incremental_dedup" -> ngramJaccardOracle,
    // incremental maintenance reproduces the full-closure clusters (d6)
    "d12_incremental_clusters" -> dupClustersOracle,
    "q13_count_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist FROM pc GROUP BY c_count""".stripMargin,
    "q18_large_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)""".stripMargin,
    "q11_value_share" ->
      """WITH bn AS (
        |  SELECT s_nationkey,
        |    CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS nation_bal
        |  FROM supplier GROUP BY 1),
        |t AS (
        |  SELECT CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_bal
        |  FROM supplier)
        |SELECT s_nationkey, nation_bal FROM bn, t WHERE nation_bal > total_bal * 0.04""".stripMargin,
    "q22_idle_customers" ->
      """WITH ab AS (
        |  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
        |    / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, COUNT(*) AS n_idle,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS idle_bal
        |FROM customer, ab
        |WHERE c_acctbal > avg_bal AND c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY c_mktsegment""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |    l_extendedprice*(1.0-l_discount) AS volume,
        |    ns.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey)
        |SELECT o_year,
        |  CAST(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(SUM(CAST(volume AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS mkt_share
        |FROM vol GROUP BY o_year""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) - 0.6*p_retailprice*l_quantity
        |    AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH avgq AS (
        |  SELECT l_partkey AS ap_partkey,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |  AND p_brand = 'Brand#3' AND p_type = 'SMALL'
        |JOIN avgq ON l_partkey = ap_partkey
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q19_discounted_revenue" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_potential_promotion" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
        |    GROUP BY l_suppkey
        |    HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) > 300.0)""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "t6_quality_signals" ->
      """WITH tokd AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
        |  FROM documents),
        |tri AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(tk) - 1, 1)),
        |    i -> array_to_string(tk[i:i+2], ' '))) AS g
        |  FROM tokd),
        |cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY 1, 2),
        |sig AS (SELECT doc_id, MAX(c) AS top_tri_n,
        |        CAST(SUM(c) AS BIGINT) AS n_tri FROM cnt GROUP BY 1)
        |SELECT d.doc_id, s.top_tri_n, s.n_tri,
        |  CAST(s.top_tri_n AS DOUBLE) / s.n_tri AS top_tri_frac,
        |  CAST(len(regexp_replace(lower(d.text), '[a-z0-9\s]', '', 'g')) AS DOUBLE)
        |    / len(d.text) AS symbol_ratio,
        |  CASE WHEN len(tk) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(tk, x -> len(x))) AS DOUBLE) / len(tk)
        |  END AS avg_token_len
        |FROM tokd d JOIN sig s ON d.doc_id = s.doc_id""".stripMargin,
    "t7_pii_redact" ->
      """WITH salted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         WHEN doc_id % 7 = 1 THEN text || ' call +1 555 01' || CAST(doc_id AS VARCHAR)
        |         WHEN doc_id % 7 = 2 THEN text || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
        |         ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'),
        |    '\+[0-9][0-9 -]{7,}[0-9]', '[PHONE]', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '\+[0-9][0-9 -]{7,}[0-9]')) AS INT) AS n_phone,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ip
        |FROM salted""".stripMargin,
    "t8_repetition_signals" ->
      """WITH s0 AS (
        |  SELECT doc_id,
        |    replace(replace(text, ' merge ', chr(10) || chr(10)), ' the ', chr(10)) AS st0
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    st0 || chr(10) || split_part(st0, chr(10), 1)
        |      || CASE WHEN doc_id % 4 = 0
        |           THEN chr(10) || chr(10) || split_part(st0, chr(10) || chr(10), 1)
        |           ELSE '' END AS st
        |  FROM s0),
        |parts AS (
        |  SELECT doc_id,
        |    list_filter(string_split(st, chr(10)), x -> x <> '') AS ln,
        |    list_filter(regexp_split_to_array(st, '\n{2,}'), x -> x <> '') AS pg
        |  FROM s)
        |SELECT doc_id,
        |  CASE WHEN len(ln) = 0 THEN 0.0
        |    ELSE CAST(len(ln) - len(list_distinct(ln)) AS DOUBLE) / len(ln) END AS dup_line_frac,
        |  CASE WHEN COALESCE(list_sum(list_transform(ln, x -> length(x))), 0) = 0 THEN 0.0
        |    ELSE CAST(COALESCE(list_sum(list_transform(
        |           list_filter(ln, x -> len(list_filter(ln, y -> y = x)) > 1),
        |           x -> length(x))), 0) AS DOUBLE)
        |      / list_sum(list_transform(ln, x -> length(x))) END AS dup_line_char_frac,
        |  CASE WHEN len(pg) = 0 THEN 0.0
        |    ELSE CAST(len(pg) - len(list_distinct(pg)) AS DOUBLE) / len(pg) END AS dup_para_frac,
        |  CASE WHEN COALESCE(list_sum(list_transform(pg, x -> length(x))), 0) = 0 THEN 0.0
        |    ELSE CAST(COALESCE(list_sum(list_transform(
        |           list_filter(pg, x -> len(list_filter(pg, y -> y = x)) > 1),
        |           x -> length(x))), 0) AS DOUBLE)
        |      / list_sum(list_transform(pg, x -> length(x))) END AS dup_para_char_frac
        |FROM parts""".stripMargin,
    "t9_c4_filters" ->
      """WITH salted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN text || ' javascript required'
        |         WHEN doc_id % 11 = 1 THEN text || ' lorem ipsum dolor'
        |         WHEN doc_id % 11 = 2 THEN text || '.'
        |         ELSE text END AS text
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
        |  FROM salted),
        |sig AS (
        |  SELECT doc_id, text, CAST(len(tk) AS INT) AS n_words,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(tk, x -> len(x))) AS DOUBLE) / len(tk)
        |    END AS mean_word_len
        |  FROM toks)
        |SELECT doc_id, n_words, mean_word_len,
        |  CAST(n_words >= 10 AND n_words <= 10000 AS INT) AS ok_wordcount,
        |  CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INT) AS ok_mean_len,
        |  CAST(NOT contains(text, 'javascript') AND NOT contains(text, 'lorem ipsum') AS INT) AS ok_blocklist,
        |  CAST(suffix(text, '.') AS INT) AS ends_terminal,
        |  CAST(n_words >= 10 AND n_words <= 10000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND NOT contains(text, 'javascript') AND NOT contains(text, 'lorem ipsum') AS INT) AS keep
        |FROM sig""".stripMargin,
    "mm2_frame_sample" ->
      """SELECT doc_id, n_chars % 100 + 1 AS frame_count,
        |  CAST(unnest(range(0, greatest(n_chars % 100 + 1 - 1, 0) + 1, 5)) AS BIGINT) AS frame_idx
        |FROM documents""".stripMargin,
    "a12_cube_revenue" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "w6_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
        |    COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_o
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, status_col, n
        |FROM wide UNPIVOT (n FOR status_col IN (n_f, n_o))""".stripMargin,
    "w4_rank_suite" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(dense_rank() OVER w AS INT) AS drank,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist
        |FROM orders WHERE o_orderkey % 97 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "w5_moving_avg" ->
      """WITH f AS (SELECT * FROM orders WHERE o_custkey % 20 = 0),
        |win AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER w AS VARCHAR) AS DOUBLE) AS sum_w,
        |    COUNT(*) OVER w AS n_w
        |  FROM f
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
        |SELECT o_orderkey, o_custkey, sum_w, n_w, sum_w / n_w AS mov_avg
        |FROM win""".stripMargin,
    "s2_csv_roundtrip" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice, p_size,
        |  'stamped' AS ingest_note
        |FROM part""".stripMargin,
    "s3_jsonl_roundtrip" ->
      "SELECT doc_id, lang, source, n_chars, text FROM documents",
    "s11_orc_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    "z1_bucketed_zone" ->
      """WITH zone AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 3 <> 0 AND o_orderkey % 5 = 0
        |         THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        |  FROM orders)
        |SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_price
        |FROM zone JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "d6_dup_clusters" -> dupClustersOracle,
    "d7_decontaminate" ->
      """WITH tokd AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
        |  FROM documents),
        |traing AS (
        |  SELECT doc_id AS train_id, list_distinct(list_transform(
        |    range(1, greatest(len(tk) - 1, 1)), i -> array_to_string(tk[i:i+2], ' '))) AS gs
        |  FROM tokd WHERE len(tk) > 0),
        |testg AS (
        |  SELECT doc_id AS test_id, list_distinct(list_transform(
        |    range(1, greatest(len(tk2) - 1, 1)), i -> array_to_string(tk2[i:i+2], ' '))) AS gs
        |  FROM (SELECT doc_id, tk[3:42] AS tk2 FROM tokd WHERE doc_id % 10 = 0)
        |  WHERE len(tk2) > 0)
        |SELECT a.train_id, b.test_id,
        |  CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE) / len(b.gs) AS containment
        |FROM traing a, testg b
        |WHERE CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE) / len(b.gs) >= 0.8""".stripMargin,
    "t5_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfn AS (SELECT term, COUNT(*) AS df_n FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents)
        |SELECT id, term, tf, df_n, CAST(tf AS DOUBLE) * nd / df_n AS tfidf
        |FROM tf JOIN dfn USING (term), n
        |WHERE df_n >= 5 AND tf >= 2""".stripMargin,
    "t10_bm25" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM tk),
        |toks AS (SELECT doc_id, unnest(tk) AS term FROM tk),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfn AS (SELECT term, COUNT(*) AS df_n FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
        |ag AS (SELECT CAST(CAST(SUM(CAST(dl AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
        |         / COUNT(*) AS avgdl FROM dl)
        |SELECT t.doc_id, t.term, tf, df_n,
        |  ((CAST(nd AS DOUBLE) - CAST(df_n AS DOUBLE) + 0.5) / (CAST(df_n AS DOUBLE) + 0.5))
        |  * ((CAST(tf AS DOUBLE) * 2.2)
        |     / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (dl.dl / ag.avgdl)))) AS bm25
        |FROM tf t JOIN dfn USING (term) JOIN dl ON t.doc_id = dl.doc_id, n, ag
        |WHERE df_n >= 5 AND tf >= 2""".stripMargin,
    "d8_line_dedup_corpus" ->
      """WITH docs2 AS (
        |  SELECT doc_id, regexp_replace(text, ' (the|a|value|table) ', chr(10), 'g') AS st
        |  FROM documents),
        |lx AS (SELECT doc_id, string_split(st, chr(10)) AS ln FROM docs2),
        |lines AS (SELECT doc_id, unnest(range(len(ln))) AS idx, unnest(ln) AS line FROM lx),
        |nz AS (SELECT * FROM lines WHERE line <> ''),
        |rk AS (SELECT doc_id, idx, line,
        |         row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
        |       FROM nz)
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lines,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
        |  COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY idx), '') AS text_kept
        |FROM rk GROUP BY doc_id""".stripMargin,
    "d10_paragraph_dedup" ->
      """WITH docs2 AS (
        |  SELECT doc_id, regexp_replace(text, ' (key|row|scan) ', chr(10) || chr(10), 'g') AS st
        |  FROM documents),
        |px AS (SELECT doc_id, string_split(st, chr(10) || chr(10)) AS ps FROM docs2),
        |paras AS (
        |  SELECT doc_id, unnest(range(len(ps))) AS para_idx, unnest(ps) AS para FROM px),
        |off AS (
        |  SELECT doc_id, para_idx, para,
        |    CAST(COALESCE(SUM(LENGTH(para)) OVER (
        |      PARTITION BY doc_id ORDER BY para_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + 2 * para_idx AS BIGINT) AS span_start
        |  FROM paras)
        |SELECT doc_id, CAST(para_idx AS INT) AS para_idx, span_start,
        |  span_start + LENGTH(para) AS span_end,
        |  row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, para_idx) = 1 AS kept
        |FROM off WHERE para <> ''""".stripMargin,
    // independent derivation: the oracle reassembles text_kept from the
    // paragraph VALUES; the Spark side cuts the original text by the d10
    // span OFFSETS — bitwise agreement proves the span arithmetic
    "d11_paragraph_excise" ->
      """WITH docs2 AS (
        |  SELECT doc_id, regexp_replace(text, ' (key|row|scan) ', chr(10) || chr(10), 'g') AS st
        |  FROM documents),
        |px AS (SELECT doc_id, string_split(st, chr(10) || chr(10)) AS ps FROM docs2),
        |paras AS (
        |  SELECT doc_id, unnest(range(len(ps))) AS para_idx, unnest(ps) AS para FROM px),
        |rk AS (
        |  SELECT doc_id, para_idx, para,
        |    row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, para_idx) = 1 AS kept
        |  FROM paras WHERE para <> '')
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_paras,
        |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS INT) AS n_kept,
        |  COALESCE(string_agg(CASE WHEN kept THEN para END, chr(10) || chr(10)
        |    ORDER BY para_idx), '') AS text_kept
        |FROM rk GROUP BY doc_id""".stripMargin,
    "c1_hash_split" ->
      s"""SELECT doc_id,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, ${bucketSql("doc_id")} AS b FROM documents)""".stripMargin,
    "c6_group_split" ->
      s"""SELECT doc_id, source,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, source, ${bucketSql("source")} AS b FROM documents)""".stripMargin,
    "c2_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
        |WHERE ${bucketSql("doc_id")} <
        |  CASE lang WHEN 'en' THEN 25 WHEN 'fr' THEN 75 ELSE 50 END""".stripMargin,
    "c3_source_mix" ->
      """WITH toks AS (
        |  SELECT source, lang,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS INT) AS n_tok
        |  FROM documents),
        |grouped AS (
        |  SELECT source, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS n_tokens
        |  FROM toks GROUP BY 1, 2),
        |totals AS (
        |  SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM grouped)
        |SELECT source, lang, n_docs, n_tokens,
        |  CAST(n_docs AS DOUBLE) / tot_docs AS doc_share,
        |  CAST(n_tokens AS DOUBLE) / tot_tokens AS token_share
        |FROM grouped, totals""".stripMargin,
    "c5_pack_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS rk,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY rk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM toks)
        |SELECT doc_id, source, n_tok,
        |  CAST(FLOOR((cum_tokens - n_tok) / 512.0) AS BIGINT) AS seq_idx,
        |  (cum_tokens - n_tok) % 512 AS seq_offset
        |FROM cum""".stripMargin,
    "c4_token_budget" ->
      """WITH toks AS (
        |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS rk,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY rk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM toks)
        |SELECT doc_id, source, n_tok, cum_tokens FROM cum WHERE cum_tokens <= 2000""".stripMargin,
    "t11_bigram_lm" ->
      """WITH tokd AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT tk[i] AS w1, tk[i+1] AS w2
        |  FROM tokd, UNNEST(range(1, len(tk))) AS t(i)),
        |big AS (SELECT w1, w2, COUNT(*) AS n12 FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |uni AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1)
        |SELECT b.w1, b.w2, b.n12, u.n1, CAST(b.n12 AS DOUBLE) / u.n1 AS p_cond
        |FROM big b JOIN uni u USING (w1)""".stripMargin,
    // t11's LM re-estimated, every doc's bigrams scored with integer
    // arithmetic only (sum of ⌊n12·10^10/n1⌋ — order-independent, exact)
    "t13_lm_score" ->
      """WITH tokd AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
        |  FROM tokd, UNNEST(range(1, len(tk))) AS t(i)),
        |big AS (SELECT w1, w2, COUNT(*) AS n12 FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |uni AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1)
        |SELECT g.doc_id,
        |  COUNT(*) AS n_bigrams,
        |  COUNT(b.n12) AS n_known,
        |  CAST(COUNT(b.n12) AS DOUBLE) / COUNT(*) AS coverage,
        |  CAST(COALESCE(SUM((CAST(b.n12 AS HUGEINT) * 10000000000) // u.n1), 0) AS BIGINT) AS score_scaled,
        |  CASE WHEN COUNT(b.n12) > 0
        |    THEN CAST(COALESCE(SUM((CAST(b.n12 AS HUGEINT) * 10000000000) // u.n1), 0) AS BIGINT) // COUNT(b.n12)
        |  END AS mean_p10
        |FROM bg g JOIN uni u USING (w1)
        |LEFT JOIN big b ON g.w1 = b.w1 AND g.w2 = b.w2
        |GROUP BY g.doc_id""".stripMargin,
    "t15_bpe_merges" -> bpeOracleSql(10),
    "t17_bpe_merges_batched" -> bpeBatchedOracleSql(10, 5),
    "t16_bpe_tokenize" -> bpeApplyOracleSql(6),
    "t14_chunk_documents" ->
      """WITH tokd AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
        |  FROM documents),
        |nz AS (SELECT doc_id, tk, len(tk) AS n FROM tokd WHERE len(tk) > 0)
        |SELECT doc_id,
        |  CAST((s - 1) // 8 AS INT) AS chunk_idx,
        |  CAST(s AS INT) AS tok_start,
        |  CAST(least(32, n - s + 1) AS INT) AS n_tok,
        |  array_to_string(tk[s:s+31], ' ') AS chunk_text
        |FROM nz, UNNEST(range(1, n + 1, 8)) AS t(s)""".stripMargin,
    "g2_pagerank" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |nn AS (SELECT COUNT(*) AS n FROM d),
        |edges AS (
        |  SELECT doc_id AS src, (doc_id * doc_id + 1) % n AS dst FROM d, nn
        |  UNION ALL
        |  SELECT doc_id AS src, doc_id // 2 AS dst FROM d, nn),
        |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT node FROM (
        |  SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges)),
        |r0 AS (SELECT node, CAST(1 AS DOUBLE) / n AS rank FROM nodes, nn),
        |c1 AS (SELECT e.dst AS node, r.rank / o.outdeg AS contrib
        |       FROM edges e JOIN r0 r ON e.src = r.node JOIN outdeg o ON e.src = o.src),
        |s1 AS (SELECT node, CAST(CAST(SUM(CAST(contrib AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS in_rank
        |       FROM c1 GROUP BY node),
        |r1 AS (SELECT nodes.node,
        |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
        |           + CAST(0.85 AS DOUBLE) * COALESCE(in_rank, CAST(0 AS DOUBLE)) AS rank
        |       FROM nodes LEFT JOIN s1 USING (node), nn),
        |c2 AS (SELECT e.dst AS node, r.rank / o.outdeg AS contrib
        |       FROM edges e JOIN r1 r ON e.src = r.node JOIN outdeg o ON e.src = o.src),
        |s2 AS (SELECT node, CAST(CAST(SUM(CAST(contrib AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS in_rank
        |       FROM c2 GROUP BY node),
        |r2 AS (SELECT nodes.node,
        |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
        |           + CAST(0.85 AS DOUBLE) * COALESCE(in_rank, CAST(0 AS DOUBLE)) AS rank
        |       FROM nodes LEFT JOIN s2 USING (node), nn),
        |c3 AS (SELECT e.dst AS node, r.rank / o.outdeg AS contrib
        |       FROM edges e JOIN r2 r ON e.src = r.node JOIN outdeg o ON e.src = o.src),
        |s3 AS (SELECT node, CAST(CAST(SUM(CAST(contrib AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS in_rank
        |       FROM c3 GROUP BY node),
        |r3 AS (SELECT nodes.node,
        |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
        |           + CAST(0.85 AS DOUBLE) * COALESCE(in_rank, CAST(0 AS DOUBLE)) AS rank
        |       FROM nodes LEFT JOIN s3 USING (node), nn)
        |SELECT node, round(rank, 12) AS rank_r12 FROM r3""".stripMargin,
    // g2's unrolled shape plus one dangling-mass CTE per round: dm_k is
    // the decimal-summed rank of sink nodes under r_{k-1}, folded back
    // uniformly inside the damped term
    "g3_pagerank_dangling" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |nn AS (SELECT COUNT(*) AS n FROM d),
        |edges AS (
        |  SELECT doc_id AS src, (doc_id * doc_id + 7) % n AS dst FROM d, nn WHERE doc_id % 4 <> 0
        |  UNION ALL
        |  SELECT doc_id AS src, doc_id // 3 AS dst FROM d, nn WHERE doc_id % 4 <> 0),
        |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT node FROM (
        |  SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges)),
        |nv AS (SELECT COUNT(*) AS n_nodes FROM nodes),
        |r0 AS (SELECT node, CAST(1 AS DOUBLE) / n_nodes AS rank FROM nodes, nv),
        |dm1 AS (SELECT CAST(CAST(SUM(CAST(r.rank AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS dm
        |        FROM r0 r WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r.node)),
        |c1 AS (SELECT e.dst AS node, r.rank / o.outdeg AS contrib
        |       FROM edges e JOIN r0 r ON e.src = r.node JOIN outdeg o ON e.src = o.src),
        |s1 AS (SELECT node, CAST(CAST(SUM(CAST(contrib AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS in_rank
        |       FROM c1 GROUP BY node),
        |r1 AS (SELECT nodes.node,
        |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n_nodes
        |           + CAST(0.85 AS DOUBLE) * (COALESCE(in_rank, CAST(0 AS DOUBLE))
        |             + COALESCE(dm, CAST(0 AS DOUBLE)) / n_nodes) AS rank
        |       FROM nodes LEFT JOIN s1 USING (node), nv, dm1),
        |dm2 AS (SELECT CAST(CAST(SUM(CAST(r.rank AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS dm
        |        FROM r1 r WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r.node)),
        |c2 AS (SELECT e.dst AS node, r.rank / o.outdeg AS contrib
        |       FROM edges e JOIN r1 r ON e.src = r.node JOIN outdeg o ON e.src = o.src),
        |s2 AS (SELECT node, CAST(CAST(SUM(CAST(contrib AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS in_rank
        |       FROM c2 GROUP BY node),
        |r2 AS (SELECT nodes.node,
        |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n_nodes
        |           + CAST(0.85 AS DOUBLE) * (COALESCE(in_rank, CAST(0 AS DOUBLE))
        |             + COALESCE(dm, CAST(0 AS DOUBLE)) / n_nodes) AS rank
        |       FROM nodes LEFT JOIN s2 USING (node), nv, dm2),
        |dm3 AS (SELECT CAST(CAST(SUM(CAST(r.rank AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS dm
        |        FROM r2 r WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r.node)),
        |c3 AS (SELECT e.dst AS node, r.rank / o.outdeg AS contrib
        |       FROM edges e JOIN r2 r ON e.src = r.node JOIN outdeg o ON e.src = o.src),
        |s3 AS (SELECT node, CAST(CAST(SUM(CAST(contrib AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS in_rank
        |       FROM c3 GROUP BY node),
        |r3 AS (SELECT nodes.node,
        |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n_nodes
        |           + CAST(0.85 AS DOUBLE) * (COALESCE(in_rank, CAST(0 AS DOUBLE))
        |             + COALESCE(dm, CAST(0 AS DOUBLE)) / n_nodes) AS rank
        |       FROM nodes LEFT JOIN s3 USING (node), nv, dm3)
        |SELECT node, round(rank, 12) AS rank_r12 FROM r3""".stripMargin,
    "c7_weighted_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS rk,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, n_tok,
        |    CAST(SUM(n_tok) OVER (ORDER BY rk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM toks),
        |w AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS w_total FROM toks)
        |SELECT doc_id, n_tok, cum_tokens,
        |  (cum_tokens * 100) // w_total AS sample_bucket
        |FROM cum, w
        |WHERE (cum_tokens * 100) // w_total > ((cum_tokens - n_tok) * 100) // w_total""".stripMargin,
    // the END-TO-END pipeline replay (see corpusRunChainCtes for the full
    // stage-by-stage derivation and why it is exact)
    "c8_corpus_run_3day" ->
      s"""WITH RECURSIVE $corpusRunChainCtes
        |SELECT doc_id,
        |  CASE day WHEN 1 THEN '2026-01-01' WHEN 2 THEN '2026-01-02'
        |    ELSE '2026-01-03' END AS ingest_day,
        |  md5(text) AS text_md5, source
        |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3)""".stripMargin,
    "c9_corpus_run_ledger" ->
      s"""WITH RECURSIVE $corpusRunChainCtes
        |${Seq(1 -> "2026-01-01", 2 -> "2026-01-02", 3 -> "2026-01-03").map { case (d, date) =>
          s"""SELECT '$date' AS run_day,
             |  (SELECT count(*) FROM corpus WHERE day = $d) AS n_input,
             |  (SELECT count(*) FROM corpus WHERE day = $d)
             |    - (SELECT count(*) FROM q WHERE day = $d) AS n_quality_dropped,
             |  (SELECT count(*) FROM q WHERE day = $d)
             |    - (SELECT count(*) FROM ex WHERE day = $d) AS n_exact_dropped,
             |  (SELECT count(*) FROM ex WHERE day = $d)
             |    - (SELECT count(*) FROM k$d) AS n_neardup_dropped,
             |  (SELECT count(*) FROM k$d) - (SELECT count(*) FROM p$d) AS n_sem_dropped,
             |  CAST(0 AS BIGINT) AS n_excised_docs,
             |  (SELECT count(*) FROM p$d) AS n_published""".stripMargin
        }.mkString("\nUNION ALL\n")}""".stripMargin,
    "e1_embedding_neardup" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |probes AS (
        |  SELECT vec_id + 10000000 AS probe_id, list_prepend(e[1] + 0.01, e[2:]) AS pe
        |  FROM v WHERE vec_id % 10 = 0)
        |SELECT probe_id, vec_id AS match_id FROM probes, v
        |WHERE list_sum(list_transform(list_zip(pe, e), x -> x[1]*x[2]))
        |      / sqrt(list_sum(list_transform(pe, x -> x*x)))
        |      / sqrt(list_sum(list_transform(e, x -> x*x))) >= 0.99""".stripMargin,
    // incremental-index form returns e1's exact pair set — oracle verbatim
    "e3_embedding_neardup_incremental" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |probes AS (
        |  SELECT vec_id + 10000000 AS probe_id, list_prepend(e[1] + 0.01, e[2:]) AS pe
        |  FROM v WHERE vec_id % 10 = 0)
        |SELECT probe_id, vec_id AS match_id FROM probes, v
        |WHERE list_sum(list_transform(list_zip(pe, e), x -> x[1]*x[2]))
        |      / sqrt(list_sum(list_transform(pe, x -> x*x)))
        |      / sqrt(list_sum(list_transform(e, x -> x*x))) >= 0.99""".stripMargin,
    // e4's incremental form: day-1 Lloyd rounds verbatim, a THIRD
    // centroid recompute from the final assignment (what the stored
    // zone replays), probe argmin against it, then both drop rules
    "e5_semantic_dedup_incremental" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |a0 AS (SELECT vec_id, e, vec_id % 64 AS cluster FROM v),
        |exp1 AS (SELECT cluster, unnest(range(len(e))) AS pos, unnest(e) AS val FROM a0),
        |c1 AS (SELECT cluster AS cid, pos,
        |         CAST(CAST(SUM(CAST(val AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS cv
        |       FROM exp1 GROUP BY 1, 2),
        |cent1 AS (SELECT cid, list(cv ORDER BY pos) AS c FROM c1 GROUP BY 1),
        |d1 AS (SELECT vec_id, e, cid,
        |         list_reduce(list_transform(list_zip(e, c), p -> (p[1]-p[2])*(p[1]-p[2])), (a, b) -> a + b) AS dist
        |       FROM a0, cent1),
        |a1 AS (SELECT vec_id, e, cluster FROM (
        |         SELECT vec_id, e, cid AS cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |         FROM d1) WHERE rn = 1),
        |exp2 AS (SELECT cluster, unnest(range(len(e))) AS pos, unnest(e) AS val FROM a1),
        |c2 AS (SELECT cluster AS cid, pos,
        |         CAST(CAST(SUM(CAST(val AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS cv
        |       FROM exp2 GROUP BY 1, 2),
        |cent2 AS (SELECT cid, list(cv ORDER BY pos) AS c FROM c2 GROUP BY 1),
        |d2 AS (SELECT vec_id, e, cid,
        |         list_reduce(list_transform(list_zip(e, c), p -> (p[1]-p[2])*(p[1]-p[2])), (a, b) -> a + b) AS dist
        |       FROM a1, cent2),
        |fin AS (SELECT vec_id, e, cluster FROM (
        |         SELECT vec_id, e, cid AS cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |         FROM d2) WHERE rn = 1),
        |exp3 AS (SELECT cluster, unnest(range(len(e))) AS pos, unnest(e) AS val FROM fin),
        |c3 AS (SELECT cluster AS cid, pos,
        |         CAST(CAST(SUM(CAST(val AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS cv
        |       FROM exp3 GROUP BY 1, 2),
        |cent3 AS (SELECT cid, list(cv ORDER BY pos) AS c FROM c3 GROUP BY 1),
        |probes AS (
        |  SELECT vec_id + 10000000 AS vec_id, list_prepend(e[1] + 0.01, e[2:]) AS e
        |  FROM v WHERE vec_id % 10 = 0),
        |d3 AS (SELECT vec_id, e, cid,
        |         list_reduce(list_transform(list_zip(e, c), p -> (p[1]-p[2])*(p[1]-p[2])), (a, b) -> a + b) AS dist
        |       FROM probes, cent3),
        |pd AS (SELECT vec_id, e, cluster FROM (
        |         SELECT vec_id, e, cid AS cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |         FROM d3) WHERE rn = 1),
        |crossd AS (
        |  SELECT DISTINCT p.vec_id FROM pd p JOIN fin f ON p.cluster = f.cluster
        |  WHERE list_sum(list_transform(list_zip(p.e, f.e), x -> x[1]*x[2]))
        |        / sqrt(list_sum(list_transform(p.e, x -> x*x)))
        |        / sqrt(list_sum(list_transform(f.e, x -> x*x))) >= 0.95),
        |withind AS (
        |  SELECT DISTINCT b.vec_id FROM pd a JOIN pd b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE list_sum(list_transform(list_zip(a.e, b.e), x -> x[1]*x[2]))
        |        / sqrt(list_sum(list_transform(a.e, x -> x*x)))
        |        / sqrt(list_sum(list_transform(b.e, x -> x*x))) >= 0.95),
        |dropped AS (SELECT vec_id FROM crossd UNION SELECT vec_id FROM withind)
        |SELECT p.vec_id, p.cluster, d.vec_id IS NULL AS is_kept
        |FROM pd p LEFT JOIN dropped d ON p.vec_id = d.vec_id""".stripMargin,
    // e2's two deterministic Lloyd rounds verbatim over the planted
    // corpus, then the pairwise within-cluster ε-ball rule
    "e4_semantic_dedup" ->
      """WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |v AS (SELECT vec_id, e FROM v0
        |      UNION ALL
        |      SELECT vec_id + 10000000, list_prepend(e[1] + 0.01, e[2:]) FROM v0 WHERE vec_id % 10 = 0),
        |a0 AS (SELECT vec_id, e, vec_id % 64 AS cluster FROM v),
        |exp1 AS (SELECT cluster, unnest(range(len(e))) AS pos, unnest(e) AS val FROM a0),
        |c1 AS (SELECT cluster AS cid, pos,
        |         CAST(CAST(SUM(CAST(val AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS cv
        |       FROM exp1 GROUP BY 1, 2),
        |cent1 AS (SELECT cid, list(cv ORDER BY pos) AS c FROM c1 GROUP BY 1),
        |d1 AS (SELECT vec_id, e, cid,
        |         list_reduce(list_transform(list_zip(e, c), p -> (p[1]-p[2])*(p[1]-p[2])), (a, b) -> a + b) AS dist
        |       FROM a0, cent1),
        |a1 AS (SELECT vec_id, e, cluster FROM (
        |         SELECT vec_id, e, cid AS cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |         FROM d1) WHERE rn = 1),
        |exp2 AS (SELECT cluster, unnest(range(len(e))) AS pos, unnest(e) AS val FROM a1),
        |c2 AS (SELECT cluster AS cid, pos,
        |         CAST(CAST(SUM(CAST(val AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS cv
        |       FROM exp2 GROUP BY 1, 2),
        |cent2 AS (SELECT cid, list(cv ORDER BY pos) AS c FROM c2 GROUP BY 1),
        |d2 AS (SELECT vec_id, e, cid,
        |         list_reduce(list_transform(list_zip(e, c), p -> (p[1]-p[2])*(p[1]-p[2])), (a, b) -> a + b) AS dist
        |       FROM a1, cent2),
        |fin AS (SELECT vec_id, e, cluster FROM (
        |         SELECT vec_id, e, cid AS cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |         FROM d2) WHERE rn = 1),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM fin a JOIN fin b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE list_sum(list_transform(list_zip(a.e, b.e), x -> x[1]*x[2]))
        |        / sqrt(list_sum(list_transform(a.e, x -> x*x)))
        |        / sqrt(list_sum(list_transform(b.e, x -> x*x))) >= 0.95)
        |SELECT f.vec_id, f.cluster, d.vec_id IS NULL AS is_kept
        |FROM fin f LEFT JOIN dropped d ON f.vec_id = d.vec_id""".stripMargin,
    "e2_kmeans_clusters" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |a0 AS (SELECT vec_id, e, vec_id % 64 AS cluster FROM v),
        |exp1 AS (SELECT cluster, unnest(range(len(e))) AS pos, unnest(e) AS val FROM a0),
        |c1 AS (SELECT cluster AS cid, pos,
        |         CAST(CAST(SUM(CAST(val AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS cv
        |       FROM exp1 GROUP BY 1, 2),
        |cent1 AS (SELECT cid, list(cv ORDER BY pos) AS c FROM c1 GROUP BY 1),
        |d1 AS (SELECT vec_id, e, cid,
        |         list_reduce(list_transform(list_zip(e, c), p -> (p[1]-p[2])*(p[1]-p[2])), (a, b) -> a + b) AS dist
        |       FROM a0, cent1),
        |a1 AS (SELECT vec_id, e, cluster FROM (
        |         SELECT vec_id, e, cid AS cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |         FROM d1) WHERE rn = 1),
        |exp2 AS (SELECT cluster, unnest(range(len(e))) AS pos, unnest(e) AS val FROM a1),
        |c2 AS (SELECT cluster AS cid, pos,
        |         CAST(CAST(SUM(CAST(val AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS cv
        |       FROM exp2 GROUP BY 1, 2),
        |cent2 AS (SELECT cid, list(cv ORDER BY pos) AS c FROM c2 GROUP BY 1),
        |d2 AS (SELECT vec_id, cid,
        |         list_reduce(list_transform(list_zip(e, c), p -> (p[1]-p[2])*(p[1]-p[2])), (a, b) -> a + b) AS dist
        |       FROM a1, cent2)
        |SELECT vec_id, cluster, round(dist, 6) AS dist_r6 FROM (
        |  SELECT vec_id, cid AS cluster, dist,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |  FROM d2) WHERE rn = 1""".stripMargin,
    "tj1_asof_last_purchase" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, p.value AS last_purchase_value
        |FROM events e ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin,
    "tj2_range_ship_window" ->
      """WITH windows AS (
        |  SELECT o_orderkey AS w_orderkey, epoch_us(o_orderdate) AS w_start,
        |    epoch_us(o_orderdate) + 30::BIGINT * 86400000000 AS w_end
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT w_orderkey, COUNT(*) AS n_shipped
        |FROM lineitem JOIN windows
        |  ON epoch_us(l_shipdate) >= w_start AND epoch_us(l_shipdate) <= w_end
        |GROUP BY w_orderkey""".stripMargin,
    "tj3_asof_next_purchase" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, p.value AS next_purchase_value
        |FROM events e ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts <= p.ts""".stripMargin,
    "tj4_asof_nearest_purchase" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'purchase'),
        |b AS (
        |  SELECT e.event_id, e.user_id, e.ts AS ets, p.ts AS bts, p.value AS bval
        |  FROM events e ASOF LEFT JOIN purchases p
        |    ON e.user_id = p.user_id AND e.ts >= p.ts),
        |f AS (
        |  SELECT e.event_id, p.ts AS fts, p.value AS fval
        |  FROM events e ASOF LEFT JOIN purchases p
        |    ON e.user_id = p.user_id AND e.ts <= p.ts)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN fts IS NULL THEN bval
        |       WHEN bts IS NULL THEN fval
        |       WHEN epoch_us(ets) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ets) THEN bval
        |       ELSE fval END AS nearest_purchase_value
        |FROM b JOIN f USING (event_id)""".stripMargin,
    "w7_time_range_frame" ->
      """SELECT event_id, user_id, ts,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS VARCHAR) AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin,
    "st1_windowed_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n_events, CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "st2_sessionize_batch" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM flagged)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, session_idx""".stripMargin,
    "st3_sessionize_stream" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM flagged),
        |sess AS (
        |  SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
        |  FROM sessions GROUP BY user_id, session_idx),
        |last AS (SELECT user_id, MAX(session_end) AS last_end FROM sess GROUP BY user_id),
        |mx AS (SELECT MAX(ts) AS maxts FROM events)
        |SELECT s.user_id, s.session_start, s.session_end, s.n_events
        |FROM sess s JOIN last l ON s.user_id = l.user_id, mx
        |WHERE s.session_end < l.last_end
        |   OR epoch_us(s.session_end) + 3600000000 < epoch_us(maxts)""".stripMargin,
    "st5_sessionize_durable" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM flagged),
        |sess AS (
        |  SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
        |  FROM sessions GROUP BY user_id, session_idx),
        |last AS (SELECT user_id, MAX(session_end) AS last_end FROM sess GROUP BY user_id),
        |mx AS (SELECT MAX(ts) AS maxts FROM events)
        |SELECT s.user_id, s.session_start, s.session_end, s.n_events
        |FROM sess s JOIN last l ON s.user_id = l.user_id, mx
        |WHERE s.session_end < l.last_end
        |   OR epoch_us(s.session_end) + 3600000000 < epoch_us(maxts)""".stripMargin,
    "st6_stream_dedup" ->
      "SELECT event_id, user_id, ts, event_type, value FROM events",
    // two runs + doubling collapse back to the original set — same oracle
    "st7_stream_dedup_crossrun" ->
      "SELECT event_id, user_id, ts, event_type, value FROM events",
    // two fresh-checkpoint runs, one effect: counts are exactly-once
    "st8_stats_zone_stream" ->
      """SELECT event_type, COUNT(*) AS n_rows, TRUE AS p50_in_band,
        |  TRUE AS p90_in_band, TRUE AS distinct_in_5pct
        |FROM events GROUP BY event_type""".stripMargin,
    "st4_interval_join_stream" ->
      """SELECT l.user_id AS user_id, l.ts AS left_ts, r.ts AS right_ts,
        |  r.value AS right_value
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND l.event_type = 'click' AND r.event_type = 'purchase'
        | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 240 MINUTE""".stripMargin,
    "sk1_salted_join" ->
      """WITH ev AS (
        |  SELECT *, CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id % 50 END AS user_bucket
        |  FROM events),
        |dim AS (
        |  SELECT DISTINCT user_id % 50 AS user_bucket FROM events),
        |named AS (SELECT user_bucket, 'bucket_' || CAST(user_bucket AS VARCHAR) AS bucket_name FROM dim)
        |SELECT bucket_name, COUNT(*) AS n, CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total
        |FROM ev JOIN named USING (user_bucket)
        |GROUP BY bucket_name""".stripMargin,
    "mm_binary_features" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  ascii(substr(text, 1, 1)) AS width, ascii(substr(text, 2, 1)) AS height,
        |  md5(text) AS checksum
        |FROM documents""".stripMargin,
    "mm3_image_headers" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 8000 + (doc_id % 5) * 8000
        |            ELSE doc_id % 800 + 1 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN doc_id % 2 + 1
        |            ELSE doc_id % 600 + 1 END AS INT) AS height,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 41 ELSE 44 END AS BIGINT) AS byte_len
        |FROM documents""".stripMargin,
    "mm4_video_headers" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN NULL
        |            ELSE 1000 + (doc_id % 5) * 600 END AS BIGINT) AS timescale,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN NULL
        |            ELSE (1000 + (doc_id % 5) * 600) * (doc_id % 300 + 1) END AS BIGINT)
        |    AS duration_ticks,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN NULL
        |            ELSE doc_id % 300 + 1 END AS DOUBLE) AS duration_sec,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id % 1920 + 1 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id % 1080 + 1 END AS INT) AS height
        |FROM documents""".stripMargin,
    "k1_knn_bruteforce" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT * FROM v WHERE vec_id < 5),
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.e, c.e), x -> x[1]*x[2]))
        |      / sqrt(list_sum(list_transform(q.e, x -> x*x)))
        |      / sqrt(list_sum(list_transform(c.e, x -> x*x))) AS sim
        |  FROM q, v c WHERE q.vec_id <> c.vec_id)
        |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM sims) WHERE rn <= 10""".stripMargin
  )

  /** CTE block producing brute-force 3-gram pair stats over the near-dup
    * corpus — shared by the d2/d3 pair oracle and the d6 clustering
    * oracle (which closes the pair set transitively).
    */
  /** c8/c9 oracle: the full 3-day corpus-pipeline replay as DuckDB CTEs.
    * Increments are reconstructed from the same modular plants as
    * [[corpusRunWarehouse]], then replayed stage by stage:
    *   quality  — the 3-rule suite (null / alpha-ratio ≥ 0.25 / ≥ 5 tokens)
    *   exact    — first (day, doc_id) occurrence per normalized-token md5
    *              (the fp zone holds each fp's first day; within-day ties
    *              break on min id — one window covers both)
    *   near-dup — EXACT 3-gram-shingle Jaccard ≥ 0.6 pairs (the d3
    *              recall-1 equivalence) + transitive closure, min-id
    *              canonical. Candidate generation applies the PUBLIC
    *              lossless prefix bound (Chaudhuri et al. SSJoin /
    *              PPJoin: under any fixed global token order, J ≥ t ⟹
    *              overlap ≥ ⌈t·|x|⌉ on BOTH sides, so the first
    *              |x|−⌈t·|x|⌉+1 tokens of each doc must share one) —
    *              every candidate is then verified by the full exact
    *              Jaccard, so the pair set is IDENTICAL to the naive
    *              Σ postings² self-join this replaced; the naive form
    *              spilled >72 GB and died at sf1 (round-12 BASELINE
    *              adjudication) without the bound. Independence note:
    *              the bound is textbook math applied in SQL, the df
    *              order is the oracle's own; the engine's PPJoin arm
    *              additionally uses positional filtering, minhash
    *              banding and zone pruning the oracle never sees.
    *              The closure is DAY-SLICED (e{d}/r{d}/k{d}): a doc's
    *              verdict uses only pairs whose BOTH endpoints had
    *              arrived by its day — a later day's pair merging two
    *              clusters must not retract an earlier day's publish.
    *   semantic — at k=1/θ=0.999 the SemDeDup rule is exactly "drop iff a
    *              prior-PUBLISHED doc, or a smaller-id same-day survivor,
    *              carries the identical embedding" (embk maps each doc to
    *              its embedding identity: base docs their own vec_id,
    *              +6e7 probes their source's). Exact because the
    *              testdata embeddings are pairwise distinct with max
    *              natural cosine ≤ 0.61 ≪ 0.999 (verified at all sf).
    *   excision — a proven no-op: no text carries a blank-line separator,
    *              so every doc is one paragraph, and a repeated single
    *              paragraph is already an exact dup (pinned by c9's
    *              n_excised_docs = 0 and c8's text_md5).
    */
  private val corpusRunChainCtes: String = {
    val tk = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    val mut = s"array_to_string(($tk)[6:], ' ')"
    val rev = s"array_to_string(list_reverse($tk), ' ')"
    val alpha = "(CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
      "CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) END)"
    def dayBlock(d: Int): String = {
      val pubPrior = d match {
        case 1 => "SELECT doc_id FROM ex WHERE FALSE"
        case 2 => "SELECT doc_id FROM p1"
        case _ => "SELECT doc_id FROM p1 UNION ALL SELECT doc_id FROM p2"
      }
      s"""e$d AS (SELECT id_a AS s, id_b AS t FROM prs WHERE pday <= $d
         |  UNION SELECT id_b, id_a FROM prs WHERE pday <= $d),
         |r$d(id, lbl) AS (
         |  SELECT s, s FROM e$d
         |  UNION SELECT e.t, r.lbl FROM r$d r JOIN e$d e ON e.s = r.id),
         |nc$d AS (SELECT id FROM r$d GROUP BY id HAVING MIN(lbl) < id),
         |k$d AS (SELECT * FROM ex WHERE day = $d
         |  AND doc_id NOT IN (SELECT id FROM nc$d)),
         |p$d AS (
         |  SELECT k.doc_id, k.text, k.source, k.day
         |  FROM k$d k LEFT JOIN embk ek ON ek.doc_id = k.doc_id
         |  WHERE ek.ekey IS NULL OR (
         |    NOT EXISTS (
         |      SELECT 1 FROM ($pubPrior) p JOIN embk e2 ON e2.doc_id = p.doc_id
         |      WHERE e2.ekey = ek.ekey)
         |    AND NOT EXISTS (
         |      SELECT 1 FROM k$d k2 JOIN embk e3 ON e3.doc_id = k2.doc_id
         |      WHERE e3.ekey = ek.ekey AND k2.doc_id < k.doc_id)))""".stripMargin
    }
    s"""corpus AS (
       |  SELECT doc_id, text, source, 1 AS day FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL SELECT doc_id, text, source, 2 FROM documents WHERE doc_id % 3 = 1
       |  UNION ALL SELECT doc_id + 20000000, text, 'replant', 2
       |    FROM documents WHERE doc_id % 15 = 0
       |  UNION ALL SELECT doc_id, text, source, day FROM (VALUES
       |    (80000001, CAST(NULL AS VARCHAR), 'junk', 2),
       |    (80000002, '!!! ??? !!!', 'junk', 2),
       |    (80000003, 'a b c', 'junk', 2)) j(doc_id, text, source, day)
       |  UNION ALL SELECT doc_id, text, source, 3 FROM documents WHERE doc_id % 3 = 2
       |  UNION ALL SELECT doc_id + 40000000, $mut, 'neardup', 3
       |    FROM documents WHERE doc_id % 15 = 6
       |  UNION ALL SELECT doc_id + 50000000, $mut, 'neardup_intra', 3
       |    FROM documents WHERE doc_id % 15 = 2
       |  UNION ALL SELECT doc_id + 60000000, $rev, 'semdup', 3
       |    FROM documents JOIN embeddings ON doc_id = vec_id WHERE doc_id % 15 = 9),
       |q AS (
       |  SELECT doc_id, text, source, day, $tk AS tkn FROM corpus
       |  WHERE text IS NOT NULL AND $alpha >= 0.25 AND len($tk) >= 5),
       |ex AS (
       |  SELECT doc_id, text, source, day, tkn FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY md5(array_to_string(tkn, ' ')) ORDER BY day, doc_id) AS rn
       |    FROM q)
       |  WHERE rn = 1),
       |inv AS MATERIALIZED (
       |  SELECT doc_id, day, len(gs) AS sz, unnest(gs) AS g FROM (
       |    SELECT doc_id, day, list_distinct(list_transform(
       |      range(1, greatest(len(tkn) - 1, 1)),
       |      i -> array_to_string(tkn[i:i+2], ' '))) AS gs
       |    FROM ex)),
       |gdf AS MATERIALIZED (SELECT g, count(*) AS df FROM inv GROUP BY g),
       |pref AS MATERIALIZED (
       |  SELECT doc_id, g FROM (
       |    SELECT i.doc_id, i.g, i.sz,
       |      row_number() OVER (PARTITION BY i.doc_id ORDER BY d.df, i.g) AS rn
       |    FROM inv i JOIN gdf d ON d.g = i.g)
       |  WHERE rn <= sz - CEIL(0.6 * sz) + 1),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id),
       |prs AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, greatest(a.day, b.day) AS pday
       |  FROM cand c
       |  JOIN inv a ON a.doc_id = c.id_a
       |  JOIN inv b ON b.doc_id = c.id_b AND b.g = a.g
       |  GROUP BY a.doc_id, b.doc_id, a.sz, b.sz, a.day, b.day
       |  HAVING CAST(count(*) AS DOUBLE) / (a.sz + b.sz - count(*)) >= 0.6),
       |embk AS (
       |  SELECT vec_id AS doc_id, vec_id AS ekey FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 60000000, vec_id
       |    FROM embeddings JOIN documents ON vec_id = doc_id WHERE vec_id % 15 = 9),
       |${dayBlock(1)},
       |${dayBlock(2)},
       |${dayBlock(3)}""".stripMargin
  }

  private val ngramPairCtes: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 20000000,
      |    array_to_string((list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))[6:], ' ')
      |  FROM documents WHERE doc_id % 5 = 0),
      |grams AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(len(tk) - 1, 1)),
      |    i -> array_to_string(tk[i:i+2], ' '))) AS gs
      |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
      |        FROM corpus)
      |  WHERE len(tk) > 0),
      |inv AS (SELECT doc_id, len(gs) AS sz, unnest(gs) AS g FROM grams),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b, count(*) AS inter
      |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4)""".stripMargin

  /** Shared oracle for d2/d3: brute-force 3-gram Jaccard ≥ 0.6 over the
    * near-dup corpus (d3's LSH must find exactly these pairs when recall=1).
    */
  /** DuckDB replay of [[graft.operators.TextAnalysis.bpeTrain]]: a
    * chained CTE block per merge round — pair counts from the previous
    * round's vocabulary, the (n DESC, a, b) argmax, and the greedy
    * bracket-encoded replace — generated for `nMerges` rounds so the
    * oracle is mechanically in lockstep with the Spark loop (both stop
    * producing rows once no pair reaches count 2).
    */
  private def bpeChainSql(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { i =>
      val prev = s"w${i - 1}"
      // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at every
      // reference, and each round references its predecessor several
      // times — inlined, the chain duplicates the base scan
      // exponentially (observed: fd exhaustion at 10 rounds)
      s"""t$i AS MATERIALIZED (
         |  SELECT a, b, n FROM (
         |    SELECT s[i] AS a, s[i+1] AS b, CAST(SUM(cnt) AS BIGINT) AS n
         |    FROM (SELECT string_split(regexp_replace(enc, '^<|>$$', '', 'g'), '><') AS s, cnt FROM $prev),
         |         UNNEST(range(1, len(s))) AS t(i)
         |    GROUP BY 1, 2)
         |  WHERE n >= 2 ORDER BY n DESC, a, b LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT w, CASE WHEN (SELECT COUNT(*) FROM t$i) = 1
         |    THEN replace(enc,
         |      '<' || (SELECT a FROM t$i) || '><' || (SELECT b FROM t$i) || '>',
         |      '<' || (SELECT a FROM t$i) || (SELECT b FROM t$i) || '>')
         |    ELSE enc END AS enc, cnt FROM $prev)""".stripMargin
    }
    s"""WITH tokd AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
       |  FROM documents),
       |w0 AS MATERIALIZED (
       |  SELECT w, regexp_replace(w, '(.)', '<\\1>', 'g') AS enc, COUNT(*) AS cnt
       |  FROM (SELECT unnest(tk) AS w FROM tokd) GROUP BY 1, 2),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  private def bpeOracleSql(nMerges: Int): String = {
    val union = (1 to nMerges)
      .map(i => s"SELECT $i AS merge_rank, a AS lhs, b AS rhs, a || b AS merged, n AS pair_count FROM t$i")
      .mkString("\nUNION ALL\n")
    s"""${bpeChainSql(nMerges)}
       |$union""".stripMargin
  }

  /** The BATCHED-training replay (t17): per batch, ONE pair-count
    * snapshot ranked (n desc, a, b) and limited to the batch size; the
    * batch's replaces are applied sequentially in rank order (an absent
    * rank no-ops via a chr(1) sentinel pattern that cannot occur in the
    * bracket encoding). Batch-2+ merge ranks offset by the cumulative
    * count of earlier batches, mirroring the engine's contiguous
    * numbering when a batch comes up short.
    */
  private def bpeBatchedOracleSql(nMerges: Int, m: Int): String = {
    val nBatches = (nMerges + m - 1) / m
    val rounds = (1 to nBatches).map { i =>
      val prev = s"w${i - 1}"
      val lim = math.min(m, nMerges - (i - 1) * m)
      val applied = (1 to lim).foldLeft("enc") { (c, j) =>
        val pat = s"COALESCE((SELECT '<' || a || '><' || b || '>' FROM t$i WHERE rn = $j), chr(1))"
        val rep = s"COALESCE((SELECT '<' || a || b || '>' FROM t$i WHERE rn = $j), chr(1))"
        s"replace($c,\n      $pat,\n      $rep)"
      }
      s"""t$i AS MATERIALIZED (
         |  SELECT a, b, n, row_number() OVER (ORDER BY n DESC, a, b) AS rn FROM (
         |    SELECT s[i] AS a, s[i+1] AS b, CAST(SUM(cnt) AS BIGINT) AS n
         |    FROM (SELECT string_split(regexp_replace(enc, '^<|>$$', '', 'g'), '><') AS s, cnt FROM $prev),
         |         UNNEST(range(1, len(s))) AS t(i)
         |    GROUP BY 1, 2)
         |  WHERE n >= 2 ORDER BY n DESC, a, b LIMIT $lim),
         |w$i AS MATERIALIZED (
         |  SELECT w, $applied AS enc, cnt FROM $prev)""".stripMargin
    }
    val offsets = (1 to nBatches).map { i =>
      if (i == 1) "0"
      else (1 until i).map(j => s"(SELECT COUNT(*) FROM t$j)").mkString(" + ")
    }
    val union = (1 to nBatches).map { i =>
      s"SELECT CAST(${offsets(i - 1)} + rn AS INT) AS merge_rank, a AS lhs, b AS rhs, " +
        s"a || b AS merged, n AS pair_count FROM t$i"
    }.mkString("\nUNION ALL\n")
    s"""WITH tokd AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
       |  FROM documents),
       |w0 AS MATERIALIZED (
       |  SELECT w, regexp_replace(w, '(.)', '<\\1>', 'g') AS enc, COUNT(*) AS cnt
       |  FROM (SELECT unnest(tk) AS w FROM tokd) GROUP BY 1, 2),
       |${rounds.mkString(",\n")}
       |$union""".stripMargin
  }

  /** [[bpeChainSql]]'s trained vocabulary applied back to the corpus:
    * per-word subword splits from the final round's encoding, joined to
    * the position-exploded token stream and re-assembled per document.
    */
  private def bpeApplyOracleSql(nMerges: Int): String =
    s"""${bpeChainSql(nMerges)},
       |sub AS (
       |  SELECT w, string_split(regexp_replace(enc, '^<|>$$', '', 'g'), '><') AS subs
       |  FROM w$nMerges),
       |tok AS (
       |  SELECT doc_id, i, tk[i] AS w
       |  FROM tokd, UNNEST(range(1, len(tk) + 1)) AS t(i))
       |SELECT doc_id,
       |  COUNT(*) AS n_tokens,
       |  CAST(SUM(len(subs)) AS BIGINT) AS n_subwords,
       |  string_agg(array_to_string(subs, ' '), ' ' ORDER BY i) AS subword_text
       |FROM tok JOIN sub USING (w)
       |GROUP BY doc_id""".stripMargin

  private val ngramJaccardOracle: String =
    s"""WITH $ngramPairCtes
      |SELECT id_a, id_b, CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) AS jaccard
      |FROM pairs WHERE CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) >= 0.6""".stripMargin

  /** d6 oracle: transitive closure of the confirmed pair set via a
    * recursive CTE (min reachable id = the cluster label).
    */
  private val dupClustersOracle: String =
    s"""WITH RECURSIVE $ngramPairCtes,
      |dup AS (
      |  SELECT id_a, id_b FROM pairs
      |  WHERE CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) >= 0.6),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM dup
      |  UNION SELECT id_b, id_a FROM dup),
      |nodes AS (SELECT DISTINCT src AS id FROM edges),
      |reach(id, label) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
      |lab AS (SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id),
      |sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1)
      |SELECT id, cluster_id, cluster_size, id = cluster_id AS is_canonical
      |FROM lab JOIN sizes USING (cluster_id)""".stripMargin

  /** Engine-portable deterministic bucket in [0,100) — the SQL mirror of
    * [[graft.operators.Curation.hashBucket]] (first four md5 hex nibbles).
    */
  private def bucketSql(idExpr: String): String = {
    def nib(i: Int): String = {
      val a = s"ascii(substr(md5(CAST($idExpr AS VARCHAR)), $i, 1))"
      s"(CASE WHEN $a >= 97 THEN $a - 87 ELSE $a - 48 END)"
    }
    s"((${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)}) % 100)"
  }
}
