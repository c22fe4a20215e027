package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Landing-zone data profiling: per-column row/null/distinct counts and
  * min/max, the sweep a warehouse runs on every new drop before letting
  * it into staging (the reference eyeballs this by hand in Navicat; here
  * it is an operator).
  *
  * Scale shape: ONE scan of the input computes every column's aggregates
  * in a single aggregation (count/min/max fold map-side; the distinct
  * counts expand-rewrite into one two-phase aggregate), then the stacked
  * long form is #cols selects over that one-row frame — no per-column
  * rescans, which is the difference between profiling 100 TB once and
  * profiling it #cols times.
  *
  * min/max are emitted as strings so heterogeneous column types stack
  * into one frame; numeric strings are each engine's shortest
  * round-trippable form, so they compare exactly.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    // materialize the one-row aggregate: the stacked union below selects
    // from it #cols times, and without truncating lineage each branch
    // would re-run the whole scan+aggregate — #cols scans instead of one
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*).localCheckpoint()
    cols.map { c =>
        one.select(
          lit(c).as("col_name"),
          col("n_rows"),
          (col("n_rows") - col(s"${c}__nn")).as("n_nulls"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__min").as("min_str"),
          col(s"${c}__max").as("max_str"))
      }
      .reduce(_ unionByName _)
  }

  /** Persisted per-epoch mergeable sketch states — the standing
    * statistics a 100 TB warehouse keeps NEXT TO the data: one row per
    * (epoch, group) holding a row count, a KLL quantile state over
    * `valueExpr`, and an HLL distinct state over `keyExpr`. Built once
    * per epoch (e.g. nightly for the closing month); every later
    * rollup — any group, any epoch range, quantiles AND distincts —
    * merges kilobyte states instead of rescanning raw rows
    * ([[rollupStats]], plan-audited to touch only the zone).
    *
    * Expressions are SQL snippets so callers can epoch however the
    * table is laid out (`date_format(l_shipdate, 'yyyy-MM')`, a
    * partition column, …). The state frame is months × groups rows of
    * kilobytes — `repartition(1)` keeps the zone one file instead of
    * shuffle-partition-many near-empty ones.
    */
  private def statsStates(
      df: DataFrame,
      epochExpr: String,
      groupExpr: String,
      valueExpr: String,
      keyExpr: String,
      kllK: Int): DataFrame =
    df.groupBy(expr(epochExpr).as("epoch"), expr(groupExpr).as("grp"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr(s"kll_sketch_agg(cast(($valueExpr) as double), $kllK)").as("value_kll"),
        expr(s"hll_sketch_agg($keyExpr)").as("key_hll"))

  def writeStatsZone(
      df: DataFrame,
      path: String,
      epochExpr: String,
      groupExpr: String,
      valueExpr: String,
      keyExpr: String,
      kllK: Int = 200): Unit = {
    statsStates(df, epochExpr, groupExpr, valueExpr, keyExpr, kllK)
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def readStatsZone(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Any-range rollup from stored states, never touching raw rows:
    * exact row counts (counts sum losslessly), KLL-merged quantile
    * estimates at `ranks`, and the HLL-union distinct estimate.
    */
  def rollupStats(stats: DataFrame, ranks: Seq[Double]): DataFrame = {
    val rankArr = ranks.map(r => s"${r}d").mkString("array(", ", ", ")")
    stats.groupBy("grp")
      .agg(
        sum("n_rows").as("n_rows"),
        expr(s"kll_quantiles(kll_merge_agg(value_kll), $rankArr)").as("value_quantiles"),
        expr("hll_sketch_estimate(hll_union_agg(key_hll))").as("key_distinct_est"))
  }

  /** Equi-depth binning against quantile CUTPOINTS (typically decoded
    * from a stats zone's merged KLL state): row → number of cutpoints
    * strictly below its value, i.e. right-closed bins 0..k. The label is
    * a pure column expression — k comparisons per row, no sort, no
    * shuffle — which is what makes quantile feature-bucketization viable
    * over 100 TB: the expensive part (the quantiles) comes from persisted
    * kilobyte sketch states, not from ordering the data.
    */
  def bucketizeByQuantiles(df: DataFrame, valueExpr: String, cuts: Seq[Double]): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted, "cutpoints must be sorted")
    val bin = cuts.foldLeft(lit(0))((acc, c) =>
      acc + (expr(valueExpr) > lit(c)).cast("int"))
    df.withColumn("bin", bin)
  }

  /** The zone's replay high-water mark: max over the `hwm` column, or
    * -1 for an absent zone / one built by [[writeStatsZone]] (which
    * carries no mark).
    */
  def statsZoneHighWater(spark: SparkSession, path: String): Long = {
    import graft.sources.Zones
    if (!Zones.exists(spark, s"$path/_SUCCESS")) -1L
    else {
      val df = Zones.read(spark, path)
      if (!df.columns.contains("hwm")) -1L
      else df.agg(coalesce(max("hwm"), lit(-1L))).head().getLong(0)
    }
  }

  /** Merge an increment's states into a stored stats zone — the
    * incremental/streaming maintenance step: per-call cost is
    * O(increment rows + existing states); raw history is NEVER
    * rescanned (counts sum, KLL states merge, HLL states union).
    *
    * Exactly-once under replay: the replay guard is the SET of applied
    * batch ids, carried INSIDE the swapped data (per-row `applied`
    * arrays whose union is the zone's applied set), so the guard and
    * the state update commit in one filesystem rename — a crash
    * between "zone written" and "mark written" cannot exist. Only an
    * EXACT replay (a `batchId` already in the applied set) no-ops and
    * returns false; an out-of-order increment — a BACKFILL of an
    * earlier day after later days have run — merges normally, which a
    * plain high-water-mark guard would silently drop. `hwm` (the max
    * applied id) is still maintained for rollups and monitoring. The
    * `applied` array on each (epoch, grp) row holds the ids of the
    * batches that contributed to that row: bounded by
    * batches-per-epoch (≤ 31 for daily batches in monthly epochs), so
    * pick `epochExpr` granular enough that the set stays small under
    * high-frequency feeds.
    *
    * SINGLE-WRITER CONTRACT: the guard serializes replays of one
    * logical writer (a foreachBatch sink, a daily pipeline behind a
    * ledger gate). Two CONCURRENT writers can interleave stage/swap
    * and one merge is lost — callers must serialize externally (the
    * CorpusRun ledger RUNNING row does this). As a cheap tripwire,
    * after the swap the zone is re-read and a missing just-applied
    * batch id raises an error naming the interleave instead of
    * silently losing the increment.
    *
    * The staged write reads the CURRENT zone files while writing the
    * tmp dir ([[graft.sources.Zones.overwriteSwap]]'s contract), so
    * the zone stays readable throughout.
    */
  def mergeStatsIncrement(
      spark: SparkSession,
      increment: DataFrame,
      path: String,
      epochExpr: String,
      groupExpr: String,
      valueExpr: String,
      keyExpr: String,
      kllK: Int = 200,
      batchId: Option[Long] = None): Boolean = {
    import graft.sources.Zones
    val cur: Option[DataFrame] =
      if (!Zones.exists(spark, s"$path/_SUCCESS")) None
      else {
        val c = Zones.read(spark, path)
        val withHwm =
          if (c.columns.contains("hwm")) c else c.withColumn("hwm", lit(-1L))
        // legacy zones (pre-`applied`): seed each row's set with its own
        // hwm — exact replays of those ids still no-op; older ids merge
        val withApplied =
          if (withHwm.columns.contains("applied")) withHwm
          else withHwm.withColumn("applied",
            when(col("hwm") >= 0, array(col("hwm")))
              .otherwise(expr("cast(array() as array<bigint>)")))
        Some(withApplied)
      }
    val alreadyApplied = batchId.exists(b =>
      cur.exists(_.agg(coalesce(max(array_contains(col("applied"), lit(b))), lit(false)))
        .head().getBoolean(0)))
    if (alreadyApplied) false
    else {
      val storedHwm = cur
        .map(_.agg(coalesce(max("hwm"), lit(-1L))).head().getLong(0))
        .getOrElse(-1L)
      val hwm = batchId.getOrElse(storedHwm + 1L)
      val incStates = statsStates(increment, epochExpr, groupExpr, valueExpr, keyExpr, kllK)
        .withColumn("hwm", lit(hwm))
        .withColumn("applied", array(lit(hwm)))
      val merged = cur match {
        case None => incStates
        case Some(c) =>
          c.unionByName(incStates)
            .groupBy("epoch", "grp")
            .agg(
              sum("n_rows").as("n_rows"),
              expr("kll_merge_agg(value_kll)").as("value_kll"),
              expr("hll_union_agg(key_hll)").as("key_hll"),
              max("hwm").as("hwm"),
              array_sort(array_distinct(flatten(collect_list("applied")))).as("applied"))
      }
      Zones.overwriteSwap(merged.repartition(1), path)
      // single-writer tripwire: our batch id must be visible in the zone we
      // just swapped in; if not, a concurrent writer's swap clobbered ours
      val visible = Zones.read(spark, path)
        .agg(coalesce(max(array_contains(col("applied"), lit(hwm))), lit(false)))
        .head().getBoolean(0)
      if (!visible) throw new IllegalStateException(
        s"stats zone $path: batch $hwm missing immediately after its swap — " +
          "a concurrent writer interleaved (single-writer contract violated); " +
          "the increment was lost and must be re-merged under external serialization")
      true
    }
  }
}
