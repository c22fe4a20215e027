package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * batch ids, carried INSIDE the swapped data, so the guard and
    * the state update commit in one filesystem rename — a crash
    * between "zone written" and "mark written" cannot exist. Only an
    * EXACT replay (a `batchId` already in the applied set) no-ops and
    * returns false; an out-of-order increment — a BACKFILL of an
    * earlier day after later days have run — merges normally, which a
    * plain high-water-mark guard would silently drop. `hwm` (the max
    * applied id) is still maintained for rollups and monitoring.
    *
    * BOUNDED REPRESENTATION (range compaction): each row stores its
    * applied set as one dense run `[applied_base .. applied_floor]`
    * plus an `applied` array of out-of-order extras, re-compacted on
    * every merge (extras adjacent to the run are absorbed). Every merge
    * stamps EVERY row with the batch id — the replay predicate is
    * zone-level (any row containing b no-ops b), so a row's set means
    * "batches applied to the zone while this row existed", and a group
    * absent from some batches accretes no gap-extras. An in-order
    * GAPLESS feed — the production shape: foreachBatch ids are
    * checkpoint-monotonic with no holes, daily ids skip nothing —
    * therefore keeps the extras array EMPTY forever regardless of
    * batches-per-epoch; only ids that arrive non-contiguously
    * (interleaved backfills) are retained individually, and more than
    * [[MaxAppliedExtras]] of them per (epoch, grp) row raises a named
    * error (the feed is then not a replayable increment stream but a
    * shuffle of history — re-feed in order, or coarsen `epochExpr`).
    * CAVEAT — a PERMANENT id gap (an id skipped and never backfilled,
    * e.g. a day-id feed that missed a calendar day): the single-run
    * representation cannot bridge it without claiming the missing id
    * applied (which would silently no-op its late backfill), so rows
    * spanning the gap retain every post-gap id as an extra — bounded by
    * the row's remaining batches-per-epoch and stopped by the same
    * named cap, never silent. If a feed legitimately has permanent gaps
    * at a scale where one epoch sees > [[MaxAppliedExtras]] post-gap
    * batches, coarsen the ids or close the gap with an empty-batch
    * merge carrying the missing id; a multi-run representation would
    * lift the limit and is the structural upgrade path. The set
    * semantics are EXACT: an
    * id is applied iff it is in the run or in the extras.
    *
    * LEGACY-ZONE REPLAY CAVEAT: a zone written before the applied-set
    * guard (hwm-only) upgrades by seeding each row's set with that
    * row's hwm alone — exact replays of the LATEST batch (the
    * realistic crash-redelivery) still no-op, but a redelivered OLDER
    * legacy id re-merges and double-counts where the old high-water
    * guard would have dropped it. The upgrade trades that narrow
    * legacy window for backfill support; pinned by ModulesSpec's
    * legacy-upgrade test so the tradeoff stays deliberate.
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
  /** Out-of-order ids retained per row before the merge refuses with a
    * named error. In-order feeds never retain any (they ride the dense
    * run); this only bounds adversarial/shuffled feeds.
    */
  val MaxAppliedExtras = 4096

  /** Is `b` in the row's applied set: inside the dense run OR among the
    * extras. The exact replay predicate.
    */
  private def appliedContains(b: Column): Column =
    (col("applied_floor") >= col("applied_base") &&
      b.between(col("applied_base"), col("applied_floor"))) ||
      array_contains(col("applied"), b)

  /** Range-compact the applied sets collected per (epoch, grp) during a
    * merge: input columns `__rngs` (array of {base, floor} dense runs)
    * and `__exs` (flattened extras), output columns `applied_base` /
    * `applied_floor` / `applied`. Pure column expressions — three
    * bounded array folds, no shuffle beyond the enclosing aggregation:
    *   [1] sort runs by base, fold overlapping/adjacent ones into
    *       disjoint runs, keep the WIDEST as the dense run (a mature
    *       zone's multi-year run is never truncated by a backfill);
    *       the rest — singletons in the single-writer protocol — spill
    *       to the extras;
    *   [2] extras adjacent above the run absorb into the floor, those
    *       adjacent below absorb into the base (an empty run seeds from
    *       the smallest candidate first);
    *   [3] what remains are genuinely out-of-order ids — capped at
    *       [[MaxAppliedExtras]] with a named raise_error.
    * Exposed private[graft] so the spec can drive thousands of ids
    * through the production fold in one select.
    */
  private[graft] def compactApplied(grouped: DataFrame): DataFrame = {
    val cap = MaxAppliedExtras
    grouped
      // [1a] sorted runs fold into DISJOINT runs (adjacent/overlapping merge)
      .withColumn("__runs", expr(
        """aggregate(
          |  array_sort(filter(__rngs, r -> r.floor >= r.base)),
          |  cast(array() as array<struct<base: bigint, floor: bigint>>),
          |  (acc, r) -> case
          |    when size(acc) = 0 then array(r)
          |    when r.base <= element_at(acc, -1).floor + 1 then
          |      concat(slice(acc, 1, size(acc) - 1),
          |             array(named_struct(
          |               'base', element_at(acc, -1).base,
          |               'floor', greatest(element_at(acc, -1).floor, r.floor))))
          |    else concat(acc, array(r))
          |  end)""".stripMargin))
      // [1b] the WIDEST run survives as the dense run (never truncated —
      // a mature zone's multi-year run must not spill for one backfill);
      // the others, singletons in the single-writer protocol, spill
      .withColumn("__bi", expr(
        """aggregate(__runs,
          |  named_struct('bi', 0, 'bw', cast(-1 as bigint), 'i', 0),
          |  (acc, r) -> if(r.floor - r.base > acc.bw,
          |    named_struct('bi', acc.i, 'bw', r.floor - r.base, 'i', acc.i + 1),
          |    named_struct('bi', acc.bi, 'bw', acc.bw, 'i', acc.i + 1))).bi""".stripMargin))
      .withColumn("__rest", expr("filter(__runs, (r, i) -> i != __bi)"))
      .withColumn("__rf", expr(
        s"""named_struct(
           |  'base', coalesce(element_at(__runs, __bi + 1).base, cast(0 as bigint)),
           |  'floor', coalesce(element_at(__runs, __bi + 1).floor, cast(-1 as bigint)),
           |  'spill', flatten(transform(__rest,
           |    r -> sequence(r.base, least(r.floor, r.base + $cap)))),
           |  'ovf', exists(__rest, r -> r.floor > r.base + $cap))""".stripMargin))
      .withColumn("__cand", expr(
        """filter(
          |  array_sort(array_distinct(concat(__exs, __rf.spill))),
          |  e -> __rf.floor < __rf.base or e < __rf.base or e > __rf.floor)""".stripMargin))
      // empty run seeds from the first (smallest) candidate
      .withColumn("__base0", expr(
        "if(__rf.floor < __rf.base and size(__cand) > 0, __cand[0], __rf.base)"))
      .withColumn("__floor0", expr(
        "if(__rf.floor < __rf.base and size(__cand) > 0, __cand[0], __rf.floor)"))
      .withColumn("__cand0", expr(
        "if(__rf.floor < __rf.base and size(__cand) > 0, slice(__cand, 2, size(__cand)), __cand)"))
      .withColumn("__up", expr(
        """aggregate(
          |  filter(__cand0, e -> e > __floor0),
          |  named_struct('floor', __floor0, 'kept', cast(array() as array<bigint>)),
          |  (acc, e) -> if(e = acc.floor + 1,
          |    named_struct('floor', e, 'kept', acc.kept),
          |    named_struct('floor', acc.floor, 'kept', concat(acc.kept, array(e)))))""".stripMargin))
      .withColumn("__down", expr(
        """aggregate(
          |  reverse(filter(__cand0, e -> e < __base0)),
          |  named_struct('base', __base0, 'kept', cast(array() as array<bigint>)),
          |  (acc, e) -> if(e = acc.base - 1,
          |    named_struct('base', e, 'kept', acc.kept),
          |    named_struct('base', acc.base, 'kept', concat(acc.kept, array(e)))))""".stripMargin))
      .withColumn("applied_base", col("__down.base"))
      .withColumn("applied_floor", col("__up.floor"))
      .withColumn("applied", expr(
        s"""case when __rf.ovf or size(__down.kept) + size(__up.kept) > $cap then
           |  cast(raise_error(concat(
           |    'stats zone applied-id overflow for epoch=', epoch, ' grp=', grp,
           |    ': more than $cap out-of-order batch ids retained after range ',
           |    'compaction — the feed is a shuffle of history, not an increment ',
           |    'stream; re-feed in id order or coarsen epochExpr')) as array<bigint>)
           |else array_sort(concat(__down.kept, __up.kept)) end""".stripMargin))
      .drop("__rngs", "__exs", "__runs", "__bi", "__rest", "__rf", "__cand",
        "__base0", "__floor0", "__cand0", "__up", "__down")
  }

  /** Upgrade any stored zone layout to the current guard schema:
    * hwm-only → extras = [hwm] (see the legacy caveat above);
    * flat-applied (round-8) → extras = stored array, empty run (the
    * next merge's compaction folds them into a run).
    */
  private def upgradeGuardSchema(c: DataFrame): DataFrame = {
    val withHwm =
      if (c.columns.contains("hwm")) c else c.withColumn("hwm", lit(-1L))
    val withApplied =
      if (withHwm.columns.contains("applied")) withHwm
      else withHwm.withColumn("applied",
        when(col("hwm") >= 0, array(col("hwm")))
          .otherwise(expr("cast(array() as array<bigint>)")))
    if (withApplied.columns.contains("applied_base")) withApplied
    else withApplied
      .withColumn("applied_base", lit(0L))
      .withColumn("applied_floor", lit(-1L))
  }

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
      else Some(upgradeGuardSchema(Zones.read(spark, path)))
    val alreadyApplied = batchId.exists(b =>
      cur.exists(_.agg(coalesce(max(appliedContains(lit(b))), lit(false)))
        .head().getBoolean(0)))
    if (alreadyApplied) false
    else {
      val storedHwm = cur
        .map(_.agg(coalesce(max("hwm"), lit(-1L))).head().getLong(0))
        .getOrElse(-1L)
      val hwm = batchId.getOrElse(storedHwm + 1L)
      val incStates = statsStates(increment, epochExpr, groupExpr, valueExpr, keyExpr, kllK)
        .withColumn("hwm", lit(hwm))
        .withColumn("applied", expr("cast(array() as array<bigint>)"))
        .withColumn("applied_base", lit(hwm))
        .withColumn("applied_floor", lit(hwm))
      val merged = cur match {
        case None => incStates
        case Some(c) =>
          compactApplied(
            c.unionByName(incStates)
              .groupBy("epoch", "grp")
              .agg(
                sum("n_rows").as("n_rows"),
                expr("kll_merge_agg(value_kll)").as("value_kll"),
                expr("hll_union_agg(key_hll)").as("key_hll"),
                max("hwm").as("hwm"),
                expr("collect_list(named_struct('base', applied_base, 'floor', applied_floor))")
                  .as("__rngs"),
                flatten(collect_list("applied")).as("__exs"))
              // EVERY row absorbs this batch's id, not only rows the
              // increment touched: the replay guard is zone-level (any
              // row containing b no-ops b), so per-row sets track
              // "batches applied while this row existed" — a group
              // absent from some batches would otherwise accrete one
              // permanent gap-extra per miss until the cap wedged the
              // merge (groups routinely skip batches in real feeds)
              .withColumn("__rngs", concat(
                col("__rngs"),
                array(struct(lit(hwm).as("base"), lit(hwm).as("floor"))))))
      }
      Zones.overwriteSwap(merged.repartition(1), path)
      // single-writer tripwire: our batch id must be visible in the zone we
      // just swapped in; if not, a concurrent writer's swap clobbered ours
      val visible = upgradeGuardSchema(Zones.read(spark, path))
        .agg(coalesce(max(appliedContains(lit(hwm))), lit(false)))
        .head().getBoolean(0)
      if (!visible) throw new IllegalStateException(
        s"stats zone $path: batch $hwm missing immediately after its swap — " +
          "a concurrent writer interleaved (single-writer contract violated); " +
          "the increment was lost and must be re-merged under external serialization")
      true
    }
  }
}
