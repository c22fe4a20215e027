package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §4 / builder scale notes).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in [[graft.Sessions]]) handles most skew at runtime by
  * splitting oversized partitions. Salting is the static fallback for the
  * pathological case AQE can't fix: ONE join key so hot that a single
  * key's rows exceed an executor (e.g. the 'Unknown'/sentinel key after
  * cleaning, SURVEY §1 sentinel conventions).
  */
object SkewJoin {

  /** Salted inner equi-join, result-identical to `big.join(small, keys)`:
    * the big side gets a deterministic salt in [0, salts) hashed from its
    * whole row; the small side is replicated once per salt value, so every
    * (key, salt) pair finds its match while the hot key's rows spread over
    * `salts` reducers.
    */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0)
    // row-content hash + per-partition row position: IDENTICAL duplicate
    // rows of the hot key still spread across salts (a pure content hash
    // would re-create the single hot reducer for them). The salt value
    // itself is NOT stable across retries/repartitioning
    // (monotonically_increasing_id depends on task placement) — that is
    // fine: it only picks a reducer, and the join RESULT is
    // salt-independent because the small side carries every salt value.
    val saltedBig = big.withColumn(
      "__salt",
      pmod(
        xxhash64(struct(big.columns.map(col): _*)) + monotonically_increasing_id(),
        lit(salts)).cast("int"))
    val repSmall = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(repSmall, keys :+ "__salt")
      .drop("__salt")
  }

  /** Measurement-driven inner equi-join — the consumer of
    * [[Profiling.skewReport]]: the big side's join key is measured (one
    * partial-aggregated counting pass, or a precomputed report row is
    * handed in from a profiling sweep) and the plan is CHOSEN by the
    * measured `skew_ratio` — the plain shuffle join below
    * `ratioThreshold`, [[saltedInnerJoin]] at or above it, with the salt
    * fan-out sized from the measurement itself (≈ the ratio, capped at
    * [[MaxAutoSalts]] — more salts than the hot key's excess spreads
    * nothing extra and multiplies the small side for free). Output is
    * result-identical to `big.join(small, keys)` on EITHER path (the
    * salted join's contract), so the choice is pure plan tuning: measure,
    * don't guess, and let a nightly profile row drive the day's joins.
    */
  def autoJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      ratioThreshold: Double = 4.0,
      report: Option[org.apache.spark.sql.Row] = None,
      salts: Int = 0): DataFrame = {
    require(keys.nonEmpty, "autoJoin needs at least one join key")
    require(ratioThreshold > 1.0, "ratioThreshold must exceed 1 (uniform)")
    // backtick-quote the names (a dotted/reserved-word key must measure
    // the COLUMN, not parse as a struct access or crash in expr()), and
    // measure only rows the join will actually shuffle: an inner
    // equi-join's isnotnull pushdown drops null-key rows before the
    // exchange, so a hot null tuple must not drive the plan choice —
    // with nulls excluded, the concat_ws multi-key image is also
    // collision-free in the way that matters (no null-skip collapse of
    // distinct tuples onto one measured key)
    val quoted = keys.map(k => "`" + k.replace("`", "``") + "`")
    val keyExpr =
      if (keys.length == 1) quoted.head
      else s"concat_ws(char(1), ${quoted.map(q => s"cast($q as string)").mkString(", ")})"
    val r = report
      .orElse {
        val measured = big.filter(quoted.map(q => col(q).isNotNull).reduce(_ && _))
        Profiling.skewReport(measured, keyExpr).collect().headOption
      }
    val ratio = r.map(_.getAs[Double]("skew_ratio")).getOrElse(0.0)
    if (ratio < ratioThreshold) big.join(small, keys)
    else {
      val n = if (salts > 0) salts
        else math.min(MaxAutoSalts, math.max(2, math.ceil(ratio).toInt))
      saltedInnerJoin(big, small, keys, n)
    }
  }

  /** Auto-sized salt cap: past this the hot key is already spread over
    * enough reducers that scheduling variance dominates, and every salt
    * replicates the small side once more.
    */
  val MaxAutoSalts = 32

  /** Skewed-aggregate two-phase rollup: partial aggregate on (keys, salt)
    * then final on keys — the map-side-combine pattern made explicit for
    * aggregates Spark can't partially aggregate (e.g. collect-like).
    * `agg1` must be decomposable: agg2(agg1 per salt) == agg(all).
    */
  def twoPhaseAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      agg1: Seq[Column],
      agg2: Seq[Column]): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)).cast("int"))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(agg1.head, agg1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(agg2.head, agg2.tail: _*)
  }
}
