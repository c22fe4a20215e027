package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Run statistics mirroring the reference SP's OUT params
  * (reference: sql_script/db_control_sql.sql:213-216).
  */
final case class ScdStats(rowsInput: Long, rowsInserted: Long, rowsExpired: Long)

/** Slowly-Changing-Dimension Type 2 as a single set-based Spark job.
  *
  * Re-expresses `SP_ETL_SCD_Update_Product`
  * (reference: sql_script/db_control_sql.sql:210-276), which runs four
  * statements against MySQL:
  *   1. insert brand-new keys (left join + IS NULL — an anti join;
  *      new-key detection is on `matchKey` only, reference :228-236)
  *   2. materialize EXPIRED_KEYS = current rows whose compared attributes
  *      differ from staging (`<>` — NULL-rejecting; reference :240-252)
  *   3. expire current rows whose `expireKey` hits EXPIRED_KEYS (:254-257)
  *   4. re-insert staging rows whose `expireKey` hits EXPIRED_KEYS (:261-273)
  *
  * Faithfully preserved quirks:
  *   - key asymmetry: new-key detection on `matchKey` (TEN) but
  *     expire/re-insert on `expireKey` (TEN, LINK) — a changed row whose
  *     LINK also changed is expired but NOT re-inserted.
  *   - MySQL `<>` NULL semantics: a NULL on either side never marks a
  *     change (Spark `=!=` matches).
  *   - the "current row" marker is the literal timestamp 9999-12-31 00:00:00.
  *
  * Scale notes: `changedKeys` is the deliberate common-subexpression the
  * reference materializes as a work table — we cache it, it is consumed by
  * both the expire-mark join and the re-insert semi join. The expire-mark
  * join keys on `expireKey`, so at 100 TB it shuffles history once on the
  * natural key; daily change sets are typically small relative to history,
  * so Spark will broadcast them under AQE.
  */
object Scd2 {
  val CreatedAt = "created_at"
  val UpdatedAt = "updated_at"
  val ExpiredAt = "expired_at"
  val SentinelTs = "9999-12-31 00:00:00"

  private def currentPred(sentinel: Column): Column = col(ExpiredAt) === sentinel

  /** Empty history frame shaped for `staging` (first run). */
  def emptyHistory(staging: DataFrame, tsType: String = "timestamp"): DataFrame =
    staging
      .limit(0)
      .withColumn(CreatedAt, lit(null).cast(tsType))
      .withColumn(UpdatedAt, lit(null).cast(tsType))
      .withColumn(ExpiredAt, lit(null).cast(tsType))

  /** Apply one SCD2 round. `history` must carry `staging`'s columns plus
    * created_at/updated_at/expired_at; pass an empty frame (with schema)
    * for the first run. Returns the new history.
    */
  def apply(
      history: DataFrame,
      staging: DataFrame,
      matchKey: Seq[String],
      expireKey: Seq[String],
      compareCols: Seq[String],
      runTs: Column,
      sentinel: Column = lit(SentinelTs).cast("timestamp")): DataFrame = {
    val current = history.filter(currentPred(sentinel))

    // 1. brand-new keys: staging anti-join current on matchKey
    val newRows = staging
      .join(current.select(matchKey.map(col): _*).distinct(), matchKey, "left_anti")
      .withColumn(CreatedAt, runTs)
      .withColumn(UpdatedAt, runTs)
      .withColumn(ExpiredAt, sentinel)

    // 2. EXPIRED_KEYS: current×staging on matchKey where any compared attr
    //    differs (NULL-rejecting <>). Cached: consumed by steps 3 and 4.
    val t = current.alias("t")
    val s = staging.alias("s")
    val changedKeys = t
      .join(s, matchKey.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _))
      .where(compareCols.map(c => col(s"t.$c") =!= col(s"s.$c")).reduce(_ || _))
      .select(expireKey.map(k => col(s"t.$k")): _*)
      .distinct()
      .cache()

    // 3. expire: mark current rows whose expireKey is in changedKeys
    val hit = changedKeys.withColumn("__scd_hit", lit(true))
    val isExpiring = col("__scd_hit").isNotNull && currentPred(sentinel)
    val marked = history
      .join(hit, expireKey, "left")
      .withColumn(UpdatedAt, when(isExpiring, runTs).otherwise(col(UpdatedAt)))
      .withColumn(ExpiredAt, when(isExpiring, runTs).otherwise(col(ExpiredAt)))
      .drop("__scd_hit")

    // 4. re-insert: staging rows whose expireKey is in changedKeys
    val reinserted = staging
      .join(changedKeys, expireKey, "left_semi")
      .withColumn(CreatedAt, runTs)
      .withColumn(UpdatedAt, runTs)
      .withColumn(ExpiredAt, sentinel)

    marked.unionByName(newRows).unionByName(reinserted)
  }

  /** Same as `apply`, also computing the reference's OUT-param counts
    * (rowsInput / rowsInserted / rowsExpired). Triggers extra jobs.
    */
  def applyWithStats(
      history: DataFrame,
      staging: DataFrame,
      matchKey: Seq[String],
      expireKey: Seq[String],
      compareCols: Seq[String],
      runTs: Column,
      sentinel: Column = lit(SentinelTs).cast("timestamp")): (DataFrame, ScdStats) = {
    val cachedStaging = staging.cache()
    val result = apply(history, cachedStaging, matchKey, expireKey, compareCols, runTs, sentinel)
    val rowsInput = cachedStaging.count()
    // inserted = rows carrying this run's created_at; expired = rows newly
    // closed with this run's expired_at — identical to the SPs ROW_COUNT()s.
    val cachedResult = result.cache()
    val rowsInserted = cachedResult.filter(col(CreatedAt) === runTs).count()
    val rowsExpired = cachedResult.filter(col(ExpiredAt) === runTs).count()
    (cachedResult, ScdStats(rowsInput, rowsInserted, rowsExpired))
  }
}
