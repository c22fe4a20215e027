package graft.control

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** Control-plane run ledger replicating the reference's PROCESS /
  * PROCESS_LOG gating (db_control_sql.sql:134-154; check_status.py;
  * load_dwh.py:56-76): idempotency ("already ran today?") and
  * mutual-exclusion ("anything RUNNING?") checks over a small parquet
  * table instead of MySQL status rows.
  *
  * The reference's check-after-self-register livelock
  * (transform_staging.py:152-162 — two simultaneous starts can both see
  * the other and park as WAITING) is deliberately NOT reproduced: gates
  * here are evaluated BEFORE registering the new run.
  */
object RunLedger {

  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("process_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("start_time", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("end_time", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("status", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("message", org.apache.spark.sql.types.StringType)))

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** A1 gate — "did this process already SUCCEED today?"
    * (check_status.py:19-30: STATUS='SUCCESS' AND DATE(START_TIME)=CURDATE).
    */
  def ranToday(ledger: DataFrame, processName: String, today: String): Boolean =
    !ledger.filter(
      col("process_name") === processName &&
        col("status") === "SUCCESS" &&
        to_date(col("start_time")) === lit(today).cast("date"))
      .isEmpty

  /** A1 gate — "is any run of this process still RUNNING?"
    * (load_dwh.py:56-76: STATUS='RUNNING' AND END_TIME IS NULL).
    */
  def anyRunning(ledger: DataFrame, processName: String): Boolean =
    !ledger.filter(
      col("process_name") === processName &&
        col("status") === "RUNNING" && col("end_time").isNull)
      .isEmpty

  /** Stale-aware mutual-exclusion gate: RUNNING rows whose start_time is
    * more than `staleHours` before `nowTs` no longer block. A hard-killed
    * JVM (no chance to write its FAILED row) must not deadlock the daily
    * gate forever.
    */
  def anyRunning(ledger: DataFrame, processName: String, nowTs: String, staleHours: Int): Boolean =
    !ledger.filter(
      col("process_name") === processName &&
        col("status") === "RUNNING" && col("end_time").isNull &&
        col("start_time") > lit(nowTs).cast("timestamp") - expr(s"INTERVAL $staleHours HOURS"))
      .isEmpty

  /** Register a RUNNING row with the next deterministic id. */
  def startRun(ledger: DataFrame, processName: String, runTs: String): (DataFrame, Long) = {
    val nextId = ledger.agg(coalesce(max(col("id")), lit(0L))).head().getLong(0) + 1
    val row = ledger.sparkSession.range(1).select(
      lit(nextId).as("id"),
      lit(processName).as("process_name"),
      lit(runTs).cast("timestamp").as("start_time"),
      lit(null).cast("timestamp").as("end_time"),
      lit("RUNNING").as("status"),
      lit(null).cast("string").as("message"))
    (ledger.unionByName(row), nextId)
  }

  /** The reference SP's exact SUCCESS message format
    * (db_control_sql.sql:279-307) — shared so callers composing a longer
    * message (e.g. the daily pipeline appending a quarantine report)
    * keep the verbatim prefix the sp3 gate checks.
    */
  def statsMessage(s: graft.operators.ScdStats): String =
    s"SCD Type 2 completed successfully. Rows Processed: ${s.rowsInput}. " +
      s"New Rows Inserted: ${s.rowsInserted}. Old Rows Expired (Updated): ${s.rowsExpired}."

  /** Close a run: SP_ETL_Update_Log_Status semantics — format the SCD2
    * stats message and update the row (db_control_sql.sql:279-307).
    */
  def finishRun(
      ledger: DataFrame,
      id: Long,
      status: String,
      endTs: String,
      stats: Option[graft.operators.ScdStats] = None,
      messageOverride: Option[String] = None): DataFrame = {
    val message = stats.map(statsMessage)
      .orElse(messageOverride)
      .getOrElse(status)
    val updated = ledger.filter(col("id") === id)
      .withColumn("end_time", lit(endTs).cast("timestamp"))
      .withColumn("status", lit(status))
      .withColumn("message", lit(message))
    Upsert.upsert(ledger, updated, Seq("id"))
  }
}
