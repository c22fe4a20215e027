package graft.control

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Upsert

/** Crawl-side control metadata replicating the reference's `CONFIG`
  * selector table and `crawl_log` ledger
  * (db_control_sql.sql:10-30,353-364; crawl.py:60-106,275-301).
  *
  * The crawl itself (Selenium) is out of engine scope — SURVEY §2.1 —
  * but its control plane is not: the loaders carry a per-site
  * `ID_CONFIG` lineage column that originates here, and the daily crawl
  * is gated on "does every config row already have a SUCCESS crawl_log
  * entry today?" (crawl.py:284-295). Both are plain DataFrame ops over
  * two small control tables; at scale these stay driver-light (the
  * config table is tiny and broadcast into any lineage join).
  */
object CrawlMeta {

  /** `CONFIG` (db_control_sql.sql:10-30): one row per crawled site —
    * identity (TEN/URL/DATE_CONFIG) plus the per-field CSS selector
    * columns, modeled as a map rather than 15 fixed TEXT columns so new
    * selectors don't need a schema change.
    */
  val configSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("site_name", StringType),
    StructField("url", StringType),
    StructField("date_config", DateType),
    StructField("selectors", MapType(StringType, StringType))))

  /** `crawl_log` (db_control_sql.sql:353-364). */
  val logSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("id_config", LongType),
    StructField("run_date", TimestampType),
    StructField("status", StringType),
    StructField("file_path", StringType),
    StructField("site_name", StringType),
    StructField("rows_affected", IntegerType),
    StructField("error_message", StringType)))

  def emptyLog(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logSchema)

  /** Config rows with no SUCCESS crawl_log entry today — the "sites
    * still needing a crawl" set (crawl.py:284-291: per-config
    * `SELECT ID FROM crawl_log WHERE ID_CONFIG=? AND STATUS='SUCCESS'
    * AND DATE(RUN_DATE)=CURDATE()`, re-expressed as one anti join
    * instead of the reference's N+1 point lookups).
    */
  def sitesNeedingCrawl(config: DataFrame, crawlLog: DataFrame, today: String): DataFrame = {
    val doneToday = crawlLog.filter(
      col("status") === "SUCCESS" &&
        to_date(col("run_date")) === lit(today).cast("date"))
      .select(col("id_config").as("done_id"))
    config.join(broadcast(doneToday), col("id") === col("done_id"), "left_anti")
  }

  /** The whole-run early exit (crawl.py:292-295): nothing left to crawl
    * today → keep the landed CSVs and stop.
    */
  def allCrawledToday(config: DataFrame, crawlLog: DataFrame, today: String): Boolean =
    sitesNeedingCrawl(config, crawlLog, today).isEmpty

  /** Per-site RUNNING skip + RUNNING-row registration (crawl.py:60-87):
    * a site already RUNNING today is skipped (returns None); otherwise a
    * new RUNNING row with the next deterministic id is appended.
    */
  def startCrawl(
      crawlLog: DataFrame,
      idConfig: Long,
      siteName: String,
      runTs: String): (DataFrame, Option[Long]) = {
    val runningToday = !crawlLog.filter(
      col("id_config") === idConfig && col("status") === "RUNNING" &&
        to_date(col("run_date")) === to_date(lit(runTs).cast("timestamp")))
      .isEmpty
    if (runningToday) (crawlLog, None)
    else {
      val nextId = crawlLog.agg(coalesce(max(col("id")), lit(0L))).head().getLong(0) + 1
      val row = crawlLog.sparkSession.range(1).select(
        lit(nextId).as("id"),
        lit(idConfig).as("id_config"),
        lit(runTs).cast("timestamp").as("run_date"),
        lit("RUNNING").as("status"),
        lit(null).cast("string").as("file_path"),
        lit(siteName).as("site_name"),
        lit(null).cast("int").as("rows_affected"),
        lit(null).cast("string").as("error_message"))
      (crawlLog.unionByName(row), Some(nextId))
    }
  }

  /** Close a crawl attempt (crawl.py:93-106): update STATUS, FILE_PATH,
    * ROWS_AFFECTED and ERROR_MESSAGE on the row by id.
    */
  def finishCrawl(
      crawlLog: DataFrame,
      logId: Long,
      status: String,
      filePath: Option[String],
      rows: Int,
      errorMsg: Option[String]): DataFrame = {
    val updated = crawlLog.filter(col("id") === logId)
      .withColumn("status", lit(status))
      .withColumn("file_path", filePath.map(lit(_)).getOrElse(lit(null).cast("string")))
      .withColumn("rows_affected", lit(rows))
      .withColumn("error_message", errorMsg.map(lit(_)).getOrElse(lit(null).cast("string")))
    Upsert.upsert(crawlLog, updated, Seq("id"))
  }

  /** Attach the per-site `ID_CONFIG` lineage the loaders carry
    * (crawl.py writes it into every CSV row; db_etl.py propagates it
    * through staging): a broadcast left join from the landed frame's
    * site column to the config table, sentinel -1 for unknown sites
    * (same convention as the reference's IFNULL(...,-1) lookups).
    */
  def withConfigLineage(landed: DataFrame, config: DataFrame, siteCol: String): DataFrame =
    landed
      .join(
        broadcast(config.select(col("id").as("cfg_id"), col("site_name").as("cfg_site"))),
        col(siteCol) === col("cfg_site"), "left")
      .withColumn("id_config", coalesce(col("cfg_id"), lit(-1L)))
      .drop("cfg_id", "cfg_site")
}
