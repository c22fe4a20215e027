package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC zone access — the S3 table-scan variant matching the reference's
  * MySQL reads (crawl.py:275 `SELECT * FROM config`, load_dwh.py:131-135
  * staging reads) and its INSERT-based loads, re-expressed as Spark JDBC
  * relations so predicates/column pruning push INTO the database instead
  * of fetching whole tables row-by-row over a cursor.
  *
  * Scale notes:
  *  - [[read]] is a single-connection scan — correct for dimension-sized
  *    tables (the reference's config/log tables). Catalyst pushes filters
  *    and projections into the generated SQL (`PushedFilters` in the
  *    scan node), so the database does the reduction.
  *  - [[readPartitioned]] is the fact-table path: `numPartitions`
  *    concurrent range-bounded connections (`WHERE key >= l AND key < u`),
  *    one per executor task — without it a 100 TB JDBC read funnels
  *    through one connection on one core.
  *  - writes reuse the zone disciplines: truncate-and-load (S5) via
  *    `truncate=true` overwrite (keeps indexes/DDL, like the reference's
  *    `TRUNCATE TABLE` + INSERT), append (S6) plain. Upsert/insert-ignore
  *    (S7/S8) stay engine-side ([[graft.operators.Upsert]]) — compute the
  *    merged state in Spark, then truncate-load the small result; MySQL's
  *    per-row `ON DUPLICATE KEY UPDATE` does not distribute.
  */
object JdbcSource {

  def props(user: String = "", password: String = "", driver: String = ""): Properties = {
    val p = new Properties()
    if (user.nonEmpty) p.setProperty("user", user)
    if (password.nonEmpty) p.setProperty("password", password)
    if (driver.nonEmpty) p.setProperty("driver", driver)
    p
  }

  /** Whole-table relation (dimension-sized); filters/projection still push
    * down into the database at query time.
    */
  def read(spark: SparkSession, url: String, table: String, connProps: Properties): DataFrame =
    spark.read.jdbc(url, table, connProps)

  /** Range-partitioned parallel read for large tables: `numPartitions`
    * concurrent connections each scanning one stride of
    * [lowerBound, upperBound) on `partitionColumn` (strides are Spark's
    * contract: rows outside the bounds land in the first/last stride, so
    * the union is always the full table).
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      connProps: Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound, numPartitions, connProps)

  /** S5 truncate-and-load into an existing table: TRUNCATE (not DROP — the
    * reference relies on the DDL/keys it created) then batch INSERT.
    */
  def truncateLoad(df: DataFrame, url: String, table: String, connProps: Properties): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("truncate", "true")
      .jdbc(url, table, connProps)

  /** S6 append insert (the reference's daily INSERT INTO ... VALUES loop,
    * batched).
    */
  def append(df: DataFrame, url: String, table: String, connProps: Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, connProps)

  /** Header-intersection load (the CSV ingest compat rule applied to a
    * database table): keep only the columns the target `schema` knows,
    * in its order, so a source table that grew extra columns still loads.
    */
  def readCompat(
      spark: SparkSession,
      url: String,
      table: String,
      connProps: Properties,
      schema: Seq[String]): DataFrame = {
    val src = read(spark, url, table, connProps)
    val have = src.columns.map(c => c.toLowerCase -> c).toMap
    val keep = schema.flatMap(c => have.get(c.toLowerCase))
    src.select(keep.map(src.col): _*)
  }
}
