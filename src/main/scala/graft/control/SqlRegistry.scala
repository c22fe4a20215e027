package graft.control

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's metadata-driven SQL execution (SURVEY §3.2): SQL text
  * lives as rows in a registry table (`SQL_COMMANDS`,
  * db_control_sql.sql:157-162) and is installed/executed at run time
  * (transform_staging.py:9-58). Here the registry is a (name → Spark SQL)
  * table and execution is `spark.sql` over registered temp views — no
  * regex extraction / DDL re-parse step, because Spark SQL text needs no
  * server-side installation.
  */
object SqlRegistry {

  /** Load the command registry from a two-column DataFrame
    * (command_name, sql_query) — e.g. a parquet control table.
    */
  def load(registry: DataFrame): Map[String, String] =
    registry
      .select("command_name", "sql_query")
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap

  /** Execute a registered command against the given input views
    * (name → DataFrame, registered as temp views for the call).
    */
  def execute(
      spark: SparkSession,
      commands: Map[String, String],
      name: String,
      views: Map[String, DataFrame]): DataFrame = {
    val sql = commands.getOrElse(
      name, throw new IllegalArgumentException(s"unknown SQL command: $name"))
    views.foreach { case (viewName, df) => df.createOrReplaceTempView(viewName) }
    spark.sql(sql)
  }
}
