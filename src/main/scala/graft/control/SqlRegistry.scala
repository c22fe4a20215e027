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

  /** A procedure extracted from a registry row: declared name + the
    * executable body between BEGIN and END$$.
    */
  final case class Procedure(name: String, body: String)

  // transform_staging.py:45 — the DELIMITER-wrapped procedure block the
  // reference regex-extracts from each SQL_COMMANDS row
  private val ProcedureBlock =
    """(?is)\b(CREATE\s+(?:OR\s+REPLACE\s+)?PROCEDURE\s+([A-Za-z0-9_]+)\b.*?END\s*\$\$)""".r

  private val BeginBody = """(?is)\bBEGIN\b(.*)\bEND\s*\$\$\s*$""".r

  /** The reference's runtime procedure-install step
    * (transform_staging.py:24-58): each SQL_COMMANDS row holds a
    * `DELIMITER $$ … CREATE PROCEDURE <name> … END$$ …` blob; at run
    * time the `CREATE PROCEDURE…END$$` block is regex-extracted,
    * non-printable characters are collapsed to spaces (the reference's
    * `re.sub(r'[^\x20-\x7E\t\n\r]+', ' ', …)` — fidelity kept even
    * though it is lossy for non-ASCII literals), and the procedure is
    * (re)installed under its declared name. Rows without a procedure
    * block (plain DML commands) are not procedures and are skipped.
    */
  def extractProcedure(sqlText: String): Option[Procedure] =
    ProcedureBlock.findFirstMatchIn(sqlText).map { m =>
      val cleaned = m.group(1).replaceAll("""[^\x20-\x7E\t\n\r]+""", " ").trim
      val body = BeginBody.findFirstMatchIn(cleaned)
        .map(_.group(1).trim.stripSuffix(";"))
        .getOrElse(cleaned)
      Procedure(m.group(2).toUpperCase, body)
    }

  /** Install every procedure found in the registry. Installing under an
    * already-taken name replaces the previous definition — the analog of
    * the reference's `DROP PROCEDURE IF EXISTS` + re-CREATE
    * (transform_staging.py:31,52).
    */
  def installProcedures(commands: Map[String, String]): Map[String, Procedure] =
    commands.values.flatMap(extractProcedure).map(p => p.name -> p).toMap

  /** Run an installed procedure body as Spark SQL over the given views
    * (the engine-side analog of `cursor.callproc`). Statement lists are
    * out of scope — the body must be a single query; multi-statement
    * reference procedures (TRUNCATE + INSERT…SELECT) are modeled by the
    * dedicated operators (Zones.overwriteSwap + the pipeline SELECTs).
    */
  def callProcedure(
      spark: SparkSession,
      procedures: Map[String, Procedure],
      name: String,
      views: Map[String, DataFrame]): DataFrame = {
    val proc = procedures.getOrElse(
      name.toUpperCase, throw new IllegalArgumentException(s"unknown procedure: $name"))
    views.foreach { case (viewName, df) => df.createOrReplaceTempView(viewName) }
    spark.sql(proc.body)
  }
}
