package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge primitives over immutable storage.
  *
  * Spark has no in-place UPDATE, so both MySQL upsert idioms in the
  * reference become anti-join + union followed by an atomic overwrite of
  * the target:
  *   - `INSERT ... ON DUPLICATE KEY UPDATE` (daily AGGREGATE snapshot,
  *     reference: load_aggregate.py:90-107) → [[upsert]]
  *   - `INSERT IGNORE ... SELECT` (DIM_DATE copy skipping duplicate dates,
  *     reference: sql_script/db_staging_sql.sql:94-96) → [[insertIgnore]]
  *
  * Scale notes: both are a single shuffle on the key. When `updates` is a
  * daily increment it is far smaller than `target`, so AQE turns the anti
  * join into a broadcast. For a partitioned target table, pair with
  * dynamic partition overwrite so only touched partitions rewrite.
  */
object Upsert {

  /** New version wins: rows of `target` whose key appears in `updates` are
    * replaced; all `updates` rows are kept.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target
      .join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates)

  /** Existing version wins: `incoming` rows whose key already exists in
    * `target` are dropped (MySQL INSERT IGNORE). Duplicate keys inside
    * `incoming` are collapsed deterministically (first row under a total
    * sort of the non-key columns — MySQL keeps first-arrival, which has no
    * distributed analog, so we pin a deterministic order instead).
    */
  def insertIgnore(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKey = incoming.columns.filterNot(keys.contains)
    val fresh0 = incoming.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val fresh =
      if (nonKey.isEmpty) fresh0.distinct()
      else {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(nonKey.map(col): _*)
        fresh0
          .withColumn("__ii_rn", row_number().over(w))
          .filter(col("__ii_rn") === 1)
          .drop("__ii_rn")
      }
    target.unionByName(fresh)
  }
}
