package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-diff change data capture: given yesterday's and today's full
  * snapshots of a keyed table, emit the insert/update/delete delta. The
  * reference computes this implicitly inside its SCD procedure (new-key
  * anti join + change-detect join, db_control_sql.sql:210-276); as a
  * standalone operator the delta also feeds incremental rollups, zone
  * upserts and downstream replication — anything that wants "what
  * changed" without re-reading "everything".
  *
  * One full-outer hash join on the key — the minimal shuffle for a diff.
  * Comparisons are null-safe (`<=>`), so NULL→value and value→NULL both
  * count as updates. Unchanged rows are dropped; `insert`/`update` rows
  * carry the NEW values, `delete` rows carry the last-seen OLD values.
  */
object ChangeCapture {

  def snapshotDiff(
      old: DataFrame,
      current: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    // side presence is carried by explicit non-null markers, NOT inferred
    // from key nullness: the join matches on null-safe `<=>`, so a row
    // whose key columns are all NULL still matches its counterpart — key
    // nullness would misread that pair as absent (unchanged NULL-key pair
    // emitted as insert, changed one never classified update/delete)
    val o = old.select((keys ++ compareCols).map(col): _*)
      .withColumn("__o", lit(true)).alias("o")
    val c = current.select((keys ++ compareCols).map(col): _*)
      .withColumn("__c", lit(true)).alias("c")
    val on = keys.map(k => col(s"o.$k") <=> col(s"c.$k")).reduce(_ && _)
    val changed = compareCols.map(cc => !(col(s"o.$cc") <=> col(s"c.$cc")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(col("o.__o").isNull, lit("insert"))
      .when(col("c.__c").isNull, lit("delete"))
      .when(changed, lit("update"))
    o.join(c, on, "full_outer")
      .withColumn("op", op)
      .filter(col("op").isNotNull)
      .select(
        col("op") +:
          keys.map(k => coalesce(col(s"c.$k"), col(s"o.$k")).as(k)) ++:
          compareCols.map(cc =>
            when(col("op") === "delete", col(s"o.$cc")).otherwise(col(s"c.$cc")).as(cc)): _*)
  }
}
