package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, distributed surrogate-key assignment.
  *
  * Replaces the reference's per-row lookup-or-insert loop over
  * `lastrowid` (reference: load_dwh.py:18-44,141-227 — one SELECT plus
  * optional INSERT per row, hundreds of client↔server round trips) with a
  * single set-based job: anti-join to find unseen natural keys, then assign
  * `max(existing SK) + rank` where rank comes from a global sort +
  * `zipWithIndex`.
  *
  * Why not `monotonically_increasing_id` — nondeterministic across retries
  * and partition layouts. Why not a `row_number` window — that forces all
  * new keys through ONE partition; sort+zipWithIndex keeps the assignment
  * distributed and still deterministic (total order on the natural key), so
  * it survives a 100× scale-up.
  */
object SurrogateKeys {

  /** Return `dim` (schema: skCol plus naturalKey columns) extended with new
    * deterministic SKs for natural keys present in `incoming` but missing
    * from `dim`.
    */
  def ensureKeys(
      dim: DataFrame,
      incoming: DataFrame,
      naturalKey: Seq[String],
      skCol: String): DataFrame = {
    val spark = dim.sparkSession
    val missing = incoming
      .select(naturalKey.map(col): _*)
      .distinct()
      .join(dim, naturalKey, "left_anti")
      .sort(naturalKey.map(col): _*)
    val maxSk = dim
      .agg(coalesce(max(col(skCol).cast(LongType)), lit(0L)))
      .head().getLong(0)
    val schema = missing.schema.add(skCol, LongType, nullable = false)
    val assigned = spark.createDataFrame(
      missing.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (maxSk + i + 1L))
      },
      schema)
    dim.withColumn(skCol, col(skCol).cast(LongType))
      .unionByName(assigned.select(dim.columns.map(col): _*))
  }
}
