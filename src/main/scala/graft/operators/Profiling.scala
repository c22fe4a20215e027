package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Landing-zone data profiling: per-column row/null/distinct counts and
  * min/max, the sweep a warehouse runs on every new drop before letting
  * it into staging (the reference eyeballs this by hand in Navicat; here
  * it is an operator).
  *
  * Scale shape: ONE scan of the input computes every column's aggregates
  * in a single aggregation (count/min/max fold map-side; the distinct
  * counts expand-rewrite into one two-phase aggregate), then the stacked
  * long form is #cols selects over that one-row frame — no per-column
  * rescans, which is the difference between profiling 100 TB once and
  * profiling it #cols times.
  *
  * min/max are emitted as strings so heterogeneous column types stack
  * into one frame; numeric strings are each engine's shortest
  * round-trippable form, so they compare exactly.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    // materialize the one-row aggregate: the stacked union below selects
    // from it #cols times, and without truncating lineage each branch
    // would re-run the whole scan+aggregate — #cols scans instead of one
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*).localCheckpoint()
    cols.map { c =>
        one.select(
          lit(c).as("col_name"),
          col("n_rows"),
          (col("n_rows") - col(s"${c}__nn")).as("n_nulls"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__min").as("min_str"),
          col(s"${c}__max").as("max_str"))
      }
      .reduce(_ unionByName _)
  }
}
