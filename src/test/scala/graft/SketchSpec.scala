package graft

import org.apache.spark.sql.functions._

/** Accuracy bound for the sketch aggregates (no cross-engine oracle —
  * sketch layouts are engine-specific, so correctness is an error bound
  * against the exact answer instead).
  */
class SketchSpec extends SparkSpec {
  test("approx_count_distinct stays within 5% of exact at rsd=0.02") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
    val worst = exact.join(approx, "l_returnflag")
      .select((abs(col("approx") - col("exact")) / col("exact")).as("err"))
      .agg(max("err")).head().getDouble(0)
    assert(worst <= 0.05, s"worst relative error $worst")
  }
}
