package graft

import org.apache.spark.sql.functions._

/** Accuracy bound for the sketch aggregates (no cross-engine oracle —
  * sketch layouts are engine-specific, so correctness is an error bound
  * against the exact answer instead).
  */
class SketchSpec extends SparkSpec {
  test("approx_percentile agrees with exact percentile_disc at high accuracy") {
    val orders = Tables.load(spark, "/root/testdata/sf0.01", "orders")
    // raw sketch values (the a13 gate itself now emits exact quantiles +
    // in-band booleans for the oracle; the numeric bound lives here)
    val approx = orders.groupBy("o_orderpriority")
      .agg(approx_percentile(
        col("o_totalprice"), array(lit(0.5), lit(0.9)), lit(10000)).as("qs"))
      .select(col("o_orderpriority"),
        element_at(col("qs"), 1).as("p50"), element_at(col("qs"), 2).as("p90"))
    val exact = orders.groupBy("o_orderpriority").agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("e50"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("e90"))
    val worst = approx.join(exact, "o_orderpriority")
      .select(greatest(
        abs(col("p50") - col("e50")) / col("e50"),
        abs(col("p90") - col("e90")) / col("e90")).as("err"))
      .agg(max("err")).head().getDouble(0)
    assert(worst <= 0.01, s"worst relative quantile error $worst")
  }

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
