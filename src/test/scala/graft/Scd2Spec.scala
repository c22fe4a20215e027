package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd2
import graft.pipeline.ProductPipeline

/** SCD2 replay + invariants against the reference's live history dump:
  * first run over 239 staged rows must log input 239 / inserted 239 /
  * expired 0 (db_datamart.sql:147) and reproduce PRODUCTS_EXPIRED
  * byte-for-byte (modulo the auto-increment ID_SR).
  */
class Scd2Spec extends SparkSpec {

  private def sentinel = lit(Scd2.SentinelTs).cast("timestamp_ntz")

  test("first run replays the reference dump: 239 in / 239 inserted / 0 expired") {
    val staged = fixture("products_transform").drop("ID_SR")
    val expected = fixture("products_expired").drop("ID_SR")
      .withColumnRenamed("CREATED_AT", "created_at")
      .withColumnRenamed("UPDATED_AT", "updated_at")
      .withColumnRenamed("EXPIRED_AT", "expired_at")
    // the dump batch's CREATED_AT is uniform — use it as the injected runTs
    val runTs = expected.select(max("created_at")).head().getAs[java.time.LocalDateTime](0)
    assert(expected.select("created_at").distinct().count() == 1)

    val (result, stats) = ProductPipeline.scdUpdate(
      Scd2.emptyHistory(staged, "timestamp_ntz"), staged,
      lit(runTs.toString.replace("T", " ")).cast("timestamp_ntz"))
    assert(stats == graft.operators.ScdStats(239, 239, 0), s"stats: $stats")
    assertSameRows(result, expected, "scd2 first run vs products_expired")
  }

  test("second run: changed rows expire + re-insert; key asymmetry preserved") {
    val staged = fixture("products_transform").drop("ID_SR")
    val ts1 = lit("2025-11-23 18:51:37").cast("timestamp_ntz")
    val ts2 = lit("2025-11-24 18:51:37").cast("timestamp_ntz")
    val h1 = Scd2.apply(
      Scd2.emptyHistory(staged, "timestamp_ntz"), staged,
      Seq("TEN"), Seq("TEN", "LINK"), ProductPipeline.scdCompareCols, ts1, sentinel)

    // day 2: 50 price changes, 10 changed rows ALSO change LINK (asymmetry),
    // 5 brand-new names
    val day2 = staged
      .withColumn("GIA_MOI", when(col("ID") <= 50, col("GIA_MOI") + 1000).otherwise(col("GIA_MOI")))
      .withColumn("LINK", when(col("ID") <= 10, concat(col("LINK"), lit("#moved"))).otherwise(col("LINK")))
      .unionByName(staged.filter(col("ID") <= 5)
        .withColumn("TEN", concat(col("TEN"), lit(" (2026)"))))
    val (h2, stats) = Scd2.applyWithStats(
      h1, day2, Seq("TEN"), Seq("TEN", "LINK"), ProductPipeline.scdCompareCols, ts2, sentinel)

    assert(stats.rowsInput == 244)
    // rows 11-50: expired AND re-inserted (LINK unchanged).
    // rows 1-10: changed but LINK moved → expired WITHOUT re-insert (the
    // reference's key-asymmetry quirk, SURVEY §7.4).
    assert(stats.rowsExpired == 50, s"expired: ${stats.rowsExpired}")
    // 5 new names + 40 re-inserts
    assert(stats.rowsInserted == 45, s"inserted: ${stats.rowsInserted}")
    // invariant: ≤1 current row per (TEN, LINK); expired rows keep history
    val dupCurrent = h2.filter(col("expired_at") === sentinel)
      .groupBy("TEN", "LINK").count().filter(col("count") > 1).count()
    assert(dupCurrent == 0)
    assert(h2.count() == 239 + 45)
  }

  test("no-change run is a no-op with zero inserted/expired") {
    val staged = fixture("products_transform").drop("ID_SR")
    val ts1 = lit("2025-11-23 18:51:37").cast("timestamp_ntz")
    val h1 = Scd2.apply(
      Scd2.emptyHistory(staged, "timestamp_ntz"), staged,
      Seq("TEN"), Seq("TEN", "LINK"), ProductPipeline.scdCompareCols, ts1, sentinel)
    val (h2, stats) = Scd2.applyWithStats(
      h1, staged, Seq("TEN"), Seq("TEN", "LINK"), ProductPipeline.scdCompareCols,
      lit("2025-11-24 00:00:00").cast("timestamp_ntz"), sentinel)
    assert(stats.rowsInserted == 0 && stats.rowsExpired == 0)
    assert(h2.count() == h1.count())
  }
}
