package graft

import org.apache.spark.sql.functions._

import graft.pipeline.ProductPipeline

/** Golden test: Clean over the reference's 239 live raw rows must
  * reproduce its PRODUCTS_TRANSFORM dump exactly (FIXTURES.md A1/A2),
  * including the −1 sentinels, SK_DATE=2154 lookup and the deployed SP's
  * integer-only screen-size quirk.
  */
class CleanSpec extends SparkSpec {

  test("clean replays the reference transform dump (239 golden pairs)") {
    val raw = fixture("products_general")
    val dimDate = fixture("dim_date")
    val got = ProductPipeline.clean(raw, dimDate, mysqlCompatScreenSize = true)
    val expected = fixture("products_transform").drop("ID_SR")
    assertSameRows(got, expected, "clean vs products_transform")
  }

  test("edge rows: empty price → -1, RAM holding storage value passes through") {
    val raw = fixture("products_general")
    val dimDate = fixture("dim_date")
    val out = ProductPipeline.clean(raw, dimDate).filter(col("ID").isin(2, 3))
      .select("ID", "GIA_CU", "RAM", "BO_NHO").collect().map(r =>
        (r.getInt(0), r.getDecimal(1).doubleValue(), r.getInt(2), r.getInt(3))).sortBy(_._1)
    // row 2 (db_staging.sql:4374): BO_NHO empty → -1, RAM literally '256 GB'
    assert(out(0) == ((2, 31990000.0, 256, -1)))
    // row 3 (:4375): GIA_CU empty → -1
    assert(out(1)._1 == 3 && out(1)._2 == -1.0)
  }

  test("url normalization: relative links prefixed, absolute kept, empty → Unknown") {
    import spark.implicits._
    val df = Seq(
      ("/p/iphone", "https://site.vn"),
      ("https://cdn.x/y.jpg", "https://site.vn"),
      ("", "https://site.vn")).toDF("link", "base")
    val out = df.select(graft.operators.Clean.normalizeUrl(col("link"), col("base")).as("u"))
      .collect().map(_.getString(0))
    assert(out(0) == "https://site.vn/p/iphone")
    assert(out(1) == "https://cdn.x/y.jpg")
    assert(out(2) == "Unknown")
  }

  test("quality filter drops sub-threshold rows") {
    import spark.implicits._
    val junk = Seq(("x", "y", "z")).toDF("TEN", "LINK", "LINK_ANH")
    assert(junk.filter(graft.operators.Clean.qualityFilter(
      Seq(col("TEN"), col("LINK"), col("LINK_ANH")), 10)).count() == 0)
  }
}
