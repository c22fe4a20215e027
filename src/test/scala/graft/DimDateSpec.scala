package graft

import graft.operators.DimDate

/** Golden test: the generator must reproduce all 4,018 dumped DIM_DATE
  * rows (2020–2030) including Vietnamese labels and the reference's week-0
  * numbering quirk (FIXTURES.md A4).
  */
class DimDateSpec extends SparkSpec {

  test("generate(2020-01-01..2030-12-31) replays the 4018-row dump") {
    val got = DimDate.generate(spark)
    val expected = fixture("dim_date")
    val renamed = got.columns.foldLeft(got)((df, c) => df.withColumnRenamed(c, c.toUpperCase))
    assertSameRows(renamed, expected, "dim_date")
  }
}
