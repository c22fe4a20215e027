package graft

/** Driver-contract smoke: entry() must return rows on sf0.001. */
class EntrySmokeSpec extends SparkSpec {
  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
