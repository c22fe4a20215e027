package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** AS-OF direction semantics: inclusivity at equal timestamps, no-match
  * nulls, and deterministic tie-breaks on duplicate right timestamps.
  */
class TemporalJoinsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofBackward takes latest ≤, inclusive, null when nothing precedes") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 12:00:00")),
      (2L, 20L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0, 100L), // equal ts → matches backward
      (1L, ts("2024-01-01 11:00:00"), 7.0, 101L),
      (2L, ts("2024-01-01 09:30:00"), 9.0, 102L)) // after left 09:00 → no match
      .toDF("user_id", "ts", "value", "event_id")
    val out = TemporalJoins.asofBackward(
      left, right, Seq("user_id"), "ts", "ts", Seq("value"), Some("event_id"))
      .select(col("event_id"), col("asof").getField("value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L).contains(5.0), "equal timestamp must match (inclusive)")
    assert(out(11L).contains(7.0), "latest preceding wins")
    assert(out(20L).isEmpty, "nothing at-or-before → null")
  }

  test("asofForward takes earliest ≥, inclusive, null when nothing follows") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 12:00:00")),
      (2L, 20L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0, 100L), // equal ts → matches forward
      (1L, ts("2024-01-01 11:00:00"), 7.0, 101L), // not reached by 12:00 left
      (2L, ts("2024-01-01 08:00:00"), 9.0, 102L)) // before left 09:00 → no match
      .toDF("user_id", "ts", "value", "event_id")
    val out = TemporalJoins.asofForward(
      left, right, Seq("user_id"), "ts", "ts", Seq("value"), Some("event_id"))
      .select(col("event_id"), col("asof").getField("value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L).contains(5.0), "equal timestamp must match (inclusive)")
    assert(out(11L).isEmpty, "nothing at-or-after → null")
    assert(out(20L).isEmpty, "earlier right rows don't match forward")
  }

  test("duplicate right timestamps: backward takes highest order, forward lowest") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 100L),
      (1L, ts("2024-01-01 10:00:00"), 2.0, 101L))
      .toDF("user_id", "ts", "value", "event_id")
    val b = TemporalJoins.asofBackward(
      left, right, Seq("user_id"), "ts", "ts", Seq("value"), Some("event_id"))
      .select(col("asof").getField("value")).head().getDouble(0)
    val f = TemporalJoins.asofForward(
      left, right, Seq("user_id"), "ts", "ts", Seq("value"), Some("event_id"))
      .select(col("asof").getField("value")).head().getDouble(0)
    assert(b == 2.0, "backward carries the last (highest-order) equal-ts row")
    assert(f == 1.0, "forward takes the first (lowest-order) equal-ts row")
  }

  test("asofNearest picks the closer side; equidistant → backward; one-sided falls through") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // back 1h, fwd 2h   → backward
      (1L, 11L, ts("2024-01-01 11:30:00")), // back 2.5h, fwd 0.5h → forward
      (1L, 12L, ts("2024-01-01 10:30:00")), // 1.5h both sides   → backward (tie)
      (2L, 20L, ts("2024-01-01 09:00:00")), // only a later right → forward
      (3L, 30L, ts("2024-01-01 09:00:00"))) // no right at all   → null
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1.0, 100L),
      (1L, ts("2024-01-01 12:00:00"), 2.0, 101L),
      (2L, ts("2024-01-01 10:00:00"), 3.0, 102L))
      .toDF("user_id", "ts", "value", "event_id")
    val out = TemporalJoins.asofNearest(
      left, right, Seq("user_id"), "event_id", "ts", "ts", Seq("value"), Some("event_id"))
      .select(col("event_id"), col("asof").getField("value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L).contains(1.0), "closer backward match wins")
    assert(out(11L).contains(2.0), "closer forward match wins")
    assert(out(12L).contains(1.0), "equidistant resolves backward")
    assert(out(20L).contains(3.0), "backward-missing falls through to forward")
    assert(out(30L).isEmpty, "no match either side → null")
  }
}
