package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's built-ins don't provide directly —
  * composed from union + window / binned equi-joins per the builder's
  * preference order (compose existing ops before custom plans), so
  * Catalyst still owns the physical strategy.
  */
object TemporalJoins {

  /** Backward-inclusive AS-OF join: each left row picks the LATEST right
    * row with rightTime ≤ leftTime for the same key (the classic
    * quote-to-trade / last-known-state join; DuckDB `ASOF LEFT JOIN`
    * semantics). No match → null payload.
    *
    * Implementation: tag + union both sides, one window sorted by
    * (time, side) per key carrying the last non-null payload forward —
    * ONE shuffle on the key, O(n log n) in partition size, no
    * inequality-join nested loop. Equal timestamps resolve to the right
    * row (right sorts before left), and duplicate right timestamps
    * resolve to the highest `rightOrder` value.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      rightOrder: Option[String] = None): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val ord = rightOrder.map(col).getOrElse(lit(0))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"), ord.as("__ord"),
        payload.as("__payload")): _*)
    val leftCols = left.columns
    val l = left.select(
      col("*"),
      col(leftTime).as("__t"), lit(1).as("__side"), lit(0).as("__ord"),
      lit(null).cast(r.schema("__payload").dataType).as("__payload"))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+ col("__carried").as("asof"): _*)
  }

  /** Forward-inclusive AS-OF join: each left row picks the EARLIEST right
    * row with rightTime ≥ leftTime for the same key (next-event lookup —
    * e.g. "first purchase after this impression"). Mirror of
    * [[asofBackward]]: same one-shuffle union + window, but the frame
    * looks forward and left sorts before right at equal timestamps so
    * same-instant right rows still match. Duplicate right timestamps
    * resolve to the LOWEST `rightOrder` value.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      rightOrder: Option[String] = None): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val ord = rightOrder.map(col).getOrElse(lit(0))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(1).as("__side"), ord.as("__ord"),
        payload.as("__payload")): _*)
    val leftCols = left.columns
    val l = left.select(
      col("*"),
      col(leftTime).as("__t"), lit(0).as("__side"), lit(0).as("__ord"),
      lit(null).cast(r.schema("__payload").dataType).as("__payload"))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__carried", first(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) :+ col("__carried").as("asof"): _*)
  }

  /** Nearest AS-OF join: each left row picks the right row minimizing
    * |rightTime − leftTime| within its key (ties → the backward match —
    * "the state that was already true" beats "the one about to happen").
    * Composed from one backward + one forward pass hash-joined back on
    * `leftId` (a unique left key): two window shuffles + one equi-join,
    * still no inequality nested loop anywhere.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftId: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      rightOrder: Option[String] = None): DataFrame = {
    // the matched right time rides inside the payload so the distance
    // compare can read it back out
    val withT = (rightTime +: payloadCols).distinct
    val b = asofBackward(left, right, keys, leftTime, rightTime, withT, rightOrder)
      .withColumnRenamed("asof", "__b")
    val f = asofForward(
        left.select((leftId +: keys :+ leftTime).distinct.map(col): _*),
        right, keys, leftTime, rightTime, withT, rightOrder)
      .select(col(leftId), col("asof").as("__f"))
    val lUs = unix_micros(col(leftTime).cast("timestamp"))
    val bUs = unix_micros(col("__b").getField(rightTime).cast("timestamp"))
    val fUs = unix_micros(col("__f").getField(rightTime).cast("timestamp"))
    b.join(f, Seq(leftId))
      .withColumn("asof",
        when(col("__f").isNull, col("__b"))
          .when(col("__b").isNull, col("__f"))
          .when(lUs - bUs <= fUs - lUs, col("__b"))
          .otherwise(col("__f")))
      .drop("__b", "__f")
  }

  /** Point-in-interval range join via binning: `points.t ∈ [start, end]`
    * (inclusive) matched through an equi-join on bin index — intervals
    * explode to the bins they cover, points land in one bin, the residual
    * predicate finishes exactly. Replaces the nested-loop inequality join
    * Spark would otherwise plan; cost is O(intervals × spanBins + points)
    * through one hash shuffle. Choose `binWidth` ≈ typical interval length
    * so spans cover O(1) bins.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val binned = intervals.withColumn(
      "__bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    p.join(binned, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
