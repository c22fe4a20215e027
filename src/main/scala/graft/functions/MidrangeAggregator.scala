package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate: the reference's midrange-"AVG"
  * ((max+min)/2, load_datamart.py:128) as a single-pass Aggregator —
  * one (min,max) buffer per group instead of two separate min/max
  * aggregates, and a demonstration of the typed Aggregator/udaf surface.
  * Register per session: `spark.udf.register("midrange", udaf(Midrange))`.
  */
object Midrange extends Aggregator[Double, (Double, Double), Double] {
  override def zero: (Double, Double) = (Double.PositiveInfinity, Double.NegativeInfinity)

  override def reduce(b: (Double, Double), x: Double): (Double, Double) =
    (math.min(b._1, x), math.max(b._2, x))

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (math.min(a._1, b._1), math.max(a._2, b._2))

  override def finish(b: (Double, Double)): Double =
    if (b._1 > b._2) Double.NaN else (b._2 + b._1) / 2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
