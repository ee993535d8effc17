package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed user-defined aggregators (`Aggregator[IN, BUF, OUT]` — the
  * Dataset-native UDAF surface; register with `functions.udaf`).
  *
  * SumOfSquares is intentionally exact on integer-valued doubles (every
  * partial sum is an integer < 2^53), so partial/merge order cannot change
  * the result and the DuckDB oracle `sum(x*x)` matches bit-for-bit —
  * a UDAF whose distributed merge tree is provably order-insensitive.
  */
object Aggregators {

  object SumOfSquares extends Aggregator[Double, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(b: Double, a: Double): Double = b + a * a
    override def merge(b1: Double, b2: Double): Double = b1 + b2
    override def finish(r: Double): Double = r
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
