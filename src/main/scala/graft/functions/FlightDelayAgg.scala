package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-Aggregator replication of the reference reducer's 12-slot
  * accumulator pair (`Float[12]` sums + `Integer[12]` counts,
  * `HCompute/src/main/java/org/northeastern/Main.java:131-146`): one pass
  * per carrier group producing the 12 monthly rounded averages.
  *
  * Spark runs this as a typed ImperativeAggregate with partial merge —
  * strictly better than the reference's combiner-less reduce (SURVEY.md
  * §4). Two variants:
  *  - [[FlightDelayAgg]] accumulates in double — matches SQL `AVG` so it
  *    is DuckDB-oracle-checkable (used by `q_flight_aggregator`).
  *  - [[FlightDelayAggF32]] accumulates in float32 and rounds with
  *    `Math.round(sum/count + 0.5f)` — bit-faithful to the reference
  *    (`...Main.java:140,145`), golden-tested in FlightAggregatorSpec
  *    (float32 ulp at carry boundaries can differ from double math, so it
  *    stays out of the oracle set — SURVEY.md §7.4).
  */
case class MonthDelay(month: Int, delay: Double)

case class DelayBuf(sums: Array[Double], counts: Array[Long])

object FlightDelayAgg extends Aggregator[MonthDelay, DelayBuf, Seq[Int]] {
  override def zero: DelayBuf = DelayBuf(Array.fill(12)(0.0), Array.fill(12)(0L))

  override def reduce(b: DelayBuf, a: MonthDelay): DelayBuf = {
    b.sums(a.month - 1) += a.delay
    b.counts(a.month - 1) += 1
    b
  }

  override def merge(x: DelayBuf, y: DelayBuf): DelayBuf = {
    var i = 0
    while (i < 12) { x.sums(i) += y.sums(i); x.counts(i) += y.counts(i); i += 1 }
    x
  }

  /** floor(avg)+1 per month; empty month → 0 (the reference's NaN →
    * Math.round(NaN+0.5f) == 0 path, `...Main.java:143-146`).
    */
  override def finish(b: DelayBuf): Seq[Int] =
    (0 until 12).map { i =>
      if (b.counts(i) == 0) 0
      else (math.floor(b.sums(i) / b.counts(i)) + 1).toInt
    }

  override def bufferEncoder: Encoder[DelayBuf] = Encoders.product[DelayBuf]
  override def outputEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
}

/** Float32-faithful variant (reference bit-exactness demo; test-only). */
case class DelayBufF32(sums: Array[Float], counts: Array[Int])

object FlightDelayAggF32 extends Aggregator[MonthDelay, DelayBufF32, Seq[Int]] {
  override def zero: DelayBufF32 = DelayBufF32(Array.fill(12)(0.0f), Array.fill(12)(0))

  override def reduce(b: DelayBufF32, a: MonthDelay): DelayBufF32 = {
    b.sums(a.month - 1) += a.delay.toFloat
    b.counts(a.month - 1) += 1
    b
  }

  override def merge(x: DelayBufF32, y: DelayBufF32): DelayBufF32 = {
    var i = 0
    while (i < 12) { x.sums(i) += y.sums(i); x.counts(i) += y.counts(i); i += 1 }
    x
  }

  /** Exactly `Math.round(sum/count + 0.5f)` in float32, including the
    * NaN→0 empty-month behavior (`...Main.java:145`).
    */
  override def finish(b: DelayBufF32): Seq[Int] =
    (0 until 12).map { i =>
      Math.round(b.sums(i) / b.counts(i) + 0.5f)
    }

  override def bufferEncoder: Encoder[DelayBufF32] = Encoders.product[DelayBufF32]
  override def outputEncoder: Encoder[Seq[Int]] = FlightDelayAgg.outputEncoder
}
