package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (`Aggregator`) — the engine's extension seam for custom
  * aggregation, mirroring the reference's documented intent that output
  * coercion "is intended to be extended in other applications"
  * (data-table.lisp:440-443). Aggregators merge associatively, so Spark
  * runs them partial→final (map-side combined) like any built-in. */
object Aggregators {

  /** Root-mean-square. Buffer is (count, sum of squares). */
  object Rms extends Aggregator[Double, (Long, Double), Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: Double): (Long, Double) = (b._1 + 1, b._2 + a * a)
    override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) = (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Long, Double)): Double =
      if (b._1 == 0) Double.NaN else math.sqrt(b._2 / b._1)
    override def bufferEncoder: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Geometric mean via mean-of-logs (positive inputs; zeros/negatives are
    * ignored, like the SQL formulation `exp(avg(ln(x)))` with a filter). */
  object GeoMean extends Aggregator[Double, (Long, Double), Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: Double): (Long, Double) =
      if (a > 0.0) (b._1 + 1, b._2 + math.log(a)) else b
    override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) = (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Long, Double)): Double =
      if (b._1 == 0) Double.NaN else math.exp(b._2 / b._1)
    override def bufferEncoder: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
