package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (`Aggregator`) — the engine's extension seam for custom
  * aggregation, mirroring the reference's documented intent that output
  * coercion "is intended to be extended in other applications"
  * (data-table.lisp:440-443). Aggregators merge associatively, so Spark
  * runs them partial→final (map-side combined) like any built-in.
  *
  * Input/output are BOXED doubles: the primitive encoder would silently
  * decode SQL NULL as 0.0 (skewing the aggregate) and cannot return NULL
  * for empty groups — SQL aggregates skip NULLs and yield NULL on empty,
  * and these must match that contract to agree with any SQL oracle. */
object Aggregators {

  /** Root-mean-square. Buffer is (count, sum of squares); NULLs skipped. */
  object Rms extends Aggregator[java.lang.Double, (Long, Double), java.lang.Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: java.lang.Double): (Long, Double) =
      if (a == null) b else (b._1 + 1, b._2 + a * a)
    override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) = (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Long, Double)): java.lang.Double =
      if (b._1 == 0) null else math.sqrt(b._2 / b._1)
    override def bufferEncoder: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Geometric mean via mean-of-logs; NULLs and non-positive inputs are
    * skipped (the SQL formulation `exp(avg(ln(x)) FILTER (WHERE x > 0))`). */
  object GeoMean extends Aggregator[java.lang.Double, (Long, Double), java.lang.Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: java.lang.Double): (Long, Double) =
      if (a == null || a <= 0.0) b else (b._1 + 1, b._2 + math.log(a))
    override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) = (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Long, Double)): java.lang.Double =
      if (b._1 == 0) null else math.exp(b._2 / b._1)
    override def bufferEncoder: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }
}
