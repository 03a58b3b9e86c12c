package graft

import graft.operators.HistogramQuantile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Differential spec for the distributed histogram quantile: the operator
  * replaces Spark's buffering `percentile` aggregate, so the oracle here IS
  * `percentile` on the same data (safe to buffer at spec scale). Spark
  * interpolates as lo·(1−f) + hi·f while this operator (like DuckDB's
  * quantile_cont, whose results the driver oracle hashes) computes
  * lo + f·(hi−lo) — algebraically equal, so comparisons allow a few ulps. */

class HistogramQuantileSpec extends SparkSpec {

  private val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)

  test("matches Spark percentile within ulps on testdata event cents") {
    val ev = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .where(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), round(col("value") * 100).cast(LongType).as("cents"))
    val got = HistogramQuantile.quantiles(ev, Seq("event_type"), "cents", ps, scale = 100.0)
      .orderBy(col("event_type")).collect()
    val want = ev.groupBy(col("event_type"))
      .agg(expr(s"percentile(cents / 100.0, array(${ps.mkString(",")}))").as("q"))
      .orderBy(col("event_type")).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      val qs = w.getSeq[Double](1)
      ps.indices.foreach { i =>
        val v = g.getDouble(g.fieldIndex(s"q_$i"))
        assert(math.abs(v - qs(i)) <= math.max(math.abs(qs(i)), 1.0) * 1e-12,
          s"${g.get(0)} p=${ps(i)}: got $v, want ${qs(i)}")
      }
    }
  }

  test("edge shapes: single-value group, two values, heavy ties") {
    import spark.implicits._
    val df = (Seq(("solo", 7L)) ++
      Seq(("pair", 1L), ("pair", 3L)) ++
      (1 to 50).map(_ => ("ties", 5L)) ++ Seq(("ties", 10L))).toDF("g", "v")
    val got = HistogramQuantile.quantiles(df, Seq("g"), "v", ps)
      .orderBy(col("g")).collect().map(r =>
        r.getString(0) -> ps.indices.map(i => r.getDouble(r.fieldIndex(s"q_$i"))))
      .toMap
    val want = df.groupBy(col("g"))
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("q"))
      .orderBy(col("g")).collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    got.foreach { case (g, qs) =>
      qs.zip(want(g)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= math.max(math.abs(b), 1.0) * 1e-12, s"$g: $qs vs ${want(g)}")
      }
    }
    // selection sanity on the solo group: every quantile is the value itself
    assert(got("solo").forall(_ == 7.0))
  }

  test("null values are ignored like percentile ignores them") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(3L))).toDF("g", "v")
    val got = HistogramQuantile.quantiles(df, Seq("g"), "v", Seq(0.5)).collect().head
    assert(got.getLong(got.fieldIndex("n")) == 2L)
    assert(got.getDouble(got.fieldIndex("q_0")) == 2.0) // interpolated between 1 and 3
  }
}
