package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact interpolated (R-7 / `quantile_cont`) per-group quantiles WITHOUT
  * buffering group values — the scale-correct replacement for Spark's
  * `percentile` aggregate, which holds every value of a group in one
  * ObjectHashAggregate buffer (with few groups, that is the corpus on one
  * executor; see BASELINE.md's 100 TB rules).
  *
  * Requires a DISCRETE value domain (pass values recast to integer cents /
  * micros / bucket ids): the corpus collapses map-side to a (group, value)
  * count histogram, a cumulative window runs OVER THE HISTOGRAM (sorts
  * ~|domain| rows per group, never the corpus), and one more per-group
  * aggregate picks + interpolates the R-7 neighbours. Three exchanges
  * total, all histogram-sized; every shape is partial-aggregable, so it
  * holds on 1000 executors.
  *
  * The sibling [[DiscreteQuantile]] is the driver-math form (collect the
  * histogram, compute locally) — right when the histogram must feed literal
  * thresholds back into a filter (outlier_mad, winsorize). This one stays
  * fully distributed — right when the quantiles ARE the output.
  */
object HistogramQuantile {

  /** Per-group R-7 quantiles of `valueCol` (must be integral-typed).
    * Output: one row per group with `q_<i>` columns (doubles, in `ps`
    * order) scaled back by `scale` (e.g. cents → dollars with scale=100).
    * The interpolation arithmetic mirrors Spark's `percentile` and
    * DuckDB's `quantile_cont` exactly: lo + f·(hi − lo) on value/scale. */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                ps: Seq[Double], scale: Double = 1.0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1]: $ps")
    val gs = groupCols.map(col)
    // (group, value) histogram: the ONLY corpus-sized aggregate, map-side combined
    val h = df.where(col(valueCol).isNotNull)
      .groupBy((gs :+ col(valueCol).as("_v")): _*)
      .agg(count(lit(1)).as("_cnt"))
    val wCum = Window.partitionBy(gs: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = h
      .withColumn("_cum", sum(col("_cnt")).over(wCum))
      .withColumn("_n", sum(col("_cnt")).over(Window.partitionBy(gs: _*)))
    def hIdx(p: Double): Column = (col("_n") - 1).cast(DoubleType) * lit(p)
    val picks = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(min(when(col("_cum") - 1 >= floor(hIdx(p)), col("_v"))).as(s"_lo$i"),
          min(when(col("_cum") - 1 >= ceil(hIdx(p)), col("_v"))).as(s"_hi$i"))
    }
    val agg = ranked.groupBy(gs: _*)
      .agg(max(col("_n")).as("_n"), picks: _*)
    val out = ps.zipWithIndex.map { case (p, i) =>
      val f = hIdx(p) - floor(hIdx(p))
      (col(s"_lo$i") / scale + f * (col(s"_hi$i") / scale - col(s"_lo$i") / scale))
        .as(s"q_$i")
    }
    agg.select((gs :+ col("_n").as("n")) ++ out: _*)
  }
}
