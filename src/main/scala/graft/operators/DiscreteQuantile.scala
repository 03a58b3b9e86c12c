package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exact per-group quantiles over DISCRETE value domains with bounded
  * memory at any scale.
  *
  * Spark's exact `percentile` aggregate is an ObjectHashAggregate that
  * buffers every group value in memory — at 100 TB a 5-group aggregation
  * would hold billions of values per group. When the value domain is
  * discrete (integer cents, token counts, quantized scores), the exact
  * quantile is computable from a COUNT HISTOGRAM instead: one map-side
  * combined `groupBy(key, value).count()` bounds the intermediate at
  * |keys|×|domain| rows no matter the input row count, a running sum over
  * the (tiny) histogram locates the order statistics, and R-7 linear
  * interpolation between the two covering values reproduces
  * `percentile`/`quantile_cont` bit-for-bit.
  *
  * The reference has no aggregation at all (SURVEY.md §2.8); its only
  * statistics are the per-column min/max/max-length used for DDL sizing
  * (clsql-data-table.lisp:59-80). This is the scale-correct exact-quantile
  * extension used by outlier_mad and corpus_stats.
  */
object DiscreteQuantile {

  /** Pure R-7 quantile of a value→count histogram, replicating Spark's
    * `percentile` ARITHMETIC bit-for-bit (position p·(n−1), then
    * `(higher−pos)·lo + (pos−lower)·hi` — NOT the algebraically-equal
    * `lo + (hi−lo)·frac`, which differs in the last ulp for non-dyadic
    * fractions). Oracle note: DuckDB's `quantile_cont` may use the other
    * variant — queries emitting raw quantiles should round the output or
    * stick to dyadic positions (p=0.5 on integer domains is exact under
    * every variant). */
  def quantileOfHistogram(hist: Seq[(Double, Long)], p: Double): Double = {
    require(hist.nonEmpty, "empty histogram")
    require(p >= 0.0 && p <= 1.0, s"p out of [0,1]: $p")
    val sorted = hist.sortBy(_._1)
    val n = sorted.iterator.map(_._2).sum
    val pos = p * (n - 1).toDouble
    val lowR = math.floor(pos).toLong
    val highR = math.ceil(pos).toLong
    var cum = 0L
    var lo = Double.NaN
    var hi = Double.NaN
    sorted.foreach { case (v, c) =>
      val start = cum; cum += c
      if (start <= lowR && lowR < cum) lo = v
      if (start <= highR && highR < cum) hi = v
    }
    if (lowR == highR) lo
    else (math.ceil(pos) - pos) * lo + (pos - math.floor(pos)) * hi
  }

  /** Default driver-collect bound: ~2M histogram rows (≈50 MB of
    * (key, double, long) tuples) — far above any config-sized domain, far
    * below what would distress a driver heap. */
  val DefaultMaxDriverHistRows: Long = 2L * 1024 * 1024

  /** Cardinality guard for the driver-collect histogram path: TRUE iff the
    * (key, value) histogram is PROVABLY config-sized. One cheap
    * `approx_count_distinct` probe job (HLL++ — kilobytes of state per
    * partition, no matter the row count); the 1.25 slack keeps the guard
    * conservative against the sketch's default 5% rsd. Callers fall back to
    * the fully distributed [[quantiles]] when this returns false — the
    * 100 TB rule: a driver collect is only legal when its size is bounded
    * by CONFIG (domain cardinality), never by DATA (row count), and a
    * wide/continuous value domain flips the histogram from the former to
    * the latter. */
  def histogramFitsDriver(df: DataFrame, key: String, value: Column,
                          maxRows: Long = DefaultMaxDriverHistRows): Boolean = {
    val est = df.select(approx_count_distinct(struct(col(key), value)).as("n"))
      .head().getLong(0)
    est.toDouble * 1.25 <= maxRows.toDouble
  }

  /** Per-key quantiles via a driver-collected histogram — the right shape
    * when |keys|×|domain| is config-sized while the row count is huge: one
    * map-side-combined aggregation job, pure driver math, and the caller
    * folds the result back as literals (no quantile subtree left in the
    * final plan to be lazily recomputed). Use [[quantiles]] instead when the
    * key space itself is large (per-user quantiles over millions of users).
    * A key whose values are all NULL is ABSENT from the returned map
    * (callers fold results into literal maps, where a null entry and a
    * missing entry behave the same under element_at).
    */
  def quantilesViaDriver(df: DataFrame, key: String, value: Column,
                         ps: Seq[Double]): Map[String, Seq[Double]] = {
    val hist = df.select(col(key).cast("string").as("_k"), value.cast(DoubleType).as("_v"))
      .where(col("_v").isNotNull)
      .groupBy(col("_k"), col("_v")).agg(count(lit(1)).as("_cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    hist.groupBy(_._1).map { case (k, rows) =>
      val h = rows.map(r => (r._2, r._3)).toSeq
      k -> ps.map(quantileOfHistogram(h, _))
    }
  }

  /** Append per-key R-7 quantile columns `outNames` (as DoubleType) for
    * probabilities `ps` of the discrete-valued `value` expression.
    * Returns one row per key with columns keys ++ outNames.
    */
  def quantiles(df: DataFrame, keys: Seq[String], value: Column,
                ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == outNames.length, "one output name per p")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"p out of [0,1]: $ps")
    val kcols = keys.map(col)
    // histogram: one row per (key, distinct value) — the map-side combine
    // makes the shuffle domain-bounded, not row-bounded
    val histAll = df.groupBy(kcols :+ value.as("_v"): _*)
      .agg(count(lit(1)).as("_cnt"))
    val hist = histAll.where(col("_v").isNotNull) // percentile ignores NULLs
    val wRun = Window.partitionBy(kcols: _*).orderBy(col("_v"))
    val wAll = Window.partitionBy(kcols: _*)
    // _cum is the 1-past-the-end 0-based rank of each value run; value v
    // covers ranks [_cum - _cnt, _cum)
    val ranked = hist
      .withColumn("_cum", sum(col("_cnt")).over(wRun))
      .withColumn("_n", sum(col("_cnt")).over(wAll))
    val aggs = ps.indices.flatMap { i =>
      val pos = lit(ps(i)) * (col("_n") - 1).cast(DoubleType)
      val lowR = floor(pos)
      val highR = ceil(pos)
      def covering(r: Column) =
        (col("_cum") - col("_cnt")).cast(DoubleType) <= r && col("_cum").cast(DoubleType) > r
      Seq(max(when(covering(lowR), col("_v"))).as(s"_lo$i"),
        max(when(covering(highR), col("_v"))).as(s"_hi$i"))
    } :+ max(col("_n")).as("_n")
    val located = ranked.groupBy(kcols: _*).agg(aggs.head, aggs.tail: _*)
    val withOut = ps.indices.foldLeft(located) { (d, i) =>
      val pos = lit(ps(i)) * (col("_n") - 1).cast(DoubleType)
      val loD = col(s"_lo$i").cast(DoubleType)
      val hiD = col(s"_hi$i").cast(DoubleType)
      // Spark percentile's exact arithmetic: (higher−pos)·lo + (pos−lower)·hi
      d.withColumn(outNames(i),
        when(floor(pos) === ceil(pos), loD)
          .otherwise((ceil(pos) - pos) * loD + (pos - floor(pos)) * hiD))
    }
    // a key whose values are ALL null must still return (with null
    // quantiles), exactly like percentile — the null filter above would
    // otherwise drop it. The key list comes from the (tiny) histogram, not
    // another scan of df.
    val allKeys = histAll.select(kcols: _*).distinct()
    allKeys.join(withOut.select(kcols ++ outNames.map(col): _*), keys, "left")
  }
}
