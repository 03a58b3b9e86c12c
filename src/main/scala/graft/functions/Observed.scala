package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** One-pass side metrics via Spark's Observation API (`Dataset.observe` →
  * `CollectMetricsExec`): row counts, null counts, sums, min/max collected
  * WHILE the main action runs — the data-quality-counter pattern without a
  * second scan. At 100 TB a separate `df.agg(...)` validation pass re-reads
  * the corpus; an observation rides the existing exchange for free (the
  * metrics aggregate per task and merge on the driver, constant size).
  *
  * The reference validates eagerly on materialized lists
  * (data-table.lisp:267-293 re-walks every column after coercion); this is
  * the streaming-friendly re-expression: validation happens in the SAME
  * pass that produces the output.
  *
  * Usage:
  * {{{
  *   val (out, obs) = Observed.withMetrics(df, "load-audit",
  *     count(lit(1)).as("rows"),
  *     sum(when(col("price").isNull, 1L).otherwise(0L)).as("null_prices"))
  *   out.write.parquet(...)          // ONE job
  *   val bad = obs.get("null_prices") // available after the action
  * }}}
  *
  * Constraints (Spark's, worth knowing): metric expressions must be
  * aggregates without grouping, must not reference the observation name,
  * and fire once per action — `obs.get` blocks until the first action
  * completes.
  */
object Observed {

  def withMetrics(df: DataFrame, name: String,
                  metrics: Column*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric expression required")
    val obs = new Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** The common DQ preset: total rows plus a null count per listed column —
    * the fill-in-missing-cells / coercion-failure audit as side metrics. */
  def withNullAudit(df: DataFrame, name: String,
                    cols: Seq[String]): (DataFrame, Observation) = {
    import org.apache.spark.sql.functions._
    withMetrics(df, name,
      (count(lit(1)).as("rows") +:
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))): _*)
  }
}
