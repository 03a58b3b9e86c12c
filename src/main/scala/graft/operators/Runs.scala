package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed value-run counting under a total order — the primitive behind
  * layout/encoding advisors (rle_layout): "how many runs does column c have
  * when the table is sorted by k?"
  *
  * The naive forms both fail at scale: a global `lag(c) OVER (ORDER BY k)`
  * collapses onto one task, and the global-row-number + rn = rn+1 self-join
  * (the first implementation here) pays TWO data-sized shuffles plus the
  * prefix-sum machinery. This operator needs exactly ONE data shuffle:
  *
  *   1. rows hash-exchange on [[GlobalOrder.rangeBucket]] — a deterministic
  *      integer bucket id monotone in `key`, so bucket order IS key order
  *      and the window's own exchange is the only data movement;
  *   2. within each bucket (sorted by the window), `lag` marks run starts
  *      locally — every column's breaks counted in the same pass;
  *   3. a buckets-sized aggregate keeps per-bucket run counts plus edge
  *      values (min_by/max_by on the key), and an explicitly tiny window
  *      over that relation subtracts the runs that MERGE across adjacent
  *      bucket boundaries (last value of bucket i == first of bucket i+1).
  *
  * Totals are exact — bucket edges are corrected, not approximated. Value
  * columns must be non-null (`lag != c` is null-unsafe); map nulls to a
  * sentinel first if needed. Cost beyond the shuffle: GlobalOrder's two
  * column-pruned probe jobs that fix the bucket boundary literals.
  */
object Runs {

  /** One-row result: `n_rows` plus `runs_<name>` for each value column,
    * counting that column's value-runs under ascending `key` (which must be
    * a total order — include a unique suffix; ties would make run counts
    * order-dependent). */
  def counts(df: DataFrame, key: Column, values: Seq[String],
             numBuckets: Int = 0): DataFrame =
    countsOrdered(df, Seq(key), key, values, numBuckets)

  /** Tuple-order variant: runs under the lexicographic order of `orderCols`
    * (still a total order — include unique suffix columns), hash-exchanged
    * on a range bucket of `bucketKey`, which must be a monotone coarsening
    * of the tuple order (e.g. its lead column). Against the single-string
    * form this sorts native columns instead of a per-row concatenated key —
    * the concat/format_string evaluated once per row per probe was the
    * dominant per-pass cost in rle_layout (round 14) — and `knownCount`
    * lets several passes over one frame share a single count probe. */
  def countsOrdered(df: DataFrame, orderCols: Seq[Column], bucketKey: Column,
                    values: Seq[String], numBuckets: Int = 0,
                    knownCount: Option[Long] = None): DataFrame = {
    val n = if (numBuckets > 0) numBuckets
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val keyed = df.withColumn("_r_b",
      GlobalOrder.rangeBucket(df, bucketKey, n, knownCount))
      .withColumn("_r_ord", struct(orderCols: _*))
    val w = Window.partitionBy(col("_r_b")).orderBy(col("_r_ord"))
    val marked = values.foldLeft(keyed) { (d, v) =>
      d.withColumn(s"_brk_$v",
        when(lag(col(v), 1).over(w).isNull || lag(col(v), 1).over(w) =!= col(v), 1L)
          .otherwise(0L))
    }
    val perBucket = marked.groupBy(col("_r_b")).agg(
      count(lit(1)).as("_nr"),
      values.flatMap(v => Seq(
        sum(col(s"_brk_$v")).as(s"_runs_$v"),
        expr(s"min_by(`$v`, _r_ord)").as(s"_first_$v"),
        expr(s"max_by(`$v`, _r_ord)").as(s"_last_$v"))): _*)
    // buckets-sized relation; the single partition is EXPLICIT and bounded
    val wb = Window.partitionBy(lit(0)).orderBy(col("_r_b"))
    val corrected = values.foldLeft(perBucket) { (d, v) =>
      d.withColumn(s"_merge_$v",
        when(lag(col(s"_last_$v"), 1).over(wb) === col(s"_first_$v"), 1L)
          .otherwise(0L))
    }
    corrected.agg(
      sum(col("_nr")).as("n_rows"),
      values.map(v =>
        (sum(col(s"_runs_$v")) - sum(col(s"_merge_$v"))).as(s"runs_$v")): _*)
  }
}
