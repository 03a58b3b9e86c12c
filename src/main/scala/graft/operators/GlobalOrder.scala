package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Global-order primitives that scale: exclusive prefix sums and global row
  * numbers over a total order WITHOUT a single-partition window.
  *
  * The naive `sum(...).over(Window.orderBy(k))` collapses the whole dataset
  * onto one task (Spark warns "No Partition Defined for Window operation") —
  * a non-starter at 100 TB. The distributed shape used here is the classic
  * two-phase scan:
  *
  *   1. range-repartition on the order keys (partition i holds strictly
  *      lower keys than partition i+1 — the same contract Spark's own sort
  *      relies on),
  *   2. one tiny per-partition aggregate (numParts rows) is collected and
  *      cumulated on the driver into per-partition base offsets,
  *   3. each row's global value = its partition base (broadcast-joined) +
  *      a partition-LOCAL running-sum window.
  *
  * Cost: one range shuffle + one O(numParts) collect + per-partition sorts.
  * No stage touches more than one partition's rows, so the plan survives any
  * scale-up by raising numParts. This powers sequence packing (token-offset
  * assignment) and deterministic global shuffles (training-order row ids) —
  * both need a total order over the full corpus.
  *
  * The reference has no analog (its tables are in-memory lists with implicit
  * positions, data-table.lisp:94-98); this is the distributed re-expression
  * of "row index" (`data-table-value :row-idx`, data-table.lisp:119-129).
  */
object GlobalOrder {

  /** Adds `out` = the sum of `value` over all rows strictly BEFORE this row
    * in the total order given by `orderCols` (exclusive prefix sum; first
    * row gets 0). `value` must be non-null; ties in `orderCols` across
    * partition boundaries are fine (range partitioning keeps equal keys in
    * one partition), but for a deterministic result `orderCols` should be a
    * total order (include a unique id as the last key).
    */
  def withExclusivePrefixSum(df: DataFrame, orderCols: Seq[Column], value: Column,
                             out: String, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (numParts > 0) numParts
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // persist AFTER the range shuffle: the partial-sum job and the final job
    // must see the SAME partitioning, and the shuffle must run once
    val ranged = df.withColumn("_g_v", value.cast(LongType))
      .repartitionByRange(n, orderCols: _*)
      .withColumn("_g_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val partials: Map[Int, Long] = ranged.groupBy(col("_g_pid"))
      .agg(sum(col("_g_v")).as("t")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    // bases(p) = sum of all partitions before p (empty partitions emit no
    // partial row → contribute 0)
    val bases = (0 until n).scanLeft(0L)((acc, p) => acc + partials.getOrElse(p, 0L))
    val baseDf = broadcast(
      (0 until n).map(p => (p, bases(p))).toDF("_g_pid", "_g_base"))
    val w = Window.partitionBy(col("_g_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(baseDf, "_g_pid")
      .withColumn(out, coalesce(sum(col("_g_v")).over(w), lit(0L)) + col("_g_base"))
      .drop("_g_pid", "_g_v", "_g_base")
  }

  /** Adds `out` = this row's 1-based position in the total order given by
    * `orderCols` — a distributed `row_number() OVER (ORDER BY ...)`.
    * `orderCols` must be a total order (no ties) for determinism.
    */
  def withGlobalRowNumber(df: DataFrame, orderCols: Seq[Column],
                          out: String, numParts: Int = 0): DataFrame =
    withExclusivePrefixSum(df, orderCols, lit(1L), "_g_rank0", numParts)
      .withColumn(out, col("_g_rank0") + lit(1L))
      .drop("_g_rank0")
}
