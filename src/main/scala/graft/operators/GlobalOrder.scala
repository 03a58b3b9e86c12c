package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global-order primitives that scale: exclusive prefix sums and global row
  * numbers over a total order WITHOUT a single-partition window.
  *
  * The naive `sum(...).over(Window.orderBy(k))` collapses the whole dataset
  * onto one task (Spark warns "No Partition Defined for Window operation") —
  * a non-starter at 100 TB. The shape used here is the classic two-phase
  * scan, expressed so the full dataset crosses the network ONCE:
  *
  *   1. a deterministic RANGE-BUCKET id is computed from the lead order key
  *      itself (sampled boundary literals, monotone in the key) — not from
  *      `spark_partition_id()`: a bucket derived from the key lets the
  *      Window's own hash exchange on the bucket BE the data shuffle,
  *      whereas a pid-based bucket sits on top of `repartitionByRange` and
  *      forces a SECOND full-data exchange (measured in the round-2 plan
  *      audit), and is only deterministic relative to a physical partitioner;
  *   2. per-bucket totals (a map-side-combined aggregate, numBuckets rows)
  *      self-join into exclusive per-bucket base offsets — tiny (≤ n² rows),
  *      no driver collect, no persist, fully lazy;
  *   3. each row's global value = its bucket base (broadcast-joined) + a
  *      bucket-LOCAL running-sum window.
  *
  * Cost: one data-sized hash shuffle (the window's), one extra column-pruned
  * scan for the totals subtree, and two eager column-pruned probe jobs at
  * BUILD time (count + seeded sample) that fix the bucket boundaries as
  * literals. No stage holds more than ~one bucket's rows (hash collisions of
  * bucket ids can co-locate two buckets in a task — bounded 2×, not O(N)),
  * so the plan survives any scale-up by raising numBuckets.
  *
  * Requirements: `orderCols` ascending and totally ordered (include a unique
  * id last); `value` non-null; the LEAD order column should be
  * high-cardinality (all rows equal on it degrade to one bucket).
  *
  * The reference has no analog (its tables are in-memory lists with implicit
  * positions, data-table.lisp:94-98); this is the distributed re-expression
  * of "row index" (`data-table-value :row-idx`, data-table.lisp:119-129).
  */
object GlobalOrder {

  private val SampleSeed = 8675309L
  private val SamplesPerBucket = 128

  /** Sampled ascending boundary literals for the lead order key: bucket(k) =
    * number of boundaries ≤ k — monotone, null→bucket 0 (nulls sort first).
    * Two eager column-pruned jobs (count, then seeded sample); boundaries
    * become plan literals so both downstream subtrees agree deterministically.
    *
    * `knownCount` skips the count probe when the caller already holds the
    * row count (a query running several GlobalOrder passes over one cached
    * frame was paying the identical count job per pass — round 14). The
    * sample probe draws rows BEFORE projecting the key, so an expensive key
    * expression evaluates on ~n·128 sampled rows, not the whole relation
    * (boundaries shift only within sampling noise, and the downstream
    * totals/merge corrections make every output exact for ANY monotone
    * bucketing, so this is plan-shape-only).
    */
  private def bucketExpr(df: DataFrame, c0: Column, n: Int,
                         knownCount: Option[Long] = None): Column = {
    val cnt = knownCount.getOrElse(df.select(c0.as("_g_k")).count())
    val boundaries: Seq[Any] =
      if (cnt == 0 || n <= 1) Seq.empty
      else {
        val fraction = math.min(1.0, (n.toDouble * SamplesPerBucket) / cnt)
        val s = df.sample(withReplacement = false, fraction, SampleSeed)
          .select(c0.as("_g_k")).where(col("_g_k").isNotNull)
          .orderBy(col("_g_k")).collect().map(_.get(0))
        if (s.isEmpty) Seq.empty
        else (1 until n).map(i => s(((i.toLong * s.length) / n).toInt.min(s.length - 1)))
          .distinct
      }
    boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(c0 >= lit(b), 1).otherwise(0)
    }
  }

  /** Public surface of the sampled range bucket (see [[bucketExpr]]): a
    * deterministic, monotone-in-`key` integer bucket id computed from
    * sampled boundary literals — the primitive both the prefix-sum and the
    * run-counting operators hash-exchange on. Costs two eager column-pruned
    * probe jobs (count + seeded sample) at build time; pass `knownCount`
    * to skip the count probe. */
  def rangeBucket(df: DataFrame, key: Column, n: Int,
                  knownCount: Option[Long] = None): Column =
    bucketExpr(df, key, n, knownCount)

  /** Adds `out` = the sum of `value` over all rows strictly BEFORE this row
    * in the total order given by `orderCols` (exclusive prefix sum; first
    * row gets 0). When the lead key's distribution is known a priori (e.g.
    * an md5 hex key is uniform), pass explicit ascending `boundaries` to
    * skip the two boundary-probe jobs entirely — the whole operator is then
    * lazy.
    */
  def withExclusivePrefixSum(df: DataFrame, orderCols: Seq[Column], value: Column,
                             out: String, numParts: Int = 0,
                             boundaries: Option[Seq[Any]] = None,
                             knownCount: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    val n = if (numParts > 0) numParts
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val bucket = boundaries match {
      case Some(bs) => bs.foldLeft(lit(0)) { (acc, b) =>
        acc + when(orderCols.head >= lit(b), 1).otherwise(0)
      }
      case None => bucketExpr(df, orderCols.head, n, knownCount)
    }
    val keyed = df.withColumn("_g_v", value.cast(LongType))
      .withColumn("_g_bucket", bucket)
    // per-bucket totals → exclusive bases via a cumsum window over the
    // ≤n-row totals relation. partitionBy(lit(0)) makes the single
    // partition EXPLICIT: this window sees bucket-count rows, never data —
    // the "no global window" rule is about data-sized inputs
    val totals = keyed.groupBy(col("_g_bucket")).agg(sum(col("_g_v")).as("_g_t"))
    val wb = Window.partitionBy(lit(0)).orderBy(col("_g_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = totals
      .withColumn("_g_base", coalesce(sum(col("_g_t")).over(wb), lit(0L)))
      .drop("_g_t")
    val w = Window.partitionBy(col("_g_bucket")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(bases), "_g_bucket")
      .withColumn(out, coalesce(sum(col("_g_v")).over(w), lit(0L)) + col("_g_base"))
      .drop("_g_bucket", "_g_v", "_g_base")
  }

  /** Adds `out` = this row's 1-based position in the total order given by
    * `orderCols` — a distributed `row_number() OVER (ORDER BY ...)`.
    * `orderCols` must be a total order (no ties) for determinism.
    */
  def withGlobalRowNumber(df: DataFrame, orderCols: Seq[Column],
                          out: String, numParts: Int = 0,
                          boundaries: Option[Seq[Any]] = None,
                          knownCount: Option[Long] = None): DataFrame =
    withExclusivePrefixSum(df, orderCols, lit(1L), "_g_rank0", numParts, boundaries,
        knownCount)
      .withColumn(out, col("_g_rank0") + lit(1L))
      .drop("_g_rank0")

  /** Adds `out` = `ntile(k)` over the total order `orderCols` — the
    * distributed replacement for `ntile(k).over(Window.orderBy(...))`,
    * which is a single task at any scale. Standard SQL ntile semantics
    * (n rows split into k tiles differing by at most one row, larger
    * tiles first — Spark and DuckDB agree), derived arithmetically from
    * [[withGlobalRowNumber]]'s position: with q = n DIV k and
    * cut = (n MOD k)·(q+1), tile = (pos−1) DIV (q+1) + 1 for pos ≤ cut
    * and (n MOD k) + (pos−cut−1) DIV q + 1 past it. Costs ONE eager
    * count probe beyond GlobalOrder's own — pass a cached/checkpointed
    * `df` so the probes re-read partitions, not the upstream plan.
    * Descending cuts: negate the lead key (bucket boundaries are sampled
    * from the key as passed, so monotonicity is preserved). The negated
    * lead key MUST be non-null and non-NaN: `ntile().over(orderBy(desc))`
    * sorts NULLs LAST and NaN above every real double, while a negated
    * ascending key buckets NULLs first (bucketExpr sends null to bucket 0)
    * and -NaN is still NaN — either one silently mis-tiles. Every current
    * call site feeds non-null aggregates; a future descending site with a
    * nullable/NaN-able key must coalesce/clamp it first (round-11 ADVICE).
    *
    * `knownCount` is LOAD-BEARING here, unlike in [[rangeBucket]] where a
    * stale count only perturbs sampling noise: the tile boundaries (q, rem,
    * cut) are computed FROM it, so it must be the exact row count of exactly
    * this `df` — a count carried over from a differently-filtered frame
    * yields silently wrong quantiles with no guard (round-14 ADVICE).
    * WarehouseOpsSpec's "withNtile knownCount value-identical" pins the
    * equivalence for the honest-count case.
    */
  def withNtile(df: DataFrame, orderCols: Seq[Column], k: Int, out: String,
                numParts: Int = 0, boundaries: Option[Seq[Any]] = None,
                knownCount: Option[Long] = None): DataFrame = {
    require(k >= 1, s"ntile buckets must be >= 1: $k")
    // the ntile count IS the bucket-probe count — thread it down so one
    // probe job serves both (was two identical count jobs per call)
    val n = knownCount.getOrElse(df.count())
    val q = n / k
    val rem = n % k
    val cut = rem * (q + 1)
    val tileSql =
      if (q == 0) "CAST(_g_pos AS INT)" // n < k: row i is tile i
      else s"CAST(CASE WHEN _g_pos <= $cut THEN (_g_pos - 1) DIV ${q + 1} + 1 " +
        s"ELSE $rem + (_g_pos - $cut - 1) DIV $q + 1 END AS INT)"
    withGlobalRowNumber(df, orderCols, "_g_pos", numParts, boundaries, Some(n))
      .withColumn(out, expr(tileSql))
      .drop("_g_pos")
  }

  /** Evenly spaced 4-hex-digit prefixes — static boundaries for md5-hex lead
    * keys (uniform by construction): n buckets, no probe jobs. */
  def hexBoundaries(n: Int): Seq[Any] =
    (1 until n).map(i => f"${(i.toLong * 65536L) / n}%04x")
}
