package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustering — the data-LAYOUT
  * optimization that makes 100 TB scans cheap on more than one predicate
  * column. Sorting a table by `a` gives tight parquet row-group min/max
  * stats on `a` but random stats on `b`; interleaving the bits of both keys
  * and range-partitioning + sorting by the interleaved value gives *both*
  * columns locality, so `WHERE a = …` AND `WHERE b = …` queries each skip
  * most row groups via footer stats (no index structure needed — pure
  * layout).
  *
  * The reference has no storage layer at all (its tables are in-memory Lisp
  * lists, SURVEY.md §1.1); this is part of the Spark-native scale surface.
  * The bit-interleave is expressed as a closed-form codegen'd expression
  * (shift/and/multiply — no UDF), and [[sqlExpr]] emits the identical
  * arithmetic as portable SQL so the DuckDB oracle replays it bit-for-bit.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * bit i of `a` → bit 2i, bit i of `b` → bit 2i+1 of the z-value.
    *
    * CONTRACT: both inputs must fit in `bits` bits (< 2^bits). Higher bits
    * are NOT interleaved — keys that differ only above `bits` would alias
    * to the same z-position and the clustering would silently stop pruning
    * on them. Size `bits` to the column domain (e.g. 15 covers TPC-H
    * partkeys at the bench scale factors).
    */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)),
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }
    terms.reduce(_ + _)
  }

  /** The same interleave as portable SQL text (DuckDB + Spark SQL both parse
    * it): `>>`, `&`, `*`, `+` on BIGINT only.
    */
  def sqlExpr(a: String, b: String, bits: Int): String = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).flatMap { i =>
      Seq(
        s"(((CAST($a AS BIGINT) >> $i) & 1) * ${1L << (2 * i)})",
        s"(((CAST($b AS BIGINT) >> $i) & 1) * ${1L << (2 * i + 1)})")
    }.mkString("(", " + ", ")")
  }

  /** Write `df` clustered on the z-order of (a, b): range-partition by
    * z-value (one shuffle, AQE-coalescible) and sort within partitions, so
    * every output file covers one contiguous z-range ⇒ a narrow range of
    * BOTH keys ⇒ parquet min/max footer stats prune on either predicate.
    */
  def writeClustered(df: DataFrame, a: String, b: String, bits: Int,
                     numFiles: Int, path: String): Unit = {
    val z = zvalue(col(a), col(b), bits).as("_zval")
    df.withColumn("_zval", z)
      .repartitionByRange(numFiles, col("_zval"))
      .sortWithinPartitions(col("_zval"))
      .drop("_zval")
      .write.mode("overwrite").parquet(path)
  }
}
