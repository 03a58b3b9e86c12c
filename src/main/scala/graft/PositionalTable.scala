package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A [[DataTable]] with an explicit, deterministic 0-based `_row_idx` column —
  * the Spark-native carrier for the reference's positional semantics
  * (`data-table-value` row/cell access data-table.lisp:119-129, `(setf
  * data-table-value)` data-table.lisp:139-170, `make-sub-table` row ranges
  * data-table.lisp:172-191, `overlay-region` data-table.lisp:218-238).
  *
  * All operations stay declarative (filters/joins on `_row_idx`), so Catalyst
  * still prunes and pushes down; nothing here collects to the driver except
  * the single-cell reader.
  */
final case class PositionalTable(df: DataFrame) {
  import PositionalTable.RowIdx

  def table: DataTable = DataTable(df.drop(RowIdx))
  private def dataCols: Array[String] = df.columns.filter(_ != RowIdx)

  /** Read one cell (reference: data-table.lisp:119-129). Driver-side scalar. */
  def cellAt(rowIdx: Long, colName: String): Any = {
    val c = DataTable(df).resolve(colName)
    df.where(col(RowIdx) === rowIdx).select(col(c)).head().get(0)
  }

  /** One full row as a DataFrame (keeps it distributed for composition). */
  def rowAt(rowIdx: Long): DataFrame =
    df.where(col(RowIdx) === rowIdx).select(dataCols.map(col): _*)

  /** Functional cell write (reference setf, data-table.lisp:139-170):
    * rewrite one column with a positional `when`. */
  def setCell(rowIdx: Long, colName: String, value: Column): PositionalTable = {
    val c = DataTable(df).resolve(colName)
    val t = df.schema(c).dataType
    PositionalTable(df.withColumn(c, when(col(RowIdx) === rowIdx, value.cast(t)).otherwise(col(c))))
  }

  /** Replace a whole row's data cells (the row form of the reference's
    * `(setf data-table-value)`, data-table.lisp:147-151). `values` are
    * positional; fewer values than columns leaves the remainder unchanged. */
  def setRow(rowIdx: Long, values: Seq[Column]): PositionalTable = {
    val cols = dataCols
    require(values.length <= cols.length, "more values than columns")
    val updated = cols.zipWithIndex.map { case (c, i) =>
      if (i < values.length) {
        val t = df.schema(c).dataType
        when(col(RowIdx) === rowIdx, values(i).cast(t)).otherwise(col(c)).as(c)
      } else col(c)
    }
    PositionalTable(df.select(updated :+ col(RowIdx): _*))
  }

  /** Half-open row slice [lri, uri) — the row half of `make-sub-table`
    * (data-table.lisp:172-191). */
  def rowSlice(lri: Long, uri: Long): PositionalTable =
    PositionalTable(df.where(col(RowIdx) >= lri && col(RowIdx) < uri))

  /** Rectangular slice: rows [lri,uri) × columns [lci,uci). */
  def subTable(lci: Int, uci: Int, lri: Long, uri: Long): PositionalTable = {
    val keep = dataCols.slice(lci, uci) :+ RowIdx
    PositionalTable(rowSlice(lri, uri).df.select(keep.map(col): _*))
  }

  /** Materialize missing row indices 0..max as null rows — the reference's
    * `ensure-rows` growth (data-table.lisp:156-163): a paste at row 3 of an
    * empty table leaves rows 0-2 present-but-nil. Distributed: left join
    * from a `spark.range` spine, no driver loop. */
  def densify: PositionalTable = {
    val maxIdx = df.agg(max(col(RowIdx))).head() match {
      case r if r.isNullAt(0) => -1L
      case r                  => r.getLong(0)
    }
    if (maxIdx < 0) return this
    val spine = df.sparkSession.range(maxIdx + 1).toDF(RowIdx)
    PositionalTable(spine.join(df, Seq(RowIdx), "left")
      .select(dataCols.map(col) :+ col(RowIdx): _*))
  }

  /** `overlay-region` (data-table.lisp:218-238): paste `other` into this table
    * with its row 0 landing at `rowOff` and its column 0 at column `colOff`.
    * Grows rows (full-outer join on `_row_idx`) and columns (null-backed,
    * string-typed — reference growth columns are string, data-table.lisp:226-233)
    * as needed. Overlapping columns unify to string when types differ, matching
    * the reference's all-string overlay use case. */
  def overlay(other: PositionalTable, rowOff: Long, colOff: Int): PositionalTable = {
    val base = df
    val ovl = other.df.withColumn(RowIdx, col(RowIdx) + rowOff)
    val baseCols = dataCols
    val ovlCols = other.dataCols
    val width = math.max(baseCols.length, colOff + ovlCols.length)

    // target column i ← base column i (if any) overlaid by other column (i - colOff) (if any)
    val joined = base.as("b").join(ovl.as("o"), base(RowIdx) === ovl(RowIdx), "full_outer")
    val idx = coalesce(col(s"b.$RowIdx"), col(s"o.$RowIdx")).as(RowIdx)
    val outCols = (0 until width).map { i =>
      val b = if (i < baseCols.length) Some(col(s"b.${baseCols(i)}")) else None
      val o = if (i >= colOff && i - colOff < ovlCols.length) Some(col(s"o.${ovlCols(i - colOff)}")) else None
      val name = if (i < baseCols.length) baseCols(i) else s"col_$i"
      (b, o) match {
        case (Some(bc), Some(oc)) =>
          val bt = base.schema(baseCols(i)).dataType
          val ot = ovl.schema(ovlCols(i - colOff)).dataType
          if (bt == ot) coalesce(oc, bc).as(name)
          else coalesce(oc.cast(StringType), bc.cast(StringType)).as(name)
        case (Some(bc), None) => bc.as(name)
        case (None, Some(oc)) => oc.as(name)
        case _                => lit(null).cast(StringType).as(name)
      }
    }
    PositionalTable(joined.select(outCols :+ idx: _*))
  }
}

object PositionalTable {
  val RowIdx = "_row_idx"

  /** Zero-column, zero-row positional table — the reference's
    * `(make-instance 'data-table)` starting point for overlay composition. */
  def empty(spark: org.apache.spark.sql.SparkSession): PositionalTable =
    PositionalTable(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField(RowIdx, LongType, nullable = false)))))
}
