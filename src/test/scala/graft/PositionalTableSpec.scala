package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Positional semantics: _row_idx discipline, cell ops, and the reference's
  * overlay-growth test (tests/data-table.lisp:62-100, FIXTURES.md A.2). */
class PositionalTableSpec extends SparkSpec {

  private def strTable(names: Seq[String], rows: Seq[Seq[String]]): PositionalTable =
    DataTable.fromStringRows(spark, names, rows).withRowIdx(Seq(col(names.head)))

  test("withRowIdx is deterministic under the sort key") {
    val dt = DataTable(spark.range(100).toDF("id")
      .withColumn("k", col("id") * 37 % 100)) // shuffled values
    val pt = dt.withRowIdx(Seq(col("k")))
    val rows = pt.df.orderBy(col(PositionalTable.RowIdx)).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == (0L until 100L).toSeq)
    assert(rows.map(_.getAs[Long](PositionalTable.RowIdx)).toSeq == (0L until 100L).toSeq)
  }

  test("cellAt / rowAt / setCell / rowSlice — data-table.lisp:119-191") {
    val pt = strTable(Seq("a", "b"), Seq(Seq("r0", "x"), Seq("r1", "y"), Seq("r2", "z")))
    assert(pt.cellAt(1L, "B") == "y") // case-insensitive col
    assert(pt.rowAt(2L).collect().head.toSeq == Seq("r2", "z"))
    val set = pt.setCell(0L, "b", lit("W"))
    assert(set.cellAt(0L, "b") == "W")
    assert(set.df.count() == 3L) // row-length invariant (tests/data-table.lisp:55-60)
    assert(pt.rowSlice(1L, 3L).df.count() == 2L)
  }

  test("overlay growth into an empty table — tests/data-table.lisp:62-100") {
    val t1 = strTable(Seq("c0", "c1"), Seq(Seq("a", "b"), Seq("c", "d")))
    val t2 = strTable(Seq("c0", "c1"), Seq(Seq("1", "2"), Seq("3", "4")))
    // NB t2 sorts by "1"<"3" and t1 by "a"<"c" — row order preserved.
    val grown = PositionalTable.empty(spark)
      .overlay(t1, 1, 1).overlay(t2, 3, 3).overlay(t1, 2, 2).overlay(t2, 3, 0)
      .densify
    assert(grown.df.count() == 5L)
    val row3 = grown.rowAt(3L).collect().head.toSeq
    assert(row3 == Seq("1", "2", "c", "d", "2"))
    // inference over the grown table: (long string string string long)
    val types = TypeGuess.coerceStringsToTypes(grown.table).schema.fields.map(_.dataType).toSeq
    assert(types == Seq(LongType, StringType, StringType, StringType, LongType))
  }

  test("setRow replaces a row's cells positionally — data-table.lisp:147-151") {
    val pt = strTable(Seq("a", "b"), Seq(Seq("r0", "x"), Seq("r1", "y")))
    val set = pt.setRow(1L, Seq(lit("R1"), lit("Y")))
    assert(set.rowAt(1L).collect().head.toSeq == Seq("R1", "Y"))
    assert(set.rowAt(0L).collect().head.toSeq == Seq("r0", "x"))
    // partial replacement leaves trailing columns untouched
    val part = pt.setRow(0L, Seq(lit("R0")))
    assert(part.rowAt(0L).collect().head.toSeq == Seq("R0", "x"))
  }

  test("fillMissing replaces nulls of matching type") {
    val dt = DataTable.fromStringRows(spark, Seq("a", "b"),
      Seq(Seq("x", null), Seq(null, "y")))
    val filled = dt.fillMissing("?")
    assert(filled.df.collect().map(_.toSeq).toSet == Set(Seq("x", "?"), Seq("?", "y")))
  }

  test("densify fills gaps with null rows") {
    val pt = strTable(Seq("a"), Seq(Seq("x"))).overlay(
      strTable(Seq("a"), Seq(Seq("y"))), 4, 0)
    val d = pt.densify
    assert(d.df.count() == 5L)
    assert(d.df.where(col("a").isNull).count() == 3L)
  }
}
