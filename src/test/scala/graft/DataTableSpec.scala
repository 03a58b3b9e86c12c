package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ports of the reference's core unit tests (tests/data-table.lisp) to the
  * DataFrame facade. */
class DataTableSpec extends SparkSpec {

  /** FIXTURES.md A.1 — the flagship all-string fixture (tests/data-table.lisp:15-24). */
  def fixture: DataTable = DataTable.fromStringRows(spark,
    Seq("first name", "last name", "job title", "number of hours", "id"),
    Seq(
      Seq("Russ", "Tyndall", "Software Developer", "26.2", "1"),
      Seq("Adam", "Smith", "Economist", "37.5", "2"),
      Seq("John", "Doe", "Anonymous Human", "42.1", "3"),
      Seq("Chuck", "Darwin", "Natural Philosipher", "17.68", "4"),
      Seq("Bill", "Shakespear", "Bard", "12.2", "5"),
      Seq("James", "Kirk", "Starship Captain", "13.1", "6")))

  test("flagship inference: (string string string double long) — tests/data-table.lisp:26-40") {
    val coerced = TypeGuess.coerceStringsToTypes(fixture)
    assert(coerced.schema.fields.map(_.dataType).toSeq ==
      Seq(StringType, StringType, StringType, DoubleType, LongType))
    val hours = coerced.df.select(col("`number of hours`")).collect().map(_.getDouble(0)).sorted
    assert(hours.toSeq == Seq(12.2, 13.1, 17.68, 26.2, 37.5, 42.1))
  }

  test("metadata: numberOfColumns fallback + numberOfRows — data-table.lisp:100-107") {
    assert(fixture.numberOfColumns == 5)
    assert(fixture.numberOfRows == 6L)
  }

  test("columnIndex is case-insensitive — data-table.lisp:409-414") {
    assert(fixture.columnIndex("FIRST NAME") == 0)
    assert(fixture.columnIndex("Id") == 4)
    assert(fixture.columnIndex("nope") == -1)
  }

  test("selectColumns: reorder + case-insens + unknown errors — tests/data-table.lisp:171-189") {
    val sel = fixture.selectColumns(Seq("ID", "first name"))
    assert(sel.columnNames == Seq("id", "first name"))
    intercept[IllegalArgumentException](fixture.selectColumns(Seq("missing")))
  }

  test("addColumn at index with default — tests/data-table.lisp:42-53") {
    val dt = fixture.addColumn("seniority", lit(null).cast(StringType), 1)
    assert(dt.columnNames == Seq("first name", "seniority", "last name", "job title", "number of hours", "id"))
    assert(dt.df.where(col("seniority").isNull).count() == 6L)
  }

  test("subTableCols keeps names — tests/data-table.lisp:102-125") {
    val sub = fixture.subTableCols(0, 3)
    assert(sub.columnNames == Seq("first name", "last name", "job title"))
    assert(sub.dataEquals(fixture.selectColumns(Seq("first name", "last name", "job title"))))
  }

  test("dataEquals: multiset compare — data-table.lisp:210-216") {
    assert(fixture.dataEquals(fixture))
    assert(!fixture.dataEquals(DataTable(fixture.df.limit(3))))
  }

  test("fromMaps: keys from first record, missing→null, extras dropped — tests/data-table.lisp:127-169") {
    val dt = DataTable.fromMaps(spark, Seq(
      Map("a" -> 1L, "b" -> 2L, "c" -> 3L),
      Map("c" -> 6L, "a" -> 4L, "d" -> 99L),
      Map("b" -> 7L, "a" -> 5L, "c" -> 8L)))
    assert(dt.columnNames == Seq("a", "b", "c"))
    val b = dt.df.orderBy(col("a")).select(col("b")).collect().map(r => Option(r.get(0)))
    assert(b.toSeq == Seq(Some(2L), None, Some(7L)))
  }

  test("toMaps round-trip — data-table.lisp:523-537") {
    val maps = fixture.toMaps()
    assert(maps.size == 6)
    assert(maps.head.keySet == Set("first name", "last name", "job title", "number of hours", "id"))
  }

  test("toMaps enforces the driver materialization bound (round-12 verdict #8)") {
    val ex = intercept[IllegalArgumentException] { fixture.toMaps(maxRows = 3) }
    assert(ex.getMessage.contains("driver materialization bound"))
    assert(fixture.toMaps(maxRows = 6).size == 6, "bound exactly met is fine")
  }

  test("symbolize / kebabCase — data-table.lisp:109-117") {
    assert(DataTable.kebabCase("first name") == "first-name")
    assert(DataTable.kebabCase("Number Of Hours") == "number-of-hours")
    assert(DataTable.kebabCase("first name") == DataTable.kebabCase(DataTable.kebabCase("first name")), "idempotent")
    assert(fixture.symbolizeColumnNames.columnNames.head == "first-name")
  }

  test("appendRows: missing keys null, extras dropped, types cast — data-table.lisp:156-163") {
    val dt = fixture.appendRows(Seq(
      Map("first name" -> "Grace", "id" -> "7", "extra" -> "dropped"),
      Map("last name" -> "Hopper")))
    assert(dt.numberOfRows == 8L)
    val grace = dt.df.where(col("`first name`") === "Grace").collect().head
    assert(grace.getAs[String]("id") == "7")
    assert(grace.isNullAt(grace.fieldIndex("last name")))
  }

  test("sampleRows: exact size, subset of original — tests/data-table.lisp:191-197") {
    val s = fixture.sampleRows(3)
    assert(s.numberOfRows == 3L)
    assert(s.df.exceptAll(fixture.df).isEmpty, "samples must come from the original")
    assert(fixture.sampleRows(100).numberOfRows == 6L) // n > rows → all rows
  }

  test("randomSample: seeded Bernoulli — subset, determinism, concentration") {
    import spark.implicits._
    val big = DataTable(spark.range(2000).select(col("id")))
    val s1 = big.randomSample(0.2, seed = 7L)
    val s2 = big.randomSample(0.2, seed = 7L)
    // subset of the original, deterministic for a fixed seed + layout
    assert(s1.df.exceptAll(big.df).isEmpty)
    assert(s1.df.exceptAll(s2.df).isEmpty && s2.df.exceptAll(s1.df).isEmpty)
    // binomial(2000, 0.2): mean 400, σ ≈ 17.9 — ±6σ bounds
    val n = s1.numberOfRows
    assert(n > 290 && n < 510, s"sample size $n far outside binomial range")
    // a different seed draws a different subset (overwhelmingly likely)
    val s3 = big.randomSample(0.2, seed = 8L)
    assert(!(s3.df.exceptAll(s1.df).isEmpty && s1.df.exceptAll(s3.df).isEmpty))
  }

  test("withColumnType casts — data-table.lisp:416-423") {
    val dt = fixture.withColumnType("id", LongType)
    assert(dt.columnType("ID") == LongType)
  }

  test("fromCsv PERMISSIVE: ragged rows null-pad, never fail the scan (fill-in-missing-cells analog)") {
    // the reference squares ragged tables post-hoc (data-table.lisp:240-264);
    // at scale malformed rows must not kill a 100 TB ingest — PERMISSIVE
    // null-pads short rows instead of failing the scan
    val dir = new java.io.File("target/tmp_ragged_csv")
    dir.mkdirs()
    java.nio.file.Files.writeString(dir.toPath.resolve("part.csv"),
      "a,b,c\n1,x,2.5\n2,y\n3\n4,z,9.0\n")
    val dt = DataTable.fromCsv(spark, dir.getPath, header = true, autoType = true)
    assert(dt.numberOfRows == 4L)
    // short rows null-padded; typed columns still infer (a→long, c→double)
    assert(dt.columnType("a") == org.apache.spark.sql.types.LongType)
    assert(dt.columnType("c") == org.apache.spark.sql.types.DoubleType)
    val r3 = dt.df.where(col("a") === 3L).collect().head
    assert(r3.isNullAt(1) && r3.isNullAt(2))
  }

  test("tableExists catalog probe — clsql-data-table.lisp:8-10") {
    fixture.df.createOrReplaceTempView("fixture_view")
    assert(DataTable.tableExists(spark, "fixture_view"))
    assert(!DataTable.tableExists(spark, "no_such_table"))
  }
}
