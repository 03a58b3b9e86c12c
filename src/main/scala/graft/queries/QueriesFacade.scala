package graft.queries

import graft.{DataTable, Fns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Facade-parity queries — the reference's core table operators (SURVEY.md
  * §2.1–2.3, 2.5, 2.6) declared as oracle-checkable queries over the parquet
  * testdata.
  *
  * Positional queries (`cell_access`, `set_cell`, `sub_table`,
  * `overlay_region`) go through [[graft.PositionalTable]]: `_row_idx` is
  * derived from an explicit sort key (never implicit order), assigned with a
  * distributed range-partition + zipWithIndex — no single-partition window,
  * so the same plan holds at 100 TB. The DuckDB oracles express the same
  * positions with `row_number() OVER (ORDER BY key) - 1`.
  */
object QueriesFacade {

  val queries: Map[String, Q] = Map(
    // number-of-rows / number-of-columns (reference: data-table.lisp:100-107).
    "meta_counts" -> ((s, dir) => {
      val dt = DataTable(t(s, dir, "lineitem"))
      import s.implicits._
      Seq((dt.numberOfRows, dt.numberOfColumns.toLong)).toDF("n_rows", "n_cols")
    }),

    // symbolize-column-names (data-table.lisp:109-117): "r_regionkey" → "r-regionkey".
    "rename_columns" -> ((s, dir) => {
      DataTable(t(s, dir, "region")).symbolizeColumnNames.df.orderBy(col("`r-regionkey`"))
    }),

    // data-table-value row read (data-table.lisp:119-129): row 5 under n_nationkey order.
    "cell_access" -> ((s, dir) => {
      DataTable(t(s, dir, "nation")).withRowIdx(Seq(col("n_nationkey"))).rowAt(5)
    }),

    // (setf data-table-value) (data-table.lisp:139-170): functional single-cell write.
    "set_cell" -> ((s, dir) => {
      DataTable(t(s, dir, "nation")).withRowIdx(Seq(col("n_nationkey")))
        .setCell(3, "n_name", lit("REDACTED"))
        .table.df.orderBy(col("n_nationkey"))
    }),

    // add-column at an index with a default (data-table.lisp:494-502).
    "add_column" -> ((s, dir) => {
      DataTable(t(s, dir, "region")).addColumn("priority", lit(1L), 1)
        .df.orderBy(col("r_regionkey"))
    }),

    // make-sub-table (data-table.lisp:172-191): cols [1,3) × rows [10,20).
    "sub_table" -> ((s, dir) => {
      DataTable(t(s, dir, "customer")).withRowIdx(Seq(col("c_custkey")))
        .subTable(1, 3, 10L, 20L)
        .df.orderBy(col(graft.PositionalTable.RowIdx))
    }),

    // data-table-data-compare (data-table.lisp:210-216) as a declared query:
    // identity compare is true; compare against a filtered copy is false.
    "table_compare" -> ((s, dir) => {
      val r = DataTable(t(s, dir, "region"))
      val filtered = DataTable(r.df.where(col("r_regionkey") < 3))
      import s.implicits._
      Seq((r.dataEquals(r), r.dataEquals(filtered))).toDF("eq_self", "eq_filtered")
    }),

    // overlay-region (data-table.lisp:218-238): paste region names into the
    // nation table at (rowOff=2, colOff=1) — spreadsheet-style composition.
    "overlay_region" -> ((s, dir) => {
      val base = DataTable(t(s, dir, "nation")).withRowIdx(Seq(col("n_nationkey")))
      val ovl = DataTable(t(s, dir, "region")).selectColumns(Seq("r_name"))
        .withRowIdx(Seq(col("r_name")))
      base.overlay(ovl, rowOff = 2L, colOff = 1)
        .df.orderBy(col(graft.PositionalTable.RowIdx))
    }),

    // alists/plists-to-data-table (data-table.lisp:504-521): keys from the
    // first record; missing keys → null; extra keys dropped.
    "from_maps" -> ((s, dir) => {
      DataTable.fromMaps(s, Seq(
        Map("a" -> 1L, "b" -> 2L, "c" -> 3L),
        Map("a" -> 4L, "c" -> 6L),
        Map("a" -> 7L, "b" -> 8L, "c" -> 9L, "d" -> 99L))).df
    }),

    // sample-rows re-expressed deterministically (data-table.lisp:295-307):
    // 1-in-7 systematic sample by key, aggregated so the subset property is
    // oracle-checkable.
    "sample_rows" -> ((s, dir) => {
      DataTable(t(s, dir, "documents")).systematicSample("doc_id", 7)
        .df.agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
    }),

    // One-pass numeric summary (count/min/max/mean/stddev per column).
    "describe_stats" -> ((s, dir) => {
      val stats = DataTable(t(s, dir, "lineitem")
        .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"))).describeStats
      stats.select(col("col_name"), col("n"),
          round(col("min"), 4).as("min"), round(col("max"), 4).as("max"),
          round(col("mean"), 4).as("mean"), round(col("stddev"), 4).as("stddev"))
        .orderBy(col("col_name"))
    }),

    // coerce-data-table-values-for-output (data-table.lisp:437-469):
    // nulls → "", doubles → %.2f, longs → digits; all-string output.
    "format_output" -> ((s, dir) => {
      val proj = t(s, dir, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(50)
        .select(
          col("l_orderkey"),
          col("l_quantity"),
          col("l_extendedprice"),
          nullif(col("l_returnflag"), lit("R")).as("flag_or_null"))
      Fns.formatTable(DataTable(proj)).df
    }),

    // DataFrameNaFunctions surface — fill/drop/replace, the distributed
    // analog of the reference's fill-in-missing-cells (data-table.lisp:
    // 240-264, which pads ragged rows with a fill value). Nulls are
    // injected deterministically (testdata has none), then: na.fill gives
    // the sentinel count, na.drop the surviving rows, na.replace a value
    // remap — one summary row checks all three against the oracle's
    // CASE/COALESCE equivalents.
    "na_funcs" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("event_type"),
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")).as("v"))
      // fill then replace compose on one frame; null-count AFTER the fill
      // proves the fill (robustly — counting the -1.0 sentinel would
      // conflate with naturally occurring values). Two jobs total: the
      // dropped count (exercising na.drop) and one conditional aggregate.
      val fr = e.na.fill(Map("v" -> -1.0)).na.replace("event_type", Map("click" -> "tap"))
      val nAfterDrop = e.na.drop(Seq("v")).count()
      val stats = fr.agg(
        count(lit(1)).as("n_total"),
        count(when(col("v").isNull, 1)).as("n_nulls_after_fill"),
        count(when(col("event_type") === "tap", 1)).as("n_tap"),
        count(when(col("event_type") === "click", 1)).as("n_click_left")).collect().head
      import s.implicits._
      Seq((stats.getLong(0), nAfterDrop, stats.getLong(0) - nAfterDrop,
          stats.getLong(1), stats.getLong(2), stats.getLong(3)))
        .toDF("n_total", "n_after_drop", "n_filled", "n_nulls_after_fill", "n_tap", "n_click_left")
    }))

  val oracle: Map[String, String] = Map(
    "na_funcs" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(count(CASE WHEN event_id % 7 <> 0 THEN 1 END) AS BIGINT) AS n_after_drop,
        |  CAST(count(CASE WHEN event_id % 7 = 0 THEN 1 END) AS BIGINT) AS n_filled,
        |  CAST(0 AS BIGINT) AS n_nulls_after_fill,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_tap,
        |  CAST(0 AS BIGINT) AS n_click_left
        |FROM events""".stripMargin,
    "meta_counts" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(11 AS BIGINT) AS n_cols FROM lineitem",
    "rename_columns" ->
      """SELECT r_regionkey AS "r-regionkey", r_name AS "r-name" FROM region ORDER BY 1""",
    "cell_access" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey LIMIT 1 OFFSET 5",
    "set_cell" ->
      """SELECT n_nationkey,
        |  CASE WHEN rn = 4 THEN 'REDACTED' ELSE n_name END AS n_name, n_regionkey
        |FROM (SELECT *, row_number() OVER (ORDER BY n_nationkey) AS rn FROM nation)
        |ORDER BY n_nationkey""".stripMargin,
    "add_column" ->
      "SELECT r_regionkey, CAST(1 AS BIGINT) AS priority, r_name FROM region ORDER BY r_regionkey",
    "sub_table" ->
      """SELECT c_name, c_nationkey, CAST(rn - 1 AS BIGINT) AS _row_idx
        |FROM (SELECT c_name, c_nationkey, row_number() OVER (ORDER BY c_custkey) AS rn FROM customer)
        |WHERE rn >= 11 AND rn <= 20 ORDER BY _row_idx""".stripMargin,
    "table_compare" ->
      "SELECT CAST(1 AS BOOLEAN) AS eq_self, CAST(0 AS BOOLEAN) AS eq_filtered",
    "overlay_region" ->
      """WITH b AS (SELECT n_nationkey, n_name, n_regionkey,
        |    CAST(row_number() OVER (ORDER BY n_nationkey) - 1 AS BIGINT) AS _row_idx FROM nation),
        |  o AS (SELECT r_name,
        |    CAST(row_number() OVER (ORDER BY r_name) + 1 AS BIGINT) AS _row_idx FROM region)
        |SELECT b.n_nationkey, coalesce(o.r_name, b.n_name) AS n_name, b.n_regionkey, b._row_idx
        |FROM b LEFT JOIN o USING (_row_idx) ORDER BY _row_idx""".stripMargin,
    "from_maps" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT)),
        |  (4, NULL, 6), (7, 8, 9)) t(a, b, c)""".stripMargin,
    "sample_rows" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(min(doc_id) AS BIGINT) AS first_id, CAST(max(doc_id) AS BIGINT) AS last_id
        |FROM documents WHERE doc_id % 7 = 0""".stripMargin,
    "describe_stats" ->
      """SELECT col_name, n, round(mn, 4) AS min, round(mx, 4) AS max,
        |  round(av, 4) AS mean, round(sd, 4) AS stddev FROM (
        |  SELECT 'l_quantity' AS col_name, CAST(count(l_quantity) AS BIGINT) AS n,
        |    CAST(min(l_quantity) AS DOUBLE) AS mn, CAST(max(l_quantity) AS DOUBLE) AS mx,
        |    avg(l_quantity) AS av, stddev_samp(l_quantity) AS sd FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', count(l_extendedprice),
        |    min(l_extendedprice), max(l_extendedprice),
        |    avg(l_extendedprice), stddev_samp(l_extendedprice) FROM lineitem
        |  UNION ALL SELECT 'l_discount', count(l_discount),
        |    min(l_discount), max(l_discount),
        |    avg(l_discount), stddev_samp(l_discount) FROM lineitem)
        |ORDER BY col_name""".stripMargin,
    "format_output" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
        |  printf('%.2f', l_quantity) AS l_quantity,
        |  printf('%.2f', l_extendedprice) AS l_extendedprice,
        |  coalesce(nullif(l_returnflag, 'R'), '') AS flag_or_null
        |FROM (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 50)""".stripMargin)
}
