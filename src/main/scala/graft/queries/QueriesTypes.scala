package graft.queries

import graft.{DataTable, TypeGuess}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Type-engine queries — the reference's schema-inference/coercion heart
  * (SURVEY.md §2.4) exercised over messy strings *constructed from* the
  * testdata, so the DuckDB oracle can recompute expected values from the
  * original typed columns (no parsing on the oracle side).
  */
object QueriesTypes {

  val queries: Map[String, Q] = Map(
    // trim-and-nullify (data-table.lisp:48-56): trim incl. NBSP/tab; "" or
    // "nil" (any case) → NULL.
    "trim_nullify" -> ((s, dir) => {
      val p = t(s, dir, "part")
      p.select(
          col("p_partkey"),
          TypeGuess.trimAndNullify(concat(lit("  "), col("p_brand"), lit(" \t"))).as("clean_brand"),
          TypeGuess.trimAndNullify(
            when(col("p_partkey") % 3 === 0, lit(" NIL ")).otherwise(concat(lit(" "), col("p_type")))
          ).as("maybe_nil"),
          TypeGuess.trimAndNullify(lit("   ")).as("all_space"))
        .orderBy(col("p_partkey")).limit(500)
    }),

    // relaxed-parse-float (data-table.lisp:74-90): strip [\s$,%] then parse;
    // null on garbage. Expected values are exact binary fractions, so the
    // oracle recomputes them arithmetically.
    "relaxed_float" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      l.select(
          col("l_orderkey"), col("l_linenumber"),
          TypeGuess.relaxedDouble(
            concat(lit(" $"), col("l_orderkey").cast(StringType), lit(",000.25 "))).as("messy_dollar"),
          TypeGuess.relaxedDouble(
            concat(col("l_quantity").cast(StringType), lit(" %"))).as("messy_pct"),
          TypeGuess.relaxedDouble(lit("n/a")).as("bad"))
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(1000)
    }),

    // guess-types-for-data-table (data-table.lisp:331-343): stringify typed
    // columns, infer back. date→long→double→string probe order; lattice unify.
    "guess_types" -> ((s, dir) => {
      val strs = t(s, dir, "lineitem").select(
        col("l_orderkey").cast(StringType).as("l_orderkey"),
        col("l_quantity").cast(StringType).as("l_quantity"),
        col("l_returnflag").as("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("l_shipdate"))
      val guessed = TypeGuess.guessTypes(DataTable(strs))
      import s.implicits._
      strs.columns.toSeq.map(c => (c, guessed.getOrElse(c, StringType).simpleString))
        .toDF("col_name", "guessed")
    }),

    // coerce-data-table-of-strings-to-types (data-table.lisp:387-407):
    // full pipeline — stringify, guess, cast back, then aggregate; the oracle
    // aggregates the original typed table, proving values round-tripped.
    "coerce_types" -> ((s, dir) => {
      val strs = t(s, dir, "lineitem").select(
        col("l_orderkey").cast(StringType).as("l_orderkey"),
        col("l_quantity").cast(StringType).as("l_quantity"),
        col("l_returnflag").as("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("l_shipdate"))
      val coerced = TypeGuess.coerceStringsToTypes(DataTable(strs)).df
      coerced.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_orderkey")).as("sum_key"),
          year(min(col("l_shipdate"))).cast(LongType).as("min_ship_year"))
        .orderBy(col("l_returnflag"))
    }))

  private val trimBag = "' ' || chr(9) || chr(10) || chr(13) || chr(160)"

  val oracle: Map[String, String] = Map(
    "trim_nullify" ->
      s"""WITH m AS (SELECT p_partkey,
         |    trim('  ' || p_brand || ' ' || chr(9), $trimBag) AS clean_brand,
         |    CASE WHEN p_partkey % 3 = 0 THEN 'NIL' ELSE trim(' ' || p_type, $trimBag) END AS raw_nil
         |  FROM part ORDER BY p_partkey LIMIT 500)
         |SELECT p_partkey,
         |  CASE WHEN clean_brand = '' OR lower(clean_brand) = 'nil' THEN NULL ELSE clean_brand END AS clean_brand,
         |  CASE WHEN raw_nil = '' OR lower(raw_nil) = 'nil' THEN NULL ELSE raw_nil END AS maybe_nil,
         |  CAST(NULL AS VARCHAR) AS all_space
         |FROM m ORDER BY p_partkey""".stripMargin,
    "relaxed_float" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_orderkey * 1000 AS DOUBLE) + 0.25 AS messy_dollar,
        |  CAST(l_quantity AS DOUBLE) AS messy_pct,
        |  CAST(NULL AS DOUBLE) AS bad
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000""".stripMargin,
    "guess_types" ->
      """SELECT * FROM (VALUES
        |  ('l_orderkey', 'bigint'), ('l_quantity', 'double'),
        |  ('l_returnflag', 'string'), ('l_shipdate', 'timestamp')) t(col_name, guessed)""".stripMargin,
    "coerce_types" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_key,
        |  CAST(year(min(l_shipdate)) AS BIGINT) AS min_ship_year
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
