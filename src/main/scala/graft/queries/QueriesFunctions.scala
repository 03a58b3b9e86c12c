package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Function-library coverage: extended window functions, exact percentiles,
  * collect aggregates, date and string scalar batteries — each pinned
  * cross-engine against DuckDB. */
object QueriesFunctions {

  val queries: Map[String, Q] = Map(
    // Boundary-value window functions over a FULL frame (unbounded both
    // ways): first/second/last account holder per nation — constant per
    // partition, collapsed to one row per nation. Total order inside the
    // window (acctbal, custkey) keeps every boundary pick deterministic.
    "window_nth" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer")
        .select(col("c_nationkey"),
          first(col("c_name")).over(w).as("poorest"),
          nth_value(col("c_name"), 2).over(w).as("second_poorest"),
          last(col("c_name")).over(w).as("richest"))
        .distinct()
        .orderBy(col("c_nationkey"))
    }),
    // lag / lead / ntile / first_value over per-customer order history.
    "window_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
          round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          round(first(col("o_totalprice")).over(w), 2).as("first_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // RANGE frame: sum of prices within ±5000 of each order's price.
    "window_range_frame" -> ((s, dir) => {
      val w = Window.orderBy(col("o_totalprice")).rangeBetween(-5000L, 5000L)
      t(s, dir, "orders").where(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          count(lit(1)).over(w).as("n_similar"),
          round(sum(col("o_totalprice")).over(w), 2).as("sum_similar"))
        .orderBy(col("o_orderkey"))
    }),

    // Exact percentiles (continuous interpolation) per group.
    "agg_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_quantity, 0.25)"), 4).as("q1_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Sketch percentiles (t-digest style accuracy): the sketch values are
    // engine-specific, so the DECLARED output is the exact percentiles plus
    // within-tolerance flags for the sketch (accuracy=1000 → ≤0.1% rank
    // error; 2% value tolerance is generous on TPC-H price density).
    //
    // The EXACT side deliberately avoids Spark's `percentile` aggregate
    // (it buffers every group value in one ObjectHashAggregate buffer — a
    // 100 TB non-starter with only 3 groups): prices recast to integer
    // cents make the domain discrete and BOUNDED, so a (flag, cents)
    // count-histogram + a cumulative window OVER THE HISTOGRAM yields the
    // R-7 interpolated quantile fully distributedly — the window sorts
    // ~|price domain| rows, never the corpus. cents/100.0 is bit-identical
    // to the source double for 2-decimal rationals, so the interpolation
    // reproduces quantile_cont exactly.
    "agg_approx_percentile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_extendedprice"),
        round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
      val exact = graft.operators.HistogramQuantile.quantiles(
        li, Seq("l_returnflag"), "cents", Seq(0.5, 0.9, 0.99), scale = 100.0)
      val sk = li.groupBy(col("l_returnflag").as("skflag"))
        .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)").as("pcts"))
      def ok(i: Int, ex: Column) = (abs(element_at(col("pcts"), i) - ex) <= ex * 0.02)
      exact.join(sk, col("l_returnflag") === col("skflag"))
        .select(col("l_returnflag"),
          round(col("q_0"), 4).as("p50"),
          round(col("q_1"), 4).as("p90"),
          round(col("q_2"), 4).as("p99"),
          ok(1, col("q_0")).as("p50_ok"),
          ok(2, col("q_1")).as("p90_ok"),
          ok(3, col("q_2")).as("p99_ok"),
          col("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Collect aggregates: sorted distinct set, joined to a stable string.
    "agg_collect" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Date battery: trunc/extract/arithmetic on order dates.
    "date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast(LongType).as("y"),
          quarter(col("o_orderdate")).cast(LongType).as("q"),
          month(col("o_orderdate")).cast(LongType).as("m"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          datediff(lit("1998-01-01").cast(DateType), to_date(col("o_orderdate")))
            .cast(LongType).as("days_to_98"))
        .orderBy(col("o_orderkey")).limit(1000)
    }),

    // Typed Aggregator UDAFs (partial->final merged like built-ins).
    "agg_custom_udaf" -> ((s, dir) => {
      import graft.functions.Aggregators
      val rms = udaf(Aggregators.Rms)
      val geo = udaf(Aggregators.GeoMean)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(rms(col("l_extendedprice")), 4).as("rms_price"),
          round(geo(col("l_quantity")), 6).as("geo_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // MapType surface: JSON -> typed map, key/value extraction, and a map
    // built from entries (the reference has no nested types at all; this is
    // the ArrayType/MapType extension of SURVEY §1.3).
    "map_funcs" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("props_map", from_json(col("props"), MapType(StringType, LongType)))
      e.select(col("event_id"),
          array_join(map_keys(col("props_map")), ",").as("keys"),
          element_at(col("props_map"), "k").as("k_val"),
          size(col("props_map")).cast(LongType).as("n_entries"),
          element_at(map_from_arrays(array(lit("type")), array(col("event_type"))), "type").as("roundtrip"))
        .orderBy(col("event_id")).limit(2000)
    }),

    // String battery incl. levenshtein (fuzzy-match building block).
    "string_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          lower(col("p_name")).as("lname"),
          reverse(col("p_brand")).as("rbrand"),
          lpad(col("p_partkey").cast(StringType), 8, "0").as("padded"),
          replace(col("p_type"), lit(" "), lit("_")).as("snake_type"),
          levenshtein(col("p_brand"), lit("Brand#13")).cast(LongType).as("lev"),
          split(col("p_type"), " ").getItem(0).as("first_word"))
        .orderBy(col("p_partkey")).limit(500)
    }),

    // Array function library over the token arrays — all native array
    // expressions (sort/distinct/slice/contains/element_at), none of the
    // interpreted higher-order kind (CLAUDE.md perf rule).
    "array_funcs" -> ((s, dir) => {
      val toks = graft.functions.TextFns.tokens(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"),
          size(col("t")).cast(LongType).as("n_tokens"),
          size(array_distinct(col("t"))).cast(LongType).as("n_distinct"),
          array_join(slice(sort_array(array_distinct(col("t"))), 1, 3), ",").as("first3"),
          array_contains(col("t"), "spark").as("has_spark"),
          // try_ variants: ANSI element_at throws on an empty array, while
          // the oracle's t[1]/t[-1] return NULL — a degenerate (empty-text)
          // doc must yield a null cell, not kill the query
          try_element_at(col("t"), lit(1)).as("first_tok"),
          try_element_at(col("t"), lit(-1)).as("last_tok"))
        .orderBy(col("doc_id")).limit(500)
    }),

    // argmax/argmin + ordered-statistic aggregates. max_by alone is
    // nondeterministic under value ties, so the argmax travels as
    // max(struct(value, key)) — lexicographic struct ordering makes the tie
    // break explicit and engine-portable (DuckDB compares struct_pack the
    // same way). median is the exact interpolated one (both engines R-7).
    "agg_extra" -> ((s, dir) => {
      val pk = struct(col("l_extendedprice").as("p"), col("l_orderkey").as("k"))
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(max(pk).getField("k").as("argmax_key"),
          min(pk).getField("k").as("argmin_key"),
          median(col("l_quantity")).as("med"),
          count_if(col("l_discount") > 0.05).as("cif"),
          bool_and(col("l_quantity") > 0).as("ba"),
          bool_or(col("l_tax") > 0.07).as("bo"))
        .orderBy(col("l_returnflag"))
    }),

    // Variant (semi-structured) round-trip: build JSON, parse to VariantType,
    // extract typed paths — the schema-on-read surface for ragged event
    // payloads (variant_get prunes to the requested path; no full
    // re-stringification per field the get_json_object way).
    "json_variant" -> ((s, dir) => {
      val payload = to_json(struct(col("o_orderkey").as("id"),
        col("o_orderstatus").as("st"),
        struct(round(col("o_totalprice"), 2).as("price")).as("nest")))
      t(s, dir, "orders")
        .select(col("o_orderkey"), parse_json(payload).as("v"))
        .select(col("o_orderkey"),
          variant_get(col("v"), "$.st", "string").as("st"),
          variant_get(col("v"), "$.nest.price", "double").as("price"))
        .orderBy(col("o_orderkey")).limit(1000)
    }),

    // Bivariate statistical aggregates: corr / covar / linear-regression
    // slope+intercept per group — one partial-aggregable pass (all are
    // algebraic: (n, Σx, Σy, Σxy, Σx², Σy²) moments merge associatively, so
    // map-side combine works and no group ever buffers its values).
    "stats_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"))
        .orderBy(col("l_returnflag"))
    }))

  val oracle: Map[String, String] = Map(
    "window_nth" ->
      """SELECT DISTINCT c_nationkey,
        |  first_value(c_name) OVER w AS poorest,
        |  nth_value(c_name, 2) OVER w AS second_poorest,
        |  last_value(c_name) OVER w AS richest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_nationkey""".stripMargin,
    "agg_extra" ->
      """SELECT l_returnflag,
        |  max(struct_pack(p := l_extendedprice, k := l_orderkey))['k'] AS argmax_key,
        |  min(struct_pack(p := l_extendedprice, k := l_orderkey))['k'] AS argmin_key,
        |  median(l_quantity) AS med,
        |  CAST(count_if(l_discount > 0.05) AS BIGINT) AS cif,
        |  bool_and(l_quantity > 0) AS ba, bool_or(l_tax > 0.07) AS bo
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "json_variant" ->
      """SELECT o_orderkey, o_orderstatus AS st, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin,
    "array_funcs" ->
      s"""WITH d AS (SELECT doc_id, ${Tables.toksSql()} AS t FROM documents)
         |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |  array_to_string(list_slice(list_sort(list_distinct(t)), 1, 3), ',') AS first3,
         |  list_contains(t, 'spark') AS has_spark,
         |  t[1] AS first_tok, t[-1] AS last_tok
         |FROM d ORDER BY doc_id LIMIT 500""".stripMargin,
    "stats_funcs" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(first_value(o_totalprice) OVER w, 2) AS first_price
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_range_frame" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price,
        |  CAST(count(*) OVER w AS BIGINT) AS n_similar,
        |  round(sum(o_totalprice) OVER w, 2) AS sum_similar
        |FROM orders WHERE o_orderkey < 1000
        |WINDOW w AS (ORDER BY o_totalprice RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS q1_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_approx_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        |  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_collect" ->
      """SELECT l_returnflag,
        |  list_aggregate(list_sort(list(DISTINCT l_linestatus)), 'string_agg', ',') AS statuses,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin,
    "agg_custom_udaf" ->
      """SELECT l_returnflag,
        |  round(sqrt(avg(l_extendedprice * l_extendedprice)), 4) AS rms_price,
        |  round(exp(avg(ln(l_quantity)) FILTER (WHERE l_quantity > 0)), 6) AS geo_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "map_funcs" ->
      """SELECT event_id,
        |  array_to_string(json_keys(props), ',') AS keys,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_entries,
        |  event_type AS roundtrip
        |FROM events ORDER BY event_id LIMIT 2000""".stripMargin,
    "string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS lname, reverse(p_brand) AS rbrand,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |  replace(p_type, ' ', '_') AS snake_type,
        |  CAST(levenshtein(p_brand, 'Brand#13') AS BIGINT) AS lev,
        |  string_split(p_type, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin)
}
