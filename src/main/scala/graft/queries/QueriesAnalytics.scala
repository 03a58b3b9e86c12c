package graft.queries

import graft.functions.TextFns
import graft.operators.DiscreteQuantile
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Warehouse-analytics operators rounding out the extension surface
  * (SURVEY.md §2.8): recursive-CTE hierarchy walks, cohort retention,
  * a data-quality expectation suite, key-skew diagnostics, rolling-window
  * anomaly flags, Unicode NFC canonicalization, and a fuzzy (edit-distance)
  * join. The reference has none of these (its whole surface is
  * data-table.lisp:4-34); each is designed around one bounded shuffle.
  */
object QueriesAnalytics {

  val queries: Map[String, Q] = Map(
    // Recursive CTE (Spark 4's WITH RECURSIVE): walk every customer key up
    // its binary-ancestor chain (node -> node div 2) to the root and profile
    // nodes per depth. The iteration count is bounded by log2(max key) —
    // ~40 rounds at 100 TB — and each round carries only (child, node,
    // depth), so the recursion never re-touches the base table after the
    // anchor scan.
    "sql_recursive" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(
        """WITH RECURSIVE anc(child, node, depth) AS (
          |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer
          |  UNION ALL
          |  SELECT child, node DIV 2, depth + 1 FROM anc WHERE node > 1
          |)
          |SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
          |  sum(child) AS sum_child
          |FROM anc GROUP BY depth ORDER BY depth""".stripMargin)
    }),

    // Cohort retention: users grouped by first-seen week, activity counted
    // per week-offset. ONE hash shuffle on user_id computes the cohort via
    // a window min (no self-join), then the (cohort, offset) aggregate is
    // cohort-count-sized. Weeks are Monday-truncated dates in both engines,
    // so the day-difference is an exact multiple of 7.
    "cohort_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      ev.withColumn("cohort_week", min(col("w")).over(Window.partitionBy("user_id")))
        .withColumn("week_offset", expr("CAST(datediff(w, cohort_week) DIV 7 AS BIGINT)"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count_distinct(col("user_id")).as("active_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Data-quality expectation suite: each check is ONE independent
    // scan+aggregate (the FK check folds its probe into a broadcast left
    // join, counting misses and total in the same pass), unioned into a
    // per-check report. Structural checks (FK integrity, PK uniqueness)
    // pass on this corpus; the range checks trip on real rows — both paths
    // exercised. At 100 TB each check stays a map-side-combined aggregate;
    // the dim probe side is broadcast (or a bloom filter when the dim
    // outgrows the broadcast threshold).
    "dq_checks" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val li = t(s, dir, "lineitem")
      val ev = t(s, dir, "events")
      def report(name: String, agg: org.apache.spark.sql.DataFrame) =
        agg.select(lit(name).as("check_name"), col("violations"), col("total"),
          (col("violations") === 0L).as("pass"))
      val fk = report("orders_fk_customer",
        orders.join(broadcast(cust.select(col("c_custkey")).distinct()),
            col("o_custkey") === col("c_custkey"), "left")
          .agg(count(when(col("c_custkey").isNull, 1)).as("violations"),
            count(lit(1)).as("total")))
      val pk = report("orders_pk_unique",
        orders.agg((count(lit(1)) - count_distinct(col("o_orderkey"))).as("violations"),
          count(lit(1)).as("total")))
      val qty = report("lineitem_qty_le_45",
        li.agg(count(when(col("l_quantity") > 45, 1)).as("violations"),
          count(lit(1)).as("total")))
      val nn = report("customer_name_notnull",
        cust.agg(count(when(col("c_name").isNull, 1)).as("violations"),
          count(lit(1)).as("total")))
      val cap = report("events_value_cap_450",
        ev.agg(count(when(col("value") > 450, 1)).as("violations"),
          count(lit(1)).as("total")))
      fk.unionAll(pk).unionAll(qty).unionAll(nn).unionAll(cap)
        .orderBy(col("check_name"))
    }),

    // Key-skew diagnostic for shuffle planning: rows-per-key distribution of
    // lineitem.l_orderkey. One map-side-combined shuffle builds per-key
    // counts, then — because the rows-per-key DOMAIN is tiny even when the
    // key space is huge — a count-of-counts histogram collapses to a handful
    // of rows, collects to the driver, and DiscreteQuantile reads exact
    // percentiles off it (same no-value-buffering trick as outlier_mad; a
    // `percentile(cnt, …)` aggregate would buffer every key's count in one
    // reducer at 100 TB).
    "skew_profile" -> ((s, dir) => {
      val hist = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("cnt")).agg(count(lit(1)).as("freq"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val nKeys = hist.map(_._2).sum
      val total = hist.map(h => h._1 * h._2).sum
      val maxCnt = hist.map(_._1).max
      val h = hist.map(x => (x._1.toDouble, x._2)).toSeq
      val p50 = DiscreteQuantile.quantileOfHistogram(h, 0.5)
      val p99 = DiscreteQuantile.quantileOfHistogram(h, 0.99)
      val avg = total.toDouble / nKeys
      s.range(1).select(
        lit(nKeys).as("n_keys"), lit(total).as("total_rows"),
        lit(maxCnt).as("max_cnt"),
        round(lit(p50), 4).as("p50_cnt"), round(lit(p99), 4).as("p99_cnt"),
        round(lit(maxCnt / avg), 4).as("skew_ratio"),
        round(lit(maxCnt.toDouble / total), 6).as("top1_share"))
    }),

    // Rolling-window anomaly flags: per event type, z-score each value
    // against the mean/stddev of the 20 STRICTLY PRECEDING observations
    // (no self-inclusion — a spike must not mask itself). One window sort
    // per type; state is the 20-row frame, O(1) per key. Full-frame
    // requirement (nw = 20) keeps early under-sampled rows out.
    "ts_anomaly" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("ts").isNotNull && col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-20, -1)
      ev.withColumn("mu", avg(col("value")).over(w))
        .withColumn("sd", stddev_samp(col("value")).over(w))
        .withColumn("nw", count(col("value")).over(w))
        .where(col("nw") === 20 && col("sd") > 1e-9 &&
          abs((col("value") - col("mu")) / col("sd")) > 3.0)
        .select(col("event_id"), col("event_type"),
          round((col("value") - col("mu")) / col("sd"), 3).as("z"))
        .orderBy(col("event_id"))
    }),

    // Unicode NFC canonicalization via the native codegen'd NfcNormalize
    // expression (ASCII fast path: byte scan, zero allocation). Decomposed
    // combining sequences are synthesized deterministically per doc_id so
    // the oracle can pin exact composition behavior (e+U+0301 -> U+00E9);
    // the ASCII branch proves the identity path. Narrow per-row map — no
    // shuffle at any scale.
    "unicode_norm" -> ((s, dir) => {
      val dec = concat(substring(col("text"), 1, 32),
        when(col("doc_id") % 3 === 0, lit("é"))
          .when(col("doc_id") % 3 === 1, lit("ä"))
          .otherwise(lit("x")))
      t(s, dir, "documents")
        .select(col("doc_id"), dec.as("ds"))
        .withColumn("nrm", TextFns.nfc(col("ds")))
        .select(col("doc_id"),
          length(col("ds")).as("len_dec"),
          length(col("nrm")).as("len_nfc"),
          expr("right(nrm, 4)").as("tail4"),
          (col("nrm") =!= col("ds")).as("changed"))
        .orderBy(col("doc_id"))
    }),

    // Fuzzy join: near-duplicate part names by edit distance within brand
    // blocks. Blocking (p_brand equi-key) bounds the pair space; the
    // length-band predicate |len(a)-len(b)| <= 2 is implied by lev <= 2, so
    // it prunes pairs BEFORE the banded-DP levenshtein runs without
    // changing results; the 3-arg thresholded levenshtein early-exits rows
    // that can't be within distance 2. At 100 TB the same shape holds:
    // shuffle each side by block key, band within block.
    "fuzzy_join" -> ((s, dir) => {
      // DISTINCT-VALUE blocking: edit distance runs once per distinct
      // (brand, name) pair, then instance pair counts expand by
      // multiplicity (c1*c2 cross, C(c,2) within a duplicated name — every
      // unordered instance pair is counted exactly once, matching the
      // instance-level a_key < b_key join the oracle runs). At 100 TB the
      // distinct-name space is orders of magnitude below the instance
      // space, so the quadratic work shrinks quadratically; name lengths
      // are precomputed per side so the band check reads a column instead
      // of re-scanning the string per candidate pair.
      val d = t(s, dir, "part")
        .groupBy(col("p_brand").as("brand"), col("p_name").as("name"))
        .agg(count(lit(1)).as("c"))
        .withColumn("len", length(col("name")))
      val a = d.select(col("brand"), col("name").as("a_name"),
        col("c").as("a_c"), col("len").as("a_len"))
      val b = d.select(col("brand").as("b_brand"), col("name").as("b_name"),
        col("c").as("b_c"), col("len").as("b_len"))
      val cross = a.join(b, col("brand") === col("b_brand") &&
          col("a_name") < col("b_name") &&
          abs(col("a_len") - col("b_len")) <= 2)
        .withColumn("dist", levenshtein(col("a_name"), col("b_name"), 2))
        .where(col("dist") >= 0 && col("dist") <= 2)
        .select(col("brand"), (col("a_c") * col("b_c")).as("n"), col("dist"))
      val selfPairs = d.where(col("c") > 1)
        .select(col("brand"), expr("c * (c - 1) DIV 2").as("n"),
          lit(0).as("dist"))
      cross.unionByName(selfPairs)
        .groupBy(col("brand"))
        .agg(sum(col("n")).as("n_pairs"), min(col("dist")).as("min_dist"),
          round(sum(col("dist") * col("n")) / sum(col("n")), 4).as("avg_dist"))
        .orderBy(col("brand"))
    }))

  val oracle: Map[String, String] = Map(
    "sql_recursive" ->
      """WITH RECURSIVE anc(child, node, depth) AS (
        |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer
        |  UNION ALL
        |  SELECT child, node // 2, depth + 1 FROM anc WHERE node > 1
        |)
        |SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(child) AS BIGINT) AS sum_child
        |FROM anc GROUP BY depth ORDER BY depth""".stripMargin,
    "cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |wc AS (SELECT user_id, w,
        |    min(w) OVER (PARTITION BY user_id) AS cohort_week FROM ev)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, w) // 7 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        |FROM wc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dq_checks" ->
      """SELECT check_name, violations, total, violations = 0 AS pass FROM (
        |  SELECT 'orders_fk_customer' AS check_name,
        |    CAST(count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT) AS violations,
        |    CAST(count(*) AS BIGINT) AS total
        |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT 'orders_pk_unique',
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
        |    CAST(count(*) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_qty_le_45',
        |    CAST(count(CASE WHEN l_quantity > 45 THEN 1 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'customer_name_notnull',
        |    CAST(count(CASE WHEN c_name IS NULL THEN 1 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT) FROM customer
        |  UNION ALL
        |  SELECT 'events_value_cap_450',
        |    CAST(count(CASE WHEN value > 450 THEN 1 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT) FROM events
        |) ORDER BY check_name""".stripMargin,
    "skew_profile" ->
      """WITH counts AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS total_rows,
        |  max(cnt) AS max_cnt,
        |  round(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
        |  round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
        |  round(max(cnt) / avg(cnt), 4) AS skew_ratio,
        |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top1_share
        |FROM counts""".stripMargin,
    "ts_anomaly" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, date_trunc('microseconds', ts) AS ts, value
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL),
        |w AS (SELECT event_id, event_type, value,
        |    avg(value) OVER win AS mu,
        |    stddev_samp(value) OVER win AS sd,
        |    count(value) OVER win AS nw
        |  FROM ev
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, round((value - mu) / sd, 3) AS z
        |FROM w WHERE nw = 20 AND sd > 1e-9 AND abs((value - mu) / sd) > 3.0
        |ORDER BY event_id""".stripMargin,
    "unicode_norm" ->
      """WITH d AS (
        |  SELECT doc_id, substring(text, 1, 32) ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'e' || chr(769)
        |         WHEN doc_id % 3 = 1 THEN 'a' || chr(776)
        |         ELSE 'x' END AS ds
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(ds) AS INTEGER) AS len_dec,
        |  CAST(length(nfc_normalize(ds)) AS INTEGER) AS len_nfc,
        |  right(nfc_normalize(ds), 4) AS tail4,
        |  nfc_normalize(ds) <> ds AS changed
        |FROM d ORDER BY doc_id""".stripMargin,
    "fuzzy_join" ->
      """SELECT a.p_brand AS brand, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(min(levenshtein(a.p_name, b.p_name)) AS INTEGER) AS min_dist,
        |  round(avg(levenshtein(a.p_name, b.p_name)), 4) AS avg_dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |  AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
