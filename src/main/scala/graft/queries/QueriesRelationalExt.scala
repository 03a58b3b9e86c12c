package graft.queries

import graft.DataTable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Relational extensions beyond the first batch: the SQL bridge, temporal
  * joins (as-of, bucketized range), cube, pivot.
  *
  * Scale notes:
  *   - `join_asof` does NO join at all — it is one window pass over the
  *     unioned stream (`last(..., ignoreNulls)` over rows-preceding), the
  *     shape that survives any skew because state per key is O(1);
  *   - `join_range` never evaluates the range predicate over the cross
  *     product: each order explodes into the day buckets its window covers
  *     and the join is a plain equi-join on the bucket key, so work scales
  *     with (rows × window-days), not rows².
  */
object QueriesRelationalExt {

  /** One SQL text both engines run verbatim — the `get-data-table` bridge. */
  private val BridgeSql =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS rev
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderstatus <> 'F'
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, Q] = Map(
    // Correlated LATERAL subquery (Spark 4 decorrelates the per-row
    // ORDER BY..LIMIT into a window group-limit — no N+1 execution): top-2
    // orders per customer, the report shape that reads naturally as "for
    // each customer, its lateral top orders". Deterministic tiebreak on
    // o_orderkey.
    "sql_lateral" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS price
          |FROM customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
          |         WHERE o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |WHERE c.c_custkey < 200
          |ORDER BY c.c_custkey, price DESC, o.o_orderkey""".stripMargin)
    }),
    // LIVE JDBC round-trip against embedded Derby (on /opt/spark/jars —
    // the first real database this bridge touches; rounds 1–8 could only
    // spec the pure option/DDL layers): the reference's import-data-table
    // → get-data-table cycle (clsql-data-table.lisp:13-19, 236-239) run
    // for real — Jdbc.save writes the nation table through Spark's JDBC
    // sink (Overwrite = drop/create via DerbyDialect DDL), Jdbc.scan reads
    // it back as a RANGE-PARTITIONED parallel scan (4 range-predicate
    // queries — the 100-TB shape for pulling a warehouse table), and the
    // aggregate must reproduce the parquet truth (the DuckDB oracle never
    // sees Derby, so any round-trip corruption fails the hash). Embedded
    // Derby lives under target/ (same lifecycle as the warehouse dir).
    "jdbc_roundtrip" -> ((s, dir) => {
      import graft.sources.Jdbc
      import org.apache.spark.sql.SaveMode
      // per-PROCESS database path: embedded Derby takes an exclusive
      // filesystem lock, so a shared target/derby_graft made concurrent
      // harness processes (Verify while a Bench is still up) fail with
      // XJ040 boot errors instead of data results (advice round 9). The
      // pid suffix gives each JVM its own db; dirs are scratch under
      // target/ with the warehouse's lifecycle.
      val pid = java.lang.ProcessHandle.current().pid()
      val conn = Jdbc.Conn(s"jdbc:derby:target/derby_graft_$pid;create=true",
        driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))
      val nation = t(s, dir, "nation").select(
        col("n_nationkey").cast(LongType).as("n_nationkey"), col("n_name"),
        col("n_regionkey").cast(LongType).as("n_regionkey"))
      // the WHOLE round-trip (write + partitioned read + |regions|-row
      // aggregate) materializes inside Jdbc.withRetry so a transient
      // embedded-engine thread failure under container load retries the
      // idempotent cycle instead of failing the card (round-12 verdict #7;
      // the one recorded flake: box load 8.7, BASELINE.md r9). The result
      // returns as a 5-row local relation — a config-sized driver
      // materialization (|regions|), not a data-sized collect.
      val agg = Jdbc.withRetry() {
        Jdbc.save(nation, conn, "graft_nation", SaveMode.Overwrite, numPartitions = 2)
        val a = Jdbc.scan(s, conn, "graft_nation",
            Some(Jdbc.Partitioned("n_nationkey", 0L, 25L, 4)))
          .groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("n_nations"), sum(col("n_nationkey")).as("key_sum"),
            min(col("n_name")).as("first_name"))
          .orderBy(col("n_regionkey"))
        (a.schema, a.collect())
      }
      s.createDataFrame(s.sparkContext.parallelize(agg._2.toSeq, 1), agg._1)
    }),

    // get-data-table: arbitrary SQL in, DataTable out (clsql-data-table.lisp:13-19).
    "sql_bridge" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      DataTable.fromSql(s, BridgeSql).df
    }),

    // As-of join: for each purchase, the user's latest strictly-preceding
    // click — the generic union+window operator, no join (operators/AsOfJoin).
    "join_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      graft.operators.AsOfJoin.asOf(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "click_ts", carry = Seq("click_ts"), strict = true)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_click_ts").as("prev_click_ts"))
        .orderBy(col("event_id"))
    }),

    // FORWARD as-of: the next click AT-OR-AFTER each purchase (non-strict)
    // — the same native exec on the reversed time axis (AsOfJoin
    // .asOfForward). The pandas merge_asof direction='forward' sibling of
    // join_asof.
    "join_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      graft.operators.AsOfJoin.asOfForward(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "click_ts", carry = Seq("click_ts"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_click_ts").as("next_click_ts"))
        .orderBy(col("event_id"))
    }),

    // Tolerance-bounded as-of: the previous click STRICTLY before each
    // purchase, nulled when it lies more than an hour back (pandas
    // merge_asof tolerance) — stale context must not masquerade as
    // attribution. Native exec + one narrow post-projection.
    "join_asof_tolerance" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      graft.operators.AsOfJoin.asOfWithin(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "click_ts", carry = Seq("click_ts"),
          tolerance = 3600000000L, strict = true)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_click_ts").as("prev_click_1h"))
        .orderBy(col("event_id"))
    }),

    // NEAREST as-of: the click closest in time to each purchase, in either
    // direction, ties to the earlier click (pandas merge_asof
    // direction='nearest') — completes the as-of direction family. Two
    // chained native passes (backward non-strict then forward strict; each
    // emits one row per left row, so they compose without a re-join) and a
    // narrow projection picks the closer side.
    "join_asof_nearest" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      graft.operators.AsOfJoin.asOfNearest(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "click_ts", carry = Seq("click_ts"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_click_ts").as("near_click_ts"))
        .orderBy(col("event_id"))
    }),

    // Range join, bucketized: for each error event, the same user's events
    // in the following 6 hours. Anchors explode into the hour buckets their
    // window covers; the join is an equi-join on (user, hour-bucket) with
    // the exact range predicate applied after — never a cross product.
    "join_range" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val anchors = ev.where(col("event_type") === "error" && col("event_id") < 500)
        .select(col("event_id").as("anchor_id"), col("user_id"), col("ts").as("a_ts"))
        .withColumn("bucket", explode(sequence(
          date_trunc("hour", col("a_ts")),
          date_trunc("hour", col("a_ts") + expr("INTERVAL 6 HOURS")),
          expr("INTERVAL 1 HOUR"))))
      val e = ev.select(col("user_id"), col("value"), col("ts"),
        date_trunc("hour", col("ts")).as("bucket"))
      anchors.join(e, Seq("user_id", "bucket"))
        .where(col("ts") >= col("a_ts") && col("ts") < col("a_ts") + expr("INTERVAL 6 HOURS"))
        .groupBy(col("anchor_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("anchor_id"))
    }),

    // CUBE over flag × status.
    "agg_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast(LongType).as("g_flag"),
          grouping(col("l_linestatus")).cast(LongType).as("g_status"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("g_flag"), col("g_status"), col("sum_qty"), col("n"))
        .orderBy(col("flag"), col("status"), col("g_flag"), col("g_status"))
    }),

    // Skew-salted shuffle join: same result as the plain join, but the hot
    // keys' rows spread across saltBuckets reducers (SkewJoin scaladoc).
    "join_salted" -> ((s, dir) => {
      val l = t(s, dir, "lineitem"); val sup = t(s, dir, "supplier")
      graft.operators.SkewJoin.saltedEquiJoin(l, sup, "l_suppkey", "s_suppkey",
          saltBuckets = 8, saltSource = col("l_orderkey") * 10 + col("l_linenumber"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("s_nationkey"))
    }),

    // The scalar library exposed as Spark SQL functions (SQL UDFs are pure
    // expressions — Catalyst inlines them into codegen).
    "sql_functions" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.Fns.registerSqlFunctions(s)
      s.sql(
        """SELECT p_partkey,
          |  relaxed_double('$' || CAST(p_retailprice AS STRING) || ' ') AS parsed,
          |  trim_nullify('  ' || p_brand || ' ') AS brand,
          |  trim_nullify(' NIL ') AS nil_val,
          |  ws_token_count(p_name) AS name_tokens
          |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin)
    }),

    // Unpivot/melt: wide measure columns → (measure, value) rows — the
    // inverse of pivot, a pure narrow Expand (no shuffle until the sort).
    "unpivot_melt" -> ((s, dir) => {
      t(s, dir, "lineitem").where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
    }),

    // Explicit GROUPING SETS (rollup/cube's general form), one SQL text
    // both engines run verbatim.
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(GroupingSetsSql)
    }),

    // Correlated + scalar + IN subqueries in one query, verbatim SQL.
    "sql_subqueries" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(SubqueriesSql)
    }),

    // ntile / percent_rank / cume_dist distribution windows. The rank
    // ratios are small rationals (k/n) that can land EXACTLY on a 6-decimal
    // half boundary (k/n = 0.0640625 did, at sf0.1) where Spark's
    // BigDecimal HALF_UP and DuckDB's multiply-then-round disagree — so
    // both sides use the literally identical floor(x*1e6 + 0.5)/1e6
    // arithmetic, which is bit-deterministic across engines.
    "window_ntile" -> ((s, dir) => {
      def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          r6(percent_rank().over(w)).as("pct_rank"),
          r6(cume_dist().over(w)).as("cdist"))
        .orderBy(col("c_custkey"))
    }),

    // SCD-1 upsert (MERGE INTO semantics without a table format): updates
    // full-outer-join the base on the key; matched rows take the update,
    // unmatched-left keep the base row, unmatched-right insert. One shuffle
    // per side on the key — the hourly-dimension-refresh shape. The update
    // set is derived deterministically from the base (acctbal bump for
    // custkey%10=0, plus brand-new keys above the max).
    "upsert_merge" -> ((s, dir) => {
      val base = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val updates = base.where(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          round(col("c_acctbal") + 1000.0, 2).as("c_acctbal"))
        .unionByName(base.agg(max(col("c_custkey")).as("mx")).crossJoin(
          s.range(1, 4).toDF("i"))
          .select((col("mx") + col("i")).as("c_custkey"),
            lit("NEW").as("c_mktsegment"), lit(0.0).as("c_acctbal")))
      val merged = base.as("b").join(updates.as("u"),
          col("b.c_custkey") === col("u.c_custkey"), "full_outer")
        .select(
          coalesce(col("u.c_custkey"), col("b.c_custkey")).as("c_custkey"),
          coalesce(col("u.c_mktsegment"), col("b.c_mktsegment")).as("c_mktsegment"),
          round(coalesce(col("u.c_acctbal"), col("b.c_acctbal")), 2).as("c_acctbal"))
      merged.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // Change-data-capture diff: classify every key of two table snapshots as
    // insert / delete / update / unchanged — the snapshot-reconciliation
    // operator that feeds incremental downstream refreshes (upsert_merge's
    // inverse: it RECOVERS the changeset). ONE full-outer join on the key,
    // then a partial-agg classification to a 4-row report carrying exact
    // BIGINT checksums (key sums + cents totals), so the whole diff crosses
    // the wire once and the output is O(1). Snapshots derive
    // deterministically from orders: keys %7=3 deleted, %5=1 inserted,
    // %3=0 repriced +5.00.
    "cdc_diff" -> ((s, dir) => {
      val base = t(s, dir, "orders").select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val old = base.where(col("o_orderkey") % 5 =!= 1)
        .select(col("o_orderkey").as("k_old"), col("cents").as("c_old"))
      val neu = base.where(col("o_orderkey") % 7 =!= 3)
        .select(col("o_orderkey").as("k_new"),
          (col("cents") + when(col("o_orderkey") % 3 === 0, 500L).otherwise(0L)).as("c_new"))
      old.join(neu, col("k_old") === col("k_new"), "full_outer")
        .select(
          when(col("k_old").isNull, "insert")
            .when(col("k_new").isNull, "delete")
            .when(col("c_old") =!= col("c_new"), "update")
            .otherwise("unchanged").as("change"),
          coalesce(col("k_old"), col("k_new")).as("k"),
          coalesce(col("c_new"), lit(0L)).as("c_new"))
        .groupBy(col("change"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("key_sum"),
          sum(col("c_new")).as("new_cents"))
        .orderBy(col("change"))
    }),

    // SCD-2 history: a customer's order-status timeline as validity ranges
    // — change-points found with lag(), ranges closed with lead() (NULL =
    // current). Two window functions over ONE (custkey, date) sort; the
    // dimension-history build at any scale.
    "scd2_history" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val changes = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_orderstatus"))
        .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
        .where(col("prev_status").isNull || col("prev_status") =!= col("o_orderstatus"))
      changes
        .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
        .where(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderstatus").as("status"),
          col("o_orderdate").as("valid_from"), col("valid_to"))
        .orderBy(col("o_custkey"), col("valid_from"), col("status"))
    }),

    // Point-in-time dimension lookup against the SCD-2 history: how many
    // customers sat in each order-status state at quarterly snapshot
    // instants — the AS-OF dimension read every temporal warehouse join
    // needs (scd2_history builds the ranges; this READS them correctly).
    // Ranges come from the same one-window change-point construction (for
    // ALL customers); the snapshot grid is config-sized, so the range probe
    // is a broadcast nested loop against 4 literal instants — fan-out ×4 of
    // the CHANGE-POINT table, never the orders table. Per customer the
    // ranges partition time (same-date double-changes yield empty [d, d)
    // ranges, excluded identically in both engines by the orderkey-tiebroken
    // sort), so plain count(*) is the per-state customer count.
    "scd2_lookup" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val ranges = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          col("o_orderstatus"))
        .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
        .where(col("prev_status").isNull || col("prev_status") =!= col("o_orderstatus"))
        .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
        .select(col("o_custkey"), col("o_orderstatus").as("status"),
          col("o_orderdate").as("valid_from"), col("valid_to"))
      val grid = s.range(0, 4).toDF("i")
        .select(expr("TIMESTAMP '1996-01-01 00:00:00' + make_interval(0, CAST(i * 6 AS INT))")
          .as("snap"))
      ranges.join(broadcast(grid),
          col("valid_from") <= col("snap") &&
            (col("valid_to").isNull || col("snap") < col("valid_to")))
        .groupBy(col("snap"), col("status"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("snap"), col("status"))
    }),

    // Typed Dataset surface: per-customer longest consecutive-month order
    // streak via groupByKey + mapGroups — genuine per-group imperative logic
    // (the Dataset[T] escape hatch for algorithms awkward as SQL). Groups
    // are distinct (custkey, month) rows, so state per group is bounded by
    // the month span, and the result IS SQL-expressible (gaps-and-islands),
    // which is exactly what makes it oracle-checkable differentially.
    // The typed COGROUP surface (KeyValueGroupedDataset.cogroup): both sides
    // shuffle ONCE on the key and each customer's rows meet in a single
    // imperative closure — the API for per-entity logic that needs both
    // relations at once without a join materializing their product. Inside
    // the closure everything stays exact: above-own-mean compares
    // cents·n > Σcents (BIGINT cross-multiplication, no mean division) and
    // gaps are integer-µs day quotients (order dates are midnights, so the
    // quotient ≡ DuckDB's calendar datediff). The declared output collapses
    // to the 5-segment domain; the SQL twin needs two windows and two
    // joins — the cogroup form is ONE exchange per side.
    "typed_cogroup" -> ((s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)]
      val ords = t(s, dir, "orders")
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
          unix_micros(col("o_orderdate").cast("timestamp")))
        .as[(Long, Long, Long)]
      cust.groupByKey(_._1).cogroup(ords.groupByKey(_._1)) { (_, cs, os) =>
        val c = cs.toSeq.headOption
        val o = os.toArray
        if (c.isEmpty || o.isEmpty) Iterator.empty
        else {
          val n = o.length.toLong
          val total = o.map(_._2).sum
          val nAbove = o.count(x => x._2 * n > total).toLong
          val ds = o.map(_._3).sorted
          val maxGap = if (ds.length < 2) 0L
            else ds.sliding(2).map(p => (p(1) - p(0)) / 86400000000L).max
          Iterator.single((c.get._2, n, nAbove, maxGap))
        }
      }.toDF("c_mktsegment", "n", "n_above", "max_gap")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"), sum(col("n")).as("n_orders"),
          sum(col("n_above")).as("n_above_own_mean"),
          max(col("max_gap")).as("max_gap_days"))
        .orderBy(col("c_mktsegment"))
    }),

    "typed_streaks" -> ((s, dir) => {
      import s.implicits._
      val months = t(s, dir, "orders")
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast(LongType).as("ym"))
        .distinct()
        .as[(Long, Long)]
      months.groupByKey(_._1)
        .mapGroups { (cust, it) =>
          val yms = it.map(_._2).toArray.sorted
          var best = 1; var cur = 1
          var i = 1
          while (i < yms.length) {
            if (yms(i) == yms(i - 1) + 1) { cur += 1; if (cur > best) best = cur }
            else cur = 1
            i += 1
          }
          (cust, best.toLong)
        }
        .toDF("o_custkey", "max_streak")
        .groupBy(col("max_streak"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("max_streak"))
    }),

    // Time-series resample + forward fill: per-user daily purchase averages
    // on a gap-free calendar, missing days carried forward (LOCF). The
    // calendar is generated (sequence+explode over the global day bounds —
    // a 2-row broadcast, never a shuffle), the observed dailies left-join
    // onto it, and the fill is one last(ignoreNulls) running window — O(1)
    // state per user, so the shape survives any user count. Days before a
    // user's first observation stay NULL (nothing to carry).
    "resample_ffill" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
        .where(col("user_id") < 20 && col("event_type") === "purchase")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"), col("value"))
      val daily = ev.groupBy(col("user_id"), col("day"))
        .agg(round(avg(col("value")), 4).as("day_avg"))
      val cal = ev.select(col("user_id")).distinct()
        .crossJoin(ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi")))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("day_avg"), ignoreNulls = true).over(w).as("value_ffill"))
        .orderBy(col("user_id"), col("day"))
    }),

    // Pivot: event counts per user bucket × event type. Empty cells are
    // coalesced to 0 — Spark pivots them to NULL, the oracle's CASE sums to 0.
    "pivot_counts" -> ((s, dir) => {
      val p = t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
      p.select(col("bucket") +: p.columns.filter(_ != "bucket")
          .map(c => coalesce(col(c), lit(0L)).as(c)): _*)
        .orderBy(col("bucket"))
    }))

  /** GROUPING SETS — runnable verbatim by Spark and DuckDB. */
  private val GroupingSetsSql =
    """SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
      |  round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
      |ORDER BY flag, status, g_flag, g_status""".stripMargin

  /** Scalar + correlated-EXISTS + IN subqueries — verbatim in both engines. */
  private val SubqueriesSql =
    """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
      |ORDER BY c_custkey""".stripMargin

  val oracle: Map[String, String] = Map(
    // the oracle reads the PARQUET truth — Derby never enters the compare,
    // so a write/read corruption in the live bridge fails the hash
    "jdbc_roundtrip" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |  CAST(count(*) AS BIGINT) AS n_nations,
        |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |  min(n_name) AS first_name
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    // two windows + two joins where the cogroup form is one exchange per
    // side — an independent formulation of the same per-customer facts
    "typed_cogroup" ->
      """WITH o AS (
        |  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderdate
        |  FROM orders),
        |tot AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS total FROM o GROUP BY 1),
        |above AS (
        |  SELECT o.o_custkey,
        |    CAST(sum(CASE WHEN cents * n > total THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        |  FROM o JOIN tot USING (o_custkey) GROUP BY 1),
        |gaps AS (
        |  SELECT o_custkey, CAST(max(datediff('day', prev, o_orderdate)) AS BIGINT) AS g
        |  FROM (SELECT o_custkey, o_orderdate,
        |          lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS prev
        |        FROM o)
        |  WHERE prev IS NOT NULL GROUP BY 1)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(n) AS BIGINT) AS n_orders,
        |  CAST(sum(n_above) AS BIGINT) AS n_above_own_mean,
        |  CAST(max(coalesce(g, 0)) AS BIGINT) AS max_gap_days
        |FROM customer
        |  JOIN tot ON c_custkey = tot.o_custkey
        |  JOIN above ON c_custkey = above.o_custkey
        |  LEFT JOIN gaps ON c_custkey = gaps.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "scd2_lookup" ->
      """WITH cp AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
        |      lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) AS prev
        |    FROM orders)
        |  WHERE prev IS NULL OR prev <> o_orderstatus),
        |rg AS (
        |  SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM cp),
        |grid AS (SELECT unnest([TIMESTAMP '1996-01-01 00:00:00',
        |  TIMESTAMP '1996-07-01 00:00:00', TIMESTAMP '1997-01-01 00:00:00',
        |  TIMESTAMP '1997-07-01 00:00:00']) AS snap)
        |SELECT snap, status, CAST(count(*) AS BIGINT) AS n_customers
        |FROM rg JOIN grid ON valid_from <= snap
        |  AND (valid_to IS NULL OR snap < valid_to)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "cdc_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |old AS (SELECT o_orderkey AS k_old, cents AS c_old FROM base
        |        WHERE o_orderkey % 5 <> 1),
        |neu AS (SELECT o_orderkey AS k_new,
        |    cents + CASE WHEN o_orderkey % 3 = 0 THEN 500 ELSE 0 END AS c_new
        |  FROM base WHERE o_orderkey % 7 <> 3)
        |SELECT change, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(coalesce(k_old, k_new)) AS BIGINT) AS key_sum,
        |  CAST(sum(coalesce(c_new, 0)) AS BIGINT) AS new_cents
        |FROM (
        |  SELECT k_old, k_new, c_new,
        |    CASE WHEN k_old IS NULL THEN 'insert'
        |         WHEN k_new IS NULL THEN 'delete'
        |         WHEN c_old <> c_new THEN 'update'
        |         ELSE 'unchanged' END AS change
        |  FROM old FULL JOIN neu ON k_old = k_new)
        |GROUP BY change ORDER BY change""".stripMargin,
    "sql_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS price
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey < 200
        |ORDER BY c.c_custkey, price DESC, o.o_orderkey""".stripMargin,
    "sql_bridge" -> BridgeSql,
    "upsert_merge" ->
      """WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
        |upd AS (
        |  SELECT c_custkey, c_mktsegment, round(c_acctbal + 1000.0, 2) AS c_acctbal
        |  FROM base WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT mx + i, 'NEW', 0.0
        |  FROM (SELECT max(c_custkey) AS mx FROM base)
        |  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS i) g),
        |m AS (SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
        |    coalesce(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
        |    round(coalesce(u.c_acctbal, b.c_acctbal), 2) AS c_acctbal
        |  FROM base b FULL JOIN upd u ON b.c_custkey = u.c_custkey)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "scd2_history" ->
      """WITH c AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
        |    lag(o_orderstatus) OVER w AS prev_status FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |ch AS (SELECT * FROM c WHERE prev_status IS NULL OR prev_status <> o_orderstatus),
        |r AS (SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM ch)
        |SELECT o_custkey, status, valid_from, valid_to FROM r WHERE o_custkey < 100
        |ORDER BY o_custkey, valid_from, status""".stripMargin,
    "typed_streaks" ->
      """WITH m AS (SELECT DISTINCT o_custkey, year(o_orderdate)*12 + month(o_orderdate) AS ym FROM orders),
        |i AS (SELECT o_custkey, ym,
        |    ym - row_number() OVER (PARTITION BY o_custkey ORDER BY ym) AS grp FROM m),
        |st AS (SELECT o_custkey, count(*) AS streak FROM i GROUP BY o_custkey, grp),
        |mx AS (SELECT o_custkey, max(streak) AS max_streak FROM st GROUP BY o_custkey)
        |SELECT CAST(max_streak AS BIGINT) AS max_streak,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM mx GROUP BY max_streak ORDER BY max_streak""".stripMargin,
    "resample_ffill" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('day', ts) AS day, value FROM events
        |  WHERE user_id < 20 AND event_type = 'purchase'),
        |daily AS (SELECT user_id, day, round(avg(value), 4) AS day_avg FROM ev GROUP BY 1, 2),
        |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
        |cal AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        |  FROM (SELECT DISTINCT user_id FROM ev) CROSS JOIN bounds)
        |SELECT cal.user_id AS user_id, cal.day AS day,
        |  last_value(day_avg IGNORE NULLS) OVER (PARTITION BY cal.user_id ORDER BY cal.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
        |FROM cal LEFT JOIN daily ON cal.user_id = daily.user_id AND cal.day = daily.day
        |ORDER BY cal.user_id, cal.day""".stripMargin,
    "agg_grouping_sets" -> GroupingSetsSql,
    "sql_subqueries" -> SubqueriesSql,
    "unpivot_melt" ->
      """SELECT l_orderkey, l_linenumber, measure, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "window_ntile" ->
      """SELECT c_custkey, c_nationkey, CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
        |  floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_asof" ->
      """SELECT event_id, user_id, ts, prev_click_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts
        |  FROM (SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    // non-strict forward: same-ts clicks are visible, so purchases sort
    // BEFORE clicks at equal ts and the frame starts at CURRENT ROW
    "join_asof_forward" ->
      """SELECT event_id, user_id, ts, next_click_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_click_ts
        |  FROM (SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    // the join_asof window + the tolerance CASE: micros-exact equivalence
    // with the Spark side's gap <= 3600000000 filter
    "join_asof_tolerance" ->
      """SELECT event_id, user_id, ts,
        |  CASE WHEN prev_click_ts IS NOT NULL
        |    AND prev_click_ts >= ts - INTERVAL 1 HOUR THEN prev_click_ts END AS prev_click_1h
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts
        |  FROM (SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    // nearest = closer of (last click ≤ ts, first click > ts), tie to the
    // backward side — clicks sort BEFORE purchases at equal ts so the
    // backward window is non-strict and the forward frame (1 FOLLOWING)
    // only ever sees strictly-later clicks
    "join_asof_nearest" ->
      """SELECT event_id, user_id, ts,
        |  CASE WHEN prev_ts IS NOT NULL AND (next_ts IS NULL OR ts - prev_ts <= next_ts - ts)
        |       THEN prev_ts ELSE next_ts END AS near_click_ts
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
        |    first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_ts
        |  FROM (SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "join_range" ->
      """SELECT a.event_id AS anchor_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(e.value), 2) AS sum_value
        |FROM (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts FROM events
        |      WHERE event_type = 'error' AND event_id < 500) a
        |JOIN (SELECT user_id, value, date_trunc('microseconds', ts) AS ts FROM events) e
        |  ON e.user_id = a.user_id
        |  AND e.ts >= a.ts AND e.ts < a.ts + INTERVAL 6 HOUR
        |GROUP BY a.event_id ORDER BY anchor_id""".stripMargin,
    "agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status, g_flag, g_status""".stripMargin,
    "join_salted" ->
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "sql_functions" ->
      s"""SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS parsed, p_brand AS brand,
         |  CAST(NULL AS VARCHAR) AS nil_val,
         |  CAST(len(${Tables.toksSql("p_name")}) AS BIGINT) AS name_tokens
         |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin,
    "pivot_counts" ->
      """SELECT user_id % 10 AS bucket,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
