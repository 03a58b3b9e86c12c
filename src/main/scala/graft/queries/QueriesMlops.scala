package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import Tables._

/** ML-ops / statistical-monitoring operators (SURVEY.md §2.8 extension
  * surface): deterministic categorical mode, CUSUM changepoint scan,
  * population-stability-index drift between time halves, a Benford
  * first-digit data-quality audit, first/last-touch conversion attribution,
  * and a bounded-lookback EWMA smoother. The reference has none of these
  * (its surface is data-table.lisp:4-34); each is designed around
  * domain-collapsing aggregates so the expensive shuffle carries the small
  * derived table, never the raw corpus.
  */
object QueriesMlops {

  /** ONE definition of the signup → first-subsequent-purchase funnel
    * (su = per-user first signup µs, pu = per-user first purchase at or
    * after it) — shared by time_to_convert and funnel_conversion so the
    * funnel population can't drift between the latency and conversion
    * views (the Tables.toksSql single-definition precedent). */
  private def signupFunnel(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = t(s, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val su = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("s"))
    val pu = ev.where(col("event_type") === "purchase")
      .join(su, "user_id")
      .where(col("us") >= col("s"))
      .groupBy(col("user_id"), col("s")).agg(min(col("us")).as("p"))
    (su, pu)
  }

  /** time_to_convert with a CARDINALITY-GUARDED quantile path (the
    * winsorize idiom, QueriesScale.winsorized): ONE bounded job probes AND
    * collects the hour histogram via `limit(max+1)` — getting max+1 rows
    * back proves the hour domain is NOT config-sized (e.g. a corrupt
    * epoch-zero signup at 100 TB) and the quantiles fall back to the fully
    * distributed [[graft.operators.DiscreteQuantile.quantiles]], whose R-7
    * arithmetic is bit-identical to the driver fold (MlopsSpec forces the
    * fallback and asserts equality). `maxHistRows` is exposed ONLY so the
    * spec can force the fallback. */
  private[graft] def timeToConvert(s: SparkSession, dir: String,
      maxHistRows: Long = graft.operators.DiscreteQuantile.DefaultMaxDriverHistRows): DataFrame = {
    import graft.operators.DiscreteQuantile
    val (_, pu) = signupFunnel(s, dir)
    val dur = pu
      .select(expr("(p - s) DIV 1000000").as("sec"))
      .withColumn("hr", expr("sec DIV 3600"))
    val histRows = dur.groupBy(col("hr")).count()
      .limit(math.min(maxHistRows, Int.MaxValue - 1L).toInt + 1)
      .collect()
    val agg = dur.agg(count(lit(1)).as("n_converted"),
      (floor(avg(col("sec")) * 1e2 + 0.5) / 1e2).as("avg_sec"),
      max(col("sec")).as("max_sec"))
    if (histRows.length <= maxHistRows) {
      val hist = histRows.map(r => (r.getLong(0).toDouble, r.getLong(1))).toSeq
      // empty-funnel guard: no conversions → NULL quantiles, matching the
      // oracle's aggregate-over-empty behavior instead of throwing
      def quant(p: Double) =
        if (hist.isEmpty) lit(null).cast("double")
        else lit(math.floor(
          DiscreteQuantile.quantileOfHistogram(hist, p) * 1e4 + 0.5) / 1e4)
      agg.select(col("n_converted"), col("avg_sec"),
        quant(0.5).as("p50_hours"), quant(0.9).as("p90_hours"),
        col("max_sec"))
    } else {
      // distributed fallback: the histogram aggregate bounds the shuffle at
      // the hour domain; the 1-row quantile frame joins the 1-row summary
      // via a broadcast-NL left join (empty funnel → quantile side empty →
      // NULL quantiles, same contract as the driver branch)
      val q = DiscreteQuantile.quantiles(dur.withColumn("_g", lit(1)), Seq("_g"),
          col("hr").cast(DoubleType), Seq(0.5, 0.9), Seq("_q50", "_q90"))
        .select((floor(col("_q50") * 1e4 + 0.5) / 1e4).as("p50_hours"),
          (floor(col("_q90") * 1e4 + 0.5) / 1e4).as("p90_hours"))
      agg.join(q, lit(true), "left")
        .select(col("n_converted"), col("avg_sec"),
          col("p50_hours"), col("p90_hours"), col("max_sec"))
    }
  }

  /** did_estimator's shared formula text, evaluated VERBATIM by both
    * engines: pure double arithmetic via scientific literals (a 100.0-style
    * literal parses as DECIMAL, and Spark divides decimals exactly while
    * DuckDB promotes the quotient to double — the one arithmetic the two
    * engines genuinely disagree on). */
  private def didMeanSql(s: String, n: String): String =
    s"floor(CAST($s AS DOUBLE) / (1e2 * $n) * 1e4 + 0.5) / 1e4"
  private val DidSql: String =
    "floor(((CAST(s_tp AS DOUBLE) / (1e2 * n_tp) - CAST(s_tr AS DOUBLE) / (1e2 * n_tr)) - " +
      "(CAST(s_cp AS DOUBLE) / (1e2 * n_cp) - CAST(s_cr AS DOUBLE) / (1e2 * n_cr))) * 1e4 + 0.5) / 1e4"

  /** attribution_markov's unrolled-fixpoint oracle (graph_hits precedent:
    * loop-generated per-round CTEs, every one AS MATERIALIZED so the
    * double back-reference cannot re-inline exponentially). The rounds run
    * the SAME exact fixed-point integer arithmetic as the driver solve —
    * probabilities in 1e-6 BIGINT units, values in 1e-12 units, each term
    * (p6·v12) // 1e6 — so the unordered SQL sum is safe (integer
    * addition commutes) and the compare is bit-exact. */
  private val attributionMarkovOracle: String = {
    val rounds = (1 to 20).map { i =>
      val pv = s"v${i - 1}"
      s"""v$i AS MATERIALIZED (
         |  SELECT v.removed, v.state, CAST(
         |      coalesce(max(CASE WHEN p.to_s = 'conv' THEN p.p6 END), 0) * 1000000
         |      + coalesce(sum(CASE WHEN p.to_s NOT IN ('conv', 'null')
         |          AND p.to_s <> v.removed
         |          THEN (p.p6 * vv.v12) // 1000000 END), 0) AS BIGINT) AS v12
         |  FROM $pv v
         |  LEFT JOIN p ON p.from_s = v.state
         |  LEFT JOIN $pv vv ON vv.removed = v.removed AND vv.state = p.to_s
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT user_id, event_type, ts, event_id FROM events
       |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
       |seq0 AS (SELECT user_id, event_type,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM ev),
       |seq AS (SELECT user_id, event_type, rn,
       |    min(CASE WHEN event_type = 'purchase' THEN rn END)
       |      OVER (PARTITION BY user_id) AS fp
       |  FROM seq0),
       |kept AS (SELECT user_id, rn,
       |    CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END AS cur
       |  FROM seq WHERE fp IS NULL OR rn <= fp),
       |lab AS (SELECT user_id, rn, cur,
       |    coalesce(lag(cur) OVER (PARTITION BY user_id ORDER BY rn), 'start') AS from_s,
       |    max(rn) OVER (PARTITION BY user_id) AS mx
       |  FROM kept),
       |m AS MATERIALIZED (SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT from_s, cur AS to_s FROM lab
       |    UNION ALL
       |    SELECT cur AS from_s, 'null' AS to_s FROM lab WHERE rn = mx AND cur <> 'conv')
       |  GROUP BY 1, 2),
       |rs AS (SELECT from_s, CAST(sum(n) AS BIGINT) AS tot FROM m GROUP BY 1),
       |p AS MATERIALIZED (SELECT m.from_s, m.to_s,
       |    CAST(CAST(m.n * 1000000 AS BIGINT) // rs.tot AS BIGINT) AS p6
       |  FROM m JOIN rs USING (from_s)),
       |scen AS (SELECT DISTINCT to_s AS removed FROM m
       |    WHERE to_s NOT IN ('conv', 'null')
       |  UNION ALL SELECT '<base>'),
       |states AS (SELECT DISTINCT from_s AS state FROM m),
       |v0 AS MATERIALIZED (SELECT s.removed, st.state, CAST(0 AS BIGINT) AS v12
       |  FROM scen s CROSS JOIN states st),
       |$rounds,
       |base AS (SELECT v12 AS vb FROM v20 WHERE removed = '<base>' AND state = 'start'),
       |d AS (SELECT removed AS channel, v12 AS vr FROM v20
       |  WHERE removed <> '<base>' AND state = 'start'),
       |nc AS (SELECT CAST(sum(n) AS BIGINT) AS nconv FROM m WHERE to_s = 'conv'),
       |dd AS (SELECT channel, vb, vb - vr AS dc FROM d CROSS JOIN base),
       |tt AS (SELECT CAST(sum(dc) AS BIGINT) AS dtot FROM dd)
       |SELECT channel,
       |  floor(CAST(dc AS DOUBLE) / vb * 1e6 + 0.5) / 1e6 AS removal_effect,
       |  floor(CAST(dc AS DOUBLE) / dtot * 1e6 + 0.5) / 1e6 AS attr_share,
       |  floor(CAST(dc AS DOUBLE) * nconv / dtot * 1e2 + 0.5) / 1e2 AS attr_conversions
       |FROM dd CROSS JOIN tt CROSS JOIN nc ORDER BY channel""".stripMargin
  }

  /** power_analysis' shared formula text: raw mean/variance in cents, and
    * the two-arm sample-size requirement n = 2σ²(z_{α/2}+z_β)²/δ² at
    * α=.05 / 80% power with MDE = 5% of the mean — z constants appear as
    * literals so both engines square the identical double sum. */
  private val PowerMeanSql =
    "floor(CAST(sx AS DOUBLE) / n * 1e4 + 0.5) / 1e4"
  private val PowerVarSql =
    "floor((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1)) * 1e4 + 0.5) / 1e4"
  private val PowerNReqSql =
    "CAST(ceil(2e0 * ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1))) " +
      "* ((1.959964e0 + 0.841621e0) * (1.959964e0 + 0.841621e0)) " +
      "/ ((0.05e0 * (CAST(sx AS DOUBLE) / n)) * (0.05e0 * (CAST(sx AS DOUBLE) / n)))) AS BIGINT)"

  /** ab_sequential's shared mSPRT text over the cumulative arm moments
    * (cna/cnb/csa/csb, cents) and the pooled full-period variance sig2:
    * δ̂ = csa/cna − csb/cnb, V = σ²(1/nₐ+1/n_b), unit-information mixture
    * logΛ = ½ln(V/(V+σ²)) + δ̂²σ²/(2V(V+σ²)), micro-rounded to a BIGINT
    * (log space — a decisive Λ would overflow exp). */
  private val MsprtLlr6Sql =
    "CAST(floor((0.5e0 * ln((sig2 * (1e0 / cna + 1e0 / cnb)) / (sig2 * (1e0 / cna + 1e0 / cnb) + sig2)) " +
      "+ (CAST(csa AS DOUBLE) / cna - CAST(csb AS DOUBLE) / cnb) * (CAST(csa AS DOUBLE) / cna - CAST(csb AS DOUBLE) / cnb) " +
      "* sig2 / (2e0 * (sig2 * (1e0 / cna + 1e0 / cnb)) * (sig2 * (1e0 / cna + 1e0 / cnb) + sig2))) " +
      "* 1e6 + 0.5) AS BIGINT)"

  val queries: Map[String, Q] = Map(
    // ClickHouse-style windowFunnel: the longest prefix of the ORDERED
    // sequence view → click → purchase each user completes, where every
    // later step must fall strictly after the previous step and within
    // 24 h of the user's FIRST view (the anchored-window semantics that
    // distinguishes this from funnel_conversion's unanchored signup
    // funnel). Three user-keyed conditional aggregates chained by
    // co-partitioned joins — the user exchange is planned once and
    // reused; all time math is exact integer µs. Output is the 4-row
    // level histogram with conversion shares.
    "window_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val horizon = 24L * 3600L * 1000000L
      // users + step-1 anchor from ONE conditional aggregate (a separate
      // distinct-users pass would scan the fact a 4th time; the remaining
      // two scans are the funnel's sequential depth — t2 needs t1, t3
      // needs t2)
      val users = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("us"))).as("t1"))
      val t1 = users.where(col("t1").isNotNull)
      val t2 = ev.join(t1, "user_id")
        .where(col("event_type") === "click" &&
          col("us") > col("t1") && col("us") <= col("t1") + horizon)
        .groupBy(col("user_id")).agg(min(col("us")).as("t2"), min(col("t1")).as("t1b"))
      val t3 = ev.join(t2, "user_id")
        .where(col("event_type") === "purchase" &&
          col("us") > col("t2") && col("us") <= col("t1b") + horizon)
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      val lvl = users
        .withColumn("l1", when(col("t1").isNotNull, 1))
        .join(t2.select(col("user_id"), lit(1).as("l2")), Seq("user_id"), "left")
        .join(t3.select(col("user_id"), lit(1).as("l3")), Seq("user_id"), "left")
        .select((coalesce(col("l1"), lit(0)) + coalesce(col("l2"), lit(0))
          + coalesce(col("l3"), lit(0))).cast(LongType).as("level"))
      val tot = lvl.agg(count(lit(1)).as("n_users"))
      lvl.groupBy(col("level")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("level"), col("n"),
          round(col("n").cast(DoubleType) / col("n_users"), 6).as("share"))
        .orderBy(col("level"))
    }),

    // Leave-one-out target encoding — the leakage-safe categorical
    // feature-engineering standard: each order's nation encodes as the
    // high-priority rate of all OTHER orders in that nation,
    // (pos_c − y_i)/(n_c − 1) — exact BIGINT numerators, one division,
    // NULL for singleton categories (ANSI-safe). One orders⋈customer
    // join is the only data-sized stage; the per-nation sums collapse to
    // the nations domain and broadcast back. Declared output is the
    // per-nation encoding card (min/max/mean of the LOO encodings plus
    // the naive rate) — the full per-row encoded table is the same plan
    // minus the final aggregate.
    "target_encode" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("y"))
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val rows = o.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), col("o_orderkey"), col("y"))
      val stats = rows.groupBy(col("c_nationkey"))
        .agg(sum(col("y")).as("pos"), count(lit(1)).as("n"))
      rows.join(broadcast(stats), "c_nationkey")
        .select(col("c_nationkey"), col("y"),
          when(col("n") > 1, (col("pos") - col("y")).cast(DoubleType)
            / (col("n") - 1)).as("enc"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("y")).as("n_pos"),
          round(min(col("enc")), 6).as("min_enc"),
          round(max(col("enc")), 6).as("max_enc"),
          round(sum(floor(col("enc") * 1e9 + 0.5).cast(LongType))
            .cast(DoubleType) / count(lit(1)) / 1e9, 6).as("mean_enc"))
        .orderBy(col("c_nationkey"))
    }),
    // Deterministic Poisson BOOTSTRAP confidence intervals on a data-card
    // metric (per-source mean chars): 32 resamples where doc weight in
    // resample b is Poisson(1)-distributed via the md5(b, doc_id) prefix
    // against fixed hex CDF thresholds — the train_split idiom, so both
    // engines draw IDENTICAL resamples with no RNG seed coordination
    // across a fleet. Each resample mean is one exact-BIGINT ratio; the CI
    // is the 2nd/31st order statistic of the 32 means (≈95%), selected by
    // a window over the 32-row-per-source table. The 32× fan-out carries
    // only (source, n_chars, doc_id) — at 100 TB you'd bootstrap the
    // already-aggregated per-shard partials instead, same arithmetic.
    "bootstrap_ci" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("source"), col("n_chars"), col("doc_id"))
      val fan = docs
        .select(col("source"), col("n_chars"), col("doc_id"),
          explode(sequence(lit(0), lit(31))).as("b"))
        .withColumn("h", substring(md5(concat(lit("boot:"), col("b").cast(StringType),
          lit(":"), col("doc_id").cast(StringType))), 1, 8))
        .withColumn("w",
          when(col("h") < "5e2d58d8", 0L).when(col("h") < "bc5ab1b1", 1L)
            .when(col("h") < "eb715e1d", 2L).when(col("h") < "fb239797", 3L)
            .otherwise(4L))
      val means = fan.groupBy(col("source"), col("b"))
        .agg((sum(col("w") * col("n_chars")) / sum(col("w"))).as("m"))
      val wr = Window.partitionBy(col("source")).orderBy(col("m"), col("b"))
      val point = docs.groupBy(col("source"))
        .agg((sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("pm"))
      means.withColumn("rn", row_number().over(wr))
        .groupBy(col("source"))
        .agg(min(when(col("rn") === 2, col("m"))).as("lo"),
          min(when(col("rn") === 31, col("m"))).as("hi"))
        .join(point, "source")
        .select(col("source"),
          (floor(col("pm") * 1e4 + 0.5) / 1e4).as("point_mean"),
          (floor(col("lo") * 1e4 + 0.5) / 1e4).as("ci_lo"),
          (floor(col("hi") * 1e4 + 0.5) / 1e4).as("ci_hi"))
        .orderBy(col("source"))
    }),

    // Kaplan–Meier user-retention survival curve: lifetime = days between
    // a user's first and last event; a user is CHURNED (death observed) if
    // their last event predates corpus end by > 3 days, else censored —
    // the right-censoring that naive "average lifetime" stats get wrong.
    // Distributed shape: one per-user aggregate (corpus-sized), then every
    // remaining stage lives on the calendar-bounded per-day table; at-risk
    // counts come from total − cumulative-ended (window over ≤span rows),
    // and S(t) = Π(1 − d/n) folds as exp(Σ ln) over the ORDERED frame with
    // a 1e-6 floor-round (bm25/lm_score log-arithmetic precedent; the
    // greatest(·, 1e-300) guard keeps a total-extinction day finite and
    // engine-identical instead of Spark-null vs DuckDB −inf).
    "survival_km" -> ((s, dir) => {
      // PURCHASE activity with a 3-day inactivity cutoff: the all-events
      // stream has near-daily activity for every user (nobody ever churns
      // — an empty curve), while purchase gaps are wide enough that real
      // right-censored lifetimes emerge at every SF (4/40/388 churned at
      // sf0.001/0.01/0.1)
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val users = ev.groupBy(col("user_id"))
        .agg(min(col("d")).as("birth"), max(col("d")).as("last"))
      val end = broadcast(ev.agg(max(col("d")).as("endd")))
      val lives = users.crossJoin(end)
        .select(datediff(col("last"), col("birth")).cast(LongType).as("life"),
          (col("last") <= date_sub(col("endd"), 3)).as("dead"))
      val byDay = lives.groupBy(col("life"))
        .agg(count(lit(1)).as("n_end"),
          sum(when(col("dead"), 1L).otherwise(0L)).as("dth"))
      val tot = broadcast(lives.agg(count(lit(1)).as("total")))
      val wb = Window.orderBy(col("life")).rowsBetween(Window.unboundedPreceding, -1)
      val wp = Window.orderBy(col("life")).rowsBetween(Window.unboundedPreceding, 0)
      byDay.crossJoin(tot)
        .withColumn("n_at_risk", col("total") - coalesce(sum(col("n_end")).over(wb), lit(0L)))
        .where(col("dth") > 0)
        .withColumn("surv", exp(sum(log(greatest(
          lit(1.0) - col("dth").cast(DoubleType) / col("n_at_risk"), lit(1e-300)))).over(wp)))
        .select(col("life").as("t_days"), col("n_at_risk"), col("dth").as("n_churned"),
          (floor(col("surv") * 1e6 + 0.5) / 1e6).as("survival"))
        .orderBy(col("t_days"))
    }),

    // Walk-forward (expanding-window) time-series cross-validation splits:
    // 4 folds over the event calendar, fold k training on the first k/6 of
    // the span and testing on the next span/6 days — the leakage-free CV
    // scheme for anything time-ordered (kfold_assign shuffles i.i.d.;
    // shuffling time series leaks the future into training). Boundaries
    // are integer day arithmetic from a 1-row broadcast (lo, span); the
    // declared card pins per-(fold, part) counts, id checksums and exact
    // date ranges.
    "walkforward_split" -> ((s, dir) => {
      val ev = t(s, dir, "events").where(col("ts").isNotNull)
        .select(col("event_id"), to_date(col("ts")).as("d"))
      val span = broadcast(ev.agg(min(col("d")).as("lo"), max(col("d")).as("hi")))
      ev.crossJoin(span)
        .select(col("event_id"), col("lo"),
          (datediff(col("hi"), col("lo")) + 1).cast(LongType).as("ndays"),
          datediff(col("d"), col("lo")).cast(LongType).as("off"), col("d"),
          explode(array((1 to 4).map(k => lit(k.toLong)): _*)).as("fold"))
        .withColumn("cut", expr("(ndays * fold) div 6"))
        .withColumn("tw", expr("ndays div 6"))
        .withColumn("part",
          when(col("off") < col("cut"), "train")
            .when(col("off") < col("cut") + col("tw"), "test"))
        .where(col("part").isNotNull)
        .groupBy(col("fold"), col("part"))
        .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("id_sum"),
          min(col("d")).as("from_day"), max(col("d")).as("to_day"))
        .orderBy(col("fold"), col("part"))
    }),

    // Deterministic per-group mode: the (status, priority) count aggregate
    // collapses the corpus to the tiny cross-domain FIRST (map-side
    // combined, one shuffle), then the argmax window runs over that
    // config-sized table. Ties break to the smallest value so the result
    // is engine- and partitioning-independent — a bare `mode()` aggregate
    // (DuckDB's included) is tie-nondeterministic.
    "agg_mode" -> ((s, dir) => {
      val c = t(s, dir, "orders")
        .where(col("o_orderstatus").isNotNull && col("o_orderpriority").isNotNull)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("o_orderstatus")
      c.withColumn("mx", max(col("cnt")).over(w))
        .where(col("cnt") === col("mx"))
        .groupBy(col("o_orderstatus"))
        .agg(min(col("o_orderpriority")).as("mode_priority"),
          max(col("cnt")).as("mode_count"))
        .orderBy(col("o_orderstatus"))
    }),

    // CUSUM changepoint scan per event-type series: z-score against the
    // series' own mean/σ, then a cumulative ordered sum; an excursion past
    // ±3·√n flags a sustained level shift (a random walk stays ~√n). The
    // per-series cumulative is inherently sequential — O(1) window state —
    // and production monitoring has many series (type × region × …), so
    // the per-key partitions parallelize; the 5-key local shape is the
    // degenerate case, not the design point.
    "ts_cusum" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      val wt = Window.partitionBy("event_type")
      val ord = Window.partitionBy("event_type")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("mu", avg(col("value")).over(wt))
        .withColumn("sd", stddev_pop(col("value")).over(wt))
        .withColumn("n", count(lit(1)).over(wt))
        // NULL divisor, not 0: Spark 4 runs ANSI by default, where double
        // 0/0 THROWS while DuckDB returns NULL — a constant-valued series
        // must degrade to NULL cusum/0 flags identically in both engines
        .withColumn("cusum",
          sum((col("value") - col("mu")) / when(col("sd") =!= 0, col("sd"))).over(ord))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          (floor(max(abs(col("cusum"))) * 1e4 + 0.5) / 1e4).as("max_abs_cusum"),
          count(when(abs(col("cusum")) > lit(3.0) * sqrt(col("n")), 1)).as("n_flagged"))
        .orderBy(col("event_type"))
    }),

    // Population-stability-index drift: split the stream at the midpoint of
    // its time range, histogram `value` into 10 fixed-width bins per type
    // in ONE conditional aggregate (both halves counted in the same pass —
    // no second scan, no join of two filtered subqueries), then
    // PSI = Σ (p−q)·ln(p/q) over the types×10-sized bin table with the
    // standard 1e-6 zero-bin clamp. The time bounds are a 1-row broadcast.
    "drift_psi" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
        .withColumn("us", unix_micros(col("ts")))
      // integer DIV, not /2-then-cast: Spark's double→long cast truncates
      // while DuckDB's CAST(double AS BIGINT) rounds — an odd µs-sum plus
      // an event exactly at the midpoint would split the halves differently
      val mid = broadcast(ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        .select(expr("(mn + mx) DIV 2").as("mid")))
      val bins = ev.crossJoin(mid)
        .withColumn("bin", least(floor(col("value") / 50), lit(9.0)).cast("int"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(when(col("us") <= col("mid"), 1)).as("na"),
          count(when(col("us") > col("mid"), 1)).as("nb"))
      val wt = Window.partitionBy("event_type")
      bins
        .withColumn("ta", sum(col("na")).over(wt))
        .withColumn("tb", sum(col("nb")).over(wt))
        // NULL divisor under ANSI (see ts_cusum): a type absent from one
        // half gives 0/0 → NULL → greatest(NULL, 1e-6) = 1e-6, the clamp,
        // in BOTH engines (both greatest() ignore NULLs)
        .withColumn("p", greatest(col("na") / when(col("ta") =!= 0, col("ta")), lit(1e-6)))
        .withColumn("q", greatest(col("nb") / when(col("tb") =!= 0, col("tb")), lit(1e-6)))
        .groupBy(col("event_type"))
        .agg(sum(col("na")).as("n_first"), sum(col("nb")).as("n_second"),
          (floor(sum((col("p") - col("q")) * log(col("p") / col("q"))) * 1e6 + 0.5) / 1e6).as("psi"))
        .orderBy(col("event_type"))
    }),

    // Benford first-digit audit of order totals — a fraud/data-quality
    // screen. The first digit is taken from the INTEGER cents rendering
    // (floor(x·100+0.5) → string → first char), never from log10(x): float
    // log10 is 1-ulp engine-dependent exactly at the decade boundaries
    // where the digit flips, while integer-to-string is exact everywhere.
    // One map-side-combined aggregate to 9 rows; shares/χ² on the driver-
    // sized result.
    "benford_dq" -> ((s, dir) => {
      val d = t(s, dir, "orders")
        .where(col("o_totalprice") > 0)
        .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        // cents=0 (a total under half a cent) would yield first_digit=0 and a
        // double 1/0 in exp_share — throws under ANSI where DuckDB NULLs.
        // Unreachable with TPC-H totals; guarded for degenerate data.
        .where(col("cents") > 0)
        .withColumn("first_digit", substring(col("cents").cast("string"), 1, 1).cast("int"))
        .groupBy(col("first_digit")).agg(count(lit(1)).as("n"))
      val wAll = Window.partitionBy()
      d.withColumn("total", sum(col("n")).over(wAll))
        .withColumn("exp_share", log(10.0, lit(1.0) + lit(1.0) / col("first_digit")))
        .select(col("first_digit"), col("n"),
          (floor(col("n") / col("total") * 1e6 + 0.5) / 1e6).as("obs_share"),
          (floor(col("exp_share") * 1e6 + 0.5) / 1e6).as("exp_share"),
          (floor(pow(col("n") - col("exp_share") * col("total"), 2)
            / (col("exp_share") * col("total")) * 1e4 + 0.5) / 1e4).as("chi2_part"))
        .orderBy(col("first_digit"))
    }),

    // First/last-touch conversion attribution: one window pass per user
    // carries the first and most-recent non-purchase touch type onto each
    // purchase (strictly-preceding frame, ignoreNulls last/first — no
    // self-join, no per-conversion subquery), then both models aggregate to
    // the touch-type domain. Conversion value sums in exact integer cents —
    // a double sum rounded to 2 decimals lands on half-cent boundaries
    // where the engines' tie behavior differs.
    "attribution_touch" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull && col("value").isNotNull)
      val prior = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      val conv = ev
        .withColumn("first_touch", first(touch, ignoreNulls = true).over(prior))
        .withColumn("last_touch", last(touch, ignoreNulls = true).over(prior))
        .where(col("event_type") === "purchase" && col("last_touch").isNotNull)
        .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
      conv.select(lit("first").as("model"), col("first_touch").as("touch_type"), col("cents"))
        .unionAll(conv.select(lit("last").as("model"), col("last_touch").as("touch_type"), col("cents")))
        .groupBy(col("model"), col("touch_type"))
        .agg(count(lit(1)).as("conversions"), sum(col("cents")).as("value_cents"))
        .orderBy(col("model"), col("touch_type"))
    }),

    // Bounded-lookback EWMA (α=0.3, 14-day window) over per-type daily
    // averages. The corpus collapses to the (series × days) daily table
    // first — at 100 TB that aggregate IS the big shuffle and it's
    // map-side combined; the banded self-join then fans each daily row out
    // ≤14×, bounded work independent of raw row count. A truncated-kernel
    // EWMA keeps the operator a stateless join+aggregate (the exact
    // recursive form needs sequential per-series state; past 14 days the
    // dropped tail weight is 0.7^14 ≈ 0.7%).
    "ts_ewma" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(avg(col("value")).as("x"))
      val b = daily.select(col("event_type").as("event_type_b"),
        col("d").as("d_b"), col("x").as("x_b"))
      daily.join(b, col("event_type") === col("event_type_b") &&
          datediff(col("d"), col("d_b")).between(0, 13))
        .withColumn("w", pow(lit(0.7), datediff(col("d"), col("d_b"))))
        .groupBy(col("event_type"), col("d"))
        .agg((floor(sum(col("w") * col("x_b")) / sum(col("w")) * 1e4 + 0.5) / 1e4).as("ewma"))
        .orderBy(col("event_type"), col("d"))
    }),

    // Period-over-period (week-over-week) growth per series: value mass
    // sums in exact integer cents per (type, Monday week) — map-side
    // combined, series×weeks-sized result — then one lag window over that
    // tiny aggregate. The growth ratio is a cents-ratio rational, so it
    // rounds with the engine-identical floor arithmetic.
    "period_over_period" -> ((s, dir) => {
      val wk = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type"),
          to_date(date_trunc("week", col("ts"))).as("week"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      val w = Window.partitionBy("event_type").orderBy("week")
      wk.withColumn("prev_cents", lag(col("cents"), 1).over(w))
        // NULL divisor under ANSI (see ts_cusum): a zero-cents prior week
        // must yield NULL pct_change as in DuckDB, not throw
        .withColumn("pct_change",
          floor((col("cents") - col("prev_cents")).cast("double")
            / when(col("prev_cents") =!= 0, col("prev_cents")) * 1e6 + 0.5) / 1e6)
        .orderBy(col("event_type"), col("week"))
    }),

    // Pairwise correlation matrix across the per-type daily-average series:
    // the corpus collapses to the (series × days) daily table FIRST, the
    // date-equi self-join and corr() run over that — work is
    // days × series², independent of the raw row count. Half-matrix only
    // (type_a < type_b): corr is symmetric.
    "corr_matrix" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(avg(col("value")).as("x"))
      val a = daily.select(col("event_type").as("type_a"), col("d"), col("x").as("xa"))
      val b = daily.select(col("event_type").as("type_b"), col("d").as("d_b"),
        col("x").as("xb"))
      a.join(b, col("d") === col("d_b") && col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        // nanvl: Spark's corr of a constant series is NaN where DuckDB's is
        // NULL — map NaN to NULL so degenerate series agree cross-engine
        .agg(count(lit(1)).as("n_days"),
          (floor(nanvl(corr(col("xa"), col("xb")), lit(null).cast("double")) * 1e4 + 0.5) / 1e4).as("r"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // DAU/MAU stickiness: the corpus collapses to the distinct (user, day)
    // activity table first — THE one big shuffle, map-side combined — then
    // a 30-day banded join against the days-sized grid (broadcast) fans
    // each activity row out ≤30×, and one aggregate per grid day counts
    // the trailing-30d actives and the day's actives in the same pass.
    "dau_mau" -> ((s, dir) => {
      val ud = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
      // 30-day-epoch bucket as the EQUI key: d in [g-29, g] implies
      // bucket(g) ∈ {bucket(d), bucket(d)+1}, so each activity row fans out
      // to exactly 2 candidate buckets and the join HASHES (the bare band
      // predicate planned a BroadcastNestedLoopJoin — |user-days| × |days|
      // compute, quadratic in stream length). The band filter then trims the
      // ≤2× candidate set; each (d,g) pair matches under exactly one bucket.
      val ud2 = ud
        .withColumn("db", expr("datediff(d, DATE '1970-01-01') DIV 30"))
        .select(col("user_id"), col("d"),
          explode(array(col("db"), col("db") + 1)).as("bk"))
      val grid = broadcast(ud.select(col("d").as("g")).distinct()
        .withColumn("gk", expr("datediff(g, DATE '1970-01-01') DIV 30")))
      // q21-style multi-distinct collapse (round-5 audit): the join stream
      // is distinct in (user_id, d, g), so grouping to (g, user_id) first
      // leaves NO distinct aggregate — dau = Σ active-today flags, mau =
      // group count — where the direct count_distinct pair planned an
      // Expand that doubled the 30×-fanned join output through the shuffle
      ud2.join(grid, col("bk") === col("gk") &&
          datediff(col("g"), col("d")).between(0, 29))
        .groupBy(col("g"), col("user_id"))
        .agg(max(when(col("d") === col("g"), 1L).otherwise(0L)).as("act"))
        .groupBy(col("g"))
        .agg(sum(col("act")).as("dau"), count(lit(1)).as("mau"))
        .withColumn("stickiness",
          floor(col("dau").cast("double") / col("mau") * 1e4 + 0.5) / 1e4)
        .orderBy(col("g"))
    }),

    // Time-to-convert funnel latency: first signup → first subsequent
    // purchase per user (two user-sized aggregates + one equi-join — never
    // a per-event window), exact integer-second durations, then the
    // distribution summary reads exact quantiles off the HOUR-bucketed
    // count histogram via the CARDINALITY-GUARDED winsorize idiom
    // (round-12 verdict #1: the hour domain is duration-bounded in
    // practice, but one corrupt epoch-zero timestamp makes it data-sized,
    // so the collect must probe, not assume).
    "time_to_convert" -> ((s, dir) => timeToConvert(s, dir)),

    // Daily latency-style percentile tracking: exact p50/p95 of value per
    // (series, day) in INTEGER cents with explicit selection semantics
    // (smallest value whose running count reaches ⌈p·n⌉) — engine-identical
    // by construction, no interpolation, no rounding surface. This is the
    // many-group scale form (the cents aggregate bounds each group at the
    // cents domain; the window runs per tiny group) — groups × days small
    // sorts, never a driver collect, the weighted_median pattern applied
    // to ops metrics. ⌈p·n⌉ is FP-safe cross-engine: binary 0.95 sits
    // BELOW the real 0.95, so the product can never cross the next integer.
    "daily_percentiles" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("event_type"), col("d"), col("cents"))
        .agg(count(lit(1)).as("n"))
      val grp = Window.partitionBy("event_type", "d")
      val cum = grp.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("cumn", sum(col("n")).over(cum))
        .withColumn("tot", sum(col("n")).over(grp))
        .groupBy(col("event_type"), col("d"))
        .agg(max(col("tot")).as("n_events"),
          min(when(col("cumn") >= ceil(col("tot") * 0.5), col("cents"))).as("p50_cents"),
          min(when(col("cumn") >= ceil(col("tot") * 0.95), col("cents"))).as("p95_cents"))
        .orderBy(col("event_type"), col("d"))
    }),

    // Time-constrained funnel conversion: signup → first purchase WITHIN
    // 72h (event_funnel's ordered stages have no deadline — this is the
    // conversion-window variant every growth dashboard wants). Cohorted by
    // signup week; all math in integer µs, the rate is a floor-rounded
    // integer ratio. Two user-sized aggregates + one equi-join, as in
    // time_to_convert — never a per-event window.
    "funnel_conversion" -> ((s, dir) => {
      val (su, pu) = signupFunnel(s, dir)
      val deadline = 72L * 3600L * 1000000L
      su.join(pu.select(col("user_id"), col("p")), Seq("user_id"), "left")
        .groupBy(to_date(date_trunc("week", timestamp_micros(col("s")))).as("cohort_week"))
        .agg(count(lit(1)).as("n_signups"),
          count(when(col("p").isNotNull && col("p") - col("s") <= deadline, 1))
            .as("n_converted_72h"))
        .withColumn("rate_72h",
          floor(col("n_converted_72h").cast("double") / col("n_signups") * 1e4 + 0.5) / 1e4)
        .orderBy(col("cohort_week"))
    }),

    // Day-7 rolling retention: share of a day's actives who are also
    // active exactly 7 days later. The corpus collapses to the distinct
    // (user, day) table FIRST; the retention join is user-equi on that
    // collapsed table (each row matches ≤1 shifted row). Days within a
    // week of the stream's end trivially retain 0 — kept, not special-
    // cased, so the output is a pure function of the activity table.
    "retention_d7" -> ((s, dir) => {
      val ud = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
      val actives = ud.groupBy(col("d")).agg(count(lit(1)).as("actives"))
      val ret = ud.as("a").join(ud.as("b"),
          col("a.user_id") === col("b.user_id") &&
            date_add(col("a.d"), 7) === col("b.d"))
        .groupBy(col("a.d").as("d")).agg(count(lit(1)).as("retained"))
      actives.join(ret, Seq("d"), "left")
        .select(col("d"), col("actives"),
          coalesce(col("retained"), lit(0L)).as("retained"),
          (floor(coalesce(col("retained"), lit(0L)).cast("double")
            / col("actives") * 1e4 + 0.5) / 1e4).as("rate_d7"))
        .orderBy(col("d"))
    }),

    // Cohort lifetime-value curves: cumulative purchase cents per signup
    // cohort by week offset — the growth dashboard's LTV triangle. All
    // value mass in exact integer cents, cumulative via one ordered window
    // over the cohorts×offsets aggregate (config-sized); cohort sizes ride
    // the same signup aggregate.
    "user_ltv" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
      val su = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(to_date(date_trunc("week", col("ts")))).as("cohort_week"))
      val cohortSize = su.groupBy(col("cohort_week")).agg(count(lit(1)).as("n_users"))
      val rev = ev.where(col("event_type") === "purchase" && col("value").isNotNull)
        .join(su, "user_id")
        .withColumn("w", to_date(date_trunc("week", col("ts"))))
        .where(col("w") >= col("cohort_week"))
        .groupBy(col("cohort_week"),
          expr("CAST(datediff(w, cohort_week) DIV 7 AS BIGINT)").as("week_offset"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      val cum = Window.partitionBy("cohort_week").orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.withColumn("cum_cents", sum(col("cents")).over(cum))
        .join(cohortSize, "cohort_week")
        .select(col("cohort_week"), col("week_offset"), col("n_users"),
          col("cents"), col("cum_cents"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // χ² independence test between event type and weekday (the
    // contingency-table sibling of benford_dq): observed counts collapse
    // to the 5×7 grid in one aggregate, expected = row·col/N and the χ²
    // sum run over that grid. Spark weekday() (0=Monday) ≡ DuckDB
    // isodow−1 (the seasonality_profile mapping).
    "chi2_independence" -> ((s, dir) => {
      val obs = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), weekday(col("ts")).as("dow"))
        .agg(count(lit(1)).as("o"))
      val wr = Window.partitionBy("event_type")
      val wc = Window.partitionBy("dow")
      val wn = Window.partitionBy()
      obs
        .withColumn("r", sum(col("o")).over(wr))
        .withColumn("c", sum(col("o")).over(wc))
        .withColumn("n", sum(col("o")).over(wn))
        .withColumn("e", col("r").cast("double") * col("c") / col("n"))
        .agg(max(col("n")).as("n_events"),
          (count_distinct(col("event_type")) - 1).as("df_rows"),
          (count_distinct(col("dow")) - 1).as("df_cols"),
          (floor(sum(pow(col("o") - col("e"), 2) / col("e")) * 1e4 + 0.5) / 1e4)
            .as("chi2"))
        .select(col("n_events"), (col("df_rows") * col("df_cols")).as("dof"), col("chi2"))
    }),

    // Audience overlap: pairwise Jaccard between event types' distinct
    // user sets — the behavioral form of the set-similarity pattern. The
    // corpus collapses to the distinct (type, user) table first; co-
    // occurrence pairs come from a user-equi join (work = Σ per-user
    // types², bounded by types²·users), sizes join back per type.
    "audience_overlap" -> ((s, dir) => {
      val ut = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("user_id").isNotNull)
        .select(col("event_type"), col("user_id")).distinct()
      val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("sz"))
      val both = ut.as("a").join(ut.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      both
        .join(sizes.select(col("event_type").as("type_a"), col("sz").as("na")), "type_a")
        .join(sizes.select(col("event_type").as("type_b"), col("sz").as("nb")), "type_b")
        .select(col("type_a"), col("type_b"), col("n_both"),
          (floor(col("n_both").cast("double")
            / (col("na") + col("nb") - col("n_both")) * 1e6 + 0.5) / 1e6).as("jaccard"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Linear multi-touch attribution (the fractional complement to
    // attribution_touch's first/last models): every non-purchase touch in
    // the 7-day lookback shares the conversion's value. Credit stays in
    // EXACT integer arithmetic — (cents · n_type) DIV n_total per
    // (conversion, type) — because a double 1/k-credit sum rounds on
    // engine-dependent half boundaries; the floor-credit convention drops
    // at most n_total−1 remainder cents per conversion, deterministically.
    // The touch join is user-equi + time-band: co-partitioned by user, the
    // fan-out bounded by per-user 7-day activity.
    //
    // Round-9 NEGATIVE RESULT (verdict item 6): a per-(user, type) window
    // form — conversions replicated across the type domain, trailing RANGE
    // frame [us−7d, us) counting touches — was built, oracle-verified
    // identical, and measured SLOWER: 4.6–5.5 s vs 3.0–3.5 s at sf0.1 and
    // ~tied (6.5 vs 6.6 s) at 10× event density. The union doubles the
    // event scan and the global (user, type) sort costs more than the
    // band join's pair stream until pair volume ≈ 100× today's; the week
    // bucket already bounds pairs by ADJACENT-WEEK density products, so
    // the quadratic regime needs per-user-week activity ≫ current. Keep
    // the join; revisit only if a skew profile shows mega-user weeks.
    "attribution_linear" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull && col("value").isNotNull)
        .withColumn("us", unix_micros(col("ts")))
      val conv = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("conv_id"), col("us").as("cus"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val touch = ev.where(col("event_type") =!= "purchase")
        .select(col("user_id").as("tu"), col("event_type").as("touch_type"),
          col("us").as("tus"))
      // 7-day-epoch bucket joins ALONGSIDE the user key: with user_id alone,
      // every (conversion, touch) pair of a user is evaluated — quadratic in
      // per-user event DENSITY (a power user with a year of history
      // cross-products the whole year). tus ∈ [cus−7d, cus) implies
      // bucket(tus) ∈ {bucket(cus), bucket(cus)−1}, so each conversion fans
      // out to exactly 2 candidate buckets and evaluated pairs are bounded
      // by adjacent-week density products; each matching pair survives under
      // exactly one bucket, so the pair set is unchanged.
      val wkUs = 7L * 86400L * 1000000L
      val joined = conv
        .withColumn("bk", explode(array(expr(s"cus DIV $wkUs"), expr(s"cus DIV $wkUs - 1"))))
        .join(touch.withColumn("tb", expr(s"tus DIV $wkUs")),
          col("user_id") === col("tu") && col("bk") === col("tb") &&
            col("tus") < col("cus") && col("tus") >= col("cus") - lit(wkUs))
      val perConv = joined.groupBy(col("conv_id")).agg(count(lit(1)).as("n_total"))
      joined.groupBy(col("conv_id"), col("cents"), col("touch_type"))
        .agg(count(lit(1)).as("n_type"))
        .join(perConv, "conv_id")
        .withColumn("credit", expr("(cents * n_type) DIV n_total"))
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_conversions_touched"),
          sum(col("credit")).as("credit_cents"))
        .orderBy(col("touch_type"))
    }),

    // Compression-ratio quality screen (Gopher/C4 "too compressible =
    // boilerplate"). Round 9 retired the DEFLATE definition from the
    // DECLARED query (byte counts were JVM-stable but not cross-engine-
    // expressible — the fleet's one rows-only asterisk) in favor of a
    // deterministic LZ-style proxy both engines compute exactly: per doc,
    // the fraction of its 8-char windows that are DISTINCT (few distinct
    // windows = long repeats = highly compressible — the same signal
    // DEFLATE's match-finder keys on). Per-doc ratio quantized to 1e-6
    // BIGINT via integer DIV, so the per-source average is an exact
    // integer sum + one IEEE division (order-independent, attribution_
    // markov convention). One narrow interpreted-HOF map per doc (docs
    // are KB-sized; the lambda body is a single substring — the
    // re-evaluation rule doesn't bite), then a sources-sized aggregate.
    // The native DeflateRatio expression stays as a non-declared
    // diagnostic, spec-pinned in MlopsSpec.
    "compression_ratio" -> ((s, dir) => {
      t(s, dir, "documents")
        .where(col("text").isNotNull && length(col("text")) >= 8)
        .withColumn("r6", expr(
          "(CAST(size(array_distinct(transform(sequence(1, length(text) - 7), " +
            "i -> substring(text, i, 8)))) AS BIGINT) * 1000000) " +
            "DIV CAST(length(text) - 7 AS BIGINT)"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(r6) DIV count(1)").as("avg6"),
          count(when(col("r6") < 400000L, 1)).as("n_repetitive"))
        .select(col("source"), col("n_docs"),
          (col("avg6") / lit(1e6)).as("avg_ratio"), col("n_repetitive"))
        .orderBy(col("source"))
    }),

    // Exact two-sample Kolmogorov–Smirnov drift test between time halves,
    // per event-type series. The value domain collapses to integer cents
    // FIRST — one map-side-combined (type, cents, per-half-counts)
    // aggregate, so the shuffle carries the bounded cents histogram and
    // never the corpus — then both empirical CDFs come from running sums
    // in ONE shared window sort per type. D = max|ca/na − cb/nb| over
    // doubles that are engine-identical because every term is a single
    // IEEE division of exact BIGINTs (the all-integer cross-product form
    // ca·nb − cb·na is exact too but overflows BIGINT at 1e12-row halves).
    // The α=0.05 rejection flag compares against the 1.358·√((na+nb)/na·nb)
    // critical value — sqrt is correctly rounded in both engines, so the
    // boolean is deterministic as well. Complements drift_psi: PSI needs a
    // binning choice, KS is binning-free on the ordered domain.
    "ks_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
        .withColumn("us", unix_micros(col("ts")))
      val mid = broadcast(ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        .select(expr("(mn + mx) DIV 2").as("mid")))
      val hist = ev.crossJoin(mid)
        .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
        .groupBy(col("event_type"), col("cents"))
        .agg(count(when(col("us") <= col("mid"), 1)).as("na"),
          count(when(col("us") > col("mid"), 1)).as("nb"))
      val wt = Window.partitionBy("event_type")
      val wc = wt.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("ta", sum(col("na")).over(wt))
        .withColumn("tb", sum(col("nb")).over(wt))
        .withColumn("ca", sum(col("na")).over(wc))
        .withColumn("cb", sum(col("nb")).over(wc))
        // a type entirely inside one half: 0-total divisor → NULL (not an
        // ANSI error), max ignores it → NULL ks_d/flag in BOTH engines
        .withColumn("dd", abs(col("ca") / when(col("ta") =!= 0, col("ta"))
          - col("cb") / when(col("tb") =!= 0, col("tb"))))
        .groupBy(col("event_type"))
        .agg(max(col("ta")).as("n_first"), max(col("tb")).as("n_second"),
          (floor(max(col("dd")) * 1e6 + 0.5) / 1e6).as("ks_d"),
          (max(col("dd")) > lit(1.358) *
            sqrt((max(col("ta")) + max(col("tb"))).cast("double")
              / (max(col("ta")).cast("double") * max(col("tb"))))).as("reject_95"))
        .orderBy(col("event_type"))
    }),

    // Score-decile lift/calibration table — the model-evaluation view of a
    // propensity score. Per-user engagement score is an EXACT integer-cents
    // sum (a double sum is addend-order-dependent across engines and
    // partitionings); the ≥$150-purchase label makes a discriminating
    // target on this corpus. The decile cut is a DISTRIBUTED
    // GlobalOrder.withNtile over the total order (score desc, user_id) —
    // the naive ntile(10) global window is one task sorting every user at
    // scale (round-10 verdict); the decile-level cumulative windows run
    // over the 10-row aggregate (config-sized, explicitly
    // partitionBy(lit(0))). Rates and cumulative lift are single IEEE
    // divisions of exact counts.
    "lift_deciles" -> ((s, dir) => {
      import graft.operators.GlobalOrder
      val u = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("score"),
          max(when(col("event_type") === "purchase" && col("value") >= 150, 1L)
            .otherwise(0L)).as("conv"))
        .localCheckpoint(false) // feeds the ntile pass + its probe jobs
      val d = GlobalOrder.withNtile(u.withColumn("_negs", col("score") * -1),
          Seq(col("_negs"), col("user_id")), 10, "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      val wc = Window.partitionBy(lit(0)).orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.partitionBy(lit(0))
      d.withColumn("cu", sum(col("n_users")).over(wc))
        .withColumn("cc", sum(col("n_conv")).over(wc))
        .withColumn("tu", sum(col("n_users")).over(wa))
        .withColumn("tc", sum(col("n_conv")).over(wa))
        .select(col("decile"), col("n_users"), col("n_conv"),
          (floor(col("n_conv") / col("n_users") * 1e6 + 0.5) / 1e6).as("conv_rate"),
          // zero-conversion corpus: NULL lift (not IEEE ∞ reaching floor)
          (floor(when(col("tc") =!= 0,
            (col("cc") / col("cu")) / (col("tc") / col("tu"))) * 1e6 + 0.5) / 1e6)
            .as("cum_lift"))
        .orderBy(col("decile"))
    }),

    // Per-user behavioral/bot profile over 30-minute sessions (the
    // session_stats gaps-and-islands ids): session counts, largest burst,
    // single-event-session share, and a rate-based bot flag — a session
    // with ≥10 events at >100 events/min, compared by EXACT BIGINT
    // cross-multiplication (n·60e6 > dur_µs·100) so a zero-duration
    // single-µs burst flags correctly instead of dividing by zero. One
    // user window sort + two shrinking aggregates; output is users-sized.
    "bot_score" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      val ow = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val sess = ev
        .withColumn("prev_us", lag(col("us"), 1).over(ow))
        .withColumn("brk", when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n"), (max(col("us")) - min(col("us"))).as("dur_us"))
      sess.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n")).as("n_events"),
          max(col("n")).as("max_burst"),
          count(when(col("n") === 1, 1)).as("n_singletons"),
          count(when(col("n") >= 10 &&
            col("n") * 60000000L > col("dur_us") * 100L, 1)).as("n_bot_sessions"))
        .withColumn("singleton_share",
          floor(col("n_singletons") / col("n_sessions") * 1e6 + 0.5) / 1e6)
        .select(col("user_id"), col("n_sessions"), col("n_events"),
          col("max_burst"), col("singleton_share"), col("n_bot_sessions"))
        .orderBy(col("user_id"))
    }),

    // Decile-by-decile Q–Q drift between time halves, per series — WHERE
    // the distribution moved, where ks_drift says WHETHER. Exact selection
    // semantics (smallest cents whose running count reaches ⌈d·n/10⌉ — the
    // daily_percentiles idiom) on the collapsed (type, half, cents)
    // histogram; the 9-row decile grid fans out histogram rows, never the
    // corpus. Every output is an exact integer-cents value or difference.
    "qq_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
        .withColumn("us", unix_micros(col("ts")))
      val mid = broadcast(ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        .select(expr("(mn + mx) DIV 2").as("mid")))
      val hist = ev.crossJoin(mid)
        .withColumn("half", when(col("us") <= col("mid"), 0).otherwise(1))
        .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
        .groupBy(col("event_type"), col("half"), col("cents"))
        .agg(count(lit(1)).as("n"))
      val grp = Window.partitionBy("event_type", "half")
      val cum = grp.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val deciles = broadcast(s.range(1, 10).select(col("id").as("dec")))
      hist.withColumn("cumn", sum(col("n")).over(cum))
        .withColumn("tot", sum(col("n")).over(grp))
        .crossJoin(deciles)
        .where(col("cumn") >= ceil(col("dec") * col("tot") / 10.0))
        .groupBy(col("event_type"), col("half"), col("dec"))
        .agg(min(col("cents")).as("qv"))
        .groupBy(col("event_type"), col("dec"))
        .agg(min(when(col("half") === 0, col("qv"))).as("q_first"),
          min(when(col("half") === 1, col("qv"))).as("q_second"))
        .select(col("event_type"), col("dec").as("decile"),
          col("q_first"), col("q_second"),
          (col("q_second") - col("q_first")).as("shift_cents"))
        .orderBy(col("event_type"), col("decile"))
    }),

    // Wilson-lower-bound rate ranking per event type (success = a ≥$100
    // event): the smoothing every leaderboard needs so a 3-for-3 minnow
    // can't outrank a 9000-for-10000 whale on raw rate. One conditional
    // aggregate to the types domain; the bound is IEEE-deterministic
    // arithmetic over exact counts (sqrt is correctly rounded in both
    // engines). Emitted ordered by the ROUNDED bound with a type
    // tie-break, so the ranking itself is engine-exact.
    "ctr_wilson" -> ((s, dir) => {
      val z = 1.96
      val g = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), count(when(col("value") >= 100, 1)).as("pos"))
      val p = col("pos") / col("n").cast("double")
      val nn = col("n").cast("double")
      val lb = (p + lit(z * z) / (nn * 2) -
        lit(z) * sqrt(p * (lit(1.0) - p) / nn + lit(z * z) / (nn * nn * 4))) /
        (lit(1.0) + lit(z * z) / nn)
      g.select(col("event_type"), col("n"), col("pos"),
          (floor(p * 1e6 + 0.5) / 1e6).as("rate"),
          (floor(lb * 1e6 + 0.5) / 1e6).as("wilson_lb"))
        .orderBy(col("wilson_lb").desc, col("event_type"))
    }),

    // Temporal-split leakage audit: split the stream at the midpoint (the
    // drift_psi/ks_drift boundary) and count, per type, the users whose
    // activity STRADDLES the cut — the population that makes a naive
    // time-based train/test split leak user-level signal. The corpus
    // collapses to (type, user, min_us, max_us) in one map-side-combined
    // aggregate; straddle tests are exact integer comparisons.
    "split_leakage" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("user_id").isNotNull && col("ts").isNotNull)
        .withColumn("us", unix_micros(col("ts")))
      val mid = broadcast(ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        .select(expr("(mn + mx) DIV 2").as("mid")))
      ev.crossJoin(mid)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(col("us")).as("mnu"), max(col("us")).as("mxu"),
          max(col("mid")).as("mid"))
        .groupBy(col("event_type"))
        .agg(count(when(col("mnu") <= col("mid"), 1)).as("users_train"),
          count(when(col("mxu") > col("mid"), 1)).as("users_test"),
          count(when(col("mnu") <= col("mid") && col("mxu") > col("mid"), 1))
            .as("users_leaking"))
        .withColumn("leak_rate",
          floor(col("users_leaking")
            / when(col("users_test") =!= 0, col("users_test")) * 1e6 + 0.5) / 1e6)
        .orderBy(col("event_type"))
    }),

    // CUPED variance reduction (Deng et al., WSDM'13): adjust the post-
    // period metric with the pre-period covariate, Y' = Y − θ(X − μx),
    // θ = cov/var — the experimentation-platform variance cut. First moments
    // (n, Σx, Σy) accumulate as EXACT BIGINT cents; the second moments
    // (Σxy, Σx², Σy²) accumulate in DOUBLE — exact below 2⁵³ (true at every
    // test SF, so the oracle compare is still bit-exact) and gracefully
    // rounding, not wrapping, at the 100-TB user counts where a BIGINT sum
    // of products would overflow 2⁶³. One user-sized aggregate then a 2-row
    // arm aggregate; θ/variances/ρ² derive through a single shared formula
    // text, so both engines walk the identical IEEE expression tree.
    // var_adj = var_y·(1−ρ²) is algebraic — no second data pass.
    "ab_cuped" -> ((s, dir) => {
      val mid = expr("TIMESTAMP '2024-01-16 00:00:00'")
      val per = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull)
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts") < mid, col("cents")).otherwise(0L)).as("x"),
          sum(when(col("ts") >= mid, col("cents")).otherwise(0L)).as("y"))
      per.withColumn("arm",
          when(col("user_id") % 2 === 0, "control").otherwise("treatment"))
        .groupBy(col("arm"))
        // the second-moment sums accumulate in DOUBLE: a BIGINT Σ(x·y)
        // overflows 2⁶³ around 10⁵× this user count (review-caught), while
        // the double sum stays exact below 2⁵³ (true at every test SF) and
        // degrades gracefully — not wraps — beyond it
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x").cast("double") * col("y")).as("sxy"),
          sum(col("x").cast("double") * col("x")).as("sxx"),
          sum(col("y").cast("double") * col("y")).as("syy"))
        .select(col("arm"), col("n").as("n_users"),
          expr("floor(sy / (100.0 * n) * 1e4 + 0.5) / 1e4").as("mean_post"),
          expr("floor((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * (n - 1)) * 1e4 + 0.5) / 1e4").as("var_post"),
          expr("floor((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * (n - 1)) * (1.0 - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) * 1e4 + 0.5) / 1e4").as("var_adj"),
          expr("floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) * 1e6 + 0.5) / 1e6").as("rho2"))
        .orderBy(col("arm"))
    }),

    // Always-valid sequential A/B monitoring (Johari, Pekelis & Walsh's
    // mSPRT — the fix for the "peeking" problem: a fixed-n z-test read
    // weekly inflates false positives several-fold, while the mixture
    // likelihood ratio is valid at EVERY look). Per type, cumulative
    // weekly arm moments come from ONE conditional aggregate + windows;
    // the unit-information mixture (τ²=σ²) gives the closed form
    // logΛ = ½ln(V/(V+σ²)) + δ̂²σ²/(2V(V+σ²)) with V = σ²(1/nₐ+1/n_b),
    // computed in LOG space so a decisive experiment never overflows exp.
    // σ² is the full-period pooled variance (one broadcast row per type,
    // ab_cuped moment convention). Significance = rounded logΛ ≥ ln(20)
    // (always-valid p ≤ 0.05), an exact compare on the micro-rounded
    // value.
    "ab_sequential" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("event_type").isNotNull &&
          col("value").isNotNull && col("ts").isNotNull)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
          (col("user_id") % 2 === 0).as("isA"),
          expr("CAST(floor(CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS DOUBLE) / 7e0) AS BIGINT)") // FLOOR division: Spark DIV truncates toward zero while the
            // oracle's DuckDB `//` floors — they differ on pre-epoch dates
            .as("wk"))
      val wkAgg = ev.groupBy(col("event_type"), col("wk"))
        .agg(count(when(col("isA"), 1)).as("na"),
          count(when(!col("isA"), 1)).as("nb"),
          sum(when(col("isA"), col("cents")).otherwise(0L)).as("sa"),
          sum(when(!col("isA"), col("cents")).otherwise(0L)).as("sb"))
      val pooled = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
          sum(col("cents") * col("cents")).as("sxx"))
        .select(col("event_type"),
          expr("(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1))")
            .as("sig2"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      wkAgg
        .withColumn("cna", sum(col("na")).over(w))
        .withColumn("cnb", sum(col("nb")).over(w))
        .withColumn("csa", sum(col("sa")).over(w))
        .withColumn("csb", sum(col("sb")).over(w))
        .join(broadcast(pooled), "event_type")
        .withColumn("llr6", expr(MsprtLlr6Sql))
        .select(col("event_type"), col("wk"), col("cna").as("n_a"),
          col("cnb").as("n_b"),
          (col("llr6").cast(DoubleType) / 1e6).as("log_lr"),
          (col("llr6") >= 2995732L).as("significant"))
        .orderBy(col("event_type"), col("wk"))
    }),

    // Offline policy evaluation by replay (Li, Chu, Langford & Wang 2011
    // — the unbiased way to score a NEW decision policy on LOGGED
    // randomized data without deploying it: keep exactly the events where
    // the logged arm equals the policy's choice; under uniform logging
    // the matched subset is an unbiased sample of the policy's own
    // trajectory). Policy = "pick the arm with the higher first-half mean
    // reward" per type (exact cross-multiplied BIGINT argmax, ties to A);
    // the replay runs on the held-out second half. Two conditional
    // aggregates to the types domain; the match rate ≈ ½ IS the uniform-
    // logging premise, published as a column.
    "policy_replay" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("event_type").isNotNull &&
          col("value").isNotNull && col("ts").isNotNull)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
          (col("user_id") % 2 === 0).as("isA"),
          (col("ts") < expr("TIMESTAMP '2024-01-16 00:00:00'")).as("fh"))
      val policy = ev.where(col("fh")).groupBy(col("event_type"))
        .agg(count(when(col("isA"), 1)).as("na"),
          sum(when(col("isA"), col("cents")).otherwise(0L)).as("sa"),
          count(when(!col("isA"), 1)).as("nb"),
          sum(when(!col("isA"), col("cents")).otherwise(0L)).as("sb"))
        // exact rational argmax sa/na ≥ sb/nb ⟺ sa·nb ≥ sb·na (doubles:
        // exact < 2⁵³ per product, the ab_cuped convention)
        .select(col("event_type"),
          expr("CAST(sa AS DOUBLE) * nb >= CAST(sb AS DOUBLE) * na").as("pickA"))
      ev.where(!col("fh")).join(broadcast(policy), "event_type")
        .groupBy(col("event_type"), col("pickA"))
        .agg(count(lit(1)).as("n_test"),
          count(when(col("isA") === col("pickA"), 1)).as("n_matched"),
          sum(when(col("isA") === col("pickA"), col("cents")).otherwise(0L))
            .as("s_matched"),
          sum(col("cents")).as("s_all"))
        .select(col("event_type"),
          when(col("pickA"), "A").otherwise("B").as("target_arm"),
          col("n_test"), col("n_matched"),
          expr("floor(CAST(n_matched AS DOUBLE) / n_test * 1e4 + 0.5) / 1e4")
            .as("match_rate"),
          expr("floor(CAST(s_matched AS DOUBLE) / (1e2 * n_matched) * 1e4 + 0.5) / 1e4")
            .as("policy_value"),
          expr("floor(CAST(s_all AS DOUBLE) / (1e2 * n_test) * 1e4 + 0.5) / 1e4")
            .as("logged_value"))
        .orderBy(col("event_type"))
    }),

    // Growth accounting (the standard New/Retained/Resurrected/Churned
    // decomposition — the identity every WAU chart should be read
    // through: ΔWAU = new + resurrected − churned, so flat topline can
    // hide a leaky bucket): users collapse to (user, week) presence in
    // one aggregate, each user's week classifies against their previous
    // active week via ONE lag window (new = first week; retained = prev
    // week adjacent; resurrected = gap > 1), churn counts into the week
    // AFTER the last activity via lead. Exact integer week arithmetic on
    // epoch-days DIV 7; the conservation law ships as spec, not prose.
    "growth_accounting" -> ((s, dir) => {
      // the synthetic log is dense (every user active every week), so a
      // deterministic md5 thinning (keep 10/16 of (user, week) presences —
      // the train_split seeded-randomness convention) plants the gaps that
      // make all four quadrants non-degenerate
      val uw = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"),
          expr("CAST(floor(CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS DOUBLE) / 7e0) AS BIGINT)") // FLOOR division: Spark DIV truncates toward zero while the
            // oracle's DuckDB `//` floors — they differ on pre-epoch dates
            .as("wk"))
        .distinct()
        .where(expr("substring(md5(concat('ga:', CAST(user_id AS STRING), ':', CAST(wk AS STRING))), 1, 1)")
          .isin("0", "1", "2", "3", "4", "5", "6", "7", "8", "9"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
      val lab = uw
        .withColumn("prev", lag(col("wk"), 1).over(w))
        .withColumn("nxt", lead(col("wk"), 1).over(w))
      val active = lab.select(col("wk"),
        when(col("prev").isNull, "new")
          .when(col("prev") === col("wk") - 1, "retained")
          .otherwise("resurrected").as("kind"))
      // churn lands in the week AFTER the last active week (or after a
      // gap): one row per (user, inactive-following-week)
      val churned = lab
        .where(col("nxt").isNull || col("nxt") > col("wk") + 1)
        .select((col("wk") + 1).as("wk"), lit("churned").as("kind"))
      active.unionByName(churned)
        .groupBy(col("wk"))
        .agg(count(when(col("kind") === "new", 1)).as("n_new"),
          count(when(col("kind") === "retained", 1)).as("n_retained"),
          count(when(col("kind") === "resurrected", 1)).as("n_resurrected"),
          count(when(col("kind") === "churned", 1)).as("n_churned"))
        .orderBy(col("wk"))
    }),

    // Coarsened Exact Matching ATT (Iacus, King & Porro 2012 — the
    // matching estimator that actually scales: coarsen covariates, match
    // EXACTLY on the coarsened cells, prune unmatched cells, and weight
    // the per-cell treated−control gaps by treated mass; no distance
    // metric, no nearest-neighbor search, just a groupBy). Covariates =
    // (segment, acctbal bin); outcome = lifetime order spend (left join —
    // never-buyers count at 0, excluding them would select on the
    // outcome). Per-cell contributions micro-round to BIGINT so the ATT
    // fold is an order-independent integer sum; the estimate rides every
    // row of the per-cell card (simpson_check's pooled-column shape).
    "cem_att" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"),
        col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 2500e0) AS BIGINT)").as("bal_bin"),
        (col("c_custkey") % 3 === 0).as("treated"))
      val spend = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sp"))
      val cell = c.join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_mktsegment"), col("bal_bin"), col("treated"),
          coalesce(col("sp"), lit(0L)).as("cents"))
        .groupBy(col("c_mktsegment"), col("bal_bin"))
        .agg(count(when(col("treated"), 1)).as("n_t"),
          sum(when(col("treated"), col("cents")).otherwise(0L)).as("s_t"),
          count(when(!col("treated"), 1)).as("n_c"),
          sum(when(!col("treated"), col("cents")).otherwise(0L)).as("s_c"))
        .withColumn("matched", col("n_t") > 0 && col("n_c") > 0)
        .withColumn("c6", when(col("matched"),
          expr("CAST(floor((CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c) * n_t * 1e6 + 0.5) AS BIGINT)"))
          .otherwise(lit(0L)))
      val tot = cell.agg(
        sum(when(col("matched"), col("n_t")).otherwise(0L)).as("nt_m"),
        sum(col("c6")).as("c6_tot"))
      cell.crossJoin(broadcast(tot))
        .select(col("c_mktsegment"), col("bal_bin"), col("n_t"), col("n_c"),
          col("matched"),
          when(col("n_t") > 0,
            expr("floor(CAST(s_t AS DOUBLE) / (1e2 * n_t) * 1e4 + 0.5) / 1e4")).as("mean_t"),
          when(col("n_c") > 0,
            expr("floor(CAST(s_c AS DOUBLE) / (1e2 * n_c) * 1e4 + 0.5) / 1e4")).as("mean_c"),
          expr("floor(CAST(c6_tot AS DOUBLE) / nt_m / 1e6 / 1e2 * 1e4 + 0.5) / 1e4")
            .as("att"))
        .orderBy(col("c_mktsegment"), col("bal_bin"))
    }),

    // Experiment power analysis (the sample-size gate that runs BEFORE
    // ab_ztest's readout — an underpowered test that "found nothing" found
    // nothing about nothing): per event type, the classic two-arm formula
    // n = 2σ²(z_{α/2}+z_β)²/δ² at 80% power / 5% α, with the MDE set to
    // 5% of the observed mean. z constants are shared literals (both
    // engines square the identical sum); round 9: the second moment sxx
    // sums cents² as EXACT BIGINT (a distributed DOUBLE sum past 2^53
    // becomes partition-order-dependent at very large SFs; ANSI sum
    // overflow throws rather than wraps, which is the guard — cents² is
    // bounded, so the sum fits until ~1e18/cents² rows); ONE conditional
    // aggregate to the types domain also yields the parity arm sizes the
    // requirement is checked against.
    "power_analysis" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("event_type").isNotNull &&
          col("value").isNotNull)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
          (col("user_id") % 2 === 0).as("isA"))
      ev.groupBy(col("event_type"))
        .agg(count(when(col("isA"), 1)).as("n_a"),
          count(when(!col("isA"), 1)).as("n_b"),
          count(lit(1)).as("n"), sum(col("cents")).as("sx"),
          sum(col("cents") * col("cents")).as("sxx"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          expr(PowerMeanSql).as("mean_cents"),
          expr(PowerVarSql).as("var_cents"),
          expr(PowerNReqSql).as("n_required"))
        .withColumn("powered", expr("least(n_a, n_b) >= n_required"))
        .orderBy(col("event_type"))
    }),

    // Simpson's-paradox audit (Simpson 1951; the Berkeley-admissions
    // failure mode every experiment readout should check): the pooled
    // A-vs-B rate comparison can REVERSE inside every segment when arm
    // mix differs across segments — this card flags segments whose
    // direction contradicts the pooled direction, the "don't ship the
    // pooled number" signal. ONE orders⋈customer join then a
    // segments-bounded conditional aggregate; signs compare via
    // cross-multiplied DOUBLE products (exact below 2⁵³ per arm-segment
    // cell — the ab_cuped second-moment convention — and graceful, not
    // wrapping, beyond); rates round through single divisions.
    "simpson_check" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("hi"))
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val per = o.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), (col("o_custkey") % 2 === 0).as("isA"), col("hi"))
        .groupBy(col("c_mktsegment"))
        .agg(count(when(col("isA"), 1)).as("n_a"),
          count(when(col("isA") && col("hi"), 1)).as("pos_a"),
          count(when(!col("isA"), 1)).as("n_b"),
          count(when(!col("isA") && col("hi"), 1)).as("pos_b"))
      val pooled = per.agg(sum(col("pos_a")).as("pa"), sum(col("n_a")).as("na"),
        sum(col("pos_b")).as("pb"), sum(col("n_b")).as("nb"))
      per.crossJoin(broadcast(pooled))
        .select(col("c_mktsegment"), col("n_a"), col("pos_a"), col("n_b"), col("pos_b"),
          expr("floor(CAST(pos_a AS DOUBLE) / n_a * 1e6 + 0.5) / 1e6").as("rate_a"),
          expr("floor(CAST(pos_b AS DOUBLE) / n_b * 1e6 + 0.5) / 1e6").as("rate_b"),
          expr("CAST(sign(CAST(pos_a AS DOUBLE) * n_b - CAST(pos_b AS DOUBLE) * n_a) AS BIGINT)")
            .as("seg_sign"),
          expr("CAST(sign(CAST(pa AS DOUBLE) * nb - CAST(pb AS DOUBLE) * na) AS BIGINT)")
            .as("pooled_sign"))
        .withColumn("reversed", expr("seg_sign * pooled_sign < 0"))
        .orderBy(col("c_mktsegment"))
    }),

    // Markov removal-effect attribution (Anderl et al. 2016 —
    // "fractribution", the principled multi-touch model that
    // first/last-touch and linear heuristics approximate): journeys
    // truncate at first purchase, a first-order chain over
    // {start}∪channels∪{conv,null} is fitted from ONE user window sort
    // (the markov_transitions shape), and each channel's credit is its
    // REMOVAL EFFECT — how much absorbing-into-conv probability vanishes
    // when transitions into that channel are deleted. The absorbing-chain
    // solve is a 20-round fixed-point on the types²-bounded matrix in the
    // DRIVER (guarded collect) — and it runs in EXACT FIXED-POINT
    // INTEGERS: probabilities quantize to 1e-6 units via BIGINT floor
    // division, values live in 1e-12 units, every term is
    // (p6·v12) DIV 1e6 ≤ 1e18 regardless of corpus size — so the
    // iteration is order-independent and the loop-generated unrolled
    // oracle reproduces it bit-for-bit (the graph_hits precedent, minus
    // its double-sum ordering care).
    "attribution_markov" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
      val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wUser = Window.partitionBy(col("user_id"))
      val seq = ev.withColumn("rn", row_number().over(wSeq))
        .withColumn("fp",
          min(when(col("event_type") === "purchase", col("rn"))).over(wUser))
      val kept = seq.where(col("fp").isNull || col("rn") <= col("fp"))
        .withColumn("cur", when(col("event_type") === "purchase", lit("conv"))
          .otherwise(col("event_type")))
      val wSeq2 = Window.partitionBy(col("user_id")).orderBy(col("rn"))
      val lab = kept
        .withColumn("from_s", coalesce(lag(col("cur"), 1).over(wSeq2), lit("start")))
        .withColumn("mx", max(col("rn")).over(wUser))
      val m = lab.select(col("from_s"), col("cur").as("to_s"))
        .unionByName(lab.where(col("rn") === col("mx") && col("cur") =!= "conv")
          .select(col("cur").as("from_s"), lit("null").as("to_s")))
        .groupBy(col("from_s"), col("to_s")).agg(count(lit(1)).as("n"))
      val cells = m.limit(1001).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      require(cells.length <= 1000,
        "attribution_markov: transition domain exceeds the driver ceiling")
      val tot = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val p6 = cells.map { case (f, tt, n) => ((f, tt), n * 1000000L / tot(f)) }.toMap
      val states = cells.map(_._1).distinct.sorted
      val chans = cells.map(_._2).filter(c => c != "conv" && c != "null").distinct.sorted
      def solve(removed: String): Long = {
        var v = Map.empty[String, Long].withDefaultValue(0L)
        for (_ <- 1 to 20) {
          v = states.map { st =>
            st -> (p6.getOrElse((st, "conv"), 0L) * 1000000L +
              chans.filter(_ != removed)
                .map(c => p6.getOrElse((st, c), 0L) * v(c) / 1000000L).sum)
          }.toMap.withDefaultValue(0L)
        }
        v("start")
      }
      val vb = solve("<base>")
      val nconv = cells.filter(_._2 == "conv").map(_._3).sum
      val diffs = chans.map(c => (c, vb - solve(c)))
      val dtot = diffs.map(_._2).sum
      val out = diffs.map { case (c, dc) =>
        (c, math.floor((dc.toDouble / vb) * 1e6 + 0.5) / 1e6,
          math.floor(dc.toDouble / dtot * 1e6 + 0.5) / 1e6,
          math.floor(dc.toDouble * nconv / dtot * 1e2 + 0.5) / 1e2)
      }
      import s.implicits._
      out.toSeq.toDF("channel", "removal_effect", "attr_share", "attr_conversions")
        .orderBy(col("channel"))
    }),

    // Holt's linear-trend exponential smoothing (Holt 1957 — the
    // level+trend forecasting workhorse between ts_ewma's flat smoother
    // and a full seasonal model): the corpus collapses DISTRIBUTEDLY to
    // the calendar-bounded daily cents series, then the inherently
    // sequential (level, trend) recurrence l←αy+(1−α)(l+b),
    // b←β(l−l₋₁)+(1−β)b folds in the driver over ≤thousands of rows (the
    // graph-family precedent: the collect is bounded by the CALENDAR, not
    // the corpus, and probe-and-fail guarded). α=0.2, β=0.1 as literals
    // in BOTH engines — never a computed 1−α, whose double differs from
    // the 0.8 literal. State stays full-precision; only OUTPUTS
    // micro-round. The oracle walks the identical recurrence as a
    // recursive CTE over the row-numbered dailies.
    "ts_holt" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .where(col("ts").isNotNull && col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      val rows = daily.orderBy(col("day")).limit(4001).collect()
      require(rows.length <= 4000,
        "ts_holt: daily series exceeds the 4000-day driver-fold ceiling")
      var l = 0.0; var b = 0.0
      val out = rows.zipWithIndex.map { case (r, i) =>
        val day = r.getDate(0); val cents = r.getLong(1); val y = cents.toDouble
        val fitted: Option[Double] =
          if (i == 0) { l = y; b = 0.0; None }
          else {
            val fit = l + b
            val lNew = 0.2 * y + 0.8 * (l + b)
            b = 0.1 * (lNew - l) + 0.9 * b
            l = lNew
            Some(fit)
          }
        def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
        (day, cents, fitted.map(r4), r4(l), r4(b))
      }.toSeq
      import s.implicits._
      out.toDF("day", "actual_cents", "fitted", "level", "trend")
    }),

    // Split conformal prediction intervals (Vovk's conformal framework,
    // the Lei et al. 2018 split recipe — the distribution-free way to
    // turn ANY point model into calibrated intervals, and the modern
    // ML-ops release gate for regression models): train/calibration/test
    // split by key mod 4, a per-priority group-mean point model, and the
    // conformal radius q = the ⌈0.9·(n+1)⌉-th smallest calibration
    // residual — finite-sample ≥90% coverage guaranteed for exchangeable
    // data, verified here on the held-out fold. Everything is EXACT
    // integers: predictions are cents DIV counts, residuals are |cents|
    // differences, and the selection runs on a (priority, residual)
    // COUNT HISTOGRAM (the DiscreteQuantile pattern — the calibration
    // values are never buffered per group) with the rank computed as
    // (9·(n+1)+9) DIV 10. Three disjoint fold scans + priority-bounded
    // aggregates; the 5-row model broadcasts.
    "conformal_pi" -> ((s, dir) => {
      import graft.operators.CacheRegistry
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("prio"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        expr("o_orderkey % 4").as("fold"))
      val pred = CacheRegistry.track(o.where(col("fold") <= 1)
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n_train"), sum(col("cents")).as("s_train"))
        .withColumn("pred_cents", expr("s_train DIV n_train")))
      val hist = o.where(col("fold") === 2)
        .join(broadcast(pred.select(col("prio"), col("pred_cents"))), "prio")
        .select(col("prio"), abs(col("cents") - col("pred_cents")).as("r"))
        .groupBy(col("prio"), col("r")).agg(count(lit(1)).as("c"))
      val wq = Window.partitionBy(col("prio")).orderBy(col("r"))
      val wAll = Window.partitionBy(col("prio"))
      val q = hist
        .withColumn("cum", sum(col("c")).over(wq))
        .withColumn("n_cal", sum(col("c")).over(wAll))
        .where(col("cum") >= least(expr("(9 * (n_cal + 1) + 9) DIV 10"), col("n_cal")))
        .groupBy(col("prio"))
        .agg(min(col("r")).as("q_cents"), max(col("n_cal")).as("n_cal"))
      o.where(col("fold") === 3)
        .join(broadcast(pred.select(col("prio"), col("n_train"), col("pred_cents"))), "prio")
        .join(broadcast(q), "prio")
        .groupBy(col("prio"), col("n_train"), col("n_cal"),
          col("pred_cents"), col("q_cents"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(abs(col("cents") - col("pred_cents")) <= col("q_cents"), 1L)
            .otherwise(0L)).as("n_in"))
        .select(col("prio").as("o_orderpriority"), col("n_train"), col("n_cal"),
          col("n_test"), col("pred_cents"), col("q_cents"),
          round(col("n_in").cast(DoubleType) / col("n_test"), 4).as("coverage"))
        .orderBy(col("o_orderpriority"))
    }),

    // Difference-in-differences (Card & Krueger's workhorse — the natural-
    // experiment estimator when randomization isn't available, completing
    // the causal family beside ab_cuped/ab_ztest/ab_srm/lift_deciles):
    // a deterministic "program" cohort (custkey ≡ 0 mod 3) crosses a
    // policy date, and the effect is the treated group's post−pre change
    // net of the control group's — differencing out both the stable
    // cohort gap and the common time trend. ONE conditional aggregate
    // over orders collapses the corpus to a single 2×2 row (counts +
    // exact cents sums); the four means and the DiD derive through
    // shared formula text in pure DOUBLE arithmetic (scientific literals
    // — no DECIMAL division asymmetry between engines), floor-rounded at
    // 1e4 per the ab_cuped convention.
    "did_estimator" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          (col("o_custkey") % 3 === 0).as("tr"),
          (col("o_orderdate") >= expr("TIMESTAMP '1995-06-01 00:00:00'")).as("po"))
      o.agg(
          count(when(!col("tr") && !col("po"), 1)).as("n_cr"),
          count(when(!col("tr") && col("po"), 1)).as("n_cp"),
          count(when(col("tr") && !col("po"), 1)).as("n_tr"),
          count(when(col("tr") && col("po"), 1)).as("n_tp"),
          sum(when(!col("tr") && !col("po"), col("cents")).otherwise(0L)).as("s_cr"),
          sum(when(!col("tr") && col("po"), col("cents")).otherwise(0L)).as("s_cp"),
          sum(when(col("tr") && !col("po"), col("cents")).otherwise(0L)).as("s_tr"),
          sum(when(col("tr") && col("po"), col("cents")).otherwise(0L)).as("s_tp"))
        .select(
          col("n_cr").as("n_ctrl_pre"), col("n_cp").as("n_ctrl_post"),
          col("n_tr").as("n_treat_pre"), col("n_tp").as("n_treat_post"),
          expr(didMeanSql("s_cr", "n_cr")).as("mean_ctrl_pre"),
          expr(didMeanSql("s_cp", "n_cp")).as("mean_ctrl_post"),
          expr(didMeanSql("s_tr", "n_tr")).as("mean_treat_pre"),
          expr(didMeanSql("s_tp", "n_tp")).as("mean_treat_post"),
          expr(DidSql).as("did"))
    }),

    // Seasonal-naive forecast backtest: predict each test-week hour-of-week
    // bucket as the train-period average for that bucket, score with wMAPE
    // per series — the capacity-planning baseline every fancier forecast
    // must beat. Scale shape: the corpus collapses to (type, hour-of-week)
    // cents sums for train and test independently (two partial-agg passes
    // over disjoint scan ranges), a types×168-bounded full-outer join
    // aligns them, and wMAPE stays in EXACT BIGINT arithmetic throughout —
    // |3·actual − predicted3| avoids the ÷3 (train has 3 weeks), with ONE
    // final division per type. No windows, no data-sized joins.
    "forecast_snaive" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
        .withColumn("how", expr("weekday(ts) * 24 + hour(ts)"))
      val tr = ev.where(col("ts") >= expr("TIMESTAMP '2024-01-01 00:00:00'") &&
          col("ts") < expr("TIMESTAMP '2024-01-22 00:00:00'"))
        .groupBy(col("event_type").as("t_type"), col("how").as("t_how"))
        .agg(sum(col("cents")).as("pred3"))
      val te = ev.where(col("ts") >= expr("TIMESTAMP '2024-01-22 00:00:00'") &&
          col("ts") < expr("TIMESTAMP '2024-01-29 00:00:00'"))
        .groupBy(col("event_type").as("e_type"), col("how").as("e_how"))
        .agg(sum(col("cents")).as("act"))
      tr.join(te, col("t_type") === col("e_type") && col("t_how") === col("e_how"),
          "full_outer")
        .select(coalesce(col("t_type"), col("e_type")).as("event_type"),
          coalesce(col("pred3"), lit(0L)).as("pred3"),
          coalesce(col("act"), lit(0L)).as("act"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_buckets"), sum(col("act")).as("actual_cents"),
          sum(abs(lit(3L) * col("act") - col("pred3"))).as("abs_err3"))
        .select(col("event_type"), col("n_buckets"), col("actual_cents"),
          // zero-mass guard (split_leakage precedent): a series with no
          // test-window mass has no defined wMAPE — emit NULL, never ∞
          // (Spark's floor(DOUBLE)→LONG clamps Infinity while DuckDB keeps
          // it, so an unguarded division would split the engines the first
          // time a type misses the test week)
          expr("CASE WHEN actual_cents <> 0 THEN floor(abs_err3 / (3.0 * actual_cents) * 1e6 + 0.5) / 1e6 END")
            .as("wmape"))
        .orderBy(col("event_type"))
    }),

    // Per-series freshness/staleness card: when did each series last report
    // and has its trailing-7-day rate fallen below its lifetime rate — the
    // ops card that pages BEFORE a silent upstream failure starves a
    // training pipeline. ONE conditional aggregate to the types domain; the
    // corpus max timestamp rides a single-row broadcast (split_leakage's
    // scalar pattern); staleness in exact integer hours (µs DIV) and the
    // rate comparison by exact BIGINT cross-multiplication (30·n₇ < 7·n —
    // no rate division, no float boundary).
    "freshness_report" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull)
        .withColumn("us", unix_micros(col("ts")))
      val mx = broadcast(ev.agg(max(col("us")).as("cmax")))
      ev.crossJoin(mx)
        .groupBy(col("event_type"))
        .agg(max(col("us")).as("last_us"), count(lit(1)).as("n_total"),
          sum(when(col("us") > col("cmax") - 604800000000L, 1L).otherwise(0L))
            .as("n_last7"),
          max(col("cmax")).as("cmax"))
        .select(col("event_type"),
          expr("(cmax - last_us) DIV 3600000000").as("hours_stale"),
          col("n_total"), col("n_last7"),
          (col("n_last7") * 30L < col("n_total") * 7L).as("starving"))
        .orderBy(col("event_type"))
    }))

  val oracle: Map[String, String] = Map(
    // 8-char-window distinct fraction, quantized to 1e-6 BIGINT per doc
    // via integer DIV (// in DuckDB): the per-source mean is an exact
    // BIGINT sum + one integer DIV + ONE division by the 1e6 literal —
    // no double accumulation order anywhere. generate_series is
    // inclusive-inclusive like Spark's sequence.
    "compression_ratio" ->
      """WITH g AS (
        |  SELECT doc_id, source,
        |    substr(text, CAST(i AS INTEGER), 8) AS gram
        |  FROM documents,
        |    unnest(generate_series(1, length(text) - 7)) AS t(i)
        |  WHERE text IS NOT NULL AND length(text) >= 8),
        |perdoc AS (
        |  SELECT doc_id, source,
        |    (CAST(count(DISTINCT gram) AS BIGINT) * 1000000)
        |      // CAST(count(*) AS BIGINT) AS r6
        |  FROM g GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  (CAST(sum(r6) AS BIGINT) // count(*)) / 1e6 AS avg_ratio,
        |  CAST(count(CASE WHEN r6 < 400000 THEN 1 END) AS BIGINT) AS n_repetitive
        |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,
    "window_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |t1 AS (SELECT user_id, min(us) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT ev.user_id, min(us) AS t2, min(t1.t1) AS t1b
        |  FROM ev JOIN t1 ON ev.user_id = t1.user_id
        |  WHERE event_type = 'click' AND us > t1.t1
        |    AND us <= t1.t1 + 86400000000 GROUP BY 1),
        |t3 AS (SELECT ev.user_id, min(us) AS t3
        |  FROM ev JOIN t2 ON ev.user_id = t2.user_id
        |  WHERE event_type = 'purchase' AND us > t2.t2
        |    AND us <= t2.t1b + 86400000000 GROUP BY 1),
        |users AS (SELECT DISTINCT user_id FROM ev),
        |lvl AS (SELECT CAST(
        |    (CASE WHEN t1.user_id IS NULL THEN 0 ELSE 1 END)
        |    + (CASE WHEN t2.user_id IS NULL THEN 0 ELSE 1 END)
        |    + (CASE WHEN t3.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS level
        |  FROM users u
        |  LEFT JOIN t1 ON u.user_id = t1.user_id
        |  LEFT JOIN t2 ON u.user_id = t2.user_id
        |  LEFT JOIN t3 ON u.user_id = t3.user_id),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM lvl)
        |SELECT level, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(count(*) AS DOUBLE) / max(tot.n_users), 6) AS share
        |FROM lvl CROSS JOIN tot GROUP BY level ORDER BY level""".stripMargin,
    "target_encode" ->
      """WITH rows0 AS (
        |  SELECT c_nationkey,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |stats AS (SELECT c_nationkey, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) AS BIGINT) AS n FROM rows0 GROUP BY 1),
        |enc AS (SELECT r.c_nationkey, r.y,
        |    CASE WHEN s.n > 1
        |      THEN CAST(s.pos - r.y AS DOUBLE) / (s.n - 1) END AS enc
        |  FROM rows0 r JOIN stats s ON r.c_nationkey = s.c_nationkey)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(y) AS BIGINT) AS n_pos,
        |  round(min(enc), 6) AS min_enc,
        |  round(max(enc), 6) AS max_enc,
        |  round(CAST(sum(CAST(floor(enc * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / count(*) / 1e9, 6) AS mean_enc
        |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin,
    "bootstrap_ci" ->
      """WITH fan AS (
        |  SELECT source, n_chars, doc_id, unnest(range(0, 32)) AS b FROM documents),
        |wt AS (SELECT source, n_chars, b,
        |    CASE WHEN h < '5e2d58d8' THEN 0 WHEN h < 'bc5ab1b1' THEN 1
        |         WHEN h < 'eb715e1d' THEN 2 WHEN h < 'fb239797' THEN 3
        |         ELSE 4 END AS w
        |  FROM (SELECT *, substring(md5('boot:' || CAST(b AS VARCHAR) || ':'
        |          || CAST(doc_id AS VARCHAR)), 1, 8) AS h FROM fan)),
        |means AS (SELECT source, b, sum(w * n_chars) / sum(w) AS m
        |  FROM wt GROUP BY 1, 2),
        |ranked AS (SELECT source, m,
        |    row_number() OVER (PARTITION BY source ORDER BY m, b) AS rn FROM means),
        |ci AS (SELECT source,
        |    min(CASE WHEN rn = 2 THEN m END) AS lo,
        |    min(CASE WHEN rn = 31 THEN m END) AS hi
        |  FROM ranked GROUP BY source),
        |pt AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) / count(*) AS pm
        |  FROM documents GROUP BY source)
        |SELECT source, floor(pm * 1e4 + 0.5) / 1e4 AS point_mean,
        |  floor(lo * 1e4 + 0.5) / 1e4 AS ci_lo,
        |  floor(hi * 1e4 + 0.5) / 1e4 AS ci_hi
        |FROM ci JOIN pt USING (source) ORDER BY source""".stripMargin,
    "survival_km" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type = 'purchase'),
        |users AS (SELECT user_id, min(d) AS birth, max(d) AS last FROM ev GROUP BY 1),
        |e AS (SELECT max(d) AS endd FROM ev),
        |lives AS (SELECT date_diff('day', birth, last) AS life,
        |    (last <= endd - 3) AS dead
        |  FROM users CROSS JOIN e),
        |byday AS (SELECT life, CAST(count(*) AS BIGINT) AS n_end,
        |    CAST(sum(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT) AS dth
        |  FROM lives GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM lives),
        |risk AS (SELECT life, dth,
        |    total - CAST(coalesce(sum(n_end) OVER (ORDER BY life
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
        |  FROM byday CROSS JOIN tot)
        |SELECT life AS t_days, n_at_risk, dth AS n_churned,
        |  floor(exp(sum(ln(greatest(1.0 - CAST(dth AS DOUBLE) / n_at_risk, 1e-300)))
        |    OVER (ORDER BY life ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |    * 1e6 + 0.5) / 1e6 AS survival
        |FROM risk WHERE dth > 0 ORDER BY t_days""".stripMargin,
    // the fold fan-out is a CROSS JOIN to a derived folds table (an
    // inline unnest column used in later arithmetic trips a DuckDB binder
    // internal error)
    "walkforward_split" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS DATE) AS d FROM events
        |  WHERE ts IS NOT NULL),
        |sp AS (SELECT min(d) AS lo, max(d) AS hi,
        |    date_diff('day', min(d), max(d)) + 1 AS ndays FROM ev),
        |folds AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS fold),
        |parts AS (SELECT fold, event_id, d,
        |    CASE WHEN date_diff('day', lo, d) < (ndays * fold) // 6 THEN 'train'
        |         WHEN date_diff('day', lo, d) < (ndays * fold) // 6 + ndays // 6
        |           THEN 'test' END AS part
        |  FROM ev CROSS JOIN sp CROSS JOIN folds)
        |SELECT fold, part, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  min(d) AS from_day, max(d) AS to_day
        |FROM parts WHERE part IS NOT NULL
        |GROUP BY fold, part ORDER BY fold, part""".stripMargin,
    "freshness_report" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |mx AS (SELECT max(us) AS cmax FROM ev),
        |agg AS (
        |  SELECT event_type, CAST(max(us) AS BIGINT) AS last_us,
        |    CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN us > cmax - 604800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_last7,
        |    CAST(max(cmax) AS BIGINT) AS cmax
        |  FROM ev CROSS JOIN mx GROUP BY event_type)
        |SELECT event_type, (cmax - last_us) // 3600000000 AS hours_stale,
        |  n_total, n_last7, (n_last7 * 30 < n_total * 7) AS starving
        |FROM agg ORDER BY event_type""".stripMargin,
    "ab_cuped" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |m AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS DOUBLE) * y) AS sxy, sum(CAST(x AS DOUBLE) * x) AS sxx,
        |    sum(CAST(y AS DOUBLE) * y) AS syy
        |  FROM per GROUP BY 1)
        |SELECT arm, n AS n_users,
        |  floor(sy / (100.0 * n) * 1e4 + 0.5) / 1e4 AS mean_post,
        |  floor((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * (n - 1)) * 1e4 + 0.5) / 1e4 AS var_post,
        |  floor((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * (n - 1)) * (1.0 - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) * 1e4 + 0.5) / 1e4 AS var_adj,
        |  floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) * 1e6 + 0.5) / 1e6 AS rho2
        |FROM m ORDER BY arm""".stripMargin,
    "ab_sequential" ->
      s"""WITH ev AS (SELECT event_type,
         |    CAST(round(value * 100) AS BIGINT) AS cents,
         |    (user_id % 2 = 0) AS isA,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) // 7 AS wk
         |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL AND ts IS NOT NULL),
         |wkagg AS (SELECT event_type, wk,
         |    CAST(count(CASE WHEN isA THEN 1 END) AS BIGINT) AS na,
         |    CAST(count(CASE WHEN NOT isA THEN 1 END) AS BIGINT) AS nb,
         |    CAST(sum(CASE WHEN isA THEN cents ELSE 0 END) AS BIGINT) AS sa,
         |    CAST(sum(CASE WHEN NOT isA THEN cents ELSE 0 END) AS BIGINT) AS sb
         |  FROM ev GROUP BY 1, 2),
         |pooled AS (SELECT event_type,
         |    (CAST(count(*) AS DOUBLE) * CAST(sum(cents * cents) AS BIGINT)
         |      - CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) * CAST(sum(cents) AS BIGINT))
         |      / (CAST(count(*) AS DOUBLE) * (count(*) - 1)) AS sig2
         |  FROM ev GROUP BY 1),
         |cum AS (SELECT event_type, wk,
         |    CAST(sum(na) OVER (PARTITION BY event_type ORDER BY wk) AS BIGINT) AS cna,
         |    CAST(sum(nb) OVER (PARTITION BY event_type ORDER BY wk) AS BIGINT) AS cnb,
         |    CAST(sum(sa) OVER (PARTITION BY event_type ORDER BY wk) AS BIGINT) AS csa,
         |    CAST(sum(sb) OVER (PARTITION BY event_type ORDER BY wk) AS BIGINT) AS csb
         |  FROM wkagg),
         |lr AS (SELECT event_type, wk, cna, cnb, $MsprtLlr6Sql AS llr6
         |  FROM cum JOIN pooled USING (event_type))
         |SELECT event_type, wk, cna AS n_a, cnb AS n_b,
         |  CAST(llr6 AS DOUBLE) / 1e6 AS log_lr,
         |  llr6 >= 2995732 AS significant
         |FROM lr ORDER BY event_type, wk""".stripMargin,
    "policy_replay" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    (user_id % 2 = 0) AS isA,
        |    (ts < TIMESTAMP '2024-01-16 00:00:00') AS fh
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND value IS NOT NULL AND ts IS NOT NULL),
        |pol AS (SELECT event_type,
        |    CAST(sum(CASE WHEN isA THEN cents ELSE 0 END) AS DOUBLE)
        |        * count(CASE WHEN NOT isA THEN 1 END)
        |      >= CAST(sum(CASE WHEN NOT isA THEN cents ELSE 0 END) AS DOUBLE)
        |        * count(CASE WHEN isA THEN 1 END) AS pickA
        |  FROM ev WHERE fh GROUP BY 1),
        |rep AS (SELECT ev.event_type, pickA,
        |    CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(count(CASE WHEN isA = pickA THEN 1 END) AS BIGINT) AS n_matched,
        |    CAST(sum(CASE WHEN isA = pickA THEN cents ELSE 0 END) AS BIGINT) AS s_matched,
        |    CAST(sum(cents) AS BIGINT) AS s_all
        |  FROM ev JOIN pol USING (event_type) WHERE NOT fh GROUP BY 1, 2)
        |SELECT event_type, CASE WHEN pickA THEN 'A' ELSE 'B' END AS target_arm,
        |  n_test, n_matched,
        |  floor(CAST(n_matched AS DOUBLE) / n_test * 1e4 + 0.5) / 1e4 AS match_rate,
        |  floor(CAST(s_matched AS DOUBLE) / (1e2 * n_matched) * 1e4 + 0.5) / 1e4 AS policy_value,
        |  floor(CAST(s_all AS DOUBLE) / (1e2 * n_test) * 1e4 + 0.5) / 1e4 AS logged_value
        |FROM rep ORDER BY event_type""".stripMargin,
    "growth_accounting" ->
      """WITH uw0 AS (SELECT DISTINCT user_id,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) // 7 AS wk
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |uw AS (SELECT user_id, wk FROM uw0
        |  WHERE substr(md5('ga:' || CAST(user_id AS VARCHAR) || ':' || CAST(wk AS VARCHAR)), 1, 1)
        |    IN ('0','1','2','3','4','5','6','7','8','9')),
        |lab AS (SELECT wk,
        |    lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
        |    lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
        |  FROM uw),
        |ev2 AS (
        |  SELECT wk, CASE WHEN prev IS NULL THEN 'new'
        |    WHEN prev = wk - 1 THEN 'retained' ELSE 'resurrected' END AS kind
        |  FROM lab
        |  UNION ALL
        |  SELECT wk + 1 AS wk, 'churned' AS kind FROM lab
        |  WHERE nxt IS NULL OR nxt > wk + 1)
        |SELECT wk, CAST(count(CASE WHEN kind = 'new' THEN 1 END) AS BIGINT) AS n_new,
        |  CAST(count(CASE WHEN kind = 'retained' THEN 1 END) AS BIGINT) AS n_retained,
        |  CAST(count(CASE WHEN kind = 'resurrected' THEN 1 END) AS BIGINT) AS n_resurrected,
        |  CAST(count(CASE WHEN kind = 'churned' THEN 1 END) AS BIGINT) AS n_churned
        |FROM ev2 GROUP BY wk ORDER BY wk""".stripMargin,
    "cem_att" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 2500e0) AS BIGINT) AS bal_bin,
        |    (c_custkey % 3 = 0) AS treated FROM customer),
        |sp AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sp
        |  FROM orders GROUP BY 1),
        |y AS (SELECT c_mktsegment, bal_bin, treated, coalesce(sp, 0) AS cents
        |  FROM c LEFT JOIN sp ON c_custkey = o_custkey),
        |cell AS (SELECT c_mktsegment, bal_bin,
        |    CAST(count(CASE WHEN treated THEN 1 END) AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN treated THEN cents ELSE 0 END) AS BIGINT) AS s_t,
        |    CAST(count(CASE WHEN NOT treated THEN 1 END) AS BIGINT) AS n_c,
        |    CAST(sum(CASE WHEN NOT treated THEN cents ELSE 0 END) AS BIGINT) AS s_c
        |  FROM y GROUP BY 1, 2),
        |cc AS (SELECT *, (n_t > 0 AND n_c > 0) AS matched,
        |    CASE WHEN n_t > 0 AND n_c > 0
        |      THEN CAST(floor((CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c) * n_t * 1e6 + 0.5) AS BIGINT)
        |      ELSE 0 END AS c6
        |  FROM cell),
        |tot AS (SELECT CAST(sum(CASE WHEN matched THEN n_t ELSE 0 END) AS BIGINT) AS nt_m,
        |    CAST(sum(c6) AS BIGINT) AS c6_tot FROM cc)
        |SELECT c_mktsegment, bal_bin, n_t, n_c, matched,
        |  CASE WHEN n_t > 0 THEN floor(CAST(s_t AS DOUBLE) / (1e2 * n_t) * 1e4 + 0.5) / 1e4 END AS mean_t,
        |  CASE WHEN n_c > 0 THEN floor(CAST(s_c AS DOUBLE) / (1e2 * n_c) * 1e4 + 0.5) / 1e4 END AS mean_c,
        |  floor(CAST(c6_tot AS DOUBLE) / nt_m / 1e6 / 1e2 * 1e4 + 0.5) / 1e4 AS att
        |FROM cc CROSS JOIN tot ORDER BY c_mktsegment, bal_bin""".stripMargin,
    "power_analysis" ->
      s"""WITH ev AS (SELECT event_type,
         |    CAST(round(value * 100) AS BIGINT) AS cents,
         |    (user_id % 2 = 0) AS isA
         |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL),
         |m AS (SELECT event_type,
         |    CAST(count(CASE WHEN isA THEN 1 END) AS BIGINT) AS n_a,
         |    CAST(count(CASE WHEN NOT isA THEN 1 END) AS BIGINT) AS n_b,
         |    CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sx,
         |    CAST(sum(cents * cents) AS BIGINT) AS sxx
         |  FROM ev GROUP BY 1)
         |SELECT event_type, n_a, n_b,
         |  $PowerMeanSql AS mean_cents,
         |  $PowerVarSql AS var_cents,
         |  $PowerNReqSql AS n_required,
         |  least(n_a, n_b) >= $PowerNReqSql AS powered
         |FROM m ORDER BY event_type""".stripMargin,
    "simpson_check" ->
      """WITH seg AS (
        |  SELECT c_mktsegment, (o_custkey % 2 = 0) AS isA,
        |    (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS hi
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS (SELECT c_mktsegment,
        |    CAST(count(CASE WHEN isA THEN 1 END) AS BIGINT) AS n_a,
        |    CAST(count(CASE WHEN isA AND hi THEN 1 END) AS BIGINT) AS pos_a,
        |    CAST(count(CASE WHEN NOT isA THEN 1 END) AS BIGINT) AS n_b,
        |    CAST(count(CASE WHEN NOT isA AND hi THEN 1 END) AS BIGINT) AS pos_b
        |  FROM seg GROUP BY 1),
        |pooled AS (SELECT CAST(sum(pos_a) AS BIGINT) AS pa, CAST(sum(n_a) AS BIGINT) AS na,
        |    CAST(sum(pos_b) AS BIGINT) AS pb, CAST(sum(n_b) AS BIGINT) AS nb FROM per)
        |SELECT c_mktsegment, n_a, pos_a, n_b, pos_b,
        |  floor(CAST(pos_a AS DOUBLE) / n_a * 1e6 + 0.5) / 1e6 AS rate_a,
        |  floor(CAST(pos_b AS DOUBLE) / n_b * 1e6 + 0.5) / 1e6 AS rate_b,
        |  CAST(sign(CAST(pos_a AS DOUBLE) * n_b - CAST(pos_b AS DOUBLE) * n_a) AS BIGINT) AS seg_sign,
        |  CAST(sign(CAST(pa AS DOUBLE) * nb - CAST(pb AS DOUBLE) * na) AS BIGINT) AS pooled_sign,
        |  CAST(sign(CAST(pos_a AS DOUBLE) * n_b - CAST(pos_b AS DOUBLE) * n_a) AS BIGINT)
        |    * CAST(sign(CAST(pa AS DOUBLE) * nb - CAST(pb AS DOUBLE) * na) AS BIGINT) < 0 AS reversed
        |FROM per CROSS JOIN pooled ORDER BY c_mktsegment""".stripMargin,
    "attribution_markov" -> attributionMarkovOracle,
    "ts_holt" ->
      """WITH RECURSIVE d AS MATERIALIZED (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL GROUP BY 1),
        |o AS MATERIALIZED (SELECT day, cents,
        |    row_number() OVER (ORDER BY day) AS rn FROM d),
        |h(rn, day, cents, fitted, l, b) AS (
        |  SELECT rn, day, cents, CAST(NULL AS DOUBLE),
        |    CAST(cents AS DOUBLE), 0e0 FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.rn, o.day, o.cents, h.l + h.b,
        |    0.2e0 * o.cents + 0.8e0 * (h.l + h.b),
        |    0.1e0 * ((0.2e0 * o.cents + 0.8e0 * (h.l + h.b)) - h.l) + 0.9e0 * h.b
        |  FROM h JOIN o ON o.rn = h.rn + 1)
        |SELECT day, cents AS actual_cents,
        |  floor(fitted * 1e4 + 0.5) / 1e4 AS fitted,
        |  floor(l * 1e4 + 0.5) / 1e4 AS level,
        |  floor(b * 1e4 + 0.5) / 1e4 AS trend
        |FROM h ORDER BY day""".stripMargin,
    "conformal_pi" ->
      s"""WITH o AS (SELECT o_orderpriority AS prio,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         |    o_orderkey % 4 AS fold FROM orders),
         |pred AS (SELECT prio, CAST(count(*) AS BIGINT) AS n_train,
         |    CAST(CAST(sum(cents) AS BIGINT) // count(*) AS BIGINT) AS pred_cents
         |  FROM o WHERE fold <= 1 GROUP BY 1),
         |hist AS (SELECT o.prio, abs(cents - pred_cents) AS r,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM o JOIN pred USING (prio) WHERE fold = 2 GROUP BY 1, 2),
         |qs AS (SELECT prio, r,
         |    CAST(sum(c) OVER (PARTITION BY prio ORDER BY r) AS BIGINT) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY prio) AS BIGINT) AS n_cal FROM hist),
         |q AS (SELECT prio,
         |    CAST(min(CASE WHEN cum >= least((9 * (n_cal + 1) + 9) // 10, n_cal)
         |      THEN r END) AS BIGINT) AS q_cents,
         |    CAST(max(n_cal) AS BIGINT) AS n_cal FROM qs GROUP BY 1),
         |cov AS (SELECT o.prio, n_train, n_cal, pred_cents, q_cents,
         |    CAST(count(*) AS BIGINT) AS n_test,
         |    CAST(sum(CASE WHEN abs(cents - pred_cents) <= q_cents THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_in
         |  FROM o JOIN pred USING (prio) JOIN q USING (prio)
         |  WHERE fold = 3 GROUP BY 1, 2, 3, 4, 5)
         |SELECT prio AS o_orderpriority, n_train, n_cal, n_test, pred_cents, q_cents,
         |  round(CAST(n_in AS DOUBLE) / n_test, 4) AS coverage
         |FROM cov ORDER BY 1""".stripMargin,
    "did_estimator" ->
      s"""WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         |    (o_custkey % 3 = 0) AS tr,
         |    (o_orderdate >= TIMESTAMP '1995-06-01 00:00:00') AS po FROM orders),
         |a AS (SELECT
         |    CAST(count(CASE WHEN NOT tr AND NOT po THEN 1 END) AS BIGINT) AS n_cr,
         |    CAST(count(CASE WHEN NOT tr AND po THEN 1 END) AS BIGINT) AS n_cp,
         |    CAST(count(CASE WHEN tr AND NOT po THEN 1 END) AS BIGINT) AS n_tr,
         |    CAST(count(CASE WHEN tr AND po THEN 1 END) AS BIGINT) AS n_tp,
         |    CAST(sum(CASE WHEN NOT tr AND NOT po THEN cents ELSE 0 END) AS BIGINT) AS s_cr,
         |    CAST(sum(CASE WHEN NOT tr AND po THEN cents ELSE 0 END) AS BIGINT) AS s_cp,
         |    CAST(sum(CASE WHEN tr AND NOT po THEN cents ELSE 0 END) AS BIGINT) AS s_tr,
         |    CAST(sum(CASE WHEN tr AND po THEN cents ELSE 0 END) AS BIGINT) AS s_tp
         |  FROM o)
         |SELECT n_cr AS n_ctrl_pre, n_cp AS n_ctrl_post,
         |  n_tr AS n_treat_pre, n_tp AS n_treat_post,
         |  ${didMeanSql("s_cr", "n_cr")} AS mean_ctrl_pre,
         |  ${didMeanSql("s_cp", "n_cp")} AS mean_ctrl_post,
         |  ${didMeanSql("s_tr", "n_tr")} AS mean_treat_pre,
         |  ${didMeanSql("s_tp", "n_tp")} AS mean_treat_post,
         |  $DidSql AS did
         |FROM a""".stripMargin,
    "forecast_snaive" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
        |    (isodow(ts) - 1) * 24 + hour(ts) AS how, ts
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |tr AS (
        |  SELECT event_type, how, CAST(sum(cents) AS BIGINT) AS pred3 FROM ev
        |  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-22 00:00:00' GROUP BY 1, 2),
        |te AS (
        |  SELECT event_type, how, CAST(sum(cents) AS BIGINT) AS act FROM ev
        |  WHERE ts >= TIMESTAMP '2024-01-22 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-29 00:00:00' GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(tr.event_type, te.event_type) AS event_type,
        |    coalesce(pred3, 0) AS pred3, coalesce(act, 0) AS act
        |  FROM tr FULL JOIN te ON tr.event_type = te.event_type AND tr.how = te.how),
        |agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |    CAST(sum(act) AS BIGINT) AS actual_cents,
        |    CAST(sum(abs(3 * act - pred3)) AS BIGINT) AS abs_err3
        |  FROM j GROUP BY 1)
        |SELECT event_type, n_buckets, actual_cents,
        |  CASE WHEN actual_cents <> 0
        |    THEN floor(abs_err3 / (3.0 * actual_cents) * 1e6 + 0.5) / 1e6 END AS wmape
        |FROM agg ORDER BY event_type""".stripMargin,
    "agg_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders
        |  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (SELECT o_orderstatus, max(cnt) AS mx FROM c GROUP BY 1)
        |SELECT c.o_orderstatus, min(c.o_orderpriority) AS mode_priority,
        |  max(c.cnt) AS mode_count
        |FROM c JOIN m ON c.o_orderstatus = m.o_orderstatus AND c.cnt = m.mx
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts_cusum" ->
      """WITH ev AS (
        |  SELECT event_type, ts, event_id, value
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |z AS (
        |  SELECT event_type, ts, event_id, value,
        |    avg(value) OVER (PARTITION BY event_type) AS mu,
        |    stddev_pop(value) OVER (PARTITION BY event_type) AS sd,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev),
        |cs AS (
        |  SELECT event_type, n,
        |    sum((value - mu) / sd) OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        |  FROM z)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  floor(max(abs(cusum)) * 1e4 + 0.5) / 1e4 AS max_abs_cusum,
        |  CAST(count(CASE WHEN abs(cusum) > 3.0 * sqrt(n) THEN 1 END) AS BIGINT)
        |    AS n_flagged
        |FROM cs GROUP BY 1 ORDER BY 1""".stripMargin,
    "drift_psi" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us, value
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |bins AS (
        |  SELECT event_type,
        |    CAST(least(floor(value / 50), 9) AS INT) AS bin,
        |    CAST(count(CASE WHEN us <= mid THEN 1 END) AS BIGINT) AS na,
        |    CAST(count(CASE WHEN us > mid THEN 1 END) AS BIGINT) AS nb
        |  FROM ev CROSS JOIN mid GROUP BY 1, 2),
        |pq AS (
        |  SELECT event_type, na, nb,
        |    greatest(CAST(na AS DOUBLE) / sum(na) OVER (PARTITION BY event_type), 1e-6) AS p,
        |    greatest(CAST(nb AS DOUBLE) / sum(nb) OVER (PARTITION BY event_type), 1e-6) AS q
        |  FROM bins)
        |SELECT event_type, CAST(sum(na) AS BIGINT) AS n_first,
        |  CAST(sum(nb) AS BIGINT) AS n_second,
        |  floor(sum((p - q) * ln(p / q)) * 1e6 + 0.5) / 1e6 AS psi
        |FROM pq GROUP BY 1 ORDER BY 1""".stripMargin,
    "benford_dq" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INT) AS first_digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders
        |  WHERE o_totalprice > 0 AND floor(o_totalprice * 100 + 0.5) > 0
        |  GROUP BY 1),
        |w AS (
        |  SELECT first_digit, n, sum(n) OVER () AS total,
        |    log10(1.0 + 1.0 / first_digit) AS exp_share
        |  FROM d)
        |SELECT first_digit, n,
        |  floor(CAST(n AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS obs_share,
        |  floor(exp_share * 1e6 + 0.5) / 1e6 AS exp_share,
        |  floor(pow(n - exp_share * total, 2) / (exp_share * total) * 1e4 + 0.5)
        |    / 1e4 AS chi2_part
        |FROM w ORDER BY first_digit""".stripMargin,
    "attribution_touch" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type, value
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL AND value IS NOT NULL),
        |tc AS (
        |  SELECT event_type, value,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
        |  FROM ev),
        |conv AS (
        |  SELECT first_touch, last_touch,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM tc WHERE event_type = 'purchase' AND last_touch IS NOT NULL)
        |SELECT model, touch_type, CAST(count(*) AS BIGINT) AS conversions,
        |  CAST(sum(cents) AS BIGINT) AS value_cents
        |FROM (
        |  SELECT 'first' AS model, first_touch AS touch_type, cents FROM conv
        |  UNION ALL
        |  SELECT 'last' AS model, last_touch AS touch_type, cents FROM conv)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "period_over_period" ->
      """WITH wk AS (
        |  SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT event_type, week, cents,
        |  lag(cents, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev_cents,
        |  floor(CAST(cents - lag(cents, 1) OVER (PARTITION BY event_type ORDER BY week)
        |      AS DOUBLE)
        |    / lag(cents, 1) OVER (PARTITION BY event_type ORDER BY week) * 1e6 + 0.5)
        |    / 1e6 AS pct_change
        |FROM wk ORDER BY event_type, week""".stripMargin,
    "corr_matrix" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, avg(value) AS x
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  floor(corr(a.x, b.x) * 1e4 + 0.5) / 1e4 AS r
        |FROM daily a JOIN daily b
        |  ON a.d = b.d AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dau_mau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |grid AS (SELECT DISTINCT d AS g FROM ud)
        |SELECT g,
        |  CAST(count(DISTINCT CASE WHEN d = g THEN user_id END) AS BIGINT) AS dau,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS mau,
        |  floor(CAST(count(DISTINCT CASE WHEN d = g THEN user_id END) AS DOUBLE)
        |    / count(DISTINCT user_id) * 1e4 + 0.5) / 1e4 AS stickiness
        |FROM ud JOIN grid ON date_diff('day', d, g) BETWEEN 0 AND 29
        |GROUP BY g ORDER BY g""".stripMargin,
    "time_to_convert" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |su AS (SELECT user_id, min(us) AS s FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1),
        |d AS (
        |  SELECT (min(e.us) - su.s) // 1000000 AS sec,
        |    ((min(e.us) - su.s) // 1000000) // 3600 AS hr
        |  FROM ev e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.us >= su.s
        |  GROUP BY e.user_id, su.s)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  floor(avg(sec) * 1e2 + 0.5) / 1e2 AS avg_sec,
        |  floor(quantile_cont(CAST(hr AS DOUBLE), 0.5) * 1e4 + 0.5) / 1e4 AS p50_hours,
        |  floor(quantile_cont(CAST(hr AS DOUBLE), 0.9) * 1e4 + 0.5) / 1e4 AS p90_hours,
        |  max(sec) AS max_sec
        |FROM d""".stripMargin,
    "daily_percentiles" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |h AS (
        |  SELECT event_type, d, cents, CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT event_type, d, cents,
        |    sum(n) OVER (PARTITION BY event_type, d ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn,
        |    sum(n) OVER (PARTITION BY event_type, d) AS tot
        |  FROM h)
        |SELECT event_type, d, CAST(max(tot) AS BIGINT) AS n_events,
        |  min(CASE WHEN cumn >= ceil(tot * 0.5) THEN cents END) AS p50_cents,
        |  min(CASE WHEN cumn >= ceil(tot * 0.95) THEN cents END) AS p95_cents
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "funnel_conversion" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |su AS (SELECT user_id, min(us) AS s FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (
        |  SELECT e.user_id, min(e.us) AS p
        |  FROM ev e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.us >= su.s
        |  GROUP BY e.user_id, su.s),
        |j AS (
        |  SELECT su.s, pu.p FROM su LEFT JOIN pu ON su.user_id = pu.user_id)
        |SELECT CAST(date_trunc('week', make_timestamp(s)) AS DATE) AS cohort_week,
        |  CAST(count(*) AS BIGINT) AS n_signups,
        |  CAST(count(CASE WHEN p IS NOT NULL
        |      AND p - s <= 72 * 3600 * CAST(1000000 AS BIGINT) THEN 1 END) AS BIGINT)
        |    AS n_converted_72h,
        |  floor(CAST(count(CASE WHEN p IS NOT NULL
        |      AND p - s <= 72 * 3600 * CAST(1000000 AS BIGINT) THEN 1 END) AS DOUBLE)
        |    / count(*) * 1e4 + 0.5) / 1e4 AS rate_72h
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "retention_d7" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |actives AS (SELECT d, CAST(count(*) AS BIGINT) AS actives FROM ud GROUP BY 1),
        |ret AS (
        |  SELECT a.d, CAST(count(*) AS BIGINT) AS retained
        |  FROM ud a JOIN ud b ON a.user_id = b.user_id AND a.d + 7 = b.d
        |  GROUP BY 1)
        |SELECT actives.d, actives,
        |  coalesce(retained, 0) AS retained,
        |  floor(CAST(coalesce(retained, 0) AS DOUBLE) / actives * 1e4 + 0.5) / 1e4
        |    AS rate_d7
        |FROM actives LEFT JOIN ret ON actives.d = ret.d
        |ORDER BY actives.d""".stripMargin,
    "user_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, ts, value FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |su AS (
        |  SELECT user_id, min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
        |  FROM ev WHERE event_type = 'signup' GROUP BY 1),
        |cs AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
        |  FROM su GROUP BY 1),
        |rev AS (
        |  SELECT su.cohort_week,
        |    CAST(date_diff('day', su.cohort_week,
        |      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT) AS week_offset,
        |    CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM ev e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
        |    AND CAST(date_trunc('week', e.ts) AS DATE) >= su.cohort_week
        |  GROUP BY 1, 2)
        |SELECT rev.cohort_week, week_offset, n_users, cents,
        |  CAST(sum(cents) OVER (PARTITION BY rev.cohort_week ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |FROM rev JOIN cs ON rev.cohort_week = cs.cohort_week
        |ORDER BY rev.cohort_week, week_offset""".stripMargin,
    "chi2_independence" ->
      """WITH obs AS (
        |  SELECT event_type, CAST(isodow(ts) - 1 AS INTEGER) AS dow,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT o,
        |    CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE)
        |      * sum(o) OVER (PARTITION BY dow)
        |      / sum(o) OVER () AS e,
        |    sum(o) OVER () AS n, event_type, dow
        |  FROM obs)
        |SELECT CAST(max(n) AS BIGINT) AS n_events,
        |  CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT)
        |    AS dof,
        |  floor(sum(pow(o - e, 2) / e) * 1e4 + 0.5) / 1e4 AS chi2
        |FROM w""".stripMargin,
    "audience_overlap" ->
      """WITH ut AS (
        |  SELECT DISTINCT event_type, user_id FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |sizes AS (SELECT event_type, CAST(count(*) AS BIGINT) AS sz FROM ut GROUP BY 1),
        |ov AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_both
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both,
        |  floor(CAST(n_both AS DOUBLE) / (na.sz + nb.sz - n_both) * 1e6 + 0.5) / 1e6
        |    AS jaccard
        |FROM ov
        |JOIN sizes na ON ov.type_a = na.event_type
        |JOIN sizes nb ON ov.type_b = nb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "attribution_linear" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL AND value IS NOT NULL),
        |conv AS (SELECT user_id, event_id AS conv_id, us AS cus, cents
        |  FROM ev WHERE event_type = 'purchase'),
        |touch AS (SELECT user_id AS tu, event_type AS touch_type, us AS tus
        |  FROM ev WHERE event_type <> 'purchase'),
        |joined AS (
        |  SELECT conv_id, cents, touch_type
        |  FROM conv JOIN touch ON user_id = tu
        |    AND tus < cus AND tus >= cus - CAST(604800000000 AS BIGINT)),
        |per_conv AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_total
        |  FROM joined GROUP BY 1),
        |per_type AS (
        |  SELECT conv_id, cents, touch_type, CAST(count(*) AS BIGINT) AS n_type
        |  FROM joined GROUP BY 1, 2, 3)
        |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_conversions_touched,
        |  CAST(sum((cents * n_type) // n_total) AS BIGINT) AS credit_cents
        |FROM per_type JOIN per_conv USING (conv_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts_ewma" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, avg(value) AS x
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT a.event_type, a.d,
        |  floor(sum(pow(0.7, date_diff('day', b.d, a.d)) * b.x)
        |    / sum(pow(0.7, date_diff('day', b.d, a.d))) * 1e4 + 0.5) / 1e4 AS ewma
        |FROM daily a JOIN daily b
        |  ON a.event_type = b.event_type
        |  AND date_diff('day', b.d, a.d) BETWEEN 0 AND 13
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ks_drift" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |hist AS (
        |  SELECT event_type, cents,
        |    CAST(count(CASE WHEN us <= mid THEN 1 END) AS BIGINT) AS na,
        |    CAST(count(CASE WHEN us > mid THEN 1 END) AS BIGINT) AS nb
        |  FROM ev CROSS JOIN mid GROUP BY 1, 2),
        |cdf AS (
        |  SELECT event_type,
        |    sum(na) OVER (PARTITION BY event_type) AS ta,
        |    sum(nb) OVER (PARTITION BY event_type) AS tb,
        |    sum(na) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |    sum(nb) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
        |  FROM hist),
        |d AS (
        |  SELECT event_type, ta, tb,
        |    abs(ca / nullif(ta, 0) - cb / nullif(tb, 0)) AS dd
        |  FROM cdf)
        |SELECT event_type, CAST(max(ta) AS BIGINT) AS n_first,
        |  CAST(max(tb) AS BIGINT) AS n_second,
        |  floor(max(dd) * 1e6 + 0.5) / 1e6 AS ks_d,
        |  max(dd) > 1.358 * sqrt(CAST(max(ta) + max(tb) AS DOUBLE)
        |    / (CAST(max(ta) AS DOUBLE) * max(tb))) AS reject_95
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "lift_deciles" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS score,
        |    max(CASE WHEN event_type = 'purchase' AND value >= 150
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1),
        |d AS (SELECT ntile(10) OVER (ORDER BY score DESC, user_id) AS decile, conv
        |  FROM u),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(conv) AS BIGINT) AS n_conv
        |  FROM d GROUP BY 1),
        |c AS (
        |  SELECT decile, n_users, n_conv,
        |    sum(n_users) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu,
        |    sum(n_conv) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
        |    sum(n_users) OVER () AS tu, sum(n_conv) OVER () AS tc
        |  FROM g)
        |SELECT decile, n_users, n_conv,
        |  floor(CAST(n_conv AS DOUBLE) / n_users * 1e6 + 0.5) / 1e6 AS conv_rate,
        |  floor((CAST(cc AS DOUBLE) / cu)
        |    / (CAST(nullif(tc, 0) AS DOUBLE) / tu) * 1e6 + 0.5) / 1e6 AS cum_lift
        |FROM c ORDER BY decile""".stripMargin,
    "bot_score" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s AS (
        |  SELECT user_id, us, event_id,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |t AS (
        |  SELECT user_id, us, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM s),
        |g AS (
        |  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n,
        |    max(us) - min(us) AS dur_us
        |  FROM t GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(max(n) AS BIGINT) AS max_burst,
        |  floor(CAST(count(CASE WHEN n = 1 THEN 1 END) AS DOUBLE)
        |    / count(*) * 1e6 + 0.5) / 1e6 AS singleton_share,
        |  CAST(count(CASE WHEN n >= 10 AND n * 60000000 > dur_us * 100 THEN 1 END)
        |    AS BIGINT) AS n_bot_sessions
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "qq_drift" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |hist AS (
        |  SELECT event_type, CASE WHEN us <= mid THEN 0 ELSE 1 END AS half,
        |    cents, CAST(count(*) AS BIGINT) AS n
        |  FROM ev CROSS JOIN mid GROUP BY 1, 2, 3),
        |cdf AS (
        |  SELECT event_type, half, cents,
        |    sum(n) OVER (PARTITION BY event_type, half ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn,
        |    sum(n) OVER (PARTITION BY event_type, half) AS tot
        |  FROM hist),
        |q AS (
        |  SELECT event_type, half, dec, min(cents) AS qv
        |  FROM cdf CROSS JOIN (SELECT unnest(range(1, 10)) AS dec) g
        |  WHERE cumn >= ceil(dec * tot / 10.0)
        |  GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(dec AS BIGINT) AS decile,
        |  min(CASE WHEN half = 0 THEN qv END) AS q_first,
        |  min(CASE WHEN half = 1 THEN qv END) AS q_second,
        |  min(CASE WHEN half = 1 THEN qv END) - min(CASE WHEN half = 0 THEN qv END)
        |    AS shift_cents
        |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ctr_wilson" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN value >= 100 THEN 1 END) AS BIGINT) AS pos
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |c AS (
        |  SELECT event_type, n, pos,
        |    pos / CAST(n AS DOUBLE) AS p, CAST(n AS DOUBLE) AS nn
        |  FROM g)
        |SELECT event_type, n, pos,
        |  floor(p * 1e6 + 0.5) / 1e6 AS rate,
        |  floor((p + (1.96 * 1.96) / (nn * 2)
        |      - 1.96 * sqrt(p * (1.0 - p) / nn + (1.96 * 1.96) / (nn * nn * 4)))
        |    / (1.0 + (1.96 * 1.96) / nn) * 1e6 + 0.5) / 1e6 AS wilson_lb
        |FROM c ORDER BY wilson_lb DESC, event_type""".stripMargin,
    "split_leakage" ->
      """WITH ev AS (
        |  SELECT event_type, user_id, epoch_us(ts) AS us
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |u AS (
        |  SELECT event_type, user_id, min(us) AS mnu, max(us) AS mxu, max(mid) AS mid
        |  FROM ev CROSS JOIN mid GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(count(CASE WHEN mnu <= mid THEN 1 END) AS BIGINT) AS users_train,
        |  CAST(count(CASE WHEN mxu > mid THEN 1 END) AS BIGINT) AS users_test,
        |  CAST(count(CASE WHEN mnu <= mid AND mxu > mid THEN 1 END) AS BIGINT)
        |    AS users_leaking,
        |  floor(CAST(count(CASE WHEN mnu <= mid AND mxu > mid THEN 1 END) AS DOUBLE)
        |    / nullif(count(CASE WHEN mxu > mid THEN 1 END), 0) * 1e6 + 0.5) / 1e6
        |    AS leak_rate
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin)
}
