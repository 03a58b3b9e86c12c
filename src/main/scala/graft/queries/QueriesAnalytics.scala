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
    // Fellegi–Sunter record linkage (entity resolution): probabilistic
    // match scoring over BLOCKED candidate pairs — the master-data dedup
    // operator (fuzzy_join is one similarity predicate; this is the full
    // agreement-vector → log-odds-weight → three-zone decision pipeline).
    // Dirty input = customers ∪ planted variants (key+500000: first name
    // char corrupted, acctbal +0.37, same nation/segment). Blocking key =
    // (nation, ⌊acctbal/100⌋) keeps candidate volume Σ block² ≪ n² and
    // partitions the comparison space across executors. Agreement weights
    // are FIXED scaled log-odds integers (name-within-1-edit +30/−10,
    // acctbal-within-1.00 +15/−5, segment +10/−8) so scores are exact
    // BIGINTs; the acctbal proximity compares the SAME parquet doubles in
    // both engines, so the decision boundary is engine-identical. Declared
    // output: every match/possible pair with its score (non-matches are
    // the discarded bulk, by design).
    "er_linkage" -> ((s, dir) => {
      val (_, scored) = erScoredPairs(s, dir)
      scored
        .withColumn("decision",
          when(col("score") >= 45L, "match")
            .when(col("score") >= 15L, "possible"))
        .where(col("decision").isNotNull)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Fellegi–Sunter match weights LEARNED by EM (Fellegi & Sunter 1969;
    // Winkler's EM formulation — the Splink/record-linkage standard) over
    // the same blocked comparison vectors er_linkage scores by hand: the
    // card that replaces hand-tuned agreement weights with estimated
    // m = P(agree | match) and u = P(agree | non-match) per field, plus
    // the match prior. Scale shape: the ONLY data-sized stage is the
    // pattern-count aggregate (3 binary fields ⇒ ≤ 8 rows); 5 EM rounds
    // run on the collected 8-row table in EXACT BigInt fixed-point (all
    // probabilities 1e-6 BIGINTs, products ≤ 1e24 — the attribution_markov
    // integer-EM discipline, clamped to [1, 999999] so no branch ever
    // divides by zero), and the oracle unrolls the identical recurrence in
    // HUGEINT — bit-for-bit, no quantization drift possible. Both engines
    // truncate non-negative division identically.
    "er_em_weights" -> ((s, dir) => {
      import s.implicits._
      val (_, pairs) = erComparisonPairs(s, dir)
      val pats = pairs.groupBy(col("g1"), col("g2"), col("g3"))
        .agg(count(lit(1)).as("n")).collect() // ≤ 2^3 rows — config-sized
        .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2), r.getLong(3)))
      val M = BigInt(1000000)
      def clamp(x: BigInt) = x.max(BigInt(1)).min(BigInt(999999))
      var p = BigInt(500000)
      var m = Vector(BigInt(900000), BigInt(900000), BigInt(900000))
      var u = Vector(BigInt(100000), BigInt(100000), BigInt(100000))
      for (_ <- 1 to 5) {
        var sn = BigInt(0); var sw = BigInt(0); var sv = BigInt(0)
        val swk = Array.fill(3)(BigInt(0)); val svk = Array.fill(3)(BigInt(0))
        pats.foreach { case (g1, g2, g3, n) =>
          val g = Vector(g1, g2, g3)
          val num = (0 until 3).foldLeft(p)((acc, k) =>
            acc * (if (g(k)) m(k) else M - m(k)))
          val den = num + (0 until 3).foldLeft(M - p)((acc, k) =>
            acc * (if (g(k)) u(k) else M - u(k)))
          val w = num * M / den
          val nB = BigInt(n)
          sn += nB; sw += nB * w; sv += nB * (M - w)
          (0 until 3).foreach { k =>
            if (g(k)) { swk(k) += nB * w; svk(k) += nB * (M - w) } }
        }
        p = clamp(sw / sn.max(BigInt(1)))
        m = Vector.tabulate(3)(k => clamp(swk(k) * M / sw.max(BigInt(1))))
        u = Vector.tabulate(3)(k => clamp(svk(k) * M / sv.max(BigInt(1))))
      }
      Seq(("bal_lt1", m(1), u(1)), ("name_lev1", m(0), u(0)),
          ("prior", p, BigInt(0)), ("segment_eq", m(2), u(2)))
        .map { case (f, mm, uu) =>
          (f, mm.toLong, uu.toLong,
            if (f == "prior") 0L else (mm * M / uu.max(BigInt(1))).toLong)
        }
        .toDF("field", "m6", "u6", "mu_ratio6").orderBy(col("field"))
    }),

    // Entity RESOLUTION (er_linkage only SCORES pairs; this materializes
    // the entities): the match pairs feed the same large-star/small-star
    // connected-components fixpoint the dedup family uses — transitive
    // closure matters because A≈B and B≈C link A and C even when the
    // blocked join never scored (A, C). Declared output is the entity-size
    // card with an exact representative-id checksum (catches any labeling
    // drift bare counts would miss). Work: the blocked pair join is the
    // only data-sized stage; CC runs on match edges (≈ one per planted
    // variant), and the card is a sizes-domain aggregate. Oracle:
    // recursive-CTE transitive closure over the identical match pairs.
    "er_cluster" -> ((s, dir) => {
      val labels = erMatchLabels(s, dir)
      labels.groupBy(col("component"))
        .agg(count(lit(1)).as("entity_size"))
        .groupBy(col("entity_size"))
        .agg(count(lit(1)).as("n_entities"),
          (col("entity_size") * count(lit(1))).as("n_records"),
          sum(col("component")).as("rep_id_sum"))
        .select(col("entity_size"), col("n_entities"), col("n_records"),
          col("rep_id_sum"))
        .orderBy(col("entity_size"))
    }),

    // Blocking-quality card (Christen's two numbers for ANY blocking
    // scheme, and the tuning readout er_linkage's (nation, balance-band)
    // key was chosen by: REDUCTION RATIO = the share of the n² pair space
    // the blocks never score, PAIRS COMPLETENESS = the share of TRUE
    // matches that survive blocking — the planted +500000 variants give
    // exact ground truth). All counts are exact BIGINTs: candidate volume
    // = Σ over blocks of n_orig·n_variant cross-counts (computed from a
    // block-sized aggregate, never by materializing pairs), total space =
    // |orig|·|variant|, and found-matches via ONE join of the planted
    // pair ids against their blocks.
    "er_blocking_quality" -> ((s, dir) => {
      val (dirty, _) = erScoredPairs(s, dir)
      val blocked = dirty.select(col("c_custkey"), col("c_nationkey"), col("blk"),
        (col("c_custkey") >= 500000L).as("variant"))
      // per-block pair volume n(n−1)/2 stays exact BIGINT to ~3e9 rows per
      // block (n² < 2⁶³) — past that the card wants the double form anyway
      val perBlock = blocked.groupBy(col("c_nationkey"), col("blk"))
        .agg(count(lit(1)).as("n"))
      val tot = blocked.agg(
        count(when(!col("variant"), 1)).as("t_o"),
        count(when(col("variant"), 1)).as("t_v"))
      // a planted pair (k, k+500000) survives blocking iff both land in
      // the same (nation, band) — i.e. the +0.37 shift stayed in-band
      val o = blocked.where(!col("variant"))
        .select(col("c_custkey").as("k"), col("c_nationkey").as("n1"), col("blk").as("b1"))
      val v = blocked.where(col("variant"))
        .select((col("c_custkey") - 500000L).as("k"),
          col("c_nationkey").as("n2"), col("blk").as("b2"))
      val found = o.join(v, "k")
        .agg(count(lit(1)).as("n_true"),
          count(when(col("n1") === col("n2") && col("b1") === col("b2"), 1))
            .as("n_found"))
      perBlock.agg(
          sum(expr("n * (n - 1) DIV 2")).as("cand_pairs"),
          count(lit(1)).as("n_blocks"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(found))
        .select(col("n_blocks"), col("cand_pairs"),
          expr("(t_o + t_v) * (t_o + t_v - 1) DIV 2").as("total_pairs"),
          col("n_true"), col("n_found"),
          expr("floor((1e0 - CAST(cand_pairs AS DOUBLE) / ((t_o + t_v) * (t_o + t_v - 1) DIV 2)) * 1e6 + 0.5) / 1e6")
            .as("reduction_ratio"),
          expr("floor(CAST(n_found AS DOUBLE) / n_true * 1e6 + 0.5) / 1e6")
            .as("pairs_completeness"))
    }),

    // Minimal-generalization search (the k-anonymity DESIGN step:
    // k_anonymity audits one generalization, this finds the least-coarse
    // balance-band width whose WORST equivalence class still reaches
    // k=10 — publish at that width and no coarser, the Samarati lattice
    // walk in one pass): the four candidate widths explode alongside the
    // rows, ONE aggregate computes every width's class-size profile, and
    // the chosen flag marks the smallest passing width. Exact integers
    // throughout.
    "kanon_generalize" -> ((s, dir) => {
      val widths = Seq(100L, 500L, 2500L, 12500L)
      val c = t(s, dir, "customer").select(col("c_mktsegment"), col("c_acctbal"))
        .select(col("c_mktsegment"), explode(typedLit(widths)).as("width"),
          col("c_acctbal"))
        .withColumn("bin", expr("CAST(floor(c_acctbal / CAST(width AS DOUBLE)) AS BIGINT)"))
      val classes = c.groupBy(col("width"), col("c_mktsegment"), col("bin"))
        .agg(count(lit(1)).as("n"))
      val per = classes.groupBy(col("width"))
        .agg(count(lit(1)).as("n_classes"), min(col("n")).as("min_class"),
          count(when(col("n") < 10L, 1)).as("n_violating"))
      val best = per.where(col("min_class") >= 10L)
        .agg(min(col("width")).as("best_width"))
      per.crossJoin(broadcast(best))
        .select(col("width"), col("n_classes"), col("min_class"),
          col("n_violating"),
          (col("min_class") >= 10L).as("k_ok"),
          // no width may pass at tiny SFs: null-safe compare keeps
          // `chosen` a real FALSE instead of NULL
          (col("width") <=> col("best_width")).as("chosen"))
        .orderBy(col("width"))
    }),

    // Golden-record construction (MDM survivorship — the step AFTER
    // er_cluster's entities exist: one publishable record per entity,
    // attributes resolved by explicit deterministic rules instead of
    // "whichever copy the pipeline saw last"): canonical id = the
    // component minimum (the original record, since variants live at
    // +500000), name/segment survive from that canonical member via
    // min_by (unique keys ⇒ deterministic), balance survives as the MAX
    // across members (most-recent-favorable rule), n_members counts the
    // merge. Same blocked pairs + CC fixpoint as er_cluster (the shared
    // erScoredPairs definition); the survivorship pass is one join +
    // one entity-keyed aggregate.
    "golden_record" -> ((s, dir) => {
      val (dirty, _) = erScoredPairs(s, dir)
      val labels = erMatchLabels(s, dir)
      dirty.join(labels, dirty("c_custkey") === labels("id"))
        .groupBy(col("component").as("entity_id"))
        .agg(count(lit(1)).as("n_members"),
          min_by(col("c_name"), col("c_custkey")).as("name"),
          min_by(col("c_mktsegment"), col("c_custkey")).as("segment"),
          expr("CAST(round(max(c_acctbal) * 100) AS BIGINT)").as("max_bal_cents"))
        .withColumn("is_merged", col("n_members") > 1L)
        .orderBy(col("entity_id"))
    }),

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

    // Functional-dependency discovery card (round 6): for each candidate
    // FD A→B, ONE groupBy(A) countDistinct(B) pass collapses to (groups,
    // violating groups, worst fan-out) — the TANE-style profiling primitive
    // behind schema inference, normalization advice, and dirty-join-key
    // detection. The candidate set mixes true FDs (nation key → region,
    // the o_orderkey PK → anything) with false ones (customer nation →
    // market segment), so both verdicts exercise. Each check is
    // map-side-combined and independent at any corpus size; exact BIGINTs.
    "fd_discover" -> ((s, dir) => {
      val checks = Seq(
        ("nation", "n_nationkey", "n_regionkey"),
        ("nation", "n_name", "n_nationkey"),
        ("part", "p_brand", "p_size"),
        ("customer", "c_nationkey", "c_mktsegment"),
        ("orders", "o_orderkey", "o_custkey"),
        ("lineitem", "l_orderkey", "l_suppkey"))
      checks.map { case (tbl, det, dep) =>
        t(s, dir, tbl).groupBy(col(det)).agg(countDistinct(col(dep)).as("nd"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
            max(col("nd")).as("max_dependents"))
          .select(lit(tbl).as("table_name"), lit(det).as("determinant"),
            lit(dep).as("dependent"), col("n_groups"), col("n_violating"),
            col("max_dependents"), (col("n_violating") === 0).as("holds"))
      }.reduce(_.unionByName(_))
        .orderBy(col("table_name"), col("determinant"))
    }),

    // Unique-column-combination discovery card (round 6 — the third
    // profiling primitive after fd_discover/ind_discover: candidate-KEY
    // discovery): per candidate column set, one distinct-collapse counts
    // rows vs distinct combinations. Deliberately includes the synthetic
    // (l_orderkey, l_linenumber) pair, which is NOT unique in this data —
    // the exact trap order-dependent queries here must tie-break around —
    // so the card documents it as a measured fact, not tribal knowledge.
    "ucc_discover" -> ((s, dir) => {
      val checks = Seq(
        ("orders", Seq("o_orderkey")),
        ("customer", Seq("c_custkey")),
        ("documents", Seq("doc_id")),
        ("lineitem", Seq("l_orderkey", "l_linenumber")),
        ("part", Seq("p_brand")),
        ("events", Seq("user_id", "event_type")))
      checks.map { case (tbl, cols) =>
        val df = t(s, dir, tbl)
        df.agg(count(lit(1)).as("n_rows"))
          .crossJoin(df.select(cols.map(col): _*).distinct()
            .agg(count(lit(1)).as("n_distinct")))
          .select(lit(tbl).as("table_name"),
            lit(cols.mkString(",")).as("column_set"),
            col("n_rows"), col("n_distinct"),
            (col("n_rows") - col("n_distinct")).as("n_excess_rows"),
            (col("n_rows") === col("n_distinct")).as("is_key"))
      }.reduce(_.unionByName(_))
        .orderBy(col("table_name"), col("column_set"))
    }),

    // Inclusion-dependency discovery card (round 6, fd_discover's FK-
    // candidate sibling): for each candidate A ⊆ B, both sides collapse to
    // their DISTINCT key domains first (map-side combine — the join never
    // sees corpus-sized streams), then one left join counts uncovered
    // child values. True INDs (the real FK chain lineitem→orders→customer
    // →nation→region) and a guaranteed-false one (part sizes vs nation
    // keys: 50 ⊄ 25 at every SF) both exercise; customer→orders is the
    // data-dependent case (every customer ordered at sf0.01, one didn't at
    // sf0.1 — the card measures it either way). The discovery primitive
    // behind foreign-key inference and referential-integrity monitoring.
    "ind_discover" -> ((s, dir) => {
      val checks = Seq(
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
        ("customer", "c_custkey", "orders", "o_custkey"),
        ("part", "p_size", "nation", "n_nationkey"))
      checks.map { case (ct, cc, pt, pc) =>
        val child = t(s, dir, ct).select(col(cc).cast("long").as("k")).distinct()
        val parent = t(s, dir, pt).select(col(pc).cast("long").as("k")).distinct()
        child.join(parent.withColumn("_p", lit(1)), Seq("k"), "left")
          .agg(count(lit(1)).as("n_distinct_child"),
            count(when(col("_p").isNull, 1)).as("n_missing"))
          .select(lit(ct).as("child_table"), lit(cc).as("child_col"),
            lit(pt).as("parent_table"), lit(pc).as("parent_col"),
            col("n_distinct_child"), col("n_missing"),
            (col("n_missing") === 0).as("contained"))
      }.reduce(_.unionByName(_))
        .orderBy(col("child_table"), col("child_col"))
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

    // k-anonymity privacy card (Sweeney): equivalence classes over the
    // quasi-identifier tuple (segment, nation, coarse balance band — the
    // generalization step is the band), reported as a class-size histogram
    // with the at-risk flag at k = 5. Re-identification risk lives in the
    // SMALL classes, so the card is what a release gate reads before
    // publishing user-derived training data. Two key-bounded aggregates
    // (QI domain, then class-size domain) — map-side combined, no driver
    // state; pii_redact's structural sibling.
    "k_anonymity" -> ((s, dir) => {
      val qi = t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast(LongType).as("bal_band"))
      qi.groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
        .agg(count(lit(1)).as("class_size"))
        .groupBy(col("class_size"))
        .agg(count(lit(1)).as("n_classes"))
        .select(col("class_size"), col("n_classes"),
          (col("class_size") * col("n_classes")).as("n_rows"),
          (col("class_size") < 5L).as("at_risk"))
        .orderBy(col("class_size"))
    }),

    // Right-to-be-forgotten purge report (the GDPR/CCPA deletion loop the
    // privacy cards gate): a deletion list of user ids anti-joins every
    // user-keyed table; the report pins, per table, how many rows were
    // purged and an exact id-checksum of the SURVIVORS — the auditable
    // proof that deletion propagated everywhere (a checksum of what
    // remains catches both under- and over-deletion, which bare counts
    // cannot). The deletion list broadcasts; each table streams through
    // one anti join + one aggregate, never shuffled on data keys.
    "forget_users" -> ((s, dir) => {
      val del = broadcast(t(s, dir, "events")
        .where(col("user_id").isNotNull && col("user_id") % 17 === 3)
        .select(col("user_id").as("del_id")).distinct())
      def report(table: String, df: org.apache.spark.sql.DataFrame,
                 key: String, id: String) = {
        val kept = df.join(del, col(key) === col("del_id"), "left_anti")
        kept.agg(count(lit(1)).as("n_after"), sum(col(id)).as("kept_id_sum"))
          .crossJoin(broadcast(df.agg(count(lit(1)).as("n_before"))))
          .select(lit(table).as("table_name"), col("n_before"),
            (col("n_before") - col("n_after")).as("n_purged"),
            col("n_after"), col("kept_id_sum"))
      }
      report("events", t(s, dir, "events").where(col("user_id").isNotNull),
          "user_id", "event_id")
        .unionByName(report("customer", t(s, dir, "customer"), "c_custkey", "c_custkey"))
        .unionByName(report("orders", t(s, dir, "orders"), "o_custkey", "o_orderkey"))
        .orderBy(col("table_name"))
    }),

    // l-diversity companion card (Machanavajjhala): k-anonymity alone
    // fails when an equivalence class is homogeneous in the SENSITIVE
    // attribute (everyone in the class shares the value → disclosure
    // without re-identification). Classes are the (segment, nation) QI;
    // the sensitive attribute is the customer's order priority mix:
    // per-class distinct sensitive values (l), reported as an l-histogram
    // with the at-risk flag at l < 3. The customer⋈orders join is the only
    // data-sized stage; both aggregates are key-bounded.
    "l_diversity" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"),
        col("c_nationkey"))
      val o = t(s, dir, "orders").select(col("o_custkey"), col("o_orderpriority"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(countDistinct(col("o_orderpriority")).as("l"),
          countDistinct(col("c_custkey")).as("class_custs"))
        .groupBy(col("l"))
        .agg(count(lit(1)).as("n_classes"), sum(col("class_custs")).as("n_custs"))
        .select(col("l"), col("n_classes"), col("n_custs"), (col("l") < 3L).as("at_risk"))
        .orderBy(col("l"))
    }),

    // t-closeness (Li et al.) — the third member of the privacy-release
    // trilogy: k-anonymity bounds re-identification, l-diversity bounds
    // class homogeneity, and t-closeness bounds how much an equivalence
    // class's SENSITIVE-VALUE DISTRIBUTION deviates from the corpus-wide
    // one (a class can be diverse yet still leak — e.g. 90% URGENT where
    // the population is 20%). Same QI classes and sensitive attribute as
    // l_diversity; distance = variational distance ½·Σ|p_cv − q_v| (the
    // EMD under the uniform ground metric for categorical attributes),
    // computed EXACTLY as Σ|n_cv·N − N_v·n_c| BIGINTs with one final
    // division (n_cv·N ≤ N² ≈ 2.25e18 < 2⁶³ up to ~1.5e9 orders — sf1000).
    // Scale shape: customer⋈orders is the only data-sized stage; the
    // global margins derive from the CLASS-LEVEL counts (config-sized),
    // never a second corpus scan; the domain completion is a 125×5 cross
    // join of tiny aggregates.
    "t_closeness" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"),
        col("c_mktsegment"), col("c_nationkey"))
      val o = t(s, dir, "orders").select(col("o_custkey"), col("o_orderpriority"))
      val cv = c.join(o, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"), col("c_nationkey"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_cv"))
      val cls = cv.groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(sum(col("n_cv")).as("n_c"))
      val gv = cv.groupBy(col("o_orderpriority")).agg(sum(col("n_cv")).as("n_v"))
      val tot = gv.agg(sum(col("n_v")).as("n_tot"))
      cls.crossJoin(broadcast(gv)).crossJoin(broadcast(tot))
        .join(cv, Seq("c_mktsegment", "c_nationkey", "o_orderpriority"), "left")
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(max(col("n_c")).as("n_orders"),
          sum(abs(coalesce(col("n_cv"), lit(0L)) * col("n_tot")
            - col("n_v") * col("n_c"))).as("s_abs"),
          max(col("n_tot")).as("nt"))
        .select(col("c_mktsegment"), col("c_nationkey"), col("n_orders"),
          (floor(col("s_abs").cast(DoubleType)
            / (lit(2L) * col("n_orders") * col("nt")) * 1e6 + 0.5) / 1e6)
            .as("t_dist"))
        .withColumn("at_risk", col("t_dist") > 0.1)
        .orderBy(col("c_mktsegment"), col("c_nationkey"))
    }),

    // Differentially-private histogram release (Dwork et al. 2006 Laplace
    // mechanism — the privacy family's RELEASE member: k_anonymity/
    // l_diversity/t_closeness are re-identification AUDITS of data you
    // keep; DP is the calibrated-noise contract for counts you publish).
    // Per-nation customer counts (sensitivity 1) get Laplace(1/ε), ε=1,
    // via inverse-CDF over a DETERMINISTIC md5-seeded uniform — the
    // repo-wide seeded-randomness convention (train_split's md5 prefix),
    // so the release is reproducible and cross-engine checkable while
    // keeping the mechanism's exact shape. The ln() noise micro-rounds to
    // 1e-4 BEFORE the add (engine libm ulp insurance); released counts
    // are the standard max(0, round) post-processing. Key-bounded
    // aggregate + per-key scalar math — embarrassingly parallel at any
    // corpus size.
    "dp_histogram" -> ((s, dir) => {
      val ex = t(s, dir, "customer")
        .groupBy(col("c_nationkey").cast(LongType).as("nation_key"))
        .agg(count(lit(1)).as("n_exact"))
      ex.withColumn("h",
          expr("CAST(conv(substring(md5(concat('dp:', CAST(nation_key AS STRING))), 1, 6), 16, 10) AS BIGINT)"))
        .withColumn("dp_noise", expr(DpNoiseSql))
        .select(col("nation_key"), col("n_exact"), col("dp_noise"),
          expr("greatest(CAST(floor(n_exact + dp_noise + 0.5e0) AS BIGINT), 0)")
            .as("n_released"))
        .orderBy(col("nation_key"))
    }),

    // ε-DP top-k release (noisy top-k / one-shot report-noisy-max with
    // Laplace noise — Dwork & Roth §3.4; dp_histogram releases COUNTS,
    // this releases a RANKING, the "most frequent tokens we may publish"
    // card): per-token df + per-token Laplace noise from the md5-derived
    // uniform (dp_histogram's inverse-CDF construction), rank by the
    // noisy score, publish the top 5 with rounded noisy counts. The noise
    // stays in 1e-4-unit BIGINTs (floor ONCE after the ln — the only
    // libm call, bit-identical cross-engine per the dp_histogram
    // precedent) so the ranking compares pure integers; negative noisy
    // scores clamp BEFORE the rounding division so floor vs truncate can
    // never diverge. Ranking windows run on the vocab-sized count table
    // with partitionBy(lit(0)) explicit — the "no global window" rule is
    // about data-sized inputs.
    "dp_topk" -> ((s, dir) => {
      val noise4 = "CAST(floor(-(CASE WHEN (CAST(h AS DOUBLE) + 0.5e0) / 16777216e0 >= 0.5e0 " +
        "THEN 1e0 ELSE -1e0 END) * ln(1e0 - 2e0 * abs((CAST(h AS DOUBLE) + 0.5e0) " +
        "/ 16777216e0 - 0.5e0)) * 1e4 + 0.5) AS BIGINT)"
      val counts = t(s, dir, "documents")
        .select(explode(TextFns.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
        .withColumn("h", expr("CAST(conv(substring(md5(concat('dptk:', token)), 1, 6), 16, 10) AS BIGINT)"))
        .withColumn("noise4", expr(noise4))
        .withColumn("score4", expr("n_exact * 10000 + noise4"))
      // TakeOrderedAndProject cuts both top-5s DISTRIBUTEDLY (a
      // partitionBy(lit(0)) rank over the token domain is a data-sized
      // single partition at real vocabulary scale — caught in self-review);
      // the rank window then runs on the 5-row result
      val cc = counts.localCheckpoint(false) // both top-5 cuts read it
      val top5 = cc.orderBy(col("score4").desc, col("token")).limit(5)
      val exact5 = cc.orderBy(col("n_exact").desc, col("token")).limit(5)
        .select(col("token"), lit(true).as("in_exact"))
      top5.join(broadcast(exact5), Seq("token"), "left")
        .withColumn("rank", row_number().over(Window.partitionBy(lit(0))
          .orderBy(col("score4").desc, col("token"))))
        .select(col("rank").cast(LongType).as("rank"), col("token"),
          expr("(greatest(score4, 0) + 5000) DIV 10000").as("n_released"),
          coalesce(col("in_exact"), lit(false)).as("in_exact_topk"))
        .orderBy(col("rank"))
    }),

    // HITS hubs & authorities (Kleinberg) on the DIRECTED nation trade
    // graph — the graph family's bipartite-centrality member (pagerank
    // ranks global importance; HITS separates "big buyers" (hubs:
    // supplier-nations spreading volume) from "big sellers" (authorities:
    // customer-nations attracting it) — on a trade graph the two rankings
    // genuinely differ). Corpus collapses DISTRIBUTEDLY to the ≤nations²
    // weighted edge list (broadcast dims + one orderkey shuffle — the
    // graph_pagerank shape); 5 synchronous mutual-reinforcement rounds
    // a ← Aᵀh, h ← A·a with L1 normalization (the sqrt-free variant —
    // rank order identical, no libm dependence) run on the config-sized
    // edge list in the driver with contributions folded in sorted edge
    // order; the oracle unrolls the identical recurrence.
    "graph_hits" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey").cast(LongType).as("src"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast(LongType).as("dst"))
      val edges = li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val nations = t(s, dir, "nation")
        .select(col("n_nationkey").cast(LongType)).collect().map(_.getLong(0)).sorted
      val nN = nations.length
      // round-9 (advice item): the fold runs in EXACT fixed-point integers —
      // scores in 1e-12 units, contributions w·h12 and the L1 normalization
      // (v·1e12)//t in BigInt (mirroring DuckDB HUGEINT, exact to 1e38, so
      // corpus-scale w cannot overflow) — making the sums order-independent;
      // the previous double fold micro-rounded at 1e-6 and a value landing
      // on a rounding boundary could flip between engines' accumulation
      // orders (attribution_markov convention, applied to HITS).
      val unit = BigInt(1000000000000L)
      var h = nations.map(_ -> unit / nN).toMap
      var a = Map.empty[Long, BigInt]
      for (_ <- 1 to 5) {
        val ain = scala.collection.mutable.Map(nations.map(_ -> BigInt(0)): _*)
        edges.foreach { case (src, dst, w) => ain(dst) += BigInt(w) * h(src) }
        val at = nations.map(ain).sum
        a = nations.map(n =>
          n -> (if (at == 0) BigInt(0) else ain(n) * unit / at)).toMap
        val hin = scala.collection.mutable.Map(nations.map(_ -> BigInt(0)): _*)
        edges.foreach { case (src, dst, w) => hin(src) += BigInt(w) * a(dst) }
        val ht = nations.map(hin).sum
        h = nations.map(n =>
          n -> (if (ht == 0) BigInt(0) else hin(n) * unit / ht)).toMap
      }
      import s.implicits._
      nations.map(n => (n, h(n).toLong, a(n).toLong)).toSeq
        .toDF("nation", "h12", "a12")
        .select(col("nation"), (col("h12") / lit(1e12)).as("hub"),
          (col("a12") / lit(1e12)).as("authority"))
        .orderBy(col("nation"))
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
        lit(math.floor(p50 * 1e4 + 0.5) / 1e4).as("p50_cnt"),
        lit(math.floor(p99 * 1e4 + 0.5) / 1e4).as("p99_cnt"),
        lit(math.floor(maxCnt / avg * 1e4 + 0.5) / 1e4).as("skew_ratio"),
        lit(math.floor(maxCnt.toDouble / total * 1e6 + 0.5) / 1e6).as("top1_share"))
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

    // Fuzzy join via DISTINCT-VALUE blocking: edit distance runs once per
    // distinct (brand, name) pair, then instance pair counts expand by
    // multiplicity (c1*c2 cross, C(c,2) within a duplicated name — every
    // unordered instance pair is counted exactly once, matching the
    // instance-level a_key < b_key join the oracle runs). The length band
    // |len(a)-len(b)| <= 2 is IMPLIED by lev <= 2 (edit distance >= length
    // difference), so it prunes candidates without changing results
    // (differential spec), and the 3-arg thresholded levenshtein runs the
    // banded DP. At 100 TB the distinct-name space is orders of magnitude
    // below the instance space, so the quadratic work shrinks
    // quadratically; both sides shuffle by the block key, skewed blocks
    // fall back to the salted-join pattern.
    "fuzzy_join" -> ((s, dir) => {
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
          (floor(sum(col("dist") * col("n")) / sum(col("n")) * 1e4 + 0.5) / 1e4).as("avg_dist"))
        .orderBy(col("brand"))
    }),

    // Gaps-and-islands sessionization: a session breaks after a 30-minute
    // silence. One (user_id) exchange carries both windows (lag detects the
    // break, a running sum numbers the sessions) and the per-session
    // aggregate. Gap arithmetic runs on integer microseconds — exact in
    // both engines, no float seconds.
    "session_stats" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val ow = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(ow))
        .withColumn("brk",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          (floor((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .cast(DoubleType) / 1e6 * 1e3 + 0.5) / 1e3).as("duration_sec"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("user_id"), col("sid"))
    }),

    // Top user journeys: the ordered first-5 event types of each 30-minute
    // session (session_stats' gaps-and-islands ids), concatenated into a
    // path and counted — funnel DISCOVERY, where event_funnel measures a
    // known path. The rank≤5 head filter runs inside the same user window
    // sort; paths aggregate to the (bounded) distinct-journey domain.
    // Top-25 cut on (count desc, path) — fully deterministic.
    "session_paths" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val ow = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sess = ev.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(ow))
        .withColumn("brk",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val sw = Window.partitionBy(col("user_id"), col("sid"))
        .orderBy(col("ts"), col("event_id"))
      sess.withColumn("rn", row_number().over(sw))
        .where(col("rn") <= 5)
        .groupBy(col("user_id"), col("sid"))
        .agg(concat_ws(">",
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type"))).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(25)
    }),

    // Deterministic weighted systematic sampling: selection probability
    // proportional to document mass (n_chars), reproducible across engines
    // and reruns with NO RNG — rows are laid out in md5-key order, a
    // distributed exclusive prefix sum (operators/GlobalOrder: the window's
    // own hash exchange is the only data shuffle) assigns each row a mass
    // interval, and a row is picked iff its interval covers a multiple of
    // the stride. All selection math is positive integer division —
    // bit-identical in Spark and DuckDB.
    "sample_weighted" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars").as("w"),
          md5(concat(lit("samp:"), col("doc_id").cast(StringType))).as("skey"))
      val cum = graft.operators.GlobalOrder.withExclusivePrefixSum(
        docs, Seq(col("skey"), col("doc_id")), col("w"), "cum0", numParts = 8)
      val tot = docs.agg(sum(col("w")).as("w_all"))
      cum.crossJoin(broadcast(tot))
        .withColumn("stride", expr("greatest(w_all DIV 100, 1)"))
        .withColumn("picked",
          expr("(cum0 + w - 1 + stride) DIV stride > (cum0 - 1 + stride) DIV stride"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("picked"), 1)).as("n_picked"),
          sum(col("w")).as("w_total"),
          coalesce(sum(when(col("picked"), col("w"))), lit(0L)).as("w_picked"))
        .orderBy(col("source"))
    }),

    // Time-interval RANGE frame: per-user trailing-1-hour activity at every
    // event (RANGE BETWEEN INTERVAL — value-based, so sparse/bursty streams
    // get the true time window, not a row-count approximation). One
    // user_id exchange; frame state is the in-window rows only.
    "window_time_range" -> ((s, dir) => {
      t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .createOrReplaceTempView("ev_tr")
      s.sql(
        """SELECT event_id, n_hour, avg_hour FROM (
          |  SELECT event_id,
          |    CAST(count(*) OVER w AS BIGINT) AS n_hour,
          |    round(avg(value) OVER w, 4) AS avg_hour
          |  FROM ev_tr
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW))
          |ORDER BY event_id""".stripMargin)
    }),

    // Nation-level trade-flow PageRank: the DISTRIBUTED work is collapsing
    // the corpus to the graph (lineitem joins supplier/customer nations —
    // broadcast dims, one co-partitioned orderkey shuffle, then a
    // 25x25-bounded aggregate); the solve runs on that config-sized matrix
    // at the driver (5 damped iterations, deterministic src-sorted
    // accumulation), the same corpus-to-config split as mix_temperature.
    // A doc-scale graph would instead iterate as DataFrame joins — that
    // fixpoint pattern is dedup_clusters' connected components.
    // Supplier operational scorecard: volume, exact-cents revenue, return
    // rate and late-shipment rate per supplier — the vendor-management
    // card. ONE fact⋈fact join on orderkey (the only data-sized movement,
    // shared with q21's lateness rule), a supplier-domain conditional
    // aggregate, then the supplier dim broadcasts onto the aggregate. The
    // rates divide exact BIGINT counts once, floor-rounded.
    "supplier_scorecard" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"),
          (floor(sum(expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"))
            / 100.0 + 0.5) / 100.0).as("revenue"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
          sum(when(expr("l_shipdate > o_orderdate + INTERVAL 365 DAY"), 1L)
            .otherwise(0L)).as("n_late"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_lines"), col("revenue"),
          expr("floor(n_returned / CAST(n_lines AS DOUBLE) * 1e4 + 0.5) / 1e4").as("return_rate"),
          expr("floor(n_late / CAST(n_lines AS DOUBLE) * 1e4 + 0.5) / 1e4").as("late_rate"))
        .orderBy(col("s_suppkey"))
    }),

    // Label-propagation communities on the nation trade graph — the THIRD
    // graph algorithm family (components = connectivity, pagerank =
    // centrality, LPA = mesoscale structure). Same scale shape as
    // graph_pagerank: the corpus collapses DISTRIBUTEDLY to the ≤nations²
    // weighted edge list (broadcast dims, one orderkey shuffle), then 5
    // synchronous LPA rounds run on the config-sized graph in the driver.
    // Everything is exact-integer: edges sparsify by the strict
    // above-average rule w·|E| > Σw (no float threshold), and each round's
    // relabel is argmax by (Σ neighbor weight DESC, label ASC) — the
    // deterministic tie the oracle's row_number mirrors. The uniform
    // synthetic trade has NO mesoscale structure (every sparsify level
    // yields one blob or all singletons — measured), so a deterministic
    // ×5 intra-region affinity boost plants it; the algorithm must then
    // RECOVER the regions from edge weights alone (community purity vs
    // n_regionkey verified at all three SFs, exact 5×5 regions at sf0.1).
    "graph_communities" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey").cast(LongType).as("src"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast(LongType).as("dst"))
      val regions = t(s, dir, "nation")
        .select(col("n_nationkey").cast(LongType), col("n_regionkey").cast(LongType))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val directed = li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .where(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2) * (if (regions(r.getLong(0)) == regions(r.getLong(1))) 5L else 1L)))
      val und = (directed.map(e => ((e._1, e._2), e._3)) ++
          directed.map(e => ((e._2, e._1), e._3)))
        .groupBy(_._1).map { case (k, es) => (k._1, k._2, es.map(_._2).sum) }.toSeq
      val (ne, tw) = (und.size.toLong, und.map(_._3).sum)
      val sp = und.filter(e => e._3 * ne > tw)
      val nbrs = sp.groupBy(_._1)
      val nations = t(s, dir, "nation")
        .select(col("n_nationkey").cast(LongType)).collect().map(_.getLong(0)).sorted
      var label = nations.map(n => n -> n).toMap
      for (_ <- 1 to 5) {
        label = nations.map { n =>
          nbrs.get(n) match {
            case None => n -> label(n)
            case Some(es) =>
              val byLabel = es.groupBy(e => label(e._2))
                .map { case (l, xs) => (l, xs.map(_._3).sum) }
              n -> byLabel.toSeq.maxBy { case (l, sw) => (sw, -l) }._1
          }
        }.toMap
      }
      val sizes = label.values.toSeq.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
      import s.implicits._
      nations.map(n => (n, label(n), sizes(label(n))))
        .toSeq.toDF("nation", "community", "community_size")
        .orderBy(col("nation"))
    }),

    "graph_pagerank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey").cast(LongType).as("src"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast(LongType).as("dst"))
      val edges = li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toDouble))
      val nations = t(s, dir, "nation")
        .select(col("n_nationkey").cast(LongType)).collect().map(_.getLong(0)).sorted
      val nN = nations.length
      val outW = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
      // deterministic accumulation: contributions folded in (src, dst) order
      val bySrc = edges.sortBy(e => (e._1, e._2))
      var pr = nations.map(_ -> 1.0 / nN).toMap
      for (_ <- 1 to 5) {
        val in = scala.collection.mutable.Map(nations.map(_ -> 0.0): _*)
        bySrc.foreach { case (src, dst, w) =>
          in(dst) += pr(src) * (w / outW(src))
        }
        // dangling (no out-edge) mass redistributes uniformly — total rank
        // mass stays 1 (folded in nation order for determinism)
        val dangling = nations.filterNot(outW.contains).map(pr).sum
        pr = nations.map(n =>
          n -> (0.15 / nN + 0.85 * (in(n) + dangling / nN))).toMap
      }
      import s.implicits._
      pr.toSeq.sortBy(_._1).toDF("nation", "pr_raw")
        .select(col("nation"), round(col("pr_raw"), 6).as("pr"))
        .orderBy(col("nation"))
    }),

    // PageRank on a DATA-SIZED node domain — the distributed-iteration
    // counterpart to graph_pagerank's config-sized nation fold (PLANS.md
    // "Graph-family scale contract"; round-8 verdict #1). Graph = the
    // user×user temporal-successor graph: within each (event_type, hour)
    // bucket ordered by (ts, event_id), an edge from each event's user to
    // the NEXT event's user. ONE window sort builds the edge list — linear
    // in events at any scale, where bucket co-occurrence PAIRS would grow
    // quadratically with per-bucket density. Nodes = distinct users (grows
    // with SF: 15 / 150 / 1500 across the test SFs); operators/PageRank
    // then runs 5 synchronous distributed rounds in exact fixed-point
    // integers (scores 1e-12, edge probabilities 1e-6), so the unrolled
    // 5-round SQL oracle matches bit-for-bit. Top-100 by final score,
    // TakeOrderedAndProject-planned; rank is assigned AFTER the top-k (a
    // global row_number over the full node domain would single-partition
    // the corpus-sized score table).
    "graph_pagerank_users" -> ((s, dir) => {
      import graft.operators.{CacheRegistry, PageRank}
      val (e0, nodes0) = successorGraph(s, dir)
      // out-weight via a window over the SAME src exchange (a groupBy+join
      // would recompute the whole window pipeline for the second consumer);
      // edges are scanned every round — persist once (session-lifetime,
      // swept by the harness mains); p6 is the per-edge 1e-6 transition
      // probability, a constant across rounds
      val edges = CacheRegistry.track(e0
        .withColumn("wo", sum(col("w")).over(Window.partitionBy(col("src"))))
        .select(col("src"), col("dst"), expr("(w * 1000000) DIV wo").as("p6")))
      val nodes = nodes0 // persisted inside successorGraph
      val n = nodes.count()
      PageRank.run(edges, nodes, n, 5)
        .orderBy(col("r12").desc, col("id")).limit(100)
        .select(col("id").as("user_id"), col("r12").as("score12"))
        .withColumn("rnk", row_number()
          .over(Window.orderBy(col("score12").desc, col("user_id"))).cast(LongType))
        .orderBy(col("rnk"))
    }),

    // Personalized PageRank from the seed set — the sixth data-scale graph
    // member and the RECOMMENDATION primitive (scores = proximity to the
    // seeds, Haveliwala's topic-sensitive teleport): every 25th user (the
    // BFS seed convention, data-scale) receives the teleport AND the
    // dangling mass; everything else is graph_pagerank_users' machinery
    // verbatim — the SAME persisted p6 edge table (CacheManager dedups by
    // canonicalized plan, so the events window sort still runs once per
    // session across the four user-graph queries), 5 synchronous rounds,
    // exact 1e-12 fixed-point integers, unrolled bit-exact SQL oracle.
    // Declared output: top-100 by proximity score.
    "graph_ppr_users" -> ((s, dir) => {
      import graft.operators.{CacheRegistry, PageRank}
      val (e0, nodes0) = successorGraph(s, dir)
      val edges = CacheRegistry.track(e0
        .withColumn("wo", sum(col("w")).over(Window.partitionBy(col("src"))))
        .select(col("src"), col("dst"), expr("(w * 1000000) DIV wo").as("p6")))
      val nodes = nodes0.select(col("id"), (col("id") % 25 === 0).as("seed"))
      val nSeeds = nodes.where(col("seed")).count()
      PageRank.runPersonalized(edges, nodes, "seed", nSeeds, 5)
        .orderBy(col("r12").desc, col("id")).limit(100)
        .select(col("id").as("user_id"), col("r12").as("score12"))
        .withColumn("rnk", row_number()
          .over(Window.orderBy(col("score12").desc, col("user_id"))).cast(LongType))
        .orderBy(col("rnk"))
    }),

    // Label-propagation communities on the SAME data-sized user graph —
    // the second distributed-iteration member beside graph_pagerank_users
    // (graph_communities is its config-sized nation twin, PLANS.md
    // "Graph-family scale contract"). The successor edge list symmetrizes
    // (community affinity is undirected), labels start as own ids, and 5
    // synchronous rounds re-label every node with the neighbor-weight
    // argmax label (ties → smaller label; ALL arithmetic is integer edge
    // weights, so the unrolled SQL oracle matches bit-for-bit — no
    // normalization, nothing to quantize). Each round: one join + one
    // (node, label) aggregate + one WindowGroupLimit argmax, checkpointed.
    // Declared output: the community card (label, size, member checksum).
    "graph_lpa_users" -> ((s, dir) => {
      import graft.operators.CacheRegistry
      val (e0, nodes0) = successorGraph(s, dir)
      // repeat-affinity sparsification: a single chance adjacency is
      // noise — an undirected pair must co-occur >= 2 times to carry
      // community signal (without it the dense successor graph floods to
      // ONE community at every SF; with it: 3 / 4 / 246 communities at
      // the three test SFs)
      val edges = CacheRegistry.track(
        e0.select(col("src").as("a"), col("dst").as("b"), col("w"))
          .unionByName(e0.select(col("dst").as("a"), col("src").as("b"), col("w")))
          .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
          .where(col("w") >= 2)
          // pre-partition on the per-round join key (guide §2.4): all 5
          // label-join rounds read a b-co-partitioned cached edge list
          // instead of re-exchanging it per round at scale
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("b")))
      val nodes = nodes0 // persisted inside successorGraph
      var lbl = nodes.select(col("id"), col("id").as("lbl"))
      for (_ <- 1 to 5) {
        val wv = Window.partitionBy(col("a")).orderBy(col("ws").desc, col("cl").asc)
        val votes = edges
          .join(lbl.select(col("id").as("b"), col("lbl").as("cl")), "b")
          .groupBy(col("a"), col("cl")).agg(sum(col("w")).as("ws"))
          .withColumn("rn", row_number().over(wv)).where(col("rn") === 1)
          .select(col("a").as("id"), col("cl").as("nl"))
        // isolated nodes (no edges) keep their own label
        lbl = lbl.join(votes, Seq("id"), "left")
          .select(col("id"), coalesce(col("nl"), col("lbl")).as("lbl"))
          .localCheckpoint(false)
      }
      lbl.groupBy(col("lbl"))
        .agg(count(lit(1)).as("n_members"), sum(col("id")).as("member_id_sum"))
        .select(col("lbl").as("community"), col("n_members"), col("member_id_sum"))
        .orderBy(col("community"))
    }),

    // Frontier BFS reachability on the SAME data-sized user graph — the
    // third distributed-iteration member (round-9 verdict #3; PageRank =
    // scores, LPA = communities, BFS = reach): "blast radius" from a
    // data-scale seed set (every 25th user id — 1/6/60 seeds across the
    // test SFs, grows with the corpus) over the directed successor edges,
    // 5 fixed synchronous rounds. Per round: ONE frontier⋈edges join (the
    // frontier side shrinks as the graph saturates — AQE picks broadcast
    // when it fits), one distinct, one anti-join against the settled set;
    // both frontier and settled checkpoint per round (ConnectedComponents'
    // lineage discipline — without it round r's plan nests all r−1 prior
    // joins). All arithmetic is exact integers (distances are literals,
    // checksums are id sums), so the unrolled 5-round SQL oracle matches
    // bit-for-bit. Declared output: the per-distance card (n_users, id
    // checksum) with dist = −1 carrying the unreached remainder — the
    // influence-reach curve, never a corpus-sized result.
    "graph_bfs_users" -> ((s, dir) => {
      val (e0, nodes0) = successorGraph(s, dir)
      // narrow projections of the frames successorGraph already persists
      val edges = e0.select(col("src"), col("dst"))
      val nodes = nodes0
      var reached = nodes.where(col("id") % 25 === 0)
        .select(col("id"), lit(0L).as("dist")).localCheckpoint(false)
      var frontier = reached.select(col("id").as("src"))
      for (i <- 1 to 5) {
        val nxt = edges.join(frontier, "src")
          .select(col("dst").as("id")).distinct()
          .join(reached, Seq("id"), "left_anti")
          .select(col("id"), lit(i.toLong).as("dist"))
          .localCheckpoint(false)
        // only the NEW frontier needs a checkpoint: `reached` is a flat
        // union of already-checkpointed frames, so its lineage never nests
        // a round's join pipeline (checkpointing the union too paid an
        // extra materialization job per round for nothing)
        reached = reached.unionByName(nxt)
        frontier = nxt.select(col("id").as("src"))
      }
      val card = reached.groupBy(col("dist"))
        .agg(count(lit(1)).as("n_users"), sum(col("id")).as("user_id_sum"))
      val unreached = nodes.join(reached, Seq("id"), "left_anti")
        .agg(count(lit(1)).as("n_users"),
          coalesce(sum(col("id")), lit(0L)).as("user_id_sum"))
        .select(lit(-1L).as("dist"), col("n_users"), col("user_id_sum"))
      card.unionByName(unreached).orderBy(col("dist"))
    }),

    // Batched densest-subgraph peel on the SAME data-sized user graph —
    // the fourth distributed-iteration member (PageRank = scores, LPA =
    // communities, BFS = reach, this = the dense core): Bahmani, Kumar &
    // Vassilvitskii's (VLDB 2012) MapReduce greedy, which removes EVERY
    // node with degree < (2+ε)·E/V per round instead of one min-degree
    // node at a time — O(log n) rounds where the sequential peel is O(n),
    // the whole reason it survives at 100 TB. ε = 0.1; the threshold is
    // the exact integer (m2·11) DIV (n·10) over m2 = 2E directed edge
    // rows, so every quantity in the card (threshold, removals, remaining
    // V/E, density in 1e-6 units via (m2·500000) DIV n) is a BIGINT both
    // engines derive bit-identically — the unrolled 5-round SQL oracle
    // needs no quantization at all. Per round: ONE degree aggregate, the
    // 1-row stats frame rides shuffle_replicate_nl into the filter (a
    // broadcast exchange would spawn its own collect job per round — the
    // PageRank lesson), two anti-joins shrink the edge list, and both
    // frames localCheckpoint (ConnectedComponents' lineage discipline).
    // Declared output: the peel trajectory card (round 0 = whole graph),
    // whose density argmax is the 2(1+ε)-approx densest subgraph.
    "graph_densest_users" -> ((s, dir) => {
      val (e0, nodes0) = successorGraph(s, dir)
      var eg = e0.select(col("src").as("a"), col("dst").as("b"))
        .unionByName(e0.select(col("dst").as("a"), col("src").as("b")))
        .distinct().localCheckpoint(false)
      var v = nodes0.select(col("id")).localCheckpoint(false)
      def statsOf(egF: org.apache.spark.sql.DataFrame,
          vF: org.apache.spark.sql.DataFrame) =
        egF.agg(count(lit(1)).as("m2")).crossJoin(vF.agg(count(lit(1)).as("n")))
      var st = statsOf(eg, v).localCheckpoint(false)
      val thrExpr = expr("(m2 * 11) DIV (greatest(n, 1) * 10)")
      var cards = Seq(st.select(lit(0L).as("round"), lit(0L).as("thr"),
        lit(0L).as("n_removed"), col("n").as("n_remaining"),
        expr("m2 DIV 2").as("n_edges"),
        expr("(m2 * 500000) DIV greatest(n, 1)").as("density6")))
      for (i <- 1 to 5) {
        val deg = eg.groupBy(col("a").as("id")).agg(count(lit(1)).as("d"))
        val rm = v.join(deg, Seq("id"), "left")
          .crossJoin(st.hint("shuffle_replicate_nl"))
          .where(coalesce(col("d"), lit(0L)) < thrExpr)
          .select(col("id")).localCheckpoint(false)
        // Round-14 note: checkpoint-thinning was tried here twice (lazy v /
        // lazy 1-row stats — fewer barriers per round) and MEASURED SLOWER
        // both times (isolated A/B 7.2 s vs 5.0 s): every consumer of a
        // lazy frame re-runs its anti-join chain inside its own job, and
        // with 3-4 consumers per round the re-scans cost more than the
        // four cheap checkpoint jobs they replace. The original per-round
        // checkpoint set stands.
        v = v.join(rm, Seq("id"), "left_anti").localCheckpoint(false)
        eg = eg.join(rm.select(col("id").as("a")), Seq("a"), "left_anti")
          .join(rm.select(col("id").as("b")), Seq("b"), "left_anti")
          .localCheckpoint(false)
        val newSt = statsOf(eg, v).localCheckpoint(false)
        cards :+= rm.agg(count(lit(1)).as("n_removed"))
          .crossJoin(st.select(thrExpr.as("thr")))
          .crossJoin(newSt.select(col("n").as("n_remaining"),
            expr("m2 DIV 2").as("n_edges"),
            expr("(m2 * 500000) DIV greatest(n, 1)").as("density6")))
          .select(lit(i.toLong).as("round"), col("thr"), col("n_removed"),
            col("n_remaining"), col("n_edges"), col("density6"))
        st = newSt
      }
      cards.reduce(_ unionByName _).orderBy(col("round"))
    }),

    // Triangle census + global clustering coefficient on the nation trade
    // graph. The corpus collapses to the config-sized undirected edge list
    // distributedly (same broadcast-dim joins as graph_pagerank — the fact
    // table is touched once); the cubic triangle join then runs on ≤ V²
    // edges, never the corpus. Node order a<b<c counts each triangle once;
    // C = 3·triangles / Σ d(d−1)/2 is a ratio of exact integers.
    "graph_triangles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey").cast(LongType).as("src"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast(LongType).as("dst"))
      val und = li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      val e1 = und.select(col("u").as("a"), col("v").as("b"))
      val e2 = und.select(col("u").as("b2"), col("v").as("c2"))
      val e3 = und.select(col("u").as("a3"), col("v").as("c3"))
      val tri = e1.join(e2, col("b") === col("b2"))
        .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
        .agg(count(lit(1)).as("n_triangles"))
      val deg = und.select(col("u").as("node")).unionAll(und.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      val triads = deg.agg(sum(expr("(d * (d - 1)) DIV 2")).as("n_triads"),
        count(lit(1)).as("n_nodes"))
      val edges = und.agg(count(lit(1)).as("n_edges"))
      triads.crossJoin(edges).crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
          // NULL divisor under ANSI: a triangle-free, triad-free graph must
          // yield NULL clustering as in DuckDB, not throw on 0/0
          (floor(lit(3.0) * col("n_triangles")
            / when(col("n_triads") =!= 0, col("n_triads")) * 1e6 + 0.5) / 1e6)
            .as("clustering"))
    }),

    // Link prediction on the sparsified nation trade graph — the fourth
    // graph-family member (components = connectivity, pagerank =
    // centrality, LPA = mesoscale, triangles = closure; this one PREDICTS
    // closure): for every non-adjacent pair score the classic
    // common-neighbors / Jaccard / resource-allocation indices. Same scale
    // shape as the rest of the family: the corpus collapses DISTRIBUTEDLY
    // to the ≤nations² edge list (broadcast dims, one orderkey shuffle) and
    // every downstream join is config-sized. Resource allocation Σ 1/d(z)
    // stays EXACT by summing LCM(1..24)/d(z) in BIGINTs (every possible
    // degree on a 25-node simple graph divides the LCM) with ONE final
    // division; Jaccard rounds via the engine-identical floor(x·1e6+0.5)
    // form. Candidate pairs come from the 2-path join e(u,z)⋈e(z,v) minus
    // existing edges — never a node crossJoin.
    // The edge list is collected ONCE to a local relation
    // (graph_shortest_paths/graph_communities precedent): `sp` is
    // referenced 6× downstream and self-joins get no ReusedExchange, so a
    // lazy `sp` would inline the full corpus collapse per reference (the
    // round-7 plan: 946 nodes, 288 parquet scans). ≤nations² rows.
    "graph_link_predict" -> ((s, dir) => {
      import s.implicits._
      val sp = sparsifiedNationGraph(s, dir) // symmetric (a, b, w)
        .select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
        .toDF("a", "b")
      val deg = sp.groupBy(col("a")).agg(count(lit(1)).as("d"))
        .withColumnRenamed("a", "node")
      val lcm = 5354228880L // LCM(1..24)
      val cand = sp.select(col("a").as("u"), col("b").as("z"))
        .join(sp.select(col("a").as("z"), col("b").as("v")), "z")
        .where(col("u") < col("v"))
        .join(sp.select(col("a").as("u"), col("b").as("v")),
          Seq("u", "v"), "left_anti")
      cand
        .join(broadcast(deg.select(col("node").as("z"), col("d").as("dz"))), "z")
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("common_n"),
          sum(expr(s"$lcm DIV dz")).as("ra_num"))
        .join(broadcast(deg.select(col("node").as("u"), col("d").as("du"))), "u")
        .join(broadcast(deg.select(col("node").as("v"), col("d").as("dv"))), "v")
        .select(col("u").as("node_u"), col("v").as("node_v"), col("common_n"),
          (floor(col("common_n").cast(DoubleType)
            / (col("du") + col("dv") - col("common_n")) * 1e6 + 0.5) / 1e6)
            .as("jaccard"),
          (floor(col("ra_num").cast(DoubleType) / lit(lcm.toDouble) * 1e6 + 0.5)
            / 1e6).as("resource_alloc"))
        .orderBy(col("common_n").desc, col("node_u"), col("node_v"))
    }),

    // Bounded-horizon BFS hop distances on the same sparsified graph — the
    // all-pairs reachability card (which trade partners are k removed once
    // below-average edges drop). The corpus collapses distributedly to the
    // config-sized edge list exactly as above; the ≤25-node BFS then runs
    // in the driver (graph_communities/pagerank precedent — a 5-deep
    // frontier join tree would re-run the corpus collapse per level).
    // Horizon fixed at 5 hops in BOTH engines (the oracle unrolls 5
    // DISTINCT frontier levels and takes min(level)); pairs beyond the
    // horizon are absent by the same rule on both sides. Undirected ⇒ one
    // (src < dst) row per reachable pair; everything is exact integers.
    "graph_shortest_paths" -> ((s, dir) => {
      val edges = sparsifiedNationGraph(s, dir)
        .select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val nbrs = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      nbrs.keys.toSeq.sorted.foreach { src =>
        var dist = Map(src -> 0L)
        var frontier = Set(src)
        var k = 0L
        while (frontier.nonEmpty && k < 5) {
          k += 1
          val next = frontier.flatMap(n => nbrs.getOrElse(n, Set.empty))
            .diff(dist.keySet)
          dist = dist ++ next.map(_ -> k)
          frontier = next
        }
        dist.foreach { case (dst, d) => if (src < dst) out += ((src, dst, d)) }
      }
      import s.implicits._
      out.toSeq.sortBy(t => (t._1, t._2)).toDF("src", "dst", "hops")
    }),

    // 2D Pareto skyline (non-dominated frontier) per group: minimize
    // (price, discount) over lineitem within each return flag. The classic
    // nested NOT-EXISTS dominance test is O(n²); on a SORTED dimension the
    // skyline is ONE window pass — a row survives iff its discount is
    // strictly under every strictly-cheaper row's minimum (integer-cents
    // RANGE frame expresses "strictly cheaper" exactly) and it ties the
    // minimum within its own price point. One sort per group, O(1) window
    // state, works at any row count.
    "skyline_pareto" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .where(col("l_extendedprice").isNotNull && col("l_discount").isNotNull)
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("pc"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("dc"))
      val prev = Window.partitionBy("l_returnflag").orderBy(col("pc"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val grp = Window.partitionBy("l_returnflag", "pc")
      val sky = li
        .withColumn("prev_min_d", min(col("dc")).over(prev))
        .withColumn("grp_min_d", min(col("dc")).over(grp))
        .where(col("dc") === col("grp_min_d") &&
          (col("prev_min_d").isNull || col("dc") < col("prev_min_d")))
      sky.groupBy(col("l_returnflag"), col("pc"), col("dc"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("pc"))
    }),

    // Order-to-ship cycle time: per order priority, the distribution of
    // (l_shipdate − o_orderdate) in exact integer days — one broadcast-dim
    // join shape (orders side carries only two columns), one aggregate.
    // p50/p90 use the same explicit ⌈p·n⌉ selection semantics as
    // daily_percentiles (engine-identical integers, no interpolation).
    "ship_delay" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      val d = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate").isNotNull && col("o_orderdate").isNotNull)
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("days"))
        .groupBy(col("o_orderpriority"), col("days")).agg(count(lit(1)).as("n"))
      val grp = Window.partitionBy("o_orderpriority")
      val cum = grp.orderBy(col("days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("cumn", sum(col("n")).over(cum))
        .withColumn("tot", sum(col("n")).over(grp))
        .groupBy(col("o_orderpriority"))
        .agg(max(col("tot")).as("n_lineitems"),
          min(when(col("cumn") >= ceil(col("tot") * 0.5), col("days"))).as("p50_days"),
          min(when(col("cumn") >= ceil(col("tot") * 0.9), col("days"))).as("p90_days"),
          max(col("days")).as("max_days"))
        .orderBy(col("o_orderpriority"))
    }),

    // ABC inventory classification: parts ranked by revenue, class A = the
    // head covering 80% of cumulative revenue, B = next 15%, C = tail. The
    // class boundaries compare in EXACT BIGINT arithmetic
    // (cum·20 ≤ total·16 / cum·20 ≤ total·19) — a cum/total double ratio
    // against 0.8 would tie on representable rationals. Revenue collapses
    // to the parts domain first; the cumulative revenue is a DISTRIBUTED
    // GlobalOrder prefix sum over (revenue desc, partkey) — the naive
    // unpartitioned cumsum window is one task sorting the whole parts
    // dimension at scale (round-10 verdict) — and the corpus total joins
    // back as a broadcast scalar instead of a global window.
    "abc_classification" -> ((s, dir) => {
      import graft.operators.GlobalOrder
      val rev = t(s, dir, "lineitem")
        .where(col("l_extendedprice").isNotNull && col("l_discount").isNotNull)
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")).as("cents"))
        .localCheckpoint(false) // feeds the prefix sum, its probes, the total
      // r15 REVERT (r14 verdict #5): the r14 fused count+sum eager probe
      // (total inlined as a literal, knownCount threaded) removed 2
      // exchanges on paper but MEASURED SLOWER — 0.90× in the r14 canonical
      // sweep, confirmed by the settle A/B (min-of-3 isolated: r13 form
      // 3.55 s vs r14 form 4.66 s, with the r13 side handicapped by higher
      // ambient load). The eager head() serializes the probe before the
      // main plan where the lazy 1-row total rides the final job's
      // broadcast. Restored verbatim per the measured-revert rule.
      val tot = rev.agg(sum(col("cents")).as("total"))
      GlobalOrder.withExclusivePrefixSum(
          rev.withColumn("_negc", col("cents") * -1),
          Seq(col("_negc"), col("l_partkey")), col("cents"), "cum0")
        .withColumn("cum", col("cum0") + col("cents"))
        .crossJoin(broadcast(tot))
        .withColumn("abc_class",
          when(col("cum") * 20 <= col("total") * 16, "A")
            .when(col("cum") * 20 <= col("total") * 19, "B")
            .otherwise("C"))
        .groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"),
          (floor(sum(col("cents")).cast("double") / max(col("total")) * 1e4 + 0.5) / 1e4)
            .as("rev_share"))
        .orderBy(col("abc_class"))
    }),

    // Trending top-k: the day's 3 most-active users per day. The rank≤3
    // filter plans Partial/Final WindowGroupLimit around the day exchange
    // (same pushdown as inverted_index), so no day's full leaderboard is
    // buffered; ties break on user_id for engine-independence.
    "trending_topk" -> ((s, dir) => {
      val d = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("d"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("d")).orderBy(col("n").desc, col("user_id"))
      d.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("d"), col("rank").cast(LongType).as("rank"), col("user_id"), col("n"))
        .orderBy(col("d"), col("rank"))
    }),

    // Seasonality-adjusted anomaly flags: subtract the per-(type, hour-of-
    // day) baseline mean before z-scoring, so a diurnal pattern doesn't
    // read as anomalies. Two map-side-combined aggregates (the types×24
    // baseline broadcasts back) + one residual pass — no window sort at
    // all, unlike ts_anomaly's rolling form.
    "ts_seasonal_adjust" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
        .withColumn("hod", hour(col("ts")))
      val base = ev.groupBy(col("event_type").as("bt"), col("hod").as("bh"))
        .agg(avg(col("value")).as("baseline"))
      val resid = ev.join(broadcast(base),
          col("event_type") === col("bt") && col("hod") === col("bh"))
        .withColumn("r", col("value") - col("baseline"))
      val sd = resid.groupBy(col("event_type").as("st"))
        .agg(stddev_pop(col("r")).as("sd"))
      resid.join(broadcast(sd), col("event_type") === col("st"))
        // NULL divisor under ANSI: double 0/0 throws in Spark 4's default
        // mode while DuckDB returns NULL — a zero-variance type degrades
        .withColumn("z", col("r") / when(col("sd") =!= 0, col("sd")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(max(abs(col("z"))), 4).as("max_abs_z"),
          count(when(abs(col("z")) > 3.0, 1)).as("n_flagged"))
        .orderBy(col("event_type"))
    }),

    // Inverted index build (retrieval infrastructure): term -> bounded
    // posting list. The rank<=5 filter plans Partial/Final WindowGroupLimit
    // around the term exchange, so no term's full posting list is ever
    // buffered or shuffled — the df count and the capped postings reuse the
    // same term-keyed exchange. Zipf heads stay bounded at any corpus size.
    "inverted_index" -> ((s, dir) => {
      val post = t(s, dir, "documents")
        .select(explode(TextFns.tokens(col("text"))).as("term"), col("doc_id"))
        .distinct()
      val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
      val top = post.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      val dfq = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      // postings ships as a comma-joined STRING, not ArrayType: the driver's
      // checker sorts result columns with pandas, which cannot hash ndarray
      // cells. Same information, hashable on both engines.
      top.groupBy(col("term"))
        .agg(concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"))
        .join(dfq, Seq("term"))
        .where(col("df") >= 10)
        .select(col("term"), col("df"), col("postings"))
        .orderBy(col("df").desc, col("term"))
        .limit(100)
    }),

    // Seasonality profile: activity and value by (ISO weekday, hour) grid —
    // the time-of-week fingerprint behind anomaly baselines and capacity
    // planning. One map-side-combined aggregate to a 7x24-bounded result.
    // Spark weekday() (0=Monday) mirrors DuckDB isodow-1 exactly.
    "seasonality_profile" -> ((s, dir) => {
      t(s, dir, "events")
        .where(col("ts").isNotNull)
        .groupBy(weekday(col("ts")).as("dow"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
        .orderBy(col("dow"), col("hr"))
    }),

    // RFM segmentation: recency/frequency/monetary quartiles per customer
    // from ONE orders aggregate (3 independent 4-way cuts => 64 possible
    // segments), then a segment-level rollup. The classic warehouse
    // cohorting op. Each cut is a DISTRIBUTED GlobalOrder.withNtile over
    // the checkpointed customer aggregate — the naive
    // ntile(4).over(Window.orderBy(...)) is a single task sorting the
    // whole customer dimension, three times, at any scale (round-10
    // verdict). Descending axes negate the lead key (the sampled range
    // bucket is monotone in the key as passed); the three per-axis tile
    // frames hash-join back on o_custkey.
    "rfm_segmentation" -> ((s, dir) => {
      import graft.operators.GlobalOrder
      val orders = t(s, dir, "orders")
      // corpus max date joins back as a broadcast scalar — no driver types
      val mx = orders.agg(max(col("o_orderdate")).as("md"))
      val rfm = orders
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice")).as("monetary"))
        .crossJoin(broadcast(mx))
        .withColumn("recency", datediff(col("md"), col("last_order")).cast(LongType))
        .localCheckpoint(false) // feeds 3 ntile passes + their probe jobs
      // ONE count probe (materializes the checkpoint as a side effect)
      // serves all three cuts' ntile+bucket builds — was 6 identical count
      // jobs (each withNtile counted once itself and once in its range
      // bucket; round 14)
      val nCust = rfm.count()
      // quartile 1 = best on every axis (most recent / most frequent /
      // highest spend); custkey tiebreaks make every cut deterministic
      def cut(lead: org.apache.spark.sql.Column, out: String) =
        GlobalOrder.withNtile(rfm.select(col("o_custkey"), lead.as("_lead")),
            Seq(col("_lead"), col("o_custkey")), 4, out,
            knownCount = Some(nCust))
          .select(col("o_custkey"), col(out))
      rfm.join(cut(col("recency"), "r_q"), "o_custkey")
        .join(cut(col("frequency") * -1, "f_q"), "o_custkey")
        .join(cut(col("monetary") * -1, "m_q"), "o_custkey")
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_customers"), round(sum(col("monetary")), 2).as("total_spend"))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))
    }),

    // Market-basket association mining with the two guards the naive
    // within-order self-join lacks at scale (round-8 verdict #3), both
    // PROBE-CONDITIONAL: on a benign distribution (this synthetic: every
    // item in ~30 orders, baskets <= 7) each guard prunes nothing and its
    // shuffles are pure overhead (measured +2.4 s at sf0.1), so two 1-row
    // probe aggregates over the cached item stream decide the plan — the
    // OUTPUT is identical on every path, only the join strategy varies
    // (same contract as the limit(max+1) cardinality guards elsewhere).
    //   1. APRIORI PREFILTER (when >=5% of items are below support) — a
    //      pair cannot reach support 3 unless BOTH items appear in >= 3
    //      orders, so the item frequency semi-joins the item stream
    //      BEFORE pair generation.
    //   2. ADAPTIVE SKEW SALT (when any basket exceeds 64 items) — one
    //      mega-basket otherwise lands |basket|^2 rows in a single join
    //      task. Each order's items carry S = ceil(n/64) chunks: the
    //      right side hashes each item into a chunk, the left side
    //      replicates each item across all S chunks, and the equi-join on
    //      (order, chunk) spreads a big basket's pairs over S tasks
    //      (~64·n rows each). Every unordered pair (a<b) matches exactly
    //      once — left=a at chunk(b), right=b in chunk(b).
    // Then lift = P(ab)/(P(a)P(b)) from the frequency joins. Top-25 by
    // rounded lift, pair-tiebroken.
    "basket_pairs" -> ((s, dir) => {
      // the distinct (order, part) stream feeds several consumers (freq,
      // the optional semi-join, both pair-join sides) — all inside ONE job,
      // where the identical distinct-exchange subtrees plan as
      // ReusedExchange, so no explicit persist is needed (measured: the
      // guarded plan runs within ~0.4 s of the unguarded one at sf0.1, the
      // probe job's cost)
      val raw = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val li = raw.distinct()
      // the order count rides the final job as a broadcast 1-row frame
      // (round 14) — the eager collect was a separate job before the plan
      // was even built; the lift arithmetic is unchanged (double × BIGINT
      // column promotes exactly like the old Long literal)
      val nOrders = broadcast(t(s, dir, "orders")
        .agg(count(lit(1)).as("n_orders")))
      val freq = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_p"))
      // ONE probe job over the RAW scan (grouping sets = both groupings in
      // one map-side-combined shuffle; a distinct-based probe would pay the
      // li exchange twice more in separate jobs — measured +2 s at sf0.1).
      // Raw counts upper-bound the distinct ones, so the decisions are
      // merely conservative: an item with <3 raw rows certainly has <3
      // orders (prune fires no later than it should), and raw basket size
      // >= distinct basket size (salt fires no earlier than needed... it
      // can fire when distinct size alone would not — harmless, the salted
      // plan is output-identical).
      val pr = raw
        .groupingSets(Seq(Seq(col("l_partkey")), Seq(col("l_orderkey"))),
          col("l_partkey"), col("l_orderkey"))
        .agg(count(lit(1)).as("n"), grouping(col("l_partkey")).as("gp"))
        .agg(max(when(col("gp") === 1, col("n"))).as("maxBn"),
          count(when(col("gp") === 0 && col("n") < 3, 1)).as("inelig"),
          count(when(col("gp") === 0, 1)).as("items"))
        .head()
      // empty lineitem: max aggregates to NULL — treat as no baskets
      val maxBn = if (pr.isNullAt(0)) 0L else pr.getLong(0)
      val pruneable = pr.getLong(1) * 20L >= pr.getLong(2)
      val kept =
        if (pruneable)
          li.join(freq.where(col("n_p") >= 3).select(col("l_partkey")),
            Seq("l_partkey"), "left_semi")
        else li
      val joined = withinGroupPairs(kept, salted = maxBn > 64)
      val pairs = joined
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 3)
      pairs
        .join(freq.select(col("l_partkey").as("pa"), col("n_p").as("n_a")), Seq("pa"))
        .join(freq.select(col("l_partkey").as("pb"), col("n_p").as("n_b")), Seq("pb"))
        .crossJoin(nOrders)
        .select(col("pa"), col("pb"), col("n_ab"),
          (floor(col("n_ab").cast(DoubleType) * col("n_orders") /
            (col("n_a") * col("n_b")) * 1e4 + 0.5) / 1e4).as("lift"))
        .orderBy(col("lift").desc, col("pa"), col("pb"))
        .limit(25)
    }),

    // Peak interval concurrency via SWEEP-LINE — the scalable form of the
    // interval-overlap self-join (overlap joins are quadratic inside an
    // overlap cluster; the sweep is one aggregate + one window over
    // date-bounded delta rows, linear at any overlap density): each
    // lineitem is "in flight" from its order date to its ship date
    // (inclusive; the synthetic data ships ~half its lines before the
    // order date — those invalid intervals are filtered identically in
    // both engines), and the card reports each supplier's peak number of
    // simultaneously in-flight lineitems and the FIRST date the peak is
    // reached. Same-day ties never depend on row order: +1/−1 deltas
    // aggregate per (supplier, day) BEFORE the running sum.
    "interval_peak" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), to_date(col("l_shipdate")).as("d1"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d0"))
      val iv = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .where(col("d1") >= col("d0"))
        .select(col("l_suppkey").as("sk"), col("d0"), col("d1"))
      // one explode, not a union: a union's two branches would each
      // recompute the lineitem⋈orders join
      val deltas = iv
        .select(col("sk"), explode(array(
          struct(col("d0").as("d"), lit(1L).as("delta")),
          struct(date_add(col("d1"), 1).as("d"), lit(-1L).as("delta")))).as("ev"))
        .groupBy(col("sk"), col("ev.d").as("d"))
        .agg(sum(col("ev.delta")).as("dsum"))
      val w = Window.partitionBy(col("sk")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val run = deltas.withColumn("cur", sum(col("dsum")).over(w))
        .withColumn("peak", max(col("cur")).over(Window.partitionBy(col("sk"))))
      run.where(col("cur") === col("peak"))
        .groupBy(col("sk"), col("peak"))
        .agg(min(col("d")).as("peak_date"))
        .select(col("sk").as("s_suppkey"), col("peak").as("peak_inflight"),
          col("peak_date"))
        .orderBy(col("s_suppkey"))
    }),

    // First-order Markov transition matrix over per-user event sequences:
    // lead pairs (cur -> next) from ONE user_id window sort, then a
    // types²-bounded aggregate; transition probabilities come from a window
    // sum over the tiny matrix (no second scan of events). The
    // sequence-mining shape behind session modeling and bot detection.
    "markov_transitions" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = ev
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      pairs
        .withColumn("p", floor(col("n") /
          sum(col("n")).over(Window.partitionBy(col("from_type"))) * 1e6 + 0.5) / 1e6)
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Two-sample A/B z-test per event type (variant = deterministic user-id
    // parity — the hash-bucketed assignment an experimentation system uses):
    // Welch z on the value means. ONE conditional aggregate computes both
    // arms — no self-join, no second scan; the per-type result is
    // config-sized at any corpus scale.
    // Sample-ratio-mismatch guard (the FIRST check any A/B readout runs:
    // a biased assignment invalidates every downstream metric before
    // means are even compared): per event type, χ² of the observed
    // variant split vs the designed 50/50 — for two equal-share cells the
    // statistic collapses to (n_a−n_b)²/n, an exact BIGINT numerator with
    // ONE division, micro-rounded. Flag at the 95% χ²₁ critical value.
    // One conditional aggregate to the types domain; same parity-variant
    // convention as ab_ztest.
    "ab_srm" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("event_type").isNotNull)
        .withColumn("isA", col("user_id") % 2 === 0)
      ev.groupBy(col("event_type"))
        .agg(count(when(col("isA"), 1)).as("n_a"),
          count(when(!col("isA"), 1)).as("n_b"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          (floor(((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
            .cast(DoubleType) / (col("n_a") + col("n_b")) * 1e6 + 0.5) / 1e6)
            .as("chi2"))
        .withColumn("srm", col("chi2") > 3.841459)
        .orderBy(col("event_type"))
    }),

    // Late-data audit — the watermark-sizing measurement a streaming
    // deployment takes BEFORE choosing its withWatermark delay: each
    // event's lateness is the running-max event time among its type's
    // earlier ARRIVALS minus its own event time (strictly preceding
    // frame — an event is not late against itself). The synthetic events
    // table is ts-ordered, so a deterministic bounded-disorder arrival
    // log is simulated: arrivals shuffle by md5 WITHIN 3-hour event-time
    // buckets (the global_shuffle idiom) — mostly-ordered ingest with
    // bounded skew, so both the late counter and the 1-hour-drop counter
    // carry signal; in production the real ingest sequence replaces the
    // simulated key. Exact integer-µs math end to end; one window sort
    // per type (the ts_anomaly shape) — no global ordering anywhere.
    "late_data_audit" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("ts").isNotNull && col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tsus"))
        .withColumn("bucket", expr("tsus DIV 10800000000"))
        .withColumn("akey", md5(concat(lit("late:"), col("event_id").cast("string"))))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("bucket"), col("akey"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("wm", max(col("tsus")).over(w))
        .withColumn("late_us",
          when(col("wm").isNull || col("wm") <= col("tsus"), 0L)
            .otherwise(col("wm") - col("tsus")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
          sum(when(col("late_us") > 3600L * 1000000L, 1L).otherwise(0L))
            .as("n_dropped_1h"),
          expr("CAST(max(late_us) DIV 1000000 AS BIGINT)").as("max_late_s"),
          round(sum(when(col("late_us") > 0, 1L).otherwise(0L))
            .cast(DoubleType) / count(lit(1)), 6).as("late_rate"))
        .orderBy(col("event_type"))
    }),

    "ab_ztest" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("value").isNotNull && col("event_type").isNotNull &&
          col("user_id").isNotNull)
        .withColumn("isA", col("user_id") % 2 === 0)
      ev.groupBy(col("event_type"))
        .agg(
          count(when(col("isA"), 1)).as("n_a"),
          count(when(!col("isA"), 1)).as("n_b"),
          round(avg(when(col("isA"), col("value"))), 4).as("mean_a"),
          round(avg(when(!col("isA"), col("value"))), 4).as("mean_b"),
          round((avg(when(col("isA"), col("value"))) -
              avg(when(!col("isA"), col("value")))) /
            // NULL divisor under ANSI: two constant-valued arms make the
            // standard error exactly 0 — x/0 throws in Spark's default
            // ANSI mode while DuckDB returns NULL
            when(sqrt(var_samp(when(col("isA"), col("value"))) / count(when(col("isA"), 1)) +
              var_samp(when(!col("isA"), col("value"))) / count(when(!col("isA"), 1))) > 0,
              sqrt(var_samp(when(col("isA"), col("value"))) / count(when(col("isA"), 1)) +
                var_samp(when(!col("isA"), col("value"))) / count(when(!col("isA"), 1)))), 4)
            .as("z"))
        .orderBy(col("event_type"))
    }),

    // Benjamini–Hochberg FDR correction (Benjamini & Hochberg 1995 — the
    // multiple-comparisons gate for a DASHBOARD of tests: five per-type
    // z-tests at α=.05 expect a false positive every fourth refresh;
    // BH bounds the false-discovery RATE instead of Bonferroni's
    // family-wise overkill). Consumes ab_ztest's card VERBATIM (one
    // definition — the readout and its correction cannot drift); p-values
    // come from the Abramowitz–Stegun 26.2.17 normal-tail polynomial in
    // SHARED formula text (exp + multiply only — no erf in either
    // engine), micro-rounded to 1e-6; the BH step-up p₍ₖ₎ ≤ α·k/m runs as
    // the EXACT integer comparison p6·20·m ≤ k·1e6, so the reject set has
    // no floating tie. Windows run on the types-bounded card, never the
    // corpus.
    "fdr_bh" -> ((s, dir) => {
      val base = queries("ab_ztest")(s, dir).select(col("event_type"), col("z"))
        .where(col("z").isNotNull)
        .withColumn("az", abs(col("z")))
        .withColumn("tq", expr(FdrTSql))
        .withColumn("p6", expr(FdrP6Sql))
      val w = Window.orderBy(col("p6"), col("event_type"))
      val wAll = Window.partitionBy()
      base.withColumn("bh_rank", row_number().over(w).cast(LongType))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("kstar",
          max(when(col("p6") * 20 * col("m") <= col("bh_rank") * lit(1000000L),
            col("bh_rank"))).over(wAll))
        .select(col("event_type"), col("z"),
          (col("p6").cast(DoubleType) / 1e6).as("p_value"),
          col("bh_rank"),
          expr("floor(CAST(bh_rank AS DOUBLE) / (20e0 * m) * 1e6 + 0.5) / 1e6")
            .as("bh_crit"),
          (col("bh_rank") <= coalesce(col("kstar"), lit(0L))).as("rejected"))
        .orderBy(col("event_type"))
    }),

    // PMI collocations: pointwise mutual information over adjacent token
    // pairs — phrase/tokenizer-merge mining. Bigrams stream from the native
    // ShingleGenerator (no intermediate arrays); unigram joins are
    // equi-shuffles on the word key (Zipf-head broadcast is the documented
    // scale variant, cf. rare_token_ratio). Selection orders by the ROUNDED
    // score with a bigram tiebreak so the top-50 cut is engine-stable.
    "pmi_collocations" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val big = docs.select(TextFns.shingleExplode(TextFns.tokens(col("text")), 2).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("n12"))
        .where(col("n12") >= 5)
      val uni = docs.select(explode(TextFns.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val nTok = uni.agg(sum(col("c")).cast(DoubleType).as("n"))
      big.withColumn("w1", substring_index(col("bg"), " ", 1))
        .withColumn("w2", substring_index(col("bg"), " ", -1))
        .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(nTok))
        .select(col("bg"), col("n12"),
          round(log(col("n12").cast(DoubleType) * col("n") /
            (col("c1").cast(DoubleType) * col("c2").cast(DoubleType))), 4).as("pmi"))
        .orderBy(col("pmi").desc, col("bg").asc)
        .limit(50)
    }))

  /** Unrolled-CTE oracle for the 5 synchronous LPA rounds (the
    * graph_pagerank precedent): each round re-labels every node by its
    * weighted-majority neighbor label with the row_number tie mirror of the
    * Spark side's (Σw DESC, label ASC) argmax. The corpus-sized subtrees
    * are MATERIALIZED — DuckDB otherwise inlines the 4-table join into
    * every one of the ~11 sp/r references and OOMs at sf0.1 (caught by the
    * 3-SF sweep). */
  /** Shared corpus→graph collapse CTEs (ends at the sparsified symmetric
    * edge list `sp`): region-affinity-boosted weighted undirected nation
    * trade edges, kept by the strict above-average rule w·|E| > Σw. Used
    * by graph_communities (via [[lpaBaseSql]]), graph_link_predict, and
    * graph_shortest_paths so the three views share ONE graph definition. */
  /** er_cluster / golden_record's shared transitive-closure oracle prefix
    * (ONE text — the entity definition cannot drift between the size card
    * and the survivorship merge): the dirty universe, the blocked scored
    * match edges, and the recursive min-label closure `lab(id, component)`.
    * Corpus-sized CTEs are MATERIALIZED (DuckDB inlines plain CTEs per
    * reference — the graph_communities OOM lesson). */
  private val erClosureSql =
    """WITH RECURSIVE dirty AS MATERIALIZED (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
      |  UNION ALL
      |  SELECT c_custkey + 500000, 'K' || substring(c_name, 2), c_nationkey,
      |    c_acctbal + 0.37, c_mktsegment FROM customer),
      |blocked AS MATERIALIZED (SELECT *, CAST(floor(c_acctbal / 100.0) AS BIGINT) AS blk
      |  FROM dirty),
      |edges AS MATERIALIZED (
      |  SELECT a.c_custkey AS u, b.c_custkey AS v
      |  FROM blocked a JOIN blocked b
      |    ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
      |    AND a.c_custkey < b.c_custkey
      |  WHERE CAST(CASE WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 30 ELSE -10 END
      |      + CASE WHEN abs(a.c_acctbal - b.c_acctbal) < 1.0 THEN 15 ELSE -5 END
      |      + CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 10 ELSE -8 END AS BIGINT) >= 45),
      |bidir AS MATERIALIZED (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
      |reach(src, dst) AS (
      |  SELECT c_custkey, c_custkey FROM dirty
      |  UNION
      |  SELECT r.src, b.v FROM reach r JOIN bidir b ON r.dst = b.u),
      |lab AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src)""".stripMargin

  /** fdr_bh's shared normal-tail text (Abramowitz–Stegun 26.2.17, |ε| <
    * 7.5e-8 — far inside the 1e-6 micro-round): tq = 1/(1+0.2316419·|z|),
    * then p = 2·φ(|z|)·Σbᵢtqⁱ with the powers written as explicit product
    * trees so both engines fold the identical IEEE shape; 1/√(2π) appears
    * as a literal (no sqrt call). */
  private val FdrTSql = "1e0 / (1e0 + 0.2316419e0 * az)"
  private val FdrP6Sql =
    "CAST(floor(2e0 * (exp(-az * az / 2e0) * 0.3989422804014327e0 * " +
      "(0.319381530e0 * tq - 0.356563782e0 * (tq * tq) + 1.781477937e0 * (tq * tq * tq) " +
      "- 1.821255978e0 * ((tq * tq) * (tq * tq)) + 1.330274429e0 * ((tq * tq) * ((tq * tq) * tq)))) " +
      "* 1e6 + 0.5) AS BIGINT)"

  /** dp_histogram's shared Laplace inverse-CDF text — identical IEEE tree
    * in both engines over the 24-bit md5 integer `h`: u = (h+0.5)/2²⁴ is
    * strictly inside (0,1) and never exactly 0.5, so the sign CASE and
    * ln(1−2|u−0.5|) are both well-defined; the result micro-rounds to
    * 1e-4 so a last-ulp libm ln() disagreement cannot flip the compare. */
  private val DpNoiseSql =
    "floor(-(CASE WHEN (CAST(h AS DOUBLE) + 0.5e0) / 16777216e0 >= 0.5e0 THEN 1e0 ELSE -1e0 END) " +
      "* ln(1e0 - 2e0 * abs((CAST(h AS DOUBLE) + 0.5e0) / 16777216e0 - 0.5e0)) * 1e4 + 0.5) / 1e4"

  private val nationGraphSql =
    """WITH raw0 AS MATERIALIZED (
      |  SELECT CAST(s_nationkey AS BIGINT) AS src, CAST(c_nationkey AS BIGINT) AS dst,
      |    CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem
      |    JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN orders ON l_orderkey = o_orderkey
      |    JOIN customer ON o_custkey = c_custkey
      |  WHERE s_nationkey <> c_nationkey
      |  GROUP BY 1, 2),
      |ed0 AS MATERIALIZED (
      |  SELECT src, dst,
      |    w * CASE WHEN ra.n_regionkey = rb.n_regionkey THEN 5 ELSE 1 END AS w
      |  FROM raw0
      |    JOIN nation ra ON src = ra.n_nationkey
      |    JOIN nation rb ON dst = rb.n_nationkey),
      |und AS MATERIALIZED (SELECT a, b, CAST(sum(w) AS BIGINT) AS w FROM (
      |    SELECT src AS a, dst AS b, w FROM ed0
      |    UNION ALL SELECT dst AS a, src AS b, w FROM ed0) GROUP BY 1, 2),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS ne, CAST(sum(w) AS BIGINT) AS tw FROM und),
      |sp AS MATERIALIZED (SELECT a, b, w FROM und CROSS JOIN tot WHERE w * ne > tw)""".stripMargin

  private val lpaBaseSql = nationGraphSql +
    """,
      |nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation),
      |r0 AS (SELECT node, node AS label FROM nodes)""".stripMargin

  /** The Spark twin of [[nationGraphSql]]'s `sp`: symmetric (a, b, w)
    * sparsified edges, computed distributedly — broadcast dims around ONE
    * orderkey-shuffled fact⋈fact join, then nations²-bounded aggregates. */
  private def sparsifiedNationGraph(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val supp = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").cast(LongType).as("src"))
    val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast(LongType).as("dst"))
    val nat = t(s, dir, "nation")
      .select(col("n_nationkey").cast(LongType).as("nk"),
        col("n_regionkey").cast(LongType).as("rk"))
    val raw = li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .where(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w0"))
    val boosted = raw
      .join(broadcast(nat.select(col("nk").as("src"), col("rk").as("r_src"))), Seq("src"))
      .join(broadcast(nat.select(col("nk").as("dst"), col("rk").as("r_dst"))), Seq("dst"))
      .select(col("src"), col("dst"),
        (col("w0") * when(col("r_src") === col("r_dst"), 5L).otherwise(1L)).as("w"))
    val und = boosted.select(col("src").as("a"), col("dst").as("b"), col("w"))
      .unionByName(boosted.select(col("dst").as("a"), col("src").as("b"), col("w")))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
    val tot = und.agg(count(lit(1)).as("ne"), sum(col("w")).as("tw"))
    und.crossJoin(broadcast(tot)).where(col("w") * col("ne") > col("tw"))
      .select(col("a"), col("b"), col("w"))
  }

  private def lpaRoundSql(k: Int): String =
    s""",
       |r$k AS (
       |  SELECT p.node, coalesce(b.best, p.label) AS label
       |  FROM r${k - 1} p LEFT JOIN (
       |    SELECT a AS node2, label AS best FROM (
       |      SELECT sp.a, p2.label, sum(sp.w) AS sw,
       |        row_number() OVER (PARTITION BY sp.a
       |          ORDER BY sum(sp.w) DESC, p2.label) AS rn
       |      FROM sp JOIN r${k - 1} p2 ON sp.b = p2.node
       |      GROUP BY sp.a, p2.label)
       |    WHERE rn = 1) b ON p.node = b.node2)""".stripMargin

  /** The user×user temporal-successor graph shared by
    * graph_pagerank_users / graph_lpa_users: within each (event_type,
    * hour) bucket ordered by (ts, event_id), an edge from each event's
    * user to the NEXT event's user — ONE window sort, edge count linear
    * in events at any scale (bucket co-occurrence PAIRS would grow
    * quadratically with per-bucket density). Returns (edges (src, dst,
    * w), nodes (id)); node domain = distinct users, grows with SF.
    *
    * Both frames are persisted via CacheRegistry.track HERE (round 10):
    * three queries share this construction (PageRank / LPA / BFS), and
    * Spark's CacheManager keys cache entries by canonicalized plan, so the
    * one registered persist serves all three in a full Verify/Bench
    * session — the events window sort runs once, not three times. */
  private def successorGraph(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val ev = t(s, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val win = Window.partitionBy(col("event_type"), col("hb"))
      .orderBy(col("us"), col("event_id"))
    // FLOOR division (pmod-based, exact at any magnitude): Spark DIV
    // truncates toward zero while the oracle's DuckDB `//` floors — they
    // diverge on pre-epoch micros (the growth_accounting/ab_sequential
    // lesson applied here before it can bite a regenerated calendar)
    val e0 = ev.withColumn("hb",
        expr("(us - pmod(us, 3600000000L)) DIV 3600000000"))
      .withColumn("nxt", lead(col("user_id"), 1).over(win))
      .where(col("nxt").isNotNull && col("nxt") =!= col("user_id"))
      .groupBy(col("user_id").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("w"))
      // persist PRE-PARTITIONED on src (guide §2.4: establish the
      // partitioning once, reuse it every round): PageRank/PPR's
      // out-weight window re-uses it without its own exchange, and the
      // per-round frontier/contribution joins on src read a co-partitioned
      // cached side instead of re-exchanging the edge list each round —
      // at 100 TB that is 5 corpus shuffles saved per card. The explicit
      // partition count comes from the session conf (scale-adaptive), not
      // a constant, and pins the layout against AQE renumbering.
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("src"))
    (graft.operators.CacheRegistry.track(e0),
      graft.operators.CacheRegistry.track(ev.select(col("user_id").as("id")).distinct()))
  }

  /** Exact unordered within-group pairs over (l_orderkey, l_partkey) rows →
    * (ok, pa, pb) with pa < pb, each pair exactly once.
    *
    * plain: the co-partitioned group-key self-join — one task per group,
    * |group|² rows in it (fine while groups are small).
    *
    * salted: adaptive chunk salt for outlier groups. Each group of size n
    * carries S = ceil(n/chunk) chunks; the right side hashes each item into
    * a chunk, the left side replicates each item across all S chunks, and
    * the equi-join on (group, chunk) spreads a big group's pairs over S
    * tasks (~chunk·n rows each). Pair (a<b) matches exactly once — left=a
    * at chunk(b), right=b in chunk(b) — so salted ≡ plain row-for-row
    * (spec-pinned in AnalyticsSpec on a mega-group); for n <= chunk, S=1
    * and the plan degenerates to the plain join with one extra window. */
  private[graft] def withinGroupPairs(kept: org.apache.spark.sql.DataFrame,
      salted: Boolean, chunk: Int = 64): org.apache.spark.sql.DataFrame =
    if (!salted) {
      kept.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
        .join(kept.select(col("l_orderkey").as("ok2"), col("l_partkey").as("pb")),
          col("ok") === col("ok2") && col("pa") < col("pb"))
        .select(col("ok"), col("pa"), col("pb"))
    } else {
      val sized = kept.withColumn("bn",
          count(lit(1)).over(Window.partitionBy(col("l_orderkey"))))
        .withColumn("S", expr(s"(bn + ${chunk - 1}) DIV $chunk"))
      val left = sized
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"), col("S"))
        .withColumn("g", explode(sequence(lit(0L), col("S") - 1)))
      val right = sized.select(col("l_orderkey").as("ok2"),
        col("l_partkey").as("pb"), pmod(xxhash64(col("l_partkey")), col("S")).as("c"))
      left.join(right, col("ok") === col("ok2") && col("g") === col("c") &&
          col("pa") < col("pb"))
        .select(col("ok"), col("pa"), col("pb"))
    }

  /** er_linkage / er_cluster's shared construction (ONE definition so the
    * scoring and the clustering views cannot drift): the dirty universe
    * (customers + planted K-variants at +500000) and the Fellegi–Sunter
    * scored candidate pairs from the (nation, acctbal-band) blocked join.
    * Returns (dirty, scored(id_a, id_b, score)). */
  /** The ER comparison-vector construction er_linkage/er_cluster score and
    * er_em_weights learns from — ONE blocked pair join emitting the three
    * binary agreement fields (name-within-1-edit, balance-within-1,
    * segment-equal), so the deterministic score and the EM model can never
    * see different comparisons. Returns (dirty, (id_a, id_b, g1, g2, g3)). */
  private def erComparisonPairs(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val cust = t(s, dir, "customer")
    val variants = cust.select(
      (col("c_custkey") + 500000L).as("c_custkey"),
      concat(lit("K"), expr("substring(c_name, 2)")).as("c_name"),
      col("c_nationkey"),
      (col("c_acctbal") + 0.37).as("c_acctbal"),
      col("c_mktsegment"))
    val dirty = cust.unionByName(variants)
      .withColumn("blk", expr("CAST(floor(c_acctbal / 100.0) AS BIGINT)"))
    val a = dirty.as("a"); val b = dirty.as("b")
    val pairs = a.join(b,
        col("a.c_nationkey") === col("b.c_nationkey") &&
          col("a.blk") === col("b.blk") &&
          col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("id_a"), col("b.c_custkey").as("id_b"),
        (levenshtein(col("a.c_name"), col("b.c_name")) <= 1).as("g1"),
        (abs(col("a.c_acctbal") - col("b.c_acctbal")) < 1.0).as("g2"),
        (col("a.c_mktsegment") === col("b.c_mktsegment")).as("g3"))
    // session-persisted (round 14): FIVE cards (er_linkage / er_em_weights /
    // er_cluster / er_dedupe_apply / golden_record) consume this identical
    // blocked join — CacheManager keys by canonicalized plan, so one track
    // makes every card reuse the levenshtein pair scan instead of re-paying
    // it per card (the successorGraph precedent).
    (dirty, graft.operators.CacheRegistry.track(pairs))
  }

  /** The ER match-entity labels er_cluster AND golden_record both consume:
    * ONE session-memoized CC fixpoint over the match edges (round 14 — CC
    * materializes internal checkpoints, so plan-level cache dedup can never
    * share it; each card re-ran the whole star-contraction job train).
    * components() is deterministic, so sharing is value-identical. Keyed by
    * (session, dir): concurrent sf0.01/sf0.1 sessions never mix, and the
    * memo dies with the JVM — no cross-run state. Cleared on
    * CacheRegistry.sweep() (round-14 ADVICE): the memo'd frame is tracked,
    * so after a sweep unpersists it the memo would otherwise keep serving
    * the unpersisted plan (re-running CC per consumer) and pin the
    * SparkSession reference for JVM lifetime. */
  private val erLabelsMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]()
  graft.operators.CacheRegistry.onSweep(() => erLabelsMemo.clear())
  private def erMatchLabels(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    erLabelsMemo.computeIfAbsent((s, dir), { _ =>
      import graft.operators.ConnectedComponents
      val (dirty, scored) = erScoredPairs(s, dir)
      val edges = scored.where(col("score") >= 45L)
        .select(col("id_a"), col("id_b"))
      graft.operators.CacheRegistry.track(
        ConnectedComponents.components(edges, dirty.select(col("c_custkey"))))
    })

  private def erScoredPairs(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val (dirty, pairs) = erComparisonPairs(s, dir)
    val scored = pairs.select(col("id_a"), col("id_b"),
      (when(col("g1"), 30L).otherwise(-10L) +
        when(col("g2"), 15L).otherwise(-5L) +
        when(col("g3"), 10L).otherwise(-8L)).as("score"))
    (dirty, scored)
  }

  /** graph_hits' unrolled-recurrence twin (graph_pagerank precedent,
    * loop-generated instead of hand-unrolled): per round, authorities =
    * in-edge-weighted sums of the previous hubs then L1-normalize, hubs =
    * out-edge-weighted sums of the new authorities then L1-normalize.
    * Round 9: the whole recurrence runs in EXACT fixed-point integers —
    * scores h12/a12 in 1e-12 units, contributions and the (v·1e12)//t
    * normalization in HUGEINT (mirrored by the driver fold in BigInt) — so
    * the unordered SQL sums commute and no micro-rounding boundary can
    * flip between engines. */
  private val graphHitsOracle: String = {
    val rounds = (1 to 5).map { r =>
      val hp = if (r == 1) "h0" else s"h${r - 1}"
      s"""a${r}v AS (SELECT b.nation,
         |    COALESCE(sum(CAST(e.w AS HUGEINT) * p.h12), 0) AS v
         |  FROM $hp b LEFT JOIN e ON e.dst = b.nation
         |  LEFT JOIN $hp p ON p.nation = e.src
         |  GROUP BY b.nation),
         |a${r}t AS (SELECT sum(v) AS t FROM a${r}v),
         |a$r AS MATERIALIZED (SELECT nation, CAST(CASE WHEN t = 0 THEN 0
         |    ELSE (v * 1000000000000) // t END AS BIGINT) AS a12
         |  FROM a${r}v CROSS JOIN a${r}t),
         |h${r}v AS (SELECT b.nation,
         |    COALESCE(sum(CAST(e.w AS HUGEINT) * p.a12), 0) AS v
         |  FROM a$r b LEFT JOIN e ON e.src = b.nation
         |  LEFT JOIN a$r p ON p.nation = e.dst
         |  GROUP BY b.nation),
         |h${r}t AS (SELECT sum(v) AS t FROM h${r}v),
         |h$r AS MATERIALIZED (SELECT nation, CAST(CASE WHEN t = 0 THEN 0
         |    ELSE (v * 1000000000000) // t END AS BIGINT) AS h12
         |  FROM h${r}v CROSS JOIN h${r}t)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT CAST(s.s_nationkey AS BIGINT) AS src,
       |    CAST(c.c_nationkey AS BIGINT) AS dst, CAST(count(*) AS BIGINT) AS w
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  GROUP BY 1, 2),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nation),
       |h0 AS MATERIALIZED (SELECT CAST(n_nationkey AS BIGINT) AS nation,
       |    CAST(1000000000000 // nn.n AS BIGINT) AS h12
       |  FROM nation CROSS JOIN nn),
       |$rounds
       |SELECT nation, h12 / 1e12 AS hub, a12 / 1e12 AS authority
       |FROM h5 JOIN a5 USING (nation) ORDER BY nation""".stripMargin
  }

  /** graph_lpa_users' unrolled twin: 5 loop-generated synchronous LPA
    * rounds over the symmetrized successor graph — neighbor-weight argmax
    * per node with (ws DESC, label ASC) determinism; all arithmetic is
    * integer edge weights, so the compare is bit-exact with zero
    * quantization. Each round's label table is referenced twice by the
    * next (votes + carry-forward) → AS MATERIALIZED throughout. */
  private val lpaUsersOracle: String = {
    val rounds = (1 to 5).map { i =>
      val pv = s"l${i - 1}"
      s"""v$i AS (SELECT e.a, p.lbl AS cl, CAST(sum(e.w) AS BIGINT) AS ws
         |  FROM e JOIN $pv p ON p.id = e.b GROUP BY 1, 2),
         |pk$i AS (SELECT a AS id, cl AS nl FROM (
         |  SELECT a, cl, row_number() OVER (PARTITION BY a
         |    ORDER BY ws DESC, cl) AS rn FROM v$i) WHERE rn = 1),
         |l$i AS MATERIALIZED (SELECT n.id, coalesce(pk$i.nl, lp.lbl) AS lbl
         |  FROM nodes n JOIN $pv lp USING (id) LEFT JOIN pk$i USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |    AND event_type IS NOT NULL),
       |sq AS (SELECT user_id,
       |    lead(user_id) OVER (PARTITION BY event_type, us // 3600000000
       |      ORDER BY us, event_id) AS nxt
       |  FROM ev),
       |e0 AS MATERIALIZED (SELECT user_id AS src, nxt AS dst,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM sq WHERE nxt IS NOT NULL AND nxt <> user_id GROUP BY 1, 2),
       |e AS MATERIALIZED (SELECT a, b, CAST(sum(w) AS BIGINT) AS w FROM (
       |    SELECT src AS a, dst AS b, w FROM e0
       |    UNION ALL SELECT dst AS a, src AS b, w FROM e0) GROUP BY 1, 2
       |  HAVING CAST(sum(w) AS BIGINT) >= 2),
       |nodes AS MATERIALIZED (SELECT DISTINCT user_id AS id FROM ev),
       |l0 AS MATERIALIZED (SELECT id, id AS lbl FROM nodes),
       |$rounds
       |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(sum(id) AS BIGINT) AS member_id_sum
       |FROM l5 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** graph_bfs_users' unrolled twin: 5 loop-generated synchronous frontier
    * rounds over the directed successor graph — frontier⋈edges minus the
    * settled set, then the per-distance card plus the dist = −1 unreached
    * remainder. Pure integer set algebra, nothing to quantize; every
    * round's tables are referenced twice (expand + carry) → AS MATERIALIZED
    * throughout. NOT IN is safe here: ids are non-null by construction. */
  private val bfsUsersOracle: String = {
    val rounds = (1 to 5).map { i =>
      val pf = s"f${i - 1}"; val pd = s"d${i - 1}"
      s"""f$i AS MATERIALIZED (SELECT DISTINCT e.dst AS id
         |  FROM e JOIN $pf p ON e.src = p.id
         |  WHERE e.dst NOT IN (SELECT id FROM $pd)),
         |d$i AS MATERIALIZED (SELECT id, dist FROM $pd
         |  UNION ALL SELECT id, CAST($i AS BIGINT) AS dist FROM f$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |    AND event_type IS NOT NULL),
       |sq AS (SELECT user_id,
       |    lead(user_id) OVER (PARTITION BY event_type, us // 3600000000
       |      ORDER BY us, event_id) AS nxt
       |  FROM ev),
       |e AS MATERIALIZED (SELECT DISTINCT user_id AS src, nxt AS dst
       |  FROM sq WHERE nxt IS NOT NULL AND nxt <> user_id),
       |nodes AS MATERIALIZED (SELECT DISTINCT user_id AS id FROM ev),
       |d0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS dist FROM nodes
       |  WHERE id % 25 = 0),
       |f0 AS (SELECT id FROM d0),
       |$rounds
       |SELECT dist, CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(sum(id) AS BIGINT) AS user_id_sum
       |FROM d5 GROUP BY 1
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(coalesce(sum(id), 0) AS BIGINT) AS user_id_sum
       |FROM nodes WHERE id NOT IN (SELECT id FROM d5)
       |ORDER BY dist""".stripMargin
  }

  /** graph_ppr_users' unrolled twin — pagerankUsersOracle with the seed
    * indicator gating both mass sources: baseS = 1e12 // nSeeds, r0 = baseS
    * on seeds only, and each round's teleport + dangling redistribution
    * applies CASE WHEN seed. Same exact fixed-point integers throughout. */
  private val pprUsersOracle: String = {
    val rounds = (1 to 5).map { i =>
      val pv = s"r${i - 1}"
      s"""d$i AS (SELECT CAST(coalesce(sum(r12), 0) AS BIGINT) AS d12 FROM $pv
         |  WHERE id NOT IN (SELECT src FROM e)),
         |i$i AS (SELECT e.dst AS id,
         |    CAST(sum((p.r12 * e.p6) // 1000000) AS BIGINT) AS in12
         |  FROM e JOIN $pv p ON p.id = e.src GROUP BY 1),
         |r$i AS MATERIALIZED (SELECT nd.id,
         |    CAST((CASE WHEN nd.id % 25 = 0 THEN (15 * nn.baseS) // 100 ELSE 0 END)
         |      + (85 * (coalesce(i$i.in12, 0)
         |          + (CASE WHEN nd.id % 25 = 0 THEN d$i.d12 // nn.ns ELSE 0 END))) // 100
         |      AS BIGINT) AS r12
         |  FROM nodes nd CROSS JOIN nn CROSS JOIN d$i
         |  LEFT JOIN i$i ON i$i.id = nd.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |    AND event_type IS NOT NULL),
       |sq AS (SELECT user_id,
       |    lead(user_id) OVER (PARTITION BY event_type, us // 3600000000
       |      ORDER BY us, event_id) AS nxt
       |  FROM ev),
       |e0 AS MATERIALIZED (SELECT user_id AS src, nxt AS dst,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM sq WHERE nxt IS NOT NULL AND nxt <> user_id GROUP BY 1, 2),
       |wo AS (SELECT src, CAST(sum(w) AS BIGINT) AS wo FROM e0 GROUP BY 1),
       |e AS MATERIALIZED (SELECT e0.src, e0.dst,
       |    CAST((e0.w * 1000000) // wo.wo AS BIGINT) AS p6
       |  FROM e0 JOIN wo USING (src)),
       |nodes AS MATERIALIZED (SELECT DISTINCT user_id AS id FROM ev),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS ns,
       |    CAST(1000000000000 // count(*) AS BIGINT) AS baseS
       |  FROM nodes WHERE id % 25 = 0),
       |r0 AS MATERIALIZED (SELECT id,
       |    CASE WHEN id % 25 = 0 THEN nn.baseS ELSE CAST(0 AS BIGINT) END AS r12
       |  FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT id AS user_id, r12 AS score12,
       |  CAST(row_number() OVER (ORDER BY r12 DESC, id) AS BIGINT) AS rnk
       |FROM r5 ORDER BY rnk LIMIT 100""".stripMargin
  }

  /** graph_densest_users' unrolled twin: 5 loop-generated batched-peel
    * rounds (Bahmani et al.'s (2+ε)·E/V threshold as the exact integer
    * (m2·11) // (n·10)) — pure integer set algebra + integer division,
    * nothing to quantize; round CTEs are referenced multiple times
    * (threshold, removal, carry) → AS MATERIALIZED throughout. NOT IN is
    * safe: ids are non-null by construction. */
  private val densestUsersOracle: String = {
    val rounds = (1 to 5).map { i =>
      val p = i - 1
      s"""thr$i AS (SELECT CAST((m2 * 11) // (greatest(n, 1) * 10) AS BIGINT) AS thr
         |  FROM st$p),
         |deg$i AS (SELECT a AS id, count(*) AS d FROM eg$p GROUP BY 1),
         |rm$i AS MATERIALIZED (SELECT v.id FROM v$p v
         |  LEFT JOIN deg$i d ON d.id = v.id CROSS JOIN thr$i t
         |  WHERE coalesce(d.d, 0) < t.thr),
         |v$i AS MATERIALIZED (SELECT id FROM v$p
         |  WHERE id NOT IN (SELECT id FROM rm$i)),
         |eg$i AS MATERIALIZED (SELECT a, b FROM eg$p
         |  WHERE a NOT IN (SELECT id FROM rm$i)
         |    AND b NOT IN (SELECT id FROM rm$i)),
         |st$i AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM eg$i) AS m2,
         |  (SELECT CAST(count(*) AS BIGINT) FROM v$i) AS n),
         |card$i AS (SELECT CAST($i AS BIGINT) AS round, t.thr,
         |  (SELECT CAST(count(*) AS BIGINT) FROM rm$i) AS n_removed,
         |  s.n AS n_remaining, CAST(s.m2 // 2 AS BIGINT) AS n_edges,
         |  CAST((s.m2 * 500000) // greatest(s.n, 1) AS BIGINT) AS density6
         |  FROM st$i s CROSS JOIN thr$i t)""".stripMargin
    }.mkString(",\n")
    val finals = (1 to 5).map(i => s"SELECT * FROM card$i").mkString(" UNION ALL ")
    s"""WITH ev AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |    AND event_type IS NOT NULL),
       |sq AS (SELECT user_id,
       |    lead(user_id) OVER (PARTITION BY event_type, us // 3600000000
       |      ORDER BY us, event_id) AS nxt
       |  FROM ev),
       |e0 AS MATERIALIZED (SELECT DISTINCT user_id AS src, nxt AS dst
       |  FROM sq WHERE nxt IS NOT NULL AND nxt <> user_id),
       |eg0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM e0
       |  UNION SELECT dst AS a, src AS b FROM e0),
       |v0 AS MATERIALIZED (SELECT DISTINCT user_id AS id FROM ev),
       |st0 AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM eg0) AS m2,
       |  (SELECT CAST(count(*) AS BIGINT) FROM v0) AS n),
       |card0 AS (SELECT CAST(0 AS BIGINT) AS round, CAST(0 AS BIGINT) AS thr,
       |  CAST(0 AS BIGINT) AS n_removed, n AS n_remaining,
       |  CAST(m2 // 2 AS BIGINT) AS n_edges,
       |  CAST((m2 * 500000) // greatest(n, 1) AS BIGINT) AS density6 FROM st0),
       |$rounds
       |SELECT * FROM (SELECT * FROM card0 UNION ALL $finals) ORDER BY round""".stripMargin
  }

  /** graph_pagerank_users' unrolled-fixpoint oracle (attribution_markov
    * precedent): 5 loop-generated rounds running the SAME exact fixed-point
    * integer recurrence as operators/PageRank — scores in 1e-12 BIGINT
    * units, edge probabilities in 1e-6 units, each term (r12·p6) // 1e6 —
    * so the unordered SQL sums commute and the compare is bit-exact. Every
    * multiply-referenced or corpus-sized CTE is AS MATERIALIZED (each round
    * references the previous twice; plain CTEs would re-inline 2^5-fold). */
  private val pagerankUsersOracle: String = {
    val rounds = (1 to 5).map { i =>
      val pv = s"r${i - 1}"
      s"""d$i AS (SELECT CAST(coalesce(sum(r12), 0) AS BIGINT) AS d12 FROM $pv
         |  WHERE id NOT IN (SELECT src FROM e)),
         |i$i AS (SELECT e.dst AS id,
         |    CAST(sum((p.r12 * e.p6) // 1000000) AS BIGINT) AS in12
         |  FROM e JOIN $pv p ON p.id = e.src GROUP BY 1),
         |r$i AS MATERIALIZED (SELECT nd.id,
         |    CAST((15 * nn.base) // 100
         |      + (85 * (coalesce(i$i.in12, 0) + d$i.d12 // nn.n)) // 100
         |      AS BIGINT) AS r12
         |  FROM nodes nd CROSS JOIN nn CROSS JOIN d$i
         |  LEFT JOIN i$i ON i$i.id = nd.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |    AND event_type IS NOT NULL),
       |sq AS (SELECT user_id,
       |    lead(user_id) OVER (PARTITION BY event_type, us // 3600000000
       |      ORDER BY us, event_id) AS nxt
       |  FROM ev),
       |e0 AS MATERIALIZED (SELECT user_id AS src, nxt AS dst,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM sq WHERE nxt IS NOT NULL AND nxt <> user_id GROUP BY 1, 2),
       |wo AS (SELECT src, CAST(sum(w) AS BIGINT) AS wo FROM e0 GROUP BY 1),
       |e AS MATERIALIZED (SELECT e0.src, e0.dst,
       |    CAST((e0.w * 1000000) // wo.wo AS BIGINT) AS p6
       |  FROM e0 JOIN wo USING (src)),
       |nodes AS MATERIALIZED (SELECT DISTINCT user_id AS id FROM ev),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(1000000000000 // count(*) AS BIGINT) AS base FROM nodes),
       |r0 AS MATERIALIZED (SELECT id, nn.base AS r12 FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT id AS user_id, r12 AS score12,
       |  CAST(row_number() OVER (ORDER BY r12 DESC, id) AS BIGINT) AS rnk
       |FROM r5 ORDER BY rnk LIMIT 100""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "interval_peak" ->
      """WITH iv AS MATERIALIZED (
        |  SELECT l_suppkey AS sk, CAST(o_orderdate AS DATE) AS d0,
        |    CAST(l_shipdate AS DATE) AS d1
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)),
        |g AS (SELECT sk, d, CAST(sum(delta) AS BIGINT) AS dsum FROM (
        |    SELECT sk, d0 AS d, 1 AS delta FROM iv
        |    UNION ALL SELECT sk, d1 + 1 AS d, -1 AS delta FROM iv)
        |  GROUP BY 1, 2),
        |r AS (SELECT sk, d,
        |    sum(dsum) OVER (PARTITION BY sk ORDER BY d) AS cur FROM g),
        |p AS (SELECT sk, CAST(max(cur) AS BIGINT) AS peak FROM r GROUP BY 1)
        |SELECT r.sk AS s_suppkey, p.peak AS peak_inflight, min(r.d) AS peak_date
        |FROM r JOIN p ON p.sk = r.sk AND r.cur = p.peak
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "graph_pagerank_users" -> pagerankUsersOracle,
    "graph_ppr_users" -> pprUsersOracle,
    "graph_lpa_users" -> lpaUsersOracle,
    "graph_bfs_users" -> bfsUsersOracle,
    "graph_densest_users" -> densestUsersOracle,
    "ucc_discover" -> {
      val checks = Seq(
        ("orders", Seq("o_orderkey")),
        ("customer", Seq("c_custkey")),
        ("documents", Seq("doc_id")),
        ("lineitem", Seq("l_orderkey", "l_linenumber")),
        ("part", Seq("p_brand")),
        ("events", Seq("user_id", "event_type")))
      checks.map { case (tbl, cols) =>
        val cl = cols.mkString(", ")
        // one count + one distinct-collapse per check; excess/is_key derive
        // from those aliases (scalar-subquery CSE is not guaranteed)
        s"""SELECT '$tbl' AS table_name, '${cols.mkString(",")}' AS column_set,
           |  n_rows, n_distinct, n_rows - n_distinct AS n_excess_rows,
           |  n_rows = n_distinct AS is_key
           |FROM (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM $tbl)
           |CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_distinct
           |  FROM (SELECT DISTINCT $cl FROM $tbl))""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name, column_set")
    },
    "ind_discover" -> {
      val checks = Seq(
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
        ("customer", "c_custkey", "orders", "o_custkey"),
        ("part", "p_size", "nation", "n_nationkey"))
      checks.map { case (ct, cc, pt, pc) =>
        s"""SELECT '$ct' AS child_table, '$cc' AS child_col,
           |  '$pt' AS parent_table, '$pc' AS parent_col,
           |  CAST(count(*) AS BIGINT) AS n_distinct_child,
           |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
           |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0 AS contained
           |FROM (SELECT DISTINCT CAST($cc AS BIGINT) AS k FROM $ct) c
           |LEFT JOIN (SELECT DISTINCT CAST($pc AS BIGINT) AS k FROM $pt) p USING (k)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY child_table, child_col")
    },
    "fd_discover" -> {
      val checks = Seq(
        ("nation", "n_nationkey", "n_regionkey"),
        ("nation", "n_name", "n_nationkey"),
        ("part", "p_brand", "p_size"),
        ("customer", "c_nationkey", "c_mktsegment"),
        ("orders", "o_orderkey", "o_custkey"),
        ("lineitem", "l_orderkey", "l_suppkey"))
      checks.map { case (tbl, det, dep) =>
        s"""SELECT '$tbl' AS table_name, '$det' AS determinant, '$dep' AS dependent,
           |  CAST(count(*) AS BIGINT) AS n_groups,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           |  CAST(max(nd) AS BIGINT) AS max_dependents,
           |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT count(DISTINCT $dep) AS nd FROM $tbl GROUP BY $det)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name, determinant")
    },
    "er_em_weights" -> {
      val rounds = (1 to 5).map { i =>
        val rp = s"r${i - 1}"
        s"""e$i AS (SELECT g1, g2, g3, n,
           |    (p * (CASE WHEN g1 THEN m1 ELSE 1000000 - m1 END)
           |       * (CASE WHEN g2 THEN m2 ELSE 1000000 - m2 END)
           |       * (CASE WHEN g3 THEN m3 ELSE 1000000 - m3 END) * 1000000)
           |    // (p * (CASE WHEN g1 THEN m1 ELSE 1000000 - m1 END)
           |          * (CASE WHEN g2 THEN m2 ELSE 1000000 - m2 END)
           |          * (CASE WHEN g3 THEN m3 ELSE 1000000 - m3 END)
           |        + (1000000 - p) * (CASE WHEN g1 THEN u1 ELSE 1000000 - u1 END)
           |          * (CASE WHEN g2 THEN u2 ELSE 1000000 - u2 END)
           |          * (CASE WHEN g3 THEN u3 ELSE 1000000 - u3 END)) AS w
           |  FROM pats CROSS JOIN $rp),
           |r$i AS (SELECT
           |    least(greatest(sum(n * w) // greatest(sum(n), 1), 1), 999999) AS p,
           |    least(greatest((sum(CASE WHEN g1 THEN n * w ELSE 0 END) * 1000000)
           |      // greatest(sum(n * w), 1), 1), 999999) AS m1,
           |    least(greatest((sum(CASE WHEN g2 THEN n * w ELSE 0 END) * 1000000)
           |      // greatest(sum(n * w), 1), 1), 999999) AS m2,
           |    least(greatest((sum(CASE WHEN g3 THEN n * w ELSE 0 END) * 1000000)
           |      // greatest(sum(n * w), 1), 1), 999999) AS m3,
           |    least(greatest((sum(CASE WHEN g1 THEN n * (1000000 - w) ELSE 0 END) * 1000000)
           |      // greatest(sum(n * (1000000 - w)), 1), 1), 999999) AS u1,
           |    least(greatest((sum(CASE WHEN g2 THEN n * (1000000 - w) ELSE 0 END) * 1000000)
           |      // greatest(sum(n * (1000000 - w)), 1), 1), 999999) AS u2,
           |    least(greatest((sum(CASE WHEN g3 THEN n * (1000000 - w) ELSE 0 END) * 1000000)
           |      // greatest(sum(n * (1000000 - w)), 1), 1), 999999) AS u3
           |  FROM e$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH dirty AS (
         |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
         |  UNION ALL
         |  SELECT c_custkey + 500000, 'K' || substring(c_name, 2), c_nationkey,
         |    c_acctbal + 0.37, c_mktsegment FROM customer),
         |blocked AS (SELECT *, CAST(floor(c_acctbal / 100.0) AS BIGINT) AS blk FROM dirty),
         |flags AS (
         |  SELECT levenshtein(a.c_name, b.c_name) <= 1 AS g1,
         |    abs(a.c_acctbal - b.c_acctbal) < 1.0 AS g2,
         |    a.c_mktsegment = b.c_mktsegment AS g3
         |  FROM blocked a JOIN blocked b
         |    ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
         |    AND a.c_custkey < b.c_custkey),
         |pats AS MATERIALIZED (SELECT g1, g2, g3, CAST(count(*) AS HUGEINT) AS n
         |  FROM flags GROUP BY 1, 2, 3),
         |r0 AS (SELECT CAST(500000 AS HUGEINT) AS p,
         |  CAST(900000 AS HUGEINT) AS m1, CAST(900000 AS HUGEINT) AS m2,
         |  CAST(900000 AS HUGEINT) AS m3, CAST(100000 AS HUGEINT) AS u1,
         |  CAST(100000 AS HUGEINT) AS u2, CAST(100000 AS HUGEINT) AS u3),
         |$rounds
         |SELECT * FROM (
         |  SELECT 'bal_lt1' AS field, CAST(m2 AS BIGINT) AS m6, CAST(u2 AS BIGINT) AS u6,
         |    CAST((m2 * 1000000) // greatest(u2, 1) AS BIGINT) AS mu_ratio6 FROM r5
         |  UNION ALL SELECT 'name_lev1', CAST(m1 AS BIGINT), CAST(u1 AS BIGINT),
         |    CAST((m1 * 1000000) // greatest(u1, 1) AS BIGINT) FROM r5
         |  UNION ALL SELECT 'prior', CAST(p AS BIGINT), CAST(0 AS BIGINT),
         |    CAST(0 AS BIGINT) FROM r5
         |  UNION ALL SELECT 'segment_eq', CAST(m3 AS BIGINT), CAST(u3 AS BIGINT),
         |    CAST((m3 * 1000000) // greatest(u3, 1) AS BIGINT) FROM r5) z
         |ORDER BY field""".stripMargin
    },
    "er_linkage" ->
      """WITH dirty AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 500000, 'K' || substring(c_name, 2), c_nationkey,
        |    c_acctbal + 0.37, c_mktsegment FROM customer),
        |blocked AS (SELECT *, CAST(floor(c_acctbal / 100.0) AS BIGINT) AS blk FROM dirty),
        |scored AS (
        |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |    CAST(CASE WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 30 ELSE -10 END
        |      + CASE WHEN abs(a.c_acctbal - b.c_acctbal) < 1.0 THEN 15 ELSE -5 END
        |      + CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 10 ELSE -8 END AS BIGINT)
        |      AS score
        |  FROM blocked a JOIN blocked b
        |    ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
        |    AND a.c_custkey < b.c_custkey)
        |SELECT id_a, id_b, score,
        |  CASE WHEN score >= 45 THEN 'match' ELSE 'possible' END AS decision
        |FROM scored WHERE score >= 15 ORDER BY id_a, id_b""".stripMargin,
    "er_cluster" ->
      s"""$erClosureSql,
         |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS entity_size
         |  FROM lab GROUP BY 1)
         |SELECT entity_size, CAST(count(*) AS BIGINT) AS n_entities,
         |  CAST(entity_size * count(*) AS BIGINT) AS n_records,
         |  CAST(sum(component) AS BIGINT) AS rep_id_sum
         |FROM sz GROUP BY entity_size ORDER BY entity_size""".stripMargin,
    "er_blocking_quality" ->
      """WITH dirty AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |    CAST(floor(c_acctbal / 100.0) AS BIGINT) AS blk, FALSE AS variant
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 500000, c_nationkey, c_acctbal + 0.37,
        |    CAST(floor((c_acctbal + 0.37) / 100.0) AS BIGINT) AS blk, TRUE AS variant
        |  FROM customer),
        |pb AS (SELECT c_nationkey, blk, CAST(count(*) AS BIGINT) AS n
        |  FROM dirty GROUP BY 1, 2),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(n * (n - 1) // 2) AS BIGINT) AS cand_pairs FROM pb),
        |tot AS (SELECT CAST(count(CASE WHEN NOT variant THEN 1 END) AS BIGINT) AS t_o,
        |    CAST(count(CASE WHEN variant THEN 1 END) AS BIGINT) AS t_v FROM dirty),
        |fo AS (SELECT CAST(count(*) AS BIGINT) AS n_true,
        |    CAST(count(CASE WHEN o.c_nationkey = v.c_nationkey AND o.blk = v.blk
        |      THEN 1 END) AS BIGINT) AS n_found
        |  FROM (SELECT c_custkey AS k, c_nationkey, blk FROM dirty WHERE NOT variant) o
        |  JOIN (SELECT c_custkey - 500000 AS k, c_nationkey, blk FROM dirty WHERE variant) v
        |  USING (k))
        |SELECT n_blocks, cand_pairs,
        |  CAST((t_o + t_v) * (t_o + t_v - 1) // 2 AS BIGINT) AS total_pairs,
        |  n_true, n_found,
        |  floor((1e0 - CAST(cand_pairs AS DOUBLE) / ((t_o + t_v) * (t_o + t_v - 1) // 2)) * 1e6 + 0.5) / 1e6 AS reduction_ratio,
        |  floor(CAST(n_found AS DOUBLE) / n_true * 1e6 + 0.5) / 1e6 AS pairs_completeness
        |FROM agg CROSS JOIN tot CROSS JOIN fo""".stripMargin,
    "kanon_generalize" ->
      """WITH c AS (SELECT c_mktsegment, width,
        |    CAST(floor(c_acctbal / CAST(width AS DOUBLE)) AS BIGINT) AS bin
        |  FROM customer, unnest([100, 500, 2500, 12500]) AS u(width)),
        |cls AS (SELECT width, c_mktsegment, bin, CAST(count(*) AS BIGINT) AS n
        |  FROM c GROUP BY 1, 2, 3),
        |per AS (SELECT width, CAST(count(*) AS BIGINT) AS n_classes,
        |    CAST(min(n) AS BIGINT) AS min_class,
        |    CAST(count(CASE WHEN n < 10 THEN 1 END) AS BIGINT) AS n_violating
        |  FROM cls GROUP BY 1),
        |best AS (SELECT min(width) AS best_width FROM per WHERE min_class >= 10)
        |SELECT CAST(width AS BIGINT) AS width, n_classes, min_class, n_violating,
        |  min_class >= 10 AS k_ok, coalesce(width = best_width, FALSE) AS chosen
        |FROM per CROSS JOIN best ORDER BY width""".stripMargin,
    "golden_record" ->
      s"""$erClosureSql
         |SELECT component AS entity_id, CAST(count(*) AS BIGINT) AS n_members,
         |  min_by(c_name, c_custkey) AS name,
         |  min_by(c_mktsegment, c_custkey) AS segment,
         |  CAST(round(max(c_acctbal) * 100) AS BIGINT) AS max_bal_cents,
         |  count(*) > 1 AS is_merged
         |FROM dirty JOIN lab ON c_custkey = lab.id
         |GROUP BY component ORDER BY entity_id""".stripMargin,
    "supplier_scorecard" ->
      """WITH agg AS (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
        |    floor(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |        * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 100.0 + 0.5) / 100.0 AS revenue,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        |    CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAY
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, n_lines, revenue,
        |  floor(n_returned / CAST(n_lines AS DOUBLE) * 1e4 + 0.5) / 1e4 AS return_rate,
        |  floor(n_late / CAST(n_lines AS DOUBLE) * 1e4 + 0.5) / 1e4 AS late_rate
        |FROM agg JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY s_suppkey""".stripMargin,
    "graph_communities" ->
      (lpaBaseSql + (1 to 5).map(lpaRoundSql).mkString +
        """,
          |sizes AS (SELECT label, CAST(count(*) AS BIGINT) AS community_size
          |          FROM r5 GROUP BY 1)
          |SELECT r5.node AS nation, r5.label AS community, sizes.community_size
          |FROM r5 JOIN sizes USING (label) ORDER BY nation""".stripMargin),
    "graph_link_predict" ->
      (nationGraphSql +
        """,
          |deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM sp GROUP BY 1),
          |cand AS (
          |  SELECT e1.a AS u, e2.b AS v, e1.b AS z
          |  FROM sp e1 JOIN sp e2 ON e1.b = e2.a
          |  WHERE e1.a < e2.b
          |    AND NOT EXISTS (SELECT 1 FROM sp e3 WHERE e3.a = e1.a AND e3.b = e2.b)),
          |sc AS (
          |  SELECT u, v, CAST(count(*) AS BIGINT) AS common_n,
          |    CAST(sum(5354228880 // dz.d) AS BIGINT) AS ra_num
          |  FROM cand JOIN deg dz ON cand.z = dz.node
          |  GROUP BY u, v)
          |SELECT u AS node_u, v AS node_v, common_n,
          |  floor(CAST(common_n AS DOUBLE) / (du.d + dv.d - common_n) * 1e6 + 0.5) / 1e6 AS jaccard,
          |  floor(CAST(ra_num AS DOUBLE) / CAST(5354228880 AS DOUBLE) * 1e6 + 0.5) / 1e6 AS resource_alloc
          |FROM sc JOIN deg du ON sc.u = du.node JOIN deg dv ON sc.v = dv.node
          |ORDER BY common_n DESC, node_u, node_v""".stripMargin),
    "graph_shortest_paths" ->
      (nationGraphSql +
        """,
          |f1 AS MATERIALIZED (SELECT DISTINCT a AS s, b AS t FROM sp WHERE a <> b),
          |f2 AS MATERIALIZED (SELECT DISTINCT f1.s AS s, sp.b AS t
          |  FROM f1 JOIN sp ON f1.t = sp.a WHERE f1.s <> sp.b),
          |f3 AS MATERIALIZED (SELECT DISTINCT f2.s AS s, sp.b AS t
          |  FROM f2 JOIN sp ON f2.t = sp.a WHERE f2.s <> sp.b),
          |f4 AS MATERIALIZED (SELECT DISTINCT f3.s AS s, sp.b AS t
          |  FROM f3 JOIN sp ON f3.t = sp.a WHERE f3.s <> sp.b),
          |f5 AS MATERIALIZED (SELECT DISTINCT f4.s AS s, sp.b AS t
          |  FROM f4 JOIN sp ON f4.t = sp.a WHERE f4.s <> sp.b),
          |alld AS (
          |  SELECT s, t, 1 AS d FROM f1
          |  UNION ALL SELECT s, t, 2 FROM f2
          |  UNION ALL SELECT s, t, 3 FROM f3
          |  UNION ALL SELECT s, t, 4 FROM f4
          |  UNION ALL SELECT s, t, 5 FROM f5)
          |SELECT s AS src, t AS dst, CAST(min(d) AS BIGINT) AS hops
          |FROM alld WHERE s < t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
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
    "k_anonymity" ->
      """WITH qi AS (SELECT c_mktsegment, c_nationkey,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band FROM customer),
        |cls AS (SELECT c_mktsegment, c_nationkey, bal_band,
        |    CAST(count(*) AS BIGINT) AS class_size
        |  FROM qi GROUP BY c_mktsegment, c_nationkey, bal_band)
        |SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(class_size * count(*) AS BIGINT) AS n_rows,
        |  class_size < 5 AS at_risk
        |FROM cls GROUP BY class_size ORDER BY class_size""".stripMargin,
    "forget_users" ->
      """WITH del AS (SELECT DISTINCT user_id AS del_id FROM events
        |  WHERE user_id IS NOT NULL AND user_id % 17 = 3)
        |SELECT table_name, n_before, n_before - n_after AS n_purged,
        |  n_after, kept_id_sum
        |FROM (
        |  SELECT 'events' AS table_name,
        |    CAST((SELECT count(*) FROM events WHERE user_id IS NOT NULL) AS BIGINT) AS n_before,
        |    CAST(count(*) AS BIGINT) AS n_after,
        |    CAST(sum(event_id) AS BIGINT) AS kept_id_sum
        |  FROM events e WHERE user_id IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM del WHERE del_id = e.user_id)
        |  UNION ALL
        |  SELECT 'customer',
        |    CAST((SELECT count(*) FROM customer) AS BIGINT),
        |    CAST(count(*) AS BIGINT), CAST(sum(c_custkey) AS BIGINT)
        |  FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM del WHERE del_id = c.c_custkey)
        |  UNION ALL
        |  SELECT 'orders',
        |    CAST((SELECT count(*) FROM orders) AS BIGINT),
        |    CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT)
        |  FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM del WHERE del_id = o.o_custkey)
        |) ORDER BY table_name""".stripMargin,
    "l_diversity" ->
      """WITH cls AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS class_custs
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_mktsegment, c_nationkey)
        |SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(class_custs) AS BIGINT) AS n_custs, l < 3 AS at_risk
        |FROM cls GROUP BY l ORDER BY l""".stripMargin,
    "t_closeness" ->
      """WITH cv AS (
        |  SELECT c_mktsegment, c_nationkey, o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS n_cv
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1, 2, 3),
        |cls AS (SELECT c_mktsegment, c_nationkey, CAST(sum(n_cv) AS BIGINT) AS n_c
        |  FROM cv GROUP BY 1, 2),
        |gv AS (SELECT o_orderpriority, CAST(sum(n_cv) AS BIGINT) AS n_v
        |  FROM cv GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_v) AS BIGINT) AS n_tot FROM gv),
        |d AS (SELECT cls.c_mktsegment, cls.c_nationkey, cls.n_c,
        |    gv.n_v, tot.n_tot, COALESCE(cv.n_cv, 0) AS n_cv
        |  FROM cls CROSS JOIN gv CROSS JOIN tot
        |  LEFT JOIN cv ON cv.c_mktsegment = cls.c_mktsegment
        |    AND cv.c_nationkey = cls.c_nationkey
        |    AND cv.o_orderpriority = gv.o_orderpriority)
        |SELECT c_mktsegment, c_nationkey, n_orders, t_dist,
        |  t_dist > 0.1 AS at_risk FROM (
        |  SELECT c_mktsegment, c_nationkey, max(n_c) AS n_orders,
        |    floor(CAST(sum(abs(n_cv * n_tot - n_v * n_c)) AS DOUBLE)
        |      / (2 * max(n_c) * max(n_tot)) * 1e6 + 0.5) / 1e6 AS t_dist
        |  FROM d GROUP BY 1, 2)
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "graph_hits" -> graphHitsOracle,
    "dp_histogram" ->
      s"""WITH ex AS (SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
         |    CAST(count(*) AS BIGINT) AS n_exact FROM customer GROUP BY 1),
         |hh AS (SELECT nation_key, n_exact,
         |    CAST(('0x' || substr(md5('dp:' || CAST(nation_key AS VARCHAR)), 1, 6)) AS BIGINT) AS h
         |  FROM ex),
         |n AS (SELECT nation_key, n_exact, $DpNoiseSql AS dp_noise FROM hh)
         |SELECT nation_key, n_exact, dp_noise,
         |  greatest(CAST(floor(n_exact + dp_noise + 0.5e0) AS BIGINT), 0) AS n_released
         |FROM n ORDER BY 1""".stripMargin,
    "dp_topk" ->
      s"""WITH tok AS (SELECT unnest(${Tables.toksSql()}) AS token FROM documents),
         |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n_exact FROM tok GROUP BY 1),
         |hh AS (SELECT token, n_exact,
         |    CAST(('0x' || substr(md5('dptk:' || token), 1, 6)) AS BIGINT) AS h
         |  FROM c),
         |nz AS (SELECT token, n_exact,
         |    CAST(floor(-(CASE WHEN (CAST(h AS DOUBLE) + 0.5e0) / 16777216e0 >= 0.5e0
         |        THEN 1e0 ELSE -1e0 END)
         |      * ln(1e0 - 2e0 * abs((CAST(h AS DOUBLE) + 0.5e0) / 16777216e0 - 0.5e0))
         |      * 1e4 + 0.5) AS BIGINT) AS noise4
         |  FROM hh),
         |sc AS (SELECT token, n_exact, n_exact * 10000 + noise4 AS score4 FROM nz),
         |rk AS (SELECT token, n_exact, score4,
         |    row_number() OVER (ORDER BY n_exact DESC, token) AS exact_rank,
         |    row_number() OVER (ORDER BY score4 DESC, token) AS rank FROM sc)
         |SELECT CAST(rank AS BIGINT) AS rank, token,
         |  CAST((greatest(score4, 0) + 5000) // 10000 AS BIGINT) AS n_released,
         |  exact_rank <= 5 AS in_exact_topk
         |FROM rk WHERE rank <= 5 ORDER BY rank""".stripMargin,
    "skew_profile" ->
      """WITH counts AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS total_rows,
        |  max(cnt) AS max_cnt,
        |  floor(quantile_cont(cnt, 0.5) * 1e4 + 0.5) / 1e4 AS p50_cnt,
        |  floor(quantile_cont(cnt, 0.99) * 1e4 + 0.5) / 1e4 AS p99_cnt,
        |  floor(max(cnt) / avg(cnt) * 1e4 + 0.5) / 1e4 AS skew_ratio,
        |  floor(CAST(max(cnt) AS DOUBLE) / sum(cnt) * 1e6 + 0.5) / 1e6 AS top1_share
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
        |  floor(avg(levenshtein(a.p_name, b.p_name)) * 1e4 + 0.5) / 1e4 AS avg_dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |  AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "session_paths" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |b AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sids AS (SELECT user_id, ts, event_id, event_type,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM b),
        |rn AS (SELECT user_id, sid, event_type,
        |    row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
        |  FROM sids),
        |paths AS (
        |  SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM rn WHERE rn <= 5 GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM paths GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 25""".stripMargin,
    "session_stats" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id, value
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |b AS (SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sb AS (SELECT user_id, ts, event_id, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM b)
        |SELECT user_id, CAST(sid AS BIGINT) AS sid,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts) AS session_start,
        |  floor((max(epoch_us(ts)) - min(epoch_us(ts))) / 1e6 * 1e3 + 0.5) / 1e3 AS duration_sec,
        |  round(sum(value), 2) AS sum_value
        |FROM sb GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,
    "sample_weighted" ->
      """WITH d AS (SELECT doc_id, source, n_chars AS w,
        |    md5('samp:' || CAST(doc_id AS VARCHAR)) AS skey FROM documents),
        |c AS (SELECT *, COALESCE(sum(w) OVER (ORDER BY skey, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0 FROM d),
        |t AS (SELECT greatest(sum(w) // 100, 1) AS stride FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(CASE WHEN (cum0 + w - 1 + stride) // stride
        |      > (cum0 - 1 + stride) // stride THEN 1 END) AS BIGINT) AS n_picked,
        |  CAST(sum(w) AS BIGINT) AS w_total,
        |  CAST(COALESCE(sum(CASE WHEN (cum0 + w - 1 + stride) // stride
        |      > (cum0 - 1 + stride) // stride THEN w END), 0) AS BIGINT) AS w_picked
        |FROM c CROSS JOIN t GROUP BY source ORDER BY source""".stripMargin,
    "window_time_range" ->
      """SELECT event_id, n_hour, avg_hour FROM (
        |  SELECT event_id,
        |    CAST(count(*) OVER w AS BIGINT) AS n_hour,
        |    round(avg(value) OVER w, 4) AS avg_hour
        |  FROM (SELECT event_id, user_id, value,
        |          date_trunc('microseconds', ts) AS ts FROM events
        |        WHERE user_id IS NOT NULL AND ts IS NOT NULL)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW))
        |ORDER BY event_id""".stripMargin,
    "graph_triangles" ->
      """WITH und AS (
        |  SELECT DISTINCT least(CAST(s.s_nationkey AS BIGINT), CAST(c.c_nationkey AS BIGINT)) AS u,
        |    greatest(CAST(s.s_nationkey AS BIGINT), CAST(c.c_nationkey AS BIGINT)) AS v
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE s.s_nationkey <> c.c_nationkey),
        |tri AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM und e1 JOIN und e2 ON e1.v = e2.u
        |    JOIN und e3 ON e1.u = e3.u AND e2.v = e3.v),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY node),
        |triads AS (
        |  SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_triads,
        |    CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
        |edges AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
        |SELECT n_nodes, n_edges, n_triangles,
        |  floor(3.0 * n_triangles / n_triads * 1e6 + 0.5) / 1e6 AS clustering
        |FROM triads, edges, tri""".stripMargin,
    "skyline_pareto" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |w AS (
        |  SELECT l_returnflag, pc, dc,
        |    min(dc) OVER (PARTITION BY l_returnflag ORDER BY pc
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min_d,
        |    min(dc) OVER (PARTITION BY l_returnflag, pc) AS grp_min_d
        |  FROM li)
        |SELECT l_returnflag, pc, dc, CAST(count(*) AS BIGINT) AS n_rows
        |FROM w
        |WHERE dc = grp_min_d AND (prev_min_d IS NULL OR dc < prev_min_d)
        |GROUP BY 1, 2, 3 ORDER BY l_returnflag, pc""".stripMargin,
    "ship_delay" ->
      """WITH d AS (
        |  SELECT o_orderpriority,
        |    CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL),
        |h AS (SELECT o_orderpriority, days, CAST(count(*) AS BIGINT) AS n
        |  FROM d GROUP BY 1, 2),
        |c AS (
        |  SELECT o_orderpriority, days,
        |    sum(n) OVER (PARTITION BY o_orderpriority ORDER BY days
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn,
        |    sum(n) OVER (PARTITION BY o_orderpriority) AS tot
        |  FROM h)
        |SELECT o_orderpriority, CAST(max(tot) AS BIGINT) AS n_lineitems,
        |  min(CASE WHEN cumn >= ceil(tot * 0.5) THEN days END) AS p50_days,
        |  min(CASE WHEN cumn >= ceil(tot * 0.9) THEN days END) AS p90_days,
        |  max(days) AS max_days
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "abc_classification" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
        |  GROUP BY 1),
        |w AS (
        |  SELECT cents,
        |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cents) OVER () AS total
        |  FROM rev)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  floor(CAST(sum(cents) AS DOUBLE) / max(total) * 1e4 + 0.5) / 1e4 AS rev_share
        |FROM (
        |  SELECT cents, total,
        |    CASE WHEN cum * 20 <= total * 16 THEN 'A'
        |         WHEN cum * 20 <= total * 19 THEN 'B'
        |         ELSE 'C' END AS abc_class
        |  FROM w)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "trending_topk" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS d, user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT d, CAST(rank AS BIGINT) AS rank, user_id, n FROM (
        |  SELECT d, user_id, n,
        |    row_number() OVER (PARTITION BY d ORDER BY n DESC, user_id) AS rank
        |  FROM d)
        |WHERE rank <= 3 ORDER BY d, rank""".stripMargin,
    "ts_seasonal_adjust" ->
      """WITH ev AS (
        |  SELECT event_type, hour(ts) AS hod, value
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |base AS (
        |  SELECT event_type AS bt, hod AS bh, avg(value) AS baseline
        |  FROM ev GROUP BY 1, 2),
        |resid AS (
        |  SELECT ev.event_type, ev.value - base.baseline AS r
        |  FROM ev JOIN base ON ev.event_type = base.bt AND ev.hod = base.bh),
        |sd AS (
        |  SELECT event_type AS st, stddev_pop(r) AS sd FROM resid GROUP BY 1)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  round(max(abs(r / sd)), 4) AS max_abs_z,
        |  CAST(count(CASE WHEN abs(r / sd) > 3.0 THEN 1 END) AS BIGINT) AS n_flagged
        |FROM resid JOIN sd ON resid.event_type = sd.st
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_pagerank" ->
      """WITH e AS (
        |  SELECT CAST(s.s_nationkey AS BIGINT) AS src,
        |    CAST(c.c_nationkey AS BIGINT) AS dst, CAST(count(*) AS DOUBLE) AS w
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |ow AS (SELECT src, sum(w) AS tot FROM e GROUP BY 1),
        |p AS (SELECT e.src, e.dst, e.w / ow.tot AS p FROM e JOIN ow USING (src)),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nation),
        |i0 AS (SELECT CAST(n_nationkey AS BIGINT) AS nation, 1.0 / nn.n AS pr
        |  FROM nation CROSS JOIN nn),
        |d1 AS (SELECT COALESCE(sum(pr), 0) AS dm FROM i0
        |  WHERE nation NOT IN (SELECT src FROM ow)),
        |i1 AS (SELECT b.nation,
        |    0.15 / nn.n + 0.85 * (COALESCE(sum(a.pr * p.p), 0) + d1.dm / nn.n) AS pr
        |  FROM i0 b CROSS JOIN nn CROSS JOIN d1
        |  LEFT JOIN p ON p.dst = b.nation LEFT JOIN i0 a ON a.nation = p.src
        |  GROUP BY b.nation, nn.n, d1.dm),
        |d2 AS (SELECT COALESCE(sum(pr), 0) AS dm FROM i1
        |  WHERE nation NOT IN (SELECT src FROM ow)),
        |i2 AS (SELECT b.nation,
        |    0.15 / nn.n + 0.85 * (COALESCE(sum(a.pr * p.p), 0) + d2.dm / nn.n) AS pr
        |  FROM i1 b CROSS JOIN nn CROSS JOIN d2
        |  LEFT JOIN p ON p.dst = b.nation LEFT JOIN i1 a ON a.nation = p.src
        |  GROUP BY b.nation, nn.n, d2.dm),
        |d3 AS (SELECT COALESCE(sum(pr), 0) AS dm FROM i2
        |  WHERE nation NOT IN (SELECT src FROM ow)),
        |i3 AS (SELECT b.nation,
        |    0.15 / nn.n + 0.85 * (COALESCE(sum(a.pr * p.p), 0) + d3.dm / nn.n) AS pr
        |  FROM i2 b CROSS JOIN nn CROSS JOIN d3
        |  LEFT JOIN p ON p.dst = b.nation LEFT JOIN i2 a ON a.nation = p.src
        |  GROUP BY b.nation, nn.n, d3.dm),
        |d4 AS (SELECT COALESCE(sum(pr), 0) AS dm FROM i3
        |  WHERE nation NOT IN (SELECT src FROM ow)),
        |i4 AS (SELECT b.nation,
        |    0.15 / nn.n + 0.85 * (COALESCE(sum(a.pr * p.p), 0) + d4.dm / nn.n) AS pr
        |  FROM i3 b CROSS JOIN nn CROSS JOIN d4
        |  LEFT JOIN p ON p.dst = b.nation LEFT JOIN i3 a ON a.nation = p.src
        |  GROUP BY b.nation, nn.n, d4.dm),
        |d5 AS (SELECT COALESCE(sum(pr), 0) AS dm FROM i4
        |  WHERE nation NOT IN (SELECT src FROM ow)),
        |i5 AS (SELECT b.nation,
        |    0.15 / nn.n + 0.85 * (COALESCE(sum(a.pr * p.p), 0) + d5.dm / nn.n) AS pr
        |  FROM i4 b CROSS JOIN nn CROSS JOIN d5
        |  LEFT JOIN p ON p.dst = b.nation LEFT JOIN i4 a ON a.nation = p.src
        |  GROUP BY b.nation, nn.n, d5.dm)
        |SELECT nation, round(pr, 6) AS pr FROM i5 ORDER BY nation""".stripMargin,
    "inverted_index" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${Tables.toksSql()}) AS term FROM documents),
        |dtok AS (SELECT DISTINCT doc_id, term FROM tok),
        |topd AS (SELECT term, doc_id FROM (
        |    SELECT term, doc_id,
        |      row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |    FROM dtok) WHERE rn <= 5),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dtok GROUP BY 1)
        |SELECT t.term, d.df,
        |  array_to_string(list(t.doc_id ORDER BY t.doc_id), ',') AS postings
        |FROM topd t JOIN dfq d USING (term)
        |WHERE d.df >= 10
        |GROUP BY t.term, d.df
        |ORDER BY d.df DESC, t.term LIMIT 100""".stripMargin,
    "seasonality_profile" ->
      """SELECT CAST(isodow(ts) - 1 AS INTEGER) AS dow,
        |  CAST(hour(ts) AS INTEGER) AS hr,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(avg(value), 4) AS avg_value
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rfm_segmentation" ->
      """WITH mx AS (SELECT max(o_orderdate) AS md FROM orders),
        |rfm AS (SELECT o_custkey,
        |    CAST(date_diff('day', max(o_orderdate), (SELECT md FROM mx)) AS BIGINT) AS recency,
        |    count(*) AS frequency, sum(o_totalprice) AS monetary
        |  FROM orders GROUP BY 1),
        |q AS (SELECT o_custkey, monetary,
        |    ntile(4) OVER (ORDER BY recency ASC, o_custkey ASC) AS r_q,
        |    ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_q,
        |    ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_q
        |  FROM rfm)
        |SELECT CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
        |  CAST(m_q AS INTEGER) AS m_q,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  round(sum(monetary), 2) AS total_spend
        |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_orders FROM orders),
        |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |freq AS (SELECT l_partkey, count(*) AS n_p FROM li GROUP BY 1)
        |SELECT pa, pb, n_ab,
        |  floor(n_ab * n.n_orders / (fa.n_p * fb.n_p) * 1e4 + 0.5) / 1e4 AS lift
        |FROM pairs CROSS JOIN n
        |JOIN freq fa ON fa.l_partkey = pairs.pa
        |JOIN freq fb ON fb.l_partkey = pairs.pb
        |ORDER BY lift DESC, pa, pb LIMIT 25""".stripMargin,
    "markov_transitions" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    date_trunc('microseconds', ts) AS ts FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |pairs AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM ev),
        |m AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  floor(n / sum(n) OVER (PARTITION BY from_type) * 1e6 + 0.5) / 1e6 AS p
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    "ab_srm" ->
      """WITH ev AS (SELECT event_type, user_id % 2 = 0 AS isA
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |c AS (SELECT event_type,
        |    CAST(count(CASE WHEN isA THEN 1 END) AS BIGINT) AS n_a,
        |    CAST(count(CASE WHEN NOT isA THEN 1 END) AS BIGINT) AS n_b
        |  FROM ev GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        |  floor(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |    / (n_a + n_b) * 1e6 + 0.5) / 1e6 AS chi2,
        |  (floor(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |    / (n_a + n_b) * 1e6 + 0.5) / 1e6) > 3.841459 AS srm
        |FROM c ORDER BY event_type""".stripMargin,
    "late_data_audit" ->
      """WITH ev AS (SELECT event_id, event_type, epoch_us(ts) AS tsus,
        |    epoch_us(ts) // 10800000000 AS bucket,
        |    md5('late:' || CAST(event_id AS VARCHAR)) AS akey
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |w AS (SELECT event_type, tsus,
        |    max(tsus) OVER (PARTITION BY event_type ORDER BY bucket, akey, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
        |  FROM ev),
        |l AS (SELECT event_type,
        |    CASE WHEN wm IS NULL OR wm <= tsus THEN 0 ELSE wm - tsus END AS late_us
        |  FROM w)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped_1h,
        |  CAST(max(late_us) // 1000000 AS BIGINT) AS max_late_s,
        |  round(CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS late_rate
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    "ab_ztest" ->
      """WITH ev AS (SELECT event_type, value, user_id % 2 = 0 AS isA
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    AND user_id IS NOT NULL)
        |SELECT event_type,
        |  CAST(count(CASE WHEN isA THEN 1 END) AS BIGINT) AS n_a,
        |  CAST(count(CASE WHEN NOT isA THEN 1 END) AS BIGINT) AS n_b,
        |  round(avg(CASE WHEN isA THEN value END), 4) AS mean_a,
        |  round(avg(CASE WHEN NOT isA THEN value END), 4) AS mean_b,
        |  round((avg(CASE WHEN isA THEN value END) - avg(CASE WHEN NOT isA THEN value END))
        |    / sqrt(var_samp(CASE WHEN isA THEN value END) / count(CASE WHEN isA THEN 1 END)
        |      + var_samp(CASE WHEN NOT isA THEN value END) / count(CASE WHEN NOT isA THEN 1 END)), 4) AS z
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,
    "fdr_bh" ->
      s"""WITH ev AS (SELECT event_type, value, user_id % 2 = 0 AS isA
         |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
         |    AND user_id IS NOT NULL),
         |zt AS (SELECT event_type,
         |    round((avg(CASE WHEN isA THEN value END) - avg(CASE WHEN NOT isA THEN value END))
         |      / sqrt(var_samp(CASE WHEN isA THEN value END) / count(CASE WHEN isA THEN 1 END)
         |        + var_samp(CASE WHEN NOT isA THEN value END) / count(CASE WHEN NOT isA THEN 1 END)), 4) AS z
         |  FROM ev GROUP BY event_type),
         |zz AS (SELECT event_type, z, abs(z) AS az FROM zt WHERE z IS NOT NULL),
         |tt AS (SELECT *, $FdrTSql AS tq FROM zz),
         |pp AS (SELECT *, $FdrP6Sql AS p6 FROM tt),
         |rr AS (SELECT *, CAST(row_number() OVER (ORDER BY p6, event_type) AS BIGINT) AS bh_rank,
         |    CAST(count(*) OVER () AS BIGINT) AS m FROM pp),
         |kk AS (SELECT *, max(CASE WHEN p6 * 20 * m <= bh_rank * 1000000 THEN bh_rank END)
         |    OVER () AS kstar FROM rr)
         |SELECT event_type, z, CAST(p6 AS DOUBLE) / 1e6 AS p_value, bh_rank,
         |  floor(CAST(bh_rank AS DOUBLE) / (20e0 * m) * 1e6 + 0.5) / 1e6 AS bh_crit,
         |  bh_rank <= coalesce(kstar, 0) AS rejected
         |FROM kk ORDER BY event_type""".stripMargin,
    "pmi_collocations" ->
      s"""WITH tk AS (SELECT ${Tables.toksSql()} AS tk FROM documents),
        |bgs AS (SELECT unnest(list_transform(range(1, len(tk)),
        |    i -> tk[i] || ' ' || tk[i+1])) AS bg FROM tk),
        |b12 AS (SELECT bg, CAST(count(*) AS BIGINT) AS n12 FROM bgs
        |  GROUP BY 1 HAVING count(*) >= 5),
        |uni AS (SELECT unnest(tk) AS w FROM tk),
        |cw AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
        |nt AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cw)
        |SELECT bg, n12,
        |  round(ln(n12 * nt.n / (c1.c * c2.c)), 4) AS pmi
        |FROM b12 CROSS JOIN nt
        |JOIN cw c1 ON c1.w = string_split(b12.bg, ' ')[1]
        |JOIN cw c2 ON c2.w = string_split(b12.bg, ' ')[2]
        |ORDER BY pmi DESC, bg LIMIT 50""".stripMargin)
}
