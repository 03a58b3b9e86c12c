package graft

import graft.queries.QueriesMlops
import org.apache.spark.sql.functions._

/** ML-ops/monitoring batch (QueriesMlops): invariant and differential
  * tests on sf0.001 — laws a correct implementation must satisfy
  * regardless of the data draw. */
class MlopsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = QueriesMlops.queries(name)(spark, dir)

  test("agg_mode: mode count is the true per-group max, tie breaks to min value") {
    val counts = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_orderstatus", "o_orderpriority").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byStatus = counts.groupBy(_._1)
    for (r <- q("agg_mode").collect()) {
      val (status, pri, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
      val grp = byStatus(status)
      val mx = grp.map(_._3).max
      assert(cnt == mx, s"$status: mode_count $cnt != max $mx")
      val winners = grp.filter(_._3 == mx).map(_._2)
      assert(pri == winners.min, s"$status: tie must break to min, got $pri")
    }
  }

  test("ts_cusum: flags are a subset of events, max excursion positive") {
    for (r <- q("ts_cusum").collect()) {
      val (n, mx, flagged) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(n > 0 && mx > 0.0)
      assert(flagged >= 0 && flagged <= n)
    }
  }

  test("drift_psi: PSI is non-negative and halves partition the stream") {
    val total = graft.queries.Tables.t(spark, dir, "events")
      .where(col("event_type").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .count()
    val rows = q("drift_psi").collect()
    // each (p-q)ln(p/q) term is >= 0, so the sum must be
    rows.foreach(r => assert(r.getDouble(3) >= 0.0, s"psi < 0 for ${r.getString(0)}"))
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
  }

  test("benford_dq: nine digits, observed shares sum to ~1, expected shares exact") {
    val rows = q("benford_dq").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    val obsSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(obsSum - 1.0) < 1e-4, s"obs shares sum $obsSum")
    for (r <- rows) {
      val d = r.getInt(0)
      assert(math.abs(r.getDouble(3) - math.log10(1.0 + 1.0 / d)) < 1e-6)
    }
  }

  test("attribution_touch: both models attribute the same conversion mass") {
    val rows = q("attribution_touch").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byModel = rows.groupBy(_._1)
    assert(byModel.keySet == Set("first", "last"))
    // every conversion with a prior touch appears in both models exactly once
    assert(byModel("first").map(_._3).sum == byModel("last").map(_._3).sum)
    assert(byModel("first").map(_._4).sum == byModel("last").map(_._4).sum)
    // purchase never attributes to itself
    assert(rows.forall(_._2 != "purchase"))
  }

  test("DeflateRatio: repetition compresses, randomness doesn't, edges are null") {
    import spark.implicits._
    import graft.functions.TextFns
    val rep = "the same sentence again and again. " * 200
    // seeded PRNG chars (java.util.Random's algorithm is specified, so this
    // is deterministic) — incompressible-ish text
    val rng = new java.util.Random(42)
    val rnd = Array.fill(7000)((rng.nextInt(93) + 33).toChar).mkString
    val rows = Seq(rep, rnd, "", null).toDF("s")
      .select(TextFns.deflateRatio(col("s")).as("r")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rows(0).get < 0.1, s"repetitive should crush: ${rows(0)}")
    assert(rows(1).get > 0.5, s"high-entropy should not: ${rows(1)}")
    assert(rows(2).isEmpty && rows(3).isEmpty)
    // deterministic across evaluations
    val again = Seq(rep).toDF("s")
      .select(TextFns.deflateRatio(col("s")).as("r")).head().getDouble(0)
    assert(again == rows(0).get)
  }

  test("compression_ratio: ratios in (0, ~1.01], repetitive count <= doc count") {
    for (r <- q("compression_ratio").collect()) {
      val (n, avg, nRep) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(n > 0 && avg > 0.0 && avg < 1.05)
      assert(nRep >= 0 && nRep <= n)
    }
  }

  test("period_over_period: lag chain is consistent within each series") {
    val rows = q("period_over_period").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    for ((_, series) <- rows.groupBy(_._1)) {
      val ordered = series.sortBy(_._2.toEpochDay)
      assert(ordered.head._4.isEmpty, "first week must have null prev")
      for (Array(a, b) <- ordered.sliding(2).map(_.toArray))
        assert(b._4.contains(a._3), s"prev_cents must equal prior week's cents")
    }
  }

  test("corr_matrix: half matrix, r in [-1, 1], all pairs present") {
    val rows = q("corr_matrix").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.forall { case (a, b, _, _) => a < b })
    assert(rows.forall { case (_, _, _, r) => r >= -1.0 && r <= 1.0 })
    val types = rows.flatMap(p => Seq(p._1, p._2)).distinct.length
    assert(rows.length == types * (types - 1) / 2)
  }

  test("dau_mau: dau <= mau, stickiness in (0, 1]") {
    for (r <- q("dau_mau").collect()) {
      val (dau, mau, st) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dau >= 1 && dau <= mau)
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("time_to_convert: ordering p50 <= p90 <= max, avg within range") {
    val r = q("time_to_convert").head()
    val (n, avg, p50, p90, mx) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
    assert(n > 0)
    assert(p50 <= p90 && p90 * 3600 <= mx + 3600)
    assert(avg >= 0 && avg <= mx)
  }

  test("time_to_convert: forced distributed fallback is bit-identical to the driver-histogram path") {
    // maxHistRows = 1 forces the limit(max+1) probe to overflow, taking the
    // distributed DiscreteQuantile branch; R-7 arithmetic is shared, so the
    // two branches must agree bit-for-bit (the winsorize/ScaleOpsSpec law)
    val a = QueriesMlops.timeToConvert(spark, dir).collect().toSeq
    val b = QueriesMlops.timeToConvert(spark, dir, maxHistRows = 1).collect().toSeq
    assert(a == b, s"driver $a != distributed $b")
  }

  test("daily_percentiles: selection semantics match sorted-array order statistics") {
    val ev = graft.queries.Tables.t(spark, dir, "events")
      .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toLocalDate), r.getLong(2)))
    val byGroup = ev.groupBy(_._1)
    for (r <- q("daily_percentiles").collect()) {
      val key = (r.getString(0), r.getDate(1).toLocalDate)
      val (n, p50, p95) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val sorted = byGroup(key).map(_._2).sorted
      assert(n == sorted.length)
      // smallest value whose running count reaches ceil(p*n) = the
      // ceil(p*n)-th order statistic (1-indexed)
      assert(p50 == sorted(math.ceil(0.5 * n).toInt - 1))
      assert(p95 == sorted(math.ceil(0.95 * n).toInt - 1))
      assert(p50 <= p95)
    }
  }

  test("user_ltv: cumulative curve is the prefix sum of weekly cents, non-decreasing") {
    val rows = q("user_ltv").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((_, series) <- rows.groupBy(_._1)) {
      val ordered = series.sortBy(_._2)
      assert(ordered.map(_._4).scanLeft(0L)(_ + _).tail.toSeq == ordered.map(_._5).toSeq)
      assert(ordered.map(_._5).toSeq == ordered.map(_._5).sorted.toSeq)
      assert(ordered.map(_._3).distinct.length == 1, "cohort size constant per cohort")
    }
  }

  test("chi2_independence: dof matches grid, chi2 non-negative") {
    val r = q("chi2_independence").head()
    val (n, dof, chi2) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(n > 0 && chi2 >= 0.0)
    assert(dof == 4L * 6L, s"5 types x 7 weekdays -> dof 24, got $dof")
  }

  test("audience_overlap: jaccard from independently-recomputed user sets") {
    val ev = graft.queries.Tables.t(spark, dir, "events")
      .where(col("event_type").isNotNull && col("user_id").isNotNull)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sets = ev.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    for (r <- q("audience_overlap").collect()) {
      val (a, b, nBoth, j) = (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      val inter = (sets(a) & sets(b)).size.toLong
      val union = (sets(a) | sets(b)).size
      assert(nBoth == inter)
      assert(j == math.floor(inter.toDouble / union * 1e6 + 0.5) / 1e6)
    }
  }

  test("funnel_conversion: deadline subset of unconstrained conversions, cohorts partition signups") {
    val rows = q("funnel_conversion").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    for ((_, n, c, rate) <- rows) {
      assert(c <= n && rate >= 0.0 && rate <= 1.0)
      assert(rate == math.floor(c.toDouble / n * 1e4 + 0.5) / 1e4)
    }
    // cohorts partition the signup population
    val ev = graft.queries.Tables.t(spark, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull && col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum == ev)
    // 72h-bounded conversions can never exceed the unconstrained funnel
    val ttc = q("time_to_convert").head().getLong(0)
    assert(rows.map(_._3).sum <= ttc)
  }

  test("retention_d7: rate bounded, retained never exceeds either day's actives") {
    val rows = q("retention_d7").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getDouble(3)))
    val actives = rows.map(r => r._1 -> r._2).toMap
    for ((d, a, ret, rate) <- rows) {
      assert(a > 0 && ret >= 0 && ret <= a)
      assert(rate >= 0.0 && rate <= 1.0)
      actives.get(d.plusDays(7)).foreach(a7 => assert(ret <= a7))
      if (!actives.contains(d.plusDays(7))) assert(ret == 0L)
    }
  }

  test("attribution_linear: floor-credit conserves value up to remainder cents") {
    val ev = graft.queries.Tables.t(spark, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull && col("value").isNotNull)
    // conversions with at least one prior-week touch, recomputed directly
    val rows = q("attribution_linear").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall(_._1 != "purchase"))
    assert(rows.forall(r => r._2 > 0 && r._3 >= 0))
    val totalCredit = rows.map(_._3).sum
    val totalPurchaseCents = ev.where(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long"))).head().getLong(0)
    // credited mass can never exceed the total conversion mass
    assert(totalCredit <= totalPurchaseCents, s"$totalCredit > $totalPurchaseCents")
  }

  test("trending_topk: at most k rows per day, counts non-increasing in rank") {
    val rows = graft.queries.QueriesAnalytics.queries("trending_topk")(spark, dir)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(3)))
    for ((_, day) <- rows.groupBy(_._1)) {
      val byRank = day.sortBy(_._2)
      assert(byRank.length <= 3)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq)
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sortBy(-_).toSeq)
    }
  }

  test("sparse_cosine_join: planted exact copies score cosine 1.0, all in (0,1]") {
    val rows = graft.queries.QueriesSim.queries("sparse_cosine_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.forall { case (a, b, c) => a < b && c > 0.0 && c <= 1.0 })
    val exactPairs = rows.filter { case (a, b, _) => a < 100000L && b == a + 100000L }
    assert(exactPairs.nonEmpty, "planted exact copies must surface")
    assert(exactPairs.forall(_._3 == 1.0),
      s"exact copy cosine != 1.0: ${exactPairs.filter(_._3 != 1.0).take(3).toSeq}")
  }

  test("ts_ewma: smoother output bounded by the window's daily-average range") {
    val daily = graft.queries.Tables.t(spark, dir, "events")
      .where(col("value").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(avg("value").as("x"))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate), r.getDouble(2)))
      .toMap
    for (r <- q("ts_ewma").collect()) {
      val (ty, d, e) = (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2))
      val window = (0 to 13).flatMap(j => daily.get((ty, d.minusDays(j))))
      assert(window.nonEmpty)
      assert(e >= window.min - 1e-3 && e <= window.max + 1e-3,
        s"$ty $d: ewma $e outside [${window.min}, ${window.max}]")
    }
  }

  test("ks_drift: D in [0,1], halves partition each series, brute-force agrees") {
    val ev = graft.queries.Tables.t(spark, dir, "events")
      .where(col("event_type").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val perType = ev.groupBy(_._1)
    for (r <- q("ks_drift").collect()) {
      val (ty, na, nb, d) = (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d >= 0.0 && d <= 1.0, s"$ty: D=$d outside [0,1]")
      val rows = perType(ty)
      val (a, b) = rows.partition(_._2 <= mid)
      assert(a.size == na && b.size == nb, s"$ty: halves don't partition")
      // brute-force D over the pooled sorted cents domain
      val dom = rows.map(_._3).distinct.sorted
      val bf = dom.map { c =>
        math.abs(a.count(_._3 <= c).toDouble / na - b.count(_._3 <= c).toDouble / nb)
      }.max
      assert(math.abs(d - bf) < 1e-5, s"$ty: D=$d brute=$bf")
    }
  }

  test("lift_deciles: deciles partition users, cumulative lift ends at exactly 1") {
    val rows = q("lift_deciles").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val users = graft.queries.Tables.t(spark, dir, "events")
      .where(col("user_id").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users)
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1))
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // the cumulative rate over ALL deciles is the overall rate -> lift 1
    assert(rows.last.getDouble(4) == 1.0)
  }

  test("bot_score: sessions partition events, burst/singleton bounds hold") {
    val total = graft.queries.Tables.t(spark, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull).count()
    val rows = q("bot_score").collect()
    assert(rows.map(_.getLong(2)).sum == total, "per-user session events must partition the stream")
    for (r <- rows) {
      val (ns, ne, burst, share, bots) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))
      assert(ns >= 1 && ne >= ns, s"user ${r.getLong(0)}: $ns sessions > $ne events")
      assert(burst >= 1 && burst <= ne)
      assert(share >= 0.0 && share <= 1.0)
      assert(bots >= 0 && bots <= ns)
    }
  }

  test("qq_drift: nine deciles per series, each half's curve is non-decreasing") {
    val rows = q("qq_drift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byType = rows.groupBy(_._1)
    for ((ty, ds) <- byType) {
      val sorted = ds.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to 9L), s"$ty: missing deciles")
      // a CDF inverse is monotone: decile values can never decrease
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq, s"$ty: q_first not monotone")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq, s"$ty: q_second not monotone")
      sorted.foreach { case (_, _, a, b, sh) => assert(sh == b - a) }
    }
  }

  test("ctr_wilson: lower bound below the rate, brute-force formula agrees") {
    for (r <- q("ctr_wilson").collect()) {
      val (ty, n, pos, rate, lb) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(pos >= 0 && pos <= n)
      assert(lb >= 0.0 && lb <= rate + 1e-9, s"$ty: lb $lb above rate $rate")
      val p = pos.toDouble / n; val z = 1.96; val nn = n.toDouble
      val bf = (p + z * z / (nn * 2) -
        z * math.sqrt(p * (1 - p) / nn + z * z / (nn * nn * 4))) / (1 + z * z / nn)
      assert(math.abs(lb - bf) < 1e-5, s"$ty: $lb vs brute $bf")
    }
  }

  test("ab_cuped second moments stay exact (< 2^53) at the largest swept SF") {
    // the ab_cuped comment claims the DOUBLE-accumulated Σxy/Σx²/Σy² are
    // exact at every test SF — pin that assumption so a future scale-up
    // fails LOUDLY here instead of producing a last-ulp oracle mismatch.
    // sf0.1 is the largest locally swept scale (Bench + the 10×/100×
    // sweeps); the headroom factor shows how far the claim extrapolates.
    val mid = expr("TIMESTAMP '2024-01-16 00:00:00'")
    val per = graft.queries.Tables.t(spark, "/root/testdata/sf0.1", "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < mid, col("cents")).otherwise(0L)).as("x"),
        sum(when(col("ts") >= mid, col("cents")).otherwise(0L)).as("y"))
    val m = per.agg(
        sum(abs(col("x").cast("double") * col("y"))).as("sxy"),
        sum(col("x").cast("double") * col("x")).as("sxx"),
        sum(col("y").cast("double") * col("y")).as("syy"))
      .head()
    val worst = Seq(m.getDouble(0), m.getDouble(1), m.getDouble(2)).max
    val bound = math.pow(2.0, 53)
    assert(worst < bound,
      f"CUPED second moment $worst%.3e exceeds 2^53 — double accumulation no longer exact")
    // require real headroom, not a near-miss: ≥ 16× before the claim breaks
    assert(worst * 16 < bound, f"CUPED 2^53 headroom nearly exhausted: $worst%.3e")
  }

  test("split_leakage: train + test - leaking = distinct users per type") {
    val perType = graft.queries.Tables.t(spark, dir, "events")
      .where(col("event_type").isNotNull && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for (r <- q("split_leakage").collect()) {
      val (ty, tr, te, lk) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      // every user is in at least one side; straddlers counted once each side
      assert(tr + te - lk == perType(ty), s"$ty: $tr+$te-$lk != ${perType(ty)}")
      assert(lk <= math.min(tr, te), s"$ty: leaking $lk exceeds a side")
    }
  }
}
