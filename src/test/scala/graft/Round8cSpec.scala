package graft

import org.apache.spark.sql.functions._

/** Round-8 additions, batch 3: lm_kneser_ney (interpolated KN bigram LM)
  * and did_estimator (difference-in-differences) — each checked against a
  * from-scratch driver recompute with plain Scala loops.
  */
class Round8cSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("lm_kneser_ney: matches a from-scratch driver interpolated-KN scorer") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val trainToks = docs.filter(_._1 >= 50).map(d => toks(d._2))
    val c2 = trainToks.flatMap(tk => tk.zip(tk.tail))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    // everything else derives from the bigram table, like the query
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1fw = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val n1bw = c2.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val n1all = c2.size.toLong
    val vcont = n1bw.size.toLong
    def pcont(w2: String): Double =
      (n1bw.getOrElse(w2, 0L) + 1).toDouble / (n1all + vcont + 1)
    val expected = docs.filter(_._1 < 50).map { case (id, tx) =>
      val tk = toks(tx)
      val scores = tk.zip(tk.tail).map { case (w1, w2) =>
        c1.get(w1) match {
          case Some(cw1) =>
            val disc = math.max(c2.getOrElse((w1, w2), 0L).toDouble - 0.75, 0.0)
            (math.log(disc / cw1 + 0.75 * n1fw(w1) / cw1 * pcont(w2)), false)
          case None => (math.log(pcont(w2)), true)
        }
      }
      val nb = scores.length.toLong
      (id, nb,
        BigDecimal(scores.map(s => math.floor(s._1 * 1e6 + 0.5).toLong).sum.toDouble
          / nb / 1e6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(scores.count(_._2).toDouble / nb)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = graft.queries.QueriesText.queries("lm_kneser_ney")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // KN is a proper conditional distribution over seen histories: for a
    // few train histories, the discounted mass + interpolation weight sums
    // to ≤ 1 over the SEEN continuations (the remainder goes to unseen)
    c1.keys.take(5).foreach { w1 =>
      val seenMass = c2.collect { case ((a, b), c) if a == w1 =>
        math.max(c - 0.75, 0.0) / c1(w1) + 0.75 * n1fw(w1) / c1(w1) * pcont(b)
      }.sum
      assert(seenMass <= 1.0 + 1e-9, s"history '$w1' leaks probability mass")
    }
  }

  test("did_estimator: matches an exact driver 2x2 recompute") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val cutUs = java.time.Instant.parse("1995-06-01T00:00:00Z").getEpochSecond * 1000000L
    val cells = orders.map { case (ck, tp, us) =>
      (ck % 3 == 0, us >= cutUs, math.round(tp * 100))
    }
    def cell(tr: Boolean, po: Boolean): (Long, Long) = {
      val xs = cells.filter(c => c._1 == tr && c._2 == po)
      (xs.length.toLong, xs.map(_._3).sum)
    }
    val (ncr, scr) = cell(tr = false, po = false)
    val (ncp, scp) = cell(tr = false, po = true)
    val (ntr, str) = cell(tr = true, po = false)
    val (ntp, stp) = cell(tr = true, po = true)
    def mean(s: Long, n: Long): Double =
      math.floor(s.toDouble / (1e2 * n) * 1e4 + 0.5) / 1e4
    val did = math.floor(((stp.toDouble / (1e2 * ntp) - str.toDouble / (1e2 * ntr)) -
      (scp.toDouble / (1e2 * ncp) - scr.toDouble / (1e2 * ncr))) * 1e4 + 0.5) / 1e4
    val got = graft.queries.QueriesMlops.queries("did_estimator")(spark, dir).head()
    assert(got.getLong(0) == ncr && got.getLong(1) == ncp &&
      got.getLong(2) == ntr && got.getLong(3) == ntp)
    assert(got.getDouble(4) == mean(scr, ncr) && got.getDouble(5) == mean(scp, ncp))
    assert(got.getDouble(6) == mean(str, ntr) && got.getDouble(7) == mean(stp, ntp))
    assert(got.getDouble(8) == did)
    // the estimator nets out the common trend: did = (Δtreat − Δctrl)
    val recomposed = BigDecimal(
      (got.getDouble(7) - got.getDouble(6)) - (got.getDouble(5) - got.getDouble(4)))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP)
    assert((recomposed - BigDecimal(got.getDouble(8))).abs <= BigDecimal("0.001"))
  }

  test("conformal_pi: matches an exact driver split-conformal recompute") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    val byPrio = orders.groupBy(_._2)
    val expected = byPrio.toSeq.map { case (prio, rows) =>
      val train = rows.filter(_._1 % 4 <= 1)
      val cal = rows.filter(_._1 % 4 == 2)
      val test = rows.filter(_._1 % 4 == 3)
      val pred = train.map(_._3).sum / train.length // integer division
      val resid = cal.map(r => math.abs(r._3 - pred)).sorted
      val k = math.min((9 * (cal.length + 1) + 9) / 10, cal.length)
      val q = resid(k - 1) // k-th smallest
      val nIn = test.count(r => math.abs(r._3 - pred) <= q)
      (prio, train.length.toLong, cal.length.toLong, test.length.toLong,
        pred, q,
        BigDecimal(nIn.toDouble / test.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = graft.queries.QueriesMlops.queries("conformal_pi")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expected)
    // the conformal radius must cover at least k of the calibration
    // residuals and fewer than k lie strictly below it (selection law)
    expected.foreach { case (prio, _, nCal, _, pred, q, _) =>
      val resid = orders.filter(r => r._2 == prio && r._1 % 4 == 2)
        .map(r => math.abs(r._3 - pred))
      val k = math.min((9 * (nCal + 1) + 9) / 10, nCal)
      assert(resid.count(_ <= q) >= k && resid.count(_ < q) < k)
    }
  }

  test("ts_holt: matches a driver replay of the level/trend recurrence") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .where(col("ts").isNotNull && col("value").isNotNull)
      .select(to_date(col("ts").cast("timestamp")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val daily = ev.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var l = 0.0; var b = 0.0
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val expected = daily.zipWithIndex.map { case ((day, cents), i) =>
      val y = cents.toDouble
      val fit =
        if (i == 0) { l = y; b = 0.0; None }
        else {
          val f = l + b
          val lNew = 0.2 * y + 0.8 * (l + b)
          b = 0.1 * (lNew - l) + 0.9 * b
          l = lNew
          Some(f)
        }
      (day, cents, fit.map(r4), r4(l), r4(b))
    }
    val got = graft.queries.QueriesMlops.queries("ts_holt")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // one-step-forecast law: each fitted value is the previous row's
    // (level + trend), up to the independent output rounding
    got.sliding(2).foreach { case Seq(prev, cur) =>
      cur._3.foreach(f => assert(math.abs(f - (prev._4 + prev._5)) < 2e-4))
    }
  }

  test("dp_histogram: matches a driver Laplace-mechanism recompute") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_nationkey")).collect().map(_.getInt(0).toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = cust.groupBy(identity).toSeq.map { case (nk, xs) =>
      val hex = md.digest(s"dp:$nk".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h.toDouble + 0.5) / 16777216.0
      val a = u - 0.5
      val raw = -(if (a >= 0) 1.0 else -1.0) * math.log(1.0 - 2.0 * math.abs(a))
      val noise = math.floor(raw * 1e4 + 0.5) / 1e4
      val released = math.max(math.floor(xs.length + noise + 0.5).toLong, 0L)
      (nk, xs.length.toLong, noise, released)
    }.sortBy(_._1)
    val got = graft.queries.QueriesAnalytics.queries("dp_histogram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == expected)
    // Laplace(1) bounds under a 24-bit uniform: |noise| ≤ ln(2^24) ≈ 16.64
    got.foreach { case (_, _, noise, rel) =>
      assert(math.abs(noise) <= 16.65 && rel >= 0L)
    }
  }

  test("attribution_markov: matches an independent journey rebuild and solve") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // independent journey construction: sort per user, truncate at first
    // purchase, emit start/terminal edges
    val trans = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    ev.groupBy(_._1).values.foreach { rows =>
      val seq0 = rows.sortBy(r => (r._3, r._4)).map(_._2).toSeq
      val fp = seq0.indexOf("purchase")
      val seq = (if (fp >= 0) seq0.take(fp + 1) else seq0)
        .map(t => if (t == "purchase") "conv" else t)
      trans += (("start", seq.head))
      seq.zip(seq.tail).foreach { case (a, b) => trans += ((a, b)) }
      if (seq.last != "conv") trans += ((seq.last, "null"))
    }
    val m = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = m.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val p6 = m.map { case ((f, t), n) => ((f, t), n * 1000000L / tot(f)) }
    val states = tot.keys.toSeq.sorted
    val chans = m.keys.map(_._2).filter(c => c != "conv" && c != "null").toSeq.distinct.sorted
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
    val nconv = m.collect { case ((_, "conv"), n) => n }.sum
    val diffs = chans.map(c => (c, vb - solve(c)))
    val dtot = diffs.map(_._2).sum
    val expected = diffs.map { case (c, dc) =>
      (c, math.floor((dc.toDouble / vb) * 1e6 + 0.5) / 1e6,
        math.floor(dc.toDouble / dtot * 1e6 + 0.5) / 1e6,
        math.floor(dc.toDouble * nconv / dtot * 1e2 + 0.5) / 1e2)
    }
    val got = graft.queries.QueriesMlops.queries("attribution_markov")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // attribution laws: shares partition the credit, removal effects are
    // probabilities, attributed conversions re-sum to ~all conversions
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4)
    got.foreach { case (_, re, sh, _) =>
      assert(re >= 0.0 && re <= 1.0 && sh >= 0.0 && sh <= 1.0)
    }
    assert(math.abs(got.map(_._4).sum - nconv) < 0.1 * nconv)
  }

  test("neyman_alloc: matches a driver allocation recompute") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    val m = cust.groupBy(_._1).toSeq.map { case (seg, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sxx = xs.map(x => x._2.toDouble * x._2).sum
      val sd = math.sqrt((n.toDouble * sxx - sx.toDouble * sx) / (n.toDouble * (n - 1)))
      (seg, n, sx, sd, math.floor(n * sd + 0.5).toLong)
    }.sortBy(_._1)
    val nTot = m.map(_._2).sum
    val wTot = m.map(_._5).sum
    val expected = m.map { case (seg, n, sx, sd, w) =>
      (seg, n,
        math.floor(sx / (1e2 * n) * 1e4 + 0.5) / 1e4,
        math.floor(sd / 1e2 * 1e4 + 0.5) / 1e4,
        math.floor(1000e0 * w / wTot + 0.5).toLong,
        math.floor(1000e0 * n / nTot + 0.5).toLong)
    }
    val got = graft.queries.QueriesScale.queries("neyman_alloc")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the optimality direction: relative to proportional, Neyman moves
    // budget toward higher-variance strata — so the ordering of
    // (neyman − prop) must follow the ordering of sd
    val bySd = got.sortBy(r => expected.find(_._1 == r._1).get._4)
    val deltas = bySd.map(r => r._5 - r._6)
    assert(deltas.last >= deltas.head,
      "highest-variance stratum must not lose budget relative to the lowest")
    // budgets land within rounding of the 1000 target
    assert(math.abs(got.map(_._5).sum - 1000L) <= got.length)
    assert(math.abs(got.map(_._6).sum - 1000L) <= got.length)
  }

  test("simpson_check: matches a driver recompute with exact sign laws") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(o => cust.contains(o._1))
    val per = orders.groupBy(o => cust(o._1)).toSeq.map { case (seg, xs) =>
      val a = xs.filter(_._1 % 2 == 0); val b = xs.filter(_._1 % 2 != 0)
      def hi(ys: Array[(Long, String)]) =
        ys.count(y => y._2 == "1-URGENT" || y._2 == "2-HIGH").toLong
      (seg, a.length.toLong, hi(a), b.length.toLong, hi(b))
    }.sortBy(_._1)
    val (pa, na, pb, nb) = (per.map(_._3).sum, per.map(_._2).sum,
      per.map(_._5).sum, per.map(_._4).sum)
    val pooledSign = math.signum(pa.toDouble * nb - pb.toDouble * na).toLong
    val expected = per.map { case (seg, nA, posA, nB, posB) =>
      val segSign = math.signum(posA.toDouble * nB - posB.toDouble * nA).toLong
      (seg, nA, posA, nB, posB,
        math.floor(posA.toDouble / nA * 1e6 + 0.5) / 1e6,
        math.floor(posB.toDouble / nB * 1e6 + 0.5) / 1e6,
        segSign, pooledSign, segSign * pooledSign < 0)
    }
    val got = graft.queries.QueriesMlops.queries("simpson_check")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getLong(7), r.getLong(8),
        r.getBoolean(9))).toSeq
    assert(got == expected)
    // sign law: a flagged reversal means the rate gap genuinely flips
    got.foreach { g =>
      if (g._10) assert((g._6 - g._7) * pooledSign < 0)
    }
  }

  test("cem_att: matches a driver coarsened-matching recompute") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) / 2500e0).toLong))
    val spend = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val cells = cust.map { case (ck, seg, bin) =>
      ((seg, bin), ck % 3 == 0, spend.getOrElse(ck, 0L))
    }.groupBy(_._1).toSeq.map { case ((seg, bin), xs) =>
      val t = xs.filter(_._2); val c = xs.filter(!_._2)
      val (nT, sT) = (t.length.toLong, t.map(_._3).sum)
      val (nC, sC) = (c.length.toLong, c.map(_._3).sum)
      val matched = nT > 0 && nC > 0
      val c6 = if (matched)
        math.floor((sT.toDouble / nT - sC.toDouble / nC) * nT * 1e6 + 0.5).toLong
      else 0L
      (seg, bin, nT, sT, nC, sC, matched, c6)
    }.sortBy(x => (x._1, x._2))
    val ntM = cells.filter(_._7).map(_._3).sum
    val c6Tot = cells.map(_._8).sum
    val att = math.floor(c6Tot.toDouble / ntM / 1e6 / 1e2 * 1e4 + 0.5) / 1e4
    val expected = cells.map { case (seg, bin, nT, sT, nC, sC, matched, _) =>
      (seg, bin, nT, nC, matched,
        if (nT > 0) Some(math.floor(sT.toDouble / (1e2 * nT) * 1e4 + 0.5) / 1e4) else None,
        if (nC > 0) Some(math.floor(sC.toDouble / (1e2 * nC) * 1e4 + 0.5) / 1e4) else None,
        att)
    }
    val got = graft.queries.QueriesMlops.queries("cem_att")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)),
        r.getDouble(7))).toSeq
    assert(got == expected)
    // the ATT is a convex-ish recombination of matched per-cell gaps:
    // it must lie within the [min, max] matched-cell mean difference
    val gaps = got.filter(_._5).flatMap(g => for (a <- g._6; b <- g._7) yield a - b)
    assert(att >= gaps.min - 1e-3 && att <= gaps.max + 1e-3)
  }

  test("power_analysis: matches a driver sample-size recompute") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .where(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .select(col("event_type"), col("value"), col("user_id")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2)))
    val expected = ev.groupBy(_._1).toSeq.map { case (typ, xs) =>
      val nA = xs.count(_._3 % 2 == 0).toLong
      val nB = xs.count(_._3 % 2 != 0).toLong
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sxx = xs.map(x => x._2.toDouble * x._2).sum
      val varc = (n.toDouble * sxx - sx.toDouble * sx) / (n.toDouble * (n - 1))
      val meanc = sx.toDouble / n
      val nReq = math.ceil(2e0 * varc *
        ((1.959964 + 0.841621) * (1.959964 + 0.841621)) /
        ((0.05 * meanc) * (0.05 * meanc))).toLong
      (typ, nA, nB,
        math.floor(meanc * 1e4 + 0.5) / 1e4,
        math.floor(varc * 1e4 + 0.5) / 1e4,
        nReq, math.min(nA, nB) >= nReq)
    }.sortBy(_._1)
    val got = graft.queries.QueriesMlops.queries("power_analysis")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(got == expected)
    // the formula's monotonicity: higher variance relative to MDE² means
    // more samples required — recompute with a doubled MDE and check 4x↓
    expected.foreach { case (_, _, _, mean, v, nReq, _) =>
      val relaxed = math.ceil(2e0 * v *
        ((1.959964 + 0.841621) * (1.959964 + 0.841621)) /
        ((0.10 * mean) * (0.10 * mean))).toLong
      assert(relaxed <= nReq / 4 + 1)
    }
  }

  test("hll_incremental: state is base-era-only, built once, and merge is lossless") {
    import graft.functions.TextFns
    val got = graft.queries.QueriesScale.queries("hll_incremental")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.forall(_._4 == 0L),
      "every sketch estimate within tolerance (est_err_units = 0)")
    // the persisted state holds ONLY the base era's mass
    val statePath = graft.operators.DiskCache.keyedPath(
      "hllstate_v1", s"$dir/documents.parquet")
    val docs = graft.queries.Tables.t(spark, dir, "documents")
    val baseTok = docs.where(col("doc_id") < 400)
      .select(explode(TextFns.tokens(col("text"))).as("t")).count()
    val stateTok = spark.read.parquet(statePath)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(stateTok == baseTok, "state must cover exactly the base era")
    // built once: a second invocation leaves the state files untouched
    val stamp = new java.io.File(statePath).lastModified()
    graft.queries.QueriesScale.queries("hll_incremental")(spark, dir).collect()
    assert(new java.io.File(statePath).lastModified() == stamp)
    // lossless merge: union-of-era-sketches estimates = single-pass sketch
    val tok = docs.select(col("source"), explode(TextFns.tokens(col("text"))).as("token"))
    val single = tok.groupBy(col("source"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("token"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val eras = docs.withColumn("era", col("doc_id") < 400)
      .select(col("source"), col("era"), explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("era"))
      .agg(hll_sketch_agg(col("token")).as("sk"))
      .groupBy(col("source"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eras == single, "HLL union of era sketches must be lossless")
  }

  test("fdr_bh: matches a driver Welch-z + A&S-tail + step-up recompute") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .where(col("value").isNotNull && col("event_type").isNotNull &&
        col("user_id").isNotNull)
      .select(col("event_type"), col("value"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def welchZ(xs: Array[Double], ys: Array[Double]): Double = {
      def mv(a: Array[Double]) = {
        val m = a.sum / a.length
        (m, a.map(x => (x - m) * (x - m)).sum / (a.length - 1))
      }
      val (ma, va) = mv(xs); val (mb, vb) = mv(ys)
      (ma - mb) / math.sqrt(va / xs.length + vb / ys.length)
    }
    val zs = ev.groupBy(_._1).toSeq.map { case (typ, xs) =>
      val a = xs.filter(_._3 % 2 == 0).map(_._2)
      val b = xs.filter(_._3 % 2 != 0).map(_._2)
      (typ, BigDecimal(welchZ(a, b)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val withP = zs.map { case (typ, z) =>
      val az = math.abs(z)
      val tq = 1e0 / (1e0 + 0.2316419 * az)
      val tail = math.exp(-az * az / 2e0) * 0.3989422804014327 *
        (0.319381530 * tq - 0.356563782 * (tq * tq) + 1.781477937 * (tq * tq * tq) -
          1.821255978 * ((tq * tq) * (tq * tq)) +
          1.330274429 * ((tq * tq) * ((tq * tq) * tq)))
      (typ, z, math.floor(2e0 * tail * 1e6 + 0.5).toLong)
    }
    val m = withP.length.toLong
    val ranked = withP.sortBy(x => (x._3, x._1)).zipWithIndex
      .map { case ((typ, z, p6), i) => (typ, z, p6, (i + 1).toLong) }
    val kstar = ranked.filter(r => r._3 * 20 * m <= r._4 * 1000000L)
      .map(_._4).maxOption.getOrElse(0L)
    val expected = ranked.map { case (typ, z, p6, k) =>
      (typ, z, p6.toDouble / 1e6, k,
        math.floor(k.toDouble / (20e0 * m) * 1e6 + 0.5) / 1e6, k <= kstar)
    }.sortBy(_._1)
    val got = graft.queries.QueriesAnalytics.queries("fdr_bh")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got == expected)
    // step-up law: the reject set is exactly the rank prefix up to the
    // LAST rank whose p-value clears its own BH line (later ranks may dip
    // under their lines and still be rejected-free only above k*)
    val byRank = got.sortBy(_._4)
    assert(byRank.takeWhile(_._6).length == byRank.count(_._6))
    byRank.filter(_._6).foreach(r => assert(r._4 <= kstar))
    // A&S accuracy: spot-check the tail against a brute-force numerical
    // integration of the standard normal density
    got.foreach { case (_, z, p, _, _, _) =>
      val az = math.abs(z)
      val grid = 200000
      val hi = az + 12.0
      val h = (hi - az) / grid
      val dens = (x: Double) => math.exp(-x * x / 2) * 0.3989422804014327
      val integral = (1 to grid).map(i => dens(az + (i - 0.5) * h) * h).sum
      assert(math.abs(p - 2 * integral) < 5e-6, s"A&S tail off for z=$z")
    }
  }

  test("winnowing_pairs: matches a driver winnowing replay; planted dups found") {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 25 === 0).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = base ++ base.map(d => (d._1 + 100000L, d._2)) ++
      base.map(d => (d._1 + 200000L, d._2 + " xtra xtra"))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h40(s2: String): Long = java.lang.Long.parseLong(
      md.digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(10), 16)
    // independent winnowing: explicit window scan with the rightmost-tie rule
    val fps = corpus.map { case (id, text) =>
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val grams = tk.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toArray
      val sel = scala.collection.mutable.Set.empty[Long]
      for (i <- 0 to grams.length - 4) {
        val win = (i until i + 4).map(j => (h40(grams(j)), j))
        // min hash, ties to the RIGHTMOST position
        val best = win.minBy(x => (x._1, -x._2))
        sel += best._1
      }
      id -> sel.toSet
    }.toMap
    val dfOk = fps.values.flatten.groupBy(identity).view
      .mapValues(_.size).filter(_._2 <= 50).keySet
    val ids = fps.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      shared = (fps(a) intersect fps(b)).count(dfOk)
      if shared >= 8
    } yield (a, b, shared.toLong)).sortBy(x => (x._1, x._2))
    val got = graft.queries.QueriesDedup.queries("winnowing_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // the local-similarity guarantee on planted duplicates: every exact
    // copy pairs with its base, and every near copy (token-level suffix
    // edit) still pairs — MinHash-style whole-doc thresholds can miss
    // partial overlap, winnowing must not
    val gotSet = got.map(p => (p._1, p._2)).toSet
    base.map(_._1).foreach { id =>
      if (fps(id).count(dfOk) >= 8) {
        assert(gotSet.contains((id, id + 100000L)), s"exact pair missed for $id")
        assert(gotSet.contains((id, id + 200000L)), s"near pair missed for $id")
      }
    }
  }

  test("rendezvous_resize: matches a driver HRW replay; minimal disruption") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s2: String) =
      md.digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shard(id: Long, n: Int): Long =
      (0 until n).map(s2 => md5hex(s"$id:$s2") -> s2).max._2.toLong
    val assign = ids.map(id => (shard(id, 16), shard(id, 17)))
    val expected = assign.groupBy(_._1).toSeq.map { case (s16, xs) =>
      val moved = xs.count(x => x._1 != x._2).toLong
      (s16, xs.length.toLong, moved,
        xs.count(x => x._1 != x._2 && x._2 != 16).toLong,
        math.floor(moved.toDouble / xs.length * 1e4 + 0.5) / 1e4)
    }.sortBy(_._1)
    val got = graft.queries.QueriesScale.queries("rendezvous_resize")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // HRW's whole point: nothing moves except into the NEW shard, and the
    // moved mass is in the neighborhood of 1/17
    assert(got.forall(_._4 == 0L), "keys moved between OLD shards")
    val movedShare = got.map(_._3).sum.toDouble / got.map(_._2).sum
    assert(movedShare > 0.02 && movedShare < 0.12,
      s"moved share $movedShare far from 1/17")
  }

  test("bitmap_distinct: matches exact driver distincts; rollup never rescans") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(to_date(col("ts").cast("timestamp")).as("day"), col("user_id"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val days = ev.groupBy(_._1).toSeq
      .map { case (d, xs) => (d, xs.map(_._2).distinct.length.toLong) }
    val months = ev.groupBy(_._1.substring(0, 7)).toSeq
      .map { case (m, xs) => (m, xs.map(_._2).distinct.length.toLong) }
    val expected = (days ++ months).sortBy(_._1)
    val got = graft.queries.QueriesScale.queries("bitmap_distinct")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
    // the bitmap OR rollup is exact (not a sketch): month distinct must be
    // bounded by the day sum and reach at least the biggest day
    val dayByMonth = days.groupBy(_._1.substring(0, 7))
    months.foreach { case (m, n) =>
      val ds = dayByMonth(m).map(_._2)
      assert(n <= ds.sum && n >= ds.max)
    }
  }

  test("golden_record: matches a driver survivorship replay over er entities") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3), r.getString(4)))
    val dirty = cust ++ cust.map { case (k, n, nk, ab, seg) =>
      (k + 500000L, "K" + n.substring(1), nk, ab + 0.37, seg) }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    dirty.groupBy(r => (r._3, math.floor(r._4 / 100.0).toLong)).values.foreach { recs =>
      val arr = recs.toArray
      for (i <- arr.indices; j <- arr.indices; if arr(i)._1 < arr(j)._1) {
        val a = arr(i); val b = arr(j)
        val score = (if (lev(a._2, b._2) <= 1) 30L else -10L) +
          (if (math.abs(a._4 - b._4) < 1.0) 15L else -5L) +
          (if (a._5 == b._5) 10L else -8L)
        if (score >= 45L) {
          val ra = find(a._1); val rb = find(b._1)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
    }
    val byId = dirty.map(r => r._1 -> r).toMap
    val expected = dirty.groupBy(r => find(r._1)).toSeq.map { case (comp, members) =>
      val canon = byId(members.map(_._1).min)
      (comp, members.length.toLong, canon._2, canon._5,
        math.round(members.map(_._4).max * 100))
    }.sortBy(_._1)
    val got = graft.queries.QueriesAnalytics.queries("golden_record")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)) == expected)
    // survivorship laws: canonical ids are real records, entities
    // partition the dirty universe, merge flag ⟺ size
    assert(got.map(_._2).sum == dirty.length.toLong)
    got.foreach { g =>
      assert(byId.contains(g._1) && (g._6 == (g._2 > 1)))
      assert(byId(g._1)._2 == g._3, "name must survive from the canonical member")
    }
  }

  test("prefix_cache_stats: matches a driver prefix-hash replay") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val preamble = "you are a helpful assistant follow the rules answer " +
      "briefly cite sources stay safe be kind"
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s2: String) =
      md.digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val perDoc = docs.map { case (_, lang, text) =>
      (preamble + " " + (lang + " ") * 8 + text)
        .toLowerCase.split("\\s+").filter(_.nonEmpty).take(64)
    }
    val expected = (0 to 3).map { idx =>
      val need = (idx + 1) * 16
      val pfx = perDoc.filter(_.length >= need).map(tk => md5hex(tk.take(need).mkString(" ")))
      val n = pfx.length.toLong; val d = pfx.distinct.length.toLong
      (idx.toLong, n, d, n - d, (n - d) * 16L,
        math.floor((n - d).toDouble / n * 1e4 + 0.5) / 1e4)
    }
    val got = graft.queries.QueriesPipeline.queries("prefix_cache_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected)
    // caching laws: the shared system preamble makes block 0 a single
    // prefix; eligible docs shrink with depth; hits = docs − prefixes
    assert(got.head._3 == 1L, "block 0 must collapse to the one system prefix")
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
    got.foreach(g => assert(g._4 == g._2 - g._3))
  }

  test("growth_accounting: matches a driver replay and conserves WAU") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s2: String) =
      md.digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val day0 = java.time.LocalDate.parse("2024-01-01")
    val uw = spark.read.parquet(s"$dir/events.parquet")
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts").cast("timestamp")).as("d"))
      .collect()
      .map(r => (r.getLong(0),
        java.time.temporal.ChronoUnit.DAYS.between(day0, r.getDate(1).toLocalDate) / 7))
      .distinct
      .filter { case (u, w) => md5hex(s"ga:$u:$w").head.isDigit }
    val events = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    uw.groupBy(_._1).values.foreach { rows =>
      val wks = rows.map(_._2).sorted
      wks.zipWithIndex.foreach { case (w, i) =>
        if (i == 0) events += ((w, "new"))
        else if (wks(i - 1) == w - 1) events += ((w, "retained"))
        else events += ((w, "resurrected"))
        if (i == wks.length - 1 || wks(i + 1) > w + 1) events += ((w + 1, "churned"))
      }
    }
    val expected = events.groupBy(_._1).toSeq.map { case (w, xs) =>
      (w, xs.count(_._2 == "new").toLong, xs.count(_._2 == "retained").toLong,
        xs.count(_._2 == "resurrected").toLong, xs.count(_._2 == "churned").toLong)
    }.sortBy(_._1)
    val got = graft.queries.QueriesMlops.queries("growth_accounting")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // conservation: active(w) = active(w−1) + new + resurrected − churned,
    // with active(w) = new + retained + resurrected
    val active = got.map(g => g._1 -> (g._2 + g._3 + g._4)).toMap
    got.foreach { g =>
      val prev = active.getOrElse(g._1 - 1, 0L)
      assert(active.getOrElse(g._1, 0L) == prev + g._2 + g._4 - g._5,
        s"WAU identity broken at week ${g._1}")
    }
    // all four quadrants carry signal in the thinned log
    assert(got.map(_._2).sum > 0 && got.map(_._3).sum > 0 &&
      got.map(_._4).sum > 0 && got.map(_._5).sum > 0)
  }

  test("er_blocking_quality: matches a driver recompute of RR and PC") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getInt(2 - 1), r.getDouble(2)))
    val dirty = cust.map(c => (c._1, c._2, c._3, false)) ++
      cust.map(c => (c._1 + 500000L, c._2, c._3 + 0.37, true))
    def blk(b: Double) = math.floor(b / 100.0).toLong
    val blocks = dirty.groupBy(d => (d._2, blk(d._3))).view.mapValues(_.length.toLong)
    val cand = blocks.values.map(n => n * (n - 1) / 2).sum
    val nTot = dirty.length.toLong
    val total = nTot * (nTot - 1) / 2
    val nTrue = cust.length.toLong
    val nFound = cust.count(c => blk(c._3) == blk(c._3 + 0.37)).toLong
    val rr = math.floor((1e0 - cand.toDouble / total) * 1e6 + 0.5) / 1e6
    val pc = math.floor(nFound.toDouble / nTrue * 1e6 + 0.5) / 1e6
    val got = graft.queries.QueriesAnalytics.queries("er_blocking_quality")(spark, dir).head()
    assert(got.getLong(0) == blocks.size.toLong && got.getLong(1) == cand)
    assert(got.getLong(2) == total && got.getLong(3) == nTrue && got.getLong(4) == nFound)
    assert(got.getDouble(5) == rr && got.getDouble(6) == pc)
    // blocking must be worth having: huge reduction, small recall loss
    assert(rr > 0.9, "blocking should prune >90% of the pair space")
    assert(pc > 0.9, "blocking should keep >90% of true matches")
  }

  test("kanon_generalize: matches a driver lattice walk") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val widths = Seq(100L, 500L, 2500L, 12500L)
    val per = widths.map { w =>
      val sizes = cust.groupBy(c => (c._1, math.floor(c._2 / w.toDouble).toLong))
        .map(_._2.length.toLong)
      (w, sizes.size.toLong, sizes.min, sizes.count(_ < 10L).toLong)
    }
    val best = per.filter(_._3 >= 10L).map(_._1).minOption
    val expected = per.map { case (w, nc, mn, nv) =>
      (w, nc, mn, nv, mn >= 10L, best.contains(w))
    }
    val got = graft.queries.QueriesAnalytics.queries("kanon_generalize")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5))).toSeq
    assert(got == expected)
    // lattice monotonicity: coarser widths never shrink the worst class
    assert(got.map(_._3) == got.map(_._3).sorted)
    assert(got.count(_._6) <= 1, "at most one chosen width")
  }

  test("ab_sequential: matches a driver mSPRT replay; monotone in evidence") {
    val day0 = java.time.LocalDate.parse("2024-01-01")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .where(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), col("value"), col("user_id"),
        to_date(col("ts").cast("timestamp")).as("d")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2) % 2 == 0,
        java.time.temporal.ChronoUnit.DAYS.between(day0, r.getDate(3).toLocalDate) / 7))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (typ, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sxx = xs.map(x => x._2.toDouble * x._2).sum
      val sig2 = (n.toDouble * sxx - sx.toDouble * sx) / (n.toDouble * (n - 1))
      val weeks = xs.map(_._4).distinct.sorted
      weeks.map { w =>
        val cum = xs.filter(_._4 <= w)
        val a = cum.filter(_._3); val b = cum.filter(!_._3)
        val (cna, cnb) = (a.length.toLong, b.length.toLong)
        val dh = a.map(_._2).sum.toDouble / cna - b.map(_._2).sum.toDouble / cnb
        val v = sig2 * (1e0 / cna + 1e0 / cnb)
        val llr = 0.5e0 * math.log(v / (v + sig2)) + dh * dh * sig2 / (2e0 * v * (v + sig2))
        val llr6 = math.floor(llr * 1e6 + 0.5).toLong
        (typ, w, cna, cnb, llr6.toDouble / 1e6, llr6 >= 2995732L)
      }
    }.sortBy(x => (x._1, x._2))
    val got = graft.queries.QueriesMlops.queries("ab_sequential")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got == expected)
    // mixture-LR structure: logΛ = ½ln(V/(V+σ²)) + (a nonnegative term),
    // so every row is bounded below by its own mixture-shrinkage constant
    // (the always-valid guarantee itself is per-EXPERIMENT probabilistic —
    // a lucky tiny-sample parity split may legitimately cross ln(20))
    val sig2ByType = ev.groupBy(_._1).view.mapValues { xs =>
      val n = xs.length.toLong; val sx = xs.map(_._2).sum
      val sxx = xs.map(x => x._2.toDouble * x._2).sum
      (n.toDouble * sxx - sx.toDouble * sx) / (n.toDouble * (n - 1))
    }.toMap
    got.foreach { g =>
      val v = sig2ByType(g._1) * (1e0 / g._3 + 1e0 / g._4)
      val floor6 = 0.5e0 * math.log(v / (v + sig2ByType(g._1)))
      assert(g._5 >= floor6 - 1e-6, s"logΛ under its mixture floor for ${g._1}")
    }
  }

  test("policy_replay: matches a driver replay estimator recompute") {
    val cutUs = java.time.Instant.parse("2024-01-16T00:00:00Z").getEpochSecond * 1000000L
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .where(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), col("value"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        r.getLong(2) % 2 == 0, r.getLong(3) < cutUs))
    val expected = ev.groupBy(_._1).toSeq.map { case (typ, xs) =>
      val fh = xs.filter(_._4)
      val a = fh.filter(_._3); val b = fh.filter(!_._3)
      val pickA = a.map(_._2).sum.toDouble * b.length >=
        b.map(_._2).sum.toDouble * a.length
      val sh = xs.filter(!_._4)
      val matched = sh.filter(_._3 == pickA)
      (typ, if (pickA) "A" else "B", sh.length.toLong, matched.length.toLong,
        math.floor(matched.length.toDouble / sh.length * 1e4 + 0.5) / 1e4,
        math.floor(matched.map(_._2).sum.toDouble / (1e2 * matched.length) * 1e4 + 0.5) / 1e4,
        math.floor(sh.map(_._2).sum.toDouble / (1e2 * sh.length) * 1e4 + 0.5) / 1e4)
    }.sortBy(_._1)
    val got = graft.queries.QueriesMlops.queries("policy_replay")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected)
    // uniform-logging premise: the matched share sits near 1/2 per type
    got.foreach(g => assert(g._5 > 0.35 && g._5 < 0.65,
      s"match rate ${g._5} far from the uniform-logging half"))
  }

  test("maxsim_retrieval: matches a driver late-interaction recompute") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def maxsim(q: Array[Double], e: Array[Double]): Double =
      (0 until 4).map { i =>
        (0 until 4).map(j =>
          cos(q.slice(i * 16, i * 16 + 16), e.slice(j * 16, j * 16 + 16))).max
      }.reduce(_ + _)
    val queries2 = vecs.filter(_._1 < 5)
    val expected = queries2.flatMap { case (qid, q) =>
      vecs.map { case (did, e) => (qid, did, maxsim(q, e)) }
        .sortBy(x => (-x._3, x._2)).take(5).zipWithIndex
        .map { case ((_, did, ms), r) =>
          (qid, did, BigDecimal(ms).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            (r + 1).toLong) }
    }.sortBy(x => (x._1, x._4)).toSeq
    val got = graft.queries.QueriesSim.queries("maxsim_retrieval")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == expected)
    // late-interaction laws: self-retrieval scores exactly 4 (every part
    // matches itself at cosine 1) and ranks first; maxsim dominates the
    // pooled whole-vector cosine's aspect-averaging upper structure
    got.filter(g => g._1 == g._2).foreach { g =>
      assert(math.abs(g._3 - 4.0) < 1e-9 && g._4 == 1L)
    }
    queries2.take(2).foreach { case (qid, q) =>
      vecs.take(50).foreach { case (_, e) =>
        assert(maxsim(q, e) + 1e-9 >=
          (0 until 4).map(i => cos(q.slice(i * 16, i * 16 + 16), e.slice(i * 16, i * 16 + 16))).sum,
          "max over doc parts must dominate the aligned-parts sum")
      }
    }
  }

  test("readability_score: matches a driver Flesch recompute") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.map { case (lang, text) =>
      val w = math.max("\\S+".r.findAllIn(text).size.toLong, 1L)
      val sents = math.max("[.!?]".r.findAllIn(text).size.toLong, 1L)
      val syl = "[aeiouy]+".r.findAllIn(text.toLowerCase).size.toLong
      val fs = 206.835 - 1.015 * (w.toDouble / sents) - 84.6 * (syl.toDouble / w)
      val bucket =
        if (fs >= 90) "very_easy" else if (fs >= 70) "easy"
        else if (fs >= 50) "standard" else if (fs >= 30) "difficult"
        else "very_difficult"
      (lang, bucket, math.floor(fs * 1e4 + 0.5).toLong)
    }.groupBy(d => (d._1, d._2)).toSeq.map { case ((lang, bucket), xs) =>
      (lang, bucket, xs.length.toLong,
        BigDecimal(xs.map(_._3).sum.toDouble / xs.length / 1e4)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(x => (x._1, x._2))
    val got = graft.queries.QueriesText.queries("readability_score")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }
}
