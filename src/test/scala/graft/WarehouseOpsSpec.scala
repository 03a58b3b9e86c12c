package graft

import org.apache.spark.sql.functions._

/** Session-6 operator batch: TPC-H composite shapes (Q16/Q18/Q21), the CDC
  * snapshot diff, the sort-layout run-length report, CUPED, the seasonal-
  * naive forecast backtest, and within-label embedding outliers. Each test
  * drives the declared query on sf0.001 and checks laws the DuckDB hash
  * compare can't express (brute-force equivalence, partition identities,
  * monotonicity).
  */
class WarehouseOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("relational_q18: every row exceeds the quantity floor, sorted desc, capped") {
    val rows = q("relational_q18").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach(r => assert(r.getDouble(5) > 180.0))
    val prices = rows.map(_.getDouble(4))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("relational_q16: brute-force recount for the largest group, blacklist respected") {
    val rows = q("relational_q16").collect()
    assert(rows.nonEmpty)
    val (brand, ptyp, psize, cnt) =
      (rows.head.getString(0), rows.head.getString(1), rows.head.getInt(2), rows.head.getLong(3))
    val bad = spark.read.parquet(s"$sf/supplier.parquet")
      .where(col("s_acctbal") < 0).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    val brute = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .where(col("p_brand") === brand && col("p_type") === ptyp && col("p_size") === psize)
      .select("l_suppkey").collect().map(_.getLong(0)).toSet.diff(bad)
    assert(cnt == brute.size, s"top group $brand/$ptyp/$psize: $cnt != ${brute.size}")
  }

  test("relational_q21: aggregate rewrite equals the brute-force EXISTS formulation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet").where(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("l_shipdate > o_orderdate + INTERVAL 365 DAY").as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // brute force: per order, the set of suppliers and the set of late suppliers
    val byOrder = li.groupBy(_._1)
    val expect = byOrder.valuesIterator.flatMap { lines =>
      val supps = lines.map(_._2).toSet
      val late = lines.filter(_._3).map(_._2).toSet
      if (supps.size >= 2 && late.size == 1) Some(late.head) else None
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val names = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey", "s_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expectByName = expect.toSeq.groupBy(kv => names(kv._1))
      .view.mapValues(_.map(_._2).sum).toMap
    val got = q("relational_q21").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expectByName, s"got ${got.size} names vs ${expectByName.size}")
  }

  test("relational_q7/q8: bilateral symmetry and share bounds") {
    val q7 = q("relational_q7").collect()
    assert(q7.nonEmpty)
    val dirs = q7.map(r => (r.getString(0), r.getString(1))).distinct
    assert(dirs.forall { case (a, b) =>
      Set(a, b) == Set("NATION_3", "NATION_8") && a != b })
    q7.foreach(r => assert(r.getDouble(3) > 0.0))
    val q8 = q("relational_q8").collect()
    assert(q8.map(_.getLong(0)).toSet == Set(1995L, 1996L))
    q8.foreach { r =>
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("relational_q4/q14/q19: semi-join bounds, share bounds, bracket recount") {
    val inQuarter = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        col("o_orderdate") < expr("TIMESTAMP '1996-04-01 00:00:00'")).count()
    val q4 = q("relational_q4").collect()
    assert(q4.nonEmpty && q4.map(_.getLong(1)).sum <= inQuarter)
    q4.foreach(r => assert(r.getLong(1) > 0))
    val q14 = q("relational_q14").collect()
    assert(q14.map(_.getLong(0)).toSet == (1L to 12L).toSet)
    q14.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    val q19 = q("relational_q19").collect().head
    assert(q19.getDouble(0) > 0.0 && q19.getLong(1) > 0)
  }

  test("triplet_margin: labels partition the corpus, min ≤ mean, violations bounded") {
    val total = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("embedding").isNotNull && col("label").isNotNull).count()
    val rows = q("triplet_margin").collect()
    assert(rows.map(_.getLong(1)).sum == total)
    for (r <- rows) {
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-6)
    }
  }

  test("mix_epochs: emitted mass matches a driver-side hash replay") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex4(id: Long): String = {
      val d = md.digest(s"epoch:$id".getBytes("UTF-8"))
      f"${(d(0) & 0xff)}%02x${(d(1) & 0xff)}%02x"
    }
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val m = src.drop(3).toInt % 4
      val k = m match { case 2 => 2L; case 3 => 3L; case _ => 1L }
      val thr = m match { case 1 => "c000"; case 2 => "8000"; case 3 => "4000"; case _ => "0000" }
      val reps = ds.map(d => k + (if (hex4(d._1) < thr) 1L else 0L))
      (src, (ds.length.toLong, reps.sum, ds.zip(reps).map(p => p._1._3 * p._2).sum))
    }
    val got = q("mix_epochs").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, "plan card must equal the hash replay")
  }

  test("cdc_diff: classes partition old ∪ new and match set-ops recomputation") {
    val base = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val old = base.filter(_._1 % 5 != 1).toMap
    val neu = base.filter(_._1 % 7 != 3)
      .map { case (k, c) => (k, c + (if (k % 3 == 0) 500L else 0L)) }.toMap
    val expect = Map(
      "insert" -> neu.keySet.diff(old.keySet).size,
      "delete" -> old.keySet.diff(neu.keySet).size,
      "update" -> old.keySet.intersect(neu.keySet).count(k => old(k) != neu(k)),
      "unchanged" -> old.keySet.intersect(neu.keySet).count(k => old(k) == neu(k)))
    val got = q("cdc_diff").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect.map { case (k, v) => (k, v.toLong) })
    assert(got.values.sum == old.keySet.union(neu.keySet).size)
  }

  test("rle_layout: sorted-by-flag layout runs collapse to the distinct-value counts") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val dFlag = li.select("l_returnflag").distinct().count()
    val dPair = li.select(col("l_returnflag"),
      date_format(col("l_shipdate"), "yyyy-MM-dd")).distinct().count()
    val rows = q("rle_layout").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nK, runsFlagK, runsShipK) = rows("by_key")
    val (nF, runsFlagF, runsShipF) = rows("by_flag")
    assert(nK == nF && nK == li.count())
    // a layout sorted BY the column reaches the theoretical minimum: one
    // run per distinct value (per distinct prefix-pair for the 2nd column)
    assert(runsFlagF == dFlag, s"$runsFlagF != $dFlag")
    assert(runsShipF == dPair, s"$runsShipF != $dPair")
    // any layout: runs are bounded below by distinct count, above by rows
    assert(runsFlagK >= dFlag && runsFlagK <= nK)
    assert(runsShipK >= dPair && runsShipK <= nK)
    // the ingest-order layout cannot beat the sorted layout
    assert(runsFlagK >= runsFlagF && runsShipK >= runsShipF)
  }

  test("Runs.counts: matches a driver-side fold under the same total order") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      .withColumn("k", concat(
        format_string("%012d-%02d", col("l_orderkey"), col("l_linenumber")),
        lit("|"), col("l_returnflag")))
    val got = graft.operators.Runs.counts(li, col("k"), Seq("l_returnflag"),
      numBuckets = 7).collect().head
    val rows = li.select("k", "l_returnflag").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    val runs = rows.foldLeft((0L, null: String)) { case ((n, prev), (_, v)) =>
      if (v != prev) (n + 1, v) else (n, v) }._1
    assert(got.getLong(0) == rows.length, "n_rows mismatch")
    assert(got.getLong(1) == runs, s"runs ${got.getLong(1)} != brute $runs")
  }

  test("Runs.countsOrdered: native tuple order ≡ the concatenated-string order " +
      "(rle_layout's round-14 rewrite), knownCount changes nothing") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    // the old string form: zero-padded fixed-width key, lexicographic ≡ tuple
    val s = graft.operators.Runs.counts(
      li.withColumn("k", concat(
        format_string("%012d-%02d", col("l_orderkey"), col("l_linenumber")),
        lit("|"), col("l_returnflag"))),
      col("k"), Seq("l_returnflag"), numBuckets = 7).collect().head
    val tup = graft.operators.Runs.countsOrdered(li,
      Seq(col("l_orderkey"), col("l_linenumber"), col("l_returnflag")),
      col("l_orderkey"), Seq("l_returnflag"), numBuckets = 7,
      knownCount = Some(li.count())).collect().head
    assert(tup.getLong(0) == s.getLong(0), "n_rows drifted")
    assert(tup.getLong(1) == s.getLong(1),
      s"tuple-order runs ${tup.getLong(1)} != string-order runs ${s.getLong(1)}")
  }

  test("GlobalOrder.withNtile: knownCount probe sharing is value-identical") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    def tiles(kc: Option[Long]) = graft.operators.GlobalOrder.withNtile(
        o, Seq(col("o_totalprice"), col("o_orderkey")), 4, "q", knownCount = kc)
      .groupBy(col("q")).count().orderBy(col("q"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(tiles(Some(o.count())) == tiles(None))
  }

  test("ab_cuped: moments match a driver-side recompute; adjustment never hurts") {
    val mid = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val per = graft.queries.Tables.t(spark, sf, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("user_id")
      .agg(sum(when(col("ts") < lit(mid), col("cents")).otherwise(0L)).as("x"),
        sum(when(col("ts") >= lit(mid), col("cents")).otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (r <- q("ab_cuped").collect()) {
      val arm = r.getString(0)
      val grp = per.filter(p => (p._1 % 2 == 0) == (arm == "control"))
      val n = grp.length.toDouble
      val (sx, sy) = (grp.map(_._2).sum.toDouble, grp.map(_._3).sum.toDouble)
      val sxy = grp.map(p => p._2.toDouble * p._3).sum
      val sxx = grp.map(p => p._2.toDouble * p._2).sum
      val syy = grp.map(p => p._3.toDouble * p._3).sum
      val varY = (n * syy - sy * sy) / (n * (n - 1))
      val cov = n * sxy - sx * sy
      val rho2 = cov * cov / ((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(r.getLong(1) == grp.length)
      assert(math.abs(r.getDouble(3) - varY) / varY < 1e-6,
        s"$arm var_post ${r.getDouble(3)} vs $varY")
      assert(math.abs(r.getDouble(5) - rho2) < 1e-4, s"$arm rho2 ${r.getDouble(5)} vs $rho2")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-9, "var_adj must not exceed var_post")
    }
  }

  test("forecast_snaive: actual mass matches the test window; wmape non-negative") {
    val te = graft.queries.Tables.t(spark, sf, "events")
      .where(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .where(col("ts") >= expr("TIMESTAMP '2024-01-22 00:00:00'") &&
        col("ts") < expr("TIMESTAMP '2024-01-29 00:00:00'"))
      .groupBy("event_type")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for (r <- q("forecast_snaive").collect()) {
      val ty = r.getString(0)
      assert(r.getLong(2) == te(ty), s"$ty actual ${r.getLong(2)} != ${te(ty)}")
      assert(r.getDouble(3) >= 0.0)
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 168)
    }
  }

  test("decontaminate_apply: matches a driver-side brute-force drop set") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def sh(t: String): Set[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(8)
        .filter(_.length == 8).map(_.mkString(" ")).toSet
    val evalDocs = docs.filter(_._1 < 50)
    val train = docs.filter(_._1 >= 50) ++
      evalDocs.map(d => (d._1 + 500000L, d._2, d._3)) // planted leaks
    val evalSh = evalDocs.map(d => sh(d._2))
    val droppedIds = train.filter { d =>
      val s = sh(d._2); evalSh.exists(e => s.intersect(e).size >= 5)
    }.map(_._1).toSet
    assert(droppedIds.nonEmpty, "planted leaks must produce drops")
    val expect = train.filterNot(d => droppedIds(d._1)).groupBy(_._3)
      .map { case (src, ds) => (src, (ds.length.toLong, ds.map(_._1).sum)) }
    val got = q("decontaminate_apply").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, s"kept-set mismatch: ${got.size} vs ${expect.size} sources")
  }

  test("freshness_report: trailing counts bounded, staleness non-negative, starving consistent") {
    val rows = q("freshness_report").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (stale, n, n7, starving) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(stale >= 0 && n7 >= 0 && n7 <= n)
      assert(starving == (n7 * 30 < n * 7), s"${r.getString(0)}: flag mismatch")
    }
  }

  test("scd2_lookup: snapshot states match a driver-side as-of reconstruction") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderkey"), col("o_orderstatus")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val snaps = Seq("1996-01-01", "1996-07-01", "1997-01-01", "1997-07-01")
      .map(d => java.sql.Timestamp.valueOf(d + " 00:00:00"))
    // brute force: a customer's state at snap = status of the LAST order
    // at-or-before snap (ties broken by orderkey — the construction's sort)
    val byCust = orders.groupBy(_._1).toSeq
    val expect = (for {
      snap <- snaps
      (_, os) <- byCust
      before = os.filter(o => !o._2.after(snap))
      if before.nonEmpty
    } yield (snap, before.maxBy(o => (o._2.getTime, o._3))._4))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("scd2_lookup").collect()
      .map(r => ((r.getTimestamp(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == expect, s"${got.size} cells vs ${expect.size}")
  }

  test("containment_dedup: the planted superset pairs surface and symmetric jaccard misses none of the exact copies") {
    val rows = q("containment_dedup").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (shared, szA, szB) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(shared <= math.min(szA, szB), "shared cannot exceed either set")
      assert(shared * 10 >= math.min(szA, szB) * 9, "threshold must hold")
      // exact copies (+100000 ids): containment 1.0 and jaccard 1.0 → not blind
      if (r.getLong(1) == r.getLong(0) + 100000L)
        assert(r.getDouble(5) == 1.0 && !r.getBoolean(6))
    }
    // the '+xtra' variants extend the base doc: base ⊂ variant, so every
    // (base, base+200000) pair must appear with containment ≈ 1
    val ids = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val bases = rows.map(_.getLong(0)).filter(_ < 100000L).distinct
    bases.foreach { b => assert(ids.contains((b, b + 200000L)), s"missing superset pair for $b") }
  }

  test("Observed: side metrics equal a recomputed aggregate, one action") {
    import graft.functions.Observed
    val df = spark.read.parquet(s"$sf/orders.parquet")
    val (out, obs) = Observed.withMetrics(df, "audit",
      count(lit(1)).as("rows"),
      sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val n = out.count()
    assert(obs.get("rows") == n)
    val cents = df.agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
      .collect().head.getLong(0)
    assert(obs.get("cents") == cents)
    val (out2, obs2) = Observed.withNullAudit(df, "nulls", Seq("o_orderstatus"))
    out2.write.mode("overwrite").parquet("target/tmp_observed")
    assert(obs2.get("rows") == n && obs2.get("nulls_o_orderstatus") == 0L)
  }

  test("dup_cluster_stats: histogram mass equals the corpus; 3-copy construction visible") {
    val base = graft.queries.Tables.t(spark, sf, "documents")
      .where(col("doc_id") % 25 === 0).count()
    val rows = SparkEntry.queries("dup_cluster_stats")(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == base * 3, "n_docs must partition the corpus")
    rows.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
    // every planted cluster is {base, exact copy, near copy} — size 3
    assert(rows.map(_.getLong(0)).max >= 3)
  }

  test("salt_advisor: exactly the planted hot key, salt sized to the median") {
    val rows = SparkEntry.queries("salt_advisor")(spark, sf).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 7L)
    val (n, med, salt) = (rows.head.getLong(1), rows.head.getLong(2), rows.head.getLong(3))
    assert(n > med * 4)
    assert(salt == (n + med - 1) / med && salt >= 5)
    // the recommendation is self-consistent: per-shard load ≈ typical key
    assert(n / salt <= med)
  }

  test("embed_outliers: label counts partition the corpus; min ≤ mean") {
    val total = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("embedding").isNotNull && col("label").isNotNull).count()
    val rows = q("embed_outliers").collect()
    assert(rows.map(_.getLong(1)).sum == total)
    for (r <- rows) {
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-6, "min_cos must not exceed mean_cos")
    }
  }
}
