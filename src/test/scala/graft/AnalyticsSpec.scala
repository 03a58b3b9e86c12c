package graft

import graft.functions.TextFns
import graft.queries.QueriesAnalytics
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Warehouse-analytics batch (QueriesAnalytics) + the native NfcNormalize
  * expression. Differential/invariant tests on sf0.001. */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = QueriesAnalytics.queries(name)(spark, dir)

  // ---- NfcNormalize ----------------------------------------------------

  test("NfcNormalize: differential vs java.text.Normalizer, ASCII zero-copy") {
    val cases = Seq(
      "plain ascii", "", "é", "äbc", "é already composed",
      "mix é and é", "Å angstrom sign", "ffi ﬃ ligature stays",
      "ṩ s-dot", "ṩ dots reorder")
    for (c <- cases) {
      val in = UTF8String.fromString(c)
      val out = graft.plans.NfcNormalize.nfc(in)
      val expected = java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC)
      assert(out.toString == expected, s"mismatch for <$c>")
    }
    // ASCII fast path returns the SAME instance — no allocation
    val ascii = UTF8String.fromString("pure ascii 123")
    assert(graft.plans.NfcNormalize.nfc(ascii) eq ascii)
    assert(graft.plans.NfcNormalize.nfc(null) == null)
  }

  test("NfcNormalize: codegen path through a DataFrame projection") {
    import spark.implicits._
    // explicit escapes: input decomposed e+U+0301 must compose to U+00E9
    val df = Seq("e\u0301", "plain", null).toDF("s")
      .select(TextFns.nfc(col("s")).as("n"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("\u00e9"), Some("plain"), None))
  }

  // ---- queries over testdata ------------------------------------------

  test("sql_recursive: depth-0 count equals customer count, chain-length law") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val keys = cust.select("c_custkey").collect().map(_.getLong(0))
    val rows = q("sql_recursive").collect()
    val byDepth = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDepth(0L) == keys.length)
    // every key k contributes exactly (#halvings until node 1) + 1 rows;
    // total row mass must equal the sum of per-key chain lengths
    val expectedTotal = keys.map { k =>
      var n = k; var len = 1L
      while (n > 1) { n = n / 2; len += 1 }
      len
    }.sum
    assert(rows.map(_.getLong(1)).sum == expectedTotal)
  }

  test("cohort_retention: offset-0 actives sum to total distinct users") {
    val rows = q("cohort_retention").collect()
    assert(rows.forall(_.getLong(1) >= 0L))
    val offset0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val totalUsers = graft.queries.Tables.t(spark, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select("user_id").distinct().count()
    assert(offset0 == totalUsers)
  }

  test("dq_checks: five checks, pass iff zero violations, structural pass") {
    val rows = q("dq_checks").collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getBoolean(3) == (r.getLong(1) == 0L)))
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("orders_fk_customer") == 0L)
    assert(byName("orders_pk_unique") == 0L)
  }

  test("skew_profile: histogram math matches a direct percentile") {
    val r = q("skew_profile").collect().head
    val counts = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_orderkey").count().select("count")
      .collect().map(_.getLong(0)).sorted
    assert(r.getLong(0) == counts.length)          // n_keys
    assert(r.getLong(1) == counts.sum)             // total_rows
    assert(r.getLong(2) == counts.max)             // max_cnt
    // R-7 interpolated median over the sorted counts
    val h = (0.5 * (counts.length - 1)).toInt
    val frac = 0.5 * (counts.length - 1) - h
    val p50 = counts(h) + frac * (counts(math.min(h + 1, counts.length - 1)) - counts(h))
    assert(math.abs(r.getDouble(3) - math.floor(p50 * 1e4 + 0.5) / 1e4) < 1e-9)
  }

  test("ts_anomaly: every flagged row is a full-window 3-sigma outlier") {
    val rows = q("ts_anomaly").collect()
    assert(rows.forall(r => math.abs(r.getDouble(2)) >= 3.0))
  }

  test("unicode_norm: composition shortens exactly the decomposed rows") {
    val rows = q("unicode_norm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docId, lenDec, lenNfc, changed) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(4))
      if (docId % 3 == 2) { assert(!changed); assert(lenNfc == lenDec) }
      else { assert(changed); assert(lenNfc == lenDec - 1) }
    }
  }

  test("session_stats: event mass conserved, durations non-negative") {
    val rows = q("session_stats").collect()
    val totalEvents = graft.queries.Tables.t(spark, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull).count()
    assert(rows.map(_.getLong(2)).sum == totalEvents)
    assert(rows.forall(_.getDouble(4) >= 0.0))
    // session ids are 1-based and contiguous-ish: min per user is 1
    val minSid = rows.groupBy(_.getLong(0)).map(_._2.map(_.getLong(1)).min)
    assert(minSid.forall(_ == 1L))
  }

  test("sample_weighted: systematic pick count hits the stride target") {
    val rows = q("sample_weighted").collect()
    val nPicked = rows.map(_.getLong(2)).sum
    // stride = total/100 => the multiples of stride covered by [0, total)
    // number ~100 (+-1 boundary effect)
    assert(math.abs(nPicked - 100L) <= 2, s"picked $nPicked")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))   // n_picked <= n_docs
      assert(r.getLong(4) <= r.getLong(3))   // w_picked <= w_total
    }
  }

  test("window_time_range: brute-force trailing-hour check for one user") {
    val ev = graft.queries.Tables.t(spark, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val uid = ev.head._2
    val mine = ev.filter(_._2 == uid)
    val expected = mine.map { case (id, _, us) =>
      id -> mine.count(o => o._3 >= us - 3600L * 1000000L && o._3 <= us).toLong
    }.toMap
    val got = q("window_time_range").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    expected.foreach { case (id, n) => assert(got(id) == n, s"event $id") }
  }

  test("graph_pagerank: probability-like mass and floor rank") {
    val rows = q("graph_pagerank").collect()
    assert(rows.length == 25)
    val n = rows.length
    val sum = rows.map(_.getDouble(1)).sum
    // damping floor for every node; dangling redistribution conserves mass
    assert(rows.forall(_.getDouble(1) >= 0.15 / n - 1e-9))
    assert(math.abs(sum - 1.0) < 1e-4)
  }

  test("pmi_collocations: support floor and descending rounded order") {
    val rows = q("pmi_collocations").collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getLong(1) >= 5L))
    val pmis = rows.map(_.getDouble(2))
    assert(pmis.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("embed_classify: own-centroid similarity dominates for most vectors") {
    val rows = graft.queries.QueriesSim.queries("embed_classify")(spark, dir).collect()
    assert(rows.nonEmpty)
    // margin > 0 <=> predicted == label (up to rounded-argmax ties)
    val agree = rows.count(r => (r.getDouble(4) > 0) == (r.getInt(2) == r.getInt(1)))
    assert(agree >= rows.length - 1)
    // the synthetic embeddings are weakly clustered (natural max cosine
    // ~0.31, cf. embed_neardup) — require the home-classification rate to
    // beat the 1/|labels| random baseline by 2x, not a majority
    val nLabels = rows.map(_.getInt(1)).distinct.length
    assert(rows.count(r => r.getInt(2) == r.getInt(1)) > 2 * rows.length / nLabels)
  }

  test("sql_lateral: lateral top-2 matches the window group-limit form") {
    graft.queries.Tables.t(spark, dir, "customer").createOrReplaceTempView("customer")
    graft.queries.Tables.t(spark, dir, "orders").createOrReplaceTempView("orders")
    val lateral = graft.queries.QueriesRelationalExt.queries("sql_lateral")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val windowed = spark.sql(
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn <= 2 AND o_custkey < 200
        |  AND o_custkey IN (SELECT c_custkey FROM customer)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lateral == windowed)
  }

  test("window_nth: boundary picks match a sorted-group brute force") {
    val rows = graft.queries.QueriesFunctions.queries("window_nth")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(3)))
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_nationkey"), col("c_acctbal"), col("c_custkey"), col("c_name"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    val byNation = cust.groupBy(_._1)
    rows.foreach { case (nk, poorest, richest) =>
      val sorted = byNation(nk).sortBy(c => (c._2, c._3))
      assert(poorest == sorted.head._4)
      assert(richest == sorted.last._4)
    }
  }

  test("dedup_soft: weights conserve corpus mass") {
    val rows = graft.queries.QueriesDedup.queries("dedup_soft")(spark, dir).collect()
    assert(rows.nonEmpty)
    // sum(weight * n_clusters) = corpus size; the constructed corpus is
    // base + 2 perturbed copies, so every doc is in some cluster
    val mass = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val nBase = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 25 === 0).count()
    assert(mass == 3 * nBase)
    assert(rows.forall(_.getLong(0) >= 1L))
  }

  test("train_split: per-source split masses partition the source totals") {
    val rows = graft.queries.QueriesPipeline.queries("train_split")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySource = rows.groupBy(_._1)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("source")).agg(count(lit(1)).as("n"), sum(col("n_chars")).as("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    bySource.foreach { case (src_, rs) =>
      assert(rs.map(_._3).sum == docs(src_)._1)
      assert(rs.map(_._4).sum == docs(src_)._2)
    }
    // global fractions near 80/10/10 (md5-uniform)
    val total = rows.map(_._3).sum.toDouble
    val trainFrac = rows.filter(_._2 == "train").map(_._3).sum / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
  }

  test("ab_ztest: z matches a driver-side Welch computation for one type") {
    val r = graft.queries.QueriesAnalytics.queries("ab_ztest")(spark, dir)
      .collect().head
    val tpe = r.getString(0)
    val vals = graft.queries.Tables.t(spark, dir, "events")
      .where(col("value").isNotNull && col("event_type") === tpe && col("user_id").isNotNull)
      .select(col("user_id"), col("value")).collect()
      .map(x => (x.getLong(0) % 2 == 0, x.getDouble(1)))
    def stats(xs: Array[Double]) = {
      val n = xs.length; val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (na, ma, va) = stats(vals.filter(_._1).map(_._2))
    val (nb, mb, vb) = stats(vals.filterNot(_._1).map(_._2))
    val z = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(r.getLong(1) == na && r.getLong(2) == nb)
    assert(math.abs(r.getDouble(5) - z) < 1e-3)
  }

  test("winsorize: clip fractions near 5 percent, mean inside the clip band") {
    val rows = graft.queries.QueriesScale.queries("winsorize")(spark, dir).collect()
    rows.foreach { r =>
      val n = r.getLong(1).toDouble
      assert(r.getLong(2) <= 0.07 * n + 2, "lo clip too large")
      assert(r.getLong(3) <= 0.07 * n + 2, "hi clip too large")
      assert(r.getLong(2) + r.getLong(3) > 0, "no clipping at all")
    }
  }

  test("markov_transitions: rows conserve transitions, probabilities sum to 1") {
    val rows = graft.queries.QueriesAnalytics.queries("markov_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val ev = graft.queries.Tables.t(spark, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
    val perUser = ev.groupBy(col("user_id")).count().collect().map(_.getLong(1))
    assert(rows.map(_._3).sum == perUser.map(n => math.max(n - 1, 0)).sum)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4)
    }
  }

  test("token_entropy: bounded by ln(vocab), exact mass") {
    val rows = graft.queries.QueriesText.queries("token_entropy")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, v, h) =>
      assert(n >= v && v >= 1)
      assert(h >= -1e-9 && h <= math.log(v.toDouble) + 1e-9)
    }
  }

  test("rfm_segmentation: customers conserved, quartiles near-balanced") {
    val rows = graft.queries.QueriesAnalytics.queries("rfm_segmentation")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val nCust = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum == nCust)
    // each axis partitions customers into 4 near-equal groups
    for (axis <- 0 to 2) {
      val byQ = rows.groupBy(axis match {
        case 0 => (_: (Int, Int, Int, Long))._1
        case 1 => (_: (Int, Int, Int, Long))._2
        case _ => (_: (Int, Int, Int, Long))._3
      }).map(_._2.map(_._4).sum)
      assert(byQ.size == 4 && byQ.max - byQ.min <= 1, s"axis $axis: $byQ")
    }
  }

  test("basket_pairs: lift matches a brute-force recomputation") {
    val rows = graft.queries.QueriesAnalytics.queries("basket_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 25)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
    val byOrder = li.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val freq = li.groupBy(_._2).map { case (k, xs) => k -> xs.length.toLong }
    rows.foreach { case (pa, pb, nab, lift) =>
      val expectedN = byOrder.count(s => s.contains(pa) && s.contains(pb)).toLong
      assert(nab == expectedN, s"pair ($pa,$pb)")
      val expectedLift = nab.toDouble * nOrders / (freq(pa) * freq(pb))
      assert(math.abs(lift - expectedLift) < 1e-3)
    }
  }

  test("inverted_index: postings capped at 5, sorted, consistent with df") {
    // postings is a comma-joined string (the driver's checker can't hash
    // array cells) — split it back for the invariants
    val rows = graft.queries.QueriesAnalytics.queries("inverted_index")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(",").map(_.toLong).toSeq))
    assert(rows.nonEmpty)
    rows.foreach { case (_, df, postings) =>
      assert(df >= 10)
      assert(postings.length == math.min(df, 5L).toInt)
      assert(postings == postings.sorted)
    }
  }

  test("seasonality_profile: grid bounded, event mass conserved") {
    val rows = graft.queries.QueriesAnalytics.queries("seasonality_profile")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.forall { case (d, h, _) => d >= 0 && d <= 6 && h >= 0 && h <= 23 })
    val total = graft.queries.Tables.t(spark, dir, "events")
      .where(col("ts").isNotNull).count()
    assert(rows.map(_._3).sum == total)
  }

  test("ccnet_bucket: terciles partition the eval split, head beats tail") {
    val rows = graft.queries.QueriesText.queries("ccnet_bucket")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).sorted.toSeq == Seq(1, 2, 3))
    val evalDocs = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") < 50).count()
    assert(rows.map(_._2).sum == evalDocs)
    val byB = rows.map(r => r._1 -> r._3).toMap
    assert(byB(1) >= byB(2) && byB(2) >= byB(3)) // head has higher mean log-prob
  }

  test("doc_quality_gate: survivors consistent with per-rule fails") {
    val r = graft.queries.QueriesText.queries("doc_quality_gate")(spark, dir)
      .collect().head
    val total = r.getLong(0)
    val fails = (1 to 4).map(r.getLong)
    val survivors = r.getLong(5)
    assert(total == spark.read.parquet(s"$dir/documents.parquet").count())
    // survivors at least total minus the union bound of failures
    assert(survivors >= total - fails.sum && survivors <= total - fails.max)
  }

  test("weighted_median: brute-force agreement per flag") {
    val rows = graft.queries.QueriesScale.queries("weighted_median")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    li.groupBy(_._1).foreach { case (flag, xs) =>
      val sorted = xs.sortBy(_._2)
      val tot = sorted.map(_._3).sum
      var cum = 0.0
      val med = sorted.find { x => cum += x._3; cum >= tot / 2 }.get._2
      assert(rows(flag) == med, s"flag $flag")
    }
  }

  test("gini_sources: bounded in [0,1), zero for constant weights") {
    val rows = graft.queries.QueriesScale.queries("gini_sources")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, g) =>
      assert(g >= -1e-6 && g < 1.0)
      assert(n >= 1)
    }
    // sanity: a hand-built constant-weight group has gini ~ 0
    import spark.implicits._
    val const = Seq.fill(50)(("s", 100L)).zipWithIndex
      .map { case ((s_, w), i) => (s_, w, i.toLong) }.toDF("source", "w", "doc_id")
    val ww = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("w"), col("doc_id"))
    val g0 = const.withColumn("i", row_number().over(ww))
      .groupBy(col("source"))
      .agg(((lit(2.0) * sum(col("i") * col("w")) / (count(lit(1)) * sum(col("w")))) -
        (count(lit(1)) + lit(1.0)) / count(lit(1))).as("gini"))
      .collect().head.getDouble(1)
    assert(math.abs(g0) < 1e-9)
  }

  test("fuzzy_join: band prune is lossless vs the unbanded join") {
    val p = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    val a = p.toDF("a_key", "brand", "a_name")
    val b = p.toDF("b_key", "b_brand", "b_name")
    val unbanded = a.join(b, col("brand") === col("b_brand") &&
        col("a_key") < col("b_key") &&
        levenshtein(col("a_name"), col("b_name")) <= 2)
      .groupBy(col("brand")).agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q("fuzzy_join").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == unbanded)
    assert(got.values.sum > 0)
  }

  test("graph_triangles: exact vs in-driver brute force on the collected edge list") {
    val r = q("graph_triangles").head()
    val (nNodes, nEdges, nTri, clust) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    // reconstruct the undirected edge list the same way and brute-force it
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_suppkey")
    val supp = spark.read.parquet(s"$dir/supplier.parquet").select("s_suppkey", "s_nationkey")
    val ord = spark.read.parquet(s"$dir/orders.parquet").select("o_orderkey", "o_custkey")
    val cust = spark.read.parquet(s"$dir/customer.parquet").select("c_custkey", "c_nationkey")
    val edges = li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("s_nationkey").cast("long").as("s"), col("c_nationkey").cast("long").as("c"))
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .filter(e => e._1 != e._2).toSet
    assert(nEdges == edges.size)
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    assert(nNodes == nodes.size)
    val sortedNodes = nodes.toSeq.sorted
    val bruteTri = (for {
      a <- sortedNodes; b <- sortedNodes if a < b && edges((a, b))
      c <- sortedNodes if b < c && edges((b, c)) && edges((a, c))
    } yield 1).size
    assert(nTri == bruteTri, s"triangles $nTri != brute $bruteTri")
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map(_._2.size.toLong)
    val triads = deg.map(d => d * (d - 1) / 2).sum
    assert(clust == math.floor(3.0 * bruteTri / triads * 1e6 + 0.5) / 1e6)
    assert(clust >= 0.0 && clust <= 1.0)
  }

  test("ship_delay: percentile ordering, totals partition the joined lineitems") {
    val rows = q("ship_delay").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((_, n, p50, p90, mx) <- rows) {
      assert(n > 0 && p50 <= p90 && p90 <= mx)
    }
    val joined = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate").isNotNull && col("o_orderdate").isNotNull).count()
    assert(rows.map(_._2).sum == joined)
  }

  test("abc_classification: classes partition parts, A-head covers <= 80% + one part") {
    val rows = q("abc_classification").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq.sorted == rows.map(_._1).toSeq)
    val totalParts = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_partkey").distinct().count()
    assert(rows.map(_._2).sum == totalParts)
    val shares = rows.map(r => r._1 -> r._4).toMap
    // A ends at the first part crossing 80% cumulative — share ∈ (0.8-ε, 0.8+one-part]
    assert(shares("A") <= 0.9 && shares("A") >= 0.5, s"A share ${shares("A")}")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 5e-4)
  }

  test("session_paths: session totals match session_stats, paths bounded at 5 steps") {
    val paths = q("session_paths").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(paths.nonEmpty && paths.length <= 25)
    assert(paths.forall(_._1.split(">").length <= 5))
    // every counted session exists in session_stats' session inventory
    val nSessions = q("session_stats").count()
    assert(paths.map(_._2).sum <= nSessions)
    // deterministic cut: counts non-increasing, ties broken by path asc
    val pairs = paths.sliding(2).toSeq
    assert(pairs.forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
  }

  test("skyline_pareto: window form equals brute-force dominance test") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val expected = li.groupBy(_._1).toSeq.flatMap { case (flag, rows) =>
      val pts = rows.map(r => (r._2, r._3))
      val sky = pts.filter { case (p, d) =>
        !pts.exists { case (p2, d2) =>
          p2 <= p && d2 <= d && (p2 < p || d2 < d) }
      }.distinct
      sky.map { case (p, d) =>
        (flag, p, d, pts.count(x => x == (p, d)).toLong) }
    }.toSet
    val got = q("skyline_pareto").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"skyline mismatch: missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("ts_seasonal_adjust: per-type residuals mean to ~0, flags bounded") {
    val rows = q("ts_seasonal_adjust").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, mz, fl) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(n > 0 && mz > 0.0)
      assert(fl >= 0 && fl <= n)
      // |z| can't be flagged more often than Chebyshev allows: P(|z|>3) <= 1/9
      assert(fl <= n / 9 + 1, s"too many 3-sigma flags: $fl of $n")
    }
  }

  test("embed_dispersion: centroid-norm identity equals brute-force pairwise mean cosine") {
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.queries.Tables.t(spark, dir, "embeddings")
      .where(col("embedding").isNotNull && col("label").isNotNull)
      .collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray))
      .map { case (l, v) =>
        val n = math.sqrt(v.map(x => x * x).sum); (l, v.map(_ / n), n)
      }
      .filter(_._3 > 0)
    val byLabel = vecs.groupBy(_._1)
    for (r <- graft.queries.QueriesSim.queries("embed_dispersion")(spark, dir).collect()) {
      val (l, n, got) = (r.getInt(0), r.getLong(1), r.getDouble(2))
      val us = byLabel(l).map(_._2)
      assert(us.length == n)
      val cosSum = (for {
        i <- us.indices; j <- us.indices if i != j
      } yield us(i).zip(us(j)).map { case (a, b) => a * b }.sum).sum
      val brute = cosSum / (n * (n - 1.0))
      assert(math.abs(got - brute) < 1e-4, s"label $l: $got vs brute $brute")
      assert(got >= -1.0 - 1e-9 && got <= 1.0 + 1e-9)
    }
  }

  test("lsh_curve: matches closed form, strictly increasing, correct endpoints") {
    val rows = graft.queries.QueriesSim.queries("lsh_curve")(spark, "unused")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.length == 19)
    for ((j, p) <- rows) {
      val expect = 1.0 - math.pow(1.0 - math.pow(j, 4), 16)
      assert(math.abs(p - expect) < 1e-6, s"j=$j: $p vs $expect")
    }
    // non-decreasing overall (the 1e6 rounding saturates the top of the S
    // at 1.0); strictly increasing through the threshold region j <= 0.8
    assert(rows.sliding(2).forall { case Array((_, a), (_, b)) => a <= b })
    assert(rows.filter(_._1 <= 0.8).sliding(2)
      .forall { case Array((_, a), (_, b)) => a < b })
    assert(rows.head._2 < 0.001 && rows.last._2 > 0.999) // steep S around the threshold
  }

  test("label_balance: shares partition the corpus, majority ratio is exactly 1") {
    val dir = "/root/testdata/sf0.001"
    val total = graft.queries.Tables.t(spark, dir, "embeddings")
      .where(col("label").isNotNull).count()
    val rows = graft.queries.QueriesSim.queries("label_balance")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._2).sum == total)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    val top = rows.maxBy(_._2)
    assert(top._4 == 1.0, s"majority label ratio ${top._4}")
    rows.foreach { case (l, n, sh, rt) =>
      assert(n > 0 && sh > 0 && rt > 0 && rt <= 1.0, s"label $l")
    }
  }

  test("graph_communities: recovered communities are region-pure and partition the nations") {
    val reg = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rows = graft.queries.QueriesAnalytics.queries("graph_communities")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq == reg.keys.toSeq.sorted, "every nation labeled once")
    // the algorithm must recover the planted regional affinity: no community
    // spans two regions
    rows.groupBy(_._2).foreach { case (comm, ns) =>
      val regions = ns.map(n => reg(n._1)).toSet
      assert(regions.size == 1, s"community $comm mixes regions $regions")
    }
    // sizes are consistent with membership counts
    val sizes = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (_, c, sz) => assert(sz == sizes(c)) }
  }

  test("withinGroupPairs: salted path is row-identical to plain on a mega-group") {
    import spark.implicits._
    // one 300-item outlier group (forces S=5 chunks at chunk=64), several
    // normal groups, plus duplicates of group keys across items
    val rows =
      (1 to 300).map(i => (1L, 1000L + i)) ++
      (1 to 7).map(i => (2L, 2000L + i)) ++
      Seq((3L, 3001L)) ++
      (1 to 64).map(i => (4L, 4000L + i))
    val df = rows.toDF("l_orderkey", "l_partkey")
    def collectPairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val plain = collectPairs(QueriesAnalytics.withinGroupPairs(df, salted = false))
    val salted = collectPairs(QueriesAnalytics.withinGroupPairs(df, salted = true))
    assert(plain == salted, "salted pair set must equal plain pair set")
    // exact expected cardinality: sum over groups of n*(n-1)/2
    val expected = 300 * 299 / 2 + 7 * 6 / 2 + 0 + 64 * 63 / 2
    assert(plain.size == expected)
    assert(plain.distinct.size == plain.size, "each pair exactly once")
    assert(plain.forall { case (_, a, b) => a < b })
  }
}
