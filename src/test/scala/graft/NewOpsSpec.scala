package graft

import org.apache.spark.sql.functions._

/** Session-4 operator batch: join-family completions (full/cross/Q3
  * composite), time-series resample+LOCF, deterministic stratified sampling,
  * runtime bloom-filter join, array/stats function coverage, bucketed sink,
  * and multimodal frame sampling. Each test drives the declared query fn on
  * sf0.001 (the smoke scale) and checks the semantic invariants the DuckDB
  * hash compare can't express (plan shapes, tiling, determinism).
  */
class NewOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("join_full: sides partition the key space and counts are consistent") {
    val rows = q("join_full").collect()
    assert(rows.nonEmpty)
    val bySide = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    // genuine one-side-only keys must exist in both directions
    assert(bySide.getOrElse("f_only", 0) > 0 && bySide.getOrElse("o_only", 0) > 0)
    rows.foreach { r =>
      val (nF, nO, side) = (r.getLong(1), r.getLong(2), r.getString(3))
      side match {
        case "f_only" => assert(nF > 0 && nO == 0)
        case "o_only" => assert(nO > 0 && nF == 0)
        case "both"   => assert(nF > 0 && nO > 0)
      }
    }
  }

  test("join_cross: dense grid has every segment × priority cell exactly once") {
    val rows = q("join_cross").collect()
    assert(rows.length == 25, s"expected 5x5 grid, got ${rows.length}")
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 25)
    // grid cells with no orders must be present with zero counts, not absent
    rows.foreach(r => assert(r.getLong(2) >= 0))
  }

  test("relational_q3: top-k by revenue, descending, at most 10 rows") {
    val rows = q("relational_q3").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "revenue not descending")
  }

  test("round-4 TPC-H shapes: pushdown and join kinds land in the plans") {
    // q6: every predicate sargable — the scan must carry pushed filters on
    // shipdate/discount/quantity and read ONLY the referenced columns
    val q6 = q("relational_q6")
    val q6scan = q6.queryExecution.executedPlan.toString
    assert(q6scan.contains("PushedFilters") &&
      q6scan.contains("l_discount") && q6scan.contains("l_quantity"),
      s"q6 scan lost its pushed filters:\n${q6scan.take(2000)}")
    assert(!q6scan.contains("l_orderkey"), "q6 reads columns it never uses")
    // q20: the supplier side must enter as a LEFT SEMI (never row-multiplied)
    val q20plan = q("relational_q20").queryExecution.executedPlan.toString
    assert(q20plan.contains("LeftSemi"), s"q20 lost its semi join:\n${q20plan.take(2000)}")
    // q22: the no-recent-orders predicate must be a LEFT ANTI join
    val q22plan = q("relational_q22").queryExecution.executedPlan.toString
    assert(q22plan.contains("LeftAnti"), s"q22 lost its anti join:\n${q22plan.take(2000)}")
    // q13: the outer join must SURVIVE in the plan (a filter placed on the
    // join output instead of the orders side would let the planner degrade
    // it to inner and silently drop zero-order customers; at sf0.001 every
    // customer happens to have orders, so the PLAN is the only witness)
    val q13plan = q("relational_q13").queryExecution.executedPlan.toString
    assert(q13plan.contains("LeftOuter"),
      s"q13 lost its outer join:\n${q13plan.take(2000)}")
  }

  test("resample_ffill: gap-free calendar, LOCF fills interior gaps only") {
    val rows = q("resample_ffill").collect()
    val byUser = rows.groupBy(_.getLong(0))
    // every user covers the same global calendar (shared bounds)
    val spans = byUser.values.map(_.length).toSet
    assert(spans.size == 1, s"users disagree on calendar length: $spans")
    byUser.values.foreach { urows =>
      val vals = urows.sortBy(_.getTimestamp(1).getTime).map(r =>
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      // once a value appears, LOCF never yields null again
      val firstDefined = vals.indexWhere(_.isDefined)
      if (firstDefined >= 0)
        assert(vals.drop(firstDefined).forall(_.isDefined), "null after first observation")
    }
    // consecutive days: count == distinct days == (max-min)/day + 1
    val days = rows.map(_.getTimestamp(1).getTime).distinct.sorted
    assert(days.zip(days.tail).forall { case (a, b) => b - a == 86400000L })
  }

  test("sample_stratified: deterministic, bounded, and rate-ordered") {
    val a = q("sample_stratified").collect()
    val b = q("sample_stratified").collect()
    assert(a.toSeq == b.toSeq, "systematic sample must be rerun-identical")
    a.foreach(r => assert(r.getLong(2) <= r.getLong(1), "sampled > total"))
    // urgent keeps ~50%, low ~1%: realized rates must order the same way
    val rate = a.map(r => r.getString(0) -> r.getLong(2).toDouble / r.getLong(1)).toMap
    assert(rate("1-URGENT") > rate("3-MEDIUM") && rate("3-MEDIUM") > rate("5-LOW"))
  }

  test("join_bloom: runtime bloom filter lands in the plan; result = plain join") {
    val df = q("join_bloom")
    val n = df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloomfilter") || plan.contains("might_contain"),
      s"no runtime bloom filter in plan:\n$plan")
    // plan-invariance: same aggregate without the bloom session
    val l = queries.Tables.t(spark, sf, "lineitem")
    val sup = queries.Tables.t(spark, sf, "supplier").where(col("s_nationkey") === 3)
    val plain = l.join(sup, l("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("s_suppkey")).collect()
    assert(df.orderBy(col("s_suppkey")).collect().toSeq == plain.toSeq)
  }

  test("array_funcs: first3 is sorted-distinct prefix; element_at ends match") {
    val rows = q("array_funcs").limit(50).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "distinct > total tokens")
      val first3 = r.getString(3).split(",").filter(_.nonEmpty)
      assert(first3.sameElements(first3.sorted), "first3 not sorted")
    }
  }

  test("stats_funcs: corr in [-1,1], slope/intercept consistent with moments") {
    val rows = q("stats_funcs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getDouble(2)
      assert(corr >= -1.0 && corr <= 1.0)
      // regression line must pass near (avg_x, avg_y): y̅ ≈ slope·x̅ + intercept
      // (checked coarsely — the oracle pins exact values)
      assert(!r.isNullAt(4) && !r.isNullAt(5))
    }
  }

  test("sink_bucketed: co-located join plan has no exchange below the aggregate") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    try {
      q("sink_bucketed").collect() // writes bkt_orders / bkt_customer
      val o = spark.table("bkt_orders"); val c = spark.table("bkt_customer")
      val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("agg_incremental: merged partials equal the full recompute; state is reused") {
    val full = queries.Tables.t(spark, sf, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val merged = q("agg_incremental").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged == full, "incremental merge diverged from full recompute")
    // the state table must exist after the first run and be tiny (per-source rows)
    val statePath = new java.io.File("target").listFiles()
      .filter(f => f.getName.startsWith("aggstate_v1_")).head
    assert(spark.read.parquet(statePath.getPath).count() <= 20)
    // second run hits the persisted state (no exception, same result)
    assert(q("agg_incremental").collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap == full)
  }

  test("quality_budget: kept set is a quality-ordered prefix within the mass budget") {
    val kept = q("quality_budget").collect()
    val docs = queries.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val totals = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nChars = docs.map(d => d._1 -> d._3).toMap
    kept.groupBy(_.getString(1)).foreach { case (src, rows) =>
      assert(rows.map(_.getLong(3)).max <= totals(src) * 0.6, s"$src budget exceeded")
      // cumsum consistency along the quality order: each row's cum − prev
      // must be exactly that doc's n_chars (proves kept set is the true
      // running-order prefix, not an arbitrary subset summing under budget)
      val ordered = rows.sortBy(r => (-r.getDouble(2), r.getLong(0)))
      ordered.foldLeft(0L) { (prev, r) =>
        val cum = r.getLong(3)
        assert(cum - prev == nChars(r.getLong(0)), s"$src: cum gap at doc ${r.getLong(0)}")
        cum
      }
    }
  }

  test("agg_extra: argmax key attains the group max price") {
    val li = queries.Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val maxPrice = li.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    q("agg_extra").collect().foreach { r =>
      val flag = r.getString(0); val amKey = r.getLong(1)
      val price = li.filter(x => x._1 == flag && x._2 == amKey).map(_._3).max
      assert(price == maxPrice(flag), s"$flag: argmax key $amKey doesn't attain max")
    }
  }

  test("json_variant: typed path extraction round-trips the base columns") {
    val rows = q("json_variant").collect()
    val base = queries.Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), round(col("o_totalprice"), 2))
      .orderBy(col("o_orderkey")).limit(1000).collect()
    assert(rows.length == base.length)
    rows.zip(base).foreach { case (v, b) =>
      assert(v.getLong(0) == b.getLong(0) && v.getString(1) == b.getString(1)
        && v.getDouble(2) == b.getDouble(2))
    }
  }

  test("binary_source: blob content md5 matches a direct file read") {
    val viaSpark = spark.read.format("binaryFile").load(s"$sf/*.parquet")
      .select(element_at(split(col("path"), "/"), -1).as("file"), md5(col("content")).as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaSpark.nonEmpty)
    viaSpark.foreach { case (name, m) =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$sf/$name"))
      val direct = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      assert(m == direct, s"$name: content md5 diverged")
    }
  }

  test("sink_compact: physical file count shrinks to the computed target") {
    val row = q("sink_compact").collect().head
    val (before, after) = (row.getLong(2), row.getLong(3))
    def parquets(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquets("target/tmp_compact_small") == before.toInt)
    assert(parquets("target/tmp_compact_big") == after.toInt)
    assert(after < before, s"compaction didn't shrink: $before -> $after")
    assert(after == math.max(1L, math.ceil(row.getLong(0) / 50000.0).toLong))
  }

  test("schema_evolution: merged read unifies drifted schemas with nulls for old rows") {
    q("schema_evolution").collect() // writes both batches
    val merged = spark.read.option("mergeSchema", "true")
      .parquet("target/tmp_schema_evo/b=1", "target/tmp_schema_evo/b=2")
    assert(merged.columns.toSet == Set("doc_id", "source", "lang", "n_chars"))
    val oldRows = merged.where(col("doc_id") < 250)
    assert(oldRows.where(col("lang").isNotNull).count() == 0, "old batch must have null lang")
    assert(merged.count() == queries.Tables.t(spark, sf, "documents").count())
  }

  test("typed_streaks: mapGroups result equals the window-based computation") {
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val m = queries.Tables.t(spark, sf, "orders")
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("ym"))
        .distinct()
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("ym"))
      m.withColumn("grp", col("ym") - row_number().over(w))
        .groupBy(col("o_custkey"), col("grp")).agg(count(lit(1)).as("streak"))
        .groupBy(col("o_custkey")).agg(max(col("streak")).as("max_streak"))
        .groupBy(col("max_streak")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val viaTyped = q("typed_streaks").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaTyped == viaWindow, s"typed=$viaTyped window=$viaWindow")
  }

  test("dedup_apply: kept = cluster representatives, counts partition the corpus") {
    val row = q("dedup_apply").collect().head
    val (before, kept, dropped) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(kept + dropped == before)
    assert(kept > 0 && dropped > 0, "constructed corpus must have real clusters")
    // representatives are exactly the component labels of dedup_clusters
    val labels = q("dedup_clusters").collect()
    val reps = labels.map(_.getLong(1)).distinct.sorted
    assert(kept == reps.length && row.getLong(3) == reps.sum)
  }

  test("event_funnel: stage counts are monotonically non-increasing") {
    val row = q("event_funnel").collect().head
    val (s1, s2, s3) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(s1 >= s2 && s2 >= s3, s"funnel not monotonic: $s1 >= $s2 >= $s3")
    assert(s1 > 0 && s3 > 0, "testdata should populate every stage")
  }

  test("score_normalize: z centers near 0 per source, pct spans [0,1]") {
    val rows = q("score_normalize").collect()
    rows.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
    rows.groupBy(_.getString(1)).foreach { case (src, g) =>
      val zs = g.filterNot(_.isNullAt(3)).map(_.getDouble(3))
      if (zs.nonEmpty) {
        val mean = zs.sum / zs.length
        assert(math.abs(mean) < 1e-2, s"$src: z mean $mean not centered")
      }
      assert(g.map(_.getDouble(4)).max == 1.0 || g.length == 1)
    }
  }

  test("na_funcs: fill/drop/replace counts are mutually consistent") {
    val r = q("na_funcs").collect().head
    val (total, afterDrop, filled, nullsAfterFill, tap, clickLeft) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(afterDrop + filled == total, "drop + fill must partition the rows")
    assert(filled > 0, "injected nulls must exist")
    assert(nullsAfterFill == 0, "fill must leave no nulls")
    assert(tap > 0 && clickLeft == 0, "replace must rename every click")
  }

  test("merge_intervals: islands cover their events, covered time ≥ one interval") {
    val rows = q("merge_intervals").collect()
    assert(rows.nonEmpty)
    val events = queries.Tables.t(spark, sf, "events").where(col("user_id") < 40)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (uid, nIvl, covered, maxMerged) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nIvl >= 1 && nIvl <= events(uid), s"user $uid: island count out of range")
      // every island spans at least one 5-minute interval
      assert(covered >= nIvl * 300000000L, s"user $uid: covered < islands × 5min")
      assert(maxMerged >= 1 && maxMerged <= events(uid))
    }
  }

  test("histogram_bins: bins partition all orders within the fixed domain") {
    val rows = q("histogram_bins").collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 19))
    val total = queries.Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum == total, "bin counts must partition the table")
  }

  test("source_overlap: full pair matrix, jaccard bounded by set sizes") {
    val rows = q("source_overlap").collect()
    val sizes = queries.Tables.t(spark, sf, "documents")
      .select(col("source"), explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .distinct().groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every unordered pair exactly once (synthetic sources share vocabulary)
    assert(rows.length == sizes.size * (sizes.size - 1) / 2)
    rows.foreach { r =>
      val (a, b, common, j) = (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(a < b)
      assert(common <= math.min(sizes(a), sizes(b)), s"($a,$b): |A∩B| > min size")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("upsert_merge: inserts add rows, updates don't, totals shift by the bump") {
    val base = queries.Tables.t(spark, sf, "customer")
    val merged = q("upsert_merge").collect()
    assert(merged.map(_.getLong(1)).sum == base.count() + 3, "3 inserts expected")
    assert(merged.exists(r => r.getString(0) == "NEW" && r.getLong(1) == 3))
  }

  test("scd2_history: ranges chain per customer, exactly one open range each") {
    val rows = q("scd2_history").collect()
    rows.groupBy(_.getLong(0)).foreach { case (cust, g) =>
      assert(g.count(_.isNullAt(3)) == 1, s"cust $cust: exactly one current range")
      // chain invariant, tie-robust (two change-points can share a date, so
      // re-sorting by valid_from can't reconstruct the true order): in a
      // chained range set, the non-null valid_to values are exactly the
      // valid_from values minus one instance of the earliest
      // (o_orderdate is TIMESTAMP_NTZ → LocalDateTime rows)
      val froms = g.map(_.getAs[java.time.LocalDateTime](2)).toSeq
      val tos = g.filterNot(_.isNullAt(3)).map(_.getAs[java.time.LocalDateTime](3)).toSeq
      val first = froms.min(Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _))
      val expected = froms.diff(Seq(first))
      assert(tos.sorted(Ordering.by[java.time.LocalDateTime, String](_.toString)) ==
        expected.sorted(Ordering.by[java.time.LocalDateTime, String](_.toString)),
        s"cust $cust: valid_to multiset must equal valid_from minus the earliest")
    }
  }

  test("mix_temperature: shares sum to 1, temperature flattens the distribution") {
    val rows = q("mix_temperature").collect()
    val shares = rows.map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 1e-3, s"shares sum ${shares.sum}")
    rows.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    // τ=0.5 must compress ratios: share ratio between any two sources is
    // the sqrt of their count ratio
    val ns = rows.map(_.getLong(1).toDouble)
    val (iMax, iMin) = (ns.indexOf(ns.max), ns.indexOf(ns.min))
    if (ns(iMax) > ns(iMin)) {
      val countRatio = ns(iMax) / ns(iMin)
      val shareRatio = shares(iMax) / shares(iMin)
      assert(shareRatio < countRatio, "temperature must flatten")
      assert(math.abs(shareRatio - math.sqrt(countRatio)) < 0.01)
    }
  }

  test("lm_score: log-probs negative and bounded by the smoothing floor") {
    val rows = q("lm_score").collect()
    assert(rows.length == 50)
    // worst case per bigram: unseen continuation after the MOST FREQUENT
    // history word — ln(1/(maxC1 + V)); every avg must sit in (floor, 0)
    val c1 = queries.Tables.t(spark, sf, "documents").where(col("doc_id") >= 50)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("w")).count()
    val v = c1.count()
    val maxC1 = c1.agg(max(col("count"))).head().getLong(0)
    val floor = math.log(1.0 / (maxC1 + v))
    rows.foreach { r =>
      val lp = r.getDouble(2)
      assert(lp < 0.0 && lp >= floor, s"doc ${r.getLong(0)}: avg_logp $lp outside ($floor, 0)")
      assert(r.getLong(1) >= 1, "every doc has at least one bigram")
    }
    // in-domain text must beat the unseen-everything floor by a wide margin
    assert(rows.map(_.getDouble(2)).max > floor / 2)
  }

  test("multimodal_framesample: 4 frames per doc tile the payload exactly") {
    val rows = q("multimodal_framesample").collect()
    val docs = queries.Tables.t(spark, sf, "documents").where(col("doc_id") < 200)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, frames) =>
      assert(frames.length == 4, s"doc $id: expected 4 frames")
      assert(frames.map(_.getLong(2)).sum == docs(id), s"doc $id: frames don't tile payload")
    }
  }
}
