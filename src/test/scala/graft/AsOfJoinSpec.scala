package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Generic as-of join: boundary semantics (equal-ts, strict vs not), key
  * isolation, no-match nulls, and equivalence with the inline window form. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private val quotes = Seq(
    (1L, 10L, 100.0), (1L, 20L, 101.0), (1L, 30L, 102.0),
    (2L, 15L, 200.0)).toDF("k", "qts", "px")
  private val trades = Seq(
    (1L, 5L, "t0"),   // before any quote → null
    (1L, 20L, "t1"),  // exactly at a quote
    (1L, 25L, "t2"),  // between quotes
    (2L, 40L, "t3"),  // different key
    (3L, 50L, "t4"))  // key with no quotes → null
    .toDF("k", "tts", "tid")

  test("non-strict: equal-ts right row matches") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "tts", "qts", Seq("px", "qts"))
      .orderBy(col("tts")).collect()
      .map(r => (r.getAs[String]("tid"), Option(r.get(r.fieldIndex("asof_px")))))
    assert(out.toSeq == Seq(
      ("t0", None), ("t1", Some(101.0)), ("t2", Some(101.0)),
      ("t3", Some(200.0)), ("t4", None)))
  }

  test("strict: equal-ts right row excluded") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "tts", "qts", Seq("px"), strict = true)
      .orderBy(col("tts")).collect()
      .map(r => (r.getAs[String]("tid"), Option(r.get(r.fieldIndex("asof_px")))))
    assert(out.toSeq == Seq(
      ("t0", None), ("t1", Some(100.0)), ("t2", Some(101.0)),
      ("t3", Some(200.0)), ("t4", None)))
  }

  test("forward direction: earliest right at-or-after; strict excludes equal-ts") {
    val out = AsOfJoin.asOfForward(trades, quotes, Seq("k"), "tts", "qts", Seq("px"))
      .orderBy(col("tts")).collect()
      .map(r => (r.getAs[String]("tid"), Option(r.get(r.fieldIndex("asof_px")))))
    assert(out.toSeq == Seq(
      ("t0", Some(100.0)),  // earliest quote after ts 5 is qts 10
      ("t1", Some(101.0)),  // non-strict: equal-ts quote matches
      ("t2", Some(102.0)),  // next quote after 25 is 30
      ("t3", None),         // no quote at/after 40 for key 2
      ("t4", None)))
    val strictOut = AsOfJoin.asOfForward(trades, quotes, Seq("k"), "tts", "qts",
        Seq("px"), strict = true)
      .orderBy(col("tts")).collect()
      .map(r => (r.getAs[String]("tid"), Option(r.get(r.fieldIndex("asof_px")))))
    assert(strictOut.toSeq == Seq(
      ("t0", Some(100.0)), ("t1", Some(102.0)), // strict skips the qts=20 tie
      ("t2", Some(102.0)), ("t3", None), ("t4", None)))
  }

  test("nearest direction: closer of the two sides wins, ties to backward — r5") {
    // quotes for k=1 at ts 10/20/30. trades: 5 → only forward (10);
    // 20 → exact (20, gap 0 beats forward 30); 25 → TIE (20 back, 30 fwd,
    // both gap 5 — backward wins); k=2 trade at 40 → backward only (15);
    // k=3 → no quotes, null
    val out = AsOfJoin.asOfNearest(trades, quotes, Seq("k"), "tts", "qts", Seq("qts"))
      .orderBy(col("k"), col("tts")).collect()
      .map(r => (r.getAs[String]("tid"), Option(r.get(r.fieldIndex("asof_qts")))))
    assert(out.toSeq == Seq(
      ("t0", Some(10L)), ("t1", Some(20L)), ("t2", Some(20L)),
      ("t3", Some(15L)), ("t4", None)))
  }

  test("tolerance: matches farther back than the bound null out, near ones survive") {
    // numeric axis: trade at 25 matched quote at 20 (gap 5); trade at 20
    // matched quote at 10 under strict (gap 10)
    val out = AsOfJoin.asOfWithin(trades, quotes, Seq("k"), "tts", "qts",
        Seq("px"), tolerance = 5L, strict = true)
      .orderBy(col("tts")).collect()
      .map(r => (r.getAs[String]("tid"), Option(r.get(r.fieldIndex("asof_px")))))
    assert(out.toSeq == Seq(
      ("t0", None),
      ("t1", None),         // gap 10 > 5 → nulled
      ("t2", Some(101.0)),  // gap 5 ≤ 5 → kept
      ("t3", None),         // gap 25 > 5 → nulled
      ("t4", None)))
    // the internal asof_qts helper column must not leak when not asked for
    val cols = AsOfJoin.asOfWithin(trades, quotes, Seq("k"), "tts", "qts",
      Seq("px"), tolerance = 5L).columns.toSet
    assert(!cols.contains("asof_qts"), s"helper column leaked: $cols")
  }

  test("row-atomic carry: a null field in the latest right row is NOT patched from older rows") {
    val q = Seq((1L, 10L, Option(100.0), "q0"), (1L, 20L, Option.empty[Double], "q1"))
      .toDF("k", "qts", "px", "qid")
    val t = Seq((1L, 30L, "t")).toDF("k", "tts", "tid")
    val out = AsOfJoin.asOf(t, q, Seq("k"), "tts", "qts", Seq("px", "qid")).collect().head
    // latest right row is q1 with px=null — px must stay null, not q0's 100.0
    assert(out.getAs[String]("asof_qid") == "q1")
    assert(out.isNullAt(out.fieldIndex("asof_px")))
  }

  test("null right timestamp is never carried as a match — ADVICE r1") {
    val q = Seq((1L, Option.empty[Long], 999.0), (1L, Option(20L), 101.0))
      .toDF("k", "qts", "px")
    val t = Seq((1L, 10L, "t0"), (1L, 25L, "t1")).toDF("k", "tts", "tid")
    val out = AsOfJoin.asOf(t, q, Seq("k"), "tts", "qts", Seq("px"))
      .orderBy(col("tts")).collect()
      .map(r => (r.getAs[String]("tid"), Option(r.get(r.fieldIndex("asof_px")))))
    // t0 precedes every real quote → no match (NOT the null-ts row's 999.0)
    assert(out.toSeq == Seq(("t0", None), ("t1", Some(101.0))))
  }

  test("native plan: AsOfMergeJoin with co-partitioned sorted children") {
    val df = AsOfJoin.asOf(trades, quotes, Seq("k"), "tts", "qts", Seq("px"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"custom exec missing:\n$plan")
    assert(plan.contains("Sort ["), s"children not sorted:\n$plan")
  }

  test("differential: native merge exec ≡ union-window formulation") {
    // adversarial corpus: hot key, duplicate (key,ts) on both sides, null
    // left ts, null right ts, keys present on only one side
    val rng = new scala.util.Random(7)
    val lRows = (0 until 400).map { i =>
      val k = if (i % 41 == 0) None // null keys group together (carry semantics)
        else if (i % 3 == 0) Some(1L) // key 1 is hot
        else Some(rng.nextInt(8).toLong)
      val ts = if (i % 37 == 0) None else Some(rng.nextInt(50).toLong)
      (k, ts, s"l$i")
    }
    val rRows = (0 until 300).map { i =>
      val k = if (i % 29 == 0) None else Some(rng.nextInt(10).toLong) // keys 8,9 absent from left
      val ts = if (i % 23 == 0) None else Some(rng.nextInt(50).toLong)
      (k, ts, rng.nextInt(5).toDouble, s"r$i")
    }
    val l = lRows.toDF("k", "lts", "lid")
    val r = rRows.toDF("k", "rts", "v", "rid")
    for (strict <- Seq(false, true); keys <- Seq(Seq("k"), Nil)) {
      // keys=Nil is the GLOBAL as-of (AllTuples distribution, single group)
      val native = AsOfJoin.asOf(l, r, keys, "lts", "rts", Seq("v", "rid"), strict)
      val window = AsOfJoin.asOfUnionWindow(l, r, keys, "lts", "rts", Seq("v", "rid"), strict)
      assert(native.columns.toSeq == window.columns.toSeq)
      val n = native.orderBy(col("lid")).collect().map(_.toSeq).toSeq
      val w = window.orderBy(col("lid")).collect().map(_.toSeq).toSeq
      assert(n == w, s"strict=$strict keys=$keys: native and union-window disagree")
    }
  }

  test("self-join: left and right from the same relation (shared exprIds) — regression") {
    // both sides derive from ONE DataFrame: without dedup the custom node's
    // children share attribute ids, the optimizer prunes the right key, and
    // execution dies with ATTRIBUTE_NOT_FOUND (found via stale verify output)
    val events = Seq(
      (1L, 10L, "purchase"), (1L, 5L, "click"), (1L, 8L, "click"),
      (2L, 10L, "purchase"), (2L, 20L, "click")).toDF("k", "ts", "typ")
    val l = events.where(col("typ") === "purchase").select(col("k"), col("ts"))
    val r = events.where(col("typ") === "click")
      .select(col("k"), col("ts").as("cts"))
    val out = AsOfJoin.asOf(l, r, Seq("k"), "ts", "cts", Seq("cts"), strict = true)
      .orderBy(col("k")).collect()
      .map(rw => (rw.getLong(0), Option(rw.get(rw.fieldIndex("asof_cts")))))
    assert(out.toSeq == Seq((1L, Some(8L)), (2L, None)))
  }

  test("pushed filter reaches a partitioned parquet scan (partition pruning below as-of)") {
    // even via the per-session (late-batch) rule registration, path-based
    // parquet partition pruning happens at PHYSICAL planning from the
    // Filter/Project stack — the pushed key filter must prune partitions
    val dir = "target/tmp_asof_part"
    quotes.write.mode("overwrite").partitionBy("k").parquet(dir)
    val q2 = spark.read.parquet(dir) // k is now a PARTITION column (int-inferred)
    val out = AsOfJoin.asOf(trades, q2, Seq("k"), "tts", "qts", Seq("px"))
      .where(col("k") === 2L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the transferred predicate arrives cast-wrapped (int partition col vs
    // long key) and still prunes: PartitionFilters: [(cast(k#N as bigint) = 2)]
    val pf = "PartitionFilters: \\[[^\\]]*= 2\\)".r
    assert(pf.findFirstIn(plan).isDefined,
      s"transferred key predicate did not prune right-side partitions:\n$plan")
    assert(out.count() == 1L)
  }

  test("mixed-width key and ts types coerce instead of silently losing matches") {
    // left key INT / right key BIGINT, left ts BIGINT / right ts INT: the
    // exec hashes each side with its own type, so without widening casts
    // matching keys land in different partitions (review finding r2)
    val l = Seq((1, 10L, "a"), (2, 20L, "b")).toDF("k", "ts", "tag")
    val r = Seq((1L, 5, 100.0), (2L, 15, 200.0)).toDF("k", "rts", "px")
    val out = AsOfJoin.asOf(l, r, Seq("k"), "ts", "rts", Seq("px"))
      .orderBy(col("k")).collect()
      .map(rw => (rw.getInt(0), Option(rw.get(rw.fieldIndex("asof_px")))))
    assert(out.toSeq == Seq((1, Some(100.0)), (2, Some(200.0))))
    // incompatible types fail loudly, not with garbage results
    val bad = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, bad.select(col("k"), col("ts").as("rts"), lit(1.0).as("px")),
        Seq("k"), "ts", "rts", Seq("px"))
    }
  }

  test("differential with STRING keys (UTF8 ordering path)") {
    val rng = new scala.util.Random(11)
    val names = Seq("alpha", "Beta", "beta", "Γgamma", "δ", "", "z")
    val l = (0 until 150).map(i =>
      (names(rng.nextInt(names.length)), rng.nextInt(30).toLong, s"l$i")).toDF("k", "lts", "lid")
    val r = (0 until 150).map(i =>
      (names(rng.nextInt(names.length)), rng.nextInt(30).toLong, s"r$i")).toDF("k", "rts", "rid")
    val native = AsOfJoin.asOf(l, r, Seq("k"), "lts", "rts", Seq("rid"))
      .orderBy(col("lid")).collect().map(_.toSeq).toSeq
    val window = AsOfJoin.asOfUnionWindow(l, r, Seq("k"), "lts", "rts", Seq("rid"))
      .orderBy(col("lid")).collect().map(_.toSeq).toSeq
    assert(native == window)
  }

  test("pre-partitioned inputs: NO exchange under the as-of join (bucketed-pipeline shape)") {
    // both sides already hash-partitioned on the key: EnsureRequirements
    // must recognize the distribution and skip both shuffles — the shape a
    // bucketed 100 TB pipeline relies on to run as-of joins shuffle-free
    val lp = trades.repartition(4, col("k"))
    val rp = quotes.repartition(4, col("k"))
    val out = AsOfJoin.asOf(lp, rp, Seq("k"), "tts", "qts", Seq("px"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val below = plan.split("AsOfMergeJoin", 2)(1)
      .split("== Initial Plan ==", 2)(0) // AQE string includes the pre-AQE plan
    assert(!below.contains("ENSURE_REQUIREMENTS"),
      s"as-of inserted shuffles despite co-partitioned children:\n$plan")
  }

  test("optimizer rules: left filter + key predicate push below the join; carry pruning") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "tts", "qts", Seq("px", "qts"))
    // 1) a filter above the join over left columns lands below the exec —
    // and its key conjunct transfers to the RIGHT side too
    val filtered = out.where(col("k") === 1L && col("tts") > 6L)
    filtered.collect()
    val fPlan = filtered.queryExecution.optimizedPlan.toString
    assert(!fPlan.trim.startsWith("Filter"), s"filter stayed above the join:\n$fPlan")
    val fExec = filtered.queryExecution.executedPlan.toString
    assert(fExec.contains("AsOfMergeJoin"), fExec)
    // BOTH children carry a filter now (left: k && tts; right: k) — count
    // the Filter operators below the join so a broken right-side transfer
    // can't hide behind the left one
    val belowJoin = fExec.split("AsOfMergeJoin", 2)(1)
    val nFilters = "\\+- Filter ".r.findAllIn(belowJoin).length
    assert(nFilters >= 2, s"expected filters on BOTH children below the join:\n$fExec")
    assert(filtered.collect().map(_.getAs[String]("tid")).toSet == Set("t1", "t2"))
    // nondeterministic conjuncts block later deterministic ones (Spark's
    // pushdown contract): nothing may push below rand()
    val nd = out.where(rand(42) < 0.5 && col("k") === 1L) // NB < 2.0 folds away
    nd.collect()
    val ndPlan = nd.queryExecution.executedPlan.toString
    assert("\\+- Filter ".r.findAllIn(ndPlan.split("AsOfMergeJoin", 2)(1)).isEmpty,
      s"conjunct pushed below a nondeterministic predicate:\n$ndPlan")
    // 2) projecting away one carry column narrows the node; projecting away
    // ALL carry columns deletes the join entirely
    val narrowed = out.select(col("k"), col("tid"), col("asof_px"))
    narrowed.collect()
    assert(!narrowed.queryExecution.optimizedPlan.toString.contains("asof_qts"),
      "unused carry column survived pruning")
    val dead = out.select(col("k"), col("tid"))
    dead.collect()
    assert(!dead.queryExecution.executedPlan.toString.contains("AsOfMergeJoin"),
      "join not eliminated when no carry column is used")
    assert(dead.count() == trades.count())
  }

  test("contentHash: equal for equal content, differs on change") {
    val a = DataTable(quotes)
    val b = DataTable(quotes.orderBy(col("px").desc)) // same multiset, any order
    assert(a.contentHash == b.contentHash)
    assert(a.contentHash != DataTable(quotes.limit(2)).contentHash)
    assert(a.contentHash != DataTable(quotes.withColumn("px", col("px") + 1.0)).contentHash)
    // null-position discrimination: ('a', null) vs (null, 'a') must differ
    val x = DataTable(Seq((Option("a"), Option.empty[String])).toDF("c1", "c2"))
    val y = DataTable(Seq((Option.empty[String], Option("a"))).toDF("c1", "c2"))
    assert(x.contentHash != y.contentHash)
  }
}
