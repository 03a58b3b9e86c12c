package graft

import graft.operators.{HeavyHitters, ZOrder}
import org.apache.spark.sql.functions._

/** Scale-pattern operators: Misra-Gries exact top-k, z-order clustering,
  * HLL mergeable sketches (QueriesScale / operators.{HeavyHitters, ZOrder}). */
class ScaleOpsSpec extends SparkSpec {

  // ---- Misra-Gries -----------------------------------------------------

  test("mgSummarize: retained counts are lower bounds within n/capacity") {
    val items = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++
      (1 to 400).map(i => s"tail$i")
    val mg = HeavyHitters.mgSummarize(scala.util.Random.shuffle(items).iterator, 64)
    val n = items.size
    assert(mg.size <= 64)
    // any item with true count > n/capacity must be retained
    assert(mg.contains("a") && mg.contains("b"))
    // counts are lower bounds, undercounting by at most n/capacity
    assert(mg("a") <= 500 && mg("a") >= 500 - n / 64)
    assert(mg("b") <= 300 && mg("b") >= 300 - n / 64)
  }

  test("mgSummarizeLong: same retention/lower-bound contract on hashed items") {
    val items = Seq.fill(500)(1L) ++ Seq.fill(300)(2L) ++ (100L to 499L)
    val mg = HeavyHitters.mgSummarizeLong(scala.util.Random.shuffle(items).iterator, 64)
    val n = items.size
    assert(mg.size <= 64 && mg.contains(1L) && mg.contains(2L))
    assert(mg(1L) <= 500 && mg(1L) >= 500 - n / 64)
    assert(mg(2L) <= 300 && mg(2L) >= 300 - n / 64)
  }

  test("exactTopK matches full aggregation (provable path and fallback path)") {
    import spark.implicits._
    // zipf-ish: token t_i appears ~1000/i times
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"t$i"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("token")
    val expected = df.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(10).collect().toSeq
    // ample capacity → provably-exact candidate path
    val fast = HeavyHitters.exactTopK(df, 10, capacity = 256).collect().toSeq
    assert(fast == expected, s"candidate path diverged: $fast")
    // capacity too small for the bound → must fall back, still exact
    val fb = HeavyHitters.exactTopK(df, 10, capacity = 2).collect().toSeq
    assert(fb == expected, s"fallback path diverged: $fb")
  }

  test("exactTopK falls back when candidates < k (sweep-emptied summaries)") {
    import spark.implicits._
    // all-singleton vocabulary in ONE partition with a tiny capacity: MG
    // sweeps empty the summary repeatedly, leaving < k candidates — which
    // proves nothing about the true top-k; the gate must fall back
    val df = spark.sparkContext.parallelize((1 to 50).map(i => f"u$i%03d"), 1).toDF("token")
    val got = graft.operators.HeavyHitters.exactTopK(df, 20, capacity = 4).collect().toSeq
    val want = df.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(20).collect().toSeq
    assert(got.length == 20 && got == want, s"got ${got.length} rows")
  }

  // ---- DiscreteQuantile ------------------------------------------------

  test("DiscreteQuantile matches Spark's exact percentile (R-7) per group") {
    import spark.implicits._
    import graft.operators.DiscreteQuantile
    val rng = new scala.util.Random(7)
    // groups of odd/even/1-element sizes, duplicate-heavy discrete values
    val rows = (0 until 997).map(i => (s"g${i % 5}", rng.nextInt(40).toLong)) :+
      (("g9", 42L))
    val df = rows.toDF("k", "v")
    val got = DiscreteQuantile.quantiles(df, Seq("k"), col("v"),
        Seq(0.0, 0.25, 0.5, 0.95, 1.0), Seq("q0", "q25", "q50", "q95", "q100"))
      .orderBy(col("k")).collect().map(_.toSeq).toSeq
    val want = df.groupBy(col("k")).agg(
        expr("percentile(v, 0.0)").as("q0"), expr("percentile(v, 0.25)").as("q25"),
        expr("percentile(v, 0.5)").as("q50"), expr("percentile(v, 0.95)").as("q95"),
        expr("percentile(v, 1.0)").as("q100"))
      .orderBy(col("k")).collect().map(_.toSeq).toSeq
    assert(got == want)
    // the driver-histogram path and the pure helper agree bit-for-bit too
    val viaDriver = DiscreteQuantile.quantilesViaDriver(df, "k", col("v"),
      Seq(0.0, 0.25, 0.5, 0.95, 1.0))
    got.foreach { row =>
      val k = row.head.asInstanceOf[String]
      assert(viaDriver(k) == row.tail.map(_.asInstanceOf[Double]), s"key $k")
    }
    // nulls are ignored, like percentile
    val withNulls = df.unionByName(Seq(("g0", null.asInstanceOf[Any])).map {
      case (k, _) => (k, Option.empty[Long]) }.toDF("k", "v"))
    val gn = DiscreteQuantile.quantiles(withNulls, Seq("k"), col("v"), Seq(0.5), Seq("m"))
      .where(col("k") === "g0").head().getDouble(1)
    val wn = withNulls.where(col("k") === "g0")
      .agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    assert(gn == wn)
    // a key whose values are ALL null still returns, with null quantiles —
    // exactly like percentile
    val allNull = df.unionByName(Seq(("gz", Option.empty[Long])).toDF("k", "v"))
    val gz = DiscreteQuantile.quantiles(allNull, Seq("k"), col("v"), Seq(0.5), Seq("m"))
      .where(col("k") === "gz").collect()
    assert(gz.length == 1 && gz.head.isNullAt(1), s"all-null key: ${gz.toSeq}")
  }

  test("histogramFitsDriver rejects a wide/continuous domain, passes a config-sized one") {
    import spark.implicits._
    import graft.operators.DiscreteQuantile
    // wide domain: every row a distinct value — the 100 TB hazard shape
    val wide = spark.range(200000).select(lit("k").as("k"), col("id").as("v"))
    assert(!DiscreteQuantile.histogramFitsDriver(wide, "k", col("v"), maxRows = 10000))
    // config-sized domain: 40 distinct values no matter the row count
    val narrow = spark.range(200000).select(lit("k").as("k"), (col("id") % 40).as("v"))
    assert(DiscreteQuantile.histogramFitsDriver(narrow, "k", col("v"), maxRows = 10000))
  }

  test("winsorize/outlier_mad distributed fallback ≡ driver-histogram path") {
    val dir = "/root/testdata/sf0.001"
    // maxHistRows = 0 makes the guard fail unconditionally → distributed
    // branch; both branches must produce bit-identical output (same R-7
    // arithmetic over the same cents histogram)
    val winDriver = graft.queries.QueriesScale.winsorized(spark, dir).collect().toSeq
    val winDist = graft.queries.QueriesScale.winsorized(spark, dir, maxHistRows = 0)
      .collect().toSeq
    assert(winDriver == winDist, s"winsorize branches diverge:\n$winDriver\n$winDist")
    assert(winDriver.nonEmpty)
    val madDriver = graft.queries.QueriesScale.outlierMad(spark, dir).collect().toSeq
    val madDist = graft.queries.QueriesScale.outlierMad(spark, dir, maxHistRows = 0)
      .collect().toSeq
    assert(madDriver == madDist, s"outlier_mad branches diverge: ${madDriver.size} vs ${madDist.size}")
    assert(madDriver.nonEmpty)
  }

  test("adaptiveSaltedEquiJoin ≡ unsalted join; advisor factors drive the fan-out") {
    import spark.implicits._
    import graft.operators.SkewJoin
    // skewed fact: key 7 is hot (300 rows), others cold (3 each)
    val fact = ((1 to 300).map(i => (7L, i.toLong)) ++
      (1 to 30).flatMap(k => (1 to 3).map(i => (k.toLong + 100, (k * 1000 + i).toLong))))
      .toDF("k", "payload")
    val dim = ((7L +: (1 to 30).map(_.toLong + 100)) :+ 999L).map(k => (k, s"attr$k"))
      .toDF("dk", "attr")
    val factors = Seq((7L, 100)).toDF("fk", "salt_factor") // advisor-style hot-key factor
    val salted = SkewJoin.adaptiveSaltedEquiJoin(fact, dim, "k", "dk", factors, "fk",
        saltSource = col("payload"))
      .select(col("k"), col("payload"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = fact.join(dim, col("k") === col("dk"))
      .select(col("k"), col("payload"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain, "salting changed the join result")
    assert(salted.nonEmpty && salted.count(_._1 == 7L) == 300)
    // the declared end-to-end query ≡ its own unsalted form at sf0.001
    val dir = "/root/testdata/sf0.001"
    val auto = graft.queries.QueriesScale.queries("join_salted_auto")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(auto.nonEmpty)
  }

  // ---- Z-order ---------------------------------------------------------

  test("zvalue interleaves bits (known patterns) and matches its SQL twin") {
    import spark.implicits._
    val df = Seq((0b101L, 0b011L), (0L, 0L), (7L, 0L), (0L, 7L), (1999L, 99L))
      .toDF("a", "b")
    val got = df.select(ZOrder.zvalue(col("a"), col("b"), 11).as("z"))
      .as[Long].collect().toSeq
    // a=101, b=011 → z bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 27
    // a=111, b=000 → 010101 = 21 ; a=000, b=111 → 101010 = 42
    def ref(a: Long, b: Long): Long =
      (0 until 11).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    assert(got == Seq(27L, 0L, 21L, 42L, ref(1999L, 99L)))
    // the SQL-text twin (used verbatim by the DuckDB oracle) agrees
    val viaSql = df.selectExpr(ZOrder.sqlExpr("a", "b", 11) + " AS z")
      .as[Long].collect().toSeq
    assert(viaSql == got)
  }

  test("writeClustered gives tighter per-file key ranges on BOTH dimensions") {
    import spark.implicits._
    val n = 20000
    // two independent uniform keys — natural (insertion) order has no locality
    val df = spark.range(n).select(
      (pmod(hash(col("id") * 7L), lit(1024))).cast("long").as("a"),
      (pmod(hash(col("id") * 13L + 3L), lit(1024))).cast("long").as("b"))
    val base = "target/tmp_zorder_spec"
    df.repartition(8).write.mode("overwrite").parquet(s"$base/natural")
    ZOrder.writeClustered(df, "a", "b", bits = 10, numFiles = 8, path = s"$base/zorder")
    def meanSpan(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg(col("span"))).head().getDouble(0)
    val (na, nb) = (meanSpan(s"$base/natural", "a"), meanSpan(s"$base/natural", "b"))
    val (za, zb) = (meanSpan(s"$base/zorder", "a"), meanSpan(s"$base/zorder", "b"))
    // 8 files ≈ 3 fixed leading z-bits ≈ files cover ~(1/2, 1/4) of the two
    // key ranges; natural order covers ~the full range in every file
    assert(za < 0.75 * na, s"z-order a-span $za !< 0.75 * natural $na")
    assert(zb < 0.75 * nb, s"z-order b-span $zb !< 0.75 * natural $nb")
  }

  // ---- ShingleGenerator ------------------------------------------------

  test("ShingleGenerator rows == explode(shingles) on real documents") {
    import graft.functions.TextFns
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    for (n <- Seq(1, 3, 10)) {
      val gen = norm(docs.select(col("doc_id"),
        TextFns.shingleExplode(TextFns.tokens(col("text")), n).as("sh")))
      val hof = norm(docs.select(col("doc_id"),
        explode(TextFns.shingles(TextFns.tokens(col("text")), n)).as("sh")))
      assert(gen == hof, s"n=$n: generator ${gen.length} rows vs HOF ${hof.length}")
    }
    // short docs generate nothing; null arrays generate nothing
    import spark.implicits._
    val edge = Seq((1L, "a b"), (2L, ""), (3L, null: String)).toDF("doc_id", "text")
    val got = edge.select(col("doc_id"),
      TextFns.shingleExplode(TextFns.tokens(col("text")), 3).as("sh")).collect()
    assert(got.isEmpty, s"edge rows: ${got.toSeq}")
  }

  // ---- HLL sketches ----------------------------------------------------

  test("hll sketches: per-group ε-accuracy and lossless union merge") {
    import spark.implicits._
    val df = spark.range(60000).select(
      (col("id") % 3).cast("string").as("g"),
      concat(lit("tok"), (col("id") % 17000).cast("string")).as("token"))
    val per = df.groupBy("g").agg(
      hll_sketch_agg(col("token")).as("sk"),
      countDistinct(col("token")).as("exact"))
    val rows = per.select(hll_sketch_estimate(col("sk")).as("est"), col("exact")).collect()
    rows.foreach { r =>
      val (est, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
      assert(math.abs(est - exact) / exact < 0.05, s"estimate $est vs exact $exact")
    }
    // merging per-group sketches == sketching the union directly (kilobytes
    // merged instead of re-scanning raw tokens)
    val merged = per.agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg(col("token")))).head().getLong(0)
    assert(merged == direct, s"union-of-sketches $merged != sketch-of-union $direct")
  }
}
