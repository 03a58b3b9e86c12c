package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-stage codegen integrity: the custom native expressions must ride
  * inside WholeStageCodegen spans, not force interpreted fallback — the
  * difference between a codegen'd scan-project and a per-row interpreter at
  * 100 TB. */
class CodegenSpec extends SparkSpec {

  test("RelaxedParseDouble and TrimNullify stay inside WholeStageCodegen") {
    // spark.range (not a local literal Seq, which ConvertToLocalRelation
    // would constant-fold on the driver before any codegen happens)
    val df = spark.range(1, 101)
      .select(concat(lit(" $"), col("id").cast(StringType), lit(",000.5 ")).as("s"))
      .select(TypeGuess.relaxedDouble(col("s")).as("d"),
        TypeGuess.trimAndNullify(col("s")).as("t"))
    // '*' prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [relaxed_double"), s"no codegen span:\n$plan")
    assert(df.where(col("d").isNull).count() == 0L)
    // and the generated code actually compiles+runs (no silent fallback)
    val got = df.select(sum(col("d"))).head().getDouble(0)
    assert(got == (1 to 100).map(i => i * 1000 + 0.5).sum)
  }

  test("NearestCells: codegen'd, exact argmin order, deterministic ties") {
    import graft.operators.Ivf
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0))
    val df = spark.range(0, 100)
      .select(col("id"), array(col("id").cast(DoubleType) % 11, lit(0.0)).as("v"))
      .select(col("id"), Ivf.nearestCells(col("v"), cents, 2).as("cells"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [") && plan.contains("nearest_cells"),
      s"nearest_cells lost codegen:\n$plan")
    val byId = df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(byId(0L) == Seq(0, 1), "0 ties to cells 0/1? no — (0,0) is cell 0, next is (10,0)")
    assert(byId(3L) == Seq(0, 1))   // x=3 → nearest (0,0) then (10,0)
    assert(byId(8L) == Seq(1, 0))   // x=8 → nearest (10,0) then (0,0)
    // x=5: equidistant to cells 0 and 1 → strict < keeps the lower index first
    assert(byId(5L) == Seq(0, 1))
  }

  test("NearestCellDists: codegen'd, distances match explicit chains, order/ties exact") {
    import graft.operators.Ivf
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0))
    val df = spark.range(0, 100)
      .select(col("id"), array(col("id").cast(DoubleType) % 11, lit(0.0)).as("v"))
      .select(col("id"), Ivf.nearestCellDists(col("v"), cents, 2).as("nd"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [") && plan.contains("nearest_cell_dists"),
      s"nearest_cell_dists lost codegen:\n$plan")
    val rows = df.collect().map { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](1)
      r.getLong(0) -> a.map(s => (s.getInt(0), s.getDouble(1)))
    }.toMap
    // distances are the exact sequential (v−c)² sums of the explicit chain
    val x3 = 3.0
    assert(rows(3L) == Seq((0, x3 * x3 + 0.0), (1, (x3 - 10.0) * (x3 - 10.0) + 0.0)))
    assert(rows(8L).map(_._1) == Seq(1, 0))
    // x=5: equidistant to cells 0/1 → lower index first, identical distances
    assert(rows(5L).map(_._1) == Seq(0, 1))
    assert(rows(5L)(0)._2 == rows(5L)(1)._2)
    // ragged input: vector shorter than centroids pads with 0
    import spark.implicits._
    val short = Seq(Array(3.0)).toDF("v")
      .select(Ivf.nearestCellDists(col("v"), cents, 3).as("nd"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(short.map(s => (s.getInt(0), s.getDouble(1))) ==
      Seq((0, 9.0), (1, 49.0), (2, 9.0 + 100.0)))
  }

  test("NearestCells: NaN/Infinity embeddings assign a cell instead of crashing") {
    import graft.operators.Ivf
    import spark.implicits._
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0))
    // NaN distance: every comparison is false — the argmin seed must still
    // pick a cell (used(-1) crash, review finding r2)
    val df = Seq(
      Array(Double.NaN, 1.0), Array(Double.PositiveInfinity, 0.0), Array(1.0, 1.0))
      .toDF("v").select(Ivf.nearestCells(col("v"), cents, 2).as("cells"))
    val got = df.collect().map(_.getSeq[Int](0))
    assert(got.forall(_.toSet == Set(0, 1)), got.mkString(";"))
    assert(got(2) == Seq(0, 1)) // finite vector still exact argmin order
  }

  test("CosineSim: codegen'd, bit-identical to the composed-builtin form") {
    import graft.functions.SimFns
    // deterministic float vectors incl. negatives and magnitude spread
    val df = spark.range(0, 200)
      .select(col("id"), array((0 until 8).map(i =>
        ((col("id") * (i + 3) % 17).cast(FloatType) - lit(8.0f)) / lit(3.0f)): _*).as("v"))
    val pairs = df.as("a").join(df.as("b"), col("a.id") + 100 === col("b.id"))
    // codegen check on a native-only projection (the composed HOF form is
    // interpreted BY DESIGN — putting it in the same Project would disable
    // codegen for the whole stage and prove nothing about the native expr)
    val nativeOnly = pairs.select(SimFns.cosine(col("a.v"), col("b.v")).as("native"))
    nativeOnly.collect()
    val plan = nativeOnly.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim"), s"native cosine missing from plan:\n$plan")
    assert(plan.contains("*(") && plan.contains("Project [cosine_sim"),
      s"cosine projection lost codegen:\n$plan")
    val both = pairs.select(
      SimFns.cosine(col("a.v"), col("b.v")).as("native"),
      SimFns.cosineComposed(col("a.v"), col("b.v")).as("composed"))
    both.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} composed=${r.getDouble(1)}")
    }
    // NULL-contract edges: zero vector, NULL element, length mismatch — the
    // native expression must agree with the composed form on every one
    import spark.implicits._
    val edge = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),   // zero norm → NULL
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),   // identity → 1.0
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))) // length mismatch → NULL
      .toDF("a", "b")
      .union(Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 2.0f)))
        .toDF("a", "b")) // NULL element → NULL
    edge.select(SimFns.cosine($"a", $"b").as("n"), SimFns.cosineComposed($"a", $"b").as("c"))
      .collect().foreach(r => assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getDouble(0) == r.getDouble(1)), s"edge mismatch: $r"))
  }

  test("DeflateRatio: codegen'd, and codegen equals direct compute on varied inputs") {
    import graft.functions.TextFns
    import org.apache.spark.unsafe.types.UTF8String
    val df = spark.range(1, 200)
      .select(col("id"),
        concat_ws(" ", lit("tok"), col("id").cast(StringType),
          lit("abc " * 5), md5(col("id").cast(StringType))).as("s"))
      .select(col("id"), col("s"), TextFns.deflateRatio(col("s")).as("r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [") && plan.contains("deflate_ratio"),
      s"deflate_ratio lost codegen:\n$plan")
    // the codegen'd path must agree with a direct library call row-by-row
    for (r <- df.collect()) {
      val expect = graft.plans.DeflateRatio.compute(UTF8String.fromString(r.getString(1)))
      assert(r.getDouble(2) == expect, s"row ${r.getLong(0)}")
    }
  }

  test("cosine_sim is SQL-registered via GraftExtensions") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.6D, 0.8D)) AS c").head().getDouble(0)
    assert(math.abs(got - 0.6) < 1e-12)
  }

  test("text_stats is SQL-registered via GraftExtensions") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT text_stats('the quick brown fox is fast').n_tokens AS t," +
      " text_stats('the quick brown fox is fast').n_stop AS s").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
  }

  test("flagship aggregate runs in a codegen'd pipeline") {
    val df = SparkEntry.queries("agg_group")(spark, "/root/testdata/sf0.001")
    df.collect() // AQE finalizes the plan only on execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"agg_group lost codegen:\n$plan")
  }

  test("L2Normalize: codegen'd, bit-identical to the composed form, NULL contract") {
    import graft.functions.SimFns
    val df = spark.range(0, 200)
      .select(col("id"), array(
        (col("id") % 7).cast(DoubleType), (col("id") % 5).cast(DoubleType),
        (col("id") % 3).cast(DoubleType)).as("v"))
    val got = df.select(col("id"), SimFns.l2normalize(col("v")).as("u"))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [") && plan.contains("l2_normalize"),
      s"l2_normalize lost codegen:\n$plan")
    // composed reference: let-bound norm, same fold order
    val norm = sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x))
    val ref = df.select(col("id"),
      when(norm > 0, transform(col("v"), x => x / norm)).as("u"))
    val g = got.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    val e = ref.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(g.size == 200 && g == e, "native normalize must be bit-identical to composed")
    // id=105: 105%7=0, %5=0, %3=0 — the zero vector must be NULL
    assert(g(105L) == null)
    // float input promotes exactly
    import spark.implicits._
    val f = Seq(Array(3.0f, 4.0f)).toDF("v")
      .select(SimFns.l2normalize(col("v"))).head().getSeq[Double](0)
    assert(f == Seq(0.6, 0.8))
  }
}
