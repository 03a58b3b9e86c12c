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

  test("flagship aggregate runs in a codegen'd pipeline") {
    val df = SparkEntry.queries("agg_group")(spark, "/root/testdata/sf0.001")
    df.collect() // AQE finalizes the plan only on execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"agg_group lost codegen:\n$plan")
  }
}
