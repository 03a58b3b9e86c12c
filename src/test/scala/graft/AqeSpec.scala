package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Adaptive Query Execution: runtime re-planning a static planner can't do —
  * the join strategy flips to broadcast AFTER the filter's true selectivity
  * is observed. */
class AqeSpec extends SparkSpec {

  test("AQE converts a sort-merge join to broadcast at runtime") {
    import spark.implicits._
    val big = spark.range(200000).select(col("id").as("k"), (col("id") * 2).as("v"))
    // statistically "big" side that becomes tiny after the filter
    val filtered = spark.range(100000).select(col("id").as("k2"), lit("x").as("tag"))
      .where(col("k2") < 10)
    val joined = big.join(filtered, col("k") === col("k2"))
    val n = joined.count()
    assert(n == 10L)
    val plan = joined.queryExecution.executedPlan
    val adaptive = plan.collectFirst { case a: AdaptiveSparkPlanExec => a }
    assert(adaptive.isDefined, "AQE should be active")
    val finalPlan = adaptive.get.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"AQE should have replanned to broadcast:\n$finalPlan")
  }
}
