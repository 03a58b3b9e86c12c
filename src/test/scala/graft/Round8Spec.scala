package graft

import org.apache.spark.sql.functions._

/** Round-8 verdict items: mv_join_maintain's base-side probes must be
  * pruned by a delta-key runtime bloom filter (refresh work ∝ delta, not
  * base — the 100 TB contract the round-7 comment promised).
  */
class Round8Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mv_join_maintain: base-side probes carry the delta-key runtime bloom filter") {
    val df = graft.queries.QueriesScale.queries("mv_join_maintain")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected BloomFilterMightContain pruning the base-side probes:\n${plan.take(4000)}")
    // and the pruned plan still equals the full-recompute view
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val full = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.sorted == full.sorted)
  }
}
