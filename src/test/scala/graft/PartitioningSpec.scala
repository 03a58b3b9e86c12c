package graft

import org.apache.spark.sql.functions._

/** Partitioned-layout data skipping: hive-style partitioned parquet +
  * partition pruning in the scan — the other half (with bucketing) of the
  * 100 TB layout story. */
class PartitioningSpec extends SparkSpec {

  test("partitionBy write prunes partitions on read") {
    import spark.implicits._
    val dir = "target/tmp_partitioned"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val df = spark.range(10000).select(
      col("id"), (col("id") % 5).cast("string").as("shard"), (col("id") * 3).as("v"))
    df.write.partitionBy("shard").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir).where(col("shard") === "2")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(scan.contains("PartitionFilters") && scan.contains("shard"),
      s"expected partition pruning in scan:\n$scan")
    assert(pruned.count() == 2000L)
    assert(pruned.agg(sum("v")).head().getLong(0) ==
      df.where(col("shard") === "2").agg(sum("v")).head().getLong(0))
  }

  test("min/max row-group skipping: predicate reaches PushedFilters") {
    val dir = "target/tmp_partitioned"
    val scan = spark.read.parquet(dir).where(col("id") > 9000)
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(id,9000)"),
      s"expected pushed filter in scan:\n$scan")
  }
}
