package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the pre-shuffle technique for repeated joins
  * on the same key at 100 TB: both tables written bucketed+sorted by the
  * join key join with NO exchange and NO sort. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without Exchange and match the unbucketed result") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val facts = spark.range(10000).select(
        (col("id") % 100).as("k"), (col("id") * 7 % 1000).cast("double").as("v"))
      val dims = spark.range(100).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
      // the in-memory catalog forgets tables across JVMs but the warehouse
      // directories survive — saveAsTable refuses to overwrite orphans
      Seq("b_facts", "b_dims").foreach { t =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"target/warehouse/$t"))
      }
      facts.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_facts")
      dims.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_dims")

      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      val bucketed = joined.groupBy("name").agg(sum("v").as("s"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val plain = facts.join(dims, "k").groupBy("name").agg(sum("v").as("s"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(bucketed == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
