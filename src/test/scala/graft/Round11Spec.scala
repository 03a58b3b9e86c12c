package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalOrder

/** Round-11 items: the round-10 verdict's global-window sweep (the five
  * remaining single-task-sort cards moved onto GlobalOrder), the
  * distributed ntile primitive backing it, and the round-10 ADVICE
  * regression guards (bcubed planted-id disjointness, minhash_curve's
  * static operating-point frame). */
class Round11Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("GlobalOrder.withNtile reproduces ntile() semantics for every n mod k") {
    import spark.implicits._
    for (n <- Seq(1, 3, 7, 10, 23, 40); k <- Seq(3, 4, 10)) {
      val df = (1 to n).map(i => (i.toLong, (i * 37 % n).toLong)).toDF("id", "v")
      val want = df.withColumn("t", ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select(col("id"), col("t")).as[(Long, Int)].collect().sortBy(_._1).toSeq
      val got = GlobalOrder.withNtile(df, Seq(col("v"), col("id")), k, "t", numParts = 3)
        .select(col("id"), col("t")).as[(Long, Int)].collect().sortBy(_._1).toSeq
      assert(got == want, s"n=$n k=$k: $got != $want")
    }
  }

  test("withNtile descending via negated lead key matches ntile over DESC") {
    import spark.implicits._
    val df = (1 to 37).map(i => (i.toLong, (i * 13 % 11).toLong)).toDF("id", "v")
    val want = df.withColumn("t",
        ntile(4).over(Window.orderBy(col("v").desc, col("id"))))
      .select(col("id"), col("t")).as[(Long, Int)].collect().sortBy(_._1).toSeq
    val got = GlobalOrder.withNtile(df.withColumn("_n", col("v") * -1),
        Seq(col("_n"), col("id")), 4, "t", numParts = 3)
      .select(col("id"), col("t")).as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("round-10 verdict sweep: no data-sized single-task window remains") {
    val qs: Seq[(String, Map[String, graft.queries.Tables.Q])] = Seq(
      "rfm_segmentation" -> graft.queries.QueriesAnalytics.queries,
      "abc_classification" -> graft.queries.QueriesAnalytics.queries,
      "lift_deciles" -> graft.queries.QueriesMlops.queries,
      "ccnet_bucket" -> graft.queries.QueriesText.queries,
      "vocab_coverage" -> graft.queries.QueriesText.queries,
      "quantile_normalize" -> graft.queries.QueriesPipeline.queries)
    for ((q, m) <- qs) {
      val exec = m(q)(spark, dir).queryExecution.executedPlan
      val plan = exec.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
      }.getOrElse(exec)
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      // a window with no partition spec is only acceptable when its input
      // is aggregate-bounded (bucket-count / config-sized rows, not data)
      // — the PipelineOpsSpec precedent
      def aggBounded(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case leaf if leaf.children.isEmpty => false
        case n => n.children.forall(aggBounded)
      }
      assert(windows.forall(w => w.partitionSpec.nonEmpty || aggBounded(w.child)),
        s"$q has a data-sized global (single-partition) window")
    }
  }

  test("minhash_curve: all three (b,r) operating points always appear") {
    val rows = graft.queries.QueriesDedup.queries("minhash_curve")(spark, dir)
      .select(col("b"), col("r")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((16L, 2L), (8L, 4L), (4L, 8L)),
      s"operating points missing or extra: $rows")
  }

  test("dedup_bcubed: planted id offsets are collision-free on the active data") {
    // the truth-recovery joins assume base, base+100000, base+200000 are
    // pairwise disjoint AND planted ids never collide with real ids — a
    // testdata-generator property previously asserted only in a comment
    // (round-10 ADVICE): a generator change must fail loudly here
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ids = graft.queries.Tables.t(spark, d, "documents").select(col("doc_id"))
      val base = ids.where(col("doc_id") % 25 === 0)
      def shifted(off: Long): DataFrame =
        base.select((col("doc_id") + off).as("doc_id"))
      assert(shifted(100000L).join(ids, "doc_id").count() == 0,
        s"$d: base+100000 collides with a real doc_id")
      assert(shifted(200000L).join(ids, "doc_id").count() == 0,
        s"$d: base+200000 collides with a real doc_id")
      assert(shifted(100000L).join(shifted(200000L), "doc_id").count() == 0,
        s"$d: base+100000 and base+200000 overlap")
    }
  }
}
