package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._

/** Count–Min sketch properties: the deterministic never-underestimate
  * invariant on EVERY item (the declared query pins only the top-20), the
  * probabilistic over-estimation bound, mergeability, and unseen-item
  * behavior. */
class CountMinSpec extends SparkSpec {

  private lazy val toks = graft.queries.Tables
    .t(spark, "/root/testdata/sf0.001", "documents")
    .select(explode(graft.functions.TextFns.tokens(col("text"))).as("token"))

  test("estimate >= exact for every distinct token; error within ~e*N/width") {
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val sk = CountMin.sketch(toks, "token")
    val est = CountMin.estimate(sk, exact.select(col("token")), "token")
    val joined = est.join(exact, "token")
      .select(col("token"), col("est"), col("n")).collect()
    val total = joined.map(_.getLong(2)).sum
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      s"underestimate for ${r.getString(0)}: est=${r.getLong(1)} n=${r.getLong(2)}"))
    // CM guarantee: P[excess > e*N/width] <= e^-depth per item. With
    // depth 4 that is ~1.8% per item; allow a loose 4x headroom and a
    // small failure budget so the spec is not flaky-by-design.
    val bound = 4.0 * math.E * total / 2048.0
    val over = joined.count(r => (r.getLong(1) - r.getLong(2)).toDouble > bound)
    assert(over <= math.max(1, joined.length / 20),
      s"$over of ${joined.length} tokens exceed slack bound $bound")
  }

  test("sketches merge by union + re-aggregation (shard-local property)") {
    val tagged = toks.withColumn("_i", monotonically_increasing_id())
    val a = tagged.where(col("_i") % 2 === 0).select(col("token"))
    val b = tagged.where(col("_i") % 2 =!= 0).select(col("token"))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = cells(
      CountMin.sketch(a, "token").unionByName(CountMin.sketch(b, "token"))
        .groupBy(col("r"), col("cell")).agg(sum(col("cnt")).as("cnt")))
    val whole = cells(CountMin.sketch(a.unionByName(b), "token"))
    assert(merged == whole, "merged shard sketches must equal the whole-corpus sketch")
  }

  test("unseen items estimate near zero") {
    import spark.implicits._
    val sk = CountMin.sketch(toks, "token")
    val ghosts = Seq("zzqx1", "zzqx2", "zzqx3").toDF("token")
    val est = CountMin.estimate(sk, ghosts, "token").collect()
    // an unseen item only scores if it collides in EVERY row; with 4 rows
    // of 2048 cells over a ~hundreds-token vocabulary that is vanishing,
    // but never negative and bounded by the smallest colliding cell
    est.foreach(r => assert(r.getLong(1) >= 0L))
  }
}
