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

  test("bpe_apply: per-language fertility matches a from-scratch driver encode") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // same tokenization as TextFns.tokens (Round7Spec's bpe_train precedent)
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    // independent trainer: global word counts → 4 argmax merges
    val wc = texts.flatMap(t => toks(t._2)).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    var seqs = wc.map { case (w, c) => (s" ${w.mkString(" ")} ", c) }.toSeq
    val merges = (1 to 4).map { _ =>
      val counts = seqs.flatMap { case (s0, c) =>
        val tk = s0.trim.split(" ")
        tk.zip(tk.tail).map(p => (p, c))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      val ((l, r), _) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      seqs = seqs.map { case (s0, c) => (s0.replace(s" $l $r ", s" $l$r "), c) }
      (l, r)
    }
    def encode(w: String): Int = {
      var s0 = s" ${w.mkString(" ")} "
      merges.foreach { case (l, r) => s0 = s0.replace(s" $l $r ", s" $l$r ") }
      s0.trim.split(" ").length
    }
    val byLang = texts.flatMap { case (lang, t) => toks(t).map(lang -> _) }
      .groupBy(identity).map { case ((lang, w), xs) => (lang, w, xs.length.toLong) }
      .groupBy(_._1).map { case (lang, ws) =>
        val nw = ws.map(_._3).sum
        val nt = ws.map(x => x._3 * encode(x._2)).sum
        val nc = ws.map(x => x._3 * x._2.length).sum
        lang -> (nw, nt, nc)
      }
    val got = graft.queries.QueriesPipeline.queries("bpe_apply")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == byLang.keySet)
    got.foreach { case (lang, (nw, nt, nc, tpw, cpt)) =>
      val (enw, ent, enc0) = byLang(lang)
      assert((nw, nt, nc) == (enw, ent, enc0), s"$lang totals differ")
      assert(tpw == BigDecimal(ent.toDouble / enw)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$lang tpw")
      assert(cpt == BigDecimal(enc0.toDouble / ent)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$lang cpt")
    }
  }
}
