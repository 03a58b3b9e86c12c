package graft

/** Round-5 operator batch: vocabulary growth, batch padding planner,
  * bootstrap CIs, record linkage, survival curve, walk-forward CV. Each
  * test drives the declared query on sf0.001 and checks the invariants the
  * hash compare can't express. */
class Round5OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("vocab_growth: cumulative curve is monotone and lands on the corpus totals") {
    val rows = q("vocab_growth").collect()
    assert(rows.length == 10)
    val cumV = rows.map(_.getLong(2))
    val cumT = rows.map(_.getLong(3))
    assert(cumV.zip(cumV.tail).forall { case (a, b) => a <= b }, "vocab must not shrink")
    assert(cumT.zip(cumT.tail).forall { case (a, b) => a < b }, "token mass strictly grows")
    // the final checkpoint must equal the direct corpus totals
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val toks = docs.select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
    assert(cumT.last == toks.count())
    assert(cumV.last == toks.distinct().count())
    // new_vocab partitions the vocabulary across deciles
    assert(rows.map(_.getLong(1)).sum == cumV.last)
  }

  test("batch_buckets: finer bucketing never pads more than one global bucket") {
    val rows = q("batch_buckets").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val total = rows.map(_.getLong(2)).distinct
    assert(total.length == 1, "total token mass must not depend on bucketing")
    val wasteByB = rows.map(r => r.getLong(0) -> r.getLong(4)).toMap
    // B=1 pads every doc to the global max — the worst case by construction
    assert(wasteByB(1L) >= wasteByB(2L) && wasteByB(1L) >= wasteByB(4L) &&
      wasteByB(1L) >= wasteByB(8L))
    rows.foreach(r => assert(r.getLong(3) == r.getLong(2) + r.getLong(4),
      "padded = total + waste accounting identity"))
  }

  test("er_linkage: planted variants resolve as matches with top score") {
    val rows = q("er_linkage").collect()
    val matches = rows.filter(_.getString(3) == "match")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(matches.nonEmpty)
    // planted (k, k+500000) pairs: 1-edit name, +0.37 acctbal, same
    // segment → full agreement score 55 (unless the +0.37 crossed a
    // blocking band — those pairs are legitimately never compared)
    val planted = matches.filter { case (a, b, _) => b == a + 500000L }
    assert(planted.nonEmpty && planted.forall(_._3 == 55L))
    val nCust = graft.queries.Tables.t(spark, sf, "customer").count()
    assert(planted.length >= (nCust * 9) / 10,
      s"blocking lost too many planted pairs: ${planted.length} of $nCust")
    rows.foreach { r =>
      val (s, d) = (r.getLong(2), r.getString(3))
      assert(if (d == "match") s >= 45L else s >= 15L && s < 45L)
    }
  }

  test("survival_km: S(t) non-increasing in (0,1], at-risk counts shrink") {
    val rows = q("survival_km").collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getDouble(3))
    assert(surv.forall(sv => sv > 0.0 && sv <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b }, "survival must not rise")
    val risk = rows.map(_.getLong(1))
    assert(risk.zip(risk.tail).forall { case (a, b) => a >= b }, "at-risk must not grow")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1), "deaths bounded by at-risk"))
  }

  test("walkforward_split: expanding train windows, test strictly after train") {
    val rows = q("walkforward_split").collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getDate(4), r.getDate(5)))).toMap
    assert(rows.size == 8, "4 folds x train/test")
    (1L to 4L).foreach { k =>
      val (nTr, _, trEnd) = rows((k, "train"))
      val (nTe, teStart, _) = rows((k, "test"))
      assert(nTr > 0 && nTe > 0)
      assert(trEnd.before(teStart), s"fold $k: test must start after train ends")
      if (k > 1L) assert(nTr >= rows((k - 1, "train"))._1, "train window expands")
    }
  }

  test("bootstrap_ci: interval is ordered and brackets the point estimate") {
    val rows = q("bootstrap_ci").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(lo <= hi, s"${r.getString(0)}: ci_lo > ci_hi")
      // 2nd..31st of 32 Poisson-resample means brackets the mean in any
      // non-degenerate corpus
      assert(p >= lo - math.abs(p) * 0.5 && p <= hi + math.abs(p) * 0.5)
    }
  }
}
