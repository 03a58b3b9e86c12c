package graft

import org.apache.spark.sql.functions._

/** Round-10 session-2 additions: densest-peel/calibration/zonemap/B-cubed/
  * bloom-curve/minhash-curve/NN-descent/scene-cut/EM-weights invariants.
  * (sim_hamming_rerank and graph_densest_users get full differential
  * recomputes in Round10Spec; these pin the cross-cutting invariants the
  * oracle compare alone can't express.) */
class Round10bSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("calibration_ece: summary row is the exact n-weighted fold of the bins") {
    val rows = graft.queries.QueriesTrain.queries("calibration_ece")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (bins, summary) = rows.partition(_._1 >= 0)
    assert(summary.length == 1)
    val s = summary.head
    assert(s._2 == bins.map(_._2).sum, "summary n_docs != sum of bin n_docs")
    // ECE = sum(n_b * gap_b) DIV N, recomputed from the emitted bins
    assert(s._5 == bins.map(b => b._2 * (b._4 - b._3).abs).sum / s._2)
    // every bin's confidence lies inside its bin's micro-unit band
    bins.foreach { b =>
      val lo = b._1 * 100000
      val hi = if (b._1 == 9) 1000000L else (b._1 + 1) * 100000
      assert(b._3 >= lo && b._3 <= hi, s"bin ${b._1} conf ${b._3} outside band")
    }
  }

  test("zonemap_selectivity: blocks partition rows and the matched layout skips") {
    val rows = graft.queries.QueriesScale.queries("zonemap_selectivity")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.length == 4)
    val total = graft.queries.Tables.t(spark, dir, "lineitem")
      .where(col("l_shipdate").isNotNull).count()
    rows.foreach { r =>
      assert(r._4 <= r._3, "scanned blocks exceed total blocks")
      assert(r._5 <= total && r._6 <= r._5,
        "rows_matching must lie inside rows_scanned inside the corpus")
    }
    // the matched layout prunes; the mismatched one reads everything
    def skip(layout: String, pred: String) =
      rows.find(r => r._1 == layout && r._2 == pred).get._7
    assert(skip("orderkey_range", "orderkey_band") > 0)
    assert(skip("date_range", "date_band") > 0)
    assert(skip("orderkey_range", "date_band") == 0)
    assert(skip("date_range", "orderkey_band") == 0)
  }

  test("dedup_bcubed: P/R/F1 bounded by 1e6 and truth clusters tile the corpus") {
    val r = graft.queries.QueriesDedup.queries("dedup_bcubed")(spark, dir).head()
    val (n, np, nt, p6, r6, f1) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))
    assert(n == 3 * nt, "planted corpus is exactly 3 copies per truth cluster")
    assert(p6 <= 1000000 && r6 <= 1000000 && f1 <= 1000000)
    assert(f1 <= p6.max(r6) && f1 >= p6.min(r6) - 1, "F1 lies between P and R")
    assert(np >= 1 && np <= n)
  }

  test("bloom_fpr_curve: FPR strictly improves with bits per key; bit math is consistent") {
    val rows = graft.queries.QueriesScale.queries("bloom_fpr_curve")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(4L, 8L, 12L))
    rows.foreach { r =>
      assert(r._4 == r._1 * r._3, "m = bpk * n_keys")
      assert(r._5 <= r._2 * r._3 && r._5 <= r._4, "bits set bounded by k*n and m")
      assert(r._7 <= r._6, "false positives bounded by probes")
    }
    assert(rows(0)._8 > rows(1)._8 && rows(1)._8 > rows(2)._8,
      "measured FPR must fall as bits per key grow")
  }

  test("minhash_curve: recall falls (weakly) and precision rises as rows/band grow") {
    val rows = graft.queries.QueriesDedup.queries("minhash_curve")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(-_._1) // b desc = r asc
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq((16L, 2L), (8L, 4L), (4L, 8L)))
    rows.foreach { r =>
      assert(r._4 <= r._3, "true candidates bounded by candidates")
      assert(r._4 <= r._5, "true candidates bounded by truth")
    }
    assert(rows.map(_._6).sliding(2).forall(p => p.head >= p.last),
      "recall6 must be non-increasing in rows-per-band")
    assert(rows.map(_._3).sliding(2).forall(p => p.head >= p.last),
      "candidate volume must be non-increasing in rows-per-band")
  }

  test("nndescent_round: one round never hurts recall and edge lists stay <= 5 per node") {
    val rows = graft.queries.QueriesSim.queries("nndescent_round")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val init = rows.find(_._1 == "lsh_init").get
    val r1 = rows.find(_._1 == "nn_descent_r1").get
    assert(r1._6 >= init._6, "descent round must not lose recall")
    assert(r1._3 >= init._3, "descent round must not lower mean neighbor cosine")
    val n = graft.queries.Tables.t(spark, dir, "embeddings")
      .where(col("embedding").isNotNull).count()
    assert(init._2 <= 5 * n && r1._2 <= 5 * n)
    assert(init._5 == r1._5, "both stages share one ground truth")
  }

  test("multimodal_scenecut: every video has exactly the planted cut at frame 3") {
    val rows = graft.queries.QueriesDdl.queries("multimodal_scenecut")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._2 == 5, "6 frames -> 5 transitions")
      assert(r._3 == 1 && r._4 == 3, s"doc ${r._1}: cut not detected exactly at frame 3")
      assert(r._5 >= 16, "cut hamming must clear the threshold")
    }
  }

  test("quantile_normalize: equal-size sources land on the identical pooled distribution") {
    val rows = graft.queries.QueriesPipeline.queries("quantile_normalize")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val total = graft.queries.Tables.t(spark, dir, "documents").count()
    assert(rows.map(_._2).sum == total, "sources partition the corpus")
    // synthetic sources are equal-sized -> identical rank maps -> identical
    // after-stats for every source; before-means must actually differ
    assert(rows.map(_._2).distinct.length == 1, "test assumes equal source sizes")
    assert(rows.map(r => (r._4, r._5, r._6)).distinct.length == 1,
      "after-normalization stats must be identical across equal-size sources")
    assert(rows.map(_._3).distinct.length > 1,
      "before-means should differ or the card demonstrates nothing")
  }

  test("dp_topk: five ranked tokens, released counts within the Laplace noise bound") {
    import org.apache.spark.sql.functions.{explode, lit, count => cnt}
    val rows = graft.queries.QueriesAnalytics.queries("dp_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq == (1L to 5L))
    assert(rows.map(_._2).distinct.length == 5)
    val exact = graft.queries.Tables.t(spark, dir, "documents")
      .select(explode(graft.functions.TextFns.tokens(org.apache.spark.sql.functions.col("text"))).as("token"))
      .groupBy("token").agg(cnt(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (_, token, released, _) =>
      // |Laplace_{b=1}| from a 24-bit uniform is at most ln(2^24) < 17
      assert(math.abs(released - exact(token)) <= 17,
        s"$token: released $released too far from exact ${exact(token)}")
    }
  }

  test("rake_keywords: phrases contain no stopwords and scores fold from word stats") {
    val stops = Set("the", "and", "of", "to", "in", "is", "a", "for",
      "on", "with", "as", "by", "at", "it")
    val rows = graft.queries.QueriesText.queries("rake_keywords")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    rows.foreach { r =>
      val words = r._2.split(" ")
      assert(words.forall(w => !stops.contains(w)), s"stopword inside phrase: ${r._2}")
      assert(words.length == r._3, "n_words must equal the phrase token count")
      assert(r._4 >= 1 && r._5 > 0)
    }
    // scores non-increasing down the ranking
    assert(rows.map(_._5).sliding(2).forall(p => p.head >= p.last))
  }

  test("bm25_prf: 5 results per query, expansion never breaks score ordering") {
    val rows = graft.queries.QueriesText.queries("bm25_prf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { qs =>
      assert(qs.map(_._4).sorted.toSeq == (1L to qs.length), "ranks 1..k per query")
      val ordered = qs.sortBy(_._4)
      assert(ordered.map(_._3).sliding(2).forall(p => p.head >= p.last),
        "weighted scores must be non-increasing in rank")
      assert(qs.map(_._2).distinct.length == qs.length, "distinct docs per query")
    }
  }

  test("graph_ppr_users: full differential recompute at sf0.001") {
    val got = graft.queries.QueriesAnalytics.queries("graph_ppr_users")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val ev = graft.queries.Tables.t(spark, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val w = ev.groupBy(e => (e._2, Math.floorDiv(e._4, 3600000000L))).toSeq
      .flatMap { case (_, es) =>
        val o = es.sortBy(e => (e._4, e._3))
        o.zip(o.tail).map { case (a, b) => (a._1, b._1) }.filter(p => p._1 != p._2)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wout = w.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val p6 = w.map { case ((s0, d0), ww) => (s0, d0) -> ww * 1000000L / wout(s0) }
    val nodes = ev.map(_._1).toSet
    val seeds = nodes.filter(_ % 25 == 0)
    val baseS = 1000000000000L / seeds.size
    val hasOut = wout.keySet
    var r = nodes.map(id => id -> (if (seeds(id)) baseS else 0L)).toMap
    for (_ <- 1 to 5) {
      val d12 = nodes.toSeq.filterNot(hasOut).map(r).sum
      val in = p6.toSeq.groupBy(_._1._2).view
        .mapValues(_.map { case ((s0, _), p) => r(s0) * p / 1000000L }.sum).toMap
      r = nodes.map { id =>
        val tele = if (seeds(id)) 15L * baseS / 100L else 0L
        val dang = if (seeds(id)) d12 / seeds.size else 0L
        id -> (tele + 85L * (in.getOrElse(id, 0L) + dang) / 100L)
      }.toMap
    }
    val expected = r.toSeq.sortBy(p => (-p._2, p._1)).take(100).zipWithIndex
      .map { case ((id, sc), i) => (id, sc, i + 1L) }
    assert(got == expected, s"got.head=${got.head} expected.head=${expected.head}")
    // provable invariants (a seed-dominance heuristic is NOT one: in a
    // dense graph high-in-degree non-seeds legitimately outrank seeds):
    // total mass stays ~1e12 (minus DIV truncation), and the seed set
    // keeps at least its 15% teleport share of it
    val total = r.values.sum
    assert(total > 900000000000L && total <= 1000000000000L)
    assert(seeds.toSeq.map(r).sum * 100L >= total * 14L)
  }

  test("sim_beam_search: one row per query, walk never ends worse than the entry node") {
    val rows = graft.queries.QueriesSim.queries("sim_beam_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    rows.foreach { r =>
      // sampled-truth rank (round 11): 1 <= rank <= n_sample+1, decile flag
      // consistent with the rank, bounded sample actually bounded
      assert(r._4 >= 1 && r._4 <= r._5 + 1 && r._5 <= 2048)
      assert(r._6 == (r._4 * 10 <= r._5))
      assert(r._2 != r._1, "walk must not return the query itself")
    }
    // the beam keeps its best member, so the result dominates the entry
    val vecs = graft.queries.Tables.t(spark, dir, "embeddings")
      .where(col("embedding").isNotNull).select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.foreach { r =>
      assert(r._3 >= cos(vecs(r._1), vecs(0L)) - 5.001e-7,
        s"query ${r._1}: walk ended below the entry node") }
  }

  test("multimodal_audio_wht: decode-path coefficients equal the direct formula fold") {
    import graft.multimodal.Multimodal
    import spark.implicits._
    val ids = Seq(3L, 4L) // stereo + mono
    val got = Multimodal.wavHadamard(spark,
        Multimodal.renderWav(spark, ids.toDF("doc_id")), nCoef = 8, window = 256)
      .collect().map(h => (h.doc_id, h.channel, h.seq_j) -> h.coef).toMap
    ids.foreach { id =>
      (0 until Multimodal.wavChannels(id)).foreach { c =>
        (0 until 8).foreach { j =>
          val expect = (0 until 256).map { i =>
            val s = Multimodal.wavSample(id, c, i).toLong
            if (java.lang.Integer.bitCount(j & i) % 2 == 0) s else -s
          }.sum
          assert(got((id, c.toLong, j.toLong)) == expect, s"id=$id c=$c j=$j")
        }
        // sequency 0 is the plain DC sum over the window
        assert(got((id, c.toLong, 0L)) ==
          (0 until 256).map(i => Multimodal.wavSample(id, c, i).toLong).sum)
      }
    }
  }

  test("er_em_weights: EM separates m from u on every field and the prior is sane") {
    val byField = graft.queries.QueriesAnalytics.queries("er_em_weights")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byField.size == 4)
    Seq("name_lev1", "bal_lt1", "segment_eq").foreach { f =>
      val (m6, u6, ratio) = byField(f)
      assert(m6 > u6, s"$f: m must exceed u after EM")
      assert(ratio == m6 * 1000000L / math.max(u6, 1L))
      assert(m6 >= 1 && m6 <= 999999 && u6 >= 1 && u6 <= 999999, "clamp bounds")
    }
    val prior = byField("prior")._1
    assert(prior >= 1 && prior <= 999999)
  }
}
