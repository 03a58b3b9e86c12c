package graft

import org.apache.spark.sql.functions._

/** Round-6 additions: cross-modal dedup card partition law, ssjoin_prefix
  * class-collapse equivalence edge cases. */
class Round6Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("crossmodal_dedup: quartet pairs partition into the four classes, one per base") {
    val rows = graft.queries.QueriesDdl.queries("crossmodal_dedup")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet == Set("agree_dup", "image_only_caption_farm",
      "neither", "text_only_template_reuse"))
    val counts = rows.values.map(_._1).toSet
    assert(counts.size == 1, s"each base contributes one pair per class: $rows")
    // partition law: image-dup classes carry ZERO hamming mass (the +200000
    // and +300000 variants render the SAME image); text-dup classes carry
    // jaccard exactly 1 (identical text); the divergent sides are far from
    // their thresholds (caption stub shares no vocabulary; unrelated image
    // pattern is far beyond hamming 3)
    assert(rows("agree_dup")._2 == 0L)
    assert(rows("image_only_caption_farm")._2 == 0L)
    assert(rows("agree_dup")._3 == 1.0 && rows("agree_dup")._4 == 1.0)
    assert(rows("text_only_template_reuse")._3 == 1.0)
    assert(rows("image_only_caption_farm")._4 == 0.0)
    assert(rows("neither")._4 == 0.0)
    // unrelated images really are far apart: mean hamming per pair ≥ 16
    assert(rows("neither")._2 >= 16L * rows("neither")._1)
    assert(rows("text_only_template_reuse")._2 == rows("neither")._2,
      "same unrelated-image pairs feed both image-divergent classes")
  }

  test("dedup_sweep: class-collapsed counts equal brute-force all-pairs exactly") {
    import graft.functions.TextFns
    import graft.operators.Dedup
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 25 === 0).select(col("doc_id"), col("text"))
    val corpus = base
      .unionByName(base.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .unionByName(base.select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" xtra xtra")).as("text")))
    val sh = Dedup.shingleSets(corpus, "doc_id", "text", 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val ids = sh.keys.toSeq.sorted
    val brute = for {
      i <- ids.indices; k <- (i + 1) until ids.length
      a = sh(ids(i)); b = sh(ids(k))
      j = a.intersect(b).size.toDouble / a.union(b).size
    } yield (ids(i), ids(k), j)
    val expected = Seq(0.5, 0.6, 0.7, 0.8, 0.9).map { t =>
      val ps = brute.filter(_._3 >= t)
      (t, ps.length.toLong,
        ps.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
    }
    val got = graft.queries.QueriesDedup.queries("dedup_sweep")(spark, dir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("dedup_clusters_incremental: contraction equals full CC recompute over corpus ∪ batch") {
    import graft.operators.{ConnectedComponents, Dedup}
    import graft.functions.TextFns
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.where(col("doc_id") % 25 === 0).select(col("doc_id"), col("text"))
    val corpus = base
      .unionByName(base.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .unionByName(base.select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" xtra xtra")).as("text")))
    val bpick = docs.where(col("doc_id") % 100 === 0).select(col("doc_id"), col("text"))
    val batch = bpick.select((col("doc_id") + 400000L).as("doc_id"),
        concat(col("text"), lit(" xtra")).as("text"))
      .unionByName(bpick.where(col("doc_id") % 200 === 0)
        .select((col("doc_id") + 600000L).as("doc_id"),
          concat(col("text"), lit(" xtra")).as("text")))
      .unionByName(bpick.select((col("doc_id") + 800000L).as("doc_id"),
        concat_ws(" ", reverse(TextFns.tokens(col("text")))).as("text")))
    val all = corpus.unionByName(batch)
    val fullEdges = Dedup.minhashNearDups(all, "doc_id", "text", threshold = 0.8)
      .select(col("id_a"), col("id_b"))
    val full = ConnectedComponents.components(fullEdges, all.select(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = graft.queries.QueriesDedup.queries("dedup_clusters_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same label per doc AND same size per cluster as the from-scratch run
    val sizes = full.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(inc.length == full.size)
    inc.foreach { case (d, c, sz) =>
      assert(full(d) == c, s"doc $d: incremental label $c vs full ${full(d)}")
      assert(sizes(c) == sz, s"cluster $c size")
    }
    // the planted merge actually happened: a batch near-copy shares its
    // cluster with the base trio
    val someBase = inc.find(_._1 < 100000).map(_._1).get
    assert(inc.exists { case (d, c, _) => d >= 400000 && c <= 200000 + someBase },
      "no batch doc merged into an existing cluster")
  }

  test("ssjoin_prefix: class-collapse output invariants (no self-matches, no phantom rows)") {
    // class collapse must not invent matches — guards the m−1 within-class
    // arithmetic at m=1 and the partner orientation
    import spark.implicits._
    val out = graft.queries.QueriesDedup.queries("ssjoin_prefix")(spark, dir)
    // sf0.001 corpus DOES have planted dups, so check the invariants
    // directly: every emitted row has n_matches ≥ 1 and a partner ≠ self
    val bad = out.where(col("n_matches") < 1 ||
      col("best_partner") === col("doc_id")).count()
    assert(bad == 0)
    // and within-class best_jaccard is exactly 1.0 for planted exact copies
    val exact = out.where(col("doc_id") < 100000 && col("best_jaccard") === 1.0).count()
    assert(exact > 0, "planted exact copies must surface J=1 best partners")
  }
}
