package graft

import org.apache.spark.sql.functions._

/** Round-8 additions, batch 2: sim_ivfpq (IVF-pruned ADC search) and
  * rrf_fusion (hybrid sparse+dense retrieval) — each checked against a
  * from-scratch driver recompute that reimplements assignment, ADC, ranking
  * and fusion with plain Scala loops (the trained models themselves are
  * pinned by IvfSpec / PqSpec; these specs pin the COMPOSITION).
  */
class Round8bSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // left-assoc ascending-i squared L2 — the NearestCells / adcTable loop order
  private def l2(v: Array[Double], c: Array[Double], off: Int = 0): Double = {
    var d = 0.0; var i = 0
    while (i < c.length) { val t = v(off + i) - c(i); d += t * t; i += 1 }
    d
  }

  // strict-< argmin (ties to the lower index) — NearestCells' selection
  private def argmin(ds: Array[Double]): Int = {
    var best = 0; var bd = ds(0); var i = 1
    while (i < ds.length) { if (ds(i) < bd) { bd = ds(i); best = i }; i += 1 }
    best
  }

  test("sim_ivfpq: matches a driver recompute of probe-pruned ADC search") {
    import graft.operators.{Ivf, Pq}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("embedding").isNotNull).select(col("vec_id"), col("embedding"))
    val cents = Ivf.collectCentroids(
      Ivf.trainSampled(e, "vec_id", "embedding", k = 8))
    val books = Pq.train(e, "vec_id", "embedding", m = 8, k = 16)
    val sub = books.map(_.head.length).sum / books.length
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    // independent encode: cell + m codes per vector
    val enc = vecs.map { case (id, v) =>
      val cell = argmin(cents.map(c => l2(v, c)))
      val codes = books.zipWithIndex.map { case (book, j) =>
        argmin(book.map(c => l2(v, c, off = j * sub)))
      }
      (id, cell, codes)
    }
    val expected = vecs.filter(_._1 < 5).flatMap { case (qid, qv) =>
      val cellD = cents.map(c => l2(qv, c))
      val probes = cellD.zipWithIndex.sortBy { case (d, c) => (d, c) }
        .take(3).map(_._2).toSet
      val adc = books.zipWithIndex.map { case (book, j) =>
        book.map(c => l2(qv, c, off = j * sub))
      }
      enc.filter(x => probes.contains(x._2)).map { case (id, _, codes) =>
        var dd = 0.0
        var j = 0
        while (j < codes.length) { dd += adc(j)(codes(j)); j += 1 }
        (qid, id, dd)
      }.sortBy { case (_, id, dd) => (dd, id) }.take(10).zipWithIndex
        .map { case ((q, id, dd), i) =>
          (q, id, math.rint(dd * 1e6) / 1e6, (i + 1).toLong) }
    }.toSeq
    val got = graft.queries.QueriesSim.queries("sim_ivfpq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got.map(x => (x._1, x._2, x._4)) ==
      expected.map(x => (x._1, x._2, x._4)), "candidate/ranking mismatch")
    got.zip(expected).foreach { case (g, ex) =>
      assert(math.abs(g._3 - ex._3) < 1e-9, s"ADC distance differs at $g vs $ex")
    }
    // the pruning is real: some vector outside the probed cells must exist
    // (otherwise the test exercises nothing beyond sim_pq)
    val probed = vecs.filter(_._1 < 5).map { case (_, qv) =>
      cents.map(c => l2(qv, c)).zipWithIndex
        .sortBy { case (d, c) => (d, c) }.take(3).map(_._2).toSet }
    assert(enc.exists(x => probed.exists(p => !p.contains(x._2))),
      "every vector fell in every query's probe set — pruning untested")
  }

  test("rrf_fusion: matches a from-scratch driver fusion of both rankers") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val queries = Seq((1L, "slow", "dup"), (2L, "merge", "join"),
      (3L, "scan", "vector"))
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = queries.flatMap { case (qid, t1, t2) =>
      val sparse = docs.map { case (id, t) =>
        id -> toks(t).count(w => w == t1 || w == t2).toLong }
        .filter(_._2 > 0)
        .sortBy { case (id, tf) => (-tf, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
      val qv = vecs.find(_._1 == qid).get._2
      val dense = vecs.map { case (id, v) => id -> cos(qv, v) }
        .sortBy { case (id, c) => (-c, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
      (sparse.keySet ++ dense.keySet).toSeq.map { id =>
        val rrf = sparse.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          dense.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (qid, id, sparse.get(id).map(_.toLong), dense.get(id).map(_.toLong), rrf)
      }.sortBy { case (_, id, _, _, rrf) => (-rrf, id) }.take(10).zipWithIndex
        .map { case ((q, id, rs, rd, rrf), i) =>
          (q, id, rs, rd, BigDecimal(rrf).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, (i + 1).toLong) }
    }
    val got = graft.queries.QueriesText.queries("rrf_fusion")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(got == expected)
  }
}
