package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: link-prediction and bounded-BFS cards on the shared
  * sparsified nation graph — brute-force differentials over the collected
  * config-sized edge list. */
class Round7Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // The spec's own copy of the shared graph definition (mirrors
  // QueriesAnalytics.sparsifiedNationGraph / the oracle's und→sp CTEs),
  // built from first principles so a helper bug can't self-certify.
  private lazy val spEdges: Set[(Long, Long)] = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("src"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("dst"))
    val regions = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val directed = li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .where(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2) * (if (regions(r.getLong(0)) == regions(r.getLong(1))) 5L else 1L)))
    val und = (directed.map(e => ((e._1, e._2), e._3)) ++
        directed.map(e => ((e._2, e._1), e._3)))
      .groupBy(_._1).map { case (k, es) => (k._1, k._2, es.map(_._2).sum) }.toSeq
    val (ne, tw) = (und.size.toLong, und.map(_._3).sum)
    und.filter(e => e._3 * ne > tw).map(e => (e._1, e._2)).toSet
  }

  test("mv_join_maintain: incremental merge equals the full join view, and the persisted state is reused") {
    import graft.operators.DiskCache
    val q = graft.queries.QueriesScale.queries("mv_join_maintain")
    val first = q(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // ground truth: the view's own definition, full recompute
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val full = ord.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(first.sorted == full.sorted)
    // state snapshot exists under the fingerprint key and a second run
    // (serving from it, not rebuilding) is bit-identical
    val statePath = DiskCache.keyedPath("mvjoin_state_v1",
      s"$dir/orders.parquet", s"$dir/lineitem.parquet")
    assert(DiskCache.complete(statePath, Seq("_SUCCESS")), s"no state at $statePath")
    val mtime = new java.io.File(statePath).lastModified
    val second = q(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(second.sorted == first.sorted)
    assert(new java.io.File(statePath).lastModified == mtime, "state was rebuilt")
  }

  test("graph_link_predict: brute-force CN/Jaccard/RA over the independent edge set") {
    val nbrs = spEdges.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val lcm = 5354228880L
    val nodes = nbrs.keys.toSeq.sorted
    val expected = (for {
      u <- nodes; v <- nodes if u < v && !spEdges.contains((u, v))
      common = nbrs(u).intersect(nbrs(v)) if common.nonEmpty
    } yield {
      val raNum = common.toSeq.map(z => lcm / nbrs(z).size).sum
      val un = nbrs(u).size + nbrs(v).size - common.size
      (u, v) -> (common.size.toLong,
        math.floor(common.size.toDouble / un * 1e6 + 0.5) / 1e6,
        math.floor(raNum.toDouble / lcm.toDouble * 1e6 + 0.5) / 1e6)
    }).toMap
    val got = graft.queries.QueriesAnalytics.queries("graph_link_predict")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == expected, s"got ${got.size} pairs vs expected ${expected.size}")
    // and none of the predictions is an existing edge
    assert(got.keys.forall { case (u, v) => !spEdges.contains((u, v)) })
  }

  test("bpe_train: trainer loop matches a from-scratch driver BPE over the collected vocabulary") {
    val wordCounts = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(_.getAs[String]("text"))
      .flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    var seqs = wordCounts.toSeq.map { case (w, c) =>
      (" " + w.toCharArray.map(_.toString).mkString(" ") + " ", c)
    }
    val expected = (1 to 4).map { k =>
      val counts = seqs.flatMap { case (s0, c) =>
        val tk = s0.trim.split(" ")
        tk.zip(tk.tail).map(p => (p, c))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      seqs = seqs.map { case (s0, cnt) => (s0.replace(s" $l $r ", s" $l$r "), cnt) }
      (k, l, r, c)
    }
    val got = graft.queries.QueriesPipeline.queries("bpe_train")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("dsir_weights: selection card matches a from-scratch driver recompute") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def md5hex2(s0: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s0.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x".take(2)
    }
    val feats = rows.flatMap { case (id, lang, src, text) =>
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      tk.zip(tk.tail).map(bg => (id, lang, src, md5hex2(bg._1 + " " + bg._2)))
    }
    val rtot = feats.length.toLong
    val ttotV = feats.count(_._2 == "en").toLong
    // round-8 semantics: each bucket's log-weight rounds ONCE to a
    // micro-unit BIGINT; per-doc and per-source folds are exact integer
    // sums (order-independent), so the compare can be exact
    val lwm = feats.groupBy(_._4).map { case (f, xs) =>
      val rc = xs.length.toLong
      val tc = xs.count(_._2 == "en").toLong
      f -> math.floor((math.log((tc + 1.0) / (ttotV + 256.0))
        - math.log((rc + 1.0) / (rtot + 256.0))) * 1e6 + 0.5).toLong
    }
    val byDoc = feats.groupBy(f => (f._1, f._3)).map { case ((id, src), xs) =>
      (id, src, xs.groupBy(_._4).map { case (f, ys) => ys.length * lwm(f) }.sum)
    }
    val expected = byDoc.groupBy(_._2).map { case (src, xs) =>
      // Spark's round() is HALF_UP, not rint's HALF_EVEN
      src -> (xs.size.toLong, xs.count(_._3 > 0).toLong,
        BigDecimal(xs.map(_._3).sum.toDouble / xs.size / 1e6)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.queries.QueriesPipeline.queries("dsir_weights")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (src, (n, sel, mw)) =>
      val (en, esel, emw) = expected(src)
      assert(n == en && sel == esel, s"$src counts: got ($n,$sel) vs ($en,$esel)")
      assert(mw == emw, s"$src mean_w: $mw vs $emw")
    }
  }

  test("graph_shortest_paths: BFS matches Floyd–Warshall on the independent edge set, 5-hop horizon") {
    val nodes = spEdges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val inf = Int.MaxValue / 4
    val d = Array.fill(n, n)(inf)
    nodes.indices.foreach(i => d(i)(i) = 0)
    spEdges.foreach { case (a, b) => d(idx(a))(idx(b)) = 1 }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
    val expected = (for {
      i <- 0 until n; j <- 0 until n
      if nodes(i) < nodes(j) && d(i)(j) <= 5
    } yield (nodes(i), nodes(j)) -> d(i)(j).toLong).toMap
    val got = graft.queries.QueriesAnalytics.queries("graph_shortest_paths")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // adjacency law: every sparsified edge pair is at distance exactly 1
    spEdges.foreach { case (a, b) =>
      if (a < b) assert(got((a, b)) == 1L, s"edge ($a,$b) not hops=1")
    }
  }
}
