package graft

import graft.operators.GlobalOrder
import graft.queries.QueriesPipeline
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators (QueriesPipeline) + the GlobalOrder distributed
  * prefix-sum they are built on. Semantics are differential-tested against
  * the naive single-partition forms; plan shape is asserted where the scale
  * story depends on it (no global window, broadcast mixes).
  */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("GlobalOrder prefix sum matches the single-partition window on a seeded table") {
    // values with duplicates and zeros; keys shuffled relative to values
    val df = (1L to 500L).map(i => (i * 7919L % 501L, i % 13L)).toDF("k", "v")
    val got = GlobalOrder.withExclusivePrefixSum(
        df, Seq(col("k")), col("v"), "off", numParts = 7)
      .select(col("k"), col("v"), col("off"))
    val naive = df.withColumn("off",
      coalesce(sum(col("v")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("GlobalOrder row number is the 1..N permutation of the sort order") {
    val df = (1L to 300L).map(i => Tuple1(i * 104729L % 300L)).toDF("k")
    val got = GlobalOrder.withGlobalRowNumber(df, Seq(col("k")), "pos", numParts = 5)
      .orderBy(col("pos")).select(col("pos"), col("k")).as[(Long, Long)].collect()
    assert(got.map(_._1).toSeq == (1L to 300L))
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq) // pos order == key order
    // empty-partition robustness: more partitions than rows
    val tiny = Seq(5L, 1L, 3L).map(Tuple1(_)).toDF("k")
    val tgot = GlobalOrder.withGlobalRowNumber(tiny, Seq(col("k")), "pos", numParts = 8)
      .orderBy(col("pos")).select(col("k")).as[Long].collect().toSeq
    assert(tgot == Seq(1L, 3L, 5L))
  }

  test("static hex boundaries give the same row numbers as sampled boundaries") {
    val df = (1L to 400L).map(i => Tuple1(i)).toDF("id")
      .withColumn("k", md5(concat(lit("x:"), col("id").cast("string"))))
    val sampled = GlobalOrder.withGlobalRowNumber(df, Seq(col("k"), col("id")), "pos", 6)
      .select(col("id"), col("pos"))
    val static = GlobalOrder.withGlobalRowNumber(df, Seq(col("k"), col("id")), "pos", 6,
        boundaries = Some(GlobalOrder.hexBoundaries(6)))
      .select(col("id"), col("pos"))
    assert(static.exceptAll(sampled).isEmpty && sampled.exceptAll(static).isEmpty)
  }

  test("pack_sequences: offsets are contiguous and seq spans are consistent") {
    val rows = QueriesPipeline.queries("pack_sequences")(spark, sf)
      .orderBy(col("doc_id")).collect()
    var expect = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == expect, s"offset gap at doc ${r.getLong(0)}")
      expect += r.getLong(1)
      if (r.getLong(1) > 0) {
        assert(r.getLong(3) == r.getLong(2) / 512)
        assert(r.getLong(4) == (r.getLong(2) + r.getLong(1) - 1) / 512)
        assert(r.getLong(5) == r.getLong(4) - r.getLong(3) + 1 && r.getLong(5) >= 1)
      }
    }
  }

  test("no single-partition window in the GlobalOrder-backed plans") {
    for (q <- Seq("pack_sequences", "global_shuffle")) {
      // unwrap AQE: exchanges only exist after EnsureRequirements, and
      // executedPlan.collect() does not descend into the adaptive subtree
      val exec = QueriesPipeline.queries(q)(spark, sf).queryExecution.executedPlan
      val plan = exec.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(exec)
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      // a window with no partition spec is only acceptable when its input is
      // aggregate-bounded (every path to a leaf passes an aggregate — i.e.
      // bucket-count rows, not data): GlobalOrder's bases cumsum is one
      def aggBounded(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case leaf if leaf.children.isEmpty => false
        case n => n.children.forall(aggBounded)
      }
      assert(windows.nonEmpty &&
        windows.forall(w => w.partitionSpec.nonEmpty || aggBounded(w.child)),
        s"$q has a data-sized global (single-partition) window")
      // exactly ONE data-sized shuffle feeds each window: every other
      // exchange in its subtree must sit above a partial aggregate (tiny,
      // bucket-count-sized rows) — the round-2 audit caught a second
      // full-data exchange when the bucket came from spark_partition_id
      windows.filter(_.partitionSpec.nonEmpty).foreach { w =>
        val dataShuffles = w.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
              if !e.child.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec] => e
        }
        assert(dataShuffles.size == 1,
          s"$q window subtree has ${dataShuffles.size} data-sized shuffles (want 1)")
      }
    }
  }

  test("global_shuffle: positions are 1..N and deterministic across runs") {
    val a = QueriesPipeline.queries("global_shuffle")(spark, sf)
      .select(col("pos"), col("doc_id")).as[(Long, Long)].collect().sortBy(_._1)
    val b = QueriesPipeline.queries("global_shuffle")(spark, sf)
      .select(col("pos"), col("doc_id")).as[(Long, Long)].collect().sortBy(_._1)
    assert(a.map(_._1).toSeq == (1L to a.length))
    assert(a.toSeq == b.toSeq)
    // it actually permutes: doc_ids not in id order
    assert(a.map(_._2).toSeq != a.map(_._2).sorted.toSeq)
  }

  test("mix_weighted: rate-1.0 sources keep everything, rates monotone, broadcast join") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val perSource = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val kept = QueriesPipeline.queries("mix_weighted")(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    def srcIdx(s: String) = s.drop(3).toInt
    for ((s, n) <- perSource if srcIdx(s) % 4 == 0)
      assert(kept.getOrElse(s, 0L) == n, s"rate-1.0 source $s dropped rows")
    // aggregate keep-rate of the 0.1 bucket must be well below the 0.5 bucket
    def bucketRate(m: Int) = {
      val ks = perSource.keys.filter(srcIdx(_) % 4 == m)
      ks.map(kept.getOrElse(_, 0L)).sum.toDouble / ks.map(perSource).sum
    }
    assert(bucketRate(3) < bucketRate(1))
    val plan = QueriesPipeline.queries("mix_weighted")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("source_quota: ≤10 per source, rank dense from 1, group-limit pushed") {
    val rows = QueriesPipeline.queries("source_quota")(spark, sf)
      .select(col("source"), col("rk")).as[(String, Long)].collect()
    val bySrc = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(bySrc.values.forall(rks => rks == (1L to rks.length) && rks.length <= 10))
    val plan = QueriesPipeline.queries("source_quota")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "rank filter not pushed to WindowGroupLimit")
  }

  test("semantic_dedup: injected copies drop, originals keep, cluster-locality") {
    val rows = QueriesPipeline.queries("semantic_dedup")(spark, sf)
      .select(col("vec_id"), col("kept")).as[(Long, Long)].collect().toMap
    val (orig, copies) = rows.partition(_._1 < 100000L)
    assert(copies.nonEmpty && copies.values.forall(_ == 0L), "an exact copy survived")
    assert(orig.values.forall(_ == 1L), "a natural vector was dropped (threshold too low)")
  }

  test("substring_dedup: injected copies fully duplicated, fraction bounds hold") {
    val rows = QueriesPipeline.queries("substring_dedup")(spark, sf)
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"), col("dup_frac"))
      .as[(Long, Long, Long, Double)].collect()
    val copies = rows.filter(_._1 >= 700000L)
    assert(copies.nonEmpty && copies.forall(_._4 == 1.0), "a copied doc is not fully duplicated")
    val originals = rows.filter(r => r._1 < 50L)
    assert(originals.forall(_._4 == 1.0), "an original of an injected copy is not fully duplicated")
    rows.foreach { case (_, nw, nd, f) =>
      assert(nw > 0 && nd >= 0 && nd <= nw && f >= 0.0 && f <= 1.0)
    }
  }

  test("corpus_stats: groups cover all sources, totals reconcile with token_count") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val stats = QueriesPipeline.queries("corpus_stats")(spark, sf)
    val nSources = docs.select(col("source")).distinct().count()
    assert(stats.count() == nSources)
    val totalFromStats = stats.agg(sum(col("total_tokens"))).as[Long].head()
    val totalDirect = docs.select(
      sum(graft.functions.TextFns.tokenCount(col("text")))).as[Long].head()
    assert(totalFromStats == totalDirect)
    // percentiles ordered, counts within group size
    stats.select(col("n_docs"), col("p50_tokens"), col("p95_tokens"), col("n_hi_quality"))
      .as[(Long, Double, Double, Long)].collect().foreach { case (n, p50, p95, hi) =>
        assert(p50 <= p95 && hi >= 0 && hi <= n)
      }
  }

  test("bpe_pairs: top pairs are 2-char, counts weighted and descending") {
    val rows = QueriesPipeline.queries("bpe_pairs")(spark, sf)
      .select(col("pair"), col("n")).as[(String, Long)].collect()
    assert(rows.length == 50)
    assert(rows.forall(_._1.length == 2))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.reverse.toSeq)
    // counts must be corpus-weighted (far exceed the distinct-word count)
    val nWords = graft.queries.Tables.t(spark, sf, "documents")
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .select(countDistinct(col("w"))).as[Long].head()
    assert(rows.head._2 > nWords / 2, s"top pair ${rows.head} not frequency-weighted")
  }

  test("rare_token_ratio: all-common and all-rare bounds hold") {
    val rows = QueriesPipeline.queries("rare_token_ratio")(spark, sf)
      .select(col("n_tokens"), col("n_rare"), col("rare_ratio"))
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nt, nr, ratio) =>
      assert(nr >= 0 && nr <= nt)
      assert(math.abs(ratio - math.round(nr.toDouble / nt * 1e6) / 1e6) < 1e-9)
    }
  }

  test("kfold_assign: folds partition docs and char mass, every fold populated") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val (nDocs, wChars) = docs.agg(count(lit(1)), sum(col("n_chars")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val rows = QueriesPipeline.queries("kfold_assign")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).sum == nDocs, "folds must partition the corpus")
    assert(rows.map(_._4).sum == wChars, "folds must partition the char mass")
    val perFold = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    assert(perFold.keySet == Set(0, 1, 2, 3, 4))
    assert(perFold.values.forall(_ > 0))
  }

  test("pack_fragmentation: incidences and sequence totals match pack_sequences") {
    val packed = QueriesPipeline.queries("pack_sequences")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(5))) // (n_tokens, n_seqs)
    val hist = QueriesPipeline.queries("pack_fragmentation")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Σ n_docs·n_seqs over the histogram = Σ per-doc spanned sequences
    assert(hist.map { case (d, s) => d * s }.sum == packed.map(_._2).sum)
    // Σ n_seqs over the histogram = total distinct sequences = ⌈tokens/512⌉
    val totalTokens = packed.map(_._1).sum
    assert(hist.map(_._2).sum == (totalTokens + 511) / 512)
    assert(hist.forall { case (d, s) => d >= 1 && s >= 1 })
  }

  test("dup_rate_report: distinct bound, rate consistent with counts") {
    val rows = QueriesPipeline.queries("dup_rate_report")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, d, rate) =>
      assert(d >= 1 && d <= n, s"$src: $d distinct of $n")
      val expect = math.floor((1.0 - d.toDouble / n) * 1e6 + 0.5) / 1e6
      assert(math.abs(rate - expect) < 1e-9, s"$src: $rate vs $expect")
    }
  }
}
