package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Distributed EXACT top-k frequent items (heavy hitters) via a two-phase
  * Misra-Gries candidate pass — the pattern that keeps corpus-wide "most
  * frequent token" queries tractable at 100 TB.
  *
  * Why not a plain `groupBy(token).count().orderBy.limit(k)`? Partial
  * (map-side) aggregation already bounds the shuffle to the per-partition
  * DISTINCT vocabulary — but that is exactly the problem at scale: a web
  * corpus has billions of distinct tokens (typos, ids, urls), so the hash
  * aggregate spills and the shuffle carries the whole long tail just to
  * discard it. Misra-Gries caps the per-partition summary at `capacity`
  * entries NO MATTER the vocabulary size, so phase 2's shuffle carries only
  * occurrences of ~capacity×partitions candidate tokens.
  *
  * Exactness: a merged MG summary retains every item whose global count
  * exceeds N/capacity (each MG decrement consumes `capacity` occurrences, so
  * fewer than N/capacity decrements happen in total across any one item's
  * counters). After phase 2 re-counts the candidates exactly, the k-th
  * candidate count is compared against N/capacity: if it clears the bound,
  * every true top-k item is provably among the candidates and the result is
  * exact. If not (flat distribution / capacity too small), we fall back to
  * the full exact aggregation — never a silently-approximate answer.
  *
  * The reference has no aggregation at all (SURVEY.md §2.8); this is part of
  * the LLM-pipeline extension surface (corpus token statistics).
  */
object HeavyHitters {

  /** Misra-Gries summary of one stream of items: at most `capacity` counters;
    * retained counts are lower bounds undercounting by at most n/capacity.
    * O(1) amortized per item (each decrement sweep removes ≥capacity weight).
    */
  def mgSummarize(items: Iterator[String], capacity: Int): collection.mutable.HashMap[String, Long] = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val counts = collection.mutable.HashMap.empty[String, Long]
    items.foreach { x =>
      counts.get(x) match {
        case Some(c) => counts(x) = c + 1
        case None if counts.size < capacity => counts(x) = 1L
        case None =>
          // decrement-all: drop every counter by 1, evict zeros. The swept
          // weight is ≥ capacity+1 (this item plus all counters), which is
          // what bounds total decrements by n/capacity.
          val dead = collection.mutable.ArrayBuffer.empty[String]
          counts.iterator.foreach { case (k, c) =>
            if (c == 1L) dead += k else counts(k) = c - 1
          }
          dead.foreach(counts.remove)
      }
    }
    counts
  }

  /** Misra-Gries over 64-bit item hashes — the hot-path form: primitive
    * LongMap, no string decode/allocation per item. Retention transfers to
    * the hashed domain monotonically (a hash's count ≥ any one pre-image
    * token's count), so "token count > n/capacity ⇒ its hash is retained"
    * still holds; a collision only adds a harmless extra candidate, since
    * phase 2 recounts by the true token.
    */
  def mgSummarizeLong(items: Iterator[Long], capacity: Int): collection.mutable.LongMap[Long] = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val counts = collection.mutable.LongMap.empty[Long]
    items.foreach { x =>
      val c = counts.getOrElse(x, 0L)
      if (c > 0L) counts(x) = c + 1
      else if (counts.size < capacity) counts(x) = 1L
      else {
        // decrement-all sweep over a key snapshot (no mutation mid-iteration)
        val keys = counts.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val k = keys(i); val kc = counts(k)
          if (kc == 1L) counts.remove(k) else counts(k) = kc - 1
          i += 1
        }
      }
    }
    counts
  }

  /** One partition's phase-1 output over hashed items: candidate hashes
    * (weight = MG lower bound) plus one sentinel row (weight = −n) carrying
    * the partition's total item count, so the exactness check needs no
    * second scan of the input.
    */
  private[operators] def summarizePartition(it: Iterator[Long], capacity: Int): Iterator[(Long, Long)] = {
    var n = 0L
    val counted = it.map { x => n += 1; x }
    val mg = mgSummarizeLong(counted, capacity)
    mg.iterator.map { case (h, c) => (h, c) } ++ Iterator.single((0L, -n))
  }

  /** Exact global top-k of `tokens` (a single string column) by count, ties
    * broken by token ascending. Returns columns (token, n).
    */
  def exactTopK(tokens: DataFrame, k: Int, capacity: Int = 4096): DataFrame = {
    val col0 = tokens.columns.head
    val spark = tokens.sparkSession
    import spark.implicits._
    val hashed: Dataset[Long] =
      tokens.select(xxhash64(col(col0).cast("string"))).as[Long]

    // Phase 1: one narrow pass → per-partition MG summaries (≤ capacity+1
    // rows each, regardless of vocabulary size).
    val summaries = hashed
      .mapPartitions(it => summarizePartition(it, capacity))(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("h", "w").persist()
    try {
      val total = -summaries.where(col("w") < 0L)
        .agg(coalesce(sum(col("w")), lit(0L))).head().getLong(0)
      val candidates = summaries.where(col("w") > 0L).select(col("h")).distinct()

      // Phase 2: map-side semi-join against the (broadcast, ≤cap×parts-sized)
      // candidate-hash set — the shuffle carries candidate occurrences only,
      // and the whole pass stays inside codegen (the hash is an expression).
      val counted = tokens.select(col(col0).cast("string").as("token"))
        .join(broadcast(candidates), xxhash64(col("token")) === col("h"), "left_semi")
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc).limit(k)
      val top = counted.collect()

      // Exactness gate: the k-th exact candidate count must clear the MG
      // retention bound, else candidates may miss a true top-k item. Fewer
      // than k candidates proves NOTHING (the vocabulary may still hold ≥ k
      // distinct tokens that were all swept from the summaries) — that case
      // must also fall back.
      val exact = top.length == k && top.last.getLong(1) * capacity.toLong > total
      if (exact) spark.createDataFrame(spark.sparkContext.parallelize(top.toIndexedSeq, 1), counted.schema)
      else // provable-exactness fallback: full aggregation (bigger shuffle, still correct)
        tokens.select(col(col0).cast("string").as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token").asc).limit(k)
    } finally { summaries.unpersist() }
  }
}
