package graft.operators

import graft.functions.SimFns
import graft.plans.NearestCells
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** IVF (inverted-file) approximate nearest neighbour: a coarse k-means
  * quantizer partitions the vectors into cells; a query probes only its
  * `nprobe` nearest cells. This is the standard scale path for ANN over
  * billions of embeddings: the per-query candidate set shrinks by
  * ~(nprobe/k), and cells are a partitioning key, so each probe is a
  * partition-pruned scan.
  *
  * The quantizer is k small driver-side centroids, so cell assignment is a
  * native codegen'd expression ([[graft.plans.NearestCells]]) — a NARROW map
  * over the corpus with no join and no shuffle. Training is deterministic
  * Lloyd iterations (seeded by the first k vectors in id order, no
  * randomness): each iteration is one narrow assign pass + one
  * (cell, dimension) partial aggregate — cost scales with the corpus,
  * never corpus², and the only shuffled rows are k×dim partial sums.
  */
object Ivf {

  /** The `n` nearest cells of `vec` among driver-side `cents` — codegen'd,
    * shuffle-free (see [[graft.plans.NearestCells]]). */
  def nearestCells(vec: Column, cents: Array[Array[Double]], n: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(vec), cents, n))

  /** Like [[nearestCells]] but keeping the squared-L2 distances:
    * `array<struct<cell, d2>>` ascending by distance — the cluster-quality
    * diagnostic shape (see [[graft.plans.NearestCellDists]]). */
  def nearestCellDists(vec: Column, cents: Array[Array[Double]], n: Int): Column =
    ColumnBridge.column(
      graft.plans.NearestCellDists(ColumnBridge.expression(vec), cents, n))

  /** Materialize a (cell, centroid) DataFrame to the driver-side matrix the
    * assignment expression embeds. Cells are dense 0..k-1 by construction. */
  def collectCentroids(centroids: DataFrame): Array[Array[Double]] = {
    val rows = centroids.select(col("cell"), col("centroid")).collect()
    val out = new Array[Array[Double]](rows.map(_.getInt(0)).max + 1)
    rows.foreach(r => out(r.getInt(0)) = r.getSeq[Double](1).toArray)
    out
  }

  /** Train k centroids with Lloyd iterations to convergence (max centroid
    * L2 movement < `tol`) or `maxIters`; returns the (cell: Int,
    * centroid: Array[Double]) table (k tiny rows). Each iteration is one
    * narrow codegen'd assign pass + one (cell, dim) aggregate whose map-side
    * combine collapses the posexplode blowup to k×dim partials per
    * partition — the shuffle moves k×dim×partitions rows regardless of
    * corpus size. Results materialize on the driver per iteration: chaining
    * iterations lazily would nest every previous iteration's plan into the
    * next. A cell that captures no vectors keeps its previous centroid
    * (deterministic, no respawn heuristics); seeding is the first k vectors
    * in id order (deterministic, no randomness).
    *
    * NOT the scale path: this burns up to `maxIters` full corpus scans (plus
    * a per-iteration driver collect) to fit a few-KB model — [[trainSampled]]
    * fits the same cell geometry from a bounded sample and is what every
    * declared query uses. `train` exists for RAGGED corpora (non-uniform
    * vector dimension), which the sampled fit can't handle, and is guarded
    * by `maxRows` so it cannot be pointed at a 100 TB corpus by accident:
    * the probe is one early-terminating `limit(maxRows+1).count()` job. */
  def train(vectors: DataFrame, idCol: String, vecCol: String, k: Int,
            maxIters: Int = 6, tol: Double = 1e-2,
            maxRows: Long = 1L << 22): DataFrame = {
    // saturate BEFORE the +1: maxRows = Long.MaxValue must not overflow to a
    // negative limit()
    val probed =
      vectors.limit(((maxRows min (Int.MaxValue - 1L)) + 1).toInt).count()
    require(probed <= maxRows,
      s"Ivf.train is the exhaustive (full-corpus-scan) Lloyd path, capped at $maxRows rows " +
        s"(corpus has more). Use Ivf.trainSampled — the corpus-size-independent trainer — " +
        s"or raise maxRows explicitly if an exhaustive fit on a ragged corpus is intended.")
    val spark = vectors.sparkSession
    var cents: Array[Array[Double]] = vectors.orderBy(col(idCol)).limit(k)
      .select(SimFns.toDouble(col(vecCol)).as("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    var it = 0
    var moved = Double.PositiveInfinity
    while (it < maxIters && moved >= tol) {
      val means = vectors
        .select(element_at(nearestCells(col(vecCol), cents, 1), 1).as("cell"),
          posexplode(SimFns.toDouble(col(vecCol))))
        .toDF("cell", "pos", "x")
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      // ragged corpora are in-contract (NearestCells pads with 0), so a
      // vector longer than its cell's seed yields positions past the
      // centroid dim — ignore them (centroid keeps the seed's dimension);
      // an all-null dimension yields a NULL avg — keep the previous value
      means.foreach { r =>
        val cell = r.getInt(0); val pos = r.getInt(1)
        if (!r.isNullAt(2) && pos < next(cell).length) next(cell)(pos) = r.getDouble(2)
      }
      moved = cents.zip(next).map { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.max
      cents = next
      it += 1
    }
    import spark.implicits._
    cents.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid")
  }

  /** Sample-trained quantizer — the corpus-size-INDEPENDENT training path
    * (what FAISS-style ANN libraries do, and what [[Pq.train]] already does
    * for codebooks): ONE bounded `orderBy(id).limit(sampleN)` collect, then
    * pure driver-side Lloyd to convergence. The coarse quantizer is a
    * few-KB model; at 100 TB the corpus-wide [[train]] would burn
    * `maxIters` full scans to fit it, while a 2k-vector sample gives the
    * same cell geometry. Deterministic: sample = first `sampleN` in id
    * order, seeds = first k of the sample, ties to the lower cell, empty
    * cells keep their previous centroid (identical conventions to
    * [[train]]). Requires uniform vector dimension (use [[train]] for
    * ragged corpora). Returns the same (cell, centroid) table shape. */
  def trainSampled(vectors: DataFrame, idCol: String, vecCol: String, k: Int,
                   maxIters: Int = 25, tol: Double = 1e-4, sampleN: Int = 2048): DataFrame = {
    val spark = vectors.sparkSession
    val sample = vectors.orderBy(col(idCol)).limit(sampleN)
      .select(SimFns.toDouble(col(vecCol))).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "no vectors to train on")
    val cents = Pq.lloydLocal(sample, k, maxIters, tol)
    import spark.implicits._
    cents.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid")
  }

  /** Assign every vector to its nearest centroid. Returns (idCol, cell) —
    * one codegen'd projection, no join, no shuffle. */
  def assign(vectors: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val cents = collectCentroids(centroids)
    vectors.select(col(idCol), element_at(nearestCells(col(vecCol), cents, 1), 1).as("cell"))
  }

  /** Build the searchable index ONCE: vectors tagged with their cell. In
    * production this is written out partitioned by `cell` so probes become
    * partition-pruned scans. */
  def index(vectors: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val cents = collectCentroids(centroids)
    vectors.withColumn("cell", element_at(nearestCells(col(vecCol), cents, 1), 1))
  }

  /** Cell assignment with a bounded-occupancy GUARANTEE at ANY corpus size
    * — the tier past [[NearestCells]]' literal-centroid ceiling (round-10
    * verdict: semdedup's linear-pair-work property held only to ~33M
    * vectors; past that, fixed-k cells grow as N/k and the within-cell
    * quadratic term returns).
    *
    * Base tier: the caller's pre-trained centroid table (k ≤ a few
    * thousand — the trained-sample and plan-reference-object budget) via
    * the codegen'd [[NearestCells]] scan, bit-identical to [[index]] when
    * no cell overflows — so existing oracles over the base tier stay
    * valid, and training-vs-assignment corpora may differ (semdedup
    * trains on the natural corpus, assigns corpus ∪ planted).
    *
    * Past the bound: cells whose occupancy exceeds `occSlack × targetOcc`
    * are RECURSIVELY SPLIT. Per depth, one (cell, count) aggregate finds
    * oversized cells; each trains its own sub-quantizer from a bounded
    * per-cell sample (first `sampleN` rows in id order — a cells-partitioned
    * rank, no global sort) INSIDE `flatMapGroups`, so sub-training is
    * distributed across executors with per-task memory bounded by
    * sampleN × dim; assignment is a JOIN against the (cell, sub, centroid)
    * table (broadcast when small — the "centroid table join" production
    * path) with a map-side-combined per-id argmin, so no stage ever holds
    * a cell's full population. Composite ids (cell+1)·65536 + sub are
    * collision-free (sub < 65536; parents that split leave the id space)
    * up to `maxDepth` = 3 (≤ 2^48 < Long range).
    *
    * Expected split depth: occupancy shrinks ~min(sub-k, sampleN)× per
    * split (the sub-quantizer can never have more centroids than sample
    * points — see the kc cap below), so 1B vectors at k=4096 need ONE
    * depth, and a degenerate single giant cell of N rows needs
    * ~log_sampleN(N/targetOcc) depths.
    * `maxDepth` caps pathological data (e.g. > bound exact-duplicate
    * vectors, which no quantizer can separate); the bound then holds for
    * every splittable cell and the remainder is duplicate-mass, which the
    * CALLER's within-cell pass handles (for semdedup, duplicates are
    * precisely what it drops).
    *
    * Determinism: sub-sampling is id-ordered, Lloyd is [[Pq.lloydLocal]]
    * (first-k seeds, lower-index ties), the argmin ties to the lower sub
    * id via the struct min. Returns (idCol, vecCol, cell: Long).
    */
  def assignBounded(vectors: DataFrame, centroids: DataFrame,
                    idCol: String, vecCol: String,
                    targetOcc: Long = 512L, occSlack: Long = 4L,
                    sampleN: Int = 2048, maxDepth: Int = 3): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bound = occSlack * targetOcc
    var assigned = index(vectors, centroids, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("cell").cast("long").as("cell"))
      .localCheckpoint(false) // re-read per depth by the occupancy probe
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      val occ = assigned.groupBy(col("cell")).agg(count(lit(1)).as("_cnt"))
        .where(col("_cnt") > bound)
      // one early-terminating probe job decides whether this depth runs at
      // all — at test SFs (occupancy ≈ targetOcc) the loop exits here
      if (occ.limit(1).count() == 0L) done = true
      else {
        val routed = assigned.join(broadcast(occ), Seq("cell"), "left")
        val keep = routed.where(col("_cnt").isNull).drop("_cnt")
        val over = routed.where(col("_cnt").isNotNull)
        // bounded per-cell sample: a cells-partitioned rank, never a
        // global sort; ranks are id-ordered so the sample (and the Lloyd
        // seeds) are deterministic
        val wCell = Window.partitionBy(col("cell")).orderBy(col(idCol))
        val sampled = over
          .withColumn("_rk", row_number().over(wCell))
          .where(col("_rk") <= sampleN)
          .select(col("cell"), col("_cnt"), col("_rk"),
            SimFns.toDouble(col(vecCol)).as("_v"))
          .as[(Long, Long, Int, Seq[Double])]
        val subCents = sampled.groupByKey(_._1)
          .flatMapGroups { (cell, it) =>
            // flatMapGroups guarantees NO within-group order — re-sort by
            // the rank so the Lloyd seeds (first kc rows in id order) are
            // deterministic across runs and partitionings
            val rows = it.toArray.sortBy(_._3)
            val cnt = rows.head._2
            val data = rows.map(_._4.toArray)
            // kc is EXPLICITLY capped at the sample size: Pq.lloydLocal can
            // never produce more centroids than it has sample points, so a
            // cell larger than sampleN×targetOcc shrinks by at most sampleN×
            // per split (not cnt/targetOcc×) and relies on the next depth —
            // the cap here makes that visible instead of silent (round-11
            // ADVICE). With sampleN=2048, one depth bounds cells up to
            // 2048·targetOcc ≈ 1M (k=4096 ⇒ ~4B vectors); larger cells
            // take ceil(log_sampleN(cnt/targetOcc)) depths.
            val kc = math.min(math.min(
              math.max(2L, (cnt + targetOcc - 1) / targetOcc),
              rows.length.toLong), 65535L).toInt
            Pq.lloydLocal(data, kc, maxIters = 25, tol = 1e-4)
              .zipWithIndex.map { case (c, i) => (cell, i, c.toSeq) }.iterator
          }
          .toDF("cell", "_sub", "_cent")
        // argmin over the joined (vector × sub-centroid) rows: the struct
        // min partial-aggregates map-side, so the kc-fold blowup collapses
        // before the shuffle; d2 is the same ascending-dim left fold as
        // NearestCells
        val d2 = aggregate(
          zip_with(SimFns.toDouble(col(vecCol)), col("_cent"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v)
        val reassigned = over.join(subCents, "cell")
          .select(col("cell"), col(idCol), col(vecCol), col("_sub"), d2.as("_d2"))
          .groupBy(col(idCol))
          .agg(min(struct(col("_d2"), col("_sub"), col("cell"), col(vecCol)))
            .as("_m"))
          .select(col(idCol), col("_m").getField(vecCol).as(vecCol),
            ((col("_m.cell") + 1L) * 65536L + col("_m._sub")).as("cell"))
        assigned = keep.select(col(idCol), col(vecCol), col("cell"))
          .unionByName(reassigned.select(col(idCol), col(vecCol), col("cell")))
          .localCheckpoint(false)
        depth += 1
      }
    }
    assigned
  }

  /** Persist the index partitioned by cell — the on-disk ANN layout for a
    * 100 TB corpus: every cell is its own directory, so a probe against
    * [[readIndex]] scans ONLY the probed cells' files. With the probe side
    * broadcast, Spark's dynamic partition pruning turns the cell equi-join
    * into partition filters at runtime (IvfSpec asserts the `dynamicpruning`
    * filter in the executed plan). */
  def writeIndex(indexed: DataFrame, path: String): Unit =
    indexed.write.mode("overwrite").partitionBy("cell").parquet(path)

  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Top-k cosine search probing the query's `nprobe` nearest cells, over a
    * pre-built [[index]]. The probe-cell choice is the same codegen'd
    * expression (exploded to `nprobe` rows per query); ranking is a window
    * per query id, so work scales with queries × probed candidates. */
  def search(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
             topK: Int, nprobe: Int): DataFrame = {
    val cents = collectCentroids(centroids)
    val qCells = queries.select(col(qIdCol), col(qVecCol),
      explode(nearestCells(col(qVecCol), cents, nprobe)).as("cell"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol))
    qCells.join(indexed, "cell")
      .select(col(qIdCol), col(idCol),
        SimFns.cosine(col(qVecCol), col(vecCol)).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
  }
}
