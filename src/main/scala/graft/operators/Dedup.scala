package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash. Designed for the 100 TB shape:
  *
  *   - per-document signatures (shingles → minhash / simhash) are computed
  *     with higher-order functions in one narrow pass — no shuffle, full
  *     codegen;
  *   - candidate generation is an equi-join on (band index, band hash) — a
  *     standard shuffle join whose key space grows with the corpus, so it
  *     parallelizes; no all-pairs comparison ever happens;
  *   - only candidates are verified with the exact measure (Jaccard), so
  *     verification cost is proportional to the number of near-duplicates,
  *     not corpus².
  */
object Dedup {

  /** Distinct token-`n`-gram shingle set per document. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol), array_distinct(TextFns.shingles(TextFns.tokens(col(textCol)), n)).as("shingles"))

  /** Jaccard similarity of two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_distinct(concat(a, b))).cast(DoubleType)

  /** `numHashes` min-hashes in ONE pass over the shingle array: a left fold
    * keeping the per-seed minimum of xxhash64(seed, shingle). */
  def minhashes(shinglesCol: Column, numHashes: Int): Column =
    aggregate(
      shinglesCol,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, x) => zip_with(
        acc,
        transform(sequence(lit(0), lit(numHashes - 1)), i => xxhash64(i, x)),
        (m, h) => least(m, h)))

  /** Band the minhash signature: `numBands` hashes, each over a contiguous
    * slice of `rowsPerBand` minhashes. */
  def bandHashes(mh: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => xxhash64(slice(mh, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** MinHash-LSH candidate pairs (idA < idB), verified with exact Jaccard ≥
    * `threshold`. Output: (id_a, id_b, jaccard). */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 128, numBands: Int = 32,
                      shingleN: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sh = shingleSets(docs, idCol, textCol, shingleN)
    val bands = sh
      .select(col(idCol), posexplode(bandHashes(minhashes(col("shingles"), numHashes), numBands, rowsPerBand)))
      .toDF(idCol, "band", "bh")
    val cand = bands.as("x").join(bands.as("y"),
        col(s"x.band") === col(s"y.band") && col(s"x.bh") === col(s"y.bh") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    cand
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of a feature array: per bit, sum ±1 contributions of
    * each feature's xxhash64 bit; the signature is the sign vector packed to
    * an array of 0/1 ints (kept unpacked for cheap hamming + banding). */
  def simhashBits(features: Column): Column = {
    val counters = aggregate(
      features,
      array_repeat(lit(0L), 64),
      (acc, x) => zip_with(
        acc,
        array((0 until 64).map(i =>
          when(shiftright(xxhash64(x), i).bitwiseAND(1L) === 1L, lit(1L)).otherwise(lit(-1L))): _*),
        (a, b) => a + b))
    transform(counters, c => when(c > 0L, lit(1)).otherwise(lit(0)))
  }

  /** Hamming distance between two equal-length bit arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 0L).otherwise(1L)), lit(0L), (acc, v) => acc + v)

  /** SimHash near-dup pairs: block on `numChunks` signature chunks (pairs
    * within hamming < numChunks always share a chunk), verify exact hamming
    * ≤ maxHamming. Output: (id_a, id_b, hamming). */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 7, numChunks: Int = 8, shingleN: Int = 3): DataFrame = {
    val chunkLen = 64 / numChunks
    val sh = shingleSets(docs, idCol, textCol, shingleN)
    val sigs = sh.select(col(idCol), simhashBits(col("shingles")).as("sig"))
    val chunks = sigs
      .select(col(idCol), col("sig"),
        posexplode(transform(sequence(lit(0), lit(numChunks - 1)),
          k => concat_ws("", slice(col("sig"), k * chunkLen + 1, lit(chunkLen))))))
      .toDF(idCol, "sig", "chunk", "ch")
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ch") === col("y.ch") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        hamming(col("x.sig"), col("y.sig")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
