package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count–Min sketch as a DATAFRAME: the sketch is the (row, cell, count)
  * table of its non-zero cells (≤ depth·width rows — config-bounded), built
  * with one partial-aggregated groupBy, so it is mergeable BY CONSTRUCTION
  * (union + re-aggregate adds cell counts — the property that lets 1000
  * shards sketch locally and a reducer fold kilobytes, same contract as
  * hll_card's sketches but for POINT FREQUENCY queries).
  *
  * Complements [[HeavyHitters]]: Misra–Gries answers "what are the exact
  * top-k" with a candidate recount; Count–Min answers "how often does THIS
  * item occur" for any later probe without re-touching the corpus, at the
  * price of over-estimation (never under: a cell aggregates every item
  * hashing into it, so cell ≥ item count deterministically — the invariant
  * the declared query pins; the ε·N over-estimation bound is probabilistic
  * and spec-pinned empirically instead).
  *
  * Everything is codegen'd column arithmetic (xxhash64 + pmod) — no UDFs,
  * no driver-side sketch object.
  */
object CountMin {

  private def cell(c: org.apache.spark.sql.Column, r: Int, width: Int) =
    pmod(xxhash64(lit(r), c), lit(width.toLong))

  /** Build the sparse sketch table (r, cell, cnt) for `itemCol`. */
  def sketch(items: DataFrame, itemCol: String,
             depth: Int = 4, width: Int = 2048): DataFrame = {
    require(depth >= 1 && width >= 2, s"degenerate sketch: depth=$depth width=$width")
    items.select((0 until depth).map(r =>
        cell(col(itemCol), r, width).as(s"_c$r")): _*)
      .select(posexplode(array((0 until depth).map(r => col(s"_c$r")): _*)))
      .toDF("r", "cell")
      .groupBy(col("r"), col("cell")).agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes(itemCol)`: min over the sketch
    * rows of the probed cells. Absent cells count 0 (sparse sketch), so an
    * item never seen estimates 0 unless it collides in EVERY row. The join
    * is (depth·|probes|) × config-sized — broadcastable either way. */
  def estimate(sk: DataFrame, probes: DataFrame, itemCol: String,
               depth: Int = 4, width: Int = 2048): DataFrame = {
    val probed = probes.select((col(itemCol) +: (0 until depth).map(r =>
        cell(col(itemCol), r, width).as(s"_c$r"))): _*)
      .select(col(itemCol), posexplode(array((0 until depth).map(r => col(s"_c$r")): _*)))
      .toDF(itemCol, "r", "cell")
    probed.join(sk, Seq("r", "cell"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
