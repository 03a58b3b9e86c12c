package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Gram matrix X^T X of an embedding column — the moment
  * aggregation behind PCA, whitening, and linear probes: the corpus
  * collapses to a dim×dim matrix in ONE pass, and every downstream solve
  * (eigen, Cholesky) runs on the config-sized result at the driver —
  * exactly the split a 100 TB embedding store needs (compute that scales,
  * algebra that doesn't have to).
  *
  * Shape: `mapPartitions` accumulates a local upper-triangle double array
  * (dim·(dim+1)/2 cells — one allocation per partition, sequential array
  * arithmetic, no 64× row explosion and no shuffle of exploded values;
  * the justified-imperative pattern of HeavyHitters' partition summaries),
  * emits the triangle ONCE per partition, and a cells-sized groupBy folds
  * partitions. Float products are exact in double (24-bit mantissas), so
  * cross-engine divergence is limited to sum-order ulps.
  */
object Gram {

  final case class GramCell(i: Int, j: Int, s: Double, n: Long)

  /** Upper-triangle (i ≤ j, 0-based) entries of X^T X over `vecCol`
    * (array<float>, fixed `dim`; null/ragged vectors skipped). Returns
    * (i, j, s, n) — n = vectors accumulated, identical on every cell. */
  def upperTriangle(spark: SparkSession, df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    import spark.implicits._
    df.select(col(vecCol)).where(col(vecCol).isNotNull)
      .as[Seq[Float]]
      .mapPartitions { rows =>
        val acc = new Array[Double](dim * (dim + 1) / 2)
        var n = 0L
        rows.foreach { v =>
          if (v != null && v.length == dim) {
            n += 1
            var i = 0; var k = 0
            while (i < dim) {
              val vi = v(i).toDouble
              var j = i
              while (j < dim) { acc(k) += vi * v(j).toDouble; j += 1; k += 1 }
              i += 1
            }
          }
        }
        if (n == 0) Iterator.empty
        else {
          var i = 0; var k = 0
          val out = Vector.newBuilder[GramCell]
          while (i < dim) {
            var j = i
            while (j < dim) { out += GramCell(i, j, acc(k), n); j += 1; k += 1 }
            i += 1
          }
          out.result().iterator
        }
      }
      .groupBy(col("i"), col("j"))
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
  }
}
