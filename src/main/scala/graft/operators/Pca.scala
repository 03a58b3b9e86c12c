package graft.operators

import graft.functions.SimFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sample-fit PCA for embedding columns — the projection/whitening step a
  * training pipeline runs before visualization, probing, or compacting an
  * embedding store. Follows the repo's deterministic sampled-trainer
  * convention ([[Ivf.trainSampled]], [[Pq.train]]): the model is a PURE
  * function of the first `sampleN` vectors in id order, fit entirely on the
  * driver (a dim×dim covariance is config-sized no matter the corpus), so
  * the oracle generator can re-fit the identical model and inline its
  * components as SQL literals.
  *
  * NOT built on [[Gram.upperTriangle]] on purpose: the distributed Gram's
  * partial sums merge in task-completion order, so its doubles can differ
  * between runs in the last ulp — fine for the floor-rounded embed_gram
  * card, wrong for a model whose literals must be bit-reproducible between
  * the query's fit and the oracle's fit.
  *
  * Determinism: fixed all-ones/√d start vector, FIXED `maxIters` power
  * iterations (no early stop — a tolerance check would make the iteration
  * count data-dependent), Hotelling deflation for lower components; every
  * loop accumulates in ascending index order.
  */
object Pca {

  /** Fit (mean, principal components) on the first `sampleN` vectors in
    * `idCol` order. Requires uniform dimension over the sample. */
  def fitSampled(vectors: DataFrame, idCol: String, vecCol: String,
                 nComponents: Int = 2, maxIters: Int = 200,
                 sampleN: Int = 2048): (Array[Double], Seq[Array[Double]]) = {
    val (mu, comps, _) = fitSampledFull(vectors, idCol, vecCol, nComponents,
      maxIters, sampleN)
    (mu, comps)
  }

  /** [[fitSampled]] keeping the Rayleigh eigenvalues (the per-component
    * sample variances) — the extra output whitening needs for the
    * 1/√λ scaling. Identical arithmetic and iteration order, so the
    * (mean, components) pair is bit-identical to [[fitSampled]]'s. */
  def fitSampledFull(vectors: DataFrame, idCol: String, vecCol: String,
                 nComponents: Int = 2, maxIters: Int = 200,
                 sampleN: Int = 2048): (Array[Double], Seq[Array[Double]], Seq[Double]) = {
    val sample = vectors.orderBy(col(idCol)).limit(sampleN)
      .select(SimFns.toDouble(col(vecCol))).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "no vectors to fit on")
    val n = sample.length
    val d = sample.head.length
    require(sample.forall(_.length == d), "ragged sample — PCA needs uniform dim")
    val mu = new Array[Double](d)
    sample.foreach { v =>
      var i = 0; while (i < d) { mu(i) += v(i); i += 1 }
    }
    locally { var i = 0; while (i < d) { mu(i) /= n; i += 1 } }
    // covariance in fixed accumulation order (sample order, then index order)
    val a = Array.ofDim[Double](d, d)
    sample.foreach { v =>
      var i = 0
      while (i < d) {
        val vi = v(i) - mu(i)
        var j = 0
        while (j < d) { a(i)(j) += vi * (v(j) - mu(j)); j += 1 }
        i += 1
      }
    }
    locally {
      var i = 0
      while (i < d) { var j = 0; while (j < d) { a(i)(j) /= n; j += 1 }; i += 1 }
    }
    val comps = Seq.newBuilder[Array[Double]]
    val lams = Seq.newBuilder[Double]
    var c = 0
    while (c < nComponents) {
      var x = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < maxIters) {
        val y = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0; var j = 0
          while (j < d) { s += a(i)(j) * x(j); j += 1 }
          y(i) = s; i += 1
        }
        var nrm = 0.0
        locally { var i2 = 0; while (i2 < d) { nrm += y(i2) * y(i2); i2 += 1 } }
        nrm = math.sqrt(nrm)
        if (nrm > 0) { var i2 = 0; while (i2 < d) { y(i2) /= nrm; i2 += 1 } }
        x = y; it += 1
      }
      // Rayleigh eigenvalue, then Hotelling deflation A ← A − λ x xᵀ
      var lam = 0.0
      locally {
        var i = 0
        while (i < d) {
          var s = 0.0; var j = 0
          while (j < d) { s += a(i)(j) * x(j); j += 1 }
          lam += x(i) * s; i += 1
        }
      }
      locally {
        var i = 0
        while (i < d) {
          var j = 0
          while (j < d) { a(i)(j) -= lam * x(i) * x(j); j += 1 }
          i += 1
        }
      }
      comps += x
      lams += lam
      c += 1
    }
    (mu, comps.result(), lams.result())
  }
}
