package graft

import graft.operators.Gram
import org.apache.spark.sql.functions._

/** Gram-matrix operator: exact small-case differential, cell completeness,
  * and the downstream config-sized solve it exists for — PCA's top
  * eigenpair by driver-side power iteration on the collected matrix. */
class GramSpec extends SparkSpec {

  test("exact on a hand-computable 3x3 case") {
    import spark.implicits._
    val df = Seq(Seq(1f, 0f, 2f), Seq(0f, 3f, 1f)).toDF("v")
    val got = Gram.upperTriangle(spark, df, "v", 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val want = Map(
      (0, 0) -> 1.0, (0, 1) -> 0.0, (0, 2) -> 2.0,
      (1, 1) -> 9.0, (1, 2) -> 3.0, (2, 2) -> 5.0)
    assert(got.keySet == want.keySet)
    want.foreach { case (k, s) => assert(got(k) == ((s, 2L)), s"$k: ${got(k)}") }
  }

  test("null and ragged vectors are skipped; n counts the accumulated rows") {
    import spark.implicits._
    val df = Seq(Some(Seq(1f, 1f)), None, Some(Seq(2f)), Some(Seq(0f, 3f))).toDF("v")
    val got = Gram.upperTriangle(spark, df, "v", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got((0, 0)) == ((1.0, 2L)) && got((1, 1)) == ((10.0, 2L)) && got((0, 1)) == ((1.0, 2L)))
  }

  test("PCA top eigenpair by power iteration on the testdata gram") {
    val dim = 64
    val cells = Gram.upperTriangle(spark,
      graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "embeddings"),
      "embedding", dim).collect()
    assert(cells.length == dim * (dim + 1) / 2, "full upper triangle present")
    val g = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      g(i)(j) = s; g(j)(i) = s
    }
    // deterministic power iteration — the config-sized solve the operator
    // feeds; 200 rounds is far past convergence for a top-gap matrix
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    var lambda = 0.0
    (1 to 200).foreach { _ =>
      val av = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val nrm = math.sqrt(av.map(x => x * x).sum)
      v = av.map(_ / nrm); lambda = nrm
    }
    assert(lambda > 0.0)
    // residual ||Gv - lambda v|| should be tiny relative to lambda
    val res = Array.tabulate(dim)(i =>
      (0 until dim).map(j => g(i)(j) * v(j)).sum - lambda * v(i))
    val rel = math.sqrt(res.map(x => x * x).sum) / lambda
    assert(rel < 1e-6, s"power iteration residual $rel")
    // a gram matrix is PSD: the top eigenvalue bounds the average diagonal
    val trace = (0 until dim).map(i => g(i)(i)).sum
    assert(lambda >= trace / dim && lambda <= trace + 1e-9)
  }

  test("Pca.fitSampled: orthonormal components, descending variance, deterministic") {
    import graft.operators.Pca
    val e = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .where(col("embedding").isNotNull).select(col("vec_id"), col("embedding"))
    val (mu, comps) = Pca.fitSampled(e, "vec_id", "embedding")
    val (mu2, comps2) = Pca.fitSampled(e, "vec_id", "embedding")
    // deterministic: refit is bit-identical (the oracle generator relies on it)
    assert(mu.sameElements(mu2) &&
      comps.zip(comps2).forall { case (a, b) => a.sameElements(b) })
    val Seq(w1, w2) = comps
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(w1, w1) - 1.0) < 1e-9 && math.abs(dot(w2, w2) - 1.0) < 1e-9,
      "components not unit-norm")
    assert(math.abs(dot(w1, w2)) < 1e-6, s"components not orthogonal: ${dot(w1, w2)}")
    // projections through the declared query: var(p1) >= var(p2) (top
    // component captures the most variance), and both nonzero
    val rows = graft.queries.QueriesSim.queries("embed_pca_project")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    def variance(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val (v1, v2) = (variance(rows.map(_._1)), variance(rows.map(_._2)))
    assert(v1 >= v2 && v2 > 0, s"variance ordering violated: $v1 < $v2")
  }
}
