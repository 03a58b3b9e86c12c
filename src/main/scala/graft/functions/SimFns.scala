package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector-similarity column functions over `ArrayType(FloatType)` embedding
  * columns — composed built-ins (`zip_with`/`aggregate`), no UDFs, so the
  * dot product stays inside whole-stage codegen.
  *
  * All arithmetic is promoted to Double: float*float is exact in double
  * (24-bit mantissas), and the left-fold accumulation order is the array
  * order — deterministic across engines.
  */
object SimFns {

  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native codegen'd expression (graft.plans.CosineSim):
    * one fused dot/norm loop inside whole-stage codegen. This is the
    * most-executed scalar in the similarity path (once per query×candidate
    * pair), so it must not fall out of codegen the way interpreted
    * higher-order functions do.
    *
    * NULL on zero-norm/NaN (zero vectors must not claim rank 1 in desc
    * top-k), on any NULL element, and on length mismatch — identical to
    * [[cosineComposed]], which the spec cross-checks bit-for-bit. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.CosineSim(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** The composed-built-in form cosine replaced (kept as the spec's
    * differential oracle): let-binding idiom (CLAUDE.md) so the cast arrays
    * bind once per row; `try_divide`/`nanvl` give the same NULL contract. */
  def cosineComposed(a: Column, b: Column): Column =
    element_at(
      transform(array(struct(toDouble(a).as("x"), toDouble(b).as("y"))), p => {
        val ad = p.getField("x"); val bd = p.getField("y")
        nanvl(try_divide(dot(ad, bd), sqrt(dot(ad, ad)) * sqrt(dot(bd, bd))),
          lit(null).cast(DoubleType))
      }),
      1)

  /** Sign-of-random-hyperplane LSH bucket key: `planes` hash the vector to a
    * compact bit signature; vectors in the same bucket are cosine-close with
    * high probability. `planes` is a small driver-side matrix — broadcast as
    * literals into the expression, no join needed. */
  def rpLshKey(v: Column, planes: Seq[Seq[Double]]): Column = {
    val vd = toDouble(v)
    val bits = planes.map { p =>
      val plane = array(p.map(lit): _*)
      when(dot(vd, plane) >= 0.0, lit(1)).otherwise(lit(0))
    }
    concat_ws("", bits: _*)
  }

  /** Deterministic pseudo-random unit-ish planes (LCG on the driver — tiny,
    * reproducible, no Math.random). */
  def fixedPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }
}
