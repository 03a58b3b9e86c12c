package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd coarse-quantizer probe: the `n` nearest of a small
  * driver-side centroid matrix to an embedding column, by squared L2.
  *
  * This is the IVF hot path (graft.operators.Ivf): every vector in the
  * corpus must be assigned to its nearest cell, and every query to its
  * `nprobe` nearest cells. Expressed with built-ins that is either a
  * broadcast join against the centroid table (k× row blowup + a groupBy(id)
  * shuffle to argmin) or k interpreted higher-order-function folds per row —
  * both wrong shapes for a 100 TB corpus. Here the k×dim distance loop runs
  * as one tight codegen'd scan inside the row pipeline: NO join, NO shuffle,
  * no per-row allocation beyond the result array.
  *
  * Ties break to the lower cell index; vector/centroid length mismatches
  * treat missing elements as 0 — both deterministic across engines.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  require(centroids.nonEmpty, "NearestCells needs at least one centroid")
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nearest_cells"

  private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells expects array<float> or array<double>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NearestCells.nearest(input.asInstanceOf[ArrayData], centroids, n, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NearestCells.nearest($c, $cents, $n, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {

  /** k squared-L2 distances in ascending element order (left-associative
    * sequential adds — the same IEEE tree as an explicit `(v[1]-c1)² +
    * (v[2]-c2)² + …` SQL chain, so oracle twins agree bit-for-bit). */
  private[plans] def distances(vec: ArrayData, cents: Array[Array[Double]],
                               isFloat: Boolean): Array[Double] = {
    val k = cents.length
    val nv = vec.numElements()
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ct = cents(c)
      val m = if (nv < ct.length) nv else ct.length
      var s = 0.0
      var i = 0
      while (i < m) {
        val x =
          if (vec.isNullAt(i)) 0.0
          else if (isFloat) vec.getFloat(i).toDouble
          else vec.getDouble(i)
        val d = x - ct(i)
        s += d * d
        i += 1
      }
      while (i < ct.length) { s += ct(i) * ct(i); i += 1 } // vector shorter: treat as 0
      while (i < nv) { // centroid shorter: treat as 0
        val x =
          if (vec.isNullAt(i)) 0.0
          else if (isFloat) vec.getFloat(i).toDouble
          else vec.getDouble(i)
        s += x * x
        i += 1
      }
      d2(c) = s
      c += 1
    }
    d2
  }

  /** Partial selection of the `n` smallest distances (k is small — tens to
    * low hundreds of cells). Returns selected cell indices in ascending
    * distance order. */
  private[plans] def selectN(d2: Array[Double], n: Int): Array[Int] = {
    val k = d2.length
    val nn = if (n < k) n else k
    val out = new Array[Int](nn)
    val used = new Array[Boolean](k)
    var j = 0
    while (j < nn) {
      var best = -1
      var bd = Double.PositiveInfinity
      var c2 = 0
      while (c2 < k) {
        // `best == -1` seed: a NaN distance (NaN < x is false) or an
        // all-Infinity row must still select SOME cell — without the seed,
        // used(-1) would crash the task on the first NaN embedding
        if (!used(c2) && (best == -1 || d2(c2) < bd)) { bd = d2(c2); best = c2 } // strict < : ties → lower index
        c2 += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    out
  }

  /** The tight loop: k squared-L2 distances, then partial selection of the
    * `n` smallest. */
  def nearest(vec: ArrayData, cents: Array[Array[Double]], n: Int, isFloat: Boolean): ArrayData = {
    val d2 = distances(vec, cents, isFloat)
    new GenericArrayData(selectN(d2, n))
  }

  /** [[nearest]] with the distances kept: array of (cell, d2) structs in
    * ascending distance order — the shape cluster-quality diagnostics need
    * (nearest + second-nearest distance per vector). */
  def nearestWithDists(vec: ArrayData, cents: Array[Array[Double]], n: Int,
                       isFloat: Boolean): ArrayData = {
    val d2 = distances(vec, cents, isFloat)
    val sel = selectN(d2, n)
    val rows = new Array[Any](sel.length)
    var j = 0
    while (j < sel.length) {
      rows(j) = org.apache.spark.sql.catalyst.InternalRow(sel(j), d2(sel(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }
}

/** [[NearestCells]]' diagnostic sibling: the `n` nearest cells WITH their
  * squared-L2 distances, as `array<struct<cell:int, d2:double>>` in
  * ascending distance order. One codegen'd k×dim loop per row — the
  * built-in alternative (k explicit per-dimension column chains + an
  * array_sort of k structs) compiles to a megabyte-scale expression tree
  * that blows past JIT limits (measured: 9.9 MiB task binaries, ~6× the
  * runtime, on cluster_silhouette's first cut). Same tie/ragged-input
  * conventions as [[NearestCells]]; distance adds run in ascending element
  * order so SQL-chain oracle twins agree bit-for-bit. */
case class NearestCellDists(child: Expression, centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  require(centroids.nonEmpty, "NearestCellDists needs at least one centroid")
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cell", IntegerType, nullable = false),
      StructField("d2", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nearest_cell_dists"

  private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell_dists expects array<float> or array<double>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NearestCells.nearestWithDists(input.asInstanceOf[ArrayData], centroids, n, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NearestCells.nearestWithDists($c, $cents, $n, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellDists =
    copy(child = newChild)
}
