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

  /** Native codegen'd L2 unit-normalization (graft.plans.L2Normalize):
    * array<float|double> → unit array<double>, NULL on zero-norm /
    * NULL-element / non-finite inputs. One fused loop per vector in place
    * of the interpreted transform-over-aggregate composition. */
  def l2normalize(v: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.L2Normalize(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(v)))

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

  /** Symmetric per-vector int8 quantization stats — the compression step a
    * 100 TB embedding store runs before ANN indexing (4× smaller than f32,
    * reconstruction error ≤ scale/2 per element). Returns
    * struct(scale, max_err, cos_deq):
    *   - scale  = max|x| / 127 (NULL for the all-zero vector);
    *   - q_i    = round(x_i/scale), so the max element maps to ±127 exactly
    *     (no clipping by construction);
    *   - max_err = max_i |x_i − q_i·scale|;
    *   - cos_deq = cosine(x, dequantized) — how much ANN geometry survives.
    *
    * Both `xd` and `scale` are LET-BOUND via the struct-array idiom
    * (CLAUDE.md): interpreted HOF lambda bodies re-evaluate non-variable
    * subtrees per element, so an unbound `scale` would recompute the
    * array_max 64× per row. */
  def quantizeStats(v: Column): Column = element_at(
    transform(array(struct(toDouble(v).as("x"))), p => {
      val xd = p.getField("x")
      val sc = array_max(transform(xd, x => abs(x))) / lit(127.0)
      element_at(transform(array(struct(xd.as("x"),
          when(sc > 0.0, sc).as("s"))), q => {
        val x = q.getField("x")
        val s = q.getField("s")
        val deq = transform(x, xi => round(xi / s, 0) * s)
        struct(
          s.as("scale"),
          array_max(zip_with(x, deq, (a, b) => abs(a - b))).as("max_err"),
          cosine(x, deq).as("cos_deq"))
      }), 1)
    }), 1)

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

  /** Multi-probe LSH keys: the query's own sign-bucket plus every bucket at
    * Hamming distance 1 (one flipped hyperplane bit) — the standard recall
    * lever for sign-LSH: a near neighbour that lands just across ONE
    * hyperplane is still probed, at the cost of nPlanes extra (tiny,
    * bucket-pruned) lookups instead of a bigger index. The plane dot
    * products are computed ONCE per row (let-bound struct); the flipped
    * keys are pure integer recombinations. */
  def rpLshProbeKeys(v: Column, planes: Seq[Seq[Double]]): Column = {
    val vd = toDouble(v)
    val bitsStruct = struct(planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(vd, plane) >= 0.0, lit(1)).otherwise(lit(0)).as(s"b$i")
    }: _*)
    element_at(
      transform(array(bitsStruct), s => {
        val bits = planes.indices.map(i => s.getField(s"b$i"))
        val base = concat_ws("", bits: _*)
        val flips = planes.indices.map { i =>
          concat_ws("", bits.zipWithIndex.map {
            case (b, j) => if (j == i) lit(1) - b else b
          }: _*)
        }
        array((base +: flips): _*)
      }),
      1)
  }

  /** Banded sign-LSH keys for near-dup candidate generation (the cosine
    * analogue of MinHash banding): `nBands × rowsPerBand` hyperplanes hash
    * the vector once; the result is an array of `nBands` compact keys, one
    * per band of `rowsPerBand` sign bits. Two vectors are CANDIDATES iff
    * they agree on every bit of at least one band — explode the array and
    * equi-join on (band, key); candidates then verify with exact cosine.
    *
    * This is the 100 TB shape: the join is a shuffle equi-join on band
    * keys (never all-pairs), exact copies collide in EVERY band
    * (identical vectors ⇒ identical dot signs), and recall on
    * near-but-not-identical pairs is 1−(1−pʳ)ᵇ with p = 1−θ/π — tuned by
    * (nBands, rowsPerBand) exactly like MinHash's (b, r).
    *
    * All plane dot products are computed in ONE projection over a
    * let-bound struct (interpreted HOF lambda bodies re-evaluate
    * non-variable subtrees per element — CLAUDE.md); the band keys are
    * pure bit recombinations of that struct. */
  def bandedLshKeys(v: Column, nBands: Int, rowsPerBand: Int, dim: Int,
      seed: Long = 42L): Column = {
    val planes = fixedPlanes(nBands * rowsPerBand, dim, seed)
    val vd = toDouble(v)
    val bitsStruct = struct(planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(vd, plane) >= 0.0, lit(1)).otherwise(lit(0)).as(s"b$i")
    }: _*)
    element_at(
      transform(array(bitsStruct), st => {
        val keys = (0 until nBands).map { b =>
          concat_ws("", (0 until rowsPerBand).map(r =>
            st.getField(s"b${b * rowsPerBand + r}")): _*)
        }
        array(keys: _*)
      }),
      1)
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
