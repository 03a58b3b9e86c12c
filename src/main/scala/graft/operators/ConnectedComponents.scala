package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * — the standard algorithm for resolving near-duplicate PAIRS into
  * duplicate CLUSTERS at corpus scale.
  *
  * Why not label propagation: min-label flooding needs O(diameter) rounds,
  * and a duplicate chain (a~b~c~…) can be arbitrarily long. Star operations
  * converge in O(log diameter) rounds, each round a plain shuffle keyed by
  * node id:
  *
  *   - large-star: every node links its LARGER neighbors to its minimum
  *     neighbor (incl. itself) — flattens tall chains downward;
  *   - small-star: every node links its smaller-or-equal neighbors to the
  *     minimum — contracts the remaining short hops.
  *
  * Per-node minima are computed with a window `min` over the adjacency
  * (no `collect_list`: a hot node's full neighbor set never materializes in
  * one row, so degree skew degrades to a sort, not an OOM). Each round is
  * `localCheckpoint`ed — iterative plans otherwise nest every prior round
  * into the next (exponential lineage).
  */
object ConnectedComponents {

  /** @param edges two numeric columns (any orientation, self-loops ok)
    * @param nodes single-column universe of node ids (isolated nodes get
    *              their own singleton component)
    * @return (id, component) — component = min node id in the component */
  def components(edges: DataFrame, nodes: DataFrame, maxIters: Int = 25): DataFrame = {
    val n = nodes.toDF("id")
    // LAZY checkpoints throughout: the fixpoint signature aggregate is the
    // action that materializes each round's checkpoint, so every round costs
    // ONE job (star rounds + sig) instead of two (eager checkpoint, then sig)
    var e = edges.toDF("u", "v").where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)

    // Fixpoint detection: (count, XOR of xxhash64(u,v)) of the edge set —
    // ONE cheap aggregate per round instead of an exceptAll join. Star
    // rounds only ever rewrite the edge set toward the fixpoint, so an
    // unchanged (count, hash-xor) pair means converged (collision between
    // consecutive DIFFERENT sets ~2⁻⁶⁴ — the standard large-scale check).
    // XOR, not sum: overflow-free under ANSI mode, and edges are distinct
    // so no pair can self-cancel.
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var eSig = sig(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextSig = sig(next)
      converged = nextSig == eSig
      e = next
      eSig = nextSig
      it += 1
    }

    // after convergence every component is a star centered at its min id:
    // label(u) = min over u's neighbors (the center), center labels itself
    val bidir = e.union(e.select(col("v"), col("u"))).toDF("id", "nb")
    val labels = bidir.groupBy(col("id")).agg(min(col("nb")).as("component"))
      .select(col("id"), least(col("id"), col("component")).as("component"))
    n.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Large-star: for each node u, connect every neighbor v > u to
    * m = min(N(u) ∪ {u}). */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val bidir = e.union(e.select(col("v"), col("u"))).toDF("u", "v")
    val w = Window.partitionBy(col("u"))
    bidir.withColumn("m", least(min(col("v")).over(w), col("u")))
      .where(col("v") > col("u"))
      .select(least(col("v"), col("m")).as("u"), greatest(col("v"), col("m")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: for each node u, connect every neighbor v < u (and u
    * itself) to m = min of those neighbors. */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val bidir = e.union(e.select(col("v"), col("u"))).toDF("u", "v")
    val sm = bidir.where(col("v") < col("u"))
    val w = Window.partitionBy(col("u"))
    val withM = sm.withColumn("m", min(col("v")).over(w))
    withM.select(col("v"), col("m"))
      .union(withM.select(col("u"), col("m")))
      .toDF("a", "b")
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
  }
}
