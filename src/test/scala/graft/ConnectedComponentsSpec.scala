package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Large-star/small-star connected components: chains, forests, isolated
  * nodes, and agreement with a driver-side union-find on a seeded graph. */
class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("u", "v"), nodes.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, isolated node") {
    // chain 1-2-3-4-5, triangle 10-11-12 (+ redundant edge), isolated 20
    val got = run(
      Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (10L, 11L), (11L, 12L), (12L, 10L)),
      Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("long chain converges (log-round stars, not diameter-round flooding)") {
    val n = 64L
    val edges = (1L until n).map(i => (i, i + 1))
    val got = run(edges, (1L to n))
    assert(got.values.toSet == Set(1L) && got.size == n.toInt)
  }

  test("agrees with driver-side union-find on a seeded graph") {
    // deterministic LCG edges over 60 nodes
    var s = 12345L
    def next(m: Long): Long = { s = s * 6364136223846793005L + 1442695040888963407L; math.abs(s) % m }
    val nodes = (0L until 60L)
    val edges = Seq.fill(45)((next(60), next(60)))
    // union-find ground truth
    val parent = scala.collection.mutable.ArrayBuffer.tabulate(60)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = nodes.map(i => i -> {
      // canonical label = min node in component
      nodes.filter(j => find(j.toInt) == find(i.toInt)).min
    }).toMap
    assert(run(edges, nodes) == truth)
  }
}
