package graft

import org.apache.spark.sql.functions._

/** Round-10 additions: data-scale BFS reachability, frozen-model IVF-PQ
  * append, the WAV audio decode card, and semdedup's corpus-scaled knobs. */
class Round10Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("graph_bfs_users: full differential recompute at sf0.001") {
    val got = graft.queries.QueriesAnalytics.queries("graph_bfs_users")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // recompute from the raw events with plain Scala set algebra
    val ev = graft.queries.Tables.t(spark, dir, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val edges = ev.groupBy(e => (e._2, Math.floorDiv(e._4, 3600000000L))).toSeq
      .flatMap { case (_, es) =>
        val ordered = es.sortBy(e => (e._4, e._3))
        ordered.zip(ordered.tail).map { case (a, b) => (a._1, b._1) }.filter(p => p._1 != p._2)
      }.toSet
    val nodes = ev.map(_._1).toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var distOf = nodes.filter(_ % 25 == 0).map(_ -> 0L).toMap
    var frontier = distOf.keySet
    for (i <- 1 to 5) {
      val nxt = frontier.flatMap(adj.getOrElse(_, Set.empty)).diff(distOf.keySet)
      distOf ++= nxt.map(_ -> i.toLong)
      frontier = nxt
    }
    val card = distOf.groupBy(_._2).map { case (d, m) =>
      (d, m.size.toLong, m.keys.sum) }.toSeq
    val unreached = nodes.diff(distOf.keySet)
    val expected = (card :+ ((-1L, unreached.size.toLong, unreached.sum)))
      .sortBy(_._1)
    assert(got == expected, s"got $got != $expected")
    // sanity: the seed level exists and carries every 25th user
    assert(got.exists(r => r._1 == 0L && r._2 == nodes.count(_ % 25 == 0)))
  }
}
