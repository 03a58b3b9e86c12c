package graft.operators

import graft.functions.SimFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbour: a coarse k-means
  * quantizer partitions the vectors into cells; a query probes only its
  * `nprobe` nearest cells. This is the standard scale path for ANN over
  * billions of embeddings: the per-query candidate set shrinks by
  * ~(nprobe/k), and cells are a partitioning key, so each probe is a
  * partition-pruned scan.
  *
  * Training is deterministic Lloyd iterations (seeded by the first k
  * vectors in id order, no randomness): assignment is a broadcast join
  * against the k centroids + per-vector argmin; the update step re-averages
  * per (cell, dimension) via posexplode — both plain shuffles that scale
  * with the corpus, never corpus².
  */
object Ivf {

  /** Squared L2 distance between two (double-cast) array columns. */
  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(SimFns.toDouble(a), SimFns.toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Train k centroids with `iters` Lloyd iterations.
    * Returns (cell: Int, centroid: Array[Double]) — k small, driver-side. */
  def train(vectors: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 2): DataFrame = {
    val spark = vectors.sparkSession
    var centroids = vectors.orderBy(col(idCol)).limit(k)
      .select(col(idCol), SimFns.toDouble(col(vecCol)).as("centroid"))
      .withColumn("cell", row_number().over(Window.orderBy(col(idCol))) - 1)
      .select(col("cell"), col("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assign(vectors, centroids, idCol, vecCol)
      centroids = assigned
        .join(vectors, idCol)
        .select(col("cell"), posexplode(SimFns.toDouble(col(vecCol))))
        .toDF("cell", "pos", "x")
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("centroid"))
    }
    // materialize: centroids are k tiny rows of driver-side metadata, but as
    // a lazy plan every downstream use would re-run all Lloyd iterations
    val rows = centroids.collect().toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), centroids.schema)
  }

  /** Assign every vector to its nearest centroid: broadcast the k centroids,
    * argmin via min_by. Returns (idCol, cell). */
  def assign(vectors: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectors.join(broadcast(centroids))
      .groupBy(col(idCol))
      .agg(min_by(col("cell"), struct(dist2(col(vecCol), col("centroid")), col("cell"))).as("cell"))

  /** Build the searchable index ONCE: vectors tagged with their cell. In
    * production this is written out partitioned by `cell` so probes become
    * partition-pruned scans; re-assigning per query would swamp IVF's
    * candidate-set savings with a full-corpus shuffle. */
  def index(vectors: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectors.join(assign(vectors, centroids, idCol, vecCol), idCol)

  /** Top-k cosine search probing the query's `nprobe` nearest cells, over a
    * pre-built [[index]]. */
  def search(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
             topK: Int, nprobe: Int): DataFrame = {
    val qCells = queries.join(broadcast(centroids))
      .withColumn("d2", dist2(col(qVecCol), col("centroid")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(qIdCol)).orderBy(col("d2"), col("cell"))))
      .where(col("rnk") <= nprobe)
      .select(col(qIdCol), col(qVecCol), col("cell"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol))
    qCells.join(indexed, "cell")
      .select(col(qIdCol), col(idCol),
        SimFns.cosine(col(qVecCol), col(vecCol)).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
  }
}
