package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY.md §2 ships as a named query here, with a
  * DuckDB-oracle SQL twin in [[oracleSql]] where SQL-expressible. */
object SparkEntry {

  // queries and oracles are SEPARATE lists on purpose: the trained-ANN
  // oracles (QueriesSim.oracle) fit a model when built, and they depend on
  // Tables.OracleContext, which Verify sets after this object initializes —
  // a val (or a fused (queries, oracle) list) would either freeze the
  // context-less rows-only map or re-run the training every time `queries`
  // alone is touched (review-caught: the _declared.txt write paid two full
  // trainSampled/Pq.train passes per Verify sweep).
  private val queryModules: Seq[Map[String, Tables.Q]] = Seq(
    QueriesRelational.queries, QueriesRelationalExt.queries,
    QueriesFunctions.queries, QueriesFacade.queries, QueriesTypes.queries,
    QueriesText.queries, QueriesDedup.queries, QueriesPipeline.queries,
    QueriesSim.queries, QueriesScale.queries, QueriesAnalytics.queries,
    QueriesMlops.queries, QueriesStream.queries, QueriesDdl.queries,
    QueriesTrain.queries)

  private def oracleModules: Seq[Map[String, String]] = Seq(
    QueriesRelational.oracle, QueriesRelationalExt.oracle,
    QueriesFunctions.oracle, QueriesFacade.oracle, QueriesTypes.oracle,
    QueriesText.oracle, QueriesDedup.oracle, QueriesPipeline.oracle,
    QueriesSim.oracle, QueriesScale.oracle, QueriesAnalytics.oracle,
    QueriesMlops.oracle, QueriesStream.oracle, QueriesDdl.oracle,
    QueriesTrain.oracle)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryModules.iterator.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    oracleModules.iterator.reduce(_ ++ _)
}
