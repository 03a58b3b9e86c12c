package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY.md §2 ships as a named query here, with a
  * DuckDB-oracle SQL twin in [[oracleSql]] where SQL-expressible. */
object SparkEntry {

  // a def, not a val: the trained-ANN oracles (QueriesSim.oracle) depend on
  // Tables.OracleContext, which Verify sets AFTER this object initializes —
  // a val would freeze the context-less (rows-only) oracle map
  private def modules: Seq[(Map[String, Tables.Q], Map[String, String])] = Seq(
    (QueriesRelational.queries, QueriesRelational.oracle),
    (QueriesRelationalExt.queries, QueriesRelationalExt.oracle),
    (QueriesFunctions.queries, QueriesFunctions.oracle),
    (QueriesFacade.queries, QueriesFacade.oracle),
    (QueriesTypes.queries, QueriesTypes.oracle),
    (QueriesText.queries, QueriesText.oracle),
    (QueriesDedup.queries, QueriesDedup.oracle),
    (QueriesPipeline.queries, QueriesPipeline.oracle),
    (QueriesSim.queries, QueriesSim.oracle),
    (QueriesScale.queries, QueriesScale.oracle),
    (QueriesAnalytics.queries, QueriesAnalytics.oracle),
    (QueriesMlops.queries, QueriesMlops.oracle),
    (QueriesStream.queries, QueriesStream.oracle),
    (QueriesDdl.queries, QueriesDdl.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
