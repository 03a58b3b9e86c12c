package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet testdata loaders (TESTDATA.md). */
object Tables {

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark doesn't natively read;
    * read it as a raw nanos long and truncate to microseconds (integer DIV —
    * a double division would lose precision on ~1.7e18 nanos values). DuckDB
    * truncates ns→µs the same way, so the oracle agrees. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // floor division via pmod (DIV truncates toward zero, which would
      // round pre-1970 nanos the wrong way; DuckDB floors)
      df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) DIV 1000")))
    else df
  }

  type Q = (SparkSession, String) => DataFrame

  val All: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view so `spark.sql` queries —
    * the reference's `get-data-table` surface — can run against them. */
  def registerAll(s: SparkSession, dir: String): Unit =
    All.foreach(n => t(s, dir, n).createOrReplaceTempView(n))

  /** The DuckDB-side twin of [[graft.functions.TextFns.tokens]] (lowercase,
    * split on runs of whitespace, drop empties) — THE single definition
    * every oracle interpolates, so Spark-side tokenization and its SQL
    * mirror cannot drift apart one file at a time. */
  def toksSql(column: String = "text"): String =
    s"""list_filter(string_split_regex(lower($column), '\\s+'), x -> x <> '')"""
}
