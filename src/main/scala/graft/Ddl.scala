package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL-bridge half of the reference (clsql-data-table.lisp): dialect name
  * munging, duplicate-column policy, and aggregation-driven DDL generation.
  *
  * The reference sizes columns by iterating every row on one thread
  * (clsql-data-table.lisp:59-80); here sizing is ONE distributed aggregate
  * (`max(length(c))`, `min(c)`, `max(c)` per column) — the same decision rule
  * at any scale.
  */
object Ddl {

  /** `clean-name-for-db` (clsql-data-table.lisp:30-32): collapse runs of
    * `_ ( ) , . + - ? |` and whitespace to a single space. */
  def cleanNameForDb(name: String): String =
    name.replaceAll("""[_(),.+\-?|\s]+""", " ")

  /** `english->mssql` (clsql-data-table.lisp:34-36): StudlyCase. */
  def englishToMssql(name: String): String =
    cleanNameForDb(name).trim.split(" ").filter(_.nonEmpty).map(_.capitalize).mkString

  /** `english->postgres` (clsql-data-table.lisp:38-41): lower + underscores. */
  def englishToPostgres(name: String): String =
    cleanNameForDb(name).toLowerCase.trim.split(" ").filter(_.nonEmpty).mkString("_")

  /** `next-highest-power-of-two` (clsql-data-table.lisp:56-57), in exact
    * integer math: 2^(1+floor(log2(max(l,1)))). */
  def nextHighestPowerOfTwo(l: Long): Long =
    java.lang.Long.highestOneBit(math.max(l, 1L)) << 1

  /** Duplicate-column policy (`check-for-duplicate-columns` +
    * `add-numeric-suffix` restarts, clsql-data-table.lisp:139-181):
    * case-insensitive; 2nd+ occurrence gets `name_N`. */
  sealed trait OnDupColumn
  case object DupError  extends OnDupColumn
  case object DupSuffix extends OnDupColumn

  def dedupColumnNames(names: Seq[String], policy: OnDupColumn = DupSuffix): Seq[String] = {
    val lowerNames = names.map(_.toLowerCase)
    val emitted = scala.collection.mutable.Set.empty[String]
    names.zipWithIndex.map { case (n, i) =>
      val k = n.toLowerCase
      if (!emitted.contains(k) && lowerNames.indexOf(k) == i) { emitted += k; n }
      else policy match {
        case DupError  => throw new IllegalArgumentException(s"duplicate column name: $n")
        case DupSuffix =>
          // probe suffixes until the candidate collides with neither an
          // emitted name nor a name still to come (e.g. Seq("a","a","a_1"))
          var c = 1
          var candidate = s"${n}_$c"
          while (emitted.contains(candidate.toLowerCase) || lowerNames.contains(candidate.toLowerCase)) {
            c += 1; candidate = s"${n}_$c"
          }
          emitted += candidate.toLowerCase
          candidate
      }
    }
  }

  /** Postgres type mapping (the reference delegates to clsql-helper's
    * db-type-from-lisp-type, clsql-data-table.lisp:119; this is our dialect). */
  def postgresType(t: DataType): String = t match {
    case LongType                          => "bigint"
    case IntegerType | ShortType | ByteType => "int"
    case DoubleType | FloatType            => "double precision"
    case BooleanType                       => "boolean"
    case DateType                          => "date"
    case TimestampType                     => "timestamp"
    case d: DecimalType                    => s"numeric(${d.precision},${d.scale})"
    case _                                 => "text"
  }

  /** Per-column mssql SQL types, aggregate-driven
    * (`mssql-db-types-for-data-table`, clsql-data-table.lisp:59-80):
    * string → varchar(nextPow2(max length)) below 8000 else text;
    * integer → int unless min/max exceed int32 then bigint;
    * others → fixed mapping (reference delegates to clsql-helper). */
  def mssqlTypes(df: DataFrame): Seq[(String, String)] = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      f.dataType match {
        case StringType => Seq(max(length(col(f.name))).as(s"${f.name}__len"))
        case LongType | IntegerType | ShortType | ByteType =>
          Seq(min(col(f.name)).cast(LongType).as(s"${f.name}__min"),
              max(col(f.name)).cast(LongType).as(s"${f.name}__max"))
        case _ => Nil
      }
    }
    val stats = if (aggs.isEmpty) null else df.agg(aggs.head, aggs.tail: _*).head()
    fields.toSeq.map { f =>
      f.dataType match {
        case StringType =>
          val maxLen = Option(stats.getAs[Any](s"${f.name}__len")).map(_.toString.toLong).getOrElse(0L)
          val len = nextHighestPowerOfTwo(maxLen)
          f.name -> (if (len < 8000) s"varchar ($len)" else "text")
        case LongType | IntegerType | ShortType | ByteType =>
          val lo = Option(stats.getAs[Any](s"${f.name}__min")).map(_.toString.toLong)
          val hi = Option(stats.getAs[Any](s"${f.name}__max")).map(_.toString.toLong)
          val wide = lo.exists(_ < Int.MinValue.toLong) || hi.exists(_ > Int.MaxValue.toLong)
          f.name -> (if (wide) "bigint" else "int")
        case DoubleType | FloatType => f.name -> "float"
        case BooleanType            => f.name -> "bit"
        case DateType               => f.name -> "date"
        case TimestampType          => f.name -> "datetime"
        case t                      => f.name -> postgresType(t)
      }
    }
  }

  /** `ensure-mssql-table-for-data-table` DDL string
    * (clsql-data-table.lisp:82-105): StudlyCase names, optional identity PK,
    * body delimiter ",\n  ". */
  def mssqlDdl(df: DataFrame, tableName: String, serialId: Option[String] = Some("Id"),
               excluded: Set[String] = Set.empty): String = {
    serialId.foreach { id =>
      require(!df.columns.exists(_.equalsIgnoreCase(id)),
        "serial id name matches an existing column in the data table. You must rename one.")
    }
    val names = dedupColumnNames(df.columns.toSeq.map(englishToMssql))
    val types = mssqlTypes(df).map(_._2)
    val body = (serialId.map(id => s"$id int IDENTITY (1,1) PRIMARY KEY").toSeq ++
      names.zip(types).collect { case (n, t) if !excluded.contains(n) => s"$n $t" })
      .mkString(",\n  ")
    s"CREATE TABLE dbo.$tableName ( $body );"
  }

  /** `ensure-postgres-table-for-data-table` DDL string
    * (clsql-data-table.lisp:108-128): snake_case names, optional serial PK. */
  def postgresDdl(df: DataFrame, tableName: String, schema: String = "public",
                  serialId: Option[String] = Some("id"), excluded: Set[String] = Set.empty): String = {
    serialId.foreach { id =>
      require(!df.columns.exists(_.equalsIgnoreCase(id)),
        "serial id name matches an existing column in the data table. You must rename one.")
    }
    val names = dedupColumnNames(df.columns.toSeq.map(englishToPostgres))
    val types = df.schema.fields.map(f => postgresType(f.dataType))
    val body = (serialId.map(id => "\"" + id + "\" serial PRIMARY KEY").toSeq ++
      names.zip(types).collect { case (n, t) if !excluded.contains(n) => s"$n $t" })
      .mkString(",\n  ")
    s"CREATE TABLE $schema.$tableName ( $body );"
  }
}
