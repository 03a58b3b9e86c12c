package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DDL dialect + output-formatting units (clsql-data-table.lisp semantics). */
class DdlFnsSpec extends SparkSpec {

  test("name munging — clsql-data-table.lisp:30-41") {
    assert(Ddl.englishToMssql("number of hours") == "NumberOfHours")
    assert(Ddl.englishToPostgres("number of hours") == "number_of_hours")
    assert(Ddl.englishToMssql("first_name (preferred)") == "FirstNamePreferred")
    assert(Ddl.englishToPostgres("Weird||name..here") == "weird_name_here")
  }

  test("next-highest-power-of-two — clsql-data-table.lisp:56-57") {
    assert(Ddl.nextHighestPowerOfTwo(0) == 2)  // max(l,1) guard
    assert(Ddl.nextHighestPowerOfTwo(1) == 2)
    assert(Ddl.nextHighestPowerOfTwo(5) == 8)
    assert(Ddl.nextHighestPowerOfTwo(8) == 16) // exact powers still double (reference 1+floor)
    assert(Ddl.nextHighestPowerOfTwo(4000) == 4096)
  }

  test("duplicate-column suffix policy — clsql-data-table.lisp:139-181") {
    assert(Ddl.dedupColumnNames(Seq("a", "A", "b", "a")) == Seq("a", "A_1", "b", "a_2"))
    intercept[IllegalArgumentException](
      Ddl.dedupColumnNames(Seq("a", "A"), Ddl.DupError))
    // a generated suffix must not collide with a name still to come
    val out = Ddl.dedupColumnNames(Seq("a", "a", "a_1"))
    assert(out.map(_.toLowerCase).distinct.size == 3, out.toString)
  }

  test("mssql sizing: varchar pow2 + int vs bigint — clsql-data-table.lisp:59-80") {
    import spark.implicits._
    val df = Seq(
      ("hello", 5L, 1L),
      ("a much longer string here", 10L, 5000000000L)).toDF("s", "small", "big")
    val types = Ddl.mssqlTypes(df).toMap
    assert(types("s") == "varchar (32)") // max len 25 → 32
    assert(types("small") == "int")
    assert(types("big") == "bigint")
  }

  test("serial-id collision errors — clsql-data-table.lisp:84-87") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException](Ddl.postgresDdl(df, "t"))
    assert(Ddl.postgresDdl(df, "t", serialId = None).contains("CREATE TABLE public.t"))
  }

  test("output formatting: nil→'', %.2f doubles, digits, list join — data-table.lisp:437-469") {
    import spark.implicits._
    val df = Seq((Option.empty[String], 26.2, 7L, Seq("a", "b"))).toDF("s", "d", "i", "arr")
    val out = Fns.formatTable(DataTable(df)).df.collect().head
    assert(out.getString(0) == "")
    assert(out.getString(1) == "26.20")
    assert(out.getString(2) == "7")
    assert(out.getString(3) == "a, b")
    assert(Fns.formatTable(DataTable(df)).schema.fields.forall(_.dataType == StringType))
  }
}
