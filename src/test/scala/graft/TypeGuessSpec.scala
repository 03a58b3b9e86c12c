package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** Type inference/coercion semantics (SURVEY.md §2.4) incl. the reference's
  * boundary tests (tests/data-table.lisp:199-206) and parsing edge cases. */
class TypeGuessSpec extends SparkSpec {

  private def guessOne(values: Seq[String]): DataType = {
    val dt = DataTable.fromStringRows(spark, Seq("c"), values.map(Seq(_)))
    TypeGuess.guessTypes(dt).getOrElse("c", StringType)
  }

  test("±2⁶³ boundary demotion — tests/data-table.lisp:199-206") {
    assert(guessOne(Seq("1", "9223372036854775807")) == LongType)          // 2⁶³−1
    assert(guessOne(Seq("1", "9223372036854775809")) == StringType)        // 2⁶³+1 → demote
    assert(guessOne(Seq("1", "-9223372036854775809")) == StringType)       // −2⁶³−1 → demote
    assert(guessOne(Seq("1.5", "2")) == DoubleType)
    assert(guessOne(Seq("foo", "1")) == StringType)
  }

  test("relaxed float parsing: $ , % and whitespace — data-table.lisp:74-90") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("$1,234.50"), org.apache.spark.sql.Row("26.2 "),
        org.apache.spark.sql.Row("15%"), org.apache.spark.sql.Row(" 7.5 "),
        org.apache.spark.sql.Row("abc"))),
      StructType(Seq(StructField("c", StringType))))
    val got = df.select(TypeGuess.relaxedDouble(col("c"))).collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(1234.5), Some(26.2), Some(15.0), Some(7.5), None))
  }

  test("trim-and-nullify: empty / nil / NBSP — data-table.lisp:40-56") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(""), org.apache.spark.sql.Row("  "),
        org.apache.spark.sql.Row("nil"), org.apache.spark.sql.Row("NIL"),
        org.apache.spark.sql.Row(" x "), org.apache.spark.sql.Row(" ok "))),
      StructType(Seq(StructField("c", StringType))))
    val got = df.select(TypeGuess.trimAndNullify(col("c"))).collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(None, None, None, None, Some("x"), Some("ok")))
  }

  test("per-column transactional fallback: unsampled defeat reverts the column — data-table.lisp:396-404") {
    // 1001 rows: the first 1000 (the sample) are clean longs, row 1001 is "oops"
    val rows = (1 to 1000).map(i => Seq(i.toString, i.toString)) :+ Seq("1001", "oops")
    val dt = DataTable.fromStringRows(spark, Seq("good", "bad"), rows)
    val out = TypeGuess.coerceStringsToTypes(dt)
    assert(out.schema("good").dataType == LongType)
    assert(out.schema("bad").dataType == StringType) // defeated → fell back wholesale
    assert(out.df.where(col("bad").isNull).count() == 0L)
  }

  test("simplifyType driver-side — data-table.lisp:269-280") {
    assert(TypeGuess.simplifyType(1L) == LongType)
    assert(TypeGuess.simplifyType(1.5) == DoubleType)
    assert(TypeGuess.simplifyType("foo") == StringType)
    assert(TypeGuess.simplifyType(BigInt("9223372036854775809")) == StringType)
    assert(TypeGuess.simplifyType(BigInt("9223372036854775807")) == LongType)
    assert(TypeGuess.simplifyType(null) == NullType)
  }

  test("decide lattice properties") {
    import TypeGuess.decide
    // all-timestamp wins; any miss falls through
    assert(decide(10, 0, 0, 0, 10) == TimestampType)
    assert(decide(10, 0, 0, 0, 9) != TimestampType)
    // pure ints: long iff castable, string on overflow
    assert(decide(10, 10, 10, 10, 0) == LongType)
    assert(decide(10, 10, 9, 10, 0) == StringType)
    // numeric mix → double (the {integer,double}⇒double unification)
    assert(decide(10, 5, 5, 10, 0) == DoubleType)
    // empty column → string
    assert(decide(0, 0, 0, 0, 0) == StringType)
  }

  test("native RelaxedParseDouble matches the composed regexp+try_cast form") {
    val inputs = Seq("$1,234.50", "26.2 ", "15%", " 7.5 ", "abc", "", "1e3", "-2.5E-2",
      "+42", "  9  ", "$ , %", "1.2.3", "--5", "Infinity", "NaN", "0x1p3")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(inputs.map(org.apache.spark.sql.Row(_))),
      StructType(Seq(StructField("c", StringType))))
    val composed = regexp_replace(col("c"), "[\\s\\u00A0$,%]", "").try_cast(DoubleType)
    val both = df.select(TypeGuess.relaxedDouble(col("c")).as("n"), composed.as("o")).collect()
    inputs.zip(both).foreach { case (in, r) =>
      val n = Option(r.get(0)); val o = Option(r.get(1))
      // the native form is INTENTIONALLY stricter on non-finite/hex Java-isms
      // (try_cast accepts 'NaN'/'Infinity'/'0x1p3'; the reference's
      // relaxed-parse-float does not) — everything else must agree
      if (!Seq("Infinity", "NaN", "0x1p3").contains(in))
        assert(n == o, s"input '$in': native=$n composed=$o")
    }
  }

  test("date-only strings infer as timestamp; bare numbers still guarded — ADVICE r1") {
    assert(guessOne(Seq("2020-01-01", "2021-12-31")) == TimestampType)
    assert(guessOne(Seq("2020-01-01 10:00:00", "2021-12-31 23:59:59")) == TimestampType)
    assert(guessOne(Seq("2020", "2021")) == LongType)       // bare year ≠ date
    assert(guessOne(Seq("1,234", "56")) == DoubleType)       // comma-float ≠ date
  }

  test("SQL relaxed_double matches native semantics: rejects NaN/Infinity/hex — ADVICE r1") {
    Fns.registerSqlFunctions(spark)
    val r = spark.sql(
      """SELECT relaxed_double('NaN') a, relaxed_double('Infinity') b,
        |       relaxed_double('0x1p3') c, relaxed_double('1.5f') d,
        |       relaxed_double(' $2,500.75 ') e, relaxed_double('1.5e3') f,
        |       relaxed_double('-.5') g""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    assert(r.getDouble(4) == 2500.75 && r.getDouble(5) == 1500.0 && r.getDouble(6) == -0.5)
  }

  test("relaxed_double_native registers as a SQL function") {
    graft.plans.GraftExtensions.register(spark)
    val v = spark.sql("SELECT relaxed_double_native(' $2,500.75 ') AS v").head().getDouble(0)
    assert(v == 2500.75)
  }

  test("property: relaxedDouble agrees with parseDouble on clean doubles") {
    val doubles = Gen.listOfN(64, Gen.chooseNum(-1e12, 1e12)).sample.get
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(doubles.map(d => org.apache.spark.sql.Row(d.toString))),
      StructType(Seq(StructField("c", StringType))))
    val got = df.select(TypeGuess.relaxedDouble(col("c"))).collect().map(_.getDouble(0))
    assert(got.toSeq == doubles.map(s => java.lang.Double.parseDouble(s.toString)))
  }
}
