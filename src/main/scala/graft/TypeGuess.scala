package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema inference + coercion for all-string tables — the reference's most
  * distinctive capability (`guess-types-for-data-table` data-table.lisp:331-343,
  * `coerce-data-table-of-strings-to-types` data-table.lisp:387-407).
  *
  * Reference semantics preserved:
  *   - per-value probe order date → integer → float → string
  *     (data-table.lisp:320-326);
  *   - unification lattice: any string ⇒ string; {integer} ⇒ integer; any
  *     float/ratio mix ⇒ double; otherwise string (data-table.lisp:336-343);
  *   - the ±2⁶³ integer bound (`+largest-number+`, data-table.lisp:266-267) is
  *     exactly LongType's domain — beyond-long numerics demote to string;
  *   - floats parse leniently after stripping whitespace/$ / , / %
  *     (`relaxed-parse-float`, data-table.lisp:74-90);
  *   - empty / "nil" strings are NULL (`trim-and-nullify`, data-table.lisp:48-56);
  *   - guessing samples ≤ [[sampleSize]] rows (data-table.lisp:292-293);
  *   - per-column transactional fallback to string when coercion is defeated by
  *     an unsampled row (the `assume-column-is-string` restart,
  *     data-table.lisp:396-404) — re-expressed as one validation aggregate and
  *     a re-plan, not per-cell control flow.
  *
  * Execution shape at scale: ONE aggregate job over a sample decides the
  * schema, ONE validation aggregate detects defeats, one final cast projection
  * — all codegen-friendly built-ins (`try_cast`, `regexp_replace`), no UDFs.
  */
object TypeGuess {

  /** ≤ this many rows feed the guess (reference default 1000, data-table.lisp:292). */
  val sampleSize = 1000

  /** Whitespace trimbag incl. NBSP (reference: data-table.lisp:40-43). */
  private val trimRe = "^[\\s\\u00A0]+|[\\s\\u00A0]+$"

  def trimWhitespace(c: Column): Column = regexp_replace(c, trimRe, "")

  /** `trim-and-nullify` (data-table.lisp:48-56): trim; "" or "nil" (any case)
    * → NULL. Native codegen'd single-pass expression
    * ([[graft.plans.TrimNullify]]) — this sits under every inference probe. */
  def trimAndNullify(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.TrimNullify(ColumnBridge.expression(c)))
  }

  /** `relaxed-parse-float` (data-table.lisp:74-90): strip whitespace, $, comma,
    * % then parse; null (not error) on failure, like the reference's nil
    * return. Backed by the native codegen'd [[graft.plans.RelaxedParseDouble]]
    * (single char scan) instead of regexp_replace + try_cast (two passes). */
  def relaxedDouble(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.RelaxedParseDouble(ColumnBridge.expression(c)))
  }

  /** Long probe: ANSI try_cast — "26.0" fails (stays non-integer), matching
    * `parse-integer` strictness (data-table.lisp:323). */
  def tryLong(c: Column): Column = trimWhitespace(c).try_cast(LongType)

  /** Timestamp probe, guarded so numeric-looking strings never classify as
    * dates (the reference's date parser also rejects bare numbers). Date-only
    * strings ('2020-01-01') are digits+hyphens too, so they are explicitly
    * exempted from the numeric guard — the reference's clsql date probe
    * parses them (clsql-data-table.lisp:49-54), and without the exemption a
    * pure-date column would demote to string while 'yyyy-MM-dd HH:mm:ss'
    * inferred as timestamp. */
  def tryTimestamp(c: Column): Column = {
    val t = trimWhitespace(c)
    // the date exemption requires a 4-DIGIT year: '\d{1,4}' would admit
    // dash-triples like '1-2-3' (version/lot codes) as timestamps
    val numericLook = t.rlike("^[0-9eE+\\-.,$%]*$") && !t.rlike("^\\d{4}-\\d{1,2}-\\d{1,2}$")
    when(numericLook, lit(null).cast(TimestampType)).otherwise(try_to_timestamp(t))
  }

  /** Integer-looking pattern — used for the ±2⁶³ demotion: a column of pure
    * integer strings where try_cast-to-long fails (overflow) is STRING, not
    * double (reference `simplify-types`, data-table.lisp:269-280; boundary
    * tests tests/data-table.lisp:199-206). */
  private val intLookRe = "^[+-]?[0-9]+$"
  def looksInteger(c: Column): Column = c.rlike(intLookRe)

  /** One column's inferred Spark type from probe counts (the lattice,
    * data-table.lisp:336-343, with the ±2⁶³ overflow demotion). */
  private[graft] def decide(n: Long, nIntLook: Long, nLong: Long, nDouble: Long, nTs: Long): DataType =
    if (n == 0L) StringType
    else if (nTs == n) TimestampType
    else if (nIntLook == n) { if (nLong == n) LongType else StringType } // overflow ⇒ demote
    else if (nDouble == n) DoubleType
    else StringType

  /** Guess every string column's type in ONE aggregate over a ≤sampleSize sample.
    * Non-string columns keep their explicit type (`ensure-column-data-types`
    * keeps explicit non-string types, data-table.lisp:371-385). */
  def guessTypes(dt: DataTable, sample: Int = sampleSize): Map[String, DataType] = {
    val df = dt.df
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (stringCols.isEmpty) return Map.empty
    val sampled = df.select(stringCols.map(col): _*).limit(sample)
    val aggs = stringCols.flatMap { c =>
      val v = trimAndNullify(col(c))
      Seq(
        count(v).as(s"${c}__n"),
        count(when(looksInteger(v), 1)).as(s"${c}__intlook"),
        count(tryLong(v)).as(s"${c}__long"),
        count(relaxedDouble(v)).as(s"${c}__dbl"),
        count(tryTimestamp(v)).as(s"${c}__ts"))
    }
    val row = sampled.agg(aggs.head, aggs.tail: _*).head()
    stringCols.zipWithIndex.map { case (c, i) =>
      c -> decide(row.getLong(5 * i), row.getLong(5 * i + 1), row.getLong(5 * i + 2),
        row.getLong(5 * i + 3), row.getLong(5 * i + 4))
    }.toMap
  }

  /** The coercing expression for one column+target (`data-table-coerce`,
    * data-table.lisp:357-369). */
  def coerceExpr(c: Column, t: DataType): Column = {
    val v = trimAndNullify(c)
    t match {
      case DoubleType    => relaxedDouble(v)
      case LongType      => tryLong(v)
      // the GUARDED probe, not bare try_to_timestamp: Spark parses '2020' as
      // a timestamp, which would let a numeric string in an unsampled row
      // slip through the defeat-validation instead of triggering the
      // fall-back-to-string path (reference rejects bare numbers as dates)
      case TimestampType => tryTimestamp(v)
      case _             => v
    }
  }

  /** `coerce-data-table-of-strings-to-types` (data-table.lisp:387-407): guess on
    * a sample, cast everything, then ONE validation aggregate; any column where
    * a non-null input coerced to null (the `bad-type-guess` condition,
    * data-table.lisp:345-355) falls back to string wholesale — the
    * `assume-column-is-string` restart as a re-plan. */
  def coerceStringsToTypes(dt: DataTable, sample: Int = sampleSize): DataTable = {
    val guessed = guessTypes(dt, sample).filter(_._2 != StringType)
    if (guessed.isEmpty) return dt
    val df = dt.df
    // validation: did any value defeat its guess?
    val checks = guessed.toSeq.map { case (c, t) =>
      val in = trimAndNullify(col(c))
      sum(when(in.isNotNull && coerceExpr(col(c), t).isNull, 1L).otherwise(0L)).as(c)
    }
    val defeats = df.agg(checks.head, checks.tail: _*).head()
    val defeated = guessed.keys.toSeq.zipWithIndex.collect {
      case (c, _) if defeats.getAs[Long](c) > 0L => c
    }.toSet
    val out = df.schema.fields.map { f =>
      guessed.get(f.name) match {
        case Some(t) if !defeated(f.name) => coerceExpr(col(f.name), t).as(f.name)
        case Some(_)                      => trimAndNullify(col(f.name)).as(f.name) // fallback-to-string
        case None                         => col(f.name)
      }
    }
    DataTable(df.select(out: _*))
  }

  /** `simplify-types` for a single driver-side value (data-table.lisp:269-280)
    * incl. the ±2⁶³ demotion tested at tests/data-table.lisp:199-206. */
  def simplifyType(v: Any): DataType = v match {
    case null                => NullType
    case _: Long | _: Int    => LongType
    case i: BigInt           => if (i.isValidLong) LongType else StringType
    case _: Double | _: Float => DoubleType
    case _                   => StringType
  }
}
