package graft

import graft.functions.TextFns
import graft.plans.TextStats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TextStats (the fused native counter scan) must agree bit-for-bit with the
  * composed regex built-ins it replaces — on adversarial strings and on the
  * real corpus — and the derived quality/langId columns must be unchanged.
  */
class TextStatsSpec extends SparkSpec {

  import spark.implicits._

  /** The regex reference implementations (what TextFns used before). */
  private def regexCounts = Seq(
    ("n_chars", length(col("t")).cast(LongType)),
    ("n_tokens", regexp_count(col("t"), lit("\\S+")).cast(LongType)),
    ("n_punct", regexp_count(col("t"), lit("[^a-zA-Z0-9\\s]")).cast(LongType)),
    ("n_stop", regexp_count(lower(col("t")), lit(TextFns.StopPattern)).cast(LongType))) ++
    TextFns.LangMarkers.map { case (l, p) =>
      (s"m_$l", regexp_count(lower(col("t")), lit(p)).cast(LongType))
    }

  private val adversarial = Seq(
    "",
    " ",
    "the",
    "The THE the!",
    "a a a a",                       // shortest marker, repeated
    "theory andes to5 _the the_ the", // partial-run traps: only the last matches
    "und und_ die der das nicht ein",
    "le la les et est une el los las es y una",
    "tabs\tand\nnewlinesvt\ffeed\rcr",
    "nbsp is not a separator",  // NBSP: not \s, is punct
    "punct!!! ... --- ___ mix3d t0kens",
    "émigré café naïve",             // non-ASCII letters: punct, token chars
    "🎉 emoji 🎉🎉 test",            // supplementary code points
    "ends with space ",
    "  leading and trailing  ",
    "is the",                   // markers separated by NBSP (word-boundary)
    "a" * 5000 + " the " + "b" * 5000,
    "ThE aNd OF To In IS A for ON wiTH as BY at IT")

  test("fused scan agrees with every regex counter on adversarial strings") {
    val df = adversarial.toDF("t")
      .withColumn("m", TextFns.textStats(col("t")))
    val rows = df.select(
      col("t") +:
      TextStats.FieldNames.map(f => col("m").getField(f).as(s"got_$f")) ++:
      regexCounts.map { case (n, c) => c.as(s"exp_$n") }: _*).collect()
    rows.foreach { r =>
      TextStats.FieldNames.zipWithIndex.foreach { case (f, i) =>
        val got = r.getLong(1 + i)
        val exp = r.getLong(1 + TextStats.FieldNames.size + i)
        assert(got == exp,
          s"$f mismatch on '${r.getString(0).take(40)}': got $got, regex $exp")
      }
    }
  }

  test("fused scan agrees with the regex counters on the sf0.001 corpus") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text").as("t"))
    val cmp = docs.withColumn("m", TextFns.textStats(col("t")))
    val mismatches = TextStats.FieldNames.zip(regexCounts).map {
      case (f, (_, ref)) =>
        cmp.where(col("m").getField(f) =!= ref).count()
    }
    assert(mismatches.forall(_ == 0L), s"corpus mismatches per field: $mismatches")
  }

  test("null text: null stats struct, 'und' lang (matching the regex form's null fold)") {
    val df = Seq[(Integer, String)]((1, null), (2, "the quick brown fox"))
      .toDF("id", "t")
    val got = df.select(col("id"), TextFns.textStats(col("t")).as("m"),
      TextFns.langId(col("t")).as("l")).orderBy(col("id")).collect()
    assert(got(0).isNullAt(1))
    // regexp_count(NULL) folds through the when-chain to the "und" default —
    // the fused form must not change that
    assert(got(0).getString(2) == "und")
    assert(!got(1).isNullAt(1) && got(1).getString(2) == "en")
  }

  test("TextStats stays inside whole-stage codegen") {
    // parquet-backed input: a local relation would be constant-folded away
    val exec = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(TextFns.textStats(col("text")).getField("n_stop").as("s"))
      .queryExecution.executedPlan
    val wscgProjects = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.collect { case p: org.apache.spark.sql.execution.ProjectExec => p }.nonEmpty => w
    }
    assert(wscgProjects.nonEmpty, exec.toString)
  }

  test("quality gate equals the separate score/lang filters on the corpus") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val viaGate = docs.where(TextFns.qualityLangGate(col("text"), lit(0.7), lit("en")))
      .select(col("doc_id"))
    val viaCols = docs.select(col("doc_id"),
        TextFns.qualityScore(col("text")).as("q"), TextFns.langId(col("text")).as("l"))
      .where(col("q") >= 0.7 && col("l") === "en").select(col("doc_id"))
    assert(viaGate.exceptAll(viaCols).isEmpty && viaCols.exceptAll(viaGate).isEmpty)
  }
}
