package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query job/shuffle profiler — the evidence standard for optimizations
  * `.explain` cannot show (round-14 verdict #9: driver-side iteration and
  * session cache sharing are invisible in a plan dump; the honest artifact
  * is a job-count / shuffle-bytes / task-time comparison).
  *
  * Usage: `tools/run.sh graft.JobProfile <dataDir> <query> [<query> ...]`
  * Runs each named `SparkEntry.queries` entry with the Bench action
  * (`fn(spark, dir).count()`) under a [[SparkListener]] and prints ONE JSON
  * line per query: wall seconds, Spark job count, stage count, task count,
  * shuffle read/write bytes, input bytes, executor task time — plus a
  * per-job breakdown (duration, stages, shuffle bytes) so multi-action
  * cards (probe jobs, DiskCache builds, iteration rounds) attribute their
  * cost job by job. Queries run in the given order in ONE session, like
  * Bench — session-shared caches are built by the first consumer, so order
  * the family the way the alphabetical bench would.
  *
  * Config mirrors Bench exactly (master local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus, UTC, warehouse, UI off) so plans match benched plans.
  */
object JobProfile {
  private class Acc extends SparkListener {
    case class Job(id: Int, var desc: String, var started: Long,
                   var ended: Long, var stages: Int, var tasks: Int,
                   var shufRead: Long, var shufWrite: Long, var input: Long,
                   var taskTimeMs: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    // a stage that fails and is resubmitted completes once PER ATTEMPT —
    // count each stageId's metrics once (first completion) so retries
    // cannot double the evidence (review-caught)
    private val seenStages =
      java.util.Collections.newSetFromMap(
        new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Boolean]())
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val j = Job(e.jobId,
        Option(e.properties).map(_.getProperty("spark.job.description"))
          .filter(_ != null).getOrElse(""),
        e.time, 0L, 0, 0, 0L, 0L, 0L, 0L)
      jobs.put(e.jobId, j)
      e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val j = jobs.get(e.jobId); if (j != null) j.ended = e.time
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val jid: Integer = stageToJob.get(si.stageId)
      val j = if (jid == null) null else jobs.get(jid.intValue())
      if (j != null && seenStages.add(si.stageId)) {
        val m = si.taskMetrics
        j.synchronized {
          // stages counts EXECUTED stages (skipped/reused ones never
          // complete, and the planned stageIds list includes them)
          j.stages += 1
          j.tasks += si.numTasks
          j.shufRead += m.shuffleReadMetrics.totalBytesRead
          j.shufWrite += m.shuffleWriteMetrics.bytesWritten
          j.input += m.inputMetrics.bytesRead
          j.taskTimeMs += m.executorRunTime
        }
      }
    }
    def reset(): Unit = { jobs.clear(); stageToJob.clear(); seenStages.clear() }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <dataDir> <query> [<query>...]")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"not declared: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bench's untimed warmup, statement-for-statement (parity matters: the
    // scaladoc promises profiled plans match benched plans — keep this block
    // AND the builder config in lockstep with Bench.main when either changes)
    locally {
      import spark.implicits._
      val w = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      w.join(w.toDF("k", "v2"), "k").groupBy($"v").count().count()
      w.write.mode("overwrite").parquet("target/tmp_bench_warmup")
      spark.read.parquet("target/tmp_bench_warmup").count()
      spark.sql("SELECT count(*) FROM (SELECT 1 AS x) t WHERE x > 0").count()
    }
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    def fmtB(b: Long): String = f"${b / 1048576.0}%.2f"
    for (name <- names) {
      acc.reset()
      spark.sparkContext.setJobDescription(s"profile:$name")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async: drain before reading the accumulators
      org.apache.spark.graftbridge.ListenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val js = acc.jobs.values().asScala.toSeq.sortBy(_.id)
      val perJob = js.map { j =>
        val desc = if (j.desc.isEmpty) ""
          else s""","desc":"${j.desc.replace("\"", "'")}""""
        s"""{"id":${j.id},"ms":${j.ended - j.started},"stages":${j.stages},""" +
          s""""tasks":${j.tasks},"shuf_read_mb":${fmtB(j.shufRead)},""" +
          s""""shuf_write_mb":${fmtB(j.shufWrite)},"input_mb":${fmtB(j.input)},""" +
          s""""task_time_ms":${j.taskTimeMs}$desc}"""
      }.mkString("[", ",", "]")
      println(
        s"""{"query":"$name","sec":${f"$sec%.3f"},"jobs":${js.size},""" +
          s""""stages":${js.map(_.stages).sum},"tasks":${js.map(_.tasks).sum},""" +
          s""""shuf_read_mb":${fmtB(js.map(_.shufRead).sum)},""" +
          s""""shuf_write_mb":${fmtB(js.map(_.shufWrite).sum)},""" +
          s""""input_mb":${fmtB(js.map(_.input).sum)},""" +
          s""""task_time_ms":${js.map(_.taskTimeMs).sum},"per_job":$perJob}""")
    }
    graft.operators.CacheRegistry.sweep()
    spark.stop()
  }
}
