package graft

import graft.sources.MemTableRegistry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSv2 custom source: read path, parallel partitions, and column pruning
  * reaching the scan. */
class MemTableSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("reads a registered in-memory table through the DSv2 contract") {
    MemTableRegistry.register("people", schema,
      (1 to 100).map(i => Seq(i.toLong, s"p$i", i * 1.5)))
    val df = spark.read.format("graft.sources.MemTableSource")
      .option("name", "people").load()
    assert(df.schema == schema)
    assert(df.count() == 100L)
    assert(df.rdd.getNumPartitions > 1, "parallel partitions")
    assert(df.where(col("id") <= 10).agg(sum("score")).head().getDouble(0) == (1 to 10).map(_ * 1.5).sum)
  }

  test("column pruning reaches the source (pruned columns never produced)") {
    MemTableRegistry.register("people2", schema,
      (1 to 10).map(i => Seq(i.toLong, s"p$i", i * 1.5)))
    val df = spark.read.format("graft.sources.MemTableSource")
      .option("name", "people2").load()
      .select("name")
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanDesc.contains("cols=name"), s"scan should be pruned to 'name':\n$scanDesc")
    assert(df.collect().map(_.getString(0)).toSet == (1 to 10).map(i => s"p$i").toSet)
  }

  test("filter pushdown: rows are dropped AT the source, not post-scan") {
    MemTableRegistry.register("people4", schema,
      (1 to 1000).map(i => Seq(i.toLong, s"p$i", i * 1.5)))
    val df = spark.read.format("graft.sources.MemTableSource")
      .option("name", "people4").load()
      .where(col("id") > 900L)
    val before = MemTableRegistry.emitted.get()
    val n = df.count()
    val produced = MemTableRegistry.emitted.get() - before
    assert(n == 100L)
    assert(produced == 100L, s"source emitted $produced rows — filter not pushed")
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanDesc.contains("pushed=") && scanDesc.contains("GreaterThan(id,900)"), scanDesc)
  }

  test("filters on non-comparable column types are NOT pushed and still evaluate correctly") {
    val s2 = StructType(Seq(StructField("id", LongType), StructField("flag", BooleanType),
      StructField("f", FloatType)))
    MemTableRegistry.register("typed", s2,
      Seq(Seq(1L, true, 1.5f), Seq(2L, false, 2.5f), Seq(3L, true, 3.5f)))
    val df = spark.read.format("graft.sources.MemTableSource")
      .option("name", "typed").load()
    // boolean + float predicates must fall back to Spark's post-scan Filter
    assert(df.where(col("flag") === true).count() == 2L)
    assert(df.where(col("f") > 2.0f).count() == 2L)
    val scanDesc = df.where(col("f") > 2.0f)
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanDesc.contains("GreaterThan(f"), s"float filter must not be pushed:\n$scanDesc")
  }

  test("write path: append and overwrite commit atomically through the DSv2 sink") {
    MemTableRegistry.register("sink", schema, Seq(Seq(1L, "a", 1.0)))
    import spark.implicits._
    val add = Seq((2L, "b", 2.0), (3L, "c", 3.0)).toDF("id", "name", "score")
    add.write.format("graft.sources.MemTableSource")
      .option("name", "sink").mode("append").save()
    val afterAppend = spark.read.format("graft.sources.MemTableSource")
      .option("name", "sink").load()
    assert(afterAppend.count() == 3L)
    Seq((9L, "z", 9.0)).toDF("id", "name", "score")
      .write.format("graft.sources.MemTableSource")
      .option("name", "sink").mode("overwrite").save()
    val afterOverwrite = spark.read.format("graft.sources.MemTableSource")
      .option("name", "sink").load().collect()
    assert(afterOverwrite.length == 1 && afterOverwrite.head.getLong(0) == 9L)
  }

  test("streaming sink: micro-batches commit per-epoch, exactly-once on re-delivery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    MemTableRegistry.register("stream_sink", StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))), Seq.empty)
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("k", "v").writeStream
      .format("graft.sources.MemTableSource")
      .option("name", "stream_sink")
      .option("checkpointLocation", "target/tmp_memsink_ckpt_" + System.nanoTime())
      .outputMode("append")
      .start()
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      ms.addData((3L, "c"))
      q.processAllAvailable()
      val rows = MemTableRegistry.rowsOf("stream_sink").map(_.head.asInstanceOf[Long]).sorted
      assert(rows == Seq(1L, 2L, 3L))
      assert(MemTableRegistry.epochsCommitted("stream_sink") >= 2)
      // exactly-once: re-delivering an already-committed epoch is a no-op
      graft.sources.MemTableRegistry.commitEpoch("stream_sink",
        StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
        epochId = 0L, rows = Seq(Seq(99L, "dup")))
      assert(!MemTableRegistry.rowsOf("stream_sink").exists(_.head == 99L),
        "re-delivered epoch 0 must not double-append")
    } finally q.stop()
  }

  test("streaming source: micro-batches read ONLY the appended slice (offset log)") {
    MemTableRegistry.register("stream_src", StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))),
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    val stream = spark.readStream.format("graft.sources.MemTableSource")
      .option("name", "stream_src").load()
    val q = stream.writeStream.format("memory").queryName("memsrc_out")
      .option("checkpointLocation", "target/tmp_memsrc_ckpt_" + System.nanoTime())
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("memsrc_out").count() == 2L)
      // append to the log; the next micro-batch must read ONLY the new rows
      MemTableRegistry.commitRows("stream_src", StructType(Seq(
        StructField("k", LongType), StructField("v", StringType))),
        Seq(Seq(3L, "c")), overwrite = false)
      q.processAllAvailable()
      val got = spark.table("memsrc_out").select("k").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(1L, 2L, 3L), s"incremental read broke: ${got.toSeq}")
    } finally q.stop()
  }

  test("rowsOf errors clearly on unknown name; commit treats missing as empty — ADVICE r1") {
    intercept[IllegalArgumentException] { MemTableRegistry.rowsOf("never_registered") }
    MemTableRegistry.commitRows("fresh_sink", schema, Seq(Seq(5L, "e", 5.0)), overwrite = false)
    assert(MemTableRegistry.rowsOf("fresh_sink") == Seq(Seq(5L, "e", 5.0)))
  }

  test("facade round-trip: DataTable over the custom source") {
    MemTableRegistry.register("people3", schema, Seq(Seq(1L, "a", 2.0), Seq(2L, null, 4.0)))
    val dt = DataTable(spark.read.format("graft.sources.MemTableSource")
      .option("name", "people3").load())
    assert(dt.numberOfRows == 2L && dt.columnIndex("NAME") == 1)
    assert(dt.fillMissing("?").df.where(col("name") === "?").count() == 1L)
  }
}
