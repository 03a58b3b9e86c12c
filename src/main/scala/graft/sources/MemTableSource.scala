package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DataSource V2 source serving named in-memory tables — the engine's
  * custom-source seam (SURVEY.md §2.8 "file scans/sinks"), demonstrating the
  * full connector contract: TableProvider → ScanBuilder with COLUMN PRUNING
  * (`SupportsPushDownRequiredColumns`) → partitioned Batch → per-partition
  * readers. The same skeleton is what a real external-system connector
  * (the reference's clsql bridge, clsql-data-table.lisp:13-19) fills in
  * with remote I/O; pruned columns never leave the source.
  *
  * Usage:
  * {{{
  *   MemTableRegistry.register("fixture", schema, rows)
  *   spark.read.format("graft.sources.MemTableSource")
  *     .option("name", "fixture").load()
  * }}}
  */
class MemTableSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemTableRegistry.schemaOf(options.get("name"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MemTable(properties.get("name"))
}

object MemTableRegistry {
  private val tables = new java.util.concurrent.ConcurrentHashMap[String, (StructType, Seq[Seq[Any]])]()

  def register(name: String, schema: StructType, rows: Seq[Seq[Any]]): Unit =
    tables.put(name, (schema, rows))

  def schemaOf(name: String): StructType =
    Option(tables.get(name)).map(_._1)
      .getOrElse(throw new IllegalArgumentException(s"memtable '$name' not registered"))
  def rowsOf(name: String): Seq[Seq[Any]] =
    Option(tables.get(name)).map(_._2)
      .getOrElse(throw new IllegalArgumentException(s"memtable '$name' not registered"))

  /** Atomic job-commit merge: read-existing + register in one `compute` so
    * concurrent writers can't lose each other's rows; an append to a table
    * that doesn't exist yet starts from empty rather than erroring. */
  def commitRows(name: String, schema: StructType, rows: Seq[Seq[Any]], overwrite: Boolean): Unit =
    tables.compute(name, (_, prev) => {
      val existing = if (overwrite || prev == null) Seq.empty[Seq[Any]] else prev._2
      (schema, existing ++ rows)
    })

  /** Rows surviving source-side filtering (test observability). */
  val emitted = new java.util.concurrent.atomic.AtomicLong(0L)

  // ---- streaming sink bookkeeping ------------------------------------------

  private val committedEpochs =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Set[java.lang.Long]]()

  /** Idempotent per-epoch commit — the exactly-once contract of a streaming
    * sink: the engine may re-deliver an epoch after a failure, and a
    * re-delivered epoch must be a no-op, not a duplicate append. */
  def commitEpoch(name: String, schema: StructType, epochId: Long, rows: Seq[Seq[Any]]): Unit = {
    val seen = committedEpochs.computeIfAbsent(name,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]())
    if (seen.add(epochId)) commitRows(name, schema, rows, overwrite = false)
  }

  def epochsCommitted(name: String): Int =
    Option(committedEpochs.get(name)).map(_.size).getOrElse(0)
}

private class MemTable(name: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.write._
  override def name(): String = s"memtable:$name"
  override def schema(): StructType = MemTableRegistry.schemaOf(name)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemTableScanBuilder(name, schema())

  /** Write path: executors buffer rows per task, the driver commits them
    * atomically into the registry — the standard two-phase DSv2 sink
    * contract (task commit → job commit), here with truncate support. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
            new MemTableWriterFactory(info.schema())
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val rows = messages.toSeq.flatMap(_.asInstanceOf[MemTableCommit].rows)
            MemTableRegistry.commitRows(name, info.schema(), rows, overwrite)
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }

        /** Streaming sink: same two-phase contract per micro-batch, plus
          * EPOCH IDEMPOTENCE — the engine re-delivers epochs after failures
          * and a re-committed epoch must not double-append. */
        override def toStreaming: streaming.StreamingWrite = new streaming.StreamingWrite {
          override def createStreamingWriterFactory(
              pi: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
            new MemTableStreamingWriterFactory(info.schema())
          override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
            val rows = messages.toSeq.flatMap(_.asInstanceOf[MemTableCommit].rows)
            MemTableRegistry.commitEpoch(name, info.schema(), epochId, rows)
          }
          override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

private class MemTableStreamingWriterFactory(schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  import org.apache.spark.sql.connector.write.DataWriter
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new MemTableWriterFactory(schema).createWriter(partitionId, taskId)
}

private case class MemTableCommit(rows: Seq[Seq[Any]])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private class MemTableWriterFactory(schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      private val conv = CatalystTypeConverters.createToScalaConverter(schema)
      override def write(record: InternalRow): Unit =
        buf += conv(record).asInstanceOf[org.apache.spark.sql.Row].toSeq
      override def commit(): WriterCommitMessage = MemTableCommit(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

private class MemTableScanBuilder(name: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept only comparison filters over column types the evaluator can
    * compare (long/int/double/string); everything else stays in Spark's
    * post-scan Filter — accepting a filter we'd mis-evaluate would silently
    * drop matching rows. */
  private def comparable(attr: String): Boolean =
    full.fields.find(_.name == attr).map(_.dataType).exists {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.StringType => true
      case _ => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _)            => comparable(a)
      case GreaterThan(a, _)        => comparable(a)
      case GreaterThanOrEqual(a, _) => comparable(a)
      case LessThan(a, _)           => comparable(a)
      case LessThanOrEqual(a, _)    => comparable(a)
      case IsNotNull(_)             => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def matches(row: Seq[Any], f: Filter): Boolean = {
    def v(attr: String): Any = row(full.fieldIndex(attr))
    def cmp(attr: String, value: Any): Option[Int] = (v(attr), value) match {
      case (null, _) => None
      case (a: Long, b: Number)   => Some(java.lang.Long.compare(a, b.longValue()))
      case (a: Int, b: Number)    => Some(java.lang.Long.compare(a.toLong, b.longValue()))
      case (a: Double, b: Number) => Some(java.lang.Double.compare(a, b.doubleValue()))
      case (a: String, b: String) => Some(a.compareTo(b))
      case _ => None
    }
    f match {
      case EqualTo(a, b)            => cmp(a, b).contains(0)
      case GreaterThan(a, b)        => cmp(a, b).exists(_ > 0)
      case GreaterThanOrEqual(a, b) => cmp(a, b).exists(_ >= 0)
      case LessThan(a, b)           => cmp(a, b).exists(_ < 0)
      case LessThanOrEqual(a, b)    => cmp(a, b).exists(_ <= 0)
      case IsNotNull(a)             => v(a) != null
      case _                        => true
    }
  }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"MemTableScan($name, cols=${required.fieldNames.mkString(",")}, pushed=[${pushed.mkString(",")}])"

    override def planInputPartitions(): Array[InputPartition] = {
      val rows = MemTableRegistry.rowsOf(name).filter(r => pushed.forall(matches(r, _)))
      val idxs = required.fieldNames.map(full.fieldIndex)
      val pruned = rows.map(r => idxs.map(r(_)).toSeq)
      // split into up to 4 partitions — the parallel shape, even in memory
      val nPart = math.min(4, math.max(1, pruned.size))
      pruned.grouped(math.max(1, (pruned.size + nPart - 1) / nPart))
        .map(chunk => MemTablePartition(chunk, required): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = MemTableReaderFactory

    /** Streaming source half of the contract: the registry's row list is an
      * append log; an offset is a position in it. Each micro-batch plans
      * ONLY the rows in (start, end] — the incremental-read shape every
      * real streaming connector (Kafka, file notification) implements —
      * with the same column pruning + filter pushdown as the batch scan. */
    override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
      new streaming.MicroBatchStream {
        import streaming.Offset
        override def initialOffset(): Offset = MemTableOffset(0L)
        override def latestOffset(): Offset =
          MemTableOffset(MemTableRegistry.rowsOf(name).size.toLong)
        override def deserializeOffset(json: String): Offset =
          MemTableOffset(json.trim.toLong)
        override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
          val s = start.asInstanceOf[MemTableOffset].count.toInt
          val e = end.asInstanceOf[MemTableOffset].count.toInt
          val slice = MemTableRegistry.rowsOf(name).slice(s, e)
            .filter(r => pushed.forall(matches(r, _)))
          val idxs = required.fieldNames.map(full.fieldIndex)
          val pruned = slice.map(r => idxs.map(r(_)).toSeq)
          if (pruned.isEmpty) Array.empty
          else Array(MemTablePartition(pruned, required))
        }
        override def createReaderFactory(): PartitionReaderFactory = MemTableReaderFactory
        override def commit(end: Offset): Unit = ()
        override def stop(): Unit = ()
      }
  }
}

/** Streaming offset = position in the registry's append log. */
private case class MemTableOffset(count: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = count.toString
}

private object MemTableReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[MemTablePartition]
    val conv = CatalystTypeConverters.createToCatalystConverter(part.schema)
    val it = part.rows.iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        MemTableRegistry.emitted.incrementAndGet() // rows actually read
        current = conv(org.apache.spark.sql.Row.fromSeq(it.next())).asInstanceOf[InternalRow]
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

private case class MemTablePartition(rows: Seq[Seq[Any]], schema: StructType) extends InputPartition
