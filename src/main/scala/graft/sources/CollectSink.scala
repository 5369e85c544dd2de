package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path ([[ShardSource]]'s sibling): an
  * in-memory collecting sink that demonstrates the exactly-once
  * batch-commit protocol the way a warehouse-table committer
  * implements it:
  *
  *  - each task's `DataWriter` BUFFERS its rows and only surrenders
  *    them inside its `commit()` message — a task attempt that fails
  *    (or is retried/speculated) never leaks partial output, because
  *    Spark discards the failed attempt's message and only ONE
  *    attempt per partition wins the commit race;
  *  - the driver's `BatchWrite.commit` makes the result visible
  *    ATOMICALLY (one synchronized put keyed by the write's batch
  *    id) after every partition committed; `abort` leaves the store
  *    untouched — a half-failed job is invisible, exactly the
  *    all-or-nothing contract a parquet/Iceberg committer provides
  *    with a manifest swap.
  *
  * `FaultToleranceSpec` drives both paths: a writer whose attempt 0
  * throws on one partition (retry → exact committed content, no
  * duplicates) and a writer that always throws (abort → nothing
  * visible). Gate-scale only — the store is a driver-side map; the
  * production analog swaps the buffer for files + manifest. */
class CollectSink extends TableProvider {
  // the written DataFrame's schema is handed to getTable (write-only
  // provider — there is nothing to infer)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CollectSinkTable(schema,
      Option(properties.get("batchId")).getOrElse("default"))
}

object CollectSink {
  /** batchId -> committed rows (each row = the written columns'
    * string forms). Visible only after a successful commit. */
  private val store = mutable.Map[String, Seq[Seq[String]]]()
  private val aborted = mutable.Set[String]()

  def committed(batchId: String): Option[Seq[Seq[String]]] =
    store.synchronized(store.get(batchId))
  def wasAborted(batchId: String): Boolean =
    store.synchronized(aborted.contains(batchId))
  def clear(batchId: String): Unit = store.synchronized {
    store.remove(batchId); aborted.remove(batchId)
  }

  private[sources] def publish(batchId: String,
      rows: Seq[Seq[String]]): Unit =
    store.synchronized { store(batchId) = rows }
  private[sources] def markAborted(batchId: String): Unit =
    store.synchronized { aborted.add(batchId) }
}

class CollectSinkTable(schema: StructType, batchId: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_collect($batchId)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new CollectBatchWrite(info.schema(), batchId)
      }
    }
}

class CollectBatchWrite(schema: StructType, batchId: String)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new CollectWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // atomic publish: nothing is visible until every partition's
    // single winning attempt has delivered its buffered rows
    val rows = messages.flatMap {
      case CollectCommit(r) => r
    }.toSeq
    CollectSink.publish(batchId, rows)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    CollectSink.markAborted(batchId)
}

case class CollectCommit(rows: Seq[Seq[String]])
    extends WriterCommitMessage

class CollectWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val buf = mutable.ArrayBuffer[Seq[String]]()
    override def write(record: InternalRow): Unit =
      buf += schema.fields.indices
        .map(i => String.valueOf(record.get(i, schema.fields(i).dataType)))
    override def commit(): WriterCommitMessage = CollectCommit(buf.toSeq)
    override def abort(): Unit = buf.clear()
    override def close(): Unit = ()
  }
}
