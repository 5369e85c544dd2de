package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 read path: a deterministic synthetic shard table
  * (`spark.read.format("graft.sources.ShardSource")`), the harness a
  * pipeline uses to integration-test scan behavior — and the repo's
  * demonstration of the full DSv2 seam: `TableProvider` → `Table` →
  * `ScanBuilder` with BOTH pushdown mixins → per-shard
  * `InputPartition`s → `PartitionReader`.
  *
  * What makes it more than a toy:
  *  - **Filter pushdown prunes PARTITIONS, not rows**: shard
  *    predicates (=, <, <=, >, >=, IN on `shard`) are accepted in
  *    `pushFilters` and applied when PLANNING input partitions — a
  *    filtered scan launches only the matching shards' tasks, the
  *    DSv2 analog of parquet row-group/partition pruning. Residual
  *    filters stay with Spark (returned from `pushFilters`), so
  *    semantics never depend on the source's completeness.
  *  - **Column pruning reaches the reader**: `pruneColumns` hands the
  *    reader the required schema; rows are materialized with exactly
  *    those fields, in Spark's requested order.
  *  - **Deterministic content**: row `id` in shard `s` is
  *    `s·rowsPerShard + i`, `key = 'k' || id % 97`,
  *    `val = (id · 31) % 1000` — pure arithmetic, so the DuckDB
  *    oracle regenerates the identical table from `range()` and the
  *    gate hash-compares a query THROUGH the custom source.
  *
  * Options: `shards` (default 8), `rowsPerShard` (default 1000).
  * The scan's `description` lists the pushed shard filters and the
  * pruned read schema; `ShardSourceSpec` pins both plus the planned-
  * partition count. */
class ShardSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = properties.asScala
    new ShardTable(
      opts.getOrElse("shards", "8").toInt,
      opts.getOrElse("rowsPerShard", "1000").toLong,
      opts.getOrElse("shardsPerTrigger", "0").toInt)
  }
}

object ShardSource {
  val schema: StructType = StructType(Seq(
    StructField("shard", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("val", LongType, nullable = false)))

  /** The row algebra, shared by the reader and (textually) by the
    * DuckDB oracle: key/val are pure functions of the global id. */
  def cell(field: String, shard: Long, id: Long): Any = field match {
    case "shard" => shard
    case "id" => id
    case "key" => UTF8String.fromString("k" + (id % 97))
    case "val" => (id * 31) % 1000
  }

  /** Shard-id predicate from the pushed filters (conjunction). */
  def shardSurvives(pushed: Seq[Filter], s: Long): Boolean =
    pushed.forall {
      case EqualTo("shard", v: Long) => s == v
      case EqualTo("shard", v: Int) => s == v.toLong
      case GreaterThan("shard", v: Long) => s > v
      case GreaterThan("shard", v: Int) => s > v.toLong
      case GreaterThanOrEqual("shard", v: Long) => s >= v
      case GreaterThanOrEqual("shard", v: Int) => s >= v.toLong
      case LessThan("shard", v: Long) => s < v
      case LessThan("shard", v: Int) => s < v.toLong
      case LessThanOrEqual("shard", v: Long) => s <= v
      case LessThanOrEqual("shard", v: Int) => s <= v.toLong
      case In("shard", vs) => vs.exists {
        case v: Long => s == v
        case v: Int => s == v.toLong
        case _ => false
      }
      case _ => true // not a shard filter — kept by Spark anyway
    }

  /** Only Int/Long literals are evaluable by [[shardSurvives]]; any
    * other value type must stay a RESIDUAL filter so Spark re-applies
    * it — a consumed-but-unevaluable predicate would silently return
    * unfiltered rows. */
  private def intLike(v: Any): Boolean = v match {
    case _: Long | _: Int => true
    case _ => false
  }

  def isShardFilter(f: Filter): Boolean = f match {
    case EqualTo("shard", v) => intLike(v)
    case GreaterThan("shard", v) => intLike(v)
    case GreaterThanOrEqual("shard", v) => intLike(v)
    case LessThan("shard", v) => intLike(v)
    case LessThanOrEqual("shard", v) => intLike(v)
    case In("shard", vs) => vs.forall(intLike)
    case _ => false
  }
}

class ShardTable(shards: Int, rowsPerShard: Long, shardsPerTrigger: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_shards($shards x $rowsPerShard)"
  override def schema(): StructType = ShardSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new ShardScanBuilder(shards, rowsPerShard, shardsPerTrigger)
}

class ShardScanBuilder(shards: Int, rowsPerShard: Long,
    shardsPerTrigger: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ShardSource.schema
  private var aggSpec: Option[Seq[ShardAggScan.AggDesc]] = None
  private var limit: Int = -1

  // ---- limit pushdown: the reader caps each PARTITION at the limit
  // (a per-shard early stop — the source cannot know the global row
  // order, so this is a PARTIAL push: isPartiallyPushed keeps Spark's
  // own Limit in the plan for the global cut, but each task now reads
  // ≤ limit rows instead of the whole shard)
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // shard filters are FULLY consumed (not returned as residual):
    // every row in shard s has shard == s, so whole-shard partition
    // pruning is row-exact and Spark need not re-check — and a
    // residual Filter would block aggregate pushdown below (Spark
    // only pushes aggregates when nothing sits between the Aggregate
    // and the scan). Non-shard filters stay with Spark.
    pushed = filters.filter(ShardSource.isShardFilter)
    filters.filterNot(ShardSource.isShardFilter)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // ignored once an aggregation is pushed — the scan's schema is
    // then the aggregate output, not a projection of the base table
    if (aggSpec.isEmpty) required = requiredSchema

  // ---- aggregate pushdown (the parquet-scan analog: COUNT/MIN/MAX
  // answered by the source, GROUP BY shard = one group per partition
  // so the pushdown is COMPLETE and Spark plans NO aggregate at all)
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = ShardAggScan.parse(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    ShardAggScan.parse(agg) match {
      case some @ Some(_) => aggSpec = some; true
      case None => false
    }

  override def build(): Scan = aggSpec match {
    case Some(spec) => new ShardAggScan(shards, rowsPerShard, pushed, spec)
    case None =>
      new ShardScan(shards, rowsPerShard, shardsPerTrigger, pushed,
        required, limit)
  }
}

/** Aggregate-pushdown scan: one row PER SURVIVING SHARD carrying the
  * pushed COUNT(*)/MIN/MAX values — the scan output IS the final
  * aggregate (grouping is exactly [shard] and each shard is one
  * partition, so `supportCompletePushDown` holds and Spark's plan
  * contains no Aggregate node and no shuffle). A production source
  * answers these from footer/statistics; here the reader folds its
  * partition's arithmetic rows — the rows-out contraction (R rows →
  * 1) and the plan shape are the seam being demonstrated. */
class ShardAggScan(shards: Int, rowsPerShard: Long,
    pushed: Array[Filter], spec: Seq[ShardAggScan.AggDesc])
    extends Scan with Batch {
  import ShardAggScan._

  override def readSchema(): StructType = StructType(
    StructField("shard", LongType, nullable = false) +:
      spec.zipWithIndex.map {
        case (CountStarD, i) =>
          StructField(s"agg_$i", LongType, nullable = false)
        case (MinD(f), i) =>
          StructField(s"agg_$i", LongType, nullable = false)
        case (MaxD(f), i) =>
          StructField(s"agg_$i", LongType, nullable = false)
      })

  override def toBatch: Batch = this

  override def description(): String =
    s"graft_shards AGG pushed=[${pushed.mkString(", ")}] " +
      s"aggs=[${spec.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    (0L until shards.toLong)
      .filter(s => ShardSource.shardSurvives(pushed.toSeq, s))
      .map(s => ShardPartition(s, rowsPerShard): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ShardAggReaderFactory(spec)
}

object ShardAggScan {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  sealed trait AggDesc
  case object CountStarD extends AggDesc
  final case class MinD(field: String) extends AggDesc
  final case class MaxD(field: String) extends AggDesc

  private def longField(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 &&
        Set("shard", "id", "val")(r.fieldNames.head) =>
      Some(r.fieldNames.head)
    case _ => None
  }

  /** Accept iff grouping is exactly [shard] and every aggregate is
    * COUNT(*) or MIN/MAX of a long column. */
  def parse(agg: Aggregation): Option[Seq[AggDesc]] = {
    val groupOk = agg.groupByExpressions.toSeq match {
      case Seq(g) => longField(g).contains("shard")
      case _ => false
    }
    if (!groupOk) return None
    val parsed = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(CountStarD)
      case m: Min => longField(m.column).map(MinD)
      case m: Max => longField(m.column).map(MaxD)
      case _ => None
    }
    if (parsed.forall(_.isDefined)) Some(parsed.map(_.get)) else None
  }
}

class ShardAggReaderFactory(spec: Seq[ShardAggScan.AggDesc])
    extends PartitionReaderFactory {
  import ShardAggScan._

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = { val r = !done; done = true; r }
      override def get(): InternalRow = {
        def fold(field: String, max: Boolean): Long = {
          var best = if (max) Long.MinValue else Long.MaxValue
          var i = 0L
          while (i < p.rows) {
            val id = p.shard * p.stride + i
            val v = ShardSource.cell(field, p.shard, id)
              .asInstanceOf[Long]
            if (if (max) v > best else v < best) best = v
            i += 1
          }
          best
        }
        val out = new Array[Any](spec.size + 1)
        out(0) = p.shard
        spec.zipWithIndex.foreach {
          case (CountStarD, i) => out(i + 1) = p.rows
          case (MinD(f), i) => out(i + 1) = fold(f, max = false)
          case (MaxD(f), i) => out(i + 1) = fold(f, max = true)
        }
        new GenericInternalRow(out)
      }
      override def close(): Unit = ()
    }
  }
}

class ShardScan(shards: Int, rowsPerShard: Long, shardsPerTrigger: Int,
    pushed: Array[Filter], required: StructType,
    limit: Int = -1) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_shards pushed=[${pushed.mkString(", ")}] " +
      s"read=[${required.fieldNames.mkString(", ")}]" +
      (if (limit >= 0) s" limit=$limit" else "")

  override def planInputPartitions(): Array[InputPartition] =
    (0L until shards.toLong)
      .filter(s => ShardSource.shardSurvives(pushed.toSeq, s))
      .map(s => ShardPartition(s,
        if (limit >= 0) math.min(rowsPerShard, limit.toLong)
        else rowsPerShard, rowsPerShard): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ShardReaderFactory(required.fieldNames)

  /** Streaming read path: shards arrive as an append stream, at most
    * `shardsPerTrigger` per micro-batch (0 = all at once) — the
    * same admission-control shape as a file source's
    * maxFilesPerTrigger. Offsets are plain shard counts; a restart
    * resumes from the committed shard (deserializeOffset), and
    * `processAllAvailable` drains because latestOffset stops
    * advancing at `shards`. */
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new ShardMicroBatchStream(shards, rowsPerShard,
      if (shardsPerTrigger <= 0) shards else shardsPerTrigger,
      pushed, required)
}

class ShardOffset(val n: Long) extends Offset {
  override def json(): String = n.toString
}

class ShardMicroBatchStream(shards: Int, rowsPerShard: Long,
    perTrigger: Int, pushed: Array[Filter], required: StructType)
    extends MicroBatchStream {
  private var planned: Long = 0L

  override def initialOffset(): Offset = new ShardOffset(0L)
  override def deserializeOffset(json: String): Offset = {
    val o = new ShardOffset(json.toLong)
    planned = math.max(planned, o.n)
    o
  }
  override def latestOffset(): Offset = {
    planned = math.min(planned + perTrigger, shards.toLong)
    new ShardOffset(planned)
  }
  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
    (start.asInstanceOf[ShardOffset].n until
        end.asInstanceOf[ShardOffset].n)
      .filter(s => ShardSource.shardSurvives(pushed.toSeq, s))
      .map(s => ShardPartition(s, rowsPerShard): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ShardReaderFactory(required.fieldNames)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** `rows` is how many rows this task emits (a pushed limit may cap
  * it); `stride` is the table's rowsPerShard and anchors the global
  * id arithmetic regardless of the cap. */
case class ShardPartition(shard: Long, rows: Long,
    stride: Long) extends InputPartition

object ShardPartition {
  def apply(shard: Long, rows: Long): ShardPartition =
    ShardPartition(shard, rows, rows)
}

class ShardReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardPartition]
    new PartitionReader[InternalRow] {
      private var i = -1L
      override def next(): Boolean = { i += 1; i < p.rows }
      override def get(): InternalRow = {
        val id = p.shard * p.stride + i
        new GenericInternalRow(
          fields.map(f => ShardSource.cell(f, p.shard, id))
            .asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
