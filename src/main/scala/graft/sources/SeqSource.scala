package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSourceV2 connector (the §2.1 source tier Spark's file
  * formats hide): a deterministic integer-sequence table
  * `(id LONG, bucket LONG = id % 97, slice LONG = id % slices,
  * payload STRING)` over `[start, end)`, split into `slices` input
  * partitions.
  *
  * The point is the PUSHDOWN + LAYOUT plumbing, implemented the way a
  * real warehouse connector does it:
  *  - `SupportsPushDownFilters`: range predicates on `id` CLAMP the
  *    generation bounds — pushed rows are never produced, not produced
  *    and discarded (at 100 TB that is the difference between a scan
  *    and a no-op). Non-range filters (and any on other columns) are
  *    returned as residuals for Spark to evaluate post-scan.
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only
  *    the pruned schema — `payload` costs a string allocation per row,
  *    so pruning it is measurable, exactly like column pruning on a
  *    wide parquet table.
  *  - `SupportsReportPartitioning` (`.option("clustered", "true")`):
  *    each input partition holds exactly one `slice` residue class and
  *    declares it via `HasPartitionKey`, so with
  *    `spark.sql.sources.v2.bucketing.enabled` a `GROUP BY slice`
  *    aggregates WITHOUT an exchange — the storage-partitioned
  *    execution path bucketed tables get, proven shuffle-free in
  *    SeqSourceSpec.
  *  - `Scan.description()` exposes the clamped bounds and kept columns,
  *    so plan-shape specs can assert pushdown happened (it shows in
  *    `.explain` under BatchScan).
  *
  * Usage: `spark.read.format("graft.sources.SeqSource")
  * .option("start", "0").option("end", "1000000").option("slices", "8")
  * .load()`.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = new SeqTable
}

object SeqSource {
  val fullSchema: StructType = new StructType()
    .add("id", LongType).add("bucket", LongType).add("slice", LongType)
    .add("payload", StringType)
}

private[sources] class SeqTable extends Table with SupportsRead {
  override def name(): String = "graft_seq"
  override def schema(): StructType = SeqSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(
      options.getLong("start", 0L),
      options.getLong("end", 1000L),
      options.getInt("slices", 4),
      options.getBoolean("clustered", false))
}

private[sources] class SeqScanBuilder(start: Long, end: Long, slices: Int,
                                      clustered: Boolean)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = start
  private var hi = end
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case EqualTo("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(lo, math.max(lo, hi), slices,
    clustered, required.fieldNames)
}

private[sources] class SeqScan(lo: Long, hi: Long, slices: Int,
                               clustered: Boolean, cols: Array[String])
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType =
    StructType(cols.flatMap(c => SeqSource.fullSchema.fields.find(_.name == c)))
  override def description(): String =
    s"SeqScan(lo=$lo, hi=$hi, clustered=$clustered, cols=${cols.mkString(",")})"
  override def toBatch: Batch = this

  private val n = math.max(1, slices)

  override def outputPartitioning(): Partitioning =
    if (clustered)
      new KeyGroupedPartitioning(Array(Expressions.identity("slice")), n)
    else new UnknownPartitioning(n)

  override def planInputPartitions(): Array[InputPartition] =
    if (clustered) {
      // one residue class of `slice` per partition: first id ≥ lo with
      // id % n == r, then stride n — the partition IS its key group
      (0 until n).map { r =>
        val first = lo + java.lang.Math.floorMod(r - lo, n.toLong)
        SeqResiduePartition(first, hi, n.toLong, r.toLong, cols)
      }.filter(p => p.first < p.hi).toArray[InputPartition]
    } else {
      val span = hi - lo
      (0 until n).map { i =>
        SeqRangePartition(lo + span * i / n, lo + span * (i + 1) / n, cols)
      }.filter(p => p.lo < p.hi).toArray[InputPartition]
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(n.toLong)
}

private[sources] case class SeqRangePartition(lo: Long, hi: Long,
                                              cols: Array[String])
    extends InputPartition

private[sources] case class SeqResiduePartition(first: Long, hi: Long,
                                                step: Long, residue: Long,
                                                cols: Array[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(
    Array[Any](residue))
}

private[sources] class SeqReaderFactory(slices: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (start, hi, step, cols) = partition match {
      case SeqRangePartition(lo, h, c) => (lo, h, 1L, c)
      case SeqResiduePartition(f, h, s, _, c) => (f, h, s, c)
    }
    val slicesB = slices
    new PartitionReader[InternalRow] {
      private var cur = start - step
      override def next(): Boolean = { cur += step; cur < hi }
      override def get(): InternalRow =
        new GenericInternalRow(cols.map {
          case "id" => cur
          case "bucket" => cur % 97L
          case "slice" => cur % slicesB
          case "payload" => UTF8String.fromString(s"row-$cur")
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
