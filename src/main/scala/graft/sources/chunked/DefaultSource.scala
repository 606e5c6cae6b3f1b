package graft.sources.chunked

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.Paginated

/** DataSourceV2 view of the paginated extract (SURVEY §2.1 S4, optional
  * phase 6): the engine-native alternative to the sequential driver loop
  * in [[graft.sources.Paginated]]. The same ChunkSpec windows become one
  * `InputPartition` each, so all chunks are "fetched" in parallel across
  * executors and enter the plan as a normal batch scan:
  *
  * {{{
  * spark.read.format("graft.sources.chunked")
  *   .option("total", "250").option("chunkSize", "100").load()
  * }}}
  *
  * The per-row payload here is a deterministic synthesizer standing in for
  * the HTTP chunk fetch (this environment has no egress) — a real
  * connector replaces only `ChunkReader.fetchRow` with the API call and
  * carries the retry-skip policy of Paginated.fetchAll per partition.
  */
class DefaultSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkedTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // getTable receives a case-PRESERVING map (unlike inferSchema's
    // CaseInsensitiveStringMap) — wrap it, or .option("chunkSize", ...)
    // would silently fall back to the default
    val opts = new CaseInsensitiveStringMap(properties)
    require(opts.containsKey("total"),
      "graft.sources.chunked requires option 'total' (row count to page)")
    new ChunkedTable(opts.getLong("total", 0L), opts.getLong("chunkSize", 100L))
  }
}

object ChunkedTable {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("chunk", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

class ChunkedTable(total: Long, chunkSize: Long) extends Table with SupportsRead {
  override def name(): String = s"chunked(total=$total, chunkSize=$chunkSize)"
  override def schema(): StructType = ChunkedTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = ChunkedTable.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Paginated.chunkSpecs(total, chunkSize)
          .map(s => ChunkPartition(s.index, s.offset, s.limit): InputPartition)
          .toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new ChunkReaderFactory
    }
}

case class ChunkPartition(index: Int, offset: Long, limit: Long)
  extends InputPartition

class ChunkReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChunkPartition]
    new PartitionReader[InternalRow] {
      private var i = -1L
      override def next(): Boolean = { i += 1; i < p.limit }
      override def get(): InternalRow = fetchRow(p, p.offset + i)
      override def close(): Unit = ()
    }
  }

  /** STUB transport: deterministic payload per id. A real connector does
    * the HTTP GET for the chunk here (one request per partition, executed
    * on the executor that owns it). */
  private def fetchRow(p: ChunkPartition, id: Long): InternalRow =
    InternalRow(id, p.index, UTF8String.fromString(s"row-$id-of-chunk-${p.index}"))
}
