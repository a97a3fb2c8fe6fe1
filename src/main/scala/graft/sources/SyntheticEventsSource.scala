package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 (batch read): a deterministic synthetic event
  * generator — the engine-side stand-in for a Salesforce extract
  * connector (the real one needs credentials/egress this environment
  * doesn't have; SURVEY §7.4). Demonstrates the full DSv2 read stack:
  * TableProvider -> Table -> ScanBuilder -> Batch -> InputPartition ->
  * PartitionReader, with rows generated independently per partition (no
  * driver-side data, arbitrary parallelism — the property that matters
  * at 100 TB).
  *
  * Usage:
  *   spark.read.format("graft.sources.SyntheticEventsSource")
  *     .option("rows", "10000").option("partitions", "8").load()
  */
class SyntheticEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEventsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticEventsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SyntheticEventsSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))
  val types: Array[String] = Array("click", "error", "purchase", "signup", "view")

  // splitmix64 — fixed-seed determinism (SURVEY §7.3.6: no RNG state)
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}

class SyntheticEventsTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic_events($rows)"
  override def schema(): StructType = SyntheticEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = SyntheticEventsSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = (rows + partitions - 1) / partitions
        (0 until partitions).map { i =>
          val start = i * per
          val end = math.min(start + per, rows)
          EventsPartition(start, end): InputPartition
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (p: InputPartition) => {
          val ep = p.asInstanceOf[EventsPartition]
          new PartitionReader[InternalRow] {
            private var i = ep.start - 1
            override def next(): Boolean = { i += 1; i < ep.end }
            override def get(): InternalRow = {
              val h = SyntheticEventsSource.mix(i)
              InternalRow(
                i,
                math.floorMod(h, 100L),
                UTF8String.fromString(
                  SyntheticEventsSource.types(math.floorMod(h >>> 8, 5L).toInt)),
                math.floorMod(h >>> 16, 10000L) / 100.0)
            }
            override def close(): Unit = ()
          }
        }
    }
}

case class EventsPartition(start: Long, end: Long) extends InputPartition
