package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 block-range source — the engine's model of the reference's
  * node-extraction stage (A3, config.py:35-59): the unit of read parallelism
  * is an inclusive block range (ethereumetl/utils.py:1-5 batching), one
  * `InputPartition` per batch, exactly as the reference runs one
  * ShellCommandActivity per range. A production implementation would issue
  * RPC calls inside each PartitionReader; here rows are generated
  * deterministically from the block number so the source is testable and
  * oracle-checkable end to end.
  *
  * Spark-native behaviors demonstrated:
  *  - column pruning (`SupportsPushDownRequiredColumns`): readers materialize
  *    only requested fields;
  *  - partition pruning (`SupportsPushDownFilters`): number-range predicates
  *    drop whole batches before any read (filters stay residual, so
  *    correctness never depends on the pruning);
  *  - exact decimal(38,0) difficulty, mirroring the reference's uint256
  *    handling (convert_blocks_to_parquet.py:38-39).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.BlockRangeSource")
  *   .option("start", 0).option("end", 99999).option("batchSize", 10000)
  *   .load()
  * }}}
  */
class BlockRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockRangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val start = opts.getLong("start", 0L)
    val end = opts.getLong("end", 999999L)
    val batchSize = opts.getLong("batchSize", 100000L)
    val blocksPerTrigger = opts.getLong("blocksPerTrigger", batchSize)
    // fail fast with an actionable message, not a planning-time / by zero
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(blocksPerTrigger > 0, s"blocksPerTrigger must be positive, got $blocksPerTrigger")
    require(end >= start, s"end ($end) must be >= start ($start)")
    new BlockRangeTable(start, end, batchSize, blocksPerTrigger)
  }
}

object BlockRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("number", LongType, nullable = false),
    StructField("hash", StringType, nullable = false),
    StructField("miner", StringType, nullable = false),
    StructField("difficulty", DecimalType(38, 0), nullable = false),
    StructField("gas_used", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  // deterministic synthetic content (SQL-reproducible for the oracle)
  def hashVal(n: Long): Long = (n * 2654435761L) % 1000000007L
  def minerVal(n: Long): Long = n % 97L
}

private class BlockRangeTable(start: Long, end: Long, batchSize: Long,
                              blocksPerTrigger: Long)
    extends Table with SupportsRead {
  override def name(): String = s"block_range[$start,$end]"
  override def schema(): StructType = BlockRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BlockRangeScanBuilder(start, end, batchSize, blocksPerTrigger)
}

private class BlockRangeScanBuilder(start: Long, end: Long, batchSize: Long,
                                    blocksPerTrigger: Long = Long.MaxValue)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = BlockRangeSource.schema
  private var lo: Long = start
  private var hi: Long = end
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // tighten the planned block range from number predicates; every filter
    // stays residual (Spark re-applies it), so pruning is purely an
    // efficiency contract — the reference's partition-directory pruning.
    filters.foreach {
      case GreaterThan("number", v: Long)        => lo = math.max(lo, v + 1); pushed :+= GreaterThan("number", v)
      case GreaterThanOrEqual("number", v: Long) => lo = math.max(lo, v); pushed :+= GreaterThanOrEqual("number", v)
      case LessThan("number", v: Long)           => hi = math.min(hi, v - 1); pushed :+= LessThan("number", v)
      case LessThanOrEqual("number", v: Long)    => hi = math.min(hi, v); pushed :+= LessThanOrEqual("number", v)
      case _ =>
    }
    filters // all residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    // "blocks as they arrive": the chain-following streaming extension of
    // A3 (the reference's schedule is ondemand — this is the natural next
    // step). Offsets are plain block numbers (next-to-read), the simulated
    // chain head advances by blocksPerTrigger per trigger until `end`, and
    // each microbatch splits into the SAME inclusive-range InputPartitions
    // as the batch path — restart-safe because offsets are durable in the
    // checkpoint and rows are a pure function of the block number.
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new BlockRangeMicroBatchStream(lo, hi, batchSize, blocksPerTrigger, required)

    override def planInputPartitions(): Array[InputPartition] = {
      if (hi < lo) return Array.empty
      // batch grid stays anchored at `start` so pruning only drops batches,
      // never reshapes them (same ranges a node-export run would produce)
      val firstBatch = (lo - start) / batchSize
      val lastBatch = (hi - start) / batchSize
      (firstBatch to lastBatch).map { b =>
        val bs = start + b * batchSize
        BlockRangePartition(bs, math.min(bs + batchSize - 1, end)): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val names = required.fieldNames
      (partition: InputPartition) => {
        val p = partition.asInstanceOf[BlockRangePartition]
        new BlockRangeReader(p.first, p.last, names)
      }
    }
  }
}

private case class BlockRangePartition(first: Long, last: Long) extends InputPartition

/** Next-block-to-read offset; json() is the durable checkpoint form. */
private case class BlockOffset(next: Long) extends Offset {
  override def json(): String = next.toString
}

private class BlockRangeMicroBatchStream(start: Long, end: Long, batchSize: Long,
                                         blocksPerTrigger: Long, required: StructType)
    extends MicroBatchStream {
  // The simulated head: a real implementation would ask the node
  // (eth_blockNumber) — a MONOTONIC external truth. That monotonicity is
  // load-bearing: on restart Spark builds a fresh stream object and
  // recovers position from the checkpoint WAL, and if latestOffset()
  // answered from freshly-initialized local state it would report a head
  // BELOW the committed offset — Spark would then run a batch whose end
  // offset rewinds the stream and re-emit already-committed blocks under
  // NEW batch ids (which the file sink dutifully accepts: duplicates).
  // The restart spec proves this. So the head ratchets against every
  // offset the engine hands back during recovery (deserializeOffset /
  // planInputPartitions), never below the checkpointed position.
  private var cur: Long = start
  private def ratchet(o: Long): Unit = cur = math.max(cur, o)
  private def saturatingAdvance(from: Long): Long = {
    val next = from + math.min(blocksPerTrigger, end - from + 1)
    math.min(next, end + 1)
  }

  override def initialOffset(): Offset = BlockOffset(start)
  override def latestOffset(): Offset = {
    cur = saturatingAdvance(cur)
    BlockOffset(cur)
  }
  override def deserializeOffset(json: String): Offset = {
    val o = json.toLong
    ratchet(o)
    BlockOffset(o)
  }

  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] = {
    val lo = startOff.asInstanceOf[BlockOffset].next
    val hi = endOff.asInstanceOf[BlockOffset].next - 1 // end offset is exclusive
    ratchet(hi + 1) // recovery may replan the last WAL batch before any latestOffset call
    if (hi < lo) return Array.empty
    // same grid anchoring as the batch path: ranges a node-export run produces
    val firstBatch = (lo - start) / batchSize
    val lastBatch = (hi - start) / batchSize
    (firstBatch to lastBatch).map { b =>
      val bs = start + b * batchSize
      BlockRangePartition(math.max(bs, lo), math.min(bs + batchSize - 1, hi)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val names = required.fieldNames
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[BlockRangePartition]
      new BlockRangeReader(p.first, p.last, names)
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Generates one batch of synthetic blocks; a real source would stream RPC
  * responses here (per-partition connection setup, batched requests). */
private class BlockRangeReader(first: Long, last: Long, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private var n: Long = first - 1

  override def next(): Boolean = { n += 1; n <= last }

  override def get(): InternalRow = {
    val values: Array[Any] = fields.map {
      case "number" => n
      case "hash" =>
        UTF8String.fromString("0x%010d".format(BlockRangeSource.hashVal(n)))
      case "miner" =>
        UTF8String.fromString("0xminer%02d".format(BlockRangeSource.minerVal(n)))
      case "difficulty" => Decimal(BigDecimal(n) * 131072, 38, 0)
      case "gas_used" => 21000L * (n % 100L)
      case "timestamp" => 1438269988L + n * 13L
    }
    InternalRow.fromSeq(values.toSeq)
  }

  override def close(): Unit = ()
}
