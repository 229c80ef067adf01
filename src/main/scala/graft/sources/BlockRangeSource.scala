package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 block-range source — the engine's model of the reference's
  * node-extraction stage (A3, config.py:35-59): the unit of read parallelism
  * is an inclusive block range (ethereumetl/utils.py:1-5 batching), one
  * `InputPartition` per batch, exactly as the reference runs one
  * ShellCommandActivity per range. The node interaction itself sits behind
  * a pluggable fetch boundary ([[BlockRangeSource.BlockFetcher]]): each
  * PartitionReader walks its range in `rpcBatchSize` sub-ranges and calls
  * `fetch(s, e)` per sub-range — the reference's `-s/-e/-w` export-command
  * contract. The default [[BlockRangeSource.SyntheticFetcher]] generates
  * rows deterministically from the block number so the source is testable
  * and oracle-checkable end to end; a production fetcher would issue the
  * RPC calls, and a flaky mock in the spec exercises task-retry recovery.
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
    val rpcBatchSize = opts.getLong("rpcBatchSize", batchSize)
    // fail fast with an actionable message, not a planning-time / by zero
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(blocksPerTrigger > 0, s"blocksPerTrigger must be positive, got $blocksPerTrigger")
    require(rpcBatchSize > 0, s"rpcBatchSize must be positive, got $rpcBatchSize")
    require(end >= start, s"end ($end) must be >= start ($start)")
    // resolved on the DRIVER at planning time; the instance then ships to
    // executors inside the reader factory (BlockFetcher is Serializable)
    val fetcher = BlockRangeSource.fetcher(opts.getOrDefault("fetcher", "synthetic"))
    new BlockRangeTable(start, end, batchSize, blocksPerTrigger, rpcBatchSize, fetcher)
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

  /** One fetched block, as an RPC fetch returns it: the FULL row. Column
    * pruning happens engine-side at InternalRow construction — a node
    * answers with whole blocks regardless of which fields the query needs. */
  final case class FetchedBlock(number: Long, hash: String, miner: String,
      difficulty: BigDecimal, gasUsed: Long, timestamp: Long)

  /** The RPC fetch boundary (config.py:35-59): one `fetch(s, e)` call is one
    * export command's inclusive `-s $1 -e $2` range, and `rpcBatchSize`
    * models the `-w` batching that splits an InputPartition into successive
    * fetch calls (ethereumetl/utils.py:1-5). Implementations must be
    * Serializable — the planned instance ships to executors inside the
    * reader factory — and must be PURE per range: Spark retries a failed
    * TASK, which re-fetches every RPC batch of that partition, so a fetch
    * that returned different rows on retry would produce a
    * partition-corrupting rerun. */
  trait BlockFetcher extends Serializable {
    def fetch(s: Long, e: Long): Iterator[FetchedBlock]
  }

  /** Default fetcher: deterministic chain-shaped content, SQL-reproducible
    * for the oracle (same formulas the DuckDB side recomputes). */
  object SyntheticFetcher extends BlockFetcher {
    override def fetch(s: Long, e: Long): Iterator[FetchedBlock] =
      (s to e).iterator.map { n =>
        FetchedBlock(n, "0x%010d".format(hashVal(n)), "0xminer%02d".format(minerVal(n)),
          BigDecimal(n) * 131072, 21000L * (n % 100L), 1438269988L + n * 13L)
      }
  }

  /** Fixture-backed fetcher: serves ranges from a local JSONL "node dump" —
    * one block object per line, `difficulty` a STRING (the reference exports
    * uint256 columns as strings and casts to decimal(38,0) at load,
    * convert_blocks_to_parquet.py:38-39). This is one step closer to the
    * reference's file-staged reality than [[SyntheticFetcher]]: the staged
    * export file IS the fetch source, no node required. The dump is parsed
    * once per JVM per path into an index (executor-side lazy load; a
    * fixture dump fits memory — a production fetcher at chain scale would
    * answer from the node or an indexed store instead). Pure per range by
    * construction: the file is immutable once staged, so task retries
    * re-read identical rows. Only the path ships in the closure. */
  final case class FileDumpFetcher(path: String) extends BlockFetcher {
    override def fetch(s: Long, e: Long): Iterator[FetchedBlock] = {
      val idx = FileDumpFetcher.load(path)
      (s to e).iterator.flatMap(idx.get)
    }
  }

  object FileDumpFetcher {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Map[Long, FetchedBlock]]()
    // Accepted line grammar, enforced strictly via a real JSON parse
    // (Jackson, already on Spark's classpath) rather than per-field regexes
    // — a regex would silently mis-extract on escaped quotes in hash/miner
    // or on a foreign field whose name merely ends in a matched key:
    //   {"number": <int>, "hash": <string>, "miner": <string>,
    //    "difficulty": <decimal STRING — uint256 doesn't fit int64>,
    //    "gas_used": <int>, "timestamp": <int epoch seconds>}
    // Extra fields are ignored; a missing/null/badly-typed required field
    // fails loudly with the offending line.
    private def load(path: String): Map[Long, FetchedBlock] =
      cache.computeIfAbsent(path, p => {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val src = scala.io.Source.fromFile(p, "UTF-8")
        try src.getLines().filter(_.trim.nonEmpty).map { line =>
          def bad(why: String) = throw new IllegalArgumentException(
            s"malformed dump line ($why): ${line.take(200)}")
          val node =
            try mapper.readTree(line)
            catch { case _: com.fasterxml.jackson.core.JacksonException => bad("not JSON") }
          def intField(name: String): Long = node.get(name) match {
            case v if v == null || v.isNull => bad(s"missing '$name'")
            case v if !v.canConvertToLong => bad(s"'$name' is not an int64")
            case v => v.asLong()
          }
          def strField(name: String): String = node.get(name) match {
            case v if v == null || v.isNull => bad(s"missing '$name'")
            case v if !v.isTextual => bad(s"'$name' is not a string")
            case v => v.asText()
          }
          val n = intField("number")
          n -> FetchedBlock(n, strField("hash"), strField("miner"),
            BigDecimal(strField("difficulty")), intField("gas_used"),
            intField("timestamp"))
        }.toMap
        finally src.close()
      })
  }

  // Named-fetcher registry: DataSourceV2 options are string-typed, so a
  // custom fetcher is registered under a name on the driver and selected
  // with .option("fetcher", name). Tests use this to inject fault modes.
  private val fetchers = new java.util.concurrent.ConcurrentHashMap[String, BlockFetcher]()
  fetchers.put("synthetic", SyntheticFetcher)
  def registerFetcher(name: String, f: BlockFetcher): Unit = fetchers.put(name, f): Unit
  private[sources] def fetcher(name: String): BlockFetcher = {
    val f = fetchers.get(name)
    require(f != null, s"no registered BlockFetcher named '$name' " +
      s"(registered: ${fetchers.keySet()}); call BlockRangeSource.registerFetcher first")
    f
  }
}

private class BlockRangeTable(start: Long, end: Long, batchSize: Long,
                              blocksPerTrigger: Long, rpcBatchSize: Long,
                              fetcher: BlockRangeSource.BlockFetcher)
    extends Table with SupportsRead {
  override def name(): String = s"block_range[$start,$end]"
  override def schema(): StructType = BlockRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BlockRangeScanBuilder(start, end, batchSize, blocksPerTrigger, rpcBatchSize, fetcher)
}

private class BlockRangeScanBuilder(start: Long, end: Long, batchSize: Long,
                                    blocksPerTrigger: Long, rpcBatchSize: Long,
                                    fetcher: BlockRangeSource.BlockFetcher)
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
      new BlockRangeMicroBatchStream(lo, hi, batchSize, blocksPerTrigger, rpcBatchSize,
        fetcher, required)

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
      val (rbs, f) = (rpcBatchSize, fetcher)
      (partition: InputPartition) => {
        val p = partition.asInstanceOf[BlockRangePartition]
        new BlockRangeReader(p.first, p.last, rbs, f, names)
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
                                         blocksPerTrigger: Long, rpcBatchSize: Long,
                                         fetcher: BlockRangeSource.BlockFetcher,
                                         required: StructType)
    extends MicroBatchStream with SupportsAdmissionControl {
  // The simulated head: a real implementation would ask the node
  // (eth_blockNumber) — a MONOTONIC external truth. That monotonicity is
  // load-bearing: on restart Spark builds a fresh stream object and
  // recovers position from the checkpoint WAL, and if latestOffset()
  // answered from freshly-initialized local state it would report a head
  // BELOW the committed offset — Spark would then run a batch whose end
  // offset rewinds the stream and re-emit already-committed blocks under
  // NEW batch ids (which the file sink dutifully accepts: duplicates).
  // The restart spec proves this.
  //
  // r12: ratcheting only inside deserializeOffset/planInputPartitions was
  // NOT enough — those are called on restart only when the last WAL batch
  // is uncommitted and must replay. When the stream stops cleanly between
  // batches (every WAL entry committed), the engine never hands the
  // recovered position to the source before asking for a new head, the
  // fresh stream reported cur=start, and Spark accepted the rewound
  // offset: one empty batch at the stale offset, then a batch spanning
  // the rewind that re-emitted ~250 committed blocks (caught by the
  // restart spec, reproduced 3/12 runs). The correct seam is the
  // admission-control form of latestOffset(startOffset, limit): the
  // engine passes the CURRENT start position on EVERY trigger, so the
  // head ratchets against the checkpointed truth before advancing — the
  // DSv2 analogue of asking the node for a head that can never be behind
  // what the chain already served.
  private var cur: Long = start
  private def ratchet(o: Long): Unit = cur = math.max(cur, o)
  private def saturatingAdvance(from: Long): Long = {
    val next = from + math.min(blocksPerTrigger, end - from + 1)
    math.min(next, end + 1)
  }

  override def initialOffset(): Offset = BlockOffset(start)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(blocksPerTrigger)
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    // startOffset is the engine's committed/available position — external
    // truth, never behind the checkpoint. Ratchet before advancing.
    if (startOffset != null) ratchet(startOffset.asInstanceOf[BlockOffset].next)
    cur = saturatingAdvance(cur)
    BlockOffset(cur)
  }
  override def latestOffset(): Offset =
    throw new IllegalStateException(
      "engine must use latestOffset(start, limit) — SupportsAdmissionControl")
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
    val (rbs, f) = (rpcBatchSize, fetcher)
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[BlockRangePartition]
      new BlockRangeReader(p.first, p.last, rbs, f, names)
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Reads one InputPartition through the pluggable fetch boundary: the
  * inclusive range [first,last] is walked in rpcBatchSize sub-ranges, one
  * `fetcher.fetch(s, e)` per sub-range — exactly the `-s/-e/-w` contract a
  * reference export command runs against the node (config.py:35-59). A
  * fetch failure propagates as a task failure, so Spark's task retry (the
  * scheduler-level analogue of the activity retry in
  * export_pipeline_template.py:49) re-runs the WHOLE partition — safe
  * because fetchers are pure per range. Column pruning is applied here,
  * after the fetch: the node returns full blocks, the engine materializes
  * only the requested fields. */
private class BlockRangeReader(first: Long, last: Long, rpcBatchSize: Long,
                               fetcher: BlockRangeSource.BlockFetcher,
                               fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val starts = (first to last by rpcBatchSize).iterator
  private var cur: Iterator[BlockRangeSource.FetchedBlock] = Iterator.empty
  private var row: BlockRangeSource.FetchedBlock = _

  override def next(): Boolean = {
    while (!cur.hasNext && starts.hasNext) {
      val s = starts.next()
      cur = fetcher.fetch(s, math.min(s + rpcBatchSize - 1, last))
    }
    if (cur.hasNext) { row = cur.next(); true } else false
  }

  override def get(): InternalRow = {
    val values: Array[Any] = fields.map {
      case "number"     => row.number
      case "hash"       => UTF8String.fromString(row.hash)
      case "miner"      => UTF8String.fromString(row.miner)
      case "difficulty" => Decimal(row.difficulty, 38, 0)
      case "gas_used"   => row.gasUsed
      case "timestamp"  => row.timestamp
    }
    InternalRow.fromSeq(values.toSeq)
  }

  override def close(): Unit = ()
}
