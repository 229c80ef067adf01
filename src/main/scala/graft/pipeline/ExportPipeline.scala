package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.etl.EtlOps

/** The reference's pipeline, Spark-natively: config-gated stage composition.
  *
  * The reference builds a CloudFormation DAG of shell activities — flags in
  * `config.py:18-22` decide which stages exist, and
  * `export_pipeline_template.py:144-181` wires stage k's output file into
  * stage k+1 (txs→hashes→receipts, receipts→contract_address→contracts,
  * transfers→distinct token_address→tokens). Here the same topology is a
  * DataFrame lineage graph: "staging files" become plans, the fan-out key
  * extractions become left-semi joins, and the scheduler's DAG falls out of
  * lineage. One Spark job replaces 131 x 5 shell activities; the partition
  * loop (config.py:10-14) becomes a partitioned write.
  */
final case class PipelineConfig(
    exportBlocks: Boolean = true,
    exportTransactions: Boolean = true,
    exportReceipts: Boolean = true,
    exportLogs: Boolean = true,
    exportContracts: Boolean = true,
    exportTokenTransfers: Boolean = true,
    exportTokens: Boolean = true,
    batchSize: Long = 1000L,
    // Optional non-uniform partition layout: block number → (start, end)
    // bounds of its partition. None = uniform batchSize buckets. Used to
    // reproduce the reference's skew-aware 131-partition plan
    // (config.py:10-14) exactly; see [[ExportPipeline.referenceBounds]].
    partitionBounds: Option[Column => (Column, Column)] = None,
    // Per-stage retry budget, the reference's maximumRetries=5
    // (export_pipeline_template.py:49): each stage's write is attempted
    // 1 + maxRetries times before it is declared failed. Retries are safe
    // because every stage sink is a full-path overwrite.
    maxRetries: Int = 5,
    // Fault-injection seam for retry/cascade tests: applied to each stage's
    // cleaned frame just before its write. Production default is identity;
    // a test hook can throw on the first N invocations of a chosen stage to
    // exercise the retry loop deterministically.
    stageInterceptor: (String, DataFrame) => DataFrame = (_, df) => df)

/** Terminal state of one pipeline stage, mirroring AWS Data Pipeline's
  * activity lifecycle under failureAndRerunMode=cascade
  * (export_pipeline_template.py:136): a stage either succeeded (possibly
  * after retries), exhausted its retry budget, or was cascade-failed
  * because an upstream did — dependents of a failed activity never run. */
sealed trait StageStatus
object StageStatus {
  final case class Succeeded(attempts: Int) extends StageStatus
  final case class Failed(attempts: Int, error: String) extends StageStatus
  final case class CascadeFailed(upstream: String) extends StageStatus
}

final case class PipelineResult(
    tables: Map[String, DataFrame],
    stages: Map[String, StageStatus] = Map.empty) {

  /** Pipeline-level dead-letter surface, same channel shape as the ingest
    * operator `etl_dead_letter` (EtlOps.etlDeadLetter): one row per
    * configured stage with an `ok` flag and a nullable `dead_letter`
    * payload carrying the failure (error text, or the upstream name for a
    * cascade). A failed run is thereby data a caller can route/reprocess,
    * not just an exception trace. */
  def deadLetter(spark: SparkSession): DataFrame = {
    import spark.implicits._
    stages.toSeq.map {
      case (name, StageStatus.Succeeded(n)) =>
        (name, true, n.toLong, Option.empty[String])
      case (name, StageStatus.Failed(n, err)) =>
        (name, false, n.toLong, Some(s"failed after $n attempts: $err"))
      case (name, StageStatus.CascadeFailed(up)) =>
        (name, false, 0L, Some(s"cascade: upstream '$up' failed"))
    }.toDF("stage", "ok", "attempts", "dead_letter")
  }
}

/** The retry/cascade stage executor, factored out of the Ethereum export
  * DAG so the LLM curation DAG ([[CurationPipeline]]) runs under the SAME
  * operational contract (export_pipeline_template.py:49,136): a stage body
  * — declaration + idempotent full-path-overwrite write — is attempted
  * `1 + maxRetries` times; once a stage exhausts its budget every
  * transitive dependent is CascadeFailed WITHOUT running (its body is never
  * evaluated, so no partial output is written for a stage whose input is
  * bad). Stages record into an insertion-ordered status map surfaced via
  * [[PipelineResult.deadLetter]]. */
private[pipeline] final class StageRunner(maxRetries: Int) {
  private val status = scala.collection.mutable.LinkedHashMap[String, StageStatus]()

  def stage(name: String, upstreams: Seq[String])(body: => DataFrame): Option[DataFrame] =
    upstreams.find(u => status.get(u).exists {
      case StageStatus.Succeeded(_) => false
      case _                        => true
    }) match {
      case Some(bad) =>
        status(name) = StageStatus.CascadeFailed(bad)
        None
      case None =>
        var attempts = 0
        var result = Option.empty[DataFrame]
        var lastErr = ""
        while (result.isEmpty && attempts <= maxRetries) {
          attempts += 1
          try result = Some(body)
          catch {
            case e: Exception =>
              lastErr = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
          }
        }
        status(name) = result match {
          case Some(_) => StageStatus.Succeeded(attempts)
          case None    => StageStatus.Failed(attempts, lastErr)
        }
        result
    }

  def statuses: Map[String, StageStatus] = status.toMap
}

object ExportPipeline {

  /** Raw-CSV-side schemas: uint256 columns arrive as strings (the reference
    * exports CSV and casts in Glue — convert_transactions_to_parquet.py:36). */
  private def csv(spark: SparkSession, dir: String, name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(s"$dir/$name.csv")

  private val str = StringType
  private val lng = LongType
  private def f(n: String, t: DataType) = StructField(n, t)

  val blocksCsv = StructType(Seq(
    f("number", lng), f("hash", str), f("parent_hash", str), f("nonce", str),
    f("miner", str), f("difficulty", str), f("total_difficulty", str),
    f("size", lng), f("gas_limit", lng), f("gas_used", lng),
    f("timestamp", lng), f("transaction_count", lng), f("all_null_col", str)))

  /** Single source of truth for the CSV-side transactions schema. */
  val transactionsCsv: StructType = Tables.transactionsCsvSchema

  val receiptsCsv = StructType(Seq(
    f("transaction_hash", str), f("contract_address", str),
    f("gas_used", lng), f("status", lng)))

  val logsCsv = StructType(Seq(
    f("transaction_hash", str), f("log_index", lng), f("address", str),
    f("topics", str), f("data", str), f("block_number", lng)))

  val contractsCsv = StructType(Seq(f("address", str), f("bytecode", str)))

  val tokenTransfersCsv = StructType(Seq(
    f("token_address", str), f("from_address", str), f("to_address", str),
    f("value", str), f("transaction_hash", str), f("log_index", lng),
    f("block_number", lng)))

  val tokensCsv = StructType(Seq(
    f("address", str), f("symbol", str), f("name", str),
    f("decimals", lng), f("total_supply", str)))

  private def dec38 = DecimalType(38, 0)

  /** Run the configured stages: ingest raw CSVs from `rawDir`, apply the
    * Glue-job transforms (ApplyMapping casts → DropNullFields), wire the
    * staged fan-out dependencies as semi-joins, write each entity as
    * zero-padded block-range-partitioned Parquet under `outDir`, and return
    * the final DataFrames keyed by table name. */
  def run(spark: SparkSession, cfg: PipelineConfig, rawDir: String, outDir: String): PipelineResult = {
    var out = Map.empty[String, DataFrame]
    val runner = new StageRunner(cfg.maxRetries)
    val bucket = (c: String) => (col(c) / cfg.batchSize).cast(LongType) * cfg.batchSize
    val bounds = (c: String) => cfg.partitionBounds match {
      case Some(f) => f(col(c))
      case None    => (bucket(c), bucket(c) + (cfg.batchSize - 1))
    }

    def finish(name: String, df: DataFrame, blockCol: String): DataFrame = {
      val cleaned = cfg.stageInterceptor(name, EtlOps.dropNullFields(df))
      val (startB, endB) = bounds(blockCol)
      EtlOps.writePartitioned(cleaned, s"$outDir/$name", "parquet", startB, endB)
      // read back with the explicit schema: an empty batch writes no files,
      // and schema inference over zero parquet files fails
      val readBack = EtlOps.readPartitioned(spark, s"$outDir/$name", "parquet", cleaned.schema)
      out += name -> readBack
      cleaned
    }

    // Retry/cascade execution lives in [[StageRunner]] (shared with the
    // curation DAG). Config-disabled stages get no status row, matching the
    // reference template where disabled activities aren't in the DAG at all.
    def stage(name: String, upstreams: Seq[String])(body: => DataFrame): Option[DataFrame] =
      runner.stage(name, upstreams)(body)

    // stage 1: blocks + transactions (config.py:35-38)
    if (cfg.exportBlocks)
      stage("blocks", Nil)(
        finish("blocks", EtlOps.applyMapping(csv(spark, rawDir, "blocks", blocksCsv), Seq(
          ("number", "number", lng), ("hash", "hash", str), ("parent_hash", "parent_hash", str),
          ("nonce", "nonce", str), ("miner", "miner", str),
          ("difficulty", "difficulty", dec38), ("total_difficulty", "total_difficulty", dec38),
          ("size", "size", lng), ("gas_limit", "gas_limit", lng), ("gas_used", "gas_used", lng),
          ("timestamp", "timestamp", lng), ("transaction_count", "transaction_count", lng),
          ("all_null_col", "all_null_col", str))), "number")): Unit

    // the PRE-DropNullFields frame is what downstream stages key from —
    // an all-null column in one batch must not erase a fan-out join column
    val transactions =
      if (cfg.exportTransactions)
        stage("transactions", Nil) {
          val mapped = EtlOps.applyMapping(csv(spark, rawDir, "transactions", transactionsCsv), Seq(
            ("hash", "hash", str), ("nonce", "nonce", lng), ("block_hash", "block_hash", str),
            ("block_number", "block_number", lng), ("transaction_index", "transaction_index", lng),
            ("from_address", "from_address", str), ("to_address", "to_address", str),
            ("value", "value", dec38), ("gas", "gas", lng), ("gas_price", "gas_price", lng),
            ("input", "input", str)))
          finish("transactions", mapped, "block_number")
          mapped
        }
      else None

    // stage 2: receipts, fetched only for exported tx hashes (config.py:40-41).
    // The fan-out key for stage 3 comes from the PRE-DropNullFields frame:
    // an all-null contract_address batch would otherwise drop the column the
    // downstream stage joins on. NO broadcast hint: the tx key set has the
    // same cardinality as the receipts fact — a forced broadcast would ship
    // every transaction hash to every executor (OOM at chain scale); the
    // equi-join shuffles both sides on transaction_hash, and AQE still
    // downgrades to broadcast when a filtered run is actually small.
    val receipts =
      if (cfg.exportReceipts && cfg.exportTransactions)
        stage("receipts", Seq("transactions")) {
          val raw = csv(spark, rawDir, "receipts", receiptsCsv)
            .join(transactions.get.select(col("hash").as("transaction_hash"),
              col("block_number")), Seq("transaction_hash"), "inner")
          finish("receipts", raw, "block_number")
          raw
        }
      else None

    // stage 2b: logs for the same exported tx hashes (config.py:43-44 — the
    // reference exports receipts and logs from one extracted hash file)
    if (cfg.exportLogs && cfg.exportTransactions)
      stage("logs", Seq("transactions")) {
        val keyed = EtlOps.stagedSemiJoin(
          csv(spark, rawDir, "logs", logsCsv),
          transactions.get, "transaction_hash", "hash")
        finish("logs", keyed, "block_number")
      }: Unit

    // stage 3: contracts for receipt contract_addresses (config.py:46-47).
    // The creation block number rides along from the receipt row (min() in
    // case of duplicate receipt rows), so the partitioned write spreads
    // contracts across real block ranges — a lit(0) placeholder would put
    // every contract in one partition at scale. The join doubles as the
    // reference's semi-join filter (inner join on the extracted key set);
    // AQE picks broadcast when the aggregated address→block map is small.
    if (cfg.exportContracts && cfg.exportReceipts && cfg.exportTransactions)
      stage("contracts", Seq("receipts")) {
        val firstSeen = receipts.get
          .filter(col("contract_address").isNotNull)
          .groupBy(col("contract_address").as("address"))
          .agg(min(col("block_number")).as("block_number"))
        val keyed = csv(spark, rawDir, "contracts", contractsCsv)
          .join(firstSeen, Seq("address"), "inner")
        finish("contracts", keyed, "block_number")
      }: Unit

    // stage 4: token transfers (config.py:51-53)
    val transfers =
      if (cfg.exportTokenTransfers)
        stage("token_transfers", Nil)(
          finish("token_transfers",
            EtlOps.applyMapping(csv(spark, rawDir, "token_transfers", tokenTransfersCsv), Seq(
              ("token_address", "token_address", str), ("from_address", "from_address", str),
              ("to_address", "to_address", str), ("value", "value", dec38),
              ("transaction_hash", "transaction_hash", str), ("log_index", "log_index", lng),
              ("block_number", "block_number", lng))), "block_number"))
      else None

    // stage 5: tokens for distinct transfer token_addresses (config.py:56-57).
    // Same pattern as contracts: the token's first-transfer block becomes its
    // partition key, replacing the single-partition lit(0) placeholder.
    if (cfg.exportTokens && cfg.exportTokenTransfers)
      stage("tokens", Seq("token_transfers")) {
        val firstSeen = transfers.get
          .groupBy(col("token_address").as("address"))
          .agg(min(col("block_number")).as("block_number"))
        val keyed = csv(spark, rawDir, "tokens", tokensCsv)
          .join(firstSeen, Seq("address"), "inner")
        finish("tokens", keyed, "block_number")
      }: Unit

    PipelineResult(out, runner.statuses)
  }

  /** A13's literal output, Spark-natively: the deployable DAG artifact a
    * scheduler consumes. The reference's generator renders its stage graph
    * to CloudFormation JSON of Data Pipeline activity objects — id,
    * dependsOn, maximumRetries=5, failureAndRerunMode=cascade, staged
    * output location (generate_export_pipeline_template.py:194-199,
    * export_pipeline_template.py:49,62-199,136-137); this renders the SAME
    * graph semantics (including the config-conditional stage inclusion
    * rules `run` enforces: a stage exists only when its flag AND its
    * upstreams' flags are set) as one row per activity plus the rendered
    * JSON object. Deterministic function of [[PipelineConfig]] — no table
    * input — so the oracle pins the exact artifact as literals, the same
    * way the reference's template would be golden-file tested. */
  def templateObjects(cfg: PipelineConfig): Seq[(Long, String, String, Long, String, String, String)] = {
    val stages = Seq(
      ("blocks", Seq.empty[String], cfg.exportBlocks),
      ("transactions", Seq.empty[String], cfg.exportTransactions),
      ("receipts", Seq("transactions"),
        cfg.exportReceipts && cfg.exportTransactions),
      ("logs", Seq("transactions"), cfg.exportLogs && cfg.exportTransactions),
      ("contracts", Seq("receipts"),
        cfg.exportContracts && cfg.exportReceipts && cfg.exportTransactions),
      ("token_transfers", Seq.empty[String], cfg.exportTokenTransfers),
      ("tokens", Seq("token_transfers"),
        cfg.exportTokens && cfg.exportTokenTransfers))
    stages.filter(_._3).zipWithIndex.map { case ((name, deps, _), i) =>
      val dependsJson = deps.map(d => s""""Activity_$d"""").mkString("[", ",", "]")
      val json = s"""{"id":"Activity_$name","type":"SparkStage",""" +
        s""""maximumRetries":${cfg.maxRetries},"failureAndRerunMode":"cascade",""" +
        s""""dependsOn":$dependsJson,"output":"export/$name"}"""
      (i.toLong, s"Activity_$name", deps.mkString(","),
        cfg.maxRetries.toLong, "cascade", s"export/$name", json)
    }
  }

  /** `pipeline_template` — [[templateObjects]] over the default config. */
  def pipelineTemplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    templateObjects(PipelineConfig())
      .toDF("stage_idx", "activity_id", "depends_on", "max_retries",
        "failure_mode", "output_path", "template_json")
      .orderBy("stage_idx")
  }

  /** The reference's skew-aware 131-partition full-chain layout
    * (config.py:10-14: one wide partition for sparse blocks 0-999999, 30 x
    * 100k for 1M-4M, 100 x 10k for the dense 4M-5M tail), scaled down by
    * `scaleDiv` with the partition COUNT preserved. Pure integer column
    * arithmetic (n - pmod(n, width)) — O(1) per row, codegen'd, no join
    * against a bounds table — so the mapping itself never shuffles. */
  def referenceBounds(scaleDiv: Long): Column => (Column, Column) = {
    require(1000000L % (100L * scaleDiv) == 0, s"scaleDiv $scaleDiv must keep tier widths integral")
    val (t1, w2, w3) = (1000000L / scaleDiv, 100000L / scaleDiv, 10000L / scaleDiv)
    val t2 = 4 * t1
    n => {
      val start = when(n < t1, lit(0L))
        .when(n < t2, n - pmod(n, lit(w2)))
        .otherwise(n - pmod(n, lit(w3)))
      val width = when(n < t1, lit(t1)).when(n < t2, lit(w2)).otherwise(lit(w3))
      (start, start + width - 1)
    }
  }
}
