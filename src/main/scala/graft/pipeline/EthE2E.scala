package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end benchmark at the reference's full-chain shape: synthesize a
  * chain-shaped raw CSV corpus (blocks 0..N-1 with transactions, receipts,
  * logs, contracts, token transfers and tokens riding on them), then time
  *
  *  1. the full 7-table [[ExportPipeline]] run — CSV ingest → ApplyMapping
  *     casts → fan-out joins → DropNullFields → zero-padded block-range-
  *     partitioned Parquet under the reference's exact 131-partition layout
  *     ([[ExportPipeline.referenceBounds]], config.py:10-14 scaled), and
  *  2. the per-table Glue-job analogue — the reference's three independent
  *     conversion scripts (convert_{blocks,transactions,token_transfers}_
  *     to_parquet.py), each a standalone CSV→cast→partitioned-Parquet job
  *     with no cross-table stages,
  *
  * printing one JSON line with both wall times and the partition-count
  * parity check (every table must land in <= 131 block-range partitions,
  * blocks in exactly 131).
  *
  * Usage: EthE2E [scaleDiv] [workDir]. scaleDiv divides the 5M-block chain
  * (default 10 → 500k blocks, ~1M transactions); the 131-partition layout
  * is preserved at every scale.
  */
object EthE2E {

  /** Deterministic chain-shaped corpus, generated distributed (spark.range,
    * no driver-side rows) and written as headered CSV — the reference's
    * export format. Row counts: N blocks, 2N transactions, 2N receipts,
    * 2N logs, N/25 contract creations, N/5 token transfers, 100 tokens. */
  def synthesizeChain(spark: SparkSession, nBlocks: Long, rawDir: String): Unit = {
    val hex64 = (c: Column) => concat(lit("0x"), lpad(lower(hex(c)), 64, "0"))
    val hex40 = (c: Column) => concat(lit("0x"), lpad(lower(hex(c)), 40, "0"))

    def csv(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").option("header", "true").csv(s"$rawDir/$name.csv")

    val b = spark.range(nBlocks).toDF("number")
    csv(b.select(
      col("number"),
      hex64(col("number")).as("hash"),
      hex64(col("number") - 1).as("parent_hash"),
      lpad(lower(hex(pmod(col("number") * 2654435761L, lit(1L << 62)))), 16, "0").as("nonce"),
      hex40(pmod(col("number"), lit(1000))).as("miner"),
      (col("number") * 131 + 7).cast(StringType).as("difficulty"),
      (col("number") * col("number")).cast(StringType).as("total_difficulty"),
      (lit(500) + pmod(col("number"), lit(30000))).as("size"),
      lit(8000000L).as("gas_limit"),
      pmod(col("number") * 21000, lit(8000000L)).as("gas_used"),
      (lit(1438269973L) + col("number") * 15).as("timestamp"),
      lit(2L).as("transaction_count"),
      lit(null).cast(StringType).as("all_null_col")), "blocks")

    val tx = spark.range(nBlocks * 2).toDF("i")
      .withColumn("block_number", expr("i DIV 2"))
    csv(tx.select(
      hex64(col("i") + 1000000000L).as("hash"),
      pmod(col("i"), lit(100)).as("nonce"),
      hex64(col("block_number")).as("block_hash"),
      col("block_number"),
      pmod(col("i"), lit(2)).as("transaction_index"),
      hex40(pmod(col("i") * 7, lit(100000))).as("from_address"),
      hex40(pmod(col("i") * 13 + 1, lit(100000))).as("to_address"),
      (col("i") * 1000000000L + 42).cast(StringType).as("value"),
      lit(21000L).as("gas"),
      (lit(1000000000L) + pmod(col("i"), lit(100)) * 1000000L).as("gas_price"),
      when(pmod(col("i"), lit(10)) === 0, lit("0xa9059cbb")).otherwise(lit("0x")).as("input")),
      "transactions")

    // every 50th transaction creates a contract
    csv(tx.select(
      hex64(col("i") + 1000000000L).as("transaction_hash"),
      when(pmod(col("i"), lit(50)) === 0, hex40(col("i") + 5000000000L))
        .otherwise(lit(null).cast(StringType)).as("contract_address"),
      lit(21000L).as("gas_used"),
      lit(1L).as("status")), "receipts")

    csv(tx.select(
      hex64(col("i") + 1000000000L).as("transaction_hash"),
      pmod(col("i"), lit(4)).as("log_index"),
      hex40(pmod(col("i") * 3, lit(100000))).as("address"),
      hex64(pmod(col("i"), lit(16))).as("topics"),
      lit("0x00").as("data"),
      col("block_number")), "logs")

    csv(tx.filter(pmod(col("i"), lit(50)) === 0).select(
      hex40(col("i") + 5000000000L).as("address"),
      concat(lit("0x60806040"), lpad(lower(hex(pmod(col("i"), lit(65536)))), 8, "0"))
        .as("bytecode")), "contracts")

    // every 10th transaction is an ERC-20 transfer over 100 distinct tokens
    val transfers = tx.filter(pmod(col("i"), lit(10)) === 0)
    csv(transfers.select(
      hex40(pmod(col("i"), lit(100)) + 7000000000L).as("token_address"),
      hex40(pmod(col("i") * 7, lit(100000))).as("from_address"),
      hex40(pmod(col("i") * 13 + 1, lit(100000))).as("to_address"),
      (col("i") * 1000000L + 9).cast(StringType).as("value"),
      hex64(col("i") + 1000000000L).as("transaction_hash"),
      pmod(col("i"), lit(4)).as("log_index"),
      col("block_number")), "token_transfers")

    csv(spark.range(100).select(
      hex40(col("id") + 7000000000L).as("address"),
      concat(lit("TOK"), col("id")).as("symbol"),
      concat(lit("Token "), col("id")).as("name"),
      lit(18L).as("decimals"),
      lit("1000000000000000000000000").as("total_supply")), "tokens")
  }

  /** The per-table Glue-job analogue: each of the reference's three
    * conversion scripts as an independent CSV→ApplyMapping→partitioned-
    * Parquet job, no fan-out stages (the other four tables have no
    * standalone Glue script in the reference). */
  def glueAnalogue(spark: SparkSession, rawDir: String, outDir: String,
                   bounds: org.apache.spark.sql.Column => (org.apache.spark.sql.Column, org.apache.spark.sql.Column)): Unit = {
    import graft.etl.EtlOps
    val str = StringType; val lng = LongType; val dec38 = DecimalType(38, 0)
    def one(name: String, schema: StructType, mapping: Seq[(String, String, DataType)],
            blockCol: String): Unit = {
      val df = EtlOps.applyMapping(
        spark.read.schema(schema).option("header", "true").csv(s"$rawDir/$name.csv"), mapping)
      val (s, e) = bounds(col(blockCol))
      EtlOps.writePartitioned(EtlOps.dropNullFields(df), s"$outDir/$name", "parquet", s, e)
    }
    one("blocks", ExportPipeline.blocksCsv, Seq(
      ("number", "number", lng), ("hash", "hash", str), ("parent_hash", "parent_hash", str),
      ("nonce", "nonce", str), ("miner", "miner", str),
      ("difficulty", "difficulty", dec38), ("total_difficulty", "total_difficulty", dec38),
      ("size", "size", lng), ("gas_limit", "gas_limit", lng), ("gas_used", "gas_used", lng),
      ("timestamp", "timestamp", lng), ("transaction_count", "transaction_count", lng),
      ("all_null_col", "all_null_col", str)), "number")
    one("transactions", ExportPipeline.transactionsCsv, Seq(
      ("hash", "hash", str), ("nonce", "nonce", lng), ("block_hash", "block_hash", str),
      ("block_number", "block_number", lng), ("transaction_index", "transaction_index", lng),
      ("from_address", "from_address", str), ("to_address", "to_address", str),
      ("value", "value", dec38), ("gas", "gas", lng), ("gas_price", "gas_price", lng),
      ("input", "input", str)), "block_number")
    one("token_transfers", ExportPipeline.tokenTransfersCsv, Seq(
      ("token_address", "token_address", str), ("from_address", "from_address", str),
      ("to_address", "to_address", str), ("value", "value", dec38),
      ("transaction_hash", "transaction_hash", str), ("log_index", "log_index", lng),
      ("block_number", "block_number", lng)), "block_number")
  }

  /** Count start_block=... partition dirs of a written table. */
  def partitionCount(table: java.io.File): Int =
    Option(table.listFiles()).toSeq.flatten
      .count(f => f.isDirectory && f.getName.startsWith("start_block="))

  def main(args: Array[String]): Unit = {
    val scaleDiv = args.headOption.map(_.toLong).getOrElse(10L)
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_eth_e2e").toString)
    val nBlocks = 5000000L / scaleDiv
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Tables.scratchDir("wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    synthesizeChain(spark, nBlocks, s"$work/raw")
    val tSynth = (System.nanoTime() - t0) / 1e9

    val bounds = ExportPipeline.referenceBounds(scaleDiv)
    val t1 = System.nanoTime()
    val result = ExportPipeline.run(spark,
      PipelineConfig(partitionBounds = Some(bounds)), s"$work/raw", s"$work/out")
    val tPipeline = (System.nanoTime() - t1) / 1e9
    // Row counts are read-back diagnostics, not pipeline work — kept outside
    // the timed window so pipeline_7table_sec is comparable to glue_3table_sec
    // (which runs no count jobs).
    val nRows = result.tables.map { case (k, v) => s""""$k":${v.count()}""" }

    val t2 = System.nanoTime()
    glueAnalogue(spark, s"$work/raw", s"$work/glue", bounds)
    val tGlue = (System.nanoTime() - t2) / 1e9

    val partCounts = Seq("blocks", "transactions", "receipts", "logs",
      "contracts", "token_transfers", "tokens").map { t =>
      s""""$t":${partitionCount(new java.io.File(s"$work/out/$t"))}"""
    }
    spark.stop()
    println(s"""{"metric":"eth_e2e","n_blocks":$nBlocks,"scale_div":$scaleDiv,""" +
      s""""synth_sec":${f"$tSynth%.1f"},"pipeline_7table_sec":${f"$tPipeline%.1f"},""" +
      s""""glue_3table_sec":${f"$tGlue%.1f"},""" +
      s""""partitions":{${partCounts.mkString(",")}},""" +
      s""""rows":{${nRows.mkString(",")}},"work":"$work"}""")
  }
}
