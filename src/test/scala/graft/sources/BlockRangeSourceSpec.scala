package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BlockRangeSourceSpec extends SparkTestBase {

  private def read(start: Long, end: Long, batch: Long) =
    spark.read.format("graft.sources.BlockRangeSource")
      .option("start", start).option("end", end).option("batchSize", batch)
      .load()

  test("generates the inclusive range, one partition per batch") {
    val df = read(0, 24999, 10000)
    assert(df.count() == 25000)
    assert(df.rdd.getNumPartitions == 3) // 10k,10k,5k
    val mm = df.agg(min("number"), max("number")).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 24999L)
  }

  test("number predicates prune whole batch partitions") {
    val pruned = read(0, 99999, 10000).filter(col("number") >= 70000L)
    assert(pruned.rdd.getNumPartitions == 3) // batches 7,8,9 only
    assert(pruned.count() == 30000)
    // residual filter still applied inside surviving partitions
    val tight = read(0, 99999, 10000).filter(col("number").between(70500L, 70600L))
    assert(tight.count() == 101)
  }

  test("column pruning reaches the reader") {
    val df = read(0, 999, 1000).select("miner")
    // readSchema of the scan contains only the pruned column
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(df.distinct().count() == 97)
  }

  test("deterministic content with exact decimal difficulty") {
    val r = read(5, 5, 1).head()
    assert(r.getAs[Long]("number") == 5L)
    assert(r.getAs[String]("hash") == "0x%010d".format((5L * 2654435761L) % 1000000007L))
    assert(r.getAs[java.math.BigDecimal]("difficulty").longValueExact() == 5L * 131072L)
  }

  test("micro-batch stream follows the chain head and equals the batch read") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_brs_ckpt").toString
    val stream = spark.readStream.format("graft.sources.BlockRangeSource")
      .option("start", 0).option("end", 499)
      .option("batchSize", 100).option("blocksPerTrigger", 200)
      .load()
    val q = stream.writeStream
      .format("memory").queryName("brs_stream")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("brs_stream")
    // exactly-once, complete, and identical to the batch read
    assert(got.count() == 500)
    assert(got.select("number").distinct().count() == 500)
    val batch = read(0, 499, 100)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // the head advanced in blocksPerTrigger steps: at least 3 microbatches
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.length >= 3, s"expected >=3 non-empty microbatches, got ${progress.length}")
    assert(progress.forall(_.numInputRows <= 200))
  }
}
