package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins [[Dedup.healScanStarvation]]'s byte-floored gate (r15 verdict):
  * a starved-looking scan is only repartitioned when its LEAF bytes keep
  * every healed task above ~4 MB — so a tiny single-file table keeps its
  * one-task map-only plan, while a dense single-file input wide enough to
  * matter fans out to ceil(bytes/4MB) capped at the shuffle width. */
class HealSpec extends SparkTestBase {

  test("heal is a no-op on a tiny single-file scan (byte floor)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_heal_tiny").toString
    spark.range(500)
      .select(col("id").as("doc_id"), md5(col("id").cast("string")).as("text"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(df.rdd.getNumPartitions === 1) // precondition: starved-looking
    val healed = Dedup.healScanStarvation(df, col("doc_id"))
    assert(healed.rdd.getNumPartitions === 1,
      "584-KB-class scans must keep their map-only plan")
    assert(healed.queryExecution.optimizedPlan.canonicalized ===
      df.queryExecution.optimizedPlan.canonicalized,
      "no-op branch must not rewrite the plan at all")
  }

  test("heal fans a dense single-file scan out to ceil(bytes/4MB), capped at width") {
    val dir = java.nio.file.Files.createTempDirectory("graft_heal_dense").toString
    // ~90 MB raw of incompressible hex (sha512 of distinct ids) in ONE file:
    // parquet can't squeeze it under the 8 MB needed to clear the floor.
    spark.range(150000)
      .select(col("id").as("doc_id"),
        concat((1 to 3).map(s => sha2(concat(col("id").cast("string"), lit(s)), 512)): _*)
          .as("text"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // reproduce the probe-corpus condition (one planned task for the whole
    // file — there it was a single pyarrow row group): pin the split floor
    // so the scan plans 1 partition despite the bytes
    val saveMin = spark.conf.getOption("spark.sql.files.minPartitionNum")
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    try {
      val df = spark.read.parquet(dir)
      assert(df.rdd.getNumPartitions === 1)
      val leafBytes = df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.stats.sizeInBytes).sum
      assert(leafBytes > BigInt(8L << 20), s"fixture too small: $leafBytes")
      val width = spark.conf.get("spark.sql.shuffle.partitions").toInt // 4 in tests
      val expect = ((leafBytes + (4L << 20) - 1) / (4L << 20)).min(BigInt(width)).toInt
      assert(expect > 1)
      val healed = Dedup.healScanStarvation(df, col("doc_id"))
      assert(healed.rdd.getNumPartitions === expect)
    } finally {
      saveMin match {
        case Some(v) => spark.conf.set("spark.sql.files.minPartitionNum", v)
        case None => spark.conf.unset("spark.sql.files.minPartitionNum")
      }
    }
  }
}
