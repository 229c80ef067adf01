package graft

import org.apache.spark.sql.SparkSession

// scratch plan-dump main (test scope, not shipped): r17 adjudication of
// join_bloom_pruned — dump the optimized + formatted physical plan so it
// can be diffed against the r15 plan classes recorded in PLANS.md.
object DevBloomPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val df = graft.ops.ScalePatterns.joinBloomPruned(spark, dir)
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== FORMATTED ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    // executed plan after an action (AQE final plan — what actually ran)
    df.collect(): Unit
    println("=== EXECUTED (AQE final) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
