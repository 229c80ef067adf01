package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable Structured Streaming demo: a rate source shaped into the events
  * schema drives the real readStream pipelines for a bounded wall-clock
  * window, printing each micro-batch. Demonstrates the engine's streaming
  * path outside the test harness:
  *
  * Run with the Spark jars dir and target/scala-2.13/classes on the
  * classpath: `java -cp ... graft.streaming.StreamDemo [seconds]`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val runSeconds = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // rate source → events shape: ~200 synthetic events/sec across 15 users
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", 200).load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        (col("value") % 15).as("user_id"),
        element_at(array(lit("click"), lit("view"), lit("purchase")),
          (col("value") % 3).cast("int") + 1).as("event_type"),
        (col("value") % 500).cast("double").as("value"))

    val q = Streams.tumblingCounts(
        events.withColumn("ts", col("ts"))) // 5-minute windows over live time
      .writeStream.format("console")
      .outputMode("update")
      .option("truncate", "false")
      .start()

    q.awaitTermination(runSeconds * 1000L)
    q.stop()
    println(s"[stream-demo] processed ${q.recentProgress.length} micro-batches")
    spark.stop()
  }
}
