package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t

/** Streaming semantics (SURVEY.md §2.2): the reference has no streaming
  * (its schedule is `ondemand`, export_pipeline_template.py:137); blocks-as-
  * they-arrive is the natural extension. Each operator exists twice:
  *
  *  - a batch-equivalent here (oracle-checkable — same logical semantics
  *    the streaming runtime produces after watermark close), keyed in
  *    SparkEntry;
  *  - the real `readStream` version in [[Streams]], exercised by ScalaTest
  *    with MemoryStream (not oracle-able: incremental state isn't SQL).
  *
  * Time arithmetic runs in microseconds (`unix_micros`) — exact integers,
  * immune to ns/µs precision skew between engines.
  */
object StreamOps {

  /** `stream_tumbling_agg` — 5-minute tumbling windows over events:
    * count + decimal-safe value sum per window. Streaming twin:
    * `withWatermark("ts","10 minutes").groupBy(window($"ts","5 minutes"))`. */
  def tumblingAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_start_us"), col("n"), col("sum_value"))
      .orderBy("win_start_us")

  /** `stream_sliding_agg` — 15-minute windows sliding every 5: each event
    * lands in exactly 3 overlapping windows (Spark materializes the
    * duplication; state per open window is bounded by watermark in the
    * streaming twin `Streams.slidingCounts`). Same epoch alignment as
    * DuckDB's time_bucket, so the overlap set is oracle-expressible as an
    * unnest of the 3 covering window starts. */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "15 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_start_us"), col("n"), col("sum_value"))
      .orderBy("win_start_us")

  /** `stream_dedup_state` — exactly-once per (user, event_type): keep the
    * earliest event. Deterministic row_number formulation (dropDuplicates
    * keeps an arbitrary row); streaming twin: dropDuplicatesWithinWatermark. */
  def dedupState(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** `stream_session_window` — 30-minute-gap sessions per user via the
    * native session_window operator (merging windows under the hood; the
    * same operator is streaming-capable with a watermark). */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_us")
}
