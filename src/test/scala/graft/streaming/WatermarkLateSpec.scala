package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** stream_watermark_late: the deterministic admission model must (1) equal
  * a sequential driver replay of the batch-boundary watermark rule, and
  * (2) reproduce REAL Structured Streaming admission — an actual
  * MemoryStream run fed the same micro-batches in the same arrival order,
  * with per-window append-mode counts compared window for window. */
class WatermarkLateSpec extends SparkTestBase {

  // Spec-scale constants. Delay is 120.5 s ON PURPOSE: event times are
  // second-aligned and window ends 600 s-aligned, so a half-second offset
  // makes watermark == window-end equality impossible — the spec result
  // cannot hinge on SS's strict-vs-nonstrict boundary predicate.
  private val DelayUs = 120500000L
  private val JitterUs = 600L * 1000000
  private val BatchUs = 300L * 1000000
  private val WindowUs = 600L * 1000000
  private val N = 300
  private val BaseUs = 1700000000L * 1000000

  /** Same 60-bit md5 value both engines derive in watermarkAdmission. */
  private def h60(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private case class Ev(id: Long, tsUs: Long, value: Double) {
    def arrUs: Long = tsUs + h60(id) % JitterUs
    def batch: Long = arrUs - arrUs % BatchUs
    def winStart: Long = tsUs - tsUs % WindowUs
  }

  private def evs: Seq[Ev] =
    (0 until N).map(i => Ev(i.toLong, BaseUs + i.toLong * 37000000L, (i % 97) / 4.0))

  private def modelDf = {
    val sess = spark
    import sess.implicits._
    val df = evs.map(e => (e.id, new Timestamp(e.tsUs / 1000), e.value))
      .toDF("event_id", "ts", "value")
    StreamOps.watermarkAdmission(df, spark, DelayUs, JitterUs, BatchUs, WindowUs)
  }

  /** Sequential reference: replay arrival batches in order, carrying the
    * exclusive running max of event time. */
  private def replay(): Map[Long, (Long, Long)] = {
    val byBatch = evs.groupBy(_.batch).toSeq.sortBy(_._1)
    var runMax = Long.MinValue
    val acc = scala.collection.mutable.Map[Long, (Long, Long)]()
    byBatch.foreach { case (_, rows) =>
      val wm = if (runMax == Long.MinValue) Long.MinValue else runMax - DelayUs
      rows.foreach { e =>
        val late = e.winStart + WindowUs <= wm
        val (a, l) = acc.getOrElse(e.winStart, (0L, 0L))
        acc(e.winStart) = if (late) (a, l + 1) else (a + 1, l)
      }
      runMax = math.max(runMax, rows.map(_.tsUs).max)
    }
    acc.toMap
  }

  test("model equals the sequential batch-by-batch replay; plan has no SinglePartition") {
    val got = modelDf.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = replay()
    assert(got == expect)
    // the rule actually discriminates at spec scale
    assert(got.values.map(_._1).sum > 0 && got.values.map(_._2).sum > 0)
    val plan = modelDf.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global-window trap in:\n$plan")
  }

  test("model admission equals a real MemoryStream run fed the same batches") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF.toDF("event_id", "ts", "value")
    val agg = df.withWatermark("ts", "120500 milliseconds")
      .groupBy(window(col("ts"), "600 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_start_us"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wmlate")
      .outputMode("append").start()
    try {
      evs.groupBy(_.batch).toSeq.sortBy(_._1).foreach { case (_, rows) =>
        input.addData(rows.map(e => (e.id, new Timestamp(e.tsUs / 1000), e.value)))
        q.processAllAvailable()
      }
      // two far-future sentinels in separate batches: the first pushes the
      // watermark past every real window end on the NEXT batch boundary,
      // the second triggers that next batch so append mode emits them all
      // (the stageEventsWithSentinel trick)
      val far = BaseUs + 86400L * 1000000
      input.addData(Seq((900000L, new Timestamp(far / 1000), 0.0)))
      q.processAllAvailable()
      input.addData(Seq((900001L, new Timestamp((far + 700L * 1000000) / 1000), 0.0)))
      q.processAllAvailable()
      val ss = sess.sql("SELECT win_start_us, n FROM wmlate").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val model = modelDf.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // every real window with at least one admitted row must be emitted
      // with exactly the model's admitted count; all-late windows have no
      // state in SS and must be absent
      model.foreach { case (win, (adm, _)) =>
        if (adm > 0) assert(ss.get(win).contains(adm),
          s"window $win: SS=${ss.get(win)} model_admitted=$adm")
        else assert(!ss.contains(win), s"all-late window $win emitted by SS")
      }
      // and SS emitted nothing beyond the model's windows + sentinels
      val sentinelWins = Set(far - far % WindowUs,
        (far + 700L * 1000000) - (far + 700L * 1000000) % WindowUs)
      assert(ss.keySet.subsetOf(model.keySet ++ sentinelWins))
    } finally q.stop()
  }

  test("testdata key is non-degenerate and rerun-identical") {
    val a = StreamOps.streamWatermarkLate(spark, sf).collect()
    assert(a.map(_.getLong(1)).sum > 0, "no admitted rows")
    assert(a.map(_.getLong(2)).sum > 0, "no late rows — jitter/delay degenerate")
    val b = StreamOps.streamWatermarkLate(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
