package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Real Structured Streaming pipelines — the `readStream` twins of
  * [[StreamOps]]. Each takes an unbounded DataFrame (from any streaming
  * source: file, Kafka-shaped, MemoryStream in tests) with the events
  * schema (event_id long, ts timestamp, user_id long, event_type string,
  * value double) and returns the streaming transformation; callers attach
  * `writeStream`. Watermarks bound state so a 100 TB/day stream holds only
  * the open windows per key, not history.
  */
object Streams {

  /** Tumbling 5-minute counts with a 10-minute watermark: late events
    * beyond the watermark are dropped, closed windows emit exactly once in
    * Append mode. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("n"))

  /** Sliding twin of tumblingCounts: 15-minute windows every 5; watermark
    * bounds the ~3x open-window state. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "15 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("n"))

  /** Exactly-once by event_id within the watermark horizon — the streaming
    * dedup that needs only bounded state. */
  def dedupByEventId(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Native streaming session windows (30-minute gap) per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Stream-stream interval join: activity events matched to a signup of
    * the same user within the 10 minutes after it. Both sides carry
    * watermarks, so each side buffers only rows the time-range condition
    * can still match — Spark derives the state eviction bound from the
    * interval, which is what makes unbounded stream⋈stream feasible. The
    * batch analogue (day-bucketed equi-join) is
    * `Relational.joinIntervalBucketed`. */
  def signupActivityJoin(signups: DataFrame, activity: DataFrame): DataFrame = {
    val s = signups
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
    val a = activity
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("user_id"), col("ts").as("act_ts"), col("event_type"))
    a.join(s,
      col("user_id") === col("s_user") &&
        col("act_ts") >= col("signup_ts") &&
        col("act_ts") < col("signup_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("event_id"), col("user_id"), col("signup_ts"), col("act_ts"), col("event_type"))
  }

  // --- custom state: running per-user totals via mapGroupsWithState ---------

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)
  case class UserTotal(user_id: Long, n: Long, total: Double)

  case class Anomaly(user_id: Long, event_id: Long, value: Double, running_avg: Double)

  /** flatMapGroupsWithState: 0..n outputs per group per batch — here an
    * anomaly detector emitting only events whose value exceeds 3x the
    * user's running average (state = running count/sum). The flatMap
    * variant is the shape for emit-on-condition semantics where a group
    * may produce nothing for many batches. */
  def valueAnomalies(events: Dataset[Ev]): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserTotal]) =>
          var st = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
          // fold in (event-time, id) order WITHIN the micro-batch: the
          // group iterator carries shuffle-fetch order, so an unsorted fold
          // would make replays and retries order-dependent — the
          // checkpoint-restart spec compares output bit-for-bit
          evs.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)).foreach { e =>
            if (st.n > 0 && e.value > 3.0 * (st.total / st.n))
              out += Anomaly(uid, e.event_id, e.value, st.total / st.n)
            st = UserTotal(uid, st.n + 1, st.total + e.value)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming near-dup band claims — the live `readStream` twin of
    * [[StreamOps.streamDedupMinhash]]'s candidate stage. Takes an
    * unbounded (doc_id, text) documents frame; per micro-batch each doc's
    * MinHash band signatures probe the band-keyed GroupState, whose owner
    * entries PERSIST across batches — a doc arriving in batch 3 is claimed
    * against an owner admitted in batch 1. State per occupied bucket is
    * one long; the exact-verify join happens downstream against the
    * persisted signature index, exactly as in batch. */
  def nearDupClaims(docs: DataFrame): DataFrame = {
    val sigs = graft.llm.Dedup.minhashSignatureIndex(docs.sparkSession, docs)
    StreamOps.bandClaims(sigs)
  }

  /** TIERED streaming near-dup claims — the 100 TB ingest path. Where
    * [[nearDupClaims]]'s GroupState grows with every distinct signature
    * ever seen (honest asymptote: O(corpus bands) in the executor state
    * store, no TTL), this twin keeps band ownership in a persisted
    * parquet index and runs each micro-batch through
    * [[StreamOps.tieredNearDupBatch]] via `foreachBatch`: probe the index,
    * fold the misses intra-batch, append the new owners as an idempotent
    * per-batch delta, compact on a cadence. Executor state-store bytes:
    * zero — `lastProgress.stateOperators` is empty, which the spec pins.
    * Claims land in `claimsDir/b<batchId>` (overwrite mode — replays
    * rewrite bit-identically); read them back with [[readTieredClaims]]. */
  def tieredNearDupClaims(docs: DataFrame, indexDir: String, claimsDir: String,
                          checkpointDir: String, compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sigs = graft.llm.Dedup.minhashSignatureIndex(batch.sparkSession, batch)
        val bands = graft.llm.Dedup.bandsOf(sigs)
        val claims = StreamOps.tieredNearDupBatch(bands, indexDir, batchId, compactEvery)
        try claims.write.mode("overwrite").parquet(s"$claimsDir/b$batchId")
        finally claims.unpersist(): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Merge view of the tiered claims store: the union of every batch's
    * claims (claims are append-only facts; per-batch overwrite handles
    * replays, so a plain recursive read is the correct merge). */
  def readTieredClaims(spark: org.apache.spark.sql.SparkSession,
                       claimsDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(claimsDir)

  /** Live token-budget admission gate — the `readStream` twin of
    * [[StreamOps.tokenBudgetGate]], on the Spark 4 `transformWithState`
    * API. Takes an unbounded (doc_id, lang, text) documents frame; each
    * micro-batch's documents probe their (lang, shard) ValueState, which
    * the state store PERSISTS across batches — a shard filled in batch 1
    * rejects everything in batch 3. Requires the RocksDB state store
    * provider when run as a real streaming query (HDFS-backed stores don't
    * support the multi-column-family layout TWS uses); the spec sets it. */
  def tokenBudgetAdmissions(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    StreamOps.budgetDocsOf(docs).as[StreamOps.BudgetDoc]
      .groupByKey(d => (d.lang, d.shard))
      .transformWithState(
        new StreamOps.TokenBudgetProcessor(StreamOps.TokenBudgetPerShard),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  case class SessRow(user_id: Long, session_start_us: Long,
                     session_end_us: Long, n_events: Long)

  /** Event-time-TIMER sessionization on `transformWithState` — the part of
    * the Spark 4 stateful API the budget gate doesn't exercise: a session
    * that sees no further events must STILL close once the watermark passes
    * its gap horizon, and only a registered timer can produce output with
    * no input for the key. State per user is one (start, end, n) triple;
    * sessions closed by an arriving out-of-gap event emit inline, the final
    * open session emits from [[SessionTimerProcessor.handleExpiredTimer]].
    *
    * A timer registered for an earlier session extent may fire after the
    * session has been extended; expiry re-checks the CURRENT state against
    * the watermark and re-arms instead of emitting early — timers are a
    * wake-up, never the source of truth. 30-minute gap == the
    * `win_session_gap` batch operator's, and the spec proves the streamed
    * session set equals that batch answer under a multi-batch feed. */
  class SessionTimerProcessor(gapUs: Long) extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, (Long, Long), SessRow] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var sess: ValueState[(Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)]("sess",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    private def arm(endUs: Long): Unit =
      getHandle.registerTimer(endUs / 1000 + gapUs / 1000)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, Long)],
        tv: TimerValues): Iterator[SessRow] = {
      var cur: Option[(Long, Long, Long)] = if (sess.exists()) Some(sess.get()) else None
      val out = Seq.newBuilder[SessRow]
      rows.toSeq.map(_._2).sorted.foreach { us =>
        cur = cur match {
          case Some((s, e, n)) if us - e < gapUs => Some((s, math.max(e, us), n + 1))
          case Some((s, e, n)) => out += SessRow(uid, s, e, n); Some((us, us, 1L))
          case None => Some((us, us, 1L))
        }
      }
      cur.foreach { case (s, e, n) => sess.update((s, e, n)); arm(e) }
      out.result().iterator
    }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessRow] = {
      if (!sess.exists()) Iterator.empty
      else {
        val (s, e, n) = sess.get()
        // the session may have been extended since this timer was armed:
        // only emit if the CURRENT extent is past its gap horizon
        if (tv.getCurrentWatermarkInMs >= e / 1000 + gapUs / 1000) {
          sess.clear()
          Iterator.single(SessRow(uid, s, e, n))
        } else { arm(e); Iterator.empty }
      }
    }
  }

  /** The live query: unbounded events → watermarked event-time TWS with
    * timers. Feed rows in global ts order (the spec does) so nothing is
    * late; a far-future sentinel advances the watermark to flush the tail. */
  def sessionTimers(events: DataFrame, gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }

  /** Arbitrary stateful aggregation: per-user running totals with
    * processing-time timeout — the `mapGroupsWithState` escape hatch for
    * semantics windowed aggregation can't express. */
  def runningUserTotals(events: Dataset[Ev]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          val (n, tot) = evs.foldLeft((prev.n, prev.total)) {
            case ((c, s), e) => (c + 1, s + e.value)
          }
          val next = UserTotal(uid, n, tot)
          state.update(next)
          next
      }
  }
}
