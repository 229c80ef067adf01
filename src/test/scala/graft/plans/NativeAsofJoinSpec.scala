package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NativeAsofJoinSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native as-of join: inclusive backward match, null when nothing before") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-10 00:00:00")),
      (2L, 10L, ts("2024-06-01 00:00:00")),
      (3L, 20L, ts("2024-01-01 00:00:00")),
      (4L, 30L, ts("2024-01-05 00:00:00")))
      .toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), "jan1"),
      (10L, ts("2024-01-10 00:00:00"), "jan10"),
      (10L, ts("2024-02-01 00:00:00"), "feb1"),
      (30L, ts("2024-01-06 00:00:00"), "after"))
      .toDF("rk", "rt", "tag")

    val out = NativeAsofJoin.asof(left, right, "k", "rk", "t", "rt", Seq("tag"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("asof_tag")))).toMap
    assert(out(1L).contains("jan10")) // inclusive tie
    assert(out(2L).contains("feb1"))  // latest at-or-before
    assert(out(3L).isEmpty)           // no right rows for key
    assert(out(4L).isEmpty)           // right row exists but after left time
  }

  test("plan uses AsofJoinExec and matches the union+window implementation on testdata") {
    val native = graft.ops.Relational.joinAsofNative(spark, sf)
    assert(native.queryExecution.executedPlan.toString.contains("AsofJoin"),
      native.queryExecution.executedPlan.toString.take(500))
    val composed = graft.ops.Relational.joinAsof(spark, sf)
      .withColumnRenamed("asof_date", "asof_date")
    // native keeps TIMESTAMP_NTZ (LocalDateTime), the union version coerces
    // to TIMESTAMP (java.sql.Timestamp): compare the instant text only
    def norm(v: Any): String = v.toString.replace('T', ' ').take(16)
    val a = native.collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.get(2)).map(norm)))
    val b = composed.collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.get(2)).map(norm)))
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }
}
