package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.Tables.t

class AggregatesSpec extends SparkTestBase {

  test("win_moving_avg_range: day-bucket plan equals the RANGE window, with no Window node") {
    val got = Aggregates.winMovingRange(spark, sf)

    // The whole point of the rewrite: the single-task global window is gone.
    // Any WindowExec in this plan would mean the entire fact table funnels
    // through one partition at scale.
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"plan still contains a Window operator:\n$plan")
    // ... and the per-day frame comes back via broadcast, not a shuffle of
    // the fact table.
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"moving-day frame is not broadcast:\n$plan")

    // Reference semantics: the textbook RANGE BETWEEN 7 PRECEDING AND
    // CURRENT ROW global window (fine at test scale).
    val day = datediff(col("o_orderdate"), lit("1970-01-01")).cast(LongType)
    val w = Window.orderBy("d").rangeBetween(-7, 0)
    val want = t(spark, sf, "orders")
      .withColumn("d", day)
      .withColumn("mv_sum", sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast(DecimalType(38, 2)))
      .withColumn("mv_n", count(lit(1)).over(w))
      .select("o_orderkey", "d", "mv_sum", "mv_n")

    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "day-bucket moving range diverges from the RANGE window formulation")
  }
}
