package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class ScalePatternsSpec extends SparkTestBase {

  test("salted two-phase aggregation equals the direct aggregation exactly") {
    val salted = ScalePatterns.aggSkewSalted(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val direct = graft.Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("s"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    val join = ScalePatterns.bucketedJoinPlan(spark, sf)
    val plan = join.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected merge join, got:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans, got:\n$plan")
    // and it still returns the right row count (every order has a customer)
    assert(join.count() == graft.Tables.t(spark, sf, "orders").count())
  }
}
