package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t

/** General as-of join operator (SURVEY.md §2.2 `join_asof`): for each left
  * row, the latest right row at-or-before (backward) or earliest at-or-after
  * (forward) its timestamp, per key, optionally tolerance-bounded.
  *
  * Spark has no native as-of join; the scalable formulation here is
  * union-both-sides + one partitioned window:
  *   - exactly one shuffle (by key), no row explosion — a theta-join
  *     formulation is quadratic per key, a per-row subquery is a driver loop;
  *   - skew = key skew only, same as any groupBy on the key;
  *   - tolerance is a post-filter on the matched timestamp, which keeps the
  *     window frame unbounded (cheap running state) instead of range-scanned.
  *
  * Right rows sort before left rows at equal timestamps, so the match is
  * inclusive (`<=` / `>=`), matching DuckDB ASOF JOIN semantics.
  */
object AsofJoin {

  /** @param left        probe side
    * @param right       reference side (the "quotes")
    * @param leftKey     equi-key column on left
    * @param rightKey    equi-key column on right
    * @param leftTime    event-time column on left
    * @param rightTime   event-time column on right
    * @param payloadCols right columns to carry to the output (prefixed asof_)
    * @param forward     false = latest at-or-before; true = earliest at-or-after
    * @param tolerance   max |leftTime - matchedTime| in seconds; None = unbounded
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payloadCols: Seq[String],
           forward: Boolean = false,
           tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    val marked = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .select((Seq(col("__k"), col("__t"), col("__is_left")) ++
        leftCols.map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")) :+
        lit(null).cast(TimestampType).as("asof_time")): _*)
    val quotes = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .select((Seq(col("__k"), col("__t"), col("__is_left")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"asof_$c")) :+
        col(rightTime).cast(TimestampType).as("asof_time")): _*)

    // backward: running last over (t asc, right-first); forward: mirrored
    val w =
      (if (forward)
        Window.partitionBy("__k").orderBy(col("__t").desc, col("__is_left"))
      else
        Window.partitionBy("__k").orderBy(col("__t").asc, col("__is_left")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchCols = payloadCols.map(c => s"asof_$c") :+ "asof_time"
    val joined = marked.unionByName(quotes)
      .select((Seq(col("__k"), col("__t"), col("__is_left")) ++
        leftCols.map(col) ++
        matchCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)
      .filter(col("__is_left") === 1)

    val bounded = tolerance match {
      case Some(s) =>
        val outOfRange = abs(unix_micros(col("__t")) - unix_micros(col("asof_time"))) > s * 1000000L
        matchCols.foldLeft(joined) { (df, c) =>
          df.withColumn(c, when(col("asof_time").isNull || outOfRange,
            lit(null).cast(df.schema(c).dataType)).otherwise(col(c)))
        }
      case None => joined
    }
    bounded.drop("__k", "__t", "__is_left")
  }

  /** `join_asof_forward` — for each event, the EARLIEST order at-or-after
    * it (per user), tolerance-bounded to 90 days: the shipping-window /
    * next-action query shape. */
  def joinAsofForward(spark: SparkSession, dir: String): DataFrame =
    asof(
      left = t(spark, dir, "events").select("event_id", "user_id", "ts"),
      right = t(spark, dir, "orders").select(col("o_custkey"), col("o_orderdate"), col("o_orderkey")),
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      payloadCols = Seq("o_orderdate"),
      forward = true,
      tolerance = Some(90L * 24 * 3600))
      .select(col("event_id"), col("user_id"), col("asof_o_orderdate").as("next_date"))
      .orderBy("event_id")
}
