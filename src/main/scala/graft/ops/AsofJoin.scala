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
    val reserved = Seq("__k", "__t", "__is_left", "__match")
    reserved.foreach { r =>
      require(!left.columns.contains(r) && !right.columns.contains(r),
        s"column name $r is reserved by AsofJoin — rename the input column")
    }
    require(!payloadCols.contains("time"),
      "payload column 'time' collides with the asof_time output — alias it first")
    (payloadCols.map(c => s"asof_$c") :+ "asof_time").foreach { out =>
      require(!left.columns.contains(out),
        s"left column $out collides with an asof output column — alias it first")
    }
    val leftCols = left.columns
    // The whole matched right row travels as ONE nullable struct: a
    // per-column last(ignoreNulls) would let a null payload field fall back
    // to an OLDER right row's value, silently mixing rows (DuckDB ASOF JOIN
    // returns the matched row's null). The struct is null exactly on left
    // rows, so last(struct, ignoreNulls) picks the matched row wholesale.
    val matchStructType = StructType(
      StructField("asof_time", TimestampType) +:
        payloadCols.map(c => StructField(s"asof_$c", right.schema(c).dataType)))
    val marked = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .select((Seq(col("__k"), col("__t"), col("__is_left")) ++
        leftCols.map(col) :+
        lit(null).cast(matchStructType).as("__match")): _*)
    // null right keys can never equi-match (SQL semantics) — drop them
    val quotes = right.filter(col(rightKey).isNotNull)
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .select((Seq(col("__k"), col("__t"), col("__is_left")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(
          col(rightTime).cast(TimestampType).as("asof_time") +:
            payloadCols.map(c => col(c).as(s"asof_$c")): _*).as("__match")): _*)

    // backward: running last over (t asc, right-first); forward: mirrored
    val w =
      (if (forward)
        Window.partitionBy("__k").orderBy(col("__t").desc, col("__is_left"))
      else
        Window.partitionBy("__k").orderBy(col("__t").asc, col("__is_left")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = marked.unionByName(quotes)
      .select((Seq(col("__k"), col("__t"), col("__is_left")) ++
        leftCols.map(col) :+
        last(col("__match"), ignoreNulls = true).over(w).as("__match")): _*)
      .filter(col("__is_left") === 1)

    val bounded = tolerance match {
      case Some(s) =>
        val outOfRange =
          abs(unix_micros(col("__t")) - unix_micros(col("__match.asof_time"))) > s * 1000000L
        joined.withColumn("__match",
          when(col("__match").isNull || outOfRange,
            lit(null).cast(matchStructType)).otherwise(col("__match")))
      case None => joined
    }
    val unpacked = (payloadCols.map(c => s"asof_$c") :+ "asof_time")
      .foldLeft(bounded)((df, c) => df.withColumn(c, col(s"__match.$c")))
    unpacked.drop("__k", "__t", "__is_left", "__match")
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
