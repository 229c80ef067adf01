package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native as-of join — the whole-operator Catalyst integration for the one
  * operator in SURVEY.md §2.2 Spark genuinely lacks (`join_asof`):
  * a LogicalPlan node, a SparkStrategy, and a merge-scan SparkPlan.
  *
  * Contrast with the composition in [[graft.ops.AsofJoin]] (union + window):
  * that plan doubles the row stream, carries a null-padded superset schema
  * through the shuffle, and runs a window state machine. This operator asks
  * Catalyst for exactly what the algorithm needs — co-clustered children
  * sorted by (key, time) — and then streams both sides through one forward
  * merge per partition: O(left + right), no buffering beyond a single
  * candidate row, no row-stream doubling. EnsureRequirements inserts the
  * exchanges/sorts only when the children aren't already partitioned right
  * (e.g. bucketed tables join exchange-free).
  *
  * Semantics: for each left row, the latest right row with equal key and
  * rightTime <= leftTime (inclusive, matching DuckDB ASOF JOIN); unmatched
  * left rows get null payload (left-outer flavor).
  */
object NativeAsofJoin {

  /** Logical node: resolved by construction (built from analyzed children
    * with their own attribute references). */
  final case class AsofJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
      leftTime: Expression, rightTime: Expression,
      payload: Seq[Attribute]) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: AsofJoinPlan → AsofJoinExec. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoinPlan(l, r, lk, rk, lt, rt, p) =>
        AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, p) :: Nil
      case _ => Nil
    }
  }

  /** Install the strategy into a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cur = cs.experimental.extraStrategies
    if (!cur.contains(Strategy)) cs.experimental.extraStrategies = cur :+ Strategy
  }

  /** User-facing API: as-of join two DataFrames through the native operator.
    * `payloadCols` are right-side columns emitted as `asof_<name>`. */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payloadCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    payloadCols.foreach { c =>
      require(!left.columns.contains(s"asof_$c"),
        s"left side already has a column named asof_$c — rename it or the payload")
    }
    // alias the payload up front so output names don't collide with left;
    // null right keys can never equi-match — the executor enforces this
    // too, but filtering here prunes them before the shuffle
    val preparedRight = right.filter(col(rightKey).isNotNull).select(
      (Seq(col(rightKey), col(rightTime)) ++
        payloadCols.map(c => col(c).as(s"asof_$c"))).distinct: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = preparedRight.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    val lt = attr(lPlan, leftTime)
    val rt = attr(rPlan, rightTime)
    val lk = attr(lPlan, leftKey)
    val rk = attr(rPlan, rightKey)
    // the merge compares raw projected values with orderings built from the
    // LEFT types — mixed types (Date vs Timestamp, TZ vs NTZ) would compare
    // garbage silently, so refuse them up front
    require(lt.dataType == rt.dataType,
      s"as-of time types must match exactly: ${lt.dataType} vs ${rt.dataType}")
    require(lk.dataType == rk.dataType,
      s"as-of key types must match exactly: ${lk.dataType} vs ${rk.dataType}")
    val plan = AsofJoinPlan(
      lPlan, rPlan,
      Seq(lk), Seq(rk), lt, rt,
      payloadCols.map(c => attr(rPlan, s"asof_$c")))
    org.apache.spark.sql.GraftBridge.ofRows(spark, plan)
  }
}

/** Physical merge-scan as-of join. Children arrive co-clustered on the join
  * keys and sorted by (keys, time); each partition is one forward merge. */
final case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val payloadAttrs = payload
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rightOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOut)
      // bind against NULLABLE payload attrs: unmatched left rows read the
      // all-null row, and a projection bound to a non-nullable input would
      // skip the null check and emit 0/garbage instead of NULL
      val resultProj = UnsafeProjection.create(
        outAttrs, leftOut ++ payloadAttrs.map(_.withNullability(true)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullPayload = new GenericInternalRow(payloadAttrs.length)
      val joined = new JoinedRow

      var rCurrent: InternalRow = null
      def advanceRight(): Unit = rCurrent = if (rIter.hasNext) rIter.next() else null
      advanceRight()

      var matchKey: UnsafeRow = null
      var matchPayload: UnsafeRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTime = lTimeProj(lRow).copy() // stable across rTimeProj reuse
        // consume right rows that are still at-or-before this left row
        var continue = rCurrent != null
        while (continue) {
          val rKey = rKeyProj(rCurrent)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0 || (c == 0 && timeOrd.compare(rTimeProj(rCurrent), lTime) <= 0)) {
            // null keys never equi-match (SQL semantics) — the asof() API
            // filters them, but the executor owns the invariant for anyone
            // constructing the plan directly
            if (c == 0 && !rKey.anyNull) {
              matchKey = rKey.copy()
              matchPayload = payloadProj(rCurrent).copy()
            }
            advanceRight()
            continue = rCurrent != null
          } else continue = false
        }
        val p =
          if (!lKey.anyNull && matchKey != null && keyOrd.compare(matchKey, lKey) == 0)
            matchPayload
          else nullPayload
        resultProj(joined(lRow, p))
      }
    }
  }
}
