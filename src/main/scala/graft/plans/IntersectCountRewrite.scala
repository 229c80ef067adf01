package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Expression, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{SortedLongIntersectSize, TokenOverlapCount}

/** Optimizer rule: `size(array_intersect(x, <literal string array>))` (either
  * argument order) → [[TokenOverlapCount]] — the declarative overlap count a
  * user naturally writes gets the kernel the hybrid-RRF ranker uses
  * explicitly (probe #15b: the ArrayIntersect form builds a fresh hash set
  * AND materializes the intersection array per row just to take its length;
  * the kernel is one probe pass against a per-task index, measured 3× on
  * the sparse ranker).
  *
  * The rewrite is exactly count-preserving: `array_intersect` returns the
  * DISTINCT common elements, so its size is the distinct-overlap count the
  * kernel computes; a NULL input array yields NULL on both forms (the rule
  * leaves the legacy `size(NULL) = -1` mode alone), and literals containing
  * NULL elements are skipped (array_intersect can match NULL ∩ NULL; the
  * kernel, built for token sets, does not).
  *
  * Installed by [[graft.GraftExtensions]] via `injectOptimizerRule`; the
  * extensions spec pins both the plan rewrite and result equality. */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def strTokens(l: Literal): Option[Seq[String]] = l.dataType match {
    case ArrayType(StringType, _) if l.value != null =>
      val arr = l.value.asInstanceOf[ArrayData].toObjectArray(StringType)
      if (arr.contains(null)) None
      else Some(arr.map(_.asInstanceOf[UTF8String].toString).toSeq)
    case _ => None
  }

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  /** A child whose output is PROVABLY ascending-sorted and duplicate-free
    * long hashes: the canonical declarative shingle-set spelling
    * `sort_array(array_distinct(x))` (ascending — SortArray's default
    * Literal(true)). Sortedness is a fact of the expression tree, not an
    * assumption about the data, so the merge-kernel rewrite is safe. */
  private def isSortedDistinctLongs(e: Expression): Boolean = e match {
    case SortArray(ArrayDistinct(x), Literal(true, _)) =>
      x.dataType match {
        // containsNull must be false: sort_array(asc) places a NULL element
        // first and the merge kernel would read it via getLong as 0, changing
        // the count for inputs like [null, 5] ∩ [0, 5]. Mirrors the
        // null-element skip in strTokens.
        case ArrayType(LongType, false) => true
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(ai: ArrayIntersect, false) =>
      val rewritten: Option[Expression] = (ai.left, ai.right) match {
        case (l: Literal, x) if isStringArray(x) =>
          strTokens(l).map(TokenOverlapCount(x, _))
        case (x, l: Literal) if isStringArray(x) =>
          strTokens(l).map(TokenOverlapCount(x, _))
        // both sides provably sorted-distinct array<long> → the codegen'd
        // two-pointer merge (functions.SortedSetOps): no per-row hash set,
        // no materialized intersection. Count-preserving for the same
        // reason as the TokenOverlapCount case (distinct overlap count);
        // null arrays propagate null on both forms.
        case (a, b) if isSortedDistinctLongs(a) && isSortedDistinctLongs(b) =>
          Some(SortedLongIntersectSize(a, b))
        case _ => None
      }
      rewritten.getOrElse(s)
  }
}
