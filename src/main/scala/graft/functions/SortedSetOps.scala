package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd intersection SIZE of two SORTED-DISTINCT `array<long>` columns
  * — the exact-verify kernel every candidate-pair dedup shares.
  *
  * `size(array_intersect(sa, sb))` is semantically right but pays, per
  * candidate pair, a hash set built over one side, a membership probe per
  * element of the other, AND a materialized output array that only gets
  * counted and thrown away. The shingle sets flowing through the verify
  * joins are sorted and deduped by construction
  * ([[graft.llm.Dedup]]'s `hashedShingleSets` sorts and uniquifies in its
  * typed pass), so the intersection size is one allocation-free two-pointer
  * merge — O(|a|+|b|) comparisons, zero boxing, zero output array — that
  * whole-stage codegen inlines straight into the join's consume loop.
  *
  * PRECONDITION (callers': documented, not checked): both arrays ascending
  * and duplicate-free. On unsorted input the merge undercounts — every call
  * site feeds `hashedShingleSets`/`minhashSignatureIndex` outputs, which
  * sort+distinct in the same pass that hashes. Null ARRAYS propagate null
  * (standard BinaryExpression semantics); elements are non-null longs by
  * the primitive-array encoder's construction. */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  // getLong over a non-long array would silently reinterpret raw bytes, so
  // anything but array<long> on both sides must fail analysis, not run.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $n = $a.numElements();
        int $m = $b.numElements();
        int $i = 0, $j = 0, $c = 0;
        while ($i < $n && $j < $m) {
          long $xv = $a.getLong($i);
          long $yv = $b.getLong($j);
          if ($xv == $yv) { $c++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongIntersectSize =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_size"
}

object SortedSetOps {
  /** Intersection size of two sorted-distinct `array<long>` columns. No
    * cast coercion on purpose: the kernel is only correct on the long-hash
    * shingle sets, and a silent cast would invite misuse on unsorted
    * string arrays — a wrong-type input should fail analysis instead. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftBridge.column(SortedLongIntersectSize(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
