package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct-overlap counter against a FIXED token set, built once per task
  * and probed per row.
  *
  * `size(array_intersect(toks, qtoks))` through a broadcast theta join
  * evaluates a fresh hash set per (row, query) pair AND fans every row out
  * |Q| times carrying its full token array through the join (measured: the
  * hybrid-RRF sparse ranker at 11.0 s / 100× was 9× its dense sibling).
  * When the query side is bounded — it always is: queries are a handful of
  * documents — the set can ride along as a per-task reference object and
  * the overlap is one O(|toks|) probe pass per row with zero row fan-out
  * of arrays. Distinct semantics match `array_intersect`/DuckDB
  * `list_intersect` exactly: each query token counts once no matter how
  * often it repeats in the document. */
class OverlapMatcher(val tokens: Array[String]) extends Serializable {
  @transient private lazy val idx: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](tokens.length * 2)
    var i = 0
    while (i < tokens.length) { m.put(UTF8String.fromString(tokens(i)), i); i += 1 }
    m
  }

  /** Count of DISTINCT query tokens present in `a`. Allocates one small
    * boolean scratch per call — thread-safe by construction. */
  def count(a: ArrayData): Int = {
    val seen = new Array[Boolean](tokens.length)
    val n = a.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val tok = a.getUTF8String(i)
      if (tok != null) {
        val m = idx.get(tok)
        if (m != null && !seen(m)) { seen(m) = true; c += 1 }
      }
      i += 1
    }
    c
  }
}

case class TokenOverlapCount(child: Expression, queryTokens: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val matcher = new OverlapMatcher(queryTokens.toArray)

  override def nullSafeEval(input: Any): Any =
    matcher.count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("overlapMatcher", matcher,
      classOf[OverlapMatcher].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenOverlapCount =
    copy(child = newChild)
  override def prettyName: String = "token_overlap_count"
}

object TokenOverlap {
  def overlapCount(toks: Column, queryTokens: Seq[String]): Column =
    GraftBridge.column(TokenOverlapCount(
      Cast(GraftBridge.expression(toks), ArrayType(StringType)), queryTokens))
}
