package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd vector kernels over `array<double>` columns.
  *
  * The declarative formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is semantically identical but evaluates interpreted — one boxed lambda
  * call per element. These expressions emit a tight primitive loop inside
  * whole-stage codegen with the SAME sequential fold order, so results stay
  * bit-identical to the DuckDB `list_reduce` oracles while the hot loops
  * (similarity scoring, k-means assignment) run at JVM speed.
  *
  * Elements are assumed non-null (embedding vectors); lengths are clamped
  * to the shorter side like `zip_with`.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Squared euclidean distance — the k-means assignment kernel. */
case class SquaredDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = $a.getDouble($i) - $b.getDouble($i);
          $s += $d * $d;
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredDistance =
    copy(left = l, right = r)
  override def prettyName: String = "vec_sqdist"
}

object VectorOps {
  // getDouble over a non-double array would silently reinterpret raw bytes,
  // so the builders force array<double>: numeric arrays coerce via Cast,
  // anything else fails analysis with a proper DATATYPE_MISMATCH.
  private def asDoubleArray(c: Column): Expression =
    Cast(GraftBridge.expression(c), ArrayType(DoubleType))

  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(asDoubleArray(a), asDoubleArray(b)))

  def vecSqDist(a: Column, b: Column): Column =
    GraftBridge.column(SquaredDistance(asDoubleArray(a), asDoubleArray(b)))
}
