package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Squared euclidean distance between a float vector (the stored
  * embedding) and a double vector (a computed centroid) — the k-means
  * assignment kernel. Same design as [[CosineSimF]]: one fused
  * primitive loop in whole-stage codegen instead of three boxed
  * interpreted higher-order folds, same sequential accumulation order
  * on both execution paths.
  */
case class SqEuclidFD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_euclid_fd"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val dv = x.getFloat(i).toDouble - y.getDouble(i)
      acc += dv * dv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val dv = ctx.freshName("dv")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dv = (double) $x.getFloat($i) - $y.getDouble($i);
         |  $acc += $dv * $dv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqEuclidFD =
    copy(left = newLeft, right = newRight)
}

object SqEuclidFD {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      SqEuclidFD(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
