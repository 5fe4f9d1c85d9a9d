package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Sign-LSH bucket codes of a micro-unit quantized embedding, all
  * hyperplanes in one pass: bit j of group g is
  * `sign(⟨vq, planes[g·bits + j]⟩ ≥ 0)`, the dot an EXACT integer sum
  * (the quantized values are longs, the weights ±1), so the codes are
  * independent of summation order and bit-identical to the DuckDB
  * oracle's per-dimension SQL sum.
  *
  * Same design as [[MinhashSigs]]: the ±1 weight matrix rides along as
  * a constant (flattened, `addReferenceObj` in codegen), the loop is a
  * tight primitive nest in both eval paths, and the whole signature is
  * a per-row projection — no shuffle, signatures stream out of the
  * scan at any corpus size.
  *
  * @param planes flattened groups·bits × dims matrix of ±1 weights
  */
case class SignLshCodes(child: Expression, planes: Array[Int],
    dims: Int, groups: Int, bits: Int)
    extends UnaryExpression {

  require(planes.length == groups * bits * dims)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_lsh_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val vq = input.asInstanceOf[ArrayData]
    val n = math.min(vq.numElements(), dims)
    val codes = new Array[Int](groups)
    var g = 0
    while (g < groups) {
      var code = 0
      var j = 0
      while (j < bits) {
        val base = (g * bits + j) * dims
        var dot = 0L
        var i = 0
        while (i < n) {
          dot += vq.getLong(i) * planes(base + i)
          i += 1
        }
        if (dot >= 0L) code |= 1 << j
        j += 1
      }
      codes(g) = code
      g += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("signPlanes", planes, "int[]")
    nullSafeCodeGen(ctx, ev, vq => {
      val n = ctx.freshName("n"); val g = ctx.freshName("g")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val base = ctx.freshName("base")
      val code = ctx.freshName("code"); val codes = ctx.freshName("codes")
      s"""
         |int $n = Math.min($vq.numElements(), $dims);
         |int[] $codes = new int[$groups];
         |for (int $g = 0; $g < $groups; $g++) {
         |  int $code = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($g * $bits + $j) * $dims;
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += $vq.getLong($i) * $pRef[$base + $i];
         |    }
         |    if ($dot >= 0L) $code |= 1 << $j;
         |  }
         |  $codes[$g] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshCodes =
    copy(child = newChild)
}

object SignLshCodes {
  def apply(vq: Column, planes: Array[Int], dims: Int, groups: Int,
      bits: Int): Column =
    GraftSqlBridge.column(
      SignLshCodes(GraftSqlBridge.expression(vq), planes, dims, groups, bits))
}
