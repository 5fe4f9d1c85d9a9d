package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Count of DISTINCT common elements of two long arrays — the exact
  * value of `size(array_intersect(a, b))`, without materializing the
  * intersection (and, on the distinct gram sets every caller feeds
  * it, `size(array_union)` falls out as |A| + |B| − shared), so the
  * set-similarity verify joins stop allocating two derived arrays
  * per candidate pair. One open-addressed primitive-long probe table
  * per row (sized to the SMALLER side), built and scanned inside
  * whole-stage codegen via the shared helper — the same
  * helper-object pattern as [[HashedBigramsHelper]], one
  * implementation for both execution paths. Same-session A/B at
  * sf0.1 (best-of-3): llm_near_dedup_exact 4.79 → 2.16 s (it paid
  * for intersect AND union arrays per pair), llm_ngram_jaccard
  * 2.27 → 1.84 s, oracles bit-identical. */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountHelper.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("intersectHelper", IntersectCountHelper,
      IntersectCountHelper.getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $helper.count($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCountHelper extends Serializable {
  /** Fibonacci-hash mix for the open-addressed probe. */
  private final val Mix = -7046029254386353131L // 0x9E3779B97F4A7C15

  def count(x: ArrayData, y: ArrayData): Int = {
    val (small, large) =
      if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val n = small.numElements()
    if (n == 0) return 0
    // power-of-two capacity at < 0.5 load; 0 is the empty slot, a
    // real 0 value is tracked out-of-band
    var cap = 4
    while (cap < n * 2) cap <<= 1
    val shift = 64 - java.lang.Long.numberOfTrailingZeros(cap)
    val table = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    var i = 0
    while (i < n) {
      val v = small.getLong(i)
      if (v == 0L) hasZero = true
      else {
        var idx = ((v * Mix) >>> shift).toInt & mask
        while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & mask
        table(idx) = v
      }
      i += 1
    }
    // per-slot hit flags make the count DISTINCT even if the large
    // side carries duplicates (callers pass distinct sets; this keeps
    // the expression a drop-in for size(array_intersect) regardless)
    val hit = new Array[Boolean](cap)
    var zeroHit = false
    var c = 0
    val m = large.numElements()
    var j = 0
    while (j < m) {
      val v = large.getLong(j)
      if (v == 0L) {
        if (hasZero && !zeroHit) { zeroHit = true; c += 1 }
      } else {
        var idx = ((v * Mix) >>> shift).toInt & mask
        while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & mask
        if (table(idx) == v && !hit(idx)) { hit(idx) = true; c += 1 }
      }
      j += 1
    }
    c
  }
}

object IntersectCount {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      IntersectCount(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
