package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: distinct xxhash64'd word-bigram shingles of a
  * text column, in ONE per-row pass.
  *
  * Semantically equal to the composed
  * `transform(array_distinct(transform(sequence(...), i -> concat(
  * element_at(w,i), '_', element_at(w,i+1)))), x -> xxhash64(x))`
  * pipeline (modulo astronomically-unlikely xxhash64 collisions in the
  * distinct step), but ~20× cheaper: Spark's higher-order functions
  * are CodegenFallback AND re-evaluate the `split` child per element,
  * so the composed form re-tokenizes a document O(words) times per
  * evaluation — and a self-join evaluates it once per join side.
  * Word splitting and hashing call the exact same UTF8String.split /
  * XxHash64Function code paths as the built-in `split`/`xxhash64`, so
  * hashes are bit-identical (a spec asserts this).
  *
  * `mod` > 0 additionally reduces each hash with the same
  * floor-modulus as `pmod(h, mod)` — the form the MinHash signature
  * expression consumes. Fewer-than-two tokens yield an empty array
  * (matching the guarded composed form and DuckDB's `range(n-1)`).
  */
case class HashedBigrams(child: Expression, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_bigrams"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashedBigramsHelper.compute(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("bigramsHelper", HashedBigramsHelper,
      HashedBigramsHelper.getClass.getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $helper.compute($c, ${mod}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBigrams =
    copy(child = newChild)
}

// Serializable: the codegen path ships this object in the plan's
// reference array (addReferenceObj)
object HashedBigramsHelper extends Serializable {
  private val Space = UTF8String.fromString(" ")
  private val Underscore = UTF8String.fromString("_")

  /** Shared by the interpreted and generated paths — one implementation,
    * zero parity risk. */
  def compute(s: UTF8String, mod: Long): ArrayData = {
    // identical tokenization to the built-in split(text, ' ') (regex,
    // limit -1: trailing empty tokens kept)
    val words = s.split(Space, -1)
    val n = words.length
    if (n < 2) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n - 1)
    var m = 0
    var i = 0
    while (i < n - 1) {
      val gram = UTF8String.concat(words(i), Underscore, words(i + 1))
      var h = XxHash64Function.hash(gram, StringType, 42L)
      if (seen.add(h)) {
        if (mod > 0) { h = h % mod; if (h < 0) h += mod }
        out(m) = h
        m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

object HashedBigrams {
  /** Raw 64-bit gram hashes. */
  def apply(text: Column): Column =
    GraftSqlBridge.column(HashedBigrams(GraftSqlBridge.expression(text), 0L))
  /** Gram hashes reduced to [0, mod) — MinHash input form. */
  def apply(text: Column, mod: Long): Column =
    GraftSqlBridge.column(HashedBigrams(GraftSqlBridge.expression(text), mod))
}
