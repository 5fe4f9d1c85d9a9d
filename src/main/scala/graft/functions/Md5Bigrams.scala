package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The PORTABLE-hash twin of [[HashedBigrams]]: distinct md5-derived
  * word-bigram hashes of a text column in ONE per-row pass — md5
  * because every engine has it, so the DuckDB oracle reproduces each
  * gram hash exactly (`('0x' || substr(md5(gram), 25, 8))::UBIGINT %
  * p`, i.e. the digest's lower 4 bytes big-endian, reduced mod p).
  *
  * Semantically equal to the composed
  * `array_distinct(transform(array_distinct(grams), g ->
  * conv(substring(md5(g), 25, 8), 16, 10) % p))` pipeline (dedup by
  * hash ≡ dedup strings then dedup hashes), but native: higher-order
  * functions are interpreted per element and projection collapse
  * re-evaluates the gram build per consumer, which measured 10.3 s
  * for `llm_minhash_portable` at sf0.1 vs ~1 s for the native
  * `llm_near_dedup` path this mirrors. Tokenization is the same
  * UTF8String.split as the built-in `split(text, ' ')`.
  */
case class Md5Bigrams(child: Expression, mod: Long)
    extends UnaryExpression {

  require(mod > 0 && mod <= Int.MaxValue,
    "mod must be in (0, 2^31] so a*h+b stays within Long downstream")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_bigrams"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5BigramsHelper.compute(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("md5BigramsHelper", Md5BigramsHelper,
      Md5BigramsHelper.getClass.getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $helper.compute($c, ${mod}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Bigrams =
    copy(child = newChild)
}

// Serializable: rides the plan's reference array (addReferenceObj)
object Md5BigramsHelper extends Serializable {
  private val Space = UTF8String.fromString(" ")
  private val Underscore = UTF8String.fromString("_")
  // MessageDigest is stateful — one per thread, reset per use
  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Shared by the interpreted and generated paths. */
  def compute(s: UTF8String, mod: Long): ArrayData = {
    val words = s.split(Space, -1)
    val n = words.length
    if (n < 2) return new GenericArrayData(Array.emptyLongArray)
    val digest = md5.get()
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n - 1)
    var m = 0
    var i = 0
    while (i < n - 1) {
      val gram = UTF8String.concat(words(i), Underscore, words(i + 1))
      digest.reset()
      val d = digest.digest(gram.getBytes)
      // lower 4 digest bytes, big-endian unsigned — the hex tail
      // substr(md5hex, 25, 8) both engines agree on
      var h = (((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) |
        ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)) % mod
      if (h < 0) h += mod // unreachable (operands positive); belt+braces
      if (seen.add(h)) {
        out(m) = h
        m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

object Md5Bigrams {
  /** Distinct md5 gram hashes reduced to [0, mod) — MinHash input form. */
  def apply(text: Column, mod: Long): Column =
    GraftSqlBridge.column(Md5Bigrams(GraftSqlBridge.expression(text), mod))
}
