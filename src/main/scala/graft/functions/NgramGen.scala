package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` (the UDTF extension surface — the
  * explode/posexplode family): emits every contiguous n-token window
  * of a token array as (pos, gram) rows. The analyzer wraps a
  * generator appearing in a SELECT into a `Generate` node exactly as
  * it does for the built-ins, so the operator composes with filters
  * and aggregates downstream; one input row fans out to |tokens|−n+1
  * output rows with no shuffle (the scale shape of every tokenizer /
  * shingling pass). Generators evaluate via `eval` (CodegenFallback —
  * same execution path the built-in `Explode` takes for non-codegen
  * children); the heavy lifting downstream (hash-aggregate over the
  * grams) is still whole-stage-codegen'd.
  */
case class NgramGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "ngram width must be >= 1")

  override def prettyName: String = "ngram_windows"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return Iterator.empty
    (0 to len - n).iterator.map { i =>
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append('_')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      InternalRow(i + 1, UTF8String.fromString(sb.toString))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramGen =
    copy(child = newChild)
}

object NgramGen {
  /** `ngramWindows(tokens, n)` — use in a select like `explode(...)`. */
  def ngramWindows(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(NgramGen(GraftSqlBridge.expression(tokens), n))

  /** `bigramPairs(tokens)` — adjacent-pair generator emitting
    * `(w1, w2)` columns. Unlike the string-joined [[NgramGen]] gram,
    * the tokens stay separate columns, so tokens containing the join
    * character are not conflated and no re-split is needed downstream
    * (exactly what a bigram LM's conditional-count table wants). */
  def bigramPairs(tokens: Column): Column =
    GraftSqlBridge.column(BigramGen(GraftSqlBridge.expression(tokens)))
}

/** Adjacent-token-pair `Generator`: one row fans out to |tokens|−1
  * `(w1, w2)` rows with no shuffle. Same execution surface as
  * [[NgramGen]] (Generate node, CodegenFallback eval, codegen'd
  * aggregate downstream) but emits the two tokens as separate string
  * columns rather than a joined gram — the lossless shape for
  * conditional-probability tables p(w2|w1). */
case class BigramGen(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "bigram_pairs"

  override def elementSchema: StructType = StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < 2) return Iterator.empty
    // clone: getUTF8String returns views into the input row's buffer,
    // which the scan reuses once it advances — a buffering consumer
    // (sort, window) would otherwise read torn values.
    (0 until len - 1).iterator.map { i =>
      InternalRow(arr.getUTF8String(i).clone(), arr.getUTF8String(i + 1).clone())
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BigramGen =
    copy(child = newChild)
}
