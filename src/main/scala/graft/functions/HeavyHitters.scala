package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native
  * `TypedImperativeAggregate` — the same Catalyst surface Spark's own
  * sketches (HyperLogLog++, ApproximatePercentile) are built on, and
  * the shape any bounded-memory frequency sketch takes at 100 TB:
  * each task keeps at most `k` counters regardless of input
  * cardinality, partials serialize to a few hundred bytes, and merge
  * is associative/commutative (Agarwal et al., "Mergeable Summaries",
  * PODS 2012), so 1000 executors combine partials in any tree order.
  *
  * Guarantees (n = total rows observed):
  *  - every item with true frequency > n/(k+1) is present;
  *  - each reported count is a LOWER bound, within n/(k+1) of truth;
  *  - when the column has ≤ k distinct values no decrement ever
  *    fires, so every count is EXACT — which is what makes the
  *    `agg_heavy_hitters` key DuckDB-oracle-able while the small-k
  *    spec exercises the approximate regime.
  *
  * Output: rows of (item, cnt) sorted by (cnt desc, item) — fully
  * deterministic for exact inputs on any partitioning.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "misra_gries capacity must be >= 1")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // classic MG step: a miss with a full table decrements every
        // counter (conceptually pairing the new item with k existing
        // ones); zeros free their slots
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (key, c) =>
          if (c == 1L) dead += key else buf.update(key, c - 1) }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) => buf.update(item, buf.getOrElse(item, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything and drop
      // non-positives: keeps ≤ k counters and preserves the n/(k+1)
      // error bound under arbitrary merge trees
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else buf.update(key, c - cut) }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c) })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) => out.writeUTF(item); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { val item = in.readUTF(); buf.update(item, in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Column-API entry: `misraGries(col, k)` aggregates to the sorted
    * (item, cnt) summary array. */
  def misraGries(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGries(GraftSqlBridge.expression(c), k).toAggregateExpression())
}
