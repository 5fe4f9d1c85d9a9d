package graft.plans

import graft.{QFn, Tables}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, BindReferences, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native AS-OF JOIN — the §2.10 *whole-operator* extension path:
  * a custom `LogicalPlan` node, planned by a custom `SparkStrategy`
  * into a custom `SparkPlan`, demonstrating the full
  * plan → strategy → physical-operator pipeline (preference (c) in the
  * build brief, one level below composing built-ins and one above
  * `mapPartitions`).
  *
  * Semantics: for each left row, the value of `rightValue` from the
  * right row with the same key and the greatest `rightTime` that is
  * at-or-before `leftTime` (ties at equal time match) — or null when
  * no such row exists. Identical to the window-composition `join_asof`
  * operator (operators/Relational.scala), which stays registered as
  * the compose-built-ins twin; both hash-match the same DuckDB
  * correlated-max oracle.
  *
  * Scale shape: `requiredChildDistribution` clusters both sides on the
  * key (with a pinned partition count so the two shuffles stay
  * zip-compatible under AQE) and `requiredChildOrdering` sorts each
  * partition by (key, time) — Catalyst's EnsureRequirements inserts
  * exactly the two hash exchanges + sorts a sort-merge join would get.
  * The merge itself is a single forward pass over both sorted streams
  * per partition: O(|L| + |R|), no buffering beyond one row, no
  * window state — on 1000 executors each task streams its key range.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightValue: Expression, valueAttr: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ valueAttr
  override def producedAttributes: AttributeSet = AttributeSet(valueAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical sort-merge as-of join. Non-null keys and times are
  * required (the API pre-filters); null right keys/times are skipped
  * defensively, a null left key yields a null value. */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightValue: Expression, valueAttr: Attribute,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ valueAttr

  // pin the partition count: both children must hash to the SAME
  // partitioning or zipPartitions would pair unrelated key ranges;
  // the explicit requiredNumPartitions also keeps AQE's partition
  // coalescing from resizing one side independently
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(leftKey :: Nil,
      requiredNumPartitions = Some(conf.numShufflePartitions)),
    ClusteredDistribution(rightKey :: Nil,
      requiredNumPartitions = Some(conf.numShufflePartitions)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output; val rOut = right.output; val outAttrs = output
    val keyType = leftKey.dataType; val timeType = leftTime.dataType
    val (lkU, ltU) = (leftKey, leftTime)
    val (rkU, rtU, rvU) = (rightKey, rightTime, rightValue)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(lkU, lOut)
      val lt = BindReferences.bindReference(ltU, lOut)
      val rk = BindReferences.bindReference(rkU, rOut)
      val rt = BindReferences.bindReference(rtU, rOut)
      val rv = BindReferences.bindReference(rvU, rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val valRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // sorted rows may reuse their backing buffer between next()
      // calls, so every value carried across an advance is copied
      def headKey(): Any = rk.eval(rBuf.head)
      new Iterator[InternalRow] {
        private var haveKey = false
        private var curKey: Any = null
        private var lastVal: Any = null
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          val k = lk.eval(lRow)
          if (k == null) { // null key matches nothing
            valRow.update(0, null)
            return proj(joined(lRow, valRow))
          }
          if (!haveKey || keyOrd.compare(k, curKey) != 0) {
            // new left key: skip right rows sorting before it (nulls
            // sort first under Ascending and are drained here too)
            while (rBuf.hasNext && {
              val hk = headKey()
              hk == null || keyOrd.compare(hk, k) < 0
            }) rBuf.next()
            haveKey = true
            curKey = k match { case s: UTF8String => s.copy(); case v => v }
            lastVal = null
          }
          val t = lt.eval(lRow)
          while (rBuf.hasNext && {
            val hk = headKey()
            hk != null && keyOrd.compare(hk, k) == 0 && {
              val ht = rt.eval(rBuf.head)
              ht != null && timeOrd.compare(ht, t) <= 0
            }
          }) {
            val v = rv.eval(rBuf.next())
            lastVal = v match { case s: UTF8String => s.copy(); case other => other }
          }
          valRow.update(0, lastVal)
          proj(joined(lRow, valRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, rv, attr) =>
      AsOfJoinExec(lk, rk, lt, rt, rv, attr, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOfJoinPlans {

  /** Runtime strategy injection (idempotent). The deployment-time
    * path is `spark.sql.extensions=graft.functions.GraftExtensions`,
    * which injects the same strategy at session build. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** As-of join by column NAME (columns must exist on the respective
    * side; rows with null key/time on either side never match and are
    * pre-filtered from the right). */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightValue: String, outName: String): DataFrame = {
    val spark = leftDf.sparkSession
    install(spark)
    val l = leftDf.queryExecution.analyzed
    val r = rightDf.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .queryExecution.analyzed
    def resolve(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${p.output}"))
    val rValue = resolve(r, rightValue)
    val attr = AttributeReference(outName, rValue.dataType, nullable = true)()
    GraftSqlBridge.ofRows(spark, AsOfJoin(l, r,
      resolve(l, leftKey), resolve(r, rightKey),
      resolve(l, leftTime), resolve(r, rightTime), rValue, attr))
  }

  /** `join_asof_native`: same query + oracle as `join_asof`, executed
    * by the native operator instead of the window composition. */
  val joinAsofNative: QFn = (s, d) => {
    val e = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type")
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"))
    asofJoin(purchases, clicks, "user_id", "c_uid", "ts", "c_ts",
      "c_ts", "last_click_ts")
      .select("event_id", "user_id", "ts", "last_click_ts")
      .orderBy("event_id")
  }

  val entries: Seq[(String, QFn)] = Seq("join_asof_native" -> joinAsofNative)

  val oracles: Seq[(String, String)] = Seq(
    "join_asof_native" ->
      """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
           CAST((SELECT max(c.ts) FROM events c
             WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts) AS TIMESTAMP) AS last_click_ts
         FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""")
}
