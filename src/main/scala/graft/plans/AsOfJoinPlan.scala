package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: the full custom-operator ladder (LogicalPlan →
  * Strategy → SparkPlan) for the one operator where a dedicated physical
  * plan beats composition. The union-window formulation
  * ([[graft.operators.EventOps.asOfJoinBackward]]) shuffles and sorts the
  * UNION of both sides and then windows over it; this exec declares
  * `requiredChildDistribution`/`requiredChildOrdering` so Catalyst shuffles
  * and sorts each side independently (smaller sorts, reusable exchanges)
  * and then streams a single-pass merge per partition: for each left row in
  * (key, ts) order, the most recent right row with `r.ts <= l.ts`
  * (backward-inclusive, same semantics as the union-window plan).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression)
    extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTs
    val rt = rightTs
    val outSchema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyEval = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyEval = UnsafeProjection.create(Seq(rk), rOut)
      val lTsEval = UnsafeProjection.create(Seq(lt), lOut)
      val rTsEval = UnsafeProjection.create(Seq(rt), rOut)
      // bind right attrs as nullable: unmatched rows carry the null row
      val outProj = UnsafeProjection.create(
        outSchema, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // state: the last right row whose (key, ts) is <= the current left
      // cursor, with its evaluated key for group-change detection
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null
      lIter.map { lRow =>
        val lKeyRow = lKeyEval(lRow)
        val lKeyVal = lKeyRow.get(0, lk.dataType)
        val lTsVal = lTsEval(lRow).get(0, lt.dataType)
        var advance = true
        while (advance && rBuf.hasNext) {
          val head = rBuf.head
          val hKey = rKeyEval(head).get(0, rk.dataType)
          val c = keyOrd.asInstanceOf[Ordering[Any]].compare(hKey, lKeyVal)
          if (c < 0) { rBuf.next() } // before our key group: skip
          else if (c == 0 &&
            tsOrd.asInstanceOf[Ordering[Any]].compare(
              rTsEval(head).get(0, rt.dataType), lTsVal) <= 0) {
            val taken = rBuf.next().copy()
            lastMatch = taken
            lastMatchKey = rKeyEval(taken).copy().get(0, rk.dataType)
          } else advance = false
        }
        val matched = lastMatch != null && lastMatchKey != null &&
          keyOrd.asInstanceOf[Ordering[Any]].compare(lastMatchKey, lKeyVal) == 0
        outProj(joined(lRow, if (matched) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the exec. Registered via
  * [[GraftExtensions]] or `spark.experimental.extraStrategies`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** User-facing builder. Right-side columns should be pre-renamed to avoid
  * duplicate output names; right columns are null when no match exists.
  */
object AsOfJoinNative {
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTsCol: String,
      rightTsCol: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = GraftBridge.analyzed(left)
    val rPlan = GraftBridge.analyzed(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    GraftBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      attr(lPlan, leftKeyCol), attr(rPlan, rightKeyCol),
      attr(lPlan, leftTsCol), attr(rPlan, rightTsCol)))
  }
}
