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
    val keyCmp = AsOfJoinExec.comparatorFor(leftKey.dataType)
    val tsCmp = AsOfJoinExec.comparatorFor(leftTs.dataType)
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTs
    val rt = rightTs
    val outSchema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // ONE codegen'd (key, ts) projection per side — field accesses below
      // are primitive reads out of the projected 2-field UnsafeRow, no
      // per-row boxing or interpreted ordering
      val lEval = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rEval = UnsafeProjection.create(Seq(rk, rt), rOut)
      // bind right attrs as nullable: unmatched rows carry the null row
      val outProj = UnsafeProjection.create(
        outSchema, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // memoized (key, ts) of the right head: scans reuse one row object,
      // so memoization is positional — invalidated on every rBuf.next()
      var headValid = false
      var headKT: InternalRow = null
      def headEval(): InternalRow = {
        if (!headValid) { headKT = rEval(rBuf.head); headValid = true }
        headKT
      }
      def advanceRight(): InternalRow = { headValid = false; rBuf.next() }
      // state: the last right row whose (key, ts) is <= the current left
      // cursor, with its evaluated (key, ts) copy for group-change checks
      var lastMatch: InternalRow = null
      var lastKT: InternalRow = null
      lIter.map { lRow =>
        val lKT = lEval(lRow)
        // SQL semantics: a null key or null ts never matches anything —
        // emit the left row unmatched without touching the right cursor
        if (lKT.isNullAt(0) || lKT.isNullAt(1)) {
          outProj(joined(lRow, nullRight))
        } else {
          var advance = true
          while (advance && rBuf.hasNext) {
            val h = headEval()
            if (h.isNullAt(0) || h.isNullAt(1)) advanceRight() // never matches
            else {
              val c = keyCmp.compare(h, 0, lKT, 0)
              if (c < 0) advanceRight() // before our key group: skip
              else if (c == 0 && tsCmp.compare(h, 1, lKT, 1) <= 0) {
                lastKT = h.copy()
                lastMatch = advanceRight().copy()
              } else advance = false
            }
          }
          val matched = lastMatch != null &&
            keyCmp.compare(lastKT, 0, lKT, 0) == 0
          outProj(joined(lRow, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinExec {
  /** Field comparator between two rows, bound to a data type once at plan
    * time. Primitive types compare via direct unboxed accessors (an abstract
    * class, not a Function4, so the JIT sees a monomorphic unboxed call);
    * everything else falls back to the interpreted Catalyst ordering.
    * Callers handle nulls before comparing.
    */
  abstract class RowCmp extends Serializable {
    def compare(a: InternalRow, i: Int, b: InternalRow, j: Int): Int
  }

  import org.apache.spark.sql.types._

  def comparatorFor(dt: DataType): RowCmp = dt match {
    case LongType | TimestampType | TimestampNTZType => new RowCmp {
      def compare(a: InternalRow, i: Int, b: InternalRow, j: Int): Int =
        java.lang.Long.compare(a.getLong(i), b.getLong(j))
    }
    case IntegerType | DateType => new RowCmp {
      def compare(a: InternalRow, i: Int, b: InternalRow, j: Int): Int =
        java.lang.Integer.compare(a.getInt(i), b.getInt(j))
    }
    case DoubleType => new RowCmp {
      def compare(a: InternalRow, i: Int, b: InternalRow, j: Int): Int =
        java.lang.Double.compare(a.getDouble(i), b.getDouble(j))
    }
    case FloatType => new RowCmp {
      def compare(a: InternalRow, i: Int, b: InternalRow, j: Int): Int =
        java.lang.Float.compare(a.getFloat(i), b.getFloat(j))
    }
    case ShortType => new RowCmp {
      def compare(a: InternalRow, i: Int, b: InternalRow, j: Int): Int =
        java.lang.Short.compare(a.getShort(i), b.getShort(j))
    }
    case StringType => new RowCmp {
      def compare(a: InternalRow, i: Int, b: InternalRow, j: Int): Int =
        a.getUTF8String(i).compareTo(b.getUTF8String(j))
    }
    case other =>
      val ord = TypeUtils.getInterpretedOrdering(other)
      new RowCmp {
        def compare(a: InternalRow, i: Int, b: InternalRow, j: Int): Int =
          ord.asInstanceOf[Ordering[Any]]
            .compare(a.get(i, other), b.get(j, other))
      }
  }
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
