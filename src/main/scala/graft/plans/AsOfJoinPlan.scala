package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator Catalyst integration for the as-of join — the (c) tier
  * of the custom-operator ladder (SURVEY §7.3 / engine guide): a logical
  * node, a planner strategy, and a physical sort-merge operator.
  *
  * Semantics are identical to `operators.AsOfJoin.asof` (the built-in
  * composition): for each left row, the latest right row with equal key
  * and rightTime <= leftTime; right-time ties resolve to the greatest
  * tieBreaker; unmatched left rows get null right columns.
  *
  * Why a physical operator when the composition exists: the union+window
  * form materializes a combined sorted relation and runs a window function
  * over it; this operator asks Catalyst for co-clustered, co-sorted
  * children (EnsureRequirements inserts exactly the needed exchanges and
  * sorts — the same machinery SortMergeJoin uses) and then streams both
  * sides through one O(|L|+|R|) merge with O(1) state — no window buffer,
  * no carried struct columns, and the sorts/exchanges are reusable by
  * downstream operators that need the same clustering.
  */
object AsOfJoinPlan {

  /** Logical node: output = left columns ++ right columns (nullable). */
  case class AsOfJoinNode(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression,
      tieBreaker: Expression)
      extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
      copy(left = l, right = r)
  }

  /** Planner strategy (injected via extraStrategies / GraftExtensions). */
  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt, tb) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
      case _ => Nil
    }
  }

  /** Physical operator: per-partition merge of key-clustered, time-sorted
    * children. */
  case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression,
      tieBreaker: Expression)
      extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // EnsureRequirements co-clusters both sides on the key and sorts each
    // partition: left by (key, time), right by (key, time, tiebreak).
    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending), SortOrder(tieBreaker, Ascending)))
    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

    override protected def doExecute(): RDD[InternalRow] = {
      val lKey = BindReferences.bindReference(leftKey, left.output)
      val lTime = BindReferences.bindReference(leftTime, left.output)
      val rKey = BindReferences.bindReference(rightKey, right.output)
      val rTime = BindReferences.bindReference(rightTime, right.output)
      val keyOrd = PhysicalDataType.ordering(leftKey.dataType)
        .asInstanceOf[Ordering[Any]]
      val timeOrd = PhysicalDataType.ordering(leftTime.dataType)
        .asInstanceOf[Ordering[Any]]
      val numRightCols = right.output.size

      val allOutput = output
      // bind with NULLABLE right attributes: with the originals the
      // projection's BoundReferences skip null checks and read garbage
      // zeros from the all-null unmatched row
      val childOutput = left.output ++ right.output.map(_.withNullability(true))
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        new Iterator[InternalRow] {
          private val proj = UnsafeProjection.create(allOutput, childOutput)
          private val nullRight = new GenericInternalRow(numRightCols)
          private val joined = new JoinedRow
          private val rBuf = rIter.buffered
          private var matchKey: Any = null
          private var matchRow: InternalRow = null // latest right row <= current left time for matchKey

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val lRow = lIter.next()
            val k = lKey.eval(lRow)
            val t = lTime.eval(lRow)
            if (k == null) {
              proj(joined(lRow, nullRight))
            } else {
              // new key group → forget the previous key's match. The stored
              // key MUST be copied: for StringType/BinaryType, eval returns
              // a UTF8String view into the reused UnsafeRow buffer, which
              // silently mutates to the next row's key and would keep this
              // reset from ever firing (stale matchRow leaking across keys).
              if (matchKey == null || keyOrd.compare(matchKey, k) != 0) {
                matchRow = null
                matchKey = InternalRow.copyValue(k)
              }
              // advance the right side up to (k, t]
              var advancing = true
              while (advancing && rBuf.hasNext) {
                val rRow = rBuf.head
                val rk = rKey.eval(rRow)
                val cmpKey = if (rk == null) -1 else keyOrd.compare(rk, k)
                if (cmpKey < 0) {
                  rBuf.next() // behind our key: discard
                } else if (cmpKey == 0 && timeOrd.compare(rTime.eval(rRow), t) <= 0) {
                  matchRow = rBuf.next().copy() // candidate: sorted order makes the last one win
                } else {
                  advancing = false // ahead of (k, t]: stop, keep for later lefts
                }
              }
              proj(joined(lRow, if (matchRow != null) matchRow else nullRight))
            }
          }
        }
      }
    }

    override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
      copy(left = l, right = r)
  }

  /** API: as-of join via the custom operator. Registers the strategy on
    * the session's experimental strategies (idempotent). */
  def asofExec(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      tieBreaker: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfStrategy
    val lPlan = ColumnBridge.analyzed(left)
    val rPlan = ColumnBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(s"no column $n"))
    ColumnBridge.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      attr(rPlan, tieBreaker)))
  }
}
