package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** As-of join as a first-class operator: logical node → planner
  * strategy → physical sort-merge exec, registered through
  * `SparkSessionExtensions` (the full custom-operator extension path,
  * for semantics the built-in operators don't express directly —
  * here: "latest right row at or before each left row's time, per
  * key" without the union/window encoding).
  *
  * Physical strategy: both sides hash-clustered on the key and sorted
  * (key, time) — EnsureRequirements inserts exactly one exchange per
  * side — then a single forward-only merge pass per partition:
  * O(|L|+|R|), no per-row range probe, no state beyond one buffered
  * right row. This is the plan shape that survives fact-fact as-of
  * joins at 100 TB.
  *
  * v1 scope: key and time expressions must be LongType (callers cast;
  * epoch-micros is the library convention). Right rows with equal
  * (key, time) resolve to the last in sort order — give the right
  * side a unique (key, time) or embed a tiebreak in the time value.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val schema = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val project = UnsafeProjection.create(schema, schema)
      val rBuf = rIt.buffered
      var lastRight: InternalRow = null
      var lastRightKey = 0L
      var haveLast = false

      lIt.map { lRow =>
        val lk = lKey.eval(lRow)
        if (lk == null) {
          project(joined(lRow, nullRight))
        } else {
          val k = lk.asInstanceOf[Long]
          val lt = lTime.eval(lRow)
          if (lt == null) {
            // null <= anything is not true: a null-time left row
            // matches nothing (SQL three-valued semantics).
            project(joined(lRow, nullRight))
          } else {
            val t = lt.asInstanceOf[Long]
            var advance = true
            while (advance && rBuf.hasNext) {
              val head = rBuf.head
              val hkAny = rKey.eval(head)
              if (hkAny == null) { rBuf.next() }        // unmatched key
              else {
                val hk = hkAny.asInstanceOf[Long]
                val htAny = rTime.eval(head)
                // Null-time right rows sort FIRST (Ascending = nulls
                // first) and can never satisfy ht <= t — consume and
                // skip, never buffer. (A MaxValue sentinel here would
                // wedge the merge at the head of each key group and
                // silently null out every match for that key.)
                if (htAny == null) { rBuf.next() }
                else {
                  val ht = htAny.asInstanceOf[Long]
                  if (hk < k || (hk == k && ht <= t)) {
                    val consumed = rBuf.next()
                    if (hk == k) {
                      lastRight = consumed.copy()
                      lastRightKey = k
                      haveLast = true
                    }
                  } else advance = false
                }
              }
            }
            if (haveLast && lastRightKey == k) project(joined(lRow, lastRight))
            else project(joined(lRow, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule mapping the logical node onto the exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** User-facing constructor. */
object AsOfJoinPlan {

  /** left asof-joined to the latest right row with rightTime <=
    * leftTime of the same key; unmatched left rows keep nulls.
    * Key/time columns are named (resolved against each side's schema
    * directly — pre-analysis Column objects are lazy in Spark 4) and
    * must be LongType (cast upstream).
    */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = leftDf.sparkSession
    // self-register the planner strategy so the operator also works in
    // sessions built without GraftExtensions; synchronized because the
    // contains-then-append on the session's mutable list is not atomic
    // (concurrent callers would append duplicates)
    AsOfJoinPlan.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = ColumnBridge.logicalPlan(leftDf)
    val rp = ColumnBridge.logicalPlan(rightDf)
    def attr(p: LogicalPlan, n: String): Expression =
      p.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(",")}]")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: ${many.size} attributes match " +
            s"in [${p.output.map(_.name).mkString(",")}]")
      }
    ColumnBridge.ofRows(spark, AsOfJoinNode(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTime), attr(rp, rightTime)))
  }
}
