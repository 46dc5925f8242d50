package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
  Attribute,
  Expression,
  GenericInternalRow,
  JoinedRow,
  RowOrdering,
  SortOrder,
  UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution,
  Distribution
}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Native backward as-of join — the canonical "operator Spark lacks"
  * (pandas `merge_asof`, kdb `aj`, QuestDB/Flink ASOF JOIN): for each
  * left row, attach the LAST right row of the same key whose order
  * tuple is strictly below the left row's.
  *
  * Built as the full custom-operator stack the builder prompt's
  * preference (c) names: a resolved [[AsOfJoin]] LogicalPlan, an
  * [[AsOfJoinStrategy]] planning it, and an [[AsOfJoinExec]] physical
  * node, injected via `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]).
  *
  * Scale design: requiredChildDistribution co-partitions both sides
  * on the key (EnsureRequirements inserts the hash exchanges) and
  * requiredChildOrdering sorts each partition by (key, order) — the
  * merge itself is then one streaming forward pass per partition with
  * O(1) state (the last-seen right row), strictly cheaper than the
  * union-then-window composition (q30) which carries every event
  * through one window frame. Neither side is ever broadcast; skew
  * handling is the key-salting of q36 if a key dominates.
  *
  * The window-merge twin ([[graft.operators.Events.purchaseAfterError]])
  * is kept as the executable spec — the differential test pins both
  * bit-identical, and the q105 gate replays the same DuckDB oracle as
  * q30.
  *
  * AQE note: CoalesceShufflePartitions places both children's shuffle
  * stages in one coalesce group (binary node → unioned groups), so
  * runtime-coalesced sides stay aligned; a hypothetical mismatch
  * fails fast in `zipPartitions` (unequal partition counts) rather
  * than mis-joining, and the oracle gate re-proves alignment every
  * run.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrder: Seq[Expression],
    rightOrder: Seq[Expression]
) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): AsOfJoin = copy(left = newLeft, right = newRight)
}

/** Plans the logical [[AsOfJoin]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lo, ro) =>
      AsOfJoinExec(lk, rk, lo, ro, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge backward as-of join: both children co-partitioned on
  * the key and sorted by (key, order); one forward pass per partition
  * keeps only the last right row seen — O(1) state, no buffering of
  * either side.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrder: Seq[Expression],
    rightOrder: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      (leftKeys ++ leftOrder).map(SortOrder(_, Ascending)),
      (rightKeys ++ rightOrder).map(SortOrder(_, Ascending))
    )

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyOrderExprs = leftKeys ++ leftOrder
    val rKeyOrderExprs = rightKeys ++ rightOrder
    val keyTypes = leftKeys.map(_.dataType)
    val fullTypes = lKeyOrderExprs.map(_.dataType)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lFullProj = UnsafeProjection.create(lKeyOrderExprs, leftOut)
      val rFullProj = UnsafeProjection.create(rKeyOrderExprs, rightOut)
      val lKeyProj = UnsafeProjection.create(leftKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rightOut)
      val fullOrdering = RowOrdering.createNaturalAscendingOrdering(fullTypes)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // O(1) merge state: the last right row consumed + its key and
        // full (key, order) tuple (the duplicate-tuple guard)
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _
        private var lastFull: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lFull = lFullProj(lRow)
          // consume right rows strictly below the left (key, order)
          // tuple; rows of earlier keys are consumed too — the key
          // equality check below discards them
          while (rBuf.hasNext &&
            fullOrdering.compare(rFullProj(rBuf.head), lFull) < 0) {
            val r = rBuf.next()
            val rFull = rFullProj(r).copy()
            // (rightKeys, rightOrder) must totally order the right
            // side: with duplicates, "last prior row" would be
            // whichever duplicate happened to arrive last — a
            // run-dependent result. Fail loudly instead. Sorted
            // input makes duplicates adjacent, so one O(1) compare
            // against the previous consumed tuple is a complete
            // check over every output-affecting row.
            if (lastFull != null &&
              fullOrdering.compare(rFull, lastFull) == 0) {
              throw new org.apache.spark.SparkException(
                "as_of join: duplicate right-side (key, order) tuple " +
                  s"$rFull — matches would be nondeterministic. Add a " +
                  "unique tie-breaking column (e.g. an event id) to " +
                  "the right-side order columns.")
            }
            lastFull = rFull
            lastMatch = r.copy()
            lastMatchKey = rKeyProj(lastMatch).copy()
          }
          val lKey = lKeyProj(lRow)
          val matched =
            lastMatch != null && keyOrdering.compare(lastMatchKey, lKey) == 0
          joined(lRow, if (matched) lastMatch else nullRight)
          resultProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): AsOfJoinExec = copy(left = newLeft, right = newRight)
}

/** DataFrame-level API for the native as-of join. */
object AsOf {

  /** The strategy reaches the planner either via GraftExtensions
    * (cluster deployment: `spark.sql.extensions`) or, for sessions
    * built without it, via the session-mutable experimental hook —
    * idempotent, so calling on an extensions-enabled session is a
    * no-op duplicate candidate at worst.
    */
  private def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.exists(_ eq AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Backward as-of join `left` with `right` on equal `keys`, order
    * tuple `order` (column names present on both sides; the right
    * side's non-key columns should be pre-aliased to avoid name
    * clashes in the result). Every left row appears exactly once;
    * right columns are null when no prior right row exists.
    *
    * Null keys GROUP together (the window form's `partitionBy`
    * semantics — a null-key left row can match a null-key right row),
    * unlike an equi-join where null never equals null; pinned by
    * spec. Pre-filter null keys on either side for equi-join-style
    * behavior.
    *
    * REQUIREMENT: `(rightKeys, rightOrder)` must be a TOTAL order on
    * the right side — if duplicate (key, order) right rows existed,
    * "last prior row" would be whichever duplicate happened to sort
    * last physically, i.e. run-dependent. ENFORCED at execution:
    * a duplicate right-side tuple that could affect the output
    * raises a SparkException naming the offending tuple. Include a
    * unique tie-breaking column (e.g. an event id) in `rightOrder`;
    * q105 does exactly that.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftOrder: Seq[String],
      rightOrder: Seq[String]
  ): DataFrame = {
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(right)
    def resolve(plan: LogicalPlan, cols: Seq[String]): Seq[Expression] =
      cols.map { name =>
        plan.output
          .find(_.name == name)
          .getOrElse(
            throw new IllegalArgumentException(
              s"column $name not found in ${plan.output.map(_.name)}"
            )
          )
      }
    require(
      left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "as-of join requires disjoint column names; alias the right side"
    )
    // the merge comparator is built from the LEFT side's types and
    // applied to right rows — a type mismatch (e.g. epoch-millis long
    // vs timestamp) would silently compare different units or throw
    // a ClassCastException deep in a task; fail fast here instead
    val lkt = resolve(lPlan, leftKeys ++ leftOrder).map(_.dataType)
    val rkt = resolve(rPlan, rightKeys ++ rightOrder).map(_.dataType)
    require(
      lkt == rkt,
      s"as-of join key/order column types must match pairwise: " +
        s"left=${lkt.map(_.simpleString).mkString(",")} " +
        s"right=${rkt.map(_.simpleString).mkString(",")}"
    )
    ensureStrategy(left.sparkSession)
    PlanBridge.ofRows(
      left.sparkSession,
      AsOfJoin(
        lPlan,
        rPlan,
        resolve(lPlan, leftKeys),
        resolve(rPlan, rightKeys),
        resolve(lPlan, leftOrder),
        resolve(rPlan, rightOrder)
      )
    )
  }
}
