package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** TOP-K PER KEY as a whole-operator Catalyst extension — the one operator
  * family in this engine where Spark's built-in plan is structurally wrong
  * at scale, so it demonstrates the full custom-operator path (SURVEY.md §4
  * option (c)): LogicalPlan node → planner Strategy → physical SparkPlan,
  * registered through `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Why: "top N rows per key" via `row_number().over(Window)` SORTS EVERY
  * PARTITION IN FULL and holds it whole — O(n log n) comparisons and O(n)
  * memory per partition for an output of size k·|keys|. This operator runs
  * BOUNDED HEAPS of size k per key instead (`TakeOrderedAndProject`'s trick,
  * generalized per key):
  *
  *   - partial phase (pre-shuffle): each input partition reduces to ≤ k
  *     rows per key it has seen — the shuffle then moves at most
  *     k·|keys per partition| rows, not the corpus;
  *   - final phase (post-shuffle, hash-clustered on the keys): heaps merge
  *     the survivors to the exact global top-k per key.
  *
  * State is O(k · keys-per-partition) everywhere; nothing ever sorts or
  * materializes a full partition. The caller must pass a TOTAL ordering
  * (tie columns) for deterministic results — same contract as any top-k.
  *
  * Registered via [[GraftExtensions]]; result equality against the window
  * formulation is oracle-checked (`q_topk_per_key`) and PlanShapeSpec
  * asserts the two-phase heap plan (no Window, no full Sort below the
  * operator).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(keys.nonEmpty,
    "TopKPerKey needs at least one key; global top-k is TakeOrderedAndProject (orderBy.limit)")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans the logical node as partial heaps → exchange → final heaps (the
  * exchange is inserted by EnsureRequirements to satisfy the final phase's
  * ClusteredDistribution — exactly how partial/final aggregation plans).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, global = true,
        TopKPerKeyExec(keys, order, k, global = false, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Physical per-key bounded-heap reduction. `global = false` runs on
  * whatever partitioning the child has (the map-side combine); `global =
  * true` requires hash-clustering on the keys and produces the exact
  * result. Both phases share one implementation: keep the k smallest rows
  * per key under `order` (callers express "top" via Descending).
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    global: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (global) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
  override def nodeName: String =
    if (global) "TopKPerKey(final)" else "TopKPerKey(partial)"

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap under `ord` (reverse comparator): head is the WORST of
      // the current k, evicted when a better row arrives
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.offer(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.offer(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }
}

/** Public DataFrame-level API: `TopKPerKey(df, Seq("key"),
  * Seq(("price", true), ("id", false)), 3)` — order pairs are
  * (column, descending?). The order must be total for determinism.
  */
object TopKPerKey {
  def apply(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$n' in ${plan.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(attr)
    val order = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftSqlShim.ofRows(df.sparkSession, TopKPerKeyNode(keys, order, k, plan))
  }
}
