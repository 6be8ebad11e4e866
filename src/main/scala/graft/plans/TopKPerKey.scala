package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** WHOLE-OPERATOR custom plan (SURVEY §2.10 rung (c): LogicalPlan +
  * SparkStrategy + SparkPlan, registered via SparkSessionExtensions):
  * per-key top-k with BOUNDED HEAPS.
  *
  * The declarative spelling — `row_number().over(Window.partitionBy(key)
  * .orderBy(ord desc, tie)) <= k` — SORTS every key group in full:
  * O(n log n) per partition and the whole group buffered, even though
  * only k rows survive. This operator keeps a size-k min-heap per key in
  * ONE pass: O(n log k) time, O(keys·k) memory, no sort buffer — the
  * same reason Spark core rewrites global ORDER BY + LIMIT to
  * TakeOrderedAndProject, applied per key.
  *
  * Semantics: keep the k rows with the largest (ord, tie-ascending)
  * rank per key; rows with a null key or ord are dropped (window
  * row_number would rank them — callers filter nulls first, as every
  * registry query already does). Types are pinned to LongType key/tie
  * and DoubleType ord — the shapes the engine's ranking queries use.
  *
  * Scale note: the strategy plans TWO instances — a PARTIAL pass
  * (no distribution requirement, runs map-side on whatever partitioning
  * the scan has) under a FINAL pass whose `requiredChildDistribution`
  * makes EnsureRequirements insert the keyed exchange between them —
  * exactly the partial-aggregation shape: the shuffle carries at most
  * partitions·keys·k rows instead of the whole input, and top-k is
  * idempotent (top-k of a union of per-partition top-ks is the global
  * top-k), so the final pass needs no special merge logic.
  */
case class TopKPerKey(key: Attribute, ord: Attribute, tie: Attribute,
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(key: Attribute, ord: Attribute, tie: Attribute,
    k: Int, partial: Boolean, child: SparkPlan) extends SparkPlan {
  override def output: Seq[Attribute] = child.output
  override def children: Seq[SparkPlan] = Seq(child)
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial)
      Seq(org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution)
    else Seq(ClusteredDistribution(Seq(key)))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): TopKPerKeyExec =
    copy(child = newChildren.head)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyIdx = child.output.indexWhere(_.exprId == key.exprId)
    val ordIdx = child.output.indexWhere(_.exprId == ord.exprId)
    val tieIdx = child.output.indexWhere(_.exprId == tie.exprId)
    val schema = child.output
    val kk = k
    child.execute().mapPartitions({ it =>
      // priority-queue MAXIMUM = the WORST kept row (smallest ord;
      // among equal ord, the largest tie), so head-compare + replace
      // maintains the top-k invariant in O(log k)
      implicit val worstFirst: Ordering[(Double, Long, UnsafeRow)] =
        Ordering.by(t => (-t._1, t._2))
      val heaps = new java.util.HashMap[Long,
        scala.collection.mutable.PriorityQueue[(Double, Long, UnsafeRow)]]()
      val proj = UnsafeProjection.create(schema, schema)
      while (it.hasNext) {
        val row = it.next()
        if (!row.isNullAt(keyIdx) && !row.isNullAt(ordIdx)) {
          val kv = row.getLong(keyIdx)
          val ov = row.getDouble(ordIdx)
          val tv = row.getLong(tieIdx)
          var h = heaps.get(kv)
          if (h == null) {
            h = scala.collection.mutable.PriorityQueue
              .empty[(Double, Long, UnsafeRow)]
            heaps.put(kv, h)
          }
          if (h.size < kk) h.enqueue((ov, tv, proj(row).copy()))
          else {
            val worst = h.head
            if (ov > worst._1 || (ov == worst._1 && tv < worst._2)) {
              h.dequeue(); h.enqueue((ov, tv, proj(row).copy()))
            }
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.toSeq.map(_._3))
    }, preservesPartitioning = false)
  }
}

/** Planner strategy compiling the logical node to the heap exec. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(key, ord, tie, k, child) =>
      // partial-before-shuffle, exactly like partial aggregation: the
      // exchange EnsureRequirements inserts above the partial pass now
      // carries at most partitions·keys·k rows
      TopKPerKeyExec(key, ord, tie, k, partial = false,
        TopKPerKeyExec(key, ord, tie, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Public door: wrap `df` in the logical node (analysis-safe — the
    * child is the analyzed plan, attributes resolved by name here). */
  def of(df: DataFrame, key: String, ord: String, tie: String, k: Int): DataFrame = {
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${lp.output.map(_.name)}"))
    val (ka, oa, ta) = (attr(key), attr(ord), attr(tie))
    require(ka.dataType == LongType && ta.dataType == LongType &&
      oa.dataType == DoubleType,
      s"TopKPerKey expects (bigint key, double ord, bigint tie), got " +
        s"(${ka.dataType}, ${oa.dataType}, ${ta.dataType})")
    org.apache.spark.sql.GraftPlanDoor.ofRows(df.sparkSession,
      TopKPerKey(ka, oa, ta, k, lp))
  }
}
