package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeSet, BoundReference, Expression, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodeGenerator, CodegenContext, ExprCode, GenerateUnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{
  LogicalPlan, Project, Sort, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{
  CodegenSupport, GraftSpillableRowBuffer, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetric

/** WHOLE-OPERATOR custom plan (SURVEY §2.10 rung (c): LogicalPlan +
  * SparkStrategy + SparkPlan, registered via SparkSessionExtensions):
  * per-key top-k with BOUNDED HEAPS.
  *
  * The declarative spelling — `row_number().over(Window.partitionBy(keys)
  * .orderBy(order)) <= k` — SORTS every key group in full: O(n log n)
  * per partition and the whole group buffered, even though only k rows
  * survive. This operator keeps a size-k heap per key in ONE pass:
  * O(n log k) time, O(keys·k) memory, no sort buffer — the same reason
  * Spark core rewrites global ORDER BY + LIMIT to TakeOrderedAndProject,
  * applied per key.
  *
  * Semantics: EXACTLY the rows `row_number() <= k` keeps. Keys are
  * arbitrary expressions (grouped via an UnsafeProjection of the key
  * tuple, so a null key is its own group — window partitionBy
  * semantics); the order is arbitrary `SortOrder`s compared with
  * Catalyst's own `RowOrdering` (codegen with interpreted fallback), so
  * null ordering (NULLS FIRST/LAST) and NaN (ranks above every real
  * double, `java.lang.Double.compare` semantics) behave bit-for-bit
  * like the window sort. Ties beyond the sort order are arbitrary —
  * exactly as arbitrary as row_number over a non-total order.
  *
  * Scale note: the strategy plans TWO instances — a PARTIAL pass
  * (no distribution requirement, runs map-side on whatever partitioning
  * the scan has) under a FINAL pass whose `requiredChildDistribution`
  * makes EnsureRequirements insert the keyed exchange between them —
  * exactly the partial-aggregation shape: the shuffle carries at most
  * partitions·keys·k rows instead of the whole input, and top-k is
  * idempotent (top-k of a union of per-partition top-ks is the global
  * top-k), so the final pass needs no special merge logic.
  *
  * Users rarely construct this node by hand: [[graft.WindowTopKRewrite]]
  * (injected by GraftExtensions) lowers the declarative
  * row_number-filter spelling to it automatically; [[TopKPerKey.of]] is
  * the explicit door.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan)
    extends SparkPlan with CodegenSupport {
  override def output: Seq[Attribute] = child.output
  override def children: Seq[SparkPlan] = Seq(child)
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"
  // first-class operator metrics (SQL UI / AQE statistics): how much the
  // pass reduced, and how often the partial map hit its key cap — the
  // signal an operator is running in its flush-degraded high-NDV regime
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numCapFlushes" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "partial heap-map cap flushes"))
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))
  // rows are dropped, never moved: the child's partitioning still holds,
  // so a downstream agg/join on the same keys skips its exchange
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): TopKPerKeyExec =
    copy(child = newChildren.head)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    // partial-pass memory honesty at 100 TB: on a HIGH-NDV key the
    // map-side pass would otherwise grow one heap per distinct key with
    // no bound (the same hazard HashAggregate answers with sort-fallback
    // spill). Partial top-k is merge-idempotent — emitting a key's heap
    // MORE than once is correct because the final pass re-merges — so
    // the partial pass flushes and resets its map at a key cap instead
    // of growing: memory is O(maxKeys·k) regardless of NDV, at the price
    // of a less-reduced shuffle for high-NDV keys (exactly the partial
    // aggregation trade-off). The FINAL pass must hold every key of its
    // partition (exactness) — its memory is O(its own output), which the
    // keyed exchange spreads across the cluster.
    val maxKeys =
      if (!partial) Int.MaxValue
      else session.conf.get(TopKPerKeyExec.PartialMaxKeysKey,
        TopKPerKeyExec.PartialMaxKeysDefault.toString).toInt
    require(maxKeys >= 1, s"${TopKPerKeyExec.PartialMaxKeysKey} must be >= 1")
    val outRows = longMetric("numOutputRows")
    val capFlushes = longMetric("numCapFlushes")
    child.execute().mapPartitions(
      TopKPerKeyExec.processPartition(schema, keyExprs, sortOrder, kk, maxKeys,
        outRows, capFlushes, _),
      preservesPartitioning = true)
  }

  // ---- whole-stage codegen (PARTIAL pass only) -------------------------
  //
  // The partial pass sits directly on the corpus-sized scan pipeline; the
  // round-11 A/B (BENCH_TOPK_AB.json) showed the heap beating the window
  // plan DESPITE ending the child's WholeStageCodegen span at an iterator
  // boundary and re-materializing every input row through it. Fusing the
  // build INTO the child pipeline (the HashAggregate "blocking build"
  // shape: doProduce drives the child as a generated build loop, doConsume
  // is the per-row heap insert) removes that boundary — rows flow from the
  // scan's generated code straight into the heap map. The FINAL pass stays
  // on the iterator path: it sits above the exchange (already a pipeline
  // break) over partitions·keys·k rows, where a codegen span buys nothing.
  //
  // The one semantic wrinkle: a blocking build can't stream cap-flushed
  // heaps downstream mid-build the way the iterator path does, so flushes
  // drain into a [[GraftSpillableRowBuffer]] (in-memory array → disk-
  // spilling sorter past 4096 rows) emitted ahead of the live heaps —
  // memory stays bounded in the high-NDV flush regime, trading the
  // iterator path's streaming for operator-managed spill.

  override def supportCodegen: Boolean = partial &&
    conf.getConfString(TopKPerKeyExec.CodegenKey, "true").toBoolean

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  // the blocking-build contract (what BlockingOperatorWithCodegen pins for
  // HashAggregate/Sort): children never see downstream limits or stop
  // checks — the build consumes its whole input regardless
  override def needStopCheck: Boolean = false
  override def limitNotReachedChecks: Seq[String] = Nil
  override protected def canCheckLimitNotReached: Boolean = true
  // output rows come from reused heap/spill-buffer holders
  override def needCopyResult: Boolean = true
  // doConsume materializes the full row itself; don't pre-evaluate the
  // key/order references as separate vars
  override def usedInputs: AttributeSet = AttributeSet(Seq.empty)

  private var stateTerm: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val maxKeys = conf.getConfString(TopKPerKeyExec.PartialMaxKeysKey,
      TopKPerKeyExec.PartialMaxKeysDefault.toString).toInt
    val factory = ctx.addReferenceObj("topkFactory",
      TopKPerKeyExec.PartialTopKFactory(child.output, keys, order, k, maxKeys,
        longMetric("numCapFlushes")))
    val needInit = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN,
      "topkNeedInit", v => s"$v = true;")
    stateTerm = ctx.addMutableState(
      classOf[TopKPerKeyExec.PartialTopKState].getName, "topkState")
    val outIter = ctx.addMutableState("scala.collection.Iterator", "topkOutput")
    val build = ctx.addNewFunction("topkBuild",
      s"""
         |private void topkBuild() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin)
    val numOutput = metricTerm(ctx, "numOutputRows")
    val row = ctx.freshName("topkRow")
    val rowCls = classOf[UnsafeRow].getName
    s"""
       |if ($needInit) {
       |  $needInit = false;
       |  $stateTerm = $factory.open();
       |  $build();
       |  $outIter = $stateTerm.result();
       |}
       |while ($limitNotReachedCond $outIter.hasNext()) {
       |  $rowCls $row = ($rowCls) $outIter.next();
       |  $numOutput.add(1);
       |  ${consume(ctx, null, row)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    // materialize the incoming pipeline row as an UnsafeRow for the heap
    // insert (the SortExec doConsume pattern)
    val colExprs = output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable) }
    ctx.INPUT_ROW = null
    ctx.currentVars = input
    val unsafeRow = GenerateUnsafeProjection.createCode(ctx, colExprs)
    s"""
       |${unsafeRow.code}
       |$stateTerm.add(${unsafeRow.value});
     """.stripMargin
  }
}

object TopKPerKeyExec {
  /** Session conf: distinct-key cap of the PARTIAL pass's heap map —
    * above it the map is flushed downstream and reset (correct because
    * the final pass re-merges per key). Test hook + ops knob.
    *
    * Default sizing: map-side memory ≈ cap × k × (row bytes + heap/map
    * overhead). At 256k keys, k=3, ~150 B/entry that is ~120 MB per
    * task — a real but survivable slice of a few-GB executor. Raise it
    * for wide rows or large k only with the memory math in hand; the
    * cost of a low cap is merely a less-reduced shuffle. */
  val PartialMaxKeysKey = "spark.graft.topk.partialMaxKeys"
  val PartialMaxKeysDefault: Int = 1 << 18

  /** Session conf: whole-stage-codegen participation of the PARTIAL pass
    * (A/B knob; the iterator path stays available and semantics are
    * identical). */
  val CodegenKey = "spark.graft.topk.codegen"

  /** Serializable spec of a partial pass, opened into per-partition state
    * from the generated init (the projection/ordering it builds are not
    * serializable and must be constructed executor-side). */
  final case class PartialTopKFactory(schema: Seq[Attribute],
      keys: Seq[Expression], order: Seq[SortOrder], k: Int, maxKeys: Int,
      capFlushes: SQLMetric) {
    def open(): PartialTopKState = new PartialTopKState(this)
  }

  /** Per-partition heap map driven by generated code: `add` is the same
    * insert the iterator path's [[processPartition]] performs; cap
    * flushes drain into a disk-spilling buffer (a blocking build cannot
    * stream them downstream), emitted by `result()` ahead of the live
    * heaps. Rows handed to `add` are the projection's REUSED buffer —
    * copied on insert, exactly like the iterator path. */
  final class PartialTopKState(f: PartialTopKFactory) {
    private val keyProj = UnsafeProjection.create(f.keys, f.schema)
    private val rowOrd = RowOrdering.create(f.order, f.schema)
    private implicit val heapOrd: Ordering[UnsafeRow] =
      (a: UnsafeRow, b: UnsafeRow) => rowOrd.compare(a, b)
    private var heaps = new java.util.HashMap[UnsafeRow,
      scala.collection.mutable.PriorityQueue[UnsafeRow]]()
    private lazy val flushed = new GraftSpillableRowBuffer(4096)
    private var anyFlushed = false

    def add(row: UnsafeRow): Unit = {
      val kv = keyProj(row)
      var h = heaps.get(kv)
      if (h == null) {
        h = scala.collection.mutable.PriorityQueue.empty[UnsafeRow]
        heaps.put(kv.copy(), h)
      }
      if (h.size < f.k) h.enqueue(row.copy())
      else if (rowOrd.compare(row, h.head) < 0) {
        h.dequeue(); h.enqueue(row.copy())
      }
      if (heaps.size() >= f.maxKeys) {
        f.capFlushes.add(1)
        anyFlushed = true
        val it = heaps.values().iterator()
        while (it.hasNext) it.next().foreach(flushed.add)
        heaps = new java.util.HashMap()
      }
    }

    def result(): Iterator[UnsafeRow] = {
      import scala.jdk.CollectionConverters._
      val live = heaps.values().iterator().asScala.flatMap(_.iterator)
      if (anyFlushed) flushed.iterator ++ live else live
    }
  }

  /** Static so the task closure captures only the (serializable) bound
    * expression lists — never the plan node itself. */
  private def processPartition(schema: Seq[Attribute], keyExprs: Seq[Expression],
      sortOrder: Seq[SortOrder], kk: Int, maxKeys: Int,
      outRows: org.apache.spark.sql.execution.metric.SQLMetric,
      capFlushes: org.apache.spark.sql.execution.metric.SQLMetric,
      it: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keyExprs, schema)
    // Catalyst's row comparator for the window's ORDER BY — null
    // ordering and NaN totality come from the engine, not hand-rolled
    // primitive compares. Heap maximum = GREATEST under the sort
    // order = the WORST kept row, so head-compare + replace maintains
    // the top-k invariant in O(log k).
    val rowOrd = RowOrdering.create(sortOrder, schema)
    implicit val heapOrd: Ordering[UnsafeRow] =
      (a: UnsafeRow, b: UnsafeRow) => rowOrd.compare(a, b)
    val proj = UnsafeProjection.create(schema, schema)
    import scala.jdk.CollectionConverters._
    new Iterator[InternalRow] {
      private var heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      private var pending: Iterator[InternalRow] = Iterator.empty
      private def drain(): Unit = {
        pending = heaps.values().iterator().asScala.flatMap(_.iterator)
          .map { r => outRows += 1; r }
        heaps = new java.util.HashMap()
      }
      private def advance(): Unit = {
        while (!pending.hasNext && (it.hasNext || !heaps.isEmpty)) {
          if (!it.hasNext) { drain() } // input done: emit what's held
          else {
            val row = it.next()
            val kv = keyProj(row)
            var h = heaps.get(kv)
            if (h == null) {
              h = scala.collection.mutable.PriorityQueue.empty[UnsafeRow]
              heaps.put(kv.copy(), h)
            }
            if (h.size < kk) h.enqueue(proj(row).copy())
            else if (rowOrd.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(proj(row).copy())
            }
            if (heaps.size() >= maxKeys) { capFlushes += 1; drain() } // cap hit
          }
        }
      }
      override def hasNext: Boolean = { advance(); pending.hasNext }
      override def next(): InternalRow = { advance(); pending.next() }
    }
  }
}

/** Planner strategy compiling the logical node to the heap exec. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // partial-before-shuffle, exactly like partial aggregation: the
      // exchange EnsureRequirements inserts above the partial pass now
      // carries at most partitions·keys·k rows
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Public door: wrap `df` in the logical node. `order` columns carry
    * their own direction/null-ordering (`col("v").desc`,
    * `col("v").asc_nulls_last`, …); a bare column means ascending. */
  def of(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val lp = df.queryExecution.analyzed
    require(keys.nonEmpty, "TopKPerKey needs at least one key column")
    require(order.nonEmpty, "TopKPerKey needs at least one order column")
    require(k >= 1, s"TopKPerKey needs k >= 1, got $k")
    // resolve through the ANALYZER, not by hand: a throwaway
    // sortWithinPartitions/select over the same analyzed child yields
    // fully-resolved SortOrders/expressions with lp's exprIds (Spark-4
    // Columns are opaque ColumnNodes until analysis)
    val (keyExprs, sortOrders) = try {
      // pattern-match the analyzed top nodes rather than casting: an
      // aggregate function smuggled in as a key/order column analyzes to
      // an Aggregate (not Project/Sort) and must land on the same
      // IllegalArgumentException path as a resolution failure, not
      // escape as a ClassCastException
      val sortedPlan = df.sortWithinPartitions(order: _*).queryExecution.analyzed
      val keyedPlan = df.select(keys: _*).queryExecution.analyzed
      (sortedPlan, keyedPlan) match {
        case (sorted: Sort, keyed: Project) =>
          (keyed.projectList.map {
            case a: Alias => a.child
            case e => e
          }, sorted.order)
        case _ =>
          throw new IllegalArgumentException(
            "TopKPerKey key/order columns must be plain (non-aggregate, " +
              s"non-generator) expressions; got plans ${keyedPlan.nodeName}/" +
              s"${sortedPlan.nodeName} instead of Project/Sort")
      }
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"TopKPerKey key/order columns failed to resolve: ${e.getMessage}", e)
    }
    require(RowOrdering.isOrderable(sortOrders.map(_.child)),
      s"TopKPerKey order columns must be orderable types, got " +
        s"${sortOrders.map(_.child.dataType)}")
    // the explicit door must WORK on any session, not just one that
    // installed GraftExtensions: a session whose planner lacks
    // TopKStrategy (e.g. built over a reused SparkContext, where the
    // static spark.sql.extensions conf is silently ignored) would
    // otherwise die at plan time with Spark's opaque INTERNAL_ERROR
    // "No plan for TopKPerKey". ExperimentalMethods is the public,
    // per-session strategy registry made for exactly this; the check
    // covers both registration paths, so this is a no-op on
    // extensions-installed sessions.
    // NOTE: this mutates per-session planner state as a side effect of
    // building a DataFrame. extraStrategies is a plain var, so the
    // check-and-append must be atomic: two threads planning concurrently
    // on the same extensions-less session could otherwise double-append
    // (benign) or, worse, drop a strategy a third party appended between
    // our read and write (lost update). Lock on the registry object
    // itself so any other writer following the same discipline composes.
    val session = df.sparkSession
    if (!session.sessionState.planner.strategies.exists(_ eq TopKStrategy))
      session.experimental.synchronized {
        if (!session.experimental.extraStrategies.exists(_ eq TopKStrategy))
          session.experimental.extraStrategies =
            session.experimental.extraStrategies :+ TopKStrategy
      }
    org.apache.spark.sql.GraftPlanDoor.ofRows(session,
      TopKPerKey(keyExprs, sortOrders, k, lp))
  }

  /** Back-compat door: largest-`ord`-first with `tie` ascending — the
    * row_number() OVER (PARTITION BY key ORDER BY ord DESC, tie) <= k
    * shape the engine's ranking queries use. */
  def of(df: DataFrame, key: String, ord: String, tie: String, k: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    of(df, Seq(col(key)), Seq(col(ord).desc, col(tie).asc), k)
  }
}
