package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 additions: the graph family's node-sized broadcast gate
  * (`spark.graft.graph.broadcastNodes`, mirroring the decontam eval gate),
  * DecimalType band joins, the pointer-doubled BFS, and the
  * encoding-advisor HLL twin.
  */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("graph broadcastNodes knob: results byte-identical with hints dropped") {
    // the knob moves PLAN shape only (forced broadcast → shuffle + AQE
    // discretion); the exact-integer arithmetic contract means the
    // results must not move by a single byte
    val key = "spark.graft.graph.broadcastNodes"
    val qs = Seq("graph_pagerank", "graph_bfs_distance",
      "graph_neighbor_jaccard", "graph_modularity")
    val before = qs.map(q => run(q).collect().map(_.toString).toSeq)
    spark.conf.set(key, "false")
    val after = try {
      // the hint gate must actually have fired: pagerank's analyzed plan
      // keeps ONLY 1-row-aggregate hints under the knob (the full-family
      // sweep lives in PlanQualitySpec)
      import org.apache.spark.sql.catalyst.plans.logical.{
        Aggregate, LogicalPlan, Project, ResolvedHint, SubqueryAlias}
      def oneRow(p: LogicalPlan): Boolean = p match {
        case a: Aggregate => a.groupingExpressions.isEmpty
        case pr: Project => oneRow(pr.child)
        case sa: SubqueryAlias => oneRow(sa.child)
        case _ => false
      }
      val hints = run("graph_pagerank").queryExecution.analyzed
        .collect { case h: ResolvedHint => h }
      assert(hints.forall(h => oneRow(h.child)),
        "pagerank keeps a corpus-proportional hint under the knob")
      qs.map(q => run(q).collect().map(_.toString).toSeq)
    } finally spark.conf.unset(key)
    assert(after == before, "the broadcastNodes knob must never change results")
  }
}
