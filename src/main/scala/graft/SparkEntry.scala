package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full capability registry lives in the per-domain operator modules;
  * this object flattens it into the driver's (queries, oracleSql) shape.
  */
object SparkEntry {

  /** Every implemented capability, one GraftQuery each. */
  val registry: Seq[GraftQuery] =
    WeatherOps.all ++ RelationalOps.all ++ TpchOps.all ++ TextOps.all ++
      DedupOps.all ++ SimilarityOps.all ++ IvfAnn.all ++ PqAnn.all ++ IvfPqAnn.all ++
      ParsingOps.all ++ AnalyticsOps.all ++ PipelineOps.all ++ SubqueryOps.all ++
      CurationOps.all ++ GraphOps.all ++ TemporalOps.all ++ LayoutOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, LSH ANN) — those are ScalaTest-verified. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** For every NO-ORACLE query: the ScalaTest suite pinning its
    * estimate/order contract — the correctness dump carries this so a
    * `no_oracle` row self-describes its verification path. The registry
    * contract (spec-asserted) is oracle XOR boundedBy: every query is
    * verified one way or the other, never neither. */
  def boundedBy: Map[String, String] =
    registry.flatMap(q => q.boundedBy.map(b => q.name -> b)).toMap
}
