package graft.operators

import org.apache.spark.sql.SparkSession
import graft.{GraftQuery, Tables}

/** Correlated / scalar / lateral subquery surface, through the SQL entry
  * path (the reference's only SQL entry is CassandraSQLContext.sql —
  * SampleJoin.scala:39-50, KafkaStreamingJson.scala:64-66; these queries
  * extend that entry to the subquery shapes SURVEY.md §2.3 lists as
  * capability-parity extras).
  *
  * Why these matter at scale: a correlated subquery naively re-executes per
  * outer row — at 100 TB that is quadratic death. Catalyst's decorrelation
  * (RewriteCorrelatedScalarSubquery, RewritePredicateSubquery,
  * DecorrelateInnerQuery) turns every one of these into a join against an
  * aggregated-once subquery leg: EXISTS/IN → left-semi join, NOT EXISTS →
  * left-anti join, correlated scalar agg → aggregate + equi join, LATERAL
  * ORDER BY/LIMIT → window rank. Each query here pins one of those rewrites;
  * the specs assert the physical plan contains the join form (no per-row
  * re-execution survives into the plan).
  *
  * Determinism: every compared number follows the repo rule — exact integer
  * (centi) sums, floor-rounding, CAST to the common type in both dialects.
  */
object SubqueryOps {

  private def q(name: String, doc: String, tables: Seq[String], sparkSql: String,
                duckSql: String): GraftQuery =
    GraftQuery(name, doc,
      (s: SparkSession, d: String) => { Tables.register(s, d, tables); s.sql(sparkSql) },
      Some(duckSql))

  private val centiQty = "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"
  private val revCSql =
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"

  /** TPC-H Q4 shape (EXISTS → left-semi join). The reference has no
    * subqueries at all; this is the parity extra exercising
    * RewritePredicateSubquery. Lineitem has no commitdate, so "late" =
    * shipped more than 60 days after the order date. */
  private val existsLateShip = {
    val sql =
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    // Spark side only (oracle text unchanged): EXISTS(any late line) ⟺
    // max(l_shipdate) per orderkey late — max ignores NULLs exactly like
    // the per-row > comparison rejects them. The semi-join (still the
    // RewritePredicateSubquery shape this entry exercises) now builds its
    // broadcast from the key-grain aggregate instead of the raw fact:
    // guide §2.3 aggregate-before-you-ship, 4× fewer build-side rows.
    val sparkSql =
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM (SELECT l_orderkey, max(l_shipdate) AS mx
        |                 FROM lineitem GROUP BY l_orderkey) lm
        |  WHERE l_orderkey = o_orderkey
        |    AND mx > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    q("sq_exists",
      "Q4 shape: EXISTS correlated subquery -> left-semi join, priority counts",
      Seq("orders", "lineitem"), sparkSql, sql.replace("\n", " "))
  }

  /** TPC-H Q22 shape (scalar agg subquery + NOT EXISTS → left-anti join).
    * The balance threshold is an exact-integer avg (centi sums), so the
    * strict > comparison is the same IEEE division in both engines. */
  private val notExistsIdle = {
    def sql(castBig: String => String) =
      s"""SELECT c_mktsegment, count(*) AS n_cust,
         |  CAST(floor(CAST(${castBig("sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))")} AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS DOUBLE) AS total_bal
         |FROM customer
         |WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 2 > (
         |    SELECT avg(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
         |    FROM customer WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin
    q("sq_not_exists",
      "Q22 shape: scalar-avg threshold + NOT EXISTS (no recent order) -> left-anti join",
      Seq("customer", "orders"),
      sql(identity),
      sql(x => s"CAST($x AS BIGINT)").replace("\n", " "))
  }

  /** TPC-H Q17 shape (correlated scalar aggregate →
    * RewriteCorrelatedScalarSubquery: aggregate-once + equi join). Revenue
    * from below-half-average-quantity lineitems, per brand. The correlated
    * avg is over exact centi integers; sums are exact, the division is one
    * IEEE op, so the < cut is bit-identical across engines. */
  private val scalarSmallQty = {
    def sql(castBig: String => String) =
      s"""SELECT p_brand,
         |  CAST(floor(CAST(${castBig(s"sum($revCSql)")} AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS DOUBLE) AS small_qty_rev,
         |  count(*) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE $centiQty * 2 < (
         |    SELECT avg($centiQty) FROM lineitem l2
         |    WHERE l2.l_partkey = lineitem.l_partkey)
         |GROUP BY p_brand
         |ORDER BY p_brand""".stripMargin
    q("sq_scalar_corr",
      "Q17 shape: correlated scalar avg -> aggregate+join, small-quantity revenue by brand",
      Seq("lineitem", "part"),
      sql(identity),
      sql(x => s"CAST($x AS BIGINT)").replace("\n", " "))
  }

  /** TPC-H Q11 shape (uncorrelated scalar subqueries in HAVING). The cut —
    * part revenue > 1.5x the average part's revenue — is scale-invariant
    * (a fixed share-of-total threshold degenerates as part count grows) and
    * compares integer revenue sums cross-multiplied: no division at all, so
    * the threshold is exact in both engines. */
  private val havingShare = {
    def sql(castBig: String => String) =
      s"""SELECT l_partkey,
         |  CAST(floor(CAST(${castBig(s"sum($revCSql)")} AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS DOUBLE) AS part_rev
         |FROM lineitem
         |GROUP BY l_partkey
         |HAVING sum($revCSql) * (SELECT count(DISTINCT l_partkey) FROM lineitem) * 2
         |     > (SELECT sum($revCSql) FROM lineitem) * 3
         |ORDER BY part_rev DESC, l_partkey""".stripMargin
    q("sq_having_share",
      "Q11 shape: HAVING revenue > 1.5x avg part via scalar subqueries, integer cross-multiplied",
      Seq("lineitem"),
      sql(identity),
      sql(x => s"CAST($x AS BIGINT)").replace("\n", " "))
  }

  /** IN-subquery (→ left-semi join): brands whose parts appear on high-
    * volume order lines. */
  private val inHighVolume = {
    val sql =
      """SELECT p_brand, count(*) AS n_parts
        |FROM part
        |WHERE p_partkey IN (
        |  SELECT l_partkey FROM lineitem
        |  GROUP BY l_partkey HAVING count(*) >= 3)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin
    q("sq_in",
      "IN aggregated subquery -> left-semi join on high-volume parts",
      Seq("part", "lineitem"), sql, sql.replace("\n", " "))
  }

  /** LATERAL correlated subquery with ORDER BY + LIMIT — the "top-N per
    * outer row" idiom. Catalyst decorrelates to a window rank over one
    * shuffle of orders (no per-customer re-scan); the tie-break on
    * o_orderkey makes top-2 unique, and the price key is exact centi. */
  private val lateralTopk = {
    val sql =
      """SELECT c_custkey, o.o_orderkey,
        |  CAST(floor(CAST(o.pc AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS DOUBLE) AS o_total
        |FROM customer,
        |  LATERAL (SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc
        |           FROM orders WHERE o_custkey = c_custkey
        |           ORDER BY pc DESC, o_orderkey LIMIT 2) o
        |WHERE c_custkey % 10 = 0
        |ORDER BY c_custkey, o_total DESC, o_orderkey""".stripMargin
    q("j_lateral_topk",
      "LATERAL subquery with ORDER BY/LIMIT: top-2 orders per customer",
      Seq("customer", "orders"), sql, sql.replace("\n", " "))
  }

  /** TPC-H Q2/Q20 shape: the deepest decorrelation form — a correlated
    * MIN subquery in the WHERE of a three-way join tree (part ⋈ lineitem ⋈
    * supplier), correlated on the OUTER side's part key. Catalyst must
    * decorrelate the min-price leg into an aggregate-once + equi-join that
    * composes with the surrounding join order (DecorrelateInnerQuery +
    * RewriteCorrelatedScalarSubquery); per-outer-row re-execution here is
    * quadratic in lineitem at 100 TB. Price compares as exact centi
    * integers, so the = cut is engine-independent. */
  private val minCostJoin = {
    val priceC = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    def sql(castBig: String => String) =
      s"""SELECT p_partkey, p_brand, s_suppkey, s_name,
         |  CAST(floor(CAST(${castBig(priceC)} AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS DOUBLE) AS min_price
         |FROM part
         |JOIN lineitem ON l_partkey = p_partkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |WHERE p_size <= 5
         |  AND $priceC = (
         |    SELECT min($priceC) FROM lineitem l2
         |    WHERE l2.l_partkey = part.p_partkey)
         |ORDER BY p_partkey, s_suppkey""".stripMargin
    q("sq_min_cost_join",
      "Q2/Q20 shape: correlated min-price subquery inside a 3-way join tree -> aggregate-once + join",
      Seq("part", "lineitem", "supplier"),
      sql(identity),
      sql(x => s"CAST($x AS BIGINT)").replace("\n", " "))
  }

  /** QUANTIFIED-COMPARISON subquery (`x <= ALL (correlated set)`) — the
    * one predicate-subquery form Spark SQL has no surface syntax for, so
    * the engine spells the standard decorrelation DIRECTLY: `c <= ALL (S)`
    * over a non-empty correlated set is exactly `min(S) >= c`, one
    * aggregate of the inner side + one equi join — never a per-outer-row
    * re-execution (the same plan Catalyst would emit if it parsed ALL).
    * The oracle keeps the literal `<= ALL` + EXISTS spelling to prove the
    * rewrite is semantics-preserving, empty-set vacuous-truth included.
    * Segment rollup of customers whose EVERY order is >= 50 000 (exact
    * centi comparison). */
  private val allQuantified = GraftQuery(
    "sq_all_quantified",
    "x <= ALL correlated subquery decorrelated to a min-aggregate join",
    (s, d) => {
      import org.apache.spark.sql.functions._
      import graft.functions.GraftFunctions.centi
      val mins = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(min(centi(col("o_totalprice"))).as("mn"),
          count(lit(1)).as("n_ord"))
        .filter(col("mn") >= 5000000L)
      Tables.customer(s, d)
        .join(mins, col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"), sum("n_ord").as("n_orders"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust, CAST(sum((SELECT count(*) FROM orders o2 WHERE o2.o_custkey = c_custkey)) AS BIGINT) AS n_orders FROM customer WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey) AND 5000000 <= ALL (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) FROM orders o WHERE o.o_custkey = c_custkey) GROUP BY 1 ORDER BY 1"""))

  val all: Seq[GraftQuery] = Seq(
    existsLateShip, notExistsIdle, scalarSmallQty, havingShare, inHighVolume,
    lateralTopk, minCostJoin, allQuantified)
}
