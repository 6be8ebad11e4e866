package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** The remaining TPC-H query shapes (q4/q6/q8/q9/q12/q13/q15/q16/q17/q21/
  * q22), completing the suite started in RelationalOps (q1/q3/q5/q7/q10/
  * q14/q18/q19). Together with the correlated-subquery family in
  * SubqueryOps (sq_min_cost_join covers the Q2/Q20 partsupp shape,
  * sq_having_share the Q11 HAVING-scalar-subquery shape) this gives the
  * engine the full canonical analytical-join surface over the driver
  * testdata — the star-schema generalization of the reference's
  * scan+pushdown+aggregate query plane (SURVEY §2.3/§2.5; ref
  * TemperatureActor.scala:57-58, SampleJoin.scala:39-50).
  *
  * The driver schema is TPC-H-ish, not TPC-H: there is no partsupp table
  * and several standard columns are absent (l_commitdate/l_receiptdate,
  * l_shipmode, p_container, c_phone, o_comment). Each query keeps the
  * canonical plan SHAPE (the thing that matters for scale) and adapts the
  * predicate to available columns; the adaptation is noted per query.
  *
  * Scale themes, same as RelationalOps: every dimension edge broadcasts;
  * at most one fact-fact shuffle per query (lineitem⋈orders on orderkey);
  * correlated subqueries are decorrelated into aggregate-joins rather
  * than per-row lookups; exact centi/1e-4 fixed-point arithmetic keeps
  * sums order-independent so distributed results hash-match the oracle.
  */
object TpchOps {
  import graft.functions.GraftFunctions.{centi, fround}

  private val revC = centi(col("l_extendedprice")) * (lit(100L) - centi(col("l_discount")))
  private val revCSql =
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"

  /** Q4 (order priority checking). Standard form counts orders with any
    * l_commitdate < l_receiptdate line; without those columns "late" is
    * l_shipdate > o_orderdate + 90 days. The EXISTS is a left-semi join
    * whose extra inequality rides the equi-key hash join as a post-probe
    * filter — no row duplication, no dedup, one shuffle-free probe of the
    * date-filtered orders against lineitem. */
  private val q4Late = GraftQuery(
    "q4_late_orders",
    "Q4 shape: EXISTS(late line) as left-semi join, counts per order priority",
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1996-07-01"))
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, count(*) AS order_count FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00' AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY) GROUP BY 1 ORDER BY 1"""))

  /** Q6 (forecasting revenue change): the pure scan-aggregate — every
    * predicate reaches the parquet scan (PushedFilters), no join, no
    * shuffle beyond the single-row final agg. The discount band is matched
    * on exact centi units (5..7) so the float-representation of 0.05/0.07
    * can't flip boundary rows between engines. */
  private val q6Forecast = GraftQuery(
    "q6_forecast_rev",
    "Q6 shape: single-table scan-agg, all predicates pushed to the scan",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01") &&
        centi(col("l_discount")).between(5, 7) && col("l_quantity") < 24)
      .agg(sum(centi(col("l_extendedprice")) * centi(col("l_discount"))).as("rc"),
        count(lit(1)).as("n_lines"))
      .select(fround(col("rc").cast("double") / 10000.0, 2).as("revenue"), col("n_lines")),
    Some("""SELECT floor(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS revenue, count(*) AS n_lines FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7 AND l_quantity < 24"""))

  /** Q8 (national market share). p_type stands in for the 3-word TPC-H
    * type. Seven relations, ONE fact-fact shuffle (lineitem⋈orders);
    * part/customer/supplier/nation×2/region all broadcast. The share is a
    * ratio of two conditional sums computed in a single pass over the
    * joined rows (no second scan for the denominator) from exact 1e-4
    * integer units. */
  private val q8Share = GraftQuery(
    "q8_mkt_share",
    "Q8 shape: 7-relation star, conditional-sum market share per year",
    (s, d) => {
      val custNation = Tables.nation(s, d)
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
      val suppNation = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("cn_region") === col("r_regionkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
        .agg(sum(when(col("supp_nation") === "NATION_3", revC).otherwise(lit(0L))).as("nc"),
          sum(revC).as("tc"))
        .select(col("yr"),
          fround(col("nc").cast("double") / 10000.0, 2).as("nation_rev"),
          fround(col("tc").cast("double") / 10000.0, 2).as("total_rev"),
          fround(col("nc") / col("tc"), 6).as("mkt_share"))
        .orderBy("yr")
    },
    Some(s"""SELECT yr, floor(CAST(nc AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS nation_rev, floor(CAST(tc AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS total_rev, floor(CAST(nc AS DOUBLE) / tc * 1e6 + 0.5) / 1e6 AS mkt_share FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN $revCSql ELSE 0 END) AS BIGINT) AS nc, CAST(sum($revCSql) AS BIGINT) AS tc FROM lineitem JOIN part ON l_partkey = p_partkey JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation cn ON c_nationkey = cn.n_nationkey JOIN region ON cn.n_regionkey = r_regionkey JOIN supplier ON l_suppkey = s_suppkey JOIN nation sn ON s_nationkey = sn.n_nationkey WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE' GROUP BY 1) ORDER BY yr"""))

  /** Q9 (product-type profit). No partsupp ⇒ supply cost is proxied by
    * p_retailprice × quantity (both exact centi ints ⇒ amount is an exact
    * 1e-4-unit integer, so per-group sums are order-independent). Profit
    * per (supplier nation, year); one fact-fact shuffle, dims broadcast. */
  private val q9Profit = GraftQuery(
    "q9_type_profit",
    "Q9 shape: profit (revenue - cost proxy) per supplier nation x year",
    (s, d) => {
      val amount = revC - centi(col("p_retailprice")) * centi(col("l_quantity"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "STANDARD")
          .select("p_partkey", "p_retailprice")), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("int").as("yr"))
        .agg(sum(amount).as("ac"), count(lit(1)).as("n_lines"))
        .select(col("nation"), col("yr"),
          fround(col("ac").cast("double") / 10000.0, 2).as("profit"), col("n_lines"))
        .orderBy(col("nation"), desc("yr"))
    },
    Some(s"""SELECT nation, yr, floor(CAST(ac AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS profit, n_lines FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(sum($revCSql - CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS ac, count(*) AS n_lines FROM lineitem JOIN part ON l_partkey = p_partkey JOIN orders ON l_orderkey = o_orderkey JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey WHERE p_type = 'STANDARD' GROUP BY 1, 2) ORDER BY nation, yr DESC"""))

  /** Q12 (shipping modes / priority). No l_shipmode ⇒ the grouping key is
    * the shipping-delay bucket (half-year units of shipdate − orderdate;
    * an exact integer datediff, so bucket edges can't drift between
    * engines). The two priority counts come out of one conditional pass —
    * the Q12 pattern of splitting a count by a predicate without a second
    * join. */
  private val q12Priority = GraftQuery(
    "q12_ship_priority",
    "Q12 shape: conditional priority counts per shipping-delay bucket",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(floor(datediff(col("l_shipdate"), col("o_orderdate")) / 180).cast("long").as("delay_bucket"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L)).as("low_count"))
      .orderBy("delay_bucket"),
    Some("""SELECT CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 180.0) AS BIGINT) AS delay_bucket, CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count, CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_count FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1 ORDER BY 1"""))

  /** Q13 (customer distribution): the double-aggregate. Left join keeps
    * zero-order customers; the join condition carries the non-key filter
    * (o_orderpriority <> '5-LOW' — stand-in for the o_comment NOT LIKE of
    * standard Q13) so those orders drop without dropping their customers.
    * First groupBy shuffles on custkey, second on the tiny count domain. */
  private val q13Distribution = GraftQuery(
    "q13_cust_distribution",
    "Q13 shape: left join + per-customer count + count-of-counts histogram",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "5-LOW"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count")),
    Some("""SELECT c_count, count(*) AS custdist FROM (SELECT c_custkey, count(o_orderkey) AS c_count FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW' GROUP BY 1) GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""))

  /** Q15 (top supplier). The view is the quarterly per-supplier revenue
    * aggregate; the scalar max-subquery is decorrelated into a 1-row max
    * aggregate broadcast-joined back on the EXACT integer revenue (a float
    * equality here could drop the winner in one engine and keep it in the
    * other). Ties all surface, deterministically ordered by suppkey. */
  private val q15TopSupplier = GraftQuery(
    "q15_top_supplier",
    "Q15 shape: agg view + scalar-max subquery as broadcast join on exact units",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revC).as("rc"))
      val top = rev.agg(max("rc").as("max_rc"))
      rev.join(broadcast(top), col("rc") === col("max_rc"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          fround(col("rc").cast("double") / 10000.0, 2).as("total_rev"))
        .orderBy("s_suppkey")
    },
    Some(s"""WITH rev AS (SELECT l_suppkey, CAST(sum($revCSql) AS BIGINT) AS rc FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00' GROUP BY 1) SELECT s_suppkey, s_name, floor(CAST(rc AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS total_rev FROM rev JOIN supplier ON l_suppkey = s_suppkey WHERE rc = (SELECT max(rc) FROM rev) ORDER BY s_suppkey"""))

  /** Q16 (part/supplier relationship variety). No partsupp ⇒ the
    * part↔supplier edges come from lineitem (who actually shipped which
    * part); the NOT IN complaint-supplier subquery becomes a broadcast
    * left-anti join on the low-balance suppliers. countDistinct(suppkey)
    * per (brand, size) is a 2-shuffle aggregate; everything upstream of it
    * is filters + one broadcast join on the pruned part dim. */
  private val q16Variety = GraftQuery(
    "q16_supp_variety",
    "Q16 shape: distinct-supplier counts per (brand, size), NOT-IN as anti join",
    (s, d) => Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49))
        .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d).filter(col("s_acctbal") < 1000)
        .select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_size")),
    Some("""SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49) AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000) GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size"""))

  /** Q17 (small-quantity-order revenue). The correlated per-part average
    * (l_quantity < 0.5 * avg(l_quantity) over same part) is decorrelated
    * into a per-part aggregate joined back — and the comparison is cleared
    * of division: qc < 0.5·sum/cnt ⟺ 2·qc·cnt < sum over exact centi
    * ints, so the threshold is bit-identical in both engines. Both join
    * sides shrink to one brand's parts before any join (filter first,
    * join second — the Q18 lesson applied to Q17). */
  private val q17SmallQty = GraftQuery(
    "q17_small_qty_rev",
    "Q17 shape: correlated avg decorrelated to agg-join, integer-exact threshold",
    (s, d) => {
      val brandLines = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#13")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), centi(col("l_quantity")).as("qc"),
          centi(col("l_extendedprice")).as("pc"))
      val perPart = brandLines.groupBy("l_partkey")
        .agg(sum("qc").as("sum_qc"), count(lit(1)).as("cnt"))
        .withColumnRenamed("l_partkey", "pk")
      brandLines.join(broadcast(perPart), col("l_partkey") === col("pk"))
        .filter(col("qc") * 2 * col("cnt") < col("sum_qc"))
        .agg(sum("pc").as("spc"), count(lit(1)).as("n_small"))
        .select(fround(col("spc").cast("double") / 100.0 / 7.0, 2).as("avg_yearly"),
          col("n_small"))
    },
    Some("""WITH bl AS (SELECT l_partkey, CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_brand = 'Brand#13'), pp AS (SELECT l_partkey AS pk, CAST(sum(qc) AS BIGINT) AS sum_qc, count(*) AS cnt FROM bl GROUP BY 1) SELECT floor(CAST(sum(pc) AS DOUBLE) / 100.0 / 7.0 * 100.0 + 0.5) / 100.0 AS avg_yearly, count(*) AS n_small FROM bl JOIN pp ON l_partkey = pk WHERE qc * 2 * cnt < sum_qc"""))

  /** Q21 (suppliers who kept orders waiting). The classic EXISTS +
    * NOT-EXISTS pair over the same order's other lines, decorrelated into
    * per-order aggregates: an order qualifies a late line when it has
    * >1 distinct suppliers overall but exactly 1 distinct LATE supplier
    * (necessarily the line's own). ONE fact-fact shuffle total: after the
    * lineitem⋈orders join hash-partitions by orderkey, the
    * (orderkey, suppkey) groupBy AND both per-order window counts are
    * satisfied by that same partitioning (subset clustering), so neither
    * re-exchanges — vs the naive 3-aggregate spelling that shuffles
    * lineitem three times. Supplier names ride a broadcast at the end.
    * "Late" is l_shipdate > o_orderdate + 90 (no commit/receipt dates). */
  private val q21Waiting = GraftQuery(
    "q21_waiting_supp",
    "Q21 shape: EXISTS/NOT-EXISTS over sibling lines as per-order aggregates",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lines = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
      val perSupp = lines.groupBy("l_orderkey", "l_suppkey")
        .agg(sum(when(col("late"), 1L).otherwise(0L)).as("late_lines"))
      val w = Window.partitionBy("l_orderkey")
      perSupp
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late", sum(when(col("late_lines") > 0, 1L).otherwise(0L)).over(w))
        .filter(col("late_lines") > 0 && col("n_supp") > 1 && col("n_late") === 1)
        .groupBy("l_suppkey")
        .agg(sum("late_lines").as("numwait"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(10)
    },
    Some("""SELECT s_name, count(*) AS numwait FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey JOIN supplier ON l1.l_suppkey = s_suppkey WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY) GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10"""))

  /** Q22 (global sales opportunity). No c_phone ⇒ the country code is the
    * customer's nation. Two decorrelations: the scalar avg-balance
    * subquery becomes a broadcast 1-row (sum, count) aggregate with the
    * division cleared (bal > sum/cnt ⟺ bal·cnt > sum over exact ints),
    * and NOT EXISTS(orders) becomes a left-anti join against the
    * date-pruned orders scan (Q22's "no orders in 7 years" = no orders
    * since 1999 here; an unrestricted anti join is empty at every scale
    * factor because all high-balance customers have SOME order). Customer
    * never shuffles for the threshold — only for the final per-nation
    * agg. */
  private val q22Idle = GraftQuery(
    "q22_idle_balance",
    "Q22 shape: scalar-avg subquery + NOT EXISTS as broadcast agg + anti join",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), centi(col("c_acctbal")).as("balc"))
      val thresh = cust.filter(col("balc") > 0)
        .agg(sum("balc").as("sum_pos"), count(lit(1)).as("n_pos"))
      cust.join(broadcast(thresh))
        .filter(col("balc") * col("n_pos") > col("sum_pos"))
        .join(Tables.orders(s, d).filter(col("o_orderdate") >= lit("1999-01-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("cntry"))
        .agg(count(lit(1)).as("numcust"),
          fround(sum("balc").cast("double") / 100.0, 2).as("totacctbal"))
        .orderBy("cntry")
    },
    Some("""WITH cust AS (SELECT c_custkey, c_nationkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS balc FROM customer), t AS (SELECT CAST(sum(balc) AS BIGINT) AS sum_pos, count(*) AS n_pos FROM cust WHERE balc > 0) SELECT n_name AS cntry, count(*) AS numcust, floor(CAST(sum(balc) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS totacctbal FROM cust CROSS JOIN t JOIN nation ON c_nationkey = n_nationkey WHERE balc * n_pos > sum_pos AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') GROUP BY 1 ORDER BY 1"""))

  val all: Seq[GraftQuery] = Seq(
    q4Late, q6Forecast, q8Share, q9Profit, q12Priority, q13Distribution,
    q15TopSupplier, q16Variety, q17SmallQty, q21Waiting, q22Idle)
}
