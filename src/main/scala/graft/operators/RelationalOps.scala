package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** Relational capability surface: the reference's join/SQL examples
  * (SampleJoin.scala:39-50, KafkaStreamingJson.scala:64-68) plus the
  * capability-parity extras SURVEY.md §2.3/§2.5/§2.7 calls for — semi/anti/
  * outer/range/as-of joins, window functions, set ops, rollup/cube/grouping
  * sets — expressed TPC-H-style over the driver testdata.
  *
  * Scale notes per operator are inline; the recurring themes:
  *  - dimension sides are `broadcast()` so fact scans never shuffle for them;
  *  - fact-fact joins shuffle on the join key once and AQE handles skew;
  *  - global-ordering windows (moving averages over a date spine) are fine
  *    because they run AFTER aggregation has reduced cardinality to ~days.
  */
object RelationalOps {
  import graft.functions.GraftFunctions.{centi, fround}

  /** Exact fixed-point revenue: price and discount have <= 2 decimals, so
    * centi(price) * (100 - centi(discount)) is an exact integer of 1e-4
    * units. Distributed sums of it are order-independent, making both the
    * rounded output AND any ordering on it bit-deterministic across engines
    * (a float sum's last ulp can flip a 0.005 rounding boundary or a top-k
    * cut). DuckDB spelling: CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
    * * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)). */
  private val revC = centi(col("l_extendedprice")) * (lit(100L) - centi(col("l_discount")))
  private val revCSql =
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"

  /** TPC-H Q1 shape — the flagship pricing-summary scan+agg. One shuffle on
    * two low-cardinality keys; partial aggregation does nearly all work
    * map-side, so it scales linearly with input. */
  private val q1 = GraftQuery(
    "q1_pricing",
    "A1-family wide aggregate: 4 sums, 3 avgs, count over a pushed-down date filter",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        fround(sum("l_quantity"), 2).as("sum_qty"),
        fround(sum(centi(col("l_extendedprice"))).cast("double") / 100.0, 2).as("sum_base_price"),
        sum(revC).as("rc"),
        sum(revC * (lit(100L) + centi(col("l_tax")))).as("cc"),
        avg("l_quantity").as("avg_qty"),
        sum(centi(col("l_extendedprice"))).as("pc"),
        sum(centi(col("l_discount"))).as("dc"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"), col("sum_base_price"),
        fround(col("rc").cast("double") / 10000.0, 2).as("sum_disc_price"),
        fround(col("cc").cast("double") / 1000000.0, 2).as("sum_charge"),
        fround(col("avg_qty"), 4).as("avg_qty"),
        fround(col("pc").cast("double") / col("cnt") / 100.0, 4).as("avg_price"),
        fround(col("dc").cast("double") / col("cnt") / 100.0, 4).as("avg_disc"),
        col("cnt"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, floor(CAST(rc AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS sum_disc_price, floor(CAST(cc AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_charge, floor(avg_qty * 10000.0 + 0.5) / 10000.0 AS avg_qty, floor(CAST(pc AS DOUBLE) / cnt / 100.0 * 10000.0 + 0.5) / 10000.0 AS avg_price, floor(CAST(dc AS DOUBLE) / cnt / 100.0 * 10000.0 + 0.5) / 10000.0 AS avg_disc, cnt FROM (SELECT l_returnflag, l_linestatus, floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS sum_qty, floor(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS sum_base_price, CAST(sum($revCSql) AS BIGINT) AS rc, CAST(sum($revCSql * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))) AS BIGINT) AS cc, avg(l_quantity) AS avg_qty, CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS pc, CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS dc, count(*) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' GROUP BY 1, 2) ORDER BY 1, 2"""))

  /** TPC-H Q3 shape: filtered dim ⋈ fact ⋈ fact, then top-k by revenue.
    * customer is broadcast; orders⋈lineitem shuffles on orderkey once. */
  private val q3 = GraftQuery(
    "q3_shipping",
    "J1 multi-join + agg + TakeOrderedAndProject top-10",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1997-06-30"))
      .join(Tables.orders(s, d).filter(col("o_orderdate") < lit("1997-06-30")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("odate"))
      .agg(sum(revC).as("rc"))
      .orderBy(desc("rc"), col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("odate"),
        fround(col("rc").cast("double") / 10000.0, 2).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey")),
    Some(s"""SELECT l_orderkey, odate, floor(CAST(rc AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS revenue FROM (SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate, sum($revCSql) AS rc FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey WHERE l_shipdate > TIMESTAMP '1997-06-30 00:00:00' AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00' AND c_mktsegment = 'BUILDING' GROUP BY 1, 2 ORDER BY rc DESC, l_orderkey LIMIT 10) ORDER BY revenue DESC, l_orderkey"""))

  /** TPC-H Q5 shape: 6-table join with a region filter that prunes through
    * the broadcast dims before any fact rows are joined. */
  private val q5 = GraftQuery(
    "q5_region_revenue",
    "J1/J3 star join (2 fact, 4 dim) + per-nation revenue",
    (s, d) => Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(fround(sum(revC).cast("double") / 10000.0, 2).as("rev"))
      .orderBy(desc("rev"), col("n_name")),
    Some(s"""SELECT n_name, floor(CAST(sum($revCSql) AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS rev FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND r_name = 'ASIA' GROUP BY 1 ORDER BY rev DESC, n_name"""))

  /** Left-semi join = EXISTS. The filter on the build side shrinks it before
    * the join; semi joins never duplicate probe rows, so no post-dedup. */
  private val jSemi = GraftQuery(
    "j_semi",
    "left_semi join (EXISTS): orders having a heavy line item",
    (s, d) => Tables.orders(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), fround(sum(centi(col("o_totalprice"))).cast("double") / 100.0, 2).as("total"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, count(*) AS cnt, floor(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total FROM orders WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45) GROUP BY 1 ORDER BY 1"""))

  /** Left-anti join = NOT EXISTS: customers with no urgent order. */
  private val jAnti = GraftQuery(
    "j_anti",
    "left_anti join (NOT EXISTS): customers with no 1-URGENT order",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, count(*) AS cnt FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') GROUP BY 1 ORDER BY 1"""))

  /** Left-outer join preserving customers with zero orders. */
  private val jOuter = GraftQuery(
    "j_outer",
    "left outer join + per-key counts including empty groups",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        fround(coalesce(sum(centi(col("o_totalprice"))), lit(0L)).cast("double") / 100.0, 2).as("spend"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders, floor(CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS spend FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1 ORDER BY 1"""))

  /** Equi + range (band) join: quantity within ±2 of part size. The equi key
    * carries the join; the range predicate is evaluated as a post-filter, so
    * this stays a hash join (no nested-loop blowup). */
  private val jRange = GraftQuery(
    "j_range",
    "range/band join on equi key + interval predicate",
    (s, d) => Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey") &&
          col("l_quantity").between(col("p_size") - 2, col("p_size") + 2))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"), fround(sum(centi(col("l_extendedprice"))).cast("double") / 100.0, 2).as("total"))
      .orderBy("p_brand"),
    Some("""SELECT p_brand, count(*) AS cnt, floor(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity BETWEEN p_size - 2 AND p_size + 2 GROUP BY 1 ORDER BY 1"""))

  /** As-of join: for each purchase, the most recent prior signup by the same
    * user. Implemented with a single sort within user partitions (union the
    * two event roles, carry the last signup id forward) — one shuffle on
    * user_id, no per-row subqueries; this is the scalable pattern for as-of
    * joins when both sides share a partition key. */
  private val jAsof = GraftQuery(
    "j_asof",
    "as-of join via last_value over a merged, per-key-ordered stream",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "signup"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          when(col("event_type") === "signup", col("event_id")).as("sig_id"))
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("signup_id", last("sig_id", ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("signup_id").isNotNull)
        .select(col("user_id"), col("event_id").as("purchase_id"), col("signup_id"))
        .orderBy("purchase_id")
    },
    Some("""SELECT p.user_id, p.event_id AS purchase_id, s.event_id AS signup_id FROM (SELECT user_id, event_id FROM events WHERE event_type = 'purchase') p ASOF JOIN (SELECT user_id, event_id FROM events WHERE event_type = 'signup') s ON p.user_id = s.user_id AND s.event_id < p.event_id ORDER BY purchase_id"""))

  /** Ranking window over a pre-aggregated frame. Rank keys are rounded +
    * uniquely tie-broken so the result is deterministic across engines. */
  private val winRank = GraftQuery(
    "win_rank",
    "window rank(): top-3 suppliers by revenue within each nation",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey", "s_suppkey")
        .agg(fround(sum(revC).cast("double") / 10000.0, 2).as("rev"))
      rev.withColumn("rnk", rank().over(
          Window.partitionBy("s_nationkey").orderBy(desc("rev"), col("s_suppkey"))))
        .filter(col("rnk") <= 3)
        .orderBy("s_nationkey", "rnk", "s_suppkey")
    },
    Some(s"""SELECT s_nationkey, s_suppkey, rev, CAST(rnk AS INTEGER) AS rnk FROM (SELECT s_nationkey, s_suppkey, rev, rank() OVER (PARTITION BY s_nationkey ORDER BY rev DESC, s_suppkey) AS rnk FROM (SELECT s_nationkey, s_suppkey, floor(CAST(sum($revCSql) AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS rev FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1, 2)) WHERE rnk <= 3 ORDER BY s_nationkey, rnk, s_suppkey"""))

  /** Moving average + day-over-day delta over the daily revenue series.
    * The window is partitioned by year so frames stay distributed (an
    * unpartitioned `Window.orderBy` funnels the whole series through one
    * partition — the scale-killer shape); the trade-off, identical in both
    * engines, is that frames reset at year boundaries (the first days of a
    * year average over <7 rows and day 1's delta is null). */
  private val winMoving = GraftQuery(
    "win_moving_avg",
    "sliding frame (7-day moving avg) + lag() delta over a date series, year-partitioned",
    (s, d) => {
      val daily = Tables.lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("dy"))
        .agg(fround(sum(centi(col("l_extendedprice"))).cast("double") / 100.0, 2).as("rev"))
      val ord = Window.partitionBy(year(col("dy"))).orderBy("dy")
      val frame = ord.rowsBetween(-6, 0)
      daily
        .withColumn("rc", centi(col("rev")))
        .withColumn("ma7", fround(
          sum("rc").over(frame).cast("double") / count(lit(1)).over(frame) / 100.0, 4))
        .withColumn("delta", fround(col("rev") - lag("rev", 1).over(ord), 2))
        .select("dy", "rev", "ma7", "delta")
        .orderBy("dy")
    },
    Some("""SELECT dy, rev, floor(CAST(sum(rc) OVER w AS DOUBLE) / count(*) OVER w / 100.0 * 10000.0 + 0.5) / 10000.0 AS ma7, floor((rev - lag(rev, 1) OVER (PARTITION BY year(dy) ORDER BY dy)) * 100.0 + 0.5) / 100.0 AS delta FROM (SELECT dy, rev, CAST(floor(rev * 100 + 0.5) AS BIGINT) AS rc FROM (SELECT CAST(l_shipdate AS DATE) AS dy, floor(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS rev FROM lineitem GROUP BY 1)) WINDOW w AS (PARTITION BY year(dy) ORDER BY dy ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) ORDER BY dy"""))

  private val setIntersect = GraftQuery(
    "set_intersect",
    "INTERSECT (distinct set semantics): users who clicked AND purchased",
    (s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "click").select("user_id")
        .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'click' INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase' ORDER BY user_id"""))

  /** (user, day) granularity keeps the difference non-empty at every scale
    * factor — at sf0.001 all 15 users have done everything at least once,
    * so a user-level EXCEPT degenerates to zero rows. */
  private val setExcept = GraftQuery(
    "set_except",
    "EXCEPT: user-days with a click but no purchase",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("dy"), col("event_type"))
      ev.filter(col("event_type") === "click").select("user_id", "dy")
        .except(ev.filter(col("event_type") === "purchase").select("user_id", "dy"))
        .orderBy("user_id", "dy")
    },
    Some("""SELECT user_id, CAST(ts AS DATE) AS dy FROM events WHERE event_type = 'click' EXCEPT SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'purchase' ORDER BY user_id, dy"""))

  private val setUnion = GraftQuery(
    "set_union",
    "UNION (distinct): signup ∪ error user populations",
    (s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "signup").select("user_id")
        .union(ev.filter(col("event_type") === "error").select("user_id"))
        .distinct()
        .orderBy("user_id")
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'signup' UNION SELECT user_id FROM events WHERE event_type = 'error' ORDER BY user_id"""))

  /** The NAIVE band-join spelling — `abs(bala − balb) <= ε` as the bare
    * join condition — relying on [[graft.BandJoinRewrite]] to derive the
    * bucket + neighbor-bucket equi plan automatically (Spark's own
    * strategies for this condition are BroadcastNestedLoopJoin or a
    * cartesian product). Results are identical to the hand-bucketed
    * [[jBandBucketed]] by construction; the plan spec asserts no
    * nested-loop/cartesian operator survives into the physical plan.
    * This is the declare-what-you-mean surface: users write the theta
    * join, the optimizer owns the scale shape. */
  private val jBandAuto = GraftQuery(
    "j_band_auto",
    "naive abs-diff theta join, auto-rewritten to a bucketed equi join",
    (s, d) => {
      val a = Tables.supplier(s, d)
        .select(col("s_suppkey").as("a"), centi(col("s_acctbal")).as("bala"))
      val b = Tables.supplier(s, d)
        .select(col("s_suppkey").as("b"), centi(col("s_acctbal")).as("balb"))
      a.join(b, abs(col("bala") - col("balb")) <= lit(10000L) &&
          col("a") < col("b"))
        .select(col("a"), col("b"),
          fround(abs(col("bala") - col("balb")).cast("double") / 100.0, 2)
            .as("bal_diff"))
        .orderBy("a", "b")
    },
    Some("""WITH s AS (SELECT s_suppkey AS k, CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal FROM supplier) SELECT x.k AS a, y.k AS b, floor(CAST(abs(x.bal - y.bal) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS bal_diff FROM s x JOIN s y ON abs(x.bal - y.bal) <= 10000 AND x.k < y.k ORDER BY a, b"""))

  /** The naive band spelling on RAW DOUBLE operands — no centi()
    * fixed-point detour anywhere — exercising [[graft.BandJoinRewrite]]'s
    * DoubleType path: floor(x/ε) buckets with the ±2 explode reach that
    * makes the float floor-slip provably harmless (rule scaladoc has the
    * bound). Exactness does NOT depend on the bucketing: the original
    * float predicate is re-evaluated as the post-probe filter, and the
    * oracle runs the identical IEEE predicate, so the hash compare pins
    * pair-for-pair equality. The output diff column is a single IEEE
    * subtraction (not a sum), deterministic in both engines. */
  private val jBandDouble = GraftQuery(
    "j_band_double",
    "naive abs-diff theta join on double operands, auto-rewritten to a bucketed equi join",
    (s, d) => {
      val a = Tables.supplier(s, d)
        .select(col("s_suppkey").as("a"), col("s_acctbal").as("bala"))
      val b = Tables.supplier(s, d)
        .select(col("s_suppkey").as("b"), col("s_acctbal").as("balb"))
      a.join(b, abs(col("bala") - col("balb")) <= lit(500.0) &&
          col("a") < col("b"))
        .select(col("a"), col("b"),
          fround(abs(col("bala") - col("balb")), 2).as("bal_diff"))
        .orderBy("a", "b")
    },
    Some("""WITH s AS (SELECT s_suppkey AS k, s_acctbal AS bal FROM supplier) SELECT x.k AS a, y.k AS b, floor(abs(x.bal - y.bal) * 100.0 + 0.5) / 100.0 AS bal_diff FROM s x JOIN s y ON abs(x.bal - y.bal) <= 500.0 AND x.k < y.k ORDER BY a, b"""))

  /** The naive band spelling on DECIMAL operands — how money columns
    * actually arrive in a warehouse — exercising
    * [[graft.BandJoinRewrite]]'s DecimalType path: exact unscaled-long
    * bucketing with the same ±1 reach as the Long path (rule scaladoc
    * has the ceiling-lift bound). The decimal balances are built from
    * exact integer cents (centi → decimal division that terminates at
    * scale 2) so both engines hold bit-identical values; every
    * comparison and the output diff are exact integer/decimal
    * arithmetic end to end. */
  private val jBandDecimal = GraftQuery(
    "j_band_decimal",
    "naive abs-diff theta join on DECIMAL(12,2) money operands, auto-rewritten to a bucketed equi join",
    (s, d) => {
      def bal = (centi(col("s_acctbal")).cast("decimal(14,2)") / lit(100))
        .cast("decimal(12,2)")
      val a = Tables.supplier(s, d)
        .select(col("s_suppkey").as("a"), bal.as("bala"))
      val b = Tables.supplier(s, d)
        .select(col("s_suppkey").as("b"), bal.as("balb"))
      a.join(b, abs(col("bala") - col("balb")) <= lit(BigDecimal("500.00")) &&
          col("a") < col("b"))
        .select(col("a"), col("b"),
          (abs(col("bala") - col("balb")) * lit(100)).cast("long").as("diff_c"))
        .orderBy("a", "b")
    },
    // the oracle runs the SAME band in exact integer cents — equivalent
    // by construction (the decimal values are exactly cents/100), so the
    // hash compare pins the decimal path pair-for-pair without leaning
    // on DuckDB's double→decimal cast rounding
    Some("""WITH s AS (SELECT s_suppkey AS k, CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS c FROM supplier) SELECT x.k AS a, y.k AS b, abs(x.c - y.c) AS diff_c FROM s x JOIN s y ON abs(x.c - y.c) <= 50000 AND x.k < y.k ORDER BY a, b"""))

  /** The CALENDAR band spelling — `abs(datediff(a, b)) <= days` as the
    * bare join condition — [[graft.BandJoinRewrite]]'s DateType arm:
    * dates are epoch days internally, so the bucketing is the exact
    * Long path on days-since-epoch (±1 reach). The matching-events-
    * within-a-day-window shape (entity resolution across feeds, order
    * correlation) that otherwise nested-loops. Both sides are
    * customer-disjoint order slices, so the pair count is band-bounded
    * rather than quadratic. */
  private val jBandDate = GraftQuery(
    "j_band_date",
    "naive datediff theta join on DATE operands, auto-rewritten to a bucketed equi join",
    (s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_custkey") < 50)
        .select(col("o_orderkey").as("ka"), to_date(col("o_orderdate")).as("da"))
      val b = o.filter(col("o_custkey") >= 50 && col("o_custkey") < 100)
        .select(col("o_orderkey").as("kb"), to_date(col("o_orderdate")).as("db"))
      a.join(b, abs(datediff(col("da"), col("db"))) <= lit(1))
        .select(col("ka"), col("kb"),
          abs(datediff(col("da"), col("db"))).cast("long").as("day_gap"))
        .orderBy("ka", "kb")
    },
    Some("""WITH a AS (SELECT o_orderkey AS ka, CAST(o_orderdate AS DATE) AS da FROM orders WHERE o_custkey < 50), b AS (SELECT o_orderkey AS kb, CAST(o_orderdate AS DATE) AS db FROM orders WHERE o_custkey >= 50 AND o_custkey < 100) SELECT ka, kb, CAST(abs(date_diff('day', db, da)) AS BIGINT) AS day_gap FROM a JOIN b ON abs(date_diff('day', db, da)) <= 1 ORDER BY ka, kb"""))

  /** The INTERVAL band spelling — `abs(ts_a − ts_b) <= INTERVAL '2'
    * MINUTE` as the bare join condition — [[graft.BandJoinRewrite]]'s
    * TimestampType arm: day-time intervals are exact Long microseconds,
    * so the bucketing is the exact Long path on unix micros (±1 reach).
    * The events-correlation shape (purchase↔error temporal proximity —
    * incident attribution, fraud signals) users write natively with
    * interval literals instead of the unix_micros detour. */
  private val jBandTimestamp = GraftQuery(
    "j_band_timestamp",
    "naive interval theta join on TIMESTAMP operands, auto-rewritten to a bucketed equi join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val a = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("ka"), col("ts").as("tsa"))
      val b = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("kb"), col("ts").as("tsb"))
      a.join(b,
          abs(col("tsa") - col("tsb")) <= lit(java.time.Duration.ofMinutes(2)))
        .select(col("ka"), col("kb"),
          abs(unix_micros(col("tsa")) - unix_micros(col("tsb"))).as("gap_us"))
        .orderBy("ka", "kb")
    },
    // the oracle runs the identical band in exact integer microseconds
    // (2 min = 120000000 µs, both inclusive) — equivalent by construction
    Some("""WITH a AS (SELECT event_id AS ka, epoch_us(CAST(ts AS TIMESTAMP)) AS ua FROM events WHERE event_type = 'purchase'), b AS (SELECT event_id AS kb, epoch_us(CAST(ts AS TIMESTAMP)) AS ub FROM events WHERE event_type = 'error') SELECT ka, kb, abs(ua - ub) AS gap_us FROM a JOIN b ON abs(ua - ub) <= 120000000 ORDER BY ka, kb"""))

  /** Per-key top-k through the CUSTOM WHOLE-OPERATOR plan
    * ([[graft.plans.TopKPerKey]]: LogicalPlan + SparkStrategy +
    * bounded-heap SparkPlan, injected via GraftExtensions) — one pass,
    * O(n log k), O(keys·k) memory, instead of the window row_number
    * plan's full per-group sort. The oracle is the window spelling, so
    * the hash compare proves the operator IS row_number()<=k under the
    * (value desc, event_id) order. */
  private val relTopkNative = GraftQuery(
    "rel_topk_native",
    "per-user top-3 events via the custom bounded-heap TopKPerKey operator",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"))
      graft.plans.TopKPerKey.of(ev, "user_id", "value", "event_id", 3)
        .select(col("user_id"), col("event_id"),
          fround(col("value"), 2).as("value"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH rk AS (SELECT user_id, event_id, value, row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn FROM events) SELECT user_id, event_id, floor(value * 100.0 + 0.5) / 100.0 AS value FROM rk WHERE rn <= 3 ORDER BY user_id, event_id"""))

  /** The SAME top-k spelled DECLARATIVELY with the window API — no
    * explicit TopKPerKey call anywhere. [[graft.WindowTopKRewrite]]
    * recognizes the row_number-filter-drop shape and lowers it to the
    * bounded-heap operator automatically (a spec asserts the physical
    * plan shows TopKPerKeyPartial/TopKPerKey and no Window sort), so
    * every user-spelled per-group top-k — the reference's A4 pattern,
    * killrweather-app PrecipitationActor.scala:49 — gets the one-pass
    * O(n log k) plan for free. Oracle identical to rel_topk_native:
    * proves the rewrite IS row_number()<=k. */
  private val winTopkAuto = GraftQuery(
    "win_topk_auto",
    "per-user top-3 events: declarative row_number spelling, auto-lowered to the heap operator",
    (s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(desc("value"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .drop("rn")
        .select(col("user_id"), col("event_id"),
          fround(col("value"), 2).as("value"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH rk AS (SELECT user_id, event_id, value, row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn FROM events) SELECT user_id, event_id, floor(value * 100.0 + 0.5) / 100.0 AS value FROM rk WHERE rn <= 3 ORDER BY user_id, event_id"""))

  /** Multi-key + string-key top-k through the SAME declarative spelling —
    * proves the generalized operator end-to-end: WindowTopKRewrite fires
    * on a two-column (string, string) partition key and the heap groups
    * via the generic UnsafeProjection (the round-8 operator was pinned to
    * one bigint key). Top-2 longest docs per (source, lang), doc_id
    * tiebreak. */
  private val winTopkMultikey = GraftQuery(
    "win_topk_multikey",
    "top-2 longest documents per (source, lang): declarative spelling, multi/string keys via the heap operator",
    (s, d) => {
      val w = Window.partitionBy("source", "lang")
        .orderBy(desc("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("source"), col("lang"), col("doc_id"), col("n_chars"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .drop("rn")
        .orderBy("source", "lang", "doc_id")
    },
    Some("""WITH rk AS (SELECT source, lang, doc_id, n_chars, row_number() OVER (PARTITION BY source, lang ORDER BY n_chars DESC, doc_id) AS rn FROM documents) SELECT source, lang, doc_id, n_chars FROM rk WHERE rn <= 2 ORDER BY source, lang, doc_id"""))

  /** NULL-ORDERING top-k through the declarative spelling: the order
    * column is genuinely nullable (purchases keep their centi value,
    * every other event type is NULL) and ranked DESC NULLS FIRST, so the
    * heap must reproduce Catalyst's null-ordering — null outranks every
    * value, ties broken by event_id — bit-for-bit against the DuckDB
    * window (which spells the same NULLS FIRST). k=2 per user keeps
    * null-ord rows in the answer wherever a user has ≥1 non-purchase
    * event, making any null-handling divergence a guaranteed hash
    * mismatch rather than a tail case. */
  private val winTopkNulls = GraftQuery(
    "win_topk_nulls",
    "per-user top-2 under DESC NULLS FIRST on a nullable order column via the heap operator",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          when(col("event_type") === "purchase", centi(col("value")))
            .otherwise(lit(null)).as("ov"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ov").desc_nulls_first, col("event_id"))
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .drop("rn")
        .orderBy("user_id", "event_id")
    },
    Some("""WITH rk AS (SELECT user_id, event_id, CASE WHEN event_type = 'purchase' THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE NULL END AS ov, row_number() OVER (PARTITION BY user_id ORDER BY CASE WHEN event_type = 'purchase' THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE NULL END DESC NULLS FIRST, event_id) AS rn FROM events) SELECT user_id, event_id, ov FROM rk WHERE rn <= 2 ORDER BY user_id, event_id"""))

  /** 4-4-5 FISCAL CALENDAR rollup — the retail-calendar mapping every
    * warehouse grows eventually: fiscal years start Feb 1, each quarter
    * is 4+4+5 weeks, periods number 1..12 (week 53 of long years clamps
    * into period 12, the standard convention). The mapping is pure
    * closed-form integer arithmetic on the order date — no calendar
    * dimension join, so it rides the scan as a codegen'd projection and
    * the rollup is one keyed agg with exact centi revenue. */
  private val calFiscal445 = GraftQuery(
    "cal_fiscal_445",
    "4-4-5 fiscal calendar (FY starts Feb 1): orders + revenue per period",
    (s, d) => {
      val od = col("o_orderdate").cast("date")
      val fy = when(month(od) >= 2, year(od)).otherwise(year(od) - 1)
      Tables.orders(s, d)
        .select(od.as("od"), fy.as("fy"), centi(col("o_totalprice")).as("pc"))
        .withColumn("wk", least(
          expr("datediff(od, make_date(fy, 2, 1)) div 7"), lit(51)))
        .withColumn("q", expr("wk div 13") + 1)
        .withColumn("period", (col("q") - 1) * 3 +
          when(col("wk") % 13 < 4, 1).when(col("wk") % 13 < 8, 2).otherwise(3))
        .groupBy("fy", "q", "period")
        .agg(count(lit(1)).as("n_orders"),
          fround(sum("pc").cast("double") / 100.0, 2).as("revenue"))
        .orderBy("fy", "period")
    },
    Some("""WITH o AS (SELECT CAST(o_orderdate AS DATE) AS od, CASE WHEN month(CAST(o_orderdate AS DATE)) >= 2 THEN year(CAST(o_orderdate AS DATE)) ELSE year(CAST(o_orderdate AS DATE)) - 1 END AS fy, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc FROM orders), w AS (SELECT fy, least(date_diff('day', make_date(fy, 2, 1), od) // 7, 51) AS wk, pc FROM o), p AS (SELECT fy, wk // 13 + 1 AS q, (wk // 13) * 3 + CASE WHEN wk % 13 < 4 THEN 1 WHEN wk % 13 < 8 THEN 2 ELSE 3 END AS period, pc FROM w) SELECT fy, q, period, CAST(count(*) AS BIGINT) AS n_orders, floor(CAST(sum(pc) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS revenue FROM p GROUP BY 1, 2, 3 ORDER BY fy, period"""))

  /** BAND JOIN (|x − y| ≤ ε) via BUCKET + NEIGHBOR-BUCKET equi keys — the
    * scale-safe spelling of a similarity/tolerance join on a numeric
    * axis: bucket each value at ε width, explode ONE side to its three
    * candidate buckets, equi-join on the bucket, verify the exact band
    * predicate post-probe. Each row is replicated exactly 3×, every true
    * pair matches exactly once (the probe's home bucket is unique, and
    * a < b kills the mirror) — never the O(n²) theta join Spark would
    * otherwise plan for a bare |a−b| ≤ ε condition. Values are shifted
    * non-negative before the integer div so Spark's truncating `div` and
    * DuckDB's flooring `//` agree. */
  private val jBandBucketed = GraftQuery(
    "j_band_bucketed",
    "band join |acctbal diff| <= 100 as bucket+neighbor equi join",
    (s, d) => {
      val band = 10000L
      val off = 1000000L
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey").as("k"), centi(col("s_acctbal")).as("bal"))
        .withColumn("b2", expr(s"(bal + $off) div $band"))
      val left = sup.select(col("k").as("a"), col("bal").as("bala"),
        explode(array(col("b2") - 1, col("b2"), col("b2") + 1)).as("bk"))
      val right = sup.select(col("k").as("b"), col("bal").as("balb"),
        col("b2").as("bk"))
      left.join(right, Seq("bk"))
        .filter(col("a") < col("b") &&
          abs(col("bala") - col("balb")) <= band)
        .select(col("a"), col("b"),
          fround(abs(col("bala") - col("balb")).cast("double") / 100.0, 2)
            .as("bal_diff"))
        .orderBy("a", "b")
    },
    Some("""WITH s AS (SELECT s_suppkey AS k, CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal FROM supplier), s2 AS (SELECT *, (bal + 1000000) // 10000 AS b2 FROM s), l AS (SELECT k AS a, bal AS bala, b2 + d AS bk FROM s2, (SELECT unnest([-1, 0, 1]) AS d)), r AS (SELECT k AS b, bal AS balb, b2 AS bk FROM s2) SELECT a, b, floor(CAST(abs(bala - balb) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS bal_diff FROM l JOIN r USING (bk) WHERE a < b AND abs(bala - balb) <= 10000 ORDER BY a, b"""))

  /** SYMMETRIC DIFFERENCE — the set-op composition (A∖B) ∪ (B∖A) with a
    * side tag, completing the §2.7 union/intersect/except family: the
    * audit read "which user-days are in exactly one of the two behavioral
    * populations". Both EXCEPT legs hash-aggregate on the same
    * (user_id, day) key, so AQE reuses one shuffle partitioning across
    * the composition; the tag is a plain literal column, not a second
    * scan. */
  private val setSymdiff = GraftQuery(
    "set_symdiff",
    "symmetric difference of click vs purchase user-day sets, side-tagged",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("dy"), col("event_type"))
      val a = ev.filter(col("event_type") === "click").select("user_id", "dy")
      val b = ev.filter(col("event_type") === "purchase").select("user_id", "dy")
      a.except(b).withColumn("side", lit("click_only"))
        .union(b.except(a).withColumn("side", lit("purchase_only")))
        .orderBy("user_id", "dy", "side")
    },
    Some("""WITH a AS (SELECT user_id, CAST(ts AS DATE) AS dy FROM events WHERE event_type = 'click'), b AS (SELECT user_id, CAST(ts AS DATE) AS dy FROM events WHERE event_type = 'purchase') SELECT user_id, dy, 'click_only' AS side FROM (SELECT * FROM a EXCEPT SELECT * FROM b) UNION ALL SELECT user_id, dy, 'purchase_only' FROM (SELECT * FROM b EXCEPT SELECT * FROM a) ORDER BY user_id, dy, side"""))

  /** ROLLUP: hierarchical subtotals. Null group markers are coalesced to a
    * sentinel so cross-engine null-ordering differences can't bite. */
  private val aggRollup = GraftQuery(
    "agg_rollup",
    "GROUP BY ROLLUP with subtotal + grand-total rows",
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), fround(sum("l_quantity"), 2).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("cnt"), col("qty"))
      .orderBy("rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls, count(*) AS cnt, floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS qty FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls"""))

  /** GROUPING_ID() disambiguation — the piece of the rollup surface the
    * coalesce-to-sentinel spelling above papers over: when a real group
    * value could COLLIDE with the sentinel, only the grouping bitmask
    * tells subtotal rows from data rows. One rollup, the standard bit
    * semantics (first rollup column = MSB) proven identical across
    * engines, and the per-level row census a cube-serving layer keys
    * its cache on. */
  private val aggGroupingId = GraftQuery(
    "agg_grouping_id",
    "ROLLUP with grouping_id() bitmask + per-level census",
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"))
      .select(coalesce(col("l_returnflag"), lit("~")).as("rf"),
        coalesce(col("l_linestatus"), lit("~")).as("ls"),
        col("gid"), col("g_rf"), col("g_ls"), col("cnt"))
      .orderBy("gid", "rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, '~') AS rf, coalesce(l_linestatus, '~') AS ls, CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid, CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf, CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls, count(*) AS cnt FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY gid, rf, ls"""))

  private val aggCube = GraftQuery(
    "agg_cube",
    "GROUP BY CUBE over (event_type, month)",
    (s, d) => Tables.events(s, d)
      .withColumn("mon", month(col("ts")))
      .cube(col("event_type"), col("mon"))
      .agg(count(lit(1)).as("cnt"),
        fround(sum(centi(col("value"))).cast("double") / 100.0, 2).as("total"))
      .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
        coalesce(col("mon"), lit(-1)).as("mon"), col("cnt"), col("total"))
      .orderBy("etype", "mon"),
    Some("""SELECT coalesce(event_type, 'ALL') AS etype, coalesce(mon, -1) AS mon, count(*) AS cnt, floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total FROM (SELECT event_type, CAST(month(ts) AS INTEGER) AS mon, value FROM events) GROUP BY CUBE(event_type, mon) ORDER BY etype, mon"""))

  /** GROUPING SETS through the spark.sql entry path (temp views), mirroring
    * the reference's SQL-over-named-tables surface (SampleJoin.scala:40-48). */
  private val aggGroupingSets = GraftQuery(
    "agg_grouping_sets",
    "SQL path: GROUPING SETS over a 3-table dim join",
    (s, d) => {
      Tables.register(s, d, Seq("customer", "nation", "region"))
      s.sql("""SELECT coalesce(r_name, 'ALL') AS rname, coalesce(n_name, 'ALL') AS nname, count(*) AS cnt
               FROM customer JOIN nation ON c_nationkey = n_nationkey
                             JOIN region ON n_regionkey = r_regionkey
               GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
               ORDER BY rname, nname""")
    },
    Some("""SELECT coalesce(r_name, 'ALL') AS rname, coalesce(n_name, 'ALL') AS nname, count(*) AS cnt FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ()) ORDER BY rname, nname"""))

  /** HyperLogLog++ distinct estimate next to the exact count. The sketch is
    * the 100 TB path (mergeable, constant memory); no oracle because DuckDB's
    * approx sketch differs — exactness is asserted in ScalaTest instead. */
  private val aggApprox = GraftQuery(
    "agg_approx_distinct",
    "approx_count_distinct (HLL++) vs exact countDistinct per event_type",
    (s, d) => Tables.events(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id").as("approx_users"),
        countDistinct("user_id").as("exact_users"))
      .orderBy("event_type"),
    None, boundedBy = Some("OperatorSpec"))

  /** Semi-structured extraction (ref S13/S14/F8: JSON parsing surface).
    * regexp_extract keeps the expression codegen'd and engine-portable. */
  private val jsonKv = GraftQuery(
    "json_kv_extract",
    "F8 JSON field extraction from a string column + bucketed aggregate",
    (s, d) => Tables.events(s, d)
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
      .groupBy((col("k") % 10).as("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(centi(col("value"))).as("s"))
      .select(col("bucket"), col("cnt"),
        fround(col("s").cast("double") / col("cnt") / 100.0, 4).as("avg_val"))
      .orderBy("bucket"),
    Some("""SELECT bucket, cnt, floor(CAST(s AS DOUBLE) / cnt / 100.0 * 10000.0 + 0.5) / 10000.0 AS avg_val FROM (SELECT TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) % 10 AS bucket, count(*) AS cnt, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s FROM events GROUP BY 1) ORDER BY 1"""))

  /** Date-spine generation (ref F6: the lazy day-stream generator becomes
    * sequence + explode) left-joined to actuals so empty days appear. */
  private val calDaily = GraftQuery(
    "cal_daily_counts",
    "F6 sequence/explode calendar spine + left join, zero-filled",
    (s, d) => {
      val ev = Tables.events(s, d).withColumn("dy", to_date(col("ts")))
      val cal = ev.agg(min("dy").as("lo"), max("dy").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("dy"))
      val daily = ev.groupBy("dy").agg(count(lit(1)).as("c"))
      cal.join(daily, Seq("dy"), "left")
        .select(col("dy"), coalesce(col("c"), lit(0L)).as("cnt"))
        .orderBy("dy")
    },
    Some("""WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events), cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS dy FROM b), d AS (SELECT CAST(ts AS DATE) AS dy, count(*) AS c FROM events GROUP BY 1) SELECT cal.dy, CAST(coalesce(d.c, 0) AS BIGINT) AS cnt FROM cal LEFT JOIN d USING (dy) ORDER BY dy"""))

  /** Date formatting (ref F5: "EEEE, MMMM dd, yyyy" format surface). */
  private val strWeekday = GraftQuery(
    "str_weekday_agg",
    "F3/F5 date_format weekday name + aggregate",
    (s, d) => Tables.events(s, d)
      .groupBy(date_format(col("ts"), "EEEE").as("weekday"))
      .agg(count(lit(1)).as("cnt"), fround(sum(centi(col("value"))).cast("double") / 100.0, 2).as("total"))
      .orderBy("weekday"),
    Some("""SELECT strftime(ts, '%A') AS weekday, count(*) AS cnt, floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total FROM events GROUP BY 1 ORDER BY 1"""))

  /** Co-located fact⋈fact join over bucketed tables (Layouts): both sides
    * pre-bucketed by order key, so the join runs with NO exchange on either
    * side — the storage-layout co-location the reference gets from shared
    * Cassandra partition keys (SURVEY §1.4). PlanQualitySpec asserts the
    * exchange-free plan; the oracle proves layout never changes results. */
  private val jBucketed = GraftQuery(
    "j_bucketed_colocated",
    "shuffle-free join via bucketed layout (bucketBy order key both sides)",
    (s, d) => {
      graft.sources.Layouts.bucketedOrdersLineitem(s, d)
      s.table("graft_orders_b")
        .join(s.table("graft_lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS cnt, sum(l_quantity) AS sum_qty FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1 ORDER BY 1"""))

  /** TPC-H Q14 shape: conditional aggregation (CASE WHEN inside sum) over a
    * fact⋈dim join — promo revenue share per month. The part side carries
    * only (partkey, type-flag) into the broadcast, and the numerator/
    * denominator come out of ONE pass (two conditional sums), not two scans.
    * Ratio is derived from exact centi-integer sums then floor-rounded. */
  private val q14Promo = GraftQuery(
    "q14_promo_share",
    "conditional aggregation: CASE WHEN promo revenue share per month",
    (s, d) => Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_type").startsWith("PROMO").as("is_promo"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).as("yr"), month(col("l_shipdate")).as("mon"))
      .agg(sum(when(col("is_promo"), revC).otherwise(lit(0L))).as("pc"),
        sum(revC).as("tc"), count(lit(1)).as("cnt"))
      .select(col("yr"), col("mon"), col("cnt"),
        fround(col("pc").cast("double") / 10000.0, 2).as("promo_rev"),
        fround(lit(100.0) * col("pc") / col("tc"), 4).as("promo_share_pct"))
      .orderBy("yr", "mon"),
    Some(s"""SELECT yr, mon, cnt, floor(CAST(pc AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS promo_rev, floor(100.0 * pc / tc * 10000.0 + 0.5) / 10000.0 AS promo_share_pct FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, CAST(month(l_shipdate) AS INTEGER) AS mon, CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $revCSql ELSE 0 END) AS BIGINT) AS pc, CAST(sum($revCSql) AS BIGINT) AS tc, count(*) AS cnt FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2) ORDER BY 1, 2"""))

  /** TPC-H Q18 shape (large-volume customers): aggregate the fact FIRST,
    * cut to the top-100 with TakeOrderedAndProject (per-partition heaps, no
    * global sort), and only then join the 100 survivors to orders+customer —
    * both joins broadcast the tiny side. The scalable order of operations:
    * reduce before you join. */
  private val q18TopQuantity = GraftQuery(
    "q18_top_quantity",
    "Q18 shape: top-100 orders by total quantity, joined to orders+customer",
    (s, d) => {
      val top = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(centi(col("l_quantity"))).as("qc"))
        .orderBy(col("qc").desc, col("l_orderkey"))
        .limit(100)
      top.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_date"),
          fround(centi(col("o_totalprice")).cast("double") / 100.0, 2).as("o_total"),
          fround(col("qc").cast("double") / 100.0, 2).as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
    },
    Some("""WITH top AS (SELECT l_orderkey, sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS qc FROM lineitem GROUP BY 1 ORDER BY qc DESC, l_orderkey LIMIT 100) SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, floor(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS o_total, floor(CAST(qc AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total_qty FROM top JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey ORDER BY total_qty DESC, o_orderkey"""))

  /** TPC-H Q10 shape: revenue lost to returned items, per customer, top 20.
    * One fact-fact shuffle (lineitem⋈orders on orderkey, both sides
    * pre-filtered: returnflag pushed to the lineitem scan, the quarter to
    * the orders scan); customer and nation ride broadcasts. The top-20 cut
    * orders on the EXACT centi revenue sum with a custkey tie-break, so
    * both engines pick identical rows, then compiles to
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  private val q10Returns = GraftQuery(
    "q10_returned_rev",
    "Q10 shape: top-20 customers by returned-item revenue in a quarter",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1996-04-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(revC).as("revc"))
      .orderBy(col("revc").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        fround(col("revc").cast("double") / 10000.0, 2).as("rev"))
      .orderBy(desc("rev"), col("c_custkey")),
    Some(s"""WITH top AS (SELECT c_custkey, c_name, n_name, sum($revCSql) AS revc FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY 1, 2, 3 ORDER BY revc DESC, c_custkey LIMIT 20) SELECT c_custkey, c_name, n_name, floor(CAST(revc AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS rev FROM top ORDER BY rev DESC, c_custkey"""))

  /** TPC-H Q19 shape: a join whose ON/WHERE carries an OR of per-branch
    * conjunctions spanning BOTH sides (brand+size on part, quantity on
    * lineitem). Catalyst won't factor cross-column disjunctions, so the
    * naive form scans both tables in full and evaluates the OR post-join.
    * The scalable form hand-hoists the IMPLIED envelope of the disjunction
    * — `p_brand IN (b1,b2,b3)` onto the part scan and the overall quantity
    * range onto the lineitem scan — which is exactly what the reference
    * pushes to storage for its compound key predicates
    * (TemperatureActor.scala:57-58 pushes every derivable conjunct). The
    * envelope cuts part to ~3/25 of rows pre-broadcast and prunes lineitem
    * at the parquet scan (PushedFilters, row-group stats skip); the exact
    * branch disjunction then runs only on envelope survivors inside the
    * broadcast-join's generated code. */
  private val q19Disjunctive = GraftQuery(
    "q19_disjunctive",
    "Q19 shape: OR-of-ANDs join predicate with hoisted envelope pushdown",
    (s, d) => {
      val brands = Seq("Brand#12", "Brand#23", "Brand#3")
      val branch =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(10, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 35) &&
          col("l_quantity").between(20, 30))
      Tables.lineitem(s, d)
        .filter(col("l_quantity").between(1, 30)) // hoisted envelope: scan prunes
        .join(broadcast(Tables.part(s, d).filter(col("p_brand").isin(brands: _*))),
          col("l_partkey") === col("p_partkey") && branch)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"), sum(revC).as("rc"))
        .select(col("p_brand"), col("cnt"),
          fround(col("rc").cast("double") / 10000.0, 2).as("rev"))
        .orderBy("p_brand")
    },
    Some(s"""SELECT p_brand, cnt, floor(CAST(rc AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS rev FROM (SELECT p_brand, count(*) AS cnt, sum($revCSql) AS rc FROM lineitem JOIN part ON l_partkey = p_partkey WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 20) OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35 AND l_quantity BETWEEN 20 AND 30) GROUP BY 1) ORDER BY 1"""))

  /** Distribution windows: quartile bucket, percent_rank, cume_dist per
    * market segment. The ordering key is (exact centi balance, custkey) —
    * unique, so every rank function is tie-free and both engines compute
    * the same rational rank values from the same integers. */
  private val winNtile = GraftQuery(
    "win_ntile",
    "ntile/percent_rank/cume_dist over customer balances per segment",
    (s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("balc"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          centi(col("c_acctbal")).as("balc"))
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          fround(percent_rank().over(w), 6).as("pct_rank"),
          fround(cume_dist().over(w), 6).as("cume"))
        .orderBy("c_mktsegment", "c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment, CAST(ntile(4) OVER w AS INTEGER) AS quartile, floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank, floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT), c_custkey) ORDER BY c_mktsegment, c_custkey"""))

  /** Wide→long reshape via Dataset.unpivot (melt). The wide input is a
    * per-nation aggregate (3 metric columns); unpivot turns each row into
    * 3 (nation, metric, value) rows — a narrow 3x row-expansion AFTER
    * aggregation has reduced cardinality, so the reshape is free at scale
    * (never unpivot the fact table; unpivot the rollup). */
  private val reshapeUnpivot = GraftQuery(
    "reshape_unpivot",
    "melt: per-nation wide aggregate unpivoted to (nation, metric, value) rows",
    (s, d) => {
      val wide = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          fround(sum(centi(col("c_acctbal"))).cast("double") / 100.0, 2).as("total_bal"),
          count(lit(1)).cast("double").as("n_cust"),
          fround(max(centi(col("c_acctbal"))).cast("double") / 100.0, 2).as("max_bal"))
      wide.unpivot(
          Array(col("n_name")),
          Array(col("total_bal"), col("n_cust"), col("max_bal")),
          "metric", "value")
        .orderBy("n_name", "metric")
    },
    Some("""WITH wide AS (SELECT n_name, floor(CAST(CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total_bal, CAST(count(*) AS DOUBLE) AS n_cust, floor(CAST(max(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS max_bal FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name) SELECT n_name, metric, value FROM (SELECT n_name, 'total_bal' AS metric, total_bal AS value FROM wide UNION ALL SELECT n_name, 'n_cust', n_cust FROM wide UNION ALL SELECT n_name, 'max_bal', max_bal FROM wide) ORDER BY n_name, metric"""))

  /** TPC-H Q7 shape (volume shipping): a six-relation join tree with the
    * nation dimension playing TWO roles (supplier's and customer's). Only
    * the lineitem⋈orders edge is a fact-fact join (one shuffle on
    * orderkey); every dimension edge — customer, supplier, and both nation
    * aliases — broadcasts, so the deep tree adds no extra fact shuffles.
    * Grouping by (supp_nation, cust_nation, year) keeps the output
    * pair×year sized at every scale factor. */
  private val q7Volume = GraftQuery(
    "q7_nation_volume",
    "Q7 shape: 6-relation join, nation dim in two roles, revenue by nation pair x year",
    (s, d) => {
      val suppNation = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val custNation = Tables.nation(s, d)
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
        .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("yr"))
        .agg(sum(revC).as("rc"), count(lit(1)).as("n_lines"))
        .select(col("supp_nation"), col("cust_nation"), col("yr"),
          fround(col("rc").cast("double") / 10000.0, 2).as("volume"),
          col("n_lines"))
        .orderBy("supp_nation", "cust_nation", "yr")
    },
    Some(s"""SELECT supp_nation, cust_nation, yr, floor(CAST(rc AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS volume, n_lines FROM (SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, CAST(year(l_shipdate) AS INTEGER) AS yr, CAST(sum($revCSql) AS BIGINT) AS rc, count(*) AS n_lines FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN supplier ON l_suppkey = s_suppkey JOIN nation sn ON s_nationkey = sn.n_nationkey JOIN nation cn ON c_nationkey = cn.n_nationkey WHERE sn.n_name < cn.n_name GROUP BY 1, 2, 3) ORDER BY 1, 2, 3"""))

  /** RANGE-framed window (vs the ROWS frames elsewhere): a 7-day trailing
    * sum where the frame is defined on the day ORDINAL, so calendar gaps
    * shrink the frame's row count — ROWS BETWEEN 6 PRECEDING would silently
    * reach past a gap and sum 7 observations regardless of how old. Also
    * pins nth_value (second-ever observation, running frame). One keyed
    * shuffle; frames evaluate within partitions. */
  private val winRangeFrame = GraftQuery(
    "win_range_frame",
    "RANGE-framed 7-day trailing sum over gapped daily data + running nth_value",
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("user_id") < 30)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(centi(col("value"))).as("vc"))
        .withColumn("ord", datediff(col("day"), lit("2024-01-01").cast("date")))
      val range7 = Window.partitionBy("user_id").orderBy("ord").rangeBetween(-6, 0)
      val running = Window.partitionBy("user_id").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("user_id"), col("day"),
          fround(sum(col("vc")).over(range7).cast("double") / 100.0, 2).as("trail7"),
          count(lit(1)).over(range7).as("n_in_frame"),
          fround(nth_value(col("vc"), 2).over(running).cast("double") / 100.0, 2)
            .as("second_obs"))
        .orderBy("user_id", "day")
    },
    Some("""SELECT user_id, day, floor(CAST(CAST(sum(vc) OVER w7 AS BIGINT) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS trail7, count(*) OVER w7 AS n_in_frame, floor(CAST(nth_value(vc, 2) OVER wr AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS second_obs FROM (SELECT user_id, CAST(ts AS DATE) AS day, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS vc, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS ord FROM events WHERE user_id < 30 GROUP BY 1, 2, 4) WINDOW w7 AS (PARTITION BY user_id ORDER BY ord RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), wr AS (PARTITION BY user_id ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ORDER BY user_id, day""".stripMargin))

  /** PURE non-equi join — no equality key at all, only an interval
    * containment predicate, which forces the one join strategy the
    * registry didn't yet exercise: BroadcastNestedLoopJoin. Sound ONLY
    * because the build side is campaign-calendar-sized (a handful of
    * windows); a fact-fact inequality join has no safe BNLJ form and must
    * be rewritten (bucketize the range into equi keys — the j_range
    * pattern). Windows overlap deliberately: an event inside two windows
    * contributes to both, the semantics a date-bucketing equi-join would
    * get wrong at the boundaries. */
  private val jIntervalOverlap = GraftQuery(
    "j_interval_overlap",
    "pure non-equi interval join (BroadcastNestedLoopJoin, campaign windows)",
    (s, d) => {
      val campaigns = s.createDataFrame(Seq(
          ("wk1_push", "2024-01-03", "2024-01-10"),
          ("mid_month", "2024-01-08", "2024-01-18"),
          ("closeout", "2024-01-22", "2024-01-29")))
        .toDF("campaign", "cstart", "cend")
        .select(col("campaign"), to_date(col("cstart")).as("cstart"),
          to_date(col("cend")).as("cend"))
      Tables.events(s, d)
        .join(broadcast(campaigns),
          to_date(col("ts")).between(col("cstart"), col("cend")))
        .groupBy("campaign")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          fround(sum(centi(col("value"))).cast("double") / 100.0, 2).as("total_value"))
        .orderBy("campaign")
    },
    Some("""SELECT campaign, count(*) AS n_events, count(DISTINCT user_id) AS n_users, floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total_value FROM events JOIN (VALUES ('wk1_push', DATE '2024-01-03', DATE '2024-01-10'), ('mid_month', DATE '2024-01-08', DATE '2024-01-18'), ('closeout', DATE '2024-01-22', DATE '2024-01-29')) c(campaign, cstart, cend) ON CAST(ts AS DATE) BETWEEN cstart AND cend GROUP BY 1 ORDER BY 1"""))

  /** Distribution-position windows: percent_rank (relative rank in
    * [0,1]) and cume_dist (fraction of peers ≤ this row) — the two
    * normalized ranking forms the §2.5 window family didn't yet pin.
    * Both are exact integer ratios ((rank-1)/(n-1), rows_le/n) evaluated
    * as one IEEE division in each engine, so no cross-engine float-sum
    * risk; the ORDER BY includes o_orderkey so rank is tie-free and the
    * ratios are fully determined. One keyed shuffle on the partition key;
    * frames evaluate within partitions. */
  private val winPercentRank = GraftQuery(
    "win_percent_rank",
    "percent_rank + cume_dist per order priority (exact integer ratios)",
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_custkey") < 100)
        .select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(w).as("prr"), cume_dist().over(w).as("cdr"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          fround(col("prr"), 6).as("pr"), fround(col("cdr"), 6).as("cd"))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority, floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pr, floor(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cd FROM orders WHERE o_custkey < 100 WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) ORDER BY o_orderpriority, o_orderkey"""))

  /** Fuzzy (edit-distance) self-join over the part-name dictionary — the
    * entity-resolution / typo-clustering primitive. The scale discipline
    * is candidate-generation-then-verify, same as the dedup family: an
    * all-pairs levenshtein over a dictionary is O(n²·L²), so pairs are
    * BLOCKED on a cheap equality key first (here the head noun — the
    * token a typo is least likely to corrupt) plus a length-band prune
    * (|len(a)−len(b)| ≤ 2 is a necessary condition for distance ≤ 2,
    * and costs one comparison vs the DP's L²); only within-block
    * survivors pay the levenshtein DP, which runs in whole-stage codegen
    * in Spark and is the same textbook DP in DuckDB — integer-exact, no
    * rounding concerns. A production blocker stacks several keys
    * (phonetic, q-gram) the same shape. */
  private val jFuzzyMatch = GraftQuery(
    "j_fuzzy_match",
    "fuzzy dictionary self-join: noun-blocked candidates, levenshtein <= 2 verify",
    (s, d) => {
      val names = Tables.part(s, d).select(col("p_name")).distinct()
        .select(col("p_name"),
          element_at(split(col("p_name"), " "), -1).as("blk"),
          length(col("p_name")).as("len"))
      names.as("x").join(names.as("y"),
          col("x.blk") === col("y.blk") &&
            col("x.p_name") < col("y.p_name") &&
            abs(col("x.len") - col("y.len")) <= 2)
        .withColumn("dist", levenshtein(col("x.p_name"), col("y.p_name")))
        .filter(col("dist") <= 2)
        .select(col("x.p_name").as("a"), col("y.p_name").as("b"), col("dist"))
        .orderBy("a", "b")
    },
    Some("""WITH n AS (SELECT DISTINCT p_name FROM part), k AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk, length(p_name) AS len FROM n) SELECT x.p_name AS a, y.p_name AS b, CAST(levenshtein(x.p_name, y.p_name) AS INTEGER) AS dist FROM k x JOIN k y ON x.blk = y.blk AND x.p_name < y.p_name AND abs(x.len - y.len) <= 2 WHERE levenshtein(x.p_name, y.p_name) <= 2 ORDER BY 1, 2"""))

  /** 2-D SKYLINE (Pareto frontier): parts not dominated on (price asc,
    * size desc) — p dominates q iff p is <= on price, >= on size, and
    * strictly better on at least one. The textbook NOT EXISTS anti-join is
    * O(n²); this runs in two bounded steps instead:
    *  1. reduce to ONE row per distinct price level (groupBy price_c, max
    *     size) — cardinality is bounded by the PRICE RANGE in centi-units,
    *     not the corpus, so the fact table pays one map-side-combined
    *     keyed shuffle;
    *  2. the frontier condition over price levels is a running max with a
    *     RANGE frame (strictly-cheaper levels: UNBOUNDED PRECEDING .. 1
    *     PRECEDING on the integer price): a level survives iff its max
    *     size strictly exceeds every cheaper level's. The window sorts
    *     only the level table.
    * Rows are recovered by a BROADCAST semi-join of the frontier pairs —
    * equal (price, size) duplicates are all kept, matching strict
    * dominance (neither dominates its twin). Price is exact centi-units
    * ([[centi]]), so the RANGE frame and all comparisons are integer
    * arithmetic in both engines. */
  private val relSkyline = GraftQuery(
    "rel_skyline",
    "2-D Pareto frontier (min price, max size): price-level reduce + range-frame running max",
    (s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"),
        centi(col("p_retailprice")).as("price_c"), col("p_size"))
      val lvl = p.groupBy("price_c").agg(max("p_size").as("mx"))
      val cheaper = Window.orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
      val frontier = lvl
        .withColumn("m_strict", max("mx").over(cheaper))
        .filter(col("m_strict").isNull || col("mx") > col("m_strict"))
        .select(col("price_c").as("f_price"), col("mx").as("f_size"))
      p.join(broadcast(frontier),
          col("price_c") === col("f_price") && col("p_size") === col("f_size"))
        .select(col("p_partkey"), col("price_c"), col("p_size"))
        .orderBy("price_c", "p_partkey")
    },
    Some("""WITH p AS (SELECT p_partkey, CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c, p_size FROM part), lvl AS (SELECT price_c, max(p_size) AS mx FROM p GROUP BY 1), f AS (SELECT price_c, mx, max(mx) OVER (ORDER BY price_c RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_strict FROM lvl) SELECT p.p_partkey, p.price_c, p.p_size FROM p JOIN f ON p.price_c = f.price_c AND p.p_size = f.mx WHERE f.m_strict IS NULL OR f.mx > f.m_strict ORDER BY 2, 1"""))

  /** Gaps-and-islands: merge overlapping per-customer coverage intervals
    * (each order covers [orderdate, orderdate+10d]) into maximal islands,
    * then report islands / covered days per customer — the interval-merge
    * primitive behind SLA coverage, sensor uptime, and contract overlap
    * analysis. The classic O(n²) self-join is avoided: one window pass
    * computes the running max of interval ends over strictly-earlier rows
    * (ROWS .. 1 PRECEDING); a row starts a new island iff its start
    * exceeds that max, and a running sum of those breaks numbers the
    * islands. All arithmetic is exact integer day offsets, and the window
    * order carries (sd, ed) so equal-start rows are interchangeable —
    * island boundaries are order-stable either way.
    *
    * Scale shape: everything partitions by o_custkey — ONE keyed shuffle
    * reused by both windows and both groupBys (Catalyst keeps the
    * partitioning); no global sort, no self-join. */
  private val relIntervalMerge = GraftQuery(
    "rel_interval_merge",
    "gaps-and-islands interval merge: per-customer order-coverage islands",
    (s, d) => {
      val iv = Tables.orders(s, d)
        .select(col("o_custkey"),
          datediff(to_date(col("o_orderdate")), lit("1990-01-01")).as("sd"))
        .withColumn("ed", col("sd") + 10)
      val wOrd = Window.partitionBy("o_custkey").orderBy(col("sd"), col("ed"))
      iv.withColumn("pmax", max("ed").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("brk", when(col("pmax").isNull || col("sd") > col("pmax"), 1L).otherwise(0L))
        .withColumn("isl", sum("brk").over(wOrd))
        .groupBy(col("o_custkey"), col("isl"))
        .agg(min("sd").as("i_start"), max("ed").as("i_end"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("i_end") - col("i_start")).cast("long").as("covered_days"),
          max(col("i_end") - col("i_start")).cast("long").as("longest_days"))
        .orderBy("o_custkey")
    },
    Some("""WITH iv AS (SELECT o_custkey, date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS sd, date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) + 10 AS ed FROM orders), m AS (SELECT o_custkey, sd, ed, max(ed) OVER (PARTITION BY o_custkey ORDER BY sd, ed ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM iv), b AS (SELECT o_custkey, sd, ed, CASE WHEN pmax IS NULL OR sd > pmax THEN 1 ELSE 0 END AS brk FROM m), g AS (SELECT o_custkey, sd, ed, sum(brk) OVER (PARTITION BY o_custkey ORDER BY sd, ed ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM b), i AS (SELECT o_custkey, isl, min(sd) AS i_start, max(ed) AS i_end FROM g GROUP BY 1, 2) SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_islands, CAST(sum(i_end - i_start) AS BIGINT) AS covered_days, CAST(max(i_end - i_start) AS BIGINT) AS longest_days FROM i GROUP BY 1 ORDER BY 1"""))

  /** NEAREST-tolerance as-of join — the bidirectional variant of j_asof
    * (sensor fusion / log correlation: match each purchase to the error
    * event closest in time, either direction, within ±6 h — sized to the
    * corpus's ~2-events/user/day density so the tolerance actually binds). Same
    * merged-stream shape as j_asof: one user_id-keyed shuffle carries BOTH
    * directions as two frames of one window ordering (carry-last before,
    * carry-first after), so "nearest" never needs a range self-join. Ties
    * (equidistant prev/next) break to the earlier event in both engines. */
  private val jAsofNearest = GraftQuery(
    "j_asof_nearest",
    "nearest-in-time as-of join (±6 h tolerance) via two-frame carry",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "error"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"),
          when(col("event_type") === "error", unix_micros(col("ts"))).as("err_us"),
          when(col("event_type") === "error", col("event_id")).as("err_id"))
      val ord = Window.partitionBy("user_id").orderBy("us", "event_id")
      val before = ord.rowsBetween(Window.unboundedPreceding, -1)
      val after = ord.rowsBetween(1, Window.unboundedFollowing)
      val tol = 21600L * 1000000L
      ev
        .withColumn("p_us", last("err_us", ignoreNulls = true).over(before))
        .withColumn("p_id", last("err_id", ignoreNulls = true).over(before))
        .withColumn("n_us", first("err_us", ignoreNulls = true).over(after))
        .withColumn("n_id", first("err_id", ignoreNulls = true).over(after))
        .filter(col("event_type") === "purchase")
        .withColumn("use_prev",
          col("p_us").isNotNull &&
            (col("n_us").isNull || (col("us") - col("p_us")) <= (col("n_us") - col("us"))))
        .select(col("user_id"), col("event_id").as("purchase_id"),
          when(col("use_prev"), col("p_id")).otherwise(col("n_id")).as("err_id"),
          (when(col("use_prev"), col("p_us")).otherwise(col("n_us")) - col("us"))
            .as("delta_us"))
        .filter(col("err_id").isNotNull && abs(col("delta_us")) <= tol)
        .orderBy("purchase_id")
    },
    Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, CASE WHEN event_type = 'error' THEN epoch_us(CAST(ts AS TIMESTAMP)) END AS err_us, CASE WHEN event_type = 'error' THEN event_id END AS err_id FROM events WHERE event_type IN ('purchase', 'error')), w AS (SELECT *, last_value(err_us IGNORE NULLS) OVER wb AS p_us, last_value(err_id IGNORE NULLS) OVER wb AS p_id, first_value(err_us IGNORE NULLS) OVER wa AS n_us, first_value(err_id IGNORE NULLS) OVER wa AS n_id FROM ev WINDOW wb AS (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), wa AS (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)), p AS (SELECT *, (p_us IS NOT NULL AND (n_us IS NULL OR (us - p_us) <= (n_us - us))) AS use_prev FROM w WHERE event_type = 'purchase') SELECT user_id, event_id AS purchase_id, CASE WHEN use_prev THEN p_id ELSE n_id END AS err_id, (CASE WHEN use_prev THEN p_us ELSE n_us END) - us AS delta_us FROM p WHERE (CASE WHEN use_prev THEN p_id ELSE n_id END) IS NOT NULL AND abs((CASE WHEN use_prev THEN p_us ELSE n_us END) - us) <= 21600000000 ORDER BY purchase_id"""))

  /** cume_dist — the empirical-CDF window form (the remaining ranking
    * built-in next to rank/ntile/percent_rank): P(X <= x) of the centi
    * value within each event type. Tie-safe by construction (cume_dist
    * depends only on the value multiset, never on tie order), so no
    * tiebreaker column is needed; the DISTINCT collapse reuses the same
    * (event_type, vc) shuffle key. */
  private val winCumeDist = GraftQuery(
    "win_cume_dist",
    "cume_dist empirical CDF of value per event type (distinct steps)",
    (s, d) => Tables.events(s, d)
      .select(col("event_type"), centi(col("value")).as("vc"))
      .withColumn("cd", fround(cume_dist().over(
        Window.partitionBy("event_type").orderBy("vc")), 6))
      .distinct()
      .orderBy("event_type", "vc"),
    Some("""SELECT DISTINCT event_type, vc, floor(cume_dist() OVER (PARTITION BY event_type ORDER BY vc) * 1000000.0 + 0.5) / 1000000.0 AS cd FROM (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events) ORDER BY 1, 2"""))

  /** SWEEP-LINE session-concurrency histogram: how much wall-clock time the
    * system spends at each level of concurrent (overlapping) user sessions
    * — the scale-correct replacement for the O(n²) interval-overlap
    * self-join (every interval becomes a +1/-1 boundary point; a running
    * sum over boundary time IS the concurrency step function). The global
    * running sum is DECOMPOSED by UTC day — per-day in-partition running
    * sums plus a broadcast day-prefix offset table (the same bucketed
    * global-index pattern as samp_systematic) — and synthetic zero-delta
    * points at every day's start/end close the step intervals inside each
    * partition, so no window in the plan is unpartitioned over the
    * boundary stream. Per-level DURATION sums are invariant to the
    * day-splitting (a step crossing midnight contributes its exact µs to
    * the same level either side), which is why the oracle can use the
    * straightforward global formulation; idle (concurrency-0) spans are
    * excluded — they'd otherwise differ by the artificial day-range
    * padding. */
  private val relSweepConcurrency = GraftQuery(
    "rel_sweep_concurrency",
    "duration-weighted concurrent-session histogram via day-bucketed sweep line",
    (s, d) => {
      val usDay = 86400000000L
      val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
      // every `union(df.select…, df.select…)` would EMBED the upstream
      // subtree twice (Spark has no cross-branch CSE) — the original
      // spelling replicated the whole sessionize pipeline 12× through
      // the pts→days→syn→allPts chain (measured 2.7 s min3 where DuckDB,
      // whose CTEs materialize once, needs 0.12 s). Every two-branch
      // union here is therefore an explode(array(struct…)) — one pass —
      // and the day span comes from the RAW column-pruned scan instead
      // of round-tripping through the session table.
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag("us", 1).over(byUser))
        .withColumn("new_s",
          when(col("prev").isNull || col("us") - col("prev") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sess", sum("new_s").over(byUser))
        .groupBy("user_id", "sess")
        .agg(min("us").as("st"), max("us").as("en"))
      val pts = sess.select(explode(array(
          struct(col("st").as("ts"), lit(1L).as("dlt")),
          struct((col("en") + 1).as("ts"), lit(-1L).as("dlt")))).as("p"))
        .select(col("p.ts").as("ts"), col("p.dlt").as("dlt"))
        .groupBy("ts").agg(sum("dlt").as("dlt"))
        .withColumn("day", expr(s"ts div $usDay"))
      // day span from the raw scan: [min us, max us + 1] is exactly the
      // pts ts range (session starts/ends are event instants)
      val days = Tables.events(s, d)
        .agg(min(unix_micros(col("ts"))).as("mn"),
          max(unix_micros(col("ts"))).as("mx"))
        .select(explode(sequence(expr(s"mn div $usDay"),
          expr(s"(mx + 1) div $usDay"))).as("day"))
      val syn = days.select(col("day"), explode(array(
          (col("day") * usDay).as("ts"),
          ((col("day") + 1) * usDay).as("ts"))).as("ts"), lit(0L).as("dlt"))
      val allPts = pts.select("day", "ts", "dlt").union(syn)
      // per-day prefix from the day-count-sized complete day list (the
      // zero-delta syn rows never change day totals, so pts alone feeds
      // the rollup; the left join carries empty days)
      val dayPrefix = days
        .join(pts.groupBy("day").agg(sum("dlt").as("dtot")), Seq("day"), "left")
        .withColumn("dp", coalesce(sum(coalesce(col("dtot"), lit(0L))).over(
          Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("day", "dp")
      val wDay = Window.partitionBy("day").orderBy("ts", "dlt")
      allPts
        .withColumn("rs", sum("dlt").over(
          wDay.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("nxt", lead("ts", 1).over(wDay))
        .join(broadcast(dayPrefix), "day")
        .withColumn("concurrent", col("dp") + col("rs"))
        .filter(col("nxt").isNotNull && col("nxt") > col("ts") && col("concurrent") >= 1)
        .groupBy("concurrent")
        .agg(sum(col("nxt") - col("ts")).as("total_us"))
        .orderBy("concurrent")
    },
    Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events), o AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM ev), m AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800 * 1000000 THEN 1 ELSE 0 END AS new_s FROM o), x AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM m), sess_iv AS (SELECT user_id, sess, min(us) AS st, max(us) AS en FROM x GROUP BY 1, 2), pts AS (SELECT st AS ts, 1 AS dlt FROM sess_iv UNION ALL SELECT en + 1, -1 FROM sess_iv), agg AS (SELECT ts, CAST(sum(dlt) AS BIGINT) AS dlt FROM pts GROUP BY 1), run AS (SELECT ts, sum(dlt) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS c, lead(ts) OVER (ORDER BY ts) AS nxt FROM agg) SELECT CAST(c AS BIGINT) AS concurrent, CAST(sum(nxt - ts) AS BIGINT) AS total_us FROM run WHERE nxt IS NOT NULL AND nxt > ts AND c >= 1 GROUP BY 1 ORDER BY 1"""))

  /** Market-basket association: for every unordered pair of part brands
    * co-purchased inside one order, the pair support and lift
    * (n_orders × P(a,b) / (P(a) × P(b))). The pair generation is a
    * SELF-JOIN KEYED ON THE ORDER — fan-out is bounded by the per-order
    * distinct-brand count squared (TPC-H orders hold ~4 lineitems), never
    * corpus-quadratic; the brand dimension (25 values) rides along as two
    * broadcast joins, and the scalar order total as a broadcast cross
    * join. Lift is computed from exact integer counts and only rounded at
    * the output edge. */
  private lazy val relBasketLift = GraftQuery(
    "rel_basket_lift",
    "within-order brand-pair support + lift (market-basket association)",
    (s, d) => {
      val ob = basketOb(s, d)
      val tot = ob.agg(countDistinct("ok").as("n_ord"))
      val brandCnt = ob.groupBy("brand").agg(count(lit(1)).as("bc"))
      val pairs = ob.toDF("ok", "brand_a")
        .join(ob.toDF("ok", "brand_b"), Seq("ok"))
        .filter(col("brand_a") < col("brand_b"))
        .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("support"))
      pairs
        .join(broadcast(brandCnt.toDF("brand_a", "ca")), Seq("brand_a"))
        .join(broadcast(brandCnt.toDF("brand_b", "cb")), Seq("brand_b"))
        .crossJoin(broadcast(tot))
        .filter(col("support") >= 2)
        .select(col("brand_a"), col("brand_b"), col("support"),
          fround(col("support").cast("double") * col("n_ord") /
            (col("ca") * col("cb")), 4).as("lift"))
        .orderBy("brand_a", "brand_b")
    },
    Some("""WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand FROM lineitem JOIN part ON l_partkey = p_partkey), tot AS (SELECT count(DISTINCT ok) AS n_ord FROM ob), bc AS (SELECT brand, count(*) AS bc FROM ob GROUP BY 1), pr AS (SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS support FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand GROUP BY 1, 2) SELECT brand_a, brand_b, support, floor(CAST(support AS DOUBLE) * n_ord / (ca.bc * cb.bc) * 10000.0 + 0.5) / 10000.0 AS lift FROM pr JOIN bc ca ON pr.brand_a = ca.brand JOIN bc cb ON pr.brand_b = cb.brand CROSS JOIN tot WHERE support >= 2 ORDER BY 1, 2"""))

  /** Temporal dimension join: every order joined to the SCD2 customer
    * version VALID AT ITS ORDER DATE (the warehouse read that answers
    * "revenue by the segment the customer was in when they ordered", not
    * the segment they have now). Versions are synthesized over the order
    * span (%7 keys flip to PROMO at 1998-01-01); the join is EQUI-KEYED
    * on the customer with the validity window as a residual filter — at
    * scale this stays one keyed shuffle (or a broadcast if the dim fits),
    * never a range-only join. Revenue in exact centi integers. */
  private lazy val jTemporalDim = GraftQuery(
    "j_temporal_dim",
    "orders joined to the SCD2 segment version valid at order date",
    (s, d) => {
      val changed = col("c_custkey") % 7 === 0
      val mk = (ver: Int, seg: org.apache.spark.sql.Column, from: String,
                to: org.apache.spark.sql.Column) =>
        struct(lit(ver).as("version"), seg.as("segment"),
          lit(from).cast("date").as("vf"), to.as("vt"))
      val far = lit("9999-12-31").cast("date")
      val versions = Tables.customer(s, d)
        .select(col("c_custkey"),
          explode(when(changed, array(
              mk(1, col("c_mktsegment"), "1992-01-01",
                lit("1998-01-01").cast("date")),
              mk(2, lit("PROMO"), "1998-01-01", far)))
            .otherwise(array(
              mk(1, col("c_mktsegment"), "1992-01-01", far)))).as("v"))
        .select(col("c_custkey"), col("v.version").as("version"),
          col("v.segment").as("segment"), col("v.vf").as("vf"),
          col("v.vt").as("vt"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"),
          centi(col("o_totalprice")).as("pc"))
        .join(versions, col("o_custkey") === col("c_custkey") &&
          col("vf") <= col("od") && col("od") < col("vt"))
        .groupBy("segment", "version")
        .agg(count(lit(1)).as("n_orders"), sum("pc").as("pcs"))
        .select(col("segment"), col("version"), col("n_orders"),
          fround(col("pcs").cast("double") / 100.0, 2).as("revenue"))
        .orderBy("segment", "version")
    },
    Some("""WITH dim AS (SELECT c_custkey, c_mktsegment FROM customer), v AS (SELECT c_custkey, 1 AS version, c_mktsegment AS segment, DATE '1992-01-01' AS vf, CASE WHEN c_custkey % 7 = 0 THEN DATE '1998-01-01' ELSE DATE '9999-12-31' END AS vt FROM dim UNION ALL SELECT c_custkey, 2, 'PROMO', DATE '1998-01-01', DATE '9999-12-31' FROM dim WHERE c_custkey % 7 = 0), o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc FROM orders) SELECT segment, version, count(*) AS n_orders, floor(CAST(sum(pc) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS revenue FROM o JOIN v ON o_custkey = c_custkey AND vf <= od AND od < vt GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** RANGE-PARTITIONER boundary estimation — what Spark's RangePartitioner
    * (and every distributed sort) does before shuffling: estimate k−1
    * split points of the key from a SAMPLE, never a global sort of the
    * fact. The sample is the deterministic 1% md5 subset of lineitem
    * orderkeys; boundaries are the rank-⌈j·m/16⌉ order statistics within
    * it (positive-only integer division). The audit columns report each
    * estimated partition's ACTUAL row share — how balanced the resulting
    * shuffle would be. Scale: fact-side work is two scans (sample filter
    * + histogram against broadcast boundaries); only the 1% sample is
    * ever ranked. */
  private lazy val relRangeBoundaries = GraftQuery(
    "rel_range_boundaries",
    "sample-estimated 16-way range-partition boundaries + realized balance",
    (s, d) => {
      import graft.functions.GraftFunctions.md5u32
      val keys = Tables.lineitem(s, d).select(col("l_orderkey").as("k"))
      // the md5 sample filter and the binary-search histogram probe are
      // the two fact-side per-row hot loops; each scan is one task on the
      // single-file local table, so both ran on one core. Spread (scale-
      // gated identity at real sizes) fans them across the session.
      val keysW = Tables.spread(s, keys, col("k"))
      val samp = keysW.filter(md5u32(col("k").cast("string")) % 100 === 0)
      val m = samp.agg(count(lit(1)).as("m"))
      val w = Window.orderBy(col("k"))
      val bounds = samp
        .withColumn("rk", row_number().over(w).cast("long"))
        .crossJoin(broadcast(m))
        .withColumn("j", explode(sequence(lit(1L), lit(15L))))
        .filter(col("rk") === expr("(j * m + 15) div 16"))
        .select(col("j"), col("k").as("boundary"))
      // r15: n folds from the pid rollup itself (every key lands in
      // exactly one partition, so Σ n_rows = |keys|) via a 16-row
      // unpartitioned window — the former keys.agg leg was a third full
      // fact scan plus its broadcast job
      // partition id via the codegen'd binary search: the aggregate() HOF
      // spelling walked all 15 boundaries with interpreted lambdas per
      // fact row (HigherOrderFunction is CodegenFallback) — the corpus-
      // side hot loop of this query. sort_array fixes collect_list's
      // nondeterministic order; strict < counts duplicates identically
      // to the linear scan.
      graft.functions.expressions.GraftExpressions.ensureRegistered(s)
      val parts = keysW.crossJoin(broadcast(bounds
          .agg(sort_array(collect_list(col("boundary"))).as("bs"))))
        .select(expr("graft_lower_bound(bs, k)").as("pid"))
        .groupBy("pid").agg(count(lit(1)).as("n_rows"))
      parts
        .withColumn("n", sum("n_rows").over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("pid"), col("n_rows"),
          fround(col("n_rows").cast("double") / col("n"), 4).as("share"))
        .orderBy("pid")
    },
    Some(s"""WITH keys AS (SELECT l_orderkey AS k FROM lineitem), samp AS (SELECT k FROM keys WHERE ${graft.functions.GraftFunctions.md5u32Sql("md5(CAST(k AS VARCHAR))")} % 100 = 0), rk AS (SELECT k, CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS rk, CAST(count(*) OVER () AS BIGINT) AS m FROM samp), bounds AS (SELECT j, k AS boundary FROM rk, (SELECT unnest(generate_series(1, 15)) AS j) WHERE rk = (j * m + 15) // 16), t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM keys), pid AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM bounds b WHERE keys.k > b.boundary) AS pid FROM keys) SELECT pid, count(*) AS n_rows, floor(CAST(count(*) AS DOUBLE) / (SELECT n FROM t) * 1e4 + 0.5) / 1e4 AS share FROM pid GROUP BY 1 ORDER BY 1"""))

  /** The (order, brand) basket projection rel_basket_lift's four
    * consumers share (total, per-brand counts, both self-join sides) —
    * materialized once per session like the other stored artifacts and
    * warmed in Bench setup. */
  private[graft] def basketOb(s: SparkSession, d: String) =
    graft.PersistCache.getOrBuild(s, s"basket_ob:$d") {
      Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .distinct()
        // hash-partitioned on ok AT MATERIALIZATION (the symEdges
        // discipline): distinct() leaves the cache partitioned on
        // (ok, brand), so the pair self-join on ok alone would re-exchange
        // BOTH sides of the corpus-sized projection per query; partitioned
        // on ok, the join is co-located and only the ~|brands|² pair
        // rollup ever shuffles. One extra exchange at build time,
        // setup-accounted.
        .repartition(col("ok"))
    }

  /** BITEMPORAL read — valid time × transaction time, the two-axis
    * warehouse question "what did we BELIEVE on date T about business
    * date V". Facts: every order's original totalprice is recorded 3 days
    * after its order date; orders with orderkey % 11 = 0 receive a +10%
    * amended version recorded 1997-06-01. The query renders the monthly
    * revenue rollup under two knowledge cutoffs — as-of 1997-01-01
    * (amendments invisible or even the original not yet recorded) and
    * current — plus how many rows each cutoff sees. Versions are emitted
    * by one narrow per-row explode (the SCD2-merge pattern: no join, the
    * version table is derived in-plan); each snapshot filters on
    * recorded_date ≤ cutoff and takes the LAST recorded version per order
    * via max-struct (single keyed agg). Exact centi arithmetic throughout.
    * At scale a stored bitemporal table serves this with the same two
    * predicates pushed into the scan. */
  private lazy val relBitemporal = {
    val cut = "1997-01-01"
    GraftQuery(
      "rel_bitemporal_correction",
      "monthly revenue as believed at a past cutoff vs with later corrections",
      (s, d) => {
        val vers = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            date_trunc("month", col("o_orderdate")).cast("date").as("vm"),
            col("o_orderdate"), centi(col("o_totalprice")).as("pc"))
          .select(col("*"), explode(
            when(col("o_orderkey") % 11 === 0, array(
              struct(date_add(col("o_orderdate").cast("date"), 3).as("rec"),
                col("pc").as("vpc")),
              struct(lit("1997-06-01").cast("date").as("rec"),
                expr("(pc * 110L) div 100L").as("vpc"))))
              .otherwise(array(
                struct(date_add(col("o_orderdate").cast("date"), 3).as("rec"),
                  col("pc").as("vpc"))))).as("v"))
        def snapshot(asof: org.apache.spark.sql.Column, name: String) = vers
          .filter(col("v.rec") <= asof)
          .groupBy("o_orderkey", "vm")
          .agg(max(struct(col("v.rec"), col("v.vpc"))).as("last"))
          .groupBy("vm")
          .agg(count(lit(1)).as(s"n_$name"),
            sum(col("last.vpc")).as(s"pc_$name"))
        // both snapshots are MONTH-grain aggregates — bounded by the
        // corpus timespan (decades → hundreds of rows), never by fact
        // volume; broadcast-left is legal under right_outer (BuildLeft)
        broadcast(snapshot(lit(cut).cast("date"), "asof"))
          .join(snapshot(lit("9999-12-31").cast("date"), "now"), Seq("vm"), "right_outer")
          .select(col("vm").as("month"),
            coalesce(col("n_asof"), lit(0L)).as("n_asof"),
            fround(coalesce(col("pc_asof"), lit(0L)).cast("double") / 100.0, 2)
              .as("rev_asof"),
            col("n_now"),
            fround(col("pc_now").cast("double") / 100.0, 2).as("rev_now"))
          .orderBy("month")
      },
      Some(s"""WITH base AS (SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS vm, CAST(o_orderdate AS DATE) AS od, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc FROM orders), vers AS (SELECT o_orderkey, vm, od + 3 AS rec, pc AS vpc FROM base UNION ALL SELECT o_orderkey, vm, DATE '1997-06-01', (pc * 110) // 100 FROM base WHERE o_orderkey % 11 = 0), la AS (SELECT o_orderkey, vm, max(struct_pack(rec := rec, vpc := vpc)) AS last FROM vers WHERE rec <= DATE '$cut' GROUP BY 1, 2), sa AS (SELECT vm, count(*) AS n_asof, CAST(sum((last).vpc) AS BIGINT) AS pc_asof FROM la GROUP BY 1), ln AS (SELECT o_orderkey, vm, max(struct_pack(rec := rec, vpc := vpc)) AS last FROM vers GROUP BY 1, 2), sn AS (SELECT vm, count(*) AS n_now, CAST(sum((last).vpc) AS BIGINT) AS pc_now FROM ln GROUP BY 1) SELECT sn.vm AS month, coalesce(sa.n_asof, 0) AS n_asof, floor(CAST(coalesce(sa.pc_asof, 0) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS rev_asof, sn.n_now, floor(CAST(sn.pc_now AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS rev_now FROM sn LEFT JOIN sa ON sn.vm = sa.vm ORDER BY month"""))
  }

  val all: Seq[GraftQuery] = Seq(
    q1, q3, q5, q10Returns, q14Promo, q18TopQuantity, q19Disjunctive, q7Volume,
    jSemi, jAnti, jOuter,
    jRange, jAsof, jBucketed, jBandBucketed, jBandAuto, jBandDouble,
    jBandDecimal, jBandDate, jBandTimestamp,
    relTopkNative,
    winTopkAuto, winTopkMultikey, winTopkNulls,
    calFiscal445, winRank,
    winMoving, winNtile,
    winRangeFrame,
    winPercentRank, setIntersect,
    setExcept, setUnion, setSymdiff, aggRollup, aggCube, aggGroupingSets,
    aggGroupingId, aggApprox,
    jsonKv, calDaily, strWeekday, reshapeUnpivot, jIntervalOverlap,
    jFuzzyMatch, relSkyline, relIntervalMerge, jAsofNearest, winCumeDist,
    relSweepConcurrency, calTumbling, winTimeRange, relBasketLift,
    jTemporalDim, relBitemporal, jIntervalBucketed, relRangeBoundaries,
    jBloomPrefilter)

  /** BLOOM-PREFILTERED JOIN — the sideways-information-passing pattern a
    * fact⋈selective-dim join wants at 100 TB: build a Bloom filter over
    * the urgent-order keys IN-PLAN (graft_bloom_agg, the same
    * BloomFilterAggregate surface as txt_decontaminate_bloom), broadcast
    * the ONE-ROW sketch, and pre-drop fact rows in whole-stage codegen
    * before any exchange — the exact semi-join then runs on the
    * survivors only. The output is the zero-false-negative CONTRACT
    * itself: n_exact_passed counts the true members the Bloom filter
    * let through — a correct Bloom passes every one, so the DuckDB
    * oracle replays the decision with the exact IN-list
    * (n_exact_passed = n_exact by definition of "no false negatives");
    * any dropped member makes the hashes diverge. The false-positive
    * overhead (n_bloom_pass, engine-internal bit layout) stays
    * spec-audited in Round7OpsSpec rather than oracled. */
  private lazy val jBloomPrefilter = GraftQuery(
    "j_bloom_prefilter",
    "bloom-prefiltered fact semi-join: zero-false-negative contract audit",
    (s, d) => {
      graft.functions.expressions.GraftExpressions.ensureRegistered(s)
      // might_contain demands the sketch as a scalar subquery (the
      // bloomCandidates precedent) — hence the SQL spelling over
      // invocation-private views
      val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      val vo = s"graft_bloom_o_$nonce"; val vl = s"graft_bloom_l_$nonce"
      Tables.orders(s, d).createOrReplaceTempView(vo)
      Tables.lineitem(s, d).createOrReplaceTempView(vl)
      val df = s.sql(
        s"""WITH u AS (SELECT o_orderkey FROM $vo WHERE o_orderpriority = '1-URGENT'),
           |bf AS (SELECT graft_bloom_agg(xxhash64(o_orderkey), 200000L, 1600000L) AS bf FROM u),
           |ex AS (SELECT count(*) AS n_exact FROM $vl
           |       WHERE l_orderkey IN (SELECT o_orderkey FROM u)),
           |ep AS (SELECT count(*) AS n_exact_passed FROM $vl
           |       WHERE l_orderkey IN (SELECT o_orderkey FROM u)
           |         AND graft_might_contain((SELECT bf FROM bf), xxhash64(l_orderkey))),
           |t AS (SELECT count(*) AS n_fact_rows FROM $vl)
           |SELECT n_fact_rows, n_exact, n_exact_passed
           |FROM ep CROSS JOIN ex CROSS JOIN t""".stripMargin)
      s.catalog.dropTempView(vo); s.catalog.dropTempView(vl)
      df
    },
    Some("""WITH u AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'), ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM u)), t AS (SELECT CAST(count(*) AS BIGINT) AS n_fact_rows FROM lineitem) SELECT n_fact_rows, n_exact, n_exact AS n_exact_passed FROM ex CROSS JOIN t"""))

  /** BUCKETED interval join — the 100 TB-safe spelling of "points inside
    * intervals": each URGENT order's 3-day follow-on window is exploded to
    * the ≤3 calendar days it covers, points (all order dates) join on the
    * DAY equi-key, and the true containment predicate runs as a residual
    * filter. Same answer as the nested-loop range join
    * (j_interval_overlap exercises BroadcastNestedLoopJoin deliberately),
    * but the work is one keyed shuffle bounded by |intervals|·days +
    * |points| — a plan that survives when neither side broadcasts.
    * Output is the follow-on-count histogram. */
  private lazy val jIntervalBucketed = GraftQuery(
    "j_interval_bucketed",
    "day-bucketed interval containment: keyed equi-join + residual filter",
    (s, d) => {
      val pts = Tables.orders(s, d)
        .select(to_date(col("o_orderdate")).as("pd"))
        .groupBy("pd").agg(count(lit(1)).as("np"))
      val iv = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("st"))
      val hits = iv
        .withColumn("pd", explode(sequence(col("st"), date_add(col("st"), 2))))
        .join(pts, Seq("pd"))
        .filter(col("pd") >= col("st") && col("pd") <= date_add(col("st"), 2))
        .groupBy("o_orderkey").agg(sum("np").as("n_follow"))
      iv.join(hits, Seq("o_orderkey"), "left")
        .select(coalesce(col("n_follow"), lit(0L)).as("n_follow"))
        .groupBy("n_follow").agg(count(lit(1)).as("n_windows"))
        .orderBy("n_follow")
    },
    Some("""WITH pts AS (SELECT CAST(o_orderdate AS DATE) AS pd, count(*) AS np FROM orders GROUP BY 1), iv AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS st FROM orders WHERE o_orderpriority = '1-URGENT'), days AS (SELECT o_orderkey, st, st + CAST(k AS INTEGER) AS pd FROM iv, (SELECT unnest(generate_series(0, 2)) AS k)), hits AS (SELECT o_orderkey, CAST(sum(np) AS BIGINT) AS n_follow FROM days JOIN pts USING (pd) WHERE pd >= st AND pd <= st + 2 GROUP BY 1) SELECT coalesce(h.n_follow, 0) AS n_follow, count(*) AS n_windows FROM iv LEFT JOIN hits h USING (o_orderkey) GROUP BY 1 ORDER BY 1"""))

  /** TIME-interval range frame: per user, the trailing-24-hour event count
    * and exact centi spend at every event — the time-based sliding window
    * (win_moving_avg slides over ROWS, win_range_frame over a numeric
    * range; this one frames by event-TIME, the form ops dashboards and
    * rate limiters actually need). The frame rides RANGE BETWEEN over
    * exact integer microseconds, so boundary inclusion is integer
    * comparison in both engines. One user-keyed shuffle; per-row state is
    * the frame buffer, bounded by a user's 24-hour burst. */
  private lazy val winTimeRange = GraftQuery(
    "win_time_range",
    "trailing-24h per-user event count + spend via a time-range frame",
    (s, d) => {
      val dayUs = 86400L * 1000000L
      val w = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-dayUs, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
          centi(col("value")).as("vc"))
        .withColumn("n_24h", count(lit(1)).over(w))
        .withColumn("v_24h", sum("vc").over(w))
        .select(col("user_id"), col("event_id"), col("n_24h"),
          fround(col("v_24h").cast("double") / 100.0, 2).as("spend_24h"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events) SELECT user_id, event_id, count(*) OVER w AS n_24h, floor(CAST(sum(vc) OVER w AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS spend_24h FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) ORDER BY user_id, event_id"""))

  /** Tumbling-window aggregation via the native window() TVF — the batch
    * face of the same grouping the streaming pipelines use (one groupBy
    * key derivation, valid unchanged under readStream): 6-hour buckets of
    * event count + exact centi sum. The TVF's bucket arithmetic is
    * floor(us / width) epoch-aligned, which is exactly what the oracle
    * replays — pinning that the convenient built-in and the portable
    * integer formulation agree. One map-side-combined keyed shuffle. */
  private lazy val calTumbling = GraftQuery(
    "cal_tumbling_6h",
    "native window() TVF: 6-hour tumbling event rollup (epoch-aligned)",
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(count(lit(1)).as("cnt"), sum(centi(col("value"))).as("vcs"))
      .select(unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("cnt"),
        fround(col("vcs").cast("double") / 100.0, 2).as("total_value"))
      .orderBy("start_us"),
    Some("""WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events), b AS (SELECT (us // 21600000000) * 21600000000 AS start_us, vc FROM ev) SELECT start_us, start_us + 21600000000 AS end_us, count(*) AS cnt, floor(CAST(sum(vc) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total_value FROM b GROUP BY 1 ORDER BY 1"""))
}
