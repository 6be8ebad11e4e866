package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions.{centi, fround}

/** Wire-format parsing, semi-structured decode, date construction, SQL-entry
  * joins, and the materialized-rollup cascade — the reference's ingest-side
  * and examples-module surface (SURVEY §2.1 S2/S13/S14, §2.8 F4-F7, §3.2).
  */
object ParsingOps {

  /** S2: the CSV wire-format decode (Weather.scala:78-94 parses positional
    * CSV into case classes; honest nulls, not the reference's tech-debt
    * double-read — SURVEY §1.4). Round-trips events through CSV text and
    * aggregates the PARSED columns, so the oracle (aggregating the base
    * table directly) proves the parse was lossless. */
  private val csvRoundtrip = GraftQuery(
    "csv_parse_roundtrip",
    "S2 positional CSV decode via from_csv, proven lossless by the oracle",
    (s, d) => {
      val lines = Tables.events(s, d).select(
        concat_ws(",", col("event_id"), col("user_id"), col("event_type"),
          col("value").cast("string")).as("line"))
      val parsed = lines.select(from_csv(col("line"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id LONG, user_id LONG, event_type STRING, value DOUBLE"),
        Map("mode" -> "PERMISSIVE")).as("r"))
        .select(col("r.*"))
      parsed.groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          fround(sum(graft.functions.GraftFunctions.centi(col("value")))
            .cast("double") / 100.0, 2).as("total"),
          max("event_id").as("max_id"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS cnt, floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total, max(event_id) AS max_id FROM events GROUP BY 1 ORDER BY 1"""))

  /** S14: typed JSON decode — from_json into a struct (the reference's
    * json4s `extract[MonthlyCommits]` in KafkaStreamingJson2.scala:53-56). */
  private val jsonStruct = GraftQuery(
    "json_struct_decode",
    "S14 from_json struct decode + aggregate on the decoded field",
    (s, d) => Tables.events(s, d)
      .select(col("value"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"))
      .groupBy((col("p.k") % 5).as("kbucket"))
      .agg(count(lit(1)).as("cnt"), fround(max("value"), 2).as("max_val"))
      .orderBy("kbucket"),
    Some("""SELECT TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) % 5 AS kbucket, count(*) AS cnt, floor(max(value) * 100.0 + 0.5) / 100.0 AS max_val FROM events GROUP BY 1 ORDER BY 1"""))

  /** S13: JSON source with INFERRED schema — the reference's
    * `sqlContext.jsonRDD(rdd)` + SQL-over-inferred-columns path
    * (KafkaStreamingJson.scala:64-68, SampleJson.scala:45-47). The schema
    * (`k: bigint`) is discovered from the JSON text, not declared.
    * Scale note: inference is a separate sampling pass over the input —
    * at 100 TB you'd cap it (`samplingRatio`) or pin the schema after first
    * discovery; here the full inference pass IS the demonstrated surface. */
  private val jsonInferred = GraftQuery(
    "json_inferred_schema",
    "S13 schema-inferred JSON read + SQL aggregate over discovered fields",
    (s, d) => {
      import s.implicits._
      val inferred = s.read.json(Tables.events(s, d).select("props").as[String])
      assert(inferred.schema.fieldNames.contains("k"), "inference must discover k")
      inferred.groupBy((col("k") % 7).as("kbucket"))
        .agg(count(lit(1)).as("cnt"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("kbucket")
    },
    Some("""SELECT TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 7 AS kbucket, count(*) AS cnt, min(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS min_k, max(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k FROM events GROUP BY 1 ORDER BY 1"""))

  /** F4/F5/F7: date construction/arithmetic — make_date, last_day,
    * +1 month, ISO week (AggregationActor.scala:52-60's joda surface). */
  private val dateConstruct = GraftQuery(
    "date_construction",
    "F4/F7 make_date, last_day, month arithmetic, ISO week per event month",
    (s, d) => Tables.events(s, d)
      .select(year(col("ts")).as("yr"), month(col("ts")).as("mon"))
      .distinct()
      .select(col("yr"), col("mon"),
        make_date(col("yr"), col("mon"), lit(1)).as("month_start"),
        last_day(make_date(col("yr"), col("mon"), lit(1))).as("month_end"),
        add_months(make_date(col("yr"), col("mon"), lit(1)), 1).as("next_month"),
        dayofmonth(last_day(make_date(col("yr"), col("mon"), lit(1)))).as("days_in_month"),
        weekofyear(make_date(col("yr"), col("mon"), lit(1))).as("iso_week"))
      .orderBy("yr", "mon"),
    Some("""SELECT yr, mon, month_start, last_day(month_start) AS month_end, CAST(month_start + INTERVAL 1 MONTH AS DATE) AS next_month, CAST(day(last_day(month_start)) AS INTEGER) AS days_in_month, CAST(weekofyear(month_start) AS INTEGER) AS iso_week FROM (SELECT DISTINCT CAST(year(ts) AS INTEGER) AS yr, CAST(month(ts) AS INTEGER) AS mon, make_date(year(ts), month(ts), 1) AS month_start FROM events) ORDER BY 1, 2"""))

  /** J1: multi-key equi join through the spark.sql entry path (the
    * reference's CassandraSQLContext join, SampleJoin.scala:39-50). */
  private val sqlMultikeyJoin = GraftQuery(
    "sql_multikey_join",
    "J1 SQL-entry multi-key equi self-join: same-day click+purchase pairs",
    (s, d) => {
      Tables.register(s, d, Seq("events"))
      s.sql("""
        SELECT c.user_id, CAST(c.ts AS DATE) AS dy, count(*) AS pairs
        FROM events c JOIN events p
          ON c.user_id = p.user_id AND CAST(c.ts AS DATE) = CAST(p.ts AS DATE)
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        GROUP BY 1, 2 ORDER BY 1, 2""")
    },
    Some("""SELECT c.user_id, CAST(c.ts AS DATE) AS dy, count(*) AS pairs FROM events c JOIN events p ON c.user_id = p.user_id AND CAST(c.ts AS DATE) = CAST(p.ts AS DATE) WHERE c.event_type = 'click' AND p.event_type = 'purchase' GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** S10/S12/§3.2: the materialized-rollup cascade — persist the daily
    * rollup, serve the monthly query from the rollup table (the reference's
    * TemperatureActor write-back + read-back). */
  private val mvCascade = GraftQuery(
    "mv_rollup_cascade",
    "S10 write-back daily rollup table, monthly aggregate served from it",
    (s, d) => {
      val out = java.nio.file.Files.createTempDirectory("daily-rollup").toString
      new graft.api.WeatherQueries(s, d).materializeDaily(out)
      new graft.api.WeatherQueries(s, d).monthlyFromRollup(out)
        .toDF("station_id", "yr", "mon", "hi", "lo")
        .orderBy("station_id", "yr", "mon")
    },
    Some("""SELECT user_id AS station_id, yr, mon, max(high) AS hi, min(low) AS lo FROM (SELECT user_id, CAST(year(ts) AS INTEGER) AS yr, CAST(month(ts) AS INTEGER) AS mon, max(value) AS high, min(value) AS low FROM events GROUP BY user_id, yr, mon, day(ts)) GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** S15: create-table-as-write (SaveAsApi.scala:26-31's
    * saveAsCassandraTableEx — DDL + write in one step). CTAS into the
    * session catalog, then query the created table; DROP first so the
    * entry is rerunnable. */
  private val sqlCtas = GraftQuery(
    "sql_ctas",
    "S15 CREATE TABLE AS SELECT into the catalog, read back",
    (s, d) => {
      Tables.register(s, d, Seq("customer", "nation"))
      graft.sources.Layouts.dropTableAndLocation(s, "graft_ctas_nation_customers")
      // CAST the stored column to DOUBLE: Spark types floor(...)/100.0 as
      // DECIMAL (decimal literal division) while the DuckDB oracle emits
      // DOUBLE — numerically equal but a schema/hash mismatch at the gate.
      s.sql("""CREATE TABLE graft_ctas_nation_customers USING parquet AS
               SELECT n_name, count(*) AS cnt,
                 CAST(floor(CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS DOUBLE) AS total_bal
               FROM customer JOIN nation ON c_nationkey = n_nationkey
               GROUP BY n_name""")
      s.sql("SELECT * FROM graft_ctas_nation_customers ORDER BY n_name")
    },
    Some("""SELECT n_name, count(*) AS cnt, floor(CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total_bal FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name"""))

  /** Multimodal decode plumbing as a registered capability: binary payloads
    * → mapPartitions stub decode → per-format stats. The stub decode is
    * deterministic byte arithmetic and the corpus is pure ASCII (payload
    * byte == code point), so the DuckDB oracle replays it exactly: widths/
    * heights from the leading bytes, luma from the exact integer byte sum
    * (a double sum of integers ≤ 2^53 is exact, so Spark's per-row double
    * fold equals DuckDB's integer list_sum bit-for-bit). MultimodalSpec
    * additionally value-checks the typed Dataset API. */
  private val mmDecode = GraftQuery(
    "mm_decode_stats",
    "multimodal: binary payload decode (stubbed codec) + per-format stats",
    (s, d) => {
      import org.apache.spark.sql.functions.{avg => favg}
      val decoded = graft.multimodal.Multimodal.decodeImages(
        graft.multimodal.Multimodal.mediaTable(s, d))
      decoded.groupBy("format")
        .agg(count(lit(1)).as("cnt"),
          favg("width").as("avg_w"), favg("height").as("avg_h"),
          fround(favg("mean_luma"), 4).as("avg_luma"))
        .orderBy("format")
    },
    Some("""WITH d AS (SELECT doc_id, 'img/fake-' || source AS format, text, length(text) AS n FROM documents), b AS (SELECT format, 64 + CASE WHEN n >= 1 THEN ascii(substring(text, 1, 1)) % 128 ELSE 0 END AS w, 64 + CASE WHEN n >= 2 THEN ascii(substring(text, 2, 1)) % 128 ELSE 0 END AS h, CASE WHEN n = 0 THEN 0.0 ELSE CAST(list_sum([ascii(substring(text, i, 1)) for i in generate_series(1, n)]) AS DOUBLE) / n END AS luma FROM d) SELECT format, count(*) AS cnt, avg(w) AS avg_w, avg(h) AS avg_h, floor(avg(luma) * 10000.0 + 0.5) / 10000.0 AS avg_luma FROM b GROUP BY 1 ORDER BY 1"""))

  /** S7/S10 at scale: the write side of a time-partitioned table and the
    * partition-PRUNED read-back. The rollup is written partitionBy(dy) —
    * at 100 TB this is the layout decision that turns "scan a month" into
    * "list ten directories": the read-back's dy <= 10 filter is resolved
    * against the file index (PartitionFilters in the scan, asserted by
    * PartitionPrunedSpec), so unselected days contribute zero I/O. */
  /** One write-back per (JVM, corpus dir): without the memo every builder
    * invocation created a fresh temp dir and rewrote the rollup — orphaned
    * parquet dirs accumulating across bench/verify iterations. Same
    * immutable-corpus-dir assumption as [[graft.Tables]]/[[graft.PersistCache]];
    * the lock makes the write-once atomic across racing threads. */
  private val writebackMemo = scala.collection.concurrent.TrieMap[String, String]()
  private val writebackLock = new Object

  /** The dy-partitioned daily rollup layout for corpus `d`, written once
    * per JVM (shared by the static-pruning and dynamic-pruning queries). */
  def dailyRollupLayout(s: SparkSession, d: String): String =
    writebackLock.synchronized {
      writebackMemo.getOrElseUpdate(d, {
        val o = java.nio.file.Files.createTempDirectory("part-writeback").toString
        Tables.events(s, d)
          .withColumn("dy", dayofmonth(col("ts")).cast("int"))
          .groupBy("dy", "user_id")
          .agg(count(lit(1)).as("cnt"),
            sum(graft.functions.GraftFunctions.centi(col("value"))).as("vc"))
          // cluster rows by partition key before the partitioned write: one
          // file per day instead of (shuffle-partitions × days) small files —
          // at scale the small-file explosion is what kills partitioned
          // tables (file-listing cost grows with file count, not data size)
          .repartition(col("dy"))
          .write.mode("overwrite").partitionBy("dy").parquet(o)
        o
      })
    }

  private val partitionPruned = GraftQuery(
    "w_partition_pruned",
    "partitioned parquet write-back, partition-pruned daily read",
    (s, d) => {
      val out = dailyRollupLayout(s, d)
      s.read.parquet(out)
        .filter(col("dy") <= 10)
        .groupBy("dy")
        .agg(count(lit(1)).as("n_users"), sum("cnt").as("n_events"),
          fround(sum("vc").cast("double") / 100.0, 2).as("total_value"))
        .orderBy("dy")
    },
    Some("""SELECT dy, count(*) AS n_users, CAST(sum(cnt) AS BIGINT) AS n_events, floor(CAST(sum(vc) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total_value FROM (SELECT CAST(day(ts) AS INTEGER) AS dy, user_id, count(*) AS cnt, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS vc FROM events GROUP BY 1, 2) WHERE dy <= 10 GROUP BY dy ORDER BY dy"""))

  /** Dynamic partition pruning — the runtime counterpart of the static
    * dy <= 10 prune above, and the star-schema pattern that matters at
    * 100 TB: "join the fact to a filtered dim" must not scan every fact
    * partition, but the qualifying partition set (here: the top-3 purchase
    * days) is only known once the dim runs. Catalyst injects a
    * dynamicpruningexpression that REUSES the dim's broadcast as a
    * partition filter on the fact scan, so only 3 of ~30 day directories
    * are read (PartitionFilters plan-asserted in PartitionPrunedSpec).
    * The dim's top-3 is an exact-centi total with a dy tie-break —
    * deterministic in both engines. */
  private val dppPrune = GraftQuery(
    "j_dpp_prune",
    "dynamic partition pruning: top-3 purchase-day dim prunes the dy-partitioned rollup at runtime",
    (s, d) => {
      val fact = s.read.parquet(dailyRollupLayout(s, d))
      val dim = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(dayofmonth(col("ts")).cast("int").as("dy"))
        .agg(sum(graft.functions.GraftFunctions.centi(col("value"))).as("tot"))
        .orderBy(desc("tot"), col("dy")).limit(3)
      fact.join(broadcast(dim), Seq("dy"))
        .groupBy("dy")
        .agg(count(lit(1)).as("n_users"), sum("cnt").as("n_events"),
          fround(sum("vc").cast("double") / 100.0, 2).as("total_value"))
        .orderBy("dy")
    },
    Some("""WITH r AS (SELECT CAST(day(ts) AS INTEGER) AS dy, user_id, count(*) AS cnt, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS vc FROM events GROUP BY 1, 2), dim AS (SELECT CAST(day(ts) AS INTEGER) AS dy, sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS tot FROM events WHERE event_type = 'purchase' GROUP BY 1 ORDER BY tot DESC, dy LIMIT 3) SELECT r.dy, count(*) AS n_users, CAST(sum(cnt) AS BIGINT) AS n_events, floor(CAST(sum(vc) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total_value FROM r JOIN dim ON r.dy = dim.dy GROUP BY r.dy ORDER BY r.dy"""))

  /** Multimodal frame-sampling plumbing as a registered capability: every
    * 16th "frame" of each payload (byte stride in the stub codec; frame
    * stride with a real video decoder — only the lambda body changes).
    * The per-media rollup is exact integer math (byte sums), so the DuckDB
    * oracle replays the stride and luma bit-for-bit. */
  private val mmFrameSample = GraftQuery(
    "mm_frame_sample",
    "multimodal: stride frame sampling (stub codec) + per-media luma rollup",
    (s, d) => {
      val frames = graft.multimodal.Multimodal.frameSample(
        graft.multimodal.Multimodal.mediaTable(s, d), 16)
      frames.groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          fround(sum(col("luma")) / count(lit(1)), 4).as("avg_luma"),
          max("frame_idx").as("last_idx"))
        .orderBy("media_id")
    },
    Some("""WITH f AS (SELECT doc_id AS media_id, [ascii(substring(text, i, 1)) for i in generate_series(1, length(text), 16)] AS lumas FROM documents) SELECT media_id, CAST(len(lumas) AS BIGINT) AS n_frames, floor(CAST(list_sum(lumas) AS DOUBLE) / len(lumas) * 10000.0 + 0.5) / 10000.0 AS avg_luma, CAST(len(lumas) - 1 AS INTEGER) AS last_idx FROM f ORDER BY media_id"""))

  /** Column profiling — the data-quality sweep every ingestion runs before
    * trusting a table (row count, null count, distinct cardinality, value
    * range per column). ONE pass over the table produces every column's
    * profile (a per-column loop of count queries would scan the fact N
    * times); the wide aggregate row is then unpivoted to the long
    * (column, metric...) shape catalogs store. Values are stringified for
    * the uniform schema; doubles go through centi-units so both engines
    * print identical integers (raw double→string formatting differs). */
  private val qaProfile = GraftQuery(
    "qa_column_profile",
    "one-pass column profiling of orders: nulls, distincts, min/max per column",
    (s, d) => {
      // one (label, exact-value expr) row per profiled column: the agg
      // block AND the stack unpivot are both GENERATED from this list, so
      // adding a column cannot misalign them (doubles go through centi so
      // both engines stringify identical integers)
      val profiled: Seq[(String, Column)] = Seq(
        "o_orderkey" -> col("o_orderkey"),
        "o_custkey" -> col("o_custkey"),
        "o_totalprice_c" -> graft.functions.GraftFunctions.centi(col("o_totalprice")),
        "o_orderpriority" -> col("o_orderpriority"))
      val aggs = count(lit(1)).as("n") +:
        profiled.zipWithIndex.flatMap { case ((_, c), i) => Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"nulls_$i"),
          countDistinct(c).as(s"distinct_$i"),
          min(c).cast("string").as(s"min_$i"),
          max(c).cast("string").as(s"max_$i")) }
      val stackRows = profiled.zipWithIndex.map { case ((label, _), i) =>
        s"'$label', n, nulls_$i, distinct_$i, min_$i, max_$i" }.mkString(", ")
      // the 3-countDistinct Expand (x4 rows into the partial agg) ran on
      // the single scan task - spread (scale-gated) fans it out first
      Tables.spread(s, Tables.orders(s, d), col("o_orderkey"))
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${profiled.size}, $stackRows)" +
          " AS (column, n, nulls, n_distinct, min_v, max_v)")
        .orderBy("column")
    },
    Some("""WITH a AS (SELECT count(*) AS n, CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls, count(DISTINCT o_orderkey) AS k_distinct, CAST(min(o_orderkey) AS VARCHAR) AS k_min, CAST(max(o_orderkey) AS VARCHAR) AS k_max, CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nulls, count(DISTINCT o_custkey) AS c_distinct, CAST(min(o_custkey) AS VARCHAR) AS c_min, CAST(max(o_custkey) AS VARCHAR) AS c_max, CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls, count(DISTINCT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS p_distinct, CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS VARCHAR) AS p_min, CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS VARCHAR) AS p_max, CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls, count(DISTINCT o_orderpriority) AS s_distinct, min(o_orderpriority) AS s_min, max(o_orderpriority) AS s_max FROM orders) SELECT * FROM (SELECT 'o_orderkey' AS "column", n, k_nulls AS nulls, k_distinct AS n_distinct, k_min AS min_v, k_max AS max_v FROM a UNION ALL SELECT 'o_custkey', n, c_nulls, c_distinct, c_min, c_max FROM a UNION ALL SELECT 'o_totalprice_c', n, p_nulls, p_distinct, p_min, p_max FROM a UNION ALL SELECT 'o_orderpriority', n, s_nulls, s_distinct, s_min, s_max FROM a) ORDER BY "column""""))

  /** The scale-safe twin of [[qaProfile]]: identical shape, but distinct
    * cardinalities come from `approx_count_distinct` (HLL++) instead of
    * exact `countDistinct`. The exact form's three distinct aggregates in
    * one global agg compile to an Expand that replicates the full scan ×4
    * into the distinct shuffle — fine at test scale, a corpus-width ×4
    * shuffle at 100 TB. The HLL form is one partial-aggregatable pass:
    * sketches merge map-side, nothing but sketch bytes cross the wire, and
    * the plan has no Expand. Profiling sweeps at scale run THIS one; the
    * exact twin stays as the DuckDB-oracled correctness anchor. No SQL
    * oracle (HLL estimates are engine-specific); QaProfileHllSpec asserts
    * every estimate within 5% of exact and all non-distinct metrics
    * identical to the exact twin's. */
  private val qaProfileHll = GraftQuery(
    "qa_column_profile_hll",
    "scale-safe column profile: approx_count_distinct sketches, no Expand",
    (s, d) => {
      val profiled: Seq[(String, Column)] = Seq(
        "o_orderkey" -> col("o_orderkey"),
        "o_custkey" -> col("o_custkey"),
        "o_totalprice_c" -> graft.functions.GraftFunctions.centi(col("o_totalprice")),
        "o_orderpriority" -> col("o_orderpriority"))
      val aggs = count(lit(1)).as("n") +:
        profiled.zipWithIndex.flatMap { case ((_, c), i) => Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"nulls_$i"),
          // rsd 0.03: 2x the default's register budget buys ~1% observed
          // error (spec bound 5%), while rsd 0.01's 25x registers cost
          // ~4x the whole query's runtime for accuracy nothing needs
          approx_count_distinct(c, 0.03).as(s"distinct_$i"),
          min(c).cast("string").as(s"min_$i"),
          max(c).cast("string").as(s"max_$i")) }
      val stackRows = profiled.zipWithIndex.map { case ((label, _), i) =>
        s"'$label', n, nulls_$i, distinct_$i, min_$i, max_$i" }.mkString(", ")
      // NO spread here (unlike the exact twin): without the Expand there
      // is too little per-row work to amortize the extra exchange —
      // measured 0.40 s -> 0.71-0.98 s with it, so the sketch pass stays
      // on the plain scan
      Tables.orders(s, d).agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${profiled.size}, $stackRows)" +
          " AS (column, n, nulls, n_distinct, min_v, max_v)")
        .orderBy("column")
    },
    None, boundedBy = Some("OperatorSpec"))

  /** Expectation checks — the dbt-test/assertion verb that gates a
    * pipeline stage: each rule computes its VIOLATION count (0 = pass) in
    * the cheapest scale shape for that rule class — uniqueness via one
    * keyed aggregate, referential integrity via LEFT ANTI joins (never a
    * distinct-collect), range rules as scan-riding filters. Rules run as
    * one union of small aggregates; a 100 TB deployment runs the same plan
    * per partition-increment instead of full-table. */
  private val qaExpectations = GraftQuery(
    "qa_expectations",
    "expectation suite: uniqueness, referential integrity, range rules with violation counts",
    (s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val c = Tables.customer(s, d)
      def rule(name: String, violations: org.apache.spark.sql.DataFrame) =
        violations.select(lit(name).as("rule"), col("violations"))
      val unique = rule("orderkey_unique",
        o.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .agg(coalesce(sum(col("n") - 1), lit(0L)).as("violations")))
      val refCust = rule("orders_ref_customer",
        o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("violations")))
      val refOrd = rule("lineitem_ref_orders",
        li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("violations")))
      val price = rule("totalprice_positive",
        o.filter(col("o_totalprice") <= 0).agg(count(lit(1)).as("violations")))
      val qty = rule("quantity_in_band",
        li.filter(!col("l_quantity").between(1, 50))
          .agg(count(lit(1)).as("violations")))
      unique.unionByName(refCust).unionByName(refOrd)
        .unionByName(price).unionByName(qty)
        .withColumn("status", when(col("violations") === 0, lit("pass"))
          .otherwise(lit("fail")))
        .orderBy("rule")
    },
    Some("""WITH t(rule, violations) AS (SELECT 'orderkey_unique', CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1 HAVING count(*) > 1) UNION ALL SELECT 'orders_ref_customer', count(*) FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey) UNION ALL SELECT 'lineitem_ref_orders', count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey) UNION ALL SELECT 'totalprice_positive', count(*) FROM orders WHERE o_totalprice <= 0 UNION ALL SELECT 'quantity_in_band', count(*) FROM lineitem WHERE l_quantity NOT BETWEEN 1 AND 50) SELECT rule, violations, CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status FROM t ORDER BY rule"""))

  /** SCD type-2 dimension merge — the warehouse temporal-versioning verb:
    * an incoming change batch closes the current version of each changed
    * key (valid_to = effective date) and opens a new current version;
    * unchanged keys pass through untouched. The change set here is
    * simulated deterministically (every 7th customer moves to segment
    * 'PROMO' effective 2024-06-01), which keeps the merge ONE narrow pass
    * (version rows emitted per dimension row via a single explode — no
    * shuffle until the presentation sort). A real change batch is
    * increment-sized and joins in first — broadcast while it fits, never
    * hard-hinted at dimension scale. At 100 TB the dimension rewrite goes
    * through the same keyed-bucket publish as KeyedParquetSink (only
    * touched buckets rewritten). */
  private val scd2Merge = GraftQuery(
    "mv_scd2_merge",
    "SCD type-2 merge: close changed versions, open new current rows",
    (s, d) => {
      // the change "batch" is derived in-row here (simulated), so the whole
      // merge is ONE narrow pass: each dimension row emits its version
      // array (1 row unchanged, 2 rows changed) through a single explode —
      // no union of re-evaluated subplans (which would re-scan the
      // dimension per branch) and no join at all. A real increment-sized
      // change batch joins in first (broadcast while it fits); the
      // emit-versions shape below is unchanged by that.
      val changed = col("c_custkey") % 7 === 0
      val mk = (ver: Column, seg: Column, from: String, to: Column, cur: Column) =>
        struct(ver.as("version"), seg.as("segment"),
          lit(from).cast("date").as("valid_from"), to.as("valid_to"),
          cur.as("is_current"))
      Tables.customer(s, d)
        .select(col("c_custkey"),
          explode(when(changed, array(
              mk(lit(1), col("c_mktsegment"), "2024-01-01",
                lit("2024-06-01").cast("date"), lit(0)),
              mk(lit(2), lit("PROMO"), "2024-06-01",
                lit("9999-12-31").cast("date"), lit(1))))
            .otherwise(array(
              mk(lit(1), col("c_mktsegment"), "2024-01-01",
                lit("9999-12-31").cast("date"), lit(1))))).as("v"))
        .select(col("c_custkey"), col("v.version").as("version"),
          col("v.segment").as("segment"), col("v.valid_from").as("valid_from"),
          col("v.valid_to").as("valid_to"), col("v.is_current").as("is_current"))
        .orderBy("c_custkey", "version")
    },
    Some("""WITH dim AS (SELECT c_custkey, c_mktsegment FROM customer), ch AS (SELECT c_custkey, 'PROMO' AS new_segment FROM dim WHERE c_custkey % 7 = 0), m AS (SELECT dim.c_custkey, dim.c_mktsegment, ch.new_segment FROM dim LEFT JOIN ch USING (c_custkey)), v1 AS (SELECT c_custkey, 1 AS version, c_mktsegment AS segment, DATE '2024-01-01' AS valid_from, CASE WHEN new_segment IS NOT NULL THEN DATE '2024-06-01' ELSE DATE '9999-12-31' END AS valid_to, CASE WHEN new_segment IS NOT NULL THEN 0 ELSE 1 END AS is_current FROM m), v2 AS (SELECT c_custkey, 2 AS version, new_segment AS segment, DATE '2024-06-01' AS valid_from, DATE '9999-12-31' AS valid_to, 1 AS is_current FROM m WHERE new_segment IS NOT NULL) SELECT * FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2) ORDER BY c_custkey, version"""))

  /** Stored base MV for [[mvIncrementalAgg]]: the per-customer rollup of
    * every order BEFORE the 1997-01-01 watermark, materialized once per
    * (session, corpus) — the analog of the IVF/graph stored artifacts (a
    * deployment refreshes against yesterday's MV, it does not rebuild it). */
  private[graft] def baseOrderMv(s: SparkSession, d: String) =
    graft.PersistCache.getOrBuild(s, s"base-order-mv:$d") {
      import graft.functions.GraftFunctions.centi
      Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1997-01-01"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum(centi(col("o_totalprice"))).as("sc"),
          max(centi(col("o_totalprice"))).as("mx"))
    }

  /** Incremental aggregate maintenance (IVM) — the refresh shape that makes
    * a 100 TB rollup sustainable: the per-customer order aggregate is kept
    * as a stored MV; a refresh aggregates ONLY the incoming delta batch and
    * merges the two states (count+count, sum+sum, max+max — every metric
    * here is decomposable, which is WHY these metrics and not, say, exact
    * median). The base table is never rescanned: refresh cost is
    * O(delta + |MV|) regardless of history size. Stand-in split: orders
    * before 1997-01-01 are the stored base (bench-setup materialized),
    * the rest is the delta. The oracle recomputes the rollup from scratch
    * over ALL orders — equality of merged-vs-recomputed IS the IVM
    * correctness proof. */
  private val mvIncrementalAgg = GraftQuery(
    "mv_incremental_agg",
    "incremental MV refresh: delta-only aggregation merged with stored state",
    (s, d) => {
      import graft.functions.GraftFunctions.centi
      val delta = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum(centi(col("o_totalprice"))).as("sc"),
          max(centi(col("o_totalprice"))).as("mx"))
      baseOrderMv(s, d).unionByName(delta)
        .groupBy("o_custkey")
        .agg(sum("n").as("n_orders"),
          fround(sum("sc").cast("double") / 100.0, 2).as("total_price"),
          fround(max("mx").cast("double") / 100.0, 2).as("max_price"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey, count(*) AS n_orders, floor(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total_price, floor(CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS max_price FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Order-independent table checksums — the anti-entropy primitive for
    * verifying two replicas / two snapshots / an engine migration hold the
    * same data WITHOUT shipping rows: per table, XOR-fold a hash of each
    * row's canonical string. XOR is commutative+associative, so the fold
    * is partition-mergeable with no ordering or shuffle requirement (one
    * narrow scan + a 1-row combine per table) and any ODD number of
    * changed rows flips the checksum. The XOR fold's known blind spots are
    * accepted and bounded: an even multiplicity of IDENTICAL changes
    * cancels (countered in practice by including a unique key column in
    * every canonical string, as all four legs here do), and concat_ws
    * would canonicalize NULL and absent identically, so only non-null
    * separator-free key/code columns belong in the string. Two independent
    * 32-bit md5 words give a 64-bit effective check (a production run
    * widens to 128 the same way). Doubles never enter the canonical string
    * (their decimal rendering is engine-specific) — numeric content rides
    * as centi BIGINTs. This query IS the engine-vs-oracle membership proof the
    * hash-compare gate approximates row-by-row. */
  private val qaTableChecksum = GraftQuery(
    "qa_table_checksum",
    "anti-entropy XOR row-hash checksums per table (order-independent)",
    (s, d) => {
      import graft.functions.GraftFunctions.{centi, xorChecksum}
      // md5-per-row dominates this floor; each leg's scan is one task on
      // the single-file local tables, so the hash fold ran on one core.
      // Tables.spread (scale-gated, identity at real input sizes) spreads
      // each leg across the session's cores on its key column before the
      // fold — XOR is commutative, so the fold is partition-invariant by
      // construction.
      def legDf(name: String, t: org.apache.spark.sql.DataFrame,
          key: Column, canon: Column) =
        xorChecksum(Tables.spread(s, t, key), canon)
          .select(lit(name).as("table_name"), col("n_rows"),
            col("xor_hi"), col("xor_lo"))
      legDf("customer", Tables.customer(s, d), col("c_custkey"),
          concat_ws("|", col("c_custkey"), col("c_mktsegment")))
        .unionByName(legDf("documents", Tables.documents(s, d), col("doc_id"),
          concat_ws("|", col("doc_id"), col("lang"))))
        .unionByName(legDf("lineitem", Tables.lineitem(s, d), col("l_orderkey"),
          concat_ws("|", col("l_orderkey"), col("l_suppkey"),
            centi(col("l_quantity")))))
        .unionByName(legDf("orders", Tables.orders(s, d), col("o_orderkey"),
          concat_ws("|", col("o_orderkey"), col("o_orderstatus"))))
        .orderBy("table_name")
    },
    Some {
      import graft.functions.GraftFunctions.md5u32Sql
      def leg(name: String, table: String, canon: String) = {
        val hi = md5u32Sql(s"md5($canon)")
        val lo = md5u32Sql(s"substr(md5($canon), 9, 8)")
        s"SELECT '$name' AS table_name, count(*) AS n_rows, bit_xor($hi) AS xor_hi, bit_xor($lo) AS xor_lo FROM $table"
      }
      Seq(
        leg("customer", "customer", "concat_ws('|', c_custkey, c_mktsegment)"),
        leg("documents", "documents", "concat_ws('|', doc_id, lang)"),
        leg("lineitem", "lineitem",
          "concat_ws('|', l_orderkey, l_suppkey, CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))"),
        leg("orders", "orders", "concat_ws('|', o_orderkey, o_orderstatus)"))
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY table_name")
    })

  /** Referential-integrity audit — the FK orphan sweep a warehouse runs
    * after every load: for each declared FK edge, count child rows whose
    * key has no parent. Each leg is a LEFT ANTI join: dimension parents
    * (customer, part, supplier) broadcast, so those legs are narrow scans;
    * the fact-fact leg (lineitem→orders) shuffles both sides on the join
    * key once — the honest shape at any scale. All-zero orphan counts are
    * the PASS state (and what this data should produce); the operator's
    * value is the guarantee, spelled as a query. */
  private val qaRefIntegrity = GraftQuery(
    "qa_ref_integrity",
    "FK orphan audit: anti-join counts per declared edge",
    (s, d) => {
      // ONE scan per child table: every FK edge of a child audits in the
      // same pass (left join per parent, count null parents — equivalent
      // to the anti-join count because parents are PK-unique, so the left
      // join never multiplies child rows). The naive per-edge shape costs
      // 2 scans x edges; this is 1 scan x children — at 100 TB the child
      // scan IS the cost and lineitem carries three edges.
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left")
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("orph_ord"),
          sum(when(col("p_partkey").isNull, 1L).otherwise(0L)).as("orph_part"),
          sum(when(col("s_suppkey").isNull, 1L).otherwise(0L)).as("orph_supp"))
      val ord = Tables.orders(s, d).select(col("o_custkey"))
        .join(broadcast(Tables.customer(s, d).select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("orph_cust"))
      val liEdges = li.select(explode(array(
          struct(lit("lineitem.l_orderkey->orders").as("fk_edge"),
            col("n_rows"), col("orph_ord").as("n_orphans")),
          struct(lit("lineitem.l_partkey->part").as("fk_edge"),
            col("n_rows"), col("orph_part").as("n_orphans")),
          struct(lit("lineitem.l_suppkey->supplier").as("fk_edge"),
            col("n_rows"), col("orph_supp").as("n_orphans")))).as("e"))
        .select(col("e.fk_edge").as("fk_edge"), col("e.n_rows").as("n_rows"),
          col("e.n_orphans").as("n_orphans"))
      val ordEdge = ord.select(lit("orders.o_custkey->customer").as("fk_edge"),
        col("n_rows"), col("orph_cust").as("n_orphans"))
      liEdges.unionByName(ordEdge).orderBy("fk_edge")
    },
    Some {
      def leg(edge: String, child: String, fk: String, parent: String, pk: String) =
        s"SELECT '$edge' AS fk_edge, (SELECT count(*) FROM $child) AS n_rows, (SELECT count(*) FROM $child c WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)) AS n_orphans"
      Seq(
        leg("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        leg("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        leg("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        leg("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"))
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY fk_edge")
    })

  /** One (table, key) leg of [[qaKeySkew]]: group sizes, then two tiny
    * passes over the key-count table. The count subplan appears twice
    * (stats + hot-key filter) with an identical canonical form, so
    * Catalyst reuses its shuffle (ReusedExchange — plan-asserted in the
    * spec): the fact is scanned and shuffled ONCE, everything after runs
    * over |keys| rows. The hot-key test multiplies instead of dividing
    * (sz * n_keys > 2 * n_rows) so it stays in exact BIGINTs. */
  private def skewProfile(df: DataFrame, tbl: String, keyCol: String): DataFrame = {
    val g = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("sz"))
    val stats = g.agg(sum("sz").as("n_rows"), count(lit(1)).as("n_keys"),
      max("sz").as("max_sz"))
    // exact 128-bit compare: sz * n_keys can pass 2^63 at plausible scale
    // (1e9-row key x 1e10 keys); LONG would wrap SILENTLY (non-ANSI) and
    // drop the hottest keys from the list. DECIMAL(38,0) is the exact
    // wide-integer twin of the oracle's HUGEINT (the emb_dim_profile sm2
    // discipline).
    val hot = g.crossJoin(broadcast(stats))
      .filter(col("sz").cast("decimal(38,0)") * col("n_keys") >
        col("n_rows").cast("decimal(38,0)") * lit(2L))
      .agg(count(lit(1)).as("n_hot"))
    stats.crossJoin(hot)
      .select(lit(tbl).as("tbl"), lit(keyCol).as("key_col"),
        col("n_rows"), col("n_keys"), col("max_sz"),
        // BIGINT is exact here while max_sz < 9.2e12 — a single join key
        // with nine trillion rows is beyond any real table; the hot-key
        // compare above is the one that overflows at plausible scale.
        expr("(max_sz * 1000000L) DIV n_rows").as("top_ppm"),
        fround(col("n_rows").cast("double") / col("n_keys"), 4).as("avg_sz"),
        col("n_hot"))
  }

  private def skewSql(tbl: String, keyCol: String): String = {
    val g = s"SELECT count(*) AS sz FROM $tbl GROUP BY $keyCol"
    s"SELECT '$tbl' AS tbl, '$keyCol' AS key_col, s.n_rows, s.n_keys, s.max_sz, (s.max_sz * 1000000) // s.n_rows AS top_ppm, floor(CAST(s.n_rows AS DOUBLE) / s.n_keys * 10000.0 + 0.5) / 10000.0 AS avg_sz, h.n_hot FROM (SELECT CAST(sum(sz) AS BIGINT) AS n_rows, count(*) AS n_keys, max(sz) AS max_sz FROM ($g)) s CROSS JOIN (SELECT count(*) AS n_hot FROM ($g) g CROSS JOIN (SELECT CAST(sum(sz) AS BIGINT) AS n_rows, count(*) AS n_keys FROM ($g)) s2 WHERE CAST(g.sz AS HUGEINT) * s2.n_keys > 2 * CAST(s2.n_rows AS HUGEINT)) h"
  }

  /** JOIN-KEY SKEW PROFILE — the diagnostic that decides the shuffle
    * strategy BEFORE a 100 TB join runs: per (table, key), total rows,
    * distinct keys, the largest group, its corpus share in exact ppm
    * (integer division — never a float ratio), the exact-rational mean
    * group size, and how many keys exceed 2x the mean (the salting
    * candidates — AQE's skew-join split and manual salting both want
    * exactly this list). Profiles the three join keys the engine's own
    * query plane hits hardest: lineitem.l_orderkey (the fact-fact edge),
    * orders.o_custkey (Q13's distribution), events.user_id (the
    * sessionization key). */
  private val qaKeySkew = GraftQuery(
    "qa_key_skew",
    "per join-key group-size skew profile: max/top-share/hot-key counts",
    (s, d) => skewProfile(Tables.lineitem(s, d), "lineitem", "l_orderkey")
      .unionByName(skewProfile(Tables.orders(s, d), "orders", "o_custkey"))
      .unionByName(skewProfile(Tables.events(s, d), "events", "user_id"))
      .orderBy("tbl"),
    Some(Seq(("lineitem", "l_orderkey"), ("orders", "o_custkey"),
        ("events", "user_id"))
      .map { case (t, k) => skewSql(t, k) }
      .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY tbl")))

  /** CDC log compaction: latest-writer-wins per key with DELETE
    * tombstones — the lakehouse merge-on-read compaction kernel (Delta/
    * Iceberg/Hudi snapshot reads all do exactly this). The events stream
    * is read as a change log on user_id ('error' rows are tombstones,
    * everything else an upsert carrying value); the compacted snapshot is
    * the newest row per key by (ts, event_id), DROPPED if that newest row
    * is a tombstone. The change count per key rides the same partition
    * window, so one keyed shuffle serves ranking, counting, and the
    * filter. Scale: at 100 TB the log is date-partitioned and compaction
    * runs per partition; the per-key window state is one row (rank-1
    * short-circuit), and AQE handles hot keys. */
  private val mvCompactCdc = GraftQuery(
    "mv_compact_cdc",
    "CDC compaction: latest-per-key snapshot with delete tombstones",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
      val wOrd = w.orderBy(desc("ts"), desc("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          centi(col("value")).as("vc"),
          (col("event_type") === "error").cast("int").as("is_del"))
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("n_changes", count(lit(1)).over(w))
        .filter(col("rn") === 1 && col("is_del") === 0)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("vc").as("last_value_c"), col("n_changes"))
        .orderBy("user_id")
    },
    Some("""WITH log AS (SELECT user_id, ts, event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del FROM events), r AS (SELECT user_id, event_id, vc, is_del, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn, CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes FROM log) SELECT user_id, event_id AS last_event_id, vc AS last_value_c, n_changes FROM r WHERE rn = 1 AND is_del = 0 ORDER BY user_id"""))

  /** Exact pairwise COVARIANCE matrix over the lineitem numerics — the
    * feature-correlation profile a modeling pipeline computes before
    * training. Everything is one single-pass global aggregate (map-side
    * combined: 4 linear + 10 product sums), so the corpus is scanned ONCE
    * with no shuffle beyond the 1-row combine. Exactness: inputs are ≤2dp,
    * so centi-int products are exact longs (≤ ~1e14) and their sums are
    * kept exact in decimal(38,0) (DuckDB: HUGEINT — both lossless), and
    * cov = (n·Σxy − Σx·Σy)/n² is formed from exact integers with ONE
    * int→double conversion and an identical division sequence in both
    * engines, so the rounded output is bit-stable. The 4×4 matrix is
    * reshaped to rows with stack() — no extra pass. */
  private val qaCovMatrix = GraftQuery(
    "qa_cov_matrix",
    "exact single-pass pairwise covariance matrix of lineitem numerics",
    (s, d) => {
      val cols = Seq(
        "q" -> centi(col("l_quantity")), "p" -> centi(col("l_extendedprice")),
        "d" -> centi(col("l_discount")), "t" -> centi(col("l_tax")))
      val pairs = for {
        (i, (nx, _)) <- cols.zipWithIndex.map(_.swap)
        (ny, _) <- cols.drop(i)
      } yield (nx, ny)
      val base = Tables.lineitem(s, d).select(
        cols.map { case (n, c) => c.as(n) }: _*)
      val sums = base.agg(
        count(lit(1)).as("n"),
        (cols.map { case (n, _) => sum(col(n)).as(s"s_$n") } ++
          pairs.map { case (x, y) =>
            sum((col(x) * col(y)).cast("decimal(38,0)")).as(s"s_${x}_$y") }): _*)
      val covExprs = pairs.flatMap { case (x, y) =>
        Seq(lit(x), lit(y),
          fround((col("n").cast("decimal(38,0)") * col(s"s_${x}_$y") -
              col(s"s_$x").cast("decimal(38,0)") * col(s"s_$y"))
            .cast("double") / (col("n") * col("n")).cast("double") / 10000.0,
            4))
      }
      sums.select(stack((lit(pairs.size) +: covExprs): _*).as(Seq("cx", "cy", "cov")))
        .orderBy("cx", "cy")
    },
    Some {
      val defs = Seq(
        "q" -> "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)",
        "p" -> "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
        "d" -> "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)",
        "t" -> "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)")
      val pairs = for {
        (i, (nx, _)) <- defs.zipWithIndex.map(_.swap); (ny, _) <- defs.drop(i)
      } yield (nx, ny)
      val proj = defs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
      val aggs = (defs.map { case (n, _) => s"sum($n) AS s_$n" } ++
        pairs.map { case (x, y) => s"sum($x * $y) AS s_${x}_$y" }).mkString(", ")
      val rows = pairs.map { case (x, y) =>
        s"SELECT '$x' AS cx, '$y' AS cy, floor(CAST(n * s_${x}_$y - s_$x * s_$y AS DOUBLE) / CAST(n * n AS DOUBLE) / 10000.0 * 10000.0 + 0.5) / 10000.0 AS cov FROM s"
      }.mkString(" UNION ALL ")
      s"WITH b AS (SELECT $proj FROM lineitem), s AS (SELECT count(*) AS n, $aggs FROM b) SELECT * FROM ($rows) ORDER BY cx, cy"
    })

  /** Gini impurity of the language mix per source — label-diversity QA for
    * a multilingual corpus (a source collapsing to one language, or
    * splintering into noise, both show up here). gini = 1 − Σ(cᵢ/n)² is a
    * RATIONAL in the counts, so it's emitted as exact integer ppm via
    * (n²−Σcᵢ²)·10⁶ div n² — floor division agrees across engines on
    * positives, no float anywhere. Scale: groupBy (source, lang) is one
    * map-side-combined shuffle to label-cardinality rows; the per-source
    * fold is negligible. */
  private val qaLabelGini = GraftQuery(
    "qa_label_gini",
    "per-source language-mix Gini impurity in exact integer ppm",
    (s, d) => Tables.documents(s, d)
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_docs"), count(lit(1)).as("n_langs"),
        sum(col("c") * col("c")).as("s2"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        expr("((n_docs * n_docs - s2) * 1000000) div (n_docs * n_docs)").as("gini_ppm"))
      .orderBy("source"),
    Some("""WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2), g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs, CAST(count(*) AS BIGINT) AS n_langs, CAST(sum(c * c) AS BIGINT) AS s2 FROM c GROUP BY 1) SELECT source, n_docs, n_langs, ((n_docs * n_docs - s2) * 1000000) // (n_docs * n_docs) AS gini_ppm FROM g ORDER BY source"""))

  /** Exact equi-depth histogram boundaries for o_totalprice at
    * whole-dollar granularity — the optimizer/QA statistic behind range
    * pruning and skew detection. Exact deciles over a corpus need a total
    * order, so the corpus is first REDUCED to dollar price levels
    * (cardinality bounded by the price RANGE, not the row count — the
    * same level-reduce rel_skyline uses); the cumulative count runs over
    * those levels only, and the k-th boundary is the first level whose
    * cumulative count reaches ceil(k·n/10) — all integer arithmetic. The
    * 9-row decile spine broadcasts into the level table. At 100 TB the
    * same shape holds wherever the value domain is bounded; an unbounded
    * domain falls back to approx_percentile (the repo's t-digest twin). */
  private val qaEquidepthHist = GraftQuery(
    "qa_equidepth_hist",
    "exact equi-depth decile boundaries over dollar price levels",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lvl = Tables.orders(s, d)
        .select(floor(col("o_totalprice")).cast("long").as("lvl"))
        .groupBy("lvl").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(
          Window.orderBy("lvl").rowsBetween(Window.unboundedPreceding, 0)))
      val n = Tables.orders(s, d).count()
      val spine = s.range(1, 10).select(col("id").as("k"),
        ((col("id") * n + 9) / 10).cast("long").as("thr"))
      lvl.join(broadcast(spine), col("cum") >= col("thr"))
        .groupBy("k").agg(min("lvl").as("boundary_dollars"))
        .orderBy("k")
    },
    Some("""WITH lvl AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS lvl, count(*) AS cnt FROM orders GROUP BY 1), c AS (SELECT lvl, sum(cnt) OVER (ORDER BY lvl ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM lvl), t AS (SELECT count(*) AS n FROM orders), s AS (SELECT k, (k * n + 9) // 10 AS thr FROM generate_series(1, 9) g(k), t) SELECT CAST(k AS BIGINT) AS k, CAST(min(lvl) AS BIGINT) AS boundary_dollars FROM c JOIN s ON cum >= thr GROUP BY 1 ORDER BY 1"""))

  /** Multimodal RESIZE plumbing (the remaining verb of the decode /
    * feature-extract / resize / frame-sample quartet): nearest-neighbor
    * downsample of each payload to an 8×8 sample grid via the stub
    * resampler (Multimodal.resizeThumb — a real deployment swaps the
    * codec body only; the Spark-side schema, typed map, and integer-exact
    * sample stats are the real plumbing under test). Narrow per-row map,
    * no shuffle. */
  private val mmResize = GraftQuery(
    "mm_resize_grid",
    "multimodal: 8x8 nearest-neighbor resize (stub resampler), sample stats",
    (s, d) => graft.multimodal.Multimodal.resizeThumb(
        graft.multimodal.Multimodal.mediaTable(s, d))
      .orderBy("media_id"),
    Some("""WITH d AS (SELECT doc_id AS media_id, text, length(text) AS len FROM documents), smp AS (SELECT media_id, CAST(ascii(substring(text, CAST((k * len) // 64 AS INTEGER) + 1, 1)) AS BIGINT) AS v FROM d, (SELECT unnest(generate_series(0, 63)) AS k)) SELECT media_id, CAST(count(*) AS BIGINT) AS n_samples, CAST(sum(v) AS BIGINT) AS sample_sum, min(v) AS sample_min, max(v) AS sample_max FROM smp GROUP BY 1 ORDER BY 1"""))

  /** Perceptual-hash near-dup over the media table: 64-bit pHash (from
    * the stub resize grid) split into four 16-bit bands; candidates are
    * pairs sharing ANY band bucket (the Hamming-space LSH guarantee:
    * distance ≤ 3 forces a band collision), verified by exact Hamming
    * distance ≤ 6, then folded to a per-media near-dup degree. The same
    * band-bucket + verify discipline as dedup_minhash — never all-pairs —
    * including the hot-bucket cutoff (bucket > 64 members is boilerplate
    * banding, dropped before the join) that keeps a constant-band corpus
    * from going quadratic. Scale: one typed decode pass, banded
    * self-join, pair-bounded verify against the broadcast-sized hash
    * table. */
  private lazy val mmPhash = GraftQuery(
    "mm_phash_dedup",
    "multimodal: banded pHash near-dup candidates, Hamming-verified",
    (s, d) => {
      val ph = graft.PersistCache.getOrBuild(s, s"mm_phash:$d") {
        graft.multimodal.Multimodal.phashBands(
          graft.multimodal.Multimodal.mediaTable(s, d))
      }
      val bands = ph.select(col("media_id"),
          posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
        .toDF("media_id", "bj", "bv")
      val ok = bands.groupBy("bj", "bv").agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= 64).select("bj", "bv")
      val bb = bands.join(ok, Seq("bj", "bv"))
      val cand = bb.toDF("bj", "bv", "ma")
        .join(bb.toDF("bj", "bv", "mb"), Seq("bj", "bv"))
        .filter(col("ma") < col("mb")).select("ma", "mb").distinct()
      val hd = cand
        .join(ph.toDF("ma", "a0", "a1", "a2", "a3"), Seq("ma"))
        .join(ph.toDF("mb", "c0", "c1", "c2", "c3"), Seq("mb"))
        .filter(
          bit_count(col("a0").bitwiseXOR(col("c0"))) +
            bit_count(col("a1").bitwiseXOR(col("c1"))) +
            bit_count(col("a2").bitwiseXOR(col("c2"))) +
            bit_count(col("a3").bitwiseXOR(col("c3"))) <= 6)
      val near = hd.select(col("ma").as("media_id"))
        .union(hd.select(col("mb").as("media_id")))
        .groupBy("media_id").agg(count(lit(1)).as("n_near"))
      ph.join(near, Seq("media_id"), "left")
        .select(col("media_id"), col("b0"), col("b1"), col("b2"), col("b3"),
          coalesce(col("n_near"), lit(0L)).as("n_near"))
        .orderBy("media_id")
    },
    Some("""WITH d AS (SELECT doc_id AS media_id, text, length(text) AS len FROM documents), smp AS (SELECT media_id, k, CAST(CASE WHEN len = 0 THEN 0 ELSE ascii(substring(text, CAST((k * len) // 64 AS INTEGER) + 1, 1)) END AS BIGINT) AS v FROM d, (SELECT unnest(generate_series(0, 63)) AS k)), tot AS (SELECT media_id, sum(v) AS s FROM smp GROUP BY 1), bits AS (SELECT smp.media_id, k, CASE WHEN v * 64 > s THEN 1 ELSE 0 END AS bit FROM smp JOIN tot USING (media_id)), bands AS (SELECT media_id, CAST(k // 16 AS INTEGER) AS bj, CAST(sum(bit * (1 << CAST(k % 16 AS INTEGER))) AS INTEGER) AS bv FROM bits GROUP BY 1, 2), ph AS (SELECT media_id, max(CASE WHEN bj = 0 THEN bv END) AS b0, max(CASE WHEN bj = 1 THEN bv END) AS b1, max(CASE WHEN bj = 2 THEN bv END) AS b2, max(CASE WHEN bj = 3 THEN bv END) AS b3 FROM bands GROUP BY 1), ok AS (SELECT bj, bv FROM bands GROUP BY 1, 2 HAVING count(*) <= 64), bb AS (SELECT bands.* FROM bands JOIN ok USING (bj, bv)), cand AS (SELECT DISTINCT a.media_id AS ma, b.media_id AS mb FROM bb a JOIN bb b ON a.bj = b.bj AND a.bv = b.bv AND a.media_id < b.media_id), hd AS (SELECT ma, mb FROM cand JOIN ph pa ON pa.media_id = ma JOIN ph pb ON pb.media_id = mb WHERE bit_count(xor(pa.b0, pb.b0)) + bit_count(xor(pa.b1, pb.b1)) + bit_count(xor(pa.b2, pb.b2)) + bit_count(xor(pa.b3, pb.b3)) <= 6), nn AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_near FROM (SELECT ma AS media_id FROM hd UNION ALL SELECT mb FROM hd) GROUP BY 1) SELECT ph.media_id, b0, b1, b2, b3, coalesce(nn.n_near, 0) AS n_near FROM ph LEFT JOIN nn USING (media_id) ORDER BY media_id"""))

  /** The stored batch half of the lambda serving view: daily per-type
    * rollup over everything BEFORE the watermark day — a deployment
    * refreshes this nightly; queries never recompute it. */
  private[graft] def batchDailyMv(s: SparkSession, d: String) =
    graft.PersistCache.getOrBuild(s, s"lambda-daily-mv:$d") {
      import graft.functions.GraftFunctions.centi
      Tables.events(s, d)
        .filter(col("ts") < lit("2024-01-25 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sum(centi(col("value"))).as("vcs"))
    }

  /** Lambda-architecture serving view: the batch layer (stored daily MV
    * over history, [[batchDailyMv]]) UNION'd with the speed layer (the
    * same rollup computed from raw events AFTER the watermark) — the
    * read path that makes a 100 TB history queryable at streaming
    * freshness. Day grains never straddle the watermark, so the union
    * needs no key-level merge (contrast mv_incremental_agg, which merges
    * decomposable states); each row carries which layer served it. The
    * oracle recomputes both layers from scratch — equality proves the
    * stored-batch + fresh-delta composition loses nothing. Scale: the
    * speed scan's `ts >= watermark` predicate is exactly what a
    * date-partitioned events table prunes to a few partitions; history
    * cost is |MV|, not |raw|. */
  private lazy val mvLambdaServing = GraftQuery(
    "mv_lambda_serving",
    "lambda serving view: stored batch daily MV ∪ post-watermark speed layer",
    (s, d) => {
      import graft.functions.GraftFunctions.centi
      val speed = Tables.events(s, d)
        .filter(col("ts") >= lit("2024-01-25 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sum(centi(col("value"))).as("vcs"))
      batchDailyMv(s, d).withColumn("served_from", lit("batch"))
        .unionByName(speed.withColumn("served_from", lit("speed")))
        .select(col("event_type"), col("day"), col("n").as("n_events"),
          fround(col("vcs").cast("double") / 100.0, 2).as("total_value"),
          col("served_from"))
        .orderBy("event_type", "day")
    },
    Some("""WITH r AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events, floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total_value, CASE WHEN CAST(ts AS DATE) < DATE '2024-01-25' THEN 'batch' ELSE 'speed' END AS served_from FROM events GROUP BY 1, 2, 5) SELECT event_type, day, n_events, total_value, served_from FROM r ORDER BY 1, 2"""))

  /** RECURSIVE-HIERARCHY rollup — the engine's answer to WITH RECURSIVE
    * (which Spark SQL lacks): every customer is placed in a synthetic
    * containment hierarchy (parent = id div 10, roots are the single-digit
    * ids) and revenue rolls up to (root, depth). The traversal is POINTER
    * DOUBLING, fully declarative: three unrolled self-joins, each doubling
    * the ancestor distance (roots are 0-step fixpoints so distances sum
    * exactly), covering depth ≤ 8 — log₂(depth) keyed self-joins of a
    * node-sized table instead of a depth-long iteration; the same shape
    * scales to a billion-node hierarchy. The oracle IS DuckDB's native
    * WITH RECURSIVE — engine parity proven against the real thing.
    * Revenue joins on the customer key and aggregates map-side before the
    * tiny (root, depth) grid. */
  private lazy val sqlRecursiveHierarchy = GraftQuery(
    "sql_recursive_hierarchy",
    "pointer-doubling root/depth resolution + rollup vs WITH RECURSIVE",
    (s, d) => {
      val l1 = Tables.customer(s, d).select(
        col("c_custkey").as("id"),
        when(col("c_custkey") < 10, col("c_custkey"))
          .otherwise(expr("c_custkey div 10")).as("anc"),
        when(col("c_custkey") < 10, lit(0L)).otherwise(lit(1L)).as("dist"))
      def dbl(l: DataFrame): DataFrame =
        l.as("a").join(l.as("b"), col("a.anc") === col("b.id"))
          .select(col("a.id").as("id"), col("b.anc").as("anc"),
            (col("a.dist") + col("b.dist")).as("dist"))
      // each doubling level is memoized (kcoreEdges discipline): a naive
      // dbl(dbl(dbl(l1))) embeds 2^3−1 = 7 joins and scans the dimension
      // 8× — with per-level materialization the plan is 3 joins over
      // cached leaves (PlanQualitySpec pins the join count)
      val l2 = graft.PersistCache.getOrMaterialize(s, s"hier:l2:$d")(dbl(l1))
      val l4 = graft.PersistCache.getOrMaterialize(s, s"hier:l4:$d")(dbl(l2))
      val resolved = dbl(l4) // 2^3 = 8 >= max chain length
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("id"))
        .agg(count(lit(1)).as("n_ord"), sum(centi(col("o_totalprice"))).as("pc"))
      resolved.join(rev, Seq("id"), "left")
        .groupBy(col("anc").as("root"), col("dist").as("depth"))
        .agg(count(lit(1)).as("n_customers"),
          sum(coalesce(col("n_ord"), lit(0L))).as("n_orders"),
          fround(sum(coalesce(col("pc"), lit(0L))).cast("double") / 100.0, 2)
            .as("revenue"))
        .orderBy("root", "depth")
    },
    Some("""WITH RECURSIVE walk AS (SELECT c_custkey AS id, c_custkey AS cur, CAST(0 AS BIGINT) AS depth FROM customer UNION ALL SELECT id, cur // 10, depth + 1 FROM walk WHERE cur >= 10), res AS (SELECT id, cur AS root, depth FROM walk WHERE cur < 10), rev AS (SELECT o_custkey AS id, count(*) AS n_ord, sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS pc FROM orders GROUP BY 1) SELECT root, depth, count(*) AS n_customers, CAST(sum(coalesce(n_ord, 0)) AS BIGINT) AS n_orders, floor(CAST(sum(coalesce(pc, 0)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS revenue FROM res LEFT JOIN rev USING (id) GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Multimodal AUDIO-FEATURE shape: payload bytes read as unsigned 8-bit
    * PCM samples (the stub decode — text bytes stand in for a real
    * codec's output, same note as mm_decode_stats), cut into
    * non-overlapping 32-sample frames, per-frame energy Σ(s−64)² as an
    * EXACT integer, silence = energy under a fixed integer threshold.
    * Per clip: frame count, silent-frame count, total energy, RMS. This
    * is the windowed-feature-extraction plumbing (VAD, loudness
    * normalization) a real audio pipeline runs — swap the stub samples
    * for decoded PCM and nothing else changes. Scale: slice/aggregate
    * HOFs per row (no explode of the sample stream), one clip-keyed
    * rollup. */
  private lazy val mmAudioEnergy = GraftQuery(
    "mm_audio_energy",
    "multimodal: 32-sample frame energy + silence census per clip (stub PCM)",
    (s, d) => {
      val smp = filter(split(col("text"), ""), c => c =!= "")
      // interpreted array-HOF decode per row = this floor's hot loop; the
      // single-file scan gave it one task — spread (scale-gated identity
      // at real sizes) fans the clip pipeline across the session's cores
      val chars = Tables.spread(s,
          Tables.documents(s, d).select(col("doc_id").as("media_id"), col("text")),
          col("media_id"))
        .select(col("media_id"),
          transform(smp, c => ascii(c).cast("long")).as("smp"))
        .filter(size(col("smp")) >= 32)
      val framed = chars
        .select(col("media_id"), col("smp"),
          explode(sequence(lit(0L), expr("size(smp) div 32 - 1"))).as("w"))
        .select(col("media_id"),
          aggregate(slice(col("smp"), (col("w") * 32 + 1).cast("int"), lit(32)),
            lit(0L), (acc, x) => acc + (x - 64L) * (x - 64L)).as("e2"))
      framed.groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("e2") < 40000L, 1L).otherwise(0L)).as("n_silent"),
          sum("e2").as("total_e2"))
        .select(col("media_id"), col("n_frames"), col("n_silent"),
          col("total_e2"),
          fround(sqrt(col("total_e2").cast("double") /
            (col("n_frames") * 32).cast("double")), 4).as("mean_rms"))
        .orderBy("media_id")
    },
    Some("""WITH d AS (SELECT doc_id AS media_id, text, length(text) AS len FROM documents WHERE length(text) >= 32), fr0 AS (SELECT media_id, text, unnest(generate_series(0, len // 32 - 1)) AS w FROM d), fr AS (SELECT media_id, CAST(list_sum([(ord(substr(text, CAST(w * 32 + k AS INTEGER), 1)) - 64) * (ord(substr(text, CAST(w * 32 + k AS INTEGER), 1)) - 64) for k in generate_series(1, 32)]) AS BIGINT) AS e2 FROM fr0) SELECT media_id, count(*) AS n_frames, CAST(sum(CASE WHEN e2 < 40000 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent, CAST(sum(e2) AS BIGINT) AS total_e2, floor(sqrt(CAST(sum(e2) AS DOUBLE) / CAST(count(*) * 32 AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS mean_rms FROM fr GROUP BY 1 ORDER BY 1"""))

  /** FINGERPRINT-WIDTH collision audit: how many DISTINCT document texts
    * collide under truncated md5 fingerprints of 4/6/8 hex digits
    * (16/24/32 bits) — the birthday-bound measurement behind choosing a
    * dedup fingerprint width (a 100 TB corpus at 32 bits collides
    * constantly; this query shows the curve on real data instead of
    * assuming the formula). Per width: distinct texts, occupied buckets,
    * and texts lost to collisions (distinct_texts − buckets). One
    * distinct-text pass feeds all three widths. */
  private lazy val qaFingerprintCollisions = {
    val widths = Seq(4, 6, 8)
    GraftQuery(
      "qa_fingerprint_collision_audit",
      "distinct-text collisions under 16/24/32-bit truncated fingerprints",
      (s, d) => {
        val texts = Tables.documents(s, d)
          .select(md5(lower(col("text"))).as("fp")).distinct()
        val legs = widths.map { w =>
          texts.select(substring(col("fp"), 1, w).as("b"))
            .groupBy("b").agg(count(lit(1)).as("n"))
            .agg(sum("n").as("n_texts"), count(lit(1)).as("n_buckets"),
              sum(col("n") - 1).as("n_collided"))
            .select(lit(w * 4).as("bits"), col("n_texts"), col("n_buckets"),
              col("n_collided"))
        }
        legs.reduce(_.unionByName(_)).orderBy("bits")
      },
      Some("WITH t AS (SELECT DISTINCT md5(lower(text)) AS fp FROM documents) " +
        widths.map(w =>
          s"SELECT CAST(${w * 4} AS INTEGER) AS bits, CAST(sum(n) AS BIGINT) AS n_texts, count(*) AS n_buckets, CAST(sum(n - 1) AS BIGINT) AS n_collided FROM (SELECT substr(fp, 1, $w) AS b, count(*) AS n FROM t GROUP BY 1)")
          .mkString(" UNION ALL ") + " ORDER BY bits"))
  }

  /** SHOT-BOUNDARY detection over stub video — the frame-difference
    * segmentation every video-curation pipeline runs before sampling
    * training frames: "frames" are consecutive 16-byte windows of the
    * payload (the documents' UTF-8 bytes stand in for decoded frame
    * buffers, same as the audio stub), each frame's signature is its
    * exact byte sum, and a boundary fires where consecutive signatures
    * differ by > 200. Per-video shot census (count, longest, mean) folds
    * entirely inside the row — signatures, boundaries, and the
    * longest-shot scan are array HOFs over a split-once codes array
    * (the O(1)-indexing discipline txt_cdc_chunks documents), zero
    * shuffle before the final orderBy. */
  private val mmShotBoundary = GraftQuery(
    "mm_shot_boundary",
    "frame-diff shot segmentation census over stub video payloads",
    (s, d) => {
      val sum16 = (1 to 16)
        .map(j => s"element_at(codes, CAST(16 * k + $j AS INT))")
        .mkString(" + ")
      // same single-task-scan story as mm_audio_energy: the per-frame
      // signature HOFs dominate — spread before the heavy projection
      Tables.spread(s,
          Tables.documents(s, d)
            .select(col("doc_id").as("media_id"), col("text"),
              length(col("text")).cast("long").as("len"))
            .filter(col("len") >= 16),
          col("media_id"))
        .withColumn("nf", expr("len div 16"))
        .withColumn("codes",
          expr("transform(split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))"))
        .withColumn("sigs", expr(
          s"transform(sequence(CAST(0 AS BIGINT), nf - 1), k -> $sum16)"))
        .withColumn("bnds", expr(
          """filter(transform(sequence(CAST(1 AS BIGINT), nf - 1),
               t -> CASE WHEN abs(element_at(sigs, CAST(t AS INT) + 1) -
                              element_at(sigs, CAST(t AS INT))) > 200
                    THEN t END),
             x -> x IS NOT NULL)"""))
        .withColumn("max_run", expr(
          """aggregate(bnds,
               named_struct('prev', CAST(0 AS BIGINT), 'mx', CAST(0 AS BIGINT)),
               (acc, b) -> named_struct('prev', b, 'mx', greatest(acc.mx, b - acc.prev)),
               acc -> acc.mx)"""))
        .withColumn("last_b", coalesce(expr("try_element_at(bnds, -1)"), lit(0L)))
        .select(col("media_id"), col("nf").as("n_frames"),
          (size(col("bnds")) + 1).cast("long").as("n_shots"),
          greatest(col("max_run"), col("nf") - col("last_b")).as("longest_shot"),
          fround(col("nf").cast("double") /
            (size(col("bnds")) + 1), 4).as("mean_shot"))
        .orderBy("media_id")
    },
    Some {
      val sum16Sql = "list_sum(codes[16 * k + 1 : 16 * k + 16])"
      s"""WITH d AS (SELECT doc_id AS media_id, text, length(text) AS len FROM documents), f AS (SELECT media_id, len // 16 AS nf, list_transform(generate_series(1, len), i -> ord(substr(text, i, 1))) AS codes FROM d WHERE len >= 16), sg AS (SELECT media_id, nf, list_transform(generate_series(0, nf - 1), k -> CAST($sum16Sql AS BIGINT)) AS sigs FROM f), bd AS (SELECT media_id, nf, list_filter(list_transform(generate_series(1, nf - 1), t -> CASE WHEN abs(sigs[t + 1] - sigs[t]) > 200 THEN t END), x -> x IS NOT NULL) AS bnds FROM sg), st AS (SELECT media_id, nf, bnds, len(bnds) AS nb, CAST(list_max(list_transform(generate_series(1, len(bnds) + 1), i -> (CASE WHEN i <= len(bnds) THEN bnds[i] ELSE nf END) - (CASE WHEN i = 1 THEN 0 ELSE bnds[i - 1] END))) AS BIGINT) AS longest FROM bd) SELECT media_id, CAST(nf AS BIGINT) AS n_frames, CAST(nb + 1 AS BIGINT) AS n_shots, longest AS longest_shot, floor(CAST(nf AS DOUBLE) / (nb + 1) * 1e4 + 0.5) / 1e4 AS mean_shot FROM st ORDER BY media_id"""
    })

  val all: Seq[GraftQuery] = Seq(
    csvRoundtrip, jsonStruct, jsonInferred, dateConstruct, sqlMultikeyJoin,
    mvCascade, sqlCtas, mmDecode, partitionPruned, dppPrune, mmFrameSample,
    qaProfile, qaProfileHll, qaExpectations, scd2Merge, mvIncrementalAgg,
    qaTableChecksum, qaRefIntegrity, qaKeySkew, mvCompactCdc, qaCovMatrix,
    qaLabelGini, qaEquidepthHist, mmResize, scd2Asof, mmPhash,
    mvLambdaServing, sqlRecursiveHierarchy, mmAudioEnergy,
    qaFingerprintCollisions, mmShotBoundary)

  /** Time-travel READ over the SCD2 dimension — "the dimension as of
    * 2024-07-01": for each key, exactly the one version whose
    * [valid_from, valid_to) window contains the cutoff. The validity
    * filter rides the same narrow emit-versions pass as mv_scd2_merge
    * (no join); on a stored SCD2 table this is a filter the parquet scan
    * absorbs, which is the entire point of range-versioned dimensions —
    * temporal reads cost a scan, not a reconstruction. After the June
    * change, every %7 key must read PROMO at version 2. */
  private lazy val scd2Asof = GraftQuery(
    "mv_scd2_asof",
    "as-of read of the SCD2 dimension (state at 2024-07-01)",
    (s, d) => {
      val cut = lit("2024-07-01").cast("date")
      val changed = col("c_custkey") % 7 === 0
      val mk = (ver: Column, seg: Column, from: String, to: Column) =>
        struct(ver.as("version"), seg.as("segment"),
          lit(from).cast("date").as("valid_from"), to.as("valid_to"))
      Tables.customer(s, d)
        .select(col("c_custkey"),
          explode(when(changed, array(
              mk(lit(1), col("c_mktsegment"), "2024-01-01",
                lit("2024-06-01").cast("date")),
              mk(lit(2), lit("PROMO"), "2024-06-01",
                lit("9999-12-31").cast("date"))))
            .otherwise(array(
              mk(lit(1), col("c_mktsegment"), "2024-01-01",
                lit("9999-12-31").cast("date"))))).as("v"))
        .filter(col("v.valid_from") <= cut && cut < col("v.valid_to"))
        .select(col("c_custkey"), col("v.version").as("version"),
          col("v.segment").as("segment"))
        .orderBy("c_custkey")
    },
    Some("""WITH dim AS (SELECT c_custkey, c_mktsegment FROM customer), ch AS (SELECT c_custkey, 'PROMO' AS new_segment FROM dim WHERE c_custkey % 7 = 0), m AS (SELECT dim.c_custkey, dim.c_mktsegment, ch.new_segment FROM dim LEFT JOIN ch USING (c_custkey)), v AS (SELECT c_custkey, 1 AS version, c_mktsegment AS segment, DATE '2024-01-01' AS valid_from, CASE WHEN new_segment IS NOT NULL THEN DATE '2024-06-01' ELSE DATE '9999-12-31' END AS valid_to FROM m UNION ALL SELECT c_custkey, 2, new_segment, DATE '2024-06-01', DATE '9999-12-31' FROM m WHERE new_segment IS NOT NULL) SELECT c_custkey, version, segment FROM v WHERE valid_from <= DATE '2024-07-01' AND DATE '2024-07-01' < valid_to ORDER BY c_custkey"""))
}
