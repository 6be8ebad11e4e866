package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions.fround

/** Physical-DATA-LAYOUT advisory operators — the audits a lakehouse runs
  * before deciding how 100 TB gets laid out on disk: zone-map (min/max)
  * pruning effectiveness, Z-order vs linear clustering for 2-D
  * predicates, small-file compaction planning, and per-column encoding
  * choice. The reference's layout decisions are Cassandra clustering
  * keys (ref: data/create-timeseries.cql — `PRIMARY KEY ((wsid), year,
  * month, day, hour)` is exactly a hand-chosen sort layout); these
  * queries generalize that decision into measurable audits over the
  * parquet testdata.
  *
  * "Files" are simulated as contiguous key ranges of the natural
  * ingestion order (`l_orderkey div F`) — the same row-group granularity
  * parquet min/max statistics and Delta/Iceberg file stats operate on.
  * Every audit is two scans of the fact at most (one to build the
  * small zone/size table, one to count matches); the zone tables are
  * file-count-sized and always broadcast.
  */
object LayoutOps {

  /** ZONE-MAP PRUNING audit — for a set of ship-date windows, how many
    * simulated files does a min/max zone map let the scan skip, and what
    * read amplification (rows scanned / rows matched) remains? This is
    * the measurable form of "is this table laid out well for its
    * predicates": natural order correlates orderkey with orderdate but
    * only loosely with shipdate, so pruning is partial — exactly the
    * signal that triggers a re-clustering decision ([[relZorderLayout]]
    * quantifies the candidate fix). Plan: one agg builds the per-file
    * zone table (file-count-sized, broadcast), one fact×4-predicate
    * explode counts true matches; no shuffle touches fact-sized data
    * twice. */
  private val qaZonemapPruning = GraftQuery(
    "qa_zonemap_pruning",
    "min/max zone-map file-skip + read-amplification per date predicate",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select(
        expr("l_orderkey div 4096").as("f"),
        col("l_shipdate").cast("date").as("sd"))
      val zones = li.groupBy("f").agg(
        min("sd").as("zmin"), max("sd").as("zmax"),
        count(lit(1)).as("nrows"))
      val preds = Seq(
        (1, "1997-01-01", "1997-04-01"), (2, "1997-04-01", "1997-07-01"),
        (3, "1997-07-01", "1997-10-01"), (4, "1997-10-01", "1998-01-01"))
        .toDF("pid", "lo", "hi")
        .select(col("pid"), col("lo").cast("date").as("lo"),
          col("hi").cast("date").as("hi"))
      val flags = zones.crossJoin(broadcast(preds))
        .withColumn("scanned", col("zmin") < col("hi") && col("zmax") >= col("lo"))
        .groupBy("pid").agg(
          count(lit(1)).as("files_total"),
          sum(when(col("scanned"), 1L).otherwise(0L)).as("files_scanned"),
          sum(when(col("scanned"), col("nrows")).otherwise(0L)).as("rows_scanned"))
      val matched = li.crossJoin(broadcast(preds))
        .filter(col("sd") >= col("lo") && col("sd") < col("hi"))
        .groupBy("pid").agg(count(lit(1)).as("rows_matched"))
      flags.join(matched, Seq("pid"))
        .select(col("pid"), col("files_scanned"), col("files_total"),
          col("rows_scanned"), col("rows_matched"),
          fround(col("rows_scanned").cast("double") /
            greatest(col("rows_matched"), lit(1L)), 4).as("read_amp"))
        .orderBy("pid")
    },
    Some("""WITH li AS (SELECT l_orderkey // 4096 AS f, CAST(l_shipdate AS DATE) AS sd FROM lineitem), zones AS (SELECT f, min(sd) AS zmin, max(sd) AS zmax, CAST(count(*) AS BIGINT) AS nrows FROM li GROUP BY 1), preds AS (SELECT * FROM (VALUES (1, DATE '1997-01-01', DATE '1997-04-01'), (2, DATE '1997-04-01', DATE '1997-07-01'), (3, DATE '1997-07-01', DATE '1997-10-01'), (4, DATE '1997-10-01', DATE '1998-01-01')) AS t(pid, lo, hi)), flags AS (SELECT pid, CAST(count(*) AS BIGINT) AS files_total, CAST(sum(CASE WHEN zmin < hi AND zmax >= lo THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned, CAST(sum(CASE WHEN zmin < hi AND zmax >= lo THEN nrows ELSE 0 END) AS BIGINT) AS rows_scanned FROM zones, preds GROUP BY 1), mt AS (SELECT pid, CAST(count(*) AS BIGINT) AS rows_matched FROM li, preds WHERE sd >= lo AND sd < hi GROUP BY 1) SELECT pid, files_scanned, files_total, rows_scanned, rows_matched, floor(CAST(rows_scanned AS DOUBLE) / greatest(rows_matched, 1) * 1e4 + 0.5) / 1e4 AS read_amp FROM flags JOIN mt USING (pid) ORDER BY pid"""))

  /** Z-ORDER vs LINEAR layout comparison — the "should we OPTIMIZE
    * ZORDER BY (partkey, shipdate)" decision, answered with numbers:
    * both dims are scaled to an 8-bit grid, the Morton code interleaves
    * their bits (spelled as exact integer div/mod arithmetic so both
    * engines compute the identical code), and 64 files are cut either
    * linearly (by date) or by Z-value range. For three 2-D predicate
    * boxes the audit reports files scanned and read amplification under
    * each layout: the linear layout cannot prune a partkey-only box at
    * all, the Z-order layout prunes BOTH dims at √-resolution each —
    * the classic multi-dimensional clustering trade. Matched counts are
    * layout-independent (computed once). Scale: the fact is scanned
    * twice (once per layout's zone build) + once for match counts; zone
    * and box tables are tiny and broadcast. */
  private val relZorderLayout = GraftQuery(
    "rel_zorder_layout",
    "Morton/Z-order vs linear file layout: 2-D box pruning audit",
    (s, d) => {
      import s.implicits._
      // belt-and-suspenders: graft_zvalue must resolve even on a session
      // built without GraftExtensions (same pattern as SimilarityOps)
      graft.functions.expressions.GraftExpressions.ensureRegistered(s)
      val base0 = Tables.lineitem(s, d).select(
        col("l_partkey").as("pk"), col("l_shipdate").cast("date").as("sd"))
      val mm = base0.agg(min("pk").as("pkmin"), max("pk").as("pkmax"),
        min("sd").as("sdmin"), max("sd").as("sdmax"))
      val base = base0.crossJoin(broadcast(mm)).select(
        expr("((pk - pkmin) * 255) div (pkmax - pkmin)").as("px"),
        expr("CAST((datediff(sd, sdmin) * 255) div datediff(sdmax, sdmin) AS BIGINT)")
          .as("dyb"))
      // the native codegen'd Morton primitive (MortonZ); the oracle
      // spells the identical interleave as div/mod arithmetic
      val zed = base.withColumn("z", expr("graft_zvalue(px, dyb)"))
      // one pass over the Morton pipeline: explode each row into its two
      // (layout, file) assignments AFTER z is computed, instead of a
      // union that would re-run the scan + bit-interleave per leg
      val fl = zed.select(col("px"), col("dyb"),
          explode(array(
            struct(lit("linear").as("layout"), expr("dyb div 4").as("f")),
            struct(lit("zorder").as("layout"), expr("z div 1024").as("f"))))
            .as("lf"))
        .select(col("px"), col("dyb"), col("lf.layout").as("layout"),
          col("lf.f").as("f"))
      val zones = fl.groupBy("layout", "f").agg(
        min("px").as("pxmin"), max("px").as("pxmax"),
        min("dyb").as("dymin"), max("dyb").as("dymax"),
        count(lit(1)).as("nrows"))
      val boxes = Seq((1, 0, 63, 0, 255), (2, 100, 151, 100, 151),
        (3, 0, 255, 40, 87)).toDF("box", "pxlo", "pxhi", "dylo", "dyhi")
      val hit = col("pxmin") <= col("pxhi") && col("pxmax") >= col("pxlo") &&
        col("dymin") <= col("dyhi") && col("dymax") >= col("dylo")
      val flags = zones.crossJoin(broadcast(boxes))
        .groupBy("layout", "box").agg(
          count(lit(1)).as("files_total"),
          sum(when(hit, 1L).otherwise(0L)).as("files_scanned"),
          sum(when(hit, col("nrows")).otherwise(0L)).as("rows_scanned"))
      val mt = base.crossJoin(broadcast(boxes))
        .filter(col("px").between(col("pxlo"), col("pxhi")) &&
          col("dyb").between(col("dylo"), col("dyhi")))
        .groupBy("box").agg(count(lit(1)).as("rows_matched"))
      flags.join(mt, Seq("box"))
        .select(col("layout"), col("box"), col("files_scanned"),
          col("files_total"), col("rows_scanned"), col("rows_matched"),
          fround(col("rows_scanned").cast("double") /
            greatest(col("rows_matched"), lit(1L)), 4).as("read_amp"))
        .orderBy("layout", "box")
    },
    Some("""WITH base0 AS (SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS sd FROM lineitem), mm AS (SELECT min(pk) AS pkmin, max(pk) AS pkmax, min(sd) AS sdmin, max(sd) AS sdmax FROM base0), base AS (SELECT ((pk - pkmin) * 255) // (pkmax - pkmin) AS px, (date_diff('day', sdmin, sd) * 255) // date_diff('day', sdmin, sdmax) AS dyb FROM base0, mm), zed AS (SELECT px, dyb, CAST(list_sum(list_transform(generate_series(0, 7), i -> (((px // (1<<i)) % 2) + 2 * ((dyb // (1<<i)) % 2)) * (1<<(2*i)))) AS BIGINT) AS z FROM base), fl AS (SELECT px, dyb, 'linear' AS layout, dyb // 4 AS f FROM zed UNION ALL SELECT px, dyb, 'zorder', zed.z // 1024 FROM zed), zones AS (SELECT layout, f, min(px) AS pxmin, max(px) AS pxmax, min(dyb) AS dymin, max(dyb) AS dymax, CAST(count(*) AS BIGINT) AS nrows FROM fl GROUP BY 1, 2), boxes AS (SELECT * FROM (VALUES (1, 0, 63, 0, 255), (2, 100, 151, 100, 151), (3, 0, 255, 40, 87)) AS t(box, pxlo, pxhi, dylo, dyhi)), flags AS (SELECT layout, box, CAST(count(*) AS BIGINT) AS files_total, CAST(sum(CASE WHEN pxmin <= pxhi AND pxmax >= pxlo AND dymin <= dyhi AND dymax >= dylo THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned, CAST(sum(CASE WHEN pxmin <= pxhi AND pxmax >= pxlo AND dymin <= dyhi AND dymax >= dylo THEN nrows ELSE 0 END) AS BIGINT) AS rows_scanned FROM zones, boxes GROUP BY 1, 2), mt AS (SELECT box, CAST(count(*) AS BIGINT) AS rows_matched FROM base, boxes WHERE px BETWEEN pxlo AND pxhi AND dyb BETWEEN dylo AND dyhi GROUP BY 1) SELECT layout, box, files_scanned, files_total, rows_scanned, rows_matched, floor(CAST(rows_scanned AS DOUBLE) / greatest(rows_matched, 1) * 1e4 + 0.5) / 1e4 AS read_amp FROM flags JOIN mt USING (box) ORDER BY layout, box"""))

  /** SMALL-FILE COMPACTION plan — the OPTIMIZE/bin-packing step every
    * lakehouse table needs: pack contiguous small files (simulated as
    * `l_orderkey div 1024` ranges) into target-capacity bins by
    * cumulative-sum split (bin = running-rows-before div capacity — the
    * deterministic, order-preserving assignment; contiguity keeps the
    * zone maps of the compacted output as tight as the input's). Output
    * is the per-bin manifest: file span, file count, rows, fill ratio
    * vs the 16 384-row target. The only window runs over the per-FILE
    * size table (file-count-sized, one partition of a few hundred rows
    * — at 100 TB this is the table-metadata scan, not a data scan). */
  private val relCompactionPlan = GraftQuery(
    "rel_compaction_plan",
    "cumulative bin-packing compaction manifest for small key-range files",
    (s, d) => {
      val cap = 16384L
      val files = Tables.lineitem(s, d)
        .groupBy(expr("l_orderkey div 1024").as("f"))
        .agg(count(lit(1)).as("nrows"))
      val w = Window.orderBy("f")
      val binned = files
        .withColumn("cum", sum("nrows").over(w))
        .withColumn("bin", expr(s"(cum - nrows) div $cap"))
      binned.groupBy("bin").agg(
          min("f").as("first_file"), max("f").as("last_file"),
          count(lit(1)).as("n_files"), sum("nrows").as("rows"))
        .select(col("bin"), col("first_file"), col("last_file"),
          col("n_files"), col("rows"),
          fround(col("rows").cast("double") / cap, 4).as("fill_ratio"))
        .orderBy("bin")
    },
    Some("""WITH files AS (SELECT l_orderkey // 1024 AS f, CAST(count(*) AS BIGINT) AS nrows FROM lineitem GROUP BY 1), b AS (SELECT f, nrows, CAST(sum(nrows) OVER (ORDER BY f) AS BIGINT) AS cum FROM files) SELECT (cum - nrows) // 16384 AS bin, min(f) AS first_file, max(f) AS last_file, CAST(count(*) AS BIGINT) AS n_files, CAST(sum(nrows) AS BIGINT) AS rows, floor(CAST(sum(nrows) AS DOUBLE) / 16384 * 1e4 + 0.5) / 1e4 AS fill_ratio FROM b GROUP BY 1 ORDER BY 1"""))

  /** Per-column ENCODING ADVISOR — the ANALYZE-style read that decides
    * parquet/ORC encodings: exact NDV, mean run length in the natural
    * file order, and the standard decision rule (low NDV + long runs →
    * RLE over a dictionary; low NDV → dictionary; NDV comparable to row
    * count → plain). ALL SIX columns share one pass: a single keyed
    * window (one shuffle — (ok, ln) is not unique in the driver
    * testdata, so the six advised columns complete the sort key into a
    * total order both engines replay identically; equal-value ties never
    * split a run) emits every column's run-break flag, then ONE
    * aggregate carries the six sums + six exact countDistincts and a
    * stack() unpivots the summary. The multi-countDistinct Expand
    * multiplies the agg input 6× — at 100 TB run the shipped HLL twin
    * [[qaEncodingAdvisorHll]] instead (the qa_column_profile_hll
    * precedent); the run census is already scale-shaped (per-file
    * windows, never a global sort). */
  private val qaEncodingAdvisor = GraftQuery(
    "qa_encoding_advisor",
    "NDV + run-length scan per column with an encoding recommendation",
    (s, d) => {
      val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate",
        "l_quantity", "l_suppkey", "l_extendedprice")
      val li = Tables.lineitem(s, d).select(
        expr("l_orderkey div 4096").as("f") +: col("l_orderkey").as("ok") +:
          col("l_linenumber").as("ln") +: cols.map(col): _*)
      val w = Window.partitionBy("f")
        .orderBy(col("ok") +: col("ln") +: cols.map(col): _*)
      // spread keyed on f: HashPartitioning(f, cores) SATISFIES the
      // window's ClusteredDistribution(f), so the per-file window, the
      // run flags, and the NDV aggregate's partial stage all run at the
      // session's width instead of the latency-profile shuffle width the
      // single-task scan fed them at (scale-gated identity at real sizes)
      val liW = Tables.spread(s, li, col("f"))
      val withBrk = cols.foldLeft(liW)((df, c) =>
        df.withColumn(s"brk_$c",
          when(lag(col(c), 1).over(w).isNull ||
            lag(col(c), 1).over(w) =!= col(c), 1L).otherwise(0L)))
      val aggCols = cols.flatMap(c => Seq(
        sum(s"brk_$c").as(s"runs_$c"), countDistinct(col(c)).as(s"ndv_$c")))
      val agg = withBrk.agg(count(lit(1)).as("n"), aggCols: _*)
      agg.selectExpr("n",
          s"stack(${cols.size}, " +
            cols.map(c => s"'$c', ndv_$c, runs_$c").mkString(", ") +
            ") AS (colname, ndv, n_runs)")
        .select(col("colname").as("column"), col("n"), col("ndv"),
          fround(col("n").cast("double") / col("n_runs"), 4).as("mean_run"),
          when(col("ndv") <= 64 &&
              col("n").cast("double") / col("n_runs") >= 2.0, "RLE_DICT")
            .when(col("ndv") <= 64, "DICT")
            .when(col("ndv") * 2 > col("n"), "PLAIN")
            .otherwise("DICT").as("advice"))
        .orderBy("column")
    },
    Some {
      val all = Seq("l_returnflag", "l_linestatus", "l_shipdate",
        "l_quantity", "l_suppkey", "l_extendedprice")
      val ord = "ok, ln, " + all.mkString(", ")
      def cte(c: String) =
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n, CAST(count(DISTINCT v) AS BIGINT) AS ndv, floor(CAST(count(*) AS DOUBLE) / sum(brk) * 1e4 + 0.5) / 1e4 AS mean_run, CASE WHEN count(DISTINCT v) <= 64 AND CAST(count(*) AS DOUBLE) / sum(brk) >= 2.0 THEN 'RLE_DICT' WHEN count(DISTINCT v) <= 64 THEN 'DICT' WHEN count(DISTINCT v) * 2 > count(*) THEN 'PLAIN' ELSE 'DICT' END AS advice FROM (SELECT CASE WHEN lag(v) OVER (PARTITION BY f ORDER BY $ord) IS NULL OR lag(v) OVER (PARTITION BY f ORDER BY $ord) <> v THEN 1 ELSE 0 END AS brk, v FROM (SELECT l_orderkey // 4096 AS f, l_orderkey AS ok, l_linenumber AS ln, ${all.mkString(", ")}, $c AS v FROM lineitem))"""
      all.map(cte).mkString("", " UNION ALL ", " ORDER BY \"column\"")
    })

  /** The scale-safe twin of [[qaEncodingAdvisor]]: identical run-length
    * census (the keyed per-file window is already the 100 TB shape), but
    * the six exact countDistincts — whose one-agg spelling compiles to an
    * Expand replicating the scan ×6 into the distinct shuffle — become
    * six `approx_count_distinct` HLL++ sketches in ONE partial-aggregable
    * pass: sketches merge map-side, no Expand, nothing but sketch bytes
    * cross the wire. Advisory sweeps at scale run THIS one; the exact
    * twin stays as the DuckDB-oracled anchor. No SQL oracle (HLL
    * estimates are engine-specific); Round11OpsSpec bounds every NDV
    * estimate within 5% of the exact anchor's and pins all non-NDV
    * columns identical. */
  private val qaEncodingAdvisorHll = GraftQuery(
    "qa_encoding_advisor_hll",
    "scale-safe encoding advisor: HLL NDV sketches + exact run census, no Expand",
    (s, d) => {
      val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate",
        "l_quantity", "l_suppkey", "l_extendedprice")
      val li = Tables.lineitem(s, d).select(
        expr("l_orderkey div 4096").as("f") +: col("l_orderkey").as("ok") +:
          col("l_linenumber").as("ln") +: cols.map(col): _*)
      val w = Window.partitionBy("f")
        .orderBy(col("ok") +: col("ln") +: cols.map(col): _*)
      // NO spread here (unlike the exact twin): without the Expand the
      // extra exchange outweighs the wider window stage (measured
      // neutral-to-worse), and the scale-safe twin keeps the minimal plan
      val withBrk = cols.foldLeft(li)((df, c) =>
        df.withColumn(s"brk_$c",
          when(lag(col(c), 1).over(w).isNull ||
            lag(col(c), 1).over(w) =!= col(c), 1L).otherwise(0L)))
      val aggCols = cols.flatMap(c => Seq(
        sum(s"brk_$c").as(s"runs_$c"),
        // rsd 0.03 — the qa_column_profile_hll-calibrated register
        // budget: ~1% observed error against the 5% spec bound
        approx_count_distinct(col(c), 0.03).as(s"ndv_$c")))
      val agg = withBrk.agg(count(lit(1)).as("n"), aggCols: _*)
      agg.selectExpr("n",
          s"stack(${cols.size}, " +
            cols.map(c => s"'$c', ndv_$c, runs_$c").mkString(", ") +
            ") AS (colname, ndv, n_runs)")
        .select(col("colname").as("column"), col("n"), col("ndv"),
          fround(col("n").cast("double") / col("n_runs"), 4).as("mean_run"),
          when(col("ndv") <= 64 &&
              col("n").cast("double") / col("n_runs") >= 2.0, "RLE_DICT")
            .when(col("ndv") <= 64, "DICT")
            .when(col("ndv") * 2 > col("n"), "PLAIN")
            .otherwise("DICT").as("advice"))
        .orderBy("column")
    },
    None, boundedBy = Some("Round11OpsSpec"))

  val all: Seq[GraftQuery] = Seq(
    qaZonemapPruning, relZorderLayout, relCompactionPlan, qaEncodingAdvisor,
    qaEncodingAdvisorHll)
}
