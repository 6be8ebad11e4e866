package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions._

/** Training-data pipeline operators beyond round 1's dedup/similarity/text
  * families: deterministic corpus splitting, vector-column profiling,
  * funnel/mode analytics, and calendar gap-fill — the everyday verbs of a
  * large-scale data-curation pipeline, each shaped to scale:
  *
  *  - hash-split: a pure narrow map (md5 of the key), no shuffle at all —
  *    the industry-standard way to carve train/val/test out of 100 TB
  *    without a global sample or sort. Stable under corpus growth: a doc's
  *    split never changes when other docs are added.
  *  - vector profiling: per-row higher-order array functions (no explode —
  *    an explode would multiply the shuffle by the vector dimension).
  *  - funnel: ONE conditional aggregation pass over events (min-timestamp
  *    funnel), not a self-join per stage.
  *  - gap-fill: the grid is generated (sequence × distinct keys), the fill
  *    is one window shuffle on the series key.
  *
  * Determinism: every compared value is integer-derived (md5 nibbles,
  * centi-units, unix micros) with `fround` floor-rounding; ties always
  * break on a unique key. See GraftFunctions.
  */
object PipelineOps {

  import graft.functions.GraftFunctions.{md5u32, md5u32Sql}

  private val uSql = md5u32Sql("h")

  /** Deterministic train/val/test split by content-independent key hash
    * (80/10/10). The split is a property of the doc_id alone: reproducible
    * across runs, engines, and corpus growth, with zero shuffle — the
    * aggregation here just summarizes the three buckets for verification. */
  private val sampHashSplit = GraftQuery(
    "samp_hash_split",
    "deterministic md5 train/val/test split (80/10/10) of the corpus",
    (s, d) => Tables.documents(s, d)
      .withColumn("m", md5u32(col("doc_id").cast("string")) % 10)
      .withColumn("split",
        when(col("m") <= 7, "train").when(col("m") === 8, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("split"),
    Some(s"""WITH u AS (SELECT doc_id, n_chars, $uSql % 10 AS m FROM (SELECT doc_id, n_chars, md5(doc_id::VARCHAR) AS h FROM documents)), sp AS (SELECT CASE WHEN m <= 7 THEN 'train' WHEN m = 8 THEN 'val' ELSE 'test' END AS split, doc_id, n_chars FROM u) SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars, min(doc_id) AS min_id, max(doc_id) AS max_id FROM sp GROUP BY 1 ORDER BY 1"""))

  /** LEAKAGE-SAFE split — the fix for the eval-contamination failure mode
    * a plain per-doc hash split has: near-duplicate documents land on
    * BOTH sides of a train/test boundary, so the test set silently
    * contains paraphrases of training docs. Here the split unit is the
    * near-dup COMPONENT (DedupOps' verified-Jaccard connected components):
    * grp = component label when the doc is in one, else its own doc_id,
    * and the md5 split decision hashes grp — every member of a component
    * shares a side by construction. Output is the per-split audit summary
    * (docs, distinct groups, chars, how many docs were cluster-bound).
    *
    * Scale shape: the component label table is pair-bounded (near-dup
    * nodes only), so it BROADCASTS into the corpus scan; the split is then
    * a narrow map exactly like samp_hash_split, and the summary is one
    * map-side-combined aggregation. The single countDistinct is over grp
    * within 3 split groups — a two-stage partial distinct, no Expand. */
  private val sampClusterSplit = GraftQuery(
    "samp_cluster_split",
    "leakage-safe 80/10/10 split: near-dup components stay on one side",
    (s, d) => {
      val lbl = DedupOps.componentLabels(s, d).withColumnRenamed("id", "doc_id")
      Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        .join(broadcast(lbl), Seq("doc_id"), "left")
        .withColumn("grp", coalesce(col("comp"), col("doc_id")))
        .withColumn("m", md5u32(col("grp").cast("string")) % 10)
        .withColumn("split",
          when(col("m") <= 7, "train").when(col("m") === 8, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("grp").as("n_groups"),
          sum("n_chars").as("sum_chars"),
          sum(when(col("comp").isNotNull, 1L).otherwise(0L)).as("n_clustered"))
        .orderBy("split")
    },
    Some(DedupOps.ngramPairsCte + DedupOps.componentsCtes +
      s""", g AS (SELECT d.doc_id, d.n_chars, m.comp, coalesce(m.comp, d.doc_id) AS grp FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id), sp AS (SELECT comp, n_chars, grp, ${md5u32Sql("md5(CAST(grp AS VARCHAR))")} % 10 AS md FROM g) SELECT CASE WHEN md <= 7 THEN 'train' WHEN md = 8 THEN 'val' ELSE 'test' END AS split, count(*) AS n_docs, CAST(count(DISTINCT grp) AS BIGINT) AS n_groups, CAST(sum(n_chars) AS BIGINT) AS sum_chars, CAST(sum(CASE WHEN comp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered FROM sp GROUP BY 1 ORDER BY 1"""))

  /** Per-vector profile via higher-order array functions — dimension,
    * range, mean, positive-component count — all computed inside the row
    * (no explode: an explode would fan each row into `dim` shuffle rows).
    * The mean is an exact integer micro-unit fold, so Spark's sequential
    * `aggregate` equals DuckDB's list_sum bit-for-bit. */
  private val arrHofStats = GraftQuery(
    "arr_hof_stats",
    "per-vector array HOF profile: dim, min/max, exact-integer mean, n_pos",
    (s, d) => {
      val v = vecDouble(col("embedding"))
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        size(filter(v, x => x > 0.0)).as("n_pos"),
        fround(array_min(v), 6).as("vmin"),
        fround(array_max(v), 6).as("vmax"),
        fround(
          aggregate(v, lit(0L), (acc, x) => acc + floor(x * 1e6 + 0.5).cast("long"))
            .cast("double") / size(col("embedding")) / 1e6, 6).as("vmean"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings) SELECT vec_id, CAST(len(v) AS INTEGER) AS dim, CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos, floor(list_min(v) * 1e6 + 0.5) / 1e6 AS vmin, floor(list_max(v) * 1e6 + 0.5) / 1e6 AS vmax, floor(CAST(CAST(list_sum(list_transform(v, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT))) AS BIGINT) AS DOUBLE) / len(v) / 1e6 * 1e6 + 0.5) / 1e6 AS vmean FROM e ORDER BY vec_id"""))

  /** STRICT-ordering conversion funnel signup → view → purchase: each
    * stage's timestamp is the first occurrence AFTER the previous stage
    * (v = min view with ts > s, p = min purchase with ts > v), so a view
    * that happened only before signup does not count as progression — the
    * semantic skew the earlier min-per-type formulation had. The chain of
    * three same-key windows is ONE shuffle on user_id (Catalyst stacks the
    * Window execs on a single exchange); the final rollup rides the same
    * partitioning. */
  private val evtFunnel = GraftQuery(
    "evt_funnel",
    "strict conversion funnel (signup->view->purchase, stage-ordered firsts)",
    (s, d) => {
      val w = Window.partitionBy("user_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        .withColumn("s", min(when(col("event_type") === "signup", col("us"))).over(w))
        .withColumn("v", min(when(col("event_type") === "view" && col("us") > col("s"), col("us"))).over(w))
        .withColumn("p", min(when(col("event_type") === "purchase" && col("us") > col("v"), col("us"))).over(w))
        .groupBy("user_id")
        .agg(min("s").as("s"), min("v").as("v"), min("p").as("p"))
        .withColumn("stage",
          when(col("s").isNull, 0)
            .when(col("v").isNull, 1)
            .when(col("p").isNull, 2)
            .otherwise(3))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_users"),
          fround(sum(when(col("stage") === 3, col("p") - col("s")))
            .cast("double") / 1e6, 3).as("conv_total_s"))
        .orderBy("stage")
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events), w1 AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN us END) OVER (PARTITION BY user_id) AS s FROM e), w2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND us > s THEN us END) OVER (PARTITION BY user_id) AS v FROM w1), w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > v THEN us END) OVER (PARTITION BY user_id) AS p FROM w2), u AS (SELECT user_id, min(s) AS s, min(v) AS v, min(p) AS p FROM w3 GROUP BY 1), st AS (SELECT *, CASE WHEN s IS NULL THEN 0 WHEN v IS NULL THEN 1 WHEN p IS NULL THEN 2 ELSE 3 END AS stage FROM u) SELECT stage, count(*) AS n_users, floor(CAST(sum(CASE WHEN stage = 3 THEN p - s END) AS DOUBLE) / 1e6 * 1000.0 + 0.5) / 1000.0 AS conv_total_s FROM st GROUP BY 1 ORDER BY 1"""))

  /** Mode (most frequent value) per group: count then rank, ties broken
    * lexicographically. Two keyed shuffles (user×type counts, then the
    * per-user argmax window); the window input is already one row per
    * (user, type) — tiny relative to the event stream. */
  private val aggMode = GraftQuery(
    "agg_mode",
    "per-user modal event_type (most frequent, ties lexicographic)",
    (s, d) => {
      val cnt = Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id").orderBy(col("n").desc, col("event_type"))
      cnt.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
        .orderBy("user_id")
    },
    Some("""WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2), r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn FROM c) SELECT user_id, event_type AS mode_type, n FROM r WHERE rn = 1 ORDER BY user_id"""))

  /** Calendar gap-fill + forward-fill: generate the full per-user daily
    * grid over the corpus date span (sequence × distinct keys — generated,
    * never shuffled), left-join the observed daily aggregate, and carry the
    * last observation forward with an IGNORE NULLS running window. The fill
    * is ONE window shuffle on the series key. Values are centi-ints so the
    * filled series is bit-identical across engines. */
  private val calGapFill = GraftQuery(
    "cal_gap_fill",
    "daily grid gap-fill + forward-fill (last observation carried forward)",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), to_date(col("ts")).as("day"), centi(col("value")).as("vc"))
      val daily = ev.groupBy("user_id", "day").agg(max("vc").as("dmax"))
      val span = Tables.events(s, d)
        .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      val grid = ev.select("user_id").distinct()
        .crossJoin(span)
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          fround(last("dmax", ignoreNulls = true).over(w).cast("double") / 100.0, 2)
            .as("value_ff"),
          col("dmax").isNull.as("was_gap"))
        .orderBy("user_id", "day")
    },
    Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, CAST(round(value * 100) AS BIGINT) AS vc FROM events WHERE user_id < 20), daily AS (SELECT user_id, day, max(vc) AS dmax FROM ev GROUP BY 1, 2), span AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events), days AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM span), grid AS (SELECT u.user_id, d.day FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN days d), j AS (SELECT g.user_id, g.day, daily.dmax FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.day = daily.day), f AS (SELECT user_id, day, dmax, last_value(dmax IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING) AS ff FROM j) SELECT user_id, day, floor(CAST(ff AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS value_ff, dmax IS NULL AS was_gap FROM f ORDER BY user_id, day"""))

  /** Linear interpolation over the same daily grid — the resample mode for
    * continuous measures (LOCF above is the mode for state-like measures).
    * Each gap day takes v_prev + (v_next - v_prev) * elapsed/total between
    * its bracketing observations; rows outside the observed range fall back
    * to the nearest observation. Window-only: two passes over one keyed
    * shuffle's output (backward-looking last + forward-looking first), no
    * join back to the observations. The interpolation arithmetic is exact
    * centi integers until a single double division, so both engines agree
    * bit-for-bit. */
  private val calInterpolate = GraftQuery(
    "cal_interpolate",
    "daily grid linear interpolation between bracketing observations",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), to_date(col("ts")).as("day"), centi(col("value")).as("vc"))
      val daily = ev.groupBy("user_id", "day").agg(max("vc").as("dmax"))
      val span = Tables.events(s, d)
        .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      val grid = ev.select("user_id").distinct()
        .crossJoin(span)
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val back = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsDay = when(col("dmax").isNotNull, col("day"))
      val joined = grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"), col("dmax"),
          last(col("dmax"), ignoreNulls = true).over(back).as("pv"),
          last(obsDay, ignoreNulls = true).over(back).as("pd"),
          first(col("dmax"), ignoreNulls = true).over(fwd).as("nv"),
          first(obsDay, ignoreNulls = true).over(fwd).as("nd"))
      joined.select(col("user_id"), col("day"),
          fround(
            when(col("pv").isNull, col("nv").cast("double"))
              .when(col("nv").isNull, col("pv").cast("double"))
              .when(col("nd") === col("pd"), col("pv").cast("double"))
              .otherwise(col("pv").cast("double") +
                (col("nv") - col("pv")).cast("double") *
                  datediff(col("day"), col("pd")) /
                  datediff(col("nd"), col("pd"))) / 100.0, 4).as("value_li"),
          col("dmax").isNull.as("was_gap"))
        .orderBy("user_id", "day")
    },
    Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, CAST(round(value * 100) AS BIGINT) AS vc FROM events WHERE user_id < 20), daily AS (SELECT user_id, day, max(vc) AS dmax FROM ev GROUP BY 1, 2), span AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events), days AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM span), grid AS (SELECT u.user_id, d.day FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN days d), j AS (SELECT g.user_id, g.day, daily.dmax FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.day = daily.day), wnd AS (SELECT user_id, day, dmax, last_value(dmax IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING) AS pv, last_value(CASE WHEN dmax IS NOT NULL THEN day END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING) AS pd, first_value(dmax IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv, first_value(CASE WHEN dmax IS NOT NULL THEN day END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd FROM j) SELECT user_id, day, floor((CASE WHEN pv IS NULL THEN CAST(nv AS DOUBLE) WHEN nv IS NULL THEN CAST(pv AS DOUBLE) WHEN nd = pd THEN CAST(pv AS DOUBLE) ELSE CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE) * date_diff('day', pd, day) / date_diff('day', pd, nd) END) / 100.0 * 10000.0 + 0.5) / 10000.0 AS value_li, dmax IS NULL AS was_gap FROM wnd ORDER BY user_id, day"""))

  /** Sequence packing — the pretraining "concatenate-then-chunk" step
    * that turns ragged documents into fixed-token-budget training rows.
    * Each document's bin is the chunk its STARTING OFFSET falls in within
    * its source shard's concatenation order (cumsum of token counts over
    * doc_id order): pure integer window arithmetic, so both engines place
    * every document identically. Scale shape: one shuffle on source, the
    * running sum stays inside each shard's partition, and the per-bin
    * rollup reuses the same key prefix — no global sort, no driver state.
    * (A boundary-splitting packer additionally slices the straddling doc;
    * the bin assignment — the distributed part — is identical.) */
  private val pipePack = GraftQuery(
    "pipe_pack_sequences",
    "pack docs into 512-token bins per source shard (cumsum window, integer-exact)",
    (s, d) => {
      val budget = 512L
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).cast("long").as("ntok"))
        .withColumn("cum", sum("ntok").over(w))
        .withColumn("bin", floor((col("cum") - col("ntok")) / budget).cast("long"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("sum_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("source", "bin")
    },
    Some("""WITH t AS (SELECT doc_id, source, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ntok FROM documents), c AS (SELECT doc_id, source, ntok, CAST(sum(ntok) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t) SELECT source, CAST(floor((cum - ntok) / 512.0) AS BIGINT) AS bin, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS sum_tokens, min(doc_id) AS first_doc, max(doc_id) AS last_doc FROM c GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Domain-mixture reweighting: the static sampling weight per source
    * that equalizes token share (weight = target_share / actual_share,
    * target = uniform). The corpus-wide totals come from an unpartitioned
    * window over the PER-SOURCE aggregate — ~#sources rows, so the single
    * partition is trivially safe AND the documents scan happens exactly
    * once (a separate total aggregate cross-joined back would re-run the
    * scan+agg lineage: the DataFrame API does not reuse subplans). Weight
    * is an exact-integer ratio, floor-rounded identically in both
    * engines. */
  private val pipeMixWeights = GraftQuery(
    "pipe_mix_weights",
    "per-source mixture weights to equalize token share (uniform target)",
    (s, d) => {
      // unpartitioned on purpose: runs over the ~#sources-row aggregate,
      // not the corpus — audited benign (see QuietLogs)
      val w = Window.partitionBy()
      Tables.documents(s, d)
        .select(col("source"), size(tokens(col("text"))).cast("long").as("ntok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("tok"))
        .withColumn("total_tok", sum("tok").over(w))
        .withColumn("n_src", count(lit(1)).over(w))
        .select(col("source"), col("n_docs"), col("tok"),
          fround(col("tok").cast("double") / col("total_tok"), 6).as("token_share"),
          fround(col("total_tok").cast("double") / (col("n_src") * col("tok")), 6).as("weight"))
        .orderBy("source")
    },
    Some("""WITH t AS (SELECT source, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ntok FROM documents), src AS (SELECT source, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS tok FROM t GROUP BY 1), wnd AS (SELECT source, n_docs, tok, CAST(sum(tok) OVER () AS BIGINT) AS total_tok, count(*) OVER () AS n_src FROM src) SELECT source, n_docs, tok, floor(CAST(tok AS DOUBLE) / total_tok * 1e6 + 0.5) / 1e6 AS token_share, floor(CAST(total_tok AS DOUBLE) / (n_src * tok) * 1e6 + 0.5) / 1e6 AS weight FROM wnd ORDER BY source"""))

  /** Sliding-window document chunking — the context-window slicer every
    * pretraining/RAG pipeline runs: 64-token chunks at stride 48 (16-token
    * overlap so no span is ever split across a boundary without also
    * appearing whole). Pure narrow per-row work: the chunk index explodes
    * from an in-row `sequence` (fan-out = ntok/stride, bounded and local),
    * the slice and fingerprint are per-row array ops — the corpus never
    * shuffles; at 100 TB this runs at scan speed. The chunk fingerprint
    * (md5 over the joined token slice) is what downstream chunk-level
    * dedup/contamination joins on, and is byte-identical across engines.
    * Chunk count per doc is fixed by integer arithmetic
    * (1 + (ntok-1) div 48), so engines cannot disagree on the tail chunk. */
  private val pipeChunk = GraftQuery(
    "pipe_chunk_overlap",
    "sliding-window chunking: 64-token chunks, stride 48, md5 chunk fingerprint",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), col("t"), size(col("t")).as("n"))
        .filter(col("n") >= 1)
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0), expr("(n - 1) div 48").cast("int"))).as("c"))
        .select(col("doc_id"), col("c").cast("long").as("chunk_id"),
          (col("c") * 48 + 1).cast("long").as("start_tok"),
          slice(col("t"), col("c") * 48 + 1, lit(64)).as("ck"))
        .select(col("doc_id"), col("chunk_id"), col("start_tok"),
          size(col("ck")).as("chunk_tok"),
          md5(array_join(col("ck"), " ")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t, len(string_split(lower(text), ' ')) AS n FROM documents), c AS (SELECT doc_id, t, n, unnest(generate_series(0, (n - 1) // 48)) AS c FROM t WHERE n >= 1), ck AS (SELECT doc_id, CAST(c AS BIGINT) AS chunk_id, CAST(c * 48 + 1 AS BIGINT) AS start_tok, list_slice(t, c * 48 + 1, least(c * 48 + 64, n)) AS ck FROM c) SELECT doc_id, chunk_id, start_tok, CAST(len(ck) AS INTEGER) AS chunk_tok, md5(array_to_string(ck, ' ')) AS chunk_fp FROM ck ORDER BY doc_id, chunk_id"""))

  /** The gate transform itself — a stateless narrow map over any frame
    * with (doc_id, text), BATCH OR STREAMING (no shuffle, no state, so it
    * rides `readStream` unchanged; DocIngestSpec proves stream ≡ batch).
    * Shared quality definitions from GraftFunctions. */
  /** The gate CASCADE itself — first failing rule wins (rule order is part
    * of the contract) — as one Column/SQL definition pair shared by
    * [[filterGate]] and the audit trail, so the thresholds live once. */
  private[operators] def gateReason(nTok: Column, ttr: Column, stop: Column): Column =
    when(!nTok.between(20, 200), lit("length"))
      .when(ttr < 0.4, lit("repetitive"))
      .when(stop < 0.05, lit("low_stopword"))
      .otherwise(lit("kept"))
  private[operators] def gateReasonSql(nTok: String, ttr: String, stop: String): String =
    s"CASE WHEN $nTok NOT BETWEEN 20 AND 200 THEN 'length' WHEN $ttr < 0.4 THEN 'repetitive' WHEN $stop < 0.05 THEN 'low_stopword' ELSE 'kept' END"

  def filterGate(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.GraftFunctions.{stopRatio => stopR}
    // tokenize once (see pipe_curation_funnel note: lambda filters are
    // non-codegen; inline copies re-split per reference)
    val t = col("t")
    val nTok = size(t)
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val stop = stopR(t) // THE shared stopword list (GraftFunctions)
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), nTok.as("n_tok"),
        fround(ttr, 4).as("ttr"), fround(stop, 4).as("stop_ratio"),
        gateReason(nTok, ttr, stop).as("reason"))
      .withColumn("keep", when(col("reason") === "kept", 1).otherwise(0))
  }

  /** The curation FILTER GATE — the ordered rule cascade (Gopher/C4-style)
    * that turns per-doc quality signals into one keep/drop verdict with the
    * first failing reason. Signals here are all IN-ROW exact ratios (token
    * count band, type-token ratio for repetition, stopword ratio), so the
    * gate is a pure narrow map — the 100 TB corpus pass costs one scan, and
    * the verdict column is what every downstream stage inner-joins on.
    * Rule order is part of the contract (a doc failing length AND
    * repetition reports 'length'), mirrored exactly in the oracle. */
  private val pipeFilterGate = GraftQuery(
    "pipe_filter_gate",
    "ordered quality-rule cascade: keep/drop verdict + first failing reason per doc",
    (s, d) => filterGate(Tables.documents(s, d)).orderBy("doc_id"),
    Some(s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents), m AS (SELECT doc_id, len(t) AS n_tok, CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr, CAST(len(list_filter(t, x -> x IN (${graft.functions.GraftFunctions.stopwordsSqlList}))) AS DOUBLE) / len(t) AS stop_ratio FROM t) SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok, floor(ttr * 10000.0 + 0.5) / 10000.0 AS ttr, floor(stop_ratio * 10000.0 + 0.5) / 10000.0 AS stop_ratio, ${gateReasonSql("n_tok", "ttr", "stop_ratio")} AS reason, CASE WHEN n_tok BETWEEN 20 AND 200 AND ttr >= 0.4 AND stop_ratio >= 0.05 THEN 1 ELSE 0 END AS keep FROM m ORDER BY doc_id"""))

  /** The END-TO-END curation funnel — the report every corpus release
    * ships: per source, how many documents survive each stage of
    * dedup (exact groups + near-dup components) → quality gate (length/
    * TTR/stopword cascade) → importance sampling, and the final token
    * budget. The stages COMPOSE the registered operators' exact logic
    * (keepVerdict from DedupOps, the shared gate/quality builders), so the
    * funnel is also an integration check that the stages agree with their
    * individually-oracled forms. Shape: the gate and sampling flags are
    * in-row; the only joins are the dedup verdict (doc-keyed, 1:1) — one
    * keyed shuffle + one source-keyed aggregation over flag columns. */
  private val pipeCurationFunnel = GraftQuery(
    "pipe_curation_funnel",
    "per-source curation funnel: raw -> dedup -> quality gate -> sampling + token budget",
    (s, d) => {
      import graft.functions.GraftFunctions.{stopRatio => stopR}
      // tokenize ONCE into a column: the gate + sampling flags reference
      // the token array ~6 times, and the lambda-bearing filters fall out
      // of whole-stage codegen, so inline copies re-split the text per
      // reference (measured 2.8 s vs <1 s for this projection at sf0.1).
      // SPARK-36718 keeps the two projections apart: split is non-cheap
      // and multiply-referenced, so CollapseProject won't re-inline it.
      val t = col("t")
      val nTok = size(t)
      val ttr = size(array_distinct(t)).cast("double") / nTok
      val gateKeep = nTok.between(20, 200) && ttr >= 0.4 && stopR(t) >= 0.05
      val flags = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
        .select(col("doc_id"), col("source"), nTok.cast("long").as("n_tok"),
          gateKeep.as("gate_keep"),
          impKeep(t, col("doc_id")).as("samp_keep"))
        .join(DedupOps.keepVerdict(s, d).select(col("doc_id"), col("keep")),
          Seq("doc_id"))
      flags.groupBy("source")
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("keep") === 1, 1L).otherwise(0L)).as("n_dedup"),
          sum(when(col("keep") === 1 && col("gate_keep"), 1L).otherwise(0L))
            .as("n_gate"),
          sum(when(col("keep") === 1 && col("gate_keep") && col("samp_keep"), 1L)
            .otherwise(0L)).as("n_final"),
          sum(when(col("keep") === 1 && col("gate_keep") && col("samp_keep"),
            col("n_tok")).otherwise(0L)).as("tokens_final"))
        .orderBy("source")
    },
    Some(graft.operators.DedupOps.keepVerdictCtes +
      s""", g AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tok, (len(t) BETWEEN 20 AND 200 AND CAST(len(list_distinct(t)) AS DOUBLE) / len(t) >= 0.4 AND CAST(len(list_filter(t, x -> x IN (${graft.functions.GraftFunctions.stopwordsSqlList}))) AS DOUBLE) / len(t) >= 0.05) AS gate_keep, (CAST(${graft.functions.GraftFunctions.md5u32Sql("md5('imp:' || CAST(doc_id AS VARCHAR))")} AS DOUBLE) / 4294967296.0 < 0.2 + 0.8 * (CAST(len(list_filter(t, x -> x IN (${graft.functions.GraftFunctions.stopwordsSqlList}))) AS DOUBLE) / len(t) * 0.3 + CAST(len(list_filter(t, x -> length(x) > 4)) AS DOUBLE) / len(t) * 0.4 + (CASE WHEN len(t) BETWEEN 20 AND 200 THEN 1.0 ELSE 0.0 END) * 0.3)) AS samp_keep FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS t FROM documents)) SELECT source, count(*) AS n_raw, CAST(sum(CASE WHEN kv.keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup, CAST(sum(CASE WHEN kv.keep = 1 AND gate_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_gate, CAST(sum(CASE WHEN kv.keep = 1 AND gate_keep AND samp_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_final, CAST(sum(CASE WHEN kv.keep = 1 AND gate_keep AND samp_keep THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_final FROM g JOIN kv USING (doc_id) GROUP BY source ORDER BY source"""))

  /** Greedy token-budget fill per source — the selection step after the
    * mixture weights are decided: each source gets a token budget (here
    * 60% of its own total, integer arithmetic so both engines agree
    * exactly) and is filled greedily in priority order (longest-first,
    * doc_id tie-break) until the next doc would overflow the budget.
    * Scale shape: both the running sum and the per-source total come from
    * windows over the SAME source-keyed partitioning — one shuffle, two
    * window passes, no corpus-wide sort; the priority order is per-source,
    * never global. */
  private val pipeTokenBudget = GraftQuery(
    "pipe_token_budget",
    "greedy per-source token-budget fill: longest-first until 60% of tokens",
    (s, d) => {
      val part = Window.partitionBy("source")
      val w = part.orderBy(desc("n_chars"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          size(tokens(col("text"))).cast("long").as("ntok"))
        .withColumn("cum", sum("ntok").over(w))
        .withColumn("budget", expr("(sum(ntok) OVER (PARTITION BY source) * 6) DIV 10"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("total_tok"),
          max("budget").as("budget_tok"),
          sum(when(col("cum") <= col("budget"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("cum") <= col("budget"), col("ntok")).otherwise(0L)).as("tok_kept"))
        .orderBy("source")
    },
    Some("""WITH t AS (SELECT doc_id, source, n_chars, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ntok FROM documents), c AS (SELECT source, ntok, CAST(sum(ntok) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, CAST((sum(ntok) OVER (PARTITION BY source) * 6) // 10 AS BIGINT) AS budget FROM t) SELECT source, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS total_tok, max(budget) AS budget_tok, CAST(sum(CASE WHEN cum <= budget THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, CAST(sum(CASE WHEN cum <= budget THEN ntok ELSE 0 END) AS BIGINT) AS tok_kept FROM c GROUP BY 1 ORDER BY 1"""))

  /** Per-document PROVENANCE — the row-level expansion of the curation
    * funnel: for every document, the stage that drops it first
    * (dedup: exact_dup/near_dup → gate: length/repetitive/low_stopword →
    * sampling: sampled_out → kept) plus each stage's own signal, so
    * "why did my doc disappear" is a point lookup on this table instead of
    * a pipeline re-run. Composes the SAME builders as the individually
    * oracled stages (DedupOps.keepVerdict, the gate cascade, the
    * importance-sampling replay), which also makes it a per-row
    * integration check that the stages agree with their oracled forms —
    * AuditTrailSpec folds this table back into the funnel's per-source
    * counts. Shape: in-row signals + ONE doc-keyed 1:1 join against the
    * dedup verdict — the funnel's single keyed shuffle, emitted per doc. */
  private val pipeAuditTrail = GraftQuery(
    "pipe_audit_trail",
    "per-doc provenance: first-dropping stage + every stage's signal",
    (s, d) => {
      import graft.functions.GraftFunctions.{stopRatio => stopR}
      // tokenize once (same rationale as pipe_curation_funnel)
      val t = col("t")
      val nTok = size(t)
      val ttr = size(array_distinct(t)).cast("double") / nTok
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
        .select(col("doc_id"), col("source"), nTok.cast("long").as("n_tok"),
          gateReason(nTok, ttr, stopR(t)).as("gate_reason"),
          impKeep(t, col("doc_id")).cast("int").as("samp_keep"))
        .join(graft.operators.DedupOps.keepVerdict(s, d)
          .select(col("doc_id"), col("reason").as("dedup_reason")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_tok"),
          col("dedup_reason"), col("gate_reason"), col("samp_keep"),
          when(col("dedup_reason") =!= "kept", col("dedup_reason"))
            .when(col("gate_reason") =!= "kept", col("gate_reason"))
            .when(col("samp_keep") === 0, lit("sampled_out"))
            .otherwise(lit("kept")).as("verdict"))
        .orderBy("doc_id")
    },
    Some(graft.operators.DedupOps.keepVerdictCtes +
      s""", g AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tok, ${gateReasonSql("len(t)", "CAST(len(list_distinct(t)) AS DOUBLE) / len(t)", s"CAST(len(list_filter(t, x -> x IN (${graft.functions.GraftFunctions.stopwordsSqlList}))) AS DOUBLE) / len(t)")} AS gate_reason, CASE WHEN ${graft.functions.GraftFunctions.impKeepSql} THEN 1 ELSE 0 END AS samp_keep FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS t FROM documents)) SELECT g.doc_id, g.source, g.n_tok, kv.reason AS dedup_reason, g.gate_reason, g.samp_keep, CASE WHEN kv.reason <> 'kept' THEN kv.reason WHEN g.gate_reason <> 'kept' THEN g.gate_reason WHEN g.samp_keep = 0 THEN 'sampled_out' ELSE 'kept' END AS verdict FROM g JOIN kv USING (doc_id) ORDER BY g.doc_id"""))

  /** Business-day (Mon–Fri) order→ship latency per order priority — the
    * calendar arithmetic SLAs are actually written in. The count of
    * weekdays in [orderdate, shipdate) is a CLOSED FORM over integers
    * (full weeks × 5 + a two-term boundary correction from the start
    * weekday), so the fact table is never exploded into per-day rows — a
    * naive generate_series approach multiplies a 100 TB join by ~30×.
    * Weekday indexes are Monday=0 on both engines (Spark dayofweek is
    * 1=Sun..7=Sat, hence the (+5)%7 rebase; DuckDB isodow is 1=Mon..7).
    * Scale: one orderkey-equijoin shuffle (the same one every TPC-H
    * order/lineitem query pays), then a 5-group rollup; the latency math
    * is a narrow per-row projection. */
  private val calBusinessDays = {
    val sparkBd =
      """full_w * 5 + greatest(0, least(5, w1 + rem) - w1)
        | + greatest(0, least(5, w1 + rem - 7))""".stripMargin.replaceAll("\\s+", " ")
    GraftQuery(
      "cal_business_days",
      "closed-form business-day order→ship latency stats per priority",
      (s, d) => {
        val joined = Tables.lineitem(s, d)
          .select(col("l_orderkey"), to_date(col("l_shipdate")).as("d2"))
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d1"),
              col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
        joined
          .withColumn("n", datediff(col("d2"), col("d1")).cast("long"))
          .filter(col("n") >= 0) // generator guarantees ship ≥ order; the
          // closed form (and DuckDB's floor-div `//` vs Spark's truncating
          // `div`) only agree on non-negative spans, so pin the domain
          .withColumn("w1", (dayofweek(col("d1")) + lit(5)) % 7)
          .withColumn("full_w", expr("n div 7"))
          .withColumn("rem", col("n") % 7)
          .withColumn("bdays", expr(sparkBd))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lines"), sum("bdays").as("sb"),
            max("bdays").as("max_bdays"))
          .select(col("o_orderpriority"), col("n_lines"),
            fround(col("sb").cast("double") / col("n_lines"), 4)
              .as("mean_bdays"),
            col("max_bdays"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH j AS (SELECT o_orderpriority, CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS n, CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS w1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) >= 0), b AS (SELECT o_orderpriority, (n // 7) * 5 + greatest(0, least(5, w1 + (n % 7)) - w1) + greatest(0, least(5, w1 + (n % 7) - 7)) AS bdays FROM j) SELECT o_orderpriority, count(*) AS n_lines, floor(CAST(sum(bdays) AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4 AS mean_bdays, CAST(max(bdays) AS BIGINT) AS max_bdays FROM b GROUP BY 1 ORDER BY 1"""))
  }

  /** T5-style SPAN CORRUPTION planning — the deterministic masking recipe
    * a denoising-pretraining pipeline applies per document: one span of 3
    * tokens per 20 tokens (≈15% corruption), span starts drawn from the
    * md5 hash of (doc_id, span index) so the mask is a pure function of
    * the document identity — reproducible across runs, engines, and
    * corpus growth, like samp_hash_split. Overlapping spans merge (the
    * masked-position set is distinct), so n_masked ≤ 3·n_spans and the
    * realized ratio is reported against the 15% target. Docs under 20
    * tokens get no spans but stay in the output. Scale: explode is
    * bounded by 3·n_tok/20 positions per doc, every step is narrow until
    * one doc-keyed count — embarrassingly parallel. */
  private val pipeSpanCorruption = GraftQuery(
    "pipe_span_corruption",
    "deterministic T5-style span-corruption mask stats per document",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("n_spans", expr("n_tok div 20"))
      val masked = base.filter(col("n_spans") >= 1)
        .withColumn("i", explode(sequence(lit(0L), col("n_spans") - 1)))
        .withColumn("start",
          md5u32(concat(col("doc_id").cast("string"), lit(":"),
            col("i").cast("string"))) % (col("n_tok") - 2))
        .withColumn("p", explode(sequence(col("start"), col("start") + 2)))
        .select("doc_id", "p").distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_masked"))
      base.join(masked, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tok"), col("n_spans"),
          coalesce(col("n_masked"), lit(0L)).as("n_masked"),
          fround(coalesce(col("n_masked"), lit(0L)).cast("double") / col("n_tok"), 4)
            .as("mask_ratio"))
        .orderBy("doc_id")
    },
    Some(s"""WITH base AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok, CAST(len(string_split(lower(text), ' ')) // 20 AS BIGINT) AS n_spans FROM documents), sp AS (SELECT doc_id, n_tok, unnest(generate_series(0, n_spans - 1)) AS i FROM base WHERE n_spans >= 1), st AS (SELECT doc_id, ${md5u32Sql("md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))")} % (n_tok - 2) AS start FROM sp), pos AS (SELECT DISTINCT doc_id, start + k AS p FROM st, (SELECT unnest(generate_series(0, 2)) AS k)), mk AS (SELECT doc_id, count(*) AS n_masked FROM pos GROUP BY 1) SELECT base.doc_id, n_tok, n_spans, CAST(coalesce(mk.n_masked, 0) AS BIGINT) AS n_masked, floor(CAST(coalesce(mk.n_masked, 0) AS DOUBLE) / n_tok * 1e4 + 0.5) / 1e4 AS mask_ratio FROM base LEFT JOIN mk USING (doc_id) ORDER BY doc_id"""))

  /** PADDING-WASTE audit for batched training: documents grouped into
    * fixed batches of 8 under two orderings — ARRIVAL (doc_id — what a
    * naive loader does) vs LENGTH-SORTED (n_tok desc — bucketed dynamic
    * batching). Every batch pads to its longest member, so padded tokens
    * = Σ_batch (8·max − Σ len); the two strategies' waste side-by-side is
    * the report that justifies length bucketing (it typically cuts
    * padding several-fold). Pure integer window arithmetic; each
    * strategy is one row_number + one grouped rollup; the last partial
    * batch pads like the rest. Scale: two sorts of the doc-ID/length
    * projection (never the text), each a single total-order window —
    * at true scale the sort is range-partitioned, the semantics hold. */
  private val pipeLengthBatching = {
    def strat(name: String, ord: Seq[Column]) = (df: org.apache.spark.sql.DataFrame) => {
      val w = Window.orderBy(ord: _*)
      df.withColumn("rn", row_number().over(w))
        .withColumn("batch", expr("(rn - 1) div 8"))
        .groupBy("batch")
        .agg(count(lit(1)).as("bsz"), max("n_tok").as("mx"), sum("n_tok").as("sm"))
        .agg(count(lit(1)).as("n_batches"), sum("sm").as("real_tokens"),
          sum(col("bsz") * col("mx") - col("sm")).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"), col("real_tokens"),
          col("padded_tokens"),
          fround(col("padded_tokens").cast("double") /
            (col("real_tokens") + col("padded_tokens")).cast("double"), 4)
            .as("pad_share"))
    }
    GraftQuery(
      "pipe_length_batching",
      "padding waste of arrival-order vs length-sorted batches of 8",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
        strat("arrival", Seq(col("doc_id")))(docs)
          .unionByName(strat("sorted", Seq(desc("n_tok"), col("doc_id")))(docs))
          .orderBy("strategy")
      },
      Some("""WITH docs AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok FROM documents), arr AS (SELECT n_tok, (row_number() OVER (ORDER BY doc_id) - 1) // 8 AS batch FROM docs), srt AS (SELECT n_tok, (row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1) // 8 AS batch FROM docs), ab AS (SELECT batch, count(*) AS bsz, max(n_tok) AS mx, sum(n_tok) AS sm FROM arr GROUP BY 1), sb AS (SELECT batch, count(*) AS bsz, max(n_tok) AS mx, sum(n_tok) AS sm FROM srt GROUP BY 1), res AS (SELECT 'arrival' AS strategy, count(*) AS n_batches, CAST(sum(sm) AS BIGINT) AS real_tokens, CAST(sum(bsz * mx - sm) AS BIGINT) AS padded_tokens FROM ab UNION ALL SELECT 'sorted', count(*), CAST(sum(sm) AS BIGINT), CAST(sum(bsz * mx - sm) AS BIGINT) FROM sb) SELECT strategy, n_batches, real_tokens, padded_tokens, floor(CAST(padded_tokens AS DOUBLE) / CAST(real_tokens + padded_tokens AS DOUBLE) * 1e4 + 0.5) / 1e4 AS pad_share FROM res ORDER BY strategy"""))
  }

  /** DATASET CARD — the one-row datasheet a corpus release ships with
    * (Gebru et al., "Datasheets for Datasets"): size, token mass, exact
    * vocabulary, duplicate rate (off the shared keepVerdict — exact +
    * near-dup), mean quality score, and language-mix entropy. Every
    * averaged float rides as floor-rounded integer micro-units before
    * summation (lpPerDoc discipline); the card is assembled from 1-row
    * aggregates, so the corpus scans are the token pass and the verdict's
    * fingerprint pass — nothing quadratic. */
  private lazy val pipeDatasetCard = GraftQuery(
    "pipe_dataset_card",
    "one-row corpus datasheet: size, vocab, dup rate, quality, lang entropy",
    (s, d) => {
      import graft.functions.GraftFunctions.{stopRatio, longRatio, lenOk, qualityScore}
      val docs = Tables.documents(s, d)
      val tok = docs.select(explode(tokens(col("text"))).as("tok"))
      val tokStats = tok.agg(count(lit(1)).as("total_tokens"),
        countDistinct("tok").as("vocab_size"))
      val dup = DedupOps.keepVerdict(s, d)
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep") === 0, 1L).otherwise(0L)).as("n_dropped"))
      val qual = docs
        .select(tokens(col("text")).as("t"))
        .select(floor(qualityScore(stopRatio(col("t")), longRatio(col("t")),
          lenOk(col("t"))) * 1e6 + 0.5).cast("long").as("qm"))
        .agg(sum("qm").as("qs"), count(lit(1)).as("qn"))
      val langs = docs.groupBy("lang").agg(count(lit(1)).as("nl"))
      val ltot = langs.agg(sum("nl").as("nn"), count(lit(1)).as("n_langs"))
      val lent = langs.crossJoin(broadcast(ltot))
        .agg(sum(floor(-col("nl") * log(col("nl").cast("double") /
          col("nn").cast("double")) * 1e6 + 0.5).cast("long")).as("hs"))
      dup.crossJoin(tokStats).crossJoin(qual).crossJoin(lent).crossJoin(ltot)
        .select(col("n_docs"), col("total_tokens"), col("vocab_size"),
          fround(col("n_dropped").cast("double") / col("n_docs"), 4)
            .as("dup_rate"),
          fround(col("qs").cast("double") / (col("qn") * 1e6), 4)
            .as("mean_quality"),
          col("n_langs"),
          fround(col("hs").cast("double") / (col("nn") * 1e6), 4)
            .as("lang_entropy_nats"))
    },
    Some(graft.operators.DedupOps.keepVerdictCtes +
      s""", tok AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents), ts AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens, CAST(count(DISTINCT tok) AS BIGINT) AS vocab_size FROM tok), dp AS (SELECT count(*) AS n_docs, CAST(sum(CASE WHEN keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped FROM kv), q AS (SELECT CAST(sum(CAST(floor((CAST(len(list_filter(t, x -> x IN (${graft.functions.GraftFunctions.stopwordsSqlList}))) AS DOUBLE) / len(t) * 0.3 + CAST(len(list_filter(t, x -> length(x) > 4)) AS DOUBLE) / len(t) * 0.4 + (CASE WHEN len(t) BETWEEN 20 AND 200 THEN 1.0 ELSE 0.0 END) * 0.3) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS qs, count(*) AS qn FROM (SELECT string_split(lower(text), ' ') AS t FROM documents)), lg AS (SELECT lang, count(*) AS nl FROM documents GROUP BY 1), lt AS (SELECT CAST(sum(nl) AS BIGINT) AS nn, count(*) AS n_langs FROM lg), le AS (SELECT CAST(sum(CAST(floor(-nl * ln(CAST(nl AS DOUBLE) / CAST(nn AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hs FROM lg CROSS JOIN lt) SELECT dp.n_docs, ts.total_tokens, ts.vocab_size, floor(CAST(dp.n_dropped AS DOUBLE) / dp.n_docs * 1e4 + 0.5) / 1e4 AS dup_rate, floor(CAST(q.qs AS DOUBLE) / (q.qn * 1000000.0) * 1e4 + 0.5) / 1e4 AS mean_quality, lt.n_langs, floor(CAST(le.hs AS DOUBLE) / (lt.nn * 1000000.0) * 1e4 + 0.5) / 1e4 AS lang_entropy_nats FROM dp CROSS JOIN ts CROSS JOIN q CROSS JOIN le CROSS JOIN lt"""))

  /** CURRICULUM PHASES: documents ordered by ascending quality score into
    * three equal-doc phases (warmup → core → polish — the
    * curriculum-learning schedule that feeds cleanest data last), with
    * each phase's doc count, token mass, and exact mean quality. Phase
    * assignment is a rank tercile over the micro-int quality (ranking
    * never compares floats; doc_id tiebreak), the same positive-only
    * ceil-division spelling as the other rank cuts. One corpus pass for
    * the scores, a doc-projection sort, a 3-group rollup. */
  private val pipeCurriculum = {
    import graft.functions.GraftFunctions.{stopRatio, longRatio, lenOk, qualityScore}
    GraftQuery(
      "pipe_curriculum_phases",
      "3-phase quality curriculum: per-phase docs, tokens, mean quality",
      (s, d) => {
        val t = col("t")
        val scored = Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .select(col("doc_id"), size(t).cast("long").as("n_tok"),
            floor(qualityScore(stopRatio(t), longRatio(t), lenOk(t)) * 1e6 + 0.5)
              .cast("long").as("qm"))
        val n = scored.agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("qm"), col("doc_id"))
        scored
          .withColumn("rk", row_number().over(w).cast("long"))
          .crossJoin(broadcast(n))
          .withColumn("phase", expr("((rk - 1) * 3) div n + 1"))
          .groupBy("phase")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"),
            sum("qm").as("qs"))
          .select(col("phase"),
            when(col("phase") === 1, "warmup").when(col("phase") === 2, "core")
              .otherwise("polish").as("name"),
            col("n_docs"), col("tokens"),
            fround(col("qs").cast("double") / (col("n_docs") * 1e6), 4)
              .as("mean_quality"))
          .orderBy("phase")
      },
      Some(s"""WITH sc AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok, CAST(floor((CAST(len(list_filter(t, x -> x IN (${graft.functions.GraftFunctions.stopwordsSqlList}))) AS DOUBLE) / len(t) * 0.3 + CAST(len(list_filter(t, x -> length(x) > 4)) AS DOUBLE) / len(t) * 0.4 + (CASE WHEN len(t) BETWEEN 20 AND 200 THEN 1.0 ELSE 0.0 END) * 0.3) * 1000000.0 + 0.5) AS BIGINT) AS qm FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)), rk AS (SELECT *, CAST(row_number() OVER (ORDER BY qm, doc_id) AS BIGINT) AS rk, CAST(count(*) OVER () AS BIGINT) AS n FROM sc), ph AS (SELECT ((rk - 1) * 3) // n + 1 AS phase, n_tok, qm FROM rk) SELECT phase, CASE WHEN phase = 1 THEN 'warmup' WHEN phase = 2 THEN 'core' ELSE 'polish' END AS name, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens, floor(CAST(sum(qm) AS DOUBLE) / (count(*) * 1000000.0) * 1e4 + 0.5) / 1e4 AS mean_quality FROM ph GROUP BY 1 ORDER BY 1"""))
  }

  /** PADDING CURVE: the length-sorted padding waste at batch sizes
    * 4/8/16/32 — the knob-tuning read for pipe_length_batching's fixed
    * B = 8 (bigger batches amortize kernels but pad more; the curve says
    * how much). ONE length ranking (the sort is the expensive part)
    * serves all four batch sizes; per-size grouping and the waste
    * arithmetic are pure integers. */
  private val pipePaddingCurve = {
    val sizes = Seq(4L, 8L, 16L, 32L)
    GraftQuery(
      "pipe_padding_curve",
      "length-sorted padding waste at batch sizes 4/8/16/32 from one ranking",
      (s, d) => {
        val ranked = Tables.documents(s, d)
          .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
          .withColumn("rn", row_number().over(
            Window.orderBy(desc("n_tok"), col("doc_id"))).cast("long"))
        val legs = sizes.map { b =>
          ranked.withColumn("batch", expr(s"(rn - 1) div $b"))
            .groupBy("batch")
            .agg(count(lit(1)).as("bsz"), max("n_tok").as("mx"),
              sum("n_tok").as("sm"))
            .agg(count(lit(1)).as("n_batches"), sum("sm").as("real_tokens"),
              sum(col("bsz") * col("mx") - col("sm")).as("padded"))
            .select(lit(b).as("batch_size"), col("n_batches"),
              col("real_tokens"), col("padded"),
              fround(col("padded").cast("double") /
                (col("real_tokens") + col("padded")).cast("double"), 4)
                .as("pad_share"))
        }
        legs.reduce(_.unionByName(_)).orderBy("batch_size")
      },
      Some("WITH ranked AS (SELECT CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok, CAST(row_number() OVER (ORDER BY len(string_split(lower(text), ' ')) DESC, doc_id) AS BIGINT) AS rn FROM documents) " +
        sizes.map(b =>
          s"SELECT CAST($b AS BIGINT) AS batch_size, count(*) AS n_batches, CAST(sum(sm) AS BIGINT) AS real_tokens, CAST(sum(bsz * mx - sm) AS BIGINT) AS padded, floor(CAST(sum(bsz * mx - sm) AS DOUBLE) / CAST(sum(sm) + sum(bsz * mx - sm) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS pad_share FROM (SELECT (rn - 1) // $b AS batch, count(*) AS bsz, max(n_tok) AS mx, sum(n_tok) AS sm FROM ranked GROUP BY 1)")
          .mkString(" UNION ALL ") + " ORDER BY batch_size"))
  }

  val all: Seq[GraftQuery] = Seq(
    sampHashSplit, sampClusterSplit, arrHofStats, evtFunnel, aggMode,
    calGapFill, calInterpolate, pipePack, pipeMixWeights, pipeChunk,
    pipeFilterGate, pipeCurationFunnel, pipeTokenBudget, pipeAuditTrail,
    calBusinessDays, pipeSpanCorruption, pipeLengthBatching,
    pipeDatasetCard, pipeCurriculum, pipePaddingCurve)
}
