package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *  - brute-force cosine top-k: the exactness baseline. The (small) query
  *    set is broadcast against the candidate scan, so the big side never
  *    shuffles; per-pair cost is one codegen'd 64-element fold.
  *  - sign-random-projection LSH: the scale path. Each vector gets an 8-bit
  *    bucket code from deterministic ±1 hyperplanes; queries only scan
  *    their own bucket (~1/256 of the data at uniform spread). Recall vs
  *    the brute-force baseline is asserted in ScalaTest (no SQL oracle —
  *    the bucketing is engine-internal).
  */
object SimilarityOps {

  /** vectors with precomputed double form + L2 norm (computed once per row,
    * not once per pair). Uses the codegen'd graft_dot expression — the
    * zip_with/aggregate fold allocates per evaluation, which in an all-pairs
    * join is the entire hot path (measured 5x slower at sf0.1). */
  private def normalized(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftExpressions.ensureRegistered(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), vecDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  private val knnBrute = GraftQuery(
    "sim_knn_brute",
    "brute-force cosine top-5 per query vector (broadcast query set)",
    (s, d) => {
      val e = normalized(s, d)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"))
      val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
        .withColumn("cos", expr("graft_dot(qv, cv)") / (col("qn") * col("cn")))
      val w = Window.partitionBy("q_id").orderBy(fround(col("cos"), 6).desc, col("n_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("n_id"), fround(col("cos"), 4).as("cos"), col("rnk"))
        .orderBy("q_id", "rnk")
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM e), q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0), sc AS (SELECT q.q_id, c.vec_id AS n_id, list_sum([s[1]*s[2] for s in list_zip(q.qv, c.v)]) / (q.qn * c.nrm) AS cos FROM q JOIN n c ON c.vec_id <> q.q_id) SELECT q_id, n_id, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos, CAST(rnk AS INTEGER) AS rnk FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY floor(cos * 1000000.0 + 0.5) DESC, n_id) AS rnk FROM sc) WHERE rnk <= 5 ORDER BY q_id, rnk"""))

  /** Per-label centroid stats — the IVF coarse-quantizer building block,
    * oracle-checked (avg vector norm per label). */
  private val labelStats = GraftQuery(
    "sim_label_stats",
    "per-label vector stats (IVF coarse-quantizer building block)",
    (s, d) => normalized(s, d)
      .groupBy("label")
      .agg(count(lit(1)).as("cnt"), fround(avg("nrm"), 4).as("avg_norm"))
      .orderBy("label"),
    Some("""SELECT label, count(*) AS cnt, floor(avg(sqrt(list_sum([CAST(x AS DOUBLE) * x for x in embedding]))) * 10000.0 + 0.5) / 10000.0 AS avg_norm FROM embeddings GROUP BY 1 ORDER BY 1"""))

  /** Deterministic ±1 hyperplane weight for (plane p, dim i): parity of a
    * md5 nibble. Engine-internal (only used by the LSH path). */
  private def planeSign(p: Column, i: Column): Column =
    when(expr("instr('0123456789abcdef', substring(md5(concat(p, ':', i)), 1, 1)) % 2") === 1,
      lit(1.0)).otherwise(lit(-1.0))

  /** 8-bit sign-LSH bucket code per vector. posexplode → join-free: the
    * plane weights are computed inline per (vector, dim, plane). */
  def lshCodes(vecs: DataFrame): DataFrame = {
    val dims = vecs.select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
    val proj = dims
      .withColumn("p", explode(sequence(lit(0), lit(7))))
      .withColumn("w", planeSign(col("p"), col("i")))
      .groupBy("vec_id", "p")
      .agg(sum(col("w") * col("x")).as("dot"))
    proj.groupBy("vec_id")
      .agg(sum(expr("CASE WHEN dot > 0 THEN shiftleft(1, p) ELSE 0 END")).as("code"))
  }

  /** Vectors + LSH bucket code, persisted once per (session, corpus) via
    * [[graft.PersistCache]] — the stored-ANN-index analog. Both ANN queries
    * and the embedding near-dup path read this; the code pipeline is two
    * shuffles over a dims×planes explode, so rebuilding it per leg (or per
    * invocation) would dominate their cost. */
  def codedTable(s: SparkSession, d: String): DataFrame =
    graft.PersistCache.getOrBuild(s, s"lsh-coded:$d") {
      val e = normalized(s, d)
      e.join(lshCodes(e), Seq("vec_id"))
    }

  /** ANN via LSH buckets: top-3 per query within its bucket. The bucketing
    * is md5-derived, so the DuckDB oracle replays it exactly: same ±1
    * hyperplanes (md5-nibble parity of "p:i"), same sequential-order dot
    * products, same bit packing — candidate sets and rankings hash-match.
    * ScalaTest additionally checks recall vs sim_knn_brute. */
  private val knnLsh = GraftQuery(
    "sim_knn_lsh",
    "ANN: sign-random-projection LSH buckets + in-bucket cosine top-3",
    (s, d) => {
      val coded = codedTable(s, d)
      val q = coded.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("code").as("qcode"))
      val scored = coded.join(broadcast(q),
          col("code") === col("qcode") && col("q_id") =!= col("vec_id"))
        .withColumn("cos", expr("graft_dot(qv, v)") / (col("qn") * col("nrm")))
      val w = Window.partitionBy("q_id").orderBy(fround(col("cos"), 6).desc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("q_id"), col("vec_id").as("n_id"),
          fround(col("cos"), 4).as("cos"), col("rnk"))
        .orderBy("q_id", "rnk")
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM e), proj AS (SELECT vec_id, p, list_sum([(CASE WHEN instr('0123456789abcdef', substr(md5(p::VARCHAR || ':' || (i-1)::VARCHAR), 1, 1)) % 2 = 1 THEN 1.0 ELSE -1.0 END) * v[i] for i in generate_series(1, len(v))]) AS dp FROM n, (SELECT unnest(generate_series(0, 7)) AS p)), codes AS (SELECT vec_id, CAST(sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS code FROM proj GROUP BY 1), c AS (SELECT n.vec_id, n.v, n.nrm, codes.code FROM n JOIN codes USING (vec_id)), q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, code AS qcode FROM c WHERE vec_id % 50 = 0), sc AS (SELECT q.q_id, c.vec_id AS n_id, list_sum([s[1]*s[2] for s in list_zip(q.qv, c.v)]) / (q.qn * c.nrm) AS cos FROM q JOIN c ON c.code = q.qcode AND c.vec_id <> q.q_id) SELECT q_id, n_id, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos, CAST(rnk AS INTEGER) AS rnk FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY floor(cos * 1000000.0 + 0.5) DESC, n_id) AS rnk FROM sc) WHERE rnk <= 3 ORDER BY q_id, rnk"""))

  /** Matryoshka two-stage serving — the retrieve-then-rerank pattern:
    * a COARSE pass scores every candidate on the 32-dim embedding PREFIX
    * (half the arithmetic and memory traffic per pair — at serving scale
    * the prefix table IS the resident index), keeps a 40-candidate
    * shortlist per query, then RERANKS only the shortlist at full 64 dims
    * (full vectors are fetched by key for 40 rows per query, never
    * scanned). Matryoshka-trained embeddings concentrate signal in the
    * prefix by construction; on this RANDOM corpus prefix-cos correlates
    * with full-cos only at sqrt(32/64) ≈ 0.71, and measured top-3 recall
    * vs brute force is ~73% (the data-limited floor — the same caveat as
    * txt_langid's accuracy; the serving mechanics are what's under test).
    * Fully oracle-replayable (slice + dot are the same math in DuckDB);
    * GraphTextOpsSpec additionally checks shortlist recall vs brute
    * force. */
  private val knnMatryoshka = GraftQuery(
    "sim_knn_matryoshka",
    "two-stage ANN: 32-dim prefix shortlist-40, full-dim rerank top-3",
    (s, d) => {
      val e = normalized(s, d)
        .withColumn("vPre", slice(col("v"), 1, 32))
        .withColumn("nPre", sqrt(expr("graft_dot(vPre, vPre)")))
      val q8 = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("vPre").as("qvPre"), col("nPre").as("qnPre"))
      val coarse = e.select(col("vec_id").as("n_id"), col("vPre").as("cvPre"), col("nPre").as("cnPre"))
        .join(broadcast(q8), col("q_id") =!= col("n_id"))
        .withColumn("cosPre", expr("graft_dot(qvPre, cvPre)") / (col("qnPre") * col("cnPre")))
      val w8 = Window.partitionBy("q_id").orderBy(fround(col("cosPre"), 6).desc, col("n_id"))
      val shortlist = coarse.withColumn("crk", row_number().over(w8))
        .filter(col("crk") <= 40)
        .select(col("q_id"), col("n_id"))
      // rerank: fetch FULL vectors for shortlist keys only
      val full = e.select(col("vec_id"), col("v"), col("nrm"))
      val qFull = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy("q_id").orderBy(fround(col("cos"), 6).desc, col("n_id"))
      shortlist
        .join(full, col("n_id") === col("vec_id"))
        .join(broadcast(qFull), Seq("q_id"))
        .withColumn("cos", expr("graft_dot(qv, v)") / (col("qn") * col("nrm")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("q_id"), col("n_id"), fround(col("cos"), 4).as("cos"), col("rnk"))
        .orderBy("q_id", "rnk")
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm, list_slice(v, 1, 32) AS vPre FROM e), n2 AS (SELECT vec_id, v, nrm, vPre, sqrt(list_sum([x*x for x in vPre])) AS nPre FROM n), q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, vPre AS qvPre, nPre AS qnPre FROM n2 WHERE vec_id % 50 = 0), coarse AS (SELECT q.q_id, c.vec_id AS n_id, list_sum([s[1]*s[2] for s in list_zip(q.qvPre, c.vPre)]) / (q.qnPre * c.nPre) AS cosPre FROM q JOIN n2 c ON c.vec_id <> q.q_id), short AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY floor(cosPre * 1000000.0 + 0.5) DESC, n_id) AS crk FROM coarse) WHERE crk <= 40), rer AS (SELECT s.q_id, s.n_id, list_sum([p[1]*p[2] for p in list_zip(q.qv, c.v)]) / (q.qn * c.nrm) AS cos FROM short s JOIN n2 c ON c.vec_id = s.n_id JOIN q ON q.q_id = s.q_id) SELECT q_id, n_id, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos, CAST(rnk AS INTEGER) AS rnk FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY floor(cos * 1000000.0 + 0.5) DESC, n_id) AS rnk FROM rer) WHERE rnk <= 3 ORDER BY q_id, rnk"""))

  /** Per-label embedding CENTROIDS — the class-prototype table behind
    * semantic dedup (SemDeDup clusters then prunes within clusters),
    * label-drift monitoring, and nearest-centroid classification. Each
    * float rides as an exact micro-unit BIGINT, so the per-(label, dim)
    * sum is order-independent and the mean an exact rational — never a
    * float sum whose merge order Spark leaves unfixed.
    *
    * Scale shape: posexplode to (label, dim, micro) then ONE keyed
    * aggregation with map-side partial sums — the shuffle carries
    * |labels|·dims rows, not the corpus. That tall-skinny explode is the
    * honest distributed form for element-wise array reduction: a
    * vector-valued aggregation buffer (à la the IVF trainer's
    * TypedImperativeAggregate) saves the explode but shuffles the same
    * bytes; the explode keeps whole-stage codegen. */
  private val embCentroids = GraftQuery(
    "emb_centroids",
    "per-label embedding centroids: element-wise micro-exact means",
    (s, d) => Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
        floor(col("x").cast("double") * 1000000.0 + 0.5).cast("long").as("micro"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum("micro").as("sm"))
      .select(col("label"), col("dim"), col("n"),
        fround(col("sm").cast("double") / col("n") / 1000000.0, 6).as("mean_v"))
      .orderBy("label", "dim"),
    Some("""SELECT label, dim, count(*) AS n, floor(CAST(sum(CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS mean_v FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS dim) GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[GraftQuery] = Seq(knnBrute, labelStats, knnLsh, knnMatryoshka,
    embCentroids)
}
