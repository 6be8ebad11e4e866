package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.GraftQuery
import graft.functions.GraftFunctions.fround

/** IVF-PQ composite ANN — the canonical billion-scale index shape (coarse
  * inverted file × product-quantized payload, the FAISS `IVFx,PQy` design):
  * IVF alone prunes WHICH vectors a probe touches but still stores/reads
  * full vectors; PQ alone compresses the payload 64× but still scans the
  * whole corpus per query. The composite does both: the stored index is a
  * cid-partitioned table whose ONLY payload is the M-byte PQ code, so a
  * probe reads nprobe/k of the files AND each file is ~64× smaller than
  * the raw vectors — at 100 TB of embeddings that is the difference
  * between an index that fits hot storage and one that doesn't.
  *
  *  1. TRAIN: the coarse quantizer is [[IvfAnn]]'s k-means trainer run on
  *     the UNIT vectors (cosine geometry — the same space [[PqAnn]]'s
  *     codebooks train in, so ADC L2 stays monotone in cosine); the PQ
  *     codebooks are [[PqAnn.trainedCodebooks]] verbatim (one model per
  *     corpus, shared with sim_knn_pq — exactly how a production system
  *     versions one PQ model across its indexes).
  *  2. INDEX: ONE narrow pass over the corpus computes both the coarse
  *     cid (argmin fold over the broadcast coarse model) and the M-code
  *     array (nested fold over the broadcast codebooks), then writes
  *     (vec_id, codes) partitioned by cid — no raw vectors stored, no
  *     corpus-sized join between separately-built artifacts.
  *  3. SEARCH: the request batch is driver-sized by definition, so probe
  *     selection (nprobe nearest coarse centroids) and the 8×16 ADC
  *     lookup tables are computed driver-side from the cached models and
  *     ride ONE broadcast; the corpus side is a partition-pruned read of
  *     the probed buckets' code files and an 8-lookup ADC fold per
  *     (query, candidate) — never a dot product against a raw vector.
  *
  * ORACLE: both trainers are deterministic by construction (hash-sampled
  * training sets, md5-rank seeds, 1e-6-rounded distance compares with
  * smallest-cid ties, 1e-9-rounded means), so DuckDB replays the ENTIRE
  * pipeline — PQ train (the [[PqAnn.trainReplayCtes]] chain shared with
  * sim_knn_pq, so the two queries cannot train divergent codebooks),
  * coarse train over unit vectors, corpus assignment + encode, probe
  * selection, LUT, in-bucket ADC top-k ([[oracleSql]]). Driver-side float
  * work follows the same contract (sums in array order, explicit
  * rounding before every compare), the [[PqAnn]]/[[IvfAnn]] precedent.
  *
  * Reference scope: killrweather has no ANN surface — this extends the
  * training-data-pipeline brief (similarity search: "IVF or LSH-bucketed
  * variant as the scale path") to the composed form production uses.
  */
object IvfPqAnn {
  private val NPROBE = IvfAnn.NPROBE
  private val TOPK = 3
  private val M = PqAnn.M
  private val SUBDIM = PqAnn.SUBDIM
  private val KC = PqAnn.KC

  /** Coarse quantizer over UNIT vectors, cached per corpus dir (distinct
    * from [[IvfAnn.trainedCentroids]]'s raw-vector model — same trainer,
    * different input space, so the two caches must not share keys). */
  private val coarseCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, Seq[Double])]]
  private def coarseModel(s: SparkSession, d: String): Seq[(Int, Seq[Double])] =
    coarseCache.getOrElseUpdate(d, IvfAnn.trainModel(s, PqAnn.unitVecs(s, d)))

  /** Stored index path per corpus dir: (vec_id, codes) partitioned by cid
    * — write-once, same immutable-corpus-dir assumption and locking as
    * [[IvfAnn.storedIndex]]. `repartition(cid)` clusters each bucket into
    * one file (bucket count = file-layout unit at scale). */
  private val indexCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private val indexLock = new Object

  def storedIndex(s: SparkSession, d: String): String = indexLock.synchronized {
    indexCache.getOrElseUpdate(d, {
      val out = java.nio.file.Files.createTempDirectory("ivfpq-index").toString
      val cents = IvfAnn.centroidsToDf(s, coarseModel(s, d))
      val pqModel = PqAnn.modelDf(s, PqAnn.trainedCodebooks(s, d))
      // fused build: coarse-assign AND encode in one narrow pass (both
      // models are broadcast one-row literals), so the index build scans
      // the corpus exactly once — no join between separately-built
      // assignment and code tables
      IvfAnn.assign(s, PqAnn.unitVecs(s, d), cents)
        .crossJoin(broadcast(pqModel))
        .select(col("vec_id"), col("cid"), PqAnn.codesCol(col("v")).as("codes"))
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(out)
      out
    })
  }

  val query: GraftQuery = GraftQuery(
    "sim_knn_ivfpq",
    s"ANN: IVF-PQ composite (${IvfAnn.K}-bucket coarse quantizer, $M×$KC codebooks), " +
      s"nprobe=$NPROBE partition-pruned ADC top-$TOPK over stored codes",
    (s, d) => {
      val cents = coarseModel(s, d).sortBy(_._1)
      val model = PqAnn.trainedCodebooks(s, d)
      val idxPath = storedIndex(s, d)
      def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
      // the request batch: driver-sized by definition (it is the query,
      // not the corpus) — same collect-then-broadcast shape as IvfAnn's
      // probe list and PqAnn's LUT batch
      val qRows = PqAnn.unitVecs(s, d).filter(col("vec_id") % 50 === 0)
        .select(col("vec_id"), col("v")).collect()
      val byKey = model.map { case (m, c, v) => (m, c) -> v }.toMap
      val probeRows = qRows.flatMap { r =>
        val qid = r.getLong(0)
        val q = r.getSeq[Double](1)
        var qq = 0.0
        var i = 0
        while (i < q.length) { qq += q(i) * q(i); i += 1 }
        // nprobe nearest coarse centroids, SAME cross-engine float
        // contract as IvfAnn.assign / the oracle replay: |q|²−2q·c+|c|²
        // with every sum in array order, rounded to 1e-6 BEFORE the
        // compare, ties to the smaller cid
        val probed = cents.map { case (cid, cv) =>
          var dt = 0.0
          var cc = 0.0
          var j = 0
          while (j < cv.length) { dt += q(j) * cv(j); cc += cv(j) * cv(j); j += 1 }
          (r6(qq - 2 * dt + cc), cid)
        }.sorted.take(NPROBE).map(_._2)
        // exact 8×16 subspace-distance LUT — PqAnn.adcLut, the single
        // shared definition of the ADC float contract
        val lut = PqAnn.adcLut(q, byKey)
        probed.map(cid => Row(qid, cid, lut))
      }
      val probeSchema = StructType(Seq(
        StructField("q_id", LongType, nullable = false),
        StructField("pcid", IntegerType, nullable = false),
        StructField("lut", ArrayType(DoubleType, containsNull = false))))
      val probeDf = s.createDataFrame(
        s.sparkContext.parallelize(probeRows.toSeq, 1), probeSchema)
      val probedCids = probeRows.map(_.getInt(1)).distinct.sorted
      // partition-pruned read: only the probed buckets' code files
      // (literal cid predicates → PartitionFilters, asserted by spec)
      val bucketed = s.read.parquet(idxPath)
        .filter(col("cid").isin(probedCids.map(Int.box): _*))
      val ad2 = aggregate(sequence(lit(0), lit(M - 1)), lit(0.0),
        (acc, m) => acc + col("lut")(m * KC + col("codes")(m)))
      val scored = bucketed.join(broadcast(probeDf),
          bucketed("cid") === probeDf("pcid") && col("q_id") =!= col("vec_id"))
        .withColumn("ad2", ad2)
      val w = Window.partitionBy("q_id").orderBy(fround(col("ad2"), 6).asc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TOPK)
        .select(col("q_id"), col("vec_id").as("n_id"),
          fround(col("ad2"), 4).as("ad2"), col("rnk"))
        .orderBy("q_id", "rnk")
    },
    Some(oracleSql))

  private def dot(a: String, b: String) = s"list_sum([p[1]*p[2] for p in list_zip($a, $b)])"
  private def sq(a: String) = s"list_sum([x*x for x in $a])"
  private def d2r(v: String, cv: String) =
    s"floor((${sq(v)} - 2*${dot(v, cv)} + ${sq(cv)}) * 1e6 + 0.5) / 1e6"

  /** Full DuckDB replay: the SHARED PQ train chain ([[PqAnn.trainReplayCtes]]
    * — codebooks land in c{ITERS}), corpus encode, then the coarse k-means
    * replayed over the unit vectors `u` (g-prefixed CTEs, IvfAnn's oracle
    * pattern with the same rounding contracts), probe selection, LUT, and
    * the in-bucket ADC rollup (list_sum over m-ascending terms = the Spark
    * fold's summation order). */
  private lazy val oracleSql: String = {
    val K = IvfAnn.K
    val dim = M * SUBDIM
    def assignCte(src: String, cents: String, name: String) =
      s"$name AS (SELECT vec_id, v, cid FROM (SELECT t.vec_id, t.v, c.cid, " +
        s"row_number() OVER (PARTITION BY t.vec_id ORDER BY ${d2r("t.v", "c.cv")}, c.cid) AS rn " +
        s"FROM $src t CROSS JOIN $cents c) WHERE rn = 1)"
    def meansCte(a: String, prev: String, cname: String, mname: String) =
      s"$mname AS (SELECT cid, list(mu ORDER BY d) AS cv FROM (" +
        s"SELECT a.cid, g.d, floor(sum(a.v[g.d]) / count(*) * 1e9 + 0.5) / 1e9 AS mu " +
        s"FROM $a a CROSS JOIN generate_series(1, $dim) g(d) GROUP BY a.cid, g.d) GROUP BY cid), " +
        s"$cname AS (SELECT c.cid, COALESCE(m.cv, c.cv) AS cv FROM $prev c LEFT JOIN $mname m USING (cid))"
    val coarseIters = (1 to IvfAnn.ITERS).flatMap { i =>
      Seq(assignCte("gtr", s"gc${i - 1}", s"ga$i"),
        meansCte(s"ga$i", s"gc${i - 1}", s"gc$i", s"gm$i"))
    }.mkString(", ")
    val gcN = s"gc${IvfAnn.ITERS}"
    val cN = s"c${PqAnn.ITERS}"
    val hash = graft.functions.GraftFunctions.md5u32Sql("md5(vec_id::VARCHAR)")
    s"""WITH ${PqAnn.trainReplayCtes}, codes AS (SELECT vec_id, m, cid FROM (SELECT t.vec_id, t.m, c.cid, row_number() OVER (PARTITION BY t.vec_id, t.m ORDER BY ${d2r("t.sv", "c.cv")}, c.cid) AS rn FROM msub t JOIN $cN c ON c.m = t.m) WHERE rn = 1), gtr AS (SELECT vec_id, v FROM u WHERE $hash % 4 = 0), gc0 AS (SELECT CAST(rn - 1 AS INTEGER) AS cid, v AS cv FROM (SELECT v, row_number() OVER (ORDER BY md5(vec_id::VARCHAR)) AS rn FROM gtr) WHERE rn <= $K), $coarseIters, gidx AS (SELECT vec_id, cid FROM (SELECT t.vec_id, c.cid, row_number() OVER (PARTITION BY t.vec_id ORDER BY ${d2r("t.v", "c.cv")}, c.cid) AS rn FROM u t CROSS JOIN $gcN c) WHERE rn = 1), q AS (SELECT vec_id AS q_id, v AS qv FROM u WHERE vec_id % 50 = 0), gpr AS (SELECT q_id, cid FROM (SELECT q.q_id, c.cid, row_number() OVER (PARTITION BY q.q_id ORDER BY ${d2r("q.qv", "c.cv")}, c.cid) AS rn FROM q CROSS JOIN $gcN c) WHERE rn <= $NPROBE), qsub AS (SELECT vec_id AS q_id, m, sv AS qsv FROM msub WHERE vec_id % 50 = 0), lut AS (SELECT q.q_id, c.m, c.cid, list_sum([(p[1] - p[2]) * (p[1] - p[2]) for p in list_zip(q.qsv, c.cv)]) AS ld2 FROM qsub q JOIN $cN c ON c.m = q.m), cand AS (SELECT p.q_id, gi.vec_id FROM gpr p JOIN gidx gi ON gi.cid = p.cid AND gi.vec_id <> p.q_id), adc AS (SELECT cd.q_id, cd.vec_id, list_sum(list(l.ld2 ORDER BY l.m)) AS ad2 FROM cand cd JOIN codes k ON k.vec_id = cd.vec_id JOIN lut l ON l.q_id = cd.q_id AND l.m = k.m AND l.cid = k.cid GROUP BY 1, 2) SELECT q_id, vec_id AS n_id, floor(ad2 * 10000.0 + 0.5) / 10000.0 AS ad2, CAST(rnk AS INTEGER) AS rnk FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY floor(ad2 * 1000000.0 + 0.5) ASC, vec_id) AS rnk FROM adc) WHERE rnk <= $TOPK ORDER BY q_id, rnk"""
  }

  val all: Seq[GraftQuery] = Seq(query)
}
