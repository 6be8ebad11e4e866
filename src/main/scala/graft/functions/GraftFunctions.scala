package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared column-level building blocks. Everything here composes Catalyst
  * built-ins (codegen'd, no Scala UDFs) so expressions stay inside
  * whole-stage codegen and push down where possible.
  */
object GraftFunctions {

  /** Fixed-point scaling: a money-like column with <= 2 decimal digits becomes
    * an exact integer of centi-units. Distributed sums of these are exact
    * (order-independent) integers, so statistics derived from them are
    * bit-identical across engines, partition counts, and replays — unlike
    * floating-point sums, whose last-ulp noise can flip a rounding boundary.
    * Spelled floor(x*100 + 0.5) — NOT engine round() — for the same reason
    * as [[fround]]: Spark's round() goes through BigDecimal HALF_UP of the
    * shortest decimal string while DuckDB's multiplies and rounds, so a
    * boundary double (x.xx5) can scale to different integers. floor is the
    * same IEEE arithmetic in both engines. DuckDB equivalent (keep in
    * lockstep everywhere): CAST(floor(x * 100 + 0.5) AS BIGINT).
    */
  def centi(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** Engine-portable rounding for division-derived doubles. Spark's round()
    * goes through the shortest decimal string (BigDecimal HALF_UP) while
    * DuckDB multiplies and rounds — on a boundary double (x.xxx5) they can
    * disagree even for bit-identical inputs. floor(x*10^k + 0.5)/10^k is the
    * same arithmetic in both engines, so identical input bits guarantee
    * identical output. DuckDB spelling: floor(x * 1eK + 0.5) / 1eK.
    */
  def fround(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** u = first 32 md5 bits of a string column as a BIGINT — the repo's
    * standard deterministic hash for sampling/splitting/minhashing.
    * THE LOCKSTEP INVARIANT: `md5u32Sql` below must compute the identical
    * value in DuckDB (which has no hex→int conv, so it evaluates an 8-term
    * nibble polynomial over the hex digits). Every oracle that replays a
    * hash decision uses the pair; keep them together and change them
    * together. */
  def md5u32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB spelling of [[md5u32]] over `hexExpr`, a SQL expression that
    * evaluates to the md5 hex string (e.g. "md5(CAST(doc_id AS VARCHAR))"
    * or a column holding it). */
  def md5u32Sql(hexExpr: String): String =
    (0 until 8).map { j =>
      val w = math.pow(16, 7 - j).toLong
      s"(instr('0123456789abcdef', substr($hexExpr, ${j + 1}, 1)) - 1) * $w"
    }.mkString("(", " + ", ")")

  /** One 32-bit word of md5(c) as a BIGINT, starting at 1-based hex digit
    * `from` (1 = high word, 9 = low word) — the row-hash halves of the
    * qa_table_checksum anti-entropy primitive. */
  def md5Word(c: Column, from: Int): Column =
    conv(substring(md5(c), from, 8), 16, 10).cast("long")

  /** Order-independent XOR-fold checksum of a frame under the given
    * canonical row string: one row (n_rows, xor_hi, xor_lo). XOR is
    * commutative + associative, so partial folds over ANY partitioning or
    * micro-batching merge to the same triple (StreamChecksumSpec proves the
    * stream merge against THIS definition). qa_table_checksum builds its
    * per-table legs on this; spec and production share it so the
    * streamability proof stays attached to the shipped primitive. */
  def xorChecksum(df: DataFrame, canon: Column): DataFrame =
    df.select(md5Word(canon, 1).as("hi"), md5Word(canon, 9).as("lo"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(hi)").as("xor_hi"), expr("bit_xor(lo)").as("xor_lo"))

  /** Lower-cased whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** THE corpus stopword list — shared by the quality score (TextOps), the
    * filter gate (PipelineOps), and importance sampling (CurationOps, via
    * [[stopwordsSqlList]]). One definition: a curation pipeline where
    * "stop_ratio" means different lists in different stages silently
    * misgrades documents. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "in")

  /** The stopword list as a SQL IN-list literal, for oracle spellings. */
  def stopwordsSqlList: String = stopwords.map("'" + _ + "'").mkString(", ")

  /** The shared quality composite over a token array: exact integer ratios
    * (stopword share, long-token share, length band) combined with fixed
    * weights. Every consumer — scoring, gating, sampling — must derive
    * from these builders so a weight/threshold change propagates. */
  def stopRatio(t: Column): Column =
    size(filter(t, x => x.isInCollection(stopwords))).cast("double") / size(t)
  def longRatio(t: Column): Column =
    size(filter(t, x => length(x) > lit(4))).cast("double") / size(t)
  def lenOk(t: Column): Column =
    when(size(t).between(20, 200), lit(1.0)).otherwise(lit(0.0))
  def qualityScore(stop: Column, long: Column, lenBand: Column): Column =
    stop * 0.3 + long * 0.4 + lenBand * 0.3

  /** Importance-sampling keep decision (keep-prob = 0.2 + 0.8 * quality,
    * md5-derived uniform) — ONE Column-side definition shared by
    * samp_importance, the curation funnel, and the audit trail, so the
    * mixing weights can't drift between the sampler and its reports.
    * [[impKeepSql]] is the equivalent inline DuckDB predicate over a doc
    * row exposing `doc_id` and a token-list column `t`. */
  def impWeight(t: Column): Column =
    lit(0.2) + lit(0.8) * qualityScore(stopRatio(t), longRatio(t), lenOk(t))
  def impU01(docId: Column): Column =
    md5u32(concat(lit("imp:"), docId.cast("string")))
      .cast("double") / lit(4294967296.0)
  def impKeep(t: Column, docId: Column): Column = impU01(docId) < impWeight(t)
  def impKeepSql: String =
    s"CAST(${md5u32Sql("md5('imp:' || CAST(doc_id AS VARCHAR))")} AS DOUBLE) / 4294967296.0 < 0.2 + 0.8 * (CAST(len(list_filter(t, x -> x IN ($stopwordsSqlList))) AS DOUBLE) / len(t) * 0.3 + CAST(len(list_filter(t, x -> length(x) > 4)) AS DOUBLE) / len(t) * 0.4 + (CASE WHEN len(t) BETWEEN 20 AND 200 THEN 1.0 ELSE 0.0 END) * 0.3)"

  /** n-token shingles of a token array, joined by single spaces.
    * Guarded: fewer than n tokens => empty array (Spark's `sequence(1, k)`
    * would generate a DESCENDING range for k < 1, so the guard is load-bearing).
    */
  def shingles(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - (n - 1))
    val mk = transform(idx, i =>
      concat_ws(" ", (0 until n).map(k => element_at(toks, (i + lit(k)).cast("int"))): _*))
    when(size(toks) < n, array().cast("array<string>")).otherwise(mk)
  }

  /** Cast a float vector to double for numerically stable math. The
    * coalesce makes the element type provably non-nullable (parquet list
    * elements default to containsNull=true even when no nulls exist):
    * vector math treats a null component as 0.0, and the non-null type is
    * what lets SelfDotRewrite fire (it must not rewrite nullable-element
    * arrays — see GraftExtensions). */
  def vecDouble(v: Column): Column =
    transform(v, x => coalesce(x.cast("double"), lit(0.0)))

  /** Dot product of two double arrays — sequential left fold, which matches
    * DuckDB's list_sum over the zipped products bit-for-bit in practice.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a double array. */
  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine similarity given precomputed norms (avoids recomputing norms in
    * an all-pairs join — norms are computed once per row, not once per pair).
    */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)
}
