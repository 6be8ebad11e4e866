package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SCALE_STRESS receipts are only as honest as the stress corpus:
  * these pin the construction invariants (rep=2 at sf0.001 — shape, not
  * scale) so a regression can't silently reintroduce the two measured
  * corpus artifacts (dangling user dimension: j_skew_salted doing
  * base-scale join work at "10x"; byte-identical document replicas:
  * dedup_minhash reading 12x from cross-replica LSH pairs). */
class StressCorpusSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private val rep = 2
  private lazy val stress = ScaleStress.buildStressCorpus(spark, sf, rep)
  private def base(t: String) = spark.read.parquet(s"$sf/$t.parquet")
  private def st(t: String) = spark.read.parquet(s"$stress/$t.parquet")

  test("fact tables replicate rep x with collision-free keys") {
    for ((t, k) <- Seq(("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
        ("documents", "doc_id"), ("events", "event_id"),
        ("customer", "c_custkey"))) {
      assert(st(t).count() == rep * base(t).count(), s"$t row count")
      val dk = Seq("orders", "documents", "events", "customer").contains(t)
      if (dk) assert(st(t).select(k).distinct().count() ==
        rep * base(t).select(k).distinct().count(),
        s"$t: replica key ranges must not collide")
    }
  }

  test("lineitem-orders join workload grows exactly rep x (shared span)") {
    def joined(li: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(joined(st("lineitem"), st("orders")) ==
      rep * joined(base("lineitem"), base("orders")))
  }

  test("every stress event user_id has a matching customer row (matched dimension)") {
    val dangling = st("events").select(col("user_id"))
      .join(st("customer"), col("user_id") === col("c_custkey"), "left_anti")
      .count()
    assert(dangling == 0,
      s"$dangling stress events dangle against the customer dimension — " +
        "fact-dim joins would do base-scale work while claiming rep-x")
  }

  test("events-customer join workload grows exactly rep x") {
    def joined(e: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      e.join(c, col("user_id") === col("c_custkey")).count()
    assert(joined(st("events"), st("customer")) ==
      rep * joined(base("events"), base("customer")))
  }

  test("event replicas land in disjoint time windows (constant temporal density)") {
    val baseDays = base("events").select(to_date(col("ts"))).distinct().count()
    val stressDays = st("events").select(to_date(col("ts"))).distinct().count()
    assert(stressDays == rep * baseDays,
      "replica clocks overlap — time-band self-joins would inter-match replicas")
  }

  test("no document text survives into another replica byte-identical") {
    // replica id recovers from the doc_id shift; a text present in >1
    // replica means the letter rotation failed to make it distinct and
    // LSH buckets would inter-match replicas
    val docSpan = base("documents").agg(max("doc_id")).head.getLong(0) + 1
    val cross = st("documents")
      .select((col("doc_id") / lit(docSpan)).cast("int").as("replica"), col("text"))
      .groupBy("text").agg(countDistinct("replica").as("n_rep"))
      .filter(col("n_rep") > 1).count()
    assert(cross == 0, s"$cross texts appear byte-identical in >1 replica")
  }

  test("rotation preserves per-document statistics (length, token boundaries)") {
    val b = base("documents").select(col("doc_id"),
      length(col("text")).as("len"), size(split(col("text"), " ")).as("toks"))
    val docSpan = base("documents").agg(max("doc_id")).head.getLong(0) + 1
    val s1 = st("documents").filter(col("doc_id") >= docSpan)
      .select((col("doc_id") - docSpan).as("doc_id"),
        length(col("text")).as("len2"), size(split(col("text"), " ")).as("toks2"))
    val mismatched = b.join(s1, "doc_id")
      .filter(col("len") =!= col("len2") || col("toks") =!= col("toks2"))
      .count()
    assert(mismatched == 0,
      "rotation must be 1:1 on characters — lengths/token counts changed")
  }

  test("rep above the permutation-collision bound fails loudly instead of repeating") {
    // 12 coprime multipliers x 26 shifts = 312 distinct affine letter maps
    val e = intercept[IllegalArgumentException] {
      ScaleStress.buildStressCorpus(spark, sf, ScaleStress.MaxRep + 1)
    }
    assert(e.getMessage.contains("would repeat"))
  }

  test("letter permutations: identity at replica 0, pairwise distinct, LETTERS ALONE") {
    // The collision bound must hold with NO digit contribution — this
    // corpus's texts carry no digits, and the round-14 rep2=30 run
    // briefly proved that a letters-repeat-at-26 family silently builds
    // byte-identical replicas 26..29 (cross-replica LSH inter-matching).
    val perms = (0 until ScaleStress.MaxRep).map(ScaleStress.letterPerm)
    val (f0, t0) = perms(0)
    assert(f0 == t0, "replica 0 must be the identity permutation")
    assert(perms.map(_._2).distinct.size == ScaleStress.MaxRep,
      "every replica's letter permutation must be distinct — byte-identical " +
        "replica texts would quadratically inter-match inside LSH buckets")
    // each is a true permutation (bijection on the 26+26 letter alphabet)
    perms.foreach { case (from, to) =>
      assert(to.toSet.size == from.length && to.toSet == from.toSet)
    }
  }

  // --- the Zipf-skew corpus variant (round 14) -----------------------
  // hotSkew re-keys ⌈rep·HotFrac⌉ replicas to ONE user / ONE 8-gram; the
  // skew receipts in SCALE_STRESS.json are only as honest as these
  // invariants: the hot share must actually be ~HotFrac, the hot user
  // must still match the customer dimension (else the salted join does
  // less work under "skew"), and the non-hot replicas must keep every
  // uniform-corpus property.
  private val srep = 5 // ceil(5 * 0.2) = 1 hot replica = 20% share
  private lazy val skew = ScaleStress.buildStressCorpus(spark, sf, srep, hotSkew = true)
  private def sk(t: String) = spark.read.parquet(s"$skew/$t.parquet")

  test("skew corpus: one user owns exactly the hot replicas' share of events") {
    val total = sk("events").count()
    assert(total == srep * base("events").count(), "volume must still be rep x")
    val top = sk("events").groupBy("user_id").count()
      .orderBy(col("count").desc).limit(1).head
    val hotReps = math.ceil(srep * ScaleStress.HotFrac).toInt
    assert(top.getLong(1) >= hotReps.toLong * base("events").count(),
      s"hot user owns ${top.getLong(1)} of $total events — expected at " +
        s"least $hotReps base-corpus replicas' worth")
  }

  test("skew corpus: the hot user still matches the customer dimension") {
    val dangling = sk("events").select(col("user_id"))
      .join(sk("customer"), col("user_id") === col("c_custkey"), "left_anti")
      .count()
    assert(dangling == 0,
      "hot-key events dangle against the customer dimension — the salted " +
        "join would do less inner-join work under 'skew' than uniform")
  }

  test("skew corpus: one 8-gram dominates the hot replicas' documents") {
    val docSpan = base("documents").agg(max("doc_id")).head.getLong(0) + 1
    val hotDocs = sk("documents")
      .filter(col("doc_id") >= docSpan && col("doc_id") < 2 * docSpan)
    // every hot doc is the one-token repetition => all its 8-grams equal
    assert(hotDocs.select(countDistinct("text")).head.getLong(0) == 1,
      "hot replica texts must collapse to one repeated-token document")
    assert(hotDocs.count() == base("documents").count())
    // replica 0 stays the untouched base corpus (rotation identity)
    val r0 = sk("documents").filter(col("doc_id") < docSpan)
      .select("doc_id", "text")
    val diff = r0.exceptAll(base("documents").select("doc_id", "text")).count()
    assert(diff == 0, "skew corpus replica 0 must remain the base corpus")
  }

  test("skew corpus: clock shifts survive re-keying (disjoint time windows)") {
    val baseDays = base("events").select(to_date(col("ts"))).distinct().count()
    assert(sk("events").select(to_date(col("ts"))).distinct().count() ==
      srep * baseDays,
      "hot replicas must keep their clock shift — only the KEY concentrates")
  }
}
