package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariant + independent-reimplementation checks for the round-8
  * operators. */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- duplicated-span detection -------------------------------------------

  test("dedup_dup_spans: every reported span is a genuine verbatim token match") {
    val spans = run("dedup_dup_spans").collect()
    assert(spans.nonEmpty && spans.forall(_.getLong(2) >= 8L),
      "spans shorter than the gram size are impossible")
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    spans.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (len, sa, sb) = (r.getLong(2).toInt, r.getLong(3).toInt, r.getLong(4).toInt)
      val sliceA = texts(a).slice(sa, sa + len)
      val sliceB = texts(b).slice(sb, sb + len)
      assert(sliceA == sliceB, s"span ($a,$b,$len,$sa,$sb) is not verbatim")
    }
  }

  test("dedup_dup_spans: spans are maximal (not extendable on either side)") {
    val spans = run("dedup_dup_spans").collect()
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    spans.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (len, sa, sb) = (r.getLong(2).toInt, r.getLong(3).toInt, r.getLong(4).toInt)
      val (ta, tb) = (texts(a), texts(b))
      val leftExt = sa > 0 && sb > 0 && ta(sa - 1) == tb(sb - 1)
      val rightExt = sa + len < ta.length && sb + len < tb.length &&
        ta(sa + len) == tb(sb + len)
      assert(!leftExt && !rightExt, s"span ($a,$b,$len,$sa,$sb) is extendable")
    }
  }

  // ---- two-pass exact median ------------------------------------------------

  test("agg_median_twopass matches a direct in-memory median per group") {
    val got = run("agg_median_twopass").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("pc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    raw.foreach { case (flag, sortedPc) =>
      val n = sortedPc.length
      val med = (sortedPc((n - 1) / 2) + sortedPc(n / 2)) / 2.0 / 100.0
      val (gn, gmed) = got(flag)
      assert(gn == n.toLong)
      assert(math.abs(gmed - math.floor(med * 1e4 + 0.5) / 1e4) < 1e-9,
        s"$flag: got $gmed want $med")
    }
  }

  // ---- ALL-quantified subquery ---------------------------------------------

  test("sq_all_quantified equals the brute per-customer ALL evaluation") {
    val got = run("sq_all_quantified").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byCust = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("pc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val qualifying = byCust.filter { case (_, pcs) => pcs.forall(_ >= 5000000L) }
    val seg = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = qualifying.toSeq.groupBy { case (ck, _) => seg(ck) }
      .map { case (sg, xs) =>
        sg -> (xs.size.toLong, xs.map(_._2.size.toLong).sum) }
    assert(got == want)
  }

  // ---- symmetric difference -------------------------------------------------

  test("set_symdiff row count equals |A∪B| − |A∩B| and sides are disjoint") {
    val out = run("set_symdiff").collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("dy"), col("event_type"))
    val a = ev.filter(col("event_type") === "click")
      .select("user_id", "dy").distinct()
    val b = ev.filter(col("event_type") === "purchase")
      .select("user_id", "dy").distinct()
    val union = a.union(b).distinct().count()
    val inter = a.intersect(b).count()
    assert(out.length.toLong == union - inter)
    val keys = out.map(r => (r.getLong(0), r.getDate(1).toString))
    assert(keys.distinct.length == keys.length, "a key appears on both sides")
  }
}
