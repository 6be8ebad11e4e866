package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariant + independent-reimplementation checks for the round-7
  * operators, plus the pinned session_window boundary semantics the
  * win_session_native doc claims. */
class Round7OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- session_window boundary semantics (pins AnalyticsOps's one-ulp doc) --

  test("session_window boundary: an exact-gap arrival MERGES (inclusive), gap+1us splits — same rule as the lag/> formulation") {
    import spark.implicits._
    def ts(deltaUs: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1704067200L + deltaUs / 1000000L,
        (deltaUs % 1000000L) * 1000L))
    def sessions(deltaUs: Long): Int =
      Seq((1L, ts(0L)), (1L, ts(deltaUs))).toDF("user_id", "ts")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .count().collect().length
    def laggedSessions(deltaUs: Long): Long =
      Seq((1L, ts(0L)), (1L, ts(deltaUs))).toDF("user_id", "ts")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev", lag("us", 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("us")))
        .withColumn("new_s",
          when(col("prev").isNull || col("us") - col("prev") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .agg(sum("new_s")).collect().head.getLong(0)
    // the boundary triple, native built-in
    assert(sessions(1799999999L) == 1, "gap-1us merges")
    assert(sessions(1800000000L) == 1,
      "session_window merges an arrival at EXACTLY last+gap (touching windows merge)")
    assert(sessions(1800000001L) == 2, "gap+1us splits")
    // the lag/> two-window formulation agrees at every boundary point —
    // the two formulations are equivalent on session MEMBERSHIP (they
    // differ only in reported end: last+gap vs max(ts))
    assert(laggedSessions(1799999999L) == 1L)
    assert(laggedSessions(1800000000L) == 1L)
    assert(laggedSessions(1800000001L) == 2L)
  }

  // ---- bitmap distinct ------------------------------------------------------

  test("graft_bitmap_distinct equals countDistinct across any partitioning and skips nulls") {
    import spark.implicits._
    graft.functions.expressions.GraftExpressions.ensureRegistered(spark)
    val ids = Seq[Option[Long]](Some(3L), Some(7L), Some(3L), None, Some(0L),
      Some(1024L), Some(7L), Some(65536L), None, Some(3L))
    val df = ids.toDF("id").repartition(7) // force multi-partition merge
    val got = df.selectExpr("graft_bitmap_distinct(id, 1048576) AS n")
      .collect().head.getLong(0)
    val want = df.agg(countDistinct("id")).collect().head.getLong(0)
    assert(got == want && got == 5L)
  }

  test("graft_bitmap_distinct rejects out-of-range ids loudly (silent drop would corrupt the exact count)") {
    import spark.implicits._
    graft.functions.expressions.GraftExpressions.ensureRegistered(spark)
    val bad = Seq(5L, -1L).toDF("id")
    val e = intercept[Exception] {
      bad.selectExpr("graft_bitmap_distinct(id, 100)").collect()
    }
    assert(e.getMessage != null)
  }

  test("agg_bitmap_distinct matches the Expand-based countDistinct per group") {
    val got = run("agg_bitmap_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf).groupBy("event_type")
      .agg(countDistinct("user_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  // ---- systematic sampling --------------------------------------------------

  test("samp_systematic: exact ceil(n/10) rows at stride 10, ranks 1,11,21,…, ids match driver-side md5 order") {
    val rows = run("samp_systematic").collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.length == ((n + 9) / 10).toInt)
    assert(rows.map(_.getLong(0)).toSeq == (1L to n by 10L).toSeq)
    // independent reimplementation: collect ids, md5-order in the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val expect = ids.map(i => (u32(i.toString), i)).sorted.map(_._2)
      .zipWithIndex.collect { case (id, ix) if ix % 10 == 0 => id }
    assert(rows.map(_.getLong(1)).toSeq == expect.toSeq)
  }

  // ---- PCA power iteration --------------------------------------------------

  test("emb_pca_power matches an independent driver-side BigInt power iteration") {
    val got = run("emb_pca_power").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x =>
        BigInt(math.floor(x.toDouble * 1e6 + 0.5).toLong)))
    var v = Array.fill(64)(BigInt(125000))
    for (_ <- 1 to 3) {
      val y = Array.fill(64)(BigInt(0))
      vecs.foreach { x =>
        val s = (0 until 64).map(i => x(i) * v(i)).sum
        (0 until 64).foreach(i => y(i) += x(i) * s)
      }
      val my = y.map(_.abs).max
      v = y.map(yd =>
        (if (yd < 0) BigInt(-1) else BigInt(1)) * ((2 * yd.abs * 1000000 + my) / (2 * my)))
    }
    assert((1 to 64).forall(dm => got(dm) == v(dm - 1).toLong))
    assert(v.map(_.abs).max == BigInt(1000000), "max-norm: the dominant dim maps to ±1e6")
  }

  test("emb_pca_var: dominant-direction share is within [1/64, 1]") {
    val ve = run("emb_pca_var").collect().head.getDouble(1)
    assert(ve >= 1.0 / 64 && ve <= 1.0,
      s"a dominant direction must carry at least the average per-axis share, got $ve")
  }

  test("emb_kmeanspp_seed matches a driver-side farthest-point replay; inertia strictly decreases") {
    val got = run("emb_kmeanspp_seed").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
    assert(got.map(_._2).distinct.length == 3, "seeds must be distinct")
    assert(got(0)._3 > got(1)._3 && got(1)._3 > got(2)._3, "inertia must strictly decrease")
    // independent replay
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(x =>
        math.floor(x.toDouble * 1e6 + 0.5).toLong))
    def d2(a: Array[Long], b: Array[Long]): Long =
      (0 until 64).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val byId = vecs.toMap
    val seed1 = vecs.map { case (id, _) => (u32(s"seed:$id"), id) }.min._2
    var dmin = vecs.map { case (id, v) => id -> d2(v, byId(seed1)) }.toMap
    val replay = scala.collection.mutable.ArrayBuffer((1, seed1, dmin.values.map(BigInt(_)).sum))
    for (rk <- 2 to 3) {
      val next = dmin.toSeq.map { case (id, dm) => (-dm, id) }.min._2
      dmin = dmin.map { case (id, dm) => id -> math.min(dm, d2(byId(id), byId(next))) }
      replay += ((rk, next, dmin.values.map(BigInt(_)).sum))
    }
    assert(got.map(t => (t._1, t._2, BigInt(t._3))).toSeq == replay.toSeq)
  }

  // ---- rolling DAU ----------------------------------------------------------

  test("evt_rolling_dau: dau7 bounds — >= same-day dau, <= 7-day dau sum, first day equal") {
    val rows = run("evt_rolling_dau").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
      .sortBy(_._1.toEpochDay)
    assert(rows.nonEmpty)
    val byDay = rows.map(r => r._1.toEpochDay -> r._2).toMap
    rows.foreach { case (day, dau, dau7) =>
      assert(dau7 >= dau, s"$day: rolling below same-day")
      val windowSum = (0L to 6L).flatMap(k => byDay.get(day.toEpochDay - k)).sum
      assert(dau7 <= windowSum, s"$day: rolling exceeds sum of dailies")
    }
    assert(rows.head._2 == rows.head._3, "first observed day: window has one day")
  }

  // ---- attribution ----------------------------------------------------------

  test("evt_attribution: conserves purchases; channels are event types or 'direct'") {
    val rows = run("evt_attribution").collect()
    val totalPurch = rows.map(_.getLong(1)).sum
    val want = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(totalPurch == want)
    val valid = Set("click", "error", "signup", "view", "direct")
    assert(rows.map(_.getString(0)).forall(valid.contains))
  }

  // ---- first/last window ----------------------------------------------------

  test("win_first_last: one row per user, n_events conserves the event count") {
    val rows = run("win_first_last").collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.map(_.getLong(4)).sum == Tables.events(spark, sf).count())
  }

  // ---- benford --------------------------------------------------------------

  test("qa_benford: 9 digits, expected ppm sums to exactly 1e6, observed within rounding") {
    val rows = run("qa_benford").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    assert(rows.map(_.getLong(3)).sum == 1000000L)
    val shareSum = rows.map(_.getLong(2)).sum
    assert(math.abs(shareSum - 1000000L) <= 9, s"share ppm sum $shareSum")
  }

  // ---- MAD outliers ---------------------------------------------------------

  test("qa_outlier_mad: per-type outliers bounded and med/mad positive") {
    val rows = run("qa_outlier_mad").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) < r.getLong(1),
        "outliers are a strict minority")
      assert(r.getDouble(2) > 0 && r.getDouble(3) >= 0)
    }
  }

  // ---- snapshot diff --------------------------------------------------------

  test("mv_snapshot_diff: append-only source — counts never shrink, statuses consistent") {
    val rows = run("mv_snapshot_diff").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (status, oldN, newN) = (r.getString(1), r.getLong(2), r.getLong(3))
      assert(newN >= oldN)
      status match {
        case "added"     => assert(oldN == 0L)
        case "unchanged" => assert(oldN == newN)
        case "changed"   => assert(newN > oldN)
        case other       => fail(s"unknown status $other")
      }
    }
  }

  test("agg_bitmap_overlap: bitmap AND equals driver-side set intersection per segment pair") {
    val got = run("agg_bitmap_overlap").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val segs = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val types = segs.keys.toSeq.sorted
    for (i <- types.indices; j <- i + 1 until types.length) {
      val (t1, t2) = (types(i), types(j))
      val (n1, n2, ov) = got((t1, t2))
      assert(n1 == segs(t1).size && n2 == segs(t2).size)
      assert(ov == segs(t1).intersect(segs(t2)).size, s"($t1,$t2)")
    }
  }

  test("mv_scd2_asof: one row per key; version 2 iff key changed (%7), PROMO segment") {
    val rows = run("mv_scd2_asof").collect()
    val nKeys = Tables.customer(spark, sf).count()
    assert(rows.length == nKeys)
    rows.foreach { r =>
      val (k, ver, seg) = (r.getLong(0), r.getInt(1), r.getString(2))
      if (k % 7 == 0) assert(ver == 2 && seg == "PROMO", s"key $k")
      else assert(ver == 1 && seg != "PROMO", s"key $k")
    }
  }

  // ---- streaming bitmap distinct --------------------------------------------

  test("graft_bitmap_distinct works as streaming state: per-type distinct users equal the batch answer") {
    // the bitmap's serialize/merge IS the streaming state contract — a
    // TypedImperativeAggregate in a streaming groupBy stores the serialized
    // buffer in the state store and merges partials per micro-batch
    graft.functions.expressions.GraftExpressions.ensureRegistered(spark)
    val dir = java.nio.file.Files.createTempDirectory("bitmap-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val src = graft.streaming.EventStreamSource.fromDir(spark, dir.toString)
    val agg = src.groupBy("event_type")
      .agg(expr("graft_bitmap_distinct(user_id, 1048576)").as("n_users"))
    val q = agg.writeStream.format("memory").queryName("bitmap_dau")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("bitmap_dau").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf).groupBy("event_type")
      .agg(countDistinct("user_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  // ---- nearest as-of join ---------------------------------------------------

  test("j_asof_nearest matches a driver-side brute-force nearest-error search") {
    val got = run("j_asof_nearest").collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val errsByUser = ev.filter(_._4 == "error").groupBy(_._1)
    val tol = 21600L * 1000000L
    val want = ev.filter(_._4 == "purchase").flatMap { case (u, pid, us, _) =>
      val cands = errsByUser.getOrElse(u, Array.empty)
        .map { case (_, eid, eus, _) => (eid, eus - us) }
        .filter(c => math.abs(c._2) <= tol)
      if (cands.isEmpty) None
      else {
        // nearest; equidistant ties to the earlier (negative delta) side
        val best = cands.minBy(c => (math.abs(c._2), c._2))
        Some(pid -> best)
      }
    }.toMap
    assert(got == want)
  }

  // ---- cume_dist ------------------------------------------------------------

  test("win_cume_dist: cd in (0,1], monotone per event type, ends at 1") {
    val rows = run("win_cume_dist").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.head._3 > 0 && sorted.last._3 == 1.0)
      assert(sorted.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
    }
  }

  // ---- zipf fit -------------------------------------------------------------

  test("txt_zipf_fit: negative slope, r2 in [0,1], n = min(vocab, 100)") {
    val r = run("txt_zipf_fit").collect().head
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .agg(countDistinct("t")).collect().head.getLong(0)
    assert(r.getLong(0) == math.min(vocab, 100L))
    assert(r.getDouble(1) < 0, "Zipf slope must be negative")
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
  }

  // ---- sweep-line concurrency -----------------------------------------------

  test("rel_sweep_concurrency conserves total session-time: sum(level * dur) = sum(session lengths)") {
    val rows = run("rel_sweep_concurrency").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.forall(_._1 >= 1))
    val weighted = rows.map { case (c, us) => c * us }.sum
    // independent: session intervals from the same gap rule, summed directly
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val sessLen = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("us", 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum("new_s").over(byUser))
      .groupBy("user_id", "sess")
      .agg((max("us") - min("us") + 1).as("len"))
      .agg(sum("len")).collect().head.getLong(0)
    assert(weighted == sessLen,
      s"level-weighted duration $weighted != total session time $sessLen")
  }

  // ---- feature hashing ------------------------------------------------------

  test("txt_feature_hashing: nnz <= 256, counts conserve tokens, norm bounds hold") {
    val rows = run("txt_feature_hashing").collect()
    val tokCounts = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == tokCounts.size)
    rows.foreach { r =>
      val (id, nnz, sq, mx) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val n = tokCounts(id)
      assert(nnz >= 1 && nnz <= math.min(256L, n))
      assert(mx * mx <= sq && sq <= n * n)
      // sq_norm >= n (sum of c^2 >= sum of c when c >= 1)
      assert(sq >= n)
    }
  }

  // ---- multimodal resize ----------------------------------------------------

  test("mm_resize_grid: 64 samples per doc, byte-range stats, driver replay of one doc") {
    val rows = run("mm_resize_grid").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sum, mn, mx) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n == 64L)
      assert(mn >= 0 && mx <= 255 && mn <= mx)
      assert(sum >= 64 * mn && sum <= 64 * mx)
    }
    // replay the strided sampling for the first doc
    val doc = Tables.documents(spark, sf).orderBy("doc_id")
      .select("doc_id", "text").collect().head
    val bytes = doc.getString(1).getBytes("UTF-8")
    val samples = (0 until 64).map(k => (bytes((k.toLong * bytes.length / 64).toInt) & 0xff).toLong)
    val got = rows.find(_.getLong(0) == doc.getLong(0)).get
    assert(got.getLong(2) == samples.sum && got.getLong(3) == samples.min &&
      got.getLong(4) == samples.max)
  }

  // ---- BPE merge step -------------------------------------------------------

  test("txt_bpe_merge_step applies the argmax pair and matches a driver-side replay") {
    val rows = run("txt_bpe_merge_step").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val appliedPair = rows.head._1
    assert(rows.forall(_._1 == appliedPair))
    // replay: word-frequency table -> top pair -> java replace (same
    // left-to-right non-overlap semantics as SQL replace) -> recount
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).filter(_._1.length >= 2)
    def pairCounts(words: Seq[(String, Long)]): Map[String, Long] =
      words.flatMap { case (w, c) =>
        (0 until w.length - 1).map(i => w.substring(i, i + 2) -> c)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val top = pairCounts(vocab.toSeq).toSeq.minBy { case (p, c) => (-c, p) }._1
    assert(top == appliedPair)
    val merged = vocab.toSeq.map { case (w, c) => w.replace(top, "~") -> c }
      .filter(_._1.length >= 2)
    val want = pairCounts(merged).toSeq.sortBy { case (p, c) => (-c, p) }.take(10)
    assert(rows.map(r => (r._2, r._3)).toSeq == want)
  }

  // ---- neighbor jaccard -----------------------------------------------------

  test("graph_neighbor_jaccard: scores in (0, 1e6], union >= shared, canonical pair order") {
    val rows = run("graph_neighbor_jaccard").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(3) >= r.getLong(2))
      assert(r.getLong(4) > 0 && r.getLong(4) <= 1000000L)
    }
    val scores = rows.map(_.getLong(4)).toSeq
    assert(scores == scores.sorted.reverse, "ranked by jacc_micro desc")
  }

  // ---- business-day closed form ---------------------------------------------

  test("cal_business_days closed form equals brute-force weekday count on every (start-weekday, span) pair") {
    // brute force over the exact domain the closed form covers: spans
    // 0..60 days from each possible start weekday
    def brute(start: java.time.LocalDate, n: Int): Int =
      (0 until n).count { k =>
        val dw = start.plusDays(k.toLong).getDayOfWeek.getValue // 1=Mon..7
        dw <= 5
      }
    def closed(w1: Int, n: Int): Int = {
      val rem = n % 7
      (n / 7) * 5 + math.max(0, math.min(5, w1 + rem) - w1) +
        math.max(0, math.min(5, w1 + rem - 7))
    }
    val base = java.time.LocalDate.of(2024, 1, 1) // a Monday
    for (off <- 0 until 7; n <- 0 to 60) {
      val d1 = base.plusDays(off.toLong)
      val w1 = d1.getDayOfWeek.getValue - 1
      assert(closed(w1, n) == brute(d1, n), s"w1=$w1 n=$n")
    }
    // and the registered query agrees with a per-row Spark recompute
    val rows = run("cal_business_days").collect()
    assert(rows.length == 5 && rows.forall(_.getLong(3) >= 0L))
  }

  // ---- islands --------------------------------------------------------------

  test("win_islands: invariants vs the distinct-day table (sum of streaks = active days, longest <= span)") {
    val got = run("win_islands").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val du = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy("user_id")
      .agg(count(lit(1)).as("nd"), min("day").as("mn"), max("day").as("mx"))
      .collect()
    assert(du.nonEmpty && got.nonEmpty && du.length == got.size)
    du.foreach { r =>
      val (nActive, nIslands, longest) = got(r.getLong(0))
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        r.getDate(2).toLocalDate, r.getDate(3).toLocalDate) + 1
      assert(nActive == r.getLong(1), "sum of island lengths = distinct days")
      assert(longest <= span && nIslands >= 1 && longest >= 1)
    }
  }

  // ---- lambda serving view --------------------------------------------------

  test("mv_lambda_serving: layers partition cleanly at the watermark and union equals the from-scratch rollup") {
    val rows = run("mv_lambda_serving").collect()
    val cut = java.time.LocalDate.of(2024, 1, 25)
    rows.foreach { r =>
      val day = r.getDate(1).toLocalDate
      val layer = r.getString(4)
      assert(if (day.isBefore(cut)) layer == "batch" else layer == "speed",
        s"day $day served from $layer")
    }
    // no (type, day) grain appears in both layers
    val grains = rows.map(r => (r.getString(0), r.getDate(1).toString))
    assert(grains.distinct.length == grains.length, "grain straddles the watermark")
  }

  // ---- mutual information ---------------------------------------------------

  test("qa_mutual_info: 0 <= MI <= min(H), U in [0,1], entropies bounded by ln(k)") {
    val r = run("qa_mutual_info").collect().head
    val (mi, hl, hs, u) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val tol = 1e-4 // micro-nat floor-rounding slack across the three sums
    assert(mi >= -tol && mi <= math.min(hl, hs) + tol)
    assert(hl >= 0 && hs >= 0 && u >= -tol && u <= 1 + tol)
    val nLang = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(hl <= math.log(nLang.toDouble) + tol, "H(lang) <= ln(#langs)")
  }

  // ---- keyness --------------------------------------------------------------

  test("txt_keyness_g2: 8 ranked rows per source, counts consistent, G2 nonneg and rank-ordered") {
    val rows = run("txt_keyness_g2").collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.forall(_._2.length == 8))
    bySource.values.foreach { rs =>
      val g2s = rs.sortBy(_.getInt(1)).map(_.getDouble(6)).toSeq
      assert(g2s == g2s.sorted.reverse, "g2 descending by rank")
      assert(g2s.forall(_ >= 0.0), "top-8 G2 values nonneg")
    }
    // spot-check counts for the global top row against a direct recompute
    val top = rows.minBy(r => (r.getString(0), r.getInt(1)))
    val (src, tok) = (top.getString(0), top.getString(2))
    val n = Tables.documents(spark, sf)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") === tok)
      .groupBy("source").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top.getLong(3) == n.getOrElse(src, 0L), "n_in_source")
    assert(top.getLong(4) == n.filter(_._1 != src).values.sum, "n_elsewhere")
  }

  // ---- Kaplan-Meier ---------------------------------------------------------

  test("evt_survival_km: risk sets strictly decrease, survival non-increasing from <=1, removals sum to users") {
    val rows = run("evt_survival_km").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val risks = rows.map(_.getLong(1)).toSeq
    assert(risks == risks.sorted.reverse && risks.distinct == risks,
      "n_at_risk strictly decreasing in t")
    val surv = rows.map(_.getDouble(4)).toSeq
    assert(surv.head <= 1.0 + 1e-9)
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 },
      "survival non-increasing")
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum == totalUsers,
      "every user is removed exactly once (death or censoring)")
    assert(risks.head == totalUsers, "first risk set is everyone")
  }

  // ---- ANN recall eval ------------------------------------------------------

  test("sim_recall_eval: recall in [0,1], common <= min(brute, lsh), brute always 3") {
    val rows = run("sim_recall_eval").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, nl, nc, rec) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nb == 3L, "brute top-3 always full")
      assert(nc <= math.min(nb, nl) && rec >= 0.0 && rec <= 1.0)
    }
    // at the spec SF (sf0.001, ~200 vectors across 256 codes) buckets are
    // near-singleton and honest recall can be 0 — assert consistency with
    // what the index actually served, not a data-dependent floor (the
    // sf0.01 oracle gate pins the values themselves)
    rows.foreach { r =>
      if (r.getLong(2) == 0L) assert(r.getLong(3) == 0L && r.getDouble(4) == 0.0)
    }
  }

  // ---- span corruption ------------------------------------------------------

  test("pipe_span_corruption: masked positions bounded by spans, short docs unmasked, deterministic") {
    val rows = run("pipe_span_corruption").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nSpans, nMasked) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nSpans == nTok / 20)
      if (nSpans == 0) assert(nMasked == 0L)
      else assert(nMasked >= 3L && nMasked <= 3L * nSpans,
        s"masked=$nMasked spans=$nSpans")
      assert(nMasked <= nTok)
    }
    // identity-hash determinism: a second run yields byte-identical rows
    val again = run("pipe_span_corruption").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  // ---- JSD ------------------------------------------------------------------

  test("txt_jsd_sources: bounded by ln 2, canonical pair order, shared <= union vocab") {
    val rows = run("txt_jsd_sources").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "sa < sb")
      assert(r.getLong(2) <= r.getLong(3), "shared <= union")
      val jsd = r.getDouble(4)
      assert(jsd >= -1e-6 && jsd <= math.log(2.0) + 1e-4, s"jsd=$jsd")
    }
  }

  // ---- entropy rate ---------------------------------------------------------

  test("evt_entropy_rate: 0 <= H(next|prev) <= H(next) <= ln 5, gain = difference") {
    val r = run("evt_entropy_rate").collect().head
    val (hc, hm, gain) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val tol = 1e-4
    assert(hc >= -tol && hc <= hm + tol, "conditioning cannot increase entropy")
    assert(hm <= math.log(5.0) + tol, "5 event types bound the marginal")
    assert(math.abs((hm - hc) - gain) <= 2e-6, "gain is the exact-integer difference")
  }

  // ---- kNN label accuracy ---------------------------------------------------

  test("sim_knn_label_accuracy: probes partition by true label, accuracy = correct/probes") {
    val rows = run("sim_knn_label_accuracy").collect()
    assert(rows.nonEmpty)
    val probeTotal = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0).count()
    assert(rows.map(_.getLong(1)).sum == probeTotal, "every probe scored once")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val acc = r.getDouble(3)
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }

  // ---- centroid drift -------------------------------------------------------

  test("emb_centroid_drift: halves cover each label, drift nonneg and below the value range") {
    val rows = run("emb_centroid_drift").collect()
    assert(rows.nonEmpty)
    val perLabel = Tables.embeddings(spark, sf).groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == perLabel(r.getInt(0)),
        "even+odd halves cover the label")
      val drift = r.getDouble(3)
      // embeddings live in [-1, 1]^64 -> centroid L2 distance <= 2*sqrt(64)
      assert(drift >= 0.0 && drift <= 16.0, s"drift=$drift")
    }
  }

  // ---- length batching ------------------------------------------------------

  test("pipe_length_batching: sorted batching never pads more than arrival order, real tokens invariant") {
    val rows = run("pipe_length_batching").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (abN, abReal, abPad) = rows("arrival")
    val (sbN, sbReal, sbPad) = rows("sorted")
    assert(abN == sbN, "same batch count")
    assert(abReal == sbReal, "strategy cannot change real token mass")
    assert(sbPad <= abPad, "length-sorting can only reduce padding")
    assert(abPad >= 0 && sbPad >= 0)
  }

  // ---- recursive hierarchy --------------------------------------------------

  test("sql_recursive_hierarchy: pointer doubling resolves root = leading digit, depth = digits - 1") {
    val rows = run("sql_recursive_hierarchy").collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(2)).sum
    assert(n == Tables.customer(spark, sf).count(), "every customer resolved once")
    // independent closed form: root is the decimal leading digit, depth
    // is #digits - 1 — recompute the census and compare exactly
    val want = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0)).groupBy(k => (k.toString.head.asDigit.toLong,
        (k.toString.length - 1).toLong))
      .map { case (k, v) => k -> v.length.toLong }
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, "census matches the closed form")
  }

  // ---- bitemporal -----------------------------------------------------------

  test("rel_bitemporal_correction: as-of never exceeds current counts; corrections only raise revenue") {
    val rows = run("rel_bitemporal_correction").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(3), "knowledge only grows")
      // +10% amendments and late-recorded originals both mean
      // rev_now >= rev_asof per month
      assert(r.getDouble(4) >= r.getDouble(2) - 1e-9)
    }
    assert(rows.exists(r => r.getLong(1) < r.getLong(3)),
      "the cutoff actually hides some knowledge")
  }

  // ---- Neyman allocation ----------------------------------------------------

  test("samp_neyman_allocation: budgets land within rounding of 500, Neyman skews to spread") {
    val rows = run("samp_neyman_allocation").collect()
    assert(rows.nonEmpty)
    val k = rows.length
    val propSum = rows.map(_.getLong(3)).sum
    val neySum = rows.map(_.getLong(4)).sum
    // independent per-stratum floor(+0.5) can drift at most k/2 seats
    assert(math.abs(propSum - 500L) <= k && math.abs(neySum - 500L) <= k)
    rows.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(4) >= 0))
  }

  // ---- audio energy ---------------------------------------------------------

  test("mm_audio_energy: frame counts match len div 32, energy recomputes exactly for a sample clip") {
    val rows = run("mm_audio_energy").collect()
    assert(rows.nonEmpty)
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == lens(r.getLong(0)) / 32, "n_frames = len div 32")
      assert(r.getLong(2) <= r.getLong(1), "silent <= frames")
    }
    // exact JVM recompute for the first clip
    val id = rows.head.getLong(0)
    val text = Tables.documents(spark, sf).filter(col("doc_id") === id)
      .select("text").collect().head.getString(0)
    val e2s = text.getBytes("UTF-8").map(b => (b & 0xff) - 64L)
      .grouped(32).filter(_.length == 32).map(w => w.map(x => x * x).sum).toSeq
    assert(rows.head.getLong(3) == e2s.sum, "total_e2 exact")
  }

  // ---- Theil decomposition --------------------------------------------------

  test("agg_theil_decomposition: within terms nonneg, decomposition reassembles the global Theil") {
    import org.apache.spark.sql.functions.{floor => _, log => _, _}
    val rows = run("agg_theil_decomposition").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) >= -1e-6, "per-group Theil >= 0"))
    // recompute the global Theil directly and compare with
    // sum_g (X_g/X)*T_g + sum_g between_term
    val cust = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(sum(col("o_totalprice")).as("x"))
      .collect().map(_.getDouble(1))
    val xx = cust.sum; val nn = cust.length
    val tGlobal = cust.map(x => (x / xx) * math.log(x * nn / xx)).sum
    val revs = rows.map(_.getDouble(2)); val revTot = revs.sum
    val reassembled = rows.zip(revs).map { case (r, rev) =>
      (rev / revTot) * r.getDouble(3) + r.getDouble(4)
    }.sum
    assert(math.abs(tGlobal - reassembled) < 5e-3,
      s"global=$tGlobal reassembled=$reassembled")
  }

  // ---- BFS ------------------------------------------------------------------

  // ---- kNN margin -----------------------------------------------------------

  test("sim_knn_margin: margins nonneg, top1 >= top2, one row per probe") {
    val rows = run("sim_knn_margin").collect()
    val probes = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0).count()
    assert(rows.length == probes)
    rows.foreach { r =>
      assert(r.getDouble(2) >= r.getDouble(3) - 1e-9, "top1 >= top2")
      assert(r.getDouble(4) >= -1e-9, "margin nonneg")
    }
  }

  // ---- power / MDE ----------------------------------------------------------

  test("qa_power_mde: MDE shrinks with n, required n consistent with the closed form") {
    val r = run("qa_power_mde").collect().head
    val (n1, n2, p, mde, nReq) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(p > 0 && p < 1)
    val expMde = 2.8 * math.sqrt(p * (1 - p) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(mde - expMde) < 1e-5)
    val expN = 2.8 * 2.8 * 2.0 * p * (1 - p) / ((0.1 * p) * (0.1 * p))
    assert(math.abs(nReq - expN) < 0.2)
    assert(nReq > n1, "a 10% relative lift needs more data than this split has")
  }

  // ---- PPS sampling ---------------------------------------------------------

  test("samp_pps_systematic: multiplicities sum to ~100, selection favors long docs deterministically") {
    val rows = run("samp_pps_systematic").collect()
    val msum = rows.map(_.getLong(2)).sum
    assert(msum >= 99 && msum <= 100, s"grid points accounted for: $msum")
    rows.foreach(r => assert(r.getLong(2) >= 1))
    // size-proportional: mean selected length exceeds corpus mean
    val meanSel = rows.map(r => r.getLong(1) * r.getLong(2)).sum.toDouble / msum
    val meanAll = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    assert(meanSel > meanAll, s"PPS mean $meanSel should exceed corpus mean $meanAll")
    val again = run("samp_pps_systematic").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  // ---- diff in diff ---------------------------------------------------------

  test("qa_diff_in_diff: estimate equals the four-cell arithmetic, cells cover both groups") {
    val r = run("qa_diff_in_diff").collect().head
    assert(Seq(0, 1, 2, 3).forall(i => r.getLong(i) > 0), "all four cells populated")
    val did = (r.getDouble(5) - r.getDouble(4)) - (r.getDouble(7) - r.getDouble(6))
    assert(math.abs(r.getDouble(8) - did) < 1e-3,
      s"reported ${r.getDouble(8)} vs recomputed $did")
  }

  // ---- growth accounting ----------------------------------------------------

  test("evt_growth_accounting: classes partition DAU and the growth identity telescopes") {
    val rows = run("evt_growth_accounting").collect()
      .sortBy(_.getDate(0).toLocalDate.toEpochDay)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        "dau = new + retained + resurrected")
    }
    rows.sliding(2).foreach {
      case Array(a, b)
        if b.getDate(0).toLocalDate.toEpochDay ==
          a.getDate(0).toLocalDate.toEpochDay + 1 =>
        assert(b.getLong(1) ==
          a.getLong(1) + b.getLong(2) + b.getLong(4) - b.getLong(5),
          s"growth identity fails at ${b.getDate(0)}")
      case _ => ()
    }
    assert(rows.map(_.getLong(2)).sum ==
      Tables.events(spark, sf).select("user_id").distinct().count(),
      "every user is new exactly once")
  }

  // ---- Theil-Sen ------------------------------------------------------------

  test("qa_theilsen_trend: pair count = d(d-1)/2, slope matches a JVM median of pairwise slopes") {
    val r = run("qa_theilsen_trend").collect().head
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("y"))
      .collect().map(x => x.getDate(0).toLocalDate.toEpochDay -> x.getLong(1))
      .sortBy(_._1)
    val dcount = daily.length.toLong
    assert(r.getLong(0) == dcount * (dcount - 1) / 2)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield {
      val num = (daily(j)._2 - daily(i)._2) * 1000000L
      val den = daily(j)._1 - daily(i)._1
      Math.floorDiv(num, den)
    }).sorted
    val med = slopes(((slopes.length + 1) / 2 - 1).toInt)
    assert(math.abs(r.getDouble(1) - med / 1e6 / 100.0) < 1e-3,
      s"engine ${r.getDouble(1)} vs jvm ${med / 1e6 / 100.0}")
  }

  // ---- Mahalanobis ----------------------------------------------------------

  test("emb_mahalanobis_outliers: 20 ranked outliers, distances positive and in sd-unit scale") {
    val rows = run("emb_mahalanobis_outliers").collect()
    assert(rows.length == 20)
    val ds = rows.map(_.getDouble(1))
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a + 1e-9 }, "ranked desc")
    // expected distance for 64 standardized dims is ~sqrt(64) = 8; the
    // TOP outliers must exceed that, and nothing plausible passes 80
    assert(ds.head > math.sqrt(64.0) * 0.8 && ds.head < 80.0, s"top ${ds.head}")
    ds.foreach(x => assert(x > 0))
  }

  // ---- personalized PageRank ------------------------------------------------

  test("graph_ppr: source outranks everyone, all ranks positive, top-30 desc") {
    val rows = run("graph_ppr").collect()
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.head.getLong(0) == 2L,
      "the personalization source holds the top rank")
    val fps = rows.map(_.getLong(3))
    assert(fps.zip(fps.tail).forall { case (a, b) => b <= a })
    assert(fps.forall(_ > 0))
  }

  // ---- surprisal by source --------------------------------------------------

  test("txt_surprisal_by_source: positive surprisal, token totals match the corpus") {
    val rows = run("txt_surprisal_by_source").collect()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " "))).count()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach(r => assert(r.getDouble(3) > 0.0, "surprisal positive"))
  }

  // ---- tf-idf pair cosine ---------------------------------------------------

  test("txt_tfidf_pair_cosine: cosine in [0,1], pair set matches the jaccard table") {
    val rows = run("txt_tfidf_pair_cosine").collect()
    val nPairs = run("dedup_ngram_jaccard").count()
    assert(rows.length == nPairs, "one cosine per verified pair")
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= -1e-9 && c <= 1.0 + 1e-4, s"cosine $c")
    }
  }

  // ---- HHI ------------------------------------------------------------------

  test("agg_hhi_market: points in (0, 10000], equiv competitors consistent with 1/HHI") {
    val rows = run("agg_hhi_market").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hhi = r.getDouble(2)
      assert(hhi > 0 && hhi <= 10000.0 + 1e-9)
      if (!r.isNullAt(3))
        assert(math.abs(r.getDouble(3) - 1e4 / hhi) < 0.5,
          s"equiv ${r.getDouble(3)} vs ${1e4 / hhi}")
      assert(hhi >= 1e4 / r.getLong(1) - 5.0,
        "HHI bounded below by the equal-share floor")
    }
  }

  // ---- FK fan-out -----------------------------------------------------------

  test("qa_fk_fanout_profile: child totals match table sizes, childless <= parents") {
    val rows = run("qa_fk_fanout_profile").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 5)
    assert(rows("orders->lineitem").getLong(2) ==
      Tables.lineitem(spark, sf).count(), "every lineitem has a parent order")
    rows.values.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      assert(r.getLong(5) >= 0 && r.getDouble(4) >= 0.0)
    }
  }

  // ---- attribution comparison -----------------------------------------------

  test("evt_attribution_compare: both models credit every purchase exactly once; last matches evt_attribution") {
    val rows = run("evt_attribution_compare").collect()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == purchases, "first-touch total")
    assert(rows.map(_.getLong(2)).sum == purchases, "last-touch total")
    val lastRef = run("evt_attribution").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == lastRef.getOrElse(r.getString(0), 0L),
        s"last-touch credit for ${r.getString(0)} matches the dedicated query")
      assert(r.getLong(3) <= r.getLong(1))
    }
  }

  // ---- bloom prefilter ------------------------------------------------------

  test("j_bloom_prefilter: zero false negatives, bounded fp overhead, deterministic") {
    val r = run("j_bloom_prefilter").collect().head
    val (fact, exact, exactPassed) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(exactPassed == exact,
      "Bloom can never drop a true member (zero false negatives)")
    // the engine-internal side of the audit (total bloom passes → false
    // positives) is computed here with the same sketch spelling — the
    // registered query keeps only the oracle-able contract columns
    graft.functions.expressions.GraftExpressions.ensureRegistered(spark)
    Tables.orders(spark, sf).createOrReplaceTempView("bspec_o")
    Tables.lineitem(spark, sf).createOrReplaceTempView("bspec_l")
    val pass = spark.sql(
      """WITH u AS (SELECT o_orderkey FROM bspec_o WHERE o_orderpriority = '1-URGENT'),
        |bf AS (SELECT graft_bloom_agg(xxhash64(o_orderkey), 200000L, 1600000L) AS bf FROM u)
        |SELECT count(*) FROM bspec_l
        |WHERE graft_might_contain((SELECT bf FROM bf), xxhash64(l_orderkey))"""
        .stripMargin).collect().head.getLong(0)
    spark.catalog.dropTempView("bspec_o"); spark.catalog.dropTempView("bspec_l")
    assert(pass >= exact, "Bloom can never drop a true member")
    val fp = pass - exact
    assert(fp.toDouble <= 0.05 * fact + 10,
      s"false-positive overhead $fp implausible for the sized sketch")
    val again = run("j_bloom_prefilter").collect().head
    assert(r.toString == again.toString, "fixed-seed sketch is deterministic")
  }

  // ---- retention half-life --------------------------------------------------

  test("evt_retention_halflife: positive decay on this corpus implies a positive half-life") {
    val r = run("evt_retention_halflife").collect().head
    assert(r.getLong(0) >= 2, "enough offsets to fit")
    val lambda = r.getDouble(1)
    if (lambda > 0) {
      val hl = r.getDouble(2)
      assert(math.abs(hl - math.log(2.0) / lambda) < 0.05, "t1/2 = ln2/lambda")
    } else assert(r.isNullAt(2))
  }

  // ---- Simpson detector -----------------------------------------------------

  test("qa_simpson_paradox: groups partition nations, agree+reverse <= groups") {
    val r = run("qa_simpson_paradox").collect().head
    val nations = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select("c_nationkey").distinct().count()
    assert(r.getLong(0) == nations)
    assert(r.getLong(2) + r.getLong(3) <= r.getLong(0))
    assert(math.abs(r.getLong(1)) <= 1)
  }

  // ---- Mann-Whitney ---------------------------------------------------------

  test("qa_mann_whitney: U within [0, n1*n2], matches a JVM brute-force with ties") {
    val r = run("qa_mann_whitney").collect().head
    val (n1, n2, u) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(u >= 0.0 && u <= n1.toDouble * n2)
    // brute force at spec SF: U = #{a > b} + #{a == b}/2
    val vals = Tables.events(spark, sf)
      .select(floor(col("value") * 100 + 0.5).cast("long").as("v"),
        when(dayofmonth(col("ts")) <= 15, 0).otherwise(1).as("p"))
      .collect().map(r2 => (r2.getLong(0), r2.getInt(1)))
    val as = vals.filter(_._2 == 0).map(_._1)
    val bs = vals.filter(_._2 == 1).map(_._1).sorted
    def cntBelow(x: Long): (Long, Long) = {
      var lo = 0; var hi = bs.length
      while (lo < hi) { val m = (lo + hi) / 2; if (bs(m) < x) lo = m + 1 else hi = m }
      val firstGE = lo; var hi2 = bs.length; var lo2 = firstGE
      while (lo2 < hi2) { val m = (lo2 + hi2) / 2; if (bs(m) <= x) lo2 = m + 1 else hi2 = m }
      (firstGE.toLong, (lo2 - firstGE).toLong)
    }
    val u2 = as.map { x => val (below, eq) = cntBelow(x); 2 * below + eq }.sum
    assert(math.abs(u - u2 / 2.0) < 0.51, s"engine U $u vs brute ${u2 / 2.0}")
  }

  // ---- constrained funnel ---------------------------------------------------

  test("evt_funnel_constrained: windowed conversions subset anytime conversions") {
    val r = run("evt_funnel_constrained").collect().head
    assert(r.getLong(2) <= r.getLong(1) && r.getLong(1) <= r.getLong(0))
    assert(r.getDouble(4) <= r.getDouble(3) + 1e-9)
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
  }

  // ---- join cardinality -----------------------------------------------------

  test("qa_join_cardinality_estimate: exact matches a real join count; estimates in sane range") {
    val r = run("qa_join_cardinality_estimate").collect().head
    val truth = Tables.orders(spark, sf).select(col("o_orderkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(r.getLong(0) == truth, "per-key sum equals the executed join count")
    assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    // histogram estimate should not be worse than 10x off on TPC-H keys
    assert(math.abs(r.getDouble(4)) < 1000.0)
  }

  // ---- proportion z-test ----------------------------------------------------

  test("qa_proportion_ztest: halves cover the corpus, rates recompute, z finite") {
    val r = run("qa_proportion_ztest").collect().head
    assert(r.getLong(0) + r.getLong(2) == Tables.events(spark, sf).count())
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    assert(math.abs(r.getDouble(4) - r.getLong(1).toDouble / r.getLong(0)) < 1e-5)
    assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite)
  }

  // ---- journey trigrams -----------------------------------------------------

  test("evt_journey_trigrams: 15 ranked patterns of 3 valid types, shares <= 1") {
    val rows = run("evt_journey_trigrams").collect()
    assert(rows.length == 15)
    val types = Tables.events(spark, sf).select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a }, "ranked desc")
    rows.foreach { r =>
      val parts = r.getString(0).split(">")
      assert(parts.length == 3 && parts.forall(types.contains))
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  // ---- padding curve --------------------------------------------------------

  test("pipe_padding_curve: pad share non-decreasing in batch size, real tokens invariant") {
    val rows = run("pipe_padding_curve").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(4L, 8L, 16L, 32L))
    assert(rows.map(_.getLong(2)).distinct.length == 1, "token mass invariant")
    val shares = rows.map(_.getDouble(4))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"bigger sorted batches can only pad more: ${shares.mkString(", ")}")
  }

  // ---- Burrows' delta -------------------------------------------------------

  test("txt_burrows_delta: canonical pairs, nonneg symmetric distance, consistent word panel") {
    val rows = run("txt_burrows_delta").collect()
    assert(rows.nonEmpty)
    val panels = rows.map(_.getLong(2)).distinct
    assert(panels.length == 1 && panels.head <= 30, "one shared word panel")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getDouble(3) >= 0.0)
    }
  }

  // ---- silhouette -----------------------------------------------------------

  test("emb_cluster_silhouette: scores in [-1,1], vecs partition, clusters match labels") {
    val rows = run("emb_cluster_silhouette").collect()
    assert(rows.map(_.getLong(1)).sum == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val sc = r.getDouble(2)
      assert(sc >= -1.0 - 1e-4 && sc <= 1.0 + 1e-4, s"silhouette $sc")
    }
    val labels = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(rows.length <= labels)
  }

  // ---- fingerprint collisions -----------------------------------------------

  test("qa_fingerprint_collision_audit: wider fingerprints collide less, text count constant") {
    val rows = run("qa_fingerprint_collision_audit").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(16, 24, 32))
    assert(rows.map(_.getLong(1)).distinct.length == 1,
      "same distinct-text universe at every width")
    val coll = rows.map(_.getLong(3))
    assert(coll.zip(coll.tail).forall { case (a, b) => b <= a },
      "more bits cannot create collisions")
    rows.foreach(r => assert(r.getLong(2) + r.getLong(3) == r.getLong(1)))
  }

  // ---- Haar energy ----------------------------------------------------------

  test("evt_haar_energy: three scales, energies nonneg, coefficient counts halve") {
    val rows = run("evt_haar_energy").collect().sortBy(_.getInt(0))
    assert(rows.length == 3)
    assert(rows.map(_.getLong(1)).toSeq == Seq(2L, 4L, 8L))
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
    val n = rows.map(_.getLong(2))
    assert(n(1) <= n(0) && n(2) <= n(1), "coarser scales have fewer coefficients")
  }

  // ---- burst detection ------------------------------------------------------

  test("evt_burst_detection: one row per type, episode arithmetic consistent") {
    val rows = run("evt_burst_detection").collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length == types)
    rows.foreach { r =>
      val (ep, lg, days) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lg <= days && days >= ep, s"episodes $ep longest $lg days $days")
      if (ep == 0) assert(lg == 0 && days == 0)
      else assert(lg >= 1 && days >= ep)
    }
  }

  // ---- EMD drift ------------------------------------------------------------

  test("qa_emd_drift: nonneg, bounded by the value range, halves partition the corpus") {
    val r = run("qa_emd_drift").collect().head
    assert(r.getLong(1) + r.getLong(2) == Tables.events(spark, sf).count())
    val emd = r.getDouble(3)
    assert(emd >= 0.0, "transport cost nonneg")
    val rng = Tables.events(spark, sf)
      .agg(max(col("value")) - min(col("value"))).collect().head.getDouble(0)
    assert(emd <= rng + 1.0, s"EMD $emd cannot exceed the value range $rng")
  }

  // ---- shard miss audit -----------------------------------------------------

  test("dedup_shard_miss_audit: caught+missed = pairs, miss rate near 1-1/8 for random sharding") {
    val r = run("dedup_shard_miss_audit").collect().head
    assert(r.getLong(1) + r.getLong(2) == r.getLong(0))
    val rate = r.getDouble(3)
    assert(rate >= 0.0 && rate <= 1.0)
    // content-independent sharding catches ~1/8 of pairs; allow wide
    // slack for the small pair population at spec SF
    if (r.getLong(0) >= 20) assert(rate > 0.5, s"miss rate $rate implausibly low")
  }

  // ---- temperature sweep ----------------------------------------------------

  test("samp_temperature_sweep: shares sum to 1 per alpha, flattening with lower alpha") {
    val rows = run("samp_temperature_sweep").collect()
    val byAlpha = rows.groupBy(_.getString(0))
    assert(byAlpha.keySet == Set("0.25", "0.5", "0.75", "1.0"))
    byAlpha.foreach { case (a, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-3, s"alpha $a shares")
    }
    // lower temperature flattens the mixture: max share is non-decreasing in alpha
    val maxShare = byAlpha.map { case (a, rs) => a.toDouble -> rs.map(_.getDouble(3)).max }
      .toSeq.sortBy(_._1).map(_._2)
    assert(maxShare.zip(maxShare.tail).forall { case (lo, hi) => lo <= hi + 1e-9 },
      s"max shares by alpha: ${maxShare.mkString(", ")}")
  }

  // ---- circadian ------------------------------------------------------------

  test("evt_circadian_profile: mean hour in [0,24), concentration in [0,1]") {
    val rows = run("evt_circadian_profile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mh, c) = (r.getDouble(2), r.getDouble(3))
      assert(mh >= 0.0 && mh < 24.0, s"mean hour $mh")
      assert(c >= 0.0 && c <= 1.0 + 1e-4, s"concentration $c")
    }
  }

  // ---- rich club ------------------------------------------------------------

  test("graph_rich_club: club sizes shrink with k, phi in [0,1] when defined") {
    val rows = run("graph_rich_club").collect().sortBy(_.getLong(0))
    assert(rows.length == 4)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b <= a },
      "higher thresholds admit fewer nodes")
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        val phi = r.getDouble(3)
        assert(phi >= 0.0 && phi <= 1.0 + 1e-9)
      }
    }
  }

  // ---- curriculum -----------------------------------------------------------

  test("pipe_curriculum_phases: three ~equal phases, mean quality strictly ordered, docs partition") {
    val rows = run("pipe_curriculum_phases").collect().sortBy(_.getLong(0))
    assert(rows.length == 3)
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sf).count())
    val sizes = rows.map(_.getLong(2))
    assert(sizes.max - sizes.min <= 1, "tercile sizes differ by at most 1")
    val q = rows.map(_.getDouble(4))
    assert(q(0) <= q(1) && q(1) <= q(2),
      s"curriculum orders quality ascending: ${q.mkString(", ")}")
  }

  // ---- seasonal decomposition -----------------------------------------------

  test("evt_seasonal_decompose: components reassemble the series, seasonal sums to ~0 over dows") {
    val rows = run("evt_seasonal_decompose").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, t, se, res) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(v - (t + se + res)) < 0.05,
        s"decomposition must reassemble: $v vs ${t + se + res}")
    }
    // day-of-week seasonal effects average out by construction
    val dowMeans = rows.groupBy(_.getDate(0).toLocalDate.getDayOfWeek)
      .map(_._2.head.getDouble(3))
    val mean = rows.map(_.getDouble(1)).sum / rows.length
    assert(math.abs(dowMeans.sum) < mean * 0.5 + 1.0,
      "seasonal components roughly centered")
  }

  // ---- intrinsic dimension --------------------------------------------------

  test("emb_intrinsic_dim: estimate positive and at most the ambient dimension's scale") {
    val r = run("emb_intrinsic_dim").collect().head
    assert(r.getLong(1) <= r.getLong(0))
    val id = r.getDouble(2)
    assert(id > 0.0, s"TwoNN estimate $id must be positive")
    // TwoNN can overshoot the ambient dim on small samples, but not absurdly
    assert(id < 200.0, s"TwoNN estimate $id implausible")
  }

  // ---- Heaps' law -----------------------------------------------------------

  test("txt_heaps_law: 10 monotone deciles, vocab sublinear (0 < beta < 1), totals match corpus") {
    val rows = run("txt_heaps_law").collect().sortBy(_.getLong(0))
    assert(rows.length == 10)
    val toks = rows.map(_.getLong(1)); val voc = rows.map(_.getLong(2))
    assert(toks.zip(toks.tail).forall { case (a, b) => b > a }, "tokens strictly grow")
    assert(voc.zip(voc.tail).forall { case (a, b) => b >= a }, "vocab non-decreasing")
    val totalTok = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " "))).count()
    assert(toks.last == totalTok, "final decile covers the corpus")
    // the synthetic corpus samples a small closed vocabulary, so the
    // full word set appears almost immediately and beta is legitimately
    // ~0 — exactly the "template language" signal the operator exists to
    // raise; natural text would land 0.4-0.8
    val beta = rows.head.getDouble(3)
    assert(beta >= -1e-9 && beta < 1.0, s"Heaps beta $beta outside [0,1)")
    if (voc.last == voc.head) assert(beta <= 0.05, "flat vocab must fit ~0")
  }

  // ---- Fano factor ----------------------------------------------------------

  test("evt_fano_factor: top-20 ranked desc, fano nonneg, active days >= 2") {
    val rows = run("evt_fano_factor").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val fs = rows.map(_.getDouble(3))
    assert(fs.zip(fs.tail).forall { case (a, b) => b <= a }, "ranked by fano desc")
    rows.foreach { r =>
      assert(r.getLong(1) >= 2)
      assert(r.getDouble(3) >= 0.0)
    }
  }

  // ---- k-fold ---------------------------------------------------------------

  test("samp_kfold_audit: folds partition the corpus, shares bounded, assignment deterministic") {
    val rows = run("samp_kfold_audit").collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf(Set(0L, 1L, 2L, 3L, 4L)))
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getDouble(3) >= r.getDouble(4), "max >= min share")
      assert(r.getDouble(3) <= 1.0 && r.getDouble(4) >= 0.0)
    }
    val again = run("samp_kfold_audit").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  // ---- user entropy profile -------------------------------------------------

  test("evt_user_entropy_profile: bands within [0, ln5], users sum to corpus") {
    val rows = run("evt_user_entropy_profile").collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == users)
    assert(rows.map(_.getLong(3)).sum == Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= math.log(5.0) + 0.02)
    }
  }

  // ---- online scaling -------------------------------------------------------

  test("win_online_scaling: exactly one degenerate (first) event per user, mean in [0,1]") {
    val rows = run("win_online_scaling").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L, "the first event always has a degenerate range")
      assert(r.getLong(2) <= r.getLong(1))
      if (r.getLong(2) < r.getLong(1)) {
        val m = r.getDouble(3)
        assert(m >= 0.0 && m <= 1.0, s"mean scaled $m")
      }
    }
  }

  // ---- periodicity ----------------------------------------------------------

  test("evt_periodicity_acf: 14 lags, exactly one peak, acf in [-1,1], pairs shrink with lag") {
    val rows = run("evt_periodicity_acf").collect().sortBy(_.getLong(0))
    assert(rows.length == 14)
    assert(rows.count(_.getBoolean(3)) == 1, "exactly one detected period")
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val pairs = rows.map(_.getLong(1))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => b <= a },
      "longer lags can only lose pairs")
  }

  // ---- degree CCDF ----------------------------------------------------------

  test("graph_degree_ccdf: ccdf starts at 1, non-increasing, bins cover all nodes") {
    val rows = run("graph_degree_ccdf").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    assert(math.abs(rows.head.getDouble(3) - 1.0) < 1e-9, "first bin CCDF = 1")
    val cc = rows.map(_.getDouble(3))
    assert(cc.zip(cc.tail).forall { case (a, b) => b <= a + 1e-9 })
    rows.foreach(r => assert(r.getLong(1) == (1L << r.getLong(0).toInt)))
  }

  // ---- edit distance --------------------------------------------------------

  test("txt_edit_distance_pairs: similarity in [0,1], zero distance iff identical prefixes") {
    val rows = run("txt_edit_distance_pairs").collect()
    assert(rows.nonEmpty)
    val txt = Tables.documents(spark, sf)
      .select(col("doc_id"), substring(col("text"), 1, 256).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val sim = r.getDouble(4)
      assert(sim >= 0.0 && sim <= 1.0)
      val same = txt(r.getLong(0)) == txt(r.getLong(1))
      assert((r.getLong(3) == 0L) == same, "lev=0 iff equal prefixes")
    }
  }

  // ---- Pythagorean means ----------------------------------------------------

  test("agg_pythagorean_means: AM >= GM >= HM per type, AM matches direct average") {
    val rows = run("agg_pythagorean_means").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (am, gm, hm) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(am >= gm - 1e-3 && gm >= hm - 1e-3,
        s"${r.getString(0)}: AM $am >= GM $gm >= HM $hm violated")
      assert(hm > 0)
    }
  }

  // ---- skew/kurtosis --------------------------------------------------------

  test("agg_skew_kurtosis: matches Spark's own skewness/kurtosis aggregates") {
    val got = run("agg_skew_kurtosis").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val want = Tables.events(spark, sf)
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").cast("double").as("x"))
      .groupBy("event_type")
      .agg(skewness(col("x")).as("sk"), kurtosis(col("x")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    got.foreach { case (t, (sk, ku)) =>
      assert(math.abs(sk - want(t)._1) < 1e-4, s"$t skew $sk vs ${want(t)._1}")
      assert(math.abs(ku - want(t)._2) < 1e-4, s"$t kurt $ku vs ${want(t)._2}")
    }
  }

  // ---- vocab jaccard --------------------------------------------------------

  test("txt_vocab_jaccard_sources: jaccard in (0,1], canonical order, inter <= union") {
    val rows = run("txt_vocab_jaccard_sources").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) <= r.getLong(3))
      val j = r.getDouble(4)
      assert(j > 0.0 && j <= 1.0, s"jaccard $j")
    }
  }

  // ---- sign fidelity --------------------------------------------------------

  test("emb_sign_fidelity: positive cosine-sign correlation, hamming within [0,64]") {
    val r = run("emb_sign_fidelity").collect().head
    val probes = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0).count()
    val total = Tables.embeddings(spark, sf).count()
    assert(r.getLong(0) == probes * (total - 1), "all probe-candidate pairs scored")
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 64.0)
    val corr = r.getDouble(2)
    assert(corr > 0.3 && corr <= 1.0,
      s"sign codes should meaningfully track cosine, got $corr")
  }

  // ---- PK uniqueness --------------------------------------------------------

  test("qa_pk_uniqueness: all ten tables audited; single-col keys unique, lineitem's real dupes surfaced") {
    val rows = run("qa_pk_uniqueness").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3), "dup arithmetic")
      if (r.getString(0) != "lineitem")
        assert(r.getLong(4) == 0L,
          s"${r.getString(0)} has ${r.getLong(4)} duplicate key rows")
    }
    // the audit's reason to exist: the synthetic generator REUSES
    // (l_orderkey, l_linenumber) pairs, and the audit reports it (verified
    // against a direct recompute) instead of assuming TPC-H's contract
    val li = rows.find(_.getString(0) == "lineitem").get
    val truth = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber").distinct().count()
    assert(li.getLong(3) == truth && li.getLong(4) == li.getLong(2) - truth)
    assert(rows.map(_.getString(0)).toSet == Tables.names.toSet)
  }

  // ---- ANOVA ----------------------------------------------------------------

  test("agg_anova_f: F nonneg, eta^2 in [0,1), k = number of event types") {
    val r = run("agg_anova_f").collect().head
    assert(r.getLong(0) == Tables.events(spark, sf)
      .select("event_type").distinct().count())
    assert(r.getDouble(2) >= 0.0, "F nonneg")
    assert(r.getDouble(3) >= -1e-9 && r.getDouble(3) < 1.0, "eta^2 bounded")
  }

  // ---- range boundaries -----------------------------------------------------

  test("rel_range_boundaries: shares sum to 1, 16 partitions, reasonable balance from a 1% sample") {
    val rows = run("rel_range_boundaries").collect()
    assert(rows.length <= 16 && rows.nonEmpty)
    val shares = rows.map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 0.01, s"shares sum ${shares.sum}")
    assert(rows.map(_.getLong(1)).sum == Tables.lineitem(spark, sf).count())
    // a sample-estimated split should not be pathologically skewed
    if (rows.length == 16) assert(shares.max < 0.5, s"worst share ${shares.max}")
  }

  // ---- forecast backtest ----------------------------------------------------

  test("evt_forecast_backtest: two methods per type on the same days, MAE nonneg") {
    val rows = run("evt_forecast_backtest").collect()
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      assert(rs.map(_.getString(1)).toSet == Set("naive", "ma7"))
      assert(rs.map(_.getLong(2)).distinct.length == 1,
        "both methods score the same evaluation days")
      rs.foreach(r => assert(r.getDouble(3) >= 0.0))
    }
  }

  // ---- key gaps -------------------------------------------------------------

  test("qa_key_gaps: spans bound counts, totals reconcile with the table") {
    val rows = run("qa_key_gaps").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), "actual <= span")
      assert(r.getLong(5) == r.getLong(3) - r.getLong(4))
      assert(r.getLong(5) >= 0)
    }
    assert(rows.map(_.getLong(4)).sum == Tables.orders(spark, sf).count())
  }

  // ---- Pareto ---------------------------------------------------------------

  test("agg_pareto_ratio: shares in (0,1], top20 >= top10 >= uniform baseline") {
    val r = run("agg_pareto_ratio").collect().head
    val (t10, t20) = (r.getDouble(2), r.getDouble(3))
    assert(t10 > 0 && t20 <= 1.0 + 1e-9 && t20 >= t10)
    // any distribution gives the top decile at least its uniform share
    assert(t10 >= 0.1 - 1e-2 && t20 >= 0.2 - 1e-2)
  }

  // ---- session sensitivity --------------------------------------------------

  test("win_session_sensitivity: session counts monotonically non-increasing in the gap; 30-min row matches win_session") {
    val rows = run("win_session_sensitivity").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set(5L, 15L, 30L, 60L))
    assert(rows(5L) >= rows(15L) && rows(15L) >= rows(30L) && rows(30L) >= rows(60L),
      "larger gaps can only merge sessions")
    val sessions30 = run("win_session").count()
    assert(rows(30L) == sessions30,
      "the 30-min curve point equals the dedicated sessionizer's count")
  }

  // ---- week over week -------------------------------------------------------

  test("cal_week_over_week: first week per type has NULL change, counts sum to corpus") {
    val rows = run("cal_week_over_week").collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      assert(sorted.head.isNullAt(4) && sorted.head.isNullAt(5),
        "no prior week for the first row")
      assert(sorted.tail.forall(r => !r.isNullAt(4)), "later weeks have a basis")
    }
    assert(rows.map(_.getLong(2)).sum == Tables.events(spark, sf).count())
  }

  // ---- dataset card ---------------------------------------------------------

  test("pipe_dataset_card: one row, components agree with their dedicated queries") {
    val r = run("pipe_dataset_card").collect().head
    assert(r.getLong(0) == Tables.documents(spark, sf).count())
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0, "dup rate bounded")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, "quality in [0,1]")
    assert(r.getDouble(6) >= 0.0 &&
      r.getDouble(6) <= math.log(r.getLong(5).toDouble) + 1e-4,
      "lang entropy bounded by ln(#langs)")
    // dup rate agrees with the keep-list verdict
    val kl = run("dedup_keep_list").collect()
    val dropped = kl.count(_.getInt(1) == 0)
    assert(math.abs(r.getDouble(3) - dropped.toDouble / kl.length) < 1e-3)
  }

  // ---- AQP ------------------------------------------------------------------

  test("samp_aqp_revenue: estimate within a few std errors of exact, sample is ~1%") {
    val r = run("samp_aqp_revenue").collect().head
    val (n, est, exact, relErr, se) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val orders = Tables.orders(spark, sf).count()
    assert(n > 0 && n < orders / 20, "sample is a small fraction")
    assert(se > 0)
    assert(math.abs(est - exact) <= 6 * se,
      s"estimate $est vs exact $exact beyond 6 SE ($se)")
    assert(math.abs(relErr) <= 100.0)
  }

  // ---- count-min ------------------------------------------------------------

  test("txt_count_min_probe: never underestimates, error bounded by eps*N, deterministic") {
    val rows = run("txt_count_min_probe").collect()
    assert(rows.length == 10)
    val nTok = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " "))).count()
    rows.foreach { r =>
      assert(r.getBoolean(3), s"CMS underestimated ${r.getString(0)}")
      assert(r.getLong(2) - r.getLong(1) <= math.ceil(0.001 * nTok).toLong * 3,
        s"error beyond 3x eps*N for ${r.getString(0)}")
    }
    val again = run("txt_count_min_probe").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  // ---- ROUGE pairs ----------------------------------------------------------

  test("txt_rouge1_pairs: metrics in [0,1], overlap bounded by both lengths, F1 is the harmonic mean") {
    val rows = run("txt_rouge1_pairs").collect()
    assert(rows.nonEmpty, "the near-dup pair table is non-empty at spec SF")
    rows.foreach { r =>
      val (ov, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (p, rr, f1) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(ov <= math.min(na, nb))
      assert(p >= 0 && p <= 1 && rr >= 0 && rr <= 1)
      if (p + rr > 0)
        assert(math.abs(f1 - 2.0 * ov / (na + nb)) < 1e-3)
    }
  }

  // ---- concentration --------------------------------------------------------

  test("emb_concentration: resultant length in [0,1], labels cover the corpus") {
    val rows = run("emb_concentration").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val rl = r.getDouble(2)
      assert(rl >= 0.0 && rl <= 1.0 + 1e-4, s"R=$rl")
    }
  }

  // ---- drawdown -------------------------------------------------------------

  test("evt_max_drawdown: drawdown nonneg and <= peak, one row per event type") {
    val rows = run("evt_max_drawdown").collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length == types)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0, "drawdown nonneg")
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-9,
        "cannot draw down more than the peak (values are nonneg)")
    }
  }

  // ---- Gini -----------------------------------------------------------------

  test("agg_gini_coefficient: values in [0,1), zero iff all revenues equal, matches a JVM recompute") {
    val rows = run("agg_gini_coefficient").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) >= -1e-6 && r.getDouble(3) < 1.0))
    // independent recompute for the first nation using centi-exact values
    val ng = rows.head.getInt(0)
    val xs = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("x"))
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .filter(col("c_nationkey") === ng)
      .select("x").collect().map(_.getLong(0)).sorted
    val n = xs.length.toLong
    val six = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * BigInt(x) }.sum
    val g = 2.0 * six.toDouble / (n.toDouble * xs.sum.toDouble) - (n + 1.0) / n
    assert(math.abs(rows.head.getDouble(3) - g) < 1e-5)
  }

  // ---- conductance ----------------------------------------------------------

  test("graph_conductance: cut <= vol, phi in [0,1], volumes sum to 2|E|") {
    val rows = run("graph_conductance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "cut cannot exceed volume")
      val phi = r.getDouble(3)
      assert(phi >= 0.0 && phi <= 1.0 + 1e-9)
    }
    val e2 = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().count() * 2
    assert(rows.map(_.getLong(1)).sum == e2, "volumes account for every directed edge")
  }

  // ---- PQ distortion --------------------------------------------------------

  test("emb_pq_distortion: one row per subspace, mse <= max, coding beats the zero-vector baseline") {
    val rows = run("emb_pq_distortion").collect()
    assert(rows.length == 8, "M = 8 subspaces")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= r.getDouble(3) + 1e-9)
    }
    // unit vectors: sum over subspaces of E|sv|^2 = 1, so a zero-vector
    // "codebook" would score total MSE 1.0 — trained codebooks must beat it
    val total = rows.map(_.getDouble(2)).sum
    assert(total < 1.0, s"total distortion $total should beat the unit baseline")
    val again = run("emb_pq_distortion").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq, "deterministic")
  }

  // ---- bucketed interval join -----------------------------------------------

  test("j_interval_bucketed: histogram covers every urgent order; counts match a nested-loop recompute") {
    val rows = run("j_interval_bucketed").collect()
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(rows.map(_.getLong(1)).sum == urgent, "one window per urgent order")
    // nested-loop truth on the driver (spec SF is small)
    val dates = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).collect().map(_.getDate(0).toLocalDate)
    val byDay = dates.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val starts = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(to_date(col("o_orderdate"))).collect().map(_.getDate(0).toLocalDate)
    val want = starts.map(st => (0 to 2).map(k => byDay.getOrElse(st.plusDays(k.toLong), 0L)).sum)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "bucketed join equals the nested-loop truth")
  }

  // ---- time to convert ------------------------------------------------------

  test("evt_time_to_convert: order stats match a JVM sort of the same delays") {
    val r = run("evt_time_to_convert").collect().head
    val delays = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("su"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("pu"))
      .filter(col("su").isNotNull && col("pu").isNotNull && col("pu") >= col("su"))
      .select(((col("pu") - col("su")) / lit(1000000L)).cast("long").as("d"))
      .collect().map(_.getLong(0)).sorted
    val n = delays.length
    assert(r.getLong(0) == n)
    if (n > 0) {
      assert(r.getLong(1) == delays((n + 1) / 2 - 1), "lower median")
      assert(r.getLong(2) == delays((9 * n + 9) / 10 - 1), "p90 order stat")
      assert(r.getLong(3) == delays.head && r.getLong(4) == delays.last)
    }
  }

  // ---- rolling correlation --------------------------------------------------

  test("win_rolling_corr: r in [-1,1], exactly full 7-day frames, day series contiguous in count") {
    val rows = run("win_rolling_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 7L)
      if (!r.isNullAt(2)) {
        val v = r.getDouble(2)
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"r7=$v")
      }
    }
    val nDays = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(to_date(col("ts"))).distinct().count()
    assert(rows.length == math.max(0, nDays - 6), "one row per full window")
  }

  test("graph_bfs_distance: rings partition all nodes; hop_1 equals customer 1's direct partners") {
    val rows = run("graph_bfs_distance").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
    val nCust = li.select("o_custkey").distinct().count()
    val nSupp = li.select("l_suppkey").distinct().count()
    assert(rows.values.sum == nCust + nSupp, "rings cover every node once")
    assert(rows.get("hop_0").contains(1L) || !rows.contains("hop_0"))
    val direct = li.filter(col("o_custkey") === 1)
      .select("l_suppkey").distinct().count()
    if (direct > 0) assert(rows("hop_1") == direct,
      "hop-1 ring is exactly customer 1's supplier set")
  }
}
