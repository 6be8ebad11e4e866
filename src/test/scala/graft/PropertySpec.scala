package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY §5.2.3): generated inputs, deterministic
  * seeds (results reproducible run-to-run), one Spark job per sample batch.
  *
  *  - CSV wire round-trip (S2): any well-formed record survives
  *    serialize → from_csv unchanged.
  *  - Running-sum invariance (A5): the keyed sum is independent of row
  *    order and partition count — the property the reference delegates to
  *    Cassandra counters (additive, order-insensitive).
  *  - Native vs composable shingles: the codegen ShingleGenerator agrees
  *    with the declarative HOF formulation on arbitrary text.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      (s.next, g.apply(Gen.Parameters.default, s))
    }.drop(1).flatMap(_._2).take(n).toSeq

  private val genRecord: Gen[(Long, Long, String, Double)] = for {
    id <- Gen.chooseNum(0L, Long.MaxValue / 2)
    user <- Gen.chooseNum(0L, 10000L)
    kind <- Gen.oneOf("click", "view", "purchase", "a b c", "UPPER_case.9")
    cents <- Gen.chooseNum(-10000000L, 10000000L)
  } yield (id, user, kind, cents / 100.0)

  test("property: CSV wire format round-trips any well-formed record (S2)") {
    import spark.implicits._
    val recs = samples(genRecord, 200, seed = 42L)
    val df = recs.toDF("event_id", "user_id", "event_type", "value")
    val parsed = df.select(concat_ws(",",
        col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("string")).as("line"))
      .select(from_csv(col("line"),
        StructType.fromDDL("event_id LONG, user_id LONG, event_type STRING, value DOUBLE"),
        Map.empty[String, String]).as("r"))
      .select(col("r.*"))
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(parsed.sortBy(_._1) == recs.sortBy(_._1))
  }

  test("property: keyed running sum is order- and partitioning-invariant (A5)") {
    import spark.implicits._
    val recs = samples(genRecord, 300, seed = 7L)
    val expected = recs.groupBy(_._2)
      .map { case (u, rs) => u -> rs.map(r => math.round(r._4 * 100)).sum }
    for ((perm, parts) <- Seq((recs, 1), (recs.reverse, 3), (recs.sortBy(_._4), 7))) {
      val got = perm.toDF("event_id", "user_id", "event_type", "value")
        .repartition(parts)
        .groupBy("user_id")
        .agg(sum(graft.functions.GraftFunctions.centi(col("value"))).as("s"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  private val genText: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "", "Zz", "1", "&x"))
  } yield toks.mkString(" ")

  test("property: native ShingleGenerator equals the composable HOF form") {
    import spark.implicits._
    graft.functions.expressions.GraftExpressions.ensureRegistered(spark)
    val texts = samples(genText, 150, seed = 99L).distinct
    val df = texts.toDF("text").withColumn("id", monotonically_increasing_id())
    for (n <- Seq(1, 2, 3, 5)) {
      val native = df.selectExpr("text", s"graft_shingles(text, $n) AS sh")
        .groupBy("text").agg(sort_array(collect_list("sh")).as("shs"))
        .as[(String, Seq[String])].collect().toMap
      val hof = df.select(col("text"),
          graft.functions.GraftFunctions.shingles(split(col("text"), " "), n).as("shs"))
        .as[(String, Seq[String])].collect()
        .map { case (t, s) => t -> s.sorted }.toMap
      texts.foreach { t =>
        assert(native.getOrElse(t, Nil) == hof(t), s"n=$n text='$t'")
      }
    }
  }

  test("property: bitmap distinct equals the set cardinality under any grouping/partitioning") {
    import spark.implicits._
    graft.functions.expressions.GraftExpressions.ensureRegistered(spark)
    val genBatch: Gen[List[(String, Long)]] = Gen.listOfN(300, for {
      g <- Gen.oneOf("x", "y", "z")
      id <- Gen.chooseNum(0L, 5000L)
    } yield (g, id))
    samples(genBatch, 5, seed = 7L).zipWithIndex.foreach { case (batch, i) =>
      val df = batch.toDF("g", "id").repartition(1 + i % 5)
      val got = df.groupBy("g")
        .agg(expr("graft_bitmap_distinct(id, 1048576)").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = batch.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet.size.toLong }
      assert(got == want, s"batch $i")
    }
  }

  test("property: sweep-line level-weighted duration equals total interval length for random intervals") {
    import spark.implicits._
    // the conservation law the rel_sweep_concurrency spec pins on real
    // data, replayed on arbitrary interval sets: sum(level * duration)
    // over the step function == sum of (inclusive) interval lengths
    val genIvs: Gen[List[(Long, Long)]] = Gen.listOfN(40, for {
      s <- Gen.chooseNum(0L, 1000000L)
      len <- Gen.chooseNum(0L, 50000L)
    } yield (s, s + len))
    samples(genIvs, 5, seed = 11L).foreach { ivs =>
      val pts = ivs.flatMap { case (st, en) => Seq((st, 1L), (en + 1, -1L)) }
        .toDF("ts", "dlt").groupBy("ts").agg(sum("dlt").as("dlt"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("ts")
      val steps = pts
        .withColumn("c", sum("dlt").over(w.rowsBetween(Long.MinValue, 0)))
        .withColumn("nxt", lead("ts", 1).over(w))
        .filter(col("nxt").isNotNull && col("c") >= 1)
        .select((col("c") * (col("nxt") - col("ts"))).as("wdur"))
        .agg(sum("wdur")).collect().head.getLong(0)
      val total = ivs.map { case (s, e) => e - s + 1 }.sum
      assert(steps == total, s"ivs=$ivs")
    }
  }
}
