package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._

/** Unit tests for the determinism building blocks every oracle depends on
  * (SURVEY §5.2.2's value-exact tier, aimed at the helpers themselves). */
class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def eval1(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c).head.get(0)
  }

  test("centi: exact scaling incl. negative and .005-boundary inputs") {
    assert(eval1(centi(lit(1.23))) == 123L)
    assert(eval1(centi(lit(-1.23))) == -123L)
    assert(eval1(centi(lit(0.0))) == 0L)
    // 2.675 is actually 2.67499999...: round() HALF_UP on the decimal
    // rendering gives 268 — the documented, engine-checked behavior
    assert(eval1(centi(lit(2.675))) == 268L)
    assert(eval1(centi(lit(1e9 + 0.01))) == 100000000001L)
  }

  test("fround: floor(x*p+0.5)/p semantics at boundaries, negatives, k=0") {
    assert(eval1(fround(lit(1.25), 1)) == 1.3)
    assert(eval1(fround(lit(-1.25), 1)) == -1.2) // floor form: -12.5+0.5 -> -12
    assert(eval1(fround(lit(2.0), 4)) == 2.0)
    assert(eval1(fround(lit(3.7), 0)) == 4.0)
  }

  test("tokens/shingles: lowercase split, guard below n tokens") {
    def seq(a: Any): Seq[String] =
      a.asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(seq(eval1(tokens(lit("A b  C"))))
      == Seq("a", "b", "", "c")) // double space yields empty token (split semantics)
    assert(seq(eval1(shingles(tokens(lit("a b c")), 2))) == Seq("a b", "b c"))
    assert(seq(eval1(shingles(tokens(lit("a")), 3))).isEmpty)
  }

  test("dot/l2norm/cosine/cosinePre agree with each other and graft_dot") {
    val a = typedlit(Seq(3.0, 4.0))
    val b = typedlit(Seq(4.0, 3.0))
    assert(eval1(dot(a, b)) == 24.0)
    assert(eval1(l2norm(a)) == 5.0)
    val c = eval1(cosine(a, b)).asInstanceOf[Double]
    assert(math.abs(c - 24.0 / 25.0) < 1e-15)
    val cp = eval1(cosinePre(a, b, lit(5.0), lit(5.0))).asInstanceOf[Double]
    assert(cp == c)
    graft.functions.expressions.GraftExpressions.ensureRegistered(spark)
    import spark.implicits._
    val native = Seq((Seq(3.0, 4.0), Seq(4.0, 3.0))).toDF("a", "b")
      .selectExpr("graft_dot(a, b)").head.getDouble(0)
    assert(native == 24.0)
  }

  test("vecDouble: float arrays widen without value drift for exact floats") {
    import spark.implicits._
    val v = Seq(Tuple1(Seq(1.5f, -2.25f, 0.0f))).toDF("v")
      .select(vecDouble(col("v"))).head.getSeq[Double](0)
    assert(v == Seq(1.5, -2.25, 0.0))
  }
}
