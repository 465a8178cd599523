package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dwrf.TestSpark

/** `vec_dot_exact` must be BIT-identical to the interpreted
  * decimal-lambda spelling it replaced in every exact similarity tier —
  * same value, same NULL cases — or the DuckDB hash-compare would
  * silently shift. Property-tested across magnitudes that exercise the
  * long fast path, the tie-guard BigDecimal path, the sum-overflow
  * fallback, and every NULL rule (length mismatch, null element,
  * NaN/Inf product, DECIMAL(20,12) overflow).
  */
class VecDotExactSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** The reference spelling (graft.queries.SimilarityQueries.decimalDotLambda
    * inlined: this spec guards the kernel even if the query pack moves). */
  private def lambdaSql(a: String, b: String): String =
    s"""CAST(aggregate(zip_with($a, $b, (x, y) ->
       |  CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))),
       |CAST(0 AS DECIMAL(32,12)), (acc, v) -> CAST(acc + v AS DECIMAL(32,12))) AS DOUBLE)""".stripMargin

  private def compare(rows: Seq[(Array[Double], Array[Double])],
      float: Boolean): Unit = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df =
      if (float)
        rows.map { case (a, b) => (a.map(_.toFloat), b.map(_.toFloat)) }
          .toDF("a", "b")
      else rows.toDF("a", "b")
    val out = df.select(
      expr(lambdaSql("a", "b")).as("want"),
      expr("vec_dot_exact(a, b)").as("got")).collect()
    out.zipWithIndex.foreach { case (r, i) =>
      val wNull = r.isNullAt(0); val gNull = r.isNullAt(1)
      assert(wNull == gNull, s"row $i: null mismatch want=$wNull got=$gNull")
      if (!wNull) {
        val w = r.getDouble(0); val g = r.getDouble(1)
        assert(java.lang.Double.doubleToLongBits(w) ==
          java.lang.Double.doubleToLongBits(g),
          s"row $i: $w (bits ${java.lang.Double.doubleToLongBits(w).toHexString}) vs $g")
      }
    }
  }

  test("bit-identical to the decimal-lambda spelling on random unit-scale vectors") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(96)
      (Array.fill(n)(rnd.nextGaussian()), Array.fill(n)(rnd.nextGaussian()))
    }
    compare(rows, float = false)
    compare(rows, float = true)
  }

  test("bit-identical across magnitudes 1e-12 … 1e3 (tie-guard + fast path)") {
    val rnd = new scala.util.Random(7)
    val rows = (-12 to 3).flatMap { e =>
      val scale = math.pow(10.0, e)
      (1 to 40).map { _ =>
        val n = 1 + rnd.nextInt(8)
        (Array.fill(n)(rnd.nextGaussian() * scale),
          Array.fill(n)(rnd.nextGaussian() * scale))
      }
    }
    compare(rows, float = false)
  }

  test("bit-identical near the long-accumulator boundary (sum-overflow fallback)") {
    val rnd = new scala.util.Random(11)
    // products up to ~6e5 → per-element unscaled ≤ 6e17 (inside the long
    // fast path), but 20+ same-sign adds exceed Long.Max: Math.addExact
    // trips mid-fold and the BigDecimal continuation takes over. Also mix
    // in ~1.2e6-magnitude products (unscaled ≥ 9e17) that route straight
    // to the slow path per element.
    val rows = (1 to 60).map { i =>
      val n = 2 + rnd.nextInt(40)
      val m = if (i % 2 == 0) 700.0 else 1.1e3
      (Array.fill(n)((rnd.nextDouble() + 0.1) * m),
        Array.fill(n)((rnd.nextDouble() + 0.1) * m))
    }
    compare(rows, float = false)
  }

  test("NULL on length mismatch; in-range 9-digit products still exact") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (Array(1.0, 2.0), Array(1.0)),             // zip_with pads → null
      (Array(9.9e3), Array(1e4)))                // p=9.9e7 < 1e8 → value
    val df = rows.toDF("a", "b")
    val out = df.select(
      expr(lambdaSql("a", "b")).as("want"),
      expr("vec_dot_exact(a, b)").as("got")).collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"row $i null mismatch")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"row $i value mismatch")
    }
    assert(out(0).isNullAt(1), "mismatched lengths must be NULL")
    assert(!out(1).isNullAt(1), "last row must be a real value")
  }

  test("NaN/Inf products are NULL; DECIMAL(20,12) overflow throws, like ANSI CAST") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // non-finite: CAST(NaN AS DECIMAL) is NULL even under ANSI
    for (nf <- Seq(Double.NaN, Double.PositiveInfinity)) {
      val df = Seq((Array(nf), Array(1e4))).toDF("a", "b")
      val r = df.selectExpr(lambdaSql("a", "b"), "vec_dot_exact(a, b)").head()
      assert(r.isNullAt(0) && r.isNullAt(1), s"$nf must yield NULL on both")
    }
    // numeric overflow: ANSI throws on both spellings
    for (big <- Seq(Array(1e9), Array(2e4))) {
      val df = Seq((big, Array.fill(big.length)(1e4))).toDF("a", "b")
      intercept[Exception] {
        df.selectExpr(lambdaSql("a", "b")).collect()
      }
      intercept[Exception] {
        df.selectExpr("vec_dot_exact(a, b)").collect()
      }
    }
  }

  test("null array elements null the whole fold") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      "SELECT CAST(array(1.0, NULL, 2.0) AS array<double>) AS a, " +
        "CAST(array(1.0, 1.0, 1.0) AS array<double>) AS b")
    val out = df.selectExpr(lambdaSql("a", "b"), "vec_dot_exact(a, b)").head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
