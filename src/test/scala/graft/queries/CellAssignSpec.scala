package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The bound-pruned assignment kernels must return BIT-IDENTICAL
  * results to the unpruned evaluation in both arithmetics — the
  * hash-exact `dedup_semantic`/`ann_ivf_*` oracles re-derive the full
  * argmax/argmin, so a single row pruned into a different cell is a
  * round-killing silent divergence. Property-tested across random unit
  * vectors/centroids plus the adversarial corners: duplicated
  * centroids (ties, which exercise the first-index rule AND the rare
  * full-evaluation fallback), all-equal dots, rest-heavy vectors,
  * LARGE-MAGNITUDE coordinates (the fixed-margin failure mode the r14
  * review caught — the margin must scale with ‖v‖·‖c‖), and non-finite
  * inputs (must fail loudly, never leak a sentinel cell id).
  */
class CellAssignSpec extends AnyFunSuite {

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  private def gen(rnd: scala.util.Random, d: Int): Array[Double] =
    unit(Array.fill(d)(rnd.nextGaussian()))

  /** Reference implementation of the SQL semantics: first index of the
    * max dot; first index of the best strictly-below-max dot (the max
    * index when all dots are equal). */
  private def refTop2(v: Array[Double], cents: Array[Array[Double]],
      exact: Boolean): (Int, Int) = {
    val dots = cents.map { c =>
      if (exact) graft.functions.VecKernelExact.dotSlice(v, 0, c, 0, v.length)
      else CellAssign.fdot(v, 0, c, 0, v.length)
    }
    val max = dots.max
    val cell = dots.indexWhere(_ == max)
    val belowAll = dots.filter(_ < max)
    if (belowAll.isEmpty) (cell, cell)
    else (cell, dots.indexWhere(_ == belowAll.max))
  }

  private def check(v: Array[Double], cents: Array[Array[Double]],
      label: String): Unit = {
    val g = CellAssign.geom(cents)
    for (exact <- Seq(true, false)) {
      val want = refTop2(v, cents, exact)
      val got = CellAssign.top2(v, cents, g, exact)
      assert(got == want, s"$label exact=$exact: got $got want $want")
      assert(CellAssign.top1(v, cents, g, exact) == want._1,
        s"$label exact=$exact top1")
    }
  }

  test("pruned top1/top2 == full evaluation on random unit geometry") {
    val rnd = new scala.util.Random(1401L)
    for (trial <- 1 to 60) {
      val d = Seq(16, 64, 96)(trial % 3)
      val nC = 3 + rnd.nextInt(48)
      val cents = Array.fill(nC)(gen(rnd, d))
      for (_ <- 1 to 8) check(gen(rnd, d), cents, s"trial=$trial")
    }
  }

  test("large-magnitude coordinates: the margin scales with the norms " +
      "(a fixed 1e-6 margin under-covers float error at ~1e4 scale)") {
    val rnd = new scala.util.Random(88L)
    for (trial <- 1 to 25) {
      val d = 64
      // coordinate magnitudes ~1e4: prefix partial sums ~1e9, where the
      // float summation error alone exceeds a unit-scale fixed margin.
      // Exact-mode products stay < 1e8 (dotSlice's DECIMAL(20,12) cap)
      // only if |v_i·c_i| < 1e8 — keep magnitudes at ~3e3 so products
      // are ~1e7, inside the exact kernel's domain
      val scale = 3e3
      val cents = Array.fill(6 + rnd.nextInt(20))(
        gen(rnd, d).map(_ * scale * (0.5 + rnd.nextDouble())))
      for (_ <- 1 to 6)
        check(gen(rnd, d).map(_ * scale), cents, s"mag-trial=$trial")
      // tie corner at magnitude too
      val dup = cents(rnd.nextInt(cents.length))
      check(dup.clone(), cents :+ dup.clone(), s"mag-tie-trial=$trial")
    }
  }

  test("max ties on duplicated centroids take the FIRST index (and the " +
      "fallback corner where the runner-up hides among pruned cells)") {
    val rnd = new scala.util.Random(77L)
    for (trial <- 1 to 30) {
      val d = 64
      val base = Array.fill(6 + rnd.nextInt(20))(gen(rnd, d))
      // duplicate a random centroid to a random position: the max (or
      // the runner-up) now ties across two indices
      val dup = base(rnd.nextInt(base.length))
      val at = rnd.nextInt(base.length)
      val cents = (base.take(at) :+ dup.clone()) ++ base.drop(at)
      // query near the duplicated centroid so the tie IS the max —
      // both top lower bounds then belong to max-tied cells, the
      // construction that forces the full-evaluation fallback
      val v = unit(dup.clone())
      check(v, cents, s"dup-trial=$trial")
      for (_ <- 1 to 4) check(gen(rnd, d), cents, s"dup-rand-trial=$trial")
    }
  }

  test("all-equal dots degenerate to (cell, cell) like the SQL coalesce") {
    val d = 64
    val c = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    val cents = Array.fill(5)(c.clone())
    val v = unit(Array.tabulate(d)(i => (i + 1).toDouble))
    check(v, cents, "all-equal")
  }

  test("pruned IVF argmin (cc − 2·dot) == full evaluation, first index " +
      "on ties, both arithmetics, unit and large magnitudes") {
    val rnd = new scala.util.Random(515L)
    def refMin(v: Array[Double], cents: Array[Array[Double]],
        ccs: Array[Double], exact: Boolean): Int = {
      val dists = cents.indices.map { i =>
        val dot =
          if (exact) graft.functions.VecKernelExact
            .dotSlice(v, 0, cents(i), 0, v.length)
          else CellAssign.fdot(v, 0, cents(i), 0, v.length)
        ccs(i) - 2.0 * dot
      }
      dists.indexWhere(_ == dists.min)
    }
    for (trial <- 1 to 40) {
      val d = 64
      val mag = if (trial % 3 == 0) 3e3 else 1.0
      val base = Array.fill(4 + rnd.nextInt(40))(gen(rnd, d).map(_ * mag))
      // IVF centroids are NOT unit: scale some, and duplicate one for
      // the tie corner
      val scaled = base.map(c => c.map(_ * (0.5 + rnd.nextDouble())))
      val dup = scaled(rnd.nextInt(scaled.length))
      val cents = scaled :+ dup.clone()
      val g = CellAssign.geom(cents)
      for (exact <- Seq(true, false)) {
        val ccs = cents.map(c =>
          if (exact) graft.functions.VecKernelExact.dotSlice(c, 0, c, 0, d)
          else CellAssign.fdot(c, 0, c, 0, d))
        for (_ <- 1 to 5) {
          val v = gen(rnd, d).map(_ * mag)
          assert(CellAssign.top1Min(v, cents, ccs, g, exact) ==
            refMin(v, cents, ccs, exact), s"trial=$trial exact=$exact")
        }
        // query at the duplicated centroid: the min ties across two
        // indices and the first index must win
        val vt = dup.clone()
        assert(CellAssign.top1Min(vt, cents, ccs, g, exact) ==
          refMin(vt, cents, ccs, exact), s"tie trial=$trial exact=$exact")
      }
    }
  }

  test("prefix shorter than or equal to dims never prunes the winner " +
      "on adversarial rest-heavy vectors") {
    // all the discriminating mass lives PAST the prefix — the partial
    // dots are ~equal and the envelope must keep every contender alive
    val rnd = new scala.util.Random(9L)
    val d = 64
    val h = CellAssign.prefix(d)
    for (trial <- 1 to 20) {
      val cents = Array.fill(12) {
        val c = Array.fill(d)(0.0)
        c(0) = 1.0 // shared prefix direction
        for (i <- h until d) c(i) = rnd.nextGaussian()
        unit(c)
      }
      val v = {
        val x = Array.fill(d)(0.0)
        x(0) = 1.0
        for (i <- h until d) x(i) = rnd.nextGaussian()
        unit(x)
      }
      check(v, cents, s"rest-heavy trial=$trial")
    }
  }

  test("non-finite inputs fail loudly on every kernel path (never a " +
      "silent sentinel cell id)") {
    val rnd = new scala.util.Random(3L)
    val d = 64
    val cents = Array.fill(8)(gen(rnd, d))
    val g = CellAssign.geom(cents)
    val bad = gen(rnd, d); bad(7) = Double.NaN
    for (exact <- Seq(true, false)) {
      assert(intercept[IllegalArgumentException] {
        CellAssign.top1(bad, cents, g, exact)
      }.getMessage.nonEmpty)
      assert(intercept[IllegalArgumentException] {
        CellAssign.top2(bad, cents, g, exact)
      }.getMessage.nonEmpty)
      val ccs = cents.map(c => CellAssign.fdot(c, 0, c, 0, d))
      assert(intercept[IllegalArgumentException] {
        CellAssign.top1Min(bad, cents, ccs, g, exact)
      }.getMessage.nonEmpty)
    }
    assert(intercept[IllegalArgumentException] {
      graft.functions.VecKernelExact.castDecimal12Unscaled(Double.NaN)
    }.getMessage.contains("non-finite"))
  }

  test("decimalMeans fails loudly on ragged vectors instead of " +
      "silently truncating the tail coordinates (r14 review)") {
    val spark = graft.sources.dwrf.TestSpark.spark
    val ok = spark.sparkContext.parallelize(Seq(
      (0, Seq(1.0, 2.0)), (0, Seq(3.0, 4.0)), (1, Seq(5.0, 6.0))), 2)
    val means = CellAssign.decimalMeans(ok)
    assert(means(0).toSeq == Seq(2.0, 3.0) && means(1).toSeq == Seq(5.0, 6.0))
    val ragged = spark.sparkContext.parallelize(Seq(
      (0, Seq(1.0, 2.0)), (0, Seq(3.0, 4.0, 9.0))), 1)
    val e = intercept[org.apache.spark.SparkException] {
      CellAssign.decimalMeans(ragged)
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("a non-finite CENTROID coordinate fails loudly at geometry " +
      "construction (r14 review: NaN envelope terms would otherwise " +
      "silently drop the cell from contention)") {
    val rnd = new scala.util.Random(7L)
    val d = 64
    for (poison <- Seq(Double.NaN, Double.PositiveInfinity)) {
      val cents = Array.fill(8)(gen(rnd, d))
      cents(3)(11) = poison
      assert(intercept[IllegalArgumentException] {
        CellAssign.geom(cents)
      }.getMessage.contains("non-finite centroid"))
    }
  }
}
