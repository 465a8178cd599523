package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The bound-pruned assignment kernel must return BIT-IDENTICAL
  * (cell, cell2) to the unpruned evaluation in both arithmetics — the
  * hash-exact `dedup_semantic` oracle re-derives the full argmax, so a
  * single row pruned into a different cell is a round-killing silent
  * divergence. Property-tested across random unit vectors/centroids
  * plus the adversarial corners: duplicated centroids (max ties, which
  * exercise the first-index rule AND the rare full-evaluation
  * fallback), all-equal dots, and near-boundary runner-ups.
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
    val h = CellAssign.prefix(v.length)
    val rest = CellAssign.restNorms(cents, h)
    for (exact <- Seq(true, false)) {
      val want = refTop2(v, cents, exact)
      val got = CellAssign.top2(v, cents, rest, h, exact)
      assert(got == want, s"$label exact=$exact: got $got want $want")
      assert(CellAssign.top1(v, cents, rest, h, exact) == want._1,
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
      "on ties, both arithmetics") {
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
      val base = Array.fill(4 + rnd.nextInt(40))(gen(rnd, d))
      // IVF centroids are NOT unit: scale some, and duplicate one for
      // the tie corner
      val scaled = base.map(c => c.map(_ * (0.5 + rnd.nextDouble())))
      val dup = scaled(rnd.nextInt(scaled.length))
      val cents = scaled :+ dup.clone()
      val h = CellAssign.prefix(d)
      val rest = CellAssign.restNorms(cents, h)
      for (exact <- Seq(true, false)) {
        val ccs = cents.map(c =>
          if (exact) graft.functions.VecKernelExact.dotSlice(c, 0, c, 0, d)
          else CellAssign.fdot(c, 0, c, 0, d))
        for (_ <- 1 to 5) {
          val v = gen(rnd, d)
          assert(CellAssign.top1Min(v, cents, ccs, rest, h, exact) ==
            refMin(v, cents, ccs, exact), s"trial=$trial exact=$exact")
        }
        // query at the duplicated centroid: the min ties across two
        // indices and the first index must win
        val vt = dup.map(_ / math.sqrt(dup.map(x => x * x).sum))
        assert(CellAssign.top1Min(vt, cents, ccs, rest, h, exact) ==
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
}
