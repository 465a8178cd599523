package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** The plain-array exact-decimal helpers ([[VecKernelExact.dotSlice]] /
  * [[VecKernelExact.sumExact]]) must agree bit-for-bit with the
  * Catalyst kernel ([[VecKernelExact.dot]]) and with the BigDecimal
  * reference arithmetic — they are what the PQ/IVF training and encode
  * paths run, and the DuckDB oracles re-derive the same numbers via
  * SUM(CAST(x AS DECIMAL)) SQL. A drift here would silently skew every
  * trained structure the oracles re-check.
  */
class VecExactSliceSpec extends AnyFunSuite {

  // deterministic pseudo-random doubles in roughly the embedding range
  private def gen(n: Int, seed: Long): Array[Double] =
    Array.tabulate(n) { i =>
      val h = FingerprintKernel.mix(seed * 7919 + i)
      (h % 2000003).toDouble / 300001.7
    }

  private def refDot(a: Array[Double], b: Array[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < a.length) {
      acc = acc.add(java.math.BigDecimal.valueOf(a(i) * b(i))
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  test("dotSlice == Catalyst kernel == BigDecimal reference") {
    for (seed <- 1L to 40L) {
      val n = 8 + (seed % 57).toInt
      val a = gen(n, seed)
      val b = gen(n, seed + 1000)
      val viaSlice = VecKernelExact.dotSlice(a, 0, b, 0, n)
      val viaKernel = VecKernelExact.dot(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b),
        aF = false, bF = false, failOnError = true)
      val viaRef = refDot(a, b)
      assert(viaSlice == viaKernel.doubleValue() && viaSlice == viaRef,
        s"seed=$seed n=$n slice=$viaSlice kernel=$viaKernel ref=$viaRef")
    }
  }

  test("dotSlice honors offsets (subspace slices)") {
    val v = gen(64, 7L)
    val c = gen(8, 8L)
    for (mi <- 0 until 8) {
      val sub = v.slice(mi * 8, mi * 8 + 8)
      assert(VecKernelExact.dotSlice(v, mi * 8, c, 0, 8) ==
        VecKernelExact.dotSlice(sub, 0, c, 0, 8))
    }
  }

  test("sumExact == per-term rounded BigDecimal sum") {
    for (seed <- 1L to 20L) {
      val terms = gen(8, seed * 31)
      var acc = java.math.BigDecimal.ZERO
      terms.foreach { t =>
        acc = acc.add(java.math.BigDecimal.valueOf(t)
          .setScale(12, java.math.RoundingMode.HALF_UP))
      }
      assert(VecKernelExact.sumExact(terms) == acc.doubleValue())
    }
  }

  test("sumExact rejects non-finite terms loudly (no silent NaN→0)") {
    // unscaled(NaN) would otherwise fall through the rounding branches
    // and contribute 0; +Inf would escape as a raw NumberFormatException
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity)) {
      val e = intercept[IllegalArgumentException] {
        VecKernelExact.sumExact(Array(1.0, bad, 2.0))
      }
      assert(e.getMessage.contains("non-finite"), e.getMessage)
    }
  }

  test("vec_adc_exact kernel yields NULL on a non-finite LUT term " +
      "(CAST(non-finite AS DECIMAL) IS NULL, the vec_dot_exact rule)") {
    def lut(terms: Array[Double]): ArrayData =
      ArrayData.toArrayData(terms.map(t => ArrayData.toArrayData(Array(t))))
    val codes = ArrayData.toArrayData(Array(0, 0, 0))
    assert(VecAdcExactKernel.adc(lut(Array(1.0, 2.0, 3.0)), codes) != null)
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity)) {
      assert(VecAdcExactKernel.adc(lut(Array(1.0, bad, 3.0)), codes) == null,
        s"term $bad must yield NULL")
    }
  }
}
