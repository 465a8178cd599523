package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Tight JVM loop for the double dot product — callable from both
  * interpreted eval and generated code.
  */
object VecKernel {
  /** `aF`/`bF` select float vs double element reads — resolved once from
    * the static input types, four specialized loops so the hot path has
    * no per-element branching.
    */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"vec_dot: length mismatch ${a.numElements()} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    if (!aF && !bF) while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    else if (aF && bF) while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
    else if (aF) while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    else while (i < n) { s += a.getDouble(i) * b.getFloat(i); i += 1 }
    s
  }
}

/** Exact-decimal dot product kernel — the tight-loop twin of the SQL
  * spelling
  * {{{
  * CAST(aggregate(zip_with(a, b, (x, y) ->
  *        CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))),
  *      CAST(0 AS DECIMAL(32,12)),
  *      (acc, v) -> CAST(acc + v AS DECIMAL(32,12))) AS DOUBLE)
  * }}}
  * which every exact similarity tier used for order-independent
  * (therefore partitioning-independent) sums. The lambda spelling is
  * interpreted Catalyst per element — on a 2M-pair × 64-dim verifier
  * join it IS the query cost. This kernel produces the BIT-IDENTICAL
  * double:
  *
  *  - per element, Spark computes `CAST(x*y AS DECIMAL(20,12))` as
  *    `BigDecimal.valueOf(p).setScale(12, HALF_UP)` (shortest decimal
  *    repr, then half-up at scale 12); NaN/Infinity casts to NULL
  *    (nulling the fold), while ≥ 10^8 in magnitude (> 20-12 integer
  *    digits) throws under ANSI / nulls otherwise — mirrored exactly;
  *  - the fold is an exact decimal sum, so any summation order yields
  *    the same unscaled value; we accumulate the scale-12 unscaled longs
  *    with `Math.addExact`, falling back to BigDecimal on overflow;
  *  - `CAST(dec AS DOUBLE)` is the correctly-rounded value of
  *    unscaled·10⁻¹²; IEEE division `acc / 1e12` is also correctly
  *    rounded (10^12 is exact in double), so they agree bit-for-bit.
  *
  * Fast path: `u = round(|p·10¹²| + 0.5)` is provably the half-up of the
  * shortest-repr decimal whenever the fractional part of |p·10¹²| is
  * farther than 4e-15·|p·10¹²| + 1e-9 from 0.5 — the double multiply
  * contributes ≤ 0.5 ulp ≈ 1.1e-16·|scaled| and the shortest-repr
  * drift ≤ ulp(p)·10¹² ≈ 2.2e-16·|scaled|; outside the guard band the
  * integer neighborhood cannot change. Inside it (measure ~1e-15 of
  * inputs) we pay one BigDecimal per element.
  */
object VecKernelExact {
  private val Scale = 12
  private val Pow = 1e12

  /** Unscaled scale-12 long of `CAST(p AS DECIMAL(..,12))` for
    * unit-scale inputs (|p| ≲ 9·10⁵) — the building block of
    * order-independent exact sums outside this kernel (the k-means
    * mean accumulator aggregates these per cell and coordinate; any
    * grouping of additions yields the identical total, which is what
    * lets a distributed combiner replace the row-exploded decimal
    * groupBy bit-for-bit). Throws on inputs needing the BigDecimal
    * path — callers here feed normalized coordinates, |x| ≤ 1 — and
    * REJECTS non-finite inputs loudly: `unscaled(NaN)` would otherwise
    * fall through every branch and return a silent 0, the class of bug
    * the r13 vec_adc_exact hardening removed. */
  private[graft] def castDecimal12Unscaled(p: Double): Long = {
    require(!java.lang.Double.isNaN(p) && !java.lang.Double.isInfinite(p),
      s"castDecimal12Unscaled: non-finite input $p")
    unscaled(p)
  }

  /** Correctly-rounded double of an unscaled scale-12 long — the same
    * tail [[dot]]/[[sumExact]] use: exact for |u| ≤ 2⁵³, BigDecimal
    * beyond. Equals Spark's `CAST(decimal AS DOUBLE)`. */
  private[graft] def unscaledToDouble(u: Long): Double =
    if (Math.abs(u) <= (1L << 53)) u.toDouble / Pow
    else java.math.BigDecimal.valueOf(u, Scale).doubleValue()

  /** Unscaled scale-12 long of CAST(p AS DECIMAL(20,12)), or throws
    * [[ArithmeticException]] when the value needs the BigDecimal path
    * (too large for the long fast accumulator).
    */
  private def unscaled(p: Double): Long = {
    val scaled = p * Pow
    val absScaled = Math.abs(scaled)
    if (absScaled >= 9.0e17) throw new ArithmeticException("big") // keep sums long-safe
    val fl = Math.floor(absScaled)
    val frac = absScaled - fl
    val guard = 4e-15 * absScaled + 1e-9
    if (Math.abs(frac - 0.5) <= guard) {
      // tie neighborhood: defer to the reference arithmetic
      java.math.BigDecimal.valueOf(p)
        .setScale(Scale, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    } else {
      val mag = if (frac > 0.5) fl.toLong + 1L else fl.toLong
      if (scaled < 0) -mag else mag
    }
  }

  /** Null (boxed) result ⇔ the SQL spelling yields NULL: length
    * mismatch (zip_with pads with null), a null element, or a NaN/Inf
    * product (double→decimal CAST of a non-finite value is NULL even
    * under ANSI). DECIMAL range overflow throws when `failOnError`
    * (= the session's ANSI flag, ANSI being the Spark 4 default) and
    * yields NULL otherwise — exactly the lambda's CAST behavior.
    */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean,
      failOnError: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    var slow: java.math.BigDecimal = null
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      val p = x * y
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p))
        return null // CAST(non-finite AS DECIMAL) is NULL, ANSI or not
      if (Math.abs(p) >= 1e8) { // > 8 integer digits: DECIMAL(20,12) overflow
        if (failOnError) throw new ArithmeticException(
          s"vec_dot_exact: element product $p cannot be represented as DECIMAL(20,12)")
        return null
      }
      if (slow == null) {
        try acc = Math.addExact(acc, unscaled(p))
        catch { case _: ArithmeticException =>
          slow = java.math.BigDecimal.valueOf(acc).movePointLeft(Scale)
            .add(java.math.BigDecimal.valueOf(p)
              .setScale(Scale, java.math.RoundingMode.HALF_UP))
        }
      } else {
        slow = slow.add(java.math.BigDecimal.valueOf(p)
          .setScale(Scale, java.math.RoundingMode.HALF_UP))
      }
      i += 1
    }
    if (slow != null) {
      if (slow.precision - slow.scale > 20) {
        if (failOnError) throw new ArithmeticException(
          s"vec_dot_exact: sum $slow cannot be represented as DECIMAL(32,12)")
        return null
      }
      slow.doubleValue()
    } else if (Math.abs(acc) <= (1L << 53)) {
      // exact numerator, one correctly-rounded IEEE division == the
      // correctly-rounded decimal→double conversion of acc·10⁻¹²
      acc.toDouble / Pow
    } else {
      java.math.BigDecimal.valueOf(acc, Scale).doubleValue()
    }
  }

  /** Exact-decimal dot of two plain double SLICES (driver/executor
    * arrays) — identical rounding semantics to [[dot]]: each product
    * rounded to DECIMAL scale 12 HALF_UP, summed exactly, one double
    * cast at the end. The PQ/IVF training and encode paths run on this
    * so any engine reproduces the trained structure bit-for-bit;
    * throws (never NULLs) because training inputs are finite by
    * construction.
    */
  def dotSlice(a: Array[Double], aFrom: Int, b: Array[Double], bFrom: Int,
      n: Int): Double = {
    var acc = 0L
    var slow: java.math.BigDecimal = null
    var i = 0
    while (i < n) {
      val p = a(aFrom + i) * b(bFrom + i)
      require(!java.lang.Double.isNaN(p) && !java.lang.Double.isInfinite(p) &&
        Math.abs(p) < 1e8, s"dotSlice: product $p outside DECIMAL(20,12)")
      if (slow == null) {
        try acc = Math.addExact(acc, unscaled(p))
        catch { case _: ArithmeticException =>
          slow = java.math.BigDecimal.valueOf(acc).movePointLeft(Scale)
            .add(java.math.BigDecimal.valueOf(p)
              .setScale(Scale, java.math.RoundingMode.HALF_UP))
        }
      } else slow = slow.add(java.math.BigDecimal.valueOf(p)
        .setScale(Scale, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    if (slow != null) slow.doubleValue()
    else if (Math.abs(acc) <= (1L << 53)) acc.toDouble / Pow
    else java.math.BigDecimal.valueOf(acc, Scale).doubleValue()
  }

  /** Exact-decimal sum of doubles (each term rounded to scale 12,
    * exact accumulation, one double cast) — the order-independent
    * combine the exact-ADC kernel uses over its M lookup terms.
    * Non-finite terms are REJECTED loudly: `unscaled(NaN)` would
    * otherwise fall through the tie/rounding branches and contribute a
    * silent 0, and ±Inf would escape as a raw NumberFormatException
    * from BigDecimal.valueOf — callers that want NULL semantics
    * (the user-callable `vec_adc_exact`) pre-screen their terms. */
  def sumExact(terms: Array[Double]): Double = {
    var acc = 0L
    var slow: java.math.BigDecimal = null
    var i = 0
    while (i < terms.length) {
      val p = terms(i)
      require(!java.lang.Double.isNaN(p) && !java.lang.Double.isInfinite(p),
        s"sumExact: non-finite term $p cannot be cast to DECIMAL")
      if (slow == null) {
        try acc = Math.addExact(acc, unscaled(p))
        catch { case _: ArithmeticException =>
          slow = java.math.BigDecimal.valueOf(acc).movePointLeft(Scale)
            .add(java.math.BigDecimal.valueOf(p)
              .setScale(Scale, java.math.RoundingMode.HALF_UP))
        }
      } else slow = slow.add(java.math.BigDecimal.valueOf(p)
        .setScale(Scale, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    if (slow != null) slow.doubleValue()
    else if (Math.abs(acc) <= (1L << 53)) acc.toDouble / Pow
    else java.math.BigDecimal.valueOf(acc, Scale).doubleValue()
  }
}

/** `vec_dot_exact(a, b)` — codegen'd exact-decimal dot product, the
  * drop-in replacement for the interpreted decimal-lambda spelling in
  * the exact similarity tiers (see [[VecKernelExact]] for the
  * bit-identity argument). Returns NULL exactly where the SQL spelling
  * does (length mismatch, null element) — so `nullable` is true even
  * over non-null inputs — and throws where ANSI-mode CAST would.
  */
case class VecDotExact(left: Expression, right: Expression,
    failOnError: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
    extends BinaryExpression {

  // ANSI flag is a constructor parameter (Spark's own pattern for
  // conf-sensitive expressions): captured once at analysis, preserved
  // across copy()/withNewChildrenInternal, and part of case-class
  // equality so ANSI and non-ANSI instances never canonicalize equal.

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elem(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(DoubleType, _) => Some(false)
    case ArrayType(FloatType, _) => Some(true)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_exact requires array<double|float> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  private lazy val aF = elem(left.dataType).get
  private lazy val bF = elem(right.dataType).get

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VecKernelExact.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF, failOnError)
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotExact")
      s"""
         |java.lang.Double $tmp = graft.functions.VecKernelExact.dot($a, $b, $aF, $bF, $failOnError);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExact =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot_exact"
}

/** Squared-L2 twin of [[VecKernel.dot]] — same specialization scheme. */
object VecL2Kernel {
  def l2sq(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"vec_l2sq: length mismatch ${a.numElements()} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    if (!aF && !bF) while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    else if (aF && bF) while (i < n) { val d = a.getFloat(i).toDouble - b.getFloat(i); s += d * d; i += 1 }
    else if (aF) while (i < n) { val d = a.getFloat(i).toDouble - b.getDouble(i); s += d * d; i += 1 }
    else while (i < n) { val d = a.getDouble(i) - b.getFloat(i); s += d * d; i += 1 }
    s
  }
}

/** PQ asymmetric-distance kernel: sum over subspaces mi of
  * `lut[mi][codes[mi]]`. Tight-loop twin of the SQL spelling
  * `aggregate(sequence(0, M-1), 0D, (acc, mi) -> acc +
  *   element_at(element_at(lut, mi+1), codes[mi] + 1))`.
  */
object VecAdcKernel {
  def adc(lut: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    require(lut.numElements() == m,
      s"vec_adc: ${lut.numElements()} LUT rows vs $m codes")
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val row = lut.getArray(mi)
      val code = codes.getInt(mi)
      // bounds-check the code: UnsafeArrayData reads an out-of-range
      // ordinal as arbitrary memory SILENTLY, so a mismatched (m, k)
      // geometry would yield quietly wrong distances instead of an error
      if (code < 0 || code >= row.numElements())
        throw new IllegalArgumentException(
          s"vec_adc: code $code out of range for LUT row $mi " +
            s"(${row.numElements()} centroids)")
      s += row.getDouble(code)
      mi += 1
    }
    s
  }
}

/** `vec_l2sq(a, b)` — native codegen'd squared L2 distance, replacing the
  * interpreted `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, +)`
  * spelling in the IVF assignment pass (same sequential double
  * arithmetic, so results are bit-identical).
  */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elem(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(DoubleType, _) => Some(false)
    case ArrayType(FloatType, _) => Some(true)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_l2sq requires array<double|float> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  private lazy val aF = elem(left.dataType).get
  private lazy val bF = elem(right.dataType).get

  override def nullSafeEval(a: Any, b: Any): Any =
    VecL2Kernel.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecL2Kernel.l2sq($a, $b, $aF, $bF);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_l2sq"
}

/** Packed-codes twin of [[VecAdcKernel]]: the M (≤ 8) one-byte codes
  * ride ONE BIGINT — the persisted-index layout where a 64-float vector
  * is 8 bytes on disk.
  */
object VecAdcPackedKernel {
  def adc(lut: ArrayData, packed: Long): Double = {
    val m = lut.numElements()
    require(m <= 8, s"vec_adc_packed: $m subspaces exceed one packed long")
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val row = lut.getArray(mi)
      val code = ((packed >>> (mi * 8)) & 0xffL).toInt
      // same silent-read hazard as VecAdcKernel: an index written with a
      // larger K than this LUT's must fail, not read arbitrary memory
      if (code >= row.numElements())
        throw new IllegalArgumentException(
          s"vec_adc_packed: code $code out of range for LUT row $mi " +
            s"(${row.numElements()} centroids)")
      s += row.getDouble(code)
      mi += 1
    }
    s
  }
}

/** `vec_adc_packed(lut, code64)` — codegen'd ADC over byte-packed codes
  * (`lut` as in [[VecAdc]]; `code64` a BIGINT holding subspace mi's code
  * in bits [8·mi, 8·mi+8)).
  */
case class VecAdcPacked(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), org.apache.spark.sql.types.LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_adc_packed requires (array<array<double>>, bigint), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecAdcPackedKernel.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecAdcPackedKernel.adc($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecAdcPacked =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_adc_packed"
}

/** Exact-decimal twin of [[VecAdcKernel]]: the M looked-up terms sum
  * through [[VecKernelExact.sumExact]] (per-term scale-12 rounding,
  * exact accumulation) instead of sequential double adds — so the ADC
  * score is order-independent and any engine reproduces it. The SQL
  * spelling this mirrors is the NULL-PROPAGATING aggregate fold
  * `aggregate(terms, CAST(0 AS DECIMAL(32,12)), (acc, t) ->
  * acc + CAST(t AS DECIMAL(20,12)))` — the same family as
  * `vec_dot_exact`'s zip_with fold, where one NULL (= non-finite) term
  * nulls the whole score. NOT `SUM(CAST(term AS DECIMAL))`: SQL SUM
  * would SKIP a null-cast term and return the partial sum of the rest,
  * which silently mis-scores the vector. On all-finite terms — every
  * internal caller, and what the DuckDB oracles actually evaluate —
  * the fold and SUM agree exactly. */
object VecAdcExactKernel {
  def adc(lut: ArrayData, codes: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    require(lut.numElements() == m,
      s"vec_adc_exact: ${lut.numElements()} LUT rows vs $m codes")
    val terms = new Array[Double](m)
    var mi = 0
    while (mi < m) {
      val row = lut.getArray(mi)
      val code = codes.getInt(mi)
      if (code < 0 || code >= row.numElements())
        throw new IllegalArgumentException(
          s"vec_adc_exact: code $code out of range for LUT row $mi " +
            s"(${row.numElements()} centroids)")
      val t = row.getDouble(code)
      if (java.lang.Double.isNaN(t) || java.lang.Double.isInfinite(t))
        return null // CAST(non-finite AS DECIMAL) is NULL
      terms(mi) = t
      mi += 1
    }
    java.lang.Double.valueOf(VecKernelExact.sumExact(terms))
  }
}

/** `vec_adc_exact(lut, codes)` — [[VecAdc]] with the order-independent
  * exact-decimal combine ([[VecAdcExactKernel]]); NULL on a non-finite
  * LUT term (decimal-cast semantics, like [[VecDotExact]]). */
case class VecAdcExact(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_adc_exact requires (array<array<double>>, array<int>), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecAdcExactKernel.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("adcExact")
      s"""
         |java.lang.Double $tmp = graft.functions.VecAdcExactKernel.adc($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecAdcExact =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_adc_exact"
}

/** `vec_adc(lut, codes)` — codegen'd PQ asymmetric-distance lookup:
  * `lut` is array<array<double>> (M rows of K query·centroid dots),
  * `codes` is array<int> (one code per subspace).
  */
case class VecAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_adc requires (array<array<double>>, array<int>), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecAdcKernel.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecAdcKernel.adc($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecAdc =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_adc"
}

/** `vec_dot(a, b)` — native codegen'd dot product over array<double> or
  * array<float> (each side independently; floats widen per element, the
  * same arithmetic as the CAST-inside-lambda SQL spelling).
  * The SQL spelling `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, ...)`
  * allocates a zipped array and evaluates two lambda expression trees
  * per element; on a pairwise similarity join that interpretive overhead
  * IS the query cost (measured 38 s → ~4 s on dedup_semantic's 4.4M-pair
  * verifier). One expression, one loop, no allocation.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elem(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(DoubleType, _) => Some(false)
    case ArrayType(FloatType, _) => Some(true)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<double|float> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  private lazy val aF = elem(left.dataType).get
  private lazy val bF = elem(right.dataType).get

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernel.dot($a, $b, $aF, $bF);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}
