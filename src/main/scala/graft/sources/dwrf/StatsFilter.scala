package graft.sources.dwrf

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.format.ColumnStats

/** Evaluates pushed-down filters against column statistics to decide
  * whether a stripe/stride can possibly contain matching rows.
  *
  * This goes one step beyond the reference, which records the stats
  * (orc_proto.proto:32-39) but never evaluates predicates (SURVEY §4):
  * here Catalyst pushes filters via SupportsPushDownFilters and we skip
  * whole stripes and strides — the 100 TB path where most data is never
  * read, let alone decoded.
  *
  * `mayMatch` must only return false when PROVABLY no row matches; any
  * uncertainty returns true (Spark re-evaluates every filter anyway).
  */
object StatsFilter {

  /** Can this filter ever help skip? (decides what we report as pushed) */
  def supported(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, _) => atomic(a, schema)
    case GreaterThan(a, _) => atomic(a, schema)
    case GreaterThanOrEqual(a, _) => atomic(a, schema)
    case LessThan(a, _) => atomic(a, schema)
    case LessThanOrEqual(a, _) => atomic(a, schema)
    case In(a, _) => atomic(a, schema)
    case IsNull(a) => atomic(a, schema)
    case IsNotNull(a) => atomic(a, schema)
    // LIKE 'p%' — strings with prefix p form the contiguous byte range
    // [p, succ(p)), so min/max windows prune it like a range predicate
    case StringStartsWith(a, _) =>
      resolve(a, schema).exists(_.dataType == StringType)
    case And(l, r) => supported(l, schema) || supported(r, schema)
    case Or(l, r) => supported(l, schema) && supported(r, schema)
    case _ => false
  }

  /** The smallest byte string greater than EVERY string with prefix `p`
    * (UTF-8 byte order): increment the last non-0xFF byte, truncate the
    * rest. None when p is all 0xFF bytes — no upper bound exists.
    */
  private[dwrf] def prefixSuccessor(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xFF.toByte) i -= 1
    if (i < 0) None
    else {
      val b = java.util.Arrays.copyOf(p, i + 1)
      b(i) = (b(i) + 1).toByte
      Some(b)
    }
  }

  /** Is this a column stats-based skipping can act on? (drives which
    * attributes the scan reports for runtime filtering) */
  def filterableColumn(attr: String, schema: StructType): Boolean =
    atomic(attr, schema)

  /** Resolve an attribute — possibly a dotted struct path, which is how
    * Catalyst names nested fields in pushed filters (`st.ok`) — to its
    * leaf field. Exact top-level names win (a column literally named
    * "st.ok"); backtick-quoted parts (column names that themselves
    * contain dots) are left unresolved — None only means "can't skip",
    * never a wrong result. Only struct nesting is addressable this way.
    */
  private[dwrf] def resolve(attr: String, schema: StructType): Option[StructField] =
    schema.fields.find(_.name == attr).orElse {
      if (attr.contains('`') || !attr.contains('.')) None
      else {
        val parts = attr.split('.')
        parts.tail.foldLeft(schema.fields.find(_.name == parts.head)) {
          (cur, p) =>
            cur.flatMap(_.dataType match {
              case s: StructType => s.fields.find(_.name == p)
              case _ => None
            })
        }
      }
    }

  private def atomic(attr: String, schema: StructType): Boolean =
    resolve(attr, schema).exists { f =>
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | FloatType |
             DoubleType | StringType | BooleanType | TimestampType |
             TimestampNTZType | DateType => true
        case d: DecimalType if d.precision <= 18 => true
        case _ => false
      }
    }

  /** True iff rows matching `filters` (conjunction) may exist given stats. */
  def mayMatch(
      filters: Seq[Filter],
      schema: StructType,
      statsOf: String => Option[ColumnStats]): Boolean =
    filters.forall(f => mayMatchOne(f, schema, statsOf))

  private def mayMatchOne(
      f: Filter,
      schema: StructType,
      statsOf: String => Option[ColumnStats]): Boolean = f match {
    case And(l, r) =>
      mayMatchOne(l, schema, statsOf) && mayMatchOne(r, schema, statsOf)
    case Or(l, r) =>
      mayMatchOne(l, schema, statsOf) || mayMatchOne(r, schema, statsOf)
    case IsNull(a) =>
      statsOf(a).forall(_.hasNull)
    case IsNotNull(a) =>
      statsOf(a).forall(_.count > 0)
    // convention: lo = sign(v - min), hi = sign(max - v)
    case EqualTo(a, v) => cmp(a, v, schema, statsOf) { (lo, hi) => lo >= 0 && hi >= 0 }
    case GreaterThan(a, v) => cmp(a, v, schema, statsOf) { (_, hi) => hi > 0 }
    case GreaterThanOrEqual(a, v) => cmp(a, v, schema, statsOf) { (_, hi) => hi >= 0 }
    case LessThan(a, v) => cmp(a, v, schema, statsOf) { (lo, _) => lo > 0 }
    case LessThanOrEqual(a, v) => cmp(a, v, schema, statsOf) { (lo, _) => lo >= 0 }
    case In(a, vs) =>
      // resolve the field and stats ONCE, not per IN value: runtime
      // join-key filters can carry thousands of values and this runs per
      // file/stripe/stride
      vs.isEmpty || {
        val field = resolve(a, schema)
        val st = statsOf(a)
        if (field.isEmpty || st.isEmpty) true
        else vs.exists(v =>
          cmpResolved(field.get, st.get, v) { (lo, hi) => lo >= 0 && hi >= 0 })
      }
    case StringStartsWith(a, p) =>
      if (p == null) true
      else resolve(a, schema).filter(_.dataType == StringType) match {
        case None => true
        case Some(_) => statsOf(a) match {
          case None => true
          case Some(st) =>
            if (st.count == 0) false // all null: nothing can match
            else if (st.stringMin == null || st.stringMax == null) true
            else {
              val pv = UTF8String.fromString(p)
              // a prefixed string exists in [min, max] iff max >= p and
              // min < succ(p) (succ undefined => unbounded above)
              UTF8String.fromString(st.stringMax).compareTo(pv) >= 0 &&
                prefixSuccessor(pv.getBytes).forall(s =>
                  UTF8String.fromString(st.stringMin)
                    .compareTo(UTF8String.fromBytes(s)) < 0)
            }
        }
      }
    case _ => true
  }

  /** Evaluate `check(lo, hi)` with lo = sign(v - min), hi = sign(max - v);
    * returns true (can't skip) when stats are unavailable or the column
    * type isn't comparable against stats.
    */
  private def cmp(
      attr: String, value: Any, schema: StructType,
      statsOf: String => Option[ColumnStats])(
      check: (Int, Int) => Boolean): Boolean = {
    val field = resolve(attr, schema).getOrElse(return true)
    val st = statsOf(attr).getOrElse(return true)
    cmpResolved(field, st, value)(check)
  }

  private def cmpResolved(
      field: StructField, st: ColumnStats, value: Any)(
      check: (Int, Int) => Boolean): Boolean = {
    if (value == null) return true
    if (st.count == 0) return false // all null: no non-null value can match
    // None = window not authoritative => can't skip
    windowResolved(field, st, value).map { case (lo, hi) => check(lo, hi) }
      .getOrElse(true)
  }

  /** The (sign(v - min), sign(max - v)) window of filter value `v`
    * against the column's stats — None whenever the window is NOT
    * authoritative (stats never observed a value, the type isn't
    * comparable, the value can't be converted exactly, or float/double
    * NaN poisoning). Callers choose the conservative default per
    * direction: `mayMatch` treats None as true, `allMatch` as false.
    */
  private def windowResolved(
      field: StructField, st: ColumnStats, value: Any): Option[(Int, Int)] =
    field.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val v = value.asInstanceOf[Number].longValue()
        if (st.longMin > st.longMax) None
        // (sign(v-min), sign(max-v)): e.g. EqualTo-may needs v>=min && max>=v
        else Some((java.lang.Long.compare(v, st.longMin),
          java.lang.Long.compare(st.longMax, v)))
      case d: DecimalType if d.precision <= 18 =>
        // stats hold unscaled longs at the column's scale; rescale the
        // filter value exactly or refuse (a value that needs rounding
        // could straddle the window either way under range predicates,
        // so conservatism is the only sound answer)
        decimalUnscaled(value, d.scale) match {
          case Some(v) =>
            if (st.longMin > st.longMax) None
            else Some((java.lang.Long.compare(v, st.longMin),
              java.lang.Long.compare(st.longMax, v)))
          case None => None
        }
      case FloatType | DoubleType =>
        val v = value.asInstanceOf[Number].doubleValue()
        // NaN soundness: Spark orders NaN = NaN and NaN > every double, but
        // min/max never observe NaN (its comparisons are all false) while
        // doubleSum poisons to NaN the moment one is noted. So a NaN on
        // either side means the min/max window is not authoritative.
        // (Inf-cancellation can also NaN the sum; that only costs
        // skipping, never correctness.)
        if (v.isNaN || st.doubleSum.isNaN) None
        else if (st.doubleMin > st.doubleMax) None
        else {
          // primitive comparisons, NOT Double.compare: the stats builder
          // records min/max with primitive < / > (so -0.0 and 0.0 are
          // interchangeable there), and Spark normalizes -0.0 to 0.0 in
          // comparisons. Double.compare orders -0.0 < 0.0 and would
          // sanction skipping a stride whose max was recorded as -0.0 for
          // a filter matching 0.0 — silently dropping rows.
          def sgn(a: Double, b: Double): Int =
            if (a > b) 1 else if (a == b) 0 else -1
          Some((sgn(v, st.doubleMin), sgn(st.doubleMax, v)))
        }
      case StringType =>
        if (st.stringMin == null || st.stringMax == null) None
        else {
          val v = UTF8String.fromString(value.toString)
          val mn = UTF8String.fromString(st.stringMin)
          val mx = UTF8String.fromString(st.stringMax)
          Some((v.compareTo(mn), mx.compareTo(v)))
        }
      case BooleanType =>
        val v = value.asInstanceOf[Boolean]
        val mn = if (st.trueCount == st.count) 1L else 0L // min observed (false=0)
        val mx = if (st.trueCount > 0) 1L else 0L
        val vl = if (v) 1L else 0L
        Some((java.lang.Long.compare(vl, mn), java.lang.Long.compare(mx, vl)))
      case TimestampType | TimestampNTZType =>
        toMicros(value).flatMap { v =>
          if (st.longMin > st.longMax) None
          else Some((java.lang.Long.compare(v, st.longMin),
            java.lang.Long.compare(st.longMax, v)))
        }
      case DateType =>
        toDays(value).flatMap { v =>
          if (st.longMin > st.longMax) None
          else Some((java.lang.Long.compare(v, st.longMin),
            java.lang.Long.compare(st.longMax, v)))
        }
      case _ => None
    }

  /** True only when PROVABLY every row of the stats' domain matches
    * `filters` (conjunction) — the dual of [[mayMatch]], driving
    * whole-file fast paths (DELETE drops the file without decoding a
    * row). Anything unprovable returns false: value predicates
    * additionally require a null-free column (SQL comparisons reject
    * null rows), and a non-authoritative window never proves.
    */
  def allMatch(
      filters: Seq[Filter],
      schema: StructType,
      statsOf: String => Option[ColumnStats]): Boolean =
    filters.forall(f => allMatchOne(f, schema, statsOf))

  private def allMatchOne(
      f: Filter,
      schema: StructType,
      statsOf: String => Option[ColumnStats]): Boolean = f match {
    case And(l, r) =>
      allMatchOne(l, schema, statsOf) && allMatchOne(r, schema, statsOf)
    // sound but incomplete: all-match-l OR all-match-r implies every row
    // matches (l OR r); rows split across the disjuncts stay unprovable
    case Or(l, r) =>
      allMatchOne(l, schema, statsOf) || allMatchOne(r, schema, statsOf)
    // every row matches NOT g iff no row can match g AND g never
    // evaluates to NULL (a null cell makes NOT g NULL — not TRUE — so
    // the row must survive; value predicates therefore also need a
    // null-free column, while IS [NOT] NULL never returns NULL)
    case Not(g) =>
      def nullFree(a: String): Boolean = statsOf(a).exists(st => !st.hasNull)
      val neverNull = g match {
        case IsNull(_) | IsNotNull(_) => true
        case EqualTo(a, v) => v != null && nullFree(a)
        case GreaterThan(a, v) => v != null && nullFree(a)
        case GreaterThanOrEqual(a, v) => v != null && nullFree(a)
        case LessThan(a, v) => v != null && nullFree(a)
        case LessThanOrEqual(a, v) => v != null && nullFree(a)
        case In(a, vs) => vs.nonEmpty && !vs.contains(null) && nullFree(a)
        case StringStartsWith(a, v) => v != null && nullFree(a)
        case _ => false // nested/unknown: don't prove
      }
      neverNull && !mayMatchOne(g, schema, statsOf)
    case IsNull(a) => statsOf(a).exists(_.count == 0)
    case IsNotNull(a) => statsOf(a).exists(st => !st.hasNull)
    case EqualTo(a, v) => wholeDomain(a, v, schema, statsOf) {
      (lo, hi) => lo == 0 && hi == 0 } // min == v == max
    case GreaterThan(a, v) => wholeDomain(a, v, schema, statsOf) {
      (lo, _) => lo < 0 } // v < min
    case GreaterThanOrEqual(a, v) => wholeDomain(a, v, schema, statsOf) {
      (lo, _) => lo <= 0 }
    case LessThan(a, v) => wholeDomain(a, v, schema, statsOf) {
      (_, hi) => hi < 0 } // max < v
    case LessThanOrEqual(a, v) => wholeDomain(a, v, schema, statsOf) {
      (_, hi) => hi <= 0 }
    case In(a, vs) => vs.nonEmpty && vs.exists(v =>
      wholeDomain(a, v, schema, statsOf) { (lo, hi) => lo == 0 && hi == 0 })
    // every row has prefix p iff the whole [min, max] window sits inside
    // [p, succ(p)) and the column is null-free
    case StringStartsWith(a, p) =>
      p != null && resolve(a, schema).exists(_.dataType == StringType) &&
        statsOf(a).exists { st =>
          !st.hasNull && st.count > 0 &&
            st.stringMin != null && st.stringMax != null && {
              val pv = UTF8String.fromString(p)
              UTF8String.fromString(st.stringMin).compareTo(pv) >= 0 &&
                prefixSuccessor(pv.getBytes).exists(s =>
                  UTF8String.fromString(st.stringMax)
                    .compareTo(UTF8String.fromBytes(s)) < 0)
            }
        }
    case _ => false
  }

  /** allMatch leg for a single value predicate: provable only with a
    * resolved field, authoritative window, a convertible non-null value,
    * a null-free column, and at least one row.
    */
  private def wholeDomain(
      attr: String, value: Any, schema: StructType,
      statsOf: String => Option[ColumnStats])(
      check: (Int, Int) => Boolean): Boolean = {
    if (value == null) return false
    val field = resolve(attr, schema).getOrElse(return false)
    val st = statsOf(attr).getOrElse(return false)
    if (st.hasNull || st.count == 0) return false
    windowResolved(field, st, value).exists { case (lo, hi) => check(lo, hi) }
  }

  /** Exact unscaled-long form of a decimal filter value at the column's
    * scale — None when rescaling would round or overflow 18 digits.
    */
  private[dwrf] def decimalUnscaled(value: Any, scale: Int): Option[Long] =
    try {
      val bd = value match {
        case b: java.math.BigDecimal => b
        case b: scala.math.BigDecimal => b.underlying()
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        case _ => return None
      }
      Some(bd.setScale(scale).unscaledValue().longValueExact())
    } catch { case _: ArithmeticException => None }

  private[dwrf] def toMicros(value: Any): Option[Long] = value match {
    case t: java.sql.Timestamp =>
      // inverse of the toJavaTimestamp Spark used to build the value
      // (same ancient-date rebase hazard as toDays)
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong))
    case l: java.time.LocalDateTime =>
      Some(Math.addExact(
        Math.multiplyExact(l.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
        (l.getNano / 1000).toLong))
    case _ => None
  }

  private[dwrf] def toDays(value: Any): Option[Long] = value match {
    // fromJavaDate is the exact inverse of the toJavaDate Spark used to
    // build the pushed value; toLocalDate would re-interpret ancient dates
    // in the hybrid Julian calendar and mis-prune by a few days
    case d: java.sql.Date =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }
}
