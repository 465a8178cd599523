package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** KLL quantile-sketch buffer (Karnin–Lang–Liberty 2016): a stack of
  * levels where an item at level h carries weight 2^h. Level capacities
  * shrink geometrically (ratio 2/3) below the top, so total state is
  * O(k) regardless of stream length; a full level sorts and promotes
  * every other item to the level above — weight is conserved exactly
  * (2m items of weight w become m items of weight 2w; an odd leftover
  * stays put), so the sketch's total item weight always equals the
  * true count, an invariant the spec asserts.
  *
  * Determinism: the classic algorithm flips a coin for the even/odd
  * compaction offset; here the offset alternates via a serialized flip
  * bit, so the same data through the same merge tree always yields the
  * same sketch. (Partial-aggregation merge ORDER still varies run to
  * run under Spark, so cross-run answers may differ within the rank
  * bound — the query gate measures the bound, not bit-equality.)
  */
final class KllBuffer(val k: Int) {
  import scala.collection.mutable.ArrayBuffer

  val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  var n: Long = 0L
  var flip: Boolean = false

  private def capacity(h: Int): Int =
    math.max(8,
      math.ceil(k * math.pow(2.0 / 3.0, levels.length - 1 - h)).toInt)

  private def totalCap: Int = (0 until levels.length).map(capacity).sum
  private def totalItems: Int = levels.iterator.map(_.length).sum

  def update(v: Double): Unit = {
    levels(0) += v
    n += 1L
    if (totalItems > totalCap) compress()
  }

  def mergeIn(o: KllBuffer): KllBuffer = {
    var h = 0
    while (h < o.levels.length) {
      if (h >= levels.length) levels += ArrayBuffer.empty[Double]
      levels(h) ++= o.levels(h)
      h += 1
    }
    n += o.n
    if (totalItems > totalCap) compress()
    this
  }

  /** Sort-and-halve the lowest over-capacity level until within budget. */
  private def compress(): Unit = {
    var guard = 0
    while (totalItems > totalCap && guard < 64) {
      guard += 1
      val full = (0 until levels.length)
        .find(i => levels(i).length >= capacity(i) && levels(i).length >= 2)
      full match {
        case None => return
        case Some(i) =>
          val sorted = levels(i).sorted
          val odd = sorted.length % 2 == 1
          val body = if (odd) sorted.dropRight(1) else sorted
          levels(i) =
            if (odd) ArrayBuffer(sorted.last) else ArrayBuffer.empty[Double]
          if (i + 1 == levels.length) levels += ArrayBuffer.empty[Double]
          val off = if (flip) 1 else 0
          flip = !flip
          var j = off
          while (j < body.length) { levels(i + 1) += body(j); j += 2 }
      }
    }
  }

  /** Total item weight — always equals `n` (compaction conserves it). */
  def totalWeight: Long = {
    var w = 0L
    var h = 0
    while (h < levels.length) { w += levels(h).length.toLong << h; h += 1 }
    w
  }

  /** Estimated phi-quantile: smallest sketch value whose cumulative
    * weight reaches phi of the total (phi clamped to [0, 1]).
    */
  def quantile(phi: Double): Double = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    val total = totalWeight
    val target = math.max(1L,
      math.ceil(math.min(1.0, math.max(0.0, phi)) * total).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }
}

/** `kll_quantiles(col, array(phi...), k)` — native Catalyst
  * TypedImperativeAggregate returning the estimated quantiles at the
  * given ranks. The scale path for percentiles: exact percentile needs
  * a full sort (or Spark's full QuantileSummaries) while this carries
  * O(k) doubles per partial buffer through map-side combine, the same
  * shuffle shape as [[KmvDistinct]]. Nulls and NaNs are skipped (NaN
  * has no rank under IEEE ordering).
  */
case class KllQuantiles(
    child: Expression,
    phis: Seq[Double],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

  require(k >= 32, s"kll_quantiles: k must be >= 32, got $k")
  require(phis.nonEmpty && phis.forall(p => p >= 0.0 && p <= 1.0),
    s"kll_quantiles: ranks must lie in [0,1], got $phis")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType => org.apache.spark.sql.catalyst.analysis
        .TypeCheckResult.TypeCheckSuccess
      case d: DecimalType if d.precision <= 18 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_quantiles: unsupported input type ${other.simpleString} " +
            "(numeric types only)")
    }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  private def numeric(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalStateException(
      s"kll_quantiles: non-numeric value class ${other.getClass.getName}")
  }

  override def update(buffer: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = numeric(v)
      if (!d.isNaN) buffer.update(d)
    }
    buffer
  }

  override def merge(buffer: KllBuffer, other: KllBuffer): KllBuffer =
    buffer.mergeIn(other)

  override def eval(buffer: KllBuffer): Any =
    if (buffer.n == 0L) null
    else ArrayData.toArrayData(phis.map(buffer.quantile).toArray)

  override def serialize(buffer: KllBuffer): Array[Byte] = {
    val items = buffer.levels.iterator.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(
      4 + 8 + 1 + 4 + buffer.levels.length * 4 + items * 8)
    bb.putInt(buffer.k)
    bb.putLong(buffer.n)
    bb.put(if (buffer.flip) 1.toByte else 0.toByte)
    bb.putInt(buffer.levels.length)
    buffer.levels.foreach { lvl =>
      bb.putInt(lvl.length)
      lvl.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KllBuffer(bb.getInt)
    buf.n = bb.getLong
    buf.flip = bb.get() == 1.toByte
    val nLevels = bb.getInt
    buf.levels.clear()
    var h = 0
    while (h < nLevels) {
      val len = bb.getInt
      val lvl = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < len) { lvl += bb.getDouble; i += 1 }
      buf.levels += lvl
      h += 1
    }
    if (buf.levels.isEmpty)
      buf.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)

  override def prettyName: String = "kll_quantiles"
}
