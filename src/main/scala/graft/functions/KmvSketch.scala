package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values distinct-count sketch buffer: the k smallest DISTINCT
  * 64-bit hashes in unsigned order. Fixed size (k longs), union-mergeable,
  * and fully deterministic — no randomness, so the same data always gives
  * the same estimate regardless of partitioning or merge order (KMV union
  * is a set union followed by a re-truncation to k).
  */
final class KmvBuffer(val k: Int) {
  val set: java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last()) < 0 && !set.contains(h)) {
      set.add(h)
      set.remove(set.last())
    }
  }

  def mergeIn(o: KmvBuffer): KmvBuffer = {
    val it = o.set.iterator()
    while (it.hasNext) add(it.next())
    this
  }

  /** < k distinct hashes seen => exact; else (k-1) / F where F is the
    * k-th smallest hash as a fraction of the 2^64 hash space. */
  def estimate: Long =
    if (set.size < k) set.size.toLong
    else {
      val kth = set.last().longValue()
      val frac = (kth.toDouble + (if (kth < 0) math.pow(2, 64) else 0.0)) / math.pow(2, 64)
      math.round((k - 1) / frac)
    }
}

/** `kmv_distinct(col[, k])` — native Catalyst TypedImperativeAggregate
  * (the aggregate-function rung of the brief's extension ladder, next to
  * the scalar [[DocFingerprint]]): an approximate COUNT(DISTINCT) whose
  * state is k longs instead of a full hash set. At 100 TB the partial
  * buffers are map-side combined and the shuffle carries k longs per
  * group, the same shape Spark's own approx_count_distinct uses — this
  * one is exact below k and deterministic above it.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 16, s"kmv_distinct: k must be >= 16, got $k")

  // only value-hashable atomics: a fall-through to Object.hashCode would
  // be identity-based for arrays/rows — wrong AND nondeterministic
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | StringType | BinaryType | BooleanType |
           TimestampType | TimestampNTZType | DateType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_distinct: unsupported input type ${other.simpleString} " +
            "(atomic types only)")
    }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  private def hashOf(v: Any): Long = v match {
    case l: Long => XXH64.hashLong(l, 42L)
    case i: Int => XXH64.hashLong(i.toLong, 42L)
    case s: Short => XXH64.hashLong(s.toLong, 42L)
    case b: Byte => XXH64.hashLong(b.toLong, 42L)
    case u: UTF8String =>
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
    case d: Double => XXH64.hashLong(java.lang.Double.doubleToLongBits(d), 42L)
    case f: Float => XXH64.hashLong(java.lang.Float.floatToIntBits(f).toLong, 42L)
    case b: Boolean => XXH64.hashLong(if (b) 1L else 0L, 42L)
    case bytes: Array[Byte] =>
      XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    case other => throw new IllegalStateException(
      s"kmv_distinct: unhashable value class ${other.getClass.getName}")
  }

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(hashOf(v))
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer =
    buffer.mergeIn(other)

  override def eval(buffer: KmvBuffer): Any = buffer.estimate

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buffer.set.size * 8)
    bb.putInt(buffer.k)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)

  override def prettyName: String = "kmv_distinct"
}
