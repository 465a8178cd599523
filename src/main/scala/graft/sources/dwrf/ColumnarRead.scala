package graft.sources.dwrf

import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

import graft.format._

/** Vectorized scan path: decodes stripes straight into Spark
  * `OnHeapColumnVector`s in 4096-row batches, bypassing per-row boxing
  * entirely. EVERY type vectorizes (atomics, structs, arrays, maps,
  * recursively), with or without pushed filters — filtered scans apply
  * the same stripe/stride stats skipping as the row path, seeking the
  * decoders past skipped stride runs. The reference is row-at-a-time
  * everywhere (SURVEY §4 "vectorization: none") — this is where the
  * Spark build overtakes it. The row path remains for point reads
  * (rowsFrom) and tools.
  */
object ColumnarSupport {
  def supported(schema: StructType): Boolean =
    schema.fields.nonEmpty && schema.fields.forall(f => supportedType(f.dataType))

  /** Every type vectorizes: atomics, structs, arrays, maps — recursively. */
  private def supportedType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType |
         TimestampType | TimestampNTZType | DateType => true
    case d: DecimalType if d.precision <= 18 => true
    case s: StructType => s.fields.forall(f => supportedType(f.dataType))
    case a: ArrayType => supportedType(a.elementType)
    case m: MapType => supportedType(m.keyType) && supportedType(m.valueType)
    case _ => false
  }
}

/** Per-column vector filler over the stripe's streams. */
abstract class VectorDecoder(val columnId: Int) {
  protected var present: BitFieldReader = null

  def start(src: StreamSource): Unit = {
    present = src.stream(columnId, StreamKind.Present)
      .map(new BitFieldReader(_)).orNull
    startValues(src)
  }

  protected def startValues(src: StreamSource): Unit

  /** Seek to a row-index stride (mirrors TreeReader.seekTree): used by the
    * columnar path to emit batches only from strides that survive stats
    * skipping.
    */
  final def seekStride(entries: Map[Int, RowIndexEntry]): Unit = {
    entries.get(columnId).foreach { e =>
      if (present != null)
        e.positions.get(StreamKind.Present)
          .foreach(p => present.seek(new ArrayPositionProvider(p)))
      seekValues(e)
    }
    decoderChildren.foreach(_.seekStride(entries))
  }

  protected def seekValues(e: RowIndexEntry): Unit

  /** Nested decoders a seek/start must recurse into. */
  def decoderChildren: Seq[VectorDecoder] = Nil

  /** Reset per-batch bookkeeping (collection element counters). */
  protected def beginBatch(): Unit = ()

  private final def beginBatchTree(): Unit = {
    beginBatch()
    decoderChildren.foreach(_.beginBatchTree())
  }

  /** Decode one value into slot i, consuming this column's PRESENT bit. */
  final def putOne(v: OnHeapColumnVector, i: Int): Unit =
    if (present == null || present.next()) put(v, i) else v.putNull(i)

  /** Batch hook for decoders that can attach a lazy dictionary to the
    * OUTPUT vector (`fill` roots only — nested children decode through
    * `putOne` and keep the materializing path). */
  protected def prepare(v: OnHeapColumnVector, n: Int): Unit = ()

  /** Bulk decode rows [0, n) when the column has no PRESENT stream this
    * stripe (null-free — the suppressed-stream common case): decoders
    * override to turn n per-value calls into per-run array ops. Return
    * false to fall back to the per-row loop.
    */
  protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = false

  /** Nullable twin: decoders that also bulk-decode under a PRESENT
    * stream override this — decodePresent() + a gather/scatter pass. */
  protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = false

  /** Bulk-decode n PRESENT bits into `presentScratch`, null the absent
    * slots on v, and return the non-null count (= how many values the
    * value streams actually hold for this batch). */
  protected var presentScratch: Array[Boolean] = null
  protected final def decodePresent(v: OnHeapColumnVector, n: Int): Int = {
    if (presentScratch == null || presentScratch.length < n)
      presentScratch = new Array[Boolean](n)
    present.nextBits(presentScratch, 0, n)
    var c = 0
    var i = 0
    while (i < n) {
      if (presentScratch(i)) c += 1 else v.putNull(i)
      i += 1
    }
    c
  }

  final def fill(v: OnHeapColumnVector, n: Int): Unit = {
    beginBatchTree()
    prepare(v, n)
    if (present == null) { if (fillBulk(v, n)) return }
    else if (fillBulkNullable(v, n)) return
    var i = 0
    while (i < n) { putOne(v, i); i += 1 }
  }

  /** `fill` minus the batch reset and the root-only `prepare`: used by
    * collection/struct parents to bulk-decode a child's next `n` values
    * into slots [0, n) of the child vector. The parent's `fill` already
    * reset the whole decoder tree, and `prepare`'s lazy-dictionary
    * attachment is root-only (nested children keep the materializing
    * path), so neither may run again here.
    */
  private[dwrf] final def fillChild(v: OnHeapColumnVector, n: Int): Unit = {
    if (present == null) { if (fillBulk(v, n)) return }
    else if (fillBulkNullable(v, n)) return
    var i = 0
    while (i < n) { putOne(v, i); i += 1 }
  }

  protected def put(v: OnHeapColumnVector, i: Int): Unit
}

object VectorDecoder {
  def create(columnId: Int, dt: DataType): VectorDecoder = dt match {
    case BooleanType => new BoolVectorDecoder(columnId)
    case ByteType => new ByteVectorDecoder(columnId)
    case ShortType | IntegerType | LongType => new LongVectorDecoder(columnId, dt)
    // short decimals decode through the long kernels; the vector stores
    // unscaled ints (p <= 9) or longs, Spark's own decimal vector layout
    case d: DecimalType if d.precision <= 18 => new LongVectorDecoder(columnId, d)
    case DateType => new DateVectorDecoder(columnId)
    case FloatType => new FloatVectorDecoder(columnId)
    case DoubleType => new DoubleVectorDecoder(columnId)
    case StringType => new StringVectorDecoder(columnId)
    case BinaryType => new BinaryVectorDecoder(columnId)
    case TimestampType | TimestampNTZType => new TimestampVectorDecoder(columnId)
    case s: StructType => new StructVectorDecoder(columnId, s)
    case a: ArrayType => new ListVectorDecoder(columnId, a)
    case m: MapType => new MapVectorDecoder(columnId, m)
    case other =>
      throw new UnsupportedOperationException(s"columnar: unsupported $other")
  }
}

private[dwrf] object VectorUtil {
  /** Reserve row capacity on a vector AND its struct children (a plain
    * reserve does not cascade; struct children share row ids). */
  def reserveRows(v: OnHeapColumnVector, cap: Int): Unit = {
    v.reserve(cap)
    v.dataType() match {
      case s: StructType =>
        var j = 0
        while (j < s.fields.length) {
          reserveRows(v.getChild(j).asInstanceOf[OnHeapColumnVector], cap)
          j += 1
        }
      case _ => ()
    }
  }
}

/** Array: LENGTH stream + element child decoded into the vector's child
  * column with running batch-local offsets (putArray bookkeeping). A null
  * array row consumes no length and no elements, matching the writer.
  */
final class ListVectorDecoder(c: Int, at: ArrayType) extends VectorDecoder(c) {
  private var lengths: RunLengthIntegerReader = null
  private val elem = VectorDecoder.create(c + 1, at.elementType)
  private var elemCount = 0

  override def decoderChildren: Seq[VectorDecoder] = Seq(elem)
  override protected def beginBatch(): Unit = elemCount = 0

  override protected def startValues(src: StreamSource): Unit = {
    lengths = src.stream(c, StreamKind.Length)
      .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
    elem.start(src)
  }

  override protected def put(v: OnHeapColumnVector, i: Int): Unit = {
    val n = lengths.next().toInt
    val child = v.getChild(0).asInstanceOf[OnHeapColumnVector]
    VectorUtil.reserveRows(child, elemCount + n)
    var j = 0
    while (j < n) { elem.putOne(child, elemCount + j); j += 1 }
    v.putArray(i, elemCount, n)
    elemCount += n
  }

  private var lenScratch: Array[Long] = null

  /** Bulk: one `nextLongs` over the LENGTH stream, one recursive
    * `fillChild` for ALL of the batch's elements (the element decoder's
    * own bulk kernel then runs over the whole element run), then offsets
    * from the prefix sum — no per-row virtual calls on the offsets path.
    */
  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    if (lengths == null) return false
    if (lenScratch == null || lenScratch.length < n) lenScratch = new Array[Long](n)
    lengths.nextLongs(lenScratch, 0, n)
    fillFromLengths(v, n, n)
    true
  }

  override protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = {
    if (lengths == null) return false
    val c = decodePresent(v, n)
    if (lenScratch == null || lenScratch.length < c) lenScratch = new Array[Long](c)
    lengths.nextLongs(lenScratch, 0, c)
    fillFromLengths(v, n, c)
    true
  }

  /** Decode `c` length-prefixed arrays (already in lenScratch) and scatter
    * them over `n` row slots (null rows — flagged in presentScratch when
    * c < n — consume no length and no elements, matching the writer). */
  private def fillFromLengths(v: OnHeapColumnVector, n: Int, c: Int): Unit = {
    var total = 0L
    var i = 0
    while (i < c) { total += lenScratch(i); i += 1 }
    // child vectors are Int-indexed, so >2^31 elements per batch is
    // unrepresentable on ANY path — fail loudly, not by overflow
    require(total <= Int.MaxValue, s"dwrf: $total array elements in one batch")
    val t = total.toInt
    val child = v.getChild(0).asInstanceOf[OnHeapColumnVector]
    VectorUtil.reserveRows(child, t)
    elem.fillChild(child, t)
    var off = 0
    var j = 0
    i = 0
    while (i < n) {
      if (c == n || presentScratch(i)) {
        val len = lenScratch(j).toInt
        v.putArray(i, off, len)
        off += len
        j += 1
      }
      i += 1
    }
    elemCount = t
  }

  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Length).foreach(p => lengths.seek(new ArrayPositionProvider(p)))
}

/** Map: LENGTH stream + key/value children sharing the array offsets. */
final class MapVectorDecoder(c: Int, mt: MapType) extends VectorDecoder(c) {
  private var lengths: RunLengthIntegerReader = null
  private val key = VectorDecoder.create(c + 1, mt.keyType)
  private val value = VectorDecoder.create(
    c + 1 + ColumnTree.subtreeSize(mt.keyType), mt.valueType)
  private var entryCount = 0

  override def decoderChildren: Seq[VectorDecoder] = Seq(key, value)
  override protected def beginBatch(): Unit = entryCount = 0

  override protected def startValues(src: StreamSource): Unit = {
    lengths = src.stream(c, StreamKind.Length)
      .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
    key.start(src)
    value.start(src)
  }

  override protected def put(v: OnHeapColumnVector, i: Int): Unit = {
    val n = lengths.next().toInt
    val keys = v.getChild(0).asInstanceOf[OnHeapColumnVector]
    val values = v.getChild(1).asInstanceOf[OnHeapColumnVector]
    VectorUtil.reserveRows(keys, entryCount + n)
    VectorUtil.reserveRows(values, entryCount + n)
    var j = 0
    while (j < n) {
      key.putOne(keys, entryCount + j)
      value.putOne(values, entryCount + j)
      j += 1
    }
    v.putArray(i, entryCount, n)
    entryCount += n
  }

  private var lenScratch: Array[Long] = null

  /** Same bulk shape as [[ListVectorDecoder]]: batch the LENGTH stream,
    * bulk-fill the key and value runs once each, offsets from the prefix
    * sum. Key and value streams are independent, so each child run
    * decodes contiguously.
    */
  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    if (lengths == null) return false
    if (lenScratch == null || lenScratch.length < n) lenScratch = new Array[Long](n)
    lengths.nextLongs(lenScratch, 0, n)
    fillFromLengths(v, n, n)
    true
  }

  override protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = {
    if (lengths == null) return false
    val c = decodePresent(v, n)
    if (lenScratch == null || lenScratch.length < c) lenScratch = new Array[Long](c)
    lengths.nextLongs(lenScratch, 0, c)
    fillFromLengths(v, n, c)
    true
  }

  private def fillFromLengths(v: OnHeapColumnVector, n: Int, c: Int): Unit = {
    var total = 0L
    var i = 0
    while (i < c) { total += lenScratch(i); i += 1 }
    require(total <= Int.MaxValue, s"dwrf: $total map entries in one batch")
    val t = total.toInt
    val keys = v.getChild(0).asInstanceOf[OnHeapColumnVector]
    val values = v.getChild(1).asInstanceOf[OnHeapColumnVector]
    VectorUtil.reserveRows(keys, t)
    VectorUtil.reserveRows(values, t)
    key.fillChild(keys, t)
    value.fillChild(values, t)
    var off = 0
    var j = 0
    i = 0
    while (i < n) {
      if (c == n || presentScratch(i)) {
        val len = lenScratch(j).toInt
        v.putArray(i, off, len)
        off += len
        j += 1
      }
      i += 1
    }
    entryCount = t
  }

  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Length).foreach(p => lengths.seek(new ArrayPositionProvider(p)))
}

/** Schema evolution: a column requested but absent from this file fills
  * with nulls (columnId -1 matches no streams).
  */
final class NullVectorDecoder extends VectorDecoder(-1) {
  override protected def startValues(src: StreamSource): Unit = ()
  override protected def put(v: OnHeapColumnVector, i: Int): Unit = v.putNull(i)
  override protected def seekValues(e: RowIndexEntry): Unit = ()
}

/** Struct: no value streams of its own — children decode into the
  * vector's child columns. A null struct row consumes no child values
  * (matching the writers, which only write children of non-null parents).
  */
final class StructVectorDecoder(c: Int, st: StructType) extends VectorDecoder(c) {
  private val children: Array[VectorDecoder] = {
    var id = c + 1
    st.fields.map { f =>
      val d = VectorDecoder.create(id, f.dataType)
      id += ColumnTree.subtreeSize(f.dataType)
      d
    }
  }

  override def decoderChildren: Seq[VectorDecoder] = children.toSeq

  override protected def startValues(src: StreamSource): Unit =
    children.foreach(_.start(src))

  override protected def put(v: OnHeapColumnVector, i: Int): Unit = {
    var j = 0
    while (j < children.length) {
      children(j).putOne(v.getChild(j).asInstanceOf[OnHeapColumnVector], i)
      j += 1
    }
  }

  /** Null-free struct: each child's n values are exactly the batch's n
    * rows in order, so every child bulk-fills its own column directly.
    * A NULLABLE struct stays on the per-row path: null parents consume
    * no child values, so child value k lands at the k-th non-null row —
    * a parent-hole scatter the child kernels don't model.
    */
  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    var j = 0
    while (j < children.length) {
      children(j).fillChild(v.getChild(j).asInstanceOf[OnHeapColumnVector], n)
      j += 1
    }
    true
  }

  override protected def seekValues(e: RowIndexEntry): Unit = ()
}

final class BoolVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: BitFieldReader = null
  private var scratch: Array[Boolean] = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(c, StreamKind.Data).map(new BitFieldReader(_)).orNull
  override protected def put(v: OnHeapColumnVector, i: Int): Unit =
    v.putBoolean(i, data.next())
  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    if (scratch == null || scratch.length < n) scratch = new Array[Boolean](n)
    data.nextBits(scratch, 0, n)
    var i = 0
    while (i < n) { v.putBoolean(i, scratch(i)); i += 1 }
    true
  }
  override protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    val c = decodePresent(v, n)
    if (scratch == null || scratch.length < c) scratch = new Array[Boolean](c)
    data.nextBits(scratch, 0, c)
    var i = 0
    var j = 0
    while (i < n) {
      if (presentScratch(i)) { v.putBoolean(i, scratch(j)); j += 1 }
      i += 1
    }
    true
  }
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

final class ByteVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: RunLengthByteReader = null
  private var scratch: Array[Byte] = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(c, StreamKind.Data).map(new RunLengthByteReader(_)).orNull
  override protected def put(v: OnHeapColumnVector, i: Int): Unit =
    v.putByte(i, data.next())
  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    if (scratch == null || scratch.length < n) scratch = new Array[Byte](n)
    data.nextBytes(scratch, 0, n)
    v.putBytes(0, n, scratch, 0)
    true
  }
  override protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    val c = decodePresent(v, n)
    if (scratch == null || scratch.length < c) scratch = new Array[Byte](c)
    data.nextBytes(scratch, 0, c)
    var i = 0
    var j = 0
    while (i < n) {
      if (presentScratch(i)) { v.putByte(i, scratch(j)); j += 1 }
      i += 1
    }
    true
  }
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

final class LongVectorDecoder(c: Int, dt: DataType) extends VectorDecoder(c) {
  private var data: RunLengthIntegerReader = null
  private var dict: Array[Long] = null

  override protected def startValues(src: StreamSource): Unit = {
    val enc = src.encoding(c)
    if (enc.dictionary) {
      val dr = src.stream(c, StreamKind.DictionaryData)
        .map(new RunLengthIntegerReader(_, signed = true, src.useVInts)).get
      dict = Array.fill(enc.dictionarySize)(dr.next())
      data = src.stream(c, StreamKind.Data)
        .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
    } else {
      dict = null
      data = src.stream(c, StreamKind.Data)
        .map(new RunLengthIntegerReader(_, signed = true, src.useVInts)).orNull
    }
  }

  // decimals of precision <= MAX_INT_DIGITS live in int vectors — this
  // must mirror WritableColumnVector's storage choice or reads misalign
  private val asInt: Boolean = dt match {
    case ShortType | IntegerType => true
    case d: DecimalType =>
      d.precision <= org.apache.spark.sql.types.Decimal.MAX_INT_DIGITS
    case _ => false
  }
  private val putter: (OnHeapColumnVector, Int, Long) => Unit = dt match {
    case ShortType => (v, i, x) => v.putShort(i, x.toShort)
    case _ if asInt => (v, i, x) => v.putInt(i, x.toInt)
    case _ => (v, i, x) => v.putLong(i, x)
  }

  override protected def put(v: OnHeapColumnVector, i: Int): Unit = {
    val raw = data.next()
    putter(v, i, if (dict != null) dict(raw.toInt) else raw)
  }

  private var scratch: Array[Long] = null

  private def decodeValues(n: Int): Unit = {
    if (scratch == null || scratch.length < n) scratch = new Array[Long](n)
    data.nextLongs(scratch, 0, n)
    if (dict != null) {
      var i = 0
      while (i < n) { scratch(i) = dict(scratch(i).toInt); i += 1 }
    }
  }

  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    decodeValues(n)
    dt match {
      case ShortType =>
        var i = 0
        while (i < n) { v.putShort(i, scratch(i).toShort); i += 1 }
      case _ if asInt =>
        var i = 0
        while (i < n) { v.putInt(i, scratch(i).toInt); i += 1 }
      case _ => v.putLongs(0, n, scratch, 0)
    }
    true
  }

  override protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    val c = decodePresent(v, n)
    decodeValues(c)
    var i = 0
    var j = 0
    while (i < n) {
      if (presentScratch(i)) { putter(v, i, scratch(j)); j += 1 }
      i += 1
    }
    true
  }

  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

final class DateVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: RunLengthIntegerReader = null
  private var scratch: Array[Long] = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(c, StreamKind.Data)
      .map(new RunLengthIntegerReader(_, signed = true, src.useVInts)).orNull
  override protected def put(v: OnHeapColumnVector, i: Int): Unit =
    v.putInt(i, data.next().toInt)
  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    if (scratch == null || scratch.length < n) scratch = new Array[Long](n)
    data.nextLongs(scratch, 0, n)
    var i = 0
    while (i < n) { v.putInt(i, scratch(i).toInt); i += 1 }
    true
  }
  override protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    val c = decodePresent(v, n)
    if (scratch == null || scratch.length < c) scratch = new Array[Long](c)
    data.nextLongs(scratch, 0, c)
    var i = 0
    var j = 0
    while (i < n) {
      if (presentScratch(i)) { v.putInt(i, scratch(j).toInt); j += 1 }
      i += 1
    }
    true
  }
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

private[dwrf] object BulkBytes {
  /** Fill dst[0, len) from the stream (InStream.read is segment-bounded). */
  def readFully(data: InStream, dst: Array[Byte], len: Int): Unit = {
    var got = 0
    while (got < len) {
      val n = data.read(dst, got, len - got)
      if (n < 0) throw new java.io.EOFException("EOF in value stream")
      got += n
    }
  }
}

final class FloatVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: InStream = null
  private var scratch: Array[Byte] = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(c, StreamKind.Data).orNull
  override protected def put(v: OnHeapColumnVector, i: Int): Unit =
    v.putFloat(i, Serialization.readFloat(data))
  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    if (scratch == null || scratch.length < n * 4) scratch = new Array[Byte](n * 4)
    BulkBytes.readFully(data, scratch, n * 4)
    v.putFloats(0, n, scratch, 0) // wire is IEEE-LE, exactly putFloats' layout
    true
  }
  override protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    val c = decodePresent(v, n)
    if (scratch == null || scratch.length < c * 4) scratch = new Array[Byte](c * 4)
    BulkBytes.readFully(data, scratch, c * 4)
    val bb = java.nio.ByteBuffer.wrap(scratch).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    var j = 0
    while (i < n) {
      if (presentScratch(i)) { v.putFloat(i, bb.getFloat(j * 4)); j += 1 }
      i += 1
    }
    true
  }
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

final class DoubleVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: InStream = null
  private var scratch: Array[Byte] = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(c, StreamKind.Data).orNull
  override protected def put(v: OnHeapColumnVector, i: Int): Unit =
    v.putDouble(i, Serialization.readDouble(data))
  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    if (scratch == null || scratch.length < n * 8) scratch = new Array[Byte](n * 8)
    BulkBytes.readFully(data, scratch, n * 8)
    v.putDoubles(0, n, scratch, 0) // wire is IEEE-LE, exactly putDoubles' layout
    true
  }
  override protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = {
    if (data == null) return false
    val c = decodePresent(v, n)
    if (scratch == null || scratch.length < c * 8) scratch = new Array[Byte](c * 8)
    BulkBytes.readFully(data, scratch, c * 8)
    val bb = java.nio.ByteBuffer.wrap(scratch).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    var j = 0
    while (i < n) {
      if (presentScratch(i)) { v.putDouble(i, bb.getDouble(j * 8)); j += 1 }
      i += 1
    }
    true
  }
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

/** Dictionary-encoded string columns ship 4-byte ids into the batch and
  * decode lazily at access time (`OnHeapColumnVector.setDictionary`) —
  * the columnar analog of the reference's lazy dictionary string reads
  * (LazyStringDictionaryTreeReader.java:60-220): no per-row byte copy at
  * scan time, and rows a filter drops above the scan are never decoded.
  */
final class ByteArrayDictionary(column: Int, main: Array[Array[Byte]],
    stride: Array[Array[Byte]])
    extends org.apache.spark.sql.execution.vectorized.Dictionary {
  override def decodeToBinary(id: Int): Array[Byte] =
    if (id >= 0 && id < main.length) main(id)
    else if (id >= main.length && id - main.length < stride.length)
      stride(id - main.length)
    else throw new java.io.IOException(
      // corrupt ids surface lazily at access time, far from the scan:
      // name the column and id space so the failure is traceable
      s"dwrf: corrupt dictionary id $id in column $column " +
        s"(${main.length} main + ${stride.length} stride entries)")
  override def decodeToInt(id: Int): Int =
    throw new UnsupportedOperationException("string dictionary")
  override def decodeToLong(id: Int): Long =
    throw new UnsupportedOperationException("string dictionary")
  override def decodeToFloat(id: Int): Float =
    throw new UnsupportedOperationException("string dictionary")
  override def decodeToDouble(id: Int): Double =
    throw new UnsupportedOperationException("string dictionary")
}

final class StringVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: InStream = null
  private var lengths: RunLengthIntegerReader = null
  private var dict: Array[Array[Byte]] = null
  private var strideDict: Array[Array[Byte]] = null
  private var ids: RunLengthIntegerReader = null
  private var sparkDict: ByteArrayDictionary = null
  private var idsOut: org.apache.spark.sql.execution.vectorized.WritableColumnVector = null

  private val emptyStream: InStream =
    InStream("empty", Array.emptyByteArray, None)

  private def readBlob(blob: InStream, len: Int): Array[Byte] = {
    val b = new Array[Byte](len)
    var got = 0
    while (got < len) {
      val n = blob.read(b, got, len - got)
      if (n < 0) throw new java.io.EOFException("EOF in dictionary blob")
      got += n
    }
    b
  }

  override protected def startValues(src: StreamSource): Unit = {
    val enc = src.encoding(c)
    if (enc.dictionary) {
      val blob = src.stream(c, StreamKind.DictionaryData).getOrElse(emptyStream)
      val keyLens = src.stream(c, StreamKind.Length)
        .map(new RunLengthIntegerReader(_, signed = false, src.useVInts))
        .getOrElse(new RunLengthIntegerReader(emptyStream, signed = false, src.useVInts))
      dict = Array.fill(enc.dictionarySize)(readBlob(blob, keyLens.next().toInt))
      strideDict = src.stream(c, StreamKind.StrideDictionaryLength)
        .map { lenStream =>
          val lens = new RunLengthIntegerReader(lenStream, signed = false, src.useVInts)
          val sblob = src.stream(c, StreamKind.StrideDictionary).getOrElse(emptyStream)
          val numStrides = lens.next().toInt
          Array.fill(numStrides) {
            val count = lens.next().toInt
            Array.fill(count)(readBlob(sblob, lens.next().toInt))
          }.flatten
        }.orNull
      ids = src.stream(c, StreamKind.Data)
        .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
      sparkDict = new ByteArrayDictionary(c, dict,
        if (strideDict == null) Array.empty else strideDict)
      data = null; lengths = null
    } else {
      dict = null; strideDict = null; ids = null; sparkDict = null
      data = src.stream(c, StreamKind.Data).orNull
      lengths = src.stream(c, StreamKind.Length)
        .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
    }
  }

  /** Attach (or detach — encodings can flip between stripes) the lazy
    * dictionary on the output vector once per batch. */
  override protected def prepare(v: OnHeapColumnVector, n: Int): Unit =
    if (sparkDict != null) {
      v.setDictionary(sparkDict)
      idsOut = v.reserveDictionaryIds(n)
    } else {
      v.setDictionary(null)
      idsOut = null
    }

  override protected def put(v: OnHeapColumnVector, i: Int): Unit = {
    if (dict != null) {
      val id = ids.next().toInt
      if (idsOut != null) idsOut.putInt(i, id) // lazy: decode at access
      else { // nested under a collection/struct: materialize
        val b = if (id < dict.length) dict(id) else strideDict(id - dict.length)
        v.putByteArray(i, b, 0, b.length)
      }
    } else {
      val len = lengths.next().toInt
      val b = new Array[Byte](len)
      var got = 0
      while (got < len) {
        val n = data.read(b, got, len - got)
        if (n < 0) throw new java.io.EOFException("EOF in string data")
        got += n
      }
      v.putByteArray(i, b, 0, len)
    }
  }

  private var lenScratch: Array[Long] = null
  private var blobScratch: Array[Byte] = null

  override protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = {
    // dictionary-encoded only: the lazy ids vector makes the scatter
    // cheap; direct encoding under nulls keeps the per-row path
    if (dict == null || ids == null || idsOut == null) return false
    val c = decodePresent(v, n)
    if (lenScratch == null || lenScratch.length < c) lenScratch = new Array[Long](c)
    ids.nextLongs(lenScratch, 0, c)
    var i = 0
    var j = 0
    while (i < n) {
      if (presentScratch(i)) { idsOut.putInt(i, lenScratch(j).toInt); j += 1 }
      i += 1
    }
    true
  }

  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    if (dict != null) {
      if (ids == null || idsOut == null) return false
      if (lenScratch == null || lenScratch.length < n) lenScratch = new Array[Long](n)
      ids.nextLongs(lenScratch, 0, n)
      var i = 0
      while (i < n) { idsOut.putInt(i, lenScratch(i).toInt); i += 1 }
      true
    } else {
      if (lengths == null || data == null) return false
      if (lenScratch == null || lenScratch.length < n) lenScratch = new Array[Long](n)
      lengths.nextLongs(lenScratch, 0, n)
      var total = 0L
      var i = 0
      while (i < n) { total += lenScratch(i); i += 1 }
      if (total > Int.MaxValue / 2) {
        // Oversized batch (>1 GiB of string payload). The LENGTH stream is
        // already consumed, so falling back to the per-row put() would
        // re-read lengths and desync LENGTH vs DATA. Stay on this path and
        // read each value directly from the already-decoded lenScratch.
        i = 0
        while (i < n) {
          val len = lenScratch(i).toInt
          val b = new Array[Byte](len)
          BulkBytes.readFully(data, b, len)
          v.putByteArray(i, b, 0, len)
          i += 1
        }
      } else {
        val t = total.toInt
        if (blobScratch == null || blobScratch.length < t)
          blobScratch = new Array[Byte](math.max(t, 16 * 1024))
        BulkBytes.readFully(data, blobScratch, t)
        var off = 0
        i = 0
        while (i < n) {
          val len = lenScratch(i).toInt
          v.putByteArray(i, blobScratch, off, len)
          off += len
          i += 1
        }
      }
      true
    }
  }

  override protected def seekValues(e: RowIndexEntry): Unit =
    if (dict != null)
      e.positions.get(StreamKind.Data).foreach(p => ids.seek(new ArrayPositionProvider(p)))
    else {
      e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
      e.positions.get(StreamKind.Length).foreach(p => lengths.seek(new ArrayPositionProvider(p)))
    }
}

final class BinaryVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: InStream = null
  private var lengths: RunLengthIntegerReader = null

  override protected def startValues(src: StreamSource): Unit = {
    data = src.stream(c, StreamKind.Data).orNull
    lengths = src.stream(c, StreamKind.Length)
      .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
  }

  override protected def put(v: OnHeapColumnVector, i: Int): Unit = {
    val len = lengths.next().toInt
    val b = new Array[Byte](len)
    var got = 0
    while (got < len) {
      val n = data.read(b, got, len - got)
      if (n < 0) throw new java.io.EOFException("EOF in binary data")
      got += n
    }
    v.putByteArray(i, b, 0, len)
  }

  override protected def seekValues(e: RowIndexEntry): Unit = {
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
    e.positions.get(StreamKind.Length).foreach(p => lengths.seek(new ArrayPositionProvider(p)))
  }
}

final class TimestampVectorDecoder(c: Int) extends VectorDecoder(c) {
  import TimestampTreeWriter.BaseSeconds
  private var seconds: RunLengthIntegerReader = null
  private var nanos: RunLengthIntegerReader = null

  override protected def startValues(src: StreamSource): Unit = {
    seconds = src.stream(c, StreamKind.Data)
      .map(new RunLengthIntegerReader(_, signed = true, src.useVInts)).orNull
    nanos = src.stream(c, StreamKind.NanoData)
      .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
  }

  override protected def put(v: OnHeapColumnVector, i: Int): Unit = {
    val sec = seconds.next() + BaseSeconds
    val enc = nanos.next()
    v.putLong(i, sec * 1000000L + decodeNanos(enc) / 1000L)
  }

  private def decodeNanos(enc: Long): Long = {
    val zeros = (enc & 7).toInt
    var ns = enc >>> 3
    if (zeros != 0) {
      var j = 0
      while (j < zeros + 2) { ns *= 10; j += 1 }
    }
    ns
  }

  private var secScratch: Array[Long] = null
  private var nanoScratch: Array[Long] = null

  override protected def fillBulk(v: OnHeapColumnVector, n: Int): Boolean = {
    if (seconds == null || nanos == null) return false
    if (secScratch == null || secScratch.length < n) {
      secScratch = new Array[Long](n); nanoScratch = new Array[Long](n)
    }
    seconds.nextLongs(secScratch, 0, n)
    nanos.nextLongs(nanoScratch, 0, n)
    var i = 0
    while (i < n) {
      v.putLong(i,
        (secScratch(i) + BaseSeconds) * 1000000L + decodeNanos(nanoScratch(i)) / 1000L)
      i += 1
    }
    true
  }
  override protected def fillBulkNullable(v: OnHeapColumnVector, n: Int): Boolean = {
    if (seconds == null || nanos == null) return false
    val c = decodePresent(v, n)
    if (secScratch == null || secScratch.length < c) {
      secScratch = new Array[Long](c); nanoScratch = new Array[Long](c)
    }
    seconds.nextLongs(secScratch, 0, c)
    nanos.nextLongs(nanoScratch, 0, c)
    var i = 0
    var j = 0
    while (i < n) {
      if (presentScratch(i)) {
        v.putLong(i,
          (secScratch(j) + BaseSeconds) * 1000000L + decodeNanos(nanoScratch(j)) / 1000L)
        j += 1
      }
      i += 1
    }
    true
  }

  override protected def seekValues(e: RowIndexEntry): Unit = {
    e.positions.get(StreamKind.Data).foreach(p => seconds.seek(new ArrayPositionProvider(p)))
    e.positions.get(StreamKind.NanoData).foreach(p => nanos.seek(new ArrayPositionProvider(p)))
  }
}

/** PartitionReader producing ColumnarBatches over the partition's stripes.
  *
  * Pushed filters drive the SAME stripe- and stride-level stats skipping
  * as the row path (reference intent: RecordReaderImpl.java:281-430 lazy
  * materialization): surviving strides are grouped into contiguous runs,
  * decoders seek once per run, and batches are emitted run-local so a
  * skipped stride is never decoded. Spark re-evaluates the filters above
  * the scan, so skipping is pure I/O+decode savings — exactness is free.
  */
final class DwrfColumnarPartitionReader(
    reader: DwrfFileReader,
    stripes: Seq[StripeInformation],
    readSchema: StructType,
    filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
    batchSize: Int = 4096,
    partValues: Map[String, Any] = Map.empty)
    extends org.apache.spark.sql.connector.read.PartitionReader[ColumnarBatch] {

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, readSchema)
  private val batch = new ColumnarBatch(vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector])

  private val idByName = {
    val ids = ColumnTree.topLevelIds(reader.schema)
    reader.schema.fields.map(_.name).zip(ids.zip(reader.schema.fields.map(_.dataType))).toMap
  }
  private val decoders: Array[VectorDecoder] = readSchema.fields.map { f =>
    if (partValues.contains(f.name)) // partition column: constant fill
      new ConstantVectorDecoder(partValues(f.name), f.dataType)
    else ColumnAliases.resolve(f, idByName) match {
      case Some((id, dt)) => VectorDecoder.create(id, dt)
      case None => new NullVectorDecoder // schema evolution: all-null
    }
  }
  private val wanted: Array[Boolean] = {
    val inc = new Array[Boolean](ColumnTree.columnCount(reader.schema))
    readSchema.fields.foreach { f =>
      ColumnAliases.resolve(f, idByName).foreach { case (id, dt) =>
        ColumnTree.includeSubtree(inc, id, dt)
      }
    }
    inc
  }

  /** A maximal run of contiguous surviving strides: seek to `entries`
    * (None = stripe start, no seek needed), then `rows` rows are valid.
    * Plain class (never pattern-matched): a nested case class would
    * synthesize an equals whose outer-instance type test scalac rightly
    * warns cannot be checked. */
  private final class Segment(
      val entries: Option[Map[Int, RowIndexEntry]], val rows: Long)

  private val stripeIt = stripes.iterator
  private var segments: Iterator[Segment] = Iterator.empty
  private var remainingInSegment = 0L

  /** Advance to the next stripe with any surviving rows; fills `segments`.
    * Returns false when stripes are exhausted.
    */
  private def advanceStripe(): Boolean = {
    while (stripeIt.hasNext) {
      val si = stripeIt.next()
      val sf = reader.readStripeFooter(si)
      def stripeStatsOf(attr: String): Option[ColumnStats] =
        reader.statIdByPath.get(attr).flatMap { case (id, _) => sf.stats.get(id) }
      if (filters.nonEmpty && !StatsFilter.mayMatch(filters, reader.schema, stripeStatsOf)) {
        reader.counters.stripesSkipped += 1
      } else {
        val stride = reader.footer.rowIndexStride
        def fullRead(): Boolean = {
          reader.counters.stripesRead += 1
          val src = reader.openStripe(si, sf, wanted)
          decoders.foreach(_.start(src))
          segments = Iterator(new Segment(None, si.numRows))
          true
        }
        if (filters.isEmpty || stride <= 0 || si.numRows <= stride) return fullRead()
        val wantedIds = wanted.indices.filter(wanted).toSet
        val indexes = reader.readRowIndexes(si, sf, wantedIds)
        val numStrides = ((si.numRows + stride - 1) / stride).toInt
        if (indexes.isEmpty || indexes.values.exists(_.length != numStrides))
          return fullRead()
        def strideStatsOf(k: Int)(attr: String): Option[ColumnStats] =
          reader.statIdByPath.get(attr).flatMap { case (id, _) =>
            indexes.get(id).map(_(k).stats)
          }
        val statsMatching = (0 until numStrides)
          .filter(k => StatsFilter.mayMatch(filters, reader.schema, strideStatsOf(k)))
        reader.counters.stridesSkipped += numStrides - statsMatching.length
        // equality/IN conjuncts get a second, bloom-backed refutation pass
        val matching =
          reader.bloomRefineStrides(si, sf, filters, numStrides, statsMatching)
        if (matching.isEmpty) {
          reader.counters.stripesSkipped += 1 // all strides eliminated
        } else if (matching.length == numStrides) {
          return fullRead()
        } else {
          reader.counters.stripesRead += 1
          val runs = reader.runsOf(matching)
          // stride-granular I/O pruning: only byte ranges covering the
          // surviving runs are read (see openStripe)
          val src = reader.openStripe(si, sf, wanted,
            Some(StrideSelection(indexes, runs, numStrides)))
          decoders.foreach(_.start(src))
          segments = runs.iterator.map { case (a, b) =>
            val base = a.toLong * stride
            val rows = math.min(b.toLong * stride, si.numRows) - base
            new Segment(Some(indexes.map { case (id, es) => id -> es(a) }), rows)
          }
          return true
        }
      }
    }
    false
  }

  // hoisted once: the reader runs on one task thread by Spark's contract
  private val prof = graft.format.ReadProfile.get

  override def next(): Boolean = {
    // bracket the decompress profile so interleaved readers in one task
    // thread (SPJ) attribute their own nanos, never each other's
    val d0 = prof.decompressNanos
    try {
      while (remainingInSegment == 0) {
        if (segments.hasNext) {
          val seg = segments.next()
          seg.entries.foreach(e => decoders.foreach(_.seekStride(e)))
          remainingInSegment = seg.rows
        } else if (!advanceStripe()) return false
      }
      val n = math.min(batchSize.toLong, remainingInSegment).toInt
      var i = 0
      while (i < vectors.length) {
        vectors(i).reset()
        decoders(i).fill(vectors(i), n)
        i += 1
      }
      batch.setNumRows(n)
      remainingInSegment -= n
      reader.counters.batchesEmitted += 1
      true
    } finally {
      reader.counters.decompressNanosAcc += prof.decompressNanos - d0
    }
  }

  override def get(): ColumnarBatch = batch

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    DwrfMetrics.taskValues(reader.counters)

  override def close(): Unit = {
    batch.close()
    reader.close()
  }
}
