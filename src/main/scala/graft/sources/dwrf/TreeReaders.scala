package graft.sources.dwrf

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.format._

/** Per-stripe stream access for readers. */
trait StreamSource {
  /** The stream's bytes for (column, kind), if present in this stripe. */
  def stream(column: Int, kind: Int): Option[InStream]
  def encoding(column: Int): ColumnEncoding
  /** Whether integer streams use varints (false = fixed 8-byte LE). */
  def useVInts: Boolean = true
}

object TreeReader {
  def create(columnId: Int, dt: DataType): TreeReader = dt match {
    case BooleanType => new BooleanTreeReader(columnId)
    case ByteType => new ByteTreeReader(columnId)
    case ShortType => new LongTreeReader(columnId, v => v.toShort)
    case IntegerType => new LongTreeReader(columnId, v => v.toInt)
    case LongType => new LongTreeReader(columnId, v => v)
    case d: DecimalType if d.precision <= 18 =>
      new LongTreeReader(columnId, v => Decimal(v, d.precision, d.scale))
    case FloatType => new FloatTreeReader(columnId)
    case DoubleType => new DoubleTreeReader(columnId)
    case StringType => new StringTreeReader(columnId)
    case BinaryType => new BinaryTreeReader(columnId)
    case TimestampType | TimestampNTZType => new TimestampTreeReader(columnId)
    case DateType => new DateTreeReader(columnId)
    case s: StructType => new StructTreeReader(columnId, s)
    case a: ArrayType => new ListTreeReader(columnId, a)
    case m: MapType => new MapTreeReader(columnId, m)
    case other =>
      throw new UnsupportedOperationException(s"dwrf: unsupported type $other")
  }
}

/** Read-side column kernel: decodes one column's streams for one stripe
  * (reference lazy Lazy*TreeReader family; we decode eagerly per-row into
  * Catalyst values — laziness is subsumed by column pruning, SURVEY §4).
  */
abstract class TreeReader(val columnId: Int) {
  protected var present: BitFieldReader = null

  def startStripe(src: StreamSource): Unit = {
    present = src.stream(columnId, StreamKind.Present)
      .map(new BitFieldReader(_)).orNull
    startValues(src)
  }

  protected def startValues(src: StreamSource): Unit

  /** Next value as a Catalyst internal value (null when absent). */
  final def next(): Any =
    if (present != null && !present.next()) null else nextValue()

  protected def nextValue(): Any

  /** Skip n top-level rows (present-aware). */
  final def skipRows(n: Long): Unit = {
    if (present == null) skipValues(n)
    else {
      var nonNull = 0L
      var i = 0L
      while (i < n) { if (present.next()) nonNull += 1; i += 1 }
      skipValues(nonNull)
    }
  }

  /** Skip n non-null values. */
  protected def skipValues(n: Long): Unit

  /** Seek to a row-index entry (consumes positions in stream order). */
  def seek(entry: RowIndexEntry): Unit = {
    if (present != null)
      entry.positions.get(StreamKind.Present)
        .foreach(p => present.seek(new ArrayPositionProvider(p)))
    seekValues(entry)
  }

  protected def seekValues(entry: RowIndexEntry): Unit = ()

  /** Nested readers a seek must recurse into. */
  def readerChildren: Seq[TreeReader] = Nil

  /** Seek this subtree to stride k via per-column index entries. */
  final def seekTree(entries: Map[Int, RowIndexEntry]): Unit = {
    entries.get(columnId).foreach(seek)
    readerChildren.foreach(_.seekTree(entries))
  }
}

/** Schema evolution: a column requested but absent from this file reads
  * as all-null (columnId -1 matches no streams).
  */
final class NullColumnTreeReader extends TreeReader(-1) {
  override protected def startValues(src: StreamSource): Unit = ()
  override protected def nextValue(): Any = null
  override protected def skipValues(n: Long): Unit = ()
}

final class BooleanTreeReader(columnId: Int) extends TreeReader(columnId) {
  private var data: BitFieldReader = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(columnId, StreamKind.Data).map(new BitFieldReader(_)).orNull
  override protected def nextValue(): Any = data.next()
  override protected def skipValues(n: Long): Unit = data.skip(n)
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

final class ByteTreeReader(columnId: Int) extends TreeReader(columnId) {
  private var data: RunLengthByteReader = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(columnId, StreamKind.Data).map(new RunLengthByteReader(_)).orNull
  override protected def nextValue(): Any = data.next()
  override protected def skipValues(n: Long): Unit = data.skip(n)
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

/** Integers: per-stripe encoding dispatch between direct and dictionary
  * (reference R5, LazyIntTreeReader.java:41-59).
  */
final class LongTreeReader(columnId: Int, narrow: Long => Any)
    extends TreeReader(columnId) {
  private var data: RunLengthIntegerReader = null
  private var dictionary: Array[Long] = null

  override protected def startValues(src: StreamSource): Unit = {
    val enc = src.encoding(columnId)
    if (enc.dictionary) {
      val dictReader = src.stream(columnId, StreamKind.DictionaryData)
        .map(new RunLengthIntegerReader(_, signed = true, src.useVInts))
        .getOrElse(throw new IllegalStateException(s"col $columnId: missing dictionary"))
      dictionary = Array.fill(enc.dictionarySize)(dictReader.next())
      data = src.stream(columnId, StreamKind.Data)
        .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
    } else {
      dictionary = null
      data = src.stream(columnId, StreamKind.Data)
        .map(new RunLengthIntegerReader(_, signed = true, src.useVInts)).orNull
    }
  }

  override protected def nextValue(): Any =
    if (dictionary != null) narrow(dictionary(data.next().toInt))
    else narrow(data.next())

  override protected def skipValues(n: Long): Unit = data.skip(n)
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

final class FloatTreeReader(columnId: Int) extends TreeReader(columnId) {
  private var data: InStream = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(columnId, StreamKind.Data).orNull
  override protected def nextValue(): Any = Serialization.readFloat(data)
  override protected def skipValues(n: Long): Unit = {
    var i = 0L
    while (i < n) { Serialization.readFloat(data); i += 1 }
  }
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

final class DoubleTreeReader(columnId: Int) extends TreeReader(columnId) {
  private var data: InStream = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(columnId, StreamKind.Data).orNull
  override protected def nextValue(): Any = Serialization.readDouble(data)
  override protected def skipValues(n: Long): Unit = {
    var i = 0L
    while (i < n) { Serialization.readDouble(data); i += 1 }
  }
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

/** Strings: direct (DATA bytes + LENGTH) or dictionary (sorted key blob +
  * ids) per the stripe's encoding (reference LazyStringTreeReader,
  * LazyStringDictionaryTreeReader.java:60-220). Ids at or beyond the
  * global dictionary size index the stride-major concatenation of the
  * per-stride side dictionaries (E8) — position-independent, so nested
  * string columns resolve identically.
  */
final class StringTreeReader(columnId: Int) extends TreeReader(columnId) {
  private var data: InStream = null
  private var lengths: RunLengthIntegerReader = null
  private var dictionary: Array[UTF8String] = null
  private var strideDict: Array[UTF8String] = null
  private var ids: RunLengthIntegerReader = null

  private def readBlob(blob: InStream, len: Int): UTF8String = {
    val b = new Array[Byte](len)
    var got = 0
    while (got < len) {
      val n = blob.read(b, got, len - got)
      if (n < 0) throw new java.io.EOFException("EOF in dictionary blob")
      got += n
    }
    UTF8String.fromBytes(b)
  }

  private val emptyStream: InStream =
    InStream("empty", Array.emptyByteArray, None)

  override protected def startValues(src: StreamSource): Unit = {
    val enc = src.encoding(columnId)
    if (enc.dictionary) {
      val dictData = src.stream(columnId, StreamKind.DictionaryData)
        .getOrElse(emptyStream)
      val keyLengths = src.stream(columnId, StreamKind.Length)
        .map(new RunLengthIntegerReader(_, signed = false, src.useVInts))
        .getOrElse(new RunLengthIntegerReader(emptyStream, signed = false, src.useVInts))
      dictionary = Array.fill(enc.dictionarySize)(
        readBlob(dictData, keyLengths.next().toInt))
      // side dictionaries (singleton keys), flattened stride-major
      strideDict = src.stream(columnId, StreamKind.StrideDictionaryLength)
        .map { lenStream =>
          val lens = new RunLengthIntegerReader(lenStream, signed = false, src.useVInts)
          val blob = src.stream(columnId, StreamKind.StrideDictionary)
            .getOrElse(emptyStream)
          val numStrides = lens.next().toInt
          Array.fill(numStrides) {
            val count = lens.next().toInt
            Array.fill(count)(readBlob(blob, lens.next().toInt))
          }.flatten
        }.orNull
      ids = src.stream(columnId, StreamKind.Data)
        .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
      data = null; lengths = null
    } else {
      dictionary = null; strideDict = null; ids = null
      data = src.stream(columnId, StreamKind.Data).orNull
      lengths = src.stream(columnId, StreamKind.Length)
        .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
    }
  }

  override protected def nextValue(): Any =
    if (dictionary != null) {
      val id = ids.next().toInt
      if (id < dictionary.length) dictionary(id)
      else strideDict(id - dictionary.length)
    } else {
      val len = lengths.next().toInt
      val b = new Array[Byte](len)
      var got = 0
      while (got < len) {
        val n = data.read(b, got, len - got)
        if (n < 0) throw new java.io.EOFException("EOF in string data")
        got += n
      }
      UTF8String.fromBytes(b)
    }

  override protected def skipValues(n: Long): Unit =
    if (dictionary != null) ids.skip(n)
    else {
      var toSkip = 0L
      var i = 0L
      while (i < n) { toSkip += lengths.next(); i += 1 }
      while (toSkip > 0) {
        val skipped = data.skip(toSkip)
        if (skipped <= 0) throw new java.io.EOFException("EOF skipping string data")
        toSkip -= skipped
      }
    }

  override protected def seekValues(e: RowIndexEntry): Unit =
    if (dictionary != null)
      e.positions.get(StreamKind.Data).foreach(p => ids.seek(new ArrayPositionProvider(p)))
    else {
      e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
      e.positions.get(StreamKind.Length).foreach(p => lengths.seek(new ArrayPositionProvider(p)))
    }
}

final class BinaryTreeReader(columnId: Int) extends TreeReader(columnId) {
  private var data: InStream = null
  private var lengths: RunLengthIntegerReader = null

  override protected def startValues(src: StreamSource): Unit = {
    data = src.stream(columnId, StreamKind.Data).orNull
    lengths = src.stream(columnId, StreamKind.Length)
      .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
  }

  override protected def nextValue(): Any = {
    val len = lengths.next().toInt
    val b = new Array[Byte](len)
    var got = 0
    while (got < len) {
      val n = data.read(b, got, len - got)
      if (n < 0) throw new java.io.EOFException("EOF in binary data")
      got += n
    }
    b
  }

  override protected def skipValues(n: Long): Unit = {
    var toSkip = 0L
    var i = 0L
    while (i < n) { toSkip += lengths.next(); i += 1 }
    while (toSkip > 0) {
      val skipped = data.skip(toSkip)
      if (skipped <= 0) throw new java.io.EOFException("EOF skipping binary data")
      toSkip -= skipped
    }
  }

  override protected def seekValues(e: RowIndexEntry): Unit = {
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
    e.positions.get(StreamKind.Length).foreach(p => lengths.seek(new ArrayPositionProvider(p)))
  }
}

final class TimestampTreeReader(columnId: Int) extends TreeReader(columnId) {
  import TimestampTreeWriter.BaseSeconds
  private var seconds: RunLengthIntegerReader = null
  private var nanos: RunLengthIntegerReader = null

  override protected def startValues(src: StreamSource): Unit = {
    seconds = src.stream(columnId, StreamKind.Data)
      .map(new RunLengthIntegerReader(_, signed = true, src.useVInts)).orNull
    nanos = src.stream(columnId, StreamKind.NanoData)
      .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
  }

  private def decodeNanos(v: Long): Long = {
    val zeros = (v & 7).toInt
    var result = v >>> 3
    if (zeros != 0) {
      var i = 0
      while (i < zeros + 2) { result *= 10; i += 1 }
    }
    result
  }

  override protected def nextValue(): Any = {
    val sec = seconds.next() + BaseSeconds
    val ns = decodeNanos(nanos.next())
    sec * 1000000L + ns / 1000L // Catalyst micros
  }

  override protected def skipValues(n: Long): Unit = {
    seconds.skip(n); nanos.skip(n)
  }

  override protected def seekValues(e: RowIndexEntry): Unit = {
    e.positions.get(StreamKind.Data).foreach(p => seconds.seek(new ArrayPositionProvider(p)))
    e.positions.get(StreamKind.NanoData).foreach(p => nanos.seek(new ArrayPositionProvider(p)))
  }
}

final class DateTreeReader(columnId: Int) extends TreeReader(columnId) {
  private var data: RunLengthIntegerReader = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(columnId, StreamKind.Data)
      .map(new RunLengthIntegerReader(_, signed = true, src.useVInts)).orNull
  override protected def nextValue(): Any = data.next().toInt
  override protected def skipValues(n: Long): Unit = data.skip(n)
  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Data).foreach(p => data.seek(new ArrayPositionProvider(p)))
}

final class StructTreeReader(columnId: Int, st: StructType)
    extends TreeReader(columnId) {
  val childReaders: Array[TreeReader] = {
    var id = columnId + 1
    st.fields.map { f =>
      val r = TreeReader.create(id, f.dataType)
      id += ColumnTree.subtreeSize(f.dataType)
      r
    }
  }

  override def startStripe(src: StreamSource): Unit = {
    super.startStripe(src)
    childReaders.foreach(_.startStripe(src))
  }

  override def readerChildren: Seq[TreeReader] = childReaders.toSeq

  override protected def startValues(src: StreamSource): Unit = ()

  override protected def nextValue(): Any = {
    val row = new GenericInternalRow(childReaders.length)
    var i = 0
    while (i < childReaders.length) {
      row.update(i, childReaders(i).next())
      i += 1
    }
    row
  }

  override protected def skipValues(n: Long): Unit =
    childReaders.foreach(_.skipRows(n))

  override protected def seekValues(e: RowIndexEntry): Unit = ()
}

final class ListTreeReader(columnId: Int, at: ArrayType)
    extends TreeReader(columnId) {
  private var lengths: RunLengthIntegerReader = null
  private val elementReader = TreeReader.create(columnId + 1, at.elementType)

  override def startStripe(src: StreamSource): Unit = {
    super.startStripe(src)
    elementReader.startStripe(src)
  }

  override def readerChildren: Seq[TreeReader] = Seq(elementReader)

  override protected def startValues(src: StreamSource): Unit =
    lengths = src.stream(columnId, StreamKind.Length)
      .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull

  override protected def nextValue(): Any = {
    val n = lengths.next().toInt
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) { arr(i) = elementReader.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def skipValues(n: Long): Unit = {
    var total = 0L
    var i = 0L
    while (i < n) { total += lengths.next(); i += 1 }
    elementReader.skipRows(total)
  }

  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Length).foreach(p => lengths.seek(new ArrayPositionProvider(p)))
}

final class MapTreeReader(columnId: Int, mt: MapType)
    extends TreeReader(columnId) {
  private var lengths: RunLengthIntegerReader = null
  private val keyReader = TreeReader.create(columnId + 1, mt.keyType)
  private val valueReader = TreeReader.create(
    columnId + 1 + ColumnTree.subtreeSize(mt.keyType), mt.valueType)

  override def startStripe(src: StreamSource): Unit = {
    super.startStripe(src)
    keyReader.startStripe(src)
    valueReader.startStripe(src)
  }

  override def readerChildren: Seq[TreeReader] = Seq(keyReader, valueReader)

  override protected def startValues(src: StreamSource): Unit =
    lengths = src.stream(columnId, StreamKind.Length)
      .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull

  override protected def nextValue(): Any = {
    val n = lengths.next().toInt
    val keys = new Array[Any](n)
    val values = new Array[Any](n)
    var i = 0
    while (i < n) {
      keys(i) = keyReader.next()
      values(i) = valueReader.next()
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }

  override protected def skipValues(n: Long): Unit = {
    var total = 0L
    var i = 0L
    while (i < n) { total += lengths.next(); i += 1 }
    keyReader.skipRows(total)
    valueReader.skipRows(total)
  }

  override protected def seekValues(e: RowIndexEntry): Unit =
    e.positions.get(StreamKind.Length).foreach(p => lengths.seek(new ArrayPositionProvider(p)))
}
