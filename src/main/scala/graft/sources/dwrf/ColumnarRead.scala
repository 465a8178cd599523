package graft.sources.dwrf

import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

import graft.format._

/** Vectorized scan path: decodes stripes straight into Spark
  * `OnHeapColumnVector`s in 4096-row batches, bypassing per-row boxing
  * entirely. Used for flat (all-atomic) projections without pushed
  * filters; nested schemas and filtered scans take the row path (which
  * can seek). The reference is row-at-a-time everywhere (SURVEY §4
  * "vectorization: none") — this is where the Spark build overtakes it.
  */
object ColumnarSupport {
  def supported(schema: StructType): Boolean =
    schema.fields.nonEmpty && schema.fields.forall(f => f.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | BinaryType |
           TimestampType | TimestampNTZType | DateType => true
      case _ => false
    })
}

/** Per-column vector filler over the stripe's streams. */
abstract class VectorDecoder(val columnId: Int) {
  protected var present: BitFieldReader = null
  /** Rows consumed in this stripe (stride-dictionary selection). */
  protected var rowPos: Long = 0L

  def start(src: StreamSource): Unit = {
    present = src.stream(columnId, StreamKind.Present)
      .map(new BitFieldReader(_)).orNull
    rowPos = 0L
    startValues(src)
  }

  protected def startValues(src: StreamSource): Unit

  final def fill(v: OnHeapColumnVector, n: Int): Unit = {
    var i = 0
    if (present == null) {
      while (i < n) { put(v, i); rowPos += 1; i += 1 }
    } else {
      while (i < n) {
        if (present.next()) put(v, i) else v.putNull(i)
        rowPos += 1
        i += 1
      }
    }
  }

  protected def put(v: OnHeapColumnVector, i: Int): Unit
}

object VectorDecoder {
  def create(columnId: Int, dt: DataType): VectorDecoder = dt match {
    case BooleanType => new BoolVectorDecoder(columnId)
    case ByteType => new ByteVectorDecoder(columnId)
    case ShortType | IntegerType | LongType => new LongVectorDecoder(columnId, dt)
    case DateType => new DateVectorDecoder(columnId)
    case FloatType => new FloatVectorDecoder(columnId)
    case DoubleType => new DoubleVectorDecoder(columnId)
    case StringType => new StringVectorDecoder(columnId)
    case BinaryType => new BinaryVectorDecoder(columnId)
    case TimestampType | TimestampNTZType => new TimestampVectorDecoder(columnId)
    case other =>
      throw new UnsupportedOperationException(s"columnar: unsupported $other")
  }
}

final class BoolVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: BitFieldReader = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(c, StreamKind.Data).map(new BitFieldReader(_)).orNull
  override protected def put(v: OnHeapColumnVector, i: Int): Unit =
    v.putBoolean(i, data.next())
}

final class ByteVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: RunLengthByteReader = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(c, StreamKind.Data).map(new RunLengthByteReader(_)).orNull
  override protected def put(v: OnHeapColumnVector, i: Int): Unit =
    v.putByte(i, data.next())
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

  private val putter: (OnHeapColumnVector, Int, Long) => Unit = dt match {
    case ShortType => (v, i, x) => v.putShort(i, x.toShort)
    case IntegerType => (v, i, x) => v.putInt(i, x.toInt)
    case _ => (v, i, x) => v.putLong(i, x)
  }

  override protected def put(v: OnHeapColumnVector, i: Int): Unit = {
    val raw = data.next()
    putter(v, i, if (dict != null) dict(raw.toInt) else raw)
  }
}

final class DateVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: RunLengthIntegerReader = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(c, StreamKind.Data)
      .map(new RunLengthIntegerReader(_, signed = true, src.useVInts)).orNull
  override protected def put(v: OnHeapColumnVector, i: Int): Unit =
    v.putInt(i, data.next().toInt)
}

final class FloatVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: InStream = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(c, StreamKind.Data).orNull
  override protected def put(v: OnHeapColumnVector, i: Int): Unit =
    v.putFloat(i, Serialization.readFloat(data))
}

final class DoubleVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: InStream = null
  override protected def startValues(src: StreamSource): Unit =
    data = src.stream(c, StreamKind.Data).orNull
  override protected def put(v: OnHeapColumnVector, i: Int): Unit =
    v.putDouble(i, Serialization.readDouble(data))
}

final class StringVectorDecoder(c: Int) extends VectorDecoder(c) {
  private var data: InStream = null
  private var lengths: RunLengthIntegerReader = null
  private var dict: Array[Array[Byte]] = null
  private var strideDicts: Array[Array[Array[Byte]]] = null
  private var strideLen = 0
  private var ids: RunLengthIntegerReader = null

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
      strideLen = src.rowIndexStride
      strideDicts = src.stream(c, StreamKind.StrideDictionaryLength)
        .map { lenStream =>
          val lens = new RunLengthIntegerReader(lenStream, signed = false, src.useVInts)
          val sblob = src.stream(c, StreamKind.StrideDictionary).getOrElse(emptyStream)
          val numStrides = lens.next().toInt
          Array.fill(numStrides) {
            val count = lens.next().toInt
            Array.fill(count)(readBlob(sblob, lens.next().toInt))
          }
        }.orNull
      ids = src.stream(c, StreamKind.Data)
        .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
      data = null; lengths = null
    } else {
      dict = null; strideDicts = null; ids = null
      data = src.stream(c, StreamKind.Data).orNull
      lengths = src.stream(c, StreamKind.Length)
        .map(new RunLengthIntegerReader(_, signed = false, src.useVInts)).orNull
    }
  }

  override protected def put(v: OnHeapColumnVector, i: Int): Unit = {
    if (dict != null) {
      val id = ids.next().toInt
      val b =
        if (id < dict.length) dict(id)
        else {
          val stride = if (strideLen > 0) (rowPos / strideLen).toInt else 0
          strideDicts(stride)(id - dict.length)
        }
      v.putByteArray(i, b, 0, b.length)
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
    val zeros = (enc & 7).toInt
    var ns = enc >>> 3
    if (zeros != 0) {
      var j = 0
      while (j < zeros + 2) { ns *= 10; j += 1 }
    }
    v.putLong(i, sec * 1000000L + ns / 1000L)
  }
}

/** PartitionReader producing ColumnarBatches over the partition's stripes. */
final class DwrfColumnarPartitionReader(
    reader: DwrfFileReader,
    stripes: Seq[StripeInformation],
    readSchema: StructType,
    batchSize: Int = 4096)
    extends org.apache.spark.sql.connector.read.PartitionReader[ColumnarBatch] {

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, readSchema)
  private val batch = new ColumnarBatch(vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector])

  private val idByName = {
    val ids = ColumnTree.topLevelIds(reader.schema)
    reader.schema.fields.map(_.name).zip(ids.zip(reader.schema.fields.map(_.dataType))).toMap
  }
  private val decoders: Array[VectorDecoder] = readSchema.fields.map { f =>
    val (id, dt) = idByName(f.name)
    VectorDecoder.create(id, dt)
  }
  private val wanted: Array[Boolean] = {
    val inc = new Array[Boolean](ColumnTree.columnCount(reader.schema))
    readSchema.fields.foreach { f =>
      val (id, dt) = idByName(f.name)
      ColumnTree.includeSubtree(inc, id, dt)
    }
    inc
  }

  private val stripeIt = stripes.iterator
  private var remainingInStripe = 0L

  override def next(): Boolean = {
    while (remainingInStripe == 0) {
      if (!stripeIt.hasNext) return false
      val si = stripeIt.next()
      val sf = reader.readStripeFooter(si)
      val src = reader.openStripe(si, sf, wanted)
      decoders.foreach(_.start(src))
      reader.counters.stripesRead += 1
      remainingInStripe = si.numRows
    }
    val n = math.min(batchSize.toLong, remainingInStripe).toInt
    var i = 0
    while (i < vectors.length) {
      vectors(i).reset()
      decoders(i).fill(vectors(i), n)
      i += 1
    }
    batch.setNumRows(n)
    remainingInStripe -= n
    true
  }

  override def get(): ColumnarBatch = batch

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    DwrfMetrics.taskValues(reader.counters)

  override def close(): Unit = {
    batch.close()
    reader.close()
  }
}
