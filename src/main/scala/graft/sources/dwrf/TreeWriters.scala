package graft.sources.dwrf

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.format._

/** Mutable per-stripe column statistics accumulator (reference
  * statistics/ColumnStatisticsImpl.java).
  */
final class StatsBuilder {
  var count = 0L
  var hasNull = false
  var longMin: Long = Long.MaxValue
  var longMax: Long = Long.MinValue
  var longSum = 0L
  var longOverflow = false
  var doubleMin: Double = Double.PositiveInfinity
  var doubleMax: Double = Double.NegativeInfinity
  var doubleSum = 0.0
  var stringMin: UTF8String = null
  var stringMax: UTF8String = null
  var totalLength = 0L
  var trueCount = 0L

  def noteNull(): Unit = hasNull = true
  def noteValue(): Unit = count += 1

  def noteLong(v: Long): Unit = {
    if (v < longMin) longMin = v
    if (v > longMax) longMax = v
    val s = longSum + v
    // overflow check (reference IntegerColumnStatistics keeps a flag)
    if (((longSum ^ s) & (v ^ s)) < 0) longOverflow = true
    longSum = s
  }

  def noteDouble(v: Double): Unit = {
    if (v < doubleMin) doubleMin = v
    if (v > doubleMax) doubleMax = v
    doubleSum += v
  }

  def noteString(v: UTF8String): Unit = {
    if (stringMin == null || v.compareTo(stringMin) < 0) stringMin = v.clone()
    if (stringMax == null || v.compareTo(stringMax) > 0) stringMax = v.clone()
    totalLength += v.numBytes()
  }

  def noteBinary(len: Int): Unit = totalLength += len
  def noteBool(v: Boolean): Unit = if (v) trueCount += 1

  def result(): ColumnStats = ColumnStats(
    count, hasNull, longMin, longMax, longSum, longOverflow,
    doubleMin, doubleMax, doubleSum,
    if (stringMin == null) null else stringMin.toString,
    if (stringMax == null) null else stringMax.toString,
    totalLength, trueCount)

  def reset(): Unit = {
    count = 0; hasNull = false
    longMin = Long.MaxValue; longMax = Long.MinValue; longSum = 0; longOverflow = false
    doubleMin = Double.PositiveInfinity; doubleMax = Double.NegativeInfinity; doubleSum = 0
    stringMin = null; stringMax = null; totalLength = 0; trueCount = 0
  }
}

/** One finished column stream: its directory entry + the on-disk bytes. */
final case class FinishedStream(info: StreamInfo, bytes: Array[Byte])

/** Per-column results of a stripe flush. */
final case class ColumnFlush(
    streams: Seq[FinishedStream],
    encoding: ColumnEncoding,
    stats: ColumnStats,
    indexEntries: Seq[RowIndexEntry])

object TreeWriter {
  /** Factory over Spark types (reference WriterImpl.java:2028-2087). */
  def create(columnId: Int, dt: DataType, opts: DwrfWriteOptions): TreeWriter =
    dt match {
      case BooleanType => new BooleanTreeWriter(columnId, opts)
      case ByteType => new ByteTreeWriter(columnId, opts)
      case ShortType | IntegerType | LongType => new LongTreeWriter(columnId, dt, opts)
      // beyond-reference: DWRF predates ORC's DECIMAL kind, but our
      // schema is Spark-native JSON, so a short decimal rides the long
      // kernels as its unscaled value — the reader reconstructs
      // precision/scale from the schema. (p > 18 stays unsupported:
      // unscaled no longer fits the integer streams.)
      case d: DecimalType if d.precision <= 18 =>
        new LongTreeWriter(columnId, d, opts)
      case FloatType => new FloatTreeWriter(columnId, opts)
      case DoubleType => new DoubleTreeWriter(columnId, opts)
      case StringType => new StringTreeWriter(columnId, opts)
      case BinaryType => new BinaryTreeWriter(columnId, opts)
      case TimestampType | TimestampNTZType => new TimestampTreeWriter(columnId, opts)
      case DateType => new DateTreeWriter(columnId, opts)
      case s: StructType => new StructTreeWriter(columnId, s, opts)
      case a: ArrayType => new ListTreeWriter(columnId, a, opts)
      case m: MapType => new MapTreeWriter(columnId, m, opts)
      case other =>
        throw new UnsupportedOperationException(s"dwrf: unsupported type $other")
    }
}

/** Write-side column kernel: buffers one stripe of one column as encoded
  * streams (reference WriterImpl TreeWriter tree). Nulls go to a PRESENT
  * bitfield that is suppressed at flush when the stripe has none
  * (WriterImpl.java:537-549).
  */
abstract class TreeWriter(val columnId: Int, opts: DwrfWriteOptions) {
  protected def newStream(kind: Int): OutStream =
    new OutStream(s"col$columnId/kind$kind", opts.blockSize,
      CompressionCodec.forKindDynamic(opts.kind, () => opts.zlibLevelNow))

  protected val presentOut = newStream(StreamKind.Present)
  protected val present = new BitFieldWriter(presentOut)
  protected var anyNullInStripe = false

  /** Current stride's stats (whole stripe when no row index). */
  val stats = new StatsBuilder
  /** Closed strides merged; null until the first stride closes. */
  private var stripeAccum: ColumnStats = null

  // ---- row index (populated every stride by recordStride()) ----
  protected val indexEntries = scala.collection.mutable.ArrayBuffer.empty[RowIndexEntry]
  protected val pendingPositions = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Long])]

  def children: Seq[TreeWriter] = Nil

  final def write(g: SpecializedGetters, ordinal: Int): Unit = {
    if (g.isNullAt(ordinal)) {
      present.write(false)
      anyNullInStripe = true
      stats.noteNull()
    } else {
      present.write(true)
      stats.noteValue()
      writeValue(g, ordinal)
    }
  }

  protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit

  /** Record stream positions + start a new stride stats scope. Called at
    * every row-index stride boundary, BEFORE the stride's rows are written.
    */
  def recordStride(): Unit = {
    closeStride()
    val perStream = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Long])]
    val rec = new PositionsBuilder
    present.getPosition(rec)
    perStream += StreamKind.Present -> rec.result()
    recordValuePositions(perStream)
    pendingPositions.clear()
    pendingPositions ++= perStream
    children.foreach(_.recordStride())
  }

  /** Pair the pending stride-start positions with the stats gathered since. */
  private def closeStride(): Unit = {
    if (pendingPositions.nonEmpty) {
      val s = stats.result()
      indexEntries += RowIndexEntry(pendingPositions.toMap, s)
      stripeAccum = if (stripeAccum == null) s else stripeAccum.merge(s)
      stats.reset()
      pendingPositions.clear()
    }
  }

  /** Positions of value streams (not PRESENT), in stream-kind order. */
  protected def recordValuePositions(
      out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit

  /** Flush this column's streams for the stripe; resets for the next one. */
  final def flushStripe(): Seq[(Int, ColumnFlush)] = {
    closeStride() // close the trailing stride (no-op when no row index)
    val myFlush = flushSelf()
    val result = scala.collection.mutable.ArrayBuffer(columnId -> myFlush)
    children.foreach(c => result ++= c.flushStripe())
    reset()
    result.toSeq
  }

  private def stripeStats: ColumnStats = {
    val open = stats.result()
    if (stripeAccum == null) open
    else if (open.count == 0 && !open.hasNull) stripeAccum
    else stripeAccum.merge(open)
  }

  protected def flushSelf(): ColumnFlush = {
    present.flush()
    val presentBytes = presentOut.finish()
    val streams = scala.collection.mutable.ArrayBuffer.empty[FinishedStream]
    val suppressPresent = !anyNullInStripe
    if (!suppressPresent && presentBytes.nonEmpty)
      streams += FinishedStream(
        StreamInfo(columnId, StreamKind.Present, presentBytes.length.toLong), presentBytes)
    streams ++= finishValueStreams()
    val entries0 =
      if (suppressPresent)
        indexEntries.toSeq.map(e => e.copy(positions = e.positions - StreamKind.Present))
      else indexEntries.toSeq
    ColumnFlush(streams.toSeq, encoding, stripeStats, patchEntries(entries0))
  }

  /** Deferred-encoding writers (dictionary) patch value-stream positions
    * into the index entries at flush, because those streams are only
    * written then (reference A5 savedRowIndex, WriterImpl.java:1028-1053).
    */
  protected def patchEntries(entries: Seq[RowIndexEntry]): Seq[RowIndexEntry] = entries

  protected def encoding: ColumnEncoding = ColumnEncoding(dictionary = false)

  /** Finish value streams, return those worth storing (non-empty). */
  protected def finishValueStreams(): Seq[FinishedStream]

  protected def finished(kind: Int, out: OutStream): Seq[FinishedStream] = {
    val b = out.finish()
    if (b.isEmpty) Nil
    else Seq(FinishedStream(StreamInfo(columnId, kind, b.length.toLong), b))
  }

  /** Estimated buffered bytes for the stripe-flush policy. */
  def memory: Long =
    presentOut.bufferedSize + valueMemory + children.map(_.memory).sum

  /** Bytes held by dictionary state specifically — the reference caps this
    * at 100 MB and force-flushes (A4, MemoryManager.java:226-241).
    */
  def dictionaryMemory: Long = children.map(_.dictionaryMemory).sum

  /** Governor pressure signal (reference WriterImpl.enterLowMemoryMode):
    * dictionary writers abandon their standing state and stay direct for
    * the rest of the file; everyone else just recurses.
    */
  def enterLowMemory(): Unit = children.foreach(_.enterLowMemory())

  protected def valueMemory: Long

  protected def reset(): Unit = {
    presentOut.clear()
    anyNullInStripe = false
    stats.reset()
    stripeAccum = null
    indexEntries.clear()
    pendingPositions.clear()
  }
}

final class BooleanTreeWriter(columnId: Int, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  private val dataOut = newStream(StreamKind.Data)
  private val data = new BitFieldWriter(dataOut)

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val v = g.getBoolean(ordinal)
    stats.noteBool(v)
    data.write(v)
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit = {
    val rec = new PositionsBuilder; data.getPosition(rec)
    out += StreamKind.Data -> rec.result()
  }

  override protected def finishValueStreams(): Seq[FinishedStream] = {
    data.flush()
    finished(StreamKind.Data, dataOut)
  }

  override protected def valueMemory: Long = dataOut.bufferedSize
  override protected def reset(): Unit = { super.reset(); dataOut.clear() }
}

final class ByteTreeWriter(columnId: Int, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  private val dataOut = newStream(StreamKind.Data)
  private val data = new RunLengthByteWriter(dataOut)

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val v = g.getByte(ordinal)
    stats.noteLong(v.toLong)
    data.write(v)
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit = {
    val rec = new PositionsBuilder; data.getPosition(rec)
    out += StreamKind.Data -> rec.result()
  }

  override protected def finishValueStreams(): Seq[FinishedStream] = {
    data.flush()
    finished(StreamKind.Data, dataOut)
  }

  override protected def valueMemory: Long = dataOut.bufferedSize
  override protected def reset(): Unit = { super.reset(); dataOut.clear() }
}

/** SHORT/INT/LONG — adaptive dictionary-vs-direct (reference A1,
  * WriterImpl.java:854-880): values buffer for the stripe; at flush,
  * dictionary encoding is used iff distinct/total ≤ 0.7 (DICTIONARY_DATA =
  * sorted distinct values, DATA = ids), else direct signed RLE. Row-index
  * positions are captured during the flush-time replay (A5).
  *
  * With `encoding.interval` > 1 the decision is recomputed only on every
  * interval-th stripe and carried over in between (reference
  * WriterImpl.java:790-792 determineEncodingStripe); a carried-over
  * DIRECT stripe streams values straight into the RLE writer with no
  * stripe buffer at all — the reference's useCarriedOverDirectEncoding
  * memory win (WriterImpl.java:860-865, write() direct branch).
  */
final class LongTreeWriter(columnId: Int, dt: DataType, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  private val dataOut = newStream(StreamKind.Data)
  private val dictOut = newStream(StreamKind.DictionaryData)
  private val values = new LongBuffer()
  private val strideMarkers = new IntBuffer()
  private var useDictionary = false
  private var dictSize = 0
  private var capturedPositions: Array[Seq[(Int, Array[Long])]] = Array.empty
  private val interval = math.max(1, opts.encodingInterval)
  private var stripesDone = 0
  private var lastUseDictionary = false
  // non-null exactly when this stripe is carried-over direct: values
  // stream through it as they arrive instead of buffering
  private var liveDirect: RunLengthIntegerWriter = null

  private def determining: Boolean = stripesDone % interval == 0

  private def extract(g: SpecializedGetters, ordinal: Int): Long = dt match {
    case ShortType => g.getShort(ordinal).toLong
    case IntegerType => g.getInt(ordinal).toLong
    case d: DecimalType =>
      g.getDecimal(ordinal, d.precision, d.scale).toUnscaledLong
    case _ => g.getLong(ordinal)
  }

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val v = extract(g, ordinal)
    stats.noteLong(v)
    if (liveDirect != null) liveDirect.write(v)
    else values.add(v)
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit =
    if (liveDirect != null) {
      val rec = new PositionsBuilder
      liveDirect.getPosition(rec)
      out += StreamKind.Data -> rec.result()
    } else strideMarkers.add(values.size)

  override protected def finishValueStreams(): Seq[FinishedStream] = {
    if (liveDirect != null) {
      liveDirect.flush()
      useDictionary = false
      stripesDone += 1
      return finished(StreamKind.Data, dataOut)
    }
    val n = values.size
    val captured = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, Array[Long])]]
    var distinct: Array[Long] = null
    if (opts.dictionaryEnabled && n > 0 &&
        (determining || lastUseDictionary)) {
      distinct = values.toSortedDistinct
      useDictionary = if (determining)
        distinct.length.toDouble / n <= opts.dictionaryKeyNumericThreshold
      else true // carried-over dictionary decision, density not re-tested
      dictSize = distinct.length
    }
    if (determining) lastUseDictionary = useDictionary
    stripesDone += 1
    var marker = 0
    def captureAt(i: Int, rle: RunLengthIntegerWriter): Unit = {
      while (marker < strideMarkers.size && strideMarkers(marker) == i) {
        val rec = new PositionsBuilder
        rle.getPosition(rec)
        captured += Seq(StreamKind.Data -> rec.result())
        marker += 1
      }
    }
    if (useDictionary) {
      val dictWriter = new RunLengthIntegerWriter(dictOut, signed = true, opts.useVInts)
      distinct.foreach(dictWriter.write)
      dictWriter.flush()
      // value→id via one open-address hash built from the (sorted) distinct
      // set: O(1) per row instead of a per-row binary search — ~30% of the
      // whole write path went to those cache-missing searches
      val lookup = new LongIdHash(distinct)
      val ids = new RunLengthIntegerWriter(dataOut, signed = false, opts.useVInts)
      var i = 0
      while (i < n) {
        captureAt(i, ids)
        ids.write(lookup(values(i)).toLong)
        i += 1
      }
      captureAt(n, ids)
      ids.flush()
      capturedPositions = captured.toArray
      finished(StreamKind.Data, dataOut) ++ finished(StreamKind.DictionaryData, dictOut)
    } else {
      val data = new RunLengthIntegerWriter(dataOut, signed = true, opts.useVInts)
      var i = 0
      while (i < n) {
        captureAt(i, data)
        data.write(values(i))
        i += 1
      }
      captureAt(n, data)
      data.flush()
      capturedPositions = captured.toArray
      finished(StreamKind.Data, dataOut)
    }
  }

  override protected def patchEntries(entries: Seq[RowIndexEntry]): Seq[RowIndexEntry] =
    entries.zipWithIndex.map { case (e, i) =>
      if (i < capturedPositions.length)
        e.copy(positions = e.positions ++ capturedPositions(i))
      else e
    }

  override protected def encoding: ColumnEncoding =
    if (useDictionary) ColumnEncoding(dictionary = true, dictionarySize = dictSize)
    else ColumnEncoding(dictionary = false)

  override protected def valueMemory: Long =
    if (liveDirect != null) dataOut.bufferedSize else values.memory
  override protected def reset(): Unit = {
    super.reset(); values.clear(); strideMarkers.clear()
    dataOut.clear(); dictOut.clear(); useDictionary = false; dictSize = 0
    capturedPositions = Array.empty
    // carried-over direct for the upcoming stripe → stream, don't buffer
    liveDirect =
      if (!determining && !lastUseDictionary)
        new RunLengthIntegerWriter(dataOut, signed = true, opts.useVInts)
      else null
  }
}

final class FloatTreeWriter(columnId: Int, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  private val dataOut = newStream(StreamKind.Data)

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val v = g.getFloat(ordinal)
    stats.noteDouble(v.toDouble)
    Serialization.writeFloat(dataOut, v)
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit = {
    val rec = new PositionsBuilder; dataOut.getPosition(rec)
    out += StreamKind.Data -> rec.result()
  }

  override protected def finishValueStreams(): Seq[FinishedStream] =
    finished(StreamKind.Data, dataOut)

  override protected def valueMemory: Long = dataOut.bufferedSize
  override protected def reset(): Unit = { super.reset(); dataOut.clear() }
}

final class DoubleTreeWriter(columnId: Int, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  private val dataOut = newStream(StreamKind.Data)

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val v = g.getDouble(ordinal)
    stats.noteDouble(v)
    Serialization.writeDouble(dataOut, v)
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit = {
    val rec = new PositionsBuilder; dataOut.getPosition(rec)
    out += StreamKind.Data -> rec.result()
  }

  override protected def finishValueStreams(): Seq[FinishedStream] =
    finished(StreamKind.Data, dataOut)

  override protected def valueMemory: Long = dataOut.bufferedSize
  override protected def reset(): Unit = { super.reset(); dataOut.clear() }
}

/** STRING — adaptive dictionary-vs-direct (reference A2, WriterImpl.java:
  * 1297-1403): every stripe value enters an insertion-ordered dictionary;
  * at flush, dictionary encoding is used iff distinct/total ≤ threshold
  * (default 0.8). Dictionary mode emits the sorted key blob
  * (DICTIONARY_DATA) + key LENGTHs + remapped ids (DATA); direct mode
  * replays the raw bytes (DATA) + per-row LENGTHs. Index positions are
  * captured during the flush-time replay (A5).
  *
  * Stride dictionary (reference E8, WriterImpl.java:884-907,1418-1472):
  * keys occurring exactly once in the stripe are exiled from the global
  * dictionary into per-stride side dictionaries (STRIDE_DICTIONARY +
  * STRIDE_DICTIONARY_LENGTH streams), shrinking the global blob. Instead
  * of the reference's IN_DICTIONARY bit stream, membership is encoded in
  * id space: id < globalSize → global key, else (id - globalSize) indexes
  * the stride-major concatenation of the side dictionaries — same
  * information, one stream fewer, and (unlike a per-stride id space) no
  * row-position bookkeeping on the read side, so it applies to EVERY
  * string column including ones nested in struct/array/map (reference
  * parity: the reference stride-dictionaries all string columns).
  *
  * Encoding choice follows the reference's two-stage policy: the plain
  * distinct/total threshold plus the character-entropy sample test
  * (WriterImpl.java:1297-1363) for medium-repetition columns — see
  * finishValueStreams.
  */
final class StringTreeWriter(columnId: Int, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  private val dataOut = newStream(StreamKind.Data)
  private val lengthOut = newStream(StreamKind.Length)
  private val dictOut = newStream(StreamKind.DictionaryData)
  private val strideDictOut = newStream(StreamKind.StrideDictionary)
  private val strideDictLenOut = newStream(StreamKind.StrideDictionaryLength)

  private val dict = new java.util.HashMap[UTF8String, Integer]()
  private val keys = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
  private var keyBytesTotal = 0L
  private val rows = new IntBuffer()
  private val counts = new IntBuffer()
  private val firstStride = new IntBuffer()
  private val strideMarkers = new IntBuffer()
  private var useDictionary = false
  private var globalDictSize = 0
  private var capturedPositions: Array[Seq[(Int, Array[Long])]] = Array.empty
  // A3 abandonment state: once converted, values accumulate as raw bytes
  private var abandoned = false
  private val directBytes = new ByteBuf()
  private var directLens = new IntBuffer()
  // A1 carried-over encoding interval (reference WriterImpl.java:790-792,
  // OrcConf.java:53): recompute the dict-vs-direct decision only on every
  // interval-th stripe; carried-over DIRECT stripes skip dictionary
  // population entirely by starting in the abandoned-accumulation mode
  // (the reference's useCarriedOverDirectEncoding).
  private val interval = math.max(1, opts.encodingInterval)
  private var stripesDone = 0
  private var lastUseDictionary = false
  private def determining: Boolean = stripesDone % interval == 0

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val v = g.getUTF8String(ordinal)
    stats.noteString(v)
    if (abandoned) {
      val b = v.getBytes
      directBytes.add(b, 0, b.length)
      directLens.add(b.length)
      return
    }
    var id = dict.get(v)
    if (id == null) {
      id = Integer.valueOf(keys.size)
      val copy = v.clone()
      dict.put(copy, id)
      keys += copy.getBytes
      keyBytesTotal += copy.numBytes()
      counts.add(1)
      firstStride.add(math.max(strideMarkers.size - 1, 0))
      maybeAbandon()
    } else counts.inc(id.intValue())
    if (!abandoned) rows.add(id.intValue())
    // else: maybeAbandon() already replayed this value into the direct
    // buffers (it was in `keys` but not yet in `rows` at conversion time)
  }

  /** A3 mid-stripe dictionary abandonment (reference WriterImpl.java:
    * 1055-1074 under MemoryManager.java:148-178 pressure): once the
    * dictionary is provably useless — distinct density already above the
    * encoding threshold with at least a stride of evidence — and its
    * bookkeeping crosses `dictionary.abandon.bytes`, convert to direct
    * accumulation: replay the buffered ids as raw bytes, drop the hash
    * map. A unique-heavy column stops paying ~64 B/key map overhead for
    * the rest of the stripe (the flush replay below then takes its
    * direct branch from the flat buffer). Irreversible within the
    * stripe, like the reference: data that later turns repetitive still
    * writes direct — only bytes, never correctness, at stake.
    */
  private def maybeAbandon(): Unit = {
    if (!opts.dictionaryEnabled) return
    if (dictionaryMemory <= opts.dictionaryAbandonBytes) return
    val evidence = math.max(if (opts.rowIndexStride > 0) opts.rowIndexStride else 10000, 1000)
    if (rows.size < evidence) return
    if (keys.size.toDouble / rows.size <= opts.dictionaryKeyStringThreshold) return
    var i = 0
    while (i < rows.size) {
      val b = keys(rows(i))
      directBytes.add(b, 0, b.length)
      directLens.add(b.length)
      i += 1
    }
    // note: the value just recorded in `keys` is replayed via its row id
    // only when writeValue appends it — it hasn't been added to `rows`
    // yet, so append it here before dropping the dictionary
    val lastKey = keys(keys.size - 1)
    directBytes.add(lastKey, 0, lastKey.length)
    directLens.add(lastKey.length)
    dict.clear(); keys.clear(); keyBytesTotal = 0
    rows.clear(); counts.clear(); firstStride.clear()
    abandoned = true
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit =
    strideMarkers.add(if (abandoned) directLens.size else rows.size)

  /** Character-diversity sample over the dictionary keys (reference
    * entropy heuristic, WriterImpl.java:1297-1363): true when the sampled
    * keys together contain more than `entropyStringThreshold` distinct
    * characters. The reference samples randomly; we sample evenly spaced
    * for reproducible files (documented divergence) with the same sample
    * size policy (max(minSamples, fraction × dictSize)) and early exit.
    */
  private def entropyExceedsThreshold(): Boolean = {
    val size = keys.size
    if (size == 0) return false
    val numSamples = math.min(size,
      math.max(opts.entropyMinSamples,
        (opts.entropyDictSampleFraction * size).toInt))
    val step = math.max(1, size / numSamples)
    val chars = new java.util.HashSet[Integer]()
    var i = 0
    while (i < size) {
      val s = UTF8String.fromBytes(keys(i)).toString
      var j = 0
      while (j < s.length) {
        chars.add(Integer.valueOf(s.charAt(j).toInt))
        if (chars.size > opts.entropyStringThreshold) return true
        j += 1
      }
      i += step
    }
    false
  }

  override protected def finishValueStreams(): Seq[FinishedStream] = {
    val det = determining
    stripesDone += 1
    if (abandoned) {
      if (det) lastUseDictionary = false
      return finishAbandoned()
    }
    val n = rows.size
    val distinct = keys.size
    // Dictionary iff (1) the distinct/total density clears the plain
    // threshold AND (2) repetition is high enough that dictionary always
    // wins (> entropyKeySizeThreshold), OR the keys are character-diverse
    // enough that the block codec alone won't compress direct data
    // (reference A2: low-entropy medium-repeat columns — e.g. UUIDs with
    // some dupes — go DIRECT and let zlib do the work). On non-determining
    // stripes the previous decision carries over untested (A1 interval).
    val repeatedFraction = if (n > 0) (n - distinct).toDouble / n else 0.0
    useDictionary =
      if (det)
        opts.dictionaryEnabled && n > 0 &&
          distinct.toDouble / n <= opts.dictionaryKeyStringThreshold &&
          (repeatedFraction > opts.entropyKeySizeThreshold || entropyExceedsThreshold())
      else lastUseDictionary && n > 0
    if (det) lastUseDictionary = useDictionary
    val captured = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, Array[Long])]]
    var marker = 0
    if (useDictionary) {
      val numStrides = strideMarkers.size
      val strideDictOn = opts.strideDictionaryEnabled && numStrides > 0
      val isSingle = new Array[Boolean](distinct)
      var nSingles = 0
      if (strideDictOn) {
        var id = 0
        while (id < distinct) {
          if (counts(id) == 1) { isSingle(id) = true; nSingles += 1 }
          id += 1
        }
      }
      // global dictionary = multi-occurrence keys, byte-sorted (or kept
      // in insertion order when dictionary.sort.keys=false — reference
      // sortKeys flag, DictionaryEncoder sortKeys ctor arg)
      val nonSingles = (0 until distinct).filter(!isSingle(_))
      val order =
        if (opts.sortDictionaryKeys)
          nonSingles.sortWith { (a, b) =>
            java.util.Arrays.compareUnsigned(keys(a), keys(b)) < 0
          }
        else nonSingles
      globalDictSize = order.size
      val oldToNew = Array.fill(distinct)(-1)
      order.zipWithIndex.foreach { case (oldId, newId) => oldToNew(oldId) = newId }
      val keyLengths = new RunLengthIntegerWriter(lengthOut, signed = false, opts.useVInts)
      order.foreach { oldId =>
        val b = keys(oldId)
        dictOut.write(b, 0, b.length)
        keyLengths.write(b.length.toLong)
      }
      keyLengths.flush()
      // flat (stride-major) ordinals for singleton keys: id - globalSize
      // indexes the concatenation of the per-stride side dictionaries, so
      // the reader resolves ids without knowing which stride a value sits
      // in (required for nested strings, where value position != row
      // position once parents have nulls or variable-length collections)
      val localIdx = new Array[Int](distinct)
      if (nSingles > 0) {
        val strideKeys = Array.fill(numStrides)(
          scala.collection.mutable.ArrayBuffer.empty[Array[Byte]])
        var id = 0
        while (id < distinct) {
          if (isSingle(id)) {
            val st = firstStride(id)
            localIdx(id) = strideKeys(st).size
            strideKeys(st) += keys(id)
          }
          id += 1
        }
        val strideOffsets = new Array[Int](numStrides)
        var off = 0
        var st = 0
        while (st < numStrides) {
          strideOffsets(st) = off
          off += strideKeys(st).size
          st += 1
        }
        var id2 = 0
        while (id2 < distinct) {
          if (isSingle(id2)) localIdx(id2) += strideOffsets(firstStride(id2))
          id2 += 1
        }
        val sdLens = new RunLengthIntegerWriter(strideDictLenOut, signed = false, opts.useVInts)
        sdLens.write(numStrides.toLong)
        strideKeys.foreach { sk =>
          sdLens.write(sk.size.toLong)
          sk.foreach { b =>
            strideDictOut.write(b, 0, b.length)
            sdLens.write(b.length.toLong)
          }
        }
        sdLens.flush()
      }
      val ids = new RunLengthIntegerWriter(dataOut, signed = false, opts.useVInts)
      var i = 0
      while (i <= n) {
        while (marker < strideMarkers.size && strideMarkers(marker) == i) {
          val rec = new PositionsBuilder
          ids.getPosition(rec)
          captured += Seq(StreamKind.Data -> rec.result())
          marker += 1
        }
        if (i < n) {
          val id = rows(i)
          val enc =
            if (isSingle(id)) globalDictSize + localIdx(id)
            else oldToNew(id)
          ids.write(enc.toLong)
        }
        i += 1
      }
      ids.flush()
      capturedPositions = captured.toArray
      finished(StreamKind.Data, dataOut) ++
        finished(StreamKind.Length, lengthOut) ++
        finished(StreamKind.DictionaryData, dictOut) ++
        (if (nSingles > 0)
          finished(StreamKind.StrideDictionary, strideDictOut) ++
            finished(StreamKind.StrideDictionaryLength, strideDictLenOut)
        else Nil)
    } else {
      flushDirect(n, i => { val b = keys(rows(i)); (b, 0, b.length) })
    }
  }

  /** The direct replay loop, shared by the flush-time DIRECT decision and
    * the A3 post-abandonment flush: walk stride markers (capturing Data +
    * Length positions), write each row's bytes, emit both streams.
    * `sliceAt` is called exactly once per row, in order.
    */
  private def flushDirect(
      n: Int, sliceAt: Int => (Array[Byte], Int, Int)): Seq[FinishedStream] = {
    val captured = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, Array[Long])]]
    var marker = 0
    val lengths = new RunLengthIntegerWriter(lengthOut, signed = false, opts.useVInts)
    var i = 0
    while (i <= n) {
      while (marker < strideMarkers.size && strideMarkers(marker) == i) {
        val recD = new PositionsBuilder
        dataOut.getPosition(recD)
        val recL = new PositionsBuilder
        lengths.getPosition(recL)
        captured += Seq(
          StreamKind.Data -> recD.result(),
          StreamKind.Length -> recL.result())
        marker += 1
      }
      if (i < n) {
        val (arr, off, len) = sliceAt(i)
        dataOut.write(arr, off, len)
        lengths.write(len.toLong)
      }
      i += 1
    }
    lengths.flush()
    capturedPositions = captured.toArray
    finished(StreamKind.Data, dataOut) ++ finished(StreamKind.Length, lengthOut)
  }

  /** A3 post-abandonment flush: the same direct replay, reading the flat
    * (bytes, length) buffers with a running offset. */
  private def finishAbandoned(): Seq[FinishedStream] = {
    useDictionary = false
    var off = 0
    flushDirect(directLens.size, { i =>
      val len = directLens(i)
      val slice = (directBytes.array, off, len)
      off += len
      slice
    })
  }

  override protected def patchEntries(entries: Seq[RowIndexEntry]): Seq[RowIndexEntry] =
    entries.zipWithIndex.map { case (e, i) =>
      if (i < capturedPositions.length)
        e.copy(positions = e.positions ++ capturedPositions(i))
      else e
    }

  override protected def encoding: ColumnEncoding =
    if (useDictionary) ColumnEncoding(dictionary = true, dictionarySize = globalDictSize)
    else ColumnEncoding(dictionary = false)

  override protected def valueMemory: Long =
    keyBytesTotal + rows.memory + 64L * keys.size +
      directBytes.memory + directLens.memory

  override def dictionaryMemory: Long = keyBytesTotal + 64L * keys.size

  override protected def reset(): Unit = {
    super.reset()
    dataOut.clear(); lengthOut.clear(); dictOut.clear()
    strideDictOut.clear(); strideDictLenOut.clear()
    dict.clear(); keys.clear(); keyBytesTotal = 0
    rows.clear(); counts.clear(); firstStride.clear(); strideMarkers.clear()
    useDictionary = false
    globalDictSize = 0
    capturedPositions = Array.empty
    // under governor pressure, stay direct for every later stripe too —
    // the reference's enterLowMemoryMode is sticky for the writer's life;
    // likewise a carried-over DIRECT decision (A1 interval) starts the
    // next stripe in direct accumulation — no dictionary population
    abandoned = lowMem || (!determining && !lastUseDictionary)
    // release, don't just reset: an abandoned stripe's buffers are
    // stripe-sized and must not be retained (or keep counting toward the
    // next stripe's memory budget) after flush
    directBytes.clear()
    directLens = new IntBuffer()
  }

  private var lowMem = false

  /** Governor pressure (reference WriterImpl.enterLowMemoryMode →
    * TreeWriter abandonDictionaries): unconditionally convert the
    * in-flight dictionary to direct accumulation — the same replay as
    * [[maybeAbandon]] minus its usefulness gates — and stay direct for
    * the rest of the file.
    */
  override def enterLowMemory(): Unit = {
    super.enterLowMemory()
    if (lowMem) return
    lowMem = true
    if (abandoned) return
    // called between rows (from the file writer's batched memory check),
    // so `rows` is consistent with `keys` — no last-key special case
    var i = 0
    while (i < rows.size) {
      val b = keys(rows(i))
      directBytes.add(b, 0, b.length)
      directLens.add(b.length)
      i += 1
    }
    dict.clear(); keys.clear(); keyBytesTotal = 0
    rows.clear(); counts.clear(); firstStride.clear()
    abandoned = true
  }
}

final class BinaryTreeWriter(columnId: Int, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  private val dataOut = newStream(StreamKind.Data)
  private val lengthOut = newStream(StreamKind.Length)
  private val lengths = new RunLengthIntegerWriter(lengthOut, signed = false, opts.useVInts)

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val b = g.getBinary(ordinal)
    stats.noteBinary(b.length)
    dataOut.write(b, 0, b.length)
    lengths.write(b.length.toLong)
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit = {
    val rec = new PositionsBuilder; dataOut.getPosition(rec)
    out += StreamKind.Data -> rec.result()
    val rec2 = new PositionsBuilder; lengths.getPosition(rec2)
    out += StreamKind.Length -> rec2.result()
  }

  override protected def finishValueStreams(): Seq[FinishedStream] = {
    lengths.flush()
    finished(StreamKind.Data, dataOut) ++ finished(StreamKind.Length, lengthOut)
  }

  override protected def valueMemory: Long = dataOut.bufferedSize + lengthOut.bufferedSize
  override protected def reset(): Unit = { super.reset(); dataOut.clear(); lengthOut.clear() }
}

object TimestampTreeWriter {
  /** Seconds from 2015-01-01T00:00:00Z (reference WriterImpl.java:1736-1738). */
  val BaseSeconds: Long = 1420070400L
}

/** TIMESTAMP — micros split into (seconds rel 2015, nanos with trailing-zero
  * compression) per reference E9. Spark keeps micros; we store nanos=micros*1000
  * so the wire shape matches while the ns→µs truncation stays lossless here.
  */
final class TimestampTreeWriter(columnId: Int, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  import TimestampTreeWriter._
  private val secondsOut = newStream(StreamKind.Data)
  private val seconds = new RunLengthIntegerWriter(secondsOut, signed = true, opts.useVInts)
  private val nanosOut = newStream(StreamKind.NanoData)
  private val nanos = new RunLengthIntegerWriter(nanosOut, signed = false, opts.useVInts)

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val micros = g.getLong(ordinal)
    stats.noteLong(micros)
    val sec = Math.floorDiv(micros, 1000000L)
    val ns = Math.floorMod(micros, 1000000L) * 1000L
    seconds.write(sec - BaseSeconds)
    nanos.write(encodeNanos(ns))
  }

  /** Trailing-zero compression: low 3 bits = (zeros-2) when zeros in [3,9],
    * else 0 and the value is stored verbatim (reference
    * LazyTimestampTreeReader.parseNanos inverse).
    */
  private def encodeNanos(ns: Long): Long = {
    if (ns == 0) return 0
    var zeros = 0
    var v = ns
    while (v % 10 == 0 && zeros < 9) { v /= 10; zeros += 1 }
    if (zeros >= 3) (v << 3) | (zeros - 2).toLong
    else ns << 3
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit = {
    val rec = new PositionsBuilder; seconds.getPosition(rec)
    out += StreamKind.Data -> rec.result()
    val rec2 = new PositionsBuilder; nanos.getPosition(rec2)
    out += StreamKind.NanoData -> rec2.result()
  }

  override protected def finishValueStreams(): Seq[FinishedStream] = {
    seconds.flush(); nanos.flush()
    finished(StreamKind.Data, secondsOut) ++ finished(StreamKind.NanoData, nanosOut)
  }

  override protected def valueMemory: Long = secondsOut.bufferedSize + nanosOut.bufferedSize
  override protected def reset(): Unit = { super.reset(); secondsOut.clear(); nanosOut.clear() }
}

/** DATE — days since epoch, signed RLE (extension: the reference has no
  * DATE type; Spark pipelines need it).
  */
final class DateTreeWriter(columnId: Int, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  private val dataOut = newStream(StreamKind.Data)
  private val data = new RunLengthIntegerWriter(dataOut, signed = true, opts.useVInts)

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val v = g.getInt(ordinal)
    stats.noteLong(v.toLong)
    data.write(v.toLong)
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit = {
    val rec = new PositionsBuilder; data.getPosition(rec)
    out += StreamKind.Data -> rec.result()
  }

  override protected def finishValueStreams(): Seq[FinishedStream] = {
    data.flush()
    finished(StreamKind.Data, dataOut)
  }

  override protected def valueMemory: Long = dataOut.bufferedSize
  override protected def reset(): Unit = { super.reset(); dataOut.clear() }
}

final class StructTreeWriter(columnId: Int, st: StructType, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  override val children: Seq[TreeWriter] = {
    var id = columnId + 1
    st.fields.toSeq.map { f =>
      val w = TreeWriter.create(id, f.dataType, opts)
      id += ColumnTree.subtreeSize(f.dataType)
      w
    }
  }

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val row = g.getStruct(ordinal, st.fields.length)
    var i = 0
    while (i < children.length) {
      children(i).write(row, i)
      i += 1
    }
  }

  /** Root-row entry: fields of the row are this struct's children. */
  def writeRoot(row: InternalRow): Unit = {
    present.write(true)
    stats.noteValue()
    var i = 0
    while (i < children.length) {
      children(i).write(row, i)
      i += 1
    }
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit = ()
  override protected def finishValueStreams(): Seq[FinishedStream] = Nil
  override protected def valueMemory: Long = 0L
}

final class ListTreeWriter(columnId: Int, at: ArrayType, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  private val lengthOut = newStream(StreamKind.Length)
  private val lengths = new RunLengthIntegerWriter(lengthOut, signed = false, opts.useVInts)
  private val elementWriter = TreeWriter.create(columnId + 1, at.elementType, opts)
  override val children: Seq[TreeWriter] = Seq(elementWriter)

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val arr = g.getArray(ordinal)
    lengths.write(arr.numElements().toLong)
    var i = 0
    while (i < arr.numElements()) {
      elementWriter.write(arr, i)
      i += 1
    }
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit = {
    val rec = new PositionsBuilder; lengths.getPosition(rec)
    out += StreamKind.Length -> rec.result()
  }

  override protected def finishValueStreams(): Seq[FinishedStream] = {
    lengths.flush()
    finished(StreamKind.Length, lengthOut)
  }

  override protected def valueMemory: Long = lengthOut.bufferedSize
  override protected def reset(): Unit = { super.reset(); lengthOut.clear() }
}

final class MapTreeWriter(columnId: Int, mt: MapType, opts: DwrfWriteOptions)
    extends TreeWriter(columnId, opts) {
  private val lengthOut = newStream(StreamKind.Length)
  private val lengths = new RunLengthIntegerWriter(lengthOut, signed = false, opts.useVInts)
  private val keyWriter = TreeWriter.create(columnId + 1, mt.keyType, opts)
  private val valueWriter = TreeWriter.create(
    columnId + 1 + ColumnTree.subtreeSize(mt.keyType), mt.valueType, opts)
  override val children: Seq[TreeWriter] = Seq(keyWriter, valueWriter)

  override protected def writeValue(g: SpecializedGetters, ordinal: Int): Unit = {
    val m = g.getMap(ordinal)
    lengths.write(m.numElements().toLong)
    val keys = m.keyArray()
    val values = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      keyWriter.write(keys, i)
      valueWriter.write(values, i)
      i += 1
    }
  }

  override protected def recordValuePositions(out: scala.collection.mutable.ArrayBuffer[(Int, Array[Long])]): Unit = {
    val rec = new PositionsBuilder; lengths.getPosition(rec)
    out += StreamKind.Length -> rec.result()
  }

  override protected def finishValueStreams(): Seq[FinishedStream] = {
    lengths.flush()
    finished(StreamKind.Length, lengthOut)
  }

  override protected def valueMemory: Long = lengthOut.bufferedSize
  override protected def reset(): Unit = { super.reset(); lengthOut.clear() }
}
