package graft.format

import java.io.{EOFException, InputStream, OutputStream}

/** Row-index position plumbing (reference PositionRecorder/Provider).
  * Compressed streams record (chunkStart, uncompressedOffset) pairs;
  * uncompressed streams record a single byte offset.
  */
trait PositionRecorder { def addPosition(pos: Long): Unit }

trait PositionProvider { def next(): Long }

final class PositionsBuilder extends PositionRecorder {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
  override def addPosition(pos: Long): Unit = buf += pos
  def result(): Array[Long] = buf.toArray
}

final class ArrayPositionProvider(positions: Array[Long], private var i: Int = 0)
    extends PositionProvider {
  override def next(): Long = { val v = positions(i); i += 1; v }
  def remaining: Int = positions.length - i
}

/** Buffering, optionally block-compressing output stream — the write-side
  * substrate of every column stream (reference OutStream.java:117-269).
  *
  * Bytes accumulate into `blockSize` chunks; each full chunk is compressed
  * and framed with a 3-byte little-endian header `(len << 1) | original`,
  * where `original=1` means the chunk is stored uncompressed because
  * compression did not shrink it. With no codec there is no framing at all.
  */
/** Thread-local write-side profiler (reference M5's write half: the
  * COMPRESSION_TIME counter `ReaderWriterProfiler` wraps around every
  * codec call — here accumulated per writer thread and drained by
  * [[graft.sources.dwrf.DwrfFileWriter]] into V2 CustomMetrics).
  * Timing granularity is one `compressInto` call (a ≥4 KB block), so
  * the nanoTime pair is amortized — never per value.
  */
object WriteProfile {
  final class Counters {
    var compressNanos = 0L
    var compressCalls = 0L
    var compressBytesIn = 0L
    var compressBytesOut = 0L
  }
  private val tl = ThreadLocal.withInitial[Counters](() => new Counters)
  def get: Counters = tl.get()
}

/** Read-side twin (reference M5's DECOMPRESSION_TIME): nanos spent in
  * codec decompression per reader thread, drained into scan counters by
  * the dwrf scan. One nanoTime pair per compressed block — amortized.
  */
object ReadProfile {
  final class Counters {
    var decompressNanos = 0L
    var decompressCalls = 0L
  }
  private val tl = ThreadLocal.withInitial[Counters](() => new Counters)
  def get: Counters = tl.get()
}

final class OutStream(
    val name: String,
    blockSize: Int,
    codec: Option[CompressionCodec]) extends OutputStream {

  // reserve() on the compressed path empties the pending block and then
  // assumes the request fits in a fresh one; 10 bytes covers the widest
  // single encoder reservation (a max-length vulong). Checked once here so
  // a misconfigured tiny block fails at construction, not mid-encode.
  require(codec.isEmpty || blockSize >= 10,
    s"compressed OutStream needs blockSize >= 10, got $blockSize")

  private var current = new Array[Byte](if (codec.isDefined) blockSize else math.min(blockSize, 16 * 1024))
  private var currentLen = 0
  private val compressed = new java.io.ByteArrayOutputStream()
  private var _suppressed = false
  // per-stream scratch for compressInto: sized lazily on first spill so
  // suppressed/tiny streams never pay for it
  private var scratch: Array[Byte] = null

  override def write(b: Int): Unit = {
    if (currentLen == current.length) spillOrGrow()
    current(currentLen) = b.toByte
    currentLen += 1
  }

  override def write(buf: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    var remaining = len
    while (remaining > 0) {
      if (currentLen == current.length) spillOrGrow()
      val n = math.min(remaining, current.length - currentLen)
      System.arraycopy(buf, o, current, currentLen, n)
      currentLen += n
      o += n
      remaining -= n
    }
  }

  private def spillOrGrow(): Unit = codec match {
    case Some(_) => spillBlock()
    case None =>
      // uncompressed: grow the single buffer (chunking buys nothing)
      current = java.util.Arrays.copyOf(current, current.length * 2)
  }

  // ---- direct-buffer fast path (Serialization's OutStream overloads) ----
  // Encoders write value bytes straight into the pending block instead of
  // per-byte write(Int) calls. reserve() may spill the pending block early
  // (a chunk slightly under blockSize is perfectly legal framing, and
  // recorded positions stay valid: they always point within the block
  // that eventually ships them).

  /** Ensure room for `n` more bytes; returns the write offset. */
  def reserve(n: Int): Int = {
    if (current.length - currentLen < n) codec match {
      case Some(_) => spillBlock() // empties the block; blockSize >= n
      case None =>
        while (current.length - currentLen < n)
          current = java.util.Arrays.copyOf(current, current.length * 2)
    }
    currentLen
  }

  /** The pending block; valid between reserve() and advance(). */
  def buffer: Array[Byte] = current

  def advance(n: Int): Unit = currentLen += n

  private def spillBlock(): Unit = {
    if (currentLen == 0) return
    val c = codec.get
    if (scratch == null) scratch = new Array[Byte](c.maxCompressedLength(blockSize))
    val t0 = System.nanoTime()
    val n = c.compressInto(current, 0, currentLen, scratch, 0)
    val prof = WriteProfile.get
    prof.compressNanos += System.nanoTime() - t0
    prof.compressCalls += 1
    prof.compressBytesIn += currentLen
    if (n >= 0) {
      prof.compressBytesOut += n
      writeHeader(n, original = false)
      compressed.write(scratch, 0, n)
    } else {
      prof.compressBytesOut += currentLen
      writeHeader(currentLen, original = true)
      compressed.write(current, 0, currentLen)
    }
    currentLen = 0
  }

  private def writeHeader(len: Int, original: Boolean): Unit = {
    val v = (len << 1) | (if (original) 1 else 0)
    compressed.write(v & 0xff)
    compressed.write((v >> 8) & 0xff)
    compressed.write((v >> 16) & 0xff)
  }

  /** Record the current logical position for the row index. */
  def getPosition(recorder: PositionRecorder): Unit = codec match {
    case Some(_) =>
      recorder.addPosition(compressed.size().toLong)
      recorder.addPosition(currentLen.toLong)
    case None =>
      recorder.addPosition(currentLen.toLong)
  }

  /** Bytes this stream would occupy on disk right now (pre-final-flush
    * estimate used by the stripe-size flush policy).
    */
  def bufferedSize: Long = compressed.size().toLong + currentLen

  def suppress(): Unit = { _suppressed = true }
  def suppressed: Boolean = _suppressed

  /** Finalize the stream and return its on-disk bytes. */
  def finish(): Array[Byte] = {
    codec match {
      case Some(_) => spillBlock(); compressed.toByteArray
      case None => java.util.Arrays.copyOf(current, currentLen)
    }
  }

  /** Reset for the next stripe. */
  def clear(): Unit = {
    currentLen = 0
    compressed.reset()
    _suppressed = false
  }
}

/** Read-only, possibly SPARSE byte address space of one stream: sorted,
  * non-overlapping segments referencing shared pread buffers (zero-copy).
  * Stride-granular I/O pruning reads only surviving byte ranges; memory
  * scales with bytes READ, not stream length. Addressing an unfilled gap
  * throws EOF (fail-loud): by construction decoders only touch bytes
  * inside surviving ranges.
  *
  * Segment = (posInStream, backingArray, backingOffset, len).
  */
class ByteRanges(val length: Int, segments0: Seq[(Int, Array[Byte], Int, Int)]) {
  private val segs = segments0.sortBy(_._1).toArray
  private val starts = segs.map(_._1)

  private def segIdx(pos: Int): Int = {
    var i = java.util.Arrays.binarySearch(starts, pos)
    if (i < 0) i = -i - 2
    i
  }

  /** The segment containing `pos`: (startPos, array, arrayOffset, len).
    * EOF on gaps — callers cache it for sequential fast-path access;
    * byteAt/view/read all delegate here so the gap invariant lives once. */
  def segmentAt(pos: Int): (Int, Array[Byte], Int, Int) = {
    val i = segIdx(pos)
    if (i < 0) throw new EOFException(s"pos $pos in unread gap")
    val seg = segs(i)
    if (pos >= seg._1 + seg._4) throw new EOFException(s"pos $pos in unread gap")
    seg
  }

  def byteAt(pos: Int): Int = {
    if (pos < 0 || pos >= length) throw new EOFException(s"pos $pos outside [0,$length)")
    val (s, arr, off, _) = segmentAt(pos)
    arr(off + (pos - s)) & 0xff
  }

  /** Contiguous (array, offset) view of [pos, pos+n) in one segment. */
  def view(pos: Int, n: Int): (Array[Byte], Int) = {
    val (s, arr, off, len) = segmentAt(pos)
    if (pos + n > s + len)
      throw new EOFException(s"[$pos,${pos + n}) exceeds the filled range")
    (arr, off + (pos - s))
  }

  /** Copy up to `len` bytes at `pos` into `buf` (bounded by the current
    * segment); -1 at stream end. */
  def read(pos: Int, buf: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= length) return -1
    val (s, arr, aoff, slen) = segmentAt(pos)
    val n = math.min(len, s + slen - pos)
    System.arraycopy(arr, aoff + (pos - s), buf, off, n)
    n
  }
}

object ByteRanges {
  def whole(bytes: Array[Byte]): ByteRanges =
    new ByteRanges(bytes.length, Seq((0, bytes, 0, bytes.length)))
}

/** Paced (windowed) stream bytes: the reference R2 detail the eager
  * reader dropped — `OrcConf readStrides=5` fetches compressed chunks in
  * bounded windows as the reader advances instead of materializing the
  * whole stream span, so reader memory is O(window), not O(stripe). We
  * pace by BYTES rather than strides (documented divergence: byte
  * windows compose with our range machinery and need no row index).
  *
  * The stream's [0, length) range maps to file bytes
  * [absStart, absStart + length); window i is fetched on first touch and
  * windows ≥ 2 behind the touched one are dropped — decode is
  * forward-only (stride seeks only ever jump forward), and a
  * stored-original chunk aliasing a dropped window keeps its array alive
  * through the ordinary GC reference, so dropping is always safe.
  * `onFetch(windowBytes, residentBytes)` lets the reader surface pacing
  * telemetry (peak resident proves the memory bound).
  */
final class WindowedByteRanges(length: Int, absStart: Long, pace: Int,
    fetch: (Long, Array[Byte]) => Unit,
    onFetch: (Long, Long) => Unit = (_, _) => ())
    extends ByteRanges(length, Nil) {
  require(pace > 0, s"pace must be positive, got $pace")
  private val nWin = ((length.toLong + pace - 1) / pace).toInt
  private val wins = new Array[Array[Byte]](nWin)
  // resident bytes tracked INCREMENTALLY: a rescan of `wins` per fetch
  // is O(nWin²) over the stream — at a 4 KB pace on a 256 MB stream the
  // telemetry would dominate the decode
  private var residentBytes = 0L
  // wins(j) == null for all j < droppedBelow (the forward sweep's
  // watermark, lowered on a backward re-fetch so the next forward sweep
  // re-covers the revived range)
  private var droppedBelow = 0

  private def win(i: Int): Array[Byte] = {
    var w = wins(i)
    if (w == null) {
      val wLen = math.min(pace.toLong, length.toLong - i.toLong * pace).toInt
      w = new Array[Byte](wLen)
      fetch(absStart + i.toLong * pace, w)
      wins(i) = w
      residentBytes += wLen
      if (i < droppedBelow) droppedBelow = i
      // forward-only decode: drop everything at least 2 windows behind
      // (the previous window may still back a chunk straddling into this
      // one, and the current block may alias it)
      var j = droppedBelow
      while (j < i - 1) {
        if (wins(j) != null) { residentBytes -= wins(j).length; wins(j) = null }
        j += 1
      }
      if (i - 1 > droppedBelow) droppedBelow = i - 1
      onFetch(wLen.toLong, residentBytes)
    }
    w
  }

  override def segmentAt(pos: Int): (Int, Array[Byte], Int, Int) = {
    if (pos < 0 || pos >= length) throw new EOFException(
      s"pos $pos outside [0,$length)")
    val i = pos / pace
    val wLen = math.min(pace.toLong, length.toLong - i.toLong * pace).toInt
    (i * pace, win(i), 0, wLen)
  }

  /** Windows are fixed-size, so a chunk body can straddle a boundary —
    * assemble those views by copy (≤ one compressed block, once per
    * window boundary; everything else stays zero-copy).
    */
  override def view(pos: Int, n: Int): (Array[Byte], Int) = {
    val (s, arr, off, wLen) = segmentAt(pos)
    if (pos + n <= s + wLen) (arr, off + (pos - s))
    else {
      if (pos + n > length) throw new EOFException(
        s"[$pos,${pos + n}) exceeds the stream length $length")
      val out = new Array[Byte](n)
      var p = pos
      var o = 0
      while (o < n) {
        val c = read(p, out, o, n - o)
        if (c <= 0) throw new EOFException(s"short read assembling [$pos,${pos + n})")
        p += c
        o += c
      }
      (out, 0)
    }
  }
}

object InStream {
  def apply(name: String, bytes: Array[Byte], codec: Option[CompressionCodec],
            blockSize: Int = 1 << 18): InStream =
    apply(name, ByteRanges.whole(bytes), codec, blockSize)

  def apply(name: String, ranges: ByteRanges, codec: Option[CompressionCodec],
            blockSize: Int): InStream =
    codec match {
      case Some(c) => new CompressedInStream(name, ranges, c, blockSize)
      case None => new UncompressedInStream(name, ranges)
    }
}

/** Read-side counterpart: a seekable stream over one column stream's
  * on-disk bytes (reference InStream.java:135-443).
  *
  * The direct-span API (`ensureSpan`/`spanArray`/`spanOffset`/
  * `advanceSpan`) is the read-side analog of OutStream.reserve(): hot
  * decoders (varints, IEEE doubles) work on the buffered block's array
  * directly instead of per-byte virtual read() calls, falling back to
  * read() near span boundaries. A span never silently crosses a chunk,
  * so a decoder that checks `ensureSpan() >= k` for a k-byte value is
  * boundary-safe.
  */
sealed abstract class InStream extends InputStream {
  def seek(positions: PositionProvider): Unit

  /** Contiguous buffered bytes at the current position: 0 at EOF,
    * otherwise `spanArray`/`spanOffset` address at least one byte. */
  def ensureSpan(): Int
  var spanArray: Array[Byte] = null
  var spanOffset: Int = 0
  def advanceSpan(n: Int): Unit
}

final class UncompressedInStream(name: String, ranges: ByteRanges) extends InStream {
  private var pos = 0
  // cached current segment: single-byte reads (varint decode is the
  // hottest loop in the engine) must be a direct array index, not a
  // binary search per byte
  private var segArr: Array[Byte] = null
  private var segBase = 0 // stream pos of segArr(segOff)
  private var segOff = 0
  private var segEnd = 0 // stream pos just past the cached segment

  private def refresh(): Unit = {
    val (start, arr, off, len) = ranges.segmentAt(pos)
    segArr = arr; segBase = start; segOff = off; segEnd = start + len
  }

  override def read(): Int = {
    if (pos >= ranges.length) return -1
    if (segArr == null || pos < segBase || pos >= segEnd) refresh()
    val b = segArr(segOff + (pos - segBase)) & 0xff
    pos += 1
    b
  }

  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    val n = ranges.read(pos, buf, off, len)
    if (n > 0) pos += n
    n
  }

  override def available(): Int = ranges.length - pos

  override def ensureSpan(): Int = {
    if (pos >= ranges.length) return 0
    if (segArr == null || pos < segBase || pos >= segEnd) refresh()
    spanArray = segArr
    spanOffset = segOff + (pos - segBase)
    segEnd - pos
  }

  override def advanceSpan(n: Int): Unit = pos += n

  override def seek(positions: PositionProvider): Unit = {
    pos = positions.next().toInt
  }
}

/** Chunked compressed stream: 3-byte header per chunk, low bit set when the
  * chunk is stored original. Seek positions are (chunkStart, uncompressedOffset).
  */
final class CompressedInStream(name: String, ranges: ByteRanges, codec: CompressionCodec,
    blockSize: Int) extends InStream {

  private var chunkStart = 0          // offset of current chunk header in stream
  // decompressed current chunk: (blockArr, blockBase, blockLen). Stored-
  // original chunks alias the pread segment directly (zero copy); real
  // compressed chunks decode into one per-stream `decodeBuf` reused across
  // chunks — the read path allocates nothing per chunk.
  private var blockArr: Array[Byte] = null
  private var blockBase = 0
  private var blockLen = 0
  private var blockPos = 0
  private var nextChunk = 0           // offset of the chunk after current
  private var decodeBuf: Array[Byte] = null

  private def ensureBlock(): Boolean = {
    while (blockArr == null || blockPos >= blockLen) {
      if (blockArr != null) { chunkStart = nextChunk; blockArr = null; blockPos = 0 }
      if (chunkStart >= ranges.length) return false
      if (chunkStart + 3 > ranges.length)
        throw new EOFException(s"truncated chunk header in $name")
      val header = ranges.byteAt(chunkStart) |
        (ranges.byteAt(chunkStart + 1) << 8) |
        (ranges.byteAt(chunkStart + 2) << 16)
      val len = header >>> 1
      val original = (header & 1) == 1
      val dataOff = chunkStart + 3
      if (dataOff + len > ranges.length)
        throw new EOFException(s"truncated chunk body in $name")
      val (arr, aOff) = ranges.view(dataOff, len)
      if (original) {
        blockArr = arr; blockBase = aOff; blockLen = len
      } else {
        if (decodeBuf == null) decodeBuf = new Array[Byte](blockSize)
        val t0 = System.nanoTime()
        blockLen = codec.decompressInto(arr, aOff, len, decodeBuf, 0, blockSize)
        val prof = ReadProfile.get
        prof.decompressNanos += System.nanoTime() - t0
        prof.decompressCalls += 1
        blockArr = decodeBuf; blockBase = 0
      }
      blockPos = 0
      nextChunk = dataOff + len
      if (blockLen == 0) { chunkStart = nextChunk; blockArr = null }
    }
    true
  }

  override def read(): Int =
    if (!ensureBlock()) -1
    else { val b = blockArr(blockBase + blockPos) & 0xff; blockPos += 1; b }

  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (!ensureBlock()) return -1
    val n = math.min(len, blockLen - blockPos)
    System.arraycopy(blockArr, blockBase + blockPos, buf, off, n)
    blockPos += n
    n
  }

  override def available(): Int =
    if (!ensureBlock()) 0 else blockLen - blockPos

  override def ensureSpan(): Int = {
    if (!ensureBlock()) return 0
    spanArray = blockArr
    spanOffset = blockBase + blockPos
    blockLen - blockPos
  }

  override def advanceSpan(n: Int): Unit = blockPos += n

  override def seek(positions: PositionProvider): Unit = {
    val newChunk = positions.next().toInt
    val uncompressedOffset = positions.next().toInt
    if (newChunk != chunkStart || blockArr == null) {
      chunkStart = newChunk
      blockArr = null
    }
    // always rewind within the (possibly still-loaded) chunk: a later seek
    // may legally land back in a chunk whose block was fully consumed
    blockPos = 0
    if (uncompressedOffset > 0) {
      if (!ensureBlock())
        throw new EOFException(s"seek past end of $name")
      blockPos = uncompressedOffset
    }
  }
}
