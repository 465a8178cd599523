package graft.format

import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import Serialization._

/** File metadata model + compact binary serde.
  *
  * Mirrors the reference's protobuf metadata (orc_proto.proto:41-136):
  * PostScript / Footer / StripeInformation / StripeFooter / per-column
  * streams, encodings and statistics — re-expressed as a hand-rolled
  * varint format (wire compatibility with DWRF is explicitly out of scope,
  * SURVEY §5: parity target is self-consistency).
  *
  * Layout:
  * {{{
  *   "GRFT"                                  magic
  *   stripe*: [index area][data area][stripe footer (compressed)]
  *   footer (compressed)
  *   postscript (never compressed)
  *   1 byte: postscript length
  * }}}
  */
object Magic {
  val Bytes: Array[Byte] = "GRFT".getBytes("UTF-8")
  val Version = 1
}

/** Stream kinds (reference orc_proto.proto:41-60). */
object StreamKind {
  val Present = 0
  val Data = 1
  val Length = 2
  val DictionaryData = 3
  val NanoData = 4
  val InDictionary = 5
  val StrideDictionary = 6
  val StrideDictionaryLength = 7
  val RowIndex = 8
  /** Per-stride Bloom filters, one optional filter per row-index stride
    * (same id ORC's own proto later assigned BLOOM_FILTER; the reference
    * fork predates it). Lives in the stripe's index area after the
    * ROW_INDEX streams. */
  val BloomFilter = 9

  /** Kinds stored in the stripe's INDEX area (before the data streams);
    * offset accounting inside the index buffer must walk exactly these. */
  def isIndexKind(kind: Int): Boolean = kind == RowIndex || kind == BloomFilter
}

final case class StreamInfo(column: Int, kind: Int, length: Long)

/** Per-column, per-stripe encoding (reference ColumnEncoding). */
final case class ColumnEncoding(dictionary: Boolean, dictionarySize: Int = 0)

final case class StripeInformation(
    offset: Long, indexLength: Long, dataLength: Long,
    footerLength: Long, numRows: Long)

final case class StripeFooter(
    streams: Seq[StreamInfo],
    encodings: Map[Int, ColumnEncoding],
    // per-column stats for this stripe; drives stripe skipping
    stats: Map[Int, ColumnStats])

final case class Footer(
    schemaJson: String,
    stripes: Seq[StripeInformation],
    fileStats: Map[Int, ColumnStats],
    numRows: Long,
    rowIndexStride: Int,
    rawDataSize: Long,
    userMetadata: Map[String, Array[Byte]])

final case class PostScript(
    footerLength: Long,
    compression: CompressionKind,
    blockSize: Int,
    version: Int,
    writerZlibLevel: Int,
    useVInts: Boolean = true)

/** Column statistics (reference statistics/ColumnStatisticsImpl.java:26-520):
  * count + has-null + a typed min/max/sum payload. `longMin/..` double as
  * timestamp-micros and date-days stats.
  */
final case class ColumnStats(
    count: Long,
    hasNull: Boolean,
    // typed payloads; unused ones stay at defaults
    longMin: Long = Long.MaxValue, longMax: Long = Long.MinValue,
    longSum: Long = 0L, longSumOverflowed: Boolean = false,
    doubleMin: Double = Double.PositiveInfinity,
    doubleMax: Double = Double.NegativeInfinity, doubleSum: Double = 0.0,
    stringMin: String = null, stringMax: String = null,
    totalLength: Long = 0L,
    trueCount: Long = 0L) {

  def merge(o: ColumnStats): ColumnStats = ColumnStats(
    count = count + o.count,
    hasNull = hasNull || o.hasNull,
    longMin = math.min(longMin, o.longMin),
    longMax = math.max(longMax, o.longMax),
    longSum = longSum + o.longSum,
    longSumOverflowed = longSumOverflowed || o.longSumOverflowed,
    doubleMin = math.min(doubleMin, o.doubleMin),
    doubleMax = math.max(doubleMax, o.doubleMax),
    doubleSum = doubleSum + o.doubleSum,
    stringMin =
      if (stringMin == null) o.stringMin
      else if (o.stringMin == null) stringMin
      else if (ColumnStats.utf8Compare(stringMin, o.stringMin) <= 0) stringMin else o.stringMin,
    stringMax =
      if (stringMax == null) o.stringMax
      else if (o.stringMax == null) stringMax
      else if (ColumnStats.utf8Compare(stringMax, o.stringMax) >= 0) stringMax else o.stringMax,
    totalLength = totalLength + o.totalLength,
    trueCount = trueCount + o.trueCount)
}

object ColumnStats {
  /** Unsigned UTF-8 byte order — the order UTF8String uses at eval time
    * (StatsBuilder.noteString, StatsFilter). java.lang.String.compareTo is
    * UTF-16 code-unit order, which DISAGREES for supplementary-plane
    * characters (surrogates 0xD800+ sort above BMP chars ≥ 0xE000); merged
    * bounds in that order could sanction wrong stripe skips.
    */
  def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
}

object MetaIO {
  /** Bound a count/length parsed from UNTRUSTED bytes before it drives
    * an allocation or a loop: a corrupt varint must fail with a named
    * error, not an OOM-sized allocation, a negative-size crash, or a
    * billion-iteration decode loop. 1<<28 comfortably exceeds any real
    * footer/index payload (these are per-file/per-stripe metadata).
    */
  private def sane(n: Long, what: String, max: Long = 1L << 28,
      min: Long = 0L): Int = {
    if (n < min || n > max)
      throw new java.io.IOException(s"corrupt $what: $n out of range")
    n.toInt
  }

  private def writeString(out: OutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    writeVulong(out, b.length.toLong)
    out.write(b)
  }

  private def readString(in: InputStream): String = {
    val len = sane(readVulong(in), "string length")
    val b = new Array[Byte](len)
    var got = 0
    while (got < len) {
      val n = in.read(b, got, len - got)
      if (n < 0) throw new java.io.EOFException("EOF in string")
      got += n
    }
    new String(b, "UTF-8")
  }

  private def writeBool(out: OutputStream, b: Boolean): Unit =
    out.write(if (b) 1 else 0)
  private def readBool(in: InputStream): Boolean = in.read() == 1

  // ---- ColumnStats ----
  def writeStats(out: OutputStream, s: ColumnStats): Unit = {
    writeVulong(out, s.count)
    writeBool(out, s.hasNull)
    writeVslong(out, s.longMin); writeVslong(out, s.longMax)
    writeVslong(out, s.longSum); writeBool(out, s.longSumOverflowed)
    writeDouble(out, s.doubleMin); writeDouble(out, s.doubleMax)
    writeDouble(out, s.doubleSum)
    writeBool(out, s.stringMin != null)
    if (s.stringMin != null) writeString(out, s.stringMin)
    writeBool(out, s.stringMax != null)
    if (s.stringMax != null) writeString(out, s.stringMax)
    writeVulong(out, s.totalLength)
    writeVulong(out, s.trueCount)
  }

  def readStats(in: InputStream): ColumnStats = {
    val count = readVulong(in)
    val hasNull = readBool(in)
    val lmin = readVslong(in); val lmax = readVslong(in)
    val lsum = readVslong(in); val lovf = readBool(in)
    val dmin = readDouble(in); val dmax = readDouble(in); val dsum = readDouble(in)
    val smin = if (readBool(in)) readString(in) else null
    val smax = if (readBool(in)) readString(in) else null
    val tlen = readVulong(in)
    val tc = readVulong(in)
    ColumnStats(count, hasNull, lmin, lmax, lsum, lovf, dmin, dmax, dsum,
      smin, smax, tlen, tc)
  }

  private def writeStatsMap(out: OutputStream, m: Map[Int, ColumnStats]): Unit = {
    writeVulong(out, m.size.toLong)
    m.toSeq.sortBy(_._1).foreach { case (col, st) =>
      writeVulong(out, col.toLong)
      writeStats(out, st)
    }
  }

  private def readStatsMap(in: InputStream): Map[Int, ColumnStats] = {
    val n = sane(readVulong(in), "stats map size")
    (0 until n).map(_ => readVulong(in).toInt -> readStats(in)).toMap
  }

  // ---- StripeFooter ----
  def writeStripeFooter(out: OutputStream, sf: StripeFooter): Unit = {
    writeVulong(out, sf.streams.size.toLong)
    sf.streams.foreach { s =>
      writeVulong(out, s.column.toLong)
      writeVulong(out, s.kind.toLong)
      writeVulong(out, s.length)
    }
    writeVulong(out, sf.encodings.size.toLong)
    sf.encodings.toSeq.sortBy(_._1).foreach { case (col, e) =>
      writeVulong(out, col.toLong)
      writeBool(out, e.dictionary)
      writeVulong(out, e.dictionarySize.toLong)
    }
    writeStatsMap(out, sf.stats)
  }

  def readStripeFooter(in: InputStream): StripeFooter = {
    val ns = sane(readVulong(in), "stream count")
    val streams = (0 until ns).map { _ =>
      StreamInfo(readVulong(in).toInt, readVulong(in).toInt, readVulong(in))
    }
    val ne = sane(readVulong(in), "encoding count")
    val encodings = (0 until ne).map { _ =>
      readVulong(in).toInt -> ColumnEncoding(readBool(in), readVulong(in).toInt)
    }.toMap
    StripeFooter(streams, encodings, readStatsMap(in))
  }

  // ---- Footer ----
  def writeFooter(out: OutputStream, f: Footer): Unit = {
    writeString(out, f.schemaJson)
    writeVulong(out, f.stripes.size.toLong)
    f.stripes.foreach { s =>
      writeVulong(out, s.offset)
      writeVulong(out, s.indexLength)
      writeVulong(out, s.dataLength)
      writeVulong(out, s.footerLength)
      writeVulong(out, s.numRows)
    }
    writeStatsMap(out, f.fileStats)
    writeVulong(out, f.numRows)
    writeVulong(out, f.rowIndexStride.toLong)
    writeVulong(out, f.rawDataSize)
    writeVulong(out, f.userMetadata.size.toLong)
    f.userMetadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
      writeString(out, k)
      writeVulong(out, v.length.toLong)
      out.write(v)
    }
  }

  def readFooter(in: InputStream): Footer = {
    val schema = readString(in)
    val ns = sane(readVulong(in), "stripe count")
    val stripes = (0 until ns).map { _ =>
      StripeInformation(readVulong(in), readVulong(in), readVulong(in),
        readVulong(in), readVulong(in))
    }
    val stats = readStatsMap(in)
    val numRows = readVulong(in)
    val stride = readVulong(in).toInt
    val raw = readVulong(in)
    val nm = sane(readVulong(in), "metadata entry count")
    val meta = (0 until nm).map { _ =>
      val k = readString(in)
      val len = sane(readVulong(in), "metadata value length")
      val v = new Array[Byte](len)
      var got = 0
      while (got < len) {
        val n = in.read(v, got, len - got)
        if (n < 0) throw new java.io.EOFException("EOF in metadata")
        got += n
      }
      k -> v
    }.toMap
    Footer(schema, stripes, stats, numRows, stride, raw, meta)
  }

  // ---- PostScript (fixed-ish, never compressed, ≤255 bytes) ----
  def writePostScript(out: OutputStream, ps: PostScript): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    writeVulong(bos, ps.footerLength)
    bos.write(ps.compression.id)
    writeVulong(bos, ps.blockSize.toLong)
    writeVulong(bos, ps.version.toLong)
    writeVulong(bos, ps.writerZlibLevel.toLong)
    bos.write(if (ps.useVInts) 1 else 0)
    bos.write(Magic.Bytes)
    val b = bos.toByteArray
    require(b.length <= 255, "postscript too large")
    out.write(b)
    b
  }

  def readPostScript(bytes: Array[Byte]): PostScript = {
    val magicStart = bytes.length - Magic.Bytes.length
    require(magicStart >= 0 &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, magicStart, bytes.length), Magic.Bytes),
      "not a GRFT file (bad postscript magic)")
    val in = new java.io.ByteArrayInputStream(bytes, 0, magicStart)
    PostScript(
      footerLength = readVulong(in),
      compression = CompressionKind.fromId(in.read()),
      // untrusted: blockSize sizes every decode buffer downstream
      blockSize = sane(readVulong(in), "compression block size",
        max = 1L << 26, min = 1L),
      version = readVulong(in).toInt,
      writerZlibLevel = readVulong(in).toInt,
      useVInts = in.read() == 1)
  }

  /** Row-index payload: entries of (positions-per-stream-kind, stats).
    * Serialized per column into its ROW_INDEX stream.
    */
  def writeRowIndex(out: OutputStream, entries: Seq[RowIndexEntry]): Unit = {
    writeVulong(out, entries.size.toLong)
    entries.foreach { e =>
      writeVulong(out, e.positions.size.toLong)
      e.positions.toSeq.sortBy(_._1).foreach { case (kind, ps) =>
        writeVulong(out, kind.toLong)
        writeVulong(out, ps.length.toLong)
        ps.foreach(writeVulong(out, _))
      }
      writeStats(out, e.stats)
    }
  }

  def readRowIndex(in: InputStream): Seq[RowIndexEntry] = {
    val n = sane(readVulong(in), "row index entry count")
    (0 until n).map { _ =>
      val nk = sane(readVulong(in), "position stream count", 64)
      val positions = (0 until nk).map { _ =>
        val kind = readVulong(in).toInt
        val np = sane(readVulong(in), "position count", 64)
        kind -> Array.fill(np)(readVulong(in))
      }.toMap
      RowIndexEntry(positions, readStats(in))
    }
  }

  /** Stride-bloom payload (StreamKind.BloomFilter): one optional filter
    * per row-index stride, length-prefixed ([[BloomFilter.serialize]]
    * bytes; 0 = no filter for that stride — e.g. all-null). Serialized
    * per column into its BLOOM_FILTER index stream.
    */
  def writeStrideBlooms(out: OutputStream,
      blooms: Seq[Option[BloomFilter]]): Unit = {
    writeVulong(out, blooms.size.toLong)
    blooms.foreach {
      case Some(bf) =>
        val b = bf.serialize()
        writeVulong(out, b.length.toLong)
        out.write(b, 0, b.length)
      case None => writeVulong(out, 0L)
    }
  }

  def readStrideBlooms(in: InputStream): IndexedSeq[Option[BloomFilter]] = {
    val n = sane(readVulong(in), "stride bloom count")
    (0 until n).map { _ =>
      val len = sane(readVulong(in), "stride bloom length")
      if (len == 0) None
      else {
        val b = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val r = in.read(b, off, len - off)
          if (r < 0) throw new java.io.EOFException("stride bloom truncated")
          off += r
        }
        BloomFilter.deserialize(b) // None on foreign bytes: no pruning
      }
    }
  }
}

/** One stride's seek state: per-stream positions + stride stats. */
final case class RowIndexEntry(
    positions: Map[Int, Array[Long]],
    stats: ColumnStats)
