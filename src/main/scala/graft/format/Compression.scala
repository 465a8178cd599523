package graft.format

import java.util.zip.{Deflater, Inflater}

/** Block compression codecs behind the same contract as the reference
  * (hive-dwrf compression/CompressionCodec.java:27-45): compress a block,
  * signalling when the result would not shrink (the caller then stores
  * the original bytes and flags them in the chunk header), and decompress
  * a block of known maximum decompressed size.
  *
  * The primitive API is buffer-to-buffer (`compressInto`/`decompressInto`)
  * so the hot path — every 256 KB chunk of every column stream — allocates
  * nothing: OutStream and CompressedInStream own one scratch buffer each
  * and native codec state (zlib Deflater/Inflater) is pooled per thread.
  *
  * ZLIB is raw deflate (no zlib wrapper), level 4 by default, matching
  * ZlibCodec.java:44-45. SNAPPY/ZSTD use the jars Spark already ships.
  */
sealed abstract class CompressionKind(val id: Int, val name: String)
object CompressionKind {
  case object None extends CompressionKind(0, "NONE")
  case object Zlib extends CompressionKind(1, "ZLIB")
  case object Snappy extends CompressionKind(2, "SNAPPY")
  case object Zstd extends CompressionKind(3, "ZSTD")
  case object Lz4 extends CompressionKind(4, "LZ4")
  case object Lzo extends CompressionKind(5, "LZO")

  val all: Seq[CompressionKind] = Seq(None, Zlib, Snappy, Zstd, Lz4, Lzo)

  def fromId(id: Int): CompressionKind =
    all.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"unknown compression id $id"))

  def fromName(n: String): CompressionKind =
    all.find(_.name.equalsIgnoreCase(n)).getOrElse(
      throw new IllegalArgumentException(s"unknown compression '$n'"))
}

trait CompressionCodec {
  /** Worst-case compressed size for a `len`-byte block — sizes the
    * caller's reusable scratch buffer. */
  def maxCompressedLength(len: Int): Int

  /** Compress src[off, off+len) into dst[dstOff, …); returns the
    * compressed length, or -1 when the result would not be smaller than
    * `len` (caller stores the original). dst must have at least
    * `maxCompressedLength(len)` bytes of room at dstOff.
    */
  def compressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int): Int

  /** Decompress src[off, off+len) into dst[dstOff, dstOff+maxDestLen);
    * returns the actual decompressed length. `maxDestLen` is the
    * write-side block size — no valid chunk exceeds it.
    */
  def decompressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, maxDestLen: Int): Int

  /** Allocating convenience (tests, cold paths). */
  final def compress(src: Array[Byte], off: Int, len: Int): Option[Array[Byte]] = {
    val dst = new Array[Byte](maxCompressedLength(len))
    val n = compressInto(src, off, len, dst, 0)
    if (n < 0) None else Some(java.util.Arrays.copyOf(dst, n))
  }

  /** Allocating convenience (tests, cold paths). */
  final def decompress(src: Array[Byte], off: Int, len: Int, maxDestLen: Int): Array[Byte] = {
    val dst = new Array[Byte](maxDestLen)
    val n = decompressInto(src, off, len, dst, 0, maxDestLen)
    java.util.Arrays.copyOf(dst, n)
  }
}

object CompressionCodec {
  /** None for CompressionKind.None: the stream layer then skips chunk
    * framing entirely (same as the reference's uncompressed mode).
    */
  def forKind(kind: CompressionKind, zlibLevel: Int = 4): Option[CompressionCodec] =
    kind match {
      case CompressionKind.None => scala.None
      case CompressionKind.Zlib => Some(new ZlibCodec(zlibLevel))
      case CompressionKind.Snappy => Some(SnappyCodec)
      case CompressionKind.Zstd => Some(ZstdCodec)
      case CompressionKind.Lz4 => Some(Lz4Codec)
      case CompressionKind.Lzo => Some(LzoCodec)
    }

  /** Write-path variant: the zlib level is re-read per compressed block,
    * so memory-pressure escalation reaches in-flight writers. */
  def forKindDynamic(kind: CompressionKind,
      zlibLevelOf: () => Int): Option[CompressionCodec] =
    kind match {
      case CompressionKind.Zlib => Some(new ZlibCodec(zlibLevelOf))
      case other => forKind(other)
    }
}

object ZlibCodec {
  // Deflater/Inflater carry ~256 KB of native state whose init dominates
  // small-block deflate calls: pool them per thread (keyed by level for
  // deflaters) and reset() between blocks — the classic Hadoop/Spark
  // codec-pool pattern, bounded by threads × levels. Native state of a
  // dead thread's pool is reclaimed by the JDK's own Cleaner once the
  // ThreadLocal map becomes unreachable; the cap below additionally
  // end()s old levels eagerly so a thread that cycles through many zlib
  // levels (level is a per-writer option) holds at most MaxPooledLevels
  // native contexts at a time.
  private val MaxPooledLevels = 4
  private val deflaters =
    ThreadLocal.withInitial[java.util.LinkedHashMap[Integer, Deflater]](
      () => new java.util.LinkedHashMap[Integer, Deflater](8, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Integer, Deflater]): Boolean = {
          val evict = size() > MaxPooledLevels
          if (evict) e.getValue.end()
          evict
        }
      })
  private val inflaters =
    ThreadLocal.withInitial[Inflater](() => new Inflater(/* nowrap */ true))

  private[format] def deflater(level: Int): Deflater = {
    val m = deflaters.get()
    var d = m.get(level)
    if (d == null) { d = new Deflater(level, /* nowrap */ true); m.put(level, d) }
    else d.reset()
    d
  }

  private[format] def inflater(): Inflater = {
    val i = inflaters.get()
    i.reset()
    i
  }
}

final class ZlibCodec(levelOf: () => Int) extends CompressionCodec {
  // fixed-level spelling (readers, tools); write paths pass a provider so
  // memory-pressure escalation applies to blocks compressed AFTER the
  // governor flips the flag — zlib level is per-block writer state, never
  // format state, so mixing levels within one stream is always valid
  def this(level: Int) = this(() => level)

  // scratch capacity: we bail at `len` anyway, so len suffices
  override def maxCompressedLength(len: Int): Int = len

  override def compressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int): Int = {
    val deflater = ZlibCodec.deflater(levelOf())
    deflater.setInput(src, off, len)
    deflater.finish()
    var total = 0
    while (!deflater.finished() && total < len) {
      val n = deflater.deflate(dst, dstOff + total, len - total)
      total += n
      if (n == 0 && !deflater.finished()) return -1
    }
    if (deflater.finished() && total < len) total else -1
  }

  override def decompressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, maxDestLen: Int): Int = {
    val inflater = ZlibCodec.inflater()
    inflater.setInput(src, off, len)
    var total = 0
    while (!inflater.finished()) {
      if (total == maxDestLen)
        throw new java.io.IOException(
          s"zlib block decompresses past the $maxDestLen-byte block size")
      val n = inflater.inflate(dst, dstOff + total, maxDestLen - total)
      if (n == 0 && inflater.needsInput())
        throw new java.io.IOException("truncated zlib block")
      total += n
    }
    total
  }
}

object SnappyCodec extends CompressionCodec {
  import org.xerial.snappy.Snappy

  override def maxCompressedLength(len: Int): Int = Snappy.maxCompressedLength(len)

  override def compressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int): Int = {
    val n = Snappy.compress(src, off, len, dst, dstOff)
    if (n < len) n else -1
  }

  override def decompressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, maxDestLen: Int): Int = {
    val actual = Snappy.uncompressedLength(src, off, len)
    if (actual > maxDestLen)
      throw new java.io.IOException(
        s"snappy block decompresses to $actual > block size $maxDestLen")
    Snappy.uncompress(src, off, len, dst, dstOff)
  }
}

/** LZ4 block codec (modern replacement for the reference's optional
  * reflective LZO; lz4-java ships with Spark). Fast decompress needs the
  * exact output size, which rides in an explicit 4-byte length prefix
  * inside the block (the LZ4 block format doesn't carry it).
  */
object Lz4Codec extends CompressionCodec {
  import net.jpountz.lz4.LZ4Factory
  private val factory = LZ4Factory.fastestInstance()

  override def maxCompressedLength(len: Int): Int =
    4 + factory.fastCompressor().maxCompressedLength(len)

  private def putLen(dst: Array[Byte], at: Int, len: Int): Unit = {
    dst(at) = (len & 0xff).toByte
    dst(at + 1) = ((len >> 8) & 0xff).toByte
    dst(at + 2) = ((len >> 16) & 0xff).toByte
    dst(at + 3) = ((len >> 24) & 0xff).toByte
  }

  private def getLen(src: Array[Byte], at: Int): Int =
    (src(at) & 0xff) | ((src(at + 1) & 0xff) << 8) |
      ((src(at + 2) & 0xff) << 16) | ((src(at + 3) & 0xff) << 24)

  override def compressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int): Int = {
    val c = factory.fastCompressor()
    putLen(dst, dstOff, len)
    val n = c.compress(src, off, len, dst, dstOff + 4, c.maxCompressedLength(len))
    if (n + 4 < len) n + 4 else -1
  }

  override def decompressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, maxDestLen: Int): Int = {
    val destLen = getLen(src, off)
    if (destLen > maxDestLen)
      throw new java.io.IOException(
        s"lz4 block decompresses to $destLen > block size $maxDestLen")
    factory.fastDecompressor().decompress(src, off + 4, dst, dstOff, destLen)
    destLen
  }
}

/** LZO block codec (reference E10's optional reflective LzoCodec,
  * `compression/LzoCodec`-via-reflection) — pure-JVM LZO from
  * aircompressor, which Spark already ships, instead of the reference's
  * reflective hadoop-lzo dependency. Same length-prefix convention as
  * [[Lz4Codec]]: raw LZO blocks don't carry the decompressed size.
  */
object LzoCodec extends CompressionCodec {
  override def maxCompressedLength(len: Int): Int =
    4 + new io.airlift.compress.lzo.LzoCompressor().maxCompressedLength(len)

  override def compressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int): Int = {
    val c = new io.airlift.compress.lzo.LzoCompressor()
    dst(dstOff) = (len & 0xff).toByte
    dst(dstOff + 1) = ((len >> 8) & 0xff).toByte
    dst(dstOff + 2) = ((len >> 16) & 0xff).toByte
    dst(dstOff + 3) = ((len >> 24) & 0xff).toByte
    val n = c.compress(src, off, len, dst, dstOff + 4, c.maxCompressedLength(len))
    if (n + 4 < len) n + 4 else -1
  }

  override def decompressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, maxDestLen: Int): Int = {
    val destLen = (src(off) & 0xff) | ((src(off + 1) & 0xff) << 8) |
      ((src(off + 2) & 0xff) << 16) | ((src(off + 3) & 0xff) << 24)
    if (destLen > maxDestLen)
      throw new java.io.IOException(
        s"lzo block decompresses to $destLen > block size $maxDestLen")
    new io.airlift.compress.lzo.LzoDecompressor()
      .decompress(src, off + 4, len - 4, dst, dstOff, destLen)
    destLen
  }
}

object ZstdCodec extends CompressionCodec {
  import com.github.luben.zstd.Zstd

  override def maxCompressedLength(len: Int): Int =
    Zstd.compressBound(len.toLong).toInt

  override def compressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int): Int = {
    val n = Zstd.compressByteArray(dst, dstOff, dst.length - dstOff,
      src, off, len, 3)
    if (Zstd.isError(n)) throw new java.io.IOException(Zstd.getErrorName(n))
    if (n < len) n.toInt else -1
  }

  override def decompressInto(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, maxDestLen: Int): Int = {
    val n = Zstd.decompressByteArray(dst, dstOff, maxDestLen, src, off, len)
    if (Zstd.isError(n)) throw new java.io.IOException(Zstd.getErrorName(n))
    n.toInt
  }
}
