package graft.format

import java.util.zip.{Deflater, Inflater}

/** Block compression codecs behind the same contract as the reference
  * (hive-dwrf compression/CompressionCodec.java:27-45): compress a block,
  * returning None when the result would not shrink (the caller then stores
  * the original bytes and flags them in the chunk header), and decompress
  * a block of known decompressed size.
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
  /** Compress src[off, off+len); None if the result is not smaller. */
  def compress(src: Array[Byte], off: Int, len: Int): Option[Array[Byte]]

  /** Decompress src[off, off+len). `maxDestLen` is an upper bound (the
    * write-side block size); the returned array is exactly the actual
    * decompressed length.
    */
  def decompress(src: Array[Byte], off: Int, len: Int, maxDestLen: Int): Array[Byte]
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
}

final class ZlibCodec(level: Int) extends CompressionCodec {
  override def compress(src: Array[Byte], off: Int, len: Int): Option[Array[Byte]] = {
    val deflater = new Deflater(level, /* nowrap = raw deflate */ true)
    try {
      deflater.setInput(src, off, len)
      deflater.finish()
      val out = new Array[Byte](len) // only useful if it shrinks
      var total = 0
      while (!deflater.finished() && total < len) {
        val n = deflater.deflate(out, total, len - total)
        total += n
        if (n == 0 && !deflater.finished()) return None
      }
      if (deflater.finished() && total < len) Some(java.util.Arrays.copyOf(out, total))
      else None
    } finally deflater.end()
  }

  override def decompress(src: Array[Byte], off: Int, len: Int, maxDestLen: Int): Array[Byte] = {
    val inflater = new Inflater(true)
    try {
      inflater.setInput(src, off, len)
      var out = new Array[Byte](maxDestLen)
      var total = 0
      while (!inflater.finished()) {
        if (total == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        val n = inflater.inflate(out, total, out.length - total)
        if (n == 0 && inflater.needsInput())
          throw new java.io.IOException("truncated zlib block")
        total += n
      }
      if (total == out.length) out else java.util.Arrays.copyOf(out, total)
    } finally inflater.end()
  }
}

object SnappyCodec extends CompressionCodec {
  import org.xerial.snappy.Snappy

  override def compress(src: Array[Byte], off: Int, len: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](Snappy.maxCompressedLength(len))
    val n = Snappy.compress(src, off, len, out, 0)
    if (n < len) Some(java.util.Arrays.copyOf(out, n)) else None
  }

  override def decompress(src: Array[Byte], off: Int, len: Int, maxDestLen: Int): Array[Byte] = {
    val actual = Snappy.uncompressedLength(src, off, len)
    val out = new Array[Byte](actual)
    Snappy.uncompress(src, off, len, out, 0)
    out
  }
}

/** LZ4 block codec (modern replacement for the reference's optional
  * reflective LZO; lz4-java ships with Spark). Fast decompress needs the
  * exact output size, which the caller tracks via the chunk framing and
  * an explicit 4-byte length prefix inside the block.
  */
object Lz4Codec extends CompressionCodec {
  import net.jpountz.lz4.LZ4Factory
  private val factory = LZ4Factory.fastestInstance()

  override def compress(src: Array[Byte], off: Int, len: Int): Option[Array[Byte]] = {
    val c = factory.fastCompressor()
    val max = c.maxCompressedLength(len)
    val out = new Array[Byte](4 + max)
    // store decompressed length (LZ4 block format doesn't carry it)
    out(0) = (len & 0xff).toByte
    out(1) = ((len >> 8) & 0xff).toByte
    out(2) = ((len >> 16) & 0xff).toByte
    out(3) = ((len >> 24) & 0xff).toByte
    val n = c.compress(src, off, len, out, 4, max)
    if (n + 4 < len) Some(java.util.Arrays.copyOf(out, n + 4)) else None
  }

  override def decompress(src: Array[Byte], off: Int, len: Int, maxDestLen: Int): Array[Byte] = {
    val destLen = (src(off) & 0xff) | ((src(off + 1) & 0xff) << 8) |
      ((src(off + 2) & 0xff) << 16) | ((src(off + 3) & 0xff) << 24)
    val out = new Array[Byte](destLen)
    factory.fastDecompressor().decompress(src, off + 4, out, 0, destLen)
    out
  }
}

/** LZO block codec (reference E10's optional reflective LzoCodec,
  * `compression/LzoCodec`-via-reflection) — pure-JVM LZO from
  * aircompressor, which Spark already ships, instead of the reference's
  * reflective hadoop-lzo dependency. Same length-prefix convention as
  * [[Lz4Codec]]: raw LZO blocks don't carry the decompressed size.
  */
object LzoCodec extends CompressionCodec {
  override def compress(src: Array[Byte], off: Int, len: Int): Option[Array[Byte]] = {
    val c = new io.airlift.compress.lzo.LzoCompressor()
    val max = c.maxCompressedLength(len)
    val out = new Array[Byte](4 + max)
    out(0) = (len & 0xff).toByte
    out(1) = ((len >> 8) & 0xff).toByte
    out(2) = ((len >> 16) & 0xff).toByte
    out(3) = ((len >> 24) & 0xff).toByte
    val n = c.compress(src, off, len, out, 4, max)
    if (n + 4 < len) Some(java.util.Arrays.copyOf(out, n + 4)) else None
  }

  override def decompress(src: Array[Byte], off: Int, len: Int, maxDestLen: Int): Array[Byte] = {
    val destLen = (src(off) & 0xff) | ((src(off + 1) & 0xff) << 8) |
      ((src(off + 2) & 0xff) << 16) | ((src(off + 3) & 0xff) << 24)
    val out = new Array[Byte](destLen)
    new io.airlift.compress.lzo.LzoDecompressor()
      .decompress(src, off + 4, len - 4, out, 0, destLen)
    out
  }
}

object ZstdCodec extends CompressionCodec {
  import com.github.luben.zstd.Zstd

  override def compress(src: Array[Byte], off: Int, len: Int): Option[Array[Byte]] = {
    val in = if (off == 0 && len == src.length) src else java.util.Arrays.copyOfRange(src, off, off + len)
    val out = Zstd.compress(in, 3)
    if (out.length < len) Some(out) else None
  }

  override def decompress(src: Array[Byte], off: Int, len: Int, maxDestLen: Int): Array[Byte] = {
    val in = if (off == 0 && len == src.length) src else java.util.Arrays.copyOfRange(src, off, off + len)
    val actual = Zstd.getFrameContentSize(in)
    Zstd.decompress(in, actual.toInt)
  }
}
