package graft.format

import java.io.{EOFException, InputStream, OutputStream}

/** Varint / zigzag / IEEE little-endian primitives.
  *
  * Same wire shapes as the reference's serde
  * (hive-dwrf SerializationUtils.java:33-156): LEB128 unsigned varints,
  * zigzag-encoded signed varints, and little-endian 4/8-byte floats.
  */
object Serialization {

  def writeVulong(out: OutputStream, v: Long): Unit = {
    var value = v
    var done = false
    while (!done) {
      if ((value & ~0x7fL) == 0) {
        out.write(value.toInt)
        done = true
      } else {
        out.write(((value & 0x7f) | 0x80).toInt)
        value >>>= 7
      }
    }
  }

  def writeVslong(out: OutputStream, v: Long): Unit =
    writeVulong(out, (v << 1) ^ (v >> 63))

  // ---- OutStream overloads: encode straight into the pending block ----
  // (statically more specific than the OutputStream versions, so RLE
  // writers pick them up with no call-site changes; a varint is <= 10 B)

  def writeVulong(out: OutStream, v: Long): Unit = {
    var p = out.reserve(10)
    val buf = out.buffer
    val start = p
    var value = v
    while ((value & ~0x7fL) != 0) {
      buf(p) = ((value & 0x7f) | 0x80).toByte
      p += 1
      value >>>= 7
    }
    buf(p) = value.toByte
    out.advance(p + 1 - start)
  }

  def writeVslong(out: OutStream, v: Long): Unit =
    writeVulong(out, (v << 1) ^ (v >> 63))

  def readVulong(in: InputStream): Long = {
    var result = 0L
    var shift = 0
    var b = 0
    do {
      b = in.read()
      if (b == -1) throw new EOFException("EOF mid-varint")
      result |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    result
  }

  def readVslong(in: InputStream): Long = {
    val v = readVulong(in)
    (v >>> 1) ^ -(v & 1)
  }

  // ---- InStream overloads: decode from the buffered block directly ----
  // (a varint is <= 10 bytes, so with >= 10 buffered it cannot cross the
  // span; shorter spans take the per-byte path, which also handles
  // varints straddling chunk boundaries in files from older writers)

  def readVulong(in: InStream): Long = {
    if (in.ensureSpan() >= 10) {
      val arr = in.spanArray
      val start = in.spanOffset
      var p = start
      var result = 0L
      var shift = 0
      var b = 0
      do {
        b = arr(p)
        p += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      in.advanceSpan(p - start)
      result
    } else readVulong(in: InputStream)
  }

  def readVslong(in: InStream): Long = {
    val v = readVulong(in)
    (v >>> 1) ^ -(v & 1)
  }

  def writeFloat(out: OutputStream, f: Float): Unit = {
    val bits = java.lang.Float.floatToIntBits(f)
    out.write(bits & 0xff)
    out.write((bits >> 8) & 0xff)
    out.write((bits >> 16) & 0xff)
    out.write((bits >> 24) & 0xff)
  }

  def writeFloat(out: OutStream, f: Float): Unit = {
    val p = out.reserve(4)
    val buf = out.buffer
    val bits = java.lang.Float.floatToIntBits(f)
    buf(p) = bits.toByte
    buf(p + 1) = (bits >> 8).toByte
    buf(p + 2) = (bits >> 16).toByte
    buf(p + 3) = (bits >> 24).toByte
    out.advance(4)
  }

  def readFloat(in: InputStream): Float = {
    var bits = 0
    var i = 0
    while (i < 4) {
      val b = in.read()
      if (b == -1) throw new EOFException("EOF mid-float")
      bits |= b << (i * 8)
      i += 1
    }
    java.lang.Float.intBitsToFloat(bits)
  }

  def readFloat(in: InStream): Float = {
    if (in.ensureSpan() >= 4) {
      val arr = in.spanArray
      val p = in.spanOffset
      val bits = (arr(p) & 0xff) | ((arr(p + 1) & 0xff) << 8) |
        ((arr(p + 2) & 0xff) << 16) | ((arr(p + 3) & 0xff) << 24)
      in.advanceSpan(4)
      java.lang.Float.intBitsToFloat(bits)
    } else readFloat(in: InputStream)
  }

  def writeDouble(out: OutputStream, d: Double): Unit = {
    var bits = java.lang.Double.doubleToLongBits(d)
    var i = 0
    while (i < 8) {
      out.write((bits & 0xff).toInt)
      bits >>>= 8
      i += 1
    }
  }

  def writeDouble(out: OutStream, d: Double): Unit = {
    val p = out.reserve(8)
    val buf = out.buffer
    var bits = java.lang.Double.doubleToLongBits(d)
    var i = 0
    while (i < 8) {
      buf(p + i) = bits.toByte
      bits >>>= 8
      i += 1
    }
    out.advance(8)
  }

  def readDouble(in: InputStream): Double = {
    var bits = 0L
    var i = 0
    while (i < 8) {
      val b = in.read()
      if (b == -1) throw new EOFException("EOF mid-double")
      bits |= (b & 0xffL) << (i * 8)
      i += 1
    }
    java.lang.Double.longBitsToDouble(bits)
  }

  def readDouble(in: InStream): Double = {
    if (in.ensureSpan() >= 8) {
      val arr = in.spanArray
      val p = in.spanOffset
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (arr(p + i) & 0xffL) << (i * 8); i += 1 }
      in.advanceSpan(8)
      java.lang.Double.longBitsToDouble(bits)
    } else readDouble(in: InputStream)
  }

  // ---- fixed-width (vints-off) long serde, reference useVInts=false ----
  def writeLongLE(out: OutputStream, v: Long): Unit = {
    var bits = v
    var i = 0
    while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
  }

  def writeLongLE(out: OutStream, v: Long): Unit = {
    val p = out.reserve(8)
    val buf = out.buffer
    var bits = v
    var i = 0
    while (i < 8) { buf(p + i) = bits.toByte; bits >>>= 8; i += 1 }
    out.advance(8)
  }

  def readLongLE(in: InputStream): Long = {
    var bits = 0L
    var i = 0
    while (i < 8) {
      val b = in.read()
      if (b == -1) throw new EOFException("EOF mid-long")
      bits |= (b & 0xffL) << (i * 8)
      i += 1
    }
    bits
  }

  def readLongLE(in: InStream): Long = {
    if (in.ensureSpan() >= 8) {
      val arr = in.spanArray
      val p = in.spanOffset
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (arr(p + i) & 0xffL) << (i * 8); i += 1 }
      in.advanceSpan(8)
      bits
    } else readLongLE(in: InputStream)
  }

  // ---- fixed-width helpers for metadata ----
  def writeIntLE(out: OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  def readIntLE(in: InputStream): Int = {
    var bits = 0
    var i = 0
    while (i < 4) {
      val b = in.read()
      if (b == -1) throw new EOFException("EOF mid-int")
      bits |= b << (i * 8)
      i += 1
    }
    bits
  }
}
