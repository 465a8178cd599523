package graft.format

import java.io.EOFException

/** RLE v1 constants (reference RunLengthConstants.java:4-13): repeated runs
  * of 3..130 values, literal groups of up to 128, integer runs may carry a
  * per-step delta in [-128, 127].
  */
object RunLength {
  val MinRepeat = 3
  val MaxRepeat = 130
  val MaxLiteral = 128
  val MinDelta: Long = -128
  val MaxDelta: Long = 127
}

/** Byte-valued RLE v1 (reference RunLengthByteWriter.java:45-133):
  * control byte in [0,127] => (control+3) repeats of the next byte;
  * control in [-128,-1] => that many literal bytes follow.
  */
final class RunLengthByteWriter(out: OutStream) {
  import RunLength._
  private val literals = new Array[Byte](MaxLiteral)
  private var numLiterals = 0
  private var repeat = false
  private var tailRunLength = 0

  private def writeValues(): Unit = {
    if (numLiterals != 0) {
      if (repeat) {
        out.write(numLiterals - MinRepeat)
        out.write(literals(0).toInt & 0xff)
      } else {
        out.write(-numLiterals & 0xff)
        out.write(literals, 0, numLiterals)
      }
      repeat = false
      numLiterals = 0
      tailRunLength = 0
    }
  }

  def write(value: Byte): Unit = {
    if (numLiterals == 0) {
      literals(0) = value; numLiterals = 1; tailRunLength = 1
    } else if (repeat) {
      if (value == literals(0) && numLiterals < MaxRepeat) numLiterals += 1
      else { writeValues(); literals(0) = value; numLiterals = 1; tailRunLength = 1 }
    } else {
      if (value == literals(numLiterals - 1)) tailRunLength += 1
      else tailRunLength = 1
      if (tailRunLength == MinRepeat) {
        if (numLiterals + 1 == MinRepeat) {
          repeat = true; numLiterals += 1
        } else {
          numLiterals -= (MinRepeat - 1)
          writeValues()
          literals(0) = value
          repeat = true
          numLiterals = MinRepeat
        }
      } else {
        literals(numLiterals) = value
        numLiterals += 1
        if (numLiterals == MaxLiteral) writeValues()
      }
    }
  }

  def flush(): Unit = writeValues()

  def getPosition(recorder: PositionRecorder): Unit = {
    out.getPosition(recorder)
    recorder.addPosition(numLiterals.toLong)
  }
}

final class RunLengthByteReader(in: InStream) {
  import RunLength._
  private val literals = new Array[Byte](MaxLiteral)
  private var numLiterals = 0
  private var used = 0
  private var repeat = false

  private def readValues(): Unit = {
    val control = in.read()
    if (control == -1) throw new EOFException("EOF in byte RLE")
    used = 0
    if (control < 0x80) {
      repeat = true
      numLiterals = control + MinRepeat
      val b = in.read()
      if (b == -1) throw new EOFException("EOF in byte RLE literal")
      literals(0) = b.toByte
    } else {
      repeat = false
      numLiterals = 0x100 - control
      var got = 0
      while (got < numLiterals) {
        val n = in.read(literals, got, numLiterals - got)
        if (n < 0) throw new EOFException("EOF in byte RLE literals")
        got += n
      }
    }
  }

  def next(): Byte = {
    if (used == numLiterals) readValues()
    val v = if (repeat) literals(0) else literals(used)
    used += 1
    v
  }

  /** Bulk decode `n` bytes into dst[off, off+n): per-RUN fills. */
  def nextBytes(dst: Array[Byte], off: Int, n: Int): Unit = {
    var o = off
    var rem = n
    while (rem > 0) {
      if (used == numLiterals) readValues()
      val take = math.min(rem, numLiterals - used)
      if (repeat) java.util.Arrays.fill(dst, o, o + take, literals(0))
      else System.arraycopy(literals, used, dst, o, take)
      used += take; o += take; rem -= take
    }
  }

  def skip(n: Long): Unit = {
    var items = n
    while (items > 0) {
      if (used == numLiterals) readValues()
      val consume = math.min(items, (numLiterals - used).toLong)
      used += consume.toInt
      items -= consume
    }
  }

  def seek(positions: PositionProvider): Unit = {
    in.seek(positions)
    numLiterals = 0; used = 0
    skip(positions.next())
  }
}

/** Integer RLE v1 with delta runs (reference RunLengthIntegerWriter.java:
  * 30-151): runs of 3..130 values stepping by a constant delta in
  * [-128,127], base value varint-encoded (zigzag when signed).
  */
final class RunLengthIntegerWriter(out: OutStream, signed: Boolean,
    useVInts: Boolean = true) {
  import RunLength._
  private val literals = new Array[Long](MaxLiteral)
  private var numLiterals = 0
  private var repeat = false
  private var tailRunLength = 0
  private var delta = 0L

  private def writeValue(v: Long): Unit =
    if (!useVInts) Serialization.writeLongLE(out, v)
    else if (signed) Serialization.writeVslong(out, v)
    else Serialization.writeVulong(out, v)

  private def writeValues(): Unit = {
    if (numLiterals != 0) {
      if (repeat) {
        out.write(numLiterals - MinRepeat)
        out.write(delta.toInt & 0xff)
        writeValue(literals(0))
      } else {
        out.write(-numLiterals & 0xff)
        var i = 0
        while (i < numLiterals) { writeValue(literals(i)); i += 1 }
      }
      repeat = false
      numLiterals = 0
      tailRunLength = 0
    }
  }

  def write(value: Long): Unit = {
    if (numLiterals == 0) {
      literals(0) = value; numLiterals = 1; tailRunLength = 1
    } else if (repeat) {
      if (value == literals(0) + delta * numLiterals && numLiterals < MaxRepeat) {
        numLiterals += 1
      } else {
        writeValues()
        literals(0) = value; numLiterals = 1; tailRunLength = 1
      }
    } else {
      if (tailRunLength == 1) {
        delta = value - literals(numLiterals - 1)
        tailRunLength = if (delta < MinDelta || delta > MaxDelta) 1 else 2
      } else if (value == literals(numLiterals - 1) + delta) {
        tailRunLength += 1
      } else {
        delta = value - literals(numLiterals - 1)
        tailRunLength = if (delta < MinDelta || delta > MaxDelta) 1 else 2
      }
      if (tailRunLength == MinRepeat) {
        if (numLiterals + 1 == MinRepeat) {
          repeat = true
          numLiterals += 1
        } else {
          // ship everything before the trailing (MinRepeat-1) values as
          // literals, then restart as a run
          numLiterals -= (MinRepeat - 1)
          val base = literals(numLiterals)
          writeValues()
          literals(0) = base
          repeat = true
          numLiterals = MinRepeat
        }
      } else {
        literals(numLiterals) = value
        numLiterals += 1
        if (numLiterals == MaxLiteral) writeValues()
      }
    }
  }

  def flush(): Unit = writeValues()

  def getPosition(recorder: PositionRecorder): Unit = {
    out.getPosition(recorder)
    recorder.addPosition(numLiterals.toLong)
  }
}

final class RunLengthIntegerReader(in: InStream, signed: Boolean,
    useVInts: Boolean = true) {
  import RunLength._
  private val literals = new Array[Long](MaxLiteral)
  private var numLiterals = 0
  private var used = 0
  private var repeat = false
  private var delta = 0L

  private def readValue(): Long =
    if (!useVInts) Serialization.readLongLE(in)
    else if (signed) Serialization.readVslong(in)
    else Serialization.readVulong(in)

  private def readValues(): Unit = {
    val control = in.read()
    if (control == -1) throw new EOFException("EOF in int RLE")
    used = 0
    if (control < 0x80) {
      repeat = true
      numLiterals = control + MinRepeat
      delta = in.read() match {
        case -1 => throw new EOFException("EOF in int RLE delta")
        case d => d.toByte.toLong // sign-extend
      }
      literals(0) = readValue()
    } else {
      repeat = false
      numLiterals = 0x100 - control
      var i = 0
      while (i < numLiterals) { literals(i) = readValue(); i += 1 }
    }
  }

  def next(): Long = {
    if (used == numLiterals) readValues()
    val v = if (repeat) literals(0) + used * delta else literals(used)
    used += 1
    v
  }

  /** Bulk decode `n` values into dst[off, off+n): per-RUN loops instead of
    * per-value calls — the vectorized scan's hot path. */
  def nextLongs(dst: Array[Long], off: Int, n: Int): Unit = {
    var o = off
    var rem = n
    while (rem > 0) {
      if (used == numLiterals) readValues()
      val take = math.min(rem, numLiterals - used)
      if (repeat) {
        val base = literals(0) + used * delta
        var i = 0
        while (i < take) { dst(o + i) = base + i * delta; i += 1 }
      } else {
        System.arraycopy(literals, used, dst, o, take)
      }
      used += take; o += take; rem -= take
    }
  }

  def skip(n: Long): Unit = {
    var items = n
    while (items > 0) {
      if (used == numLiterals) readValues()
      val consume = math.min(items, (numLiterals - used).toLong)
      used += consume.toInt
      items -= consume
    }
  }

  def seek(positions: PositionProvider): Unit = {
    in.seek(positions)
    numLiterals = 0; used = 0
    skip(positions.next())
  }
}

/** 1-bit-per-value stream over byte RLE (reference BitFieldWriter/Reader);
  * backs BOOLEAN columns, PRESENT streams and IN_DICTIONARY streams.
  * Bits pack MSB-first.
  */
final class BitFieldWriter(out: OutStream) {
  private val byteWriter = new RunLengthByteWriter(out)
  private var current = 0
  private var bitsLeft = 8

  def write(bit: Boolean): Unit = {
    current = (current << 1) | (if (bit) 1 else 0)
    bitsLeft -= 1
    if (bitsLeft == 0) {
      byteWriter.write(current.toByte)
      current = 0
      bitsLeft = 8
    }
  }

  def flush(): Unit = {
    if (bitsLeft != 8) {
      byteWriter.write((current << bitsLeft).toByte)
      current = 0
      bitsLeft = 8
    }
    byteWriter.flush()
  }

  def getPosition(recorder: PositionRecorder): Unit = {
    byteWriter.getPosition(recorder)
    recorder.addPosition((8 - bitsLeft).toLong)
  }
}

final class BitFieldReader(in: InStream) {
  private val byteReader = new RunLengthByteReader(in)
  private var current = 0
  private var bitsLeft = 0

  def next(): Boolean = {
    if (bitsLeft == 0) {
      current = byteReader.next() & 0xff
      bitsLeft = 8
    }
    bitsLeft -= 1
    ((current >>> bitsLeft) & 1) == 1
  }

  /** Bulk decode `n` bits into dst[off, off+n): whole bytes expand in one
    * step instead of a call per bit (PRESENT streams of nullable columns,
    * BOOLEAN data streams). */
  def nextBits(dst: Array[Boolean], off: Int, n: Int): Unit = {
    var o = off
    var rem = n
    while (rem > 0 && bitsLeft > 0) {
      bitsLeft -= 1
      dst(o) = ((current >>> bitsLeft) & 1) == 1
      o += 1; rem -= 1
    }
    while (rem >= 8) {
      val b = byteReader.next() & 0xff
      dst(o) = (b & 0x80) != 0
      dst(o + 1) = (b & 0x40) != 0
      dst(o + 2) = (b & 0x20) != 0
      dst(o + 3) = (b & 0x10) != 0
      dst(o + 4) = (b & 8) != 0
      dst(o + 5) = (b & 4) != 0
      dst(o + 6) = (b & 2) != 0
      dst(o + 7) = (b & 1) != 0
      o += 8; rem -= 8
    }
    if (rem > 0) {
      current = byteReader.next() & 0xff
      bitsLeft = 8
      while (rem > 0) {
        bitsLeft -= 1
        dst(o) = ((current >>> bitsLeft) & 1) == 1
        o += 1; rem -= 1
      }
    }
  }

  def skip(n: Long): Unit = {
    val fromCurrent = math.min(n, bitsLeft.toLong)
    bitsLeft -= fromCurrent.toInt
    var remaining = n - fromCurrent
    if (remaining > 0) {
      val bytes = remaining / 8
      byteReader.skip(bytes)
      remaining -= bytes * 8
      if (remaining > 0) {
        current = byteReader.next() & 0xff
        bitsLeft = 8 - remaining.toInt
      }
    }
  }

  def seek(positions: PositionProvider): Unit = {
    byteReader.seek(positions)
    val consumed = positions.next().toInt
    if (consumed > 0) {
      current = byteReader.next() & 0xff
      bitsLeft = 8 - consumed
    } else {
      current = 0
      bitsLeft = 0
    }
  }
}
