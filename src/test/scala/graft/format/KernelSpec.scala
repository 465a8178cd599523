package graft.format

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.util.Random

/** Round-trip + seek tests for the format kernels, mirroring the
  * reference's TestBitFieldReader / TestRunLength* / TestInStream /
  * TestSerializationUtils coverage (SURVEY §5.1) plus ScalaCheck
  * properties the reference lacks.
  */
class KernelSpec extends AnyFunSuite {

  /** Deterministic stand-in for scalatestplus's forAll (not in the offline
    * cache): sample the generator across fixed seeds.
    */
  private def forSamples[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default.withSize(i % 100 + 1), Seed(i.toLong))
        .foreach(check)
    }

  private val codecs: Seq[(String, Option[CompressionCodec])] = Seq(
    "none" -> None,
    "zlib" -> Some(new ZlibCodec(4)),
    "snappy" -> Some(SnappyCodec),
    "zstd" -> Some(ZstdCodec),
    "lz4" -> Some(Lz4Codec),
    "lzo" -> Some(LzoCodec))

  test("vint round trip incl. edge values") {
    val values = Seq(0L, 1L, -1L, 127L, 128L, -128L, Long.MaxValue, Long.MinValue,
      1L << 62, -(1L << 62), 123456789L)
    val bos = new java.io.ByteArrayOutputStream()
    values.foreach(Serialization.writeVslong(bos, _))
    values.foreach(v => Serialization.writeVulong(bos, v))
    val in = new java.io.ByteArrayInputStream(bos.toByteArray)
    values.foreach(v => assert(Serialization.readVslong(in) == v))
    values.foreach(v => assert(Serialization.readVulong(in) == v))
  }

  test("float/double round trip") {
    val bos = new java.io.ByteArrayOutputStream()
    val fs = Seq(0f, -0f, 1.5f, Float.MinValue, Float.MaxValue, Float.NaN)
    val ds = Seq(0d, -0d, 2.75, Double.MinValue, Double.MaxValue, Double.NaN)
    fs.foreach(Serialization.writeFloat(bos, _))
    ds.foreach(Serialization.writeDouble(bos, _))
    val in = new java.io.ByteArrayInputStream(bos.toByteArray)
    fs.foreach { f =>
      val r = Serialization.readFloat(in)
      assert(java.lang.Float.floatToIntBits(r) == java.lang.Float.floatToIntBits(f))
    }
    ds.foreach { d =>
      val r = Serialization.readDouble(in)
      assert(java.lang.Double.doubleToLongBits(r) == java.lang.Double.doubleToLongBits(d))
    }
  }

  for ((cname, codec) <- codecs) {
    test(s"out/in stream round trip [$cname]") {
      val out = new OutStream("t", 1024, codec)
      val rnd = new Random(42)
      val data = new Array[Byte](50000)
      rnd.nextBytes(data)
      // half random (incompressible), half runs (compressible)
      java.util.Arrays.fill(data, 25000, 50000, 7.toByte)
      out.write(data, 0, data.length)
      val onDisk = out.finish()
      val in = InStream("t", onDisk, codec, 1024)
      val back = new Array[Byte](data.length)
      var got = 0
      while (got < back.length) {
        val n = in.read(back, got, back.length - got)
        assert(n > 0)
        got += n
      }
      assert(in.read() == -1)
      assert(java.util.Arrays.equals(back, data))
    }

    test(s"stream position/seek across chunks [$cname]") {
      val out = new OutStream("t", 256, codec)
      val positions = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      val n = 2000
      val data = (0 until n).map(i => (i % 251).toByte).toArray
      for (i <- 0 until n) {
        if (i % 100 == 0) {
          val rec = new PositionsBuilder
          out.getPosition(rec)
          positions += rec.result()
        }
        out.write(data(i))
      }
      val onDisk = out.finish()
      // seek to each recorded position and check the next byte
      for ((pos, k) <- positions.zipWithIndex) {
        val in = InStream("t", onDisk, codec, 256)
        in.seek(new ArrayPositionProvider(pos))
        assert(in.read() == (data(k * 100) & 0xff), s"at marker $k")
      }
    }
  }

  test("byte RLE round trip: runs, literals, alternating") {
    val patterns = Seq[Array[Byte]](
      Array.fill(1000)(5.toByte),
      (0 until 1000).map(i => (i % 256).toByte).toArray,
      (0 until 1000).map(i => if (i / 7 % 2 == 0) 3.toByte else (i % 100).toByte).toArray,
      Array[Byte](),
      Array[Byte](1),
      Array[Byte](1, 1),
      (0 until 131).map(_ => 9.toByte).toArray)
    for (p <- patterns; (cname, codec) <- codecs.take(2)) {
      val out = new OutStream("t", 512, codec)
      val w = new RunLengthByteWriter(out)
      p.foreach(w.write)
      w.flush()
      val r = new RunLengthByteReader(InStream("t", out.finish(), codec, 512))
      p.foreach(v => assert(r.next() == v))
    }
  }

  test("int RLE round trip: property") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.choose(-10L, 10L),
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.const(42L)))
    forSamples(gen) { (values: List[Long]) =>
      for (signed <- Seq(true, false)) {
        val vs = if (signed) values else values.map(_.abs)
        val out = new OutStream("t", 512, None)
        val w = new RunLengthIntegerWriter(out, signed)
        vs.foreach(w.write)
        w.flush()
        val r = new RunLengthIntegerReader(InStream("t", out.finish(), None), signed)
        vs.foreach(v => assert(r.next() == v))
      }
    }
  }

  test("int RLE bulk decode equals per-value decode across chunk shapes") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.choose(-10L, 10L),
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.const(42L)))
    forSamples(gen) { (values: List[Long]) =>
      val vs = values.toArray
      val out = new OutStream("t", 128, Some(new ZlibCodec(4)))
      val w = new RunLengthIntegerWriter(out, signed = true)
      vs.foreach(w.write)
      w.flush()
      // decode in irregular chunk sizes: bulk spans must stitch across
      // runs, literal groups, and compressed-chunk boundaries
      val r = new RunLengthIntegerReader(
        InStream("t", out.finish(), Some(new ZlibCodec(4)), 128), signed = true)
      val got = new Array[Long](vs.length)
      var off = 0
      var step = 1
      while (off < vs.length) {
        val take = math.min(step, vs.length - off)
        r.nextLongs(got, off, take)
        off += take
        step = step * 2 + 1
      }
      assert(got.toSeq == vs.toSeq)
    }
  }

  test("byte RLE bulk decode equals per-value decode") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.choose(-3, 3).map(_.toByte), Gen.choose(-128, 127).map(_.toByte)))
    forSamples(gen) { (values: List[Byte]) =>
      val vs = values.toArray
      val out = new OutStream("t", 512, None)
      val w = new RunLengthByteWriter(out)
      vs.foreach(w.write)
      w.flush()
      val r = new RunLengthByteReader(InStream("t", out.finish(), None))
      val got = new Array[Byte](vs.length)
      var off = 0
      var step = 1
      while (off < vs.length) {
        val take = math.min(step, vs.length - off)
        r.nextBytes(got, off, take)
        off += take
        step = step * 2 + 1
      }
      assert(got.toSeq == vs.toSeq)
    }
  }

  test("bitfield bulk decode equals per-bit decode at unaligned spans") {
    val gen = Gen.listOf(Gen.oneOf(Gen.const(true), Gen.const(false),
      Gen.const(true))) // bias creates runs and literals both
    forSamples(gen) { (values: List[Boolean]) =>
      val vs = values.toArray
      val out = new OutStream("t", 512, None)
      val w = new BitFieldWriter(out)
      vs.foreach(w.write)
      w.flush()
      val r = new BitFieldReader(InStream("t", out.finish(), None))
      val got = new Array[Boolean](vs.length)
      var off = 0
      var step = 3 // deliberately byte-misaligned spans
      while (off < vs.length) {
        val take = math.min(step, vs.length - off)
        r.nextBits(got, off, take)
        off += take
        step += 2
      }
      assert(got.toSeq == vs.toSeq)
    }
  }

  test("int RLE: delta runs encode compactly") {
    val out = new OutStream("t", 1 << 16, None)
    val w = new RunLengthIntegerWriter(out, true)
    (0 until 10000).foreach(i => w.write(i.toLong)) // delta=1 runs
    w.flush()
    val size = out.finish().length
    assert(size < 400, s"10k sequential ints took $size bytes")
  }

  test("int RLE seek at every marker") {
    val rnd = new Random(7)
    val n = 4096
    val values = Array.fill(n)(if (rnd.nextBoolean()) rnd.nextLong() else rnd.nextInt(5).toLong)
    for ((cname, codec) <- codecs) {
      val out = new OutStream("t", 300, codec)
      val w = new RunLengthIntegerWriter(out, true)
      val marks = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      for (i <- 0 until n) {
        if (i % 64 == 0) {
          val rec = new PositionsBuilder
          w.getPosition(rec)
          marks += rec.result()
        }
        w.write(values(i))
      }
      w.flush()
      val onDisk = out.finish()
      for ((m, k) <- marks.zipWithIndex) {
        val r = new RunLengthIntegerReader(InStream("t", onDisk, codec, 300), true)
        r.seek(new ArrayPositionProvider(m))
        var i = k * 64
        while (i < math.min(n, k * 64 + 10)) {
          assert(r.next() == values(i), s"[$cname] marker $k value $i")
          i += 1
        }
      }
    }
  }

  test("bitfield round trip + skip") {
    val rnd = new Random(3)
    val n = 10000
    val bits = Array.fill(n)(rnd.nextBoolean())
    val out = new OutStream("t", 512, Some(new ZlibCodec(4)))
    val w = new BitFieldWriter(out)
    bits.foreach(w.write)
    w.flush()
    val onDisk = out.finish()
    val r = new BitFieldReader(InStream("t", onDisk, Some(new ZlibCodec(4)), 512))
    bits.foreach(b => assert(r.next() == b))
    // skip pattern: read every 3rd
    val r2 = new BitFieldReader(InStream("t", onDisk, Some(new ZlibCodec(4)), 512))
    var i = 0
    while (i < n) {
      assert(r2.next() == bits(i))
      r2.skip(math.min(2, n - i - 1))
      i += 3
    }
  }

  test("bitfield seek at markers") {
    val rnd = new Random(11)
    val n = 2048
    val bits = Array.fill(n)(rnd.nextBoolean())
    val out = new OutStream("t", 128, Some(SnappyCodec))
    val w = new BitFieldWriter(out)
    val marks = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    for (i <- 0 until n) {
      if (i % 100 == 0) {
        val rec = new PositionsBuilder
        w.getPosition(rec)
        marks += rec.result()
      }
      w.write(bits(i))
    }
    w.flush()
    val onDisk = out.finish()
    for ((m, k) <- marks.zipWithIndex) {
      val r = new BitFieldReader(InStream("t", onDisk, Some(SnappyCodec), 128))
      r.seek(new ArrayPositionProvider(m))
      assert(r.next() == bits(k * 100), s"marker $k")
    }
  }

  test("zlib codec: incompressible returns None, compressible shrinks") {
    val z = new ZlibCodec(4)
    val rnd = new Random(1)
    val noise = new Array[Byte](1000)
    rnd.nextBytes(noise)
    assert(z.compress(noise, 0, noise.length).isEmpty)
    val runs = Array.fill[Byte](1000)(1)
    val c = z.compress(runs, 0, runs.length)
    assert(c.isDefined && c.get.length < 100)
    assert(java.util.Arrays.equals(z.decompress(c.get, 0, c.get.length, 1000), runs))
  }
}
