package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic fake media container ("GIMG"): 13-byte header
  * (magic 4B | width 4B LE | height 4B LE | channels 1B) + payload bytes.
  * Stands in for real image/video bytes — the container has no codecs
  * (build brief: stub the decode, keep the plumbing real).
  */
object FakeImage {
  val Magic: Array[Byte] = "GIMG".getBytes("UTF-8")
  val HeaderBytes: Int = 13

  def build(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val width = 64 + payload.length % 512
    val height = 64 + (payload.length * 7) % 512
    val channels = (1 + docId % 3).toInt
    val out = new Array[Byte](HeaderBytes + payload.length)
    System.arraycopy(Magic, 0, out, 0, 4)
    writeIntLE(out, 4, width)
    writeIntLE(out, 8, height)
    out(12) = channels.toByte
    System.arraycopy(payload, 0, out, HeaderBytes, payload.length)
    out
  }

  private def writeIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
}

final case class ImageRecord(doc_id: Long, image: Array[Byte])

final case class ImageMeta(
    doc_id: Long, width: Int, height: Int, channels: Int,
    width_bucket: Int, n_bytes: Long, payload_md5: String)

final case class FrameSample(
    doc_id: Long, n_frames: Long, first_frame_md5: String)

final case class ResizedImage(
    doc_id: Long, image: Array[Byte], new_width: Int, new_height: Int,
    resized_bytes: Long)

/** Deterministic fake audio container ("GAUD"): 14-byte header
  * (magic 4B | sample_rate 4B LE | n_samples 4B LE | channels 1B |
  * reserved 1B) + one payload byte per sample. Payload bytes are a pure
  * function of (doc_id, i) — `(doc_id * 31 + i * 7) mod 256` — so the
  * DuckDB oracle can recompute frame energies arithmetically while the
  * Spark side computes them from the ACTUAL binary column, independently
  * validating the byte plumbing end to end.
  */
object FakeAudio {
  val Magic: Array[Byte] = "GAUD".getBytes("UTF-8")
  val HeaderBytes: Int = 14

  def sampleRate(docId: Long): Int = 8000 + (docId % 3).toInt * 4000
  def nSamples(docId: Long): Int = 1000 + (docId % 17).toInt * 100
  def channels(docId: Long): Int = 1 + (docId % 2).toInt
  def sampleByte(docId: Long, i: Int): Int = ((docId * 31 + i.toLong * 7) % 256).toInt

  def build(docId: Long): Array[Byte] = {
    val n = nSamples(docId)
    val out = new Array[Byte](HeaderBytes + n)
    System.arraycopy(Magic, 0, out, 0, 4)
    val sr = sampleRate(docId)
    out(4) = (sr & 0xff).toByte
    out(5) = ((sr >> 8) & 0xff).toByte
    out(6) = ((sr >> 16) & 0xff).toByte
    out(7) = ((sr >> 24) & 0xff).toByte
    out(8) = (n & 0xff).toByte
    out(9) = ((n >> 8) & 0xff).toByte
    out(10) = ((n >> 16) & 0xff).toByte
    out(11) = ((n >> 24) & 0xff).toByte
    out(12) = channels(docId).toByte
    out(13) = 0
    var i = 0
    while (i < n) { out(HeaderBytes + i) = sampleByte(docId, i).toByte; i += 1 }
    out
  }
}

final case class AudioRecord(doc_id: Long, audio: Array[Byte])

final case class AudioFrame(
    doc_id: Long, sample_rate: Int, frame_idx: Long, frame_len: Long,
    energy: Long)

/** Multimodal column operators. Batch shape: `mapPartitions` over typed
  * Datasets — one decoder instance per partition, streaming through the
  * rows (the Scala analog of a Pandas-UDF `mapInPandas` batch), which is
  * exactly how a real codec (JNI, native buffers) wants to be driven at
  * 100 TB: per-partition setup cost amortized, no per-row UDF overhead.
  */
object Multimodal {

  /** Encode step: documents → (doc_id, binary audio). */
  def toFakeAudio(documents: DataFrame): Dataset[AudioRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long]
      .mapPartitions(_.map(id => AudioRecord(id, FakeAudio.build(id))))
  }

  /** Decode-stub + windowed feature extraction: parses the GAUD header
    * and emits per-frame energy (sum of squared sample bytes over a
    * `window`-sample frame). Swap the body for a real PCM decode + DSP
    * kernel; the signature, schema, batch shape and partitioning stay.
    */
  def audioFrameEnergy(audio: Dataset[AudioRecord], window: Int): Dataset[AudioFrame] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions { it =>
      it.flatMap { rec =>
        val b = rec.audio
        require(b.length >= FakeAudio.HeaderBytes &&
          java.util.Arrays.equals(
            java.util.Arrays.copyOf(b, 4), FakeAudio.Magic),
          s"doc ${rec.doc_id}: not a GAUD container")
        val sr = FakeImage.readIntLE(b, 4)
        val n = FakeImage.readIntLE(b, 8)
        val nFrames = (n + window - 1) / window
        (0 until nFrames).iterator.map { f =>
          val start = f * window
          val len = math.min(window, n - start)
          var e = 0L
          var i = 0
          while (i < len) {
            val v = b(FakeAudio.HeaderBytes + start + i) & 0xff
            e += v.toLong * v
            i += 1
          }
          AudioFrame(rec.doc_id, sr, f.toLong, len.toLong, e)
        }
      }
    }
  }

  /** Encode step: documents → (doc_id, binary image). Deterministic fake
    * payload = utf8(text).
    */
  def toFakeImages(documents: DataFrame): Dataset[ImageRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        ImageRecord(id, FakeImage.build(id, text.getBytes("UTF-8")))
      })
  }

  /** Decode-stub + metadata extraction: parses the GIMG header and hashes
    * the payload. Swap the body for a real image decode; the signature,
    * schema and partitioning stay.
    */
  def extractMeta(images: Dataset[ImageRecord]): Dataset[ImageMeta] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { rec =>
        val b = rec.image
        require(b.length >= FakeImage.HeaderBytes &&
          java.util.Arrays.equals(
            java.util.Arrays.copyOfRange(b, 0, 4), FakeImage.Magic),
          s"doc ${rec.doc_id}: not a GIMG container")
        val width = FakeImage.readIntLE(b, 4)
        val height = FakeImage.readIntLE(b, 8)
        val channels = b(12).toInt
        md.reset()
        md.update(b, FakeImage.HeaderBytes, b.length - FakeImage.HeaderBytes)
        val hex = md.digest().map("%02x".format(_)).mkString
        ImageMeta(rec.doc_id, width, height, channels,
          width / 128, b.length.toLong, hex)
      }
    }
  }

  /** Resize stub: keeps every `factor`-th payload byte and halves the
    * header dimensions — a stand-in for a real downscale kernel with the
    * same binary-in/binary-out plumbing (batch per partition, new
    * container re-emitted so stages compose).
    */
  def resize(images: Dataset[ImageRecord], factor: Int): Dataset[ResizedImage] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions(_.map { rec =>
      val b = rec.image
      val payloadLen = b.length - FakeImage.HeaderBytes
      val newLen = (payloadLen + factor - 1) / factor
      val width = FakeImage.readIntLE(b, 4) / 2
      val height = FakeImage.readIntLE(b, 8) / 2
      val out = new Array[Byte](FakeImage.HeaderBytes + newLen)
      System.arraycopy(b, 0, out, 0, FakeImage.HeaderBytes)
      var i = 0
      while (i < newLen) {
        out(FakeImage.HeaderBytes + i) = b(FakeImage.HeaderBytes + i * factor)
        i += 1
      }
      ResizedImage(rec.doc_id, out, width, height, out.length.toLong)
    })
  }

  /** Frame sampling stub: payload split into fixed-size frames; returns
    * the frame count + a hash of frame 0 (decoded as text to stay
    * byte/char agnostic for the oracle).
    */
  def sampleFrames(images: Dataset[ImageRecord], frameSize: Int): Dataset[FrameSample] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { rec =>
        val payloadLen = rec.image.length - FakeImage.HeaderBytes
        val nFrames = (payloadLen + frameSize - 1) / frameSize
        val text = new String(rec.image, FakeImage.HeaderBytes, payloadLen, "UTF-8")
        val frame0 = text.substring(0, math.min(frameSize, text.length))
        md.reset()
        val hex = md.digest(frame0.getBytes("UTF-8")).map("%02x".format(_)).mkString
        FrameSample(rec.doc_id, nFrames.toLong, hex)
      }
    }
  }
}
