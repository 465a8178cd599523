package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{FakeImage, Multimodal}

/** Multimodal-column operators: media as opaque BINARY + typed metadata.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * deterministic STUB (a self-describing fake "GIMG" container built from
  * each document's bytes) — but the Spark-side plumbing is real: binary
  * columns, case-class Datasets, `mapPartitions` batch processing (the
  * Scala analog of mapInPandas), and schema'd metadata back out. Swap
  * `Multimodal.decodeStub` for a real codec and nothing else changes.
  */
object MultimodalQueries extends QueryPack {

  // --------------------------------------------------------- metadata
  private def meta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val images = Multimodal.toFakeImages(Tables.load(s, dir, "documents"))
    Multimodal.extractMeta(images)
      .groupBy($"channels", $"width_bucket")
      .agg(
        count(lit(1)).as("n_images"),
        expr("CAST(SUM(n_bytes) AS BIGINT)").as("total_bytes"),
        min($"width").cast("long").as("min_width"),
        max($"height").cast("long").as("max_height"))
      .orderBy($"channels", $"width_bucket")
  }

  // The oracle recomputes the stub's deterministic header fields straight
  // from the text (payload = utf8(text), width/height derived from byte
  // length exactly as FakeImage does).
  private val metaOracle = s"""
    |WITH img AS (
    |  SELECT doc_id,
    |    octet_length(encode(text)) AS payload,
    |    64 + octet_length(encode(text)) % 512 AS width,
    |    64 + (octet_length(encode(text)) * 7) % 512 AS height,
    |    1 + doc_id % 3 AS channels
    |  FROM documents)
    |SELECT channels, width // 128 AS width_bucket,
    |  COUNT(*) AS n_images,
    |  CAST(SUM(payload + ${FakeImage.HeaderBytes}) AS BIGINT) AS total_bytes,
    |  CAST(MIN(width) AS BIGINT) AS min_width,
    |  CAST(MAX(height) AS BIGINT) AS max_height
    |FROM img
    |GROUP BY channels, width // 128
    |ORDER BY channels, width_bucket
    |""".stripMargin.trim

  // ------------------------------------------------------------ audio
  // Windowed frame-energy features over a fake "GAUD" audio container
  // whose payload bytes are a pure function of (doc_id, sample index) —
  // the Spark side computes energies from the ACTUAL binary column
  // (mapPartitions decode stub), while the oracle recomputes them
  // arithmetically in SQL, independently validating the byte plumbing.
  private def audio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents").filter($"doc_id" < 40)
    Multimodal.audioFrameEnergy(Multimodal.toFakeAudio(docs), window = 256)
      .groupBy($"doc_id", $"sample_rate")
      .agg(
        count(lit(1)).as("n_frames"),
        sum($"energy").cast("bigint").as("total_energy"),
        max($"energy").as("max_frame_energy"),
        min($"frame_len").as("last_frame_len"))
      .orderBy($"doc_id")
  }

  private val audioOracle = """
    |WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 40),
    |samples AS (
    |  SELECT doc_id, CAST(t.i AS BIGINT) AS i,
    |    CAST((doc_id * 31 + CAST(t.i AS BIGINT) * 7) % 256 AS BIGINT) AS v
    |  FROM ids, unnest(range(0, 1000 + (doc_id % 17) * 100)) AS t(i)),
    |frames AS (
    |  SELECT doc_id, i // 256 AS frame_idx,
    |    CAST(SUM(v * v) AS BIGINT) AS fe, COUNT(*) AS flen
    |  FROM samples GROUP BY 1, 2)
    |SELECT doc_id, CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
    |  COUNT(*) AS n_frames,
    |  CAST(SUM(fe) AS BIGINT) AS total_energy,
    |  MAX(fe) AS max_frame_energy,
    |  MIN(flen) AS last_frame_len
    |FROM frames
    |GROUP BY doc_id
    |ORDER BY doc_id
    |""".stripMargin.trim

  // ----------------------------------------------------------- frames
  private def frames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val images = Multimodal.toFakeImages(Tables.load(s, dir, "documents"))
    Multimodal.sampleFrames(images, frameSize = 256)
      .groupBy($"n_frames")
      .agg(
        count(lit(1)).as("n_videos"),
        countDistinct($"first_frame_md5").as("distinct_first_frames"))
      .orderBy($"n_frames")
  }

  private val framesOracle = """
    |WITH f AS (
    |  SELECT doc_id,
    |    CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_frames,
    |    md5(substr(text, 1, 256)) AS first_frame_md5
    |  FROM documents)
    |SELECT n_frames, COUNT(*) AS n_videos,
    |  COUNT(DISTINCT first_frame_md5) AS distinct_first_frames
    |FROM f
    |GROUP BY n_frames
    |ORDER BY n_frames
    |""".stripMargin.trim

  // ----------------------------------------------------------- resize
  private def resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val images = Multimodal.toFakeImages(Tables.load(s, dir, "documents"))
    Multimodal.resize(images, factor = 4)
      .withColumn("even_width", ($"new_width" % 2) === 0)
      .groupBy($"even_width")
      .agg(
        count(lit(1)).as("n_images"),
        expr("CAST(SUM(resized_bytes) AS BIGINT)").as("total_bytes"),
        min($"new_width").cast("long").as("min_w"),
        max($"new_height").cast("long").as("max_h"))
      .orderBy("even_width")
  }

  private val resizeOracle = s"""
    |WITH img AS (
    |  SELECT doc_id,
    |    octet_length(encode(text)) AS payload,
    |    (64 + octet_length(encode(text)) % 512) // 2 AS new_width,
    |    (64 + (octet_length(encode(text)) * 7) % 512) // 2 AS new_height
    |  FROM documents)
    |SELECT new_width % 2 = 0 AS even_width, COUNT(*) AS n_images,
    |  CAST(SUM((payload + 3) // 4 + ${FakeImage.HeaderBytes}) AS BIGINT) AS total_bytes,
    |  CAST(MIN(new_width) AS BIGINT) AS min_w,
    |  CAST(MAX(new_height) AS BIGINT) AS max_h
    |FROM img
    |GROUP BY new_width % 2 = 0
    |ORDER BY even_width
    |""".stripMargin.trim

  override val all: Seq[Q] = Seq(
    Q("multimodal_meta", meta, Some(metaOracle)),
    Q("multimodal_audio", audio, Some(audioOracle)),
    Q("multimodal_frames", frames, Some(framesOracle)),
    Q("multimodal_resize", resize, Some(resizeOracle)),
  )
}
