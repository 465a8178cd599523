package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dwrf.TestSpark

/** The driver has regenerated `events.parquet` across testdata
  * generations with two different physical types for `ts`:
  *   - int64 TIMESTAMP(NANOS), which Spark reads as BIGINT nanos under
  *     `spark.sql.legacy.parquet.nanosAsLong` (rounds ≤ 8), and
  *   - plain timestamp[us] (no timezone), which Spark reads as
  *     TIMESTAMP_NTZ (round 10 onward).
  * Round 9 lost 43 of 92 correctness rows because the loader assumed the
  * first generation. This spec pins the contract: whatever the file
  * carries, [[Tables.load]] serves one canonical session-TZ TimestampType
  * `ts` with identical instants.
  */
class TablesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // one row at a known instant: 2024-01-15 12:30:45.123456 UTC
  private val us = 1705321845123456L

  private def freshDir(): String = {
    val d = Files.createTempDirectory("tables-spec-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def loadedTs(sfDir: String): (DataType, Long) = {
    val df = Tables.load(spark, sfDir, "events")
    val dt = df.schema("ts").dataType
    val got = df.select(unix_micros(col("ts"))).head().getLong(0)
    (dt, got)
  }

  test("legacy generation: int64 nanos ts normalizes to TimestampType") {
    val s = spark
    import s.implicits._
    val dir = freshDir()
    Seq((1L, us * 1000L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, got) = loadedTs(dir)
    assert(dt === TimestampType)
    assert(got === us)
  }

  test("current generation: timestamp[us] NTZ ts normalizes to TimestampType") {
    val s = spark
    import s.implicits._
    val dir = freshDir()
    Seq((1L, us, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_micros(col("ts_us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    // confirm the fixture really round-trips as NTZ before testing load
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType === TimestampNTZType)
    val (dt, got) = loadedTs(dir)
    assert(dt === TimestampType)
    assert(got === us)
  }

  test("driver testdata loads with a TimestampType ts at every sf") {
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val df = Tables.load(spark, s"/root/testdata/$sf", "events")
      assert(df.schema("ts").dataType === TimestampType, sf)
      assert(df.limit(1).count() === 1L, sf)
    }
  }
}
