package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface: the same events rollup computed as a
  * STREAM — file source → event-time window aggregation with a watermark
  * → available-now trigger draining the backlog to a memory sink. On a
  * cluster this exact plan runs continuously against arriving files with
  * bounded state (the watermark expires old windows); the available-now
  * run here makes it deterministic and oracle-checkable against the batch
  * answer (stream-batch parity).
  */
object StreamingQueries extends QueryPack {

  private def eventsWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
    val name = s"ev_stream_${Integer.toHexString(dir.hashCode)}"
    // the file stream source requires a directory: stage a symlink dir
    // (in production this IS a directory files arrive into)
    val srcDir = java.nio.file.Paths.get(
      s"/root/repo/target/stream-src-${Integer.toHexString(dir.hashCode)}")
    java.nio.file.Files.createDirectories(srcDir)
    val link = srcDir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = s.readStream.schema(rawSchema).parquet(srcDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        expr(dsum("value")).as("total_value"))
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
      .select($"window.start".as("day_ts"), $"event_type", $"n_events", $"total_value")
      .orderBy($"day_ts", $"event_type")
  }

  private val eventsWindowOracle = s"""
    |SELECT date_trunc('day', ts) AS day_ts, event_type,
    |  COUNT(*) AS n_events,
    |  ${dsumStatic("value")} AS total_value
    |FROM events
    |GROUP BY date_trunc('day', ts), event_type
    |ORDER BY day_ts, event_type
    |""".stripMargin.trim

  private def dsumStatic(e: String): String =
    s"CAST(ROUND(SUM(CAST(($e) AS DECIMAL(18,6))), 2) AS DOUBLE)"

  override val all: Seq[Q] = Seq(
    Q("stream_events_window", eventsWindow, Some(eventsWindowOracle)),
  )
}
