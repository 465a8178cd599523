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

  // ------------------------------------------------------ sessionize
  // Custom per-user session state via the typed KeyValueGroupedDataset
  // API (flatMapGroups — the batch twin of flatMapGroupsWithState, same
  // per-group imperative kernel a streaming deployment would keep in
  // state). 30-minute gap rule; oracle = lag/cumulative-sum window SQL.
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gapMicros = 30L * 60 * 1000000
    val evs = graft.Tables.load(s, dir, "events")
      .select($"user_id", expr("unix_micros(ts)").as("ts_us"), $"event_id")
      .as[(Long, Long, Long)]
    val sessions = evs.groupByKey(_._1).flatMapGroups { (uid, it) =>
      val sorted = it.toArray.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      var sessionId = 0L
      var start = 0L
      var end = 0L
      var n = 0L
      sorted.foreach { case (_, ts, _) =>
        if (n == 0 || ts - end > gapMicros) {
          if (n > 0) out += ((uid, sessionId, start, end, n))
          sessionId += 1
          start = ts
          n = 0
        }
        end = ts
        n += 1
      }
      if (n > 0) out += ((uid, sessionId, start, end, n))
      out.iterator
    }
    sessions.toDF("user_id", "session_id", "start_us", "end_us", "n_events")
      .select($"user_id", $"session_id",
        expr("timestamp_micros(start_us)").as("session_start"),
        expr("timestamp_micros(end_us)").as("session_end"),
        $"n_events")
      .orderBy($"user_id", $"session_id")
  }

  private val sessionizeOracle = """
    |WITH marked AS (
    |  SELECT user_id, ts, event_id,
    |    CASE WHEN lag(ts) OVER w IS NULL
    |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
    |      AS is_start
    |  FROM events
    |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    |sess AS (
    |  SELECT user_id, ts,
    |    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
    |                        ROWS UNBOUNDED PRECEDING) AS session_id
    |  FROM marked)
    |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
    |  MIN(ts) AS session_start, MAX(ts) AS session_end,
    |  COUNT(*) AS n_events
    |FROM sess
    |GROUP BY user_id, session_id
    |ORDER BY user_id, session_id
    |""".stripMargin.trim

  override val all: Seq[Q] = Seq(
    Q("stream_events_window", eventsWindow, Some(eventsWindowOracle)),
    Q("sessionize_events", sessionize, Some(sessionizeOracle)),
  )
}
