package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface: the same events rollup computed as a
  * STREAM — file source → event-time window aggregation with a watermark
  * → available-now trigger draining to a FILE sink in APPEND mode. Append
  * mode means a window's state is emitted once the watermark passes its
  * end and then PURGED from the state store — state is bounded by the
  * watermark horizon, and nothing is materialized on the driver (the sink
  * is distributed files). On a cluster this exact plan runs continuously
  * against arriving files at 100 TB/day; the available-now run here makes
  * it deterministic and oracle-checkable against the batch answer
  * (stream-batch parity).
  *
  * Drain completeness: append mode only emits windows the watermark has
  * passed, so the run stages a far-future "watermark sentinel" row after
  * the real data; processing it advances the watermark beyond every real
  * window's end, flushing them all to the sink. The sentinel's own window
  * never closes (nothing follows it) so it never reaches the sink, and a
  * defensive filter drops it if it ever did.
  */
object StreamingQueries extends QueryPack {

  private def eventsWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
    val tag = Integer.toHexString(dir.hashCode)
    // the file stream source requires a directory: stage a symlink dir
    // (in production this IS a directory files arrive into)
    val srcDir = java.nio.file.Paths.get(s"/root/repo/target/stream-src-$tag")
    java.nio.file.Files.createDirectories(srcDir)
    val link = srcDir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(s"$dir/events.parquet"))
    // watermark sentinel: one row 2 days past the real max event time
    val sentinelDir = s"/root/repo/target/stream-sentinel-$tag"
    val sentinelLink = srcDir.resolve("zz-sentinel.parquet")
    if (!java.nio.file.Files.exists(sentinelLink)) {
      val maxNs = s.read.parquet(s"$dir/events.parquet")
        .agg(max($"ts")).as[Long].head()
      s.read.parquet(s"$dir/events.parquet").limit(1)
        .withColumn("ts", lit(maxNs + 2L * 24 * 3600 * 1000000000L))
        .withColumn("event_type", lit("__wm_sentinel__"))
        .coalesce(1).write.mode("overwrite").parquet(sentinelDir)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(sentinelDir))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.createSymbolicLink(sentinelLink, part)
    }
    // fresh checkpoint+sink per run: the file sink is append-only, so a
    // stale sink without its checkpoint would double-count
    val ckDir = java.nio.file.Paths.get(s"/root/repo/target/stream-ck-$tag")
    val outDir = java.nio.file.Paths.get(s"/root/repo/target/stream-out-$tag")
    def rmTree(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    rmTree(ckDir); rmTree(outDir)
    val stream = s.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1") // real data first, sentinel after
      .parquet(srcDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        expr(dsum("value")).as("total_value"))
      .select($"window.start".as("day_ts"), $"event_type", $"n_events", $"total_value")
    val q = stream.writeStream
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckDir.toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(outDir.toString)
      .filter($"event_type" =!= "__wm_sentinel__")
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
