package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access. All driver tables are parquet files under an sf dir
  * (TESTDATA.md). Queries receive the sf dir and read from it; the driver's
  * DuckDB oracle reads the same files, so table names here must match the
  * bare names used in `SparkEntry.oracleSql`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read the raw int64 and truncate to micros exactly
    // like DuckDB does when it casts ns -> its native us timestamps.
    // Check-then-set: no steady-state mutation, and any interleaving is
    // benign because every writer sets the identical value. (A
    // first-caller-only memo would NOT be safe: a losing racer could
    // read the parquet before the winner set the conf.)
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(nanosKey).contains("true"))
      spark.conf.set(nanosKey, "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // The driver has shipped events.ts as both TIMESTAMP(NANOS) (read as
    // int64 under nanosAsLong) and plain timestamp[us] (read as
    // TIMESTAMP_NTZ) across testdata generations. Normalize BY SCHEMA to
    // session-TZ TimestampType so every downstream query sees one type;
    // with the UTC session TZ the NTZ cast is value-preserving and lands
    // on the same instants the nanos path produced.
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (name == "events")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    else df
  }

  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every table as a temp view so shared ANSI SQL (identical text
    * to the DuckDB oracle) can run through Catalyst unchanged. Memoized per
    * (session, sfDir): re-registering on every query would re-read all ten
    * parquet footers each time.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registeredDir.get(spark) != sfDir) {
      names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
      registeredDir.put(spark, sfDir)
    }
}
