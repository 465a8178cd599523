package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Format-parity micro-bench: dwrf vs Spark's built-in parquet on the
  * same lineitem data — write time, on-disk size, full-scan aggregate,
  * and FILTERED scan (the columnar + stride-skip path). Prints one JSON
  * line; README's recorded evidence comes from here.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BenchFormats"
  */
object BenchFormats {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  private def dirSize(p: String): Long = {
    val d = new java.io.File(p)
    if (!d.exists) 0L
    else d.listFiles.filter(_.isFile).map(_.length).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val li = Tables.load(spark, sfDir, "lineitem").cache()
    li.count() // materialize, so writes time the format not the source scan
    val base = "/root/repo/target/fmt-bench"

    def writeTo(fmt: String, path: String, opts: Map[String, String]): Double = {
      val (t, _) = time {
        val w = li.write.format(fmt).mode("overwrite")
        opts.foreach { case (k, v) => w.option(k, v) }
        w.save(path)
      }
      t
    }

    def scanAgg(fmt: String, path: String): Double = {
      val (t, _) = time {
        spark.read.format(fmt).load(path)
          .agg(sum($"l_quantity"), sum($"l_extendedprice")).collect()
      }
      t
    }

    def scanFiltered(fmt: String, path: String): Double = {
      val (t, _) = time {
        spark.read.format(fmt).load(path)
          .filter($"l_orderkey" >= 100000L && $"l_orderkey" < 200000L)
          .agg(sum($"l_quantity"), count(lit(1))).collect()
      }
      t
    }

    // warmup both write paths once
    writeTo("parquet", s"$base/warm-pq", Map.empty)
    writeTo("dwrf", s"$base/warm-dw", Map.empty)

    val r = scala.collection.mutable.LinkedHashMap[String, Any]()
    r("write_parquet_snappy_s") = writeTo("parquet", s"$base/pq", Map.empty)
    r("write_dwrf_zlib_s") = writeTo("dwrf", s"$base/dw-zlib", Map("compress" -> "ZLIB"))
    r("write_dwrf_snappy_s") = writeTo("dwrf", s"$base/dw-snappy", Map("compress" -> "SNAPPY"))
    r("size_parquet_mb") = dirSize(s"$base/pq") / 1e6
    r("size_dwrf_zlib_mb") = dirSize(s"$base/dw-zlib") / 1e6
    r("size_dwrf_snappy_mb") = dirSize(s"$base/dw-snappy") / 1e6
    // second run timed (warm page cache) for scans
    scanAgg("parquet", s"$base/pq"); scanAgg("dwrf", s"$base/dw-zlib")
    r("scan_agg_parquet_s") = scanAgg("parquet", s"$base/pq")
    r("scan_agg_dwrf_zlib_s") = scanAgg("dwrf", s"$base/dw-zlib")
    scanFiltered("parquet", s"$base/pq"); scanFiltered("dwrf", s"$base/dw-zlib")
    r("scan_filtered_parquet_s") = scanFiltered("parquet", s"$base/pq")
    r("scan_filtered_dwrf_zlib_s") = scanFiltered("dwrf", s"$base/dw-zlib")

    val json = r.map {
      case (k, v: Double) => s""""$k":${math.round(v * 1000) / 1000.0}"""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
