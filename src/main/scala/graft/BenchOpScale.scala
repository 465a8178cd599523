package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operator-tier scale stress: the dedup pipeline (ngram-Jaccard edges →
  * connected components, and MinHash+LSH) on a corpus ~16× the largest
  * fixture, with the numbers RECORDED — wall time, shuffle read/write
  * bytes, and the df-cap skew counters — so the "scale-safe by plan
  * shape" claims are measurements, the same way the format writer's
  * 9.6M-row stress is.
  *
  * Corpus construction (weak scaling, the honest kind): `copies`
  * word-prefixed replicas of the base documents table. Prefixing every
  * word of copy i with "c{i}·" is injective per word, so each copy's
  * shingle space is an exact isomorph of the base corpus's and DISJOINT
  * from every other copy's. Consequences the harness asserts:
  *
  *  - exact-Jaccard structure is preserved per copy (set overlaps are
  *    hash-independent), so `dedup_clusters` at N copies must produce
  *    EXACTLY N× the base clusters with the same size histogram — a
  *    correctness-at-scale check, not just a timing;
  *  - the shingle df histogram replicates per copy (no cross-copy
  *    collisions), so the df ≤ 50 skew cap drops the same shingles in
  *    every copy and the join volume scales linearly by construction —
  *    the harness records the measured hot-shingle counters to prove it;
  *  - MinHash estimates are hash-DEPENDENT (copy i's shingles hash
  *    differently), so LSH pair counts scale ~N× only statistically;
  *    the harness bounds the drift instead of asserting equality.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BenchOpScale"
  * (SPARK_GRAFT_OPSCALE_COPIES to override the 16.)
  */
object BenchOpScale {

  /** Accumulates executor shuffle volume across completed stages —
    * local-mode's stand-in for the Spark UI's shuffle columns. */
  private final class ShuffleTotals extends SparkListener {
    val read = new AtomicLong
    val write = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  /** The N-replica corpus: doc_ids offset per copy, every word of copy i
    * prefixed with "c{i}·" (U+00B7 — absent from the fixture's space-
    * separated tokens, so the prefix can't merge adjacent token spaces).
    */
  private[graft] def scaledCorpus(spark: SparkSession, baseDir: String,
      copies: Int): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, baseDir, "documents")
    (0 until copies).map { i =>
      docs.select(
        ($"doc_id" + lit(i.toLong * 100000000L)).as("doc_id"),
        expr(s"array_join(transform(split(text, ' '), w -> concat('c${i}·', w)), ' ')")
          .as("text"),
        $"lang", $"source", $"n_chars")
    }.reduce(_ unionAll _)
  }

  /** (hot shingles over the df cap, max df, shingle rows dropped from the
    * join) — the skew counters behind the df ≤ 50 cap, measured over the
    * given documents dir. */
  private def dfCapCounters(spark: SparkSession, dir: String,
      maxDf: Int = 50): (Long, Long, Long) = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dfs = Tables.load(spark, dir, "documents")
      .select(explode(expr("word_shingle_hashes(text, 5)")).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("df"))
    val row = dfs.agg(
      sum(when($"df" > maxDf, 1L).otherwise(0L)),
      max($"df"),
      sum(when($"df" > maxDf, $"df").otherwise(0L))).head()
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val copies = sys.env.getOrElse("SPARK_GRAFT_OPSCALE_COPIES", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize the scaled corpus as a plain parquet dir shaped like a
    // fixture dir, so the queries run UNMODIFIED via Tables.load
    val scaledDir = "/root/repo/target/opscale"
    val (tBuild, _) = time {
      scaledCorpus(spark, baseDir, copies).write.mode("overwrite")
        .parquet(s"$scaledDir/documents.parquet")
    }

    val listener = new ShuffleTotals
    spark.sparkContext.addSparkListener(listener)
    // the listener bus is async and private; settle = wait until the
    // shuffle counters stop moving (stage-completed events drain in ms)
    def settle(): Unit = {
      var prev = (-1L, -1L)
      var cur = (listener.read.get(), listener.write.get())
      while (prev != cur) {
        Thread.sleep(200)
        prev = cur
        cur = (listener.read.get(), listener.write.get())
      }
    }
    def measured(name: String, dir: String): (Double, Long, Long, Long) = {
      settle()
      val (r0, w0) = (listener.read.get(), listener.write.get())
      val (t, rows) = time(SparkEntry.queries(name)(spark, dir).count())
      settle()
      (t, rows, listener.read.get() - r0, listener.write.get() - w0)
    }

    val r = scala.collection.mutable.LinkedHashMap[String, Any](
      "copies" -> copies, "base_sf" -> baseDir, "corpus_build_s" -> tBuild)

    // skew counters first (cheap, independent jobs): the df-cap replica
    // claim — hot count and dropped rows scale by exactly `copies`,
    // max df is unchanged — is checked, not assumed
    val (hot1, maxDf1, drop1) = dfCapCounters(spark, baseDir)
    val (hotN, maxDfN, dropN) = dfCapCounters(spark, scaledDir)
    r ++= Seq("hot_shingles_base" -> hot1, "hot_shingles_scaled" -> hotN,
      "max_df_base" -> maxDf1, "max_df_scaled" -> maxDfN,
      "dropped_shingle_rows_base" -> drop1,
      "dropped_shingle_rows_scaled" -> dropN)
    require(hotN == copies * hot1 && maxDfN == maxDf1 &&
      dropN == copies * drop1,
      s"df histogram did not replicate per copy: hot $hot1->$hotN, " +
        s"maxDf $maxDf1->$maxDfN, dropped $drop1->$dropN")

    for (q <- Seq("dedup_clusters", "dedup_minhash_lsh")) {
      // warm nothing: each (query, scale) is a cold single run — this is
      // a stress record, not a median bench; GC/load context comes from
      // the wall-clock ratio against the linear expectation
      val (t1, rows1, sr1, sw1) = measured(q, baseDir)
      val (tN, rowsN, srN, swN) = measured(q, scaledDir)
      r ++= Seq(s"${q}_base_s" -> t1, s"${q}_scaled_s" -> tN,
        s"${q}_rows_base" -> rows1, s"${q}_rows_scaled" -> rowsN,
        s"${q}_shuffle_read_mb_base" -> sr1 / 1e6,
        s"${q}_shuffle_read_mb_scaled" -> srN / 1e6,
        s"${q}_shuffle_write_mb_base" -> sw1 / 1e6,
        s"${q}_shuffle_write_mb_scaled" -> swN / 1e6,
        s"${q}_time_ratio" -> tN / t1,
        s"${q}_shuffle_ratio" -> (if (sr1 > 0) srN.toDouble / sr1 else -1.0))
      if (q == "dedup_clusters")
        // exact tier: per-copy isomorphism makes N× an equality, and a
        // miss means the operator (or the cap) broke under scale
        require(rowsN == copies * rows1,
          s"$q rows: expected ${copies}x${rows1}, got $rowsN")
      else {
        // hash-dependent tier: bound the drift around N× instead
        val drift = math.abs(rowsN.toDouble / (copies.toDouble * rows1) - 1)
        require(drift <= 0.15,
          s"$q rows drifted ${math.round(drift * 100)}% from ${copies}x " +
            s"($rows1 -> $rowsN)")
        r += s"${q}_rows_drift_from_linear" -> drift
      }
    }
    spark.sparkContext.removeSparkListener(listener)

    val json = r.map {
      case (k, v: Double) => s""""$k":${math.round(v * 1000) / 1000.0}"""
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
