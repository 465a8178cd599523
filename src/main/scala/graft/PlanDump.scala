package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` for named declared queries to files —
  * the plan evidence behind plans/r{N}/<query>_{before,after}.txt.
  *
  * Usage: SPARK_GRAFT_PLAN_OUT=plans/r14 SPARK_GRAFT_PLAN_SUFFIX=after \
  *          sbt "runMain graft.PlanDump dedup_simhash ann_pq_topk"
  *
  * Runs under BENCH conditions (gates off, production float arithmetic)
  * so the dumped plan is the one the bench times; set
  * SPARK_GRAFT_PLAN_EXACT=1 to dump the Verify-mode (exact-decimal)
  * plan instead. Same session shape as Bench (local[$SPARK_GRAFT_CPUS],
  * AQE on, shuffle.partitions=cpus).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/r14")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Gates.disableForBench()
    val exact = sys.env.get("SPARK_GRAFT_PLAN_EXACT").contains("1")
    if (!exact) {
      // same arithmetic the bench times (graft.queries.Exact scaladoc)
      try graft.queries.Exact.disableForBench()
      catch { case _: Throwable => () } // absent before r14
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val queries = SparkEntry.queries
    args.foreach { name =>
      queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              ExplainMode.fromString("formatted"))
            val header =
              s"query: $name\nsf: $sfDir\nmode: ${if (exact) "exact (Verify)" else "float+gates-off (Bench)"}\n\n"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
              (header + txt).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
