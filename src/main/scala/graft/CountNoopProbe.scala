package graft


// Measurement probe (guide §1.4): quantifies how much lighter the
// benched `df.count()` action is than a full-materialization noop
// write, per pure-SQL query — the evidence behind OPTIMIZATION_r14.md's
// timed-action note. Same session shape and env contract as Bench.
object CountNoopProbe {
  def main(args: Array[String]): Unit = {
    val spark = BenchSession.build()
    graft.queries.Gates.disableForBench()
    graft.queries.Exact.disableForBench()
    val qs = SparkEntry.queries
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val names = Seq("q1_pricing", "q3_shipping_priority", "adv_cube",
      "adv_market_share", "q_top_parts_window", "adv_window_battery")
    names.foreach { name =>
      qs(name)(spark, dir).count() // warm
      val tc = (1 to 3).map(_ => time(qs(name)(spark, dir).count())).min
      val tn = (1 to 3).map(_ => time(
        qs(name)(spark, dir).write.format("noop").mode("overwrite").save())).min
      println(f"PROBE $name count=$tc%.3f noop=$tn%.3f ratio=${tn / tc}%.2f")
    }
    spark.stop()
  }
}
