package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dwrf.TestSpark

/** KLL quantile sketch: rank-error bound across input distributions and
  * merge shapes, the weight-conservation invariant, serde exactness,
  * and same-order determinism.
  */
class KllSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Max |trueNormalizedRank(answer) − phi| over a grid of phis, for a
    * sketch built locally from `data` in the given shard layout.
    */
  private def maxRankErr(data: Array[Double], k: Int, shards: Int): Double = {
    val sorted = data.sorted
    def trueRank(v: Double): Double = {
      // # of values <= v, via binary search on the upper bound
      var lo = 0; var hi = sorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (sorted(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo.toDouble / sorted.length
    }
    val parts = data.grouped(math.max(1, data.length / shards)).toSeq
    val bufs = parts.map { p =>
      val b = new KllBuffer(k)
      p.foreach(b.update)
      b
    }
    val merged = bufs.reduce((a, b) => a.mergeIn(b))
    assert(merged.totalWeight == data.length,
      "compaction must conserve total weight exactly")
    val phis = (1 to 99).map(_ / 100.0)
    phis.map(phi => math.abs(trueRank(merged.quantile(phi)) - phi)).max
  }

  test("rank error stays bounded across distributions at k=200") {
    val n = 100000
    val rnd = new scala.util.Random(7)
    val uniform = Array.fill(n)(rnd.nextDouble() * 1000)
    val zipf = Array.tabulate(n)(i => math.pow(1.0 + i % 1000, -1.2))
    val sortedIn = Array.tabulate(n)(_.toDouble)
    val reversed = sortedIn.reverse
    for ((name, data) <- Seq("uniform" -> uniform, "zipf" -> zipf,
        "sorted" -> sortedIn, "reversed" -> reversed)) {
      val err = maxRankErr(data, k = 200, shards = 1)
      assert(err <= 0.02, s"$name: single-build rank error $err > 0.02")
    }
  }

  test("merge shape does not break the bound (2..64 shards)") {
    val n = 80000
    val rnd = new scala.util.Random(11)
    val data = Array.fill(n)(rnd.nextGaussian() * 50 + 100)
    for (shards <- Seq(2, 8, 64)) {
      val err = maxRankErr(data, k = 200, shards = shards)
      assert(err <= 0.025, s"$shards shards: rank error $err > 0.025")
    }
  }

  test("serde round-trips the buffer exactly") {
    val b = new KllBuffer(64)
    val rnd = new scala.util.Random(3)
    (1 to 5000).foreach(_ => b.update(rnd.nextDouble()))
    val agg = KllQuantiles(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      Seq(0.5), 64)
    val back = agg.deserialize(agg.serialize(b))
    assert(back.n == b.n && back.flip == b.flip)
    assert(back.levels.map(_.toSeq) == b.levels.map(_.toSeq))
    assert(back.quantile(0.37) == b.quantile(0.37))
  }

  test("identical build order gives identical answers (no RNG)") {
    val data = Array.tabulate(30000)(i => (i * 2654435761L % 9973).toDouble)
    def build() = {
      val b = new KllBuffer(128)
      data.foreach(b.update)
      b
    }
    val (a, b) = (build(), build())
    for (phi <- Seq(0.01, 0.25, 0.5, 0.75, 0.99))
      assert(a.quantile(phi) == b.quantile(phi))
  }

  test("SQL surface: kll_quantiles vs exact percentiles on a real column") {
    GraftFunctions.register(spark)
    val df = spark.range(0, 60000, 1, 8)
      .select((pmod(col("id") * 2654435761L, lit(100000)) / 7.0).as("v"))
    df.createOrReplaceTempView("kll_in")
    val row = spark.sql(
      """SELECT kll_quantiles(v, array(0.5D, 0.9D, 0.99D), 200) AS qs,
        |  percentile(v, array(0.5D, 0.9D, 0.99D)) AS exact,
        |  COUNT(*) AS n
        |FROM kll_in""".stripMargin).collect().head
    val qs = row.getSeq[Double](0)
    val n = row.getLong(2)
    // verify by RANK (the sketch's actual guarantee), not by value
    for ((q, phi) <- qs.zip(Seq(0.5, 0.9, 0.99))) {
      val rank = spark.sql(
        s"SELECT COUNT(*) FROM kll_in WHERE v <= $q").collect().head.getLong(0)
      val err = math.abs(rank.toDouble / n - phi)
      assert(err <= 0.02, s"phi=$phi answer=$q rank err $err > 0.02")
    }
    // nulls/NaNs are skipped, empty input is NULL
    spark.sql("SELECT kll_quantiles(CAST(NULL AS DOUBLE), array(0.5D), 64)")
      .collect().head.isNullAt(0)
    val withNan = spark.sql(
      """SELECT kll_quantiles(x, array(0.5D), 64)[0] FROM VALUES
        |(CAST('NaN' AS DOUBLE)), (1.0D), (2.0D), (3.0D) AS t(x)""".stripMargin)
      .collect().head.getDouble(0)
    assert(withNan == 2.0, s"NaN must be skipped, got median $withNan")
  }
}
