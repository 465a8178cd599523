package graft.queries

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.sources.dwrf.TestSpark

/** Exercises the PQ drift policy's ESCALATION branch — the one live
  * code path VERDICT r13 found with zero committed evidence (the 16×
  * permuted-replica opscale stress records recall 0.7 / pool 67 /
  * escalations 0: the base pool already clears the target there).
  *
  * The stress corpus makes the frozen codebooks genuinely blind to the
  * appended delta: the TRUE top-10 neighbors of the probe query are
  * delta vectors `3·q + 5·u` (u ⊥ q, concentrated in the last two
  * subspaces — a distribution the v0-trained codebooks never saw), so
  * their reconstructions collapse onto base centroids and their ADC
  * scores tie UNDER a planted crowd of ~130 base vectors at dot ≈ 1.
  * The base re-rank pool (50) therefore fills with crowd rows — probe
  * recall 0 — and exactly the `while (recall < target)` loop must buy
  * the answer back by deepening the pool, never by re-training
  * (PqIncrementalSpec pins the frozen-codebook mtime on the standard
  * corpus; here the in-query REQUIREs pin delta-only encode + one
  * append commit + no-op re-apply under the stress too).
  */
class PqDriftEscalationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val N = 3000
  private val Dims = 64
  private val Crowd = 130
  private val Specials = 10

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Deterministic fixture (seeded): ids ≡ 7 (mod 10) are the delta the
    * maintain encodes; the 10 highest such ids carry the shifted
    * true-neighbor vectors. */
  private def buildFixture(dir: String): Unit = {
    val rnd = new scala.util.Random(140701L)
    val q = unit(Array.fill(Dims)(rnd.nextGaussian()))
    // the crowd is IDENTICAL copies of q: one shared centroid, so every
    // crowd row scores the exact same ADC, the specials reconstruct to
    // that centroid (or below) and lose every tie to the crowd's lower
    // vec_ids — the base pool fills with crowd rows deterministically
    def crowdVec(): Array[Double] = q.clone()
    def noiseVec(): Array[Double] =
      unit(Array.fill(Dims)(rnd.nextGaussian())).map(_ * 0.3)
    def specialVec(): Array[Double] = {
      // u: gaussian on the last 2 subspaces only, projected ⊥ q there,
      // unit, ×5 — large mass in a region the base corpus never visits
      val lo = Dims - 16
      val w = Array.fill(Dims)(0.0)
      for (i <- lo until Dims) w(i) = rnd.nextGaussian()
      val qs2 = (lo until Dims).map(i => q(i) * q(i)).sum
      val wq = (lo until Dims).map(i => w(i) * q(i)).sum
      for (i <- lo until Dims) w(i) -= (wq / qs2) * q(i)
      val u = unit(w)
      Array.tabulate(Dims)(i => 3.0 * q(i) + 5.0 * u(i))
    }
    val deltaIds = (0 until N).filter(id => id % 10 == 7 && id != 0)
    val specialIds = deltaIds.takeRight(Specials).toSet
    val crowdIds = (1 until N).filterNot(id => id % 10 == 7)
      .take(Crowd).toSet
    val rows = (0 until N).map { id =>
      val v =
        if (id == 0) q.clone()
        else if (specialIds(id)) specialVec()
        else if (crowdIds(id)) crowdVec()
        else noiseVec()
      org.apache.spark.sql.Row(id.toLong, v.map(_.toFloat).toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("a post-sync distribution shift drives probe recall below the " +
      "target and the escalated re-rank pool buys it back within n/8") {
    val dir = "target/pqdrift"
    buildFixture(dir)
    val row = SparkEntry.queries("ann_pq_incremental")(spark, dir).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[Long]("n_total") == N.toLong)
    assert(r.getAs[Long]("encoded_delta_only") == 1L)
    assert(r.getAs[Long]("reapply_noop") == 1L)
    // the in-query floor REQUIRE already enforced recall ≥ 0.7 — this
    // row existing at all proves recovery; the instrument proves HOW
    assert(r.getAs[Long]("recall_within_floor") == 1L)
    // dir-qualified key: race-free against PqIncrementalSpec's parallel
    // run on its own corpus
    val inst = SimilarityQueries.lastInstrument.get(s"ann_pq_incremental@$dir")
    assert(inst("recall_base") < SimilarityQueries.PqIncProbeTarget,
      s"stress failed to drive the base-pool recall under the target " +
        s"(got ${inst("recall_base")}) — the escalation branch never ran")
    assert(inst("rerank_escalations") >= 1.0,
      s"expected ≥ 1 escalation, got ${inst("rerank_escalations")}")
    assert(inst("recall") >= SimilarityQueries.PqIncProbeTarget,
      s"escalation failed to recover recall (${inst("recall")})")
    assert(inst("rerank_pool") > 50.0 && inst("rerank_pool") <= N / 8.0,
      s"escalated pool ${inst("rerank_pool")} outside (base, n/8]")
    assert(inst("encoded_delta") == r.getAs[Long]("n_delta").toDouble,
      "the maintain under stress must still encode ONLY the delta")
    val ph = SimilarityQueries.lastPqIncPhasesByDir.get(dir)
    assert(ph.contains("search_escalated"),
      s"escalated search phase missing from attribution: ${ph.keys}")
    info(s"drift stress: recall_base=${inst("recall_base")} -> " +
      s"recall=${inst("recall")} escalations=${inst("rerank_escalations")} " +
      s"pool=${inst("rerank_pool")} (cap ${N / 8}) " +
      s"encoded_delta=${inst("encoded_delta")}")
  }
}
