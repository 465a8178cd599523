package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.sources.dwrf.TestSpark

/** Pins the LSH recall claims as MEASURED numbers, not band-formula
  * theory. The planted fixture is 100 deterministic twins at
  * cos(v, twin) = 0.95 (the regime near-dup dedup targets); 4×8-bit
  * random-hyperplane bands predict recall 1-(1-p^8)^4 ≈ 0.89 there
  * (p = 1 - acos(0.95)/π ≈ 0.899). Everything is seeded, so the
  * measured value is a constant — the ≥ 0.8 bound is a real floor,
  * not a flaky statistical test.
  */
class LshRecallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("planted twins sit at cosine 0.95 of their originals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val twins = SimilarityQueries.plantedTwins(spark, sf)
      .select(($"vec_id" - 10000000L).as("vec_id"), $"embedding".as("t"))
    val orig = graft.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".as("v"))
    val cos = twins.join(orig, "vec_id")
      .select(
        (expr("aggregate(zip_with(v, t, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, d) -> a + d)") /
          (sqrt(expr("aggregate(zip_with(v, v, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, d) -> a + d)")) *
           sqrt(expr("aggregate(zip_with(t, t, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, d) -> a + d)"))))
          .as("c"))
      .as[Double].collect()
    assert(cos.length == 100)
    cos.foreach(c => assert(math.abs(c - 0.95) < 1e-5,
      s"planted cosine drifted: $c"))
  }

  test("measured planted recall at c=0.95 is >= 0.8") {
    val row = SparkEntry.queries("ann_lsh_recall")(spark, sf).collect().head
    val plantedPairs = row.getAs[Long]("planted_pairs")
    val plantedFound = row.getAs[Long]("planted_found")
    val plantedRecall = row.getAs[Double]("planted_recall")
    assert(plantedPairs == 100L)
    assert(plantedRecall >= 0.8,
      s"planted recall $plantedRecall ($plantedFound/$plantedPairs) below the 0.8 floor")
  }
}
