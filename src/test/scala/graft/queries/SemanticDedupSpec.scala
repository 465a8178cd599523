package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.sources.dwrf.TestSpark

/** Pins dedup_semantic's SemDeDup trade as a measured constant: the
  * fixture is fully seeded (deterministic twins, deterministic k-means
  * init, fixed Lloyd iterations), so the within-cell recall of the 100
  * planted cos=0.95 pairs is a number, not a distribution — the floor
  * asserts the clustering keeps catching near-dups, and the exact-tier
  * count asserts the planted pairs are the ONLY pairs over threshold
  * (the base corpus tops out near cosine 0.5).
  */
class SemanticDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("within-cell recall of planted twins is measured and >= 0.8") {
    val row = SparkEntry.queries("dedup_semantic")(
      spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("pairs_exact") == 100L,
      "exact tier must find exactly the 100 planted pairs")
    assert(row.getAs[Long]("planted_pairs") == 100L)
    val recall = row.getAs[Double]("planted_recall")
    assert(recall >= 0.8, s"semantic dedup recall collapsed: $recall")
    // corpus-proportional cells: expected population ~128, so the
    // in-band maximum must sit well under the 16x fail-loud bound
    assert(row.getAs[Int]("cells") ==
      math.max(4, (row.getAs[Long]("n_vectors") + 127) / 128),
      "cell count must be corpus-proportional")
    assert(row.getAs[Long]("max_cell_pop") <= 16L * 128,
      "largest cell breached the collapse bound")
    assert(row.getAs[Long]("n_dropped") ==
      row.getAs[Long]("pairs_within_cell"),
      "each twin pair drops exactly its twin id")
  }
}
