package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.sources.dwrf.TestSpark

/** The IVF tier's measured recall floor (the LSH analog is
  * LshRecallSpec): probing 4 of 16 cells must recover most of the exact
  * dot-product top-10 on the fixed seeded fixture. Measured 0.9 at both
  * sf0.001 and sf0.01; the floor is 0.7 so a regenerated fixture has
  * headroom while a broken quantizer (recall ~nprobe/cells ≈ 0.25 for
  * random assignment) still fails loudly.
  */
class IvfRecallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("ivf nprobe=4/16 recovers >= 0.7 of the exact top-10") {
    val row = SparkEntry.queries("ann_ivf_recall")(
      spark, "/root/testdata/sf0.001").collect().head
    // the measured recall rides the instrument side-channel since the
    // emission went oracle-checked (geometry columns + floor bit)
    val recall = SimilarityQueries.lastInstrument
      .get("ann_ivf_recall")("recall")
    assert(row.getAs[Long]("n_exact") == 10L)
    assert(row.getAs[Long]("recall_within_floor") == 1L)
    assert(recall >= 0.7, s"ivf recall degraded: $recall")
  }
}
