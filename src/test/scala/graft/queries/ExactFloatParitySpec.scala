package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dwrf.TestSpark

/** The [[Exact]] arithmetic policy's load-bearing claim: on the test
  * corpora, the plain-double production kernels surface the SAME answer
  * sets as the exact-decimal tier the DuckDB oracle re-derives — the
  * candidates sit far from every decision boundary, so the
  * ~1e-12-scale rounding difference never crosses a threshold, flips a
  * band bit, or reorders a top-k. This spec PINS that equivalence for
  * the three operators Bench flips to float (`ann_lsh_cosine`,
  * `ann_pq_topk`, `dedup_semantic`); the flag is passed explicitly so
  * no global state is toggled under parallel suites. If a fixture
  * refresh ever lands a vector on a boundary, this fails loudly and
  * the policy decision gets re-made with data.
  */
class ExactFloatParitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val sfMid = "/root/testdata/sf0.01"

  test("ann_lsh_cosine: float and exact surface the identical ranked " +
      "pair list (band bits + candidate set + top-20)") {
    for (dir <- Seq(sf, sfMid)) {
      def pairs(exact: Boolean): Seq[(Long, Long)] =
        SimilarityQueries.lshCosineWithArith(spark, dir, exact)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pairs(exact = true) == pairs(exact = false), s"dir=$dir")
    }
  }

  test("ann_pq_topk: float and exact surface the identical ranked " +
      "top-10 id list") {
    for (dir <- Seq(sf, sfMid)) {
      def ids(exact: Boolean): Seq[Long] =
        SimilarityQueries.pqTopkWithArith(spark, dir, exact)
          .collect().map(_.getLong(0)).toSeq
      assert(ids(exact = true) == ids(exact = false), s"dir=$dir")
    }
  }

  test("dedup_semantic tier: float and exact surface the identical " +
      "within-cell pair set, cell count, and max cell population") {
    import org.apache.spark.sql.functions.col
    def run(dir: String, exact: Boolean): (Set[(Long, Long)], Int, Long) = {
      val raw = graft.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .unionByName(SimilarityQueries.plantedTwins(spark, dir))
      val tier = DedupQueries.semanticTier(spark, raw, exactArith = exact)
      try {
        val pairs = tier.within.select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (pairs, tier.cells, tier.maxCellPop)
      } finally tier.unpersist()
    }
    for (dir <- Seq(sf, sfMid)) {
      val (pe, ce, me) = run(dir, exact = true)
      val (pf, cf, mf) = run(dir, exact = false)
      assert(pe.nonEmpty, s"$dir: fixture must surface pairs (planted twins)")
      assert(ce == cf && me == mf,
        s"$dir: geometry drifted: ($ce,$me) vs ($cf,$mf)")
      assert(pe == pf,
        s"$dir: pair sets differ: only-exact=${(pe -- pf).take(5)} " +
          s"only-float=${(pf -- pe).take(5)}")
    }
  }
}
