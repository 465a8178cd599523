package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.sources.dwrf.TestSpark

/** Physical-plan regression gates: the 100 TB story lives or dies in the
  * plan shape, so pin it. Small-SF correctness is checked by the oracle;
  * this spec asserts the plans stay the plans we'd want on a cluster —
  * dimension joins broadcast, filters pushed to the dwrf scan, filtered
  * flat scans columnar, no accidental cartesian products.
  */
class PlanQualitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): SparkPlan = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan
  }

  /** Collect through AQE wrappers (plans here are pre-execution). */
  private def collectAll[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] = {
    val expanded = p.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }
    (p +: expanded).flatMap(_.collect(f))
  }

  test("q3: dimension join is broadcast, only fact-fact edges shuffle") {
    val p = planOf("q3_shipping_priority")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"customer dim must broadcast:\n$p")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q5: multi-dim star join broadcasts every dimension") {
    val p = planOf("q5_region_revenue")
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 2, s"region/nation/supplier dims must broadcast:\n$p")
  }

  test("pushed filters reach the dwrf scan and the scan stays columnar") {
    val df = SparkEntry.queries("dwrf_filter_columnar")(spark, sf)
    val p = df.queryExecution.executedPlan
    val scans = collectAll(p) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, s"no dwrf batch scan found:\n$p")
    scans.foreach { s =>
      assert(s.scan.description().contains("PushedFilters: [") &&
        !s.scan.description().contains("PushedFilters: []"),
        s"range filter must be pushed: ${s.scan.description()}")
      assert(s.supportsColumnar, "filtered flat dwrf scan must stay columnar")
    }
  }

  test("parquet scans prune columns and push filters (q6 shape)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val p = planOf("q6_forecast_revenue")
    val scans = collectAll(p) { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      // needs only 4 of lineitem's 16 columns
      assert(s.requiredSchema.fields.length <= 4,
        s"column pruning regressed: ${s.requiredSchema.fieldNames.mkString(",")}")
      assert(s.metadata.get("PushedFilters").exists(_ != "[]"),
        s"no pushed filters on the lineitem scan: ${s.metadata}")
    }
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val p = planOf("q1_pricing")
    val aggs = collectAll(p) { case a: HashAggregateExec => a }
    // partial + final pairs: more aggregate nodes than shuffles feeding them
    assert(aggs.size >= 2, s"expected partial+final aggregation:\n$p")
  }

  test("LSH band joins are equi-joins (shuffle hash/sort-merge), never cartesian") {
    // minhash / lsh_cosine / ngram materialize eagerly (collect + unpersist),
    // so gate their lazy plan builders, not the LocalRelation they return
    val plans: Seq[(String, SparkPlan)] = Seq(
      "dedup_minhash_lsh" ->
        DedupQueries.minhashLshPlan(spark, sf).queryExecution.executedPlan,
      "dedup_ngram_jaccard" ->
        DedupQueries.ngramJaccardPlan(spark, sf).queryExecution.executedPlan,
      "ann_lsh_cosine" ->
        SimilarityQueries.lshCosinePlan(spark, sf).queryExecution.executedPlan,
      "dedup_simhash" -> planOf("dedup_simhash"))
    for ((name, p) <- plans) {
      assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty,
        s"$name must not plan a cartesian product:\n$p")
      assert(collectAll(p) { case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j }.isEmpty,
        s"$name must not plan a nested-loop join")
    }
  }

  test("ANN tier scores on native kernels (vec_dot/vec_l2sq), not interpreted lambdas") {
    // the interpreted aggregate(zip_with(...)) HOF spelling pays two
    // Catalyst tree walks per ELEMENT; the codegen'd kernels pay one call
    // per VECTOR. Gate the lazy LSH plan (the IVF/PQ paths materialize
    // eagerly, but share loadVecs/scoring spellings covered by their
    // recall specs) on containing the native expression and NOT the
    // zip_with spelling.
    val p = SimilarityQueries.lshCosinePlan(spark, sf)
      .queryExecution.analyzed.toString
    assert(p.contains("vec_dot"),
      s"ann_lsh_cosine must score on the native vec_dot kernel:\n$p")
    assert(!p.contains("zip_with"),
      s"ann_lsh_cosine must not evaluate interpreted zip_with lambdas:\n$p")
  }

  test("dedup_fuzzy: deletion-variant candidates meet in an equi-join, never quadratic") {
    val p = planOf("dedup_fuzzy")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty,
      s"fuzzy join must not plan a cartesian product:\n$p")
    assert(collectAll(p) { case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"fuzzy join must not plan a nested-loop join:\n$p")
  }

  test("as-of join plans as union + window, with NO join operator at all") {
    val p = planOf("q_asof_join")
    assert(collectAll(p) { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
      s"the union/sort/carry shape needs no join:\n$p")
    assert(collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }.nonEmpty,
      "carry-forward window must be present")
  }

  test("range join is a bounded equi-join, never nested-loop") {
    val p = planOf("q_range_join")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, s"bucketized range join must not plan a nested loop:\n$p")
  }

  test("exact dedup is a single hash aggregation chain, no join") {
    val p = planOf("dedup_exact")
    assert(collectAll(p) { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
      s"dedup_exact needs no join:\n$p")
    val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2, s"hash-dedup should shuffle at most twice:\n$p")
  }

  test("pack_sequences: per-shard windows after ONE hash shuffle, no global sort") {
    val p = planOf("pack_sequences")
    assert(collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }.nonEmpty,
      s"running-total window must be present:\n$p")
    assert(collectAll(p) { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
      s"packing must not join:\n$p")
    // the window's hash exchange on shard + the final ORDER BY's range
    // exchange: anything more means a global sort snuck in before packing
    val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2, s"pack_sequences should shuffle at most twice:\n$p")
  }

  test("text_decontaminate: equi-join on gram hashes, never nested-loop") {
    // the public query materializes eagerly (collect + unpersist), so
    // gate the lazy plan builder, not the LocalRelation it returns
    val p = TextQueries.decontaminatePlan(spark, sf).queryExecution.executedPlan
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty,
      s"decontamination must not plan a cartesian:\n$p")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, s"decontamination must not plan a nested loop:\n$p")
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    assert(collectAll(p) { case a: HashAggregateExec => a }.size >= 2,
      s"overlap count must partial-aggregate map-side:\n$p")
  }

  test("pipeline_clean composes join-free: gate, dedup, fold rollup") {
    val p = planOf("pipeline_clean")
    assert(collectAll(p) { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
      s"the cleaning pipeline must not join:\n$p")
    // dedup groupBy + fold rollup + final ORDER BY range exchange
    val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 3, s"pipeline_clean should shuffle at most thrice:\n$p")
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    assert(collectAll(p) { case a: HashAggregateExec => a }.size >= 4,
      s"both aggregations must partial-aggregate map-side:\n$p")
  }

  test("pii scrub and stratified split are narrow maps + one rollup shuffle") {
    // both are pure per-doc functions followed by a tiny per-group rollup:
    // at 100 TB the map side must stay join-free and shuffle only the
    // partially-aggregated rollup rows
    for (name <- Seq("text_pii_scrub", "sample_stratified")) {
      val p = planOf(name)
      assert(collectAll(p) { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
        s"$name must not join:\n$p")
      // rollup exchange + output ordering's range exchange at most
      val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
      assert(shuffles.size <= 2, s"$name should shuffle at most twice:\n$p")
      import org.apache.spark.sql.execution.aggregate.HashAggregateExec
      val aggs = collectAll(p) {
        case a: HashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      }
      assert(aggs.size >= 2, s"$name rollup must partial-aggregate map-side:\n$p")
    }
  }

  test("dedup_substring: spans meet in ONE groupBy — no join, partial agg") {
    val p = planOf("dedup_substring")
    assert(collectAll(p) { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
      s"substring dedup must not join (the groupBy IS the meeting point):\n$p")
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    val aggs = collectAll(p) {
      case a: HashAggregateExec => a
      case a: ObjectHashAggregateExec => a
    }
    assert(aggs.size >= 2,
      s"span counting must partial-aggregate map-side (each doc's repeats collapse pre-shuffle):\n$p")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("pipeline_mix: corpus joins the 5-row rate table by broadcast only") {
    val p = planOf("pipeline_mix")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty,
      s"mixture sampling must not plan a cartesian over the corpus:\n$p")
    // every join in the plan carries a broadcast side (rate/target tables
    // are bounded by the language count): no shuffled corpus join allowed
    val shuffled = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledJoin => j
    }
    assert(shuffled.isEmpty,
      s"the corpus must never shuffle to meet the tiny rate table:\n$p")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"rate-table joins must broadcast:\n$p")
  }

  test("q_events_funnel: every stage joins/aggregates on the user_id key, no cartesian") {
    val p = planOf("q_events_funnel")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, s"funnel stage joins must stay equi-joins on user_id:\n$p")
  }
}
