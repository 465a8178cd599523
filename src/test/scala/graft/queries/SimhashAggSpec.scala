package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dwrf.TestSpark

/** The one-pass `simhash64` TypedImperativeAggregate must emit the
  * EXACT signature of the 64-SUM spelling it replaced (the spelling the
  * DuckDB oracle still runs): bit b set iff Σ±1 over word-hash bit b is
  * positive. Pinned over the real documents fixture so every tie and
  * sign case the corpus produces is covered.
  */
class SimhashAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("simhash64 aggregate == 64-SUM signature, bit for bit") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val wordHashes = graft.Tables.load(s, sf, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .select($"doc_id", expr("mix_hash64(w)").as("wh"))
      .persist()
    try {
      val viaAgg = wordHashes.groupBy($"doc_id")
        .agg(expr("simhash64(wh)").as("sim"))
      val viaSums = wordHashes.groupBy($"doc_id").agg(
        (0 until 64).map { bit =>
          sum(when(expr(s"(shiftright(wh, $bit) & 1) = 1"), 1L).otherwise(-1L))
            .as(s"b$bit")
        }.head, (1 until 64).map { bit =>
          sum(when(expr(s"(shiftright(wh, $bit) & 1) = 1"), 1L).otherwise(-1L))
            .as(s"b$bit")
        }: _*)
        .select($"doc_id",
          expr((0 until 64).map(b => s"IF(b$b > 0, shiftleft(1L, $b), 0L)")
            .mkString("(", " + ", ")")).as("sim"))
      val diff = viaAgg.as("a").join(viaSums.as("b"), "doc_id")
        .filter($"a.sim" =!= $"b.sim").count()
      assert(diff == 0, s"$diff documents sign differently")
      assert(viaAgg.count() > 0)
    } finally wordHashes.unpersist()
  }
}
