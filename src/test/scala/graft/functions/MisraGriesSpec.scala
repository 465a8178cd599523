package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dwrf.TestSpark

/** Misra-Gries frequent items: the mergeable-summaries guarantee (every
  * item with count > N/(k+1) survives any update/merge order), count
  * under-estimation bound, serde round trip, and the end-to-end SQL
  * surface `mg_topk`.
  */
class MisraGriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Zipf-ish synthetic stream with a planted heavy tier. */
  private def stream(seed: Int, n: Int): IndexedSeq[String] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.tabulate(n) { _ =>
      val r = rnd.nextDouble()
      if (r < 0.4) s"heavy-${rnd.nextInt(10)}"         // ~4% each
      else if (r < 0.7) s"mid-${rnd.nextInt(100)}"     // ~0.3% each
      else s"tail-${rnd.nextInt(50000)}"               // singleton-ish
    }
  }

  test("guarantee: every item over N/(k+1) survives, under any merge shape") {
    for (seed <- Seq(1, 7, 23); k <- Seq(64, 256)) {
      val xs = stream(seed, 40000)
      val truth = xs.groupBy(identity).map { case (s, g) => s -> g.size.toLong }
      val threshold = xs.size.toLong / (k + 1L)
      val mustSurvive = truth.filter(_._2 > threshold).keySet
      assert(mustSurvive.nonEmpty, "fixture must exercise the guarantee")

      // shape 1: sequential
      val seq = new MgBuffer(k)
      xs.foreach(seq.add)
      // shape 2: 8-way partitioned, pairwise tree merge
      val parts = xs.grouped(math.max(1, xs.size / 8)).map { chunk =>
        val b = new MgBuffer(k); chunk.foreach(b.add); b
      }.toSeq
      val tree = parts.reduce((a, b) => a.mergeIn(b))

      for ((b, label) <- Seq((seq, "sequential"), (tree, "tree-merged"))) {
        val kept = b.counts.keySet()
        mustSurvive.foreach(i => assert(kept.contains(i),
          s"seed=$seed k=$k $label: '$i' (count ${truth(i)} > $threshold) evicted"))
        // counts never over-estimate and are within N/(k+1) of truth
        b.counts.forEach { (item, est) =>
          assert(est <= truth(item), s"$label over-estimated $item")
          assert(truth(item) - est <= threshold, s"$label bound broken for $item")
        }
        assert(b.counts.size <= k)
      }
    }
  }

  test("serde round-trips the buffer exactly") {
    val agg = MgTopK(org.apache.spark.sql.catalyst.expressions.Literal("x"), 32)
    val b = new MgBuffer(32)
    stream(5, 5000).foreach(b.add)
    val back = agg.deserialize(agg.serialize(b))
    assert(back.k == b.k && back.counts == b.counts)
  }

  test("a token whose UTF-8 exceeds 64 KiB serializes (no writeUTF limit)") {
    val agg = MgTopK(org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    val b = new MgBuffer(8)
    val blob = "é" * 40000 // 80 KB of UTF-8, over the 65535 writeUTF cap
    b.add(blob); b.add(blob); b.add("small")
    val back = agg.deserialize(agg.serialize(b))
    assert(back.counts == b.counts)
  }

  test("sql surface: sketch-then-confirm equals a full exact top-k") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    val xs = stream(11, 30000)
    val df = s.sparkContext.parallelize(xs, 8).toDF("item")
    df.createOrReplaceTempView("mg_items")
    val mg = s.sql("SELECT mg_topk(item, 256) AS m FROM mg_items")
      .head().getMap[String, Long](0)
    val exactTop = xs.groupBy(identity).toSeq
      .map { case (i, g) => (i, g.size.toLong) }
      .sortBy { case (i, c) => (-c, i) }.take(10)
    // candidates must cover the true top-10 (all clear the threshold)
    exactTop.foreach { case (i, c) =>
      assert(mg.contains(i), s"true top item $i (count $c) not nominated")
    }
    assert(mg.size <= 256)
  }
}
