package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dwrf.TestSpark

/** word_shingle_hashes must be hash-for-hash identical to the
  * string-level construction it optimizes away: split on a single
  * space (empty tokens kept, split-limit -1 semantics), join each
  * n-token window with a single space, hash the BUILT STRING's UTF-8
  * bytes with the polynomial+splitmix pipeline. The reference below
  * reimplements that independently (String.split + mkString + its own
  * retyped constants — no kernel code shared), so a span-math bug in
  * the kernel (word boundaries, separator stripping, distinctness)
  * cannot hide. The same reference defines what the DuckDB oracles
  * recompute (TextQueries' u64/mul64 HUGEINT emulation).
  */
class ShingleHashesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // independent reference: constants retyped, string-level construction
  private def refMix(v: Long): Long = {
    var z = v + java.lang.Long.parseUnsignedLong("9e3779b97f4a7c15", 16)
    z = (z ^ (z >>> 30)) * java.lang.Long.parseUnsignedLong("bf58476d1ce4e5b9", 16)
    z = (z ^ (z >>> 27)) * java.lang.Long.parseUnsignedLong("94d049bb133111eb", 16)
    z ^ (z >>> 31)
  }

  private def refStrHash(s: String): Long = {
    var h = 0L
    for (b <- s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      h = h * 1000003L + (b & 0xff)
    refMix(h)
  }

  private def refShingles(text: String, n: Int): Seq[Long] = {
    val words = text.split(" ", -1)
    val numShingles = math.max(words.length - (n - 1), 1)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    for (i <- 0 until numShingles)
      out += refStrHash(words.slice(i, i + n).mkString(" "))
    out.toSeq
  }

  private def refMinhash(text: String, n: Int, k: Int): Seq[Long] = {
    val hs = refShingles(text, n)
    (0 until k).map { i =>
      val seed = refMix(i + 1L)
      hs.map(h => refMix(h ^ seed)).min
    }
  }

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one", "one two", "one two three four", "one two three four five",
    "double  space   runs", " leading and trailing ", "", "   ",
    "répété unicode ✓ bytes ñ multi byte words here ok",
    "a a a a a a a a a a a", // repeats → distinct collapses
    "tab\tis not a space but stays inside one token"
  )

  test("byte-span hashing matches the string-level reference exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().toSeq
    for (n <- Seq(3, 5); batch <- Seq(docs, corpus)) {
      val fast = batch.toDF("text")
        .select(expr(s"word_shingle_hashes(text, $n)").as("h"))
        .as[Seq[Long]].collect()
      batch.zip(fast).foreach { case (text, got) =>
        assert(got == refShingles(text, n),
          s"n=$n diverges for ${text.take(60)}")
      }
    }
  }

  test("mix_hash64 matches the reference on words incl. empty/unicode") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val words = docs.flatMap(_.split(" ", -1)).distinct
    val got = words.toDF("w").select(expr("mix_hash64(w)")).as[Long].collect()
    words.zip(got).foreach { case (w, g) =>
      assert(g == refStrHash(w), s"mix_hash64 diverges for '$w'")
    }
  }

  test("minhash_signature matches the explode + k×min reference bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val k = 32
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().toSeq
    val fast = corpus.toDF("text")
      .select(expr(s"minhash_signature(text, 5, $k)").as("sig"))
      .as[Seq[Long]].collect()
    corpus.zip(fast).foreach { case (text, got) =>
      assert(got == refMinhash(text, 5, k),
        s"signature diverges for ${text.take(60)}")
    }
  }
}
