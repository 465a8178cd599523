package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dwrf.TestSpark

/** word_shingle_hashes must be hash-for-hash identical to the
  * declarative pipeline it replaces (array_distinct ∘ transform ∘
  * concat_ws ∘ slice ∘ split → xxhash64), which pins both the
  * split-with-empty-tokens semantics and the XxHash64 seed.
  */
class ShingleHashesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def declarative(n: Int): String = {
    val w = n - 1
    s"""array_distinct(transform(
       |  sequence(1, greatest(size(split(text, ' ')) - $w, 1)),
       |  i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i, $n)))))""".stripMargin
  }

  test("byte-span hashing matches the declarative shingle pipeline exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one", "one two", "one two three four", "one two three four five",
      "double  space   runs", " leading and trailing ", "", "   ",
      "répété unicode ✓ bytes ñ multi byte words here ok",
      "a a a a a a a a a a a", // repeats → distinct collapses
      "tab\tis not a space but stays inside one token"
    ).toDF("text")
    // real corpus too
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
    for (n <- Seq(3, 5); df <- Seq(docs, corpus)) {
      val both = df.select(
        expr(s"word_shingle_hashes(text, $n)").as("fast"),
        expr(declarative(n)).as("slow"))
      val mismatches = both.filter(
        size(array_except($"fast", $"slow")) > 0 ||
        size(array_except($"slow", $"fast")) > 0 ||
        size($"fast") =!= size($"slow")).count()
      assert(mismatches == 0, s"n=$n: shingle hash sets diverge")
    }
  }

  test("minhash_signature matches the explode + k×min aggregate form bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val k = 32
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val fast = docs.select($"doc_id",
      expr(s"minhash_signature(text, 5, $k)").as("sig"))
    val slow = docs
      .select($"doc_id", explode(expr("word_shingle_hashes(text, 5)")).as("bh"))
      .groupBy($"doc_id").agg(
        array((0 until k).map(i => min(xxhash64($"bh", lit(i)))): _*).as("sig"))
    val joined = fast.as("f").join(slow.as("s"), "doc_id")
      .filter($"f.sig" =!= $"s.sig")
    assert(joined.count() == 0, "signatures diverge")
  }
}
