package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hash values of a document's word n-gram shingles, computed
  * over byte SPANS of the original text — zero per-shingle string
  * building.
  *
  * The span hash is [[FingerprintKernel.strHash]] (polynomial base
  * 1000003 over the raw bytes, splitmix64 tail): splitting on a single
  * space and re-joining any token window with a single space reproduces
  * the original byte span verbatim (empty tokens from runs of spaces
  * included), so hashing the span equals hashing the built shingle
  * string — only the per-shingle UTF8String/array allocations and the
  * O(words²) slice copies disappear (ShingleHashesSpec pins the
  * contract against an independent string-level reference).
  * Distinctness is by hash (string-level dedup is equivalent modulo
  * 64-bit collisions, the regime the pair counting already accepts).
  * strHash over xxhash64 because the DuckDB oracle recomputes it
  * bit-for-bit, making the MinHash candidate set three-way checkable.
  * Kept in a plain object so generated code can call it statically.
  */
object ShingleKernel {

  def compute(s: UTF8String, n: Int): GenericArrayData =
    new GenericArrayData(distinctHashes(s, n))

  /** Permutation-i seed for the MinHash chain: splitmix of the index.
    * Public so the spec's independent aggregate form and the DuckDB
    * oracle derivation stay definitionally in sync.
    */
  def permSeed(i: Int): Long = FingerprintKernel.mix(i + 1L)

  /** MinHash signature in the same single pass: element i is the signed
    * min over the distinct shingle hashes of mix(h ^ permSeed(i)) — k
    * independent splitmix-derived permutations, bit-identical to the
    * explode + k×min aggregate form (ShingleHashesSpec), with no explode
    * and NO shuffle (the groupBy disappears). Like the base hash, the
    * chain is plain wrapping arithmetic, so the DuckDB oracle recomputes
    * whole signatures exactly.
    */
  def minhashSignature(s: UTF8String, n: Int, k: Int): GenericArrayData = {
    val hashes = distinctHashes(s, n)
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seed = permSeed(i)
      var m = Long.MaxValue
      var j = 0
      while (j < hashes.length) {
        val h = FingerprintKernel.mix(hashes(j) ^ seed)
        if (h < m) m = h
        j += 1
      }
      sig(i) = m
      i += 1
    }
    new GenericArrayData(sig)
  }

  private[functions] def distinctHashes(s: UTF8String, n: Int): Array[Long] = {
    val bytes = s.getBytes
    val len = bytes.length
    // word starts: 0 and every position after a space (split-with-
    // limit=-1 semantics: empty tokens, trailing ones included, count)
    var numWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') numWords += 1; i += 1 }
    val starts = new Array[Int](numWords + 1)
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(numWords) = len + 1 // sentinel: word j spans starts(j)..starts(j+1)-2
    val numShingles = math.max(numWords - (n - 1), 1)
    val seen = new java.util.HashSet[java.lang.Long](numShingles * 2)
    val out = new Array[Long](numShingles)
    var m = 0
    var j = 0
    while (j < numShingles) {
      val start = starts(j)
      val lastWord = math.min(j + n - 1, numWords - 1)
      val end = starts(lastWord + 1) - 1 // exclusive (strip the separator)
      val h = FingerprintKernel.strHash(bytes, start, end)
      if (seen.add(h)) { out(m) = h; m += 1 }
      j += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }
}

/** Catalyst expression for [[ShingleKernel]] — native and codegen'd
  * (stays inside whole-stage codegen; no UDF serialization), same shape
  * as [[DocFingerprint]].
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hashes"
}

/** Whole MinHash signature per document as one native expression: the
  * signature pass becomes a shuffle-free narrow Project (no explode, no
  * groupBy) — at 100 TB the k×min aggregation shuffle this replaces was
  * the signature stage's entire cost.
  */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.minhashSignature(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.minhashSignature($c, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}
