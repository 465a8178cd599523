package graft.format

/** Split-seed Bloom filter over 64-bit value hashes, carried in the file
  * footer's user metadata under `bloom.<column>` (no format change —
  * absent key just means no pruning). Written per column at file close,
  * consulted at PLANNING time by equality/IN predicates: at 100 TB a
  * point lookup on a high-cardinality unsorted column prunes whole
  * files from the listing before any task launches — the pruning rung
  * min/max stats can't provide (a uniform id column's range covers every
  * file). ORC's own BLOOM_FILTER_UTF8 stream is the public precedent
  * (the reference fork predates it); this one lives in metadata so
  * stripe layout and readers are untouched.
  *
  * Probes derive k probe positions from one 64-bit hash by double
  * hashing (h1 + i·h2), the standard Kirsch-Mitzenmacher construction.
  * Sizing: m = ceil(-n·ln p / ln²2) bits for n distinct values at
  * target false-positive rate p, k = round(m/n·ln 2).
  */
final class BloomFilter(val numHashes: Int, val words: Array[Long]) {
  private val mbits: Long = words.length.toLong * 64

  private def h2(h: Long): Long = {
    // finalizer-style mix so the second hash is independent of the first
    var x = h
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  def add(h: Long): Unit = {
    val d = h2(h) | 1L
    var i = 0
    var pos = h
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(pos, mbits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      pos += d
      i += 1
    }
  }

  def mightContain(h: Long): Boolean = {
    val d = h2(h) | 1L
    var i = 0
    var pos = h
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(pos, mbits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      pos += d
      i += 1
    }
    true
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 4 + words.length * 8)
    bb.put(1.toByte).putInt(numHashes).putInt(words.length)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object BloomFilter {
  def sized(nDistinct: Int, fpp: Double): BloomFilter = {
    val n = math.max(1, nDistinct)
    val ln2 = math.log(2)
    val mbits = math.max(64L, math.ceil(-n * math.log(fpp) / (ln2 * ln2)).toLong)
    val words = ((mbits + 63) / 64).toInt
    val k = math.max(1, math.round(words * 64L / n.toDouble * ln2).toInt)
    new BloomFilter(k, new Array[Long](words))
  }

  /** None on an unknown version byte, a truncated buffer, or nonsense
    * header fields — forward-compatible: a newer or foreign writer's
    * filter is simply not used for pruning, never a planning crash. */
  def deserialize(bytes: Array[Byte]): Option[BloomFilter] = {
    if (bytes.length < 1 + 4 + 4) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    if (bb.get() != 1.toByte) return None
    val k = bb.getInt
    val n = bb.getInt
    if (k <= 0 || n <= 0 || bb.remaining() < n.toLong * 8) return None
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = bb.getLong; i += 1 }
    Some(new BloomFilter(k, words))
  }
}

/** Distinct-hash accumulator feeding [[BloomFilter.sized]]: an open-
  * addressing long set (8 bytes per distinct value, power-of-two linear
  * probing) with a hard cap — a column whose distinct count exceeds the
  * cap drops its filter (absent bloom = no pruning, conservative) so
  * writer memory stays bounded no matter the data.
  */
final class BloomAccumulator(maxDistinct: Int) {
  private var table = new Array[Long](1024)
  private var used = 0
  private var hasZero = false
  var overflowed = false

  def add(h: Long): Unit = {
    if (overflowed) return
    if (h == 0L) { if (!hasZero) { hasZero = true; checkCap() }; return }
    var idx = (h ^ (h >>> 32)).toInt & (table.length - 1)
    while (table(idx) != 0L) {
      if (table(idx) == h) return
      idx = (idx + 1) & (table.length - 1)
    }
    table(idx) = h
    used += 1
    checkCap()
    if (used * 2 > table.length) grow()
  }

  private def checkCap(): Unit =
    if (used + (if (hasZero) 1 else 0) > maxDistinct) {
      overflowed = true
      table = new Array[Long](0) // release the memory immediately
    }

  private def grow(): Unit = {
    val old = table
    table = new Array[Long](old.length * 2)
    old.foreach { h =>
      if (h != 0L) {
        var idx = (h ^ (h >>> 32)).toInt & (table.length - 1)
        while (table(idx) != 0L) idx = (idx + 1) & (table.length - 1)
        table(idx) = h
      }
    }
  }

  def size: Int = used + (if (hasZero) 1 else 0)

  def build(fpp: Double): Option[BloomFilter] =
    if (overflowed || size == 0) None
    else {
      val bf = BloomFilter.sized(size, fpp)
      if (hasZero) bf.add(0L)
      table.foreach(h => if (h != 0L) bf.add(h))
      Some(bf)
    }
}
