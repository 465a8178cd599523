package graft.format

/** Growable primitive arrays for write-side buffering (reference
  * DynamicIntArray/DynamicLongArray/DynamicByteArray, M3 in SURVEY §2.7 —
  * here simple doubling arrays; chunking buys nothing on a modern JVM).
  */
final class ByteBuf(initial: Int = 4096) {
  private var arr = new Array[Byte](initial)
  private var n = 0
  def add(b: Array[Byte], off: Int, len: Int): Unit = {
    val need = n.toLong + len
    if (need > Int.MaxValue - 16)
      throw new IllegalStateException(
        s"ByteBuf: single buffer would exceed 2 GB ($need bytes); " +
          "lower stripe.size so the writer flushes sooner")
    var cap = arr.length.toLong
    while (need > cap) cap *= 2
    if (cap != arr.length)
      arr = java.util.Arrays.copyOf(arr, math.min(cap, Int.MaxValue - 16L).toInt)
    System.arraycopy(b, off, arr, n, len)
    n += len
  }
  def array: Array[Byte] = arr
  def size: Int = n
  /** Reset AND release grown capacity: a stripe-sized buffer must not be
    * retained (or keep counting toward the next stripe's memory budget)
    * after flush. */
  def clear(): Unit = {
    n = 0
    if (arr.length > initial) arr = new Array[Byte](initial)
  }
  def memory: Long = arr.length.toLong
}

final class IntBuffer(initial: Int = 1024) {
  private var arr = new Array[Int](initial)
  private var n = 0
  def add(v: Int): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = v; n += 1
  }
  def apply(i: Int): Int = arr(i)
  def inc(i: Int): Unit = arr(i) += 1
  def size: Int = n
  /** Reset AND release grown capacity (same contract as ByteBuf): `memory`
    * reports capacity, so a stripe-sized buffer retained across clear()
    * would keep the flush policy permanently over budget — every
    * subsequent memory check would flush a tiny stripe. */
  def clear(): Unit = {
    n = 0
    if (arr.length > initial) arr = new Array[Int](initial)
  }
  def memory: Long = arr.length.toLong * 4
}

/** Open-address long→dense-id hash over a fixed key set (the sorted
  * dictionary): ids are positions in `keys`. Linear probing, power-of-two
  * capacity at ≤50% load; lookups of keys known to be present never miss
  * indefinitely. Replaces per-row binary searches on the dictionary
  * encode path.
  */
final class LongIdHash(keys: Array[Long]) {
  private val cap = {
    var c = 4
    while (c < keys.length * 2) c <<= 1
    c
  }
  private val mask = cap - 1
  private val table = new Array[Long](cap)
  private val ids = new Array[Int](cap)
  java.util.Arrays.fill(ids, -1)

  private def slot(v: Long): Int = {
    // 64→32 avalanche mix (splitmix64 finalizer), then mask
    var h = v
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h.toInt & mask
  }

  {
    var i = 0
    while (i < keys.length) {
      var s = slot(keys(i))
      while (ids(s) >= 0) s = (s + 1) & mask
      table(s) = keys(i); ids(s) = i
      i += 1
    }
  }

  /** Dense id of `v`; -1 when absent. */
  def apply(v: Long): Int = {
    var s = slot(v)
    while (ids(s) >= 0) {
      if (table(s) == v) return ids(s)
      s = (s + 1) & mask
    }
    -1
  }
}

final class LongBuffer(initial: Int = 1024) {
  private var arr = new Array[Long](initial)
  private var n = 0
  def add(v: Long): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = v; n += 1
  }
  def apply(i: Int): Long = arr(i)
  def size: Int = n
  def toSortedDistinct: Array[Long] = {
    val copy = java.util.Arrays.copyOf(arr, n)
    java.util.Arrays.sort(copy)
    var distinct = 0
    var i = 0
    while (i < n) {
      if (i == 0 || copy(i) != copy(i - 1)) { copy(distinct) = copy(i); distinct += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(copy, distinct)
  }
  /** Reset AND release grown capacity — see IntBuffer.clear. */
  def clear(): Unit = {
    n = 0
    if (arr.length > initial) arr = new Array[Long](initial)
  }
  def memory: Long = arr.length.toLong * 8
}
