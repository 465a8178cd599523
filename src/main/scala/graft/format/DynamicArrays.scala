package graft.format

/** Growable primitive arrays for write-side buffering (reference
  * DynamicIntArray/DynamicLongArray/DynamicByteArray, M3 in SURVEY §2.7 —
  * here simple doubling arrays; chunking buys nothing on a modern JVM).
  */
final class ByteBuf(initial: Int = 4096) {
  private var arr = new Array[Byte](initial)
  private var n = 0
  def add(b: Array[Byte], off: Int, len: Int): Unit = {
    var cap = arr.length
    while (n + len > cap) cap *= 2
    if (cap != arr.length) arr = java.util.Arrays.copyOf(arr, cap)
    System.arraycopy(b, off, arr, n, len)
    n += len
  }
  def array: Array[Byte] = arr
  def size: Int = n
  def clear(): Unit = n = 0
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
  def clear(): Unit = n = 0
  def memory: Long = arr.length.toLong * 4
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
  def clear(): Unit = n = 0
  def memory: Long = arr.length.toLong * 8
}
