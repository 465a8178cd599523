package graft.format

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}

/** Positional delete vector: the sorted set of row positions (0-based,
  * file order) a data file has logically deleted.
  *
  * This is the merge-on-read half of the DML tier the reference never
  * had (hive-dwrf is append-only — OrcOutputFormat.java writes files,
  * nothing ever edits one): instead of copy-on-write rewriting a whole
  * file to drop one row, a DELETE writes this tiny sidecar and the
  * snapshot-log manifest binds it to the file; scans mask the positions
  * at read time. The Delta deletion-vector / Iceberg positional-delete
  * shape, re-expressed minimally.
  *
  * Wire format (self-describing, version-tagged):
  * {{{
  *   "GDV1"                        4-byte magic
  *   vuint  count                  number of deleted positions
  *   vuint  numRows                row count of the target file (sanity:
  *                                 a DV applied to the wrong file or a
  *                                 rewritten one fails loud, it cannot
  *                                 silently mask the wrong rows)
  *   vuint  first                  first position (absolute)
  *   vuint* gaps                   position[i] - position[i-1], each >= 1
  * }}}
  * Delta-varint over sorted positions: a dense run costs one byte per
  * row, a sparse singleton costs ~3 bytes — either way the sidecar is
  * orders of magnitude smaller than the file it edits.
  */
object DeleteVector {
  private val Magic: Array[Byte] = "GDV1".getBytes("UTF-8")

  /** `positions` must be sorted ascending and distinct, each in
    * `[0, numRows)` — the writer owns that invariant and this fails loud
    * rather than persist a DV that can't round-trip.
    */
  def serialize(positions: Array[Long], numRows: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(16 + positions.length)
    out.write(Magic)
    Serialization.writeVulong(out, positions.length.toLong)
    Serialization.writeVulong(out, numRows)
    var prev = -1L
    var i = 0
    while (i < positions.length) {
      val p = positions(i)
      require(p > prev && p >= 0 && p < numRows,
        s"delete vector positions must be sorted, distinct, in [0, $numRows): " +
          s"saw $p after $prev")
      if (i == 0) Serialization.writeVulong(out, p)
      else Serialization.writeVulong(out, p - prev)
      prev = p
      i += 1
    }
    out.toByteArray
  }

  /** (positions, targetNumRows). */
  def deserialize(bytes: Array[Byte]): (Array[Long], Long) = {
    if (bytes.length < 4 || !Magic.indices.forall(i => bytes(i) == Magic(i)))
      throw new IllegalArgumentException(
        "not a graft delete vector (bad magic)")
    val in = new ByteArrayInputStream(bytes, 4, bytes.length - 4)
    val count = Serialization.readVulong(in)
    // bound the allocation by the byte budget BEFORE sizing it: every
    // position costs at least one varint byte, so a corrupt count can
    // never claim more entries than the sidecar has bytes (the same
    // untrusted-length rule MetaIO.sane enforces on the file format —
    // without it a flipped count varint allocates gigabytes)
    require(count >= 0 && count <= bytes.length - 4,
      s"bad DV count $count for a ${bytes.length}-byte sidecar")
    val numRows = Serialization.readVulong(in)
    val positions = new Array[Long](count.toInt)
    var prev = 0L
    var i = 0
    while (i < count) {
      val v = Serialization.readVulong(in)
      // v <= 0 covers both a zero gap and an oversized varint decoding
      // negative — either would smuggle an out-of-order position past
      // the monotonicity the masking cursor depends on
      if (i > 0 && v <= 0) throw new EOFException(
        s"delete vector gap $v: positions must be strictly increasing")
      prev = if (i == 0) v else prev + v
      // prev < 0 catches both a negatively-decoded oversized varint and
      // additive wraparound — either way the gap stream is corrupt
      if (prev < 0 || prev >= numRows) throw new EOFException(
        s"delete vector position $prev outside target [0, $numRows)")
      positions(i.toInt) = prev
      i += 1
    }
    (positions, numRows)
  }

  /** Just (count, targetNumRows) — planning-time cardinality without
    * materializing the positions.
    */
  def header(bytes: Array[Byte]): (Long, Long) = {
    if (bytes.length < 4 || !Magic.indices.forall(i => bytes(i) == Magic(i)))
      throw new IllegalArgumentException(
        "not a graft delete vector (bad magic)")
    val in = new ByteArrayInputStream(bytes, 4, bytes.length - 4)
    (Serialization.readVulong(in), Serialization.readVulong(in))
  }

  /** Sorted-distinct union of two position sets (a second DELETE merges
    * into the file's existing DV — the manifest binds one DV per file).
    */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c < 0) { out(k) = a(i); i += 1 }
      else if (c > 0) { out(k) = b(j); j += 1 }
      else { out(k) = a(i); i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }
}
