package graft.sources.dwrf

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Durable registry of landing-dir files for [[DwrfMicroBatchStream]],
  * kept under the query's checkpoint location (the same pattern as
  * Spark's FileStreamSource metadata log): every file gets a sequence
  * number the first time a trigger sees it, appended here BEFORE the
  * offset that counts it can be committed. Offsets then index this log,
  * not the live directory listing — so replay after a restart returns
  * byte-identical batches even if already-drained files have since been
  * archived or deleted, which is what makes a retention policy possible
  * at all (with count-into-listing offsets, removing file 0 would shift
  * every index).
  *
  * On-disk format: `<start-seq padded to 20 digits>.log` files of JSON
  * lines `{"path":…,"mtime":…}`, contiguous from 0; each append is
  * written to a `.tmp` and renamed, so a torn write is invisible. A log
  * written but never referenced by a committed offset is harmless — the
  * entries are just consumed by a later batch. Entries are ~100 bytes
  * per ingested file and never rewritten; a deployment ingesting
  * millions of files per checkpoint would add snapshot compaction
  * (Spark's CompactibleFileStreamLog shape) before this becomes
  * measurable.
  */
final class DwrfSourceLog(dir: Path, conf: Configuration) {

  private val fs = dir.getFileSystem(conf)
  private val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
  private val known = scala.collection.mutable.HashSet.empty[String]

  locally {
    if (fs.exists(dir)) {
      val logs = fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.endsWith(".log")).sortBy(_.getName)
      logs.foreach { p =>
        val start = p.getName.stripSuffix(".log").toLong
        require(start == entries.length,
          s"dwrf source log $dir is not contiguous: $p starts at $start " +
            s"but ${entries.length} entries precede it — was the " +
            "checkpoint directory partially deleted?")
        val in = fs.open(p)
        val text = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
          new String(out.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
        text.split('\n').filter(_.nonEmpty).foreach { line =>
          val e = DwrfSourceLog.parse(line)
          entries += e
          known += e._1
        }
      }
    }
  }

  def size: Int = synchronized(entries.length)

  def contains(path: String): Boolean = synchronized(known.contains(path))

  def slice(from: Int, to: Int): IndexedSeq[(String, Long)] =
    synchronized(entries.slice(from, to).toIndexedSeq)

  /** Appends previously-unseen files in their given order, durably, then
    * in memory — so a crash between the two only re-registers nothing.
    */
  def register(fresh: Seq[(String, Long)]): Unit = synchronized {
    if (fresh.isEmpty) return
    val name = f"${entries.length}%020d.log"
    val tmp = new Path(dir, name + ".tmp")
    val dst = new Path(dir, name)
    fs.mkdirs(dir)
    val out = fs.create(tmp, true)
    try out.write(fresh.map(DwrfSourceLog.render).mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, dst)) throw new java.io.IOException(
      s"dwrf source log: could not commit $tmp -> $dst")
    fresh.foreach { e => entries += e; known += e._1 }
  }
}

private[dwrf] object DwrfSourceLog {
  // control characters must be escaped too: the log is line-oriented, so
  // a raw '\n' inside a path would tear the entry and poison every
  // restart's parse of the remainder of that log file
  private def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
  private def unesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b += '\n'; i += 2
          case 'r' => b += '\r'; i += 2
          case 'u' if i + 5 < s.length =>
            b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case c => b += c; i += 2
        }
      } else { b += s.charAt(i); i += 1 }
    }
    b.toString
  }

  def render(e: (String, Long)): String =
    s"""{"path":"${esc(e._1)}","mtime":${e._2}}"""

  private val Re = """\{"path":"(.*)","mtime":(\d+)\}""".r
  def parse(line: String): (String, Long) = line match {
    case Re(p, m) => (unesc(p), m.toLong)
    case _ => throw new IllegalArgumentException(s"bad dwrf source log line: $line")
  }
}
