package graft.sources.dwrf

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.format._

/** File introspection CLI — the reference's FileDump (S11,
  * FileDump.java:114-141): prints rows, compression, schema, per-stripe
  * geometry, stream directory, encodings and column statistics. Doubles
  * as the golden-structural-test surface (SURVEY §5.3).
  *
  * Usage: runMain graft.sources.dwrf.DwrfDump <file-or-dir> [...]
  */
object DwrfDump {
  def main(args: Array[String]): Unit = {
    val conf = new Configuration()
    args.flatMap(a => DwrfUtil.listDataFiles(new Path(a), conf))
      .foreach(p => print(dump(p, conf)))
  }

  def dump(path: Path, conf: Configuration): String = {
    val sb = new StringBuilder
    val r = new DwrfFileReader(path, conf)
    try {
      val f = r.footer
      sb.append(s"Structure for $path\n")
      sb.append(s"Rows: ${f.numRows}\n")
      sb.append(s"Compression: ${r.postScript.compression.name}\n")
      if (r.postScript.compression != CompressionKind.None)
        sb.append(s"Compression size: ${r.postScript.blockSize}\n")
      sb.append(s"Row index stride: ${f.rowIndexStride}\n")
      sb.append(s"Raw data size: ${f.rawDataSize}\n")
      sb.append(s"Type: ${r.schema.simpleString}\n")
      sb.append("\nStatistics:\n")
      f.fileStats.toSeq.sortBy(_._1).foreach { case (col, st) =>
        sb.append(s"  Column $col: ${renderStats(st)}\n")
      }
      sb.append("\nStripes:\n")
      f.stripes.zipWithIndex.foreach { case (si, i) =>
        sb.append(s"  Stripe $i: offset: ${si.offset} index: ${si.indexLength} " +
          s"data: ${si.dataLength} footer: ${si.footerLength} rows: ${si.numRows}\n")
        val sf = r.readStripeFooter(si)
        sf.streams.foreach { s =>
          sb.append(f"    Stream: column ${s.column}%d kind ${kindName(s.kind)}%-24s length ${s.length}%d\n")
        }
        sf.encodings.toSeq.sortBy(_._1).foreach { case (col, e) =>
          val enc = if (e.dictionary) s"DICTIONARY[${e.dictionarySize}]" else "DIRECT"
          sb.append(s"    Encoding column $col: $enc\n")
        }
      }
      sb.toString
    } finally r.close()
  }

  private def kindName(k: Int): String = k match {
    case StreamKind.Present => "PRESENT"
    case StreamKind.Data => "DATA"
    case StreamKind.Length => "LENGTH"
    case StreamKind.DictionaryData => "DICTIONARY_DATA"
    case StreamKind.NanoData => "NANO_DATA"
    case StreamKind.InDictionary => "IN_DICTIONARY"
    case StreamKind.StrideDictionary => "STRIDE_DICTIONARY"
    case StreamKind.StrideDictionaryLength => "STRIDE_DICTIONARY_LENGTH"
    case StreamKind.RowIndex => "ROW_INDEX"
    case other => s"UNKNOWN($other)"
  }

  private def renderStats(st: ColumnStats): String = {
    val parts = scala.collection.mutable.ArrayBuffer(s"count: ${st.count}")
    if (st.hasNull) parts += "hasNull: true"
    if (st.longMin <= st.longMax)
      parts += s"min: ${st.longMin} max: ${st.longMax} sum: ${st.longSum}"
    if (st.doubleMin <= st.doubleMax)
      parts += s"min: ${st.doubleMin} max: ${st.doubleMax} sum: ${st.doubleSum}"
    if (st.stringMin != null)
      parts += s"min: ${st.stringMin} max: ${st.stringMax}"
    if (st.totalLength > 0) parts += s"totalLength: ${st.totalLength}"
    if (st.trueCount > 0) parts += s"trueCount: ${st.trueCount}"
    parts.mkString(", ")
  }
}

/** Raw-stripe concatenation — the reference's fast file merge (S3/S4,
  * StripeReader.java:32-92 + WriterImpl.addStripe:2183-2196): stripes are
  * copied as opaque byte ranges (no decode), the new footer's stripe
  * directory is rebuilt with fixed-up offsets, and file stats merge.
  * Inputs must share schema, compression kind and block size.
  *
  * Usage: runMain graft.sources.dwrf.DwrfConcat <out.dwrf> <in...>
  */
object DwrfConcat {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DwrfConcat <out> <in...>")
    val conf = new Configuration()
    val inputs = args.tail.flatMap(a => DwrfUtil.listDataFiles(new Path(a), conf))
    concat(new Path(args.head), inputs.toIndexedSeq, conf)
    println(s"wrote ${args.head} from ${inputs.length} inputs")
  }

  def concat(out: Path, inputs: Seq[Path], conf: Configuration): Unit = {
    require(inputs.nonEmpty, "no inputs")
    val readers = inputs.map(p => new DwrfFileReader(p, conf))
    try {
      val first = readers.head
      readers.tail.foreach { r =>
        require(r.footer.schemaJson == first.footer.schemaJson,
          s"schema mismatch: ${inputs.head} vs ${inputs(readers.indexOf(r))}")
        require(r.postScript.compression == first.postScript.compression &&
          r.postScript.blockSize == first.postScript.blockSize,
          "compression mismatch between inputs")
        require(r.postScript.useVInts == first.postScript.useVInts,
          "vints mode mismatch between inputs")
        // stride dictionaries and seeks are stride-relative: stripes
        // written under a different stride would decode wrong
        require(r.footer.rowIndexStride == first.footer.rowIndexStride,
          "row index stride mismatch between inputs")
      }
      val fs = out.getFileSystem(conf)
      val os = fs.create(out, true)
      var written = 0L
      def write(b: Array[Byte], len: Int): Unit = { os.write(b, 0, len); written += len }
      write(Magic.Bytes, Magic.Bytes.length)

      val newStripes = scala.collection.mutable.ArrayBuffer.empty[StripeInformation]
      var mergedStats = Map.empty[Int, ColumnStats]
      var numRows = 0L
      var rawSize = 0L
      val buf = new Array[Byte](1 << 20)
      readers.foreach { r =>
        val in = r.openRaw()
        r.footer.stripes.foreach { si =>
          val newOffset = written
          var remaining = si.indexLength + si.dataLength + si.footerLength
          var pos = si.offset
          while (remaining > 0) {
            val n = math.min(remaining, buf.length.toLong).toInt
            in.readFully(pos, buf, 0, n)
            write(buf, n)
            pos += n
            remaining -= n
          }
          newStripes += si.copy(offset = newOffset)
        }
        numRows += r.footer.numRows
        rawSize += r.footer.rawDataSize
        mergedStats =
          (mergedStats.keySet ++ r.footer.fileStats.keySet).map { k =>
            (mergedStats.get(k), r.footer.fileStats.get(k)) match {
              case (Some(a), Some(b)) => k -> a.merge(b)
              case (Some(a), None) => k -> a
              case (None, Some(b)) => k -> b
              case _ => k -> ColumnStats(0, hasNull = false)
            }
          }.toMap
      }

      val footer = Footer(first.footer.schemaJson, newStripes.toSeq, mergedStats,
        numRows, first.footer.rowIndexStride, rawSize, Map.empty)
      val codecKind = first.postScript.compression
      val fOut = new OutStream("footer", first.postScript.blockSize,
        CompressionCodec.forKind(codecKind, first.postScript.writerZlibLevel))
      MetaIO.writeFooter(fOut, footer)
      val fBytes = fOut.finish()
      write(fBytes, fBytes.length)
      val bos = new java.io.ByteArrayOutputStream()
      val psBytes = MetaIO.writePostScript(bos, PostScript(fBytes.length.toLong,
        codecKind, first.postScript.blockSize, Magic.Version,
        first.postScript.writerZlibLevel, first.postScript.useVInts))
      write(psBytes, psBytes.length)
      os.write(psBytes.length)
      os.close()
    } finally readers.foreach(_.close())
  }
}
