package graft.sources.dwrf

import java.io.OutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

import graft.format._

/** Writer configuration, mirroring the reference's OrcConf defaults
  * (OrcConf.java:31-64) with the same option names a user of the
  * reference would recognize.
  */
final case class DwrfWriteOptions(
    kind: CompressionKind = CompressionKind.Zlib,
    blockSize: Int = 256 * 1024,
    stripeSize: Long = 256L * 1024 * 1024,
    rowIndexStride: Int = 10000,
    zlibLevel: Int = 4,
    dictionaryKeyNumericThreshold: Double = 0.7,
    dictionaryKeyStringThreshold: Double = 0.8,
    dictionaryEnabled: Boolean = true,
    // A1 carried-over encoding interval (reference OrcConf.java:53
    // HIVE_ORC_DICTIONARY_ENCODING_INTERVAL, WriterImpl.java:790-792):
    // the dict-vs-direct decision is recomputed only on every
    // interval-th stripe and carried over in between; carried-over
    // DIRECT stripes skip value buffering / dictionary population
    // entirely (WriterImpl useCarriedOverDirectEncoding,
    // WriterImpl.java:860-865). Default 1 = re-decide per stripe (the
    // repo's strictly-more-adaptive divergence, SURVEY §2.4); set 30
    // for the reference's behavior.
    encodingInterval: Int = 1,
    maxDictionarySize: Long = 100L * 1024 * 1024,
    // A3: mid-stripe dictionary abandonment once the accumulating
    // dictionary is provably useless AND its bookkeeping crosses this
    // many bytes (reference WriterImpl dict→direct conversion under
    // MemoryManager pressure)
    dictionaryAbandonBytes: Long = 32L * 1024 * 1024,
    strideDictionaryEnabled: Boolean = true,
    useVInts: Boolean = true,
    sortDictionaryKeys: Boolean = true,
    // entropy heuristic for string encoding selection (reference A2,
    // OrcConf.java:46-51): below entropyKeySizeThreshold repetition the
    // dictionary must also clear a character-diversity bar to be worth it
    entropyKeySizeThreshold: Double = 0.9,
    entropyMinSamples: Int = 100,
    entropyDictSampleFraction: Double = 0.001,
    entropyStringThreshold: Int = 20,
    // per-file Bloom filters for equality pruning at planning time
    // (bloom.columns=a,b); carried in footer user metadata, see
    // graft.format.BloomFilter
    bloomColumns: Seq[String] = Nil,
    bloomFpp: Double = 0.02,
    bloomMaxDistinct: Int = 1000000,
    // per-STRIDE Bloom filters alongside the per-file one (bloom.stride,
    // default on whenever bloom.columns is set): a BLOOM_FILTER index
    // stream per bloom'd column lets equality/IN predicates prune
    // row-index strides INSIDE surviving files — the rung file-level
    // blooms can't provide once a 100 TB table's files each hold the
    // sought key's hash. Memory is bounded by the stride: at most
    // rowIndexStride distinct hashes accumulate per column at a time.
    bloomStride: Boolean = true) {
  /** Runtime pressure flags (NOT configuration — deliberately outside
    * case-class equality): set by [[DwrfMemoryGovernor]] when the
    * executor's writer pool oversubscribes; consulted by the zlib level
    * provider and the dictionary writers. One instance per options value,
    * shared by the whole TreeWriter tree it configures.
    */
  val pressure = new DwrfWritePressure

  /** Effective zlib level: escalates to ≥ 6 under memory pressure
    * (reference `WriterImpl.enterLowMemoryMode`) — evaluated per
    * compressed block, so in-flight writers tighten immediately.
    */
  def zlibLevelNow: Int =
    if (pressure.lowMemory) math.max(6, zlibLevel) else zlibLevel
}

object DwrfWriteOptions {
  /** Parse `.option(...)` strings (names follow OrcConf / OrcFile).
    * `orc.`-, `hive.exec.orc.`- and `hive.exec.orc.default.`-prefixed
    * spellings are accepted as aliases, so option names a reference user
    * already passes keep working unchanged. Conflicting spellings of the
    * same option (different values) are an error, not a silent
    * last-writer-wins.
    */
  def fromMap(raw: collection.Map[String, String]): DwrfWriteOptions = {
    val m = scala.collection.mutable.Map.empty[String, String]
    raw.foreach { case (k0, v) =>
      val k = k0.stripPrefix("hive.exec.orc.default.")
        .stripPrefix("hive.exec.orc.").stripPrefix("orc.")
      m.get(k) match {
        case Some(prev) if prev != v => throw new IllegalArgumentException(
          s"dwrf: conflicting spellings of option '$k': '$prev' vs '$v'")
        case _ => m(k) = v
      }
    }
    val d = DwrfWriteOptions()
    DwrfWriteOptions(
      kind = m.get("compress").map(CompressionKind.fromName).getOrElse(d.kind),
      blockSize = m.get("compress.size").map(_.toInt).getOrElse(d.blockSize),
      stripeSize = m.get("stripe.size").map(_.toLong).getOrElse(d.stripeSize),
      rowIndexStride = m.get("row.index.stride").map(_.toInt)
        .orElse(m.get("create.index").collect { case s if !s.toBoolean => 0 })
        .getOrElse(d.rowIndexStride),
      zlibLevel = m.get("compress.zlib.level").map(_.toInt).getOrElse(d.zlibLevel),
      dictionaryKeyNumericThreshold = m.get("dictionary.key.numeric.size.threshold")
        .map(_.toDouble).getOrElse(d.dictionaryKeyNumericThreshold),
      dictionaryKeyStringThreshold = m.get("dictionary.key.string.size.threshold")
        .map(_.toDouble).getOrElse(d.dictionaryKeyStringThreshold),
      dictionaryEnabled = m.get("dictionary.enabled").map(_.toBoolean)
        .getOrElse(d.dictionaryEnabled),
      encodingInterval = m.get("encoding.interval").map(_.toInt)
        .getOrElse(d.encodingInterval),
      maxDictionarySize = m.get("max.dictionary.size").map(_.toLong)
        .getOrElse(d.maxDictionarySize),
      dictionaryAbandonBytes = m.get("dictionary.abandon.bytes").map(_.toLong)
        .getOrElse(d.dictionaryAbandonBytes),
      strideDictionaryEnabled = m.get("use.stride.dictionaries").map(_.toBoolean)
        .getOrElse(d.strideDictionaryEnabled),
      useVInts = m.get("use.vints").map(_.toBoolean).getOrElse(d.useVInts),
      sortDictionaryKeys = m.get("dictionary.sort.keys").map(_.toBoolean)
        .getOrElse(d.sortDictionaryKeys),
      entropyKeySizeThreshold = m.get("entropy.key.string.size.threshold")
        .map(_.toDouble).getOrElse(d.entropyKeySizeThreshold),
      entropyMinSamples = m.get("entropy.string.min.samples")
        .map(_.toInt).getOrElse(d.entropyMinSamples),
      entropyDictSampleFraction = m.get("entropy.string.dict.sample.fraction")
        .map(_.toDouble).getOrElse(d.entropyDictSampleFraction),
      entropyStringThreshold = m.get("entropy.string.threshold")
        .map(_.toInt).getOrElse(d.entropyStringThreshold),
      bloomColumns = m.get("bloom.columns")
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(d.bloomColumns),
      bloomFpp = m.get("bloom.fpp").map(_.toDouble).getOrElse(d.bloomFpp),
      bloomMaxDistinct = m.get("bloom.max.distinct").map(_.toInt)
        .getOrElse(d.bloomMaxDistinct),
      bloomStride = m.get("bloom.stride").map(_.toBoolean)
        .getOrElse(d.bloomStride))
  }
}

/** Value hashing shared by the bloom writer and the planning-time probe —
  * both sides MUST hash identical bytes: strings as their UTF-8 bytes,
  * every integral width as its widened long.
  */
private[dwrf] object DwrfBloom {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.types.UTF8String

  val MetaPrefix = "bloom."
  private val Seed = 0x9747b28cL

  def supported(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType => true
    case d: DecimalType if d.precision <= 18 => true
    case _ => false
  }

  def hashString(u: UTF8String): Long =
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), Seed)

  def hashLong(v: Long): Long = XXH64.hashLong(v, Seed)

  /** Hash of a planning-time filter value (external Scala type), None
    * when the value's type doesn't match the column (no pruning then). */
  def hashFilterValue(dt: DataType, v: Any): Option[Long] = (dt, v) match {
    case (StringType, s: String) => Some(hashString(UTF8String.fromString(s)))
    // runtime V2 filters (broadcast-join IN sets) carry internal values
    case (StringType, u: UTF8String) => Some(hashString(u))
    case (ByteType, n: Byte) => Some(hashLong(n.toLong))
    case (ShortType, n: Short) => Some(hashLong(n.toLong))
    case (IntegerType, n: Int) => Some(hashLong(n.toLong))
    case (LongType, n: Long) => Some(hashLong(n))
    case (d: DecimalType, _) =>
      // a value that doesn't rescale exactly can't equal any stored one,
      // but "prune" needs the writer's hash space — stay conservative
      StatsFilter.decimalUnscaled(v, d.scale).map(hashLong)
    case _ => None
  }
}

/** Writes one GRFT (DWRF-style) file: stripes of encoded column streams,
  * then footer + postscript (reference WriterImpl write path, SURVEY §3.2).
  *
  * Scale design: memory is bounded by `stripeSize` (estimated buffered
  * bytes trigger a stripe flush), so a 1000-task write of 100 TB holds
  * only one stripe of one file per task in memory — no global coordination
  * (the reference's cross-writer MemoryManager is unnecessary under
  * Spark's per-task memory model, SURVEY §2.4/A4 note).
  */
final class DwrfFileWriter(
    schema: StructType,
    opts: DwrfWriteOptions,
    rawOut: OutputStream) {

  private var bytesWritten = 0L
  private val out = new OutputStream {
    override def write(b: Int): Unit = { rawOut.write(b); bytesWritten += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      rawOut.write(b, off, len); bytesWritten += len
    }
  }

  private val root = new StructTreeWriter(0, schema, opts)

  // bloom accumulation reads top-level values straight off the row —
  // fully decoupled from the encoder tree (one getter per column per row).
  // `ordinal` indexes the row; `treeId` names the column in stream/stats
  // space (what the reader's statIdByPath resolves filter attrs to).
  private final class BloomColumn(val ordinal: Int, val treeId: Int,
      val dt: DataType) {
    val fileAcc = new graft.format.BloomAccumulator(opts.bloomMaxDistinct)
    // per-stride state (bloom.stride): bounded by the stride row count,
    // flushed to `strideBlooms` at every row-index boundary
    var strideAcc: graft.format.BloomAccumulator =
      if (strideBloomsOn) new graft.format.BloomAccumulator(strideCap) else null
    val strideBlooms =
      scala.collection.mutable.ArrayBuffer.empty[Option[graft.format.BloomFilter]]
    def add(h: Long): Unit = {
      fileAcc.add(h)
      if (strideAcc != null) strideAcc.add(h)
    }
    def closeStride(): Unit = if (strideAcc != null) {
      strideBlooms += strideAcc.build(opts.bloomFpp)
      strideAcc = new graft.format.BloomAccumulator(strideCap)
    }
  }
  private def strideBloomsOn: Boolean =
    opts.bloomStride && opts.rowIndexStride > 0
  private def strideCap: Int = opts.rowIndexStride

  private val bloomAccs: Seq[BloomColumn] =
    opts.bloomColumns.map { name =>
      val i = schema.fieldNames.indexOf(name)
      require(i >= 0, s"bloom.columns: no such column '$name'")
      require(DwrfBloom.supported(schema.fields(i).dataType),
        s"bloom.columns: unsupported type ${schema.fields(i).dataType.simpleString} " +
          s"for '$name' (string and integral columns only)")
      new BloomColumn(i, ColumnTree.topLevelIds(schema)(i),
        schema.fields(i).dataType)
    }
  private val stripes = scala.collection.mutable.ArrayBuffer.empty[StripeInformation]
  private val stripeStatsHistory = scala.collection.mutable.ArrayBuffer.empty[Map[Int, ColumnStats]]
  private var rowsInStripe = 0L
  private var totalRows = 0L
  private var rowsSinceMemCheck = 0
  private var closed = false

  // ---- write-path profiler (reference M5's ENCODING/SERIALIZATION/
  // COMPRESSION_TIME write counters, ReaderWriterProfiler.java:32-52).
  // Stripe finalize time is measured exactly (amortized: one nanoTime
  // pair per flush); the per-row encode path is SAMPLED 1-in-64 and
  // scaled — an always-on nanoTime pair per row would itself cost a
  // measurable slice of the encode budget. Compression time accrues in
  // format.WriteProfile (thread-local, one pair per compressed block)
  // and is drained by the DataWriter layer, not here.
  private var flushNanosAcc = 0L
  private var encodeSampleNanosAcc = 0L

  // cross-writer memory governance (A3/A4 full form): registered for the
  // writer's life; close()/release() both unregister (idempotent)
  private val gReg = DwrfMemoryGovernor.register(opts.stripeSize)

  /** Exact nanos spent finalizing stripes + the footer (encode flush,
    * index/footer serialization, compression, IO). */
  def flushNanos: Long = flushNanosAcc
  /** Estimated nanos in the per-row encode path (1-in-64 sample × 64). */
  def encodeNanosEst: Long = encodeSampleNanosAcc * 64
  def stripesFlushed: Int = stripes.size
  def bytesOut: Long = bytesWritten
  /** Estimated bytes buffered in the open stripe (M2 estimate) — lets a
    * file-rolling sink bound projected file size as bytesOut + this. */
  def bufferedMemory: Long = root.memory

  // file header
  out.write(Magic.Bytes)

  def addRow(row: InternalRow): Unit = {
    val sampled = (totalRows & 63) == 0
    val t0 = if (sampled) System.nanoTime() else 0L
    // guard the encode sample against a stripe flush landing inside it
    // (×64 scaling would wildly inflate encodeNanosEst). As the
    // boundaries stand it cannot: samples fire at rows ≡ 0 (mod 64)
    // pre-increment while the budget check fires at rows ≡ 63 (mod 64)
    // (rowsSinceMemCheck hits 1024 one row earlier than the sample
    // stride). The subtraction stays anyway — it is one long read per
    // sampled row and keeps the metric honest if either cadence changes.
    val f0 = if (sampled) flushNanosAcc else 0L
    if (opts.rowIndexStride > 0 && rowsInStripe % opts.rowIndexStride == 0) {
      root.recordStride()
      // the previous stride is complete: seal its blooms (row 0 of a
      // stripe has no previous stride; the stripe's LAST stride is
      // sealed by flushStripe)
      if (rowsInStripe > 0) bloomAccs.foreach(_.closeStride())
    }
    bloomAccs.foreach { bc =>
      val i = bc.ordinal
      if (!row.isNullAt(i)) bc.dt match {
        case StringType => bc.add(DwrfBloom.hashString(row.getUTF8String(i)))
        case ByteType => bc.add(DwrfBloom.hashLong(row.getByte(i).toLong))
        case ShortType => bc.add(DwrfBloom.hashLong(row.getShort(i).toLong))
        case IntegerType => bc.add(DwrfBloom.hashLong(row.getInt(i)))
        case LongType => bc.add(DwrfBloom.hashLong(row.getLong(i)))
        case d: DecimalType => bc.add(DwrfBloom.hashLong(
          row.getDecimal(i, d.precision, d.scale).toUnscaledLong))
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }
    root.writeRoot(row)
    rowsInStripe += 1
    totalRows += 1
    rowsSinceMemCheck += 1
    if (rowsSinceMemCheck >= 1024) {
      rowsSinceMemCheck = 0
      DwrfMemoryGovernor.addedRows(1024)
      // governor pressure first: abandon dictionaries + escalate zlib
      // BEFORE deciding the flush, so the relief applies to this stripe
      if (DwrfMemoryGovernor.lowMemory && !opts.pressure.lowMemory) {
        opts.pressure.lowMemory = true
        root.enterLowMemory()
      }
      // governed stripe budget (stripeSize × pool scale × rebalance
      // multiplier — plain stripeSize when this is the only writer),
      // plus the reference's dictionary-memory cap (A4, OrcConf
      // hive.exec.orc.max.dictionary.size = 100 MB)
      if (root.memory >= DwrfMemoryGovernor.budgetFor(gReg) ||
          root.dictionaryMemory >= opts.maxDictionarySize) {
        DwrfMemoryGovernor.noteFlush(gReg)
        flushStripe()
      }
    }
    if (sampled)
      encodeSampleNanosAcc += (System.nanoTime() - t0) - (flushNanosAcc - f0)
  }

  /** Close the current stripe regardless of the memory policy (empty
    * stripe = no-op). Lets tests and tools pin exact stripe boundaries,
    * e.g. to exercise the A1 carried-over encoding interval.
    */
  private[dwrf] def forceStripeFlush(): Unit = flushStripe()

  private def flushStripe(): Unit = {
    if (rowsInStripe == 0) return
    val tFlush0 = System.nanoTime()
    val stripeOffset = bytesWritten
    val flushes: Seq[(Int, ColumnFlush)] = root.flushStripe()
    val byColumn = flushes.toMap

    // index area: one ROW_INDEX stream per column with entries
    var indexLength = 0L
    val indexStreams = scala.collection.mutable.ArrayBuffer.empty[StreamInfo]
    if (opts.rowIndexStride > 0) {
      flushes.foreach { case (col, cf) =>
        if (cf.indexEntries.nonEmpty) {
          val os = new OutStream(s"col$col/rowindex", opts.blockSize,
            CompressionCodec.forKindDynamic(opts.kind, () => opts.zlibLevelNow))
          MetaIO.writeRowIndex(os, cf.indexEntries)
          val b = os.finish()
          out.write(b, 0, b.length)
          indexStreams += StreamInfo(col, StreamKind.RowIndex, b.length.toLong)
          indexLength += b.length
        }
      }
      // BLOOM_FILTER index streams, physically after every ROW_INDEX
      // stream (readers walk the index area in sf.streams order)
      bloomAccs.foreach { bc =>
        if (bc.strideAcc != null) {
          bc.closeStride() // the stripe's last (possibly partial) stride
          val os = new OutStream(s"col${bc.treeId}/bloom", opts.blockSize,
            CompressionCodec.forKindDynamic(opts.kind, () => opts.zlibLevelNow))
          MetaIO.writeStrideBlooms(os, bc.strideBlooms.toSeq)
          val b = os.finish()
          out.write(b, 0, b.length)
          indexStreams += StreamInfo(bc.treeId, StreamKind.BloomFilter, b.length.toLong)
          indexLength += b.length
          bc.strideBlooms.clear()
        }
      }
    }

    // data area: streams in (column, kind) order as flushed
    var dataLength = 0L
    val dataStreams = scala.collection.mutable.ArrayBuffer.empty[StreamInfo]
    flushes.foreach { case (_, cf) =>
      cf.streams.foreach { fs =>
        out.write(fs.bytes, 0, fs.bytes.length)
        dataStreams += fs.info
        dataLength += fs.bytes.length
      }
    }

    // stripe footer
    val sf = StripeFooter(
      streams = indexStreams.toSeq ++ dataStreams.toSeq,
      encodings = flushes.map { case (col, cf) => col -> cf.encoding }.toMap,
      stats = flushes.map { case (col, cf) => col -> cf.stats }.toMap)
    val sfOut = new OutStream("stripe-footer", opts.blockSize,
      CompressionCodec.forKindDynamic(opts.kind, () => opts.zlibLevelNow))
    MetaIO.writeStripeFooter(sfOut, sf)
    val sfBytes = sfOut.finish()
    out.write(sfBytes, 0, sfBytes.length)

    stripes += StripeInformation(stripeOffset, indexLength, dataLength,
      sfBytes.length.toLong, rowsInStripe)
    stripeStatsHistory += byColumn.map { case (c, cf) => c -> cf.stats }
    rowsInStripe = 0
    flushNanosAcc += System.nanoTime() - tFlush0
  }

  /** Logical (uncompressed) data size per reference RawDatasizeConst. */
  private def rawDataSize(fileStats: Map[Int, ColumnStats]): Long = {
    def sizeOf(dt: DataType, id: Int): Long = {
      val st = fileStats.getOrElse(id, ColumnStats(0, hasNull = false))
      dt match {
        case BooleanType | ByteType => st.count
        case ShortType => 2 * st.count
        case IntegerType | FloatType | DateType => 4 * st.count
        case LongType | DoubleType | TimestampType | TimestampNTZType => 8 * st.count
        case StringType | BinaryType => st.totalLength + 4 * st.count
        case s: StructType =>
          var child = id + 1
          s.fields.map { f =>
            val sz = sizeOf(f.dataType, child)
            child += ColumnTree.subtreeSize(f.dataType)
            sz
          }.sum
        case a: ArrayType => 4 * st.count + sizeOf(a.elementType, id + 1)
        case m: MapType =>
          4 * st.count + sizeOf(m.keyType, id + 1) +
            sizeOf(m.valueType, id + 1 + ColumnTree.subtreeSize(m.keyType))
        case _ => 0L
      }
    }
    sizeOf(schema, 0)
  }

  def close(userMetadata: Map[String, Array[Byte]] = Map.empty): Unit = {
    if (closed) return
    closed = true
    flushStripe()
    val tFoot0 = System.nanoTime()
    // merge file stats across stripes
    val fileStats: Map[Int, ColumnStats] =
      stripeStatsHistory.foldLeft(Map.empty[Int, ColumnStats]) { (acc, m) =>
        (acc.keySet ++ m.keySet).map { k =>
          (acc.get(k), m.get(k)) match {
            case (Some(a), Some(b)) => k -> a.merge(b)
            case (Some(a), None) => k -> a
            case (None, Some(b)) => k -> b
            case _ => k -> ColumnStats(0, hasNull = false)
          }
        }.toMap
      }
    val bloomMeta: Map[String, Array[Byte]] = bloomAccs.flatMap { bc =>
      bc.fileAcc.build(opts.bloomFpp).map(bf =>
        (DwrfBloom.MetaPrefix + schema.fields(bc.ordinal).name) -> bf.serialize())
    }.toMap
    val footer = Footer(
      schemaJson = schema.json,
      stripes = stripes.toSeq,
      fileStats = fileStats,
      numRows = totalRows,
      rowIndexStride = opts.rowIndexStride,
      rawDataSize = rawDataSize(fileStats),
      userMetadata = userMetadata ++ bloomMeta)
    val fOut = new OutStream("footer", opts.blockSize,
      CompressionCodec.forKindDynamic(opts.kind, () => opts.zlibLevelNow))
    MetaIO.writeFooter(fOut, footer)
    val fBytes = fOut.finish()
    out.write(fBytes, 0, fBytes.length)
    val psBytes = MetaIO.writePostScript(out, PostScript(
      footerLength = fBytes.length.toLong,
      compression = opts.kind,
      blockSize = opts.blockSize,
      version = Magic.Version,
      writerZlibLevel = opts.zlibLevel,
      useVInts = opts.useVInts))
    out.write(psBytes.length)
    rawOut.flush()
    flushNanosAcc += System.nanoTime() - tFoot0
    DwrfMemoryGovernor.unregister(gReg)
  }

  /** Abort-path cleanup: drop the governor registration WITHOUT writing
    * a footer. Idempotent with close() (unregister ignores unknown regs).
    */
  def release(): Unit = {
    closed = true
    DwrfMemoryGovernor.unregister(gReg)
  }

  def rowCount: Long = totalRows
}
