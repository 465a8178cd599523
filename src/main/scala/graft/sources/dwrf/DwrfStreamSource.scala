package graft.sources.dwrf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types.StructType

/** `readStream.format("dwrf")` — tail a landing directory of dwrf files
  * as a micro-batch stream (the read half of the native ingestion loop;
  * the write half is [[DwrfStreamingWrite]]).
  *
  * Offset model: the number of files consumed from the directory's file
  * list sorted by (mtime, name). That makes offsets replayable from the
  * checkpoint alone — no sink-side seen-files log — under the landing-dir
  * contract the sink itself produces: files are immutable once visible,
  * never deleted while a checkpoint is active, and arrivals are monotone
  * (a later file gets a later mtime, or an equal mtime with a later name —
  * epoch-tagged sink names satisfy this by construction). A producer that
  * rewrites history under a checkpoint breaks replay exactly like it
  * would break Spark's own file source.
  *
  * Each micro-batch plans the new files' stripe groups with the same
  * split logic as the batch scan, so one giant backfill file still fans
  * out across the cluster. Admission control honors `maxFilesPerTrigger`,
  * and Trigger.AvailableNow snapshots the listing once so a drain has a
  * fixed endpoint. Listing cost is one directory walk per trigger
  * (footers are read only for NEW files); a production deployment with
  * huge dirs would layer mtime-partitioned landing paths on top, same as
  * any file stream.
  */
final class DwrfMicroBatchStream(
    tableSchema: StructType,
    readSchema: StructType,
    path: String,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    options: Map[String, String],
    hadoopConf: SerializableHadoopConf)
    extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private case class Listed(path: String, mtime: Long)

  /** Stable sorted listing (monotone-arrival contract above). One
    * directory walk — mtimes come from the FileStatus the walk already
    * holds, no per-file status RPCs.
    */
  private def listSorted(): IndexedSeq[Listed] = {
    DwrfUtil.listDataFileStatuses(new Path(path), hadoopConf.value)
      .map(s => Listed(s.getPath.toString, s.getModificationTime))
      .sortBy(l => (l.mtime, l.path)).toIndexedSeq
  }

  // AvailableNow snapshot: fixed drain endpoint captured once per run
  @volatile private var availableNowSnapshot: Option[IndexedSeq[Listed]] = None
  // last listing used to answer latestOffset — planInputPartitions slices
  // it so the planned files are exactly the ones the offset counted
  @volatile private var lastListing: IndexedSeq[Listed] = IndexedSeq.empty
  // sticky row fallback: once ANY planned file needs a widening upcast,
  // later factories stay on the row path (monotone, so the factory/plan
  // evaluation order inside a micro-batch can't race it back to columnar)
  @volatile private var sawWidened = false

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowSnapshot = Some(listSorted())
  }

  private def currentListing(): IndexedSeq[Listed] =
    availableNowSnapshot.getOrElse(listSorted())

  // options arrive wrapped in CaseInsensitiveMap (DwrfTable.newScanBuilder
  // boundary), so a plain get honors Spark's case-insensitive contract
  override def getDefaultReadLimit: ReadLimit =
    options.get("maxFilesPerTrigger").map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = DwrfSourceOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val listing = currentListing()
    lastListing = listing
    val from = start.asInstanceOf[DwrfSourceOffset].index
    def cap(l: ReadLimit): Long = l match {
      case mf: ReadMaxFiles => math.min(listing.length.toLong, from + mf.maxFiles())
      case c: CompositeReadLimit => c.getReadLimits.map(cap).min
      case _ => listing.length.toLong
    }
    DwrfSourceOffset(math.max(from, cap(limit)))
  }

  override def reportLatestOffset(): Offset =
    DwrfSourceOffset(currentListing().length.toLong)

  override def deserializeOffset(json: String): Offset =
    DwrfSourceOffset(DwrfSourceOffset.parse(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[DwrfSourceOffset].index.toInt
    val to = end.asInstanceOf[DwrfSourceOffset].index.toInt
    // replay after restart re-lists; live batches slice the listing the
    // offset was computed from
    val listing = {
      val l = lastListing
      if (to <= l.length) l else currentListing()
    }
    require(to <= listing.length,
      s"dwrf stream: offset $to beyond ${listing.length} listed files — " +
        "files were deleted from the landing dir under an active checkpoint")
    val slice = listing.slice(from, to)
    // partition-dir values must ride each split exactly like the batch
    // scan's, or a partitioned landing dir would stream its partition
    // columns as all-NULL (the reader maps absent columns to null fill)
    val qualifiedRoot = DwrfUtil.qualify(new Path(path), hadoopConf.value)
    val tails = DwrfUtil.parMap(slice.toSeq) { l =>
      val file = new Path(l.path)
      val r = new DwrfFileReader(file, hadoopConf.value)
      try {
        val widened = readSchema.fields.exists { f =>
          r.schema.fields.find(_.name == f.name).exists(_.dataType != f.dataType)
        }
        (l.path, r.footer.stripes, widened,
          PartitionLayout.specOf(qualifiedRoot, file))
      } finally r.close()
    }
    if (tails.exists(_._3)) sawWidened = true
    tails.flatMap { case (file, stripes, _, partSpec) =>
      DwrfSplits.stripeGroups(stripes).map { case (off, len) =>
        DwrfInputPartition(file, off, len, partSpec)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DwrfPartitionReaderFactory(readSchema.json, pushed, hadoopConf,
      rowFallback = sawWidened)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def toString: String = s"DwrfMicroBatchStream[$path]"
}

/** Count of files consumed from the sorted landing-dir listing. */
final case class DwrfSourceOffset(index: Long) extends Offset {
  override def json(): String = s"""{"index":$index}"""
}

object DwrfSourceOffset {
  private val Re = """\{\s*"index"\s*:\s*(\d+)\s*\}""".r
  def parse(json: String): Long = json match {
    case Re(n) => n.toLong
    case _ => throw new IllegalArgumentException(s"bad dwrf offset: $json")
  }
}

/** Stripe-group split logic shared by the batch scan and the stream:
  * consecutive stripes coalesce until the ~128 MB target, so both paths
  * produce identical task granularity for the same file.
  */
private[dwrf] object DwrfSplits {
  val targetSplit: Long = 128L * 1024 * 1024

  /** (offset, length) byte ranges covering whole stripes. */
  def stripeGroups(stripes: Seq[graft.format.StripeInformation]): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var start = -1L
    var end = -1L
    stripes.foreach { s =>
      val stripeLen = s.indexLength + s.dataLength + s.footerLength
      if (start < 0) { start = s.offset; end = s.offset + stripeLen }
      else if (end - start >= targetSplit) {
        out += ((start, end - start))
        start = s.offset
        end = s.offset + stripeLen
      } else end = s.offset + stripeLen
    }
    if (start >= 0) out += ((start, end - start))
    out.toSeq
  }
}
