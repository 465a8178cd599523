package graft.sources.dwrf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/** Lake-maintenance SQL — the ops statements a snapshot store's users
  * type, wired through `SparkSessionExtensions.injectParser` (the same
  * route Delta takes for its DDL):
  *
  * {{{
  *   DESCRIBE HISTORY '/path/to/table'
  *   VACUUM '/path/to/table' RETAIN 3 VERSIONS
  *   VACUUM '/path/to/table' OLDER THAN 168 HOURS
  *   OPTIMIZE '/path/to/table' SORT BY (l_partkey, l_orderkey)
  *   OPTIMIZE '/path/to/table' ZORDER BY (x, y)
  *   OPTIMIZE '/path/to/table'                  -- bin-pack small files
  *   OPTIMIZE '/path/to/table' TARGET 256 MB
  *   RESTORE '/path/to/table' TO VERSION 3
  * }}}
  *
  * The target is the table LOCATION as a quoted path literal — the one
  * spelling that works identically for path tables, catalog tables
  * (pass the location) and external dirs, with no identifier-resolution
  * ambiguity. Everything else falls through verbatim to Spark's parser,
  * so the extension is invisible to ordinary SQL.
  */
class LakeSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val describeHistory =
    """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*""".r
  private val describeDetail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+'([^']+)'\s*;?\s*""".r
  private val vacuumRetain =
    """(?is)\s*VACUUM\s+'([^']+)'\s+RETAIN\s+(\d+)\s+VERSIONS\s*;?\s*""".r
  private val vacuumOlder =
    """(?is)\s*VACUUM\s+'([^']+)'\s+OLDER\s+THAN\s+(\d+)\s+HOURS\s*;?\s*""".r
  private val optimizeBy =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+(SORT|ZORDER)\s+BY\s*\(([^)]+)\)\s*;?\s*""".r
  private val optimizeBinPack =
    """(?is)\s*OPTIMIZE\s+'([^']+)'(?:\s+TARGET\s+(\d+)\s+MB)?\s*;?\s*""".r
  private val restoreTo =
    """(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case describeHistory(path) => DescribeHistoryCommand(path)
    case describeDetail(path) => DescribeDetailCommand(path)
    case vacuumRetain(path, n) => VacuumCommand(path, Some(n.toInt), None)
    case vacuumOlder(path, h) => VacuumCommand(path, None, Some(h.toLong))
    case optimizeBy(path, kind, cols) =>
      OptimizeCommand(path,
        cols.split(',').map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
          .filter(_.nonEmpty),
        zOrder = kind.equalsIgnoreCase("ZORDER"))
    // tried after the BY forms; the pattern is whole-string, so any
    // other suffix after the quoted path falls through to Spark's parser
    case optimizeBinPack(path, mb) =>
      CompactCommand(path, Option(mb).map(_.toLong).getOrElse(128L))
    case restoreTo(path, v) => RestoreCommand(path, v.toLong)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `DESCRIBE HISTORY '<path>'` → one row per retained snapshot version,
  * newest first (the Delta UX), straight from the manifest headers —
  * no data file is opened.
  */
case class DescribeHistoryCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", StringType, nullable = false)(),
    AttributeReference("commit_ts", TimestampType, nullable = false)(),
    AttributeReference("n_files", IntegerType, nullable = false)(),
    AttributeReference("n_dvs", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val conf = DwrfUtil.sessionHadoopConf()
    DwrfLog.history(new Path(path), conf).sortBy(-_.version).map { s =>
      Row(s.version, s.op, new java.sql.Timestamp(s.ts),
        s.files.size, s.dvs.size)
    }
  }
}

/** `DESCRIBE DETAIL '<path>'` — one row of table-level facts: current
  * snapshot version (-1 for plain directories without a log), live
  * file/DV counts, live on-disk bytes, the latest commit's op and
  * stamp, and the Hive partition columns inferred from the layout. For
  * snapshot tables everything derives from ONE manifest read plus the
  * live files' statuses; no data file is opened.
  */
case class DescribeDetailCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("last_op", StringType, nullable = false)(),
    AttributeReference("committed_at", TimestampType, nullable = true)(),
    AttributeReference("n_files", IntegerType, nullable = false)(),
    AttributeReference("n_dvs", IntegerType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("partition_columns", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val conf = DwrfUtil.sessionHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val qualified = DwrfUtil.qualify(root, conf)
    val (version, op, ts, files, nDvs) = DwrfLog.latest(root, conf) match {
      case Some(s) =>
        (s.version, s.op,
          if (s.ts == 0L) null else new java.sql.Timestamp(s.ts),
          s.resolved(qualified), s.dvs.size)
      case None =>
        (-1L, "none", null, DwrfUtil.listDataFiles(root, conf).toSeq, 0)
    }
    val bytes = files.map(f => fs.getFileStatus(f).getLen).sum
    // layouts are uniform per table: the first live file's Hive spec
    // names the partition columns (empty for flat tables)
    val partCols = files.headOption
      .map(f => PartitionLayout.specOf(qualified, f).map(_._1))
      .getOrElse(Nil).mkString(",")
    Seq(Row("dwrf", qualified.toString, version, op, ts, files.size,
      nDvs, bytes, partCols))
  }
}

/** `VACUUM '<path>' RETAIN n VERSIONS` / `... OLDER THAN h HOURS`. */
case class VacuumCommand(path: String, retainLast: Option[Int],
    olderThanHours: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("data_files_deleted", IntegerType, nullable = false)(),
    AttributeReference("manifests_deleted", IntegerType, nullable = false)(),
    AttributeReference("retained_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val conf = DwrfUtil.sessionHadoopConf()
    val r = (retainLast, olderThanHours) match {
      case (Some(n), _) => DwrfLog.vacuum(new Path(path), conf, n)
      case (_, Some(h)) =>
        DwrfLog.vacuumOlderThan(new Path(path), conf, h * 3600L * 1000L)
      case _ => throw new IllegalArgumentException(
        "VACUUM needs RETAIN n VERSIONS or OLDER THAN h HOURS")
    }
    Seq(Row(r.dataFilesDeleted, r.manifestsDeleted, r.retainedVersion))
  }
}

/** `OPTIMIZE '<path>' [TARGET n MB]` — bin-pack small-file compaction:
  * the raw-stripe merge ([[DwrfCompact]] — zero decode, arrival-order
  * packing per partition and byte-compatibility class), committed as
  * one atomic replace on snapshot tables. The no-sort counterpart of
  * the SORT/ZORDER rewrite below: OPTIMIZE for file-count hygiene
  * (streaming sinks, frequent small appends) at byte-copy speed.
  */
case class CompactCommand(path: String, targetMb: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("groups", IntegerType, nullable = false)(),
    AttributeReference("files_before", IntegerType, nullable = false)(),
    AttributeReference("files_after", IntegerType, nullable = false)(),
    AttributeReference("files_compacted", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    require(targetMb > 0, "OPTIMIZE TARGET must be positive")
    val r = DwrfCompact.compact(spark, path, targetMb * 1024L * 1024L)
    // version leads, like OPTIMIZE BY and RESTORE — the three
    // maintenance statements report uniformly (-1 = no snapshot log)
    Seq(Row(r.version, r.groups, r.filesBefore, r.filesAfter,
      r.filesCompacted))
  }
}

/** `RESTORE '<path>' TO VERSION n` — metadata-only rollback
  * ([[DwrfLog.restore]]): a NEW commit re-references the target
  * version's files and DV bindings, so history stays linear and
  * concurrent readers keep their pinned snapshots; vacuumed targets
  * fail loud rather than partially restore.
  */
case class RestoreCommand(path: String, toVersion: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("restored_from", LongType, nullable = false)(),
    AttributeReference("n_files", IntegerType, nullable = false)(),
    AttributeReference("n_dvs", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val conf = DwrfUtil.sessionHadoopConf()
    val s = DwrfLog.restore(new Path(path), conf, toVersion)
    Seq(Row(s.version, toVersion, s.files.size, s.dvs.size))
  }
}

/** `OPTIMIZE '<path>' SORT BY (...)` / `ZORDER BY (...)`. */
case class OptimizeCommand(path: String, cols: Seq[String], zOrder: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_before", IntegerType, nullable = false)(),
    AttributeReference("files_after", IntegerType, nullable = false)(),
    AttributeReference("bytes_rewritten", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    require(cols.nonEmpty, "OPTIMIZE needs at least one column")
    val r = DwrfOptimize.rewrite(spark, path, cols, zOrder = zOrder)
    Seq(Row(r.version, r.filesBefore, r.filesAfter, r.bytesRewritten))
  }
}
