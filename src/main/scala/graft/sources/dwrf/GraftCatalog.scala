package graft.sources.dwrf

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A V2 `TableCatalog` over a warehouse directory of dwrf tables —
  * `spark.sql.catalog.graft = graft.sources.dwrf.GraftCatalog` (+
  * `spark.sql.catalog.graft.warehouse = <dir>`) makes every table-shaped
  * SQL surface work against the native format through one catalog name:
  *
  * {{{
  *   CREATE NAMESPACE graft.lake;
  *   CREATE TABLE graft.lake.events (...) USING dwrf;
  *   INSERT INTO graft.lake.events ...;
  *   SELECT ... FROM graft.lake.events VERSION AS OF 0;   -- time travel
  *   DELETE / UPDATE / MERGE INTO graft.lake.events ...;  -- via DwrfTable
  * }}}
  *
  * Layout is self-describing: namespace = `warehouse/<ns>/`, table =
  * `warehouse/<ns>/<table>/` (a plain dwrf dir, snapshot log optional).
  * `CREATE TABLE` persists the declared schema + partition columns in a
  * `_graft_table.json` sidecar (underscore-prefixed — invisible to data
  * listings); a directory dropped into the warehouse WITHOUT a sidecar
  * still loads by schema inference, so external dwrf output is adoptable
  * by just moving it in. `LOCATION` makes a table external: the sidecar
  * lives with the data, and DROP removes only the catalog's view of it.
  *
  * SQL `VERSION AS OF n` routes through `loadTable(ident, version)`: the
  * returned table pins the version in its properties (schema included —
  * a pre-evolution snapshot reads with its own columns), and
  * [[DwrfTable.newScanBuilder]] surfaces the pin to the scan.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  // ------------------------------------------------- function catalog
  // One function: `bucket` — what resolves `PARTITIONED BY
  // (bucket(n, col))` transforms on writes and proves two bucketed
  // tables' layouts compatible for storage-partitioned joins.
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] = Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) new DwrfBucketUnbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  private var catalogName: String = _
  private var warehouse: Path = _
  private def conf: Configuration = DwrfUtil.sessionHadoopConf()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name: set spark.sql.catalog.$name.warehouse to a directory"))
    warehouse = new Path(w)
    warehouse.getFileSystem(conf).mkdirs(warehouse)
  }

  override def name(): String = catalogName

  // ------------------------------------------------------------ layout

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)(new Path(_, _))

  private val SidecarName = "_graft_table.json"

  /** Managed location; the sidecar may redirect to an external one. */
  private def managedDir(ident: Identifier): Path =
    new Path(nsDir(ident.namespace), ident.name)

  /** `dropped` is the tombstone list behind DROP COLUMN: data files are
    * untouched (the drop is metadata-only — reads just stop projecting
    * the column), so re-ADDing a dropped name would silently resurrect
    * the old values from pre-drop files. Without per-column ids in the
    * format (the Delta/Iceberg column-mapping machinery), the honest
    * contract is to refuse that resurrect loudly and keep the tombstone
    * forever; users pick a fresh name or rewrite the table.
    */
  private final case class Sidecar(schema: StructType, partCols: Seq[String],
      location: Option[String], props: Map[String, String] = Map.empty,
      dropped: Seq[String] = Nil, bucket: Option[(String, Int)] = None)

  private def writeSidecar(dir: Path, s: Sidecar): Unit = {
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val body =
      s"""{"schemaJson":${quote(s.schema.json)},"partCols":[${s.partCols.map(quote).mkString(",")}]""" +
        s.location.map(l => s""","location":${quote(l)}""").getOrElse("") +
        (if (s.props.isEmpty) ""
         else s.props.toSeq.sorted.map { case (k, v) => quote(k) + "," + quote(v) }
           .mkString(""","props":[""", ",", "]")) +
        (if (s.dropped.isEmpty) ""
         else s.dropped.sorted.map(quote)
           .mkString(""","dropped":[""", ",", "]")) +
        s.bucket.map { case (c, n) =>
          s""","bucketCol":${quote(c)},"bucketCount":${quote(n.toString)}"""
        }.getOrElse("") + "}"
    val out = fs.create(new Path(dir, SidecarName), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  private def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def readSidecar(dir: Path): Option[Sidecar] = {
    val p = new Path(dir, SidecarName)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def str(key: String): Option[String] =
      (s""""$key":"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(body)
        .map(m => unquote(m.group(1)))
    val schemaJson = str("schemaJson").getOrElse(throw new IllegalStateException(
      s"corrupt $p: no schemaJson"))
    val arr = """"partCols":\[([^\]]*)\]""".r.findFirstMatchIn(body)
      .map(_.group(1)).getOrElse("")
    val partCols = """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(arr)
      .map(m => unquote(m.group(1))).toSeq
    val props: Map[String, String] = {
      val parr = """"props":\[([^\]]*)\]""".r.findFirstMatchIn(body)
        .map(_.group(1)).getOrElse("")
      val strs = """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(parr)
        .map(m => unquote(m.group(1))).toSeq
      strs.grouped(2).collect { case Seq(k, v) => k -> v }.toMap
    }
    val dropped = {
      val darr = """"dropped":\[([^\]]*)\]""".r.findFirstMatchIn(body)
        .map(_.group(1)).getOrElse("")
      """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(darr)
        .map(m => unquote(m.group(1))).toSeq
    }
    val bucket = for (c <- str("bucketCol"); n <- str("bucketCount"))
      yield (c, n.toInt)
    Some(Sidecar(DataType.fromJson(schemaJson).asInstanceOf[StructType],
      partCols, str("location"), props, dropped, bucket))
  }

  private def unquote(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 'u' => b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case c => b.append(c); i += 2
        }
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  private def dataLocation(ident: Identifier, sc: Option[Sidecar]): Path =
    sc.flatMap(_.location).map(new Path(_)).getOrElse(managedDir(ident))

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      name() +: namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .map(Identifier.of(namespace, _))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val dir = managedDir(ident)
    val fs = dir.getFileSystem(conf)
    fs.exists(new Path(dir, SidecarName)) ||
      (fs.exists(dir) && (DwrfLog.isEnabled(dir, conf) ||
        DwrfUtil.listDataFiles(dir, conf).nonEmpty))
  }

  private def load(ident: Identifier, versionAsOf: Option[Long]): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val sc = readSidecar(managedDir(ident))
    val location = dataLocation(ident, sc)
    val verProps: Map[String, String] =
      versionAsOf.map(v => DwrfLog.VersionAsOfKey -> v.toString).toMap
    // persisted TBLPROPERTIES first: reserved keys always win over them
    val bucketProps = sc.flatMap(_.bucket).map { case (c, n) =>
      Map(DwrfBucket.ColumnKey -> c, DwrfBucket.CountKey -> n.toString,
        // this catalog IS a FunctionCatalog: the bucket transform is
        // resolvable, so writes may request its distribution and scans
        // may report KeyGroupedPartitioning over it
        DwrfBucket.ResolvableKey -> "true")
    }.getOrElse(Map.empty)
    val props = sc.map(_.props).getOrElse(Map.empty) ++ Map(
      TableCatalog.PROP_LOCATION -> location.toString,
      TableCatalog.PROP_PROVIDER -> "dwrf") ++ bucketProps ++ verProps
    (sc, versionAsOf) match {
      // a time-travel read ALWAYS re-infers from the pinned manifest:
      // the sidecar tracks the current schema, not version n's
      case (Some(side), None) =>
        new DwrfTable(side.schema,
          org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(props),
          side.partCols)
      case _ =>
        val opts = new CaseInsensitiveStringMap(
          (Map("path" -> location.toString) ++ verProps).asJava)
        val source = new DwrfDataSource
        val schema = source.inferSchema(opts)
        val partCols = {
          val qualified = DwrfUtil.qualify(location, conf)
          DwrfUtil.scanFiles(location, conf,
            verProps).headOption
            .map(f => PartitionLayout.specOf(qualified, f).map(_._1))
            .getOrElse(Nil)
        }
        new DwrfTable(schema,
          org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(props),
          partCols)
    }
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** SQL time travel: `SELECT ... FROM graft.ns.t VERSION AS OF 3`. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog: VERSION AS OF wants a numeric dwrf log version, got '$version'"))))

  /** SQL time travel by instant: `... TIMESTAMP AS OF '2026-08-13 ...'`.
    * Spark hands micros since epoch; resolution is the newest retained
    * commit at or before it ([[DwrfLog.versionAt]]).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val location = dataLocation(ident, readSidecar(managedDir(ident)))
    load(ident, Some(DwrfLog.versionAt(location, conf, timestampMicros / 1000L)))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val (bucketTs, identTs) = partitions.partition(_.name == "bucket")
    val partCols = identTs.map { t =>
      require(t.name == "identity",
        s"graft catalog: only identity or bucket partitioning, got $t")
      t.references.head.fieldNames.mkString(".")
    }.toSeq
    // PARTITIONED BY (bucket(n, col)): hash-bucketed layout for
    // storage-partitioned joins ([[DwrfBucket]])
    val bucketSpec = bucketTs.toSeq match {
      case Nil => None
      case Seq(t) =>
        require(partCols.isEmpty,
          "graft catalog: bucket + identity partitioning cannot combine")
        val col = t.references.head.fieldNames.mkString(".")
        val n = t.arguments.collectFirst {
          case lit: org.apache.spark.sql.connector.expressions.Literal[_]
              if lit.value().isInstanceOf[Number] =>
            lit.value().asInstanceOf[Number].intValue()
        }.getOrElse(throw new IllegalArgumentException(
          s"graft catalog: bucket transform needs a numeric width: $t"))
        require(n > 0, s"graft catalog: bucket count must be positive, got $n")
        val f = schema.fields.find(_.name.equalsIgnoreCase(col)).getOrElse(
          throw new IllegalArgumentException(
            s"graft catalog: bucket column '$col' not in schema"))
        require(DwrfBucket.supportedType(f.dataType),
          s"graft catalog: bucket column type ${f.dataType.simpleString} " +
            "unsupported (integral, date, string)")
        Some((f.name, n))
      case more => throw new IllegalArgumentException(
        s"graft catalog: at most one bucket transform, got ${more.size}")
    }
    val external = Option(properties.get(TableCatalog.PROP_LOCATION))
    writeSidecar(managedDir(ident),
      Sidecar(schema, partCols, external, userProps(properties.asScala.toMap),
        bucket = bucketSpec))
    external.foreach(l =>
      new Path(l).getFileSystem(conf).mkdirs(new Path(l)))
    load(ident, None)
  }

  /** TBLPROPERTIES the sidecar persists: everything except the
    * Spark-managed reserved keys and anything that could redirect the
    * data path out from under the catalog.
    */
  private def userProps(all: Map[String, String]): Map[String, String] =
    all.filterNot { case (k, _) =>
      val lk = k.toLowerCase
      lk == TableCatalog.PROP_LOCATION || lk == TableCatalog.PROP_PROVIDER ||
        lk == TableCatalog.PROP_OWNER || lk == TableCatalog.PROP_COMMENT ||
        lk == "path" || lk == TableCatalog.PROP_EXTERNAL ||
        lk.startsWith("option.")
    }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = managedDir(ident)
    val sc = readSidecar(dir).getOrElse {
      // adopt the inferred schema so the ALTER has a base to evolve
      val t = load(ident, None)
      Sidecar(t.schema(), t.partitioning().map(
        _.references.head.fieldNames.mkString(".")).toSeq, None)
    }
    val updated = changes.foldLeft(sc) {
      case (c, add: TableChange.AddColumn) =>
        require(add.fieldNames.length == 1,
          "graft catalog: only top-level ADD COLUMN")
        val nm = add.fieldNames()(0)
        if (c.dropped.exists(_.equalsIgnoreCase(nm)))
          throw new IllegalArgumentException(
            s"graft catalog: column '$nm' was previously DROPPED from " +
              s"$ident; re-adding the name would resurrect its old values " +
              "from pre-drop data files (drops are metadata-only). Use a " +
              "new name, or rewrite the table (CTAS) to purge the column.")
        c.copy(schema = c.schema.add(nm, add.dataType(), nullable = true))
      // DROP COLUMN is metadata-only: files keep the bytes, reads stop
      // projecting them, and the name is tombstoned against resurrect
      case (c, del: TableChange.DeleteColumn) =>
        require(del.fieldNames.length == 1,
          "graft catalog: only top-level DROP COLUMN")
        val nm = del.fieldNames()(0)
        val exists = c.schema.fieldNames.exists(_.equalsIgnoreCase(nm))
        if (!exists) {
          if (del.ifExists()) c
          else throw new IllegalArgumentException(
            s"graft catalog: no column '$nm' in $ident to drop")
        } else {
          require(!c.partCols.exists(_.equalsIgnoreCase(nm)),
            s"graft catalog: cannot drop partition column '$nm'")
          require(!c.bucket.exists(_._1.equalsIgnoreCase(nm)),
            s"graft catalog: cannot drop bucket column '$nm'")
          require(c.schema.fields.length > 1,
            s"graft catalog: cannot drop the last column of $ident")
          c.copy(
            schema = StructType(c.schema.filterNot(_.name.equalsIgnoreCase(nm))),
            dropped = c.dropped :+ nm)
        }
      // ALTER TABLE ... ALTER COLUMN ... TYPE: WIDENING only (int→long,
      // float→double, recursively through nested shapes) — the read
      // path already upcasts narrower-written file generations
      // ([[TypeWidening]] via DwrfFileReader), so the catalog change is
      // metadata-only and every existing file stays readable. Anything
      // that could lose a value (narrowing, int↔float drift) refuses.
      case (c, upd: TableChange.UpdateColumnType) =>
        require(upd.fieldNames.length == 1,
          "graft catalog: only top-level ALTER COLUMN TYPE")
        val nm = upd.fieldNames()(0)
        val idx = c.schema.fieldNames.indexWhere(_.equalsIgnoreCase(nm))
        require(idx >= 0, s"graft catalog: no column '$nm' in $ident")
        require(!c.partCols.exists(_.equalsIgnoreCase(nm)),
          s"graft catalog: cannot change partition column '$nm' type")
        // bucket-column widening is SAFE: integral values hash via
        // their widened long ([[DwrfBucket.id]]), so int->long keeps
        // every existing bucket id — no guard needed
        val from = c.schema.fields(idx).dataType
        val to = upd.newDataType()
        require(TypeWidening.widen(from, to).contains(to),
          s"graft catalog: cannot ALTER '$nm' from ${from.simpleString} " +
            s"to ${to.simpleString} — only lossless widening is allowed " +
            "(int family upward, float→double)")
        c.copy(schema = StructType(c.schema.fields.updated(idx,
          c.schema.fields(idx).copy(dataType = to))))
      // ALTER TABLE ... RENAME COLUMN a TO b: metadata-only. Files keep
      // the old physical name; the field records it as an alias
      // ([[ColumnAliases]] metadata, newest first) and every read path
      // resolves old generations through it. The old name joins the
      // DROP tombstones: re-ADDing (or renaming another column onto) it
      // would resurrect pre-rename values from old files.
      case (c, rn: TableChange.RenameColumn) =>
        require(rn.fieldNames.length == 1,
          "graft catalog: only top-level RENAME COLUMN")
        val from = rn.fieldNames()(0)
        val to = rn.newName()
        val idx = c.schema.fieldNames.indexWhere(_.equalsIgnoreCase(from))
        require(idx >= 0, s"graft catalog: no column '$from' in $ident")
        require(!c.partCols.exists(_.equalsIgnoreCase(from)),
          s"graft catalog: cannot rename partition column '$from' — the " +
            "physical directory layout carries the name")
        require(!c.bucket.exists(_._1.equalsIgnoreCase(from)),
          s"graft catalog: cannot rename bucket column '$from' — the " +
            "bucketed layout is keyed on the name")
        require(!c.schema.fieldNames.exists(_.equalsIgnoreCase(to)),
          s"graft catalog: column '$to' already exists in $ident")
        if (c.dropped.exists(_.equalsIgnoreCase(to)))
          throw new IllegalArgumentException(
            s"graft catalog: column '$to' was previously DROPPED or " +
              s"RENAMED away in $ident; taking the name would resurrect " +
              "its old values from pre-drop data files. Use a new name, " +
              "or rewrite the table (CTAS) to purge the column.")
        val renamed = ColumnAliases.withRename(
          c.schema.fields(idx).copy(name = to), from)
        c.copy(
          schema = StructType(c.schema.fields.updated(idx, renamed)),
          dropped = c.dropped :+ from)
      // ALTER TABLE ... SET/UNSET TBLPROPERTIES — how a table opts into
      // e.g. delete.mode=merge-on-read after creation
      case (c, set: TableChange.SetProperty) =>
        c.copy(props = userProps(c.props + (set.property -> set.value)))
      case (c, rm: TableChange.RemoveProperty) =>
        c.copy(props = c.props - rm.property)
      case (_, other) => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER ${other.getClass.getSimpleName}")
    }
    writeSidecar(dir, updated)
    load(ident, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val dir = managedDir(ident)
    val fs = dir.getFileSystem(conf)
    // external data outlives the catalog entry; managed data does not
    val external = readSidecar(dir).exists(_.location.isDefined)
    if (external) fs.delete(new Path(dir, SidecarName), false)
    else fs.delete(dir, true)
    true
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    val fs = warehouse.getFileSystem(conf)
    if (!fs.rename(managedDir(from), managedDir(to)))
      throw new IllegalStateException(s"graft catalog: rename $from -> $to failed")
  }

  // -------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val fs = warehouse.getFileSystem(conf)
    fs.listStatus(warehouse).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName))
      .filterNot(_.head.startsWith("_"))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(name() +: namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    nsDir(namespace).getFileSystem(conf).exists(nsDir(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(name() +: namespace)

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit =
    nsDir(namespace).getFileSystem(conf).mkdirs(nsDir(namespace))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog: ALTER NAMESPACE")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return false
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(
        s"graft catalog: namespace ${namespace.mkString(".")} not empty " +
          "(use CASCADE)")
    fs.delete(dir, true)
  }
}
