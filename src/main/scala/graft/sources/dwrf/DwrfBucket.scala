package graft.sources.dwrf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Hash-bucketed tables: `CREATE TABLE ... PARTITIONED BY (bucket(8, id))`
  * through the graft catalog. Each write routes rows to per-bucket files
  * (`...-b00003.dwrf` — the bucket id rides the FILE NAME, not a
  * directory, so no synthetic partition column exists anywhere in the
  * data), and the scan reports `KeyGroupedPartitioning(bucket(n, col))`
  * with one key per bucket. With
  * `spark.sql.sources.v2.bucketing.enabled`, a join of two tables
  * bucketed the same way on their join keys runs as a
  * storage-partitioned join — ZERO shuffle on either side, the layout
  * itself is the exchange. At 100 TB that turns the nightly
  * fact-to-fact join from the cluster's biggest shuffle into a local
  * merge, the same trade Hive bucketed tables and Iceberg's bucket
  * transform sell.
  *
  * The bucket function (murmur3 of the 64-bit value / UTF8 bytes,
  * pmod n) is exposed through the catalog's FunctionCatalog as
  * `bucket`, which is what lets Spark resolve the transform on both
  * sides of a join and prove the layouts compatible. Integral types
  * hash via their widened long, so `ALTER COLUMN TYPE` int→long keeps
  * every existing bucket id valid.
  *
  * Degradation contract: anything that rewrites files WITHOUT the
  * bucket naming (copy-on-write DML, compaction, OPTIMIZE) simply
  * drops the partitioning REPORT for the touched table — scans stay
  * correct, joins re-grow their shuffle until a bucketed rewrite
  * restores the layout. A report is only ever emitted when EVERY live
  * file carries a parseable bucket id.
  *
  * Reference analog: Hive bucketed tables over DWRF
  * (`columns.buckets` table properties the reference's serde reads);
  * re-expressed on the DSv2 KeyGroupedPartitioning/HasPartitionKey
  * contract instead of Hive's bucket-file-count convention.
  */
object DwrfBucket {

  /** Table/option keys carrying the bucket spec (catalog sidecar →
    * table properties → scan options). */
  val ColumnKey = "dwrf.bucket.column"
  val CountKey = "dwrf.bucket.count"

  /** Internal marker the CATALOG sets alongside the spec: only a
    * catalog-backed relation has the FunctionCatalog Spark needs to
    * resolve `bucket(n, col)` expressions, so only then may the write
    * request the bucket-transform distribution or the scan report
    * KeyGroupedPartitioning over it. A path-based table sees the same
    * spec keys (per-write opt-in) but never the marker — it routes
    * rows to bucket files without the unresolvable plan surface.
    */
  val ResolvableKey = "dwrf.bucket.resolvable"

  /** The spec, only when the relation can RESOLVE the transform. */
  def resolvableSpecOf(opts: Map[String, String]): Option[(String, Int)] = {
    val m = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(opts)
    if (m.get(ResolvableKey).contains("true")) specOf(opts) else None
  }

  private val Seed = 42

  def supportedType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         StringType => true
    case _ => false
  }

  /** Bucket id of a catalyst value. Nulls land in bucket 0 (a bucket id
    * must exist for every row; joins handle null keys themselves). */
  def id(value: Any, n: Int): Int = {
    require(n > 0, s"dwrf: bucket count must be positive, got $n")
    if (value == null) return 0
    val h = value match {
      case l: Long => Murmur3_x86_32.hashLong(l, Seed)
      case i: java.lang.Integer => Murmur3_x86_32.hashLong(i.longValue(), Seed)
      case s: java.lang.Short => Murmur3_x86_32.hashLong(s.longValue(), Seed)
      case b: java.lang.Byte => Murmur3_x86_32.hashLong(b.longValue(), Seed)
      case u: UTF8String =>
        Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
          u.numBytes(), Seed)
      case other => throw new IllegalArgumentException(
        s"dwrf: unsupported bucket value ${other.getClass.getName}")
    }
    ((h % n) + n) % n
  }

  /** Bucket spec from a case-preserving options/properties map. */
  def specOf(opts: Map[String, String]): Option[(String, Int)] = {
    val m = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(opts)
    for (c <- m.get(ColumnKey); n <- m.get(CountKey)) yield (c, n.toInt)
  }

  /** Optional sub-bucket SALT for hot-key skew (table properties or
    * write options): the write's clustered distribution becomes
    * `bucket(n, col) × bucket(saltCount, saltColumn)`, so one hot join
    * key's rows spread across up to saltCount write tasks — and
    * therefore saltCount FILES inside its bucket — instead of
    * concentrating into a single file. The scan still reports plain
    * `bucket(n, col)` (sub-files are just extra same-key splits), so
    * storage-partitioned joins stay zero-shuffle; with
    * `spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
    * .enabled` Spark leaves the salted fact side's splits UNGROUPED and
    * replicates the dim side over them, turning the hot bucket from a
    * single-task straggler into saltCount parallel tasks. The salt
    * column should be high-cardinality and uncorrelated with the bucket
    * key (a value column, a row id).
    */
  val SaltColumnKey = "dwrf.bucket.salt.column"
  val SaltCountKey = "dwrf.bucket.salt.count"

  def saltSpecOf(opts: Map[String, String]): Option[(String, Int)] = {
    val m = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(opts)
    for (c <- m.get(SaltColumnKey); n <- m.get(SaltCountKey)) yield (c, n.toInt)
  }

  private val FilePattern = """-b(\d{5})\.dwrf$""".r

  /** The `-b00007` suffix before `.dwrf`. */
  def fileSuffix(bucket: Int): String = f"-b$bucket%05d"

  /** Bucket id parsed from a data file NAME, if the file was written by
    * the bucketed writer. */
  def of(fileName: String): Option[Int] =
    FilePattern.findFirstMatchIn(fileName).map(_.group(1).toInt)

  def ofPath(path: String): Option[Int] = of(new Path(path).getName)
}

/** The catalog-exposed `bucket` function. Spark binds it once per side
  * of a join to prove both layouts used the SAME function
  * (`canonicalName`) with the same bucket count, and evaluates it only
  * when it must shuffle rows INTO a bucketed layout (the write path's
  * clustered distribution).
  */
final class DwrfBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): murmur3 bucket id in [0, n) — the graft bucketed-table transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"dwrf: bucket(n, col) takes 2 arguments, got ${inputType.fields.length}")
    val dt = inputType.fields(1).dataType
    require(DwrfBucket.supportedType(dt),
      s"dwrf: bucket column type ${dt.simpleString} unsupported " +
        "(integral, date, string)")
    new DwrfBucketBound(dt)
  }
}

final class DwrfBucketBound(dt: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"dwrf.bucket(${dt.catalogString})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val v = if (input.isNullAt(1)) null else input.get(1, dt)
    DwrfBucket.id(v, n)
  }
}
