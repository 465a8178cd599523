package graft.sources.dwrf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Change data feed over the snapshot log: the row-level delta between
  * two table versions, as a DataFrame of table rows plus
  * `_change_type` ('insert' | 'delete'), `_commit_version` and
  * `_commit_timestamp` — what an incremental consumer (downstream
  * materialization, sync to a serving store, audit) reads instead of
  * re-scanning 100 TB per sync. The Delta CDF shape, computed entirely
  * from artifacts the log already retains — no extra write-side cost:
  *
  *  - append / overwrite commits: added files' rows surface as inserts
  *    (removed files' rows as deletes), read through the ordinary scan
  *    with a [[DwrfUtil.ScanFilesKey]] restriction — partition
  *    splicing, schema evolution and DV masks all apply.
  *  - merge-on-read DELETE commits are EXACT row-level deletes for
  *    free: the commit's DV rebinding names the newly masked positions
  *    (new sidecar minus old), and the retained data file makes those
  *    rows readable — they surface via a `_pos` provenance read
  *    semi-joined against the position delta, computed executor-side
  *    from the sidecar pair (the driver never materializes positions).
  *  - copy-on-write DELETE / UPDATE / MERGE commits surface as
  *    whole-file deletes + inserts of the rewritten files (replaced
  *    inputs stay on disk, so both sides are readable). Coarser than
  *    per-row — a rewritten file re-emits its copied rows as
  *    delete+insert pairs — but multiset-exact: applying the feed to a
  *    copy of version `from` yields exactly version `to`.
  *  - compaction / OPTIMIZE commits emit nothing: they are
  *    row-preserving by construction (commitReplace proves no
  *    concurrent row change won the race).
  *
  * Vacuumed history fails loud in [[DwrfLog.read]]: a feed that can no
  * longer be computed must never silently skip a span.
  */
object DwrfChanges {
  val ChangeTypeColumn = "_change_type"
  val VersionColumn = "_commit_version"
  val TimestampColumn = "_commit_timestamp"

  /** Read option turning a STREAMING read into a change feed
    * (`readStream.format("dwrf").option(ReadChangeFeedKey, true)`):
    * the stream surfaces table rows + the three change columns per
    * commit instead of appended rows only. Batch change feeds are
    * [[between]]. */
  val ReadChangeFeedKey = "readChangeFeed"

  def requested(opts: Map[String, String]): Boolean =
    org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(opts)
      .get(ReadChangeFeedKey).exists(_.toBoolean)

  /** The change columns appended to a CDF read's schema. */
  def changeFields: Seq[StructField] = Seq(
    StructField(ChangeTypeColumn, StringType, nullable = false),
    StructField(VersionColumn, LongType, nullable = false),
    StructField(TimestampColumn,
      org.apache.spark.sql.types.TimestampType, nullable = false))

  /** Row-preserving maintenance ops — no logical change to stream. */
  private[dwrf] val RowPreservingOps = Set("compact", "optimize")

  /** The changes committed by versions in `(fromVersion, toVersion]`,
    * oldest first within the union. `fromVersion` is the snapshot the
    * consumer already holds (its own rows are NOT included);
    * `toVersion` defaults to the latest.
    */
  def between(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long = -1L): DataFrame = {
    val conf = DwrfUtil.sessionHadoopConf()
    val root = new Path(dir)
    require(DwrfLog.isEnabled(root, conf),
      s"dwrf: change feed needs the snapshot log (DwrfLog.enable($dir))")
    val latest = DwrfLog.latestVersion(root, conf).get
    val to = if (toVersion < 0) latest else toVersion
    require(fromVersion >= 0 && fromVersion <= to && to <= latest,
      s"dwrf: change span ($fromVersion, $to] out of range (latest $latest)")
    val qualified = DwrfUtil.qualify(root, conf)

    def readFiles(version: Long, rel: Seq[String]): DataFrame =
      spark.read.format("dwrf")
        .option(DwrfLog.VersionAsOfKey, version)
        .option(DwrfUtil.ScanFilesKey, rel.mkString(","))
        .load(dir)

    def stamp(df: DataFrame, tpe: String, v: Long, tsMillis: Long): DataFrame =
      df.withColumn(ChangeTypeColumn, lit(tpe))
        .withColumn(VersionColumn, lit(v))
        .withColumn(TimestampColumn, timestamp_millis(lit(tsMillis)))

    val frames = ((fromVersion + 1) to to).flatMap { v =>
      val snap = DwrfLog.read(root, conf, v)
      val prev = DwrfLog.read(root, conf, v - 1)
      if (RowPreservingOps.contains(snap.op)) Nil
      else {
        val prevSet = prev.files.toSet
        val curSet = snap.files.toSet
        val added = snap.files.filterNot(prevSet.contains)
        val removed = prev.files.filterNot(curSet.contains)
        // files live on both sides whose DV binding changed: their newly
        // masked positions are this commit's row-level deletes
        val rebound = snap.files.filter(f =>
          prevSet.contains(f) && snap.dvs.get(f) != prev.dvs.get(f))
        val inserts =
          if (added.isEmpty) Nil
          else Seq(stamp(readFiles(v, added), "insert", v, snap.ts))
        val fileDeletes =
          if (removed.isEmpty) Nil
          else Seq(stamp(readFiles(v - 1, removed), "delete", v, snap.ts))
        val posDeletes =
          if (rebound.isEmpty) Nil
          else {
            // (absolute file path, old sidecar, new sidecar) per rebound
            // file; the position delta materializes executor-side
            val work = rebound.map { rel =>
              (new Path(qualified, rel).toString,
                prev.dvs.get(rel).map(d => new Path(qualified, d).toString),
                new Path(qualified, snap.dvs(rel)).toString)
            }
            val ser = new SerializableHadoopConf(conf)
            val posRdd = spark.sparkContext
              .parallelize(work, math.max(1, work.length))
              .flatMap { case (file, oldDv, newDv) =>
                val old: Array[Long] = oldDv match {
                  case Some(p) => DwrfDv.read(new Path(p), ser.value)._1
                  case None => Array.emptyLongArray
                }
                val neu = DwrfDv.read(new Path(newDv), ser.value)._1
                val oldSet = old.toSet
                neu.iterator.filterNot(oldSet.contains)
                  .map(pos => Row(file, pos))
              }
            val posDf = spark.createDataFrame(posRdd, StructType(Seq(
              StructField(DwrfUtil.FileMetaColumn, StringType, nullable = false),
              StructField(DwrfUtil.PosMetaColumn, LongType, nullable = false))))
            val rows = readFiles(v - 1, rebound)
              .select(col("*"), col(DwrfUtil.FileMetaColumn),
                col(DwrfUtil.PosMetaColumn))
              // no broadcast hint: AQE broadcasts a point-delete's tiny
              // position set and shuffles a bulk delete's big one
              .join(posDf,
                Seq(DwrfUtil.FileMetaColumn, DwrfUtil.PosMetaColumn),
                "left_semi")
              .drop(DwrfUtil.FileMetaColumn, DwrfUtil.PosMetaColumn)
            Seq(stamp(rows, "delete", v, snap.ts))
          }
        inserts ++ fileDeletes ++ posDeletes
      }
    }

    if (frames.isEmpty) {
      // empty feed with the right shape: current schema + change columns
      val base = spark.read.format("dwrf")
        .option(DwrfLog.VersionAsOfKey, to).load(dir)
      stamp(base, "insert", to, 0L).limit(0)
    } else
      frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
