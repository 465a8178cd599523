package graft.sources.dwrf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, max}

/** OPTIMIZE for snapshot tables: rewrite the live file set globally
  * sorted (plain range sort, or scaled-Morton z-order for multi-column
  * point/range workloads) and publish the swap as ONE atomic log commit.
  *
  * Sorting is what makes the format's stride/file min-max stats
  * selective — `dwrf_zorder_scan` measures the ~30× surfaced-row cut at
  * write time; this op retrofits that layout to a table that accreted
  * out of order (streaming epochs, upsert churn). The write path:
  *
  *  - the read pins the CURRENT snapshot (`versionAsOf`), so the rewrite
  *    is stable whatever lands concurrently;
  *  - output is `repartitionByRange` over the sort key into
  *    ceil(bytes/target) files — disjoint key ranges per file, so FILE
  *    stats prune before stride stats even engage;
  *  - z-order interleaves the dimensions after normalizing each to
  *    0..255 by its max (the rank/scale step raw interleave lacks; best
  *    clustering for non-negative integral keys) on an EPHEMERAL column
  *    dropped before the write — the table schema never changes;
  *  - the commit is [[DwrfLog.commitReplace]] against the base version's
  *    files via the writer's `log.rewrite.of` option: a concurrent
  *    APPEND survives the optimize untouched (its file stays live), a
  *    concurrent DELETE/UPDATE aborts it with a conflict instead of
  *    being silently resurrected — rewrites that change no rows must
  *    never win races against rewrites that do.
  *
  * Hive-partitioned layouts are preserved: the rewrite re-publishes
  * through `partitionBy(layoutKeys)` — the V2 writer clusters tasks by
  * the partition columns and leads the sort with them, so each
  * directory's files come out sorted by the requested key with the
  * layout intact (and storage-partitioned joins keep their zero-shuffle
  * plans over the optimized table).
  */
object DwrfOptimize {

  final case class Result(version: Long, filesBefore: Int, filesAfter: Int,
      bytesRewritten: Long)

  /** @param partitions exact partition-value scope (`Map("ds" ->
    *   "2026-08-14")`): only files in matching Hive directories are
    *   rewritten and replaced — the nightly "optimize yesterday's
    *   partition" a 100 TB table actually runs, where a full-table
    *   rewrite is 10⁵× the work. Empty = whole table.
    */
  def rewrite(spark: SparkSession, dir: String, sortCols: Seq[String],
      zOrder: Boolean = false,
      targetBytes: Long = 256L * 1024 * 1024,
      partitions: Map[String, String] = Map.empty): Result = {
    require(sortCols.nonEmpty, "optimize: sort columns required")
    val conf = DwrfUtil.sessionHadoopConf()
    val root = new Path(dir)
    val snap = DwrfLog.latest(root, conf).getOrElse(
      throw new IllegalStateException(
        s"optimize targets snapshot tables: no log under $dir " +
          "(DwrfLog.enable first — plain dirs have no atomic swap to " +
          "publish the rewrite through)"))
    val qualified = DwrfUtil.qualify(root, conf)
    val allLive = snap.resolved(qualified)
    require(allLive.nonEmpty, s"optimize: version ${snap.version} has no files")
    // validate the scope KEYS against the table's layout before
    // filtering — a typo'd key must say "not a layout column", not
    // "no files match"
    if (partitions.nonEmpty) {
      val allKeys = allLive.flatMap(f =>
        PartitionLayout.specOf(qualified, f).map(_._1)).toSet
      require(partitions.keySet.subsetOf(allKeys),
        s"optimize: partition scope ${partitions.keys.mkString(",")} must " +
          s"name layout columns (${allKeys.mkString(",")})")
    }
    val live =
      if (partitions.isEmpty) allLive
      else allLive.filter { f =>
        val spec = PartitionLayout.specOf(qualified, f).toMap
        partitions.forall { case (k, v) => spec.get(k).contains(v) }
      }
    require(live.nonEmpty,
      s"optimize: no files match partition scope $partitions " +
        s"in version ${snap.version}")
    // preserve an existing Hive layout: every live file must agree on
    // the partition keys (mixed layouts have no single partitionBy)
    val layoutKeys: Seq[String] = {
      val keySeqs = live.map(f =>
        PartitionLayout.specOf(qualified, f).map(_._1)).distinct
      require(keySeqs.size == 1,
        s"optimize: inconsistent partition layouts under $dir: $keySeqs")
      keySeqs.head
    }
    require(!sortCols.exists(layoutKeys.contains),
      s"optimize: sort columns ${sortCols.mkString(",")} overlap the " +
        s"partition layout (${layoutKeys.mkString(",")}) — partition " +
        "columns are per-directory constants, sorting them is a no-op")
    val fs = root.getFileSystem(conf)
    val bytes = live.map(f => fs.getFileStatus(f).getLen).sum
    val n = math.max(1L, math.min(4096L,
      (bytes + targetBytes - 1) / targetBytes)).toInt

    // preserve the table's write characteristics (codec, block size,
    // index stride, vints) from the first live file, like the delete
    // rewriter does — an optimize must not silently re-encode the table
    // under default options
    val inherited: Map[String, String] = {
      val r = new DwrfFileReader(live.head, conf)
      try Map(
        "compress" -> r.postScript.compression.name,
        "compress.size" -> r.postScript.blockSize.toString,
        "row.index.stride" -> r.footer.rowIndexStride.toString,
        "use.vints" -> r.postScript.useVInts.toString)
      finally r.close()
    }

    val scopedRel: Option[String] =
      if (partitions.isEmpty) None
      else Some(live.map(DwrfLog.relativize(root, conf, _)).sorted.mkString(","))
    val reader = spark.read.format("dwrf")
      .option(DwrfLog.VersionAsOfKey, snap.version)
    scopedRel.foreach(reader.option(DwrfUtil.ScanFilesKey, _))
    val df = reader.load(dir)
    sortCols.foreach(c => require(df.schema.fieldNames.contains(c),
      s"optimize: no column '$c' (schema: ${df.schema.fieldNames.mkString(", ")})"))

    // range-partition over (layout keys, sort key): tasks see few
    // partition values (bounded open writers) and within a directory the
    // writer's ordering contract sorts by the requested key
    val rangeKeys = (layoutKeys ++ sortCols).map(col)
    val staged =
      if (!zOrder)
        df.repartitionByRange(n, rangeKeys: _*)
          .write.format("dwrf").mode("overwrite")
          .option("sort.columns", sortCols.mkString(","))
      else {
        require(sortCols.size >= 2,
          "z-order needs >= 2 columns (one column is a plain sort)")
        sortCols.foreach { c =>
          val dt = df.schema(c).dataType
          require(dt == org.apache.spark.sql.types.LongType ||
            dt == org.apache.spark.sql.types.IntegerType ||
            dt == org.apache.spark.sql.types.ShortType,
            s"z-order column '$c' must be integral, got ${dt.simpleString}")
        }
        graft.functions.GraftFunctions.register(spark)
        val maxes = df.agg(max(col(sortCols.head)),
          sortCols.tail.map(c => max(col(c))): _*).head()
        // each column becomes an 8-bit bucket placed in the HIGH bits of
        // the 32-bit order-code range: the N-ary interleave keeps only
        // the top 64/k bits per dimension, so low-positioned buckets
        // would truncate to a constant and cluster nothing. Bucket by
        // DIVISION (c DIV (hi/256)), never c*256 — the multiply-first
        // form overflows Long for |c| > Long.MaxValue/256, which throws
        // under ANSI and silently wraps (breaking monotonicity) without.
        // Division by a positive constant is monotone, and the clamp
        // keeps the shifted value inside the interleave's bit budget
        // however skewed the column's min is vs its max.
        val scaled = sortCols.zipWithIndex.map { case (c, i) =>
          val hi = math.max(0L, maxes.getAs[Number](i).longValue()) + 1
          val step = math.max(1L, hi / 256L)
          s"GREATEST(-256L, LEAST(255L, `$c` DIV ${step}L)) * ${1L << 23}"
        }
        val zKeys = layoutKeys.map(col) :+ col("__graft_z")
        df.withColumn("__graft_z", expr(s"z_order(${scaled.mkString(", ")})"))
          .repartitionByRange(n, zKeys: _*)
          .sortWithinPartitions(zKeys: _*)
          .drop("__graft_z") // plain write preserves task row order
          .write.format("dwrf").mode("overwrite")
      }
    inherited.foreach { case (k, v) => staged.option(k, v) }
    if (layoutKeys.nonEmpty) staged.partitionBy(layoutKeys: _*)
    staged.option(DwrfLog.RewriteOfKey, snap.version.toString)
    scopedRel.foreach(staged.option(DwrfLog.RewriteFilesKey, _))
    staged.save(dir)
    val after = DwrfLog.latest(root, conf).getOrElse(
      throw new IllegalStateException(s"optimize commit vanished under $dir"))
    // scoped rewrites count only the scope's files (untouched partitions
    // carry over 1:1 and would mask the collapse)
    Result(after.version, live.size,
      after.files.size - (allLive.size - live.size), bytes)
  }

  /** CLI: `runMain graft.sources.dwrf.DwrfOptimize <dir> <col[,col...]> [zorder]`. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DwrfOptimize <dir> <col[,col...]> [zorder]")
    val spark = SparkSession.builder()
      .master("local[4]").appName("dwrf-optimize")
      .config("spark.ui.enabled", "false").getOrCreate()
    try println(rewrite(spark, args(0),
      args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq,
      zOrder = args.contains("zorder")))
    finally spark.stop()
  }
}
