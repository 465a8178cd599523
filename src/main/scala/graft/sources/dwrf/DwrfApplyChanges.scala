package graft.sources.dwrf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC apply: continuously replicate one snapshot table into
  * another by APPLYING its change feed — the `APPLY CHANGES INTO` /
  * CDC-merge shape that turns a change stream back into a queryable
  * table, e.g. a cleaned/serving copy downstream of a landing table.
  *
  * Pipeline: `readStream(readChangeFeed)` over the source log →
  * `foreachBatch` → net-effect reduction per key → one `MERGE INTO` the
  * target per micro-batch. Exactly-once end to end without any
  * two-phase machinery, because each half is idempotent on its own:
  *
  *  - the CDF source's offsets are log VERSIONS tracked in the stream
  *    checkpoint — a replayed micro-batch carries exactly the same
  *    commits' changes;
  *  - the net-effect MERGE is a deterministic upsert/delete by key, so
  *    re-applying a replayed batch rewrites the same rows to the same
  *    values (and the MERGE itself commits atomically through the
  *    target's snapshot log — a crash mid-apply leaves the target at
  *    the previous version, never half-merged).
  *
  * Net-effect reduction (per key, within one micro-batch, which may
  * span several source commits under `maxVersionsPerTrigger` > 1):
  * the HIGHEST `_commit_version` wins; within that version an insert
  * beats a delete, because a copy-on-write rewrite emits its carried
  * rows as delete+insert pairs at the same version (the insert carries
  * the surviving value — exactly what UPDATE means in the feed). A
  * merge-on-read DELETE commit emits only deletes, so the delete wins
  * there. Keys are assumed unique per source version (the usual CDC
  * primary-key contract); duplicate keys make "the" net row ambiguous
  * and the apply picks one deterministically only up to the feed's
  * arbitrary order.
  *
  * Scale shape: the per-batch work is one hash aggregate over the BATCH
  * (sized by the commits' churn, not the table) and one MERGE whose planning
  * prunes target files by join-key stats/blooms — cost tracks the
  * change volume, the way a 100 TB replica has to work.
  */
object DwrfApplyChanges {

  /** Start the continuous apply of `srcDir`'s change feed into catalog
    * table `targetTable`, keyed by `keys`. The target must already
    * exist with the source's data schema (minus change columns).
    */
  def start(spark: SparkSession, srcDir: String, targetTable: String,
      keys: Seq[String], checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      sourceOptions: Map[String, String] = Map.empty): StreamingQuery = {
    require(keys.nonEmpty, "dwrf: CDC apply needs at least one key column")
    val reader = spark.readStream.format("dwrf")
      .option(DwrfChanges.ReadChangeFeedKey, "true")
    sourceOptions.foreach { case (k, v) => reader.option(k, v) }
    reader.load(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, targetTable, keys)
      }
      .start()
  }

  /** Apply one micro-batch of change rows to `targetTable` (also usable
    * directly on a batch change feed from [[DwrfChanges.between]]). */
  def applyBatch(batch: DataFrame, targetTable: String,
      keys: Seq[String]): Unit = {
    if (batch.isEmpty) return
    val s = batch.sparkSession
    val changeCols = Set(DwrfChanges.ChangeTypeColumn,
      DwrfChanges.VersionColumn, DwrfChanges.TimestampColumn)
    val dataCols = batch.columns.filterNot(changeCols.contains)
    require(keys.forall(dataCols.contains),
      s"dwrf: key columns ${keys.mkString(",")} must be data columns " +
        s"of the feed (${dataCols.mkString(",")})")
    // net effect per key: newest version wins; inside one version the
    // insert half of a copy-on-write delete+insert pair wins. max_by on
    // a (version, is_insert) rank instead of a row_number window: the
    // hash aggregate combines map-side and never sorts the batch, where
    // the window shape is a full shuffle + per-partition sort of every
    // change row — same winner, one less O(n log n) pass per batch.
    val rank = struct(col(DwrfChanges.VersionColumn),
      (col(DwrfChanges.ChangeTypeColumn) === "insert").cast("int"))
    val payload = struct(
      (dataCols.toSeq :+ DwrfChanges.ChangeTypeColumn).map(col): _*)
    val net = batch
      .groupBy(keys.map(col): _*)
      .agg(max_by(payload, rank).as("_net"))
      .select(col("_net.*"))
    // Bootstrap fast path: the first sync into an EMPTY replica is a
    // bulk load — MERGE would still plan a join of the whole snapshot
    // against zero target rows. A plain append commits the same rows
    // atomically (delete winners are no-ops on an empty table).
    // Replay-safe without any extra bookkeeping: once this append's
    // commit lands the target is non-empty, so a replayed batch (crash
    // between target commit and checkpoint commit) takes the MERGE
    // path below, which rewrites the same keys to the same values —
    // the idempotency contract is carried by whichever path runs
    // SECOND, and that is always the MERGE.
    if (s.table(targetTable).isEmpty) {
      net.filter(col(DwrfChanges.ChangeTypeColumn) === "insert")
        .select(dataCols.map(col).toSeq: _*)
        .writeTo(targetTable).append()
      return
    }
    val view = s"dwrf_apply_changes_${java.util.UUID.randomUUID().toString.take(8)}"
    net.createOrReplaceTempView(view)
    try {
      val on = keys.map(k => s"t.`$k` = c.`$k`").mkString(" AND ")
      val sets = dataCols.map(c => s"t.`$c` = c.`$c`").mkString(", ")
      val cols = dataCols.map(c => s"`$c`").mkString(", ")
      val vals = dataCols.map(c => s"c.`$c`").mkString(", ")
      s.sql(
        s"""MERGE INTO $targetTable t USING $view c ON $on
           |WHEN MATCHED AND c.`${DwrfChanges.ChangeTypeColumn}` = 'delete' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET $sets
           |WHEN NOT MATCHED AND c.`${DwrfChanges.ChangeTypeColumn}` = 'insert'
           |  THEN INSERT ($cols) VALUES ($vals)
           |""".stripMargin)
    } finally s.catalog.dropTempView(view)
  }
}
