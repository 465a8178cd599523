package graft.sources.dwrf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incrementally maintained aggregate: keep `targetTable` equal to
  * `SELECT keys, <aggs> FROM source GROUP BY keys` by FOLLOWING the
  * source's change feed — the materialized-view-maintenance shape a
  * serving layer runs downstream of a 100 TB fact table, where
  * recomputing the rollup from scratch per refresh is the thing you
  * cannot afford.
  *
  * Per micro-batch (delta-driven targeted refresh):
  *  1. affected keys = the batch's change rows' key set (churn-sized —
  *     the feed says WHICH groups moved, never how many rows exist);
  *  2. recompute ONLY those groups from the CURRENT source snapshot
  *     (the scan prunes source files by the key join's runtime
  *     filters/blooms — cost tracks churn, not table size);
  *  3. one MERGE: vanished groups DELETE, changed groups UPDATE, new
  *     groups INSERT.
  *
  * Idempotent-from-truth, not exactly-once-by-bookkeeping: deltas are
  * never ADDED into the target (a replayed additive delta would
  * double-count); each application rewrites affected groups to values
  * recomputed from a source snapshot AT LEAST as new as the batch, so
  * replaying a batch after a crash converges to the same table. The
  * copy-on-write rewrite pairs (delete+insert of carried rows at one
  * version) need no special-casing for the same reason — they only
  * nominate keys, the recompute supplies the truth.
  */
object DwrfAggMaintain {

  /** Start the continuous maintenance of `targetTable` over `srcDir`'s
    * change feed. `srcTable` is the catalog name of the SAME table the
    * recompute reads (current snapshot). Each element of `aggClauses`
    * must be a SQL aggregate with an `AS <name>` alias matching the
    * target's column, e.g. `"COUNT(*) AS n_orders"`.
    */
  def start(spark: SparkSession, srcDir: String, srcTable: String,
      targetTable: String, keys: Seq[String], aggClauses: Seq[String],
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow(),
      sourceOptions: Map[String, String] = Map.empty): StreamingQuery = {
    require(keys.nonEmpty, "dwrf: aggregate maintenance needs key columns")
    require(aggClauses.nonEmpty, "dwrf: no aggregate clauses given")
    val reader = spark.readStream.format("dwrf")
      .option(DwrfChanges.ReadChangeFeedKey, "true")
    sourceOptions.foreach { case (k, v) => reader.option(k, v) }
    reader.load(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, srcTable, targetTable, keys, aggClauses)
      }
      .start()
  }

  private def aliasOf(clause: String): String = {
    val i = clause.toUpperCase.lastIndexOf(" AS ")
    require(i >= 0, s"dwrf: aggregate clause needs an AS alias: $clause")
    clause.substring(i + 4).trim.stripPrefix("`").stripSuffix("`")
  }

  /** Apply one batch of change rows (also usable on a batch feed from
    * [[DwrfChanges.between]] — re-application is harmless by design).
    */
  def applyBatch(batch: DataFrame, srcTable: String, targetTable: String,
      keys: Seq[String], aggClauses: Seq[String]): Unit = {
    if (batch.isEmpty) return
    val s = batch.sparkSession
    val aggNames = aggClauses.map(aliasOf)
    val kCols = keys.map(k => s"`$k`").mkString(", ")
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val affectedView = s"dwrf_agg_affected_$tag"
    batch.selectExpr(keys.map(k => s"`$k`"): _*).distinct()
      .createOrReplaceTempView(affectedView)
    try {
      // Bootstrap fast path: the first maintenance batch into an EMPTY
      // aggregate table inserts every affected group's fresh rollup —
      // MERGE would join that recompute against zero target rows.
      // Replay-safe the same way DwrfApplyChanges is: once this append
      // commits, a replayed batch finds a non-empty target and takes
      // the MERGE below, which recomputes-from-truth and rewrites the
      // same groups to the same values (the idempotency the
      // stream_agg_maintain gate proves).
      if (s.table(targetTable).isEmpty) {
        s.sql(
          s"""SELECT $kCols, ${aggClauses.mkString(", ")}
             |FROM $srcTable
             |WHERE ($kCols) IN (SELECT $kCols FROM $affectedView)
             |GROUP BY $kCols
             |""".stripMargin)
          .writeTo(targetTable).append()
        return
      }
      val on = keys.map(k => s"t.`$k` = c.`$k`").mkString(" AND ")
      val freshOn = keys.map(k => s"a.`$k` = f.`$k`").mkString(" AND ")
      val sets = aggNames.map(n => s"t.`$n` = c.`$n`").mkString(", ")
      val insCols = (keys ++ aggNames).map(n => s"`$n`").mkString(", ")
      val insVals = (keys ++ aggNames).map(n => s"c.`$n`").mkString(", ")
      // affected LEFT JOIN fresh: a key with no surviving source rows
      // comes back all-null on the fresh side => its group vanished
      s.sql(
        s"""MERGE INTO $targetTable t USING (
           |  SELECT ${keys.map(k => s"a.`$k`").mkString(", ")},
           |    ${aggNames.map(n => s"f.`$n`").mkString(", ")},
           |    (f.`${keys.head}` IS NULL) AS _gone
           |  FROM $affectedView a
           |  LEFT JOIN (
           |    SELECT $kCols, ${aggClauses.mkString(", ")}
           |    FROM $srcTable
           |    WHERE ($kCols) IN (SELECT $kCols FROM $affectedView)
           |    GROUP BY $kCols
           |  ) f ON $freshOn
           |) c ON $on
           |WHEN MATCHED AND c._gone THEN DELETE
           |WHEN MATCHED THEN UPDATE SET $sets
           |WHEN NOT MATCHED AND NOT c._gone THEN INSERT ($insCols) VALUES ($insVals)
           |""".stripMargin)
    } finally s.catalog.dropTempView(affectedView)
  }
}
