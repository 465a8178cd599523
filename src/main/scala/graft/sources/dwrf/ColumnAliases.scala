package graft.sources.dwrf

import org.apache.spark.sql.types.{MetadataBuilder, StructField}

/** `ALTER TABLE ... RENAME COLUMN` support. The format has no
  * per-column ids (the Delta/Iceberg column-mapping machinery), so a
  * renamed column's OLD files still carry the old physical name. The
  * catalog records prior names in the field's metadata (key
  * [[MetadataKey]], newest first), which rides `StructType.json`
  * through the sidecar and every schema hand-off — batch scans,
  * columnar batches, copy-on-write DML rewrites, delete evaluation,
  * streaming — with no side channel to plumb. Readers resolve a
  * logical field against a file by trying its current name first, then
  * prior names newest-first, so a file written between two renames
  * resolves at its own generation's name. New writes carry only the
  * new name; a copy-on-write rewrite therefore migrates files forward.
  *
  * Reference analog: none — hive-dwrf reads whatever names the Hive
  * metastore declares (`OrcSerde.java:71-123` trusts `columns`);
  * rename-with-history is lake-surface the Spark re-expression adds.
  */
object ColumnAliases {

  /** StructField metadata key holding prior names, newest first. */
  val MetadataKey = "graft.renamedFrom"

  /** Physical-name candidates for a logical field: its own name, then
    * prior names newest first. */
  def candidates(f: StructField): Seq[String] =
    if (!f.metadata.contains(MetadataKey)) Seq(f.name)
    else f.name +: f.metadata.getStringArray(MetadataKey).toSeq

  /** First candidate that resolves in `byName` (a file's own column
    * map). None = the column predates every recorded name (or the file
    * simply lacks it) — callers fall back to all-null, exactly like any
    * other added-column schema evolution.
    */
  def resolve[A](f: StructField, byName: collection.Map[String, A]): Option[A] =
    candidates(f).collectFirst(Function.unlift(byName.get))

  /** Record `from` as the newest prior name of (already-renamed) `f`. */
  def withRename(f: StructField, from: String): StructField = {
    val prior =
      if (f.metadata.contains(MetadataKey))
        f.metadata.getStringArray(MetadataKey).toSeq
      else Nil
    f.copy(metadata = new MetadataBuilder()
      .withMetadata(f.metadata)
      .putStringArray(MetadataKey, (from +: prior).toArray)
      .build())
  }
}
