package graft.queries

/** Memoized fixture staging, shared by every query that derives an
  * on-disk layout from a source table (CDC snapshots, PQ indexes,
  * bucketed warehouses): run the stage closure once per source
  * generation, keyed by the source file's (mtime, length) plus any
  * variant parameters, with an optional extra validity probe for
  * layouts that must ALSO hold a specific state (e.g. a snapshot log
  * at the expected version after a partial clean). Four hand-rolled
  * copies of this pattern had already drifted (some verified the log
  * version, some did not) — one helper, one behavior.
  */
object Staging {

  /** `mtime:length[.. :extra]` identity of a staged layout's source. */
  def sourceKey(f: java.io.File, extra: String = ""): String =
    s"${f.lastModified}:${f.length}" +
      (if (extra.isEmpty) "" else s":$extra")

  /** Run `stage` unless `marker` already records `key` and `stillValid`
    * holds; the marker is (re)written only after a successful stage.
    * Returns true when the stage closure ran (callers with a
    * cached-path alternative — e.g. re-CREATE a catalog table over the
    * surviving layout — branch on it).
    */
  def once(marker: java.nio.file.Path, key: String,
      stillValid: => Boolean = true)(stage: => Unit): Boolean = {
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == key &&
      stillValid
    if (!fresh) {
      stage
      java.nio.file.Files.write(marker, key.getBytes("UTF-8"))
    }
    !fresh
  }
}
