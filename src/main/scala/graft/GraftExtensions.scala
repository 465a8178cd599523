package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.DocFingerprint

/** Canonical extension entry point:
  * `spark.sql.extensions=graft.GraftExtensions` registers graft's native
  * expressions permanently in the session (vs the per-session
  * GraftFunctions.register helper) and the lake-maintenance SQL parser
  * (`DESCRIBE HISTORY` / `VACUUM` / `OPTIMIZE`, see
  * [[graft.sources.dwrf.LakeSqlParser]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((_, delegate) =>
      new graft.sources.dwrf.LakeSqlParser(delegate))
    e.injectFunction((
      new FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(classOf[DocFingerprint].getName, "doc_fingerprint"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child) => DocFingerprint(child, 16)
        case Seq(child, Literal(w: Int, _)) => DocFingerprint(child, w)
        case other => throw new IllegalArgumentException(
          s"doc_fingerprint(text[, window]): got ${other.size} args")
      }))
  }
}
