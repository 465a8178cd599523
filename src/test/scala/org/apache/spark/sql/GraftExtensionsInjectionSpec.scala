package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** Verifies graft.GraftExtensions wires doc_fingerprint into a session's
  * function registry (lives in this package for the private[sql]
  * registerFunctions hook; a full-session test would race with the shared
  * test SparkSession, which ignores extensions on getOrCreate).
  */
class GraftExtensionsInjectionSpec extends AnyFunSuite {

  test("GraftExtensions injects doc_fingerprint") {
    val exts = new SparkSessionExtensions
    new graft.GraftExtensions()(exts)
    val registry: FunctionRegistry = FunctionRegistry.builtin.clone()
    exts.registerFunctions(registry)
    assert(registry.functionExists(FunctionIdentifier("doc_fingerprint")))
    val expr = registry.lookupFunction(
      FunctionIdentifier("doc_fingerprint"),
      Seq(Literal("hello world of fingerprints")))
    val v1 = expr.eval(null)
    assert(v1.isInstanceOf[Long] && v1.asInstanceOf[Long] != 0L)
    // window arg variant
    val expr8 = registry.lookupFunction(
      FunctionIdentifier("doc_fingerprint"),
      Seq(Literal("hello world of fingerprints"), Literal(8)))
    assert(expr8.eval(null) != v1)
  }
}
