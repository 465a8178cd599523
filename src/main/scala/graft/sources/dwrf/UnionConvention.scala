package graft.sources.dwrf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UNION type convention (reference `OrcUnion.java:36`, union tree writer
  * `WriterImpl.java:1973`, pinned by `TestOrcFile.java:742`
  * testUnionAndTimestamp): Spark's type system has no union, so a DWRF
  * union maps to a TAGGED STRUCT — `struct<tag: byte, c0: T0 … cN: TN>`
  * with exactly one branch non-null per value, selected by `tag`.
  *
  * The wire shapes line up with the reference's union encoding: `tag`
  * round-trips through the byte-RLE kernel exactly like the reference's
  * union tag stream (E2), and each branch through its own subtree writer
  * with PRESENT bits marking rows where the branch is inactive — the same
  * streams a reference union column produces, reached through the struct
  * path instead of a dedicated UNION case.
  */
object UnionConvention {

  /** Build a union value: branch i is active where `tag === i`. */
  def tagged(tag: Column, branches: Column*): Column = {
    val fields = branches.zipWithIndex.map { case (b, i) =>
      when(tag === i, b).as(s"c$i")
    }
    struct((tag.cast("byte").as("tag") +: fields): _*)
  }

  /** True iff the tagged struct satisfies exactly-one-non-null: the
    * branch named by `tag` is set and every other branch is null. */
  def wellFormed(u: Column, arity: Int): Column =
    (0 until arity).map { i =>
      when(u("tag") === i, u(s"c$i").isNotNull).otherwise(u(s"c$i").isNull)
    }.reduce(_ && _)
}
