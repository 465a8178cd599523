package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** `simhash64(wh)` — the 64-bit simhash signature as ONE aggregate: 64
  * signed per-bit counters live in a single buffer (`counter(b) += +1`
  * when bit b of the word hash is set, `-1` otherwise), and eval folds
  * them into the signature (`bit b set iff counter(b) > 0`). Replaces
  * the 64 separate `SUM(CASE …)` columns the signature pass previously
  * carried — one aggregate buffer of 64 longs per group instead of 64
  * independent aggregate states, map-side combined like any other
  * partial aggregate, identical output by construction. The DuckDB
  * oracle keeps the explicit 64-SUM SQL spelling (the OracleMath
  * HUGEINT emulation is untouched): this changes the Spark plan's
  * shape, not the math being checked.
  */
case class SimHash64Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 takes a BIGINT word hash, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    // NULL counts as "all bits unset" (−1 per counter) — the exact
    // semantics of the 64-SUM(CASE … ELSE -1) spelling this aggregate
    // replaces (a NULL hash fails the `= 1` predicate on every bit);
    // skipping nulls would diverge on any caller with nullable hashes
    val wh = if (v == null) 0L else v.asInstanceOf[Long]
    var b = 0
    while (b < 64) {
      buffer(b) += (((wh >>> b) & 1L) * 2L) - 1L
      b += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b < 64) { buffer(b) += other(b); b += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (buffer(b) > 0L) sim |= 1L << b
      b += 1
    }
    sim
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 8)
    var b = 0
    while (b < 64) { bb.putLong(buffer(b)); b += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](64)
    var b = 0
    while (b < 64) { buf(b) = bb.getLong; b += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHash64Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHash64Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHash64Agg =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}
