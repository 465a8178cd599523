package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two integral sort keys: the classic
  * multi-dimension clustering code (Delta/Iceberg's Z-ORDER, public
  * technique). Sorting a table by `z_order(x, y)` and writing it with
  * `sort.columns` gives BOTH `x` and `y` range predicates stride-skip
  * leverage from the same single sort — a plain sort on `x` leaves `y`
  * stats spanning the full domain in every stride.
  *
  * Each input is clamped to 32 bits through an order-preserving
  * offset-binary code (signed order of the input == unsigned order of
  * the code), the two codes are bit-interleaved (x takes the even
  * positions counted from the top), and the final sign bit is flipped so
  * SIGNED long comparison of the result equals unsigned comparison of
  * the interleave — i.e. `ORDER BY z_order(x, y)` just works.
  * Kept in a plain object so generated code can call it statically.
  */
object ZOrderKernel {

  /** Order-preserving 32-bit code: clamp, then offset-binary flip. */
  def orderCode(v: Long): Int = {
    val c = if (v > Int.MaxValue) Int.MaxValue
            else if (v < Int.MinValue) Int.MinValue
            else v.toInt
    c ^ 0x80000000
  }

  /** Spread the 32 bits of `i` onto the even bit positions of a long. */
  def spread(i: Int): Long = {
    var x = i.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave2(a: Long, b: Long): Long = {
    val z = (spread(orderCode(a)) << 1) | spread(orderCode(b))
    z ^ java.lang.Long.MIN_VALUE // signed order == unsigned interleave order
  }

  /** N-ary Morton interleave: each input's order-preserving 32-bit code
    * contributes its TOP `min(32, 64/k)` bits, round-robin MSB-first in
    * argument order (arg 0 owns the highest bit). Truncating to the top
    * bits keeps the clustering property — low-order bits only decide
    * order WITHIN a cell the top bits already co-locate. For k=2 this is
    * bit-identical to [[interleave2]] (32 bits each, sign flip); for
    * k that doesn't divide 64 the result has k·bitsPer < 64 bits and is
    * non-negative, so no flip is needed for signed ordering.
    */
  def interleaveN(vals: Array[Long]): Long = {
    val k = vals.length
    if (k == 2) return interleave2(vals(0), vals(1))
    val bitsPer = math.min(32, 64 / k)
    val codes = new Array[Long](k)
    var i = 0
    while (i < k) { codes(i) = orderCode(vals(i)).toLong & 0xffffffffL; i += 1 }
    var z = 0L
    var b = bitsPer - 1
    while (b >= 0) {
      i = 0
      while (i < k) {
        z = (z << 1) | ((codes(i) >>> (32 - bitsPer + b)) & 1L)
        i += 1
      }
      b -= 1
    }
    if (k * bitsPer == 64) z ^ java.lang.Long.MIN_VALUE else z
  }
}

/** Catalyst expression for [[ZOrderKernel]] — native and codegen'd, so a
  * `SELECT *, z_order(x, y) AS z` projection stays inside whole-stage
  * codegen on the write path.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  // BIGINT children only (the SQL registration wraps args in Cast):
  // without the check a bare Int child would CCE in interpreted
  // nullSafeEval yet silently widen in generated Java — the same plan
  // succeeding or failing depending on whether codegen kicks in
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_order requires BIGINT inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernel.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderKernel.interleave2($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_order"
}

/** N-ary `z_order(c1, …, ck)` (k ≥ 3; the 2-ary case keeps the dedicated
  * [[ZOrder2]] fast path) — [[ZOrderKernel.interleaveN]] as a codegen'd
  * Catalyst expression. `OPTIMIZE … ZORDER BY (a, b, c)` builds its
  * clustering key through this.
  */
case class ZOrderN(children: Seq[Expression])
    extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure(
        s"z_order needs at least 2 columns, got ${children.size}")
    else if (children.size > 32)
      TypeCheckResult.TypeCheckFailure(
        s"z_order supports at most 32 columns, got ${children.size}")
    else if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_order requires BIGINT inputs, got " +
        children.map(_.dataType.sql).mkString(", "))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderKernel.interleaveN(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    // children evaluate in order; a null child just marks the result
    // null (longs are cheap enough that short-circuiting buys nothing)
    val fill = evals.zipWithIndex.map { case (e, i) =>
      code"""
            |${e.code}
            |if (${e.isNull}) { ${ev.isNull} = true; }
            |else { $arr[$i] = ${e.value}; }
       """.stripMargin
    }.reduce(_ + _)
    ev.copy(code =
      code"""
            |boolean ${ev.isNull} = false;
            |long ${ev.value} = 0L;
            |long[] $arr = new long[${children.size}];
            |$fill
            |if (!${ev.isNull}) {
            |  ${ev.value} = graft.functions.ZOrderKernel.interleaveN($arr);
            |}
         """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderN =
    copy(children = newChildren)

  override def prettyName: String = "z_order"
}
