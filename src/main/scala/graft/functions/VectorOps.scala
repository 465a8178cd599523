package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Tight JVM loop for the double dot product — callable from both
  * interpreted eval and generated code.
  */
object VecKernel {
  /** `aF`/`bF` select float vs double element reads — resolved once from
    * the static input types, four specialized loops so the hot path has
    * no per-element branching.
    */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"vec_dot: length mismatch ${a.numElements()} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    if (!aF && !bF) while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    else if (aF && bF) while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
    else if (aF) while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    else while (i < n) { s += a.getDouble(i) * b.getFloat(i); i += 1 }
    s
  }
}

/** `vec_dot(a, b)` — native codegen'd dot product over array<double> or
  * array<float> (each side independently; floats widen per element, the
  * same arithmetic as the CAST-inside-lambda SQL spelling).
  * The SQL spelling `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, ...)`
  * allocates a zipped array and evaluates two lambda expression trees
  * per element; on a pairwise similarity join that interpretive overhead
  * IS the query cost (measured 38 s → ~4 s on dedup_semantic's 4.4M-pair
  * verifier). One expression, one loop, no allocation.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elem(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(DoubleType, _) => Some(false)
    case ArrayType(FloatType, _) => Some(true)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<double|float> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  private lazy val aF = elem(left.dataType).get
  private lazy val bF = elem(right.dataType).get

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernel.dot($a, $b, $aF, $bF);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}
