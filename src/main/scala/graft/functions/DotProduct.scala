package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric array columns.
  *
  * This is the one place the engine drops to a custom Catalyst
  * `Expression` (SURVEY.md §4.2's "measured-need fallback"): the
  * higher-order-function form `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is interpreted (HigherOrderFunction has no doGenCode), costing a
  * virtual call per element — this expression emits a tight fused
  * multiply-add loop into whole-stage codegen instead. ANN/near-dup
  * queries score |candidate pairs| * dim elements through it.
  *
  * Semantics match the HOF form bit-for-bit: elements are widened to
  * double and accumulated left-to-right (same fold order, so DuckDB's
  * list_dot_product oracle comparisons round identically); a null
  * array, null element, or LENGTH MISMATCH yields null (zip_with pads
  * the shorter side with nulls, nulling the fold — a truncated vector
  * must not produce a plausible partial similarity).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    // length mismatch -> null, matching zip_with+aggregate (which pads
    // the shorter side with nulls and so nulls the fold): a truncated
    // embedding must NOT produce a plausible partial similarity
    if (xa.numElements() != xb.numElements()) return null
    val n = xa.numElements()
    val (lt, rt) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || xb.isNullAt(i)) return null
      val x = lt match {
        case FloatType => xa.getFloat(i).toDouble
        case _ => xa.getDouble(i)
      }
      val y = rt match {
        case FloatType => xb.getFloat(i).toDouble
        case _ => xb.getDouble(i)
      }
      sum += x * y
      i += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(dt: DataType, arr: String, i: String) = dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |double $sum = 0.0;
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${getter(lt, a, i)} * ${getter(rt, b, i)};
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
