package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * The declarative equivalent — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * runs on the interpreted higher-order-function path (one lambda-variable
  * dispatch per element). This expression compiles to a tight primitive
  * loop inside WholeStageCodegen, ~an order of magnitude faster on wide
  * embeddings, while keeping bit-identical results: left-to-right double
  * accumulation of `a(i) * b(i)`, exactly like the HOF fold.
  *
  * This is the custom-Expression tier of the extension ladder (compose
  * built-ins → custom Expression → custom plan); everything else in the
  * engine stays on built-ins because they already express the semantics.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product_float expects two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_float"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null elements contribute 0 (HOF zip_with yields null products which
      // the fold's `+` would null-poison; embeddings carry no nulls, but
      // degrade gracefully rather than returning NULL)
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): DotProductFloat = copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  /** Column API: `dotF(a, b)` — native dot product for float vectors. */
  def dotF(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      DotProductFloat(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
