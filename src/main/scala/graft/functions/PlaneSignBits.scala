package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd multi-plane sign-bit LSH key for an `array<float>`
  * embedding: bit i of the result is set iff `vec · planes(i) > 0`.
  *
  * Bit-identical to the declarative spelling
  * `planes.zipWithIndex.map { (p, i) => when(aggregate(zip_with(vec, p,
  * (x, y) => x.cast(double) * y.cast(double)), 0d, _+_) > 0,
  * 1L << i).otherwise(0L) }.reduce(_ + _)`:
  *  - per plane, left-to-right double accumulation of `vec(j) * plane(j)`
  *    (float→double widening is exact, so the fold order fixes the result);
  *  - a NULL vector, a length mismatch, or a NULL element null-poisons every
  *    per-plane dot in the HOF form, and `when(NULL > 0, …).otherwise(0L)`
  *    yields 0 for each bit — so those inputs map to 0L here too (the
  *    expression is therefore non-nullable).
  *
  * The HOF form dispatches `bits` interpreted lambda chains per ROW — the
  * cause of the round-2 `q_embedding_lsh` regression; this compiles to a
  * two-level primitive loop inside WholeStageCodegen, the same treatment
  * `DotProductFloat` gives the scoring dot product.
  */
case class PlaneSignBits(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 63, s"need 1..63 planes, got ${planes.size}")
  require(planes.forall(_.length == planes.head.length), "planes must share one dimension")

  private def nBits: Int = planes.size
  private def dim: Int   = planes.head.length

  // flattened row-major [plane][component] for the primitive loop; the
  // case-class field stays a Seq so equals/hashCode (and Catalyst
  // canonicalization / common-subexpression elimination) compare contents
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](nBits * dim)
    var i = 0
    planes.foreach { p =>
      p.foreach { v => a(i) = v; i += 1 }
    }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"plane_sign_bits expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean  = false
  override def prettyName: String = "plane_sign_bits"

  private def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n != dim) return 0L
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return 0L
      j += 1
    }
    var bits = 0L
    var i = 0
    while (i < nBits) {
      var acc  = 0.0
      val base = i * dim
      j = 0
      while (j < dim) {
        acc += arr.getFloat(j).toDouble * flat(base + j)
        j += 1
      }
      if (acc > 0) bits |= (1L << i)
      i += 1
    }
    bits
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen  = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", flat, "double[]")
    val a    = childGen.value
    val ok   = ctx.freshName("ok")
    val bits = ctx.freshName("bits")
    val i    = ctx.freshName("i")
    val j    = ctx.freshName("j")
    val acc  = ctx.freshName("acc")
    val base = ctx.freshName("base")
    val body =
      s"""
         |${childGen.code}
         |long ${ev.value} = 0L;
         |if (!${childGen.isNull}) {
         |  boolean $ok = $a.numElements() == $dim;
         |  for (int $j = 0; $ok && $j < $dim; $j++) {
         |    if ($a.isNullAt($j)) $ok = false;
         |  }
         |  if ($ok) {
         |    long $bits = 0L;
         |    for (int $i = 0; $i < $nBits; $i++) {
         |      double $acc = 0.0;
         |      int $base = $i * $dim;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $acc += ((double) $a.getFloat($j)) * $planesRef[$base + $j];
         |      }
         |      if ($acc > 0) $bits |= (1L << $i);
         |    }
         |    ${ev.value} = $bits;
         |  }
         |}
       """.stripMargin
    ev.copy(code = code"$body", isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneSignBits =
    copy(child = newChild)
}

object PlaneSignBits {

  /** Column API: 64-bit sign-bit LSH bucket key of a float vector against a
    * fixed set of hyperplanes.
    */
  def planeSignBits(vec: Column, planes: Seq[Seq[Double]]): Column =
    GraftBridge.toColumn(
      PlaneSignBits(GraftBridge.toExpression(vec), planes.map(_.toVector).toVector))
}
