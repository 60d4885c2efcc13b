package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, ShortType}

/** Native codegen'd set/sequence similarity over `array<long>` columns —
  * the verification kernels of MinHash dedup:
  *
  *   - [[JaccardSortedLong]]: exact Jaccard |a∩b| / |a∪b| of two SORTED
  *     distinct long arrays via a two-pointer merge (O(n+m), no hash table,
  *     no per-element allocation). The declarative
  *     `array_intersect`/`array_union` pair builds two hash sets of boxed
  *     values per ROW — the dominant cost of candidate verification at the
  *     round-1 bench.
  *   - [[MatchingFractionLong]]: fraction of positions where two equal-length
  *     arrays agree — the MinHash signature-agreement estimate, replacing an
  *     interpreted `zip_with` + `filter` chain.
  */
abstract class LongArrayBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
}

case class JaccardSortedLong(left: Expression, right: Expression)
    extends LongArrayBinary {

  override def prettyName: String = "jaccard_sorted_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n     = ctx.freshName("n")
      val m     = ctx.freshName("m")
      val i     = ctx.freshName("i")
      val j     = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xv    = ctx.freshName("xv")
      val yv    = ctx.freshName("yv")
      val union = ctx.freshName("union")
      s"""
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |int $union = $n + $m - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): JaccardSortedLong = copy(left = newLeft, right = newRight)
}

/** Positionwise agreement fraction of two equal-length integral arrays.
  * Accepts array<smallint|int|bigint> (both sides the same element type):
  * the staged MinHash verification narrows its stage-1 prefilter
  * signatures to 16-bit values so the pair joins exchange 4× fewer bytes
  * — the narrowed comparison needs the matching accessor, not getLong.
  */
case class MatchingFractionLong(left: Expression, right: Expression)
    extends LongArrayBinary {

  override def prettyName: String = "matching_fraction_long"

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(dt: DataType): Option[DataType] = dt match {
      case ArrayType(e @ (ShortType | IntegerType | LongType), _) => Some(e)
      case _                                                      => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two arrays of the same integral element " +
            s"type, got ${left.dataType.simpleString} and " +
            s"${right.dataType.simpleString}")
    }
  }

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var eq = 0
    elemType match {
      case LongType =>
        while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
      case IntegerType =>
        while (i < n) { if (x.getInt(i) == y.getInt(i)) eq += 1; i += 1 }
      case ShortType =>
        while (i < n) { if (x.getShort(i) == y.getShort(i)) eq += 1; i += 1 }
    }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val acc = elemType match {
        case LongType    => "getLong"
        case IntegerType => "getInt"
        case ShortType   => "getShort"
      }
      val n  = ctx.freshName("n")
      val i  = ctx.freshName("i")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.$acc($i) == $y.$acc($i)) $eq++;
         |}
         |${ev.value} = ($n == 0) ? 0.0 : ((double) $eq) / $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): MatchingFractionLong = copy(left = newLeft, right = newRight)
}

object LongArraySim {

  /** Exact Jaccard of two sorted distinct `array<long>` columns. */
  def jaccardSorted(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      JaccardSortedLong(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Positionwise agreement fraction of two equal-length `array<long>`s. */
  def matchingFraction(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      MatchingFractionLong(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
