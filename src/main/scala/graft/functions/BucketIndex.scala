package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native codegen'd range-bucket assignment: the number of `boundaries`
  * strictly below the input value (boundaries sorted ascending), i.e. the
  * bucket index in `CumSum`'s distributed prefix-sum scheme.
  *
  * The declarative equivalent — `aggregate(boundaryArray, 0, (acc, b) =>
  * acc + when(v > b, 1))` — runs the interpreted higher-order-function path:
  * O(|boundaries|) lambda dispatches per row. This expression compiles to a
  * binary search (O(log n), no allocation) inside WholeStageCodegen. Spark's
  * built-in `width_bucket` only supports uniform buckets, not explicit
  * boundaries, hence the custom expression (same tier as DotProductFloat).
  */
case class BucketIndex(child: Expression, boundaries: IndexedSeq[Double])
    extends UnaryExpression {

  // boundaries is an IndexedSeq (not Array) so the case-class equals/hashCode
  // — and with them Catalyst canonicalization, common-subexpression
  // elimination, and exchange reuse — compare contents, and no caller-shared
  // mutable array leaks into the plan; eval/codegen use this private copy
  private lazy val arr: Array[Double] = boundaries.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"bucket_index expects a double argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_index"

  override def nullSafeEval(v: Any): Any = {
    val d = v.asInstanceOf[Double]
    // NaN sorts AFTER +Infinity in Spark's ordering, but every `b < NaN`
    // comparison is false — without this branch NaN would land in bucket 0
    // while the per-bucket window expects it in the LAST bucket, corrupting
    // running sums for every later bucket
    if (java.lang.Double.isNaN(d)) arr.length
    else BucketIndex.countBelow(arr, d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("boundaries", this.arr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $arr.length;
         |if (Double.isNaN($v)) {
         |  $lo = $arr.length; // NaN sorts last -> last bucket
         |} else {
         |  while ($lo < $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    if ($arr[$mid] < $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |  }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BucketIndex =
    copy(child = newChild)
}

object BucketIndex {

  /** Lower-bound binary search: #elements of ascending `arr` strictly < `v`. */
  private[functions] def countBelow(arr: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Column API: bucket index of `value` among ascending `boundaries`. */
  def bucketIndex(value: Column, boundaries: Seq[Double]): Column =
    GraftBridge.toColumn(
      BucketIndex(GraftBridge.toExpression(value), boundaries.toIndexedSeq))
}
